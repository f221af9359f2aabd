"""Distributed BPE trainer vs the independent single-process reference:
the learned merge table must be IDENTICAL (same pairs, same order, same
weighted counts) — the iterative-op verification pattern (no SQL mirror
exists for an argmax-rewrite loop, so the differential is the oracle)."""

import duckdb
import pandas as pd

from imagor_ray.pipelines.bpe import bpe_reference, bpe_train

SF = "/root/testdata/sf0.001"


def _corpus_word_counts(sf: str) -> dict:
    con = duckdb.connect()
    df = con.execute(
        f"SELECT token, count(*) AS c FROM ("
        f"  SELECT unnest(string_split(text, ' ')) AS token"
        f"  FROM '{sf}/documents.parquet') WHERE token <> ''"
        f" GROUP BY 1"
    ).df()
    return dict(zip(df["token"], df["c"].astype(int)))


class TestBpeTrain:
    def test_matches_reference_on_real_corpus(self, ray_session):
        got = bpe_train(SF, num_merges=25)
        want = bpe_reference(_corpus_word_counts(SF), 25)
        assert len(got) == len(want)
        for i, (a, b, c) in enumerate(want):
            row = got.iloc[i]
            assert (row["left"], row["right"], int(row["pair_count"])) == \
                (a, b, c), f"merge {i}"

    def test_deterministic_across_runs(self, ray_session):
        a = bpe_train(SF, num_merges=8)
        b = bpe_train(SF, num_merges=8)
        pd.testing.assert_frame_equal(a, b)

    def test_merge_rule_greedy_non_overlapping(self):
        from imagor_ray.pipelines.bpe import _merge_word

        # "aaa" + merge (a,a) -> ["aa","a"], never ["a","aa"]
        assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
        assert _merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
        assert _merge_word(["x", "y"], "a", "b") == ["x", "y"]

    def test_reference_tiebreak_lexicographic(self):
        # both pairs occur twice; (a,b) < (b,a) must win round 1
        merges = bpe_reference({"abab": 1, "ba": 1}, 1)
        assert merges[0][:2] == ("a", "b")
