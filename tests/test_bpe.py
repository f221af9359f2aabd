"""Distributed BPE trainer vs the independent single-process reference:
the learned merge table must be IDENTICAL (same pairs, same order, same
weighted counts) — the iterative-op verification pattern (no SQL mirror
exists for an argmax-rewrite loop, so the differential is the oracle)."""

import pytest
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


@pytest.fixture(scope="module")
def encoded25(ray_session):
    from imagor_ray.pipelines.bpe import bpe_encode

    return bpe_encode("/root/testdata/sf0.001",
                      num_merges=25).to_pandas()


class TestEncode:
    """bpe_encode: byte-identical token streams vs an independent apply
    over the reference-trained merges."""

    def test_encode_matches_independent_apply(self, ray_session, encoded25):
        import hashlib

        import duckdb

        from imagor_ray.pipelines.bpe import END_OF_WORD, bpe_reference

        sf = "/root/testdata/sf0.001"
        got = encoded25.set_index("doc_id")

        docs = duckdb.sql(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet'").df()
        from collections import Counter
        wc = Counter()
        for t in docs["text"]:
            wc.update(t.split(" "))
        merges = bpe_reference(dict(wc), 25)

        def apply_word(w):
            toks = list(w) + [END_OF_WORD]
            for a, b, _ in merges:
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            return toks

        for _, row in docs.sample(40, random_state=7).iterrows():
            stream = []
            for w in row["text"].split(" "):
                stream.extend(apply_word(w))
            want_md5 = hashlib.md5(
                "\x1e".join(stream).encode("utf-8")).hexdigest()
            r = got.loc[row["doc_id"]]
            assert r["n_subwords"] == len(stream)
            assert r["token_md5"] == want_md5

    def test_more_merges_fewer_subwords(self, ray_session, encoded25):
        from imagor_ray.pipelines.bpe import bpe_encode

        sf = "/root/testdata/sf0.001"
        n0 = bpe_encode(sf, num_merges=0).to_pandas()["n_subwords"].sum()
        assert encoded25["n_subwords"].sum() < n0
