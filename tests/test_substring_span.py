"""Exact substring-duplication coverage (Lee et al. span-dedup
statistic): closed-form fixtures for the interval-union coverage math,
the >=2-occurrences gate (cross-doc AND within-doc), and
zero-preservation — beyond the DuckDB parity row."""

from __future__ import annotations

import pandas as pd
import pytest


def _run(texts, tmp_path, n=8):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    d = tmp_path / "ss"
    d.mkdir()
    df.to_parquet(d / "documents.parquet", index=False)
    from imagor_ray.pipelines.dedup import substring_span_coverage
    got = substring_span_coverage(str(d), n=n).to_pandas()
    return got.sort_values("doc_id").reset_index(drop=True)


def words(*xs):
    return " ".join(str(x) for x in xs)


class TestSubstringSpanCoverage:
    def test_cross_doc_duplicate_covers_both(self, ray_session, tmp_path):
        # docs share one exact 8-gram ("a b c d e f g h"); unique tails
        shared = words(*"abcdefgh")
        t0 = shared + " " + words(*"xyzuvw")     # 14 tokens, 8 covered
        t1 = words(*"pq") + " " + shared         # 10 tokens, 8 covered
        got = _run([t0, t1], tmp_path)
        assert list(got["n_tokens"]) == [14, 10]
        assert list(got["n_dup_tokens"]) == [8, 8]

    def test_within_doc_repeat_counts(self, ray_session, tmp_path):
        # the same 8-gram twice INSIDE one doc: both spans covered
        g = words(*"abcdefgh")
        t = g + " " + words("z1", "z2", "z3") + " " + g   # 8+3+8 = 19 tokens
        got = _run([t], tmp_path)
        assert list(got["n_tokens"]) == [19]
        assert list(got["n_dup_tokens"]) == [16]

    def test_overlapping_spans_union_not_sum(self, ray_session, tmp_path):
        # two docs share a 9-token run -> two overlapping duplicated
        # 8-grams; the union covers 9 positions, not 16
        run9 = words(*"abcdefghi")
        t0 = run9 + " " + words("k1", "k2", "k3", "k4")
        t1 = words("m1", "m2") + " " + run9
        got = _run([t0, t1], tmp_path)
        assert list(got["n_dup_tokens"]) == [9, 9]

    def test_short_and_unique_docs_zero(self, ray_session, tmp_path):
        got = _run([words(*"abc"),                    # < n tokens
                    words(*"qwertyuiop")],   # unique grams
                   tmp_path)
        assert list(got["n_tokens"]) == [3, 10]
        assert list(got["n_dup_tokens"]) == [0, 0]
