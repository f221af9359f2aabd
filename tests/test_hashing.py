"""Vectorized crc32 must be bit-for-bit zlib.crc32 — the shared
partition key (BENCH.md finding 2) cannot drift."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from imagor_ray.functions.hashing import _crc32_slow, crc32_bucket, crc32_of_strings


def test_matches_zlib_basic():
    vals = ["conv_000001", "conv_999999", "", "a", "abc" * 50,
            "héllo wörld", "哈哈", "x" * 1, "y" * 2, "mixed_len"]
    got = crc32_of_strings(vals)
    want = _crc32_slow(vals)
    np.testing.assert_array_equal(got, want)


def test_bucket_matches_per_row():
    s = pd.Series([f"conv_{i:06d}" for i in range(1000)])
    got = crc32_bucket(s.to_numpy(), 64)
    want = _crc32_slow(s.tolist()).astype(np.int64) % 64
    np.testing.assert_array_equal(got, want)


def test_empty_input():
    assert len(crc32_of_strings([])) == 0
    assert crc32_of_strings([""])[0] == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=30))
def test_property_matches_zlib(vals):
    np.testing.assert_array_equal(crc32_of_strings(vals), _crc32_slow(vals))
