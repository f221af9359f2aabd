"""Shared-partition-key hashing: crc32 values must be bit-for-bit
zlib.crc32, and the numeric conv-bucket path must equal hashing the
formatted conv_id string (BENCH.md finding 2)."""

import zlib

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from imagor_ray.functions.hashing import (
    _crc32_matrix, conv_bucket_from_uid, crc32_bucket, crc32_of_strings,
)


def _ref(vals):
    return np.fromiter((zlib.crc32(v.encode("utf-8")) for v in vals),
                       dtype=np.uint32, count=len(vals))


def test_matches_zlib_basic():
    vals = ["conv_000001", "conv_999999", "", "a", "abc" * 50,
            "h\u00e9llo w\u00f6rld", "\u54c8\u54c8", "x", "yy", "mixed_len"]
    np.testing.assert_array_equal(crc32_of_strings(vals), _ref(vals))


def test_crc32_matrix_matches_zlib():
    vals = [b"conv_000001", b"conv_999999", b"hello070504"]
    mat = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(len(vals), 11)
    want = np.array([zlib.crc32(v) for v in vals], dtype=np.uint32)
    np.testing.assert_array_equal(_crc32_matrix(mat), want)


def test_bucket_matches_per_row():
    s = pd.Series([f"conv_{i:06d}" for i in range(1000)])
    got = crc32_bucket(s.to_numpy(), 64)
    want = _ref(s.tolist()).astype(np.int64) % 64
    np.testing.assert_array_equal(got, want)


def test_conv_bucket_from_uid_matches_string_path():
    # includes lpad boundary (6 digits), replica-shifted uids (7-10
    # digits) and powers of ten
    uids = np.array([0, 1, 7, 999999, 1000000, 1000001, 5123456,
                     99999999, 100000000, 1234567890], dtype=np.int64)
    got = conv_bucket_from_uid(uids, 64)
    want = _ref([f"conv_{u:06d}" for u in uids]).astype(np.int64) % 64
    np.testing.assert_array_equal(got, want)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50))
def test_property_conv_bucket_from_uid(uids):
    uids = np.array(uids, dtype=np.int64)
    got = conv_bucket_from_uid(uids, 97)
    want = _ref([f"conv_{u:06d}" for u in uids]).astype(np.int64) % 97
    np.testing.assert_array_equal(got, want)


def test_empty_input():
    assert len(crc32_of_strings([])) == 0
    assert crc32_of_strings([""])[0] == 0
    assert len(conv_bucket_from_uid([], 8)) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=30))
def test_property_matches_zlib(vals):
    np.testing.assert_array_equal(crc32_of_strings(vals), _ref(vals))


class TestSmearVectorized:
    """Group-matrix blur/sharpen must equal the per-row reference."""

    def test_matches_reference(self):
        from imagor_ray.functions.kernels import _smear, _smear_series

        texts = ["", "a", "ab", "The Quick Brown Fox 1234",
                 "héllo wörld 哈哈 123", "x" * 200, "ab\ncd\nef",
                 "\U0010FFFD high plane", " spaces  everywhere "]
        s = pd.Series(texts, dtype=object)
        for w in (1, 2, 5):
            for sharpen in (False, True):
                got = _smear_series(s, w, sharpen)
                want = s.map(lambda t: _smear(t, w, sharpen))
                assert got.tolist() == want.tolist(), (w, sharpen)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.text(max_size=60), min_size=1, max_size=12),
           st.integers(min_value=1, max_value=4), st.booleans())
    def test_property_matches_reference(self, texts, w, sharpen):
        from imagor_ray.functions.kernels import _smear, _smear_series

        s = pd.Series(texts, dtype=object)
        got = _smear_series(s, w, sharpen)
        want = s.map(lambda t: _smear(t, w, sharpen))
        assert got.tolist() == want.tolist()


def test_conv_bucket_digit_count_boundaries():
    """Regression (ADVICE r2): float log10 rounds up just below powers of
    10 (e.g. 10**15 - 1), miscounting digits and silently breaking the
    bit-identical contract with crc32 of the formatted conv_id."""
    uids = [999_999_999_999_999]  # the reported failing value (10**15 - 1)
    for k in range(6, 18):
        uids += [10**k - 1, 10**k, 10**k + 1]
    uids = np.array(uids, dtype=np.int64)
    got = conv_bucket_from_uid(uids, 64)
    want = _ref([f"conv_{u:06d}" for u in uids]).astype(np.int64) % 64
    np.testing.assert_array_equal(got, want)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30))
def test_property_conv_bucket_full_int64_range(uids):
    uids = np.array(uids, dtype=np.int64)
    got = conv_bucket_from_uid(uids, 97)
    want = _ref([f"conv_{u:06d}" for u in uids]).astype(np.int64) % 97
    np.testing.assert_array_equal(got, want)
