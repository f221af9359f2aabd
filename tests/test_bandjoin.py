"""Shared band probe: brute-force equivalence, inclusive-bound
semantics, and the int64-overflow regression (rank-dense composites —
a raw rank*span+µs composite wraps negative on wide streams)."""

from __future__ import annotations

import numpy as np


def brute(l_key, l_lo, l_hi, r_key, r_ts):
    out = []
    for i in range(len(l_key)):
        out.append(sorted(
            j for j in range(len(r_key))
            if r_key[j] == l_key[i] and l_lo[i] <= r_ts[j] <= l_hi[i]))
    return out


def spans(l_key, l_lo, l_hi, r_key, r_ts):
    from imagor_ray.functions.bandjoin import band_probe
    lo, hi, order = band_probe(l_key, l_lo, l_hi, r_key, r_ts)
    return [sorted(order[lo[i]:hi[i]]) for i in range(len(l_key))]


class TestBandProbe:
    def test_random_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        lk = rng.integers(0, 12, 200).astype(np.int64)
        lt = rng.integers(0, 500, 200).astype(np.int64)
        rk = rng.integers(0, 12, 300).astype(np.int64)
        rt = rng.integers(0, 500, 300).astype(np.int64)
        assert spans(lk, lt + 1, lt + 60, rk, rt) == \
            brute(lk, lt + 1, lt + 60, rk, rt)

    def test_bounds_inclusive_both_ends(self):
        lk = np.array([1], dtype=np.int64)
        rk = np.array([1, 1, 1, 1], dtype=np.int64)
        rt = np.array([9, 10, 20, 21], dtype=np.int64)
        got = spans(lk, np.array([10]), np.array([20]), rk, rt)
        assert got == [[1, 2]]

    def test_wide_stream_no_int64_overflow(self):
        # 600-year µs span × hundreds of key ranks overflowed the old
        # rank*span composite (~1e19 > 2^63); rank-dense stays exact
        rng = np.random.default_rng(4)
        n = 400
        lk = rng.integers(0, 300, n).astype(np.int64)
        lt = (rng.integers(0, 2 * 10**16, n).astype(np.int64)
              + 1_500_000_000_000_000)
        rk = rng.integers(0, 300, n).astype(np.int64)
        rt = (rng.integers(0, 2 * 10**16, n).astype(np.int64)
              + 1_500_000_000_000_000)
        w = np.int64(5 * 10**15)
        assert spans(lk, lt + 1, lt + w, rk, rt) == \
            brute(lk, lt + 1, lt + w, rk, rt)
