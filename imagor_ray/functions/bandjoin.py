"""Shared band-join probe for the temporal-join family.

One implementation of the (key-rank, time-rank) composite positioning
used by the stream-stream join, the CEP negation/latency ops and the
interval joins: every LEFT row gets the half-open index span [lo, hi)
into the sorted RIGHT side holding the same-key rows with
``ts ∈ [l_lo, l_hi]`` (both bounds INCLUSIVE — callers express strict
bounds with the integer-µs trick ``ts > s ⇔ ts ≥ s+1``).

Overflow discipline (the code-review finding this module closes): the
composite is built from DENSE RANKS on both axes, so products are
bounded by bucket_rows² — never by ``users × raw-µs-span``, which
overflows int64 once a bucket's user count times the stream's time
span passes 2⁶³ (a ~150k-user × multi-year cycle). Same rule as
``joins._range_bucket``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["band_probe"]


def band_probe(l_key: np.ndarray, l_lo: np.ndarray, l_hi: np.ndarray,
               r_key: np.ndarray, r_ts: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized band positioning.

    Returns ``(lo, hi, order)``: ``order`` sorts the right side by
    (key, ts) — stable, so equal (key, ts) rows keep input order — and
    for each left row ``i`` the right rows matching
    ``key == l_key[i] and l_lo[i] <= ts <= l_hi[i]`` are exactly
    ``order[lo[i]:hi[i]]``-indexed.
    """
    uniq_k = np.unique(np.concatenate([l_key, r_key]))
    uniq_t = np.unique(r_ts)
    m = np.int64(len(uniq_t) + 1)
    comp_r = (np.searchsorted(uniq_k, r_key).astype(np.int64) * m
              + np.searchsorted(uniq_t, r_ts))
    order = np.argsort(comp_r, kind="stable")
    comp_r = comp_r[order]
    lk = np.searchsorted(uniq_k, l_key).astype(np.int64) * m
    lo = np.searchsorted(comp_r, lk + np.searchsorted(uniq_t, l_lo))
    hi = np.searchsorted(
        comp_r, lk + np.searchsorted(uniq_t, l_hi, side="right"))
    return lo, hi, order
