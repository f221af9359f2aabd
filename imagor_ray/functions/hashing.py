"""Hashing for the hot shuffle-key path.

``crc32(conv_id) % num_buckets`` is the ONE shared partitioning key the
whole engine uses (sink buckets, session buckets, transcript derivation —
BENCH.md finding 2). Measured at 1M rows in this sandbox (BENCH.md
findings):

- per-row ``zlib.crc32`` (a C call) over Python strings: **0.13 s** —
  faster than every numpy "vectorization" that has to materialize /
  re-encode the strings first (``np.char`` encode ≈ 0.9 s, Arrow-buffer
  gather ≈ 0.9 s). For arbitrary string columns the C-call loop IS the
  fast path; :func:`crc32_of_strings` uses it.
- the real win is skipping strings entirely: the flagship's conv_id is
  ``'conv_' || lpad(user_id, 6, '0')``, so :func:`conv_bucket_from_uid`
  builds the byte matrix numerically (digit extraction) and runs a
  table-driven CRC vectorized across rows — **0.13 s**, no string
  objects, bit-identical to ``zlib.crc32`` of the formatted string.
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = ["crc32_of_strings", "crc32_bucket", "conv_bucket_from_uid"]


def _make_table() -> np.ndarray:
    poly = np.uint32(0xEDB88320)
    table = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (poly if (c & np.uint32(1)) else np.uint32(0))
        table[i] = c
    return table


_CRC_TABLE = _make_table()
_FF = np.uint32(0xFFFFFFFF)
_EIGHT = np.uint32(8)


def _crc32_matrix(mat: np.ndarray) -> np.ndarray:
    """CRC-32 of each row of an (n, w) uint8 matrix (all rows width w)."""
    crc = np.full(mat.shape[0], _FF, dtype=np.uint32)
    for j in range(mat.shape[1]):
        crc = _CRC_TABLE[(crc ^ mat[:, j]) & np.uint32(0xFF)] ^ (crc >> _EIGHT)
    return crc ^ _FF


def crc32_of_strings(values) -> np.ndarray:
    """``zlib.crc32(v.encode("utf-8"))`` per element (uint32).

    Implemented as the C-call loop — measured faster than numpy/Arrow
    re-encoding paths for object-string columns (see module docstring).
    """
    vals = np.asarray(values, dtype=object)
    return np.fromiter(
        (zlib.crc32(v.encode("utf-8")) for v in vals), dtype=np.uint32, count=len(vals)
    )


def crc32_bucket(values, num_buckets: int) -> np.ndarray:
    """``zlib.crc32(v) % num_buckets`` — the shared partition key."""
    return (crc32_of_strings(values) % np.uint32(num_buckets)).astype(np.int64)


_CONV_PREFIX = np.frombuffer(b"conv_", dtype=np.uint8)
# powers of 10 covering the full int64 range; digit count is a
# searchsorted against this table — exact integer arithmetic, because
# float log10 rounds up just below powers of 10 (10**15 - 1 has
# log10 == 15.0 in float64, which would miscount 15 digits as 16 and
# silently break the bit-identical crc32('conv_'||lpad(uid,6,'0'))
# contract that aligns every partition key in the engine)
_POW10 = 10 ** np.arange(1, 19, dtype=np.int64)


def conv_bucket_from_uid(uid, num_buckets: int) -> np.ndarray:
    """``crc32('conv_' || lpad(uid, 6, '0')) % num_buckets`` computed
    WITHOUT materializing any strings: digit columns are extracted with
    integer ops into a uint8 byte matrix and CRC'd vectorized across
    rows. Bit-identical to hashing the formatted conv_id string."""
    uid = np.asarray(uid, dtype=np.int64)
    if len(uid) == 0:
        return np.empty(0, dtype=np.int64)
    # lpad to 6 → width grows only when uid has >6 digits (bench replicas)
    ndig = np.maximum(
        np.searchsorted(_POW10, uid, side="right") + 1, 6
    ).astype(np.int64)
    out = np.empty(len(uid), dtype=np.uint32)
    for d in np.unique(ndig):
        idx = np.where(ndig == d)[0]
        mat = np.empty((len(idx), 5 + int(d)), dtype=np.uint8)
        mat[:, :5] = _CONV_PREFIX
        v = uid[idx]
        for k in range(int(d)):
            mat[:, 5 + int(d) - 1 - k] = (v % 10) + 48
            v = v // 10
        out[idx] = _crc32_matrix(mat)
    return (out % np.uint32(num_buckets)).astype(np.int64)


def _crc32_slow(values) -> np.ndarray:
    """Alias kept for the test suite's reference comparisons."""
    return crc32_of_strings(values)
