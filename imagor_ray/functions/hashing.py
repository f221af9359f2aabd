"""Vectorized hashing for the hot shuffle-key path.

``crc32(conv_id) % num_buckets`` is the ONE shared partitioning key the
whole engine uses (sink buckets, session buckets, transcript derivation —
BENCH.md finding 2). Round 1 computed it with a per-row Python
``zlib.crc32`` call inside every wide stage; this module computes the
IDENTICAL values (bit-for-bit ``zlib.crc32`` of the UTF-8 bytes) with a
table-driven numpy kernel vectorized across rows: strings are encoded to
a fixed-width byte matrix and the CRC state advances one byte-position at
a time over ALL rows at once, so cost is O(max_len) numpy ops instead of
O(rows) Python calls.
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = ["crc32_of_strings", "crc32_bucket"]


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
    """``zlib.crc32(v.encode("utf-8"))`` for every element, vectorized.

    Accepts any sequence/array/Series of Python strings; returns uint32.
    Rows are grouped by encoded byte length so trailing padding of the
    fixed-width numpy representation never enters the CRC.
    """
    arr = np.asarray(values, dtype=object)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    sbytes = np.char.encode(arr.astype("U"), "utf-8")
    width = sbytes.dtype.itemsize
    if width == 0:  # all-empty strings
        return np.zeros(n, dtype=np.uint32)
    mat = np.ascontiguousarray(sbytes).view(np.uint8).reshape(n, width)
    lens = np.char.str_len(sbytes)
    out = np.empty(n, dtype=np.uint32)
    for length in np.unique(lens):
        idx = lens == length
        out[idx] = _crc32_matrix(mat[idx, : int(length)])
    return out


def crc32_bucket(values, num_buckets: int) -> np.ndarray:
    """``zlib.crc32(v) % num_buckets`` vectorized — the shared partition
    key. Exact drop-in for the round-1 per-row form."""
    return (crc32_of_strings(values) % np.uint32(num_buckets)).astype(np.int64)


def _crc32_slow(values) -> np.ndarray:
    """Per-row reference implementation (tests compare against this)."""
    return np.fromiter(
        (zlib.crc32(v.encode("utf-8")) for v in values), dtype=np.uint32, count=len(values)
    )
