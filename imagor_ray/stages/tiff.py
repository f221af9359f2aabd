"""Baseline TIFF codec — pure struct/numpy, no external libraries.

TIFF is a supported blob type AND export format in the reference
(``blob.go:36, 445, 475-476, 732-733`` magic/content-type/extension
rows; export map ``processor/vipsprocessor/process.go:23`` and the
Tiffsave path ``process.go:920-929``), so the engine's sniffing decode
stack covers it for real.

Scope (the baseline-TIFF profile the reference's uncompressed exports
produce):

- **Decoder**: II/MM byte orders, chunky (PlanarConfig=1) 8-bit gray
  and RGB(A), multi-strip images (RowsPerStrip + StripOffsets/
  StripByteCounts), Compression 1 (none) and 32773 (PackBits).
  Tiled TIFF, planar layout, LZW and 16-bit samples raise
  ``NotImplementedError`` with a clear message — the documented
  boundary, like the PNG/JPEG gates.
- **Encoder**: little-endian 8-bit gray or RGB — deterministic bytes,
  exact round trips. Default single-strip uncompressed (the Tiffsave
  analogue of the reference's uncompressed export path, byte-stable
  across rounds); opt-in PackBits compression and multi-strip layout
  (``rows_per_strip``) for the compressed profile.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["TiffCodec", "encode_tiff"]

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG = 1, 2, 3, 4
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR = 284


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:                       # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:                     # repeat next byte 257-b times
            out += data[i : i + 1] * (257 - b)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: truncated PackBits strip")
    return bytes(out[:expected])


def _read_ifd(payload: bytes, endian: str):
    off = struct.unpack(endian + "I", payload[4:8])[0]
    if off + 2 > len(payload):
        raise ValueError("tiff: bad IFD offset")
    count = struct.unpack_from(endian + "H", payload, off)[0]
    tags = {}
    for k in range(count):
        base = off + 2 + 12 * k
        tag, typ, n = struct.unpack_from(endian + "HHI", payload, base)
        size = _TYPE_SIZE.get(typ, 1) * n
        if size <= 4:
            raw = payload[base + 8 : base + 8 + size]
        else:
            voff = struct.unpack_from(endian + "I", payload, base + 8)[0]
            raw = payload[voff : voff + size]
        if typ == _T_SHORT:
            vals = list(struct.unpack(endian + "H" * n, raw))
        elif typ == _T_LONG:
            vals = list(struct.unpack(endian + "I" * n, raw))
        elif typ == _T_BYTE:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def _parse(payload: bytes):
    order = payload[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    if struct.unpack(endian + "H", payload[2:4])[0] != 42:
        raise ValueError("tiff: bad magic")
    tags = _read_ifd(payload, endian)
    w = tags[_W][0]
    h = tags[_H][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    comp = tags.get(_COMP, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError("tiff: only 8-bit samples")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise NotImplementedError("tiff: only chunky planar config")
    if 322 in tags or 324 in tags:
        raise NotImplementedError("tiff: tiled layout not supported")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"tiff: compression {comp} not supported (none/PackBits only)")
    return endian, tags, w, h, spp, comp


class TiffCodec:
    """Baseline TIFF decode — same surface shape as the other codecs."""

    @staticmethod
    def decode_meta(payload: bytes) -> dict:
        _, _, w, h, spp, comp = _parse(payload)
        return {"width": w, "height": h, "channels": spp,
                "compression": "packbits" if comp == 32773 else "none"}

    @staticmethod
    def decode_pixels(payload: bytes) -> np.ndarray:
        """(h, w, channels) uint8."""
        _, tags, w, h, spp, comp = _parse(payload)
        offs = tags[_STRIP_OFF]
        cnts = tags[_STRIP_CNT]
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        row_bytes = w * spp
        out = bytearray()
        for si, (o, c) in enumerate(zip(offs, cnts)):
            rows = min(rps, h - si * rps)
            expected = rows * row_bytes
            strip = payload[o : o + c]
            if comp == 32773:
                out += _packbits_decode(strip, expected)
            else:
                if len(strip) < expected:
                    raise ValueError("tiff: truncated strip")
                out += strip[:expected]
        if len(out) < h * row_bytes:
            raise ValueError("tiff: missing strips")
        return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, spp)

    @staticmethod
    def decode_rgb(payload: bytes) -> np.ndarray:
        px = TiffCodec.decode_pixels(payload)
        if px.shape[2] == 1:
            return np.repeat(px, 3, axis=2)
        return px[:, :, :3]

    @staticmethod
    def resize(payload: bytes, width: int, height: int) -> bytes:
        """Nearest-neighbour pixel resize, re-encoded (thumbnail
        analogue, process.go:402-507)."""
        px = TiffCodec.decode_pixels(payload)
        h, w, _ = px.shape
        ri = (np.arange(height) * h // max(1, height)).clip(0, h - 1)
        ci = (np.arange(width) * w // max(1, width)).clip(0, w - 1)
        out = px[ri][:, ci]
        return encode_tiff(out[:, :, 0] if out.shape[2] == 1 else out)


def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits: maximal byte runs ≥ 3 become repeat packets
    (control 257-len), everything else literal packets of ≤ 128. Any
    split is valid PackBits; this one is deterministic."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literal(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literal(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literal(n)
    return bytes(out)


def encode_tiff(pixels: np.ndarray, *, packbits: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """Encode ``(h, w)``/``(h, w, 1)`` gray or ``(h, w, 3)`` RGB uint8
    as little-endian TIFF (the reference's Tiffsave shape,
    process.go:920-929). Default is the historical single-strip
    uncompressed layout (byte-identical to earlier rounds — golden
    corpus contract); ``packbits=True`` / ``rows_per_strip=r`` emit
    PackBits-compressed multi-strip files that exercise the decoder's
    strip walk and run-length path. Deterministic bytes either way."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if h == 0 or w == 0:
        raise ValueError("tiff: empty image")
    if spp not in (1, 3):
        raise ValueError("tiff: expected 1 or 3 channels")
    row_bytes = w * spp
    raw = px.tobytes()
    rps = h if rows_per_strip is None else max(1, min(h, rows_per_strip))
    nstrips = -(-h // rps)
    strips = []
    for s in range(nstrips):
        chunk = raw[s * rps * row_bytes : min((s + 1) * rps, h) * row_bytes]
        strips.append(_packbits_encode(chunk) if packbits else chunk)
    data = b"".join(strips)
    # layout: header(8) | strip data | value area (bits, strip arrays) | IFD
    data_off = 8
    offs = []
    cur = data_off
    for st in strips:
        offs.append(cur)
        cur += len(st)
    va = bytearray()
    va_base = data_off + len(data)
    bits_val = 8
    if spp == 3:
        bits_val = va_base + len(va)
        va += struct.pack("<HHH", 8, 8, 8)
    if nstrips > 1:
        off_val = va_base + len(va)
        va += struct.pack("<" + "I" * nstrips, *offs)
        cnt_val = va_base + len(va)
        va += struct.pack("<" + "I" * nstrips, *[len(st) for st in strips])
    else:
        off_val, cnt_val = offs[0], len(strips[0])
    ifd_off = va_base + len(va)
    tags = [
        (_W, _T_LONG, 1, w),
        (_H, _T_LONG, 1, h),
        (_BITS, _T_SHORT, spp, bits_val),
        (_COMP, _T_SHORT, 1, 32773 if packbits else 1),
        (_PHOTO, _T_SHORT, 1, 1 if spp == 1 else 2),   # BlackIsZero / RGB
        (_STRIP_OFF, _T_LONG, nstrips, off_val),
        (_SPP, _T_SHORT, 1, spp),
        (_ROWS_PER_STRIP, _T_LONG, 1, rps),
        (_STRIP_CNT, _T_LONG, nstrips, cnt_val),
        (_PLANAR, _T_SHORT, 1, 1),
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += data
    out += va
    out += struct.pack("<H", len(tags))
    for tag, typ, n, val in tags:
        if _TYPE_SIZE[typ] * n > 4 or typ == _T_LONG:
            packed = struct.pack("<I", val)        # inline LONG or offset
        else:
            packed = struct.pack("<HH", val, 0)
        out += struct.pack("<HHI", tag, typ, n) + packed
    out += struct.pack("<I", 0)                        # next IFD: none
    return bytes(out)
