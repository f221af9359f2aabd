"""Real PNG codec (round-4 verdict item 3): stdlib zlib + the five
scanline filters, no external libraries.

Coverage: round-trip exactness for gray / gray+alpha / RGB / RGBA,
decode of ALL FIVE filter types against hand-built filtered streams
(the encoder only emits filter 0, so filters 1-4 are constructed
manually per PNG spec §9 and must reconstruct the original pixels),
palette expansion, CRC rejection, NotImplementedError gates (16-bit,
Adam7), nearest-neighbour resize, sniffing, and the mixed real-media
corpus through the auto decode stage.

Reference parity: PNG is a core blob type in the reference
(blob.go:163-211 magic tables; export map process.go:16-30).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from imagor_ray.stages.codecs import (
    PngCodec,
    _png_chunk,
    _PNG_SIG,
    encode_png,
    sniff_media,
)


def _rand_px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# round-trip exactness per color type

@pytest.mark.parametrize("c,color_type", [(1, 0), (2, 4), (3, 2), (4, 6)])
def test_roundtrip_exact(c, color_type):
    px = _rand_px(23, 17, c, seed=c)
    payload = encode_png(px)
    assert sniff_media(payload) == "png"
    meta = PngCodec.decode_meta(payload)
    assert (meta["width"], meta["height"]) == (17, 23)
    assert meta["color_type"] == color_type
    assert meta["bit_depth"] == 8 and not meta["interlaced"]
    out = PngCodec.decode_pixels(payload)
    expect = px[:, :, None] if c == 1 else px
    np.testing.assert_array_equal(out, expect)


def test_roundtrip_edge_dims():
    for h, w in [(1, 1), (1, 64), (64, 1), (2, 3)]:
        px = _rand_px(h, w, 3, seed=h * 100 + w)
        np.testing.assert_array_equal(
            PngCodec.decode_pixels(encode_png(px)), px)


# ---------------------------------------------------------------------------
# all five scanline filters (hand-encoded per PNG spec §9)

def _paeth(a, b, c):
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    return b if pb_ <= pc_ else c


def _filter_rows(px: np.ndarray, ftype: int) -> bytes:
    """Apply one PNG filter type to every scanline (encoder side, from
    the spec's definitions) — ground truth for the decoder."""
    h, w, c = px.shape
    out = bytearray()
    prev = np.zeros((w, c), dtype=np.int32)
    for r in range(h):
        raw = px[r].astype(np.int32)
        line = np.zeros((w, c), dtype=np.int32)
        for x in range(w):
            left = raw[x - 1] if x > 0 else np.zeros(c, dtype=np.int32)
            up = prev[x]
            ul = prev[x - 1] if x > 0 else np.zeros(c, dtype=np.int32)
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = np.array([
                    _paeth(int(left[k]), int(up[k]), int(ul[k]))
                    for k in range(c)])
            line[x] = (raw[x] - pred) & 0xFF
        out.append(ftype)
        out += line.astype(np.uint8).tobytes()
        prev = raw
    return bytes(out)


def _build_png(w, h, color_type, idat_raw, extra_chunks=()):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _png_chunk(b"IHDR", ihdr)
    for ctype, data in extra_chunks:
        body += _png_chunk(ctype, data)
    body += _png_chunk(b"IDAT", zlib.compress(idat_raw))
    return _PNG_SIG + body + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c,color_type", [(1, 0), (3, 2), (4, 6)])
def test_decode_all_filters(ftype, c, color_type):
    px = _rand_px(9, 13, c, seed=ftype * 10 + c)
    px3 = px[:, :, None] if c == 1 else px
    payload = _build_png(13, 9, color_type, _filter_rows(px3, ftype))
    np.testing.assert_array_equal(PngCodec.decode_pixels(payload), px3)


def test_decode_mixed_filters_per_row():
    """Rows may each use a different filter; chain Sub→Up→Avg→Paeth so
    every inter-row dependency is exercised."""
    px = _rand_px(8, 11, 3, seed=99)[:, :, :]
    h, w, c = px.shape
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int32)
    for r in range(h):
        ftype = r % 5
        one = _filter_rows_with_prev(px[r], prev, ftype)
        raw += one
        prev = px[r].astype(np.int32)
    payload = _build_png(w, h, 2, bytes(raw))
    np.testing.assert_array_equal(PngCodec.decode_pixels(payload), px)


def _filter_rows_with_prev(row: np.ndarray, prev: np.ndarray, ftype: int) -> bytes:
    w, c = row.shape
    raw = row.astype(np.int32)
    line = np.zeros((w, c), dtype=np.int32)
    for x in range(w):
        left = raw[x - 1] if x > 0 else np.zeros(c, dtype=np.int32)
        up = prev[x]
        ul = prev[x - 1] if x > 0 else np.zeros(c, dtype=np.int32)
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = np.array([
                _paeth(int(left[k]), int(up[k]), int(ul[k])) for k in range(c)])
        line[x] = (raw[x] - pred) & 0xFF
    return bytes([ftype]) + line.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# palette, errors, gates

def test_palette_expansion():
    plte = _rand_px(1, 16, 3, seed=5).reshape(16, 3)
    idx = _rand_px(6, 7, 1, seed=6) % 16  # (6, 7) index plane
    raw = bytearray()
    for r in range(6):
        raw.append(0)
        raw += idx[r].astype(np.uint8).tobytes()
    payload = _build_png(7, 6, 3, bytes(raw),
                         extra_chunks=[(b"PLTE", plte.tobytes())])
    out = PngCodec.decode_pixels(payload)
    np.testing.assert_array_equal(out, plte[idx])


def test_crc_mismatch_rejected():
    payload = bytearray(encode_png(_rand_px(4, 4, 3)))
    payload[40] ^= 0xFF  # corrupt inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        PngCodec.decode_pixels(bytes(payload))


def test_not_png_rejected():
    with pytest.raises(ValueError):
        PngCodec.decode_meta(b"JFIF not a png")


def test_16bit_gated():
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    p16 = (_PNG_SIG + _png_chunk(b"IHDR", ihdr16)
           + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (4 * (1 + 4 * 6))))
           + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="8-bit"):
        PngCodec.decode_pixels(p16)


class TestAdam7:
    """Adam7 interlacing (spec §8.2): 7 independent filtered sub-image
    passes, empty passes contributing zero bytes, scattered back by
    (x0, y0, xstep, ystep)."""

    @pytest.mark.parametrize("h,w,c", [
        (16, 16, 3), (13, 11, 1), (9, 21, 4), (5, 3, 2),
        (1, 1, 3),            # only pass 1 non-empty
        (2, 2, 1),            # passes 1, 6(?), 7... tiny-dim edge cases
        (8, 3, 3),
    ])
    def test_roundtrip(self, h, w, c):
        px = _rand_px(h, w, c, seed=h * 31 + w * 7 + c)
        data = encode_png(px, interlace=True)
        assert PngCodec.decode_meta(data)["interlaced"]
        want = px[:, :, None] if c == 1 else px
        np.testing.assert_array_equal(PngCodec.decode_pixels(data), want)

    def test_roundtrip_paeth_filtered_passes(self):
        px = _rand_px(20, 17, 3, seed=5)
        data = encode_png(px, interlace=True, paeth=True)
        np.testing.assert_array_equal(PngCodec.decode_pixels(data), px)

    def test_hand_built_mixed_filters_per_pass(self):
        # hand-build the IDAT stream: each pass filtered with a
        # DIFFERENT filter type (None/Sub/Up cycling), proving filters
        # reset and unfilter per pass, not per global scanline
        from imagor_ray.stages.codecs import _ADAM7

        h, w, ch = 12, 14, 3
        px = _rand_px(h, w, ch, seed=9)
        parts = []
        fcycle = [0, 1, 2, 0, 1, 2, 0]
        for (x0, y0, xs, ys), f in zip(_ADAM7, fcycle):
            sub = px[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            flat = sub.reshape(ph, pw * ch).astype(np.int16)
            rows = np.zeros((ph, 1 + pw * ch), dtype=np.uint8)
            rows[:, 0] = f
            if f == 0:
                rows[:, 1:] = flat
            elif f == 1:   # Sub: subtract left neighbour (per channel)
                left = np.zeros_like(flat)
                left[:, ch:] = flat[:, :-ch]
                rows[:, 1:] = (flat - left) & 0xFF
            else:          # Up: subtract previous row of the SAME pass
                up = np.zeros_like(flat)
                up[1:] = flat[:-1]
                rows[:, 1:] = (flat - up) & 0xFF
            parts.append(rows.tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        data = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
                + _png_chunk(b"IEND", b""))
        np.testing.assert_array_equal(PngCodec.decode_pixels(data), px)

    def test_truncated_interlaced_rejected(self):
        px = _rand_px(16, 16, 3, seed=2)
        data = bytearray(encode_png(px, interlace=True))
        # corrupt: drop the last pass by shrinking the zlib body
        import zlib as _z
        # rebuild with a short stream
        from imagor_ray.stages.codecs import _ADAM7
        parts = []
        for x0, y0, xs, ys in _ADAM7[:-1]:    # omit pass 7 entirely
            sub = px[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            rows = np.zeros((ph, 1 + pw * 3), dtype=np.uint8)
            rows[:, 1:] = sub.reshape(ph, pw * 3)
            parts.append(rows.tobytes())
        ihdr = struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 1)
        bad = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", _z.compress(b"".join(parts)))
               + _png_chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            PngCodec.decode_pixels(bad)


# ---------------------------------------------------------------------------
# resize + decode_rgb + corpus

def test_resize_nearest_neighbour_exact():
    px = _rand_px(10, 8, 3, seed=3)
    out = PngCodec.decode_pixels(PngCodec.resize(encode_png(px), 4, 5))
    ri = (np.arange(5) * 10 // 5).clip(0, 9)
    ci = (np.arange(4) * 8 // 4).clip(0, 7)
    np.testing.assert_array_equal(out, px[ri][:, ci])


def test_decode_rgb_maps_all_color_types():
    g = _rand_px(5, 5, 1, seed=11)
    rgb = PngCodec.decode_rgb(encode_png(g))
    assert rgb.shape == (5, 5, 3)
    np.testing.assert_array_equal(rgb[:, :, 0], g)
    np.testing.assert_array_equal(rgb[:, :, 1], g)
    rgba = _rand_px(5, 5, 4, seed=12)
    np.testing.assert_array_equal(
        PngCodec.decode_rgb(encode_png(rgba)), rgba[:, :, :3])


def test_real_media_corpus_includes_png_and_decodes(ray_session):
    import ray.data as rd

    from imagor_ray.stages.multimodal import (
        MediaDecodeStage, MediaResizeStage, gen_real_media,
    )

    tbl = gen_real_media(18)
    kinds = [sniff_media(p.as_py()) for p in tbl["payload"]]
    assert {"wav", "bmp", "png"} <= set(kinds)
    out = (rd.from_arrow(tbl)
           .map_batches(MediaResizeStage(width=8, height=8, codec="auto"),
                        batch_format="pyarrow", batch_size=8)
           .map_batches(MediaDecodeStage(codec="auto"),
                        batch_format="pyarrow", batch_size=8)
           .to_pandas())
    assert len(out) == 18
    png_rows = out[[k == "png" for k in kinds]]
    assert (png_rows["width"] <= 8).all() and (png_rows["width"] >= 1).all()


class TestPaethEncoder:
    """Opt-in filter-4 predictive encoding (session 4)."""

    def test_roundtrip_all_channel_counts(self):
        import numpy as np

        from imagor_ray.stages.codecs import PngCodec, encode_png

        rng = np.random.default_rng(11)
        for shape in [(5, 7), (16, 16, 3), (3, 3, 4), (1, 1), (9, 2, 2)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            got = PngCodec.decode_pixels(encode_png(px, paeth=True))
            want = px if px.ndim == 3 else px[:, :, None]
            np.testing.assert_array_equal(got, want)

    def test_prediction_compresses_smooth_content(self):
        import numpy as np

        from imagor_ray.stages.codecs import encode_png

        grad = np.add.outer(np.arange(256), np.arange(256)).astype(np.uint8)
        assert len(encode_png(grad, paeth=True)) < len(encode_png(grad)) / 1.5

    def test_default_stays_filter0(self):
        import numpy as np

        from imagor_ray.stages.codecs import encode_png

        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        data = encode_png(px)
        import zlib
        raw = zlib.decompress(
            data[data.index(b"IDAT") + 4: data.rindex(b"IEND") - 8])
        assert all(raw[r * 9] == 0 for r in range(8))
