"""VP8L (lossless WebP) codec tests: encoder round trips plus
HAND-BUILT bitstreams for every decoder feature the minimal encoder
never emits — the four transforms, color cache, LZ77 backward
references and meta-prefix group switching (the PNG filtered-stream
test strategy applied to VP8L)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imagor_ray.stages.webp import (
    WebpCodec, encode_webp, _LsbWriter, _write_flat8_code,
    _write_single_symbol_code,
)


def _header(bw, w, h, alpha=0):
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(alpha, 1)
    bw.bits(0, 3)


def _wrap(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _literal_codes(bw):
    """The minimal encoder's 5-code group: flat 8-bit literals."""
    _write_flat8_code(bw, 256, 280)
    _write_flat8_code(bw, 256, 256)
    _write_flat8_code(bw, 256, 256)
    _write_flat8_code(bw, 256, 256)
    _write_single_symbol_code(bw, 0)


def _literal(bw, a, r, g, b):
    bw.code(g, 8)
    bw.code(r, 8)
    bw.code(b, 8)
    bw.code(a, 8)


def _const_subimage(bw, a, r, g, b):
    """Entropy-coded image where every pixel is (a, r, g, b): five
    single-symbol codes → zero bits per pixel."""
    bw.bits(0, 1)                 # no color cache
    _write_single_symbol_code(bw, g)
    _write_single_symbol_code(bw, r)
    _write_single_symbol_code(bw, b)
    _write_single_symbol_code(bw, a)
    _write_single_symbol_code(bw, 0)


class TestRoundtrip:
    @pytest.mark.parametrize("h,w,c", [
        (4, 4, 3), (7, 5, 4), (1, 1, 3), (13, 9, 3), (2, 16, 4),
    ])
    def test_exact(self, h, w, c):
        rng = np.random.default_rng(h * 17 + w + c)
        px = rng.integers(0, 256, size=(h, w, c)).astype(np.uint8)
        data = encode_webp(px)
        meta = WebpCodec.decode_meta(data)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["has_alpha"] == (c == 4)
        np.testing.assert_array_equal(WebpCodec.decode_pixels(data), px)

    def test_gray_replicates(self):
        g = np.arange(30, dtype=np.uint8).reshape(5, 6)
        out = WebpCodec.decode_pixels(encode_webp(g))
        np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, 2))

    def test_deterministic_bytes(self):
        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        assert encode_webp(px) == encode_webp(px)


class TestTransforms:
    def test_subtract_green(self):
        # residual stream carries (r-g, g, b-g); decode must restore
        w, h = 2, 2
        px = np.array([[[10, 250, 30], [100, 7, 200]],
                       [[0, 0, 0], [255, 255, 1]]], dtype=np.uint8)
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(1, 1); bw.bits(2, 2)      # transform: subtract-green
        bw.bits(0, 1)                      # end of transforms
        bw.bits(0, 1)                      # no cache
        bw.bits(0, 1)                      # no meta
        _literal_codes(bw)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in px[y, x])
                _literal(bw, 255, (r - g) & 0xFF, g, (b - g) & 0xFF)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("mode", [1, 2, 7, 11, 12, 13])
    def test_predictor_modes(self, mode):
        # one 4-pixel-block predictor image, residuals derived from the
        # documented semantics ((0,0)=black, row0=L, col0=T, else mode)
        w, h = 4, 4
        rng = np.random.default_rng(mode)
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)

        def chan(p):
            return np.array([255, int(p[0]), int(p[1]), int(p[2])],
                            dtype=np.int64)

        from imagor_ray.stages.webp import _predict

        resid = np.zeros((h, w, 4), dtype=np.uint8)  # argb residuals
        for y in range(h):
            for x in range(w):
                cur = chan(px[y, x])
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0])
                elif y == 0:
                    pred = chan(px[y, x - 1])
                elif x == 0:
                    pred = chan(px[y - 1, x])
                else:
                    L = chan(px[y, x - 1]).astype(np.int32)
                    T = chan(px[y - 1, x]).astype(np.int32)
                    TL = chan(px[y - 1, x - 1]).astype(np.int32)
                    TR = (chan(px[y - 1, x + 1]).astype(np.int32)
                          if x + 1 < w else chan(px[y, 0]).astype(np.int32))
                    pred = _predict(mode, L, T, TL, TR)
                resid[y, x] = (cur - np.asarray(pred)) & 0xFF

        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(1, 1); bw.bits(0, 2)      # transform: predictor
        bw.bits(0, 3)                      # size_bits = 2 → 4px blocks
        _const_subimage(bw, 0, 0, mode, 0)  # 1×1 mode image
        bw.bits(0, 1)                      # end of transforms
        bw.bits(0, 1); bw.bits(0, 1)       # no cache, no meta
        _literal_codes(bw)
        for y in range(h):
            for x in range(w):
                a, r, g, b = (int(v) for v in resid[y, x])
                _literal(bw, a, r, g, b)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        np.testing.assert_array_equal(out, px, err_msg=f"mode {mode}")

    def test_color_transform(self):
        # green_to_red = 4 (blue channel of the transform element):
        # red' = red - ((int8)4 * (int8)green >> 5)
        w, h = 2, 2
        px = np.array([[[100, 200, 50], [30, 130, 7]],
                       [[255, 64, 0], [1, 255, 255]]], dtype=np.uint8)
        g2r = 4

        def delta(t, c):
            t8 = t - 256 if t > 127 else t
            c8 = c - 256 if c > 127 else c
            return (t8 * c8) >> 5

        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(1, 1); bw.bits(1, 2)      # transform: color
        bw.bits(0, 3)                      # 4px blocks → 1×1 element img
        _const_subimage(bw, 0, 0, 0, g2r)  # g2r rides the BLUE channel
        bw.bits(0, 1)
        bw.bits(0, 1); bw.bits(0, 1)
        _literal_codes(bw)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in px[y, x])
                _literal(bw, 255, (r - delta(g2r, g)) & 0xFF, g, b)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        np.testing.assert_array_equal(out, px)

    def test_color_indexing_packed(self):
        # 4-color palette → 2 bits/index, 4 indices per packed green
        w, h = 8, 2
        palette = np.array([
            [255, 10, 20, 30], [255, 40, 50, 60],
            [255, 70, 80, 90], [255, 200, 210, 220],
        ], dtype=np.int64)                      # argb rows
        idx = np.array([[0, 1, 2, 3, 3, 2, 1, 0],
                        [1, 1, 0, 0, 3, 3, 2, 2]])

        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(1, 1); bw.bits(3, 2)      # transform: color indexing
        bw.bits(3, 8)                      # 4 colors
        # palette sub-image: 4×1 literals, DELTA-coded per channel
        bw.bits(0, 1)                      # no cache
        _write_flat8_code(bw, 256, 280)
        _write_flat8_code(bw, 256, 256)
        _write_flat8_code(bw, 256, 256)
        _write_flat8_code(bw, 256, 256)
        _write_single_symbol_code(bw, 0)
        prev = np.zeros(4, dtype=np.int64)
        for row in palette:
            d = (row - prev) & 0xFF
            _literal(bw, int(d[0]), int(d[1]), int(d[2]), int(d[3]))
            prev = row
        bw.bits(0, 1)                      # end of transforms
        # main image at packed width 2: greens hold 4 2-bit indices
        bw.bits(0, 1); bw.bits(0, 1)
        _literal_codes(bw)
        for y in range(h):
            for gx in range(2):
                packed = 0
                for s in range(4):
                    packed |= int(idx[y, gx * 4 + s]) << (2 * s)
                _literal(bw, 255, 0, packed, 0)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        want = palette[idx][:, :, 1:]      # rgb
        np.testing.assert_array_equal(out, want.astype(np.uint8))

    def test_transform_stacking_subtract_green_then_predictor(self):
        # two transforms: stream order predictor THEN subtract-green
        # means inverses apply subtract-green first, predictor second
        w, h = 2, 1
        px = np.array([[[9, 17, 101], [55, 3, 255]]], dtype=np.uint8)
        # forward: p' = subtract_green(px); resid = p' - pred (row0: L)
        sg = px.astype(np.int64).copy()
        sg[:, :, 0] = (sg[:, :, 0] - sg[:, :, 1]) & 0xFF
        sg[:, :, 2] = (sg[:, :, 2] - sg[:, :, 1]) & 0xFF
        resid = sg.copy()
        resid[0, 1] = (sg[0, 1] - sg[0, 0]) & 0xFF   # L prediction
        resid[0, 0, 0] = sg[0, 0, 0]                  # (0,0): black pred
        resid[0, 0, 2] = sg[0, 0, 2]                  # (r,b −0; a −255)

        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(1, 1); bw.bits(0, 2)       # predictor
        bw.bits(0, 3)
        _const_subimage(bw, 0, 0, 1, 0)    # mode 1 (unused on row 0)
        bw.bits(1, 1); bw.bits(2, 2)       # subtract green
        bw.bits(0, 1)
        bw.bits(0, 1); bw.bits(0, 1)
        _literal_codes(bw)
        for x in range(w):
            r, g, b = (int(v) for v in resid[0, x])
            _literal(bw, 255 if x else 0, r, g, b)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        np.testing.assert_array_equal(out, px)


class TestEntropyFeatures:
    def _green_two_symbol_code(self, bw, sym_hi):
        """Green code with lengths {0: 1, sym_hi: 1} via the
        code-length code (sym_hi > 255 can't ride a simple code); uses
        the max-symbol shortcut so the reader stops after exactly the
        transmitted cl symbols instead of draining the alphabet."""
        # plan the zero runs between the two nonzero lengths
        runs = []
        zeros = sym_hi - 1
        while zeros > 0:
            if zeros >= 11:
                run = min(138, zeros)
                runs.append((18, run))
            else:
                run = max(3, zeros)
                runs.append((17, run))
            zeros -= run
        n_cl_symbols = 2 + len(runs)

        bw.bits(0, 1)                       # not simple
        bw.bits(15, 4)                      # num_code_lengths = 19
        # cl lengths: symbol 1 → 1, 17 → 2, 18 → 2
        lens = {17: 2, 18: 2, 1: 1}
        for i, sym in enumerate([17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8,
                                 9, 10, 11, 12, 13, 14, 15, 16]):
            bw.bits(lens.get(sym, 0), 3)
        bw.bits(1, 1)                       # max-symbol shortcut
        bw.bits(1, 3)                       # length_nbits = 4
        bw.bits(n_cl_symbols - 2, 4)        # max_symbol = n_cl_symbols
        # canonical cl: 1→code 0 (len 1); 17→code 2, 18→code 3 (len 2)
        bw.code(0, 1)                       # symbol 0: length 1
        for code17or18, run in runs:
            if code17or18 == 18:
                bw.code(3, 2)
                bw.bits(run - 11, 7)
            else:
                bw.code(2, 2)
                bw.bits(run - 3, 3)
        bw.code(0, 1)                       # sym_hi: length 1

    def test_color_cache_hit(self):
        w, h = 2, 1
        cache_bits = 2
        px_word = (255 << 24) | (7 << 16) | (0 << 8) | 9  # a r g b
        cache_sym = 256 + 24 + (
            (0x1E35A7BD * px_word) % (1 << 32) >> (32 - cache_bits))
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(0, 1)                       # no transforms
        bw.bits(1, 1); bw.bits(cache_bits, 4)   # color cache
        bw.bits(0, 1)                       # no meta
        self._green_two_symbol_code(bw, cache_sym)
        _write_single_symbol_code(bw, 7)    # red
        _write_single_symbol_code(bw, 9)    # blue
        _write_single_symbol_code(bw, 255)  # alpha
        _write_single_symbol_code(bw, 0)    # distance
        # pixel 0: literal green 0 (code 0, 1 bit) → inserts into cache
        bw.code(0, 1)
        # pixel 1: cache symbol (code 1, 1 bit)
        bw.code(1, 1)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        want = np.array([[[7, 0, 9], [7, 0, 9]]], dtype=np.uint8)
        np.testing.assert_array_equal(out, want)

    def test_lz77_plain_distance(self):
        # pixel 0 literal; then length-2 backref at distance 1 → three
        # identical pixels. dist 1 = dist_code 121 = prefix 13 + 5 bits
        w, h = 3, 1
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(0, 1)
        bw.bits(0, 1); bw.bits(0, 1)
        self._green_two_symbol_code(bw, 257)   # length-prefix code 1
        _write_single_symbol_code(bw, 42)   # red
        _write_single_symbol_code(bw, 43)   # blue
        _write_single_symbol_code(bw, 255)  # alpha
        _write_single_symbol_code(bw, 13)   # distance prefix 13
        bw.code(0, 1)                       # literal green 0
        bw.code(1, 1)                       # green symbol 257 → length 2
        bw.bits(24, 5)                      # dist extra: 96+24+1 = 121
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        want = np.tile(np.array([42, 0, 43], dtype=np.uint8), (1, 3, 1))
        np.testing.assert_array_equal(out, want)

    def test_dist_map_pins_spec_table(self):
        # the published table's first row, a mid-table row and the last
        # entries, verbatim from the spec's §"Distance Mapping" listing
        from imagor_ray.stages.webp import _DIST_MAP

        assert len(_DIST_MAP) == 120
        assert _DIST_MAP[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1),
                                 (0, 2), (2, 0), (1, 2), (-1, 2)]
        assert _DIST_MAP[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3),
                                    (-4, 3), (5, 0)]
        assert _DIST_MAP[96] == (8, 0)
        assert _DIST_MAP[-4:] == [(7, 7), (-7, 7), (8, 6), (8, 7)]

    def test_close_neighborhood_row_above(self):
        # dist_code 1 = (0, 1): copy the pixel directly above. Row 0 is
        # three literals; row 1 is one length-3 backref at dist = w.
        w, h = 3, 2
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(0, 1)                       # no transforms
        bw.bits(0, 1); bw.bits(0, 1)        # no cache, no meta
        self._green_two_symbol_code(bw, 258)  # length-prefix code 2 → 3
        _write_single_symbol_code(bw, 42)   # red
        _write_single_symbol_code(bw, 43)   # blue
        _write_single_symbol_code(bw, 255)  # alpha
        _write_single_symbol_code(bw, 0)    # dist prefix 0 → dist_code 1
        bw.code(0, 1); bw.code(0, 1); bw.code(0, 1)   # row-0 literals
        bw.code(1, 1)                       # green 258 → length 3
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        want = np.tile(np.array([42, 0, 43], dtype=np.uint8), (2, 3, 1))
        np.testing.assert_array_equal(out, want)

    def test_close_neighborhood_prev_pixel(self):
        # dist_code 2 = (1, 0) = the previous pixel — same output as
        # test_lz77_plain_distance's dist_code 121 (dist 1)
        w, h = 3, 1
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(0, 1)
        bw.bits(0, 1); bw.bits(0, 1)
        self._green_two_symbol_code(bw, 257)   # length-prefix 1 → 2
        _write_single_symbol_code(bw, 42)
        _write_single_symbol_code(bw, 43)
        _write_single_symbol_code(bw, 255)
        _write_single_symbol_code(bw, 1)    # dist prefix 1 → dist_code 2
        bw.code(0, 1)                       # literal
        bw.code(1, 1)                       # length 2
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        want = np.tile(np.array([42, 0, 43], dtype=np.uint8), (1, 3, 1))
        np.testing.assert_array_equal(out, want)

    def test_close_neighborhood_negative_dx_clamps(self):
        # dist_code 80 = (-7, 1): on a 3-wide image dist = 3 - 7 = -4,
        # which the spec clamps to 1 → behaves as previous-pixel
        w, h = 3, 1
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(0, 1)
        bw.bits(0, 1); bw.bits(0, 1)
        self._green_two_symbol_code(bw, 257)
        _write_single_symbol_code(bw, 42)
        _write_single_symbol_code(bw, 43)
        _write_single_symbol_code(bw, 255)
        _write_single_symbol_code(bw, 12)   # dist prefix 12: 65 + 5 bits
        bw.code(0, 1)
        bw.code(1, 1)
        bw.bits(15, 5)                      # 64 + 15 + 1 = dist_code 80
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        want = np.tile(np.array([42, 0, 43], dtype=np.uint8), (1, 3, 1))
        np.testing.assert_array_equal(out, want)

    def test_meta_prefix_group_switching(self):
        # 8×4 image, meta_bits=2 → 2×1 entropy image routing the left
        # 4×4 block to group 0 (green 10) and the right to group 1
        # (green 20); all codes single-symbol → zero pixel bits
        w, h = 8, 4
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.bits(0, 1)                       # no transforms
        bw.bits(0, 1)                       # no cache
        bw.bits(1, 1)                       # meta prefix present
        bw.bits(0, 3)                       # meta_bits = 2
        # entropy image 2×1: greens 0 and 1 (group ids)
        bw.bits(0, 1)                       # its own cache bit
        bw.bits(1, 1)                       # green: simple, 2 symbols
        bw.bits(1, 1)
        bw.bits(0, 1); bw.bits(0, 1)        # first symbol: 1-bit, =0
        bw.bits(1, 8)                       # second symbol: 1
        _write_single_symbol_code(bw, 0)    # red
        _write_single_symbol_code(bw, 0)    # blue
        _write_single_symbol_code(bw, 0)    # alpha
        _write_single_symbol_code(bw, 0)    # distance
        bw.code(0, 1)                       # meta px 0 → group 0
        bw.code(1, 1)                       # meta px 1 → group 1
        # group 0 codes then group 1 codes
        for green in (10, 20):
            _write_single_symbol_code(bw, green)
            _write_single_symbol_code(bw, 1)
            _write_single_symbol_code(bw, 2)
            _write_single_symbol_code(bw, 255)
            _write_single_symbol_code(bw, 0)
        out = WebpCodec.decode_pixels(_wrap(bw.done()))
        assert (out[:, :4, 1] == 10).all()
        assert (out[:, 4:, 1] == 20).all()
        assert (out[:, :, 0] == 1).all() and (out[:, :, 2] == 2).all()


class TestRobustness:
    def test_not_webp(self):
        with pytest.raises(ValueError):
            WebpCodec.decode_meta(b"RIFFxxxxWAVE")

    def test_lossy_vp8_gated(self):
        body = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        with pytest.raises(NotImplementedError, match="VP8L"):
            WebpCodec.decode_meta(payload)

    def test_truncated(self):
        data = encode_webp(np.zeros((4, 4, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            WebpCodec.decode_pixels(data[:30])

    def test_sniffs_as_webp(self):
        from imagor_ray.stages.codecs import sniff_media

        data = encode_webp(np.zeros((2, 2, 3), dtype=np.uint8))
        assert sniff_media(data) == "webp"
