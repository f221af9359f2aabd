"""Baseline TIFF codec — pure struct/numpy, no external libraries.

Coverage: exact round trips (gray/RGB), hand-built big-endian,
multi-strip and PackBits streams (decoder-only features), the
NotImplementedError gates (16-bit, planar, tiled, LZW), robustness,
sniffing, resize, and the real-media corpus through the auto stages.

Reference parity: TIFF blob type + content-type rows blob.go:36,
445, 475-476; Tiffsave export path process.go:920-929.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imagor_ray.stages.codecs import TiffCodec, encode_tiff, sniff_media


def _rand(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


class TestRoundTrip:
    def test_gray_exact(self):
        px = _rand(17, 23, 1)
        got = TiffCodec.decode_pixels(encode_tiff(px))
        np.testing.assert_array_equal(got[:, :, 0], px)

    def test_rgb_exact(self):
        px = _rand(9, 31, 3, seed=1)
        got = TiffCodec.decode_pixels(encode_tiff(px))
        np.testing.assert_array_equal(got, px)

    def test_meta(self):
        m = TiffCodec.decode_meta(encode_tiff(_rand(5, 7, 3)))
        assert m == {"width": 7, "height": 5, "channels": 3,
                     "compression": "none"}

    def test_resize(self):
        out = TiffCodec.resize(encode_tiff(_rand(20, 30, 3)), 15, 10)
        m = TiffCodec.decode_meta(out)
        assert (m["width"], m["height"]) == (15, 10)

    def test_sniff(self):
        assert sniff_media(encode_tiff(_rand(4, 4, 1))) == "tiff"
        assert sniff_media(b"MM\x00\x2a" + b"\x00" * 8) == "tiff"


def _hand_tiff(px: np.ndarray, endian: str, rows_per_strip: int,
               packbits: bool = False, extra_tags=()):
    """Hand-build a TIFF with chosen endianness/strips/compression."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = px[y0 : y0 + rows_per_strip].tobytes()
        if packbits:
            # naive PackBits: emit literal runs of <=128 bytes
            enc = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i : i + 128]
                enc.append(len(chunk) - 1)
                enc += chunk
            raw = bytes(enc)
        strips.append(raw)
    data = b"".join(strips)
    data_off = 8
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    n_strips = len(strips)

    def arr_tag(tag, typ, vals, inline_fmt, arrays):
        size = (2 if typ == 3 else 4) * len(vals)
        if size <= 4:
            pad = b"\x00" * (4 - size)
            return (tag, typ, len(vals),
                    struct.pack(endian + inline_fmt * len(vals), *vals) + pad)
        arrays.append((tag, typ, vals))
        return None

    arrays: list = []
    tags = [
        (256, 4, 1, struct.pack(endian + "I", w)),
        (257, 4, 1, struct.pack(endian + "I", h)),
        (259, 3, 1, struct.pack(endian + "HH", 32773 if packbits else 1, 0)),
        (262, 3, 1, struct.pack(endian + "HH", 1 if spp == 1 else 2, 0)),
        (277, 3, 1, struct.pack(endian + "HH", spp, 0)),
        (278, 4, 1, struct.pack(endian + "I", rows_per_strip)),
        (284, 3, 1, struct.pack(endian + "HH", 1, 0)),
    ]
    t = arr_tag(258, 3, [8] * spp, "H", arrays)
    if t:
        tags.append(t)
    t = arr_tag(273, 4, offs, "I", arrays)
    if t:
        tags.append(t)
    t = arr_tag(279, 4, [len(s) for s in strips], "I", arrays)
    if t:
        tags.append(t)
    tags.extend(extra_tags)

    # place overflow arrays after the IFD
    n_tags = len(tags) + len(arrays)
    arr_off = ifd_off + 2 + 12 * n_tags + 4
    arr_bytes = b""
    for tag, typ, vals in arrays:
        fmt = "H" if typ == 3 else "I"
        tags.append((tag, typ, len(vals), struct.pack(endian + "I", arr_off)))
        arr_bytes += struct.pack(endian + fmt * len(vals), *vals)
        arr_off += (2 if typ == 3 else 4) * len(vals)

    out = bytearray()
    out += (b"II" if endian == "<" else b"MM")
    out += struct.pack(endian + "HI", 42, ifd_off)
    out += data
    out += struct.pack(endian + "H", len(tags))
    for tag, typ, n, packed in sorted(tags):
        out += struct.pack(endian + "HHI", tag, typ, n) + packed
    out += struct.pack(endian + "I", 0)
    out += arr_bytes
    return bytes(out)


class TestDecoderOnlyFeatures:
    def test_big_endian(self):
        px = _rand(6, 9, 3, seed=2)
        got = TiffCodec.decode_pixels(_hand_tiff(px, ">", rows_per_strip=6))
        np.testing.assert_array_equal(got, px)

    def test_multi_strip(self):
        px = _rand(13, 7, 3, seed=3)
        got = TiffCodec.decode_pixels(_hand_tiff(px, "<", rows_per_strip=4))
        np.testing.assert_array_equal(got, px)

    def test_packbits_literal_runs(self):
        px = _rand(5, 11, 1, seed=4)
        data = _hand_tiff(px, "<", rows_per_strip=2, packbits=True)
        assert TiffCodec.decode_meta(data)["compression"] == "packbits"
        np.testing.assert_array_equal(
            TiffCodec.decode_pixels(data)[:, :, 0], px)

    def test_packbits_repeat_runs(self):
        from imagor_ray.stages.tiff import _packbits_decode

        # 257-129 = 128 repeats of 0xAB, then a 3-byte literal
        enc = bytes([129, 0xAB, 2, 1, 2, 3])
        out = _packbits_decode(enc, 131)
        assert out == b"\xab" * 128 + b"\x01\x02\x03"


class TestGates:
    def test_16bit_gate(self):
        px = _rand(4, 4, 1)
        data = bytearray(_hand_tiff(px, "<", rows_per_strip=4))
        # rewrite BitsPerSample value 8 -> 16 (tag 258, inline SHORT)
        i = data.find(struct.pack("<HHI", 258, 3, 1))
        data[i + 8 : i + 10] = struct.pack("<H", 16)
        with pytest.raises(NotImplementedError, match="8-bit"):
            TiffCodec.decode_meta(bytes(data))

    def test_tiled_gate(self):
        px = _rand(4, 4, 1)
        data = _hand_tiff(px, "<", rows_per_strip=4,
                          extra_tags=[(322, 4, 1, struct.pack("<I", 16))])
        with pytest.raises(NotImplementedError, match="tiled"):
            TiffCodec.decode_meta(data)

    def test_lzw_gate(self):
        px = _rand(4, 4, 1)
        data = bytearray(_hand_tiff(px, "<", rows_per_strip=4))
        i = data.find(struct.pack("<HHI", 259, 3, 1))
        data[i + 8 : i + 10] = struct.pack("<H", 5)     # LZW
        with pytest.raises(NotImplementedError, match="compression"):
            TiffCodec.decode_meta(bytes(data))

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            TiffCodec.decode_meta(b"II\x2b\x00" + b"\x00" * 8)
        with pytest.raises(ValueError):
            TiffCodec.decode_meta(b"XX\x2a\x00" + b"\x00" * 8)

    def test_truncated_strip(self):
        data = encode_tiff(_rand(8, 8, 3))
        # IFD sits at the end; chop pixel data but keep header intact
        with pytest.raises((ValueError, struct.error, IndexError)):
            TiffCodec.decode_pixels(data[:40])


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=32),
    w=st.integers(min_value=1, max_value=32),
    c=st.sampled_from([1, 3]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_property_roundtrip(h, w, c, seed):
    px = _rand(h, w, c, seed)
    got = TiffCodec.decode_pixels(encode_tiff(px))
    np.testing.assert_array_equal(got, px if c == 3 else px[:, :, None])


class TestRayIntegration:
    def test_corpus_has_tiff_and_decodes(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import MediaDecodeStage, gen_real_media

        tbl = gen_real_media(32)
        kinds = [sniff_media(p) for p in tbl["payload"].to_pylist()]
        assert "tiff" in kinds
        out = (
            rd.from_arrow(tbl)
            .map_batches(MediaDecodeStage(codec="auto"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas().sort_values("media_id")
        )
        tiff_rows = out[[k == "tiff" for k in kinds]]
        assert (tiff_rows["width"] > 0).all()
        assert (tiff_rows["channels"] == 3).all()


class TestPackBitsEncoder:
    """Round-4 session-4: PackBits encoder + multi-strip muxer."""

    def test_codec_roundtrip_packbits_multistrip(self):
        for h, w, c in [(13, 7, 1), (16, 8, 3), (1, 5, 1), (9, 3, 3)]:
            px = _rand(h, w, c, seed=h * 100 + w)
            data = encode_tiff(px, packbits=True, rows_per_strip=4)
            meta = TiffCodec.decode_meta(data)
            assert meta["compression"] == "packbits"
            got = TiffCodec.decode_pixels(data)
            np.testing.assert_array_equal(got, px if c == 3 else px[:, :, None])

    def test_repeat_packets_compress_runs(self):
        flat = np.zeros((16, 64), dtype=np.uint8)   # all-zero → pure runs
        data = encode_tiff(flat, packbits=True, rows_per_strip=4)
        assert len(data) < flat.size // 4
        np.testing.assert_array_equal(TiffCodec.decode_pixels(data),
                                      flat[:, :, None])

    def test_literal_packets_on_incompressible(self):
        px = _rand(8, 128, 1, seed=3)
        data = encode_tiff(px, packbits=True, rows_per_strip=2)
        np.testing.assert_array_equal(TiffCodec.decode_pixels(data),
                                      px[:, :, None])

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(min_value=0, max_value=2**31),
           n=st.integers(min_value=0, max_value=700))
    def test_packbits_stream_roundtrip(self, seed, n):
        from imagor_ray.stages.tiff import _packbits_decode, _packbits_encode

        rng = np.random.default_rng(seed)
        # mixed runs + noise, including >128-length runs
        raw = b"".join(
            bytes([rng.integers(0, 256)]) * int(rng.integers(1, 200))
            if rng.random() < 0.5
            else rng.integers(0, 256, size=int(rng.integers(1, 50)),
                              dtype=np.uint8).tobytes()
            for _ in range(max(1, n // 100))
        )[:max(1, n)]
        assert _packbits_decode(_packbits_encode(raw), len(raw)) == raw

    def test_default_layout_unchanged(self):
        """The no-kwarg encoder must keep the historical single-strip
        uncompressed byte layout (golden-corpus contract): data at
        offset 8, inline strip tags, COMP=1."""
        px = _rand(4, 6, 1, seed=9)
        data = encode_tiff(px)
        assert data[8:8 + 24] == px.tobytes()
        meta = TiffCodec.decode_meta(data)
        assert meta["compression"] == "none"
