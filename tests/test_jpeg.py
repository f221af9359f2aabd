"""Real baseline JPEG codec — pure numpy/stdlib (no external libraries).

Coverage: batch DCT/IDCT inversion, quality-curve table scaling, the
lossless witness (constant 8×8 tiles at q=100 round-trip bit-exactly
through the full lossy pipeline), PSNR floors for smooth content at
high quality, 4:2:0 subsampling, restart markers, marker-stream
robustness (truncation, progressive/SOF2 gate, missing SOI), sniffing,
the mixed real-media corpus through the auto decode/detect stages, and
the oracle-shaped sha-tile round trip used by the catalog entry.

Reference parity: JPEG heads the reference's magic table
(blob.go:163-211) and export map (process.go:16-30); its published
benchmark headline is JPEG throughput (docs/docs/benchmarks.mdx:206).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from imagor_ray.stages.codecs import JpegCodec, encode_jpeg, sniff_media
from imagor_ray.stages import jpeg as J


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def _smooth(h, w, seed=0):
    x = np.linspace(0, 6 * np.pi, w)
    y = np.linspace(0, 4 * np.pi, h)
    return np.clip(
        127 + 80 * np.sin(x + seed)[None, :] * np.cos(y)[:, None], 0, 255
    ).astype(np.uint8)


class TestTransforms:
    def test_dct_idct_inverts(self):
        rng = np.random.default_rng(1)
        blocks = rng.integers(0, 256, (32, 8, 8), dtype=np.uint8)
        ones = np.ones((8, 8), dtype=np.int64)
        back = J._dequant_idct(J._fdct_quant(blocks, ones), ones)
        # all-ones quant: only float round-off, at most off-by-one
        assert np.abs(back.astype(int) - blocks.astype(int)).max() <= 1

    def test_quality_curve(self):
        assert (J._scaled_quant(J._QUANT_LUMA, 100) == 1).all()
        assert (J._scaled_quant(J._QUANT_LUMA, 50) == J._QUANT_LUMA).all()
        lo = J._scaled_quant(J._QUANT_LUMA, 10)
        assert (lo >= J._QUANT_LUMA).all() and lo.max() <= 255

    def test_zigzag_is_permutation(self):
        assert sorted(J._ZZ.tolist()) == list(range(64))
        assert J._ZZ[0] == 0 and J._ZZ[1] == 1 and J._ZZ[2] == 8


class TestLosslessWitness:
    """Constant 8×8 tiles at q=100 are DC-only with all-ones quant →
    decode(encode(x)) == x exactly, certifying huffman + framing."""

    def test_uniform_exact(self):
        img = np.full((24, 40), 137, dtype=np.uint8)
        got = JpegCodec.decode_pixels(encode_jpeg(img, 100))
        np.testing.assert_array_equal(got[:, :, 0], img)

    def test_random_tiles_exact(self):
        rng = np.random.default_rng(7)
        tiles = rng.integers(0, 256, (5, 9), dtype=np.uint8)
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
        got = JpegCodec.decode_pixels(encode_jpeg(img, 100))[:, :, 0]
        np.testing.assert_array_equal(got, img)

    def test_tiles_with_edge_padding_exact(self):
        rng = np.random.default_rng(8)
        tiles = rng.integers(0, 256, (4, 6), dtype=np.uint8)
        img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:29, :45]
        got = JpegCodec.decode_pixels(encode_jpeg(img, 100))[:, :, 0]
        np.testing.assert_array_equal(got, img)

    def test_sha_tile_oracle_shape(self):
        """The exact transform the media_jpeg_roundtrip entry runs."""
        digest = hashlib.sha256(b"some document text").hexdigest()
        vals = np.frombuffer(digest.encode("ascii"), dtype=np.uint8)
        img = np.repeat(np.repeat(vals.reshape(4, 16), 8, 0), 8, 1)
        px = JpegCodec.decode_pixels(encode_jpeg(img, 100))[:, :, 0]
        assert px[::8, ::8].reshape(-1).tobytes().decode("ascii") == digest


class TestLossyQuality:
    def test_smooth_gray_high_quality(self):
        img = _smooth(48, 64)
        assert _psnr(
            JpegCodec.decode_pixels(encode_jpeg(img, 90))[:, :, 0], img
        ) > 38

    def test_rgb_444(self):
        img = _smooth(33, 50)
        rgb = np.stack([img, np.roll(img, 5, 0), np.roll(img, 9, 1)], -1)
        data = encode_jpeg(rgb, 95)
        meta = JpegCodec.decode_meta(data)
        assert (meta["width"], meta["height"], meta["channels"]) == (50, 33, 3)
        assert _psnr(JpegCodec.decode_pixels(data), rgb) > 35

    def test_rgb_420_subsampled(self):
        img = _smooth(33, 50)
        rgb = np.stack([img, img, img], -1)   # gray-in-RGB: chroma flat
        data = encode_jpeg(rgb, 95, subsample=True)
        meta = JpegCodec.decode_meta(data)
        assert meta["subsampling"] == "22x11x11"
        # flat chroma loses nothing to 2x2 decimation
        assert _psnr(JpegCodec.decode_pixels(data), rgb) > 35

    def test_lower_quality_smaller_payload(self):
        img = _smooth(48, 64)
        assert len(encode_jpeg(img, 30)) < len(encode_jpeg(img, 90))

    def test_restart_markers_equal_plain(self):
        img = _smooth(33, 50)
        rgb = np.stack([img, np.roll(img, 3, 0), img], -1)
        plain = JpegCodec.decode_pixels(encode_jpeg(rgb, 92))
        rst = JpegCodec.decode_pixels(encode_jpeg(rgb, 92, restart_interval=3))
        np.testing.assert_array_equal(plain, rst)
        assert b"\xff\xd0" in encode_jpeg(rgb, 92, restart_interval=3)


class TestRobustness:
    def test_truncated_raises(self):
        data = encode_jpeg(_smooth(16, 16), 90)
        with pytest.raises((ValueError, Exception)):
            JpegCodec.decode_pixels(data[: len(data) // 2])

    def test_missing_soi(self):
        with pytest.raises(ValueError):
            JpegCodec.decode_meta(b"\x00\x01\x02\x03")

    def test_progressive_gate(self):
        data = bytearray(encode_jpeg(_smooth(16, 16), 90))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2                      # rewrite SOF0 -> SOF2
        with pytest.raises(NotImplementedError, match="progressive"):
            JpegCodec.decode_meta(bytes(data))

    def test_sniff(self):
        assert sniff_media(encode_jpeg(_smooth(8, 8), 75)) == "jpeg"

    def test_resize_roundtrip(self):
        data = encode_jpeg(_smooth(32, 48), 95)
        out = JpegCodec.resize(data, 24, 16)
        meta = JpegCodec.decode_meta(out)
        assert (meta["width"], meta["height"]) == (24, 16)


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
    quality=st.integers(min_value=1, max_value=100),
    color=st.booleans(),
)
def test_property_any_dims_decode(h, w, seed, quality, color):
    """Arbitrary dims/quality/content: encode->decode never crashes and
    preserves shape."""
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    got = JpegCodec.decode_pixels(encode_jpeg(px, quality))
    assert got.shape == (h, w, 3 if color else 1)


class TestRayIntegration:
    def test_media_decode_stage_auto_jpeg(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import MediaDecodeStage, gen_real_media

        tbl = gen_real_media(16)
        kinds = [sniff_media(p) for p in tbl["payload"].to_pylist()]
        assert "jpeg" in kinds                  # corpus carries jpeg rows
        out = (
            rd.from_arrow(tbl)
            .map_batches(MediaDecodeStage(codec="auto"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas().sort_values("media_id")
        )
        jpeg_rows = out[[k == "jpeg" for k in kinds]]
        assert (jpeg_rows["width"] > 0).all()
        assert set(jpeg_rows["channels"]) <= {1, 3}

    def test_media_jpeg_roundtrip_matches_digests(self, ray_session):
        import duckdb

        from imagor_ray.stages.multimodal import media_jpeg_roundtrip

        sf = "/root/testdata/sf0.001"
        got = media_jpeg_roundtrip(sf).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        exp = con.execute(
            f"SELECT doc_id, sha256(text) AS recovered_sha "
            f"FROM '{sf}/documents.parquet' ORDER BY doc_id"
        ).df()
        assert got["recovered_sha"].tolist() == exp["recovered_sha"].tolist()
