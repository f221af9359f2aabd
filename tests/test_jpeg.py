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

from imagor_ray.stages.codecs import (
    JpegCodec, encode_jpeg, encode_jpeg_progressive, sniff_media,
)
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

    def test_relabeled_baseline_as_sof2_rejected(self):
        # a baseline stream relabeled SOF2 is MALFORMED progressive
        # (its single scan has Ss=0, Se=63 — a progressive DC scan must
        # have Se=0), not merely unsupported
        data = bytearray(encode_jpeg(_smooth(16, 16), 90))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2                      # rewrite SOF0 -> SOF2
        with pytest.raises(ValueError, match="Se"):
            JpegCodec.decode_pixels(bytes(data))

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


class TestProgressive:
    """SOF2 progressive decode (spectral selection + successive
    approximation, T.81 §G). The witness: quantized coefficients are
    shared with the baseline encoder, so progressive-decode ==
    baseline-decode BIT-FOR-BIT at the same quality — every scan kind
    (DC first/refine at Al=1, AC band first/refine with EOB runs) is on
    the path for any nontrivial image."""

    def _px(self, h, w, ch, seed=0, smooth=False):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
        if smooth:
            px = (px.astype(np.int64) // 4 + 96).astype(np.uint8)
        return px

    @pytest.mark.parametrize("h,w,ch,sub,q", [
        (16, 16, 1, False, 75),
        (24, 17, 3, False, 50),
        (33, 41, 3, True, 75),
        (13, 9, 1, False, 30),
        (21, 35, 3, True, 10),      # low q → long EOB runs
        (7, 7, 3, False, 100),
    ])
    def test_matches_baseline_decode(self, h, w, ch, sub, q):
        px = self._px(h, w, ch, seed=h * w + q, smooth=(q < 60))
        base = JpegCodec.decode_pixels(encode_jpeg(px, quality=q,
                                                   subsample=sub))
        prog = JpegCodec.decode_pixels(
            encode_jpeg_progressive(px, quality=q, subsample=sub))
        np.testing.assert_array_equal(base, prog)

    def test_constant_tiles_q100_exact(self):
        # the oracle witness, progressive edition: GRAY constant 8x8
        # tiles at q=100 are DC-only and decode losslessly (gray — the
        # RGB<->YCbCr rounding is outside the witness, as in
        # TestLosslessWitness)
        rng = np.random.default_rng(3)
        tiles = rng.integers(0, 256, size=(3, 4)).astype(np.uint8)
        px = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        out = JpegCodec.decode_pixels(
            encode_jpeg_progressive(px, 100))[:, :, 0]
        np.testing.assert_array_equal(px, out)

    def test_meta_reports_progressive_dims(self):
        px = self._px(19, 23, 3, seed=9)
        meta = JpegCodec.decode_meta(encode_jpeg_progressive(px, 80))
        assert (meta["width"], meta["height"]) == (23, 19)

    def test_eob_runs_span_blocks(self):
        # constant image → every AC band empty in every block → the AC
        # first pass is a single EOBn run covering all blocks; decode
        # must still be exact
        px = np.full((40, 40, 3), 130, dtype=np.uint8)
        out = JpegCodec.decode_pixels(encode_jpeg_progressive(px, 100))
        np.testing.assert_array_equal(px, out)

    def test_sniffs_as_jpeg(self):
        data = encode_jpeg_progressive(self._px(8, 8, 1), 75)
        assert sniff_media(data) == "jpeg"
