"""Real GIF codec — pure stdlib/numpy LZW, no external libraries.

Coverage: LZW round trips (random, long runs, table-full resets),
single- and multi-frame exactness over the gray palette, hand-built
streams for decoder-only features (interlace, local color tables,
transparency + disposal compositing), marker robustness, sniffing,
all-frames resize, the real-media corpus (animated GIF as the VIDEO
rows) through the auto decode/frame-sample stages, and the
oracle-shaped multi-frame byte recovery used by the catalog entry.

Reference parity: GIF87a/GIF89a head rows of the reference's magic
table (blob.go:163-211); page(n)/max_frames(n) (process.go:380-382,
366-368) exist for exactly this format's animation support.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imagor_ray.stages.codecs import GifCodec, encode_gif, sniff_media
from imagor_ray.stages import gif as G


def _gray_rgb(a: np.ndarray) -> np.ndarray:
    return np.repeat(a[..., None], 3, axis=-1)


class TestLzw:
    def test_random_roundtrip(self):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 5000, dtype=np.uint8)
        enc = G._lzw_encode(8, data)
        np.testing.assert_array_equal(G._lzw_decode(8, enc, len(data)), data)

    def test_runs_compress_and_roundtrip(self):
        data = np.repeat(np.arange(40, dtype=np.uint8), 200)
        enc = G._lzw_encode(8, data)
        assert len(enc) < len(data) // 4
        np.testing.assert_array_equal(G._lzw_decode(8, enc, len(data)), data)

    def test_table_full_reset(self):
        # high-entropy stream long enough to exhaust the 4096-entry table
        rng = np.random.default_rng(4)
        data = rng.integers(0, 256, 60_000, dtype=np.uint8)
        enc = G._lzw_encode(8, data)
        np.testing.assert_array_equal(G._lzw_decode(8, enc, len(data)), data)

    def test_small_code_size(self):
        data = np.array([0, 1, 2, 3, 0, 1, 2, 3, 1, 1, 0], dtype=np.uint8)
        enc = G._lzw_encode(2, data)
        np.testing.assert_array_equal(G._lzw_decode(2, enc, len(data)), data)


class TestRoundTrip:
    def test_single_frame_exact(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (23, 37), dtype=np.uint8)
        got = GifCodec.decode_frames(encode_gif(img))
        assert got.shape == (1, 23, 37, 3)
        np.testing.assert_array_equal(got[0], _gray_rgb(img))

    def test_animation_exact_in_order(self):
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (6, 16, 20), dtype=np.uint8)
        got = GifCodec.decode_frames(encode_gif(frames))
        assert got.shape == (6, 16, 20, 3)
        for i in range(6):
            np.testing.assert_array_equal(got[i], _gray_rgb(frames[i]))

    def test_meta(self):
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 256, (4, 10, 30), dtype=np.uint8)
        meta = GifCodec.decode_meta(encode_gif(frames))
        assert meta == {"width": 30, "height": 10, "n_frames": 4, "channels": 3}

    def test_first_frame_is_page_one(self):
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (3, 8, 8), dtype=np.uint8)
        np.testing.assert_array_equal(
            GifCodec.decode_pixels(encode_gif(frames)), _gray_rgb(frames[0]))

    def test_resize_all_frames(self):
        rng = np.random.default_rng(6)
        frames = rng.integers(0, 256, (5, 16, 24), dtype=np.uint8)
        out = GifCodec.resize(encode_gif(frames), 12, 8)
        meta = GifCodec.decode_meta(out)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (12, 8, 5)


def _hand_gif(w, h, indices, palette, interlace=False, transparent=None,
              extra_frames=()):
    """Build a GIF with a LOCAL color table (decoder-only feature)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)       # no GCT
    frames = [(indices, transparent, 1)] + list(extra_frames)
    for idx, trans, disposal in frames:
        if trans is not None or disposal:
            flags = (disposal << 2) | (1 if trans is not None else 0)
            out += b"\x21\xf9" + bytes([4, flags, 0, 0, trans or 0, 0])
        packed = 0x80 | (0x40 if interlace else 0) | 7   # LCT, 256 entries
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed)
        out += palette.tobytes()
        out.append(8)
        out += G._sub_blocks(G._lzw_encode(8, idx.reshape(-1)))
    out += b"\x3b"
    return bytes(out)


class TestDecoderOnlyFeatures:
    def test_local_color_table(self):
        rng = np.random.default_rng(7)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (9, 11), dtype=np.uint8)
        got = GifCodec.decode_frames(_hand_gif(11, 9, idx, pal))
        np.testing.assert_array_equal(got[0], pal[idx])

    def test_interlaced(self):
        rng = np.random.default_rng(8)
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        img = rng.integers(0, 256, (13, 7), dtype=np.uint8)
        # store rows in interlace order; decoder must undo it
        order = []
        for start, step in G._INTERLACE_PASSES:
            order.extend(range(start, 13, step))
        stored = img[np.array(order)]
        got = GifCodec.decode_frames(
            _hand_gif(7, 13, stored, pal, interlace=True))
        np.testing.assert_array_equal(got[0], _gray_rgb(img))

    def test_transparency_composites_over_previous(self):
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        base = np.full((4, 4), 10, dtype=np.uint8)
        overlay = np.full((4, 4), 99, dtype=np.uint8)
        overlay[0, :] = 7                                 # index 7 transparent
        got = GifCodec.decode_frames(_hand_gif(
            4, 4, base, pal, extra_frames=[(overlay, 7, 1)]))
        assert got.shape[0] == 2
        np.testing.assert_array_equal(got[1][0, :, 0], base[0, :])   # kept
        np.testing.assert_array_equal(got[1][1:, :, 0], overlay[1:, :])

    def test_disposal_restore_background(self):
        pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        f0 = np.full((3, 3), 50, dtype=np.uint8)
        f1 = np.full((3, 3), 200, dtype=np.uint8)
        f1[0, 0] = 9                                      # transparent cell
        got = GifCodec.decode_frames(_hand_gif(
            3, 3, f0, pal,
            extra_frames=[(f1, 9, 2), (np.full((3, 3), 9, np.uint8), 9, 1)]))
        # disposal=2 cleared frame 1's area to 0 before frame 2;
        # frame 2 is fully transparent so it shows the cleared canvas
        np.testing.assert_array_equal(got[2][:, :, 0], np.zeros((3, 3)))


class TestRobustness:
    def test_bad_signature(self):
        with pytest.raises(ValueError):
            GifCodec.decode_meta(b"NOTGIF" + b"\x00" * 16)

    def test_truncated_lzw(self):
        rng = np.random.default_rng(9)
        data = bytearray(encode_gif(rng.integers(0, 256, (16, 16), np.uint8)))
        # chop the payload mid-stream, re-terminate the sub-blocks
        cut = data[: len(data) // 2]
        with pytest.raises((ValueError, IndexError, struct.error)):
            GifCodec.decode_frames(bytes(cut))

    def test_sniff(self):
        assert sniff_media(encode_gif(np.zeros((4, 4), np.uint8))) == "gif"
        assert sniff_media(b"GIF87a" + b"\x00" * 8) == "gif"


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5),
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_property_gray_roundtrip(n, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    got = GifCodec.decode_frames(encode_gif(frames))
    assert got.shape == (n, h, w, 3)
    for i in range(n):
        np.testing.assert_array_equal(got[i, :, :, 0], frames[i])


class TestRayIntegration:
    def test_decode_stage_reports_real_frames(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import MediaDecodeStage, gen_real_media

        tbl = gen_real_media(32)
        kinds = [sniff_media(p) for p in tbl["payload"].to_pylist()]
        assert "gif" in kinds
        out = (
            rd.from_arrow(tbl)
            .map_batches(MediaDecodeStage(codec="auto"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas().sort_values("media_id")
        )
        gif_rows = out[[k == "gif" for k in kinds]]
        assert (gif_rows["media_type"] == "video").all()
        assert (gif_rows["n_frames"] >= 2).all()        # REAL frame counts

    def test_frame_sample_real_frames(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import frame_sample, gen_real_media

        tbl = gen_real_media(32)
        out = (
            rd.from_arrow(tbl)
            .map_batches(lambda b: frame_sample(b, every=2, codec="auto"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas()
        )
        vids = out[out["media_type"] == "video"]
        # at least one video has >1 sampled frame (frame counts 2..8)
        assert vids.groupby("media_id").size().max() > 1

    def test_media_gif_roundtrip_matches_hashes(self, ray_session):
        import duckdb

        from imagor_ray.stages.multimodal import media_gif_roundtrip

        sf = "/root/testdata/sf0.001"
        got = media_gif_roundtrip(sf).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        exp = con.execute(
            f"SELECT doc_id, sha256(text) AS sha256 "
            f"FROM '{sf}/documents.parquet' ORDER BY doc_id"
        ).df()
        assert got["sha256"].tolist() == exp["sha256"].tolist()
