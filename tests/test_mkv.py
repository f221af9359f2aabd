"""Matroska/WebM (EBML) container codec tests — stages/mkv.py.

The demuxer walks real EBML (vints, master elements, multi-cluster
SimpleBlocks with relative timestamps); the muxer writes a spec-shaped
single-track file. Round-trips must be exact; hand-patched variants pin
the unknown-size, lacing and compressed-bitstream edges.
"""

import struct

import numpy as np
import pytest

from imagor_ray.stages.mkv import EBML_MAGIC, MkvCodec, encode_mkv
from imagor_ray.stages.codecs import sniff_media


def _frames(n=7, h=10, w=14, seed=11):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("bpc", [1, 3, 4, 99])
    def test_video_frames_exact(self, bpc):
        fr = _frames()
        p = encode_mkv(fr, fps=20, blocks_per_cluster=bpc)
        assert p[:4] == EBML_MAGIC
        assert sniff_media(p) == "mkv"
        np.testing.assert_array_equal(MkvCodec.decode_frames(p), fr)

    def test_meta_fields(self):
        m = MkvCodec.decode_meta(encode_mkv(_frames(), fps=20))
        assert (m["width"], m["height"], m["n_frames"]) == (14, 10, 7)
        assert m["codec_id"] == "V_UNCOMPRESSED"
        assert m["doc_type"] == "matroska"
        assert m["fps"] == 20.0
        assert m["duration_ms"] == 350
        assert m["n_tracks"] == 1

    @pytest.mark.parametrize("bpc", [1, 2])
    def test_opaque_blocks_variable_sizes(self, bpc):
        blocks = [b"hello", b"", b"x" * 999, b"\x00\xffzz"]
        p = encode_mkv(blocks, codec_id="V_VP9", doc_type="webm",
                       blocks_per_cluster=bpc)
        assert MkvCodec.extract_blocks(p) == blocks
        m = MkvCodec.decode_meta(p)
        assert m["doc_type"] == "webm"
        assert m["codec_id"] == "V_VP9"

    def test_resize_every_frame(self):
        p = MkvCodec.resize(encode_mkv(_frames(), fps=20), 7, 5)
        m = MkvCodec.decode_meta(p)
        assert (m["width"], m["height"], m["n_frames"]) == (7, 5, 7)
        assert m["fps"] == 20.0

    def test_decode_rgb_first_frame(self):
        fr = _frames()
        rgb = MkvCodec.decode_rgb(encode_mkv(fr))
        assert rgb.shape == (10, 14, 3)
        np.testing.assert_array_equal(rgb[:, :, 0], fr[0])


class TestEbmlEdgeCases:
    def test_unknown_size_segment(self):
        """An unknown-size Segment (all value bits set — how live
        streams mux) must still parse to the end of the file."""
        fr = _frames(n=3)
        p = encode_mkv(fr)
        seg_id = b"\x18\x53\x80\x67"
        idx = p.index(seg_id)
        size_off = idx + 4
        first = p[size_off]
        width = 8 - first.bit_length() + 1
        unknown = bytes([0xFF >> (width - 1) | (1 << (8 - width))]) \
            + b"\xff" * (width - 1)
        patched = p[:size_off] + unknown + p[size_off + width:]
        np.testing.assert_array_equal(MkvCodec.decode_frames(patched), fr)

    def test_compressed_bitstream_is_the_plug_point(self):
        blocks = [b"vp9-frame-0", b"vp9-frame-1"]
        p = encode_mkv(blocks, codec_id="V_VP9", doc_type="webm")
        assert MkvCodec.extract_blocks(p) == blocks  # demux is real
        with pytest.raises(NotImplementedError):
            MkvCodec.decode_frames(p)

    def test_laced_block_rejected(self):
        """This muxer never laces; a hand-patched lacing flag must be
        rejected loudly, not silently mis-split."""
        p = encode_mkv(np.zeros((1, 4, 4), dtype=np.uint8))
        blk_id = b"\xa3"
        idx = p.rindex(blk_id)
        # SimpleBlock body: vint size, then track vint, s16 ts, flags
        size_off = idx + 1
        width = 8 - p[size_off].bit_length() + 1
        flags_off = size_off + width + 1 + 2
        patched = p[:flags_off] + bytes([p[flags_off] | 0x06]) + p[flags_off + 1:]
        with pytest.raises(NotImplementedError):
            MkvCodec.parse(patched)

    def test_truncated_raises(self):
        p = encode_mkv(_frames(n=2))
        with pytest.raises(ValueError):
            MkvCodec.parse(p[: len(p) // 2] + b"\xff\xff\xff\xff")

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError):
            MkvCodec.parse(b"\x00\x00\x00\x00garbage")


class TestConvertStage:
    def test_mp4_mkv_frame_preserving(self):
        from imagor_ray.stages.codecs import Mp4Codec, encode_mp4
        from imagor_ray.stages.multimodal import MediaConvertStage

        fr = _frames(n=4, h=8, w=10)
        mkv = MediaConvertStage("mkv")._convert_one(encode_mp4(fr))
        np.testing.assert_array_equal(MkvCodec.decode_frames(mkv), fr)
        mp4 = MediaConvertStage("mp4")._convert_one(mkv)
        np.testing.assert_array_equal(Mp4Codec.decode_frames(mp4), fr)


class TestRayIntegration:
    def test_decode_stage_reports_real_mkv_frames(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import (
            MediaDecodeStage, gen_real_media,
        )

        tbl = gen_real_media(64)
        kinds = [sniff_media(p) for p in tbl["payload"].to_pylist()]
        assert "mkv" in kinds
        out = (
            rd.from_arrow(tbl)
            .map_batches(MediaDecodeStage(codec="auto"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas().sort_values("media_id")
        )
        mkv_rows = out[[k == "mkv" for k in kinds]]
        assert (mkv_rows["media_type"] == "video").all()
        assert (mkv_rows["n_frames"] >= 2).all()

    def test_media_mkv_roundtrip_matches_hashes(self, ray_session):
        import duckdb

        from imagor_ray.stages.multimodal import media_mkv_roundtrip

        sf = "/root/testdata/sf0.001"
        got = media_mkv_roundtrip(sf).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        exp = con.execute(
            f"SELECT doc_id, sha256(text) AS sha256 "
            f"FROM '{sf}/documents.parquet' ORDER BY doc_id"
        ).df()
        assert list(got["sha256"]) == list(exp["sha256"])


class TestMkvMjpeg:
    def test_mkv_mjpeg_roundtrip_exact(self):
        import numpy as np

        from imagor_ray.stages.jpeg import encode_jpeg
        from imagor_ray.stages.mkv import MkvCodec, encode_mkv

        rng = np.random.default_rng(11)
        frames = [np.kron(rng.integers(0, 256, (3, 5), dtype=np.uint8),
                          np.ones((8, 8), np.uint8)) for _ in range(7)]
        jpegs = [encode_jpeg(f, quality=100) for f in frames]
        payload = encode_mkv(jpegs, codec_id="V_MJPEG", blocks_per_cluster=3)

        assert MkvCodec.decode_meta(payload)["codec_id"] == "V_MJPEG"
        dec = MkvCodec.decode_frames(payload)
        assert dec.shape == (7, 24, 40)
        for got, want in zip(dec, frames):
            assert (got == want).all()

    def test_mkv_other_compressed_codec_still_raises(self):
        import pytest

        from imagor_ray.stages.mkv import MkvCodec, encode_mkv

        payload = encode_mkv([b"\x00" * 16], codec_id="V_VP9")
        with pytest.raises(NotImplementedError):
            MkvCodec.decode_frames(payload)


class TestAFlacAudio:
    def test_flac_in_mkv_roundtrip(self, ray_session=None):
        import numpy as np
        from imagor_ray.stages.flac import encode_flac_parts
        from imagor_ray.stages.mkv import MkvCodec, encode_mkv

        rng = np.random.default_rng(3)
        x = np.clip(np.cumsum(rng.integers(-40, 41, 4000)),
                    -20000, 20000).astype(np.int64)
        st = np.stack([x, x + rng.integers(-3, 4, len(x))], axis=1)
        hdr, frames = encode_flac_parts(st, 44100, bps=16, block_size=777)
        mkv = encode_mkv(frames, codec_id="A_FLAC", codec_private=hdr,
                         sample_rate=44100, channels=2,
                         blocks_per_cluster=3)
        samples, sr, bps = MkvCodec.decode_audio(mkv)
        assert (sr, bps) == (44100, 16)
        assert np.array_equal(samples, st)
        meta = MkvCodec.decode_meta(mkv)
        assert meta["codec_id"] == "A_FLAC" and meta["n_tracks"] == 1

    def test_cross_block_md5_detects_reordering(self):
        import numpy as np
        import pytest
        from imagor_ray.stages.flac import FlacError, encode_flac_parts
        from imagor_ray.stages.mkv import MkvCodec, encode_mkv

        rng = np.random.default_rng(4)
        x = rng.integers(-100, 100, 600).astype(np.int64)
        hdr, frames = encode_flac_parts(x, 8000, bps=8, block_size=200)
        assert len(frames) == 3
        # swap two frames: each decodes fine, the STREAM md5 must fail
        swapped = [frames[1], frames[0], frames[2]]
        mkv = encode_mkv(swapped, codec_id="A_FLAC", codec_private=hdr,
                         sample_rate=8000, channels=1)
        with pytest.raises(FlacError, match="MD5"):
            MkvCodec.decode_audio(mkv)

    def test_other_audio_codec_is_gated(self):
        import pytest
        from imagor_ray.stages.mkv import MkvCodec, encode_mkv

        mkv = encode_mkv([b"\x01\x02"], codec_id="A_OPUS",
                         sample_rate=48000, channels=2)
        with pytest.raises(NotImplementedError, match="audio"):
            MkvCodec.decode_audio(mkv)
