"""MP4 (ISO BMFF) container codec tests — stages/mp4.py.

The demuxer resolves the real sample table (stts/stsc/stsz/stco) and
pulls sample bytes out of mdat; the muxer writes a spec-shaped
single-track file. Round-trips must be exact; hand-built variants pin
the 64-bit largesize path, version-1 headers and the compressed-
bitstream plug point.
"""

import struct

import numpy as np
import pytest

from imagor_ray.stages.mp4 import Mp4Codec, _box, _full, encode_mp4
from imagor_ray.stages.codecs import sniff_media


def _frames(n=5, h=12, w=16, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("spc", [0, 1, 2, 3, 5, 99])
    def test_video_frames_exact(self, spc):
        fr = _frames()
        p = encode_mp4(fr, fps=25, samples_per_chunk=spc)
        assert sniff_media(p) == "mp4"
        np.testing.assert_array_equal(Mp4Codec.decode_frames(p), fr)

    def test_meta_fields(self):
        p = encode_mp4(_frames(), fps=25)
        m = Mp4Codec.decode_meta(p)
        assert (m["width"], m["height"], m["n_frames"]) == (16, 12, 5)
        assert m["fps"] == 25.0
        assert m["duration_ms"] == 5 * 40
        assert m["fourcc"] == "raw "
        assert m["n_tracks"] == 1

    @pytest.mark.parametrize("spc", [0, 2])
    def test_metadata_track_variable_sizes(self, spc):
        chunks = [b"hello", b"", b"x" * 1000, b"yz", b"\x00\xff" * 7]
        p = encode_mp4(chunks, samples_per_chunk=spc)
        assert Mp4Codec.extract_samples(p) == chunks
        info = Mp4Codec.parse(p)
        assert info["tracks"][0]["handler"] == "meta"
        assert info["tracks"][0]["fourcc"] == "mett"

    def test_single_frame(self):
        fr = _frames(n=1)
        np.testing.assert_array_equal(
            Mp4Codec.decode_frames(encode_mp4(fr)), fr)

    def test_resize_every_frame(self):
        p = encode_mp4(_frames(), fps=10)
        p2 = Mp4Codec.resize(p, 8, 6)
        m = Mp4Codec.decode_meta(p2)
        assert (m["width"], m["height"], m["n_frames"]) == (8, 6, 5)
        assert m["fps"] == 10.0

    def test_decode_rgb_first_frame(self):
        fr = _frames()
        rgb = Mp4Codec.decode_rgb(encode_mp4(fr))
        assert rgb.shape == (12, 16, 3)
        np.testing.assert_array_equal(rgb[:, :, 0], fr[0])
        np.testing.assert_array_equal(rgb[:, :, 1], fr[0])


class TestBoxEdgeCases:
    def test_largesize_moov(self):
        """Rewriting the trailing moov header to the 64-bit largesize
        form (size=1 + 8-byte largesize) must still parse — no chunk
        offset depends on moov's position."""
        fr = _frames()
        p = encode_mp4(fr)
        idx = p.rindex(b"moov") - 4
        (size,) = struct.unpack_from(">I", p, idx)
        patched = (p[:idx] + struct.pack(">I", 1) + b"moov"
                   + struct.pack(">Q", size + 8) + p[idx + 8:])
        np.testing.assert_array_equal(Mp4Codec.decode_frames(patched), fr)

    def test_size_zero_extends_to_eof(self):
        """size==0 on the final box means 'to end of file'."""
        fr = _frames()
        p = encode_mp4(fr)
        idx = p.rindex(b"moov") - 4
        patched = p[:idx] + struct.pack(">I", 0) + p[idx + 4:]
        np.testing.assert_array_equal(Mp4Codec.decode_frames(patched), fr)

    def test_corrupt_box_size_raises(self):
        p = encode_mp4(_frames())
        idx = p.rindex(b"moov") - 4
        bad = p[:idx] + struct.pack(">I", 3) + p[idx + 4:]
        with pytest.raises(ValueError):
            Mp4Codec.parse(bad)

    def test_missing_moov_raises(self):
        p = encode_mp4(_frames())
        idx = p.rindex(b"moov") - 4
        with pytest.raises(ValueError):
            Mp4Codec.parse(p[:idx])

    def test_compressed_bitstream_is_the_plug_point(self):
        """A non-'raw ' video fourcc demuxes (samples come out) but
        pixel decode raises NotImplementedError — the documented
        decoder-library seam."""
        fr = _frames()
        p = encode_mp4(fr).replace(b"raw ", b"vp09")
        samples = Mp4Codec.extract_samples(p)
        assert len(samples) == 5
        assert samples[0] == fr[0].tobytes()
        with pytest.raises(NotImplementedError):
            Mp4Codec.decode_frames(p)

    def test_version1_headers(self):
        """Hand-built moov with v1 mvhd/tkhd/mdhd (64-bit times) must
        parse the same timescale/duration/dims."""
        fr = _frames(n=3, h=4, w=6)
        base = encode_mp4(fr, fps=10, timescale=1000)
        # Demux the v0 file, then rebuild its moov with v1 headers.
        info = Mp4Codec.parse(base)
        t = info["tracks"][0]
        dur, ts = t["duration"], t["timescale"]
        unity = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                            0, 0, 0x40000000)
        mvhd = _full(b"mvhd", 1, 0,
                     struct.pack(">QQIQ", 0, 0, ts, dur),
                     struct.pack(">IHH", 0x00010000, 0x0100, 0),
                     b"\x00" * 8, unity, b"\x00" * 24,
                     struct.pack(">I", 2))
        tkhd = _full(b"tkhd", 1, 7,
                     struct.pack(">QQIIQ", 0, 0, 1, 0, dur),
                     b"\x00" * 8, struct.pack(">HHHH", 0, 0, 0, 0),
                     unity, struct.pack(">II", 6 << 16, 4 << 16))
        mdhd = _full(b"mdhd", 1, 0,
                     struct.pack(">QQIQ", 0, 0, ts, dur),
                     struct.pack(">HH", 0x55C4, 0))
        moov_idx = base.rindex(b"moov") - 4
        old_moov = base[moov_idx:]
        mdia_idx = old_moov.index(b"mdia") - 4
        (mdia_size,) = struct.unpack_from(">I", old_moov, mdia_idx)
        hdlr_minf = old_moov[mdia_idx + 8 + 32: mdia_idx + mdia_size]
        mdia = _box(b"mdia", mdhd, hdlr_minf)
        moov = _box(b"moov", mvhd, _box(b"trak", tkhd, mdia))
        rebuilt = base[:moov_idx] + moov
        m = Mp4Codec.decode_meta(rebuilt)
        assert (m["width"], m["height"], m["n_frames"]) == (6, 4, 3)
        assert m["duration_ms"] == 300
        np.testing.assert_array_equal(Mp4Codec.decode_frames(rebuilt), fr)


class TestConvertStage:
    def test_gif_mp4_frame_preserving(self):
        from imagor_ray.stages.codecs import GifCodec, encode_gif
        from imagor_ray.stages.multimodal import MediaConvertStage

        fr = _frames(n=4, h=8, w=10)
        gif = encode_gif(fr)
        mp4 = MediaConvertStage("mp4")._convert_one(gif)
        np.testing.assert_array_equal(Mp4Codec.decode_frames(mp4), fr)
        gif2 = MediaConvertStage("gif")._convert_one(mp4)
        np.testing.assert_array_equal(
            GifCodec.decode_frames(gif2)[:, :, :, 0], fr)

    def test_still_to_mp4_single_frame(self):
        from imagor_ray.stages.codecs import encode_png
        from imagor_ray.stages.multimodal import MediaConvertStage

        px = _frames(n=1)[0]
        mp4 = MediaConvertStage("mp4")._convert_one(encode_png(px))
        out = Mp4Codec.decode_frames(mp4)
        assert out.shape == (1, 12, 16)
        np.testing.assert_array_equal(out[0], px)


class TestRayIntegration:
    def test_decode_stage_reports_real_mp4_frames(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import (
            MediaDecodeStage, gen_real_media,
        )

        tbl = gen_real_media(64)
        kinds = [sniff_media(p) for p in tbl["payload"].to_pylist()]
        assert "mp4" in kinds
        out = (
            rd.from_arrow(tbl)
            .map_batches(MediaDecodeStage(codec="auto"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas().sort_values("media_id")
        )
        mp4_rows = out[[k == "mp4" for k in kinds]]
        assert (mp4_rows["media_type"] == "video").all()
        assert (mp4_rows["n_frames"] >= 2).all()        # REAL frame counts

    def test_media_mp4_roundtrip_matches_hashes(self, ray_session):
        import duckdb

        from imagor_ray.stages.multimodal import media_mp4_roundtrip

        sf = "/root/testdata/sf0.001"
        got = media_mp4_roundtrip(sf).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        exp = con.execute(
            f"SELECT doc_id, sha256(text) AS sha256 "
            f"FROM '{sf}/documents.parquet' ORDER BY doc_id"
        ).df()
        assert list(got["sha256"]) == list(exp["sha256"])


class TestMjpeg:
    def test_mp4_mjpeg_roundtrip_exact(self):
        import numpy as np

        from imagor_ray.stages.jpeg import encode_jpeg
        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4

        rng = np.random.default_rng(7)
        frames = [np.kron(rng.integers(0, 256, (4, 6), dtype=np.uint8),
                          np.ones((8, 8), np.uint8)) for _ in range(5)]
        jpegs = [encode_jpeg(f, quality=100) for f in frames]
        payload = encode_mp4(jpegs, fourcc="jpeg", samples_per_chunk=2)

        meta = Mp4Codec.decode_meta(payload)
        assert meta["fourcc"] == "jpeg"
        assert (meta["width"], meta["height"]) == (48, 32)
        dec = Mp4Codec.decode_frames(payload)
        assert dec.shape == (5, 32, 48)
        for got, want in zip(dec, frames):
            assert (got == want).all()       # DC-only ⇒ bit-exact

    def test_mp4_mjpeg_color_sample_reduces_to_luma(self):
        import numpy as np

        from imagor_ray.stages.jpeg import encode_jpeg
        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4

        rgb = np.zeros((16, 16, 3), np.uint8)
        rgb[..., 1] = 200
        payload = encode_mp4([encode_jpeg(rgb, quality=100)], fourcc="jpeg")
        dec = Mp4Codec.decode_frames(payload)
        assert dec.shape == (1, 16, 16)
        # Rec.601 integer luma of pure green ≈ (150*200)>>8
        assert abs(int(dec[0, 8, 8]) - ((150 * 200) >> 8)) <= 2

    def test_mp4_other_compressed_fourcc_still_raises(self):
        import numpy as np
        import pytest

        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4

        payload = encode_mp4(
            np.zeros((2, 8, 8), np.uint8))
        patched = payload.replace(b"raw ", b"vp09")
        with pytest.raises(NotImplementedError):
            Mp4Codec.decode_frames(patched)


class TestFlacAudio:
    def test_flac_in_mp4_roundtrip(self):
        import numpy as np
        from imagor_ray.stages.flac import encode_flac_parts
        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4

        rng = np.random.default_rng(7)
        x = np.clip(np.cumsum(rng.integers(-40, 41, 4000)),
                    -20000, 20000).astype(np.int64)
        st = np.stack([x, x + rng.integers(-3, 4, len(x))], axis=1)
        hdr, frames = encode_flac_parts(st, 44100, bps=16, block_size=777)
        mp4 = encode_mp4(frames, fourcc="fLaC", codec_private=hdr,
                         sample_rate=44100, channels=2,
                         samples_per_chunk=2)
        samples, sr, bps = Mp4Codec.decode_audio(mp4)
        assert (sr, bps) == (44100, 16)
        assert np.array_equal(samples, st)
        meta = Mp4Codec.decode_meta(mp4)
        assert meta["fourcc"] == "fLaC"

    def test_cross_sample_md5_detects_reordering(self):
        import numpy as np
        import pytest
        from imagor_ray.stages.flac import FlacError, encode_flac_parts
        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4

        rng = np.random.default_rng(8)
        x = rng.integers(-100, 100, 600).astype(np.int64)
        hdr, frames = encode_flac_parts(x, 8000, bps=8, block_size=200)
        swapped = [frames[1], frames[0], frames[2]]
        mp4 = encode_mp4(swapped, fourcc="fLaC", codec_private=hdr,
                         sample_rate=8000, channels=1)
        with pytest.raises(FlacError, match="MD5"):
            Mp4Codec.decode_audio(mp4)

    def test_other_audio_entry_is_gated(self):
        import pytest
        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4

        # a metadata track is not audio at all → no-audio error
        m = encode_mp4([b"\x01"], fps=1)
        with pytest.raises(ValueError, match="no audio"):
            Mp4Codec.decode_audio(m)

    def test_missing_codec_private_rejected(self):
        import pytest
        from imagor_ray.stages.mp4 import encode_mp4

        with pytest.raises(ValueError, match="codec_private"):
            encode_mp4([b"\x01"], fourcc="fLaC")

    def test_sample_entry_carries_real_bps_and_rate(self):
        import struct

        import numpy as np
        from imagor_ray.stages.flac import encode_flac_parts
        from imagor_ray.stages.mp4 import encode_mp4

        x = np.arange(600, dtype=np.int64) % 100 - 50
        hdr, frames = encode_flac_parts(x, 8000, bps=8, block_size=200)
        mp4 = encode_mp4(frames, fourcc="fLaC", codec_private=hdr,
                         sample_rate=8000, channels=1)
        # AudioSampleEntry layout after the 'fLaC' fourcc: 6 reserved
        # + dri(2) + 8 reserved, then channels(2) samplesize(2)
        # predefined(2) reserved(2) samplerate(16.16)
        p = mp4.find(b"fLaC", 8)  # skip the ftyp brand occurrence
        body = mp4[p + 4:]
        ch, ss = struct.unpack(">HH", body[16:20])
        rate = struct.unpack(">I", body[24:28])[0]
        assert (ch, ss) == (1, 8)          # bps from STREAMINFO, not 16
        assert rate == 8000 << 16          # unmasked 16.16

    def test_oversized_sample_rate_refused(self):
        import numpy as np
        import pytest
        from imagor_ray.stages.flac import encode_flac_parts
        from imagor_ray.stages.mp4 import encode_mp4

        x = np.zeros(100, dtype=np.int64)
        hdr, frames = encode_flac_parts(x, 96000, bps=16, block_size=50)
        with pytest.raises(ValueError, match="16.16"):
            encode_mp4(frames, fourcc="fLaC", codec_private=hdr,
                       sample_rate=96000, channels=1)
