"""Real in-sandbox media codecs (stages/codecs.py): WAV via the stdlib
wave module, 24-bit BMP via struct+numpy — actual decode/resize math,
replacing part of the declared codec stub (round-2 missing item 4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from imagor_ray.stages.codecs import (
    BmpCodec, WavCodec, encode_bmp, encode_wav, sniff_media,
)


def _sine(n=4410, rate=44100, freq=440.0, channels=2):
    t = np.arange(n) / rate
    mono = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    return np.stack([mono] * channels, axis=1)


class TestWav:
    def test_meta_roundtrip(self):
        pcm = _sine()
        payload = encode_wav(pcm, 44100)
        assert sniff_media(payload) == "wav"
        m = WavCodec.decode_meta(payload)
        assert m == {"n_channels": 2, "sample_rate": 44100,
                     "n_frames": 4410, "sample_width": 2,
                     "duration_ms": 100}

    def test_pcm_roundtrip_exact(self):
        pcm = _sine(n=999, channels=1)
        got, rate = WavCodec.decode_pcm(encode_wav(pcm, 8000))
        assert rate == 8000
        np.testing.assert_array_equal(got, pcm)

    def test_rms_windows_match_direct(self):
        pcm = _sine(n=1600, channels=2)
        rms = WavCodec.rms_windows(pcm, n_windows=4)
        mono = pcm.astype(np.float64).mean(axis=1)
        w = 400
        want = [np.sqrt((mono[i*w:(i+1)*w] ** 2).mean()) for i in range(4)]
        np.testing.assert_allclose(rms, want)
        # silence has zero energy
        assert WavCodec.rms_windows(np.zeros((100, 1), dtype="<i2")).sum() == 0


class TestBmp:
    @staticmethod
    def _img(h=13, w=7, seed=3):  # w=7 exercises 4-byte row padding
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def test_pixel_roundtrip_exact(self):
        px = self._img()
        payload = encode_bmp(px)
        assert sniff_media(payload) == "bmp"
        m = BmpCodec.decode_meta(payload)
        assert (m["width"], m["height"], m["bpp"]) == (7, 13, 24)
        np.testing.assert_array_equal(BmpCodec.decode_pixels(payload), px)

    def test_resize_is_real_pixel_math(self):
        px = self._img(h=16, w=8)
        out = BmpCodec.resize(encode_bmp(px), 4, 8)
        got = BmpCodec.decode_pixels(out)
        ri = (np.arange(8) * 16 // 8).clip(0, 15)
        ci = (np.arange(4) * 8 // 4).clip(0, 7)
        np.testing.assert_array_equal(got, px[ri][:, ci])

    def test_unsupported_depth_raises(self):
        payload = bytearray(encode_bmp(self._img()))
        payload[28] = 32  # claim 32bpp
        with pytest.raises(NotImplementedError):
            BmpCodec.decode_pixels(bytes(payload))


class TestAutoSniffStage:
    def test_mixed_table_decodes_per_container(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import (
            MEDIA_SCHEMA, MediaDecodeStage, _encode_fake,
        )

        rows = pa.table({
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "media_type": pa.array(["video", "audio", "image"]),
            "payload": pa.array([
                _encode_fake(32, 16, 8, 3, 1),
                encode_wav(_sine(n=1000), 16000),
                encode_bmp(TestBmp._img(h=5, w=9)),
            ], pa.binary()),
            "source": pa.array(["a", "b", "c"]),
        }, schema=MEDIA_SCHEMA)
        out = (
            rd.from_arrow(rows)
            .map_batches(MediaDecodeStage, batch_format="pyarrow",
                         fn_constructor_kwargs={"codec": "auto"},
                         batch_size=8, concurrency=1)
            .to_pandas().sort_values("media_id")
        )
        assert out["width"].tolist() == [32, 0, 9]
        assert out["height"].tolist() == [16, 0, 5]
        assert out["n_frames"].tolist() == [8, 1000, 1]
        assert out["channels"].tolist() == [3, 2, 3]

    def test_resize_stage_routes_bmp_to_real_resize(self):
        from imagor_ray.stages.multimodal import MediaResizeStage

        px = TestBmp._img(h=20, w=10)
        stage = MediaResizeStage(width=5, height=10, codec="auto")
        table = pa.table({"payload": pa.array([encode_bmp(px)], pa.binary())})
        out = stage(table)
        got = BmpCodec.decode_pixels(out["payload"][0].as_py())
        assert got.shape == (10, 5, 3)

    def test_remaining_stub_is_still_honest(self):
        from imagor_ray.stages.multimodal import MediaDecodeStage

        with pytest.raises(NotImplementedError):
            MediaDecodeStage(codec="real")


class TestBrightRegionDetector:
    def test_finds_planted_bright_patch(self):
        from imagor_ray.stages.codecs import brightest_region

        px = np.zeros((32, 40, 3), dtype=np.uint8)
        px[10:18, 21:29] = 255  # 8x8 white patch at (x=21, y=10)
        x, y, w, h, score = brightest_region(px, win=8)
        assert (x, y, w, h) == (21, 10, 8, 8)
        assert score == pytest.approx(255.0, abs=0.01)

    def test_window_sums_match_bruteforce(self):
        from imagor_ray.stages.codecs import brightest_region

        rng = np.random.default_rng(4)
        px = rng.integers(0, 256, (15, 11, 3), dtype=np.uint8)
        x, y, w, h, score = brightest_region(px, win=4)
        luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        best = -1.0
        for yy in range(12):
            for xx in range(8):
                s = luma[yy:yy+4, xx:xx+4].mean()
                best = max(best, s)
        assert score == pytest.approx(best)
        assert luma[y:y+4, x:x+4].mean() == pytest.approx(best)

    def test_detect_stage_mixed(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.multimodal import (
            MediaDetectStage, gen_real_media,
        )

        out = (
            rd.from_arrow(gen_real_media(12))
            .map_batches(MediaDetectStage, batch_format="pyarrow",
                         batch_size=8, concurrency=1)
            .to_pandas().sort_values("media_id")
        )
        imgs = out[out["media_type"] == "image"]
        auds = out[out["media_type"] == "audio"]
        assert (imgs["det_w"] > 0).all() and (imgs["det_score"] > 0).all()
        assert (auds["det_w"] == 0).all() and (auds["det_x"] == -1).all()


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_property_bmp_roundtrip(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    got = BmpCodec.decode_pixels(encode_bmp(px))
    np.testing.assert_array_equal(got, px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    ch=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_property_wav_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, (n, ch)).astype("<i2")
    payload = encode_wav(pcm, rate)
    got, got_rate = WavCodec.decode_pcm(payload)
    assert got_rate == rate
    np.testing.assert_array_equal(got, pcm)
    m = WavCodec.decode_meta(payload)
    assert (m["n_frames"], m["n_channels"]) == (n, ch)


class TestG711:
    def test_alaw_bijection_all_codes(self):
        import numpy as np

        from imagor_ray.stages.codecs import alaw_decode, alaw_encode

        b = np.arange(256, dtype=np.uint8)
        vals = alaw_decode(b)
        assert len(set(vals.tolist())) == 256          # bijection
        assert (alaw_encode(vals) == b).all()

    def test_ulaw_inverse_except_zero_fold(self):
        import numpy as np

        from imagor_ray.stages.codecs import ulaw_decode, ulaw_encode

        b = np.arange(256, dtype=np.uint8)
        rec = ulaw_encode(ulaw_decode(b))
        bad = np.nonzero(rec != b)[0]
        # G.711 µ-law: -0 (0x7F) folds to the canonical +0 code 0xFF
        assert bad.tolist() == [0x7F] and rec[0x7F] == 0xFF
        assert ulaw_decode(np.array([0x00], np.uint8))[0] == -32124
        assert ulaw_decode(np.array([0x80], np.uint8))[0] == 32124

    def test_g711_quantizer_monotone_and_bounded(self):
        import numpy as np

        from imagor_ray.stages.codecs import (alaw_decode, alaw_encode,
                                              ulaw_decode, ulaw_encode)

        x = np.arange(-32768, 32768, dtype=np.int16)
        for enc, dec, clip in ((ulaw_encode, ulaw_decode, 32635),
                               (alaw_encode, alaw_decode, 32767)):
            d = dec(enc(x)).astype(np.int32)
            assert (np.diff(d) >= 0).all()
            err = np.abs(d - np.clip(x, -clip, clip).astype(np.int32))
            assert err.max() <= 1024                   # top-segment width

    def test_g711_wav_flavor_decodes_via_own_riff_walk(self):
        import numpy as np

        from imagor_ray.stages.codecs import (WavCodec, alaw_encode,
                                              encode_wav_g711, sniff_media,
                                              ulaw_decode)

        codes = np.frombuffer(b"g711 \x00\x7f\xff payload", dtype=np.uint8)
        for law in ("alaw", "ulaw"):
            payload = encode_wav_g711(codes, 8000, law=law)
            assert sniff_media(payload) == "wav"
            meta = WavCodec.decode_meta(payload)
            assert meta["n_frames"] == len(codes)
            assert meta["sample_width"] == 1
            pcm, rate = WavCodec.decode_pcm(payload)
            assert rate == 8000 and pcm.shape == (len(codes), 1)
        # a-law leg recovers the exact bytes; u-law expands via table
        pcm, _ = WavCodec.decode_pcm(encode_wav_g711(codes, 8000, law="alaw"))
        assert alaw_encode(pcm[:, 0]).tobytes() == codes.tobytes()
        pcm, _ = WavCodec.decode_pcm(encode_wav_g711(codes, 8000, law="ulaw"))
        assert (pcm[:, 0] == ulaw_decode(codes)).all()
