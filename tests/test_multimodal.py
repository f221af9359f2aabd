"""Multimodal plumbing tests: binary payload schema, actor-pool decode,
frame sampling and feature extraction run end-to-end through Ray Data
with pyarrow batches (the decode codec itself is a documented stub)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from imagor_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    MediaDecodeStage,
    frame_sample,
    gen_media,
    media_features,
)


def test_gen_media_deterministic_schema():
    t1, t2 = gen_media(32), gen_media(32)
    assert t1.schema.equals(MEDIA_SCHEMA)
    assert t1.equals(t2)
    assert t1.num_rows == 32


def test_real_codec_is_marked_stub():
    with pytest.raises(NotImplementedError):
        MediaDecodeStage(codec="real")


def test_decode_stage_local():
    t = gen_media(16)
    out = MediaDecodeStage()(t)
    assert out.num_rows == 16
    assert set(out.column_names) >= {"media_id", "width", "height", "n_frames", "channels", "n_bytes"}
    assert "payload" not in out.column_names
    # videos have >1 frame, images/audio exactly 1
    df = out.to_pandas().set_index("media_id")
    kinds = t.to_pandas().set_index("media_id")["media_type"]
    assert (df.loc[kinds[kinds == "video"].index, "n_frames"] > 1).all()
    assert (df.loc[kinds[kinds == "image"].index, "n_frames"] == 1).all()


def test_decode_actor_pool_through_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(gen_media(48))
    out = ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=8,
        concurrency=2, num_cpus=1,
    )
    df = out.to_pandas()
    assert len(df) == 48
    assert (df["width"] >= 16).all()


def test_frame_sample(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(gen_media(30))
    out = ds.map_batches(frame_sample, batch_format="pyarrow", batch_size=16)
    df = out.to_pandas()
    # every video contributes ceil(frames/8) rows; others exactly one
    assert (df[df["media_type"] != "video"]["frame_idx"] == 0).all()
    assert (df.groupby("media_id").size() >= 1).all()


def test_media_features_embeddings(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(gen_media(24))
    out = ds.map_batches(media_features, batch_format="pyarrow", batch_size=8)
    df = out.to_pandas()
    assert len(df) == 24
    vec = np.array(df["embedding"].iloc[0])
    assert vec.shape == (16,) and (0 <= vec).all() and (vec <= 1).all()
    # deterministic
    out2 = rd.from_arrow(gen_media(24)).map_batches(
        media_features, batch_format="pyarrow", batch_size=8).to_pandas()
    assert df.sort_values("media_id")["embedding"].map(tuple).tolist() == \
        out2.sort_values("media_id")["embedding"].map(tuple).tolist()


class TestMediaResize:
    def test_fit_in_shrinks_and_redecodes(self, ray_session):
        import ray.data as rd
        from imagor_ray.stages.multimodal import (
            MediaDecodeStage, MediaResizeStage, gen_media,
        )

        ds = rd.from_arrow(gen_media(32))
        out = (
            ds.map_batches(MediaResizeStage, fn_constructor_kwargs={
                "width": 64, "height": 64}, batch_format="pyarrow",
                batch_size=8, concurrency=2, num_cpus=1)
            .map_batches(MediaDecodeStage, batch_format="pyarrow",
                         batch_size=8, concurrency=2, num_cpus=1)
            .to_pandas()
        )
        assert len(out) == 32
        assert (out["width"] <= 64).all() and (out["height"] <= 64).all()

    def test_fit_in_preserves_aspect_and_never_upscales(self):
        from imagor_ray.stages.multimodal import (
            MediaDecodeStage, MediaResizeStage, _encode_fake,
        )

        stage = MediaResizeStage(width=100, height=100)
        dec = MediaDecodeStage()
        # 400x200 → 100x50 (aspect 2:1 kept)
        p = stage._resize_one(_encode_fake(400, 200, 1, 3, seed=1))
        assert dec._decode_one(p)[:2] == (100, 50)
        # 40x20 smaller than target → unchanged (shrink-only)
        p = stage._resize_one(_encode_fake(40, 20, 1, 3, seed=2))
        assert dec._decode_one(p)[:2] == (40, 20)

    def test_stretch_forces_exact_dims(self):
        from imagor_ray.stages.multimodal import (
            MediaDecodeStage, MediaResizeStage, _encode_fake,
        )

        stage = MediaResizeStage(width=32, height=48, fit="stretch")
        p = stage._resize_one(_encode_fake(400, 200, 5, 3, seed=3))
        w, h, frames, ch, blen = MediaDecodeStage()._decode_one(p)
        assert (w, h) == (32, 48)
        assert frames == 5 and ch == 3  # metadata preserved
        assert blen == min(32 * 48, 4096)

    def test_real_codec_is_honestly_stubbed(self):
        from imagor_ray.stages.multimodal import MediaResizeStage

        with pytest.raises(NotImplementedError):
            MediaResizeStage(width=10, codec="real")

    def test_deterministic(self):
        from imagor_ray.stages.multimodal import MediaResizeStage, _encode_fake

        stage = MediaResizeStage(width=64)
        p = _encode_fake(300, 100, 1, 3, seed=9)
        assert stage._resize_one(p) == stage._resize_one(p)


class TestMediaConvert:
    """Format-conversion stage — the export-map analogue
    (process.go:16-30 name→type table, per-type export switch
    process.go:869-935)."""

    def _payloads(self):
        import numpy as np

        from imagor_ray.stages.codecs import (
            encode_bmp, encode_gif, encode_jpeg, encode_png, encode_tiff,
        )

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
        return px, {
            "bmp": encode_bmp(px),
            "png": encode_png(px),
            "tiff": encode_tiff(px),
            "jpeg": encode_jpeg(px, 95),
            "gif": encode_gif(px[:, :, 0]),
        }

    def test_full_conversion_matrix(self):
        from imagor_ray.stages.codecs import sniff_media
        from imagor_ray.stages.multimodal import MediaConvertStage

        _, payloads = self._payloads()
        for target in MediaConvertStage._TARGETS:
            stage = MediaConvertStage(target)
            for src, payload in payloads.items():
                out = stage._convert_one(payload)
                assert sniff_media(out) == target, (src, target)

    def test_lossless_triangle_preserves_pixels(self):
        import numpy as np

        from imagor_ray.stages.codecs import PngCodec, TiffCodec
        from imagor_ray.stages.multimodal import MediaConvertStage

        px, payloads = self._payloads()
        # bmp -> tiff -> png keeps every pixel
        t = MediaConvertStage("tiff")._convert_one(payloads["bmp"])
        np.testing.assert_array_equal(TiffCodec.decode_pixels(t), px)
        p = MediaConvertStage("png")._convert_one(t)
        np.testing.assert_array_equal(PngCodec.decode_rgb(p), px)

    def test_audio_passes_through(self):
        import numpy as np

        from imagor_ray.stages.codecs import encode_wav
        from imagor_ray.stages.multimodal import MediaConvertStage

        wav = encode_wav(np.zeros((100, 1), dtype="<i2"), 8000)
        assert MediaConvertStage("png")._convert_one(wav) == wav

    def test_same_format_is_identity(self):
        from imagor_ray.stages.multimodal import MediaConvertStage

        _, payloads = self._payloads()
        assert MediaConvertStage("png")._convert_one(payloads["png"]) == payloads["png"]

    def test_unknown_target_rejected(self):
        import pytest as _pytest

        from imagor_ray.stages.multimodal import MediaConvertStage

        # webp/qoi became REAL targets in round 5 — probe with a name
        # that stays unknown
        with _pytest.raises(ValueError):
            MediaConvertStage("avif")

    def test_stage_over_real_corpus(self, ray_session):
        import ray.data as rd

        from imagor_ray.stages.codecs import sniff_media
        from imagor_ray.stages.multimodal import (
            MediaConvertStage, gen_real_media,
        )

        out = (
            rd.from_arrow(gen_real_media(24))
            .map_batches(MediaConvertStage("png"),
                         batch_format="pyarrow", batch_size=8)
            .to_pandas()
        )
        kinds = {sniff_media(p) for p in out["payload"]}
        assert kinds <= {"png", "wav"}          # every image now png
        assert "png" in kinds and "wav" in kinds


class TestNewCodecStagePassthrough:
    """Review finding: sniff_media gained flac/qoi kinds, so the
    convert/resize stages must handle them instead of crashing."""

    def _payloads(self):
        import numpy as np
        from imagor_ray.stages.codecs import encode_qoi
        from imagor_ray.stages.flac import encode_flac
        flac = encode_flac(np.arange(-50, 50, dtype=np.int64), 8000, bps=8)
        qoi = encode_qoi(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
        return flac, qoi

    def test_convert_passes_flac_and_converts_qoi(self):
        from imagor_ray.stages.codecs import PngCodec, sniff_media
        from imagor_ray.stages.multimodal import MediaConvertStage
        flac, qoi = self._payloads()
        st = MediaConvertStage("png")
        assert st._convert_one(flac) == flac          # audio passthrough
        png = st._convert_one(qoi)
        assert sniff_media(png) == "png"
        import numpy as np
        exp = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        assert np.array_equal(PngCodec.decode_rgb(png), exp)

    def test_convert_targets_webp_and_qoi(self):
        import numpy as np
        from imagor_ray.stages.codecs import (QoiCodec, WebpCodec,
                                              encode_png, sniff_media)
        from imagor_ray.stages.multimodal import MediaConvertStage
        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        png = encode_png(px)
        webp = MediaConvertStage("webp")._convert_one(png)
        assert sniff_media(webp) == "webp"
        assert np.array_equal(WebpCodec.decode_rgb(webp), px)
        qoi = MediaConvertStage("qoi")._convert_one(png)
        assert sniff_media(qoi) == "qoi"
        assert np.array_equal(QoiCodec.decode(qoi)[0], px)

    def test_resize_passes_flac_resizes_qoi_and_webp(self):
        import numpy as np
        from imagor_ray.stages.codecs import (QoiCodec, WebpCodec,
                                              encode_qoi, encode_webp)
        from imagor_ray.stages.multimodal import MediaResizeStage
        flac, _ = self._payloads()
        st = MediaResizeStage(2, 2, codec="auto")
        assert st._resize_one(flac) == flac
        qoi = encode_qoi(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
        small = st._resize_one(qoi)
        px, ch = QoiCodec.decode(small)
        assert px.shape == (2, 2, 3)
        webp = encode_webp(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
        small_w = st._resize_one(webp)          # was a meta-tuple bug
        assert isinstance(small_w, bytes)
        assert WebpCodec.decode_rgb(small_w).shape == (2, 2, 3)
