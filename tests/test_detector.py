"""Pluggable Detector interface (detector.go:26-36): one-time per-actor
startup, registry swap, and bit-stable redact/draw through the stage."""

from __future__ import annotations

import pandas as pd
import pytest

from imagor_ray.stages.chain import FilterChainStage, compile_chain
from imagor_ray.stages.detector import (
    DETECTORS, Detector, DetectorStage, DigitRunDetector, make_detector,
    register_detector,
)


class VowelDetector(Detector):
    """Custom detector: vowel runs, focal at the first vowel."""

    name = "vowel"
    startup_count = 0

    def startup(self):
        super().startup()
        import re

        self._re = re.compile(r"[aeiou]+")

    def detect(self, text):
        return [(m.start(), m.end(), "vowel", 0.9) for m in self._re.finditer(text)]

    def focal(self, text):
        spans = self.detect(text)
        if not spans:
            return None
        return (spans[0][0] + spans[0][1]) / 2.0 / max(1, len(text))


class TestInterface:
    def test_startup_runs_once_per_make(self):
        before = DigitRunDetector.startup_count
        det = make_detector("digit-run")
        assert DigitRunDetector.startup_count == before + 1
        # repeated use does not re-start
        det.detect("a1b22c")
        det.detect("x999")
        assert DigitRunDetector.startup_count == before + 1

    def test_detect_regions_shape(self):
        det = make_detector(None)
        regions = det.detect("ab12cd345")
        assert regions == [(2, 4, "digit-run", 1.0), (6, 9, "digit-run", 1.0)]

    def test_registry_swap(self):
        register_detector("vowel", VowelDetector)
        assert "vowel" in DETECTORS
        det = make_detector("vowel")
        assert [r[:2] for r in det.detect("hello")] == [(1, 2), (4, 5)]

    def test_generic_replace_spans_equals_vectorized(self):
        s = pd.Series(["ab12cd345", "no digits", "9", ""], dtype=object)
        fast = make_detector("digit-run")
        # force the generic base-class path on the same regions
        generic = Detector.replace_spans(fast, s, lambda sp: "*" * len(sp))
        vectorized = fast.replace_spans(s, lambda sp: "*" * len(sp))
        assert generic.tolist() == vectorized.tolist()


class TestChainWiring:
    def test_redact_bit_stable_through_stage(self):
        # redact oracle semantics unchanged when run through an actor-held
        # detector (the round-1 verdict's done-condition)
        stage = FilterChainStage()
        df = pd.DataFrame({
            "path": ["filters:redact()/img"] * 3,
            "text": ["call 555 now 42", "no digits here", "x1y22z333"],
        })
        out = stage(df.copy())
        assert out["text"].tolist() == [
            "call *** now **", "no digits here", "x*y**z***"]

    def test_custom_detector_drives_redact(self):
        register_detector("vowel", VowelDetector)
        stage = FilterChainStage(detector="vowel")
        df = pd.DataFrame({"path": ["filters:redact()/img"], "text": ["hello 123"]})
        out = stage(df.copy())
        # vowels masked, digits untouched
        assert out["text"].tolist() == ["h*ll* 123"]

    def test_custom_detector_drives_smart_crop(self):
        register_detector("vowel", VowelDetector)
        chain = compile_chain("4x0/smart/img")
        base = "zzzzzzzzzzonly"  # vowel 'o' at index 10
        det = make_detector("vowel")
        out = chain.run(pd.Series([base], dtype=object), detector=det).iloc[0]
        # anchored at the vowel focal, not the longest-token-run centre
        assert "o" in out

    def test_draw_detections_through_interface(self):
        chain = compile_chain("filters:draw_detections()/img")
        out = chain.run(pd.Series(["ab 12"], dtype=object)).iloc[0]
        # marker char is the round-1 palette pick (FNV-32a stable)
        assert out != "ab 12" and "12" in out


class TestDetectorStage:
    def test_actor_pool_one_time_init(self, ray_session):
        import ray.data as rd

        before = DigitRunDetector.startup_count
        ds = rd.from_pandas(pd.DataFrame({
            "text": [f"row {i} has {i * 7} things" for i in range(64)]
        }))
        out = ds.map_batches(
            DetectorStage, batch_format="pandas", batch_size=8,
            concurrency=2, num_cpus=1,
        ).to_pandas()
        assert out["n_detections"].sum() > 0
        assert len(out) == 64
        # startup ran per actor (2), never per batch (64/8=8 batches);
        # actors are separate processes so the driver-side count is
        # unchanged — assert it did not balloon here
        assert DigitRunDetector.startup_count == before

    def test_stage_local_counts(self):
        stage = DetectorStage()
        b1 = stage(pd.DataFrame({"text": ["a1", "b22"]}))
        b2 = stage(pd.DataFrame({"text": ["c333"]}))
        assert b1["n_detections"].tolist() == [1, 1]
        assert b2["n_detections"].tolist() == [1]
