"""Plugin protocol conformance (imagor.go:28-79, detector.go:26-36) and
ErrForward chain fallthrough (errors.go:47-54, imagor.go:477-508)."""

from __future__ import annotations

import pandas as pd
import pytest

from imagor_ray.protocols import (
    BatchProcessor, DetectorLike, ErrForward, ProcessorChain, ResultStore,
    Transport,
)


class TestConformance:
    def test_transports(self, tmp_path):
        from imagor_ray.sources.loader import FlakyTransport, LocalFileTransport

        t = LocalFileTransport(str(tmp_path))
        assert isinstance(t, Transport)
        assert isinstance(FlakyTransport(t), Transport)

    def test_batch_processors(self):
        from imagor_ray.sources.loader import GuardedLoaderStage, LocalFileTransport
        from imagor_ray.stages.chain import FilterChainStage
        from imagor_ray.stages.detector import DetectorStage
        from imagor_ray.stages.multimodal import MediaDecodeStage

        for cls_instance in (
            FilterChainStage(),
            DetectorStage(),
            GuardedLoaderStage(LocalFileTransport("/tmp")),
            MediaDecodeStage(),
        ):
            assert isinstance(cls_instance, BatchProcessor), type(cls_instance)

    def test_result_store(self, tmp_path):
        from imagor_ray.state.sink import ExactlyOnceSink

        assert isinstance(ExactlyOnceSink(str(tmp_path)), ResultStore)

    def test_detectors(self):
        from imagor_ray.stages.detector import DigitRunDetector, make_detector

        assert isinstance(make_detector(None), DetectorLike)
        assert issubclass(DigitRunDetector, DigitRunDetector)


class TestProcessorChain:
    @staticmethod
    def _declining(tag):
        def proc(batch):
            b = batch.copy()
            b["trace"] = b.get("trace", "") + tag
            raise ErrForward(b)
        return proc

    @staticmethod
    def _handling(tag):
        def proc(batch):
            b = batch.copy()
            b["handled_by"] = tag
            return b
        return proc

    def test_first_success_wins(self):
        chain = ProcessorChain([self._handling("a"), self._handling("b")])
        out = chain(pd.DataFrame({"x": [1]}))
        assert out["handled_by"].iloc[0] == "a"

    def test_forward_rewrites_and_falls_through(self):
        chain = ProcessorChain([
            self._declining("p1;"), self._declining("p2;"), self._handling("p3"),
        ])
        out = chain(pd.DataFrame({"x": [1], "trace": [""]}))
        # the handler saw BOTH rewrites — the forwarded batch carries state
        assert out["trace"].iloc[0] == "p1;p2;"
        assert out["handled_by"].iloc[0] == "p3"

    def test_exhausted_chain_raises_last_forward(self):
        chain = ProcessorChain([self._declining("p1;"), self._declining("p2;")])
        with pytest.raises(ErrForward) as ei:
            chain(pd.DataFrame({"x": [1], "trace": [""]}))
        assert ei.value.batch["trace"].iloc[0] == "p1;p2;"

    def test_empty_chain_is_identity(self):
        df = pd.DataFrame({"x": [1]})
        out = ProcessorChain([])(df)
        assert out is df
