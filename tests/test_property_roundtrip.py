"""Property-based round-trip tests (hypothesis): generate_path ∘ parse is
a fixed point for canonical Params — the invariant behind result keying
(reference round-trips are table-driven, params_test.go:13-606; the
engine adds generative coverage on top)."""

from __future__ import annotations

import string

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from imagor_ray.functions import imagorpath as ip
from imagor_ray.stages.chain import FilterChainStage, compile_chain

_IMG = st.text(
    alphabet=string.ascii_letters + string.digits + "-_./", min_size=1, max_size=40
).filter(
    lambda s: not s.startswith("/")
    and "//" not in s
    and ".." not in s.split("/")
    and "." not in (s.split("/")[0],)
)

_FILTER_NAMES = st.sampled_from(
    ["grayscale", "brightness", "trim", "max_bytes", "label", "redact", "fill"]
)


@st.composite
def params_strategy(draw):
    p = ip.Params()
    p.meta = draw(st.booleans())
    if draw(st.booleans()):
        p.trim = True
        p.trim_by = draw(st.sampled_from(["top-left", "bottom-right"]))
        p.trim_tolerance = draw(st.integers(0, 200))
    if draw(st.booleans()):
        p.crop_left = draw(st.integers(1, 50))
        p.crop_top = draw(st.integers(1, 50))
        p.crop_right = draw(st.integers(51, 99))
        p.crop_bottom = draw(st.integers(51, 99))
    p.fit_in = draw(st.booleans())
    if p.fit_in:
        p.adaptive_fit_in = draw(st.booleans())
        p.full_fit_in = draw(st.booleans())
    else:
        p.stretch = draw(st.booleans())
    if draw(st.booleans()):
        p.width = draw(st.integers(0, 99999))
        p.height = draw(st.integers(0, 99999))
        p.h_flip = draw(st.booleans())
        p.v_flip = draw(st.booleans())
    if draw(st.booleans()):
        p.padding_left = draw(st.integers(1, 99))
        p.padding_top = draw(st.integers(1, 99))
        p.padding_right = p.padding_left
        p.padding_bottom = p.padding_top
    p.h_align = draw(st.sampled_from(["", "left", "right"]))
    p.v_align = draw(st.sampled_from(["", "top", "bottom"]))
    p.smart = draw(st.booleans())
    n_filters = draw(st.integers(0, 3))
    filters = []
    for _ in range(n_filters):
        name = draw(_FILTER_NAMES)
        args = draw(st.sampled_from(["", "5", "50", "x", "hi,left"]))
        filters.append(ip.Filter(name, args))
    p.filters = filters
    p.image = draw(_IMG)
    return p


@settings(max_examples=300, deadline=None)
@given(params_strategy())
def test_generate_parse_fixed_point(p):
    path = ip.generate_path(p)
    q = ip.parse(path)
    assert ip.generate_path(q) == path
    # idempotence of a second round
    assert ip.parse(ip.generate_path(q)) == q


@settings(max_examples=100, deadline=None)
@given(params_strategy(), st.text(min_size=0, max_size=80))
def test_chain_is_deterministic_and_total(p, text):
    """Every generated chain runs without error and deterministically."""
    path = ip.generate_path(p)
    chain = compile_chain(path)
    a = chain.run(pd.Series([text])).iloc[0]
    b = chain.run(pd.Series([text])).iloc[0]
    assert a == b


class TestResultCacheAndSuppression:
    def test_cache_hits_on_repeat(self):
        stage = FilterChainStage(result_cache_bytes=1 << 20)
        df = pd.DataFrame({
            "path": ["filters:grayscale()/img"] * 4,
            "text": ["AB", "AB", "CD", "AB"],
        })
        out = stage(df.copy())
        assert out["text"].tolist() == ["ab", "ab", "cd", "ab"]
        assert stage.cache_misses == 2  # AB and CD computed once each
        stage(df.copy())
        # second batch fully cached (hits counted per unique text)
        assert stage.cache_hits == 2 and stage.cache_misses == 2

    def test_suppression_computes_unique_once(self):
        stage = FilterChainStage(suppress_duplicates=True)
        df = pd.DataFrame({
            "path": ["filters:grayscale()/img"] * 3,
            "text": ["AB", "AB", "AB"],
        })
        out = stage(df.copy())
        assert out["text"].tolist() == ["ab"] * 3

    def test_cache_evicts_within_budget(self):
        stage = FilterChainStage(result_cache_bytes=300)
        df = pd.DataFrame({
            "path": ["filters:grayscale()/img"] * 3,
            "text": ["X" * 100, "Y" * 100, "Z" * 100],
        })
        stage(df.copy())
        assert stage._result_cache_used <= 300
