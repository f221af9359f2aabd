"""FilterChain — ordered application of geometry steps + named filter
kernels per record, the engine analogue of the reference's
``applyTransformations`` (``processor/vipsprocessor/process.go:596-798``)
and the ordered filter loop (``process.go:761-797``).

Execution model: one ``map_batches`` stage. Within a batch, rows are
grouped by their canonical path (each distinct path compiles to one chain,
compiled once and LRU-cached per actor), and each group's chain runs
vectorized over a ``pandas.Series`` of the group's texts. This mirrors the
reference's per-request sequential chain while staying columnar: the
common case — few distinct chains per batch — is fully vectorized.

Honored reference semantics:

- geometry order: trim → crop → resize/fit/stretch → flips → padding,
  then the ordered named-filter loop (process.go:596-798).
- per-filter disable list + ``MaxFilterOps`` cap
  (process.go:768-774, 783-786; registry processor.go:83-120).
- cross-filter state within one chain via ``ChainCtx``
  (vipsprocessor/context.go:47-59).
- utility-filter pre-scan: ``expire``/``attachment`` are stripped from the
  result path before keying; ``preview``/``raw``/``format`` detected
  (imagor.go:308-338).
- negative-dimension flip fold W<0 → HFlip=!HFlip (imagor.go:380-387).
- export encoding (``format``) applied at the end of the chain
  (process.go:877-994).
- recursive ``image()`` filter: nested imagor path evaluated through this
  same chain compiler with bounded depth like ``MaxFilterOps``
  (filteroverlay.go:15-64; full-dim ``f`` token resolution
  overlay.go:99-151).
"""

from __future__ import annotations

import base64
from typing import Callable

import pandas as pd

from ..functions import imagorpath as ip
from ..functions import kernels as K

__all__ = ["CompiledChain", "compile_chain", "FilterChainStage", "prescan_utility_filters"]

DEFAULT_MAX_FILTER_OPS = 64
DEFAULT_MAX_NESTED_DEPTH = 3

#: filters handled by the pre-scan / orchestration layer, never by kernels
UTILITY_FILTERS = frozenset({"expire", "attachment", "preview", "raw"})


def prescan_utility_filters(p: ip.Params) -> tuple[ip.Params, dict]:
    """Strip ``expire``/``attachment`` from the result path and detect
    ``preview``/``raw``/``format`` — mirrors ``imagor.go:308-338``.

    Returns the rewritten Params (canonical result-key input) plus a dict
    of the extracted utility values.
    """
    util = {"expire_ms": 0, "attachment": "", "preview": False, "raw": False, "format": ""}
    kept = []
    for f in p.filters:
        if f.name == "expire":
            try:
                util["expire_ms"] = int(f.args)
            except (TypeError, ValueError):
                pass
        elif f.name == "attachment":
            # stripped from the result path like expire — the reference's
            # utility-filter loop drops both before regenerating p.Path
            # (imagor.go:312-338); the name travels only in util.
            util["attachment"] = f.args
        else:
            if f.name == "preview":
                util["preview"] = True
            elif f.name == "raw":
                util["raw"] = True
            elif f.name == "format":
                util["format"] = f.args
            kept.append(f)
    q = ip.params_copy(p)
    q.filters = kept
    q.path = ip.generate_path(q)
    return q, util


class CompiledChain:
    """An ordered list of vectorized steps for one canonical path."""

    __slots__ = ("params", "steps", "out_format", "raw", "focal", "has_fill")

    def __init__(self, params: ip.Params, steps: list, raw: bool = False):
        self.params = params
        self.steps = steps
        self.raw = raw
        # ALL focal() filters are parsed from the filter list BEFORE the
        # thumbnail step runs in the reference (process.go:537-571) —
        # pre-scan them here so the resize anchor sees the accumulated
        # rect list; the area-weighted centroid resolves per row.
        self.focal = []
        self.has_fill = any(f.name == "fill" for f in params.filters)
        for f in params.filters:
            if f.name == "focal":
                self.focal.extend(K.parse_focal_args(f.args))

    def run(
        self,
        s: pd.Series,
        lookup: Callable[[str], str] | None = None,
        detector=None,
    ) -> pd.Series:
        """Apply the chain to a Series of texts (one path-group).
        ``detector`` plugs a started Detector into redact/
        draw_detections/smart (detector.go:26-36); None → the
        per-process default digit-run detector."""
        if self.raw:
            return s
        ctx = K.ChainCtx(lookup=lookup)
        ctx.detector = detector
        p = self.params
        ctx.width, ctx.height = p.width, p.height
        ctx.h_align, ctx.v_align = p.h_align, p.v_align
        ctx.fit_in = p.fit_in
        ctx.meta = p.meta
        ctx.focal = list(self.focal) if self.focal else None
        # params padding travels in ctx and is applied by the fill filter at
        # its chain position (filteroverlay.go:129-211), or with the default
        # fill char at the end when no fill() is present.
        ctx.padding = (p.padding_left, p.padding_top, p.padding_right, p.padding_bottom)
        ctx.padding_applied = not any(ctx.padding)
        for step in self.steps:
            s = step(s, ctx)
        if not ctx.padding_applied:
            s = K.apply_params_padding(s, ctx)
        return _encode(s, ctx)


def _encode(s: pd.Series, ctx: K.ChainCtx) -> pd.Series:
    """Export encoding — text-domain format() analogue
    (process.go:877-994). hex matches DuckDB ``hex()`` (uppercase);
    b64 matches DuckDB ``to_base64`` (standard alphabet, padded)."""
    fmt = ctx.out_format
    if fmt in ("", "utf8", "txt", "text"):
        return s
    if fmt == "hex":
        return s.map(lambda t: t.encode("utf-8").hex().upper())
    if fmt in ("b64", "base64"):
        return s.map(lambda t: base64.b64encode(t.encode("utf-8")).decode("ascii"))
    if fmt == "upper":
        return s.str.upper()
    if fmt == "lower":
        return s.str.lower()
    return s


def _geometry_steps(p: ip.Params) -> list:
    """Params-driven pre-filter pipeline steps (process.go:596-798)."""
    steps = []

    if p.trim:
        tol, by = p.trim_tolerance, p.trim_by or "top-left"
        steps.append(lambda s, ctx: K.k_trim(s, ctx, f"{tol},{by}" if tol else f",{by}"))

    if ip.has_crop(p):
        left, top, right, bottom = p.crop_left, p.crop_top, p.crop_right, p.crop_bottom

        def crop_step(s, ctx):
            # manual crop AxB:CxD — floats <1 are fractions of dims,
            # clamped (process.go:607-649). right/bottom are coordinates,
            # not sizes.
            def one(t: str) -> str:
                n = len(t)
                l = int(left * n) if 0 < left < 1 else int(left)
                r = int(right * n) if 0 < right < 1 else int(right)
                l = max(0, min(l, n))
                r = max(l, min(r if r > 0 else n, n))
                if "\n" not in t:
                    return t[l:r]
                lines = t.split("\n")
                nl = len(lines)
                tt = int(top * nl) if 0 < top < 1 else int(top)
                bb = int(bottom * nl) if 0 < bottom < 1 else int(bottom)
                tt = max(0, min(tt, nl))
                bb = max(tt, min(bb if bb > 0 else nl, nl))
                return "\n".join(x[l:r] for x in lines[tt:bb])

            return s.map(one)

        steps.append(crop_step)

    # resize family (thumbnail decision process.go:402-507; fit variants
    # process.go:684-713; adaptive swap process.go:662-668)
    width, height = p.width, p.height
    h_flip, v_flip = p.h_flip, p.v_flip
    if width < 0:
        h_flip, width = not h_flip, -width
    if height < 0:
        v_flip, height = not v_flip, -height
    # requested dims clamp to the processor's output-surface bound
    # (process.go:289-293, 410-413: w/h capped at MaxWidth/MaxHeight)
    width = min(width, K.MAX_DIM)
    height = min(height, K.MAX_DIM)

    if width > 0 or height > 0:
        fit_in, full_fit, adaptive = p.fit_in, p.full_fit_in, p.adaptive_fit_in
        stretch, h_align = p.stretch, p.h_align
        smart = p.smart

        def resize_step(s, ctx):
            w, h = width, height

            # vectorized fast path: the overwhelmingly common shape —
            # fixed width, no adaptive/smart/focal anchoring needed, or
            # a deterministic left/right anchor — is pure pandas str ops.
            if (
                w > 0
                and not adaptive
                and not smart
                and not ctx.focal
                and h_align in ("left", "right")
                and (h <= 0 or not s.str.contains("\n", regex=False).any())
            ):
                side_cut = (0, w) if h_align == "left" else (-w, None)
                if stretch:
                    cut = s.str.slice(*side_cut)
                    return cut.str.pad(
                        w, side="right" if h_align == "left" else "left",
                        fillchar=ctx.fill_char,
                    )
                if fit_in:
                    if full_fit:
                        return s.str.pad(
                            w, side="right" if h_align == "left" else "left",
                            fillchar=ctx.fill_char,
                        )
                    cut = s.str.slice(*side_cut)
                    if ctx.upscale:
                        return cut.str.pad(
                            w, side="right" if h_align == "left" else "left",
                            fillchar=ctx.fill_char,
                        )
                    return cut
                return s.str.slice(*side_cut).str.pad(
                    w, side="right" if h_align == "left" else "left",
                    fillchar=ctx.fill_char,
                )

            def one(t: str) -> str:
                tw, th = w, h
                if adaptive:
                    # swap target W/H when orientations differ
                    # (process.go:662-668): text is "landscape" when it has
                    # more chars per line than lines.
                    lines_n = t.count("\n") + 1
                    text_landscape = len(t) >= lines_n
                    target_landscape = (tw or 1) >= (th or 1)
                    if text_landscape != target_landscape:
                        tw, th = th, tw
                if th > 0 and "\n" in t:
                    lines = t.split("\n")
                    if len(lines) > th:
                        lines = lines[:th]
                    t = "\n".join(lines)
                if tw <= 0:
                    return t
                if stretch:
                    # force exact length ignoring aspect (process.go:706-713)
                    t = _cut(t, tw)
                    return _pad(t, tw)
                if fit_in:
                    if full_fit:
                        # cover: pad up to at least tw (process.go:686-698)
                        return _pad(t, tw)
                    # fit without crop: shrink only, upscale pads
                    if len(t) > tw:
                        return _cut(t, tw)
                    if ctx.upscale:
                        return _pad(t, tw)
                    return t
                # plain resize: cut or pad to exactly tw, anchored
                if len(t) > tw:
                    return _cut(t, tw)
                return _pad(t, tw)

            def _cut(t: str, tw: int) -> str:
                focal = None
                if ctx.focal:
                    focal = K.resolve_focal(
                        ctx.focal, len(t), t.count("\n") + 1
                    )
                if focal is None and smart:
                    # pluggable Detector first (detector.go:26-36 →
                    # probe + focal regions, process.go:577-587)...
                    if ctx.detector is not None:
                        focal = ctx.detector.focal(t)
                    if focal is None:
                        # ...else "most interesting span": centre of the
                        # longest token run (inline heuristic)
                        words = t.split()
                        if words:
                            longest = max(words, key=len)
                            idx = t.find(longest)
                            focal = (idx + len(longest) / 2.0) / max(1, len(t))
                return K._anchor_cut(t, tw, ctx.h_align, focal)

            def _pad(t: str, tw: int) -> str:
                return K._anchor_pad(t, tw, ctx.fill_char, ctx.h_align)

            return s.map(one)

        steps.append(resize_step)

    if h_flip:
        steps.append(lambda s, ctx: s.map(
            lambda t: "\n".join(x[::-1] for x in t.split("\n")) if "\n" in t else t[::-1]
        ))
    if v_flip:
        steps.append(lambda s, ctx: s.map(
            lambda t: "\n".join(reversed(t.split("\n")))
        ))

    return steps


def compile_chain(
    path_or_params: "str | ip.Params",
    disabled_filters: frozenset[str] = frozenset(),
    max_filter_ops: int = DEFAULT_MAX_FILTER_OPS,
    _depth: int = 0,
) -> CompiledChain:
    """Compile a canonical path (or Params) into an ordered step list.

    Mirrors ``applyTransformations`` (process.go:596-798): geometry first,
    then the ordered filter loop honoring the disable list and the
    ``MaxFilterOps`` cap (process.go:768-786).
    """
    p = ip.parse(path_or_params) if isinstance(path_or_params, str) else path_or_params
    p, util = prescan_utility_filters(p)
    if util["raw"]:
        return CompiledChain(p, [], raw=True)

    steps = _geometry_steps(p)

    n_ops = 0
    for f in p.filters:
        if f.name in disabled_filters or f.name in UTILITY_FILTERS:
            continue
        if n_ops >= max_filter_ops:
            break
        n_ops += 1
        if f.name == "image" and _depth < DEFAULT_MAX_NESTED_DEPTH:
            steps.append(_nested_image_step(f.args, disabled_filters, max_filter_ops, _depth))
            continue
        name, args = f.name, f.args
        steps.append(lambda s, ctx, _n=name, _a=args: K.apply_filter(_n, s, ctx, _a))

    return CompiledChain(p, steps)


import re as _re

# `f` / `f-N` full-dimension tokens in a nested path's WxH segment
# (resolveFullDimensions, processor/vipsprocessor/overlay.go:99-151)
_FULL_DIM_RE = _re.compile(r"(?:^|/)((f|full)(-\d+)?x(f|full)(-\d+)?)(?:/|$)")


def _resolve_full_dims(path: str, parent_len: int) -> str:
    """Rewrite ``fxf-20``-style dimension tokens against the parent's
    dimensions before the nested parse (overlay.go:99-151): ``f`` → the
    parent width (text length), ``f-N`` → parent width − N."""
    m = _FULL_DIM_RE.search(path)
    if not m:
        return path

    def one(tok: str) -> str:
        if tok in ("f", "full"):
            return str(parent_len)
        base, minus = tok.split("-", 1)
        return str(max(0, parent_len - int(minus)))

    w = one(m.group(2) + (m.group(3) or ""))
    h = one(m.group(4) + (m.group(5) or ""))
    return path[: m.start(1)] + f"{w}x{h}" + path[m.end(1):]


def _nested_image_step(args: str, disabled, max_ops, depth):
    """Recursive composition: parse the nested imagor path, run the whole
    chain on the referenced source, composite at (x, y, alpha, blend)
    (filteroverlay.go:15-64; args x,y,alpha,blend per image();
    bounded recursion like MaxFilterOps process.go:768-774). Paths with
    ``f``-dimension tokens resolve against each base row's length and
    compile per distinct parent length (small LRU). The legacy x-only
    arg shape keeps the bit-stable 1-D splice; a y/alpha/blend argument
    activates the full 2-D blend composite (overlay.go:154-170,
    228-356)."""
    a = ip.split_args(args)
    # nested-path query-unescape (filteroverlay.go:21-23); failure keeps
    # the raw arg like Go's ignored QueryUnescape error
    raw_path = (a[0] if a else "")
    try:
        import urllib.parse as _up
        raw_path = _up.unquote_plus(raw_path)
    except Exception:
        pass
    nested_path = raw_path.lstrip("/")
    x = a[1] if len(a) > 1 else "left"
    y = a[2] if len(a) > 2 else ""
    alpha = a[3] if len(a) > 3 else ""
    blend = (a[4] if len(a) > 4 else "").strip().lower()
    use_composite = bool(y) or bool(alpha) or bool(blend)
    alpha_f = K._float_arg(alpha) if alpha else 0.0

    def _apply(t: str, item: str) -> str:
        if use_composite:
            return K.composite_text(t, item, x, y, alpha_f, blend or "normal")
        return K._splice(t, item, K.parse_overlay_position(x, len(t), len(item)))

    has_full = _FULL_DIM_RE.search(nested_path) is not None
    static = None if has_full else compile_chain(nested_path, disabled, max_ops, _depth=depth + 1)
    per_len_cache: dict[int, CompiledChain] = {}

    def chain_for(parent_len: int) -> CompiledChain:
        if static is not None:
            return static
        c = per_len_cache.get(parent_len)
        if c is None:
            if len(per_len_cache) > 512:
                per_len_cache.clear()
            c = compile_chain(
                _resolve_full_dims(nested_path, parent_len),
                disabled, max_ops, _depth=depth + 1,
            )
            per_len_cache[parent_len] = c
        return c

    def step(s: pd.Series, ctx: K.ChainCtx) -> pd.Series:
        if ctx.lookup is None:
            return s

        def one(t: str) -> str:
            nested = chain_for(len(t))
            src = ctx.lookup(nested.params.image)
            if src is None:
                return t
            item = nested.run(pd.Series([src]), lookup=ctx.lookup).iloc[0]
            return _apply(t, item)

        if static is not None:
            src = ctx.lookup(static.params.image)
            if src is None:
                return s
            item = static.run(pd.Series([src]), lookup=ctx.lookup).iloc[0]
            return s.map(lambda t: _apply(t, item))
        return s.map(one)

    return step


class FilterChainStage:
    """Actor-pool ``map_batches`` callable running the filter chain.

    Stateful per-actor setup in ``__init__`` (once per actor): the compiled-
    chain LRU and the broadcast dimension lookup — the analogue of the
    reference's per-replica processor state: vips startup
    (processor.go:127-209), ristretto result cache (cache.go:14-163) and
    watermark cache (overlay.go:17-94).

    Use::

        ds.map_batches(FilterChainStage, fn_constructor_kwargs={...},
                       batch_format="pandas", concurrency=N, batch_size=B)

    Input batch columns: ``path`` (canonical imagor path) and ``text``.
    Output: same batch with ``text`` replaced by the chain result.
    """

    def __init__(
        self,
        dim_ref=None,
        text_col: str = "text",
        path_col: str = "path",
        disabled_filters: frozenset[str] = frozenset(),
        max_filter_ops: int = DEFAULT_MAX_FILTER_OPS,
        cache_size: int = 4096,
        result_cache_bytes: int = 0,
        preview_cache_bytes: int = 4 << 20,
        suppress_duplicates: bool = False,
        detector=None,
    ):
        from .detector import make_detector

        # the per-actor model slot (detector.go:26-36): started ONCE in
        # __init__, reused for every batch; swap via registry name /
        # factory / instance
        self._detector = make_detector(detector)
        self._chains: dict[str, CompiledChain] = {}
        self._cache_size = cache_size
        self._text_col = text_col
        self._path_col = path_col
        self._disabled = disabled_filters
        self._max_ops = max_filter_ops
        self._lookup = None
        # per-actor LRU result cache keyed by (chain path, input text) —
        # the engine analogue of imagor's byte-budgeted ristretto result
        # cache keyed by signed-path hash (cache.go:14-163; eligibility
        # imagor.go:52-62, 429-453). Byte budget, insertion-order evict.
        self._result_cache_bytes = result_cache_bytes
        self._result_cache: "dict[tuple[str, str], str]" = {}
        self._result_cache_used = 0
        self.cache_hits = 0
        self.cache_misses = 0
        # preview cacher tier (imagor.go:52-62, process.go:61-72):
        # preview() rows bypass result storage, so the reference gives
        # them a memory cacher instead — here a dedicated byte-budgeted
        # per-actor cache that preview-flagged rows always consult, even
        # when the general result cache is disabled
        self._preview_cache_bytes = preview_cache_bytes
        self._preview_cache: "dict[tuple[str, str], str]" = {}
        self._preview_cache_used = 0
        self.preview_cache_hits = 0
        self.preview_cache_misses = 0
        # within-batch duplicate suppression — singleflight collapse
        # (imagor.go:114, 842-884): identical (path, text) keys compute
        # once per batch and fan back; across batches the idempotent sink
        # makes duplicates harmless.
        self._suppress = suppress_duplicates
        if dim_ref is not None:
            import ray
            dim = ray.get(dim_ref) if not isinstance(dim_ref, dict) else dim_ref
            self._lookup = dim.get

    def _chain(self, path: str) -> CompiledChain:
        c = self._chains.get(path)
        if c is None:
            if len(self._chains) >= self._cache_size:
                self._chains.clear()  # simple epoch eviction; paths recompile
            c = compile_chain(path, self._disabled, self._max_ops)
            self._chains[path] = c
        return c

    def _cache_put(self, key: tuple[str, str], value: str) -> None:
        size = len(key[1]) + len(value) + 64
        while self._result_cache and self._result_cache_used + size > self._result_cache_bytes:
            k, v = next(iter(self._result_cache.items()))
            self._result_cache.pop(k)
            self._result_cache_used -= len(k[1]) + len(v) + 64
        if size <= self._result_cache_bytes:
            self._result_cache[key] = value
            self._result_cache_used += size

    def _run_group(self, path: str, texts: pd.Series) -> pd.Series:
        chain = self._chain(path)
        if self._result_cache_bytes <= 0 and not self._suppress:
            return chain.run(texts.astype(str), lookup=self._lookup,
                             detector=self._detector)
        texts = texts.astype(str)
        uniq = texts.drop_duplicates()
        results: dict[str, str] = {}
        todo = []
        for t in uniq:
            hit = self._result_cache.get((path, t)) if self._result_cache_bytes else None
            if hit is not None:
                results[t] = hit
                self.cache_hits += 1
            else:
                todo.append(t)
                self.cache_misses += 1
        if todo:
            computed = chain.run(pd.Series(todo), lookup=self._lookup,
                                 detector=self._detector)
            for t, r in zip(todo, computed):
                results[t] = r
                if self._result_cache_bytes:
                    self._cache_put((path, t), r)
        return texts.map(results)

    def _preview_put(self, key: tuple[str, str], value: str) -> None:
        size = len(key[1]) + len(value) + 64
        while (self._preview_cache
               and self._preview_cache_used + size > self._preview_cache_bytes):
            k, v = next(iter(self._preview_cache.items()))
            self._preview_cache.pop(k)
            self._preview_cache_used -= len(k[1]) + len(v) + 64
        if size <= self._preview_cache_bytes:
            self._preview_cache[key] = value
            self._preview_cache_used += size

    def _run_preview_group(self, path: str, texts: pd.Series) -> pd.Series:
        """Chain run for preview() rows through the preview memory
        cacher: every distinct (path, text) is looked up first and
        cached after — repeat preview requests never recompute."""
        chain = self._chain(path)
        texts = texts.astype(str)
        results: dict[str, str] = {}
        todo = []
        for t in texts.drop_duplicates():
            hit = self._preview_cache.get((path, t))
            if hit is not None:
                results[t] = hit
                self.preview_cache_hits += 1
            else:
                todo.append(t)
                self.preview_cache_misses += 1
        if todo:
            computed = chain.run(pd.Series(todo), lookup=self._lookup,
                                 detector=self._detector)
            for t, r in zip(todo, computed):
                results[t] = r
                self._preview_put((path, t), r)
        return texts.map(results)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import time as _time

        from ..state import metrics as _metrics

        t0 = _time.perf_counter()
        hits0, misses0 = self.cache_hits, self.cache_misses
        texts = batch[self._text_col]
        out = texts.copy()
        preview_idx = None
        if (self._preview_cache_bytes > 0 and "preview" in batch.columns
                and batch["preview"].any()):
            preview_idx = batch.index[batch["preview"].astype(bool)]
        for path, idx in texts.groupby(batch[self._path_col]).groups.items():
            if preview_idx is not None:
                pidx = idx.intersection(preview_idx)
                nidx = idx.difference(pidx)
                if len(nidx):
                    out.loc[nidx] = self._run_group(path, texts.loc[nidx])
                if len(pidx):
                    out.loc[pidx] = self._run_preview_group(path, texts.loc[pidx])
            else:
                out.loc[idx] = self._run_group(path, texts.loc[idx])
        batch[self._text_col] = out
        # per-batch counter adds (process-local, prometheus.go:51-80
        # analogue — per-replica counters, one add per batch)
        _metrics.inc("chain.rows", len(batch))
        _metrics.inc("chain.ms", int((_time.perf_counter() - t0) * 1000))
        _metrics.inc("chain.cache_hits", self.cache_hits - hits0)
        _metrics.inc("chain.cache_misses", self.cache_misses - misses0)
        if preview_idx is not None:
            _metrics.inc("chain.preview_rows", len(preview_idx))
        return batch


# Stateless-task form of the chain stage: compiled chains and the resolved
# broadcast dimension live in a per-worker-process cache, so plain map
# tasks amortize setup exactly like an actor would — without actor-pool
# startup/autoscaling latency. Use the class form when per-actor state is
# genuinely heavy (models, big caches); use this for cheap state.
_CHAIN_STAGE_CACHE: dict[tuple, FilterChainStage] = {}


def filter_chain_batch(
    batch: pd.DataFrame,
    dim_ref=None,
    text_col: str = "text",
    path_col: str = "path",
    disabled_filters: tuple = (),
    max_filter_ops: int = DEFAULT_MAX_FILTER_OPS,
    detector: str | None = None,
) -> pd.DataFrame:
    key = (str(dim_ref), text_col, path_col,
           tuple(disabled_filters), max_filter_ops, detector)
    stage = _CHAIN_STAGE_CACHE.get(key)
    if stage is None:
        if len(_CHAIN_STAGE_CACHE) > 8:
            _CHAIN_STAGE_CACHE.clear()
        stage = _CHAIN_STAGE_CACHE.setdefault(
            key, FilterChainStage(
                dim_ref=dim_ref, text_col=text_col, path_col=path_col,
                disabled_filters=frozenset(disabled_filters),
                max_filter_ops=max_filter_ops, detector=detector,
            )
        )
    return stage(batch)
