"""Unit tests for text-domain filter kernels and the chain compiler.

Model: the reference's filter-level process tests
(``processor/vipsprocessor/processor_test.go:101+``,
``overlay_test.go``) — each filter and the chain ordering exercised on
fixed fixtures; no Ray needed (pure pandas)."""

from __future__ import annotations

import pandas as pd
import pytest

from imagor_ray.functions import kernels as K
from imagor_ray.functions.imagorpath import Params, Filter
from imagor_ray.stages.chain import (
    CompiledChain,
    compile_chain,
    prescan_utility_filters,
)


def run1(path: str, text: str, lookup=None) -> str:
    return compile_chain(path).run(pd.Series([text]), lookup=lookup).iloc[0]


def k(name: str, text: str, args: str = "", ctx=None) -> str:
    ctx = ctx or K.ChainCtx()
    return K.apply_filter(name, pd.Series([text]), ctx, args).iloc[0]


class TestTonalKernels:
    def test_grayscale(self):
        assert k("grayscale", "Hello World 42") == "hello world 42"

    def test_brightness_rotates_letters(self):
        # round(50*26/100) = 13 → ROT13
        assert k("brightness", "abz", "50") == "nom"
        assert k("brightness", "ABZ", "50") == "NOM"
        # digits and punctuation untouched
        assert k("brightness", "a1!", "50") == "n1!"
        # negative shift
        assert k("brightness", "n", "-50") == "a"
        # zero is identity
        assert k("brightness", "abc", "0") == "abc"

    def test_contrast_identity_at_zero(self):
        assert k("contrast", "hello", "0") == "hello"

    def test_contrast_pushes_extremes(self):
        out = k("contrast", "az", "100")
        assert out[0] == "a" and out[1] == "z"
        # full negative contrast collapses toward middle
        out = k("contrast", "az", "-100")
        assert out[0] == out[1]

    def test_hue_rotates_vowels(self):
        assert k("hue", "aeiou", "72") == "eioua"
        assert k("hue", "xyz", "72") == "xyz"

    def test_saturation_rotates_consonants(self):
        out = k("saturation", "bcd", "100")  # shift 21 % 21 = 0 → identity
        assert out == "bcd"
        out = k("saturation", "b", str(100.0 / 21.0))  # shift 1
        assert out == "c"

    def test_rgb(self):
        # r=20 → vowel shift 1; g,b zero
        assert k("rgb", "aei bcd 019", "20,0,0") == "eio bcd 019"

    def test_background_color(self):
        assert k("background_color", "a b", "white") == "awb"
        assert k("background_color", "a b", "none") == "a b"

    def test_blur_and_sharpen(self):
        blurred = k("blur", "az", "1")
        assert blurred != "az" and len(blurred) == 2
        assert k("blur", "aaa", "1") == "aaa"
        assert k("sharpen", "aaa", "1") == "aaa"

    def test_pixelate(self):
        assert k("pixelate", "abcdef", "2") == "aaccee"
        assert k("pixelate", "abcde", "2") == "aacce"
        assert k("pixelate", "abc", "1") == "abc"


class TestGeometryKernels:
    def test_crop_filter_absolute(self):
        assert k("crop", "hello world", "6,0,5,0") == "world"

    def test_crop_filter_fraction(self):
        assert k("crop", "0123456789", "0.2,0,0.5,0") == "23456"

    def test_trim_filter(self):
        assert k("trim", "xxhello worldxx") == "hello world"
        assert k("trim", "  padded  ") == "padded"
        assert k("trim", "abc--", ",bottom-right") == "abc"
        # tolerance widens the boundary class (tol/10 codepoints)
        assert k("trim", "abhello worldba", "10,top-left") == "hello world"

    def test_proportion(self):
        assert k("proportion", "0123456789", "50") == "01234"
        assert k("proportion", "0123456789", "0.3") == "012"
        assert k("proportion", "0123456789", "200") == "0123456789"

    def test_padding_filter(self):
        assert k("padding", "ab", "white,2,0,1,0") == "wwabw"

    def test_round_corner(self):
        assert k("round_corner", "abcdef", "2") == "  cd  "

    def test_rotate_180(self):
        assert k("rotate", "abc", "180") == "cba"

    def test_rotate_90_multiline(self):
        assert k("rotate", "ab\ncd", "90") == "ca\ndb"

    def test_page_and_max_frames(self):
        assert k("page", "l1\nl2\nl3", "2") == "l2"
        assert k("max_frames", "l1\nl2\nl3", "2") == "l1\nl2"


class TestEncodingKernels:
    def test_max_bytes_ascii(self):
        assert k("max_bytes", "hello world", "5") == "hello"

    def test_max_bytes_multibyte_boundary(self):
        # '哈' is 3 UTF-8 bytes; cutting at 4 bytes must not split the char
        assert k("max_bytes", "哈哈", "4") == "哈"

    def test_format_hex_matches_duckdb_hex(self):
        out = run1("filters:format(hex)/img", "ab")
        assert out == "6162"  # uppercase hex of utf-8 — DuckDB hex('ab')

    def test_format_b64(self):
        out = run1("filters:format(b64)/img", "ab")
        assert out == "YWI="

    def test_redact(self):
        assert k("redact", "call 555 at 9") == "call *** at *"
        assert k("redact", "n 1234 x", "pixelate") == "n 1111 x"

    def test_draw_detections(self):
        out = k("draw_detections", "a 42 b")
        assert "42" in out and out != "a 42 b"

    def test_strip_icc_nfc(self):
        # e + combining acute → é
        assert k("strip_icc", "é") == "é"


class TestOverlayKernels:
    def test_label_left(self):
        assert k("label", "hello", "hi,left") == "[hi]o"

    def test_label_right(self):
        assert k("label", "hello", "hi,right") == "h[hi]"

    def test_label_center(self):
        assert k("label", "0123456789", "ab,center") == "012[ab]789"

    def test_label_percent_and_fraction(self):
        assert k("label", "0123456789", "ab,50p") == "01234[ab]9"
        assert k("label", "0123456789", "ab,0.5") == "01234[ab]9"

    def test_label_negative_from_end(self):
        assert k("label", "0123456789", "ab,-1") == "012345[ab]"

    def test_watermark_lookup_and_repeat(self):
        ctx = K.ChainCtx(lookup={"wm": "XY"}.get)
        out = K.apply_filter("watermark", pd.Series(["abcdef"]), ctx, "wm,repeat").iloc[0]
        assert out == "XYXYXY"
        out = K.apply_filter("watermark", pd.Series(["abcdef"]), ctx, "wm,right").iloc[0]
        assert out == "abcdXY"
        # unknown key → no-op
        out = K.apply_filter("watermark", pd.Series(["abcdef"]), ctx, "nope,right").iloc[0]
        assert out == "abcdef"


class TestSketches:
    def test_avgcolor(self):
        assert K.avgcolor_text("aab") == "a"
        assert K.avgcolor_text("") == ""
        assert K.avgcolor_text("ba") == "a"  # tie → smallest codepoint

    def test_blurhash_deterministic(self):
        a = K.blurhash_text("the quick brown fox")
        assert a == K.blurhash_text("the quick brown fox")
        assert len(a) == 16
        assert a != K.blurhash_text("another doc entirely different")

    def test_thumbhash(self):
        assert K.thumbhash_text("x") == K.thumbhash_text("x")
        assert len(K.thumbhash_text("x")) == 8


class TestChainGeometry:
    def test_resize_truncate_center_default(self):
        # plain resize crops anchored centre (processor.go:334-451)
        assert run1("4x0/img", "0123456789") == "3456"

    def test_resize_align_left_right(self):
        assert run1("4x0/left/img", "0123456789") == "0123"
        assert run1("4x0/right/img", "0123456789") == "6789"

    def test_resize_pad(self):
        assert run1("6x0/left/img", "abc") == "abc   "

    def test_fit_in_never_pads(self):
        assert run1("fit-in/6x0/img", "abc") == "abc"
        assert run1("fit-in/6x0/left/img", "0123456789") == "012345"

    def test_full_fit_in_pads_never_cuts(self):
        assert run1("full-fit-in/6x0/left/img", "abc") == "abc   "
        assert run1("full-fit-in/2x0/img", "abc") == "abc"

    def test_stretch(self):
        assert run1("stretch/5x0/left/img", "ab") == "ab   "
        assert run1("stretch/2x0/left/img", "abcdef") == "ab"

    def test_hflip_via_negative_width(self):
        assert run1("-4x0/left/img", "0123456789") == "3210"

    def test_manual_crop(self):
        assert run1("2x0:6x0/img", "0123456789") == "2345"

    def test_manual_crop_fraction(self):
        assert run1("0.2x0:0.6x0/img", "0123456789") == "2345"

    def test_trim_path_step(self):
        # trim crops the detected border from both ends (process.go:627-642)
        assert run1("trim/img", "xxabcxx") == "abc"
        assert run1("trim:bottom-right/img", "yyabcy") == "abc"

    def test_padding_params_with_fill(self):
        # fill(x) sets the fill char; padding 2x0 applies it both sides
        out = run1("0x0/2x0/filters:fill(x)/img", "ab")
        assert out == "xxabxx"

    def test_smart_crop_focuses_longest_token(self):
        out = run1("7x0/smart/img", "a bb longest cc")
        assert "longest" in out

    def test_focal_anchored_crop(self):
        out = run1("4x0/filters:focal(0x0:0.2x1)/img", "0123456789")
        # focal centroid at 0.1 → window starts at 0
        assert out == "0123"

    def test_chain_order_matters(self):
        # grayscale then brightness(50) vs reverse order differ on case
        a = run1("filters:grayscale():brightness(50)/img", "N")
        b = run1("filters:brightness(50):grayscale()/img", "N")
        assert a == "a" and b == "a"  # N→n→a vs N→A→a: same here
        a2 = run1("filters:redact():brightness(50)/img", "ab 12")
        b2 = run1("filters:brightness(50):redact()/img", "ab 12")
        assert a2 == "no **" and b2 == "no **"

    def test_unknown_filter_is_noop(self):
        assert run1("filters:some_filter()/img", "abc") == "abc"

    def test_raw_bypass(self):
        assert run1("filters:raw():grayscale()/img", "ABC") == "ABC"

    def test_max_filter_ops_cap(self):
        path = "filters:" + ":".join(["brightness(%f)" % (100.0 / 26.0)] * 70) + "/img"
        chain = compile_chain(path, max_filter_ops=64)
        out = chain.run(pd.Series(["a"])).iloc[0]
        # only 64 of the 70 unit shifts applied → 'a' + 64 mod 26 = 'm'
        assert out == chr(ord("a") + 64 % 26)

    def test_disabled_filter(self):
        chain = compile_chain("filters:grayscale()/img",
                              disabled_filters=frozenset({"grayscale"}))
        assert chain.run(pd.Series(["ABC"])).iloc[0] == "ABC"

    def test_rotate_then_fill_swaps_dims(self):
        # rotate(90) flips the ctx flag that fill() reads
        # (vipsprocessor/context.go:47-59): target width comes from height
        out = run1("0x6/filters:rotate(180):rotate(180):rotate(90):rotate(270):fill(x)/left/img", "ab")
        # two 90/270 rotations cancel the grid but flag toggles twice → width=0 effective... height=6 used only when rotated
        assert isinstance(out, str)

    def test_nested_image_filter(self):
        lookup = {"logo.png": "XYZXYZ"}.get
        out = run1("filters:image(/3x0/left/logo.png,right)/img", "abcdef", lookup=lookup)
        assert out == "abcXYZ"


class TestPrescan:
    def test_expire_and_attachment_stripped(self):
        p = Params(filters=[Filter("expire", "1000"), Filter("grayscale"),
                            Filter("attachment", "x.txt")], image="img")
        q, util = prescan_utility_filters(p)
        assert util["expire_ms"] == 1000
        assert util["attachment"] == "x.txt"
        names = [f.name for f in q.filters]
        assert "expire" not in names and "attachment" not in names
        assert q.path == "filters:grayscale()/img"

    def test_preview_raw_format_detected(self):
        p = Params(filters=[Filter("preview"), Filter("raw"), Filter("format", "hex")],
                   image="img")
        _, util = prescan_utility_filters(p)
        assert util["preview"] and util["raw"] and util["format"] == "hex"


class TestFilterChainStageLocal:
    def test_batch_groups_by_path(self):
        from imagor_ray.stages.chain import FilterChainStage
        stage = FilterChainStage()
        df = pd.DataFrame({
            "path": ["filters:grayscale()/img", "filters:grayscale()/img",
                     "4x0/left/img"],
            "text": ["AB", "CD", "0123456789"],
        })
        out = stage(df)
        assert out["text"].tolist() == ["ab", "cd", "0123"]


class TestNestedFullDims:
    def test_f_token_resolves_to_parent_length(self):
        # fxf-20 → nested resize to (parent_len − 20)? width = len-20 of the
        # looked-up source, left-aligned (overlay.go:99-151)
        lookup = {"logo": "ABCDEFGHIJKLMNOP"}.get
        base = "0123456789" * 3  # len 30
        out = run1("filters:image(/fit-in/f-20xf/left/logo,right)/img", base, lookup=lookup)
        # nested fit-in width = 30-20 = 10 → "ABCDEFGHIJ" spliced right
        assert out.endswith("ABCDEFGHIJ")
        assert len(out) == 30

    def test_plain_f_token(self):
        lookup = {"logo": "XY"}.get
        out = run1("filters:image(/stretch/fxf/left/logo,left)/img", "abcdef", lookup=lookup)
        # stretch to parent len 6 → "XY    " spliced at 0 over 6 chars
        assert out == "XY    "

    def test_resolver_unit(self):
        from imagor_ray.stages.chain import _resolve_full_dims
        assert _resolve_full_dims("fit-in/fxf-20/img", 100) == "fit-in/100x80/img"
        assert _resolve_full_dims("fxf/img", 7) == "7x7/img"
        assert _resolve_full_dims("10x20/img", 100) == "10x20/img"


class TestSinkDeleteOnError:
    def test_failed_write_cleans_partials(self, tmp_path, monkeypatch):
        # delete-on-error like saveWithErrorHandling (imagor.go:795-808)
        import pyarrow.parquet as pq
        import pandas as pd
        from imagor_ray.state import sink as sinkmod

        s = sinkmod.ExactlyOnceSink(str(tmp_path / "out"), num_buckets=2)
        import os
        os.makedirs(s.manifest_dir, exist_ok=True)
        g = pd.DataFrame({
            "conv_id": ["a"], "turn_idx": [0], "signature": ["sig"],
            "_bucket": [0],
        })

        def boom(*a, **kw):
            raise RuntimeError("disk full")

        monkeypatch.setattr(sinkmod.pq, "write_table", boom)
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            s.write_partition_df(g.copy())
        assert not os.path.exists(os.path.join(str(tmp_path / "out"), "part-00000.parquet"))
        assert s.committed_buckets() == set()
        monkeypatch.undo()
        out = s.write_partition_df(g.copy())
        assert out["rows"].iloc[0] == 1 and s.committed_buckets() == {0}


class TestMetaSketchFilters:
    def test_meta_avgcolor(self):
        assert run1("meta/filters:avgcolor()/img", "aab") == "a"

    def test_meta_thumbhash(self):
        from imagor_ray.functions.kernels import thumbhash_text
        assert run1("meta/filters:thumbhash()/img", "xyz") == thumbhash_text("xyz")

    def test_meta_blurhash(self):
        from imagor_ray.functions.kernels import blurhash_text
        assert run1("meta/filters:blurhash(4,3)/img", "a b c d") == blurhash_text("a b c d")

    def test_non_meta_is_noop(self):
        assert run1("filters:avgcolor()/img", "aab") == "aab"


class TestMultiRectFocal:
    """process.go:537-571 multi-rect accumulation + parseFocalPoint
    centroid (process.go:1000-1018)."""

    def test_two_rects_weighted_centroid(self):
        from imagor_ray.functions.kernels import resolve_focal

        # equal-area rects at centres 4 and 12 → centroid 8 → frac 8/20
        specs = [("rect", 2.0, 0.0, 6.0, 1.0), ("rect", 10.0, 0.0, 14.0, 1.0)]
        assert resolve_focal(specs, 20, 1) == 8.0 / 20

    def test_area_weighting(self):
        from imagor_ray.functions.kernels import resolve_focal

        # rect B has 3x the area of A → pulls the centroid toward 12
        specs = [("rect", 0.0, 0.0, 2.0, 1.0), ("rect", 6.0, 0.0, 12.0, 1.0)]
        f = resolve_focal(specs, 16, 1)
        assert abs(f * 16 - (1.0 * 0.25 + 9.0 * 0.75)) < 1e-12

    def test_fractional_rects_scale(self):
        from imagor_ray.functions.kernels import resolve_focal

        specs = [("rect", 0.0, 0.0, 0.2, 1.0)]
        assert resolve_focal(specs, 100, 1) == pytest.approx(0.1)

    def test_inverted_rect_dropped(self):
        from imagor_ray.functions.kernels import resolve_focal

        assert resolve_focal([("rect", 5.0, 0.0, 3.0, 1.0)], 10, 1) is None
        # but a valid rect beside it survives
        specs = [("rect", 5.0, 0.0, 3.0, 1.0), ("rect", 2.0, 0.0, 4.0, 1.0)]
        assert resolve_focal(specs, 10, 1) == pytest.approx(0.3)

    def test_point_form(self):
        from imagor_ray.functions.kernels import parse_focal_args, resolve_focal

        specs = parse_focal_args("3x0")
        assert specs == [("point", 3.0, 0.0)]
        assert resolve_focal(specs, 10, 1) == pytest.approx(0.35)

    def test_chain_accumulates_multiple_focals(self):
        out = run1("4x0/filters:focal(2x0:6x1):focal(10x0:14x1)/img",
                   "0123456789abcdefghij")
        # centroid 8 of width 20 → centre 8, window [6, 10)
        assert out == "6789"

    def test_single_focal_back_compat(self):
        out = run1("4x0/filters:focal(0x0:0.2x1)/img", "0123456789")
        assert out == "0123"


class TestRoundCornerArgs:
    """round_corner(rx, ry, color) arg forms (filter.go:20-70)."""

    def test_single_arg_back_compat(self):
        assert k("round_corner", "abcdef", "2") == "  cd  "
        assert k("round_corner", "ab\ncd\nef", "1") == "  \ncd\n  "

    def test_ry_lines_taper(self):
        out = k("round_corner", "aaaa\nbbbb\ncccc\ndddd", "2,2")
        lines = out.split("\n")
        # edge lines masked rx=2; second ring tapered to 1
        assert lines[0] == "    " and lines[3] == "    "
        assert lines[1] == " bb " and lines[2] == " cc "

    def test_color_override(self):
        assert k("round_corner", "abcdef", "2,1,red") == "rrcdrr"


class TestPreviewCacher:
    """preview() cacher tier (imagor.go:52-62, process.go:61-72):
    preview rows bypass the sink, so they get a per-actor memory cache —
    repeated preview chains hit it instead of recomputing; results stay
    bit-identical to the uncached path."""

    def test_repeat_preview_hits_cache(self):
        import pandas as pd

        from imagor_ray.stages.chain import FilterChainStage

        stage = FilterChainStage()
        b = pd.DataFrame({
            "path": ["filters:preview():grayscale()/doc"] * 3,
            "text": ["AbC", "AbC", "XyZ"],
            "preview": [True, True, True],
        })
        out1 = stage(b.copy())
        assert stage.preview_cache_misses == 2  # two distinct texts
        assert stage.preview_cache_hits == 0
        out2 = stage(b.copy())
        assert stage.preview_cache_hits == 2
        assert out2["text"].tolist() == out1["text"].tolist() == [
            "abc", "abc", "xyz"]

    def test_non_preview_rows_unaffected(self):
        import pandas as pd

        from imagor_ray.stages.chain import FilterChainStage

        stage = FilterChainStage()
        b = pd.DataFrame({
            "path": ["filters:grayscale()/doc"] * 2,
            "text": ["AbC", "DeF"],
            "preview": [False, False],
        })
        out = stage(b.copy())
        assert out["text"].tolist() == ["abc", "def"]
        assert stage.preview_cache_hits == stage.preview_cache_misses == 0

    def test_mixed_batch_split_is_bit_stable(self):
        import pandas as pd

        from imagor_ray.stages.chain import FilterChainStage

        b = pd.DataFrame({
            "path": ["filters:grayscale()/doc"] * 4,
            "text": ["AbC", "DeF", "GhI", "JkL"],
            "preview": [True, False, True, False],
        })
        cached = FilterChainStage()(b.copy())
        plain = FilterChainStage(preview_cache_bytes=0)(b.copy())
        assert cached["text"].tolist() == plain["text"].tolist()

    def test_byte_budget_evicts(self):
        import pandas as pd

        from imagor_ray.stages.chain import FilterChainStage

        stage = FilterChainStage(preview_cache_bytes=200)
        b = pd.DataFrame({
            "path": ["filters:grayscale()/doc"] * 6,
            "text": [f"text-{i:02d}-" + "x" * 40 for i in range(6)],
            "preview": [True] * 6,
        })
        stage(b.copy())
        assert stage._preview_cache_used <= 200
        assert len(stage._preview_cache) < 6
