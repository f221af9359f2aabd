"""2-D overlay composite + blend-mode matrix — the engine mirror of the
reference's ``overlay_test.go`` positioning/blend coverage
(``overlay.go:154-170, 173-213, 228-356``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from imagor_ray.functions.kernels import (
    BLEND_MODE_NAMES, ChainCtx, composite_text, parse_overlay_pos2,
)
from imagor_ray.stages.chain import compile_chain

BASE3 = "abcdefghij\nklmnopqrst\nuvwxyz0123"


def run1(path: str, text: str, lookup=None) -> str:
    return compile_chain(path).run(pd.Series([text], dtype=object), lookup=lookup).iloc[0]


class TestPositionGrammar:
    """parseOverlayPosition (overlay.go:173-213)."""

    @pytest.mark.parametrize("arg,canvas,overlay,want", [
        ("", 10, 3, (0, 1)),
        ("left", 10, 3, (0, 1)),
        ("right", 10, 3, (7, 1)),
        ("center", 10, 4, (3, 1)),
        ("l-2", 10, 3, (-2, 1)),
        ("left-2", 10, 3, (-2, 1)),
        ("r-2", 10, 3, (9, 1)),
        ("right-2", 10, 3, (9, 1)),
        ("repeat", 10, 3, (0, 4)),
        ("0.5", 10, 3, (5, 1)),
        ("30p", 10, 3, (3, 1)),
        ("4", 10, 3, (4, 1)),
        ("-1", 10, 3, (-1, 1)),
    ])
    def test_x_axis(self, arg, canvas, overlay, want):
        pos, rep, _ = parse_overlay_pos2(arg, canvas, overlay, "left", "right")
        assert (pos, rep) == want

    def test_y_axis_keywords(self):
        assert parse_overlay_pos2("top", 5, 2, "top", "bottom")[:2] == (0, 1)
        assert parse_overlay_pos2("bottom", 5, 2, "top", "bottom")[:2] == (3, 1)
        assert parse_overlay_pos2("t-1", 5, 2, "top", "bottom")[:2] == (-1, 1)
        assert parse_overlay_pos2("b-1", 5, 2, "top", "bottom")[:2] == (4, 1)


class TestComposite2D:
    def test_y_line_targeting(self):
        assert composite_text(BASE3, "XX", "left", "1") == \
            "abcdefghij\nXXmnopqrst\nuvwxyz0123"

    def test_bottom_right(self):
        assert composite_text(BASE3, "XX", "right", "bottom") == \
            "abcdefghij\nklmnopqrst\nuvwxyz01XX"

    def test_center_center(self):
        out = composite_text(BASE3, "XX", "center", "center")
        assert out.split("\n")[1] == "klmnXXqrst"

    def test_2d_repeat_tiles_whole_canvas(self):
        out = composite_text(BASE3, "AB", "repeat", "repeat")
        assert out == "ABABABABAB\nABABABABAB\nABABABABAB"

    def test_multirow_overlay(self):
        out = composite_text(BASE3, "12\n34", "0", "1")
        assert out == "abcdefghij\n12mnopqrst\n34wxyz0123"

    def test_outside_canvas_skipped(self):
        assert composite_text("abc", "XY", "0", "5") == "abc"
        assert composite_text("abc", "XY", "9", "0") == "abc"
        assert composite_text("abc", "XY", "-9", "0") == "abc"  # -9+3-2 < 0

    def test_partial_clip_left(self):
        assert composite_text("abcdefgh", "XYZ", "l-2", "0") == "Zbcdefgh"

    def test_partial_clip_right(self):
        assert composite_text("abcdefgh", "XYZ", "r-1", "0") == "abcdefXY"

    def test_plain_negative_from_end(self):
        # x=-1 → adjusted to canvas - overlay - 1 (overlay.go:262-268)
        assert composite_text("abcdefgh", "XY", "-1", "0") == "abcdeXYh"

    def test_ragged_lines_pad_transparent(self):
        # overlay rows of unequal width never blank base with embed padding
        out = composite_text("aaaaaa\nbbbbbb", "XX\nY", "0", "0")
        assert out == "XXaaaa\nYbbbbb"

    def test_alpha_dither(self):
        assert composite_text("..........", "XXXXXXXXXX", "0", "0", 50) == "X.X.X.X.X."
        assert composite_text("....", "XXXX", "0", "0", 100) == "...."
        assert composite_text("....", "XXXX", "0", "0", 0) == "XXXX"


class TestBlendMatrix:
    """Every named mode of blendModeMap (overlay.go:154-170) is
    registered, deterministic, and distinct from pass-through."""

    def test_all_modes_supported(self):
        want = {"normal", "multiply", "color-burn", "darken", "screen",
                "color-dodge", "lighten", "add", "overlay", "soft-light",
                "hard-light", "difference", "exclusion", "mask", "mask-out"}
        assert BLEND_MODE_NAMES == want

    @pytest.mark.parametrize("mode", sorted(BLEND_MODE_NAMES))
    def test_mode_deterministic_and_in_range(self, mode):
        base = "abcXYZ 012~"
        item = "N" * len(base)
        out1 = composite_text(base, item, "0", "0", 0, mode)
        out2 = composite_text(base, item, "0", "0", 0, mode)
        assert out1 == out2
        assert len(out1) == len(base)
        assert all(32 <= ord(c) <= 126 for c in out1)

    def test_darken_lighten(self):
        assert composite_text("mmmmm", "aZaZa", "0", "0", 0, "darken") == "aZaZa"
        assert composite_text("aZaZa", "mmmmm", "0", "0", 0, "lighten") == "mmmmm"

    def test_mask_and_mask_out(self):
        # mask keeps base where overlay opaque (non-space); mask-out inverts
        assert composite_text("abcde", "X X X", "0", "0", 0, "mask") == "a c e"
        assert composite_text("abcde", "X X X", "0", "0", 0, "mask-out") == " b d "

    def test_unknown_mode_defaults_to_over(self):
        # getBlendMode defaults BlendModeOver (overlay.go:358+)
        assert composite_text("abc", "XYZ", "0", "0", 0, "nope") == "XYZ"

    def test_normal_equals_legacy_splice(self):
        from imagor_ray.functions.kernels import _splice, parse_overlay_position

        base, item = "abcdefghij", "XYZ"
        for x in ("left", "right", "center", "3", "30p"):
            legacy = _splice(base, item, parse_overlay_position(x, len(base), len(item)))
            assert composite_text(base, item, x, "0") == legacy


class TestFilterWiring:
    def test_label_y_axis(self):
        out = run1("filters:label(HI,left,1)/img", BASE3)
        assert out.split("\n")[1].startswith("[HI]")

    def test_label_alpha(self):
        out = run1("filters:label(HI,0,0,0,white,50)/img", "..........")
        assert out == "[.I......."  # '[HI]' with cols 1,3 transparent

    def test_watermark_y_and_ratios(self):
        lookup = {"wm": "WM"}.get
        out = run1("filters:watermark(wm,right,bottom)/img", BASE3, lookup=lookup)
        assert out.split("\n")[-1].endswith("WM")

    def test_watermark_legacy_shape_unchanged(self):
        lookup = {"wm": "WM"}.get
        out = run1("filters:watermark(wm,right)/img", "abcdef", lookup=lookup)
        assert out == "abcdWM"

    def test_image_blend_mode(self):
        lookup = {"ov": "mmm"}.get
        out = run1("filters:image(/3x0/left/ov,0,0,0,darken)/img", "azazaz", lookup=lookup)
        # per-char min of 'aza' vs 'mmm' = 'ama'; rest untouched
        assert out == "amazaz"

    def test_image_blend_darken_exact(self):
        lookup = {"ov": "mmm"}.get
        out = run1("filters:image(/3x0/left/ov,0,0,0,darken)/img", "zzzaaa", lookup=lookup)
        # darken of 'zzz' vs 'mmm' = 'mmm'; rest untouched
        assert out == "mmmaaa"

    def test_image_2d_y(self):
        lookup = {"ov": "XY"}.get
        out = run1("filters:image(/2x0/left/ov,right,bottom)/img", BASE3, lookup=lookup)
        assert out.split("\n")[-1].endswith("XY")


from hypothesis import given, settings, strategies as st

_printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40)


class TestCompositeProperties:
    @settings(max_examples=60, deadline=None)
    @given(_printable, _printable,
           st.sampled_from(["left", "right", "center", "repeat", "3", "-2",
                            "l-1", "r-1", "0.5", "30p"]),
           st.sampled_from(["top", "bottom", "center", "0", "1", "repeat"]))
    def test_line_count_never_changes(self, base, item, x, y):
        out = composite_text(base, item, x, y)
        assert out.count("\n") == base.count("\n")

    @settings(max_examples=60, deadline=None)
    @given(_printable, _printable,
           st.sampled_from(sorted(BLEND_MODE_NAMES)))
    def test_blend_output_stays_printable(self, base, item, mode):
        out = composite_text(base, item, "0", "0", 0, mode)
        assert all(32 <= ord(c) <= 126 or c == "\n" for c in out)

    @settings(max_examples=60, deadline=None)
    @given(_printable, _printable)
    def test_alpha100_is_noop(self, base, item):
        assert composite_text(base, item, "0", "0", 100) == base

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                   min_size=1, max_size=30))
    def test_mask_of_opaque_overlay_keeps_base(self, base):
        # a fully-opaque (non-space) overlay under `mask` keeps the base
        item = "#" * len(base)
        assert composite_text(base, item, "0", "0", 0, "mask") == base
        assert composite_text(base, item, "0", "0", 0, "mask-out") == " " * len(base)


class TestTextFilter:
    """text(text,x,y,font,color,alpha,blend,width,align,justify,wrap,
    spacing,dpi) — reference arg layout (filteroverlay.go:284-408)."""

    def test_basic_overlay(self):
        out = run1("filters:text(HI)/img", "..........")
        assert out == "HI........"

    def test_xy_positioning(self):
        out = run1("filters:text(Z,right,bottom)/img", BASE3)
        assert out.split("\n")[-1].endswith("Z")

    def test_width_wraps_word(self):
        # width=7 wraps 'one two three' into lines at word boundaries,
        # composited down the lines
        out = run1("filters:text(one+two+three,0,0,sans,black,0,normal,7)/img",
                   "..........\n..........\n..........")
        lines = out.split("\n")
        assert lines[0].startswith("one two")
        assert lines[1].startswith("three")

    def test_width_tokens(self):
        from imagor_ray.functions.kernels import parse_text_width

        assert parse_text_width("f", 40) == 40
        assert parse_text_width("f-10", 40) == 30
        assert parse_text_width("full-10", 40) == 30
        assert parse_text_width("50p", 40) == 20
        assert parse_text_width("0.25", 40) == 10
        assert parse_text_width("7", 40) == 7
        assert parse_text_width("", 40) == 0

    def test_char_wrap(self):
        out = run1("filters:text(abcdef,0,0,sans,black,0,normal,2,low,,char)/img",
                   "....\n....\n....")
        assert out.split("\n") == ["ab..", "cd..", "ef.."]

    def test_align_high_pads_transparent(self):
        # right-aligned within width 6: the left pad must NOT blank base
        out = run1("filters:text(ab,0,0,sans,black,0,normal,6,high)/img",
                   "0123456789")
        assert out == "0123ab6789"

    def test_align_centre(self):
        out = run1("filters:text(ab,0,0,sans,black,0,normal,6,centre)/img",
                   "0123456789")
        assert out == "01ab456789"

    def test_justify_distributes_spaces(self):
        out = run1("filters:text(a+b+c+x,0,0,sans,black,0,normal,5,low,justify,word)/img",
                   ".......\n.......")
        # 'a b c' justified to width 5 stays 'a b c'; last line 'x' not justified
        assert out.split("\n")[0].startswith("a b c")
        assert out.split("\n")[1].startswith("x")

    def test_blend_arg_position(self):
        out = run1("filters:text(mmm,0,0,sans,black,0,darken)/img", "azaza")
        assert out == "amaza"  # per-char min over the overlap

    def test_b64_text(self):
        import base64
        enc = base64.urlsafe_b64encode(b"SECRET").decode().rstrip("=")
        out = run1(f"filters:text(b64:{enc},0,0)/img", "..........")
        assert out.startswith("SECRET")

    def test_empty_text_noop(self):
        assert run1("filters:text(%20)/img", "abc") == "abc"


class TestDecodeTextArg:
    """decodeTextArg parity (util.go:36-46) across label/text/watermark/
    image arg decoding."""

    def test_unescape_then_b64(self):
        import base64
        from imagor_ray.functions.kernels import decode_text_arg

        assert decode_text_arg("hello+world") == "hello world"
        assert decode_text_arg("a%2Fb") == "a/b"
        enc = base64.urlsafe_b64encode(b"hi there").decode().rstrip("=")
        assert decode_text_arg(f"b64:{enc}") == "hi there"
        # failed b64 decode keeps the original (file named b64:...)
        assert decode_text_arg("b64:!!notb64!!") == "b64:!!notb64!!"

    def test_label_b64(self):
        import base64
        enc = base64.urlsafe_b64encode(b"SEC").decode().rstrip("=")
        out = run1(f"filters:label(b64:{enc},left)/img", "..........")
        assert out.startswith("[SEC]")

    def test_watermark_key_unescape(self):
        lookup = {"a/b": "WM"}.get
        out = run1("filters:watermark(a%2Fb,right)/img", "abcdef", lookup=lookup)
        assert out == "abcdWM"

    def test_image_path_unescape(self):
        lookup = {"logo.png": "XYZXYZ"}.get
        out = run1("filters:image(%2F3x0%2Fleft%2Flogo.png,right)/img",
                   "abcdef", lookup=lookup)
        assert out == "abcXYZ"
