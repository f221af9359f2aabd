"""Golden chain corpus — the engine analogue of the reference's
write-once golden end-to-end corpus (``doGoldenTests``,
``processor/vipsprocessor/processor_test.go:36-41, 1383-1460``;
committed outputs under ``testdata/golden/``).

Representative paths mirror the reference corpus shapes (FIXTURES.md §3.2)
applied to deterministic input texts. On first run the golden parquet is
written (like ``filestorage.WithSaveErrIfExists``,
``storage/filestorage/filestorage.go:94-97``) and committed; later runs
byte-compare. Any semantic drift in kernels/chain ordering fails here.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from imagor_ray.stages.chain import compile_chain

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "chain_corpus.parquet")

#: (case, path) — the corpus; applied to every input text below.
CORPUS_PATHS = [
    ("resize", "100x0/img"),
    ("resize_small", "7x0/img"),
    ("resize_left", "9x0/left/img"),
    ("resize_right", "9x0/right/img"),
    ("flip", "-9x0/img"),
    ("vflip_lines", "0x-0/img"),
    ("crop_abs", "2x0:11x0/img"),
    ("crop_frac", "0.1x0:0.8x0/img"),
    ("fit_in", "fit-in/12x0/img"),
    ("full_fit_in", "full-fit-in/30x0/left/img"),
    ("adaptive_fit_in", "adaptive-fit-in/12x3/img"),
    ("stretch", "stretch/16x0/left/img"),
    ("trim", "trim/img"),
    ("trim_br_tol", "trim:bottom-right:40/img"),
    ("padding", "0x0/3x2/filters:fill(x)/img"),
    ("smart", "10x0/smart/img"),
    ("tonal_chain", "filters:brightness(-20):contrast(50):rgb(10,-50,30)/img"),
    ("fill_round", "20x0/filters:fill(c):round_corner(3)/img"),
    ("grayscale_label", "filters:grayscale():label(GOLD,center)/img"),
    ("label_pct", "filters:label(x,25p)/img"),
    ("format_hex_q", "filters:format(hex):quality(70)/img"),
    ("format_b64", "filters:format(b64)/img"),
    ("max_bytes", "filters:max_bytes(10)/img"),
    ("proportion", "filters:proportion(40)/img"),
    ("pixelate_blur", "filters:pixelate(3):blur(1)/img"),
    ("sharpen", "filters:sharpen(1)/img"),
    ("hue_sat", "filters:hue(144):saturation(30)/img"),
    ("modulate", "filters:modulate(50,10,72)/img"),
    ("redact_draw", "filters:redact():draw_detections()/img"),
    ("rotate_pair", "filters:rotate(90):rotate(270)/img"),
    ("rotate180", "filters:rotate(180)/img"),
    ("page2", "filters:page(2)/img"),
    ("max_frames", "filters:max_frames(2)/img"),
    ("background", "filters:background_color(red)/img"),
    ("strip_icc", "filters:strip_icc()/img"),
    ("trim_filter", "filters:trim(20,top-left)/img"),
    ("utility_mix", "filters:expire(123):grayscale():attachment(a.txt)/img"),
    ("kitchen_sink", "trim/0.1x0:0.9x0/fit-in/40x0/left/filters:grayscale():redact():max_bytes(64)/img"),
    # round-2 extension: 2-D overlay positioning + blend-mode matrix
    # (overlay.go:154-170, 228-356; overlay_test.go coverage)
    ("label_y_line", "filters:label(Y1,left,1)/img"),
    ("label_bottom_right", "filters:label(BR,right,bottom)/img"),
    ("label_center2d", "filters:label(C,center,center)/img"),
    ("label_alpha50", "filters:label(AL,0,0,0,white,50)/img"),
    ("label_prefix_offset", "filters:label(P,l-2,t-1)/img"),
    # round-2 extension: text() with the reference 13-arg layout
    # (filteroverlay.go:284-408)
    ("text_basic", "filters:text(NOTE)/img"),
    ("text_xy_blend", "filters:text(mm,right,bottom,sans,black,0,darken)/img"),
    ("text_wrap_align", "filters:text(alpha+beta+gamma,0,0,sans,black,0,normal,8,high)/img"),
    ("text_justify", "filters:text(a+b+c+d,0,0,sans,black,0,normal,9,low,justify)/img"),
]

INPUT_TEXTS = {
    "plain": "The Quick Brown Fox 1234 jumps over 99 lazy dogs",
    "padded": "xxx hello world with code 42 xxx",
    "multiline": "first line 11\nsecond line 22\nthird line 33",
    "unicode": "héllo wörld 哈哈 123",
    "tiny": "ab",
    "empty": "",
}


def build_corpus() -> pd.DataFrame:
    rows = []
    for case, path in CORPUS_PATHS:
        chain = compile_chain(path)
        for tname, text in INPUT_TEXTS.items():
            out = chain.run(pd.Series([text], dtype=object)).iloc[0]
            rows.append({
                "case": case, "path": path, "input_name": tname,
                "input_text": text, "expect_text": out,
            })
    return pd.DataFrame(rows)


def test_golden_chain_corpus():
    got = build_corpus()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        got.to_parquet(GOLDEN, index=False)
        pytest.skip("golden corpus written (first run) — commit it")
    want = pd.read_parquet(GOLDEN)
    pd.testing.assert_frame_equal(got, want)
