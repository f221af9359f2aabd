"""Error model + dead-letter routing tests — mirrors the reference's
signing tests (imagor_test.go:302-357), expire handling
(imagor.go:314-322) and auto-format negotiation (imagor_test.go:1381-1701
shapes)."""

from __future__ import annotations

import pandas as pd

from imagor_ray.functions import imagorpath as ip
from imagor_ray.stages.errors import (
    ERR_EXPIRED,
    ERR_INVALID_PARAM,
    ERR_SIGNATURE_MISMATCH,
    ERR_UNSUPPORTED_FORMAT,
    auto_format_path,
    route,
    verify_batch,
)

SECRET = "s3cr3t"
SIGNER = ip.HMACSigner("sha256", 0, SECRET)


def make_row(path, hash_=None):
    return {"path": path, "hash": hash_ if hash_ is not None else SIGNER.sign(path)}


class TestVerifyBatch:
    def test_valid_signature_passes(self):
        df = pd.DataFrame([make_row("filters:grayscale()/img")])
        out = verify_batch(df, SECRET)
        assert out["error_code"].tolist() == [""]

    def test_tampered_signature_rejected(self):
        df = pd.DataFrame([make_row("filters:grayscale()/img", "bogus-hash")])
        out = verify_batch(df, SECRET)
        assert out["error_code"].tolist() == [ERR_SIGNATURE_MISMATCH]

    def test_unsafe_bypasses_signature(self):
        # unsafe mode bypass (imagor.go:294-302)
        df = pd.DataFrame([make_row("filters:grayscale()/img", "unsafe")])
        out = verify_batch(df, SECRET)
        assert out["error_code"].tolist() == [""]

    def test_expired_by_watermark(self):
        path = "filters:expire(1000)/img"
        df = pd.DataFrame([make_row(path)])
        assert verify_batch(df.copy(), SECRET, watermark_ms=999)["error_code"].iloc[0] == ""
        assert verify_batch(df.copy(), SECRET, watermark_ms=1001)["error_code"].iloc[0] == ERR_EXPIRED

    def test_unknown_format_rejected(self):
        df = pd.DataFrame([make_row("filters:format(avif)/img")])
        assert verify_batch(df, SECRET)["error_code"].iloc[0] == ERR_UNSUPPORTED_FORMAT

    def test_empty_path_invalid(self):
        df = pd.DataFrame([{"path": "", "hash": "unsafe"}])
        assert verify_batch(df, SECRET)["error_code"].iloc[0] == ERR_INVALID_PARAM


class TestRouting:
    def test_ok_and_dead_letter_split(self, ray_session):
        import ray.data as rd

        rows = [
            make_row("filters:grayscale()/a"),
            make_row("filters:grayscale()/b", "tampered"),
            make_row("filters:expire(5)/c"),
        ]
        ds = rd.from_pandas(pd.DataFrame(rows))
        ok, dead = route(ds, SECRET, watermark_ms=10)
        okd, deadd = ok.to_pandas(), dead.to_pandas()
        assert len(okd) == 1 and okd["path"].iloc[0].endswith("/a")
        assert sorted(deadd["error_code"]) == [ERR_EXPIRED, ERR_SIGNATURE_MISMATCH]


class TestAutoFormat:
    def test_appends_format_when_missing(self):
        path, vary = auto_format_path("filters:grayscale()/img", "hex")
        assert path == "filters:grayscale():format(hex)/img" and vary

    def test_respects_existing_format(self):
        path, vary = auto_format_path("filters:format(b64)/img", "hex")
        assert path == "filters:format(b64)/img" and not vary

    def test_unknown_accept_noop(self):
        path, vary = auto_format_path("filters:grayscale()/img", "webp")
        assert path == "filters:grayscale()/img" and not vary

    def test_plain_accept_noop(self):
        path, vary = auto_format_path("img", "")
        assert path == "img" and not vary


def test_parse_sign_verifies_incoming_hash_column():
    # externally-supplied requests carry a claimed signature in `hash`;
    # ParseSignStage recomputes and marks mismatches for dead-letter
    # routing (imagor.go:294-302) instead of hard-coding sig_ok=True.
    import pandas as pd
    from imagor_ray.stages.parse_sign import ParseSignStage

    stage = ParseSignStage()
    df = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3"],
        "turn_idx": [0, 1, 2],
        "tool": ["view", "view", "view"],
    })
    good = stage(df.copy())
    assert good["sig_ok"].all()
    df2 = df.copy()
    df2["hash"] = [good["signature"].iloc[0], "tampered", None]
    out = stage(df2)
    assert out["sig_ok"].tolist() == [True, False, True]


def test_preview_rows_bypass_sink(tmp_path, ray_session):
    # preview() templates flag rows that flow through the processed
    # stream but are never persisted (imagor.go:328-329, 389)
    import ray.data as rd
    from imagor_ray.stages.parse_sign import ParseSignStage
    from imagor_ray.state.sink import ExactlyOnceSink

    templates = {
        "view": "filters:grayscale()/{img}",
        "peek": "filters:preview():grayscale()/{img}",
    }
    stage = ParseSignStage(templates=templates)
    df = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(8)],
        "turn_idx": list(range(8)),
        "tool": ["view", "peek"] * 4,
        "text": ["some text"] * 8,
    })
    out = stage(df.copy())
    assert out["preview"].tolist() == [False, True] * 4
    # preview STAYS in the canonical path — the reference strips only
    # expire/attachment (imagor.go:332-338)
    assert sum("preview" in p for p in out["path"]) == 4

    sink = ExactlyOnceSink(str(tmp_path / "sink"), num_buckets=2)
    out["signature"] = "sig"
    summary = sink.write(rd.from_pandas(out))
    assert summary["rows_written"] == 4  # only non-preview rows persisted
    stored = sink.read().to_pandas()
    assert len(stored) == 4
    assert "preview" not in stored.columns
    assert set(stored["tool"]) == {"view"}


def test_auto_format_accept_column_changes_signature():
    from imagor_ray.stages.parse_sign import ParseSignStage

    stage = ParseSignStage()
    base = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1"],
        "turn_idx": [0, 1, 2],
        "tool": ["view", "view", "error"],
        "accept": ["b64", "", "b64"],
    })
    out = stage(base.copy())
    # view+b64 → format(b64) appended, vary marked, signature differs
    assert out["vary"].tolist() == [True, False, False]
    assert "format(b64)" in out["path"].iloc[0]
    assert "format(b64)" not in out["path"].iloc[1]
    # error template already formats → accept ignored (no vary)
    assert "format(hex)" in out["path"].iloc[2]
    plain = stage(base.drop(columns=["accept"]).copy())
    assert out["signature"].iloc[0] != plain["signature"].iloc[0]
    assert out["signature"].iloc[1] == plain["signature"].iloc[1]


class TestMaxResolution:
    """ErrMaxResolutionExceeded analogue (errors.go:34-35): requested
    W×H beyond the processor budget (process.go:286-288) dead-letters
    before any kernel runs; at-or-under passes; the chain clamps any
    surviving dimension to MaxWidth/MaxHeight (process.go:289-293)."""

    def test_over_budget_dead_letters(self):
        from imagor_ray.stages.errors import ERR_MAX_RESOLUTION

        df = pd.DataFrame([make_row("99999x99999/img")])
        assert verify_batch(df, SECRET)["error_code"].iloc[0] == ERR_MAX_RESOLUTION

    def test_under_budget_passes(self):
        df = pd.DataFrame([make_row("8000x8000/img")])
        assert verify_batch(df, SECRET)["error_code"].iloc[0] == ""

    def test_chain_clamps_dims_to_max(self):
        from imagor_ray.stages.chain import compile_chain

        out = compile_chain("2000000000x0/img").run(
            pd.Series(["abc"], dtype=object)
        ).iloc[0]
        # plain resize pads to the clamped width, not 2e9 chars
        assert len(out) == 9999


class TestGiantArgRegressions:
    """Hypothesis-found allocation crashes: numeric filter args parse to
    astronomically large values (scientific notation fits in 30 chars).
    Every size-driven kernel must stay row-bounded (the reference clamps
    all surfaces at MaxWidth/MaxHeight, processor.go:70-72)."""

    CASES = [
        ("blur", "1E0111"),          # the original falsifying example
        ("sharpen", "9e18"),
        ("pixelate", "1e300"),
        ("padding", "red,2000000000,99999999999,1e18,nan"),
        ("text", "hi,0,0,,,,,2000000000,center"),
        ("blur", "nan"),
        ("brightness", "1e999"),     # inf float arg
        ("round_corner", "1e18,1e18"),
    ]

    def test_giant_args_never_allocate(self):
        from imagor_ray.stages.chain import compile_chain

        for name, args in self.CASES:
            chain = compile_chain(f"filters:{name}({args})/img")
            out = chain.run(
                pd.Series(["hello world\nsecond line"], dtype=object),
                lookup={"k": "SNIP"}.get,
            ).iloc[0]
            assert isinstance(out, str), (name, args)

    def test_smear_closed_form_matches_scalar_reference(self):
        import random

        from imagor_ray.functions import kernels as K

        rng = random.Random(7)
        texts = [
            "".join(chr(rng.randint(33, 1200)) for _ in range(rng.randint(0, 12)))
            for _ in range(5)
        ]
        s = pd.Series(texts, dtype=object)
        maxlen = max(len(t) for t in texts)
        for w in (maxlen, maxlen + 1, maxlen + 100, 10**6):
            for sharpen in (False, True):
                got = K._smear_series(s, w, sharpen=sharpen).tolist()
                exp = [K._smear(t, w, sharpen=sharpen) if t else t for t in texts]
                assert got == exp, (w, sharpen)
