"""Differential testing on RANDOM inputs: the new wide operators are
re-run over randomly generated tables (written to tmp parquet) and
compared against DuckDB executing the SAME oracle SQL over the same
files — the fixed-corpus parity gate generalized to arbitrary data
shapes (ties, empty groups, degenerate windows)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, n, seed, n_users=7, coarse_ts=True):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 1000
    step = 3_600_000_000 if coarse_ts else 1
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.Series(
            base + rng.integers(0, 24 * 14, n).astype("int64") * step
        ).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n).astype("int64"),
        "event_type": rng.choice(
            ["signup", "click", "view", "purchase", "error"], n),
        "value": np.round(rng.uniform(-10, 500, n), 4),
        "props": "{}",
    })
    d = tmp_path / f"sf-{seed}"
    d.mkdir()
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _compare(name, sf, extra_tables=()):
    from imagor_ray.pipelines.queries import ORACLES, QUERIES

    got = QUERIES[name](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    for t in ("events",) + tuple(extra_tables):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.sql(ORACLES[name]).df()
    con.close()
    g = got[sorted(got.columns)].copy()
    w = want[sorted(want.columns)].copy()
    for c in g.columns:
        for df in (g, w):
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
    g = g.sort_values(list(g.columns), kind="mergesort").reset_index(drop=True)
    w = w.sort_values(list(w.columns), kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w), f"{name}: {len(g)} vs {len(w)} rows"
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return len(g)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rolling_random(ray_session, tmp_path, seed):
    sf = _write_events(tmp_path, 800, seed)
    n = _compare("rolling_user_stats", sf)
    assert n == 800


@pytest.mark.parametrize("seed", [4, 5])
def test_error_context_random(ray_session, tmp_path, seed):
    # fine-grained ts exercises boundary inclusivity; coarse exercises ties
    sf = _write_events(tmp_path, 600, seed, n_users=4)
    _compare("error_context", sf)


@pytest.mark.parametrize("seed", [6, 7])
def test_user_stats_random(ray_session, tmp_path, seed):
    sf = _write_events(tmp_path, 500, seed)
    assert _compare("user_stats_by_type", sf) == 5


@pytest.mark.parametrize("seed", [8, 9])
def test_approx_quantiles_random(ray_session, tmp_path, seed):
    sf = _write_events(tmp_path, 700, seed)
    assert _compare("approx_quantiles_by_type", sf) == 15


@pytest.mark.parametrize("seed", [10, 11])
def test_asof_random(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    sf = _write_events(tmp_path, 400, seed)
    n_orders = 300
    base = pd.Timestamp("2024-03-01").value // 1000
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype="int64"),
        "o_custkey": rng.integers(0, 7, n_orders).astype("int64"),
        "o_orderstatus": "O",
        "o_totalprice": np.round(rng.uniform(1, 9999, n_orders), 2),
        # order dates interleave with event ts, incl. exact-tie dates
        "o_orderdate": pd.Series(
            base + rng.integers(0, 24 * 14, n_orders).astype("int64")
            * 3_600_000_000
        ).astype("datetime64[us]"),
        "o_orderpriority": "1-URGENT",
    })
    orders.to_parquet(os.path.join(sf, "orders.parquet"), index=False)
    _compare("asof_events_orders", sf, extra_tables=("orders",))


def test_edit1_matches_levenshtein_on_random_strings():
    import random

    import duckdb

    from imagor_ray.pipelines.dedup import _edit1

    rng = random.Random(1234)
    con = duckdb.connect()
    alphabet = "abcx"
    pairs = [("".join(rng.choices(alphabet, k=rng.randint(0, 5))),
              "".join(rng.choices(alphabet, k=rng.randint(0, 5))))
             for _ in range(500)]
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _edit1(a, b) == (want <= 1), (a, b, want)
