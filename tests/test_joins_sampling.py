"""As-of join (bucketed vectorized merge) and deterministic
sampling/split operators — edge cases beyond the DuckDB parity gate
(which runs via tests/test_oracle_parity.py for all four entries)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _bucket_frame(events, orders):
    ev = pd.DataFrame({
        "key": [e[0] for e in events],
        "time": [e[1] for e in events],
        "side": np.int8(0),
        "event_id": [e[2] for e in events],
        "o_orderkey": np.int64(-1),
        "o_totalprice": 0.0,
    })
    od = pd.DataFrame({
        "key": [o[0] for o in orders],
        "time": [o[1] for o in orders],
        "side": np.int8(1),
        "event_id": np.int64(-1),
        "o_orderkey": [o[2] for o in orders],
        "o_totalprice": [o[3] for o in orders],
    })
    return pd.concat([ev, od], ignore_index=True)


class TestAsofBucketMerge:
    def test_picks_latest_at_or_before(self):
        from imagor_ray.pipelines.joins import _asof_bucket

        g = _bucket_frame(
            events=[(7, 100, 1), (7, 250, 2), (7, 50, 3)],
            orders=[(7, 100, 10, 1.5), (7, 200, 11, 2.5)],
        )
        out = _asof_bucket(g).sort_values("event_id").reset_index(drop=True)
        # event@100 → order@100 (at-or-before inclusive); event@250 →
        # order@200; event@50 → no order → dropped
        assert out["event_id"].tolist() == [1, 2]
        assert out["o_orderkey"].tolist() == [10, 11]
        assert out["o_totalprice"].tolist() == [1.5, 2.5]

    def test_date_tie_breaks_on_max_orderkey(self):
        from imagor_ray.pipelines.joins import _asof_bucket

        g = _bucket_frame(
            events=[(3, 500, 1)],
            orders=[(3, 400, 20, 1.0), (3, 400, 25, 2.0), (3, 400, 22, 3.0)],
        )
        out = _asof_bucket(g)
        assert out["o_orderkey"].tolist() == [25]

    def test_keys_do_not_cross(self):
        from imagor_ray.pipelines.joins import _asof_bucket

        g = _bucket_frame(
            events=[(1, 100, 1), (2, 100, 2)],
            orders=[(1, 50, 10, 1.0)],  # key 2 has no orders
        )
        out = _asof_bucket(g)
        assert out["event_id"].tolist() == [1]

    def test_empty_sides(self):
        from imagor_ray.pipelines.joins import _asof_bucket

        assert len(_asof_bucket(_bucket_frame([], [(1, 1, 1, 1.0)]))) == 0
        assert len(_asof_bucket(_bucket_frame([(1, 1, 1)], []))) == 0

    def test_random_equals_pandas_bruteforce(self):
        from imagor_ray.pipelines.joins import _asof_bucket

        rng = np.random.default_rng(5)
        events = [(int(rng.integers(0, 20)), int(rng.integers(0, 1000)), i)
                  for i in range(300)]
        orders = [(int(rng.integers(0, 20)), int(rng.integers(0, 1000)),
                   j, float(j)) for j in range(200)]
        got = _asof_bucket(_bucket_frame(events, orders)).sort_values(
            "event_id").reset_index(drop=True)
        want = []
        for k, t, eid in events:
            cands = [(ot, okey, val) for ok_, ot, okey, val in orders
                     if ok_ == k and ot <= t]
            if cands:
                ot, okey, val = max(cands)
                want.append((eid, okey, val))
        want.sort()
        assert list(map(tuple, got[["event_id", "o_orderkey",
                                    "o_totalprice"]].to_numpy())) == [
            (float(e), float(k), v) for e, k, v in want] or \
            got["event_id"].tolist() == [w[0] for w in want]
        assert got["o_orderkey"].tolist() == [w[1] for w in want]


class TestDeterministicSplit:
    def test_split_rates_and_stability(self, ray_session):
        from imagor_ray.pipelines.sampling import dataset_split

        a = dataset_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = dataset_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)  # pure function of the key
        frac = a["split"].value_counts(normalize=True)
        assert 0.6 < frac["train"] < 0.9
        assert set(a["split"]) == {"train", "val", "test"}

    def test_sample_rate(self, ray_session):
        from imagor_ray.pipelines.sampling import deterministic_sample

        n4 = deterministic_sample(SF, rate_sixteenths=4).count()
        n16 = deterministic_sample(SF, rate_sixteenths=16).count()
        assert n16 == 1000
        assert 0.15 * n16 < n4 < 0.35 * n16


class TestRollingWindow:
    def test_ties_and_span_vs_bruteforce(self):
        from imagor_ray.pipelines.analytics import _rolling_bucket

        rng = np.random.default_rng(9)
        n = 400
        base = 1_700_000_000_000_000
        g = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 8, n).astype("int64"),
            # coarse grid forces equal-ts ties within users
            "ts": pd.Series(
                base + rng.integers(0, 20, n).astype("int64") * 3_600_000_000
            ).astype("datetime64[us]"),
            "value_m": rng.integers(-50, 50, n).astype("int64"),
        })
        span = 5 * 3_600_000_000  # 5h
        got = _rolling_bucket(g.copy(), span).sort_values(
            "event_id").reset_index(drop=True)
        t = g["ts"].astype("int64").to_numpy()
        for i in rng.choice(n, 60, replace=False):
            mask = (g["user_id"] == g["user_id"][i]) & (t >= t[i] - span) & (t <= t[i])
            row = got[got["event_id"] == i].iloc[0]
            assert row["n_7d"] == int(mask.sum())
            assert row["value_m_7d"] == int(g.loc[mask, "value_m"].sum())


class TestIntervalJoin:
    def test_context_bucket_vs_bruteforce(self):
        from imagor_ray.pipelines.joins import _context_bucket

        rng = np.random.default_rng(13)
        n = 300
        base = 1_700_000_000_000_000
        g = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Series(
                base + rng.integers(0, 30, n).astype("int64") * 600_000_000
            ).astype("datetime64[us]"),
            "user_id": rng.integers(0, 6, n).astype("int64"),
            "event_type": rng.choice(["error", "click", "view"], n),
            "is_anchor": np.zeros(n, dtype=bool),
        })
        g["is_anchor"] = (g["event_type"] == "error").to_numpy()
        window = 3 * 600_000_000
        got = _context_bucket(g.copy(), window)
        got_set = set(zip(got["anchor_id"], got["ctx_event_id"]))
        t = g["ts"].astype("int64").to_numpy()
        want = set()
        for i in np.where(g["is_anchor"])[0]:
            for j in range(n):
                if (j != i and g["user_id"][j] == g["user_id"][i]
                        and t[i] - window <= t[j] <= t[i]):
                    want.add((i, j))
        assert got_set == want
        assert len(got) == len(want)  # no duplicate pairs


class TestApproxQuantiles:
    def test_within_one_bin_of_exact(self, ray_session):
        from imagor_ray.pipelines.analytics import approx_quantiles_by_type

        got = approx_quantiles_by_type(SF).to_pandas()
        ev = pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "value"])
        ev["vm"] = np.floor(ev["value"].to_numpy() * 1000).astype("int64")
        for r in got.itertuples():
            vals = np.sort(ev.loc[ev["event_type"] == r.event_type, "vm"].to_numpy())
            exact = vals[int(np.ceil(r.q * len(vals))) - 1]
            wdt = max((vals[-1] - vals[0] + 4095) // 4096, 1)
            # estimate is the lower edge of the bin holding the exact
            # quantile → within one bin width below it
            assert exact - wdt <= r.approx_value_m <= exact, (
                r.event_type, r.q, r.approx_value_m, exact, wdt)


class TestIntervalJoinCap:
    def test_hot_user_capped_and_matches_capped_sql(self, ray_session, tmp_path):
        """A degenerate hot user (dense events, window covers hundreds)
        must be bounded by the per-anchor cap, and the capped engine
        output must still hash-match the QUALIFY-mirrored SQL."""
        import duckdb

        n = 900
        base = pd.Timestamp("2024-04-01").value // 1000
        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            # one user, one event every ~20s → 1h window ≈ 180 rows,
            # but a tighter cap exercises the trimming logic
            "ts": pd.Series(base + np.arange(n) * 20_000_000
                            ).astype("datetime64[us]"),
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": rng.choice(["error", "click"], n, p=[0.3, 0.7]),
            "value": 1.0,
            "props": "{}",
        })
        d = tmp_path / "hot"
        d.mkdir()
        df.to_parquet(d / "events.parquet", index=False)

        from imagor_ray.pipelines.joins import error_context_window

        cap = 50
        got = error_context_window(str(d), max_context=cap).to_pandas()
        assert got.groupby("anchor_id").size().max() <= cap
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        want = con.sql(f"""
            SELECT a.event_id AS anchor_id, a.user_id, a.ts AS anchor_ts,
                   c.event_id AS ctx_event_id, c.ts AS ctx_ts,
                   c.event_type AS ctx_type
            FROM events a JOIN events c
              ON c.user_id = a.user_id
             AND c.ts <= a.ts AND c.ts >= a.ts - INTERVAL 1 HOUR
             AND c.event_id <> a.event_id
            WHERE a.event_type = 'error'
            QUALIFY row_number() OVER (PARTITION BY a.event_id
                ORDER BY c.ts DESC, c.event_id DESC) <= {cap}
        """).df()
        key = ["anchor_id", "ctx_event_id"]
        g = got.sort_values(key).reset_index(drop=True)
        w = want.sort_values(key).reset_index(drop=True)
        for c in ("anchor_ts", "ctx_ts"):
            g[c] = g[c].astype("datetime64[us]")
            w[c] = w[c].astype("datetime64[us]")
        pd.testing.assert_frame_equal(g, w[g.columns], check_dtype=False)


class TestRangeJoinRepeatOrders:
    """Grain-replication invariants of the distributed interval join:
    a window spanning two grains counts each follow-up exactly once
    (clamped replicas partition its time span), the lower bound is
    strictly exclusive (self never matches), and the upper bound is
    half-open."""

    def _run(self, rows, tmp_path, window_us=100):
        df = pd.DataFrame(rows, columns=[
            "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        df["o_orderdate"] = pd.to_datetime(df["o_orderdate"], unit="us")
        d = tmp_path / "rj"
        d.mkdir()
        df.to_parquet(d / "orders.parquet", index=False)
        from imagor_ray.pipelines.joins import range_join_repeat_orders
        out = range_join_repeat_orders(str(d), window_us=window_us)
        got = out.to_pandas()
        if not len(got):   # schemaless empty Dataset -> typed empty frame
            got = pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                ("order_key", "n_follow",
                                 "follow_value_milli")})
        return got.sort_values("order_key").reset_index(drop=True)

    def test_grain_spanning_window_counts_once(self, ray_session, tmp_path):
        # anchor at t=95, window (95, 195) spans grains [0,100) and
        # [100,200); follow-ups at 96 (grain 0), 100 (exactly on the
        # grain boundary — must count once, in the clamped g1 replica),
        # 150 (grain 1); 95 is self (strict bound), 195 is the
        # exclusive end
        rows = [
            (1, 7, 95, 1.0),
            (2, 7, 96, 2.0),
            (3, 7, 100, 3.0),
            (4, 7, 150, 4.0),
            (5, 7, 195, 5.0),
        ]
        got = self._run(rows, tmp_path)
        a1 = got[got["order_key"] == 1].iloc[0]
        assert a1["n_follow"] == 3
        assert a1["follow_value_milli"] == 2000 + 3000 + 4000
        # order 5 at 195: no later orders -> absent (inner semantics)
        assert 5 not in set(got["order_key"])

    def test_self_and_other_customers_excluded(self, ray_session, tmp_path):
        rows = [
            (1, 7, 50, 1.0),
            (2, 8, 60, 2.0),   # other customer inside the window
            (3, 7, 60, 3.0),
        ]
        got = self._run(rows, tmp_path)
        assert list(got["order_key"]) == [1]
        assert got.iloc[0]["n_follow"] == 1
        assert got.iloc[0]["follow_value_milli"] == 3000

    def test_same_date_ties_are_not_followups(self, ray_session, tmp_path):
        # strictly-later semantics: equal o_orderdate never matches
        rows = [(1, 7, 50, 1.0), (2, 7, 50, 2.0)]
        got = self._run(rows, tmp_path)
        assert len(got) == 0

    def test_matches_bruteforce(self, ray_session, tmp_path):
        # randomized cross-check against the O(n²) definition
        rng = np.random.RandomState(7)
        n = 200
        rows = [(i, int(rng.randint(0, 8)), int(rng.randint(0, 1000)),
                 float(rng.randint(1, 100))) for i in range(n)]
        got = self._run(rows, tmp_path, window_us=137)
        df = pd.DataFrame(rows, columns=["k", "c", "t", "p"])
        want = []
        for _, a in df.iterrows():
            m = df[(df["c"] == a["c"]) & (df["t"] > a["t"])
                   & (df["t"] < a["t"] + 137)]
            if len(m):
                want.append((a["k"], len(m), int((m["p"] * 1000).sum())))
        want = (pd.DataFrame(want, columns=[
            "order_key", "n_follow", "follow_value_milli"])
            .astype("int64").sort_values("order_key")
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestBloomSemiJoin:
    def test_false_positive_dies_in_verify(self, ray_session, tmp_path):
        """Plant enough build keys that a Bloom false positive is
        findable by brute force, give that key events, and assert the
        exact verify stage excludes it while true members survive."""
        from imagor_ray.pipelines.joins import (_bloom_positions,
                                                _BLOOM_BITS)

        members = np.arange(1, 1001, dtype=np.int64)
        p1, p2 = _bloom_positions(members)
        w = np.zeros(_BLOOM_BITS, dtype=bool)
        w[p1] = True
        w[p2] = True
        cand = np.arange(10_000, 3_000_000, dtype=np.int64)
        c1, c2 = _bloom_positions(cand)
        fp = cand[w[c1] & w[c2]]
        assert len(fp) > 0, "no false positive found — enlarge the scan"
        fp = int(fp[0])

        od = pd.DataFrame({
            "o_custkey": members,
            "o_orderpriority": "1-URGENT",
        })
        ev = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [int(members[0]), fp],
            "event_type": ["click", "click"],
        })
        d = tmp_path / "bl"
        d.mkdir()
        od.to_parquet(d / "orders.parquet", index=False)
        ev.to_parquet(d / "events.parquet", index=False)

        from imagor_ray.pipelines.joins import bloom_semi_join_events
        got = bloom_semi_join_events(str(d)).to_pandas()
        assert list(got["event_id"]) == [1]   # fp excluded, member kept
