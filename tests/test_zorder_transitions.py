"""zorder_cells locality + event_transitions semantics (beyond the
oracle parity rows)."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.01"


def test_zorder_cells_nonvacuous_and_local(ray_session):
    from imagor_ray.pipelines.analytics import zorder_cells

    z = zorder_cells(SF).to_pandas()
    assert len(z) >= 20, "cell fan-out collapsed — shift default regressed"
    assert int(z["n_rows"].sum()) == 10_000
    # the layout property: per-cell zone maps are tight on BOTH dims
    day_span = (z["day_max"] - z["day_min"]).to_numpy()
    user_span = (z["user_max"] - z["user_min"]).to_numpy()
    global_day = z["day_max"].max() - z["day_min"].min()
    global_user = z["user_max"].max() - z["user_min"].min()
    assert day_span.mean() <= global_day / 2
    assert user_span.mean() <= global_user / 2


def test_zvalue_interleave_bits():
    from imagor_ray.pipelines.analytics import _zvalue

    u = np.array([0b101, 0, 0xFFFF], dtype=np.int64)
    d = np.array([0b011, 0xFFFF, 0], dtype=np.int64)
    z = _zvalue(u, d)
    # user bits land odd, day bits even
    assert z[0] == (1 << 1) | (1 << 5) | (1 << 0) | (1 << 2)
    assert z[1] == sum(1 << (2 * i) for i in range(16))
    assert z[2] == sum(1 << (2 * i + 1) for i in range(16))


def test_event_transitions_rows_and_probs(ray_session):
    from imagor_ray.pipelines.analytics import event_transitions

    t = event_transitions(SF).to_pandas()
    assert len(t) > 0 and t["n_transitions"].sum() > 0
    # per-src integer-milli probabilities: floor rounding keeps each
    # src row-group total in (1000 - n_dst, 1000]
    for src, g in t.groupby("src_type"):
        s = int(g["prob_milli"].sum())
        assert 1000 - len(g) < s <= 1000, (src, s)
    # bucketing must not split users: total transitions = rows - users
    import duckdb
    want = duckdb.sql(
        f"SELECT count(*) - count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert int(t["n_transitions"].sum()) == want


def test_local_skyline_matches_brute_force():
    """The vectorized Pareto kernel vs O(n²) dominance on random sets,
    including duplicate points (co-survivors) and single elements."""
    import numpy as np

    from imagor_ray.pipelines.analytics import _local_skyline

    rng = np.random.default_rng(3)
    for trial in range(200):
        n = int(rng.integers(1, 60))
        p = rng.integers(0, 10, size=n).astype(np.int64)
        d = rng.integers(0, 10, size=n).astype(np.int64)
        k = np.arange(n, dtype=np.int64)
        idx = set(_local_skyline(p, d, k).tolist())
        brute = {i for i in range(n)
                 if not any((p[j] <= p[i]) and (d[j] <= d[i]) and
                            (p[j] < p[i] or d[j] < d[i]) for j in range(n))}
        assert idx == brute, trial


def test_skyline_of_skylines_partition_invariance(ray_session):
    """The distributed identity the operator rests on: the front of
    unioned local fronts equals the front computed in one piece,
    regardless of how rows were partitioned."""
    import numpy as np

    from imagor_ray.pipelines.analytics import _local_skyline

    rng = np.random.default_rng(11)
    n = 500
    p = rng.integers(0, 1000, size=n).astype(np.int64)
    d = rng.integers(0, 1000, size=n).astype(np.int64)
    k = np.arange(n, dtype=np.int64)
    whole = set(k[_local_skyline(p, d, k)].tolist())
    parts = np.array_split(rng.permutation(n), 7)
    surv = np.concatenate([part[_local_skyline(p[part], d[part], k[part])]
                           for part in parts])
    merged = set(surv[_local_skyline(p[surv], d[surv], k[surv])].tolist())
    assert merged == whole


class TestSkylineDistributedFold:
    """Round-4 verdict item 3: the global front is folded via a
    price-range-bucketed intermediate pass; the driver sees only
    unioned bucket-fronts. Pinned on both front shapes: anti-correlated
    (front = O(n), the adversarial memory case) and correlated
    (front tiny — the driver collect must stay front-sized, not
    batch-survivor-union-sized)."""

    @staticmethod
    def _write_orders(tmp_path, price_m, day):
        import pandas as pd

        n = len(price_m)
        df = pd.DataFrame({
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": np.arange(n, dtype="int64") % 97,
            "o_orderdate": pd.Timestamp("2020-01-01")
            + pd.to_timedelta(day, unit="D"),
            "o_totalprice": price_m / 1000.0,
        })
        d = tmp_path / "orders_fixture"
        d.mkdir()
        df.to_parquet(d / "orders.parquet", index=False)
        return str(d)

    @staticmethod
    def _oracle(sf_dir):
        import duckdb

        from imagor_ray.pipelines.analytics import SKYLINE_SQL

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS FROM '{sf_dir}/orders.parquet'")
        return (con.execute(SKYLINE_SQL).df()
                .sort_values("o_orderkey").reset_index(drop=True))

    def test_anticorrelated_front_is_whole_set(self, ray_session, tmp_path):
        # strictly anti-correlated: every point is on the front
        from imagor_ray.pipelines.analytics import skyline_orders

        n = 5000
        price_m = np.arange(n, dtype="int64") * 1000
        day = (n - 1 - np.arange(n)).astype("int64")
        sf = self._write_orders(tmp_path, price_m, day)
        got = skyline_orders(sf)
        assert len(got) == n  # the adversarial O(n)-front shape
        want = self._oracle(sf)
        import pandas as pd
        pd.testing.assert_frame_equal(
            got.astype({"o_orderdate": "datetime64[us]"}),
            want.astype({"o_orderdate": "datetime64[us]",
                         "o_orderkey": "int64", "price_m": "int64"})
            [got.columns.tolist()])

    def test_correlated_driver_collect_is_front_sized(
            self, ray_session, tmp_path, monkeypatch):
        import pandas as pd
        import ray.data as rd

        from imagor_ray.pipelines.analytics import skyline_orders

        rng = np.random.default_rng(7)
        n = 20000
        base = rng.integers(0, 1_000_000, size=n).astype("int64")
        # correlated: cheap orders are also early → tiny front
        price_m = base * 500
        day = (base // 100 + rng.integers(0, 50, size=n)).astype("int64")
        sf = self._write_orders(tmp_path, price_m, day)

        sizes = []
        orig = rd.Dataset.to_pandas

        def spy(self, *a, **k):
            df = orig(self, *a, **k)
            sizes.append(len(df))
            return df

        monkeypatch.setattr(rd.Dataset, "to_pandas", spy)
        got = skyline_orders(sf)
        monkeypatch.undo()
        want = self._oracle(sf)
        pd.testing.assert_frame_equal(
            got.astype({"o_orderdate": "datetime64[us]"}),
            want.astype({"o_orderdate": "datetime64[us]",
                         "o_orderkey": "int64", "price_m": "int64"})
            [got.columns.tolist()])
        # ONE driver collect, and it is bucket-front-sized (≪ n), not
        # the raw per-batch survivor union
        assert len(sizes) == 1
        assert sizes[0] < n // 10, sizes
