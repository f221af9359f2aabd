"""PageRank: mass conservation, damping floor, and graph-structure
sanity beyond the oracle parity row."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pr_run(ray_session):
    """Run pagerank ONCE with a Dataset.to_pandas spy installed, so the
    no-driver-materialization contract is pinned on the same run the
    value tests consume."""
    import ray.data as rd

    from imagor_ray.pipelines.graph import pagerank

    calls = []
    orig = rd.Dataset.to_pandas

    def spy(self, *a, **k):
        df = orig(self, *a, **k)
        calls.append(len(df))
        return df

    rd.Dataset.to_pandas = spy
    try:
        out = pagerank(SF)
    finally:
        rd.Dataset.to_pandas = orig
    return out, calls


@pytest.fixture(scope="module")
def pr_df(pr_run):
    return pr_run[0]


def test_no_driver_state_inside_round_loop(pr_run):
    """Round-4 verdict item 2: degrees ride the _nb exchange as tagged
    rows — the only driver collect is the final result, never the node
    table inside the loop (previously 2 extra full-state to_pandas)."""
    out, calls = pr_run
    assert len(calls) == 1, calls
    assert calls[0] == len(out)


def test_mass_conserved(pr_df):
    """Undirected graph + damped update: total pr stays within the
    truncation loss of N * PR0 (each round loses < 1 micro-unit per
    edge to // and < 1 per node to the 850·s // 1000 fold)."""
    n = len(pr_df)
    total = int(pr_df["pr"].sum())
    assert n * 1_000_000 * 0.999 < total <= n * 1_000_000


def test_damping_floor_and_node_split(pr_df):
    assert (pr_df["pr"] >= 150_000).all()
    assert set(pr_df["node_type"]) == {"customer", "supplier"}
    n_supp = duckdb.sql(
        f"SELECT count(DISTINCT l_suppkey) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    assert (pr_df["node_type"] == "supplier").sum() == n_supp


def test_suppliers_outrank_customers(pr_df):
    """Bipartite degree asymmetry: far fewer suppliers than customers
    share the same edge set, so mean supplier pr must exceed mean
    customer pr."""
    m = pr_df.groupby("node_type")["pr"].mean()
    assert m["supplier"] > m["customer"]


class TestButterflyCount:
    """Hand-built bipartite graphs with counts known in closed form."""

    def _run(self, pairs, tmp_path):
        import pandas as pd

        # one order per (cust, supp) edge; lineitem carries the supplier
        od = pd.DataFrame({
            "o_orderkey": range(len(pairs)),
            "o_custkey": [p[0] for p in pairs],
        })
        li = pd.DataFrame({
            "l_orderkey": range(len(pairs)),
            "l_suppkey": [p[1] for p in pairs],
        })
        d = tmp_path / "bf"
        d.mkdir()
        od.to_parquet(d / "orders.parquet", index=False)
        li.to_parquet(d / "lineitem.parquet", index=False)
        from imagor_ray.pipelines.graph import butterfly_count
        out = butterfly_count(str(d)).to_pandas()
        return int(out["n_wedges"].iloc[0]), int(out["n_butterflies"].iloc[0])

    def test_complete_k22_is_one_butterfly(self, ray_session, tmp_path):
        # two customers × two suppliers fully connected: each supplier
        # contributes one wedge; the pair shares w=2 -> C(2,2)=1
        w, b = self._run([(1, 10), (1, 11), (2, 10), (2, 11)], tmp_path)
        assert (w, b) == (2, 1)

    def test_complete_k33(self, ray_session, tmp_path):
        # K_{3,3}: wedges = 3 suppliers × C(3,2) = 9; every customer
        # pair shares w=3 -> 3 pairs × C(3,2) = 9 butterflies
        pairs = [(c, s) for c in (1, 2, 3) for s in (10, 11, 12)]
        w, b = self._run(pairs, tmp_path)
        assert (w, b) == (9, 9)

    def test_duplicate_edges_collapse(self, ray_session, tmp_path):
        # repeated purchases are ONE edge (distinct (c, s)); a star
        # with one supplier has wedges but no butterfly
        pairs = [(1, 10), (1, 10), (2, 10), (3, 10), (3, 10)]
        w, b = self._run(pairs, tmp_path)
        assert (w, b) == (3, 0)


class TestBfsHops:
    def test_path_graph_depth_cap_and_unreachable(self, ray_session, tmp_path):
        import pandas as pd

        # chain c0-s0-c1-s1-c2 (+ an unreachable island c9-s9): from
        # seed c0 (lowest customer), hops are s0=1, c1=2, s1=3; c2 is
        # 4 hops away — beyond the cap — and the island never appears
        pairs = [(0, 0), (1, 0), (1, 1), (2, 1), (9, 9)]
        od = pd.DataFrame({"o_orderkey": range(len(pairs)),
                           "o_custkey": [p[0] for p in pairs]})
        li = pd.DataFrame({"l_orderkey": range(len(pairs)),
                           "l_suppkey": [p[1] for p in pairs]})
        d = tmp_path / "bfs"
        d.mkdir()
        od.to_parquet(d / "orders.parquet", index=False)
        li.to_parquet(d / "lineitem.parquet", index=False)

        from imagor_ray.pipelines.graph import bfs_hops
        got = bfs_hops(str(d))
        want = {("customer", 0): 0, ("supplier", 0): 1,
                ("customer", 1): 2, ("supplier", 1): 3}
        assert {(r.node_type, r.node_id): r.hops
                for r in got.itertuples()} == want
