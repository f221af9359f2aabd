"""PageRank: mass conservation, damping floor, and graph-structure
sanity beyond the oracle parity row."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pr_df(ray_session):
    from imagor_ray.pipelines.graph import pagerank

    return pagerank(SF)


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
