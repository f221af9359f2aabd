"""k-means: differential test of the distributed Lloyd's loop against a
plain single-process numpy reference, plus the exactness invariants the
oracle contract rests on (quantization parity, floor-div vs
floor-of-double-division, monotone inertia)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from imagor_ray.pipelines.kmeans import (
    DIM, K, SCALE, _assign_np, _quantize, kmeans_train,
)

SF = "/root/testdata/sf0.001"


def _reference_train(qX: np.ndarray, k: int, rounds: int) -> pd.DataFrame:
    """Straight-line single-process Lloyd's with the module's exact
    semantics (floor-div update, first-min tie-break, empty-cluster
    carry-forward) — no shared code with the distributed path beyond
    the two leaf kernels."""
    C = qX[:k].copy()
    for _ in range(rounds):
        cl, _ = _assign_np(qX, C)
        for c in range(k):
            members = qX[cl == c]
            if len(members):
                C[c] = np.floor_divide(members.sum(axis=0), len(members))
    cl, dist = _assign_np(qX, C)
    rows = []
    for c in np.unique(cl):
        rows.append({"cluster": int(c), "n_members": int((cl == c).sum()),
                     "inertia": int(dist[cl == c].sum())})
    return pd.DataFrame(rows).astype("int64")


def _full_table() -> np.ndarray:
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id")
    return _quantize(df["embedding"].to_numpy())


def test_train_matches_single_process_reference(ray_session):
    qX = _full_table()
    got = kmeans_train(SF, rounds=3).sort_values("cluster").reset_index(drop=True)
    want = _reference_train(qX, K, 3).sort_values("cluster").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_inertia_non_increasing_across_rounds(ray_session):
    """Lloyd's monotonicity — a strong convergence witness on exact
    arithmetic (floor-div centroids are within 1 of the true mean, so
    strict monotonicity can break only by < k*DIM per round; assert the
    standard no-worse-than-start property instead)."""
    i0 = kmeans_train(SF, rounds=0)["inertia"].sum()
    i3 = kmeans_train(SF, rounds=3)["inertia"].sum()
    assert i3 <= i0


def test_quantization_matches_duckdb():
    x = np.array([-0.0375441722, 0.9999999, -1.0, 0.0005, 2.5],
                 dtype=np.float32)
    got = np.floor(x.astype(np.float64) * SCALE).astype(np.int64)
    con = duckdb.connect()
    want = [con.sql(
        "SELECT CAST(floor(CAST(CAST(? AS FLOAT) AS DOUBLE)*1000) AS BIGINT)",
        params=[float(v)]).fetchone()[0] for v in x]
    assert got.tolist() == want


def test_floor_div_equals_floor_of_double_division():
    """The SQL update uses floor(sum/n) in double; Python uses int
    floor-div. Equal for every |sum| reachable at oracle scale."""
    rng = np.random.default_rng(7)
    sums = rng.integers(-5 * 10**8, 5 * 10**8, size=2000)
    ns = rng.integers(1, 2000, size=2000)
    assert all(int(np.floor_divide(s, n)) == int(np.floor(s / n))
               for s, n in zip(sums, ns))


def test_tie_break_first_min():
    X = np.array([[0] * DIM], dtype=np.int64)
    C = np.array([[1] + [0] * (DIM - 1), [1] + [0] * (DIM - 1)],
                 dtype=np.int64)
    cl, dist = _assign_np(X, C)
    assert cl[0] == 0 and dist[0] == 1


def test_power_iter_rayleigh_improves(ray_session):
    """Convergence witness suited to this spectrum: random gaussian
    embeddings give a near-flat eigengap (λ2/λ1 ≈ 0.93 here), so a
    3-round direction can't pin the top eigenvector — but the Rayleigh
    quotient must climb monotonically toward λ1 and beat the spectrum
    mean (what power iteration guarantees regardless of gap)."""
    from imagor_ray.pipelines.kmeans import pca_power_iter

    qX = _full_table().astype(np.float64)
    G = qX.T @ qX
    evals = np.linalg.eigvalsh(G)

    def rayleigh(v: np.ndarray) -> float:
        return (v @ G @ v) / (v @ v)

    rs = [rayleigh(pca_power_iter(SF, rounds=r)["v"]
                   .to_numpy().astype(np.float64)) for r in (1, 2, 3)]
    assert rs[0] < rs[1] < rs[2] <= evals[-1] * (1 + 1e-9)
    assert rs[2] > evals.mean()
