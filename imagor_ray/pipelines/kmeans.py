"""Distributed k-means over the embedding table — the clustering /
semantic-bucketing primitive (coarse IVF training, semantic dedup
pre-partitioning, curriculum bucketing) and, with ``bpe_merges``, the
second marquee ITERATIVE op. Unlike BPE it is fully ORACLE-VERIFIED,
including the multi-round training loop: embeddings are quantized to
integers (``floor(float64(x) * 1000)``), so every distance, partial sum
and centroid update is exact integer arithmetic that DuckDB reproduces
bit-for-bit — the classic float-nondeterminism escape hatch (CLAUDE.md
float contract) applied to an iterative algorithm.

Semantics (all deterministic):

- init: centroids = quantized vectors ``vec_id < k``;
- assignment: argmin of squared L2 distance, ties → smallest cluster id
  (``np.argmin`` first-min ≡ SQL ``ORDER BY dist_sq, cluster``);
- update: per-dim FLOOR division of coordinate sums by member count
  (``np.floor_divide`` ≡ SQL ``floor(sum / n)`` — exact while
  ``|sum| < 2**53``, i.e. far past any oracle scale); empty clusters
  keep their previous centroid.

Scale shape (the Lloyd's-iteration textbook topology): the centroid
matrix is k×64 ints — it ships in the task closure, never through a
shuffle. Each training round is ONE streamed pass over the table:
``map_batches`` folds every batch to ≤ k partial rows (cluster,
coord-sum vector, count), a k-group reduce merges them, and only k
rows reach the driver per round. Rounds re-stream the input from
parquet (no materialization — the ``bpe_merges`` re-read precedent).
Assignment output is a pure map. Inertia stays int64 up to ~10^10 rows
at this quantization; past that the entry would widen to per-cluster
partial pairs (documented, not needed at oracle scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["kmeans_assign", "kmeans_iter", "kmeans_train",
           "embedding_gram", "EMBEDDING_GRAM_SQL",
           "pca_power_iter", "pca_power_iter_sql",
           "KMEANS_ASSIGN_SQL", "KMEANS_ITER_SQL", "kmeans_train_sql"]

K = 8
DIM = 64
SCALE = 1000

_QUANT_SQL = f"""q AS (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE)*{SCALE}) AS BIGINT) FOR x IN embedding] AS qv
  FROM embeddings
)"""


def _quantize(emb_col) -> np.ndarray:
    """(n, DIM) int64 — float32 → float64 is exact, *SCALE and floor are
    the identical IEEE ops DuckDB runs."""
    x = np.stack([np.asarray(e, dtype=np.float64) for e in emb_col])
    return np.floor(x * SCALE).astype(np.int64)


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Predicate pushed into the read (ann.py:_query_matrix pattern):
    only row groups intersecting vec_id < k are decoded."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    )
    df = t.to_pandas().sort_values("vec_id")
    return _quantize(df["embedding"].to_numpy())


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _assign_np(X: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer squared-L2 argmin; first-min tie-break."""
    d = X[:, None, :] - C[None, :, :]
    dist = np.einsum("nkd,nkd->nk", d, d)
    cl = dist.argmin(axis=1)
    return cl, dist[np.arange(len(X)), cl]


def kmeans_assign(sf_dir: str, k: int = K) -> rd.Dataset:
    """One assignment pass against the init centroids.

    Output: vec_id, cluster, dist_sq.
    """
    C = _init_centroids(sf_dir, k)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        cl, dist = _assign_np(_quantize(b["embedding"].to_numpy()), C)
        return pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64").to_numpy(),
            "cluster": cl.astype("int64"),
            "dist_sq": dist.astype("int64"),
        })

    return _read_emb(sf_dir).map_batches(assign, batch_format="pandas")


def _partials_fn(C: np.ndarray, k: int):
    """Per-batch fold to ≤ k rows: (cluster, 64 coord sums, count)."""

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        X = _quantize(b["embedding"].to_numpy())
        cl, dist = _assign_np(X, C)
        sums = np.zeros((k, DIM), dtype=np.int64)
        np.add.at(sums, cl, X)
        counts = np.bincount(cl, minlength=k).astype(np.int64)
        inertia = np.bincount(cl, weights=dist.astype(np.float64),
                              minlength=k).astype(np.int64)
        present = np.flatnonzero(counts)
        return pd.DataFrame({
            "cluster": present.astype("int64"),
            "sums": [sums[c].tolist() for c in present],
            "n": counts[present],
            "inertia": inertia[present],
        })

    return partials


def _merge_groups(g: pd.DataFrame) -> pd.DataFrame:
    s = np.sum(np.stack([np.asarray(x, dtype=np.int64) for x in g["sums"]]),
               axis=0)
    return pd.DataFrame({
        "cluster": [int(g["cluster"].iloc[0])],
        "sums": [s.tolist()],
        "n": [int(g["n"].sum())],
        "inertia": [int(g["inertia"].sum())],
    })


def _round_partials(sf_dir: str, C: np.ndarray, k: int) -> pd.DataFrame:
    """One streamed pass → k merged rows on the driver."""
    ds = _read_emb(sf_dir).map_batches(_partials_fn(C, k),
                                       batch_format="pandas")
    return (ds.groupby("cluster")
              .map_groups(_merge_groups, batch_format="pandas")
              .to_pandas())


def kmeans_iter(sf_dir: str, k: int = K) -> rd.Dataset:
    """One Lloyd update, emitted division-free so the oracle needs no
    float ops at all: per-(cluster, dim) coordinate sums + member count.

    Output: cluster, dim_idx, coord_sum, n_members  (k×64 rows).
    """
    C = _init_centroids(sf_dir, k)
    ds = _read_emb(sf_dir).map_batches(_partials_fn(C, k),
                                       batch_format="pandas")

    def unnest(g: pd.DataFrame) -> pd.DataFrame:
        m = _merge_groups(g)
        s = np.asarray(m["sums"].iloc[0], dtype=np.int64)
        return pd.DataFrame({
            "cluster": np.full(DIM, m["cluster"].iloc[0], dtype="int64"),
            "dim_idx": np.arange(DIM, dtype="int64"),
            "coord_sum": s,
            "n_members": np.full(DIM, m["n"].iloc[0], dtype="int64"),
        })

    return ds.groupby("cluster").map_groups(unnest, batch_format="pandas")


def kmeans_train(sf_dir: str, k: int = K, rounds: int = 3) -> pd.DataFrame:
    """``rounds`` Lloyd updates, then a final assignment summary.

    Output: cluster, n_members, inertia (one row per non-empty cluster).
    """
    C = _init_centroids(sf_dir, k)
    for _ in range(rounds):
        part = _round_partials(sf_dir, C, k)
        C = C.copy()
        for _, row in part.iterrows():
            if row["n"] > 0:
                C[int(row["cluster"])] = np.floor_divide(
                    np.asarray(row["sums"], dtype=np.int64), int(row["n"]))
    final = _round_partials(sf_dir, C, k)
    return (final[["cluster", "n", "inertia"]]
            .rename(columns={"n": "n_members"})
            .sort_values("cluster")
            .reset_index(drop=True)
            .astype("int64"))


# ---------------------------------------------------------------------------
# SQL mirrors

def _assign_cte(src: str, cents: str, tag: str, k: int) -> str:
    return f"""d{tag} AS (
  SELECT v.vec_id, c.cluster,
         CAST(SUM((v.qv[r.i]-c.qv[r.i])*(v.qv[r.i]-c.qv[r.i])) AS BIGINT) AS dist_sq
  FROM {src} v, {cents} c, range(1,{DIM + 1}) r(i)
  GROUP BY v.vec_id, c.cluster
), a{tag} AS (
  SELECT vec_id, cluster, dist_sq FROM d{tag}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist_sq, cluster) = 1
)"""


_C0 = f"c0 AS (SELECT vec_id AS cluster, qv FROM q WHERE vec_id < {K})"

KMEANS_ASSIGN_SQL = f"""
WITH {_QUANT_SQL},
{_C0},
{_assign_cte('q', 'c0', '0', K)}
SELECT vec_id, cluster, dist_sq FROM a0
"""

KMEANS_ITER_SQL = f"""
WITH {_QUANT_SQL},
{_C0},
{_assign_cte('q', 'c0', '0', K)}
SELECT a.cluster, r.i - 1 AS dim_idx,
       CAST(SUM(q.qv[r.i]) AS BIGINT) AS coord_sum,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM a0 a JOIN q USING (vec_id), range(1,{DIM + 1}) r(i)
GROUP BY a.cluster, r.i
"""


def kmeans_train_sql(k: int = K, rounds: int = 3) -> str:
    """Unrolled multi-round mirror: round r = assignment vs c{r-1},
    per-dim sums, floor-div rebuild into c{r} (empty clusters carry
    c{r-1} forward). The floor of the double division is exact at any
    magnitude below 2**53 — see module docstring."""
    parts = [_QUANT_SQL,
             f"c0 AS (SELECT vec_id AS cluster, qv FROM q WHERE vec_id < {k})"]
    for r in range(1, rounds + 1):
        parts.append(_assign_cte("q", f"c{r - 1}", str(r), k))
        parts.append(f"""s{r} AS (
  SELECT a.cluster, r.i AS i,
         CAST(SUM(q.qv[r.i]) AS BIGINT) AS ssum,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a{r} a JOIN q USING (vec_id), range(1,{DIM + 1}) r(i)
  GROUP BY a.cluster, r.i
), c{r} AS (
  SELECT cluster,
         list(CAST(floor(CAST(ssum AS DOUBLE)/n) AS BIGINT) ORDER BY i) AS qv
  FROM s{r} GROUP BY cluster
  UNION ALL
  SELECT p.cluster, p.qv FROM c{r - 1} p
  WHERE p.cluster NOT IN (SELECT cluster FROM s{r})
)""")
    parts.append(_assign_cte("q", f"c{rounds}", "f", k))
    return ("WITH " + ",\n".join(parts) + "\n"
            "SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,\n"
            "       CAST(SUM(dist_sq) AS BIGINT) AS inertia\n"
            "FROM af GROUP BY cluster")


def embedding_gram(sf_dir: str) -> rd.Dataset:
    """Exact Gram matrix of the quantized embedding table — the
    covariance/PCA building block (X^T X plus the count; the mean
    vector is ``kmeans_iter``'s k=1 degenerate case). The mergeable-
    MATRIX-partial topology: every batch folds to one 64×64 int64
    matmul, partials ride the shuffle as upper-triangle rows, a
    64-group reduce sums them — the input table never re-shuffles and
    the driver never sees a vector. Entries stay within int64 up to
    ~10^10 rows at this quantization (module docstring).

    Output: dim_i, dim_j (i ≤ j), gram_sum, n_vecs.
    """
    iu, ju = np.triu_indices(DIM)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = _quantize(b["embedding"].to_numpy())
        G = X.T @ X
        return pd.DataFrame({
            "dim_i": iu.astype("int64"),
            "dim_j": ju.astype("int64"),
            "g": G[iu, ju],
            "n": np.full(len(iu), len(X), dtype="int64"),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("dim_j", as_index=False, sort=True)[["g", "n"]].sum()
        return pd.DataFrame({
            "dim_i": g["dim_i"].iloc[:1].repeat(len(s)).to_numpy(),
            "dim_j": s["dim_j"].to_numpy(dtype="int64"),
            "gram_sum": s["g"].to_numpy(dtype="int64"),
            "n_vecs": s["n"].to_numpy(dtype="int64"),
        })

    return (_read_emb(sf_dir)
            .map_batches(partial, batch_format="pandas")
            .groupby("dim_i")
            .map_groups(merge, batch_format="pandas"))


EMBEDDING_GRAM_SQL = f"""
WITH {_QUANT_SQL}
SELECT r1.i - 1 AS dim_i, r2.i - 1 AS dim_j,
       CAST(SUM(qv[r1.i] * qv[r2.i]) AS BIGINT) AS gram_sum,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM q, range(1,{DIM + 1}) r1(i), range(1,{DIM + 1}) r2(i)
WHERE r2.i >= r1.i
GROUP BY 1, 2
"""


_PI_SCALE = 4096                    # fixed-point grid for the direction


def pca_power_iter(sf_dir: str, rounds: int = 3) -> pd.DataFrame:
    """Top principal direction by POWER ITERATION on the exact Gram
    matrix — iterative distributed linear algebra under the hash gate.
    The heavy part is the ONE streamed ``embedding_gram`` pass (matrix
    partials, 64-group reduce); the iteration itself is O(dim²) driver
    math on 2080 integers, deterministic because every step is exact:
    w = G·v in arbitrary-precision Python ints, then fixed-point
    renormalization v' = trunc(w·4096 / max|w|) — truncation (not
    floor) so DuckDB's HUGEINT ``//`` reproduces it bit-for-bit on
    negative components. Start vector = all-ones (fixes the sign).

    Output: dim_idx, v (the fixed-point direction, max |v| = 4096).
    """
    gram = embedding_gram(sf_dir).to_pandas()
    G = np.zeros((DIM, DIM), dtype=object)
    for i, j, g in zip(gram["dim_i"], gram["dim_j"], gram["gram_sum"]):
        G[i][j] = int(g)
        G[j][i] = int(g)
    v = [1] * DIM
    for _ in range(rounds):
        w = [sum(G[i][j] * v[j] for j in range(DIM)) for i in range(DIM)]
        m = max(abs(x) for x in w)
        v = [(-((-x * _PI_SCALE) // m)) if x < 0 else (x * _PI_SCALE) // m
             for x in w]
    return pd.DataFrame({"dim_idx": np.arange(DIM, dtype="int64"),
                         "v": np.array(v, dtype="int64")})


def pca_power_iter_sql(rounds: int = 3) -> str:
    """Unrolled mirror: symmetrize the gram CTE, then per round one
    matrix-vector join + a HUGEINT truncating renormalization."""
    parts = [f"g0 AS ({EMBEDDING_GRAM_SQL.strip()})",
             """g2 AS (
  SELECT dim_i AS i, dim_j AS j, gram_sum AS g FROM g0
  UNION ALL
  SELECT dim_j, dim_i, gram_sum FROM g0 WHERE dim_i < dim_j
)""",
             f"v0 AS (SELECT i AS j, CAST(1 AS HUGEINT) AS v "
             f"FROM range(0,{DIM}) t(i))"]
    for r in range(1, rounds + 1):
        parts.append(f"""w{r} AS (
  SELECT g2.i AS j, SUM(CAST(g2.g AS HUGEINT) * v.v) AS w
  FROM g2 JOIN v{r - 1} v ON v.j = g2.j
  GROUP BY 1
), m{r} AS (SELECT MAX(ABS(w)) AS m FROM w{r}),
v{r} AS (
  SELECT j, CASE WHEN w < 0 THEN -((-w * {_PI_SCALE}) // m)
                 ELSE (w * {_PI_SCALE}) // m END AS v
  FROM w{r}, m{r}
)""")
    return ("WITH " + ",\n".join(parts) + f"\n"
            f"SELECT j AS dim_idx, CAST(v AS BIGINT) AS v FROM v{rounds}")
