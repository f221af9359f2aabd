"""Similarity search over the ``embeddings`` table.

- ``ann_topk``: brute-force cosine top-k per query — the baseline. The
  query matrix (first ``n_queries`` vectors) is broadcast via ``ray.put``
  and each batch does one numpy matmul against it; per-batch partial top-k
  rows are merged in a tiny final groupby. At 100 TB the same shape holds:
  the shuffle carries k rows per (query, batch), never the embeddings.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic seeded planes); candidates are searched only within the
  query's bucket (probing the exact bucket), cutting the scanned fraction
  to ~1/2^bits. Falls back to brute force for queries with tiny buckets.
- ``label_centroids``: per-label mean embedding via per-batch partial
  sums (one (label, sum_vec, count) row per batch) merged in a final
  narrow groupby — the mergeable-sketch aggregation pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

__all__ = ["ann_topk", "lsh_topk", "label_centroids"]


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["vec_id"] < n_queries].sort_values("vec_id")
    q = np.stack(df["embedding"].to_numpy()).astype("float64")
    return df["vec_id"].to_numpy(), q


def ann_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k.

    Output: query_id, vec_id, cos (round 5), rank 1..k — ranked by
    (cos desc, vec_id asc), self-matches excluded.
    """
    qids, qmat = _query_matrix(sf_dir, n_queries)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put((qids, qnorm))

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        ids, qn = ray.get(qref)
        vecs = np.stack(b["embedding"].to_numpy()).astype("float64")
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vn @ qn.T  # (batch, n_queries)
        vid = b["vec_id"].to_numpy()
        frames = []
        for qi, qid in enumerate(ids):
            s = sims[:, qi]
            mask = vid != qid
            sv, vv = s[mask], vid[mask]
            if len(sv) > k:
                part = np.argpartition(-sv, k)[: k * 2]  # headroom for ties
                sv, vv = sv[part], vv[part]
            frames.append(pd.DataFrame({"query_id": qid, "vec_id": vv, "cos": sv}))
        return pd.concat(frames, ignore_index=True)

    partials = _read_emb(sf_dir).map_batches(partial_topk, batch_format="pandas")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(cos=g["cos"].round(5))
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
        .astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})
    )


def lsh_topk(
    sf_dir: str, n_queries: int = 5, k: int = 10, bits: int = 4, seed: int = 7,
    probe_hamming: int = 1,
) -> pd.DataFrame:
    """LSH-bucketed variant: random-hyperplane signatures route vectors to
    2^bits buckets; each query searches buckets within Hamming distance
    ``probe_hamming`` of its own signature (multi-probe — single-probe
    recall is poor when similarities are weak). Approximate — compared
    against brute force by recall in tests, not by the oracle. Scanned
    fraction ≈ Σ_{i≤r} C(bits,i) / 2^bits."""
    qids, qmat = _query_matrix(sf_dir, n_queries)
    import pyarrow.parquet as pq

    dim = len(qmat[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    qsig = (qmat @ planes > 0).astype(np.uint8)
    qbucket = qsig @ (1 << np.arange(bits))
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    ref = ray.put((qids, qnorm, qbucket, planes))

    def _popcount(x: np.ndarray) -> np.ndarray:
        out = np.zeros_like(x)
        while x.any():
            out += x & 1
            x = x >> 1
        return out

    def bucket_partial(b: pd.DataFrame) -> pd.DataFrame:
        ids, qn, qb, pl = ray.get(ref)
        vecs = np.stack(b["embedding"].to_numpy()).astype("float64")
        sig = (vecs @ pl > 0).astype(np.uint8)
        vb = sig @ (1 << np.arange(pl.shape[1]))
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        vid = b["vec_id"].to_numpy()
        frames = []
        for qi, qid in enumerate(ids):
            mask = (_popcount(np.bitwise_xor(vb, qb[qi])) <= probe_hamming) & (vid != qid)
            if not mask.any():
                continue
            s = vn[mask] @ qn[qi]
            frames.append(pd.DataFrame({"query_id": qid, "vec_id": vid[mask], "cos": s}))
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    partials = _read_emb(sf_dir).map_batches(bucket_partial, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(cos=g["cos"].round(5))
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    return (
        partials.groupby("query_id").map_groups(final, batch_format="pandas")
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_id_a < vec_id_b, cos)
    with cos ≥ threshold (rounded 5). Brute force against the broadcast
    matrix per batch — the N×N scan is restricted per batch row-block so
    the shuffle carries only qualifying pairs; at 100 TB the LSH-bucketed
    variant (see ``lsh_topk``) pre-filters candidates instead."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    all_ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype("float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, mat))

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        ids, m = ray.get(ref)
        vecs = np.stack(b["embedding"].to_numpy()).astype("float64")
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        vid = b["vec_id"].to_numpy()
        sims = vecs @ m.T
        rows_a, rows_b, cos = [], [], []
        for i in range(len(vid)):
            mask = (sims[i] >= threshold) & (ids > vid[i])
            if mask.any():
                rows_a.extend([vid[i]] * int(mask.sum()))
                rows_b.extend(ids[mask].tolist())
                cos.extend(np.round(sims[i][mask], 5).tolist())
        return pd.DataFrame({
            "vec_id_a": pd.Series(rows_a, dtype="int64"),
            "vec_id_b": pd.Series(rows_b, dtype="int64"),
            "cos": pd.Series(cos, dtype="float64"),
        })

    out = _read_emb(sf_dir).map_batches(pairs, batch_format="pandas").to_pandas()
    if "vec_id_a" not in out.columns:  # all batches empty → columnless frame
        out = pd.DataFrame({
            "vec_id_a": pd.Series([], dtype="int64"),
            "vec_id_b": pd.Series([], dtype="int64"),
            "cos": pd.Series([], dtype="float64"),
        })
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid, exploded to (label, dim_idx, centroid round 5)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for label, g in b.groupby("label"):
            vecs = np.stack(g["embedding"].to_numpy()).astype("float64")
            rows.append({
                "label": int(label),
                "sum_vec": vecs.sum(axis=0).tolist(),
                "n": len(g),
            })
        return pd.DataFrame(rows)

    partials = _read_emb(sf_dir).map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        total = np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0)
        n = int(g["n"].sum())
        cent = np.round(total / n, 5)
        return pd.DataFrame({
            "label": int(g["label"].iloc[0]),
            "dim_idx": np.arange(1, len(cent) + 1, dtype="int64"),
            "centroid": cent,
        })

    return (
        partials.groupby("label").map_groups(merge, batch_format="pandas")
        .to_pandas().sort_values(["label", "dim_idx"]).reset_index(drop=True)
    )
