"""Heavy hitters (frequent tokens) via a two-pass sketch + exact
recount — the classic 100 TB pattern for "top items by frequency"
when the item domain is unbounded:

Pass 1 (sketch): each batch keeps only tokens whose LOCAL count
exceeds batch_total/(k+1) — the pigeonhole guarantee that any token
globally heavier than N/(k+1) must clear that bar in at least one
batch, so the union of per-batch survivors is a SUPERSET of the true
heavy hitters (≤ k candidate rows per batch ever leave the scan).
Batch token totals fold to the global N alongside.

Pass 2 (verify): candidates broadcast as a set (``ray.put``) and get
EXACT counts from a second scan restricted to them — so the output is
exact, not approximate, and the DuckDB oracle (full count + the same
``cnt·(k+1) > N`` filter) hash-matches despite the sketch.

Tokenization matches the repo convention (``split(" ")``, empties
kept ↔ DuckDB ``string_split``) — textstats.py:227.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def heavy_hitter_tokens(sf_dir: str, k: int = 64,
                        num_buckets: int = 32) -> rd.Dataset:
    """Tokens with global frequency > N/(k+1), exact counts.
    Output: token, cnt, total_tokens."""
    import ray as _ray

    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in b["text"].tolist():
            c.update(t.split(" "))
        total = sum(c.values())
        # pigeonhole bar: local survivors of cnt·(k+1) > batch_total
        toks = [t for t, n in c.items() if n * (k + 1) > total]
        return pd.DataFrame({"token": pd.array(toks, dtype="string")})

    cand = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    # candidate union is ≤ k rows/batch by construction — driver-safe
    cand_ref = _ray.put(set(cand["token"].dropna()))

    def count_pass(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        keep = _ray.get(cand_ref)
        c: Counter = Counter()
        total = 0
        for t in b["text"].tolist():
            toks = t.split(" ")
            total += len(toks)
            c.update(tok for tok in toks if tok in keep)
        toks = list(c.keys())
        out = pd.DataFrame({
            "token": pd.array(toks, dtype="string"),
            "cnt": np.fromiter(c.values(), dtype="int64", count=len(c)),
        })
        # one sentinel row per batch carries the batch token total
        sent = pd.DataFrame({"token": pd.array([None], dtype="string"),
                             "cnt": np.array([total], dtype="int64")})
        out = pd.concat([out, sent], ignore_index=True)
        out["_tb"] = np.where(
            out["token"].isna(), np.int32(0),
            crc32_bucket(out["token"].fillna("").tolist(), num_buckets)
        ).astype("int32")
        return out

    counted = (ds.map_batches(count_pass, batch_format="pandas")
               .groupby("_tb")
               .map_groups(lambda g: g.drop(columns=["_tb"])
                           .groupby("token", sort=False, dropna=False)
                           ["cnt"].sum().reset_index(),
                           batch_format="pandas")
               .to_pandas())
    # exact global N from the sentinel rows; exact counts for the rest
    is_sent = counted["token"].isna()
    n_total = int(counted.loc[is_sent, "cnt"].sum())
    hits = counted[~is_sent]
    hits = hits[hits["cnt"].to_numpy() * (k + 1) > n_total]
    out = pd.DataFrame({
        "token": hits["token"].astype(object).to_numpy(),
        "cnt": hits["cnt"].to_numpy().astype("int64"),
        "total_tokens": np.int64(n_total),
    }).sort_values(["cnt", "token"], ascending=[False, True])
    return out.reset_index(drop=True)


HEAVY_HITTERS_SQL = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok
), c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1
)
SELECT c.token, c.cnt, n.total AS total_tokens
FROM c, n WHERE c.cnt * 65 > n.total
ORDER BY c.cnt DESC, c.token
"""
