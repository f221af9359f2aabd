"""Deterministic sampling / split assignment — training-data-pipeline
operators a 100 TB corpus needs: reproducible train/val/test membership
that is a pure function of the row key, so any node (and any rerun, and
the DuckDB oracle) assigns identically with no coordination, no RNG
state, and no shuffle — membership is a pure ``map_batches``.

The splitter hashes the key's decimal string with md5 and buckets on
the first hex nibble: 0..b → train (12/16), c..d → val (2/16),
e..f → test (2/16). md5 is already the engine's cross-engine hash
contract (dedup.py docstring): ``hashlib.md5 == DuckDB md5()``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["dataset_split", "deterministic_sample"]

_TRAIN = set("0123456789ab")
_VAL = set("cd")


def _split_of(key: int) -> str:
    c = hashlib.md5(str(key).encode()).hexdigest()[0]
    return "train" if c in _TRAIN else ("val" if c in _VAL else "test")


def dataset_split(sf_dir: str) -> rd.Dataset:
    """Output: doc_id, split ('train' 12/16, 'val' 2/16, 'test' 2/16)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": ids,
            "split": [_split_of(int(i)) for i in ids],
        })

    return docs.map_batches(assign, batch_format="pandas")


def deterministic_sample(
    sf_dir: str, rate_sixteenths: int = 4
) -> rd.Dataset:
    """Hash-gated sample of the events stream: keep rows whose
    md5(event_id) first nibble < ``rate_sixteenths`` — an exact
    rate_sixteenths/16 expected rate, reproducible across engines and
    reruns. Output: event_id, user_id, event_type."""
    gate = set("0123456789abcdef"[:rate_sixteenths])
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["event_id"].astype("int64")
        mask = np.fromiter(
            (hashlib.md5(str(int(i)).encode()).hexdigest()[0] in gate
             for i in ids),
            dtype=bool, count=len(ids),
        )
        return b[mask]

    return ev.map_batches(keep, batch_format="pandas")


_DEFAULT_MIX = {                     # sixteenth-rates per event_type —
    "error": 16,                     # keep all rare/valuable classes...
    "purchase": 16,
    "click": 4,                      # ...downsample the bulk classes
    "view": 2,
    "signup": 8,
}


def stratified_sample(
    sf_dir: str, mix: dict[str, int] | None = None
) -> rd.Dataset:
    """Stratified (per-class) hash-gated sampling — the training-
    mixture composition op: each event_type keeps
    ``mix[type]/16`` of its rows via the same md5-first-nibble gate as
    :func:`deterministic_sample`, so the DOWN-weighting of bulk
    classes and KEEP-all of rare classes is a pure per-row function of
    (event_id, event_type). No shuffle, no RNG state, no coordination
    — any node, any rerun, and the DuckDB oracle agree row-for-row.
    Types absent from ``mix`` default to keep-all (16/16).

    Output: event_id, user_id, event_type.
    """
    rates = dict(_DEFAULT_MIX if mix is None else mix)
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )
    gates = {t: set("0123456789abcdef"[:r]) for t, r in rates.items()}

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["event_id"].astype("int64").tolist()
        types = b["event_type"].tolist()
        mask = np.fromiter(
            (
                t not in gates
                or hashlib.md5(str(i).encode()).hexdigest()[0] in gates[t]
                for i, t in zip(ids, types)
            ),
            dtype=bool, count=len(ids),
        )
        return b.loc[mask, ["event_id", "user_id", "event_type"]]

    return ev.map_batches(keep, batch_format="pandas")


def group_sample(sf_dir: str, k: int = 25) -> rd.Dataset:
    """Deterministic per-group RESERVOIR sample: for every event_type
    keep the ``k`` rows with the smallest ``md5(event_id)`` — the
    fixed-size per-class sample a labeling/eval pipeline draws, exact
    and rerun-stable (the hash IS the reservoir's random tape, so no
    RNG state crosses tasks). Scale shape: each batch pre-selects its
    own per-group top-k (a mergeable partial — what shuffles is
    ``<= k × n_types`` rows per batch, independent of batch size),
    then one tiny grouped reduce (group count = type cardinality)
    finishes the merge and assigns ranks.

    Output: event_type, event_id, user_id, rk (1..k by md5 order).
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["event_id"].astype("int64")
        h = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        out = pd.DataFrame({
            "event_type": b["event_type"].to_numpy(),
            "event_id": ids.to_numpy(),
            "user_id": b["user_id"].astype("int64").to_numpy(),
            "h": h,
        })
        return (out.sort_values(["event_type", "h", "event_id"])
                .groupby("event_type", sort=False).head(k)
                .reset_index(drop=True))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"]).head(k)
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "event_id": g["event_id"].to_numpy(dtype="int64"),
            "user_id": g["user_id"].to_numpy(dtype="int64"),
            "rk": np.arange(1, len(g) + 1, dtype="int64"),
        })

    return (ev.map_batches(add_hash, batch_format="pandas")
            .groupby("event_type")
            .map_groups(finish, batch_format="pandas"))


def weighted_sample(sf_dir: str, denom: int = 1000,
                    weight_cap: int = 900) -> rd.Dataset:
    """WEIGHT-PROPORTIONAL deterministic sampling: document i survives
    with probability min(n_chars, cap)/denom — longer documents are
    proportionally likelier, the standard size-biased corpus draw —
    decided by the doc's OWN hash, never an RNG (rerun-stable, no
    state crosses tasks; same tape idiom as deterministic_sample).
    Acceptance rule, identical on both engines:
        u32 = int(md5(str(doc_id))[:8], 16)      # uniform 32-bit
        keep  ⟺  u32 % denom < min(n_chars, cap)
    Pure predicate map over a 2-column pruned read — the embarrassing
    100 TB shape; nothing shuffles.

    Output: doc_id, n_chars (kept rows).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        u = np.fromiter(
            (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
             for i in ids), dtype="int64", count=len(ids))
        w = np.minimum(b["n_chars"].to_numpy().astype("int64"), weight_cap)
        m = (u % denom) < w
        return pd.DataFrame({
            "doc_id": ids.to_numpy()[m],
            "n_chars": b["n_chars"].to_numpy().astype("int64")[m],
        })

    return ds.map_batches(keep, batch_format="pandas")


WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 1000 < LEAST(n_chars, 900)
ORDER BY doc_id
"""
