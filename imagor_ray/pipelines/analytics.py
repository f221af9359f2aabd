"""Window-function analytics over the event stream — SQL-window-shaped
operators (RANGE frames, per-group ranking) recast as bucketed
vectorized merges, since Ray Data has no window functions.

Partitioning assumption (SURVEY §2 custom-operator recipe a): one hash
bucket per key group, key-complete; inside a bucket everything is numpy
— the same dense-rank composite + ``searchsorted`` machinery as
``pipelines/joins.py``, plus global prefix sums for O(1) range-sum
lookups. No per-key Python loop anywhere (BENCH.md finding 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = [
    "rolling_user_stats", "top_orders_per_customer", "user_stats_by_type",
    "approx_quantiles_by_type", "latest_event_per_user",
    "event_transitions", "zorder_cells", "zorder_cells_sql",
    "EVENT_TRANSITIONS_SQL", "attribution_last_touch", "ATTRIBUTION_SQL",
    "running_customer_revenue", "RUNNING_REVENUE_SQL",
    "profile_events", "PROFILE_EVENTS_SQL",
    "incremental_user_counts", "INCREMENTAL_COUNTS_SQL",
    "skyline_orders", "SKYLINE_SQL", "robust_value_stats",
]

_7D_US = 7 * 86400 * 1_000_000


def _rolling_bucket(g: pd.DataFrame, span_us: int) -> pd.DataFrame:
    """Per-bucket rolling RANGE window: for each event, count and
    value-sum of the same user's events with ts in [ts - span, ts] —
    the frame `RANGE BETWEEN span PRECEDING AND CURRENT ROW`. Equal-ts
    rows all see the full tie group (order-independent, matching SQL
    RANGE semantics exactly)."""
    u = g["user_id"].to_numpy().astype(np.int64)
    t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    eid = g["event_id"].to_numpy().astype(np.int64)
    vm = g["value_m"].to_numpy().astype(np.int64)

    order = np.lexsort((t, u))
    u, t, eid, vm = u[order], t[order], eid[order], vm[order]

    uniq_u = np.unique(u)
    uniq_t = np.unique(t)
    m = np.int64(len(uniq_t) + 1)
    ru = np.searchsorted(uniq_u, u).astype(np.int64)
    comp = ru * m + np.searchsorted(uniq_t, t)

    # frame bounds per row: lo = first same-user index with ts >= ts-span
    # ('left' rank of the bound keeps the composite order-isomorphic),
    # hi = one past the last same-user index with ts <= ts (tie group
    # included via 'right' on the exact rank)
    lo = np.searchsorted(comp, ru * m + np.searchsorted(uniq_t, t - span_us, side="left"))
    hi = np.searchsorted(comp, ru * m + np.searchsorted(uniq_t, t), side="right")

    cs = np.concatenate([[0], np.cumsum(vm)])
    return pd.DataFrame({
        "event_id": eid,
        "user_id": u,
        "ts": pd.Series(t).astype("datetime64[us]"),
        "n_7d": (hi - lo).astype(np.int64),
        "value_m_7d": (cs[hi] - cs[lo]).astype(np.int64),
    })


def rolling_user_stats(
    sf_dir: str, span_us: int = _7D_US, num_buckets: int = 32
) -> rd.Dataset:
    """7-day rolling per-user event count + integer-milli value sum at
    each event (SQL mirror: RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND
    CURRENT ROW). Output: event_id, user_id, ts, n_7d, value_m_7d."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy()
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "ts": b["ts"].astype("datetime64[us]"),
            "user_id": b["user_id"].astype("int64"),
            # identical IEEE expression to the oracle SQL → exact sums
            "value_m": np.floor(v * 1000).astype("int64"),
            "_wb": (b["user_id"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32),
        })

    return (
        ev.map_batches(prep, batch_format="pandas")
        .groupby("_wb")
        .map_groups(
            lambda g: _rolling_bucket(g.drop(columns=["_wb"]), span_us),
            batch_format="pandas",
        )
    )


def top_orders_per_customer(
    sf_dir: str, k: int = 2, num_buckets: int = 32
) -> rd.Dataset:
    """Per-group top-k ranking (the window-function `row_number() ...
    QUALIFY <= k` shape): each customer's k most expensive orders,
    price ties broken by min o_orderkey — deterministic on both
    engines. Output: o_custkey, o_orderkey, o_totalprice, rank."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_wb"] = (b["o_custkey"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32)
        return b

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        g = g.assign(rank=g.groupby("o_custkey", sort=False).cumcount() + 1)
        g = g[g["rank"] <= k]
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rank"]].astype(
            {"o_custkey": "int64", "o_orderkey": "int64", "rank": "int64"}
        )

    return (
        orders.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(
            lambda g: topk(g.drop(columns=["_wb"])), batch_format="pandas"
        )
    )


def latest_event_per_user(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """CDC-style LATEST-PER-KEY compaction (the upsert/changelog merge
    every incremental pipeline runs before serving a snapshot): keep
    each user's most recent event, ties on ts broken by max event_id —
    deterministic on both engines. One hash-bucket shuffle of the
    pruned columns, then a vectorized stable-sort + drop_duplicates per
    bucket; at 100 TB the map side would pre-compact per batch (keep
    one row per user per batch) before the shuffle — the same shape as
    user_stats_by_type's partial distinct.

    Output: user_id, event_id, event_type, ts.
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # map-side pre-compaction: one candidate row per user per batch
        b = b.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False], kind="mergesort")
        b = b.drop_duplicates("user_id", keep="first").copy()
        b["_cb"] = (b["user_id"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32)
        return b

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False], kind="mergesort")
        g = g.drop_duplicates("user_id", keep="first")
        return g[["user_id", "event_id", "event_type", "ts"]].astype(
            {"user_id": "int64", "event_id": "int64"}
        )

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_cb")
        .map_groups(lambda g: latest(g.drop(columns=["_cb"])),
                    batch_format="pandas")
    )


def user_stats_by_type(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Distinct-count + exact discrete median per event type, built from
    the two patterns a 100 TB groupby needs:

    - **map-side partial distinct**: each batch emits its DISTINCT
      (event_type, user_id) pairs before the shuffle, so the all-to-all
      carries the (small) distinct set, not the stream — the combiner
      form of COUNT(DISTINCT);
    - **exact discrete quantile** (``quantile_disc(0.5)`` semantics:
      element at ceil(q·n)−1 of the ascending sort): values shuffle
      bucketed by type. Exact selection needs the key's values together;
      the documented scale path for very hot keys is a mergeable
      quantile sketch (t-digest) — approximate, so it would drop to a
      rows-only gate; the exact form here is the oracle-checked one.

    Output: event_type, n_users, median_value.
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        users = b[["event_type", "user_id"]].drop_duplicates()
        out = pd.DataFrame({
            "event_type": b["event_type"],
            "user_id": np.int64(-1),
            "value": b["value"],
            "is_user": np.zeros(len(b), dtype=bool),
        })
        du = pd.DataFrame({
            "event_type": users["event_type"],
            "user_id": users["user_id"].astype("int64"),
            "value": 0.0,
            "is_user": np.ones(len(users), dtype=bool),
        })
        return pd.concat([out, du], ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, sub in g.groupby("event_type", sort=True):
            vals = np.sort(sub.loc[~sub["is_user"], "value"].to_numpy())
            idx = int(np.ceil(0.5 * len(vals))) - 1 if len(vals) else 0
            rows.append({
                "event_type": etype,
                "n_users": np.int64(
                    sub.loc[sub["is_user"], "user_id"].nunique()
                ),
                "median_value": float(vals[idx]) if len(vals) else np.nan,
            })
        return pd.DataFrame(rows)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import crc32_bucket

        b = b.copy()
        b["_ab"] = crc32_bucket(
            b["event_type"].to_numpy(), num_buckets
        ).astype("int32")
        return b

    return (
        ev.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_ab")
        .map_groups(
            lambda g: merge(g.drop(columns=["_ab"])), batch_format="pandas"
        )
    )


def approx_quantiles_by_type(
    sf_dir: str, n_bins: int = 4096, qs: tuple = (0.5, 0.9, 0.99)
) -> rd.Dataset:
    """Mergeable-histogram quantile sketch — the documented scale path
    for quantiles over hot keys (see :func:`user_stats_by_type`): two
    narrow passes, both all-to-alls carrying only sketch rows.

    Pass 1 aggregates per-type (min, max, n) from per-batch partials;
    pass 2 builds per-batch fixed-bin histograms over integer
    milli-units and merges them per type; the q-quantile estimate is
    the LOWER EDGE of the first bin whose cumulative count reaches
    ceil(q·n). Everything after the milli-unit floor is integer
    arithmetic, so although the estimate is approximate by design
    (error ≤ one bin width = (hi−lo)/n_bins), it is bit-identical
    across engines and carries a full SQL oracle — an approximate
    operator with an exact correctness gate.

    Output: event_type, q, approx_value_m (int64 milli-units).
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def to_milli(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            # identical IEEE expression to the oracle SQL
            "vm": np.floor(b["value"].to_numpy() * 1000).astype("int64"),
        })

    milli = ev.map_batches(to_milli, batch_format="pandas")

    def bounds_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", sort=False).agg(
            lo=("vm", "min"), hi=("vm", "max"), n=("vm", "size")
        ).reset_index()
        return g

    bounds = (
        milli.map_batches(bounds_partial, batch_format="pandas")
        .to_pandas()  # one row per (type, batch) — sketch-sized
        .groupby("event_type", sort=True)
        .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
        .reset_index()
    )
    bounds["wdt"] = np.maximum(
        (bounds["hi"] - bounds["lo"] + (n_bins - 1)) // n_bins, 1
    ).astype("int64")
    import ray as _ray

    bref = _ray.put({
        r.event_type: (int(r.lo), int(r.wdt)) for r in bounds.itertuples()
    })
    meta = {r.event_type: (int(r.lo), int(r.wdt), int(r.n))
            for r in bounds.itertuples()}

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        bm = _ray.get(bref)
        frames = []
        for etype, sub in b.groupby("event_type", sort=False):
            lo, wdt = bm[etype]
            bins = np.minimum(
                (sub["vm"].to_numpy() - lo) // wdt, n_bins - 1
            )
            uniq, counts = np.unique(bins, return_counts=True)
            frames.append(pd.DataFrame({
                "event_type": etype,
                "bin": uniq.astype("int64"),
                "c": counts.astype("int64"),
            }))
        return pd.concat(frames, ignore_index=True)

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        etype = g["event_type"].iloc[0]
        lo, wdt, n = meta[etype]
        h = g.groupby("bin", sort=True).agg(c=("c", "sum")).reset_index()
        cum = h["c"].cumsum().to_numpy()
        rows = []
        for q in qs:
            need = np.ceil(q * n)
            bin_ = int(h["bin"].to_numpy()[np.searchsorted(cum, need)])
            rows.append({
                "event_type": etype,
                "q": float(q),
                "approx_value_m": np.int64(lo + wdt * bin_),
            })
        return pd.DataFrame(rows)

    return (
        milli.map_batches(hist_partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(quantiles, batch_format="pandas")
    )


def hll_registers(sf_dir: str, b_bits: int = 8) -> rd.Dataset:
    """HyperLogLog REGISTER computation over ``events.user_id`` — the
    mergeable-sketch topology itself, verified EXACTLY: registers are
    pure integer functions of the data (md5 is the engine's
    cross-engine hash tape), so unlike the float estimate they
    hash-compare against a SQL mirror bit-for-bit.

    Register math operates on the md5 HEX STRING on both engines (no
    float log2 anywhere — the engine-wide exact-arithmetic rule):
    bucket = first 2 hex chars (2^8 registers), rho = 1 + leading zero
    BITS of the next 14 hex chars (4 per leading '0' char + the first
    non-zero nibble's own zeros), capped at 57 when all 56 bits are 0.

    Scale shape: each batch collapses to its own (bucket, max rho)
    partial — ≤ 256 rows per batch regardless of batch size — and one
    tiny grouped max finishes the merge; an estimator anywhere
    downstream unions register sets with the same max. Buckets no
    hash lands in are omitted (inner semantics, like the mirror).

    Output: bucket, max_rho.
    """
    import hashlib

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    _NIB_LZ = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        regs: dict[int, int] = {}
        for uid in batch["user_id"].astype("int64"):
            h = hashlib.md5(str(int(uid)).encode()).hexdigest()
            bucket = int(h[:2], 16)
            s = h[2:16]
            z = len(s) - len(s.lstrip("0"))
            if z == len(s):
                rho = 57
            else:
                rho = 4 * z + _NIB_LZ.get(s[z], 0) + 1
            if regs.get(bucket, 0) < rho:
                regs[bucket] = rho
        return pd.DataFrame({
            "bucket": np.fromiter(regs.keys(), dtype="int64",
                                  count=len(regs)),
            "max_rho": np.fromiter(regs.values(), dtype="int64",
                                   count=len(regs)),
            "_hb": np.fromiter((k % 8 for k in regs.keys()),
                               dtype="int64", count=len(regs)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("bucket", sort=False)["max_rho"].max()
        return pd.DataFrame({"bucket": s.index.to_numpy(dtype="int64"),
                             "max_rho": s.to_numpy(dtype="int64")})

    return (ev.map_batches(partial, batch_format="pandas")
            .groupby("_hb")
            .map_groups(lambda g: merge(g.drop(columns=["_hb"])),
                        batch_format="pandas"))


def cohort_retention(sf_dir: str, week_us: int = 7 * 86_400_000_000,
                     num_buckets: int = 32) -> rd.Dataset:
    """Cohort RETENTION matrix — the growth-analytics staple: users
    cohorted by their FIRST active week; for each (cohort_week, k)
    report how many were active again k weeks later. Exact integer
    counts end to end:

    1. map-side partial: per batch, each user's distinct active weeks
       (bounded by weeks-per-batch, not event volume);
    2. ONE user-bucket shuffle; per bucket a vectorized pandas pass
       computes each user's min week and re-emits (cohort, k) partial
       counts — only O(cohorts × horizon) rows leave each bucket;
    3. a tiny grouped sum over cohort buckets finishes the matrix.

    Weeks are integer epoch-microsecond floors (``ts // week_us``) so
    both engines bucket identically. Output: cohort_week, k, n_active
    (k = 0 row counts the cohort size).
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": b["user_id"].astype("int64").to_numpy(),
            "week": (b["ts"].astype("datetime64[us]").astype("int64")
                     // np.int64(week_us)),
        }).drop_duplicates()
        df["_ub"] = df["user_id"].to_numpy() % np.int64(num_buckets)
        return df

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week"])
        first = g.groupby("user_id", sort=False)["week"].transform("min")
        out = pd.DataFrame({
            "cohort_week": first.to_numpy(dtype="int64"),
            "k": (g["week"].to_numpy(dtype="int64")
                  - first.to_numpy(dtype="int64")),
        })
        s = out.groupby(["cohort_week", "k"], sort=False).size()
        res = s.reset_index(name="n")
        res["_cb"] = res["cohort_week"].to_numpy(dtype="int64") % np.int64(8)
        return res

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["cohort_week", "k"], sort=False)["n"].sum()
        res = s.reset_index()
        return pd.DataFrame({
            "cohort_week": res["cohort_week"].to_numpy(dtype="int64"),
            "k": res["k"].to_numpy(dtype="int64"),
            "n_active": res["n"].to_numpy(dtype="int64"),
        })

    return (ev.map_batches(partial, batch_format="pandas")
            .groupby("_ub")
            .map_groups(lambda g: per_user(g.drop(columns=["_ub"])),
                        batch_format="pandas")
            .groupby("_cb")
            .map_groups(lambda g: finish(g.drop(columns=["_cb"])),
                        batch_format="pandas"))


def event_transitions(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Markov TRANSITION COUNTS over per-user ordered event sequences —
    the action-bigram model behind next-event prediction and behavioral
    LM features (and the sequence analogue of ``collocations``). SQL
    mirror: ``lag(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` then GROUP BY.

    Scale shape: one user-bucket shuffle (user-complete buckets); inside
    a bucket ONE lexsort + a vectorized shift finds every adjacent pair
    (no per-user loop), and the bucket emits pre-aggregated
    (src, dst, n) partials — at most n_types² rows per bucket cross the
    second (tiny) exchange, where the per-src group computes the final
    counts and the integer-milli row probability.

    Output: src_type, dst_type, n_transitions, prob_milli.
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "t": b["ts"].astype("datetime64[us]").astype("int64"),
            "user_id": b["user_id"].astype("int64"),
            "event_type": b["event_type"],
            "_wb": (b["user_id"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32),
        })

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        t = g["t"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, t, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame({"src_type": et[:-1][same],
                              "dst_type": et[1:][same]})
        agg = (pairs.value_counts(["src_type", "dst_type"])
               .reset_index(name="n"))
        agg["n"] = agg["n"].astype("int64")
        return agg

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("dst_type", as_index=False, sort=True)["n"].sum()
        n = agg["n"].to_numpy(dtype="int64")
        tot = np.int64(n.sum())
        return pd.DataFrame({
            "src_type": g["src_type"].iloc[:1].repeat(len(agg)).to_numpy(),
            "dst_type": agg["dst_type"].to_numpy(),
            "n_transitions": n,
            "prob_milli": (n * 1000) // tot,
        })

    return (ev.map_batches(prep, batch_format="pandas")
            .groupby("_wb")
            .map_groups(lambda g: count_bucket(g.drop(columns=["_wb"])),
                        batch_format="pandas")
            .groupby("src_type")
            .map_groups(finalize, batch_format="pandas"))


# z-order: 16 bits per dimension interleaved (user bits odd, day bits
# even) — valid while day-since-epoch < 2^16 (year 2149) and user_id
# < 2^16 at the catalog's scale knob; a deployment widens to 32/64.
_Z_BITS = 16


def _zvalue(user: np.ndarray, day: np.ndarray) -> np.ndarray:
    z = np.zeros(len(user), dtype=np.int64)
    for i in range(_Z_BITS):
        z |= ((user >> i) & 1) << (2 * i + 1)
        z |= ((day >> i) & 1) << (2 * i)
    return z


def zorder_cells(sf_dir: str, cell_shift: int = 6) -> rd.Dataset:
    """Z-ORDER (Morton) layout clustering — the multi-dimensional data
    layout step a 100 TB table needs so BOTH ``user_id`` and date
    predicates prune at the read (the write-side dual of parquet
    row-group zone maps; same family as Delta/Iceberg OPTIMIZE ZORDER).
    Instead of a global sort, rows group directly by their z-value
    PREFIX (``z >> cell_shift`` — the quadtree cell that a z-sorted
    layout would pack together), and each cell reports its zone map:
    row count and min/max of both dimensions. Locality is the verified
    property: every cell's user/day ranges come out tight, which is
    exactly what makes the layout prunable.

    Scale shape: z-value is a pure vectorized map; ONE cell-bucket
    shuffle (cells are the partition key a writer would use as the
    output-file key); per-cell stats are numpy min/max. No global sort,
    no driver materialization.

    Output: cell, n_rows, user_min, user_max, day_min, day_max.
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def zmap(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy().astype(np.int64)
        d = (b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
             // np.int64(86_400_000_000))
        return pd.DataFrame({
            "cell": _zvalue(u, d) >> np.int64(cell_shift),
            "user_id": u,
            "day": d,
        })

    def cell_stats(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        return pd.DataFrame({
            "cell": g["cell"].iloc[:1].astype("int64"),
            "n_rows": np.int64(len(g)),
            "user_min": u.min(), "user_max": u.max(),
            "day_min": d.min(), "day_max": d.max(),
        })

    return (ev.map_batches(zmap, batch_format="pandas")
            .groupby("cell")
            .map_groups(cell_stats, batch_format="pandas"))


def zorder_cells_sql(cell_shift: int = 6) -> str:
    """Mirror: the 16-term interleave as explicit bit arithmetic."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(((user_id >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((day >> {i}) & 1) << {2 * i})")
    z = " | ".join(terms)
    return f"""
WITH d AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
  FROM events
)
SELECT ({z}) >> {cell_shift} AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(user_id) AS user_min, MAX(user_id) AS user_max,
       MIN(day) AS day_min, MAX(day) AS day_max
FROM d
GROUP BY 1
"""


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), c AS (
  SELECT prev_type AS src_type, event_type AS dst_type,
         CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT src_type, dst_type, n_transitions,
       CAST((n_transitions * 1000)
            // SUM(n_transitions) OVER (PARTITION BY src_type) AS BIGINT)
         AS prob_milli
FROM c
"""


def attribution_last_touch(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """LAST-TOUCH ATTRIBUTION: each purchase event attributes to the
    same user's most recent strictly-preceding click (composite
    (ts, event_id) order — deterministic under ts ties). The
    self-as-of-join shape every conversion pipeline runs, vectorized
    per user bucket with one lexsort + a segment-reset running maximum
    (no per-user loop).

    SQL mirror: ``last_value(... IGNORE NULLS) OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)`` + QUALIFY. Purchases with no preceding click drop.

    Output: purchase_id, user_id, click_id, gap_us.
    """
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(["click", "purchase"])]
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "t": b["ts"].astype("datetime64[us]").astype("int64"),
            "user_id": b["user_id"].astype("int64"),
            "is_click": (b["event_type"] == "click").to_numpy(),
            "_wb": (b["user_id"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32),
        })

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        t = g["t"].to_numpy()
        eid = g["event_id"].to_numpy()
        click = g["is_click"].to_numpy()
        order = np.lexsort((eid, t, u))
        u, t, eid, click = u[order], t[order], eid[order], click[order]
        idx = np.arange(len(u))
        # running "latest click position", reset at user boundaries
        last_click = np.maximum.accumulate(np.where(click, idx, -1))
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(np.where(new_user, idx, -1))
        ok = (~click) & (last_click >= seg_start)
        j = last_click[ok]
        return pd.DataFrame({
            "purchase_id": eid[ok],
            "user_id": u[ok],
            "click_id": eid[j],
            "gap_us": (t[ok] - t[j]).astype("int64"),
        })

    return (ev.map_batches(prep, batch_format="pandas")
            .groupby("_wb")
            .map_groups(lambda g: attribute(g.drop(columns=["_wb"])),
                        batch_format="pandas"))


ATTRIBUTION_SQL = """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT event_id AS purchase_id, user_id, click_id,
       epoch_us(ts) - epoch_us(click_ts) AS gap_us
FROM s
WHERE event_type = 'purchase' AND click_id IS NOT NULL
"""


def running_customer_revenue(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """RUNNING (cumulative) aggregate — the ``SUM() OVER (PARTITION BY
    key ORDER BY time ROWS UNBOUNDED PRECEDING)`` window shape that
    completes the engine's window family (rolling RANGE, lag, rank,
    last-touch all exist). Per customer, the cumulative order total and
    running order count at each order, integer milli-units.

    One custkey-bucket shuffle; inside a bucket ONE lexsort + a grouped
    cumsum (vectorized; no per-key loop).

    Output: o_custkey, o_orderkey, o_orderdate, cum_spend_m, order_seq.
    """
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "o_custkey": b["o_custkey"].astype("int64"),
            "o_orderdate": b["o_orderdate"].astype("datetime64[us]"),
            "price_m": np.floor(
                b["o_totalprice"].to_numpy() * 1000).astype("int64"),
            "_wb": (b["o_custkey"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32),
        })

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        grp = g.groupby("o_custkey", sort=False)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(),
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "o_orderdate": g["o_orderdate"].to_numpy(),
            "cum_spend_m": grp["price_m"].cumsum().to_numpy(dtype="int64"),
            "order_seq": (grp.cumcount() + 1).to_numpy(dtype="int64"),
        })

    return (orders.map_batches(prep, batch_format="pandas")
            .groupby("_wb")
            .map_groups(lambda g: running(g.drop(columns=["_wb"])),
                        batch_format="pandas"))


RUNNING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(floor(o_totalprice * 1000) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_spend_m,
       CAST(row_number()
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS order_seq
FROM orders
"""


def profile_events(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """DATA PROFILING — the per-column quality audit every ingest runs
    before a table enters the lake: row/null counts, exact distinct
    cardinality, min and max for each profiled column of ``events``
    (the int/string columns whose min/max formatting is
    engine-independent; float/timestamp columns profile through their
    integer encodings — ts as epoch_us, value in milli-units).

    Scale shape: counts/min/max fold to ONE partial row per column per
    batch; exact distincts use the map-side partial-distinct pattern
    (each batch emits its distinct (column, value-key) pairs, one
    value-bucket shuffle counts survivors) — the combiner form of
    COUNT(DISTINCT), column-parallel. Nothing materializes the table.

    Output: column, n_rows, n_null, n_distinct, min_v, max_v
    (values rendered as strings; integers render identically in
    pandas and DuckDB).
    """
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def to_keys(b: pd.DataFrame) -> pd.DataFrame:
        """Encode every profiled column to an orderable nullable-int or
        string key column (column, key). Nullable Int64 (not raw int64)
        so nulls survive the encode — floor(NaN).astype(int64) would be
        undefined garbage and n_null/min/max would lie on real data."""
        out = {}
        out["event_id"] = b["event_id"].astype("Int64")
        out["user_id"] = b["user_id"].astype("Int64")
        out["event_type"] = b["event_type"]
        ts = b["ts"].astype("datetime64[us]")
        out["ts_us"] = pd.Series(
            ts.to_numpy().astype("int64"), index=b.index
        ).astype("Int64").mask(ts.isna())
        out["value_m"] = pd.Series(
            np.floor(b["value"].to_numpy() * 1000), index=b.index
        ).astype("Int64")
        return pd.DataFrame(out)

    def stat_partials(b: pd.DataFrame) -> pd.DataFrame:
        k = to_keys(b)
        rows = []
        for c in k.columns:
            s = k[c]
            nn = s.dropna()
            rows.append({
                "column": c,
                "n_rows": np.int64(len(s)),
                "n_null": np.int64(s.isna().sum()),
                "min_v": str(nn.min()) if len(nn) else None,
                "max_v": str(nn.max()) if len(nn) else None,
            })
        return pd.DataFrame(rows)

    def stat_merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g["column"].iloc[0]
        gv = g.dropna(subset=["min_v"])  # all-null partials carry None
        if c in ("event_type",):
            mn = gv["min_v"].min() if len(gv) else None
            mx = gv["max_v"].max() if len(gv) else None
        elif len(gv) == 0:
            mn = mx = None
        else:
            mn = str(gv["min_v"].astype("int64").min())
            mx = str(gv["max_v"].astype("int64").max())
        return pd.DataFrame({
            "column": [c],
            "n_rows": [np.int64(g["n_rows"].sum())],
            "n_null": [np.int64(g["n_null"].sum())],
            "min_v": [mn],
            "max_v": [mx],
        })

    stats = (ev.map_batches(stat_partials, batch_format="pandas")
             .groupby("column")
             .map_groups(stat_merge, batch_format="pandas"))

    def distinct_partials(b: pd.DataFrame) -> pd.DataFrame:
        k = to_keys(b)
        frames = []
        for c in k.columns:
            # dropna first: COUNT(DISTINCT) ignores nulls, and astype(str)
            # would otherwise mint a fake "<NA>" distinct value
            v = k[c].dropna().astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"column": c, "v": v}))
        out = pd.concat(frames, ignore_index=True)
        # arbitrary-string bucketing keeps the crc32 C-call loop
        # (BENCH.md finding 8)
        import zlib as _z
        out["_vb"] = np.array(
            [_z.crc32(f"{c}|{v}".encode()) % num_buckets
             for c, v in zip(out["column"], out["v"])], dtype=np.int32)
        return out

    def distinct_count(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop_duplicates(["column", "v"]).groupby(
            "column", sort=False).size().reset_index(name="nd")
        return pd.DataFrame({"column": s["column"],
                             "nd": s["nd"].astype("int64")})

    nd = (ev.map_batches(distinct_partials, batch_format="pandas")
          .groupby("_vb")
          .map_groups(lambda g: distinct_count(g.drop(columns=["_vb"])),
                      batch_format="pandas")
          .groupby("column")
          .map_groups(lambda g: pd.DataFrame({
              "column": g["column"].iloc[:1],
              "n_distinct": [np.int64(g["nd"].sum())]}),
              batch_format="pandas"))

    stats_df = stats.to_pandas()
    nd_df = nd.to_pandas()
    out = stats_df.merge(nd_df, on="column")
    return rd.from_pandas(out[["column", "n_rows", "n_null", "n_distinct",
                               "min_v", "max_v"]])


PROFILE_EVENTS_SQL = """
WITH k AS (
  SELECT event_id,
         user_id,
         event_type,
         epoch_us(ts) AS ts_us,
         CAST(floor(value * 1000) AS BIGINT) AS value_m
  FROM events
)
SELECT 'event_id' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(MIN(event_id) AS VARCHAR) AS min_v,
       CAST(MAX(event_id) AS VARCHAR) AS max_v FROM k
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
       COUNT(DISTINCT user_id),
       CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM k
UNION ALL
SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
       COUNT(DISTINCT event_type), MIN(event_type), MAX(event_type) FROM k
UNION ALL
SELECT 'ts_us', COUNT(*), COUNT(*) - COUNT(ts_us),
       COUNT(DISTINCT ts_us),
       CAST(MIN(ts_us) AS VARCHAR), CAST(MAX(ts_us) AS VARCHAR) FROM k
UNION ALL
SELECT 'value_m', COUNT(*), COUNT(*) - COUNT(value_m),
       COUNT(DISTINCT value_m),
       CAST(MIN(value_m) AS VARCHAR), CAST(MAX(value_m) AS VARCHAR) FROM k
"""


def incremental_user_counts(sf_dir: str, cutoff: str = "2024-01-15",
                            num_buckets: int = 32) -> rd.Dataset:
    """INCREMENTAL VIEW MAINTENANCE: the per-user (count, value-sum)
    view is computed as BASE partials (ts < cutoff) merged with DELTA
    partials (ts ≥ cutoff) — two independent predicate-pushed scans
    whose mergeable partial rows union into one final key-bucket
    reduce, never rescanning each other. The oracle is the full-table
    groupby, so the hash gate certifies the IVM identity
    ``view(base ⊎ delta) = merge(view(base), view(delta))`` — the
    property that lets a 100 TB nightly view absorb an hourly delta by
    reading only the delta (both reads here push the ts predicate into
    the parquet row-group zone maps).

    Output: user_id, n_events, value_m_total.
    """
    import pyarrow.compute as pc

    cut = pd.Timestamp(cutoff)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # nullable Int64 so a null value contributes to n (COUNT(*))
        # but not to v (SUM skips nulls) — floor(NaN).astype(int64)
        # would silently poison both
        vm = pd.Series(np.floor(b["value"].to_numpy() * 1000),
                       index=b.index).astype("Int64")
        d = pd.DataFrame({"user_id": b["user_id"].astype("int64"),
                          "vm": vm})
        s = d.groupby("user_id", sort=False).agg(
            n=("vm", "size"), v=("vm", "sum")).reset_index()
        s["v"] = s["v"].astype("int64")
        s["_ub"] = (s["user_id"].to_numpy(dtype="int64") % num_buckets
                    ).astype(np.int32)
        return s

    def scan(expr) -> rd.Dataset:
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"],
            filter=expr,
        ).map_batches(partial, batch_format="pandas")

    base = scan(pc.field("ts") < cut)
    delta = scan(pc.field("ts") >= cut)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", sort=False).agg(
            n_events=("n", "sum"), value_m_total=("v", "sum")).reset_index()
        return s.astype({"user_id": "int64", "n_events": "int64",
                         "value_m_total": "int64"})

    return (base.union(delta)
            .groupby("_ub")
            .map_groups(lambda g: merge(g.drop(columns=["_ub"])),
                        batch_format="pandas"))


INCREMENTAL_COUNTS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
         AS value_m_total
FROM events GROUP BY 1
"""


def _local_skyline(p: np.ndarray, d: np.ndarray,
                   keys: np.ndarray) -> np.ndarray:
    """Indices of the (price, date)-minimizing Pareto front. Dominance:
    p2<=p1 ∧ d2<=d1 ∧ strict somewhere; identical points co-survive.
    Vectorized: sort by (p, d), survivor ⇔ d equals its p-group min AND
    d < the running date-min over strictly-smaller p."""
    order = np.lexsort((keys, d, p))
    ps, ds = p[order], d[order]
    new_p = np.ones(len(ps), dtype=bool)
    new_p[1:] = ps[1:] != ps[:-1]
    # group-min date = d of the first row of each p-group (d-sorted)
    grp_first = np.maximum.accumulate(np.where(new_p, np.arange(len(ps)), -1))
    grp_min_d = ds[grp_first]
    # running min of d over all STRICTLY smaller p: the prefix min up to
    # the previous group's end
    prev_min = np.full(len(ps), np.iinfo(np.int64).max, dtype=np.int64)
    if len(ps) > 1:
        prefix = np.minimum.accumulate(ds)
        starts = np.flatnonzero(new_p)
        prev_end = np.repeat(starts - 1, np.diff(np.append(starts, len(ps))))
        valid = prev_end >= 0
        prev_min[valid] = prefix[prev_end[valid]]
    survive = (ds == grp_min_d) & (ds < prev_min)
    return order[survive]


def skyline_orders(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """SKYLINE / Pareto-front query: orders not dominated on
    (o_totalprice, o_orderdate) — no other order is both cheaper-or-
    equal AND earlier-or-equal with one strict. The classic
    multi-criteria op, distributed via the skyline-of-skylines
    identity: each batch emits its LOCAL front (a pure map — dominated
    rows never leave the scan), a RANGE-bucketed intermediate fold
    prunes cross-batch dominated survivors distributed, and only the
    unioned bucket-fronts reach the driver finish.

    The intermediate fold buckets by PRICE RANGE, not hash: within a
    price-contiguous bucket every cross-batch dominance pair is
    co-located, so the bucket front equals the true front restricted
    to that price slice up to points dominated from cheaper buckets —
    which the driver finish removes over front-sized data only. On
    correlated data this collapses the per-batch survivor union to
    ~the true front before anything leaves the cluster; on
    anti-correlated data the front itself is the result, so the driver
    holds exactly the output (no avoidable materialization either way).

    Output: o_orderkey, price_m, o_orderdate.
    """
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def local(b: pd.DataFrame) -> pd.DataFrame:
        p = np.floor(b["o_totalprice"].to_numpy() * 1000).astype("int64")
        d = b["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        k = b["o_orderkey"].to_numpy().astype("int64")
        idx = _local_skyline(p, d, k)
        out = pd.DataFrame({"o_orderkey": k[idx], "price_m": p[idx],
                            "d": d[idx]})
        # price-range bucket (fixed-width over the synthetic price
        # domain; any monotone-in-p bucketing keeps the identity valid
        # because the driver finish re-fronts across buckets)
        out["_fb"] = np.clip(out["price_m"].to_numpy() // (600_000_000
                             // num_buckets), 0, num_buckets - 1
                             ).astype(np.int32)
        return out

    def bucket_front(g: pd.DataFrame) -> pd.DataFrame:
        idx = _local_skyline(g["price_m"].to_numpy(), g["d"].to_numpy(),
                             g["o_orderkey"].to_numpy())
        return g.iloc[idx]

    survivors = (orders.map_batches(local, batch_format="pandas")
                 .groupby("_fb")
                 .map_groups(lambda g: bucket_front(
                     g.drop(columns=["_fb"])), batch_format="pandas")
                 .to_pandas())
    idx = _local_skyline(survivors["price_m"].to_numpy(),
                         survivors["d"].to_numpy(),
                         survivors["o_orderkey"].to_numpy())
    out = survivors.iloc[idx].copy()
    return (pd.DataFrame({
        "o_orderkey": out["o_orderkey"].to_numpy(dtype="int64"),
        "price_m": out["price_m"].to_numpy(dtype="int64"),
        "o_orderdate": pd.Series(out["d"].to_numpy()
                                 ).astype("datetime64[us]"),
    }).sort_values("o_orderkey").reset_index(drop=True))


SKYLINE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderdate,
         CAST(floor(o_totalprice * 1000) AS BIGINT) AS price_m
  FROM orders
)
SELECT o_orderkey, price_m, o_orderdate
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.price_m <= a.price_m AND b.o_orderdate <= a.o_orderdate
    AND (b.price_m < a.price_m OR b.o_orderdate < a.o_orderdate)
)
"""


def robust_value_stats(sf_dir: str) -> pd.DataFrame:
    """Robust per-type location/scale — exact MEDIAN and MAD (median
    absolute deviation) of the event value per event_type, the
    outlier-resistant profiling pair (anomaly thresholds are usually
    ``|x - median| > k·MAD``). A DEPENDENT two-pass aggregate: pass 2's
    statistic is defined in terms of pass 1's result, so it can't fold
    into one shuffle — the shape quality_filter's single global
    quantile doesn't cover.

    Both passes are the bounded-integer-domain histogram pattern:
    milli-unit values live in the VALUE domain (≤ ~500k distinct),
    so per-batch value-count partials reduce through one bucketed
    groupby and the driver sees histograms bounded by the domain —
    never by corpus size; the 5-entry median lut ships to pass 2
    inside the task closure. k-th smallest with k = (n+1)//2 (lower
    median), row_number-identical in the SQL mirror.

    Output: event_type, n, median_milli, mad_milli.
    """
    import ray.data as rd

    def _hist_reduce(ds: "rd.Dataset", col: str) -> pd.DataFrame:
        def reduce_hist(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(["event_type", col], sort=False)["c"].sum()
            out = s.reset_index()
            out["c"] = out["c"].astype("int64")
            return out

        return (ds.groupby("_hb")
                .map_groups(lambda g: reduce_hist(g.drop(columns=["_hb"])),
                            batch_format="pandas")
                .to_pandas())

    def _kth(h: pd.DataFrame, col: str) -> dict:
        """Per-type lower median from a (event_type, value, c) frame."""
        out = {}
        for t, g in h.groupby("event_type", sort=False):
            g = g.sort_values(col)
            n = int(g["c"].sum())
            k = (n + 1) // 2
            out[t] = (int(g.loc[g["c"].cumsum() >= k, col].iloc[0]), n)
        return out

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "value"])

    def hist_vm(b: pd.DataFrame) -> pd.DataFrame:
        vm = np.floor(b["value"].to_numpy() * 1000).astype("int64")
        s = (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                           "vm": vm})
             .groupby(["event_type", "vm"], sort=False).size())
        out = s.reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        out["_hb"] = out["vm"].to_numpy() // np.int64(8192)
        return out

    med = _kth(_hist_reduce(
        events.map_batches(hist_vm, batch_format="pandas"), "vm"), "vm")

    def hist_dev(b: pd.DataFrame) -> pd.DataFrame:
        vm = np.floor(b["value"].to_numpy() * 1000).astype("int64")
        t = b["event_type"].to_numpy()
        m = pd.Series(t).map({k: v[0] for k, v in med.items()}
                             ).to_numpy(dtype="int64")
        s = (pd.DataFrame({"event_type": t, "d": np.abs(vm - m)})
             .groupby(["event_type", "d"], sort=False).size())
        out = s.reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        out["_hb"] = out["d"].to_numpy() // np.int64(8192)
        return out

    mad = _kth(_hist_reduce(
        events.map_batches(hist_dev, batch_format="pandas"), "d"), "d")

    types = sorted(med)
    return pd.DataFrame({
        "event_type": types,
        "n": np.array([med[t][1] for t in types], dtype="int64"),
        "median_milli": np.array([med[t][0] for t in types], dtype="int64"),
        "mad_milli": np.array([mad[t][0] for t in types], dtype="int64"),
    })
