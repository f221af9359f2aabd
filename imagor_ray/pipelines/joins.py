"""Temporal joins Ray Data lacks natively — implemented as the SURVEY
§2 "custom operators" recipe (a): composition of ``map_batches`` +
one bucketed ``groupby().map_groups`` with a fully vectorized merge
inside each group.

``asof_join_events_orders`` — each event joined to the LATEST order of
the same customer at or before the event's timestamp (ties on
order-date broken by max o_orderkey, so the result is a pure function
of the data — DuckDB's bare ``ASOF JOIN`` leaves date-ties
implementation-defined, so the oracle mirrors the deterministic form
with an explicit window).

Partitioning assumption (documented per SURVEY §2): both sides are
hash-bucketed on the join key, so every (customer → its orders, its
events) pair is bucket-complete; the single all-to-all carries only the
pruned join columns of both sides. Inside a bucket the merge is
numpy-vectorized: sort orders by (key, time, tie), build dense
(key-rank, time-rank) composites, one ``searchsorted`` positions every
event against its customer's order timeline — no per-key loop (the
engine-wide bucketed-merge rule, BENCH.md finding 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["asof_join_events_orders", "error_context_window",
           "anti_join_events_urgent", "range_join_repeat_orders",
           "bloom_semi_join_events"]


def _asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
    ev = g[g["side"] == 0]
    od = g[g["side"] == 1]
    out_cols = {
        "event_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "user_id": pd.Series([], dtype="int64"),
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_totalprice": pd.Series([], dtype="float64"),
    }
    if not len(ev) or not len(od):
        return pd.DataFrame(out_cols)
    # sentinel-padded union (no nulls → no int→float64 dtype
    # degradation on arrow→pandas); sentinels never surface: each
    # side's real columns are read only from that side's rows
    ek = ev["key"].to_numpy().astype(np.int64)
    et = ev["time"].to_numpy().astype(np.int64)
    eid = ev["event_id"].to_numpy().astype(np.int64)
    ok = od["key"].to_numpy().astype(np.int64)
    ot = od["time"].to_numpy().astype(np.int64)
    okey = od["o_orderkey"].to_numpy().astype(np.int64)
    oval = od["o_totalprice"].to_numpy().astype(np.float64)

    # orders sorted by (key, time, o_orderkey): searchsorted-right then
    # -1 lands on the max (time, o_orderkey) at or before each event —
    # the deterministic tie-break
    o_order = np.lexsort((okey, ot, ok))
    ok, ot, okey, oval = ok[o_order], ot[o_order], okey[o_order], oval[o_order]

    # dense (key-rank, time-rank) composite keeps everything in int64:
    # rank products are bounded by bucket_rows², never raw µs × keys
    uniq_t = np.unique(np.concatenate([ot, et]))
    uniq_k = np.unique(np.concatenate([ok, ek]))
    m = np.int64(len(uniq_t) + 1)
    comp_o = np.searchsorted(uniq_k, ok).astype(np.int64) * m + np.searchsorted(uniq_t, ot)
    rk_e = np.searchsorted(uniq_k, ek).astype(np.int64)
    comp_e = rk_e * m + np.searchsorted(uniq_t, et)

    pos = np.searchsorted(comp_o, comp_e, side="right") - 1
    safe = np.clip(pos, 0, None)
    valid = (pos >= 0) & (comp_o[safe] // m == rk_e)  # same customer
    if not valid.any():
        return pd.DataFrame(out_cols)
    sel, p = np.where(valid)[0], safe[valid]
    return pd.DataFrame({
        "event_id": eid[sel],
        "ts": pd.Series(et[sel]).astype("datetime64[us]"),
        "user_id": ek[sel],
        "o_orderkey": okey[p],
        "o_orderdate": pd.Series(ot[p]).astype("datetime64[us]"),
        "o_totalprice": oval[p],
    })


def asof_join_events_orders(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Output: event_id, ts, user_id, o_orderkey, o_orderdate,
    o_totalprice — inner as-of semantics (events with no order at or
    before their ts are dropped, matching the SQL mirror)."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def tag_events(b: pd.DataFrame) -> pd.DataFrame:
        key = b["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": key,
            "time": b["ts"].astype("datetime64[us]").astype("int64"),
            "side": np.zeros(len(b), dtype=np.int8),
            "event_id": b["event_id"].astype("int64"),
            "o_orderkey": np.full(len(b), -1, dtype=np.int64),
            "o_totalprice": np.zeros(len(b), dtype=np.float64),
            "_jb": (key % num_buckets).astype(np.int32),
        })

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        key = b["o_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": key,
            "time": b["o_orderdate"].astype("datetime64[us]").astype("int64"),
            "side": np.ones(len(b), dtype=np.int8),
            "event_id": np.full(len(b), -1, dtype=np.int64),
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "o_totalprice": b["o_totalprice"].astype("float64"),
            "_jb": (key % num_buckets).astype(np.int32),
        })

    tagged = events.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )
    return (
        tagged.groupby("_jb")
        .map_groups(
            lambda g: _asof_bucket(g.drop(columns=["_jb"])),
            batch_format="pandas",
        )
    )


def _context_bucket(
    g: pd.DataFrame, window_us: int, max_context: int = 256
) -> pd.DataFrame:
    """Per-bucket interval join: for each anchor row, every same-user
    context row with ts in [anchor.ts − window, anchor.ts], excluding
    the anchor itself. Fully vectorized: one composite searchsorted per
    bound, pair expansion via the repeat/offset trick — output size is
    the true pair count, never an n² intermediate.

    ``max_context`` caps each anchor at its K most-recent context rows
    (ties broken by max event_id — the same ordering the SQL mirror's
    QUALIFY window uses, so capped output still hash-matches): without
    it a degenerate hot key (a bot user with dense events) makes the
    pair set quadratic in its window density — the cap is the
    documented scale trade, far above any organic window."""
    anchors = g[g["is_anchor"]]
    ctx = g  # every event is candidate context (incl. other anchors)
    empty = pd.DataFrame({
        "anchor_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "anchor_ts": pd.Series([], dtype="datetime64[us]"),
        "ctx_event_id": pd.Series([], dtype="int64"),
        "ctx_ts": pd.Series([], dtype="datetime64[us]"),
        "ctx_type": pd.Series([], dtype=object),
    })
    if not len(anchors) or not len(ctx):
        return empty
    au = anchors["user_id"].to_numpy().astype(np.int64)
    at = anchors["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    aid = anchors["event_id"].to_numpy().astype(np.int64)
    cu = ctx["user_id"].to_numpy().astype(np.int64)
    ct = ctx["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    cid = ctx["event_id"].to_numpy().astype(np.int64)
    ctype = ctx["event_type"].to_numpy()

    # sort context by (user, ts, event_id): slice tails are then exactly
    # the "most recent, max event_id on ties" rows the cap keeps — the
    # ordering the SQL mirror's QUALIFY window ranks by
    order = np.lexsort((cid, ct, cu))
    cu, ct, cid, ctype = cu[order], ct[order], cid[order], ctype[order]

    uniq_t = np.unique(np.concatenate([ct, at, at - window_us]))
    uniq_u = np.unique(np.concatenate([cu, au]))
    m = np.int64(len(uniq_t) + 1)
    comp_c = np.searchsorted(uniq_u, cu).astype(np.int64) * m + np.searchsorted(uniq_t, ct)
    ra = np.searchsorted(uniq_u, au).astype(np.int64)
    lo = np.searchsorted(comp_c, ra * m + np.searchsorted(uniq_t, at - window_us))
    hi = np.searchsorted(comp_c, ra * m + np.searchsorted(uniq_t, at), side="right")

    # take at most max_context + 1 of each window's TAIL (the +1 absorbs
    # the anchor's own row before it is filtered out below)
    counts = np.minimum(hi - lo, max_context + 1)
    start = hi - counts
    total = int(counts.sum())
    if total == 0:
        return empty
    a_rep = np.repeat(np.arange(len(aid)), counts)
    offsets = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    c_idx = np.repeat(start, counts) + offsets
    keep = cid[c_idx] != aid[a_rep]  # drop anchor-to-itself
    a_rep, c_idx = a_rep[keep], c_idx[keep]
    if len(a_rep):
        # anchors still holding max_context + 1 rows (their own row was
        # below the tail) drop their OLDEST surviving row; rows are in
        # ascending slice order per anchor, so rank-from-end is a
        # vectorized size - cumcount
        s = pd.Series(a_rep)
        rank_from_end = s.groupby(s).transform("size").to_numpy() - 1 \
            - s.groupby(s).cumcount().to_numpy()
        within = rank_from_end < max_context
        a_rep, c_idx = a_rep[within], c_idx[within]
    return pd.DataFrame({
        "anchor_id": aid[a_rep],
        "user_id": au[a_rep],
        "anchor_ts": pd.Series(at[a_rep]).astype("datetime64[us]"),
        "ctx_event_id": cid[c_idx],
        "ctx_ts": pd.Series(ct[c_idx]).astype("datetime64[us]"),
        "ctx_type": ctype[c_idx],
    })


def error_context_window(
    sf_dir: str, window_s: int = 3600, num_buckets: int = 32,
    max_context: int = 256,
) -> rd.Dataset:
    """Interval (range) join — context extraction around anchor events,
    the shape a training pipeline uses to pull the surrounding activity
    of every interesting row: for each 'error' event, all events of the
    same user in the preceding ``window_s`` seconds (inclusive bounds,
    anchor excluded). Same bucketed one-shuffle design as the as-of
    join; output is exactly the pair set, produced without any n²
    intermediate. SQL mirror is the plain inequality join."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    window_us = window_s * 1_000_000

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "ts": b["ts"].astype("datetime64[us]"),
            "user_id": b["user_id"].astype("int64"),
            "event_type": b["event_type"],
            "is_anchor": (b["event_type"] == "error").to_numpy(),
            "_jb": (b["user_id"].to_numpy().astype(np.int64) % num_buckets
                    ).astype(np.int32),
        })

    return (
        ev.map_batches(prep, batch_format="pandas")
        .groupby("_jb")
        .map_groups(
            lambda g: _context_bucket(g.drop(columns=["_jb"]), window_us,
                                      max_context),
            batch_format="pandas",
        )
    )


def _anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
    ev = g[g["side"] == 0]
    build = g.loc[g["side"] == 1, "key"]
    out = ev.loc[~ev["key"].isin(build),
                 ["event_id", "key", "event_type"]]
    return pd.DataFrame({
        "event_id": out["event_id"].to_numpy(dtype="int64"),
        "user_id": out["key"].to_numpy(dtype="int64"),
        "event_type": out["event_type"].to_numpy(),
    })


def anti_join_events_urgent(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Distributed hash ANTI-JOIN (the relational sibling of the sink's
    manifest anti-join): events from users who never placed an URGENT
    order — the churn-risk / negative-cohort selection shape. Same
    single-shuffle topology as :func:`asof_join_events_orders`, with
    the anti-join's one extra scale move: the BUILD side collapses to
    DISTINCT keys per batch BEFORE the shuffle (a membership probe
    needs each key once, so what crosses the wire is bounded by
    per-batch key cardinality, not order volume). Inside a bucket the
    probe is one vectorized ``isin``.

    Output: event_id, user_id, event_type.
    """
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    )

    def tag_events(b: pd.DataFrame) -> pd.DataFrame:
        key = b["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": key,
            "side": np.zeros(len(b), dtype=np.int8),
            "event_id": b["event_id"].astype("int64"),
            "event_type": b["event_type"].to_numpy(),
            "_jb": (key % num_buckets).astype(np.int32),
        })

    def tag_build(b: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(
            b.loc[b["o_orderpriority"] == "1-URGENT", "o_custkey"]
            .to_numpy().astype(np.int64))
        return pd.DataFrame({
            "key": key,
            "side": np.ones(len(key), dtype=np.int8),
            "event_id": np.full(len(key), -1, dtype=np.int64),
            "event_type": np.full(len(key), "", dtype=object),
            "_jb": (key % num_buckets).astype(np.int32),
        })

    tagged = events.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_build, batch_format="pandas")
    )
    return (
        tagged.groupby("_jb")
        .map_groups(lambda g: _anti_bucket(g.drop(columns=["_jb"])),
                    batch_format="pandas")
    )


_90D_US = 90 * 24 * 3600 * 1_000_000


def _range_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-(customer, grain)-bucket interval probe: for every interval
    replica, count/sum the bucket's point rows of the same customer
    inside [lo, hi) with two ``searchsorted`` probes against the points
    sorted by (key-rank, time-rank) plus one prefix-sum — O((n+m)·log)
    and NO merge blowup when a hot customer has many overlapping
    windows (the per-key point×interval cross product is never
    materialized)."""
    ev = g[g["side"] == 0]
    iv = g[g["side"] == 1]
    empty = pd.DataFrame({
        "order_key": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "v": pd.Series([], dtype="int64"),
    })
    if not len(ev) or not len(iv):
        return empty
    ek = ev["key"].to_numpy().astype(np.int64)
    et = ev["time"].to_numpy().astype(np.int64)
    evm = ev["vm"].to_numpy().astype(np.int64)
    ik = iv["key"].to_numpy().astype(np.int64)
    lo = iv["time"].to_numpy().astype(np.int64)
    hi = iv["hi"].to_numpy().astype(np.int64)
    okey = iv["order_key"].to_numpy().astype(np.int64)

    # dense (key-rank, time-rank) composite — same int64-bounding move
    # as _asof_bucket (rank products bounded by bucket_rows², never
    # raw µs × keys)
    uniq_k = np.unique(np.concatenate([ek, ik]))
    uniq_t = np.unique(et)
    m = np.int64(len(uniq_t) + 1)
    comp_e = (np.searchsorted(uniq_k, ek).astype(np.int64) * m
              + np.searchsorted(uniq_t, et))
    order = np.argsort(comp_e, kind="stable")
    comp_e = comp_e[order]
    csum = np.concatenate([[0], np.cumsum(evm[order])])

    rk_i = np.searchsorted(uniq_k, ik).astype(np.int64)
    p_lo = np.searchsorted(comp_e, rk_i * m + np.searchsorted(uniq_t, lo))
    p_hi = np.searchsorted(comp_e, rk_i * m + np.searchsorted(uniq_t, hi))
    n = (p_hi - p_lo).astype(np.int64)
    keep = n > 0
    if not keep.any():
        return empty
    return pd.DataFrame({
        "order_key": okey[keep],
        "n": n[keep],
        "v": (csum[p_hi] - csum[p_lo])[keep].astype(np.int64),
    })


def range_join_repeat_orders(sf_dir: str, num_buckets: int = 32,
                             window_us: int = _90D_US) -> rd.Dataset:
    """Distributed RANGE (interval) self-join — the SURVEY §2
    custom-operator family's non-equi member: every order opens a
    90-day follow-up window (o_orderdate, o_orderdate + 90d) and
    matches the SAME customer's strictly-later orders inside it (the
    repeat-purchase shape); output is the per-anchor match aggregate
    (order_key, n_follow, follow_value_milli — integer milli-units so
    the DuckDB mirror is bitwise). Timestamps are integer µs, so the
    strict lower bound is the inclusive probe at start+1 — no
    exclusivity flags anywhere downstream.

    Partitioning (the documented scale assumption): BOTH sides hash on
    (customer, time-grain) where the grain equals the window length,
    so a window overlaps at most TWO grains — each interval row is
    replicated to its ≤2 covering grains with its bounds CLAMPED to
    that grain (replicas can never double-count), while every point
    row routes to exactly one cell. Unlike the as-of join's user-only
    bucketing, a hot customer's history is spread across time cells,
    so no single reducer ever holds a whole key at 100-TB scale.
    Matches per replica are partial (order_key, n, v) rows — ≤2 tiny
    rows per anchor — folded by a second, trivially small order-bucket
    shuffle.
    """
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    nb = np.int64(num_buckets)
    w = np.int64(window_us)

    def cell(key: np.ndarray, grain: np.ndarray) -> np.ndarray:
        # deterministic (customer, grain) cell hash; int64 wraparound
        # is fine (both sides compute it with the same numpy arithmetic)
        comp = key * np.int64(1_000_003) + grain
        return ((comp % nb + nb) % nb).astype(np.int32)

    def tag_points(b: pd.DataFrame) -> pd.DataFrame:
        key = b["o_custkey"].to_numpy().astype(np.int64)
        t = (b["o_orderdate"].astype("datetime64[us]")
             .astype("int64").to_numpy())
        return pd.DataFrame({
            "key": key, "time": t,
            "side": np.zeros(len(b), dtype=np.int8),
            "hi": np.zeros(len(b), dtype=np.int64),
            "order_key": np.full(len(b), -1, dtype=np.int64),
            "vm": np.floor(
                b["o_totalprice"].to_numpy() * 1000).astype("int64"),
            "_jb": cell(key, t // w),
        })

    def tag_anchors(b: pd.DataFrame) -> pd.DataFrame:
        key = b["o_custkey"].to_numpy().astype(np.int64)
        t = (b["o_orderdate"].astype("datetime64[us]")
             .astype("int64").to_numpy())
        s = t + 1          # strict ">" as an inclusive integer-µs bound
        e = t + w
        okey = b["o_orderkey"].to_numpy().astype(np.int64)
        parts = []
        g0 = s // w
        g1 = (e - 1) // w
        for g in (g0, g1):
            sel = np.ones(len(b), dtype=bool) if g is g0 else (g1 != g0)
            gg = g[sel]
            parts.append(pd.DataFrame({
                "key": key[sel],
                # clamp the replica's bounds into its grain so the ≤2
                # replicas of one interval partition its time span
                "time": np.maximum(s[sel], gg * w),
                "side": np.ones(int(sel.sum()), dtype=np.int8),
                "hi": np.minimum(e[sel], (gg + 1) * w),
                "order_key": okey[sel],
                "vm": np.zeros(int(sel.sum()), dtype=np.int64),
                "_jb": cell(key[sel], gg),
            }))
        return pd.concat(parts, ignore_index=True)

    tagged = orders.map_batches(tag_points, batch_format="pandas").union(
        orders.map_batches(tag_anchors, batch_format="pandas")
    )
    partial = (
        tagged.groupby("_jb")
        .map_groups(lambda g: _range_bucket(g.drop(columns=["_jb"])),
                    batch_format="pandas")
    )

    def tag_fold(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_ob"] = (b["order_key"].to_numpy() % num_buckets).astype(np.int32)
        return b

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("order_key", sort=False)[["n", "v"]].sum()
        return pd.DataFrame({
            "order_key": s.index.to_numpy(dtype="int64"),
            "n_follow": s["n"].to_numpy(dtype="int64"),
            "follow_value_milli": s["v"].to_numpy(dtype="int64"),
        })

    return (
        partial.map_batches(tag_fold, batch_format="pandas")
        .groupby("_ob")
        .map_groups(lambda g: fold(g.drop(columns=["_ob"])),
                    batch_format="pandas")
    )


_BLOOM_BITS = 1 << 17            # 16 KiB bitmap
_BLOOM_WORDS = _BLOOM_BITS >> 6


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent bit positions per key (splitmix64-style mixes of
    the raw int64 key) — k=2 Bloom hashing, identical on build and
    probe by construction."""
    x = keys.astype(np.uint64)
    a = x * np.uint64(0xBF58476D1CE4E5B9)
    a ^= a >> np.uint64(31)
    b = (x ^ np.uint64(0x94D049BB133111EB)) * np.uint64(0xD6E8FEB86659FD93)
    b ^= b >> np.uint64(29)
    m = np.uint64(_BLOOM_BITS - 1)
    return (a & m).astype(np.int64), (b & m).astype(np.int64)


def bloom_semi_join_events(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Sketch-PUSHDOWN exact semi-join (the Bloom-filter join pruning
    Spark/Presto apply to selective build sides): events of customers
    who placed an URGENT order, where the shuffle only ever carries
    Bloom-filter SURVIVORS. Three stages:

    1. build: per-batch partial 2¹⁷-bit Bloom bitmaps of the urgent
       custkeys (k=2 vectorized bit sets), OR-merged through one
       constant-key reduce of ≤ #blocks 16 KiB rows — the mergeable-
       bitmap shape (HLL's registers, heavy-hitters' sketch, now the
       join side);
    2. probe: the broadcast bitmap filters events map-side — only
       candidates (true members + the sketch's false positives) enter
       the exchange;
    3. verify: the candidate-only user-bucket co-group against the
       DISTINCT urgent keys makes the result EXACT — false positives
       die here, so the op is SQL-mirrorable despite the sketch (the
       heavy-hitters superset-then-recount discipline).

    Output: event_id, user_id, event_type — identical to the plain
    semi-join; what the sketch buys at scale is the probe-side shuffle
    volume (candidates ≈ true matches + n·2⁻¹⁰ false positives).
    """
    import ray

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    )
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def partial_bloom(b: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(
            b.loc[b["o_orderpriority"] == "1-URGENT", "o_custkey"]
            .to_numpy().astype(np.int64))
        words = np.zeros(_BLOOM_WORDS, dtype=np.uint64)
        if len(keys):
            p1, p2 = _bloom_positions(keys)
            for p in (p1, p2):
                np.bitwise_or.at(words, p >> 6,
                                 np.uint64(1) << (p.astype(np.uint64)
                                                  & np.uint64(63)))
        return pd.DataFrame({"bloom": [words.tobytes()], "_k": [0]})

    def merge_bloom(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(_BLOOM_WORDS, dtype=np.uint64)
        for raw in g["bloom"]:
            acc |= np.frombuffer(raw, dtype=np.uint64)
        return pd.DataFrame({"bloom": [acc.tobytes()]})

    merged = (orders.map_batches(partial_bloom, batch_format="pandas")
              .groupby("_k")
              .map_groups(lambda g: merge_bloom(g.drop(columns=["_k"])),
                          batch_format="pandas")
              .to_pandas())
    words = np.frombuffer(merged["bloom"].iloc[0], dtype=np.uint64)
    bloom_ref = ray.put(words)

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(bloom_ref)
        keys = b["user_id"].to_numpy().astype(np.int64)
        p1, p2 = _bloom_positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for p in (p1, p2):
            hit &= (w[p >> 6] >> (p.astype(np.uint64) & np.uint64(63))
                    ).astype(np.uint64) & np.uint64(1) == 1
        out = b.loc[hit, ["event_id", "user_id", "event_type"]].copy()
        out["key"] = out["user_id"].astype("int64")
        out["side"] = np.int8(0)
        out["_jb"] = (out["key"].to_numpy() % num_buckets).astype(np.int32)
        return out

    def tag_build(b: pd.DataFrame) -> pd.DataFrame:
        key = np.unique(
            b.loc[b["o_orderpriority"] == "1-URGENT", "o_custkey"]
            .to_numpy().astype(np.int64))
        return pd.DataFrame({
            "event_id": np.full(len(key), -1, dtype=np.int64),
            "user_id": key,
            "event_type": np.full(len(key), "", dtype=object),
            "key": key,
            "side": np.ones(len(key), dtype=np.int8),
            "_jb": (key % num_buckets).astype(np.int32),
        })

    def semi_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == 0]
        build = g.loc[g["side"] == 1, "key"]
        out = ev.loc[ev["key"].isin(build)]
        return pd.DataFrame({
            "event_id": out["event_id"].to_numpy(dtype="int64"),
            "user_id": out["key"].to_numpy(dtype="int64"),
            "event_type": out["event_type"].to_numpy(),
        })

    tagged = events.map_batches(probe, batch_format="pandas").union(
        orders.map_batches(tag_build, batch_format="pandas"))
    return (tagged.groupby("_jb")
            .map_groups(lambda g: semi_bucket(g.drop(columns=["_jb"])),
                        batch_format="pandas"))
