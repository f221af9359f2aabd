"""CEP-style sequence detection over conversations — the complex-event
leg of the north rule's streaming surface (tumbling/sliding/session
windows + watermarks exist in ``stages/windows``; this adds ordered
event-pattern matching).

``tool_sequence_matches`` finds, per conversation, every ordered pair of
turns where ``first_tool`` is followed by ``second_tool`` within
``within_s`` seconds — the classic funnel/CEP primitive (signup →
purchase inside an hour). Semantics are ALL qualifying pairs (the
SQL-mirrorable definition; "first match only" variants compose on top).

Scale shape: one bucketed groupby on the SAME conv-hash key as every
other wide step; within a bucket the match is one vectorized
searchsorted per (conv, tool-pair) — no per-row Python, no second
shuffle. The shuffle carries only (conv_id, ts) for the two tools of
interest (filtered map-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.bandjoin import band_probe

__all__ = ["tool_sequence_matches", "click_abandonment",
           "conversion_latency_quantiles", "cep_kleene_funnel"]


def tool_sequence_matches(
    ds: rd.Dataset,
    first_tool: str,
    second_tool: str,
    within_s: int,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Per-conversation funnel counts.

    Output rows: ``conv_id``, ``n_matches`` (int64 ≥ 1) — conversations
    with at least one ``first_tool`` turn followed by a ``second_tool``
    turn strictly later but within ``within_s`` seconds.
    """
    from ..functions.hashing import crc32_bucket
    from ..stages.windows import ts_us

    within_us = within_s * 1_000_000

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["tool"].isin([first_tool, second_tool])]
        out = pd.DataFrame({
            "conv_id": b["conv_id"].to_numpy(),
            "tool": b["tool"].to_numpy(),
            "ts_us": ts_us(b["ts"]),
        })
        out["_cb"] = crc32_bucket(out["conv_id"].to_numpy(), num_buckets).astype("int32")
        return out

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "ts_us"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        tool = g["tool"].to_numpy()
        ts = g["ts_us"].to_numpy()
        # per-conversation segment boundaries
        seg_start = np.concatenate([[0], np.flatnonzero(conv[1:] != conv[:-1]) + 1])
        seg_end = np.concatenate([seg_start[1:], [len(g)]])
        out_conv, out_n = [], []
        for s, e in zip(seg_start, seg_end):
            a_ts = ts[s:e][tool[s:e] == first_tool]
            b_ts = ts[s:e][tool[s:e] == second_tool]
            if len(a_ts) == 0 or len(b_ts) == 0:
                continue
            # matches per A-event: count B in (a, a + within] — two
            # vectorized searchsorted calls for the whole conversation
            lo = np.searchsorted(b_ts, a_ts, side="right")
            hi = np.searchsorted(b_ts, a_ts + within_us, side="right")
            n = int((hi - lo).sum())
            if n > 0:
                out_conv.append(conv[s])
                out_n.append(n)
        return pd.DataFrame({
            "conv_id": pd.Series(out_conv, dtype=object),
            "n_matches": pd.Series(out_n, dtype="int64"),
        })

    return (
        ds.map_batches(prune, batch_format="pandas")
        .groupby("_cb")
        .map_groups(match_bucket, batch_format="pandas")
    )


def click_abandonment(sf_dir: str, window_s: int = 21600,
                      num_buckets: int = 32) -> rd.Dataset:
    """CEP NEGATION (absence detection): clicks that are NOT followed
    by a purchase of the same user inside the event-time window
    (ts, ts + window) — the timeout/abandonment pattern
    ``tool_sequence_matches`` (presence) doesn't cover, and the
    time-banded sibling of the pure hash anti-join.

    One user-bucket co-group (the temporal-join family's documented
    partitioning: a user's window-scale history is bucket-complete);
    inside a bucket, every click is positioned against the
    (user-rank, ts) sorted purchases with two ``searchsorted`` probes
    and survives iff its span is empty — vectorized absence, no
    per-user loop, no pair materialization at all (the probe only
    needs span WIDTH, and the absent rows are the output).

    Output: event_id, user_id, ts of the abandoned clicks.
    """
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    w = np.int64(window_s * 1_000_000)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        t = b["event_type"].to_numpy()
        keep = (t == "click") | (t == "purchase")
        uid = b["user_id"].to_numpy(dtype="int64")[keep]
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(dtype="int64")[keep],
            "user_id": uid,
            "ts_us": b["ts"].astype("datetime64[us]")
            .astype("int64").to_numpy()[keep],
            "side": np.where(t[keep] == "click", 0, 1).astype(np.int8),
            "_ub": (uid % num_buckets).astype(np.int32),
        })

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cl = g[g["side"] == 0]
        pu = g[g["side"] == 1]
        out_empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
        })
        if not len(cl):
            return out_empty
        c_uid = cl["user_id"].to_numpy(dtype="int64")
        c_us = cl["ts_us"].to_numpy(dtype="int64")
        if len(pu):
            lo, hi, _ = band_probe(
                c_uid, c_us + 1, c_us + w - 1,
                pu["user_id"].to_numpy(dtype="int64"),
                pu["ts_us"].to_numpy(dtype="int64"))
            absent = hi == lo
        else:
            absent = np.ones(len(cl), dtype=bool)
        return pd.DataFrame({
            "event_id": cl["event_id"].to_numpy(dtype="int64")[absent],
            "user_id": c_uid[absent],
            "ts": pd.Series(c_us[absent]).astype("datetime64[us]"),
        })

    return (events.map_batches(tag, batch_format="pandas")
            .groupby("_ub")
            .map_groups(lambda g: bucket(g.drop(columns=["_ub"])),
                        batch_format="pandas"))


def conversion_latency_quantiles(
        sf_dir: str, window_s: int = 21600, num_buckets: int = 32,
        pcts: tuple = (50, 90, 99)) -> pd.DataFrame:
    """Funnel-timing quantiles: the exact p50/p90/p99 of the
    click→FIRST-purchase latency (seconds, floored) inside the open
    (ts, ts + 6h) window — the composition the CEP family feeds
    (band-join → per-anchor min → bounded-integer-domain exact global
    quantile, the ``quality_filter`` pattern: latency lives in
    [0, window_s), so the FULL histogram is ≤ window_s rows to the
    driver regardless of corpus size, and the k-th-smallest pick with
    ``k = ceil(pct·n/100)`` is SQL-row_number-identical).

    The per-anchor minimum costs nothing extra: the probe's ``lo``
    position IS the earliest same-user purchase after the click
    (the right side is (user-rank, ts) sorted), so no pair rows and
    no per-anchor aggregation exist at all.

    Output: pct, latency_s (one row per requested percentile).
    """
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    w = np.int64(window_s * 1_000_000)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        t = b["event_type"].to_numpy()
        keep = (t == "click") | (t == "purchase")
        uid = b["user_id"].to_numpy(dtype="int64")[keep]
        return pd.DataFrame({
            "user_id": uid,
            "ts_us": b["ts"].astype("datetime64[us]")
            .astype("int64").to_numpy()[keep],
            "side": np.where(t[keep] == "click", 0, 1).astype(np.int8),
            "_ub": (uid % num_buckets).astype(np.int32),
        })

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"latency_s": pd.Series([], dtype="int64"),
                              "c": pd.Series([], dtype="int64"),
                              "_hb": pd.Series([], dtype="int64")})
        cl = g[g["side"] == 0]
        pu = g[g["side"] == 1]
        if not len(cl) or not len(pu):
            return empty
        c_uid = cl["user_id"].to_numpy(dtype="int64")
        c_us = cl["ts_us"].to_numpy(dtype="int64")
        p_us = pu["ts_us"].to_numpy(dtype="int64")
        lo, hi, order = band_probe(
            c_uid, c_us + 1, c_us + w - 1,
            pu["user_id"].to_numpy(dtype="int64"), p_us)
        p_us_s = p_us[order]
        m = lo < hi
        if not m.any():
            return empty
        lat = (p_us_s[lo[m]] - c_us[m]) // 1_000_000
        v, c = np.unique(lat, return_counts=True)
        return pd.DataFrame({"latency_s": v.astype("int64"),
                             "c": c.astype("int64"),
                             "_hb": v // np.int64(64)})

    def reduce_hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("latency_s", sort=False)["c"].sum()
        return pd.DataFrame({"latency_s": s.index.to_numpy(dtype="int64"),
                             "c": s.to_numpy(dtype="int64")})

    h = (events.map_batches(tag, batch_format="pandas")
         .groupby("_ub")
         .map_groups(lambda g: bucket(g.drop(columns=["_ub"])),
                     batch_format="pandas")
         .groupby("_hb")
         .map_groups(lambda g: reduce_hist(g.drop(columns=["_hb"])),
                     batch_format="pandas")
         .to_pandas().sort_values("latency_s"))
    if not len(h):
        return pd.DataFrame({"pct": pd.Series([], dtype="int64"),
                             "latency_s": pd.Series([], dtype="int64")})
    n = int(h["c"].sum())
    cum = h["c"].cumsum()
    out = []
    for p in pcts:
        kth = (n * p + 99) // 100
        out.append((p, int(h.loc[cum >= kth, "latency_s"].iloc[0])))
    return pd.DataFrame({"pct": np.array([o[0] for o in out], dtype="int64"),
                         "latency_s": np.array([o[1] for o in out],
                                               dtype="int64")})


def cep_kleene_funnel(sf_dir: str, window_s: int = 21600,
                      num_buckets: int = 32) -> rd.Dataset:
    """CEP KLEENE-PLUS quantifier — the MATCH_RECOGNIZE pattern
    ``signup click+ purchase`` per user with STRICT CONTIGUITY (no
    other event interleaves the run; an ``error`` between two clicks
    breaks the match) and the whole match inside ``window_s``. This is
    the pattern-quantifier leg the CEP family was missing: presence
    (``tool_sequence_matches``), negation (``click_abandonment``) and
    timing (``conversion_latency_quantiles``) don't bind a variable-
    length sub-pattern.

    Match semantics are maximal non-overlapping runs (MATCH_RECOGNIZE
    ``AFTER MATCH SKIP PAST LAST ROW``): a maximal island of
    consecutive clicks qualifies iff the event immediately before it
    is a ``signup``, the event immediately after is a ``purchase``,
    and ``purchase.ts - signup.ts <= window``. Maximal islands are
    disjoint by construction, and a flanking event can never serve two
    runs (the event after one run is a purchase, never the next run's
    signup), so no skip-state is needed.

    Scale shape: contiguity depends on ALL of a user's events, so the
    single user-bucket shuffle carries (user_id, event_id, ts,
    type-code) — 4 fixed-width columns, no text. In-bucket the islands
    are pure numpy: run starts/ends from one boolean diff, flanker
    checks as two aligned gathers — no per-user loop, no pair rows.
    Ordering ties break on (ts, event_id) on both the engine and
    oracle side, so the output is deterministic.

    Output: user_id, start_ts (signup), end_ts (purchase), n_clicks.
    """
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    w = np.int64(window_s * 1_000_000)
    # type codes: 0 = signup, 1 = click, 2 = purchase, 3 = anything else
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        t = b["event_type"].to_numpy()
        code = np.full(len(b), 3, dtype=np.int8)
        code[t == "signup"] = 0
        code[t == "click"] = 1
        code[t == "purchase"] = 2
        uid = b["user_id"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "user_id": uid,
            "event_id": b["event_id"].to_numpy(dtype="int64"),
            "ts_us": b["ts"].astype("datetime64[us]")
            .astype("int64").to_numpy(),
            "code": code,
            "_ub": (uid % num_buckets).astype(np.int32),
        })

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "start_ts": pd.Series([], dtype="datetime64[us]"),
            "end_ts": pd.Series([], dtype="datetime64[us]"),
            "n_clicks": pd.Series([], dtype="int64"),
        })
        if not len(g):
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(dtype="int64")
        ts = g["ts_us"].to_numpy(dtype="int64")
        code = g["code"].to_numpy()
        n = len(g)
        is_click = code == 1
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = uid[1:] == uid[:-1]
        prev_click = np.zeros(n, dtype=bool)
        prev_click[1:] = is_click[:-1]
        next_click = np.zeros(n, dtype=bool)
        next_click[:-1] = is_click[1:]
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = uid[:-1] == uid[1:]
        starts = np.flatnonzero(is_click & ~(prev_click & same_prev))
        ends = np.flatnonzero(is_click & ~(next_click & same_next))
        # starts/ends align 1:1 per maximal same-user click island
        ok = (starts > 0) & (ends < n - 1)
        s, e = starts[ok], ends[ok]
        good = ((uid[s - 1] == uid[s]) & (code[s - 1] == 0)
                & (uid[e + 1] == uid[e]) & (code[e + 1] == 2)
                & (ts[e + 1] - ts[s - 1] <= w))
        s, e = s[good], e[good]
        return pd.DataFrame({
            "user_id": uid[s],
            "start_ts": pd.Series(ts[s - 1]).astype("datetime64[us]"),
            "end_ts": pd.Series(ts[e + 1]).astype("datetime64[us]"),
            "n_clicks": (e - s + 1).astype("int64"),
        })

    return (events.map_batches(tag, batch_format="pandas")
            .groupby("_ub")
            .map_groups(lambda g: bucket(g.drop(columns=["_ub"])),
                        batch_format="pandas"))
