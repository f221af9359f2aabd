"""Event-time windowing over the transcript stream: session windows (gap
on ``ts`` per ``conv_id``), tumbling and sliding windows for per-tool
stats, and watermark arithmetic.

The reference has no cross-record windows (each HTTP request is
independent — SURVEY §2.6); these are mandated by the north rule and
designed Ray-native:

- window **assignment** is a vectorized column inside ``map_batches``
  (no shuffle);
- tumbling/sliding **aggregation** pre-aggregates per batch (partial
  combine) and then runs one small ``groupby(...).aggregate(...)`` over
  the partials — the all-to-all shuffle moves one row per
  (tool, window, batch), not one per turn;
- **session** windows need per-conversation order → one
  ``groupby(conv_id).map_groups`` shuffle. For skewed (hot) conv_ids the
  salted two-phase variant shuffles on ``(conv_id, ts_bucket)`` first and
  merges adjacent partial sessions in a second, narrow pass
  (SURVEY §7.4.3).
- **watermark** = max(event ts) − allowed lateness, carried in the
  checkpoint by the streaming driver; rows older than the watermark at
  arrival are routed to a late/dead-letter output — the event-time
  analogue of the reference's ``expire()`` utility filter
  (``imagor.go:314-322, 991-1003``).

All timestamps are computed in integer microseconds (Arrow
``timestamp[us]`` ⇄ DuckDB ``epoch_us``) so the DuckDB oracles compare
exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = [
    "ts_us",
    "assign_tumbling",
    "explode_sliding",
    "tumbling_tool_stats",
    "sliding_tool_stats",
    "sessionize_group",
    "session_windows",
    "split_late",
]


def ts_us(col) -> np.ndarray:
    """timestamp column → int64 microseconds since epoch."""
    return np.asarray(col).astype("datetime64[us]").astype("int64")


def assign_tumbling(batch: pd.DataFrame, size_s: int, ts_col: str = "ts") -> pd.DataFrame:
    """Add ``window_start`` (int64 epoch-seconds, floor-aligned)."""
    us = ts_us(batch[ts_col])
    size_us = size_s * 1_000_000
    batch["window_start"] = (us - us % size_us) // 1_000_000
    return batch


def explode_sliding(
    batch: pd.DataFrame, size_s: int, slide_s: int, ts_col: str = "ts"
) -> pd.DataFrame:
    """Each row lands in ``size/slide`` windows: one output row per
    (input row, containing window). Window starts are slide-aligned."""
    k = size_s // slide_s
    us = ts_us(batch[ts_col])
    slide_us = slide_s * 1_000_000
    base = (us - us % slide_us) // 1_000_000  # last slide boundary ≤ ts
    reps = np.repeat(np.arange(len(batch)), k)
    offs = np.tile(np.arange(k), len(batch)) * slide_s
    out = batch.iloc[reps].reset_index(drop=True)
    out["window_start"] = base[reps] - offs
    return out


def _partial_tool_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial combine: one row per (tool, window_start)."""
    batch = batch.assign(text_len=batch["text"].str.len())
    g = batch.groupby(["tool", "window_start"], sort=False).agg(
        n_turns=("text", "size"),
        sum_len=("text_len", "sum"),
        min_ts=("ts", "min"),
        max_ts=("ts", "max"),
    ).reset_index()
    return g


def tumbling_tool_stats(ds: rd.Dataset, size_s: int = 3600) -> rd.Dataset:
    """Per-(tool, tumbling-window) stats with partial pre-aggregation.

    Output: tool, window_start (epoch s), n_turns, sum_len, min_ts, max_ts.
    """
    # large combine batches: with small batches the per-batch partials
    # barely reduce ((tool, window) cardinality ~ batch size) and the
    # merge shuffle re-moves nearly every row
    partials = ds.map_batches(
        lambda b: _partial_tool_stats(assign_tumbling(b, size_s)),
        batch_format="pandas", batch_size=65536,
    )

    # final merge via bucketed map_groups — Ray's built-in multi-key
    # .aggregate() is an order of magnitude slower on this workload; a
    # hash-bucket groupby with one vectorized pandas merge per bucket is
    # the same pattern the sessionize path uses
    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_wb"] = (b["window_start"] % 16).astype("int32")
        return b

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["tool", "window_start"], sort=True).agg(
            n_turns=("n_turns", "sum"),
            sum_len=("sum_len", "sum"),
            min_ts=("min_ts", "min"),
            max_ts=("max_ts", "max"),
        ).reset_index()

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(merge, batch_format="pandas")
    )


def sliding_tool_stats(ds: rd.Dataset, size_s: int = 3600, slide_s: int = 900) -> rd.Dataset:
    """Per-(tool, sliding-window) turn counts; explode is vectorized per
    batch, aggregation is over per-batch partials."""
    def explode_partial(b: pd.DataFrame) -> pd.DataFrame:
        e = explode_sliding(b, size_s, slide_s)
        return e.groupby(["tool", "window_start"], sort=False).agg(
            n_turns=("text", "size")
        ).reset_index()

    partials = ds.map_batches(explode_partial, batch_format="pandas",
                              batch_size=32768)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_wb"] = (b["window_start"] % 16).astype("int32")
        return b

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["tool", "window_start"], sort=True).agg(
            n_turns=("n_turns", "sum"),
        ).reset_index()

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(merge, batch_format="pandas")
    )


def sessionize_group(
    g: pd.DataFrame, gap_s: int, ts_col: str = "ts"
) -> pd.DataFrame:
    """Assign ``session_id`` within one conversation: a new session starts
    when the gap to the previous turn exceeds ``gap_s``. Stable order
    (ts, turn_idx). Vectorized (cumsum over a boolean gap mask)."""
    order = ["ts", "turn_idx"] if "turn_idx" in g.columns else ["ts"]
    g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
    us = ts_us(g[ts_col])
    gaps = np.diff(us, prepend=us[0] if len(us) else 0)
    new_session = gaps > gap_s * 1_000_000
    g["session_id"] = np.cumsum(new_session).astype(np.int32)
    return g


def _bucket_of(conv_ids: pd.Series, num_buckets: int) -> pd.Series:
    """Deterministic crc32 hash bucket of conv_id (stable across runs —
    NOT salted Python hash). Vectorized table-driven CRC, bit-identical
    to ``zlib.crc32``."""
    from ..functions.hashing import crc32_bucket

    return pd.Series(
        crc32_bucket(conv_ids.to_numpy(), num_buckets), index=conv_ids.index
    )


def _session_summaries_bucket(
    g: pd.DataFrame, gap_s: int, extra_break: str | None = None
) -> pd.DataFrame:
    """Vectorized sessionize over one hash bucket of conversations: ONE
    sort + numpy cumsum per bucket, no per-conversation Python. A new
    session starts on conversation change, (salted) ``extra_break`` column
    change, or event-time gap > gap_s."""
    order = ["conv_id"] + ([extra_break] if extra_break else []) + ["ts"]
    if "turn_idx" in g.columns:
        order.append("turn_idx")
    g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
    if len(g) == 0:
        return pd.DataFrame({
            "conv_id": pd.Series([], dtype=object),
            "session_id": pd.Series([], dtype="int32"),
            "session_start": pd.Series([], dtype="datetime64[us]"),
            "session_end": pd.Series([], dtype="datetime64[us]"),
            "n_turns": pd.Series([], dtype="int64"),
            "sum_len": pd.Series([], dtype="int64"),
        })
    us = ts_us(g["ts"])
    conv = g["conv_id"].to_numpy()
    new = np.empty(len(g), dtype=bool)
    new[0] = True
    new[1:] = (conv[1:] != conv[:-1]) | (np.diff(us) > gap_s * 1_000_000)
    if extra_break:
        brk = g[extra_break].to_numpy()
        new[1:] |= brk[1:] != brk[:-1]
    gsid = np.cumsum(new)
    agg = g.assign(_gsid=gsid).groupby("_gsid", sort=True).agg(
        conv_id=("conv_id", "first"),
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_turns=("ts", "size"),
        sum_len=("text_len", "sum"),
    ).reset_index(drop=True)
    agg["session_id"] = agg.groupby("conv_id", sort=False).cumcount().astype("int32")
    return agg[["conv_id", "session_id", "session_start", "session_end",
                "n_turns", "sum_len"]]


def _merge_partial_sessions_bucket(g: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    """Second narrow pass of the salted variant: partial sessions from
    adjacent ts-buckets merge when the boundary gap ≤ gap (two-phase
    merge, SURVEY §7.4.3). Input is one row per partial session —
    orders of magnitude smaller than the turn stream. Vectorized."""
    g = g.sort_values(["conv_id", "session_start"], kind="mergesort").reset_index(drop=True)
    if len(g) == 0:
        return g.drop(columns=["_bucket"], errors="ignore")
    start_us = ts_us(g["session_start"])
    end_us = ts_us(g["session_end"])
    conv = g["conv_id"].to_numpy()
    new = np.empty(len(g), dtype=bool)
    new[0] = True
    new[1:] = (conv[1:] != conv[:-1]) | (
        (start_us[1:] - end_us[:-1]) > gap_s * 1_000_000
    )
    gsid = np.cumsum(new)
    agg = g.assign(_gsid=gsid).groupby("_gsid", sort=True).agg(
        conv_id=("conv_id", "first"),
        session_start=("session_start", "min"),
        session_end=("session_end", "max"),
        n_turns=("n_turns", "sum"),
        sum_len=("sum_len", "sum"),
    ).reset_index(drop=True)
    agg["session_id"] = agg.groupby("conv_id", sort=False).cumcount().astype("int32")
    return agg[["conv_id", "session_id", "session_start", "session_end",
                "n_turns", "sum_len"]]


def session_windows(
    ds: rd.Dataset,
    gap_s: int = 1800,
    salt_bucket_s: int | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-conversation session summaries.

    Output: conv_id, session_id, session_start, session_end, n_turns,
    sum_len.

    The shuffle key is a conversation hash bucket (vectorized work per
    bucket). ``salt_bucket_s`` enables the skew-safe two-phase path:
    shuffle on the salted key ``hash(conv_id, floor(ts/salt_bucket))``,
    sessionize within each salt bucket, then merge adjacent partial
    sessions per conv_id — the hot conversation is split across reducers
    and the merge input is tiny.
    """
    def add_len(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["text_len"] = b["text"].str.len().astype("int64")
        return b

    ds = ds.map_batches(add_len, batch_format="pandas")

    if salt_bucket_s is None:
        def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
            b["_bucket"] = _bucket_of(b["conv_id"], num_buckets).astype("int32")
            return b

        return (
            ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(lambda g: _session_summaries_bucket(g, gap_s),
                        batch_format="pandas")
        )

    bucket_us = salt_bucket_s * 1_000_000

    def add_salted_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_salt"] = ts_us(b["ts"]) // bucket_us
        salted = b["conv_id"] + "|" + b["_salt"].astype(str)
        b["_bucket"] = _bucket_of(salted, num_buckets).astype("int32")
        return b

    partial = (
        ds.map_batches(add_salted_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: _session_summaries_bucket(g, gap_s, extra_break="_salt"),
            batch_format="pandas",
        )
    )

    def add_merge_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bucket"] = _bucket_of(b["conv_id"], num_buckets).astype("int32")
        return b

    return (
        partial.map_batches(add_merge_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: _merge_partial_sessions_bucket(g, gap_s),
                    batch_format="pandas")
    )


def split_late(
    batch: pd.DataFrame, watermark_us: int, ts_col: str = "ts"
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split a batch into (on-time, late) by the current watermark —
    the event-time ``expire()`` analogue (imagor.go:314-322)."""
    late_mask = ts_us(batch[ts_col]) < watermark_us
    return batch[~late_mask], batch[late_mask]
