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
from ray.data.aggregate import Count, Max, Min, Sum

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
    partials = ds.map_batches(
        lambda b: _partial_tool_stats(assign_tumbling(b, size_s)),
        batch_format="pandas",
    )
    return partials.groupby(["tool", "window_start"]).aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("sum_len", alias_name="sum_len"),
        Min("min_ts", alias_name="min_ts"),
        Max("max_ts", alias_name="max_ts"),
    )


def sliding_tool_stats(ds: rd.Dataset, size_s: int = 3600, slide_s: int = 900) -> rd.Dataset:
    """Per-(tool, sliding-window) turn counts; explode is vectorized per
    batch, aggregation is over per-batch partials."""
    def explode_partial(b: pd.DataFrame) -> pd.DataFrame:
        e = explode_sliding(b, size_s, slide_s)
        return e.groupby(["tool", "window_start"], sort=False).agg(
            n_turns=("text", "size")
        ).reset_index()

    partials = ds.map_batches(explode_partial, batch_format="pandas")
    return partials.groupby(["tool", "window_start"]).aggregate(
        Sum("n_turns", alias_name="n_turns"),
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


def _session_summaries(g: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    g = sessionize_group(g, gap_s)
    return g.groupby(["conv_id", "session_id"], sort=True).agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_turns=("ts", "size"),
        sum_len=("text_len", "sum"),
    ).reset_index()


def _merge_partial_sessions(g: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    """Second narrow pass of the salted variant: partial sessions from
    adjacent ts-buckets of one conv_id merge when their boundary gap ≤
    gap (two-phase merge, SURVEY §7.4.3). Input rows are session
    summaries; output is final session summaries with re-numbered ids."""
    g = g.sort_values(["session_start"], kind="mergesort").reset_index(drop=True)
    start_us = ts_us(g["session_start"])
    end_us = ts_us(g["session_end"])
    prev_end = np.concatenate(([start_us[0] if len(g) else 0], end_us[:-1]))
    new_session = (start_us - prev_end) > gap_s * 1_000_000
    sid = np.cumsum(new_session).astype(np.int32)
    out = g.assign(session_id=sid).groupby(["conv_id", "session_id"], sort=True).agg(
        session_start=("session_start", "min"),
        session_end=("session_end", "max"),
        n_turns=("n_turns", "sum"),
        sum_len=("sum_len", "sum"),
    ).reset_index()
    return out


def session_windows(
    ds: rd.Dataset,
    gap_s: int = 1800,
    salt_bucket_s: int | None = None,
) -> rd.Dataset:
    """Per-conversation session summaries.

    Output: conv_id, session_id, session_start, session_end, n_turns,
    sum_len.

    ``salt_bucket_s`` enables the skew-safe two-phase path: shuffle on the
    salted key ``(conv_id, floor(ts/bucket))``, sessionize within each
    salt bucket, then merge adjacent partial sessions per conv_id. The
    merge input is one row per partial session — orders of magnitude
    smaller than the turn stream — so the hot conv_id no longer dominates
    a single reducer.
    """
    def add_len(b: pd.DataFrame) -> pd.DataFrame:
        b["text_len"] = b["text"].str.len().astype("int64")
        return b

    ds = ds.map_batches(add_len, batch_format="pandas")

    if salt_bucket_s is None:
        return ds.groupby("conv_id").map_groups(
            lambda g: _session_summaries(g, gap_s), batch_format="pandas"
        )

    bucket_us = salt_bucket_s * 1_000_000

    def add_salt(b: pd.DataFrame) -> pd.DataFrame:
        b["_salt"] = ts_us(b["ts"]) // bucket_us
        return b

    partial = (
        ds.map_batches(add_salt, batch_format="pandas")
        .groupby(["conv_id", "_salt"])
        .map_groups(lambda g: _session_summaries(g, gap_s), batch_format="pandas")
    )
    return partial.groupby("conv_id").map_groups(
        lambda g: _merge_partial_sessions(g, gap_s), batch_format="pandas"
    )


def split_late(
    batch: pd.DataFrame, watermark_us: int, ts_col: str = "ts"
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split a batch into (on-time, late) by the current watermark —
    the event-time ``expire()`` analogue (imagor.go:314-322)."""
    late_mask = ts_us(batch[ts_col]) < watermark_us
    return batch[~late_mask], batch[late_mask]
