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

__all__ = ["tool_sequence_matches"]


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
