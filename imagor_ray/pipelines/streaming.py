"""Micro-batch streaming driver: the event-time loop that turns the batch
DAG into a structured-streaming job.

Ray Data has no native event-time runtime (ray_guide: streaming-shaped
workloads), so progress lives in the driver + checkpoint (SURVEY §7.4.2):

- the input is an ordered log of parquet micro-batch files (a directory,
  ordered by name == arrival order);
- each cycle processes the next unprocessed file through the flagship
  chain into the exactly-once sink (bucket partitions are keyed per
  cycle so replays of a cycle are idempotent);
- the **watermark** advances to ``max(event ts seen) − allowed_lateness``
  and is persisted in the checkpoint; rows arriving with
  ``ts < watermark`` are routed to a late/dead-letter output — the
  event-time analogue of imagor's ``expire()`` rejection
  (``imagor.go:314-322, 991-1003``);
- **open sessions** (conversations whose last turn is within the session
  gap of the watermark) are carried across cycles in the checkpoint and
  re-injected, so sessions spanning micro-batches close exactly once,
  when the watermark passes ``last_ts + gap``;
- killing the driver between cycles and restarting resumes from the
  checkpoint with byte-identical emitted output (asserted in tests).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.windows import ts_us
from ..state.checkpoint import Checkpoint

__all__ = ["StreamingSessionJob", "StreamingFlagshipJob"]


class StreamingSessionJob:
    """Sessionization over a micro-batch file stream with watermarks.

    Emits CLOSED session summaries per cycle (a session closes when the
    watermark passes its end + gap); keeps open sessions in the
    checkpoint. Late rows (ts < watermark at arrival) go to the
    late-rows output, not into sessions.
    """

    def __init__(
        self,
        input_dir: str,
        state_dir: str,
        gap_s: int = 1800,
        allowed_lateness_s: int = 0,
    ):
        self.input_dir = input_dir
        self.cp = Checkpoint(state_dir)
        self.gap_s = gap_s
        self.lateness_us = allowed_lateness_s * 1_000_000
        self.closed_dir = os.path.join(state_dir, "closed")
        self.late_dir = os.path.join(state_dir, "late")
        os.makedirs(self.closed_dir, exist_ok=True)
        os.makedirs(self.late_dir, exist_ok=True)

    # -- helpers -----------------------------------------------------------

    def pending_files(self) -> list[str]:
        state = self.cp.load()
        done = set(state.get("processed", []))
        return [
            f for f in sorted(os.listdir(self.input_dir))
            if f.endswith(".parquet") and f not in done
        ]

    @staticmethod
    def _sessionize(df: pd.DataFrame, gap_s: int) -> pd.DataFrame:
        """Vectorized sessionize of (conv_id-sorted) turns → summaries."""
        df = df.sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_turns": pd.Series([], dtype="int64"),
            })
        us = ts_us(df["ts"])
        conv = df["conv_id"].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = (conv[1:] != conv[:-1]) | (np.diff(us) > gap_s * 1_000_000)
        gsid = np.cumsum(new)
        return df.assign(_g=gsid).groupby("_g", sort=True).agg(
            conv_id=("conv_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_turns=("n_turns", "sum") if "n_turns" in df.columns else ("ts", "size"),
        ).reset_index(drop=True)

    # -- one cycle ---------------------------------------------------------

    def run_cycle(self) -> dict | None:
        """Process the next micro-batch file; returns the cycle summary or
        None when the input is exhausted."""
        pending = self.pending_files()
        if not pending:
            return None
        fname = pending[0]
        state = self.cp.load()
        watermark = int(state.get("watermark_us", 0))

        batch = pd.read_parquet(os.path.join(self.input_dir, fname))
        us = ts_us(batch["ts"])

        # late-data routing against the PRE-advance watermark
        late_mask = us < watermark
        late = batch[late_mask]
        if len(late):
            late.to_parquet(
                os.path.join(self.late_dir, f"late-{fname}"), index=False
            )
        batch = batch[~late_mask]
        us = us[~late_mask]

        # subclass hook: per-cycle processing of the on-time rows (the
        # chain → exactly-once sink leg of the DAG)
        self._process_batch(batch, int(state.get("cycles", 0)))

        # watermark advance: max event time seen − allowed lateness
        new_watermark = max(
            watermark, (int(us.max()) - self.lateness_us) if len(us) else watermark
        )

        # merge open sessions (carried summaries) with this batch's turns —
        # read the snapshot COMMITTED by the checkpoint, never a staged one
        open_prev = self.cp.load_open_sessions(state)
        turns = batch[["conv_id", "ts"]].copy()
        turns["n_turns"] = 1
        if open_prev is not None and len(open_prev):
            prev = pd.DataFrame({
                "conv_id": open_prev["conv_id"],
                "ts": open_prev["session_end"],
                "n_turns": open_prev["n_turns"],
                "_start": open_prev["session_start"],
            })
            turns["_start"] = turns["ts"]
            turns = pd.concat([prev, turns], ignore_index=True)
        else:
            turns["_start"] = turns["ts"]

        sessions = self._sessionize_cycle(turns, self.gap_s)

        # close sessions whose end + gap < watermark; keep the rest open
        end_us = ts_us(sessions["session_end"])
        closed_mask = (end_us + self.gap_s * 1_000_000) < new_watermark
        closed = sessions[closed_mask].sort_values(
            ["conv_id", "session_start"]).reset_index(drop=True)
        # sort the snapshot too: above RAY_SESSIONIZE_THRESHOLD the
        # sessionize is a Ray groupby whose output row order varies
        # between runs, and the staged open-session side file must be
        # byte-stable for the crash-replay byte-identity guarantee
        still_open = sessions[~closed_mask].sort_values(
            ["conv_id", "session_start"]).reset_index(drop=True)

        cycle = int(state.get("cycles", 0))
        if len(closed):
            closed.to_parquet(
                os.path.join(self.closed_dir, f"closed-{cycle:05d}.parquet"),
                index=False,
            )

        # stage the post-cycle snapshot under a cycle-versioned name; it
        # only becomes visible when checkpoint.json (the single atomic
        # commit point) records it below — a crash between here and
        # cp.save(state) replays the cycle against the pre-cycle snapshot,
        # keeping the byte-identical-replay guarantee.
        open_fname = self.cp.stage_open_sessions(still_open, cycle)
        state["open_sessions_file"] = open_fname
        state["watermark_us"] = new_watermark
        state["processed"] = list(state.get("processed", [])) + [fname]
        state["late_rows"] = int(state.get("late_rows", 0)) + int(late_mask.sum())
        state["cycles"] = cycle + 1
        result = {
            "file": fname,
            "watermark_us": new_watermark,
            "rows": int(len(batch)),
            "closed": len(closed),
            "open": len(still_open),
            "late": int(late_mask.sum()),
        }
        # per-cycle metrics ride in the checkpoint (lineage + metrics)
        state["cycle_metrics"] = list(state.get("cycle_metrics", [])) + [result]
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return result

    #: above this cycle size the session merge runs as a bucketed Ray
    #: groupby instead of one driver-side pandas sort (conversations are
    #: hash-bucket-complete, so per-bucket sessionize is exact)
    RAY_SESSIONIZE_THRESHOLD = 200_000

    @classmethod
    def _sessionize_cycle(cls, turns: pd.DataFrame, gap_s: int) -> pd.DataFrame:
        """Per-cycle sessionize: driver pandas for small cycles, the
        bucketed distributed path for large ones (same result — asserted
        in tests)."""
        if len(turns) <= cls.RAY_SESSIONIZE_THRESHOLD:
            return cls._sessionize_with_start(turns, gap_s)
        import ray
        import ray.data as _rd

        from ..functions.hashing import crc32_bucket

        n_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        turns = turns.reset_index(drop=True)
        turns["_sb"] = crc32_bucket(
            turns["conv_id"].to_numpy(), n_buckets
        ).astype("int32")
        n_chunks = max(1, len(turns) // 65536 + 1)
        chunks = [c.reset_index(drop=True) for c in np.array_split(turns, n_chunks)]
        out = (
            _rd.from_pandas(chunks)
            .groupby("_sb")
            .map_groups(
                lambda g: cls._sessionize_with_start(g.drop(columns=["_sb"]), gap_s),
                batch_format="pandas",
            )
            .to_pandas()
        )
        return out

    @staticmethod
    def _sessionize_with_start(turns: pd.DataFrame, gap_s: int) -> pd.DataFrame:
        """Like _sessionize but carries forward true session_start from
        re-injected open-session summaries."""
        df = turns.sort_values(["conv_id", "ts"], kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_turns": pd.Series([], dtype="int64"),
            })
        us = ts_us(df["ts"])
        conv = df["conv_id"].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = (conv[1:] != conv[:-1]) | (np.diff(us) > gap_s * 1_000_000)
        gsid = np.cumsum(new)
        return df.assign(_g=gsid).groupby("_g", sort=True).agg(
            conv_id=("conv_id", "first"),
            session_start=("_start", "min"),
            session_end=("ts", "max"),
            n_turns=("n_turns", "sum"),
        ).reset_index(drop=True)

    def run_all(self) -> list[dict]:
        out = []
        while True:
            r = self.run_cycle()
            if r is None:
                break
            out.append(r)
        return out

    def flush(self) -> pd.DataFrame:
        """End-of-stream: close all remaining open sessions (watermark →
        +inf). Returns the final closed batch."""
        state = self.cp.load()
        open_prev = self.cp.load_open_sessions(state)
        if open_prev is None or not len(open_prev):
            return pd.DataFrame()
        closed = open_prev.sort_values(["conv_id", "session_start"]).reset_index(drop=True)
        cycle = int(state.get("cycles", 0))
        closed.to_parquet(
            os.path.join(self.closed_dir, f"closed-{cycle:05d}.parquet"), index=False
        )
        open_fname = self.cp.stage_open_sessions(closed.iloc[0:0], cycle)
        state["open_sessions_file"] = open_fname
        state["cycles"] = cycle + 1
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return closed

    def _process_batch(self, batch: pd.DataFrame, cycle: int) -> None:
        """Hook for subclasses; the base job only sessionizes."""

    def closed_sessions(self) -> pd.DataFrame:
        files = sorted(
            os.path.join(self.closed_dir, f)
            for f in os.listdir(self.closed_dir)
            if f.endswith(".parquet")
        )
        if not files:
            return pd.DataFrame()
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


class StreamingFlagshipJob(StreamingSessionJob):
    """The full north-star DAG as one continuous micro-batch job:

    per cycle — late-data routing vs the watermark, then the imagor chain
    (parse → sign → filter chain → tool-meta enrich) over the on-time
    turns into a cycle-scoped exactly-once sink (keyed dedup + atomic
    per-bucket commit + lineage), then session-window maintenance with
    open-session carryover. Killing the driver at ANY point and rerunning
    reproduces the emitted bytes: cycle replays are absorbed by the
    sink's committed-bucket skip, and the checkpoint only advances after
    the cycle's sink commit.
    """

    def __init__(
        self,
        input_dir: str,
        state_dir: str,
        gap_s: int = 1800,
        allowed_lateness_s: int = 0,
        secret: str | None = None,
        num_buckets: int = 8,
    ):
        super().__init__(input_dir, state_dir, gap_s, allowed_lateness_s)
        from ..stages.parse_sign import DEFAULT_SECRET

        self.secret = secret or DEFAULT_SECRET
        self.num_buckets = num_buckets
        self.processed_dir = os.path.join(state_dir, "processed_turns")
        os.makedirs(self.processed_dir, exist_ok=True)

    def _process_batch(self, batch: pd.DataFrame, cycle: int) -> None:
        if len(batch) == 0:
            return
        import ray.data as _rd

        from ..pipelines.flagship import snippet_dim
        from ..sources.transcripts import tool_meta_table
        from ..stages.chain import filter_chain_batch
        from ..stages.parse_sign import parse_sign_batch
        from ..state.sink import ExactlyOnceSink

        meta = {
            r["tool"]: (r["tool_kind"], int(r["tool_cost"]))
            for _, r in tool_meta_table().iterrows()
        }
        dim = snippet_dim()
        secret = self.secret

        def proc(b: pd.DataFrame) -> pd.DataFrame:
            b = parse_sign_batch(b.copy(), secret=secret)
            b = filter_chain_batch(b, dim_ref=dim, path_col="chain_path")
            kinds = b["tool"].map(lambda t: meta.get(t, ("unknown", 0)))
            b["tool_kind"] = kinds.map(lambda kv: kv[0])
            b["tool_cost"] = kinds.map(lambda kv: kv[1]).astype("int64")
            return b.drop(columns=["chain_path", "sig_ok"], errors="ignore")

        # from_pandas(df) yields ONE block — split the cycle into
        # CPU-count chunks so the chain stage actually parallelizes
        batch = batch.reset_index(drop=True)
        import ray as _ray

        n_chunks = max(1, min(
            int(_ray.cluster_resources().get("CPU", 8)) * 2,
            len(batch) // 8192 + 1,
        ))
        chunks = np.array_split(batch, n_chunks)
        ds = _rd.from_pandas([c.reset_index(drop=True) for c in chunks]).map_batches(
            proc, batch_format="pandas"
        )
        sink = ExactlyOnceSink(
            os.path.join(self.processed_dir, f"cycle-{cycle:05d}"),
            num_buckets=self.num_buckets,
        )
        sink.write(ds)

    def processed_sha1(self) -> str:
        """Digest over every committed cycle partition — replay probe."""
        import hashlib

        h = hashlib.sha1()
        for cyc in sorted(os.listdir(self.processed_dir)):
            cdir = os.path.join(self.processed_dir, cyc)
            for f in sorted(os.listdir(cdir)):
                if f.endswith(".parquet"):
                    with open(os.path.join(cdir, f), "rb") as fh:
                        h.update(fh.read())
        return h.hexdigest()
