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
  checkpoint with byte-identical emitted output (asserted in tests);
- cycles above ``RAY_CYCLE_THRESHOLD`` rows run **dataset-native and
  fused**: one Arrow read pinned via ``materialize()``, then a single
  conv-bucket shuffle whose grouped task does the chain→sink partition
  write, the sessionize, and the close split — closed summaries write
  distributedly, and only still-open summaries + the watermark return
  to the driver (round-3; 324k turns/s at 16 CPUs vs 137k for the
  round-2 driver-staged loop). Small cycles keep the driver-pandas path
  (Ray per-stage overhead dominates); both paths byte-equivalent.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.windows import ts_us
from ..state.checkpoint import Checkpoint

__all__ = ["StreamingSessionJob", "StreamingFlagshipJob"]


def _arrow_ts_us(t) -> "object":
    """ts column of an Arrow table as int64 microseconds."""
    import pyarrow as pa
    import pyarrow.compute as pc

    unit = t.schema.field("ts").type.unit
    ts_i = pc.cast(t["ts"], pa.int64())
    if unit == "ns":
        ts_i = pc.divide(ts_i, 1000)
    elif unit == "s":
        ts_i = pc.multiply(ts_i, 1_000_000)
    elif unit == "ms":
        ts_i = pc.multiply(ts_i, 1000)
    return ts_i


def _empty_summaries() -> pd.DataFrame:
    return pd.DataFrame({
        "conv_id": pd.Series([], dtype=object),
        "session_start": pd.Series([], dtype="datetime64[us]"),
        "session_end": pd.Series([], dtype="datetime64[us]"),
        "n_turns": pd.Series([], dtype="int64"),
    })


_EXCHANGE_FNS = None


def _exchange_fns():
    """Remote functions of the ``tasks`` cycle engine (decorated lazily
    so importing this module never touches ray eagerly).

    The two-stage hash exchange is the hand-rolled counterpart of the
    fused dataset cycle's ``groupby(_bucket).map_groups``: map tasks
    split each pinned raw block into per-bucket sub-tables
    (``num_returns=nb`` object refs — only O(blocks × buckets) refs
    cross the driver, never rows), reduce tasks concat their bucket's
    shards and run the SAME fused per-bucket work (chain→sink partition
    write + sessionize + close split). Skipping Ray Data's sort-based
    shuffle removes the per-execution fixed cost (quantile sampling +
    boundary exchange + executor planning) that dominates sub-second
    streaming cycles — the measured bound on small-cycle scaling
    efficiency (BENCH.md finding 19). Partitioning assumption:
    conversations are hash-bucket-complete by ``crc32(conv_id) % nb``,
    identical to the dataset engine."""
    global _EXCHANGE_FNS
    if _EXCHANGE_FNS is not None:
        return _EXCHANGE_FNS
    import ray

    @ray.remote
    def split_by_bucket(tbl, wm: int, nb: int):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.hashing import crc32_bucket

        t = tbl.filter(
            pc.greater_equal(_arrow_ts_us(tbl), pa.scalar(wm, pa.int64())))
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        b = crc32_bucket(conv, nb)
        order = np.argsort(b, kind="stable")
        t = t.take(pa.array(order))
        bounds = np.searchsorted(b[order], np.arange(nb + 1))
        return [t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                for i in range(nb)]

    @ray.remote
    def reduce_bucket(bucket: int, final_wm: int, gap_s: int,
                      closed_dir: str, work, prev_open, *parts):
        import pyarrow as pa

        parts = [p for p in parts if p.num_rows]
        sess_frames = []
        if parts:
            turns = pa.concat_tables(parts).to_pandas()
            if work is not None:
                tw = turns.copy()
                tw["_bucket"] = np.int32(bucket)
                work(tw)
            sess_frames.append(pd.DataFrame({
                "conv_id": turns["conv_id"],
                "ts": turns["ts"],
                "n_turns": np.ones(len(turns), np.int64),
                "_start": turns["ts"],
            }))
        if prev_open is not None and len(prev_open):
            # carried open-session SUMMARIES → pseudo-turn rows, converted
            # here (not on the driver) so the pipelined loop can chain
            # reducer (N, b)'s output ObjectRef straight into (N+1, b)
            sess_frames.append(pd.DataFrame({
                "conv_id": prev_open["conv_id"].to_numpy(),
                "ts": prev_open["session_end"]
                .astype("datetime64[us]").to_numpy(),
                "n_turns": prev_open["n_turns"].astype("int64").to_numpy(),
                "_start": prev_open["session_start"]
                .astype("datetime64[us]").to_numpy(),
            }))
        if not sess_frames:
            return _empty_summaries()
        sessions = StreamingSessionJob._sessionize_with_start(
            pd.concat(sess_frames, ignore_index=True), gap_s)
        end_us = np.asarray(ts_us(sessions["session_end"]))
        closed_mask = (end_us + gap_s * 1_000_000) < final_wm
        closed = sessions[closed_mask].sort_values(
            ["conv_id", "session_start"]).reset_index(drop=True)
        if len(closed):
            # deterministic per-bucket file + atomic rename, exactly the
            # dataset engine's commit shape
            part = os.path.join(closed_dir, f"part-{bucket:05d}.parquet")
            closed.to_parquet(part + ".tmp", index=False)
            os.replace(part + ".tmp", part)
        return sessions[~closed_mask]

    _EXCHANGE_FNS = (split_by_bucket, reduce_bucket)
    return _EXCHANGE_FNS


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
        ray_cycle_threshold: int | None = None,
        cycle_engine: str = "dataset",
        pipeline_depth: int | None = None,
    ):
        self.input_dir = input_dir
        self.cp = Checkpoint(state_dir)
        self.gap_s = gap_s
        self.lateness_us = allowed_lateness_s * 1_000_000
        if cycle_engine not in ("dataset", "tasks"):
            raise ValueError(f"unknown cycle_engine: {cycle_engine!r}")
        if pipeline_depth is not None:
            self.PIPELINE_DEPTH = pipeline_depth
        elif os.environ.get("IMAGOR_RAY_PIPELINE_DEPTH"):
            # env fallback mirrors the flag > IMAGOR_RAY_* > default
            # resolution the other knobs get via EngineConfig
            self.PIPELINE_DEPTH = int(os.environ["IMAGOR_RAY_PIPELINE_DEPTH"])
        if os.environ.get("IMAGOR_RAY_PIPELINE_ROW_MAX"):
            self.PIPELINE_ROW_MAX = int(
                os.environ["IMAGOR_RAY_PIPELINE_ROW_MAX"])
        #: large-cycle execution engine: 'dataset' = fused
        #: groupby.map_groups shuffle; 'tasks' = raw two-stage hash
        #: exchange (same outputs, no per-cycle sort machinery)
        self.cycle_engine = cycle_engine
        if ray_cycle_threshold is not None:
            # instance override of the class default (config-bound knob)
            self.RAY_CYCLE_THRESHOLD = ray_cycle_threshold
        #: (fname, thread, holder) of an in-flight next-cycle raw read
        self._prefetch: dict = {}
        if os.environ.get("IMAGOR_RAY_PREFETCH_DEPTH"):
            self.PREFETCH_DEPTH = int(
                os.environ["IMAGOR_RAY_PREFETCH_DEPTH"])
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

    #: above this many rows the WHOLE cycle runs dataset-native —
    #: ``rd.read_parquet`` → late split → subclass processing → bucketed
    #: sessionize — with only session summaries, the late count and the
    #: watermark returning to the driver (nothing row-scale crosses it).
    #: Below it, driver pandas is faster: Ray per-stage overhead dominates
    #: tiny cycles. Both paths are asserted equivalent in tests.
    RAY_CYCLE_THRESHOLD = 150_000

    def run_cycle(self) -> dict | None:
        """Process the next micro-batch file; returns the cycle summary or
        None when the input is exhausted."""
        pending = self.pending_files()
        if not pending:
            return None
        fname = pending[0]
        state = self.cp.load()
        watermark = int(state.get("watermark_us", 0))
        cycle = int(state.get("cycles", 0))
        path = os.path.join(self.input_dir, fname)
        # read the snapshot COMMITTED by the checkpoint, never a staged one
        open_prev = self.cp.load_open_sessions(state)

        import pyarrow.dataset as pads

        # row count from parquet footers only — picks the execution path
        # without reading any data
        nrows = pads.dataset(path).count_rows()
        if nrows > self.RAY_CYCLE_THRESHOLD:
            runner = (self._cycle_tasks if self.cycle_engine == "tasks"
                      else self._cycle_dataset)
            still_open, closed_count, late_count, new_watermark = (
                runner(path, fname, watermark, cycle, open_prev)
            )
        else:
            still_open, closed_count, late_count, new_watermark = (
                self._cycle_pandas(path, fname, watermark, cycle, open_prev)
            )
        return self._commit_cycle(state, fname, cycle, still_open,
                                  closed_count, late_count, new_watermark,
                                  nrows - late_count)

    def _commit_cycle(self, state: dict, fname: str, cycle: int,
                      still_open: pd.DataFrame, closed_count: int,
                      late_count: int, new_watermark: int,
                      n_ontime: int) -> dict:
        """Single atomic commit point of a cycle: stage the post-cycle
        open-session snapshot under a cycle-versioned name (only visible
        once checkpoint.json records it — a crash between staging and
        ``cp.save`` replays the cycle against the pre-cycle snapshot,
        keeping the byte-identical-replay guarantee), then advance the
        checkpoint. Mutates ``state`` in place so a pipelined caller can
        keep committing against its own loaded copy."""
        open_fname = self.cp.stage_open_sessions(still_open, cycle)
        state["open_sessions_file"] = open_fname
        state["watermark_us"] = new_watermark
        state["processed"] = list(state.get("processed", [])) + [fname]
        state["late_rows"] = int(state.get("late_rows", 0)) + int(late_count)
        state["cycles"] = cycle + 1
        result = {
            "file": fname,
            "watermark_us": new_watermark,
            "rows": int(n_ontime),
            "closed": int(closed_count),
            "open": len(still_open),
            "late": int(late_count),
        }
        # per-cycle metrics ride in the checkpoint (lineage + metrics)
        state["cycle_metrics"] = list(state.get("cycle_metrics", [])) + [result]
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return result

    # -- cycle execution paths --------------------------------------------

    def _close_split(
        self, sessions: pd.DataFrame, new_watermark: int
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Split summaries into (closed, still_open) by the watermark,
        both sorted (conv_id, session_start) — the sort makes the staged
        snapshot and the closed output byte-stable even when the
        producing sessionize ran as a Ray groupby with nondeterministic
        row order."""
        end_us = np.asarray(ts_us(sessions["session_end"]))
        closed_mask = (end_us + self.gap_s * 1_000_000) < new_watermark
        closed = sessions[closed_mask].sort_values(
            ["conv_id", "session_start"]).reset_index(drop=True)
        still_open = sessions[~closed_mask].sort_values(
            ["conv_id", "session_start"]).reset_index(drop=True)
        return closed, still_open

    def _cycle_pandas(
        self, path, fname, watermark, cycle, open_prev
    ) -> tuple[pd.DataFrame, int, int, int]:
        """Driver-pandas cycle for small micro-batches. Returns
        ``(still_open, closed_count, late_count, new_watermark)``."""
        batch = pd.read_parquet(path)
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
        self._process_batch(batch, cycle)
        # watermark advance: max event time seen − allowed lateness
        new_watermark = max(
            watermark,
            (int(us.max()) - self.lateness_us) if len(us) else watermark,
        )

        # merge open sessions (carried summaries) with this batch's turns
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
        closed, still_open = self._close_split(sessions, new_watermark)
        if len(closed):
            out = os.path.join(self.closed_dir, f"closed-{cycle:05d}.parquet")
            if os.path.isdir(out):  # leftover from a crashed dataset-path run
                import shutil

                shutil.rmtree(out)
            closed.to_parquet(out, index=False)
        return still_open, len(closed), int(late_mask.sum()), new_watermark

    def _cycle_bucket_count(self) -> int:
        import ray

        return max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def _make_grouped_cycle_work(self, cycle: int):
        """Subclass hook for the fused dataset cycle: return a callable
        run INSIDE each bucket's grouped task with that bucket's on-time
        turn rows (full payload + ``_bucket``), or None for no extra
        work. The flagship returns its chain→exactly-once-partition-write
        leg here, so sink and sessionize share ONE shuffle."""
        return None

    @staticmethod
    def _footer_late_stats(path, wm: int):
        """Exact ``(late_count, total_rows, max_us)`` from parquet
        row-group zone maps — no data pass in the common case. A group
        with ``min_ts >= wm`` has zero late rows, one with
        ``max_ts < wm`` is entirely late; only groups straddling the
        watermark are scanned (ts column only, driver-side, bounded by
        how localized the late data is). Returns ``(None, 0, None)``
        when any group lacks ts statistics — the caller falls back to a
        distributed partials pass. ``max_us`` is None for an empty file.
        """
        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        def stat_us(v) -> int:
            if isinstance(v, (int, np.integer)):
                return int(v)
            return int(pd.Timestamp(v).value // 1000)

        total = 0
        late = 0
        max_us = None
        try:
            suspects: list[tuple[str, int]] = []
            for frag in pads.dataset(path).get_fragments():
                md = frag.metadata
                names = [md.schema.column(i).path
                         for i in range(md.num_columns)]
                ts_idx = names.index("ts")
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    stats = g.column(ts_idx).statistics
                    if stats is None or not stats.has_min_max:
                        return None, 0, None
                    lo, hi = stat_us(stats.min), stat_us(stats.max)
                    total += g.num_rows
                    max_us = hi if max_us is None else max(max_us, hi)
                    if lo >= wm:
                        continue
                    if hi < wm:
                        late += g.num_rows
                    else:
                        suspects.append((frag.path, rg))
            for fpath, rg in suspects:
                col = pq.ParquetFile(fpath).read_row_group(
                    rg, columns=["ts"])["ts"]
                unit = col.type.unit
                ts_i = col.cast(pa.int64()).to_numpy()
                if unit == "ns":
                    ts_i = ts_i // 1000  # integer div — no float precision loss
                elif unit == "ms":
                    ts_i = ts_i * 1000
                elif unit == "s":
                    ts_i = ts_i * 1_000_000
                late += int((ts_i < wm).sum())
        except Exception:
            return None, 0, None
        return late, total, max_us

    def _cycle_prelude(self, path, fname, wm):
        """Shared pre-shuffle work of the dataset and tasks cycle
        engines: pin the raw Arrow blocks (prefetched during the
        previous cycle, normally), resolve the late count + watermark
        advance WITHOUT a data pass (parquet row-group zone maps — a
        group with ``min_ts >= watermark`` has zero late rows, so the
        no-late common case runs ZERO pre-shuffle executions; only
        groups straddling the watermark are scanned, and a stats-less
        file falls back to ONE distributed partials pass — BENCH.md
        finding 19: the fixed per-cycle execution count is what bounds
        streaming scaling efficiency), and write the late rows out
        (rare). Returns ``(raw, late_count, new_watermark)``."""
        import ray
        import ray.data as _rd
        import pyarrow as pa
        import pyarrow.compute as pc

        raw = self._take_prefetched(fname)
        if raw is None:
            read_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
            # pin once: the stats pass, the (rare) late write and the
            # shuffle all read the same blocks
            raw = _rd.read_parquet(
                path, override_num_blocks=read_blocks).materialize()

        late_count, total_rows, max_us = self._footer_late_stats(path, wm)
        if late_count is None:
            def stats_partial(t: pa.Table) -> pa.Table:
                ts_i = _arrow_ts_us(t)
                late = pc.sum(pc.less(ts_i, pa.scalar(wm, pa.int64())))
                return pa.table({
                    "n": pa.array([t.num_rows], pa.int64()),
                    "late": pa.array([late.as_py() or 0], pa.int64()),
                    "max_us": pa.array([pc.max(ts_i).as_py()], pa.int64()),
                })

            stats = raw.map_batches(
                stats_partial, batch_format="pyarrow").to_pandas()
            late_count = int(stats["late"].sum())
            total_rows = int(stats["n"].sum())
            max_us = (int(stats["max_us"].max())
                      if late_count < total_rows else None)
        # watermark advance before the shuffle; max over all rows == max
        # over on-time rows for watermark purposes (late ts < old
        # watermark by definition)
        new_watermark = (
            max(wm, max_us - self.lateness_us)
            if (max_us is not None and late_count < total_rows) else wm
        )
        if late_count:
            late_path = os.path.join(self.late_dir, f"late-{fname}")
            # replay idempotency at directory granularity: a crashed
            # cycle's partial late output is replaced wholesale
            import shutil

            shutil.rmtree(late_path, ignore_errors=True)
            raw.map_batches(
                lambda t: t.filter(
                    pc.less(_arrow_ts_us(t), pa.scalar(wm, pa.int64()))),
                batch_format="pyarrow",
            ).write_parquet(late_path)
        return raw, late_count, new_watermark

    def _prepare_closed_dir(self, cycle: int) -> str:
        closed_dir = os.path.join(
            self.closed_dir, f"closed-{cycle:05d}.parquet")
        if os.path.isfile(closed_dir):
            # leftover single file from a crashed pandas-path run of this
            # cycle (threshold changed between runs); replaced wholesale
            os.remove(closed_dir)
        os.makedirs(closed_dir, exist_ok=True)
        return closed_dir

    @staticmethod
    def _finish_open_closed(still_open: pd.DataFrame, closed_dir: str):
        """Shared epilogue of the distributed cycle engines: stable-sort
        the still-open summaries and count the distributedly-written
        closed rows from footers."""
        import pyarrow.dataset as pads

        if len(still_open):
            still_open = still_open.sort_values(
                ["conv_id", "session_start"]).reset_index(drop=True)
        else:
            still_open = _empty_summaries()
        closed_count = (
            pads.dataset(closed_dir).count_rows()
            if os.listdir(closed_dir) else 0
        )
        if not os.listdir(closed_dir):
            os.rmdir(closed_dir)  # keep closed_sessions() listings clean
        return still_open, int(closed_count)

    @staticmethod
    def _split_summaries(open_prev: pd.DataFrame | None, nb: int) -> list:
        """Per-bucket slices of an open-session summary frame (crc32
        conv bucketing — the job's one partitioning key)."""
        from ..functions.hashing import crc32_bucket

        prev: list = [None] * nb
        if open_prev is not None and len(open_prev):
            pb = crc32_bucket(open_prev["conv_id"].to_numpy(), nb)
            for b in np.unique(pb):
                prev[int(b)] = open_prev[pb == b].reset_index(drop=True)
        return prev

    def _cycle_tasks(
        self, path, fname, watermark, cycle, open_prev
    ) -> tuple[pd.DataFrame, int, int, int]:
        """Raw two-stage hash-exchange cycle (``cycle_engine='tasks'``):
        byte-identical outputs to the dataset engine (asserted in
        tests), but the conv-bucket all-to-all runs as plain Ray tasks —
        map tasks split each pinned block into ``nb`` bucket shards
        (refs, not rows, return to the driver), reduce tasks concat
        their shards and run the same fused per-bucket work. No sort
        sampling, no boundary exchange, no per-cycle streaming-executor
        plan: the fixed cost a sub-second cycle pays under the dataset
        engine (BENCH.md finding 19/20). The prelude (pinned read,
        zone-map late stats, watermark, late write) is shared."""
        import ray

        wm = watermark
        nb = self._cycle_bucket_count()
        raw, late_count, new_watermark = self._cycle_prelude(path, fname, wm)
        split_fn, reduce_fn = _exchange_fns()

        refs = raw.to_arrow_refs()
        shards = [split_fn.options(num_returns=nb).remote(r, wm, nb)
                  for r in refs]

        # per-bucket slices of the carried open-session SUMMARIES (tiny —
        # bounded by conversations alive at the cycle boundary); shipped
        # straight into the owning reducer, which converts them to
        # pseudo-turn rows itself — the reducer-side convert is what lets
        # the pipelined loop chain reducer (N, b)'s output ObjectRef
        # directly into reducer (N+1, b) with no driver hop
        prev = self._split_summaries(open_prev, nb)
        work = self._make_grouped_cycle_work(cycle)
        closed_dir = self._prepare_closed_dir(cycle)
        opens = ray.get([
            reduce_fn.remote(b, new_watermark, self.gap_s, closed_dir,
                             work, prev[b], *[s[b] for s in shards])
            for b in range(nb)
        ])
        still_open = (pd.concat(opens, ignore_index=True)
                      if opens else _empty_summaries())
        still_open, closed_count = self._finish_open_closed(
            still_open, closed_dir)
        return still_open, closed_count, late_count, new_watermark

    def _cycle_dataset(
        self, path, fname, watermark, cycle, open_prev
    ) -> tuple[pd.DataFrame, int, int, int]:
        """Dataset-native cycle, fused to a single all-to-all:

        - the Arrow read is pinned ONCE via ``materialize()`` (by the
          prefetcher during the previous cycle, normally); a single
          partial-stats pass over the pinned blocks reduces per-batch
          (rows, late, max_ts) triples on the driver — late count and
          the watermark advance cost one execution, not three, and no
          block is rewritten (round-4: the fixed per-cycle execution
          count is what bounds streaming scaling efficiency,
          BENCH.md finding 19);
        - the watermark is known BEFORE the shuffle, so the close/open
          split distributes too; flag + conv-bucket assignment fuse
          into the shuffle's map side;
        - open-session summaries are injected as pseudo-turn rows
          (``ts = session_end``, carried ``_start``/``n_turns``,
          ``_prev`` marker) into the SAME conv-bucket shuffle;
        - one ``groupby(_bucket).map_groups`` then runs, per bucket, the
          subclass's chain→sink partition write (turn rows only), the
          vectorized sessionize (turn + pseudo-turn rows), AND the
          close split — CLOSED summaries are written distributedly as
          deterministic per-bucket files under
          ``closed-{cycle}.parquet/``; only the still-OPEN summaries
          (bounded by conversations alive at the cycle boundary) return
          to the driver. The flagship cycle pays exactly one shuffle
          end-to-end, like the batch flagship (BENCH.md: the fused
          reduce is the 100 TB shape), and nothing row-scale ever
          crosses the driver.

        Returns ``(still_open, closed_count, late_count,
        new_watermark)`` like the pandas path (asserted equivalent in
        tests). The watermark uses max over ALL event ts in the file:
        late rows can't raise it (their ts is below the old watermark by
        definition) so this equals the pandas path's on-time max."""
        import ray.data as _rd
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.hashing import crc32_bucket

        wm = watermark
        nb = self._cycle_bucket_count()
        _ts_us = _arrow_ts_us
        raw, late_count, new_watermark = self._cycle_prelude(path, fname, wm)
        base_schema = raw.schema().base_schema.append(
            pa.field("_bucket", pa.int32()))

        def ontime_prep(t: pa.Table) -> pa.Table:
            t = t.filter(
                pc.greater_equal(_ts_us(t), pa.scalar(wm, pa.int64())))
            conv = t["conv_id"].to_numpy(zero_copy_only=False)
            bucket = crc32_bucket(conv, nb).astype(np.int32)
            t = t.append_column("_bucket", pa.array(bucket, type=pa.int32()))
            n = t.num_rows
            t = t.append_column("n_turns", pa.array(np.ones(n, np.int64)))
            t = t.append_column("_start", t["ts"])
            return t.append_column("_prev", pa.array(np.zeros(n, np.bool_)))

        shuffled = raw.map_batches(ontime_prep, batch_format="pyarrow")

        if open_prev is not None and len(open_prev):
            # pseudo-turn rows matching the on-time schema exactly:
            # payload columns are null-padded (values never read — the
            # _prev marker keeps them out of the grouped sink work)
            fields = [f for f in base_schema if f.name != "_late"]
            n = len(open_prev)
            ends = pa.array(
                open_prev["session_end"].astype("datetime64[us]"),
                type=base_schema.field("ts").type,
            )
            pb = crc32_bucket(
                open_prev["conv_id"].to_numpy(), nb
            ).astype(np.int32)
            cols, names = [], []
            for f in fields:
                names.append(f.name)
                if f.name == "conv_id":
                    cols.append(pa.array(open_prev["conv_id"], type=f.type))
                elif f.name == "ts":
                    cols.append(ends)
                elif f.name == "_bucket":
                    cols.append(pa.array(pb, type=pa.int32()))
                else:
                    cols.append(pa.nulls(n, type=f.type))
            names += ["n_turns", "_start", "_prev"]
            cols += [
                pa.array(open_prev["n_turns"].astype("int64")),
                pa.array(
                    open_prev["session_start"].astype("datetime64[us]"),
                    type=base_schema.field("ts").type,
                ),
                pa.array(np.ones(n, np.bool_)),
            ]
            shuffled = shuffled.union(
                _rd.from_arrow(pa.table(cols, names=names))
            )

        # pandas dtypes the grouped work must see: groups containing
        # null-padded pseudo-turn rows degrade int columns to float64 on
        # arrow→pandas conversion; restore the clean-schema dtypes after
        # dropping the pseudo-turn rows
        dtype_map = (
            pa.schema([f for f in base_schema if f.name != "_late"])
            .empty_table().to_pandas().dtypes.to_dict()
        )
        work = self._make_grouped_cycle_work(cycle)
        gap_s = self.gap_s
        sess_fn = self._sessionize_with_start
        closed_dir = self._prepare_closed_dir(cycle)
        final_wm = new_watermark

        def fused(g: pd.DataFrame) -> pd.DataFrame:
            bucket = int(g["_bucket"].iloc[0])
            prev_mask = g["_prev"].to_numpy()
            if work is not None and not prev_mask.all():
                turns = (
                    g.loc[~prev_mask]
                    .drop(columns=["n_turns", "_start", "_prev"])
                    .reset_index(drop=True)
                    .astype(dtype_map)
                )
                work(turns)
            sessions = sess_fn(g[["conv_id", "ts", "n_turns", "_start"]], gap_s)
            end_us = np.asarray(ts_us(sessions["session_end"]))
            closed_mask = (end_us + gap_s * 1_000_000) < final_wm
            closed = sessions[closed_mask].sort_values(
                ["conv_id", "session_start"]).reset_index(drop=True)
            if len(closed):
                # deterministic per-bucket file + atomic rename: a
                # replayed cycle overwrites with identical bytes
                part = os.path.join(closed_dir, f"part-{bucket:05d}.parquet")
                closed.to_parquet(part + ".tmp", index=False)
                os.replace(part + ".tmp", part)
            return sessions[~closed_mask]

        still_open = (
            shuffled.groupby("_bucket")
            .map_groups(fused, batch_format="pandas")
            .to_pandas()
        )
        still_open, closed_count = self._finish_open_closed(
            still_open, closed_dir)
        return still_open, closed_count, late_count, new_watermark

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
        """Interval-hull sessionize carrying true session_start from
        re-injected open-session summaries: every row is an interval
        ``[_start, ts]`` (a turn is a point, ``_start == ts``; a
        summary spans its whole session). Rows sort by interval START
        and gap-check against the per-conv running hull END, which
        makes the kernel arrival-ORDER-INSENSITIVE: under allowed
        lateness an in-horizon turn that predates an open summary's
        end merges into it (and may bridge two open summaries of the
        same conv, which then merge before ever closing). Hull merging
        is exact — gap connectivity between point sets depends only on
        their min/max. With event-time-ordered input this reduces
        bit-for-bit to the ordered kernel: the (single) summary sorts
        first and every turn postdates its end, so the flags match
        the plain consecutive-diff computation."""
        df = (turns.sort_values(["conv_id", "_start", "ts"],
                                kind="mergesort")
              .reset_index(drop=True))
        if len(df) == 0:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_turns": pd.Series([], dtype="int64"),
            })
        s_us = ts_us(df["_start"])
        e_us = ts_us(df["ts"])
        conv = df["conv_id"].to_numpy()
        # per-conv running max of interval ends (integer-exact; the
        # value a global shift leaks across a conv boundary is masked
        # by the conv-change flag)
        hull = np.asarray(pd.Series(e_us)
                          .groupby(pd.Series(conv), sort=False).cummax(),
                          dtype="int64")
        prev_hull = np.empty_like(hull)
        prev_hull[0] = np.int64(-(1 << 62))
        prev_hull[1:] = hull[:-1]
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = ((conv[1:] != conv[:-1])
                   | (s_us[1:] > prev_hull[1:] + gap_s * 1_000_000))
        gsid = np.cumsum(new)
        return df.assign(_g=gsid).groupby("_g", sort=True).agg(
            conv_id=("conv_id", "first"),
            session_start=("_start", "min"),
            session_end=("ts", "max"),
            n_turns=("n_turns", "sum"),
        ).reset_index(drop=True)

    # -- read prefetch (pipelined cycles) ----------------------------------

    #: how many upcoming cycle files to pin ahead of the running cycle.
    #: One file is enough at LOW parallelism (cycle walls are long, the
    #: single prefetch always finishes in the shadow); at HIGH
    #: parallelism cycles are short and a single slot leaves the read
    #: on the critical path about every other cycle — depth 2 keeps the
    #: reader ahead at the cost of one extra pinned cycle in the object
    #: store (spills gracefully). Env: IMAGOR_RAY_PREFETCH_DEPTH.
    PREFETCH_DEPTH = 2

    def _start_prefetch(self, fname: str) -> None:
        """Pin an upcoming cycle's raw parquet blocks in a background
        thread while the current cycle's shuffle runs — bounded
        pipelining (PREFETCH_DEPTH files in flight), read-only, so
        replay semantics are untouched."""
        import threading

        import pyarrow.dataset as pads

        if fname in self._prefetch:
            return
        path = os.path.join(self.input_dir, fname)
        try:
            if pads.dataset(path).count_rows() <= self.RAY_CYCLE_THRESHOLD:
                return
        except Exception:
            return
        holder: dict = {}

        def work():
            try:
                import ray
                import ray.data as _rd

                blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
                holder["ds"] = _rd.read_parquet(
                    path, override_num_blocks=blocks
                ).materialize()
            except Exception as e:  # fall back to the inline read
                holder["err"] = e

        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._prefetch[fname] = (t, holder)

    def _start_prefetches(self, pending: list[str]) -> None:
        """Prefetch the next PREFETCH_DEPTH files beyond the current."""
        for f in pending[1:1 + self.PREFETCH_DEPTH]:
            self._start_prefetch(f)

    def _take_prefetched(self, fname: str):
        ent = self._prefetch.pop(fname, None)
        if ent is None:
            return None
        t, holder = ent
        t.join()
        return holder.get("ds")

    #: max cycles in flight under the pipelined tasks-engine loop (the
    #: oldest is committed before another launches). Depth 2 overlaps
    #: cycle N+1's read/split/launch with cycle N's reducer drain —
    #: the fixed per-cycle exchange cost stops serializing with compute
    #: (the round-4 streaming-scaling residue); deeper pipelines only
    #: add object-store pressure since per-bucket reducers chain anyway.
    PIPELINE_DEPTH = 2

    #: pipelining pays only while the per-cycle FIXED cost (prelude,
    #: split launch, reduce ramp) is a real fraction of the cycle —
    #: measured A/B at 16 CPUs (same window, interleaved): 1M-row
    #: cycles depth2/depth1 = 506k/386k t/s (+31%), 4M-row cycles
    #: 134k/243k and 220k/267k t/s (depth 2 LOSES 15-45%: a saturated
    #: cycle has no idle gaps to fill, so overlap only doubles the
    #: object-store working set). Cycles above this row count drain
    #: the pipeline and run the unpipelined committed path — same
    #: footer-only dispatch idiom as flagship_write(engine='auto').
    PIPELINE_ROW_MAX = 2_000_000

    def run_all(self) -> list[dict]:
        if self.cycle_engine == "tasks" and self.PIPELINE_DEPTH > 1:
            return self._run_all_pipelined()
        out = []
        while True:
            pending = self.pending_files()
            if not pending:
                break
            if len(pending) > 1:
                self._start_prefetches(pending)
            r = self.run_cycle()
            if r is None:
                break
            out.append(r)
        return out

    def _run_all_pipelined(self) -> list[dict]:
        """Pipelined tasks-engine loop: consecutive large cycles overlap.

        The per-cycle global barrier in :meth:`run_cycle` (``ray.get``
        on every reducer before the next cycle starts) is what bounds
        streaming scaling at high CPU counts — the driver-side prelude
        + split launch of cycle N+1 serialize behind cycle N's slowest
        reducer. Here they don't:

        - the watermark chain needs only parquet FOOTER stats
          (``_cycle_prelude``), so cycle N+1's watermark, late routing
          and split tasks launch without any cycle-N reduce result;
        - reducer (N+1, b) takes reducer (N, b)'s output ObjectRef as
          its ``prev_open`` directly (the reducer converts summaries to
          pseudo-turn rows itself) — the open-session carry never
          touches the driver between cycles, and each bucket's chain
          advances independently instead of waiting on the global
          straggler;
        - the CHECKPOINT still commits strictly in cycle order: the
          oldest in-flight cycle is ``ray.get``-drained and committed
          before cycle N+PIPELINE_DEPTH launches. A crash loses only
          uncommitted cycles, whose replay is byte-identical (atomic
          per-bucket renames + committed-bucket sink skip absorb the
          partially-written work) — same guarantee, same commit point.

        Small cycles (≤ RAY_CYCLE_THRESHOLD) and giant cycles
        (> PIPELINE_ROW_MAX, where overlap measured net-negative — see
        that attribute) drain the pipeline and run through the standard
        committed path; outputs stay byte-identical to the unpipelined
        engines (asserted in tests).
        """
        import ray
        import pyarrow.dataset as pads

        split_fn, reduce_fn = _exchange_fns()
        state = self.cp.load()
        wm = int(state.get("watermark_us", 0))
        cycle = int(state.get("cycles", 0))
        nb = self._cycle_bucket_count()
        done = set(state.get("processed", []))
        prev = self._split_summaries(self.cp.load_open_sessions(state), nb)

        results: list[dict] = []
        inflight: list[tuple] = []  # (fname, cycle, open_refs, late, wm, closed_dir, n_ontime)

        def commit_oldest():
            fn_, cyc_, refs_, late_, wm_, cdir_, n_on = inflight.pop(0)
            opens = ray.get(refs_)
            still_open = (pd.concat(opens, ignore_index=True)
                          if opens else _empty_summaries())
            still_open, closed_count = self._finish_open_closed(
                still_open, cdir_)
            results.append(self._commit_cycle(
                state, fn_, cyc_, still_open, closed_count, late_,
                wm_, n_on))

        while True:
            pending = [
                f for f in sorted(os.listdir(self.input_dir))
                if f.endswith(".parquet") and f not in done
            ]
            if not pending:
                break
            fname = pending[0]
            done.add(fname)
            path = os.path.join(self.input_dir, fname)
            nrows = pads.dataset(path).count_rows()
            if (nrows <= self.RAY_CYCLE_THRESHOLD
                    or nrows > self.PIPELINE_ROW_MAX):
                # small cycle → pandas path needs materialized carry
                # state; GIANT cycle → pipelining measured net-negative
                # (see PIPELINE_ROW_MAX): drain, run through the
                # committed unpipelined path, resync
                while inflight:
                    commit_oldest()
                r = self.run_cycle()
                if r is None:
                    break
                results.append(r)
                state = self.cp.load()
                wm = int(state.get("watermark_us", 0))
                cycle = int(state.get("cycles", 0))
                prev = self._split_summaries(
                    self.cp.load_open_sessions(state), nb)
                continue

            if len(pending) > 1:
                self._start_prefetches(pending)
            raw, late_count, new_wm = self._cycle_prelude(path, fname, wm)
            refs = raw.to_arrow_refs()
            shards = [split_fn.options(num_returns=nb).remote(r, wm, nb)
                      for r in refs]
            work = self._make_grouped_cycle_work(cycle)
            closed_dir = self._prepare_closed_dir(cycle)
            open_refs = [
                reduce_fn.remote(b, new_wm, self.gap_s, closed_dir,
                                 work, prev[b], *[s[b] for s in shards])
                for b in range(nb)
            ]
            inflight.append((fname, cycle, open_refs, late_count, new_wm,
                             closed_dir, nrows - late_count))
            prev = open_refs  # chain per-bucket refs into the next cycle
            wm = new_wm
            cycle += 1
            while len(inflight) >= self.PIPELINE_DEPTH:
                commit_oldest()

        while inflight:
            commit_oldest()
        return results

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
        """Hook for subclasses (driver-pandas cycles); the base job only
        sessionizes. Dataset-native cycles use
        :meth:`_make_grouped_cycle_work` instead."""

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
        ray_cycle_threshold: int | None = None,
        cycle_engine: str = "dataset",
    ):
        super().__init__(input_dir, state_dir, gap_s, allowed_lateness_s,
                         ray_cycle_threshold=ray_cycle_threshold,
                         cycle_engine=cycle_engine)
        from ..stages.parse_sign import DEFAULT_SECRET

        self.secret = secret or DEFAULT_SECRET
        self.num_buckets = num_buckets
        self.processed_dir = os.path.join(state_dir, "processed_turns")
        os.makedirs(self.processed_dir, exist_ok=True)

    def _make_proc(self):
        """The per-batch chain leg (parse/sign → filter chain → tool
        enrich) shared by both cycle paths; closure state is plain dicts
        so it ships to workers once per task."""
        from ..pipelines.flagship import snippet_dim
        from ..sources.transcripts import enrich_tool_columns, tool_kind_cost_maps
        from ..stages.chain import filter_chain_batch
        from ..stages.parse_sign import parse_sign_batch

        kind_map, cost_map = tool_kind_cost_maps()
        dim = snippet_dim()
        secret = self.secret

        def proc(b: pd.DataFrame) -> pd.DataFrame:
            b = parse_sign_batch(b.copy(), secret=secret)
            b = filter_chain_batch(b, dim_ref=dim, path_col="chain_path")
            b = enrich_tool_columns(b, kind_map, cost_map)
            return b.drop(columns=["chain_path", "sig_ok"], errors="ignore")

        return proc

    def _cycle_sink(self, cycle: int):
        from ..state.sink import ExactlyOnceSink

        return ExactlyOnceSink(
            os.path.join(self.processed_dir, f"cycle-{cycle:05d}"),
            num_buckets=self.num_buckets,
        )

    def _process_batch(self, batch: pd.DataFrame, cycle: int) -> None:
        if len(batch) == 0:
            return
        import ray as _ray
        import ray.data as _rd

        # from_pandas(df) yields ONE block — split the cycle into
        # CPU-count chunks so the chain stage actually parallelizes
        batch = batch.reset_index(drop=True)
        n_chunks = max(1, min(
            int(_ray.cluster_resources().get("CPU", 8)) * 2,
            len(batch) // 8192 + 1,
        ))
        chunks = np.array_split(batch, n_chunks)
        ds = _rd.from_pandas([c.reset_index(drop=True) for c in chunks]).map_batches(
            self._make_proc(), batch_format="pandas"
        )
        self._cycle_sink(cycle).write(ds)

    def _cycle_bucket_count(self) -> int:
        # ONE bucket key serves both the sink partitions and the
        # sessionize groups in the fused dataset cycle
        return self.num_buckets

    def _make_grouped_cycle_work(self, cycle: int):
        proc = self._make_proc()
        sink = self._cycle_sink(cycle)
        os.makedirs(sink.manifest_dir, exist_ok=True)

        def work(turns: pd.DataFrame) -> None:
            bucket = turns["_bucket"].iloc[0]
            g = proc(turns.drop(columns=["_bucket"]))
            g["_bucket"] = bucket
            # committed buckets skip inside (replayed cycles are
            # idempotent; the rows still flowed here for sessionize)
            sink.write_partition_df(g)

        return work

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
