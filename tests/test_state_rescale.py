"""Checkpoint rescaling — the Flink-savepoint property: a streaming
job resumed from a committed checkpoint with a DIFFERENT parallelism
(num_buckets) and/or a different cycle engine must produce the same
emission rows. The engine's state snapshots are bucket-agnostic
frames (bucket assignment happens per cycle from the current config),
so rescaling mid-stream is a restart, not a migration — these tests
pin that as a guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd

HOUR = 3600 * 1_000_000


def _stage(tmp_path, batches, name="in"):
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(batches):
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                         "event_type", "value"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df.to_parquet(d / f"batch-{i:03d}.parquet", index=False)
    return str(d)


def _random_batches(seed: int, cycles: int = 4, rows: int = 60):
    rng = np.random.RandomState(seed)
    batches, eid = [], 0
    for c in range(cycles):
        out = []
        for _ in range(rows):
            out.append((eid, c * 24 * HOUR + int(
                rng.randint(0, 24) * HOUR) + eid,
                int(rng.randint(0, 6)),
                str(rng.choice(["click", "purchase", "view"])),
                float(rng.randint(0, 100))))
            eid += 1
        batches.append(out)
    return batches


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    cols = list(df.columns)
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


class TestStateRescale:
    def test_temporal_join_rescale_and_engine_switch(self, ray_session,
                                                     tmp_path):
        from imagor_ray.pipelines.temporal_join import TemporalJoinJob

        batches = _random_batches(41)
        ia = _stage(tmp_path, batches, "a")
        ib = _stage(tmp_path, batches, "b")

        ref = TemporalJoinJob(ia, str(tmp_path / "ref"),
                              ray_cycle_threshold=10**9)
        ref.run_all(); ref.finalize()

        # two cycles at 4 buckets (dataset engine), resume the SAME
        # checkpoint at 7 buckets, then finish on the pandas engine
        j1 = TemporalJoinJob(ib, str(tmp_path / "re"),
                             ray_cycle_threshold=0, num_buckets=4)
        j1.run_cycle(); j1.run_cycle()
        j2 = TemporalJoinJob(ib, str(tmp_path / "re"),
                             ray_cycle_threshold=0, num_buckets=7)
        j2.run_cycle()
        j3 = TemporalJoinJob(ib, str(tmp_path / "re"),
                             ray_cycle_threshold=10**9)
        j3.run_all(); j3.finalize()

        pd.testing.assert_frame_equal(
            _sorted_frame(ref.emitted()), _sorted_frame(j3.emitted()))

    def test_stream_join_rescale(self, ray_session, tmp_path):
        from imagor_ray.pipelines.stream_join import StreamingJoinJob

        batches = _random_batches(43)
        ia = _stage(tmp_path, batches, "a")
        ib = _stage(tmp_path, batches, "b")

        def collect(job):
            import os
            parts = [pd.read_parquet(os.path.join(job.matched_dir, f))
                     for f in sorted(os.listdir(job.matched_dir))
                     if f.endswith(".parquet")]
            return _sorted_frame(pd.concat(parts, ignore_index=True))

        ref = StreamingJoinJob(ia, str(tmp_path / "ref"),
                               ray_cycle_threshold=10**9)
        ref.run_all(); ref.finalize()

        j1 = StreamingJoinJob(ib, str(tmp_path / "re"),
                              ray_cycle_threshold=0, num_buckets=3)
        j1.run_cycle(); j1.run_cycle()
        j2 = StreamingJoinJob(ib, str(tmp_path / "re"),
                              ray_cycle_threshold=0, num_buckets=8)
        j2.run_all(); j2.finalize()

        pd.testing.assert_frame_equal(collect(ref), collect(j2))

    def test_broadcast_rules_rescale(self, ray_session, tmp_path):
        from imagor_ray.pipelines.broadcast_rules import BroadcastRulesJob

        batches = _random_batches(47)
        ia = _stage(tmp_path, batches, "a")
        ib = _stage(tmp_path, batches, "b")

        ref = BroadcastRulesJob(ia, str(tmp_path / "ref"),
                                ray_cycle_threshold=10**9)
        ref.run_all(); ref.finalize()

        j1 = BroadcastRulesJob(ib, str(tmp_path / "re"),
                               ray_cycle_threshold=0, num_buckets=4)
        j1.run_cycle(); j1.run_cycle()
        j2 = BroadcastRulesJob(ib, str(tmp_path / "re"),
                               ray_cycle_threshold=0, num_buckets=9)
        j2.run_all(); j2.finalize()

        pd.testing.assert_frame_equal(
            _sorted_frame(ref.emitted()), _sorted_frame(j2.emitted()))

    def test_stream_dedup_rescale(self, ray_session, tmp_path):
        from imagor_ray.pipelines.stream_dedup import StreamingDedupJob

        batches = _random_batches(53, cycles=4, rows=80)
        ia = _stage(tmp_path, batches, "a")
        ib = _stage(tmp_path, batches, "b")

        ref = StreamingDedupJob(ia, str(tmp_path / "ref"),
                                ray_cycle_threshold=10**9)
        ref.run_all()

        j1 = StreamingDedupJob(ib, str(tmp_path / "re"),
                               ray_cycle_threshold=0, num_buckets=4)
        j1.run_cycle(); j1.run_cycle()
        j2 = StreamingDedupJob(ib, str(tmp_path / "re"),
                               ray_cycle_threshold=0, num_buckets=11)
        j2.run_all()

        pd.testing.assert_frame_equal(
            _sorted_frame(ref.emitted()), _sorted_frame(j2.emitted()))
