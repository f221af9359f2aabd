"""UPDATE-mode changelog job: retraction emission, the fold contract
(changelog consumer view == batch aggregate), watermark eviction,
crash-replay byte identity, late routing. Oracle value parity of the
full staged run lives in test_oracle_parity."""
from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

DAY = 86_400 * 1_000_000
WEEK = 7 * DAY
# Monday-aligned week grid (DuckDB date_trunc('week') parity)
MON = 4 * DAY


def _stage(tmp_path, batches):
    d = tmp_path / "in"
    d.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(batches):
        df = pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df.to_parquet(d / f"batch-{i:03d}.parquet", index=False)
    return str(d)


def _job(tmp_path, inp, name, **kw):
    from imagor_ray.pipelines.changelog import StreamingChangelogJob
    return StreamingChangelogJob(inp, str(tmp_path / name), **kw)


def _sha(job) -> str:
    h = hashlib.sha1()
    for f in sorted(os.listdir(job.changelog_dir)):
        with open(os.path.join(job.changelog_dir, f), "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    return h.hexdigest()


class TestRetractions:
    def test_window_updated_across_cycles_retracts(self, ray_session,
                                                   tmp_path):
        # same Monday-week window touched by two day cycles
        inp = _stage(tmp_path, [
            [(1, MON + 1, "click"), (2, MON + 2, "click")],
            [(3, MON + DAY, "click")],
        ])
        job = _job(tmp_path, inp, "r1")
        t = job.run_all()
        ch = job.changelog()
        # cycle 0: insert n=2; cycle 1: retract n=2, insert n=3
        assert t["retractions"] == 1
        rows = [(int(r.cycle), int(r.op), int(r.n))
                for r in ch.itertuples()]
        assert rows == [(0, 1, 2), (1, -1, 2), (1, 1, 3)]

    def test_untouched_window_emits_nothing(self, ray_session, tmp_path):
        inp = _stage(tmp_path, [
            [(1, MON + 1, "click")],
            [(2, MON + 3 * WEEK, "view")],   # far future, other window
        ])
        job = _job(tmp_path, inp, "r2")
        job.run_all()
        ch = job.changelog()
        c1 = ch[ch["cycle"] == 1]
        # cycle 1 touches only the new window — no rows for the old one
        assert set(c1["key"]) == {"view"} and (c1["op"] == 1).all()

    def test_fold_equals_batch_aggregate(self, ray_session, tmp_path):
        import numpy as np
        rng = np.random.RandomState(7)
        batches, eid = [], 0
        for c in range(8):
            rows = []
            for _ in range(50):
                rows.append((eid, c * DAY + int(rng.randint(0, DAY)),
                             str(rng.choice(["click", "view", "buy"]))))
                eid += 1
            batches.append(rows)
        inp = _stage(tmp_path, batches)
        job = _job(tmp_path, inp, "r3")
        job.run_all()
        folded = job.folded()
        flat = pd.DataFrame(
            [r for b in batches for r in b],
            columns=["event_id", "ts", "event_type"])
        flat["win_us"] = ((flat["ts"] - MON) // WEEK) * WEEK + MON
        exp = (flat.groupby(["win_us", "event_type"]).size()
               .reset_index(name="n")
               .rename(columns={"event_type": "key"})
               .sort_values(["win_us", "key"]).reset_index(drop=True))
        got = folded.astype({"n": "int64"})
        assert list(got["win_us"]) == list(exp["win_us"])
        assert list(got["key"]) == list(exp["key"])
        assert list(got["n"]) == list(exp["n"])


class TestStateAndReplay:
    def test_state_evicts_closed_windows(self, ray_session, tmp_path):
        inp = _stage(tmp_path, [
            [(1, MON + 1, "click")],
            [(2, MON + 5 * WEEK, "click")],   # watermark passes window 0
        ])
        job = _job(tmp_path, inp, "s1")
        r0 = job.run_cycle()
        r1 = job.run_cycle()
        assert r0["state_rows"] == 1
        assert r1["state_rows"] == 1          # old window evicted
        st = job.cp.load_open_sessions()
        assert list(st["win_us"]) == [MON + 5 * WEEK]

    def test_replay_after_crashed_commit_same_bytes(self, ray_session,
                                                    tmp_path):
        inp = _stage(tmp_path, [
            [(1, MON + 1, "click"), (2, MON + 9, "view")],
            [(3, MON + DAY, "click")],
        ])
        job = _job(tmp_path, inp, "s2")
        job.run_cycle()
        orig_save = job.cp.save
        job.cp.save = lambda state: (_ for _ in ()).throw(
            OSError("injected crash before commit"))
        with pytest.raises(OSError):
            job.run_cycle()
        crashed_sha = _sha(job)
        job.cp.save = orig_save
        fresh = _job(tmp_path, inp, "s2")
        fresh.run_all()
        assert _sha(fresh) == crashed_sha
        assert len(fresh.cp.load()["processed"]) == 2

    def test_late_rows_routed_not_counted(self, ray_session, tmp_path):
        inp = _stage(tmp_path, [
            [(1, MON + 5 * WEEK, "click")],   # advances watermark far
            [(2, MON + 1, "click")],          # late
        ])
        job = _job(tmp_path, inp, "s3")
        t = job.run_all()
        assert t["late"] == 1
        ch = job.changelog()
        # the late click never entered any window aggregate
        assert int(ch[ch["op"] == 1]["n"].sum()) == 1
        late = pd.read_parquet(
            os.path.join(job.late_dir, "late-00001.parquet"))
        assert list(late["event_id"]) == [2]
