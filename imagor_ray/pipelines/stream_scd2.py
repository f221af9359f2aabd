"""Streaming SCD type-2 changelog — the continuous form of
``grouped_extras.scd2_dimension``: micro-batch cycles maintain each
user's OPEN dimension version (tracked attribute = event_type) and emit
a retraction-aware changelog of version rows as attribute changes
become watermark-final.

Op grammar (the warehouse SCD2 maintenance protocol): a user's first
event opens version 1 (``+1`` open row, ``valid_to_us = -1``); each
attribute CHANGE at instant ``t`` emits THREE ops — ``-1`` retracting
the previous open row, ``+1`` inserting it closed (``valid_to_us = t``)
and ``+1`` opening the next version at ``t``. Folding the ops (net +1
rows) reproduces the batch dimension exactly.

Exactness rests on watermark-GATED processing (the StreamingCepJob
discipline): an event enters the version kernel only once ``ts < wm``
— version boundaries are order-sensitive, so buffered rows never
process early; carried register timestamps are strictly below every
ready row's ts (processed means ``ts < wm`` at an earlier watermark),
so a register re-enters the run scan as the user's first row without
tie games. Because the kernel is incremental and exact, the emitted op
STREAM is a pure function of each user's global ``(ts, event_id)``
order — cycle boundaries (and bounded out-of-order arrival under a
lateness horizon) never change it, which is what the
``scd2_changelog_outoforder`` entry certifies against the SAME oracle.

State per user is ONE register row (version, attr, valid_from) plus
the watermark buffer — aggregate-domain-sized, never stream-sized.
Late rows (``ts < wm`` at arrival) route to the late output and never
touch state. Per-cycle op files commit BEFORE the single checkpoint
save (crash replay overwrites identical bytes); snapshots are
bucket-agnostic (the rescaling guarantee).

Scale shape: above ``RAY_CYCLE_THRESHOLD`` footer rows the cycle runs
as one user-bucket ``groupby().map_groups`` over (registers ∪ buffer ∪
new) — registers and buffers are user-keyed, so buckets are
version-complete; each grouped task writes its bucket's op + late
files in-task and returns state + summary rows only. Below it, driver
pandas with the SAME kernel; both paths byte-equal by test.

Reference semantics: the result-storage freshness/overwrite contract
(``imagor.go:605-652``) generalized to versioned dimension rows;
SURVEY §2.6 window/changelog family.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..state.checkpoint import Checkpoint

__all__ = ["StreamingScd2Job"]

_STATE_COLS = ["side", "user_id", "version", "attr", "valid_from_us",
               "event_id", "ts_us"]

_OPS_COLS = ["user_id", "op", "version", "attr", "valid_from_us",
             "valid_to_us", "change_ts_us"]


def _empty_reg() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "version": pd.Series([], dtype="int64"),
        "attr": pd.Series([], dtype=object),
        "valid_from_us": pd.Series([], dtype="int64"),
    })


def _empty_buf() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
        "attr": pd.Series([], dtype=object),
    })


def _empty_ops() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "op": pd.Series([], dtype="int64"),
        "version": pd.Series([], dtype="int64"),
        "attr": pd.Series([], dtype=object),
        "valid_from_us": pd.Series([], dtype="int64"),
        "valid_to_us": pd.Series([], dtype="int64"),
        "change_ts_us": pd.Series([], dtype="int64"),
    })


def _scd2_cycle_kernel(reg: pd.DataFrame, ready: pd.DataFrame
                       ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One watermark sweep: fold ``ready`` (columns user_id, event_id,
    ts_us, attr — all provably final) into the per-user registers.
    Returns ``(ops, next registers)``.

    Registers re-enter the run scan as synthetic first rows
    (event_id -1, ts = the open version's valid_from, strictly below
    every ready ts); the island split is ONE vectorized boundary diff
    — no per-user loop."""
    if not len(ready):
        return _empty_ops(), reg.reset_index(drop=True)

    parts = []
    if len(reg):
        parts.append(pd.DataFrame({
            "user_id": reg["user_id"].to_numpy(dtype="int64"),
            "event_id": np.full(len(reg), -1, dtype="int64"),
            "ts_us": reg["valid_from_us"].to_numpy(dtype="int64"),
            "attr": reg["attr"].to_numpy(),
            "_v0": reg["version"].to_numpy(dtype="int64"),
        }))
    parts.append(ready.assign(_v0=np.int64(0)))
    rows = (pd.concat(parts, ignore_index=True)
            .sort_values(["user_id", "ts_us", "event_id"],
                         kind="mergesort").reset_index(drop=True))
    u = rows["user_id"].to_numpy(dtype="int64")
    t = rows["ts_us"].to_numpy(dtype="int64")
    a = rows["attr"].to_numpy()
    v0 = rows["_v0"].to_numpy(dtype="int64")
    n = len(rows)

    new_user = np.ones(n, dtype=bool)
    if n > 1:
        new_user[1:] = u[1:] != u[:-1]
    new_run = new_user.copy()
    if n > 1:
        new_run[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(new_run)
    ru = u[starts]
    first_of_user = np.ones(len(starts), dtype=bool)
    if len(starts) > 1:
        first_of_user[1:] = ru[1:] != ru[:-1]
    # base version: the register's version for stateful users (the
    # register row is its user's first run — its ts is strictly below
    # every ready ts), 1 for brand-new users. Broadcast down each
    # user via the index gather (indices ARE monotone; the version
    # values are not, so accumulating them directly would leak a
    # larger version across user boundaries)
    fidx = np.maximum.accumulate(
        np.where(first_of_user, np.arange(len(starts)), 0))
    base = np.where(v0[starts] > 0, v0[starts], 1)[fidx]
    version = base + (np.arange(len(starts)) - fidx)
    vfrom = t[starts]
    attr = a[starts]
    is_reg_run = first_of_user & (v0[starts] > 0)

    # ops: run 1 of a brand-new user opens; run i>=2 retracts + closes
    # run i-1 and opens run i (prev-run info via one shift)
    prev_ok = ~first_of_user
    open_new = ~is_reg_run            # every non-register run opens
    op_frames = []
    if open_new.any():
        op_frames.append(pd.DataFrame({
            "user_id": ru[open_new],
            "op": np.ones(int(open_new.sum()), dtype="int64"),
            "version": version[open_new],
            "attr": attr[open_new],
            "valid_from_us": vfrom[open_new],
            "valid_to_us": np.full(int(open_new.sum()), -1, dtype="int64"),
            "change_ts_us": vfrom[open_new],
        }))
    if prev_ok.any():
        idx = np.flatnonzero(prev_ok)
        pv, pa, pf = version[idx - 1], attr[idx - 1], vfrom[idx - 1]
        ct = vfrom[idx]
        op_frames.append(pd.DataFrame({
            "user_id": ru[idx], "op": np.full(len(idx), -1, dtype="int64"),
            "version": pv, "attr": pa, "valid_from_us": pf,
            "valid_to_us": np.full(len(idx), -1, dtype="int64"),
            "change_ts_us": ct,
        }))
        op_frames.append(pd.DataFrame({
            "user_id": ru[idx], "op": np.ones(len(idx), dtype="int64"),
            "version": pv, "attr": pa, "valid_from_us": pf,
            "valid_to_us": ct, "change_ts_us": ct,
        }))
    ops = (pd.concat(op_frames, ignore_index=True)[_OPS_COLS]
           if op_frames else _empty_ops())
    ops = ops.sort_values(
        ["user_id", "change_ts_us", "version", "op"],
        kind="mergesort").reset_index(drop=True)

    # next registers: each user's LAST run
    last_run = np.ones(len(starts), dtype=bool)
    if len(starts) > 1:
        last_run[:-1] = ru[:-1] != ru[1:]
    new_reg = pd.DataFrame({
        "user_id": ru[last_run],
        "version": version[last_run],
        "attr": attr[last_run],
        "valid_from_us": vfrom[last_run],
    }).sort_values("user_id", kind="mergesort").reset_index(drop=True)
    return ops, new_reg


class StreamingScd2Job:
    """Micro-batch streaming SCD2 changelog with watermark-gated
    processing (module docstring has the full semantics)."""

    RAY_CYCLE_THRESHOLD = 150_000

    def __init__(self, input_dir: str, state_dir: str,
                 allowed_lateness_s: int = 0, num_buckets: int = 32,
                 ray_cycle_threshold: int | None = None):
        self.input_dir = input_dir
        self.cp = Checkpoint(state_dir)
        self.lateness_us = allowed_lateness_s * 1_000_000
        self.num_buckets = num_buckets
        if ray_cycle_threshold is not None:
            self.RAY_CYCLE_THRESHOLD = ray_cycle_threshold
        self.ops_dir = os.path.join(state_dir, "ops")
        self.late_dir = os.path.join(state_dir, "late")
        os.makedirs(self.ops_dir, exist_ok=True)
        os.makedirs(self.late_dir, exist_ok=True)

    def pending_files(self) -> list[str]:
        state = self.cp.load()
        done = set(state.get("processed", []))
        return [f for f in sorted(os.listdir(self.input_dir))
                if f.endswith(".parquet") and f not in done]

    # -- state packing ------------------------------------------------
    def _load_state(self, state: dict
                    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        st = self.cp.load_open_sessions(state)
        if st is None or not len(st):
            return _empty_reg(), _empty_buf()
        reg = (st[st["side"] == 0]
               [["user_id", "version", "attr", "valid_from_us"]]
               .reset_index(drop=True))
        buf = (st[st["side"] == 1]
               [["user_id", "event_id", "ts_us", "attr"]]
               .reset_index(drop=True))
        return reg, buf

    @staticmethod
    def _pack_state(reg: pd.DataFrame, buf: pd.DataFrame) -> pd.DataFrame:
        r = reg.assign(side=np.int8(0), event_id=np.int64(-1),
                       ts_us=np.int64(-1))
        b = buf.assign(side=np.int8(1), version=np.int64(-1),
                       valid_from_us=np.int64(-1))
        return (pd.concat([r[_STATE_COLS], b[_STATE_COLS]],
                          ignore_index=True)
                .sort_values(["side", "user_id", "event_id", "ts_us"],
                             kind="mergesort")
                .reset_index(drop=True))

    def _write(self, df: pd.DataFrame, dirpath: str, name: str) -> None:
        tmp = os.path.join(dirpath, name)
        df.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)

    # -- per-cycle machinery -------------------------------------------
    def _cycle_pandas(self, path: str, wm: int, cycle: int,
                      reg: pd.DataFrame, buf: pd.DataFrame, new_wm: int):
        df = pd.read_parquet(
            path, columns=["event_id", "ts", "user_id", "event_type"])
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        late = us < wm
        self._write(pd.DataFrame({
            "event_id": df["event_id"].to_numpy(dtype="int64")[late],
            "ts": pd.Series(us[late]).astype("datetime64[us]"),
        }).sort_values("event_id", kind="mergesort")
            .reset_index(drop=True), self.late_dir,
            f"late-{cycle:05d}.parquet")
        new = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype="int64")[~late],
            "event_id": df["event_id"].to_numpy(dtype="int64")[~late],
            "ts_us": us[~late],
            "attr": df["event_type"].to_numpy()[~late],
        })
        pool = pd.concat([buf, new], ignore_index=True)
        ready_m = pool["ts_us"].to_numpy(dtype="int64") < new_wm
        ops, new_reg = _scd2_cycle_kernel(reg, pool[ready_m])
        self._write(ops, self.ops_dir, f"ops-{cycle:05d}.parquet")
        hold = (pool[~ready_m]
                .sort_values(["user_id", "event_id"], kind="mergesort")
                .reset_index(drop=True))
        return len(ops), int(late.sum()), new_reg, hold

    def _cycle_dataset(self, path: str, wm: int, cycle: int,
                       reg: pd.DataFrame, buf: pd.DataFrame, new_wm: int):
        """User-bucket grouped cycle: each task folds its bucket's
        (registers ∪ buffer ∪ new) rows through the kernel and writes
        its bucket's op + late files; state + summary rows return."""
        import ray.data as rd

        nb = self.num_buckets
        odir, ldir = self.ops_dir, self.late_dir

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            uid = b["user_id"].to_numpy(dtype="int64")
            out = pd.DataFrame({
                "side": np.full(len(b), 2, dtype=np.int8),
                "user_id": uid,
                "version": np.full(len(b), -1, dtype="int64"),
                "attr": b["event_type"].to_numpy(),
                "valid_from_us": np.full(len(b), -1, dtype="int64"),
                "event_id": b["event_id"].to_numpy(dtype="int64"),
                "ts_us": us,
            })
            out["_ub"] = (uid % nb).astype(np.int32)
            return out

        st = self._pack_state(reg, buf)
        st["_ub"] = (st["user_id"].to_numpy(dtype="int64")
                     % nb).astype(np.int32)
        st = st[_STATE_COLS + ["_ub"]]

        def bucket(g: pd.DataFrame) -> pd.DataFrame:
            ub = int(g["_ub"].iloc[0])
            side = g["side"].to_numpy()
            breg = (g[side == 0]
                    [["user_id", "version", "attr", "valid_from_us"]]
                    .reset_index(drop=True))
            bbuf = (g[side == 1]
                    [["user_id", "event_id", "ts_us", "attr"]]
                    .reset_index(drop=True))
            new = g[side == 2]
            us = new["ts_us"].to_numpy(dtype="int64")
            late = us < wm
            lrows = pd.DataFrame({
                "event_id": new["event_id"].to_numpy(dtype="int64")[late],
                "ts": pd.Series(us[late]).astype("datetime64[us]"),
            }).sort_values("event_id", kind="mergesort")
            ltmp = os.path.join(ldir, f"late-{cycle:05d}-{ub:02d}.parquet")
            lrows.reset_index(drop=True).to_parquet(ltmp + ".tmp",
                                                    index=False)
            os.replace(ltmp + ".tmp", ltmp)
            pool = pd.concat([bbuf, pd.DataFrame({
                "user_id": new["user_id"].to_numpy(dtype="int64")[~late],
                "event_id": new["event_id"].to_numpy(dtype="int64")[~late],
                "ts_us": us[~late],
                "attr": new["attr"].to_numpy()[~late],
            })], ignore_index=True)
            ready_m = pool["ts_us"].to_numpy(dtype="int64") < new_wm
            ops, nreg = _scd2_cycle_kernel(breg, pool[ready_m])
            otmp = os.path.join(odir, f"ops-{cycle:05d}-{ub:02d}.parquet")
            ops.to_parquet(otmp + ".tmp", index=False)
            os.replace(otmp + ".tmp", otmp)
            nxt = StreamingScd2Job._pack_state(
                nreg, pool[~ready_m].reset_index(drop=True))
            nxt = nxt.assign(kind=np.int8(0), n_ops=np.int64(0),
                             n_late=np.int64(0))
            summ = pd.DataFrame({
                "side": [np.int8(-1)], "user_id": [np.int64(-1)],
                "version": [np.int64(-1)], "attr": [""],
                "valid_from_us": [np.int64(-1)],
                "event_id": [np.int64(-1)], "ts_us": [np.int64(-1)],
                "kind": [np.int8(1)],
                "n_ops": [np.int64(len(ops))],
                "n_late": [np.int64(int(late.sum()))],
            })
            cols = _STATE_COLS + ["kind", "n_ops", "n_late"]
            return pd.concat([nxt[cols], summ[cols]], ignore_index=True)

        ds = rd.read_parquet(
            path, columns=["event_id", "ts", "user_id", "event_type"])
        tagged = ds.map_batches(tag, batch_format="pandas")
        if len(st):
            tagged = tagged.union(rd.from_pandas(st))
        out = (tagged.groupby("_ub")
               .map_groups(bucket, batch_format="pandas")
               .to_pandas())
        if not len(out):
            return 0, 0, _empty_reg(), _empty_buf()
        summ = out[out["kind"] == 1]
        body = out[out["kind"] == 0]
        nreg = (body[body["side"] == 0]
                [["user_id", "version", "attr", "valid_from_us"]]
                .sort_values("user_id", kind="mergesort")
                .reset_index(drop=True))
        nbuf = (body[body["side"] == 1]
                [["user_id", "event_id", "ts_us", "attr"]]
                .sort_values(["user_id", "event_id"], kind="mergesort")
                .reset_index(drop=True))
        return (int(summ["n_ops"].sum()), int(summ["n_late"].sum()),
                nreg, nbuf)

    @staticmethod
    def _file_max_ts(path: str) -> int:
        from .stream_join import StreamingJoinJob
        return StreamingJoinJob._file_max_ts(path)

    # -- driver loop ---------------------------------------------------
    def run_cycle(self) -> dict | None:
        pending = self.pending_files()
        if not pending:
            return None
        state = self.cp.load()
        if state.get("finalized"):
            raise RuntimeError("streaming SCD2 job already finalized")
        fname = pending[0]
        wm = int(state.get("watermark_us", 0))
        cycle = int(state.get("cycles", 0))
        reg, buf = self._load_state(state)
        path = os.path.join(self.input_dir, fname)
        max_ts = self._file_max_ts(path)
        new_wm = max(wm, max_ts - self.lateness_us) if max_ts >= 0 else wm

        import pyarrow.dataset as pads
        nrows = pads.dataset(path).count_rows()
        runner = (self._cycle_dataset if nrows > self.RAY_CYCLE_THRESHOLD
                  else self._cycle_pandas)
        n_ops, n_late, new_reg, new_buf = runner(
            path, wm, cycle, reg, buf, new_wm)

        open_fname = self.cp.stage_open_sessions(
            self._pack_state(new_reg, new_buf), cycle)
        state["open_sessions_file"] = open_fname
        state["watermark_us"] = int(new_wm)
        state["processed"] = list(state.get("processed", [])) + [fname]
        state["cycles"] = cycle + 1
        result = {"file": fname, "watermark_us": int(new_wm),
                  "ops": int(n_ops), "late": int(n_late),
                  "buffer_rows": int(len(new_buf)),
                  "state_users": int(len(new_reg))}
        state["cycle_metrics"] = (list(state.get("cycle_metrics", []))
                                  + [result])
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return result

    def run_all(self) -> dict:
        totals = {"cycles": 0, "ops": 0, "late": 0}
        while (r := self.run_cycle()) is not None:
            totals["cycles"] += 1
            totals["ops"] += r["ops"]
            totals["late"] += r["late"]
        return totals

    def finalize(self) -> int:
        """End-of-stream: sweep the watermark to +inf — every buffered
        event folds through the kernel; open versions stay open (their
        +1 rows were emitted when they opened). Idempotent byte-stable
        overwrite; terminal."""
        state = self.cp.load()
        reg, buf = self._load_state(state)
        ops, _ = _scd2_cycle_kernel(reg, buf)
        self._write(ops, self.ops_dir, "ops-final.parquet")
        state["finalized"] = True
        self.cp.save(state)
        return len(ops)

    def ops(self) -> pd.DataFrame:
        parts = [pd.read_parquet(os.path.join(self.ops_dir, f))
                 for f in sorted(os.listdir(self.ops_dir))
                 if f.endswith(".parquet")]
        if not parts:
            return _empty_ops()
        return (pd.concat(parts, ignore_index=True)
                .sort_values(["user_id", "change_ts_us", "version", "op"],
                             kind="mergesort")
                .reset_index(drop=True))

    def folded(self) -> pd.DataFrame:
        """Net dimension table (rows whose ops sum to +1) — equals the
        batch ``scd2_dimension`` minus its n_events column."""
        ops = self.ops()
        if not len(ops):
            return _empty_ops().drop(columns=["op", "change_ts_us"])
        key = ["user_id", "version", "attr", "valid_from_us",
               "valid_to_us"]
        net = ops.groupby(key, sort=False)["op"].sum().reset_index()
        out = (net[net["op"] > 0].drop(columns=["op"])
               .sort_values(["user_id", "version"], kind="mergesort")
               .reset_index(drop=True))
        return out
