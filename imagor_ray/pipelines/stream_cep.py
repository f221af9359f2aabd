"""Streaming CEP — the Kleene-plus funnel (``signup click+ purchase``,
strict contiguity, whole match inside the window) evaluated
INCREMENTALLY across micro-batch cycles: the pattern-matching leg of
the north rule's "structured-streaming / CEP engine", where the batch
``cep_kleene_funnel`` kernel becomes a stateful stream operator whose
partial matches survive cycle boundaries (Flink CEP's NFA state, here
collapsed to the closed form this pattern admits).

Event-time correctness forces WATERMARK-GATED processing (the
``temporal_join`` discipline): strict contiguity depends on each
user's FULL event order, so an event may only enter the match kernel
once the watermark proves nothing can still arrive before it
(``ts < wm``). Arrivals buffer until then — which makes the operator
arrival-order-insensitive for free: an out-of-order in-horizon event
sorts into its event-time position before anything after it is
processed. Rows behind the watermark at arrival route to the late
output (house contract).

The per-user NFA state this pattern needs is CLOSED FORM — three
registers, not an event buffer:

- ``prev_code/prev_ts``: the event immediately before the open click
  island (the potential ``signup`` flank), or simply the user's last
  processed event when no island is open. By construction this is
  never a click.
- ``island_n/island_ts``: the open trailing run of consecutive clicks
  (count + first-click ts). ``island_n == 0`` means no open run.

A match DECIDES the moment the flanking event is processed: a
non-click same-user event closes the island, and it matches iff the
flank before the island was a ``signup``, the closer is a
``purchase``, and ``purchase.ts - signup.ts <= window``. Emission
therefore happens in the cycle whose watermark sweeps past the
closing event — exactly-once by the house discipline (per-cycle
sorted emission files committed BEFORE the single checkpoint save;
crash replay reruns against the pre-cycle state and overwrites
identical bytes).

Equality with the batch kernel is structural: the processed sequence
per user is the (ts, event_id)-sorted event stream (the same order the
batch kernel sorts into), islands carry their weighted click count
across cycle boundaries as ONE synthetic row, and ``finalize()``
drains the buffer so trailing islands die exactly as the batch
kernel's unflanked islands do. The DuckDB oracle is the UNCHANGED
batch gaps-and-islands SQL.

State is watermark-bounded: O(users) closed-form registers (the
``temporal_join`` family's accepted domain-sized state) plus an event
buffer of one cycle + lateness horizon — never the stream.

Scale shape: above ``RAY_CYCLE_THRESHOLD`` footer rows the cycle runs
as one user-bucket ``groupby().map_groups`` over tagged new ∪ state
rows (buckets are user-complete, so NFA state and buffer co-locate
with their events); each grouped task runs the same kernel and writes
its bucket's emission file in-task. Below it, driver pandas. Both
paths byte-equal by test. The shuffle carries 4 fixed-width columns
(user_id, event_id, ts, type-code) — no text.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..state.checkpoint import Checkpoint

__all__ = ["StreamingCepJob"]

_STATE_COLS = ["side", "user_id", "event_id", "ts_us", "code",
               "prev_code", "prev_ts_us", "island_n", "island_ts_us"]


def _empty_kst() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "prev_code": pd.Series([], dtype="int64"),
        "prev_ts_us": pd.Series([], dtype="int64"),
        "island_n": pd.Series([], dtype="int64"),
        "island_ts_us": pd.Series([], dtype="int64"),
    })


def _empty_buf() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
        "code": pd.Series([], dtype="int64"),
    })


def _empty_emit() -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "start_ts": pd.Series([], dtype="datetime64[us]"),
        "end_ts": pd.Series([], dtype="datetime64[us]"),
        "n_clicks": pd.Series([], dtype="int64"),
    })


def _cep_cycle_kernel(kst: pd.DataFrame, ready: pd.DataFrame,
                      window_us: int
                      ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One watermark sweep of the incremental Kleene kernel.

    ``kst``: per-user registers (see module docstring). ``ready``:
    events now provably final (``ts < wm``), columns user_id,
    event_id, ts_us, code. Returns ``(matches, next kst)``.

    The carried state re-enters the island scan as synthetic rows —
    the prev register as one row (event_id -2) and the open island as
    ONE click row of WEIGHT ``island_n`` (event_id -1) — which is
    exact because a match needs only the island's first-click ts and
    click count, never its interior timestamps. Register timestamps
    are strictly below every ready row's ts (processed means
    ``ts < wm`` at an earlier watermark), so the synthetic rows sort
    first within each user without tie games.
    """
    if not len(ready):
        return _empty_emit(), kst.reset_index(drop=True)

    synth = []
    if len(kst):
        # prev register rows (always present for a stateful user)
        synth.append(pd.DataFrame({
            "user_id": kst["user_id"].to_numpy(dtype="int64"),
            "event_id": np.full(len(kst), -2, dtype="int64"),
            "ts_us": kst["prev_ts_us"].to_numpy(dtype="int64"),
            "code": kst["prev_code"].to_numpy(dtype="int64"),
            "w": np.ones(len(kst), dtype="int64"),
        }))
        isl = kst[kst["island_n"].to_numpy(dtype="int64") > 0]
        if len(isl):
            synth.append(pd.DataFrame({
                "user_id": isl["user_id"].to_numpy(dtype="int64"),
                "event_id": np.full(len(isl), -1, dtype="int64"),
                "ts_us": isl["island_ts_us"].to_numpy(dtype="int64"),
                "code": np.ones(len(isl), dtype="int64"),
                "w": isl["island_n"].to_numpy(dtype="int64"),
            }))
    rows = pd.concat(synth + [ready.assign(
        w=np.ones(len(ready), dtype="int64"))], ignore_index=True)
    rows = rows.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort").reset_index(drop=True)

    uid = rows["user_id"].to_numpy(dtype="int64")
    ts = rows["ts_us"].to_numpy(dtype="int64")
    code = rows["code"].to_numpy(dtype="int64")
    w = rows["w"].to_numpy(dtype="int64")
    n = len(rows)

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
    cw = np.concatenate([[np.int64(0)], np.cumsum(w)])
    n_clicks = cw[ends + 1] - cw[starts]

    # an island is CLOSED when a same-user event follows it; it then
    # either matches (signup flank + purchase closer + window) or dies
    closed = (ends < n - 1)
    closed[closed] &= uid[ends[closed] + 1] == uid[ends[closed]]
    s, e, nc = starts[closed], ends[closed], n_clicks[closed]
    flank = (s > 0)
    flank[flank] &= uid[s[flank] - 1] == uid[s[flank]]
    good = flank.copy()
    good[flank] &= ((code[s[flank] - 1] == 0)
                    & (code[e[flank] + 1] == 2)
                    & (ts[e[flank] + 1] - ts[s[flank] - 1] <= window_us))
    s, e, nc = s[good], e[good], nc[good]
    emitted = pd.DataFrame({
        "user_id": uid[s],
        "start_ts": pd.Series(ts[s - 1]).astype("datetime64[us]"),
        "end_ts": pd.Series(ts[e + 1]).astype("datetime64[us]"),
        "n_clicks": nc.astype("int64"),
    }).sort_values(["user_id", "start_ts", "end_ts"],
                   kind="mergesort").reset_index(drop=True)

    # next registers: per user, the trailing open island (if the last
    # row is a click) or the last row as the prev register
    last_idx = np.flatnonzero(
        np.concatenate([uid[1:] != uid[:-1], [True]]))
    open_i = ~closed  # island whose end is the user's last row
    os_, oe = starts[open_i], ends[open_i]
    on = n_clicks[open_i]
    has_prev = (os_ > 0)
    has_prev[has_prev] &= uid[os_[has_prev] - 1] == uid[os_[has_prev]]
    # a new user whose first processed event is a click has no flank:
    # sentinel code 3 (non-signup) keeps the island alive but unmatchable
    p_code = np.full(len(os_), 3, dtype="int64")
    p_ts = ts[os_].copy()
    p_code[has_prev] = code[os_[has_prev] - 1]
    p_ts[has_prev] = ts[os_[has_prev] - 1]
    st_open = pd.DataFrame({
        "user_id": uid[os_],
        "prev_code": p_code,
        "prev_ts_us": p_ts,
        "island_n": on.astype("int64"),
        "island_ts_us": ts[os_],
    })
    plain = last_idx[~is_click[last_idx]]
    st_plain = pd.DataFrame({
        "user_id": uid[plain],
        "prev_code": code[plain],
        "prev_ts_us": ts[plain],
        "island_n": np.zeros(len(plain), dtype="int64"),
        "island_ts_us": np.full(len(plain), -1, dtype="int64"),
    })
    new_kst = (pd.concat([st_open, st_plain], ignore_index=True)
               .sort_values("user_id", kind="mergesort")
               .reset_index(drop=True))
    return emitted, new_kst


class StreamingCepJob:
    """Micro-batch streaming Kleene-funnel CEP with watermark-gated
    processing (module docstring has the full semantics)."""

    RAY_CYCLE_THRESHOLD = 150_000

    def __init__(self, input_dir: str, state_dir: str,
                 window_s: int = 21600, allowed_lateness_s: int = 0,
                 num_buckets: int = 32,
                 ray_cycle_threshold: int | None = None):
        self.input_dir = input_dir
        self.cp = Checkpoint(state_dir)
        self.window_us = window_s * 1_000_000
        self.lateness_us = allowed_lateness_s * 1_000_000
        self.num_buckets = num_buckets
        if ray_cycle_threshold is not None:
            self.RAY_CYCLE_THRESHOLD = ray_cycle_threshold
        self.emitted_dir = os.path.join(state_dir, "emitted")
        self.late_dir = os.path.join(state_dir, "late")
        os.makedirs(self.emitted_dir, exist_ok=True)
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
            return _empty_kst(), _empty_buf()
        kst = (st[st["side"] == 0]
               [["user_id", "prev_code", "prev_ts_us", "island_n",
                 "island_ts_us"]].reset_index(drop=True))
        buf = (st[st["side"] == 1]
               [["user_id", "event_id", "ts_us", "code"]]
               .reset_index(drop=True))
        return kst, buf

    @staticmethod
    def _pack_state(kst: pd.DataFrame, buf: pd.DataFrame) -> pd.DataFrame:
        k = kst.assign(side=np.int8(0), event_id=np.int64(-1),
                       ts_us=np.int64(-1), code=np.int64(-1))
        b = buf.assign(side=np.int8(1), prev_code=np.int64(-1),
                       prev_ts_us=np.int64(-1), island_n=np.int64(-1),
                       island_ts_us=np.int64(-1))
        return (pd.concat([k[_STATE_COLS], b[_STATE_COLS]],
                          ignore_index=True)
                .sort_values(["side", "user_id", "event_id", "ts_us"],
                             kind="mergesort")
                .reset_index(drop=True))

    # -- per-cycle machinery -------------------------------------------
    @staticmethod
    def _code(etype: np.ndarray) -> np.ndarray:
        code = np.full(len(etype), 3, dtype="int64")
        code[etype == "signup"] = 0
        code[etype == "click"] = 1
        code[etype == "purchase"] = 2
        return code

    def _write_emit(self, emitted: pd.DataFrame, name: str) -> None:
        tmp = os.path.join(self.emitted_dir, name)
        emitted.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)

    def _write_late(self, lrows: pd.DataFrame, name: str) -> None:
        tmp = os.path.join(self.late_dir, name)
        lrows.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)

    def _cycle_pandas(self, path: str, wm: int, cycle: int,
                      kst: pd.DataFrame, buf: pd.DataFrame, new_wm: int):
        df = pd.read_parquet(
            path, columns=["event_id", "ts", "user_id", "event_type"])
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        late = us < wm
        self._write_late(pd.DataFrame({
            "event_id": df["event_id"].to_numpy(dtype="int64")[late],
            "ts": pd.Series(us[late]).astype("datetime64[us]"),
        }).sort_values("event_id", kind="mergesort")
            .reset_index(drop=True), f"late-{cycle:05d}.parquet")
        new = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype="int64")[~late],
            "event_id": df["event_id"].to_numpy(dtype="int64")[~late],
            "ts_us": us[~late],
            "code": self._code(df["event_type"].to_numpy()[~late]),
        })
        pool = pd.concat([buf, new], ignore_index=True)
        ready_m = pool["ts_us"].to_numpy(dtype="int64") < new_wm
        emitted, new_kst = _cep_cycle_kernel(
            kst, pool[ready_m], self.window_us)
        self._write_emit(emitted, f"emitted-{cycle:05d}.parquet")
        hold = (pool[~ready_m]
                .sort_values(["user_id", "event_id"], kind="mergesort")
                .reset_index(drop=True))
        return len(emitted), int(late.sum()), new_kst, hold

    def _cycle_dataset(self, path: str, wm: int, cycle: int,
                       kst: pd.DataFrame, buf: pd.DataFrame, new_wm: int):
        """User-bucket grouped cycle: each task runs the incremental
        kernel over its bucket's (registers ∪ buffer ∪ new) rows and
        writes its bucket's emission + late files; next-state +
        summary rows return."""
        import ray.data as rd

        nb = self.num_buckets
        wus = self.window_us
        edir, ldir = self.emitted_dir, self.late_dir

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            uid = b["user_id"].to_numpy(dtype="int64")
            out = pd.DataFrame({
                "side": np.full(len(b), 2, dtype=np.int8),
                "user_id": uid,
                "event_id": b["event_id"].to_numpy(dtype="int64"),
                "ts_us": us,
                "code": self._code(b["event_type"].to_numpy()),
                "prev_code": np.full(len(b), -1, dtype="int64"),
                "prev_ts_us": np.full(len(b), -1, dtype="int64"),
                "island_n": np.full(len(b), -1, dtype="int64"),
                "island_ts_us": np.full(len(b), -1, dtype="int64"),
            })
            out["_ub"] = (uid % nb).astype(np.int32)
            return out

        st = self._pack_state(kst, buf)
        st["_ub"] = (st["user_id"].to_numpy(dtype="int64")
                     % nb).astype(np.int32)
        st = st[_STATE_COLS + ["_ub"]]

        def bucket(g: pd.DataFrame) -> pd.DataFrame:
            ub = int(g["_ub"].iloc[0])
            side = g["side"].to_numpy()
            bkst = (g[side == 0]
                    [["user_id", "prev_code", "prev_ts_us", "island_n",
                      "island_ts_us"]].reset_index(drop=True))
            bbuf = (g[side == 1]
                    [["user_id", "event_id", "ts_us", "code"]]
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
                "code": new["code"].to_numpy(dtype="int64")[~late],
            })], ignore_index=True)
            ready_m = pool["ts_us"].to_numpy(dtype="int64") < new_wm
            emitted, nkst = _cep_cycle_kernel(bkst, pool[ready_m], wus)
            etmp = os.path.join(edir,
                                f"emitted-{cycle:05d}-{ub:02d}.parquet")
            emitted.to_parquet(etmp + ".tmp", index=False)
            os.replace(etmp + ".tmp", etmp)
            nxt = StreamingCepJob._pack_state(
                nkst, pool[~ready_m].reset_index(drop=True))
            nxt = nxt.assign(kind=np.int8(0), n_emit=np.int64(0),
                             n_late=np.int64(0))
            summ = pd.DataFrame({
                **{c: [np.int64(-1)] for c in _STATE_COLS if c != "side"},
                "side": [np.int8(-1)], "kind": [np.int8(1)],
                "n_emit": [np.int64(len(emitted))],
                "n_late": [np.int64(int(late.sum()))],
            })
            cols = _STATE_COLS + ["kind", "n_emit", "n_late"]
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
            return 0, 0, _empty_kst(), _empty_buf()
        summ = out[out["kind"] == 1]
        body = out[out["kind"] == 0]
        nkst = (body[body["side"] == 0]
                [["user_id", "prev_code", "prev_ts_us", "island_n",
                  "island_ts_us"]]
                .sort_values("user_id", kind="mergesort")
                .reset_index(drop=True))
        nbuf = (body[body["side"] == 1]
                [["user_id", "event_id", "ts_us", "code"]]
                .sort_values(["user_id", "event_id"], kind="mergesort")
                .reset_index(drop=True))
        return (int(summ["n_emit"].sum()), int(summ["n_late"].sum()),
                nkst, nbuf)

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
            raise RuntimeError("streaming CEP job already finalized")
        fname = pending[0]
        wm = int(state.get("watermark_us", 0))
        cycle = int(state.get("cycles", 0))
        kst, buf = self._load_state(state)
        path = os.path.join(self.input_dir, fname)
        max_ts = self._file_max_ts(path)
        new_wm = max(wm, max_ts - self.lateness_us) if max_ts >= 0 else wm

        import pyarrow.dataset as pads
        nrows = pads.dataset(path).count_rows()
        runner = (self._cycle_dataset if nrows > self.RAY_CYCLE_THRESHOLD
                  else self._cycle_pandas)
        n_emit, n_late, new_kst, new_buf = runner(
            path, wm, cycle, kst, buf, new_wm)

        open_fname = self.cp.stage_open_sessions(
            self._pack_state(new_kst, new_buf), cycle)
        state["open_sessions_file"] = open_fname
        state["watermark_us"] = int(new_wm)
        state["processed"] = list(state.get("processed", [])) + [fname]
        state["cycles"] = cycle + 1
        result = {"file": fname, "watermark_us": int(new_wm),
                  "matches": int(n_emit), "late": int(n_late),
                  "buffer_rows": int(len(new_buf)),
                  "state_users": int(len(new_kst))}
        state["cycle_metrics"] = (list(state.get("cycle_metrics", []))
                                  + [result])
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return result

    def run_all(self) -> dict:
        totals = {"cycles": 0, "matches": 0, "late": 0}
        while (r := self.run_cycle()) is not None:
            totals["cycles"] += 1
            totals["matches"] += r["matches"]
            totals["late"] += r["late"]
        return totals

    def finalize(self) -> int:
        """End-of-stream: sweep the watermark to +inf — every buffered
        event processes, closing islands decide, and trailing open
        islands die exactly as the batch kernel's unflanked islands.
        Idempotent byte-stable overwrite; terminal."""
        state = self.cp.load()
        kst, buf = self._load_state(state)
        emitted, _ = _cep_cycle_kernel(kst, buf, self.window_us)
        self._write_emit(emitted, "emitted-final.parquet")
        state["finalized"] = True
        self.cp.save(state)
        return len(emitted)

    def matches(self) -> pd.DataFrame:
        parts = [pd.read_parquet(os.path.join(self.emitted_dir, f))
                 for f in sorted(os.listdir(self.emitted_dir))
                 if f.endswith(".parquet")]
        if not parts:
            return _empty_emit()
        return (pd.concat(parts, ignore_index=True)
                .sort_values(["user_id", "start_ts", "end_ts"],
                             kind="mergesort")
                .reset_index(drop=True))
