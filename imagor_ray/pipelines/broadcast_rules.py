"""Broadcast-state (control-stream) enrichment — Flink's broadcast
pattern, the one structured-streaming join topology the engine's other
jobs don't cover: a LOW-VOLUME control stream of global rule updates
(here: ``purchase`` events, value = the current global threshold) is
broadcast to every parallel task, and every probe event (``click``) is
scored against the rule VALID AT ITS EVENT TIME — no key relates a
probe to a rule; the dimension is global. Reference analogue: imagor's
config/watermark side-channel that every worker consults per request
(the watermark-image fetch broadcast into each filter actor,
``vipsprocessor`` watermark cache), recast as an event-time stream.

Semantics: each probe emits ``rule_value`` = the value of the LATEST
rule (any user) with ``(r.ts, r.event_id) <= (p.ts, +inf)`` under the
total order (ts, event_id) — rules at the probe's exact ts apply; among
equal-ts rules the highest event_id wins. NaN when no rule precedes.

Event-time correctness forces PROBE BUFFERING, exactly the
:class:`~imagor_ray.pipelines.temporal_join.TemporalJoinJob`
discipline: a probe emits only once the watermark passes its event
time (every future on-time rule then provably has ``ts >= wm >
p.ts``), which also makes the operator arrival-order-insensitive for
in-horizon out-of-order rules. Rule state is watermark-bounded AND
GLOBAL: in-horizon rules plus ONE latest rule below the watermark —
O(rules-in-horizon), independent of both the stream length and the
key cardinality.

Scale shape — what distinguishes this job from the temporal join: the
rule side NEVER enters the shuffle. Each cycle extracts the file's
rule rows through a column-pruned distributed filter pass (bounded by
the control stream's volume — the pattern's defining assumption), and
the merged global rule table ships to the scoring tasks IN THE TASK
CLOSURE (a broadcast, Ray serializes it once per task spec — the
``ray.put``-style small side). The probe exchange carries only probe
rows bucketed by ``event_id % num_buckets``, and that bucketing exists
purely so each grouped task writes a DETERMINISTIC per-bucket emission
file; no state co-location is required at all. Below
``RAY_CYCLE_THRESHOLD`` footer rows the cycle runs driver-pandas with
the same kernel; both paths are byte-equal by test.

Exactly-once rides the house discipline: per-cycle emission files are
sorted by probe event_id and written BEFORE the single checkpoint
commit; crash replay reruns the cycle against the committed pre-cycle
state and overwrites identical bytes. Late rows (``ts < wm`` at
arrival, any type) route to the late output and never touch state —
a LATE rule beyond the horizon is the documented broadcast-pattern
hazard, surfaced rather than silently applied.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..state.checkpoint import Checkpoint

__all__ = ["BroadcastRulesJob"]


def _empty_rules() -> pd.DataFrame:
    return pd.DataFrame({
        "ts_us": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "value": pd.Series([], dtype="float64"),
    })


def _empty_probes() -> pd.DataFrame:
    return pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
    })


def _score_arrays(probes: pd.DataFrame, r_ts: np.ndarray,
                  r_val: np.ndarray) -> pd.DataFrame:
    """Vectorized global as-of against a PRESORTED rule table: each
    probe gets the value of the latest rule with ``ts <= p.ts`` under
    (ts, event_id) order (NaN if none). One ``searchsorted`` binary
    probe per batch — ``side='right'`` then ``-1`` lands on the LAST
    rule at-or-before the probe ts, so among equal-ts rules the
    (ts, event_id) presort bakes in the max-event_id tie. O(p log r)
    with no per-call re-sort of the (shared, broadcast) rule side."""
    if not len(probes):
        return pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "rule_value": pd.Series([], dtype="float64"),
        })
    ts = probes["ts_us"].to_numpy(dtype="int64")
    if len(r_ts):
        pos = np.searchsorted(r_ts, ts, side="right") - 1
        val = np.where(pos >= 0, r_val[np.maximum(pos, 0)],
                       np.float64("nan"))
    else:
        val = np.full(len(ts), np.float64("nan"))
    return (pd.DataFrame({
        "event_id": probes["event_id"].to_numpy(dtype="int64"),
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "rule_value": val.astype("float64"),
    }).sort_values("event_id", kind="mergesort").reset_index(drop=True))


def _score(probes: pd.DataFrame, rules: pd.DataFrame) -> pd.DataFrame:
    """Frame-input wrapper of :func:`_score_arrays`: sorts the rule
    side (ts_us, event_id) once and delegates."""
    r = rules.sort_values(["ts_us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
    return _score_arrays(probes,
                         r["ts_us"].to_numpy(dtype="int64"),
                         r["value"].to_numpy(dtype="float64"))


def _evict_rules(rules: pd.DataFrame, wm: int) -> pd.DataFrame:
    """Keep rules with ``ts >= wm`` plus the single latest rule below
    the watermark (every pending/future probe has ``ts >= wm``, so any
    earlier rule is superseded for all of them). Canonical
    (ts_us, event_id) order for byte-stable snapshots."""
    if not len(rules):
        return rules.reset_index(drop=True)
    r = (rules.sort_values(["ts_us", "event_id"], kind="mergesort")
         .reset_index(drop=True))
    ts = r["ts_us"].to_numpy(dtype="int64")
    below = ts < wm
    keep = ~below
    if below.any():
        keep[int(np.flatnonzero(below)[-1])] = True
    return r[keep].reset_index(drop=True)


class BroadcastRulesJob:
    """Micro-batch broadcast-rules enrichment with watermark-gated
    probe emission (module docstring has the full semantics)."""

    RAY_CYCLE_THRESHOLD = 150_000

    def __init__(self, input_dir: str, state_dir: str,
                 rule_type: str = "purchase", probe_type: str = "click",
                 allowed_lateness_s: int = 0, num_buckets: int = 32,
                 ray_cycle_threshold: int | None = None):
        self.input_dir = input_dir
        self.cp = Checkpoint(state_dir)
        self.rule_type = rule_type
        self.probe_type = probe_type
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

    def _load_state(self, state: dict
                    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        st = self.cp.load_open_sessions(state)
        if st is None or not len(st):
            return _empty_rules(), _empty_probes()
        rules = (st[st["side"] == 0]
                 [["ts_us", "event_id", "value"]].reset_index(drop=True))
        prb = (st[st["side"] == 1]
               [["event_id", "ts_us"]].reset_index(drop=True))
        return rules, prb

    @staticmethod
    def _pack_state(rules: pd.DataFrame, prb: pd.DataFrame
                    ) -> pd.DataFrame:
        rules = rules.assign(side=np.int8(0))
        prb = prb.assign(value=np.float64("nan"), side=np.int8(1))
        cols = ["ts_us", "event_id", "value", "side"]
        return (pd.concat([rules[cols], prb[cols]], ignore_index=True)
                .sort_values(["side", "ts_us", "event_id"],
                             kind="mergesort")
                .reset_index(drop=True))

    @staticmethod
    def _file_max_ts(path: str) -> int:
        from .stream_join import StreamingJoinJob
        return StreamingJoinJob._file_max_ts(path)

    # ------------------------------------------------------------------
    # cycle engines

    def _cycle_pandas(self, path: str, wm: int, cycle: int,
                      rules: pd.DataFrame, prb: pd.DataFrame,
                      new_wm: int):
        df = pd.read_parquet(
            path, columns=["event_id", "ts", "event_type", "value"])
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        late = us < wm
        lrows = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(dtype="int64")[late],
            "ts": pd.Series(us[late]).astype("datetime64[us]"),
        }).sort_values("event_id", kind="mergesort").reset_index(drop=True)
        ltmp = os.path.join(self.late_dir, f"late-{cycle:05d}.parquet")
        lrows.to_parquet(ltmp + ".tmp", index=False)
        os.replace(ltmp + ".tmp", ltmp)
        on = df[~late]
        on_us = us[~late]
        tr = on["event_type"].to_numpy() == self.rule_type
        tp = on["event_type"].to_numpy() == self.probe_type
        all_rules = pd.concat([rules, pd.DataFrame({
            "ts_us": on_us[tr],
            "event_id": on["event_id"].to_numpy(dtype="int64")[tr],
            "value": on["value"].to_numpy(dtype="float64")[tr],
        })], ignore_index=True)
        all_prb = pd.concat([prb, pd.DataFrame({
            "event_id": on["event_id"].to_numpy(dtype="int64")[tp],
            "ts_us": on_us[tp],
        })], ignore_index=True)
        ready = all_prb["ts_us"].to_numpy(dtype="int64") < new_wm
        emitted = _score(all_prb[ready], all_rules)
        tmp = os.path.join(self.emitted_dir, f"emitted-{cycle:05d}.parquet")
        emitted.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)
        return (len(emitted), int(len(lrows)),
                _evict_rules(all_rules, new_wm),
                all_prb[~ready].sort_values(
                    "event_id", kind="mergesort").reset_index(drop=True))

    def _cycle_dataset(self, path: str, wm: int, cycle: int,
                       rules: pd.DataFrame, prb: pd.DataFrame,
                       new_wm: int):
        """Two passes, neither shuffling state: (A) a column-pruned
        distributed filter collects the cycle's on-time rule rows —
        bounded by the control stream's volume; (B) probe rows bucket
        on ``event_id % num_buckets`` purely for deterministic
        per-bucket emission files, each grouped task scoring against
        the BROADCAST merged rule table captured in its closure. Rule
        rows never ride an exchange."""
        import ray
        import ray.data as rd
        import pyarrow.parquet as pq

        nb = self.num_buckets
        edir, ldir = self.emitted_dir, self.late_dir
        rtype, ptype = self.rule_type, self.probe_type

        cols = ["event_id", "ts", "event_type", "value"]

        # Rule collection is a driver-side predicate+column-pushdown
        # read, NOT a Ray Data execution: the control stream is small
        # by the pattern's own assumption (if the "rules" were
        # stream-sized, broadcast state is the wrong operator), so a
        # bounded threaded read beats paying a whole dataset execution
        # per cycle. Row-group/type pushdown keeps it bounded even
        # when the cycle file is huge.
        rtbl = pq.read_table(path, columns=["event_id", "ts", "value"],
                             filters=[("event_type", "==", rtype)])
        r_us = (rtbl["ts"].to_pandas().astype("datetime64[us]")
                .astype("int64").to_numpy())
        on = r_us >= wm
        new_rules = pd.DataFrame({
            "ts_us": r_us[on],
            "event_id": rtbl["event_id"].to_numpy()[on].astype("int64"),
            "value": rtbl["value"].to_numpy()[on].astype("float64"),
        })
        all_rules = (pd.concat([rules, new_rules], ignore_index=True)
                     .sort_values(["ts_us", "event_id"], kind="mergesort")
                     .reset_index(drop=True))
        # THE broadcast: the global rule table ships to the object
        # store once per cycle (zero-copy numpy columns); every scoring
        # task resolves the ref — fetched once per worker, never
        # re-pickled per task closure
        rules_ref = ray.put({
            "ts_us": np.ascontiguousarray(
                all_rules["ts_us"].to_numpy(dtype="int64")),
            "value": np.ascontiguousarray(
                all_rules["value"].to_numpy(dtype="float64")),
        })  # (ts_us, event_id)-sorted: the tie-break is baked in

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            eid = b["event_id"].to_numpy(dtype="int64")
            late = us < wm
            probe = (b["event_type"].to_numpy() == ptype) & ~late
            keep = late | probe
            # side: 1 = probe-state convention unused here; 2 = new
            # on-time probe; 3 = late row (any type)
            return pd.DataFrame({
                "event_id": eid[keep],
                "ts_us": us[keep],
                "side": np.where(late[keep], 3, 2).astype(np.int8),
                "_ub": (eid[keep] % nb).astype(np.int32),
            })

        st = prb.assign(side=np.int8(2))  # pending probes rejoin new ones
        st["_ub"] = (st["event_id"].to_numpy(dtype="int64")
                     % nb).astype(np.int32)
        st = st[["event_id", "ts_us", "side", "_ub"]]

        def bucket(g: pd.DataFrame) -> pd.DataFrame:
            ub = int(g["_ub"].iloc[0])
            side = g["side"].to_numpy()
            lt = g[side == 3]
            lrows = pd.DataFrame({
                "event_id": lt["event_id"].to_numpy(dtype="int64"),
                "ts": pd.Series(lt["ts_us"].to_numpy(dtype="int64"))
                .astype("datetime64[us]"),
            }).sort_values("event_id", kind="mergesort")
            ltmp = os.path.join(ldir, f"late-{cycle:05d}-{ub:02d}.parquet")
            lrows.reset_index(drop=True).to_parquet(ltmp + ".tmp",
                                                    index=False)
            os.replace(ltmp + ".tmp", ltmp)
            pr = g[side == 2][["event_id", "ts_us"]].reset_index(drop=True)
            ready = pr["ts_us"].to_numpy(dtype="int64") < new_wm
            rl = ray.get(rules_ref)
            emitted = _score_arrays(pr[ready], rl["ts_us"], rl["value"])
            etmp = os.path.join(edir, f"emitted-{cycle:05d}-{ub:02d}.parquet")
            emitted.to_parquet(etmp + ".tmp", index=False)
            os.replace(etmp + ".tmp", etmp)
            nxt = pr[~ready].reset_index(drop=True).assign(
                kind=np.int8(0), n_emit=np.int64(0), n_late=np.int64(0))
            summ = pd.DataFrame({
                "event_id": [np.int64(-1)], "ts_us": [np.int64(-1)],
                "kind": [np.int8(1)],
                "n_emit": [np.int64(len(emitted))],
                "n_late": [np.int64(len(lrows))],
            })
            out_cols = ["event_id", "ts_us", "kind", "n_emit", "n_late"]
            return pd.concat([nxt[out_cols], summ[out_cols]],
                             ignore_index=True)

        tagged = (rd.read_parquet(path, columns=cols)
                  .map_batches(tag, batch_format="pandas"))
        if len(st):
            tagged = tagged.union(rd.from_pandas(st))
        out = (tagged.groupby("_ub")
               .map_groups(bucket, batch_format="pandas")
               .to_pandas())
        if not len(out):
            return 0, 0, _evict_rules(all_rules, new_wm), _empty_probes()
        summ = out[out["kind"] == 1]
        body = out[out["kind"] == 0]
        nxt_prb = (body[["event_id", "ts_us"]]
                   .sort_values("event_id", kind="mergesort")
                   .reset_index(drop=True)
                   .astype({"event_id": "int64", "ts_us": "int64"}))
        return (int(summ["n_emit"].sum()), int(summ["n_late"].sum()),
                _evict_rules(all_rules, new_wm), nxt_prb)

    # ------------------------------------------------------------------
    # driver loop

    def run_cycle(self) -> dict | None:
        pending = self.pending_files()
        if not pending:
            return None
        state = self.cp.load()
        if state.get("finalized"):
            raise RuntimeError("broadcast-rules job already finalized")
        fname = pending[0]
        wm = int(state.get("watermark_us", 0))
        cycle = int(state.get("cycles", 0))
        rules, prb = self._load_state(state)
        path = os.path.join(self.input_dir, fname)
        max_ts = self._file_max_ts(path)
        new_wm = max(wm, max_ts - self.lateness_us) if max_ts >= 0 else wm

        import pyarrow.dataset as pads
        nrows = pads.dataset(path).count_rows()
        runner = (self._cycle_dataset if nrows > self.RAY_CYCLE_THRESHOLD
                  else self._cycle_pandas)
        n_emit, n_late, new_rules, new_prb = runner(
            path, wm, cycle, rules, prb, new_wm)

        open_fname = self.cp.stage_open_sessions(
            self._pack_state(new_rules, new_prb), cycle)
        state["open_sessions_file"] = open_fname
        state["watermark_us"] = int(new_wm)
        state["processed"] = list(state.get("processed", [])) + [fname]
        state["cycles"] = cycle + 1
        result = {"file": fname, "watermark_us": int(new_wm),
                  "emitted": int(n_emit), "late": int(n_late),
                  "pending_probes": int(len(new_prb)),
                  "rule_rows": int(len(new_rules))}
        state["cycle_metrics"] = (list(state.get("cycle_metrics", []))
                                  + [result])
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return result

    def run_all(self) -> dict:
        totals = {"cycles": 0, "emitted": 0, "late": 0}
        while (r := self.run_cycle()) is not None:
            totals["cycles"] += 1
            totals["emitted"] += r["emitted"]
            totals["late"] += r["late"]
        return totals

    def finalize(self) -> int:
        """End-of-stream: score every still-buffered probe against the
        full committed rule state (no future rule can arrive).
        Idempotent byte-stable overwrite; terminal."""
        state = self.cp.load()
        rules, prb = self._load_state(state)
        emitted = _score(prb, rules)
        tmp = os.path.join(self.emitted_dir, "emitted-final.parquet")
        emitted.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)
        state["finalized"] = True
        self.cp.save(state)
        return len(emitted)

    def emitted(self) -> pd.DataFrame:
        parts = [pd.read_parquet(os.path.join(self.emitted_dir, f))
                 for f in sorted(os.listdir(self.emitted_dir))
                 if f.endswith(".parquet")]
        if not parts:
            return _score(_empty_probes(), _empty_rules())
        return (pd.concat(parts, ignore_index=True)
                .sort_values("event_id", kind="mergesort")
                .reset_index(drop=True))
