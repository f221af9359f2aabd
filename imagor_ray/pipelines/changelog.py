"""UPDATE-mode windowed aggregation — the retraction/changelog emission
mode of structured streaming (Spark's ``update`` output mode, Flink's
retract streams): instead of waiting for the watermark to CLOSE a
window (append mode — ``StreamingSessionJob``'s contract), every cycle
emits the windows whose aggregate CHANGED, as a changelog:

- ``op = -1`` retracts the previously emitted value of a (window, key)
  whose aggregate this cycle's arrivals supersede;
- ``op = +1`` inserts the new value.

A consumer folding the changelog (sum of ``op``-weighted rows, or
last-insert-wins per key) holds, after any cycle, exactly the batch
aggregate of all data seen so far — that's the update-mode contract,
and it's what the DuckDB oracle checks end to end: with deterministic
day-file micro-batches, the full changelog itself is a pure function of
the input and mirrors as a ``lag()`` over per-day cumulative sums.

Windows here are TUMBLING WEEKS over day cycles, so a window is
genuinely updated across up to 7 cycles (an hour-window variant would
never retract — every window would complete inside one day file).

State is the open-window aggregate table — O(open windows × keys),
bounded by the window/watermark horizon, never the stream; rows with
``ts < watermark`` at arrival route to the late output (the session
job's contract). Exactly-once rides the house discipline: per-cycle
changelog files are sorted + written BEFORE the single checkpoint
commit, so a crash between write and commit replays the cycle against
the committed pre-cycle state and overwrites identical bytes.

Scale shape: the per-cycle aggregation is distributed (``map_batches``
partials bounded by the (window × key) domain per batch, never row
counts); only the tiny partial table reaches the driver fold. The
changelog diff itself is a pandas merge over the open-window state —
domain-sized, not stream-sized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..state.checkpoint import Checkpoint

__all__ = ["StreamingChangelogJob"]

_WEEK_US = 7 * 86_400 * 1_000_000
# DuckDB's date_trunc('week', ts) snaps to Monday; epoch (1970-01-01)
# was a Thursday, so the Monday grid is offset by 4 days
_MONDAY_OFFSET_US = 4 * 86_400 * 1_000_000


def _week_start(us: np.ndarray) -> np.ndarray:
    return ((us - _MONDAY_OFFSET_US) // _WEEK_US) * _WEEK_US \
        + _MONDAY_OFFSET_US


def _empty_state() -> pd.DataFrame:
    return pd.DataFrame({
        "win_us": pd.Series([], dtype="int64"),
        "key": pd.Series([], dtype=object),
        "n": pd.Series([], dtype="int64"),
    })


class StreamingChangelogJob:
    """Micro-batch weekly-count changelog with retraction emission
    (module docstring has the full semantics)."""

    def __init__(self, input_dir: str, state_dir: str,
                 key_col: str = "event_type",
                 allowed_lateness_s: int = 0):
        self.input_dir = input_dir
        self.cp = Checkpoint(state_dir)
        self.key_col = key_col
        self.lateness_us = allowed_lateness_s * 1_000_000
        self.changelog_dir = os.path.join(state_dir, "changelog")
        self.late_dir = os.path.join(state_dir, "late")
        os.makedirs(self.changelog_dir, exist_ok=True)
        os.makedirs(self.late_dir, exist_ok=True)

    def pending_files(self) -> list[str]:
        state = self.cp.load()
        done = set(state.get("processed", []))
        return [f for f in sorted(os.listdir(self.input_dir))
                if f.endswith(".parquet") and f not in done]

    def _load_state(self, state: dict) -> pd.DataFrame:
        st = self.cp.load_open_sessions(state)
        return _empty_state() if st is None else st

    def _cycle_counts(self, path: str, wm: int, cycle: int
                      ) -> tuple[pd.DataFrame, int, int]:
        """Distributed per-cycle (window, key) partial counts: each
        batch returns at most |windows × keys| count rows (kind=0)
        plus its late rows (kind=1 — bounded by the lateness horizon,
        not the stream); the driver folds the counts and writes ONE
        sorted per-cycle late file, so replay bytes don't depend on
        Ray's batch splits. Returns (counts, n_late, max_ts)."""
        import ray.data as rd

        key_col = self.key_col

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            late = us < wm
            on = pd.DataFrame({
                "win_us": _week_start(us[~late]),
                "key": b[key_col].to_numpy()[~late],
            })
            s = (on.groupby(["win_us", "key"], sort=False)
                 .size().reset_index(name="n"))
            s["n"] = s["n"].astype("int64")
            s["kind"] = np.int8(0)
            lrows = pd.DataFrame({
                "win_us": b["event_id"].to_numpy(dtype="int64")[late],
                "key": np.full(int(late.sum()), "", dtype=object),
                "n": us[late],
                "kind": np.full(int(late.sum()), 1, dtype=np.int8),
            })
            out = pd.concat([s, lrows], ignore_index=True)
            out["_max_ts"] = np.int64(int(us.max()) if len(us) else -1)
            return out

        parts = (rd.read_parquet(path, columns=["event_id", "ts", key_col])
                 .map_batches(partial, batch_format="pandas")
                 .to_pandas())
        late_rows = (parts[parts["kind"] == 1] if len(parts)
                     else parts)
        lrows = pd.DataFrame({
            "event_id": (late_rows["win_us"].to_numpy(dtype="int64")
                         if len(late_rows) else
                         np.array([], dtype="int64")),
            "ts": pd.Series(late_rows["n"].to_numpy(dtype="int64")
                            if len(late_rows) else
                            np.array([], dtype="int64"))
            .astype("datetime64[us]"),
        }).sort_values("event_id", kind="mergesort").reset_index(drop=True)
        tmp = os.path.join(self.late_dir, f"late-{cycle:05d}.parquet")
        lrows.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)
        if not len(parts):
            return _empty_state(), 0, -1
        cnt = parts[parts["kind"] == 0]
        counts = (cnt.groupby(["win_us", "key"], sort=False)["n"]
                  .sum().reset_index())
        max_ts = int(parts["_max_ts"].max())
        return counts, len(lrows), max_ts

    def run_cycle(self) -> dict | None:
        pending = self.pending_files()
        if not pending:
            return None
        fname = pending[0]
        state = self.cp.load()
        wm = int(state.get("watermark_us", 0))
        cycle = int(state.get("cycles", 0))
        st = self._load_state(state)
        path = os.path.join(self.input_dir, fname)

        counts, n_late, max_ts = self._cycle_counts(path, wm, cycle)

        # changelog diff against the open-window state (domain-sized)
        merged = counts.merge(st, on=["win_us", "key"], how="left",
                              suffixes=("_new", "_old"))
        prev = merged["n_old"].fillna(0).astype("int64")
        new_n = merged["n_new"].astype("int64") + prev
        retract = merged[prev > 0].assign(op=np.int8(-1), n=prev[prev > 0])
        insert = merged.assign(op=np.int8(1), n=new_n)
        chlog = (pd.concat([retract[["win_us", "key", "op", "n"]],
                            insert[["win_us", "key", "op", "n"]]],
                           ignore_index=True)
                 .sort_values(["win_us", "key", "op"], kind="mergesort")
                 .reset_index(drop=True))
        chlog.insert(0, "cycle", np.int64(cycle))
        tmp = os.path.join(self.changelog_dir,
                           f"changelog-{cycle:05d}.parquet")
        chlog.to_parquet(tmp + ".tmp", index=False)
        os.replace(tmp + ".tmp", tmp)

        # fold into state, then evict CLOSED windows (watermark past
        # window end — no further update can arrive on time, and the
        # latest value was already emitted, so eviction is silent)
        upd = pd.concat(
            [st, counts.rename(columns={"n": "n"})], ignore_index=True)
        upd = (upd.groupby(["win_us", "key"], sort=False)["n"]
               .sum().reset_index())
        new_wm = max(wm, max_ts - self.lateness_us) if max_ts >= 0 else wm
        open_mask = upd["win_us"].to_numpy() + _WEEK_US > new_wm
        new_st = (upd[open_mask]
                  .sort_values(["win_us", "key"], kind="mergesort")
                  .reset_index(drop=True))

        open_fname = self.cp.stage_open_sessions(new_st, cycle)
        state["open_sessions_file"] = open_fname
        state["watermark_us"] = int(new_wm)
        state["processed"] = list(state.get("processed", [])) + [fname]
        state["cycles"] = cycle + 1
        result = {"file": fname, "watermark_us": int(new_wm),
                  "changelog_rows": int(len(chlog)),
                  "retractions": int((chlog["op"] == -1).sum()),
                  "late": int(n_late), "state_rows": int(len(new_st))}
        state["cycle_metrics"] = (list(state.get("cycle_metrics", []))
                                  + [result])
        self.cp.save(state)
        self.cp.gc_open_sessions(keep=open_fname)
        return result

    def run_all(self) -> dict:
        totals = {"cycles": 0, "changelog_rows": 0, "retractions": 0,
                  "late": 0}
        while (r := self.run_cycle()) is not None:
            totals["cycles"] += 1
            totals["changelog_rows"] += r["changelog_rows"]
            totals["retractions"] += r["retractions"]
            totals["late"] += r["late"]
        return totals

    def changelog(self) -> pd.DataFrame:
        # *.parquet only: a crash between the tmp write and os.replace
        # may leave a half-written .tmp beside the committed files
        parts = [pd.read_parquet(os.path.join(self.changelog_dir, f))
                 for f in sorted(os.listdir(self.changelog_dir))
                 if f.endswith(".parquet")]
        if not parts:
            return pd.DataFrame({
                "cycle": pd.Series([], dtype="int64"),
                "win_us": pd.Series([], dtype="int64"),
                "key": pd.Series([], dtype=object),
                "op": pd.Series([], dtype="int8"),
                "n": pd.Series([], dtype="int64"),
            })
        return pd.concat(parts, ignore_index=True)

    def folded(self) -> pd.DataFrame:
        """Materialize the consumer view: last-insert-wins per
        (window, key) — must equal the batch aggregate after the final
        cycle (the update-mode contract the tests pin)."""
        ch = self.changelog()
        ins = ch[ch["op"] == 1]
        last = (ins.sort_values(["cycle"], kind="mergesort")
                .groupby(["win_us", "key"], sort=False).tail(1))
        return (last[["win_us", "key", "n"]]
                .sort_values(["win_us", "key"], kind="mergesort")
                .reset_index(drop=True))
