"""Window shapes the catalog lacked: sliding DISTINCT-count (holistic
— a plain count can fold from partials, a distinct count cannot),
time-weighted value integration (ordered window + LEAD), and
gaps-and-islands activity streaks (the date − row_number trick).

Scale shapes:
- sliding distinct — per-batch (hour, user) dedup, a bounded 6-way
  fan-out to the covering window starts, re-dedup map-side, then ONE
  window-bucket shuffle of (window, user) pairs; the in-group distinct
  is exact. The shuffle carries ≤ 6 × |distinct (hour,user)| rows —
  never raw events.
- time-weighted average — rows ride one user-bucket shuffle; LEAD is a
  vectorized in-group shift after a mergesort; numerator/denominator
  are exact integer sums (the ratio is deliberately NOT emitted: DuckDB
  `//` truncates while numpy floor-divides — CLAUDE.md invariant — so
  the caller divides).
- streaks — per-batch distinct (user, day) partials, one user-bucket
  fold, islands found by a vectorized cumsum over day gaps.

All three mirror the identical ordering/arithmetic in their DuckDB
oracles (ts then event_id tie-break; integer µs / epoch-day math).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

_US_PER_HOUR = 3_600_000_000
_US_PER_DAY = 86_400_000_000


def _events(sf_dir: str, columns):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# ----------------------------------------- sliding distinct count

def sliding_distinct_users(sf_dir: str, window_hours: int = 6):
    """Distinct users per sliding 6-hour window advancing hourly.
    Every (hour, user) pair covers the ``window_hours`` window starts
    (t-5 … t); the distinct count is holistic, so pairs — not counts —
    ride the one window-bucket shuffle, pre-deduped map-side."""
    import numpy as np

    ev = _events(sf_dir, ["ts", "user_id"])

    def fanout(b: pd.DataFrame) -> pd.DataFrame:
        hr = (b["ts"].astype("datetime64[us]").astype("int64")
              // _US_PER_HOUR).to_numpy()
        pairs = pd.DataFrame({
            "hr": hr, "user_id": b["user_id"].to_numpy().astype("int64"),
        }).drop_duplicates()
        n = len(pairs)
        off = np.repeat(np.arange(window_hours, dtype="int64"), n)
        out = pd.DataFrame({
            "window_start_hr": np.tile(pairs["hr"].to_numpy(),
                                       window_hours) - off,
            "user_id": np.tile(pairs["user_id"].to_numpy(), window_hours),
        }).drop_duplicates()
        out["_b"] = (out["window_start_hr"] % 64).astype("int32")
        return out

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = (d.groupby("window_start_hr", sort=True)["user_id"]
               .size().rename("n_users").reset_index())
        out["window_start_hr"] = out["window_start_hr"].astype("int64")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (ev.map_batches(fanout, batch_format="pandas")
            .groupby("_b")
            .map_groups(lambda g: count_distinct(g.drop(columns=["_b"])),
                        batch_format="pandas"))


SLIDING_DISTINCT_SQL = """
WITH e AS (
  SELECT DISTINCT epoch_us(ts) // 3600000000 AS hr, user_id FROM events
), w AS (
  SELECT DISTINCT e.hr - t.o AS window_start_hr, e.user_id
  FROM e CROSS JOIN range(6) AS t(o)
)
SELECT CAST(window_start_hr AS BIGINT) AS window_start_hr,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM w GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------- time-weighted value

def time_weighted_value(sf_dir: str):
    """Per-user time-weighted value integral: each event's value (in
    exact milli-units) holds until the user's next event; emit the
    integer numerator Σ v_m·Δt_us and denominator Σ Δt_us (users with
    ≥2 events). LEAD(ts) is a vectorized shift inside one user-bucket
    co-group sorted by (ts, event_id) — the same ordering clause as
    the oracle, so sums match bit-for-bit."""
    import numpy as np

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def route(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_b=(b["user_id"] % 64).astype("int32"))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        u = g["user_id"].to_numpy().astype("int64")
        v_m = np.floor(g["value"].to_numpy() * 1000).astype("int64")
        nxt = np.empty_like(t)
        nxt[:-1] = t[1:]
        nxt[-1] = -1
        same = np.empty(len(u), dtype=bool)
        same[:-1] = u[:-1] == u[1:]
        same[-1] = False
        dt = np.where(same, nxt - t, 0)
        df = pd.DataFrame({"user_id": u, "num": v_m * dt, "den": dt})
        out = df[same].groupby("user_id", sort=True).agg(
            twa_num=("num", "sum"), twa_den=("den", "sum")).reset_index()
        out["twa_num"] = out["twa_num"].astype("int64")
        out["twa_den"] = out["twa_den"].astype("int64")
        return out

    return (ev.map_batches(route, batch_format="pandas")
            .groupby("_b")
            .map_groups(lambda g: per_user(g.drop(columns=["_b"])),
                        batch_format="pandas"))


TIME_WEIGHTED_SQL = """
WITH o AS (
  SELECT user_id,
         CAST(floor(value * 1000) AS BIGINT) AS v_m,
         epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT user_id,
       CAST(SUM(v_m * (nxt - t)) AS BIGINT) AS twa_num,
       CAST(SUM(nxt - t) AS BIGINT) AS twa_den
FROM o WHERE nxt IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------ gaps & islands

def activity_streaks(sf_dir: str):
    """Gaps-and-islands: per user the longest run of CONSECUTIVE
    active days, the number of runs, and total active days. Per-batch
    distinct (user, day) partials shrink the shuffle to day grain; the
    in-group island split is one vectorized cumsum over day gaps (the
    distributed form of the day − row_number() trick)."""
    import numpy as np

    ev = _events(sf_dir, ["user_id", "ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        d = (b["ts"].astype("datetime64[us]").astype("int64")
             // _US_PER_DAY).to_numpy()
        out = pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype("int64"),
            "day": d,
        }).drop_duplicates()
        out["_b"] = (out["user_id"] % 64).astype("int32")
        return out

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["user_id", "day"],
                                            kind="mergesort")
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        new_run = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        run_id = np.cumsum(new_run)
        df = pd.DataFrame({"user_id": u, "run": run_id})
        lens = (df.groupby(["user_id", "run"], sort=False)
                .size().rename("len").reset_index())
        out = lens.groupby("user_id", sort=True).agg(
            longest_streak=("len", "max"), n_streaks=("len", "size"),
            n_active_days=("len", "sum")).reset_index()
        for c in ("user_id", "longest_streak", "n_streaks",
                  "n_active_days"):
            out[c] = out[c].astype("int64")
        return out

    return (ev.map_batches(days, batch_format="pandas")
            .groupby("_b")
            .map_groups(lambda g: islands(g.drop(columns=["_b"])),
                        batch_format="pandas"))


STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), g AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY day) AS island
  FROM d
), s AS (
  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
  FROM g GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM s GROUP BY 1 ORDER BY 1
"""
