"""Holistic grouped aggregates the catalog lacked: ordered string
aggregation, exact per-group mode, pivot (crosstab), and a set-op
(intersect/except) summary. Each is a distinct AGGREGATE SHAPE:

- string_agg — order-sensitive holistic agg whose output size is the
  group itself (the journey string); the canonical "can't combine from
  partials" aggregate, so the rows ride ONE user-bucket shuffle and
  concatenate inside the co-group.
- mode — holistic but SKETCHABLE: (user, type) partial counts combine
  associatively map-side, the argmax happens after one bucket fold.
- pivot — wide/crosstab output; per-batch 2-D partials (hour × type
  grid, bounded 24×5) merge in a single tiny fold, never a shuffle of
  row-level data.
- intersect summary — DISTINCT-set algebra over two predicates folded
  into per-user boolean flags (MAX per flag combines), then a scalar
  fold; no set is ever materialized anywhere.

Money/count math is integer end-to-end; string outputs are built with
the identical ordering clause on both engines (ts, event_id tie-break)
so the DuckDB oracle hash-matches. Reference semantics: SURVEY.md §2.6
aggregation-family mandate (the reference's own aggregate surface is
avgcolor/blurhash-style; these are the LLM-data-pipeline analogues).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _events(sf_dir: str, columns):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _global_fold(ds, merge):
    return (ds.map_batches(lambda b: b.assign(_k=0), batch_format="pandas")
            .groupby("_k")
            .map_groups(lambda g: merge(g.drop(columns=["_k"])),
                        batch_format="pandas"))


# ------------------------------------------------------ string_agg

def user_journey(sf_dir: str):
    """Per-user event-type journey string: event types concatenated
    with '>' in (ts, event_id) order — the order-sensitive holistic
    aggregate. Rows ride one user-bucket shuffle; the in-group sort +
    concat is the aggregate's inherent cost (its OUTPUT is the ordered
    group), so there is nothing to pre-combine; n_events comes along
    for free."""
    import numpy as np

    ev = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])

    def route(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_b=(b["user_id"] % 64).astype("int32"))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = g.groupby("user_id", sort=True)["event_type"].agg(
            [(">".join), "size"])
        out.columns = ["journey", "n_events"]
        out = out.reset_index()
        out["user_id"] = out["user_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (ev.map_batches(route, batch_format="pandas")
            .groupby("_b")
            .map_groups(lambda g: per_user(g.drop(columns=["_b"])),
                        batch_format="pandas"))


USER_JOURNEY_SQL = """
SELECT user_id,
       STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS journey,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------ mode

def mode_event_type(sf_dir: str):
    """Per-user MODE (most frequent event type, lexicographic
    tie-break) — holistic but sketchable: (user, type) counts combine
    associatively in per-batch partials, one user-bucket fold merges
    them, and the argmax is a vectorized sort + drop_duplicates."""
    ev = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (b.groupby(["user_id", "event_type"], sort=False)
               .size().rename("n").reset_index())
        out["_b"] = (out["user_id"] % 64).astype("int32")
        return out

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["user_id", "event_type"], sort=False)["n"]
             .sum().reset_index())
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        out = c.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy().astype("int64"),
            "mode_type": out["event_type"].to_numpy(),
            "n_events": out["n"].to_numpy().astype("int64"),
        }).sort_values("user_id").reset_index(drop=True)

    return (ev.map_batches(partial, batch_format="pandas")
            .groupby("_b")
            .map_groups(lambda g: pick(g.drop(columns=["_b"])),
                        batch_format="pandas"))


MODE_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, n AS n_events
FROM r WHERE rn = 1 ORDER BY user_id
"""


# ----------------------------------------------------------- pivot

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_hour_type(sf_dir: str):
    """PIVOT/crosstab: events counted per (hour-of-day × event type),
    one WIDE row per hour with a column per type. Per-batch partials
    are the full bounded grid (24 × 5 ints), so the fold is one tiny
    single-group merge — row-level data never shuffles."""
    import numpy as np

    ev = _events(sf_dir, ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hour = b["ts"].dt.hour.to_numpy()
        out = pd.DataFrame({"hour": hour, "event_type": b["event_type"]})
        g = (out.groupby(["hour", "event_type"], sort=False)
             .size().rename("n").reset_index())
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["hour", "event_type"], sort=False)["n"].sum()
        wide = c.unstack(fill_value=0)
        wide = wide.reindex(columns=list(_PIVOT_TYPES), fill_value=0)
        wide.columns = [f"n_{t}" for t in _PIVOT_TYPES]
        wide = wide.reset_index()
        wide["hour"] = wide["hour"].astype("int64")
        for t in _PIVOT_TYPES:
            wide[f"n_{t}"] = wide[f"n_{t}"].astype("int64")
        return wide.sort_values("hour").reset_index(drop=True)

    return _global_fold(ev.map_batches(partial, batch_format="pandas"),
                        merge)


PIVOT_SQL = """
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
         AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
         AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
         AS n_view
FROM events GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------- set-op summary

def purchase_periods_setop(sf_dir: str):
    """INTERSECT / EXCEPT summary without materializing either set:
    distinct purchasers of the month's first half vs second half,
    reported as |A∩B|, |A∖B|, |B∖A|. Per-user membership flags fold
    with MAX (associative), so the two DISTINCT sets exist only as
    two bit-columns on user-grain rows; the final fold is scalar."""
    import numpy as np

    t0 = pd.Timestamp("2024-01-16")
    ev = _events(sf_dir, ["user_id", "event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "purchase"]
        first = (b["ts"] < t0).to_numpy().astype("int64")
        out = pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype("int64"),
            "in_a": first, "in_b": 1 - first,
        })
        out = out.groupby("user_id", sort=False).max().reset_index()
        out["_b"] = (out["user_id"] % 64).astype("int32")
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id", sort=False)[["in_a", "in_b"]].max()
        a, b = f["in_a"].to_numpy(), f["in_b"].to_numpy()
        return pd.DataFrame({
            "n_both": [int((a & b).sum())],
            "n_only_first": [int((a & (1 - b)).sum())],
            "n_only_second": [int(((1 - a) & b).sum())],
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_both": pd.array([int(g["n_both"].sum())], dtype="int64"),
            "n_only_first": pd.array([int(g["n_only_first"].sum())],
                                     dtype="int64"),
            "n_only_second": pd.array([int(g["n_only_second"].sum())],
                                      dtype="int64"),
        })

    folded = (ev.map_batches(partial, batch_format="pandas")
              .groupby("_b")
              .map_groups(lambda g: fold(g.drop(columns=["_b"])),
                          batch_format="pandas"))
    return _global_fold(folded, merge)


SETOP_SQL = """
WITH f AS (
  SELECT user_id,
         MAX(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
           AS in_a,
         MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
           AS in_b
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(COALESCE(SUM(in_a * in_b), 0) AS BIGINT) AS n_both,
       CAST(COALESCE(SUM(in_a * (1 - in_b)), 0) AS BIGINT)
         AS n_only_first,
       CAST(COALESCE(SUM((1 - in_a) * in_b), 0) AS BIGINT)
         AS n_only_second
FROM f
"""


# ------------------------------------------------- moments / corr

def group_moments(sf_dir: str):
    """Distributed MOMENTS: per return-flag the exact integer
    (n, Σx, Σy, Σx², Σy², Σxy) over (quantity, whole-dollar price) —
    the one-pass mergeable-sufficient-statistics pattern behind
    covariance / correlation / regression at 100 TB (each batch emits
    ≤ |groups| rows; the driver-side corr is then two multiplies and a
    sqrt away, done by the CALLER because sqrt breaks integer hash
    equality). Whole-dollar y keeps Σy² inside int64 at bench scale;
    a 100 TB run would widen these to float128/hugeint partials.

    Output: l_returnflag, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy.
    """
    import numpy as np

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_returnflag", "l_quantity",
                                    "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy().astype("int64")
        y = np.floor(b["l_extendedprice"].to_numpy()).astype("int64")
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_numpy(),
            "n": np.int64(1), "sum_x": x, "sum_y": y,
            "sum_xx": x * x, "sum_yy": y * y, "sum_xy": x * y,
        })
        return (df.groupby("l_returnflag", sort=False)
                .sum().reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_returnflag", sort=True).sum().reset_index()
        for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"):
            out[c] = out[c].astype("int64")
        return out

    return _global_fold(line.map_batches(partial, batch_format="pandas"),
                        merge)


GROUP_MOMENTS_SQL = """
WITH b AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * x) AS BIGINT) AS sum_xx,
       CAST(SUM(y * y) AS BIGINT) AS sum_yy,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy
FROM b GROUP BY 1 ORDER BY 1
"""


def group_regression(sf_dir: str):
    """Per-group least-squares SLOPE from the :func:`group_moments`
    sufficient statistics, kept EXACT as an integer rational:
    slope = slope_num / slope_den with slope_num = n·Σxy − Σx·Σy and
    slope_den = n·Σxx − (Σx)² — emitted as separate BIGINTs because a
    float division would break bitwise oracle equality (the
    time_weighted_value numerator/denominator precedent). One extra
    pure map over the moments fold; no new shuffle.

    Output: l_returnflag, n, slope_num, slope_den.
    """
    import numpy as np

    ds = group_moments(sf_dir)

    def slope(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(dtype="int64")
        sx = b["sum_x"].to_numpy(dtype="int64")
        sy = b["sum_y"].to_numpy(dtype="int64")
        sxx = b["sum_xx"].to_numpy(dtype="int64")
        sxy = b["sum_xy"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_numpy(),
            "n": n,
            "slope_num": n * sxy - sx * sy,
            "slope_den": n * sxx - sx * sx,
        })

    return ds.map_batches(slope, batch_format="pandas")


GROUP_REGRESSION_SQL = """
WITH b AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM b GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM m ORDER BY 1
"""


# ------------------------------------------------------ SCD type-2

def scd2_dimension(sf_dir: str):
    """Slowly-changing-dimension (type 2) build: collapse each user's
    event stream into versioned validity intervals of the tracked
    attribute (event_type) — consecutive equal values merge into one
    version row ``[valid_from, valid_to)`` with a per-user version
    number and an is_current flag. The BUILD side of the temporal
    table join (`temporal_join` PROBES such a dimension; this entry
    constructs it from the raw changelog — the warehouse-dimension
    primitive the catalog lacked).

    Scale shape: ONE user-bucket shuffle of four narrow columns
    (user, ts, event_id, attr — pruned at the read); inside each
    bucket the island split is a single vectorized boundary diff +
    cumsum (no per-user loop), version numbers come from the same run
    index, and valid_to is the next run's valid_from via one shift.
    Run boundaries depend only on each user's own ordered rows, so
    bucket-parallelism is exact. Timestamps ride int64 µs end-to-end
    (exact hash equality; the open version's valid_to is -1).
    """
    import numpy as np

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def route(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy().astype("int64"),
            "ts_us": b["ts"].astype("datetime64[us]").to_numpy()
                       .astype("int64"),
            "event_id": b["event_id"].to_numpy().astype("int64"),
            "attr": b["event_type"].to_numpy(),
            "_b": (b["user_id"].to_numpy() % 64).astype("int32"),
        })

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        a = g["attr"].to_numpy()
        n = len(g)
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            new_run[1:] = (u[1:] != u[:-1]) | (a[1:] != a[:-1])
        starts = np.flatnonzero(new_run)
        uu = u[starts]
        # per-user 1-based version number: run index minus the index
        # of the user's first run (runs are user-contiguous post-sort)
        first_of_user = np.ones(len(starts), dtype=bool)
        if len(starts) > 1:
            first_of_user[1:] = uu[1:] != uu[:-1]
        version = (np.arange(len(starts))
                   - np.maximum.accumulate(
                       np.where(first_of_user, np.arange(len(starts)), 0))
                   + 1)
        vfrom = t[starts]
        vto = np.empty(len(starts), dtype=np.int64)
        vto[:-1] = vfrom[1:]
        # each user's LAST run is the open version: next-run shift
        # crosses user boundaries, so mask those slots back to -1
        is_current = np.zeros(len(starts), dtype=bool)
        is_current[:-1] = first_of_user[1:]
        if len(starts):
            is_current[-1] = True
        vto[is_current] = -1
        ends = np.append(starts[1:], n)
        return pd.DataFrame({
            "user_id": uu,
            "version": version.astype("int64"),
            "attr": a[starts],
            "valid_from_us": vfrom,
            "valid_to_us": vto,
            "is_current": is_current.astype("int64"),
            "n_events": (ends - starts).astype("int64"),
        })

    return (ev.map_batches(route, batch_format="pandas")
            .groupby("_b")
            .map_groups(lambda g: versions(g.drop(columns=["_b"])),
                        batch_format="pandas"))


SCD2_SQL = """
WITH e AS (
  SELECT user_id, event_type AS attr,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM e
), v AS (
  SELECT user_id, run_id, MIN(attr) AS attr,
         MIN(ts_us) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM r GROUP BY 1, 2
)
SELECT user_id, CAST(run_id AS BIGINT) AS version, attr, valid_from_us,
       COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY run_id),
                CAST(-1 AS BIGINT)) AS valid_to_us,
       CAST(lead(run_id) OVER (PARTITION BY user_id ORDER BY run_id)
            IS NULL AS BIGINT) AS is_current,
       n_events
FROM v
"""


# Changelog form of the same versions (the streaming SCD2 oracle):
# every version opens (+1, valid_to -1, at its valid_from); every
# version WITH a successor also retracts its open row (-1) and
# re-inserts it closed (+1, valid_to = successor's valid_from), both
# at the change instant. The op stream is a pure function of each
# user's (ts, event_id) order, so the batch derivation mirrors the
# watermark-gated streaming job exactly.
SCD2_OPS_SQL = """
WITH e AS (
  SELECT user_id, event_type AS attr,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM e
), v AS (
  SELECT user_id, run_id, MIN(attr) AS attr,
         MIN(ts_us) AS valid_from_us
  FROM r GROUP BY 1, 2
), w AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS version, attr,
         valid_from_us,
         lead(valid_from_us) OVER (PARTITION BY user_id
                                   ORDER BY run_id) AS next_from
  FROM v
)
SELECT user_id, CAST(1 AS BIGINT) AS op, version, attr, valid_from_us,
       CAST(-1 AS BIGINT) AS valid_to_us,
       valid_from_us AS change_ts_us
FROM w
UNION ALL
SELECT user_id, CAST(-1 AS BIGINT), version, attr, valid_from_us,
       CAST(-1 AS BIGINT), next_from
FROM w WHERE next_from IS NOT NULL
UNION ALL
SELECT user_id, CAST(1 AS BIGINT), version, attr, valid_from_us,
       next_from, next_from
FROM w WHERE next_from IS NOT NULL
"""
