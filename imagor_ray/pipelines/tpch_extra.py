"""Second wave of TPC-H-shaped relational operators (Q4/Q6/Q7/Q8/Q13/
Q15/Q17/Q19/Q21/Q22 adapted to the synthetic schema, which lacks
partsupp / l_shipmode / l_commitdate / l_receiptdate — each keeps the
query's defining *pattern* while substituting available columns).

Patterns covered (the point of this module — one per classic plan
shape the first wave didn't exercise):

- Q4  — EXISTS semi-join: distinct-key dedup feeding a hash join.
- Q6  — single-scan predicate aggregate (no join, pure map+fold).
- Q7  — double dim-tagged large-large join, multi-key group.
- Q8  — grouped FRACTION over an 8-table star (market share).
- Q13 — LEFT OUTER join with zero-preserving counts, then a second
        aggregation over the first's output (histogram of counts).
- Q15 — global-max scalar subquery, ties included.
- Q17 — correlated per-group average, made exact by integer
        cross-multiplication (5*qty*cnt < sum_qty ⟺ qty < 0.2*avg).
- Q19 — disjunctive multi-branch join predicate pushed map-side.
- Q21 — holistic per-group (per-order) predicate over co-grouped rows.
- Q22 — global scalar threshold + anti-join.

All money math uses the repo's exact-integer convention: floor(x*1000)
(milli) or floor(x*100) (cents) applied at the ROW level with the
identical IEEE expression in the DuckDB oracle, so distributed sums
hash-match bit-for-bit (CLAUDE.md invariant).

Scale notes: dims (nation/region, filtered part subsets, supplier,
customer key→tag maps) broadcast once via ``ray.put`` and are read
per-batch — the measured-crossover idiom of q5/q18 (BENCH.md finding
22). Large-large joins go through native ``Dataset.join`` after
aggregate-before-join partials. Holistic per-order logic (q21) rides
one hash-bucket shuffle and uses vectorized in-bucket pandas groupbys
(never per-key tasks — BENCH.md finding 14).

Reference semantics: TPC-H spec rev 3.0 query definitions; the
reference engine analogue is the relational breadth mandate of
SURVEY.md §2.6 (aggregations/joins family).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _ncpu() -> int:
    import ray as _ray

    return max(8, int(_ray.cluster_resources().get("CPU", 8)))


def _global_fold(ds, merge):
    """Single-row (or few-row) final fold: tag _k=0, one tiny group."""
    return (ds.map_batches(lambda b: b.assign(_k=0), batch_format="pandas")
            .groupby("_k")
            .map_groups(lambda g: merge(g.drop(columns=["_k"])),
                        batch_format="pandas"))


# ---------------------------------------------------------------- Q4

def q4_priority_semi(sf_dir: str):
    """Q4-shaped order-priority checking: count orders per priority in
    one quarter having AT LEAST ONE returned ('R') lineitem — an EXISTS
    semi-join (dedup the probe side so the semi-join cannot multiply).

    Scale shape: lineitem collapses to distinct R-orderkeys map-side
    (per-batch unique) and the date-pruned orders tag along as kind-0
    rows through the SAME orderkey-bucket exchange (the engine's
    tagged-union co-group idiom, q13/q22); each co-group keeps orders
    whose key appears among its kind-1 probe rows and emits per-priority
    count partials. One shuffle carrying only (orderkey, tag[, priority])
    rows — chosen over ``Dataset.join`` because a selective date prune
    leaves most hash partitions of the build side EMPTY and Ray's join
    aggregator loses the schema of empty partitions (reproduced at 32
    CPUs / sf0.001); the co-group is CPU-count-invariant."""
    import numpy as np

    lo, hi = pd.Timestamp("1996-07-01"), pd.Timestamp("1996-10-01")

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_returnflag"])

    def r_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["l_returnflag"] == "R", "l_orderkey"].unique()
        out = pd.DataFrame({
            "okey": k.astype("int64"),
            "o_orderpriority": "",
            "kind": np.int8(1),
        })
        out["_b"] = (out["okey"] % 64).astype("int32")
        return out

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        out = pd.DataFrame({
            "okey": b["o_orderkey"].to_numpy().astype("int64"),
            "o_orderpriority": b["o_orderpriority"].to_numpy(),
            "kind": np.int8(0),
        })
        out["_b"] = (out["okey"] % 64).astype("int32")
        return out

    tagged = (line.map_batches(r_keys, batch_format="pandas")
              .union(orders.map_batches(prune, batch_format="pandas")))

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        probe = set(g.loc[g["kind"] == 1, "okey"])
        o = g[(g["kind"] == 0) & g["okey"].isin(probe)]
        return (o.groupby("o_orderpriority", sort=False)
                .size().rename("order_count").reset_index())

    joined = (tagged.groupby("_b")
              .map_groups(lambda g: semi(g.drop(columns=["_b"])),
                          batch_format="pandas"))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby("o_orderpriority", sort=False)
                ["order_count"].sum().reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("o_orderpriority", sort=True)["order_count"]
               .sum().reset_index())
        out["order_count"] = out["order_count"].astype("int64")
        return out

    return _global_fold(joined.map_batches(partial, batch_format="pandas"),
                        merge)


Q4_SQL = """
WITH r AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o JOIN r ON r.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= DATE '1996-07-01'
  AND o.o_orderdate < DATE '1996-10-01'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- Q6

def q6_forecast_revenue(sf_dir: str):
    """Q6-shaped forecasting revenue change: one predicate scan, one
    global sum — the canonical no-join aggregate. revenue = extended
    price × discount over a shipdate year, mid-range discounts, small
    quantities. Pure map + single-row fold; the column-pruned read is
    the whole cost."""
    import numpy as np

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = ((b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
             & (b["l_discount"] >= 0.05) & (b["l_discount"] <= 0.07)
             & (b["l_quantity"] < 24))
        b = b[m]
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * b["l_discount"].to_numpy() * 1000).astype("int64")
        return pd.DataFrame({"revenue_m": [int(rev.sum())],
                             "n_items": [np.int64(len(b))]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "revenue_m": pd.array([int(g["revenue_m"].sum())],
                                  dtype="int64"),
            "n_items": pd.array([int(g["n_items"].sum())], dtype="int64"),
        })

    return _global_fold(line.map_batches(partial, batch_format="pandas"),
                        merge)


Q6_SQL = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 1000) AS BIGINT))
            AS BIGINT) AS revenue_m,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------- Q7

def q7_nation_volume(sf_dir: str):
    """Q7-shaped volume shipping: revenue between every ordered pair of
    distinct (supplier nation → customer nation) by ship year, 1996-97.

    Scale shape: both nation tags are applied MAP-SIDE from broadcast
    key→name luts (supplier and customer×nation folds — q5 idiom,
    measured-crossover broadcast), lineitem pre-aggregates to
    (orderkey, supp_nation, year) partials BEFORE the only large-large
    exchange (native hash join on orderkey against nation-tagged
    orders), and the multi-key group folds from partials."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray as _ray

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    s_ref = _ray.put(dict(zip(
        sup["s_suppkey"].astype(int),
        sup["s_nationkey"].astype(int).map(nname))))
    c_ref = _ray.put(dict(zip(
        cust["c_custkey"].astype(int),
        cust["c_nationkey"].astype(int).map(nname))))

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
        b = b[m]
        smap = _ray.get(s_ref)
        ext = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        part = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy().astype("int64"),
            "supp_nation": b["l_suppkey"].map(smap).to_numpy(),
            "l_year": b["l_shipdate"].dt.year.to_numpy().astype("int64"),
            "rev_m": np.floor(ext * (1 - disc) * 1000).astype("int64"),
        })
        return (part.groupby(["l_orderkey", "supp_nation", "l_year"],
                             sort=False)["rev_m"].sum().reset_index())

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        cmap = _ray.get(c_ref)
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy().astype("int64"),
            "cust_nation": b["o_custkey"].map(cmap).to_numpy(),
        })

    joined = orders.map_batches(tag_orders, batch_format="pandas").join(
        line.map_batches(line_partial, batch_format="pandas"),
        "inner", num_partitions=_ncpu(),
        on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["supp_nation"] != b["cust_nation"]]
        return (b.groupby(["supp_nation", "cust_nation", "l_year"],
                          sort=False)["rev_m"].sum()
                .rename("revenue_m").reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["supp_nation", "cust_nation", "l_year"],
                         sort=True)["revenue_m"].sum().reset_index())
        out["revenue_m"] = out["revenue_m"].astype("int64")
        return out

    return _global_fold(joined.map_batches(partial, batch_format="pandas"),
                        merge)


Q7_SQL = """
SELECT s_nat.n_name AS supp_nation,
       c_nat.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000)
                AS BIGINT)) AS BIGINT) AS revenue_m
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation s_nat ON s_nat.n_nationkey = s.s_nationkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation c_nat ON c_nat.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
  AND s_nat.n_name <> c_nat.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------- Q13

def q13_customer_distribution(sf_dir: str):
    """Q13-shaped customer order-count distribution: LEFT OUTER join
    (customers with zero qualifying orders MUST appear with count 0),
    then a second aggregation over the first's output — the histogram
    of per-customer counts.

    Scale shape: orders collapse to (custkey, cnt) partials map-side;
    the outer join is a tagged-union co-group on the shared custkey
    bucket (kind 0 = customer exists, kind 1 = count partial) so zero
    customers survive without a driver pass; the histogram is a second
    tiny bucket fold over count values."""
    import numpy as np

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])

    def o_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderpriority"] != "1-URGENT"]
        out = (b.groupby("o_custkey", sort=False).size()
               .rename("cnt").reset_index())
        return pd.DataFrame({
            "custkey": out["o_custkey"].to_numpy().astype("int64"),
            "cnt": out["cnt"].to_numpy().astype("int64"),
            "kind": np.int8(1),
        })

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    def c_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy().astype("int64"),
            "cnt": np.int64(0),
            "kind": np.int8(0),
        })

    tagged = (orders.map_batches(o_partial, batch_format="pandas")
              .union(cust.map_batches(c_rows, batch_format="pandas"))
              .map_batches(lambda b: b.assign(
                  _b=(b["custkey"] % 64).astype("int32")),
                  batch_format="pandas"))

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        # every customer contributes a kind-0 zero row, so a plain sum
        # over the co-group is exactly the left-outer count
        s = g.groupby("custkey", sort=False)["cnt"].sum()
        # second-level partial: histogram of counts within this bucket
        h = s.value_counts()
        return pd.DataFrame({"c_count": h.index.to_numpy().astype("int64"),
                             "custdist": h.to_numpy().astype("int64")})

    hist = (tagged.groupby("_b")
            .map_groups(lambda g: per_cust(g.drop(columns=["_b"])),
                        batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("c_count", sort=False)["custdist"].sum().reset_index()
        out["custdist"] = out["custdist"].astype("int64")
        return (out.sort_values(["custdist", "c_count"],
                                ascending=[False, False])
                .reset_index(drop=True))

    return _global_fold(hist, merge)


Q13_SQL = """
WITH c_orders AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------- Q15

def q15_top_supplier(sf_dir: str):
    """Q15-shaped top supplier: per-supplier revenue over one quarter,
    return the supplier(s) whose revenue equals the global maximum —
    the scalar-subquery-with-ties pattern.

    Scale shape: per-supplier totals from map partials + one bucket
    fold; the global max is a driver scalar over supplier-grain rows
    (O(|supplier|), already reduced); ties filter map-side; names
    attach from a broadcast supplier lut."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray as _ray

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        ext = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        part = pd.DataFrame({
            "s_suppkey": b["l_suppkey"].to_numpy().astype("int64"),
            "total_revenue_m": np.floor(ext * (1 - disc) * 1000)
            .astype("int64"),
        })
        out = (part.groupby("s_suppkey", sort=False)["total_revenue_m"]
               .sum().reset_index())
        out["_b"] = (out["s_suppkey"] % 64).astype("int32")
        return out

    totals = (line.map_batches(partial, batch_format="pandas")
              .groupby("_b")
              .map_groups(lambda g: g.drop(columns=["_b"])
                          .groupby("s_suppkey", sort=False)
                          ["total_revenue_m"].sum().reset_index(),
                          batch_format="pandas")
              .materialize())

    best = totals.max("total_revenue_m")

    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"]).to_pandas()
    n_ref = _ray.put(dict(zip(names["s_suppkey"].astype(int),
                              names["s_name"])))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["total_revenue_m"] == best]
        lut = _ray.get(n_ref)
        return pd.DataFrame({
            "s_suppkey": b["s_suppkey"].to_numpy().astype("int64"),
            "s_name": b["s_suppkey"].map(lut).to_numpy(),
            "total_revenue_m": b["total_revenue_m"].to_numpy()
            .astype("int64"),
        }).sort_values("s_suppkey")

    return totals.map_batches(finish, batch_format="pandas")


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
                  AS BIGINT)) AS BIGINT) AS total_revenue_m
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, r.total_revenue_m
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_revenue_m = (SELECT MAX(total_revenue_m) FROM rev)
ORDER BY r.s_suppkey
"""


# --------------------------------------------------------------- Q17

def q17_small_qty_revenue(sf_dir: str):
    """Q17-shaped small-quantity-order revenue: for one brand's parts,
    total the extended price of lineitems whose quantity is below 20%
    of that part's average quantity. The correlated per-group average
    is made EXACT by integer cross-multiplication:
    qty < 0.2 * (sum_qty / cnt)  ⟺  5 * qty * cnt < sum_qty.

    Scale shape: the brand's partkeys broadcast as a set (selective dim
    filter — 1/|brands| of part); matching lineitems ride ONE partkey
    bucket shuffle; each co-group computes its per-part stats AND
    filters its rows vectorized (two in-bucket pandas groupbys, both
    C-level aggs); a single-row fold finishes."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray as _ray

    brand = "Brand#23"
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"],
                         filters=[("p_brand", "=", brand)])
    keys_ref = _ray.put(set(part["p_partkey"].to_pylist()))

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice"])

    def route(b: pd.DataFrame) -> pd.DataFrame:
        keys = _ray.get(keys_ref)
        b = b[b["l_partkey"].isin(keys)]
        out = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy().astype("int64"),
            "qty": b["l_quantity"].to_numpy().astype("int64"),
            "ext_m": np.floor(b["l_extendedprice"].to_numpy() * 1000)
            .astype("int64"),
        })
        out["_b"] = (out["l_partkey"] % 64).astype("int32")
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        st = g.groupby("l_partkey", sort=False)["qty"].agg(
            ["sum", "count"])
        sum_qty = st["sum"].reindex(g["l_partkey"]).to_numpy()
        cnt = st["count"].reindex(g["l_partkey"]).to_numpy()
        keep = 5 * g["qty"].to_numpy() * cnt < sum_qty
        return pd.DataFrame({
            "total_ext_m": [int(g.loc[keep, "ext_m"].sum())],
            "n_items": [np.int64(int(keep.sum()))],
        })

    folded = (line.map_batches(route, batch_format="pandas")
              .groupby("_b")
              .map_groups(lambda g: per_part(g.drop(columns=["_b"])),
                          batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        total = int(g["total_ext_m"].sum())
        return pd.DataFrame({
            "total_ext_m": pd.array([total], dtype="int64"),
            "avg_yearly_m": pd.array([total // 7], dtype="int64"),
            "n_items": pd.array([int(g["n_items"].sum())], dtype="int64"),
        })

    return _global_fold(folded, merge)


Q17_SQL = """
WITH l AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(floor(l.l_extendedprice * 1000) AS BIGINT) AS ext_m
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
), st AS (
  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM l GROUP BY 1
)
SELECT CAST(COALESCE(SUM(l.ext_m), 0) AS BIGINT) AS total_ext_m,
       CAST(COALESCE(SUM(l.ext_m), 0) // 7 AS BIGINT) AS avg_yearly_m,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM l JOIN st ON st.l_partkey = l.l_partkey
WHERE 5 * l.qty * st.cnt < st.sum_qty
"""


# --------------------------------------------------------------- Q19

def q19_disjunctive_revenue(sf_dir: str):
    """Q19-shaped discounted revenue over three DISJUNCTIVE brand/size/
    quantity branches — the multi-branch join-predicate pattern, with
    the part side of every branch folded into one broadcast lut so the
    disjunction evaluates vectorized map-side (no join at all).

    Branches (adapted: p_container/l_shipmode don't exist here):
      A: Brand#12, size 1-5,  qty 1-11
      B: Brand#23, size 1-10, qty 10-20
      C: Brand#34, size 1-15, qty 20-30
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray as _ray

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filters=[("p_brand", "in", ["Brand#12", "Brand#23", "Brand#34"])],
    ).to_pandas()
    lut_ref = _ray.put({
        int(k): (b, int(s))
        for k, b, s in zip(part["p_partkey"], part["p_brand"],
                           part["p_size"])
    })

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lut = _ray.get(lut_ref)
        hit = b["l_partkey"].map(lut)
        m = hit.notna()
        b, hit = b[m], hit[m]
        brand = hit.str[0].to_numpy()
        size = hit.str[1].to_numpy().astype("int64")
        qty = b["l_quantity"].to_numpy().astype("int64")
        keep = (
            ((brand == "Brand#12") & (size >= 1) & (size <= 5)
             & (qty >= 1) & (qty <= 11))
            | ((brand == "Brand#23") & (size >= 1) & (size <= 10)
               & (qty >= 10) & (qty <= 20))
            | ((brand == "Brand#34") & (size >= 1) & (size <= 15)
               & (qty >= 20) & (qty <= 30)))
        b = b[keep]
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1 - b["l_discount"].to_numpy()) * 1000
                       ).astype("int64")
        return pd.DataFrame({"revenue_m": [int(rev.sum())],
                             "n_items": [np.int64(len(b))]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "revenue_m": pd.array([int(g["revenue_m"].sum())],
                                  dtype="int64"),
            "n_items": pd.array([int(g["n_items"].sum())], dtype="int64"),
        })

    return _global_fold(line.map_batches(partial, batch_format="pandas"),
                        merge)


Q19_SQL = """
SELECT CAST(COALESCE(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                              * 1000) AS BIGINT)), 0) AS BIGINT)
         AS revenue_m,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------- Q21

def q21_waiting_suppliers(sf_dir: str):
    """Q21-shaped suppliers-who-kept-orders-waiting, adapted: count per
    supplier the multi-supplier orders where THAT supplier is the only
    one with a returned ('R') lineitem — the holistic per-group
    predicate pattern (the decision needs every row of the order).

    Scale shape: one orderkey-bucket shuffle of 3-column rows; inside
    each bucket two VECTORIZED pandas groupbys (per (order,supp) flag
    fold, then per-order distinct/sum — C-level aggs, never per-key
    tasks, BENCH.md finding 14); supplier-grain partial counts fold in
    a second tiny exchange; names broadcast."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray as _ray

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey",
                                    "l_returnflag"])

    def route(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy().astype("int64"),
            "l_suppkey": b["l_suppkey"].to_numpy().astype("int64"),
            "has_r": (b["l_returnflag"] == "R").to_numpy()
            .astype("int64"),
        })
        # per-batch combiner: collapse duplicate (order, supp) rows
        out = (out.groupby(["l_orderkey", "l_suppkey"], sort=False)
               ["has_r"].max().reset_index())
        out["_b"] = (out["l_orderkey"] % 64).astype("int32")
        return out

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        ls = (g.groupby(["l_orderkey", "l_suppkey"], sort=False)
              ["has_r"].max().reset_index())
        od = ls.groupby("l_orderkey", sort=False)["has_r"].agg(
            ["size", "sum"])
        n_supp = od["size"].reindex(ls["l_orderkey"]).to_numpy()
        n_r = od["sum"].reindex(ls["l_orderkey"]).to_numpy()
        keep = (ls["has_r"].to_numpy() == 1) & (n_supp >= 2) & (n_r == 1)
        out = (ls[keep].groupby("l_suppkey", sort=False).size()
               .rename("numwait").reset_index())
        out["_sb"] = (out["l_suppkey"] % 16).astype("int32")
        return out

    per_supp = (line.map_batches(route, batch_format="pandas")
                .groupby("_b")
                .map_groups(lambda g: per_order(g.drop(columns=["_b"])),
                            batch_format="pandas")
                .groupby("_sb")
                .map_groups(lambda g: g.drop(columns=["_sb"])
                            .groupby("l_suppkey", sort=False)["numwait"]
                            .sum().reset_index(),
                            batch_format="pandas"))

    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"]).to_pandas()
    n_ref = _ray.put(dict(zip(names["s_suppkey"].astype(int),
                              names["s_name"])))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lut = _ray.get(n_ref)
        out = pd.DataFrame({
            "s_suppkey": g["l_suppkey"].to_numpy().astype("int64"),
            "s_name": g["l_suppkey"].map(lut).to_numpy(),
            "numwait": g["numwait"].to_numpy().astype("int64"),
        })
        return (out.sort_values(["numwait", "s_suppkey"],
                                ascending=[False, True])
                .reset_index(drop=True))

    return _global_fold(per_supp, merge)


Q21_SQL = """
WITH ls AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY 1, 2
), od AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
         CAST(SUM(has_r) AS BIGINT) AS n_r
  FROM ls GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM ls
JOIN od ON od.l_orderkey = ls.l_orderkey
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ls.has_r = 1 AND od.n_supp >= 2 AND od.n_r = 1
GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey
"""


# --------------------------------------------------------------- Q22

def q22_dormant_customers(sf_dir: str):
    """Q22-shaped global-relationship opportunity: customers with an
    account balance above the mean POSITIVE balance and NO order since
    1999 (dormant — every synthetic customer has *some* order, so the
    anti-join keys on recent orders), grouped by market segment — the
    global-scalar-threshold + anti-join pattern. The float mean
    comparison is exact via integer cross-multiplication:
    bal > sum/n ⟺ bal_c * n > sum_c.

    Scale shape: pass 1 folds the (sum, count) scalar from map
    partials (two ints to the driver); pass 2 anti-joins customers
    against the deduped order-custkey set through a tagged-union
    co-group on the custkey bucket; segment totals fold from
    partials."""
    import numpy as np

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal",
                                    "c_mktsegment"])

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = b[b["c_acctbal"] > 0.0]
        bal_c = np.floor(pos["c_acctbal"].to_numpy() * 100).astype("int64")
        return pd.DataFrame({"sum_c": [int(bal_c.sum())],
                             "n": [np.int64(len(pos))]})

    scal = (cust.map_batches(bal_partial, batch_format="pandas")
            .to_pandas())
    sum_c, n_pos = int(scal["sum_c"].sum()), int(scal["n"].sum())

    def c_rows(b: pd.DataFrame) -> pd.DataFrame:
        bal_c = np.floor(b["c_acctbal"].to_numpy() * 100).astype("int64")
        keep = bal_c * n_pos > sum_c
        b = b[keep]
        return pd.DataFrame({
            "custkey": b["c_custkey"].to_numpy().astype("int64"),
            "bal_c": bal_c[keep],
            "seg": b["c_mktsegment"].to_numpy(),
            "kind": np.int8(0),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def o_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["o_orderdate"] >= pd.Timestamp("1999-01-01"),
                  "o_custkey"].unique()
        return pd.DataFrame({
            "custkey": k.astype("int64"),
            "bal_c": np.int64(0),
            "seg": "",
            "kind": np.int8(1),
        })

    tagged = (cust.map_batches(c_rows, batch_format="pandas")
              .union(orders.map_batches(o_keys, batch_format="pandas"))
              .map_batches(lambda b: b.assign(
                  _b=(b["custkey"] % 64).astype("int32")),
                  batch_format="pandas"))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        has_order = set(g.loc[g["kind"] == 1, "custkey"])
        c = g[(g["kind"] == 0) & ~g["custkey"].isin(has_order)]
        out = c.groupby("seg", sort=False).agg(
            numcust=("custkey", "size"), totacctbal_c=("bal_c", "sum"))
        return out.reset_index().rename(columns={"seg": "c_mktsegment"})

    folded = (tagged.groupby("_b")
              .map_groups(lambda g: anti(g.drop(columns=["_b"])),
                          batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("c_mktsegment", sort=True).agg(
            numcust=("numcust", "sum"),
            totacctbal_c=("totacctbal_c", "sum")).reset_index()
        out["numcust"] = out["numcust"].astype("int64")
        out["totacctbal_c"] = out["totacctbal_c"].astype("int64")
        return out

    return _global_fold(folded, merge)


Q22_SQL = """
WITH s AS (
  SELECT CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_c
FROM customer c, s
WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT) * s.n > s.sum_c
  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                          WHERE o_orderdate >= DATE '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------- Q8

def q8_market_share(sf_dir: str):
    """Q8-shaped national market share: among ASIA-region customers'
    1995-96 orders for STANDARD-type parts, the yearly revenue share
    supplied from NATION_8, in exact integer parts-per-million
    (``nation_m * 1000000 // total_m`` — floor == trunc on the
    nonnegative sums, so the DuckDB ``//`` mirror hash-matches).

    Plan shape (the one classic pattern the wave lacked: a scalar
    FRACTION of a grouped aggregate over an 8-table star): every
    dimension hop is applied MAP-SIDE from broadcast luts — part-type
    keys gate lineitem, supplier→nation names tag its partials,
    customer→region gates orders (q5/q7 idiom, measured-crossover
    broadcast) — so the only large-large exchange is the native hash
    join of (orderkey, nation, vol_m) lineitem partials against the
    date-pruned order keys; the per-year share folds from
    (year, nation) partials.

    Reference semantics: TPC-H spec rev 3.0 Q8 (p_type/region/nation
    constants adapted to the synthetic dimension values)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray as _ray

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name",
                                    "n_regionkey"]).to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    asia_nk = set(nation[nation["n_regionkey"].isin(
        region[region["r_name"] == "ASIA"]["r_regionkey"])]
        ["n_nationkey"].astype(int))
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"]).to_pandas()
    std_parts = set(part[part["p_type"] == "STANDARD"]
                    ["p_partkey"].astype(int))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    p_ref = _ray.put(std_parts)
    s_ref = _ray.put(dict(zip(
        sup["s_suppkey"].astype(int),
        sup["s_nationkey"].astype(int).map(nname))))
    c_ref = _ray.put(set(
        cust[cust["c_nationkey"].astype(int).isin(asia_nk)]
        ["c_custkey"].astype(int)))

    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1996-12-31")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        pk = _ray.get(p_ref)
        b = b[b["l_partkey"].isin(pk)]
        smap = _ray.get(s_ref)
        ext = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        partial = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy().astype("int64"),
            "nation": b["l_suppkey"].map(smap).to_numpy(),
            "vol_m": np.floor(ext * (1 - disc) * 1000).astype("int64"),
        })
        return (partial.groupby(["l_orderkey", "nation"], sort=False)
                ["vol_m"].sum().reset_index())

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def prune_orders(b: pd.DataFrame) -> pd.DataFrame:
        ck = _ray.get(c_ref)
        m = ((b["o_orderdate"] >= lo) & (b["o_orderdate"] <= hi)
             & b["o_custkey"].isin(ck))
        b = b[m]
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy().astype("int64"),
            "o_year": b["o_orderdate"].dt.year.to_numpy().astype("int64"),
        })

    joined = orders.map_batches(prune_orders, batch_format="pandas").join(
        line.map_batches(line_partial, batch_format="pandas"),
        "inner", num_partitions=_ncpu(),
        on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vol = b["vol_m"].to_numpy(dtype="int64")
        isn = (b["nation"] == "NATION_8").to_numpy()
        out = pd.DataFrame({"o_year": b["o_year"].to_numpy(dtype="int64"),
                            "nation_m": np.where(isn, vol, 0),
                            "total_m": vol})
        return (out.groupby("o_year", sort=False)[["nation_m", "total_m"]]
                .sum().reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("o_year", sort=True)[["nation_m", "total_m"]]
               .sum().reset_index())
        out["nation_m"] = out["nation_m"].astype("int64")
        out["total_m"] = out["total_m"].astype("int64")
        out["share_ppm"] = (out["nation_m"] * 1_000_000
                            // out["total_m"]).astype("int64")
        return out

    return _global_fold(joined.map_batches(partial, batch_format="pandas"),
                        merge)


Q8_SQL = """
WITH flat AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 1000)
              AS BIGINT) AS vol_m,
         n2.n_name AS nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                        AND TIMESTAMP '1996-12-31'
)
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_8' THEN vol_m ELSE 0 END)
            AS BIGINT) AS nation_m,
       CAST(SUM(vol_m) AS BIGINT) AS total_m,
       CAST(SUM(CASE WHEN nation = 'NATION_8' THEN vol_m ELSE 0 END)
            * 1000000 // SUM(vol_m) AS BIGINT) AS share_ppm
FROM flat GROUP BY o_year ORDER BY o_year
"""
