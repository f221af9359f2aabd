"""Distributed PageRank over the customer–supplier purchase graph —
the fourth iterative algorithm under the exact hash gate (after
``dedup_components``' label propagation, ``kmeans_train`` and
``pca_power_iter``), and the weighted-graph complement to components'
unweighted closure.

Graph: bipartite customers ↔ suppliers, an undirected edge per DISTINCT
(o_custkey, l_suppkey) purchase relationship (node ids disambiguated as
``cust*2`` / ``supp*2+1``). Undirected means every node has out-degree
≥ 1, so there are no dangling nodes and the damped update covers every
node each round.

Arithmetic is exact-integer PageRank in micro-units: pr₀ = 1,000,000;
per round ``pr'(v) = 150_000 + (850 · Σ_{u→v} (pr(u) // outdeg(u)))
// 1000``. All values are positive, so Python ``//`` (floor) and DuckDB
``//`` (trunc) coincide, and the whole 3-round recursion unrolls into
CTEs that DuckDB reproduces bit-for-bit.

Scale shape (the components round topology, ``dedup.py:777``):

- edge derivation is ONE tagged co-group on the orderkey bucket
  (orders rows carry custkey, lineitem rows carry suppkey — the fact
  table never joins unbucketed), then an edge-bucket distinct;
- each round is TWO bucketed exchanges: a src-bucket co-group of
  (state, edges) emitting contributions, then a dst-bucket co-group of
  (contributions, degree rows) folding next-round state — never the
  fact tables, never a broadcast/driver node table;
- edges + degrees materialize once; pr re-materializes per round so
  round N+1 never re-executes rounds 1..N (the bpe/kmeans re-read
  precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["pagerank", "pagerank_sql", "butterfly_count", "BUTTERFLY_SQL",
           "bfs_hops", "BFS_HOPS_SQL"]

_PR0 = 1_000_000
_DAMP_NUM = 850          # 0.85 in milli
_BASE = 150_000          # (1 - 0.85) · PR0 in micro-units


def _cs_pairs(sf_dir: str, num_buckets: int) -> rd.Dataset:
    """Raw (c, s) purchase pairs via the tagged co-group join on the
    orderkey bucket — deduped per order-bucket group only (the SAME
    (c, s) can re-emerge from different order buckets; callers apply
    the global distinct on whichever bucket axis their algorithm
    shuffles anyway). Shared by :func:`_edges` (pagerank/BFS node
    encoding) and :func:`butterfly_count` (supplier-bucket wedges)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey"])

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "key": k, "kind": np.zeros(len(b), dtype=np.int8),
            "val": b["o_custkey"].to_numpy().astype(np.int64),
            "_ob": (k % num_buckets).astype(np.int32),
        })

    def tag_line(b: pd.DataFrame) -> pd.DataFrame:
        k = b["l_orderkey"].to_numpy().astype(np.int64)
        # map-side pre-distinct: one (order, supp) per batch
        d = pd.DataFrame({"key": k, "val": b["l_suppkey"].to_numpy()
                          .astype(np.int64)}).drop_duplicates()
        d["kind"] = np.int8(1)
        d["_ob"] = (d["key"].to_numpy() % num_buckets).astype(np.int32)
        return d[["key", "kind", "val", "_ob"]]

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        cust = g[g["kind"] == 0]
        lut = dict(zip(cust["key"], cust["val"]))
        li = g[g["kind"] == 1]
        return pd.DataFrame({
            "c": li["key"].map(lut).to_numpy(dtype="int64"),
            "s": li["val"].to_numpy(dtype="int64"),
        }).drop_duplicates()

    tagged = (orders.map_batches(tag_orders, batch_format="pandas")
              .union(line.map_batches(tag_line, batch_format="pandas")))
    return (tagged.groupby("_ob")
            .map_groups(lambda g: attach(g.drop(columns=["_ob"])),
                        batch_format="pandas"))


def _edges(sf_dir: str, num_buckets: int) -> rd.Dataset:
    """Distinct undirected purchase edges (nodes encoded cust*2 /
    supp*2+1) from the shared :func:`_cs_pairs` derivation."""
    half = _cs_pairs(sf_dir, num_buckets).map_batches(
        lambda b: pd.DataFrame({
            "src": b["c"].to_numpy(dtype="int64") * 2,
            "dst": b["s"].to_numpy(dtype="int64") * 2 + 1,
        }),
        batch_format="pandas")

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy()
        d = b["dst"].to_numpy()
        out = pd.DataFrame({"src": np.concatenate([s, d]),
                            "dst": np.concatenate([d, s])})
        out["_sb"] = (out["src"].to_numpy() % num_buckets).astype(np.int32)
        return out

    return (half.map_batches(both_dirs, batch_format="pandas")
            .groupby("_sb")
            .map_groups(lambda g: g.drop(columns=["_sb"]).drop_duplicates(),
                        batch_format="pandas")
            .materialize())


def pagerank(sf_dir: str, rounds: int = 3,
             num_buckets: int = 32) -> pd.DataFrame:
    """Output: node_type ('customer'/'supplier'), node_id, pr
    (micro-units after ``rounds`` damped updates)."""
    edges = _edges(sf_dir, num_buckets)

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("src", sort=False).size().reset_index(name="outdeg")
        s["_nb"] = (s["src"].to_numpy(dtype="int64") % num_buckets
                    ).astype(np.int32)
        return s

    def deg_merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("src", sort=False)["outdeg"].sum().reset_index()
        return pd.DataFrame({
            "node": s["src"].to_numpy(dtype="int64"),
            "outdeg": s["outdeg"].to_numpy(dtype="int64"),
            "pr": np.full(len(s), _PR0, dtype="int64"),
        })

    state = (edges.map_batches(deg_partial, batch_format="pandas")
             .groupby("_nb")
             .map_groups(lambda g: deg_merge(g.drop(columns=["_nb"])),
                         batch_format="pandas")
             .materialize())

    def tag_state(b: pd.DataFrame) -> pd.DataFrame:
        n = b["node"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "key": n, "kind": np.zeros(len(b), dtype=np.int8),
            "dst": np.full(len(b), -1, dtype="int64"),
            "contrib": b["pr"].to_numpy(dtype="int64")
            // b["outdeg"].to_numpy(dtype="int64"),
            "outdeg": b["outdeg"].to_numpy(dtype="int64"),
            "_eb": (n % num_buckets).astype(np.int32),
        })

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "key": s, "kind": np.ones(len(b), dtype=np.int8),
            "dst": b["dst"].to_numpy(dtype="int64"),
            "contrib": np.full(len(b), -1, dtype="int64"),
            "outdeg": np.full(len(b), -1, dtype="int64"),
            "_eb": (s % num_buckets).astype(np.int32),
        })

    def offer(g: pd.DataFrame) -> pd.DataFrame:
        """Contribution rows (node=dst, c=pr//outdeg of src), tagged
        kind=1 so they share the ``_nb`` exchange with degree rows."""
        st = g[g["kind"] == 0]
        lutc = dict(zip(st["key"], st["contrib"]))
        ed = g[g["kind"] == 1]
        out = pd.DataFrame({
            "node": ed["dst"].to_numpy(dtype="int64"),
            "c": ed["key"].map(lutc).to_numpy(dtype="int64"),
        })
        out["kind"] = np.int8(1)
        out["_nb"] = (out["node"].to_numpy() % num_buckets).astype(np.int32)
        return out

    def state_deg_rows(b: pd.DataFrame) -> pd.DataFrame:
        """Degree rows (node, c=outdeg), tagged kind=0, riding the same
        ``_nb`` exchange as the contributions — each reducer sees only
        its own bucket's degrees, so no driver/broadcast node table."""
        n = b["node"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "node": n,
            "c": b["outdeg"].to_numpy(dtype="int64"),
            "kind": np.zeros(len(b), dtype=np.int8),
            "_nb": (n % num_buckets).astype(np.int32),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["kind"] == 0]
        deg_lut = dict(zip(st["node"], st["c"]))
        co = g[g["kind"] == 1]
        s = co.groupby("node", sort=False)["c"].sum().reset_index()
        n = s["node"].to_numpy(dtype="int64")
        pr = _BASE + (_DAMP_NUM * s["c"].to_numpy(dtype="int64")) // 1000
        return pd.DataFrame({
            "node": n,
            "outdeg": pd.Series(n).map(deg_lut).to_numpy(dtype="int64"),
            "pr": pr.astype("int64"),
        })

    # Each round: exchange 1 co-groups (state, edges) on the src bucket
    # to emit contributions; exchange 2 co-groups (contributions,
    # degree rows) on the dst bucket to fold next-round state. Degrees
    # travel as O(|V|/buckets) rows per reducer — never a broadcast
    # dict, never a driver materialization.
    #
    # The repartition before each materialize is load-bearing: the sort
    # shuffle's output partition count tracks its INPUT block count, and
    # each round's input unions two reads of `state` with `edges` —
    # without the bound, state's block count doubles every round
    # (measured 3→7→15→31…) and per-block fixed costs make the loop
    # exponential in `rounds`. Bounding at num_buckets keeps every
    # round identical. (Linear split/merge, not an extra all-to-all.)
    for _ in range(rounds):
        tagged = (state.map_batches(tag_state, batch_format="pandas")
                  .union(edges.map_batches(tag_edges, batch_format="pandas")))
        contribs = (tagged.groupby("_eb")
                    .map_groups(lambda g: offer(g.drop(columns=["_eb"])),
                                batch_format="pandas"))
        merged = contribs.union(
            state.map_batches(state_deg_rows, batch_format="pandas"))
        state = (merged.groupby("_nb")
                 .map_groups(lambda g: fold(g.drop(columns=["_nb"])),
                             batch_format="pandas")
                 .repartition(num_buckets)
                 .materialize())

    out = state.to_pandas()
    return (pd.DataFrame({
        "node_type": np.where(out["node"] % 2 == 0, "customer", "supplier"),
        "node_id": (out["node"] // 2).astype("int64"),
        "pr": out["pr"].astype("int64"),
    }).sort_values(["node_type", "node_id"]).reset_index(drop=True))


def pagerank_sql(rounds: int = 3) -> str:
    parts = ["""e0 AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
), deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1
)""",
             f"p0 AS (SELECT node, CAST({_PR0} AS BIGINT) AS pr FROM deg)"]
    for r in range(1, rounds + 1):
        parts.append(f"""c{r} AS (
  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS s
  FROM e JOIN p{r - 1} p ON p.node = e.src JOIN deg d ON d.node = e.src
  GROUP BY 1
), p{r} AS (
  SELECT node, CAST({_BASE} + ({_DAMP_NUM} * s) // 1000 AS BIGINT) AS pr
  FROM c{r}
)""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       node // 2 AS node_id, pr
FROM p{rounds}""")


_PAIR_M = np.int64(1) << np.int64(31)


def butterfly_count(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Exact butterfly (bipartite 4-cycle) count over the
    customer–supplier purchase graph — the motif-counting family: a
    butterfly is two customers sharing two suppliers, the bipartite
    analogue of a triangle (the purchase graph is bipartite, so
    triangles cannot exist). Output: one row (n_wedges,
    n_butterflies), where n_wedges = Σ_pairs w and n_butterflies =
    Σ_pairs C(w, 2) for w = |N(c1) ∩ N(c2)|.

    The exact algorithm is the standard wedge enumeration: per
    supplier with degree d, emit its C(d, 2) customer pairs, then
    count wedges per pair. Scale shape:

    - edge derivation is the pagerank tagged co-group on the orderkey
      bucket (the fact table never joins unbucketed), deduped inside
      the supplier-bucket group;
    - wedge emission happens IN the same supplier-bucket group, fully
      vectorized (repeat/arange pair construction — no Python loop),
      and is pre-aggregated to per-pair partial counts via
      np.unique/bincount BEFORE the shuffle (the map-side combine:
      what crosses the wire is distinct pairs per bucket, not raw
      wedges — 3.5M wedges → ~1.1M pair rows per bucket at sf0.01);
    - the pair-bucket exchange then folds partials to ONE
      (n_wedges, n_butterflies) row per bucket; a constant-key
      groupby of ≤num_buckets tiny rows finishes.

    Documented skew hazard: a degree-D supplier contributes C(D, 2)
    wedges inside one group — Σ C(d, 2) is the irreducible cost of
    EXACT butterfly counting (Sanei-Mehri et al., KDD'18 survey the
    same wedge bound); for hot suppliers the emission stays vectorized
    but the group grows quadratically, and the scale path is salting
    wedge emission by c1-range before the pair exchange.
    """
    edges = _cs_pairs(sf_dir, num_buckets).map_batches(
        lambda b: b.assign(_sb=(b["s"].to_numpy(dtype="int64")
                                % num_buckets).astype(np.int32)),
        batch_format="pandas")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # global distinct: per-orderkey-bucket dedup in attach() can
        # re-emit the same (c, s) from different order buckets
        g = g.drop_duplicates(subset=["c", "s"])
        if len(g) < 2:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64"),
                                 "_pb": pd.Series([], dtype="int32")})
        srt = g.sort_values(["s", "c"], kind="mergesort")
        s = srt["s"].to_numpy()
        c = srt["c"].to_numpy()
        n = len(s)
        # vectorized within-supplier pair emission: element k pairs
        # with every LATER element of its supplier run (c ascending,
        # so c1 < c2 holds by construction)
        ends = np.searchsorted(s, s, side="right")
        reps = ends - np.arange(n) - 1
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"pair": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64"),
                                 "_pb": pd.Series([], dtype="int32")})
        idx1 = np.repeat(np.arange(n), reps)
        starts = np.repeat(np.arange(n) + 1, reps)
        base = np.concatenate([[0], np.cumsum(reps)[:-1]])
        offs = np.arange(total) - np.repeat(base, reps)
        idx2 = starts + offs
        comp = c[idx1] * _PAIR_M + c[idx2]
        # map-side combine: per-pair partial wedge counts
        uniq, inv = np.unique(comp, return_inverse=True)
        w = np.bincount(inv).astype(np.int64)
        return pd.DataFrame({
            "pair": uniq,
            "w": w,
            "_pb": (uniq % num_buckets).astype(np.int32),
        })

    partial = (edges.groupby("_sb")
               .map_groups(lambda g: wedges(g.drop(columns=["_sb"])),
                           batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        comp = g["pair"].to_numpy(dtype="int64")
        pw = g["w"].to_numpy(dtype="int64")
        uniq, inv = np.unique(comp, return_inverse=True)
        w = np.bincount(inv, weights=pw.astype(np.float64)).astype(np.int64)
        return pd.DataFrame({
            "n_wedges": [np.int64(w.sum())],
            "n_butterflies": [np.int64((w * (w - 1) // 2).sum())],
            "_k": np.int32(0),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_wedges": [np.int64(g["n_wedges"].sum())],
            "n_butterflies": [np.int64(g["n_butterflies"].sum())],
        })

    return (partial.groupby("_pb")
            .map_groups(lambda g: fold(g.drop(columns=["_pb"])),
                        batch_format="pandas")
            .groupby("_k")
            .map_groups(lambda g: finish(g.drop(columns=["_k"])),
                        batch_format="pandas"))


BUTTERFLY_SQL = """
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), w AS (
  SELECT e1.c AS c1, e2.c AS c2, CAST(COUNT(*) AS BIGINT) AS w
  FROM e e1 JOIN e e2 ON e1.s = e2.s AND e1.c < e2.c
  GROUP BY 1, 2
)
SELECT CAST(SUM(w) AS BIGINT) AS n_wedges,
       CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS n_butterflies
FROM w
"""


def bfs_hops(sf_dir: str, rounds: int = 3,
             num_buckets: int = 32) -> pd.DataFrame:
    """Distributed BFS hop distance from a deterministic seed (the
    lowest-id customer node) over the undirected purchase graph —
    the frontier-expansion iterative shape (components is min-label
    propagation, pagerank is damped value flow; BFS completes the
    family). Output: node_type, node_id, hops (min #edges from the
    seed, capped at ``rounds``) for every reached node.

    Round topology mirrors pagerank: exchange 1 co-groups (frontier,
    edges) on the src bucket to emit (dst, k) offers — the frontier
    probe is one vectorized ``isin`` per bucket; exchange 2 co-groups
    (offers, state) on the dst bucket and folds min-hop per node. The
    frontier is the previous round's newly-discovered nodes only, so
    offer volume is bounded by the frontier's out-edges, and state rows
    carry (node, dist) — never a broadcast set, never a driver
    materialization inside the loop. The ``repartition(num_buckets)``
    bound before each materialize is the pagerank lesson: without it
    state's block count doubles per round and per-block fixed costs
    explode.

    DuckDB mirror: ``WITH RECURSIVE`` over the same edge derivation
    with UNION (distinct) semantics; ``MIN(hops)`` per node equals
    BFS first-discovery depth.
    """
    edges = _edges(sf_dir, num_buckets)

    def bmin(b: pd.DataFrame) -> pd.DataFrame:
        c = b.loc[b["src"] % 2 == 0, "src"]
        if not len(c):
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        return pd.DataFrame({"m": [np.int64(c.min())]})

    # O(#blocks) rows to the driver for the seed scalar only
    seed = int(edges.map_batches(bmin, batch_format="pandas")
               .to_pandas()["m"].min())

    state = rd.from_pandas(pd.DataFrame({
        "node": np.array([seed], dtype="int64"),
        "dist": np.array([0], dtype="int64"),
    })).materialize()

    for k in range(1, rounds + 1):
        def tag_frontier(b: pd.DataFrame, k=k) -> pd.DataFrame:
            f = b[b["dist"] == k - 1]
            n = f["node"].to_numpy(dtype="int64")
            return pd.DataFrame({
                "key": n, "kind": np.zeros(len(f), dtype=np.int8),
                "dst": np.full(len(f), -1, dtype="int64"),
                "_eb": (n % num_buckets).astype(np.int32),
            })

        def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
            s = b["src"].to_numpy(dtype="int64")
            return pd.DataFrame({
                "key": s, "kind": np.ones(len(b), dtype=np.int8),
                "dst": b["dst"].to_numpy(dtype="int64"),
                "_eb": (s % num_buckets).astype(np.int32),
            })

        def offer(g: pd.DataFrame, k=k) -> pd.DataFrame:
            fr = g.loc[g["kind"] == 0, "key"]
            ed = g[g["kind"] == 1]
            hit = ed.loc[ed["key"].isin(fr), "dst"]
            d = np.unique(hit.to_numpy(dtype="int64"))
            return pd.DataFrame({
                "node": d,
                "dist": np.full(len(d), k, dtype="int64"),
                "_nb": (d % num_buckets).astype(np.int32),
            })

        def state_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = b["node"].to_numpy(dtype="int64")
            return pd.DataFrame({
                "node": n, "dist": b["dist"].to_numpy(dtype="int64"),
                "_nb": (n % num_buckets).astype(np.int32),
            })

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("node", sort=False)["dist"].min()
            return pd.DataFrame({
                "node": s.index.to_numpy(dtype="int64"),
                "dist": s.to_numpy(dtype="int64"),
            })

        tagged = (state.map_batches(tag_frontier, batch_format="pandas")
                  .union(edges.map_batches(tag_edges,
                                           batch_format="pandas")))
        offers = (tagged.groupby("_eb")
                  .map_groups(lambda g: offer(g.drop(columns=["_eb"])),
                              batch_format="pandas"))
        merged = offers.union(
            state.map_batches(state_rows, batch_format="pandas"))
        state = (merged.groupby("_nb")
                 .map_groups(lambda g: fold(g.drop(columns=["_nb"])),
                             batch_format="pandas")
                 .repartition(num_buckets)
                 .materialize())

    out = state.to_pandas()
    return (pd.DataFrame({
        "node_type": np.where(out["node"] % 2 == 0, "customer", "supplier"),
        "node_id": (out["node"] // 2).astype("int64"),
        "hops": out["dist"].astype("int64"),
    }).sort_values(["node_type", "node_id"]).reset_index(drop=True))


def bfs_hops_sql(rounds: int = 3) -> str:
    """Oracle generated from the SAME rounds parameter as the engine
    (the pagerank_sql precedent) — a hardcoded hop cap silently
    diverges the moment a caller passes rounds != default."""
    return f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), e AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
), walk(node, hops) AS (
  SELECT CAST((SELECT MIN(src) FROM e WHERE src % 2 = 0) AS BIGINT), 0
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {int(rounds)}
)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
         AS node_type,
       node // 2 AS node_id, CAST(MIN(hops) AS BIGINT) AS hops
FROM walk GROUP BY 1, 2 ORDER BY 1, 2
"""


BFS_HOPS_SQL = bfs_hops_sql()
