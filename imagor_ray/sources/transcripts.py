"""Transcript source — derives the engine's input table
``(conv_id, turn_idx, role, text, tool, ts)`` from the driver-generated
``events`` + ``documents`` parquet tables, deterministically and
SQL-expressibly (so the DuckDB oracle can verify it bit-for-bit).

Derivation spec (the single source of truth; ``oracle_sql`` mirrors it):

- ``conv_id``  = ``'conv_' || lpad(user_id, 6, '0')``
- ``turn_idx`` = ``row_number() over (partition by user_id
                   order by ts, event_id) - 1`` as int32
- ``role``     = signup→system, click→user, view/purchase→assistant,
                 else→tool
- ``text``     = ``documents.text`` where ``doc_id = event_id % D``
                 (D = document count — a broadcast dimension lookup)
- ``tool``     = ``event_type``
- ``ts``       = ``ts``

Scale notes: the documents side is broadcast once via ``ray.put`` and read
in every map task (no shuffle); the ``turn_idx`` row-number is the ONE
wide step, keyed on ``conv_id`` — the same key the sessionize step uses,
so downstream windowing reuses this partitioning instead of shuffling
again. The reference analogue of the lookup is the loader→storage chain
(first-hit-wins, ``imagor.go:699-760``) collapsed into a broadcast
hash-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

__all__ = ["ROLE_MAP", "read_transcripts", "derive_transcripts", "TOOL_META", "tool_meta_table"]

ROLE_MAP = {
    "signup": "system",
    "click": "user",
    "view": "assistant",
    "purchase": "assistant",
    "error": "tool",
}

#: tool-metadata dimension table (the stream-table join small side; the
#: engine's stand-in for imagor's watermark/overlay sources,
#: filteroverlay.go:66-127). Deterministic literals — mirrored as a VALUES
#: list in oracle SQL.
TOOL_META = {
    "signup": {"tool_kind": "auth", "tool_cost": 5, "snippet": "<SIGNUP>"},
    "click": {"tool_kind": "ui", "tool_cost": 1, "snippet": "<CLICK>"},
    "view": {"tool_kind": "ui", "tool_cost": 2, "snippet": "<VIEW>"},
    "purchase": {"tool_kind": "commerce", "tool_cost": 8, "snippet": "<BUY>"},
    "error": {"tool_kind": "fault", "tool_cost": 13, "snippet": "<ERR>"},
}


def tool_meta_table() -> pd.DataFrame:
    rows = [{"tool": k, **v} for k, v in sorted(TOOL_META.items())]
    return pd.DataFrame(rows)


def tool_kind_cost_maps() -> tuple[dict[str, str], dict[str, int]]:
    """Plain tool→kind and tool→cost dicts for the broadcast enrich join
    (imagor.go:699-760 first-hit lookup collapsed into a hash join)."""
    kind = {k: v["tool_kind"] for k, v in TOOL_META.items()}
    cost = {k: int(v["tool_cost"]) for k, v in TOOL_META.items()}
    return kind, cost


def enrich_tool_columns(
    b: pd.DataFrame, kind_map: dict[str, str], cost_map: dict[str, int]
) -> pd.DataFrame:
    """Vectorized tool_kind/tool_cost attach: ``Series.map(dict)`` runs in
    the C path — no per-row Python lambdas in the hottest post-chain
    stage. Unknown tools get ("unknown", 0) like the dict-get fallback."""
    kinds = b["tool"].map(kind_map)
    if kinds.isna().any():
        kinds = kinds.fillna("unknown")
        b["tool_kind"] = kinds
        b["tool_cost"] = b["tool"].map(cost_map).fillna(0).astype("int64")
    else:
        b["tool_kind"] = kinds
        b["tool_cost"] = b["tool"].map(cost_map).astype("int64")
    return b


def enrich_tool_columns_arrow(t, kind_map: dict[str, str], cost_map: dict[str, int]):
    """Arrow-native mirror of :func:`enrich_tool_columns`: the dimension
    lookup is ``pc.index_in`` + ``take`` over the (tiny) tool arrays, the
    batch stays a zero-copy ``pa.Table`` (round-4 verdict item 7)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tools = list(kind_map)
    idx = pc.index_in(t["tool"], value_set=pa.array(tools, pa.string()))
    kinds = pc.fill_null(
        pc.take(pa.array([kind_map[k] for k in tools], pa.string()), idx),
        "unknown")
    costs = pc.fill_null(
        pc.take(pa.array([cost_map[k] for k in tools], pa.int64()), idx), 0)
    return t.append_column("tool_kind", kinds).append_column("tool_cost", costs)


def _doc_count(sf_dir: str) -> int:
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


# per-worker-process cache of the resolved broadcast side: stateless map
# tasks re-use the dense array without re-shipping it per batch (ray.get of
# a ray.put ref is zero-copy from the local object store).
_DOC_CACHE: dict[str, np.ndarray] = {}


def _doc_array(docs_ref, n_docs: int) -> np.ndarray:
    key = str(docs_ref)
    arr = _DOC_CACHE.get(key)
    if arr is None:
        docs = ray.get(docs_ref)
        arr = np.empty(n_docs, dtype=object)
        arr[docs["doc_id"].to_numpy()] = docs["text"].to_numpy()
        _DOC_CACHE.clear()
        _DOC_CACHE[key] = arr
    return arr


def _attach_text(
    batch: pd.DataFrame, docs_ref, n_docs: int, num_buckets: int = 0
) -> pa.Table:
    """Broadcast-join the documents side: vectorized O(1) gather per batch
    (the loader chain lookup collapsed into a broadcast hash-join,
    imagor.go:699-760). Returns an Arrow table so the stored block is
    zero-copy buffers, not pickled pandas object arrays — block
    serialization is the memory-bandwidth hot spot of the whole DAG.
    ``num_buckets>0`` also emits the conv hash-bucket shuffle key."""
    import pyarrow.compute as pc

    texts = _doc_array(docs_ref, n_docs)
    uid = batch["user_id"].to_numpy()
    # 'conv_' || lpad(uid, 6, '0') built with Arrow C++ kernels — the
    # result is already the Arrow column, no Python string objects in the
    # hottest map stage (measured vs f-string loop + pa.array(list))
    conv = pc.binary_join_element_wise(
        pa.scalar("conv_"),
        pc.utf8_lpad(pc.cast(pa.array(uid), pa.string()), 6, padding="0"),
        pa.scalar(""),
    )
    cols = {
        "conv_id": conv,
        "role": pa.array(
            batch["event_type"].map(ROLE_MAP).fillna("tool").to_numpy(),
            type=pa.string(),
        ),
        "text": pa.array(texts[batch["event_id"].to_numpy() % n_docs], type=pa.string()),
        "tool": pa.array(batch["event_type"].to_numpy(), type=pa.string()),
        "ts": pa.array(batch["ts"].to_numpy().astype("datetime64[us]")),
        "event_id": pa.array(batch["event_id"].to_numpy(), type=pa.int64()),
        "user_id": pa.array(uid, type=pa.int64()),
    }
    if num_buckets > 0:
        from ..functions.hashing import conv_bucket_from_uid

        # numeric digit-matrix CRC straight from user_id — bit-identical
        # to crc32(conv_id) with zero string materialization
        cols["_bucket"] = pa.array(conv_bucket_from_uid(uid, num_buckets).astype(np.int32))
    return pa.table(cols)


def _assign_turn_idx_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-conversation row-number over one hash bucket of
    conversations, under stable (ts, event_id) order — the stable-ordering
    invariant the oracles assert. Bucketing (not per-conv groups) keeps
    the group-UDF count at O(buckets), so the per-group pandas overhead
    never dominates and one hot conversation cannot hot-spot a reducer
    beyond its bucket."""
    g = g.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    g["turn_idx"] = g.groupby("conv_id", sort=False).cumcount().astype(np.int32)
    return g


def derive_transcripts(
    sf_dir: str,
    with_turn_idx: bool = True,
    num_buckets: int = 64,
    replicas: int = 1,
    keep_bucket: bool = False,
) -> rd.Dataset:
    """events × documents → transcripts Dataset.

    ``with_turn_idx=False`` skips the row-number shuffle for consumers that
    will group by ``conv_id`` themselves anyway. The shuffle key is a
    conversation hash bucket (``user_id % num_buckets``) — the ONE
    partitioning key reused by sessionize and the sink.

    ``replicas>1`` (bench-only) unions R copies of the event stream with
    disjoint user/event id spaces — scales the workload so throughput
    measurements are compute-bound rather than fixed-overhead-bound; the
    correctness oracles always run with replicas=1.
    """
    n_docs = _doc_count(sf_dir)
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    docs_ref = ray.put(docs)

    # size blocks to ~16k rows: Ray auto-splits one small file into
    # 2×num_cpus tiny blocks otherwise, and per-block overhead then
    # dominates every downstream stage (worse at higher CPU counts). At
    # real scale the natural file/row-group layout governs block size and
    # this override is a no-op-sized clamp.
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    # block count sized to ~16k rows — read parallelism caps every
    # downstream map stage, and Ray over-splits one small file otherwise
    read_blocks = max(4, min(256, n_events // 16384 + 1))

    # replicas may be an int (0..n) or a (start, end) range — ranges let a
    # driver loop process a huge stream as bounded micro-batches (each
    # cycle's sort stays within the single-node object-store budget; see
    # BENCH.md findings)
    if isinstance(replicas, tuple):
        replica_ids = list(range(replicas[0], replicas[1]))
    else:
        replica_ids = list(range(replicas))
    if len(replica_ids) > 1 or (replica_ids and replica_ids[0] != 0):
        # one task per replica, each reading the (page-cached) events
        # file itself and emitting shifted chunks. Amplifying 100× inside
        # a single map operator makes Ray's memory-based scheduler see
        # giant projected outputs from tiny inputs and throttle the
        # operator to ~1 concurrent task; a nested union tree serializes
        # the plan. Disjoint id spaces keep shuffle cardinality realistic.
        events_path = f"{sf_dir}/events.parquet"

        def replica_events(batch):
            import pyarrow.compute as pc

            tbl = pq.read_table(
                events_path,
                columns=["event_id", "ts", "user_id", "event_type"],
            )
            # replicas are disjoint in id space AND event time: each
            # replica's stream is shifted one full span (+1 day) later,
            # so replica-range micro-batch cycles form a genuinely
            # advancing event-time stream (watermarks progress instead
            # of marking later cycles late)
            ts_us_col = pc.cast(tbl["ts"], pa.timestamp("us")).cast(pa.int64())
            span = pc.max(ts_us_col).as_py() - pc.min(ts_us_col).as_py()
            stride_us = span + 86_400_000_000
            for idx in batch["id"]:
                r = replica_ids[int(idx)]
                shifted = pa.table({
                    "event_id": pc.add(tbl["event_id"], int(r) * 1_000_000_000),
                    "ts": pc.add(ts_us_col, int(r) * stride_us).cast(
                        pa.timestamp("us")),
                    "user_id": pc.add(tbl["user_id"], int(r) * 1_000_000),
                    "event_type": tbl["event_type"],
                })
                for i in range(0, len(shifted), 65536):
                    yield shifted.slice(i, 65536)

        ds = rd.range(len(replica_ids)).map_batches(
            replica_events, batch_size=1, batch_format="numpy"
        )
    else:
        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
            override_num_blocks=read_blocks,
        )
    # the attach stage emits the conv hash-bucket key when a shuffle
    # follows — the same key the exactly-once sink partitions on, so the
    # fused flagship pipeline needs only ONE shuffle end-to-end
    want_bucket = with_turn_idx or keep_bucket
    ds = ds.map_batches(
        _attach_text,
        fn_kwargs={
            "docs_ref": docs_ref,
            "n_docs": n_docs,
            "num_buckets": num_buckets if want_bucket else 0,
        },
        batch_format="pandas",
    )
    if with_turn_idx:
        ds = (
            ds.groupby("_bucket")
            .map_groups(_assign_turn_idx_bucket, batch_format="pandas")
            .select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        )
    return ds


def read_transcripts(sf_dir: str) -> rd.Dataset:
    """Public entry: the engine's input stream per ``input_hint``."""
    return derive_transcripts(sf_dir, with_turn_idx=True)


TRANSCRIPTS_SQL = """
SELECT
  'conv_' || lpad(CAST(e.user_id AS VARCHAR), 6, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1 AS INTEGER) AS turn_idx,
  CASE e.event_type
    WHEN 'signup' THEN 'system'
    WHEN 'click' THEN 'user'
    WHEN 'view' THEN 'assistant'
    WHEN 'purchase' THEN 'assistant'
    ELSE 'tool' END AS role,
  d.text AS text,
  e.event_type AS tool,
  e.ts AS ts
FROM events e
JOIN documents d
  ON d.doc_id = e.event_id % (SELECT count(*) FROM documents)
"""
