"""Minimal reproduction: Ray Data's multi-key
``groupby([k1, k2]).aggregate(...)`` is ~10x slower than computing the
same result as a single-key bucketed ``groupby(bucket).map_groups``
with a vectorized pandas groupby inside each bucket (Ray 2.49.2,
single node). This is why every wide aggregation in the engine uses the
bucketed pattern (BENCH.md "bucketed merge" finding; CLAUDE.md
invariant). Re-run on Ray upgrades.

Usage::

    python bench/repro_multikey_aggregate.py

Observed here (2M rows, 5 x 2000 key pairs, num_cpus=8):
native multi-key aggregate ~30-60 s; bucketed map_groups ~3-6 s.
"""

from __future__ import annotations

import json
import os
import time

N_ROWS = 2_000_000
NUM_CPUS = int(os.environ.get("REPRO_CPUS", "8"))


def main() -> int:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data import DataContext
    from ray.data.aggregate import Count, Sum

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    def mk(b):
        return pd.DataFrame({
            "k1": (b["id"] % 5).astype("int64"),
            "k2": ((b["id"] // 5) % 2000).astype("int64"),
            "val": b["id"].astype("int64"),
        })

    base = rd.range(N_ROWS).map_batches(mk, batch_format="pandas")

    t0 = time.perf_counter()
    n_native = base.groupby(["k1", "k2"]).aggregate(
        Count(), Sum("val")).count()
    t_native = time.perf_counter() - t0

    def bucketed(b):
        b = b.copy()
        b["_b"] = (b["k1"] * 31 + b["k2"]) % (NUM_CPUS * 4)
        return b

    def merge(g):
        return g.groupby(["k1", "k2"], sort=False).agg(
            count=("val", "size"), sum_val=("val", "sum")).reset_index()

    t0 = time.perf_counter()
    n_bucketed = (
        rd.range(N_ROWS).map_batches(mk, batch_format="pandas")
        .map_batches(bucketed, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .count()
    )
    t_bucketed = time.perf_counter() - t0

    print(json.dumps({
        "rows": N_ROWS,
        "groups_native": n_native,
        "groups_bucketed": n_bucketed,
        "sec_native_multikey_aggregate": round(t_native, 2),
        "sec_bucketed_map_groups": round(t_bucketed, 2),
        "slowdown": round(t_native / t_bucketed, 1),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
