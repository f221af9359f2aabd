"""Minimal reproduction: ``ShuffleStrategy.HASH_SHUFFLE`` hangs on a
plain ``groupby().map_groups()`` at low CPU counts in local mode
(Ray 2.49.2, single node). The default sort-based shuffle completes the
identical workload in seconds. Re-run on Ray upgrades before trusting
the engine's sort-shuffle default (BENCH.md "hash-shuffle strategy"
finding; CLAUDE.md invariant).

Usage::

    python bench/repro_hash_shuffle_hang.py            # both strategies
    python bench/repro_hash_shuffle_hang.py --hash     # hash only

The hash leg runs in a subprocess with a watchdog: if it exceeds
--timeout (default 120 s) it is killed and reported HANG. Observed here:
sort 3-6 s, hash no progress after 240 s at num_cpus=4..16.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_ROWS = 2_000_000
N_KEYS = 10_000
NUM_CPUS = int(os.environ.get("REPRO_CPUS", "8"))


def workload(use_hash: bool) -> float:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if use_hash:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

    t0 = time.perf_counter()
    (
        rd.range(N_ROWS)
        .map_batches(
            lambda b: pd.DataFrame({
                "key": (b["id"] % N_KEYS).astype("int64"),
                "val": b["id"].astype("int64"),
            }),
            batch_format="pandas",
        )
        .groupby("key")
        .map_groups(
            lambda g: pd.DataFrame({"key": [g["key"].iloc[0]],
                                    "s": [int(g["val"].sum())]}),
            batch_format="pandas",
        )
        .count()
    )
    wall = time.perf_counter() - t0
    ray.shutdown()
    return wall


def main() -> int:
    if "--child" in sys.argv:
        use_hash = "--hash" in sys.argv
        print(json.dumps({"strategy": "hash" if use_hash else "sort",
                          "sec": round(workload(use_hash), 2)}))
        return 0

    timeout = 120
    for a in sys.argv:
        if a.startswith("--timeout="):
            timeout = int(a.split("=")[1])
    legs = ["--hash"] if "--hash" in sys.argv else ["", "--hash"]
    for leg in legs:
        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
        if leg:
            cmd.append(leg)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout)
            print(out.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            print(json.dumps({"strategy": "hash" if leg else "sort",
                              "sec": None, "result": f"HANG (> {timeout}s, killed)"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
