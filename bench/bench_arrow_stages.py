"""processed_turns: pandas vs Arrow-native parse_sign/enrich stages
(round-4 verdict item 7). Both modes run the identical pipeline
(derive → parse/sign → filter chain → enrich → count); only the batch
format of the first and last map stages differs. Interleaved best-of-N
because host wall-time varies ~2×.

Run: python bench/bench_arrow_stages.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    replicas = int(os.environ.get("GRAFT_BENCH_REPLICAS", "10"))
    trials = int(os.environ.get("GRAFT_BENCH_TRIALS", "3"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from imagor_ray.pipelines.flagship import processed_turns

    # warm the page cache + worker pool once
    n = processed_turns(sf_dir, replicas=replicas).count()

    best = {"pandas": float("inf"), "arrow": float("inf")}
    for _ in range(trials):
        for mode, arrow in (("pandas", False), ("arrow", True)):
            t0 = time.perf_counter()
            assert processed_turns(
                sf_dir, replicas=replicas, arrow_stages=arrow).count() == n
            best[mode] = min(best[mode], time.perf_counter() - t0)

    print(json.dumps({
        "metric": "arrow_stage_speedup",
        "value": round(best["pandas"] / best["arrow"], 3),
        "unit": "ratio",
        "sec_pandas": round(best["pandas"], 3),
        "sec_arrow": round(best["arrow"], 3),
        "n_turns": n,
        "num_cpus": cpus,
        "replicas": replicas,
        "sf": sf_dir,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
