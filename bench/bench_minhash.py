"""MinHash signature throughput: md5 oracle-parity kernel vs the fast
vectorized (crc32 + splitmix64) production kernel, end-to-end through Ray
at sf0.1 (5000 docs). Run: python bench/bench_minhash.py [sf_dir].

Records for BENCH.md (round-4 verdict item 4: done = >=5x at sf0.1).
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
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pandas as pd

    from imagor_ray.pipelines.dedup import (
        _signature_batch,
        _signature_batch_fast,
        minhash_signatures,
    )

    out = {"sf": sf_dir, "num_cpus": cpus}
    # (a) end-to-end at sf0.1 proper: read included — at 5k docs the Ray
    # floor (read + scheduling ~0.6 s) dominates, so this understates the
    # kernel gain; reported for honesty
    for mode in ("md5", "fast"):
        best = None
        for _ in range(2):  # best-of-2 (host wall-time varies ~2x)
            t0 = time.perf_counter()
            n = minhash_signatures(sf_dir, mode=mode).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[f"{mode}_sec"] = round(best, 3)
        out["docs"] = n
    out["speedup_e2e"] = round(out["md5_sec"] / out["fast_sec"], 2)

    # (b) the kernel itself on the REAL sf0.1 corpus, single process — the
    # per-byte cost that dominates at 100 TB once read/scheduling amortize.
    # (Replicating the corpus to fill Ray would bias the comparison: md5's
    # distinct-shingle cache absorbs replicas for free.)
    base = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    for mode, kernel in (("md5", _signature_batch), ("fast", _signature_batch_fast)):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            kernel(base)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[f"{mode}_kernel_sec"] = round(best, 3)
        out[f"{mode}_docs_per_sec"] = round(len(base) / best)
    out["speedup_kernel"] = round(
        out["md5_kernel_sec"] / out["fast_kernel_sec"], 2
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
