"""CLI entry — the engine's analogue of the reference's server binary
(``cmd/imagor/main.go:12-21`` + flag/env config binding
``config/config.go:33-133``), shaped for ``ray job submit``::

    ray job submit -- python -m imagor_ray flagship --sf /root/testdata/sf0.001 --out /tmp/out
    ray job submit -- python -m imagor_ray stream --input /data/stream --state /tmp/state
    python -m imagor_ray sessions --sf /root/testdata/sf0.001

Owns the Ray session (guarded init) — library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="imagor_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("flagship", help="fused flagship chain → exactly-once sink")
    p.add_argument("--sf", required=True, help="input table directory")
    p.add_argument("--out", required=True, help="sink output directory")
    p.add_argument("--secret", default=None)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--replicas", type=int, default=1)

    p = sub.add_parser("sessions", help="session-window summaries")
    p.add_argument("--sf", required=True)
    p.add_argument("--gap-s", type=int, default=1800)
    p.add_argument("--salt-bucket-s", type=int, default=None)

    p = sub.add_parser("stream", help="micro-batch streaming job (full DAG)")
    p.add_argument("--input", required=True, help="micro-batch parquet dir")
    p.add_argument("--state", required=True, help="checkpoint/state dir")
    p.add_argument("--gap-s", type=int, default=1800)
    p.add_argument("--lateness-s", type=int, default=0)
    p.add_argument("--flush", action="store_true", help="close open sessions at end")

    args = ap.parse_args(argv)
    _ensure_ray()

    if args.cmd == "flagship":
        from imagor_ray.pipelines.flagship import flagship_write
        from imagor_ray.stages.parse_sign import DEFAULT_SECRET

        summary = flagship_write(
            args.sf, args.out, secret=args.secret or DEFAULT_SECRET,
            num_buckets=args.buckets, replicas=args.replicas,
        )
        print(json.dumps(summary))
    elif args.cmd == "sessions":
        from imagor_ray.sources.transcripts import derive_transcripts
        from imagor_ray.stages.windows import session_windows

        n = session_windows(
            derive_transcripts(args.sf), gap_s=args.gap_s,
            salt_bucket_s=args.salt_bucket_s,
        ).count()
        print(json.dumps({"sessions": n}))
    elif args.cmd == "stream":
        from imagor_ray.pipelines.streaming import StreamingFlagshipJob

        job = StreamingFlagshipJob(
            args.input, args.state, gap_s=args.gap_s,
            allowed_lateness_s=args.lateness_s,
        )
        results = job.run_all()
        if args.flush:
            job.flush()
        print(json.dumps({"cycles": len(results),
                          "late": sum(r["late"] for r in results),
                          "closed": int(len(job.closed_sessions()))}))
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
