"""Extraction job entry point for ``ray job submit``.

    ray job submit --working-dir . -- \
        python jobs/extract_job.py --input <docs_table_dir> --output <spans_dir> \
        [--shards 64] [--chunk-size 1000] [--chunk-overlap 200] [--max-concurrency 64]

Resumable: re-submitting after preemption skips completed shards via the
output manifest (clawrag_ray.state.checkpoint). On a real cluster this is
the same script at N and 4N nodes; in the sandbox use RAY_GRAFT_CPUS to cap
local parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--chunk-size", type=int, default=1000)
    ap.add_argument("--chunk-overlap", type=int, default=200)
    ap.add_argument("--max-concurrency", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument(
        "--concurrent-shards",
        type=int,
        default=4,
        help="shard pipelines run at once (separate streaming executors "
        "overlap each other's scheduling gaps; the multi-node layout)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; locally
        # fall back to a sandbox session
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=ncpu if os.environ.get("RAY_ADDRESS", "local") == "local" else None,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from clawrag_ray.state.checkpoint import run_resumable_extraction

    summary = run_resumable_extraction(
        args.input,
        args.output,
        n_shards=args.shards,
        chunk_size=args.chunk_size,
        chunk_overlap=args.chunk_overlap,
        concurrency=(1, args.max_concurrency),
        batch_size=args.batch_size,
        concurrent_shards=args.concurrent_shards,
    )
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
