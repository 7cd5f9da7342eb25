"""Corpus-curation job entry point for ``ray job submit``.

    ray job submit --working-dir . -- \
        python jobs/curate_job.py --input <docs_parquet_dir_or_file> \
        --output <out_dir> [--chain web|pretrain] [--partitions 64] \
        [--id-col doc_id] [--text-col text] [--strat-col lang]

Runs one of the two composed flagship chains over a parquet documents
table and writes the surviving rows as PARTITIONED parquet (one file per
output block — resumable consumers skip finished partitions):

  * ``web``      — C4 line/page cleaning -> full Gopher rules -> linear
                   quality classifier -> exact dedup (ONE shuffle total).
  * ``pretrain`` — exact dedup -> Gopher repetition filter -> CCNet
                   perplexity filter -> train/val/test split.

The driver owns the Ray session per the repo contract (``ray.init`` is
guarded); the chains themselves never call init/shutdown.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--chain", choices=("web", "pretrain"), default="web")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--strat-col", default="lang")
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    t0 = time.time()
    cols = [args.id_col, args.text_col] + ([args.strat_col] if args.chain == "pretrain" else [])
    docs = rd.read_parquet(args.input, columns=cols)
    if args.chain == "web":
        from clawrag_ray.pipelines.curation import web_curate

        out = web_curate(
            docs, id_col=args.id_col, text_col=args.text_col, num_partitions=args.partitions
        )
    else:
        from clawrag_ray.pipelines.curation import curate_corpus

        out = curate_corpus(
            docs,
            id_col=args.id_col,
            text_col=args.text_col,
            strat_col=args.strat_col,
            num_partitions=args.partitions,
        )
    out.write_parquet(args.output)
    import pyarrow.dataset as pads

    try:
        n = pads.dataset(args.output).count_rows()
    except FileNotFoundError:
        n = 0  # zero survivors: write_parquet emits no files
    print(json.dumps({"chain": args.chain, "survivors": n, "wall_s": round(time.time() - t0, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
