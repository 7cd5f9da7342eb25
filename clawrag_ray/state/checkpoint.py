"""Resumable partitioned execution with per-partition lineage + metrics.

Implements the north-rule checkpoint contract (BASELINE.json): the input
table's files are grouped into shards; each shard runs the extraction
pipeline as its own (internally fully parallel) job and commits atomically:

    {out}/shard={i}/...parquet      span rows for the shard  (tmp -> rename)
    {out}/_manifest/shard-{i}.json  lineage + metrics row

A re-run after preemption skips every shard whose manifest row exists —
the file-level analog of "checkpoint table in Lance keyed by partition_id;
resume = anti-join" (SURVEY.md §2.1 K4). The manifest doubles as the
per-partition metrics table (docs/spans/errors/chars/wall —
ExtractionMetadata/ExtractionResultDB analog, reference
backend/src/database/models.py:342-467) and is summarized to
``{out}/_metrics.parquet`` on completion.

Replaces the reference's node-local JSON cache + in-memory task state
(SURVEY.md §2.4 T4-T8) with pure dataflow state: nothing lives in actor
memory between runs.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from clawrag_ray.schema import METRICS_SCHEMA


def list_input_files(input_dir: str) -> list[str]:
    files = sorted(
        f
        for f in glob.glob(os.path.join(input_dir, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith("_")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    return files


def make_shards(files: list[str], n_shards: int) -> list[list[str]]:
    n_shards = max(1, min(n_shards, len(files)))
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(files):
        shards[i % n_shards].append(f)
    return shards


def _manifest_path(out_dir: str, shard_idx: int) -> str:
    return os.path.join(out_dir, "_manifest", f"shard-{shard_idx}.json")


def completed_shards(out_dir: str) -> set[int]:
    out = set()
    for f in glob.glob(os.path.join(out_dir, "_manifest", "shard-*.json")):
        try:
            out.add(int(os.path.basename(f)[len("shard-") : -len(".json")]))
        except ValueError:
            continue
    return out


def run_resumable_extraction(
    input_dir: str,
    out_dir: str,
    n_shards: int = 8,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    concurrency=(1, 16),
    batch_size: int = 64,
    max_shards_this_run: int | None = None,
) -> dict:
    """Run (or resume) the extraction pipeline shard by shard.

    ``max_shards_this_run`` bounds how many incomplete shards to process
    (used by tests to simulate preemption). Returns a summary dict."""
    import ray.data

    from clawrag_ray.pipelines.extraction import extract_spans

    files = list_input_files(input_dir)
    shards = make_shards(files, n_shards)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    done = completed_shards(out_dir)
    ran, skipped = [], []
    for shard_idx, shard_files in enumerate(shards):
        if shard_idx in done:
            skipped.append(shard_idx)
            continue
        if max_shards_this_run is not None and len(ran) >= max_shards_this_run:
            break
        t0 = time.time()
        raw = ray.data.read_parquet(shard_files)
        spans = extract_spans(
            raw,
            chunk_size=chunk_size,
            chunk_overlap=chunk_overlap,
            concurrency=concurrency,
            batch_size=batch_size,
        )
        final_dir = os.path.join(out_dir, f"shard={shard_idx}")
        tmp_dir = os.path.join(out_dir, f"_tmp-shard-{shard_idx}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        spans.write_parquet(tmp_dir)
        # gather lineage/metrics from the written shard (no second pass
        # over the pipeline)
        n_docs = n_spans = n_errors = n_chars = 0
        for f in glob.glob(os.path.join(tmp_dir, "*.parquet")):
            t = pq.read_table(f, columns=["n_spans", "error_code", "spans"])
            n_docs += t.num_rows
            n_spans += pa.compute.sum(t["n_spans"]).as_py() or 0
            n_errors += pa.compute.sum(pa.compute.not_equal(t["error_code"], "")).as_py() or 0
            # vectorized char count: flatten list<struct> -> struct.text lengths
            flat = t["spans"].combine_chunks().flatten()
            if len(flat):
                n_chars += pa.compute.sum(pa.compute.utf8_length(flat.field("text"))).as_py() or 0
        os.rename(tmp_dir, final_dir)  # atomic commit of shard data
        wall = time.time() - t0
        manifest = {
            "shard": shard_idx,
            "files": shard_files,
            "n_docs": n_docs,
            "n_spans": n_spans,
            "n_errors": n_errors,
            "n_chars": n_chars,
            "wall_s": round(wall, 3),
        }
        tmp_manifest = _manifest_path(out_dir, shard_idx) + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp_manifest, _manifest_path(out_dir, shard_idx))  # atomic
        ran.append(shard_idx)
    all_done = completed_shards(out_dir) == set(range(len(shards)))
    if all_done:
        write_metrics_table(out_dir)
    return {
        "n_shards": len(shards),
        "ran": ran,
        "skipped_completed": skipped,
        "complete": all_done,
    }


def write_metrics_table(out_dir: str) -> None:
    """Summarize the manifest rows into a queryable metrics parquet."""
    rows = []
    for f in sorted(glob.glob(os.path.join(out_dir, "_manifest", "shard-*.json"))):
        with open(f) as fh:
            m = json.load(fh)
        rows.append(
            {
                "partition_id": m["shard"],
                "n_docs": m["n_docs"],
                "n_spans": m["n_spans"],
                "n_errors": m["n_errors"],
                "n_chars": m["n_chars"],
                "wall_s": m["wall_s"],
            }
        )
    table = pa.Table.from_pylist(rows, schema=METRICS_SCHEMA)
    pq.write_table(table, os.path.join(out_dir, "_metrics.parquet"))
