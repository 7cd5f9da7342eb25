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


def _install_fsspec_http_shim() -> None:
    """Make concurrent Dataset reads/writes thread-safe on boxes without
    aiohttp. Ray's path resolution re-runs ``from
    fsspec.implementations.http import HTTPFileSystem`` on EVERY call inside
    a ``except ModuleNotFoundError``; when aiohttp is missing the module is
    evicted from sys.modules after each failed import, so two driver
    threads racing through it see a partially-initialized module and get a
    plain ImportError that Ray does not catch. If (and only if) the real
    import cannot ever succeed, register a stub module whose
    ``HTTPFileSystem`` is a never-instantiated placeholder — the isinstance
    check in ray.data.datasource.path_util._is_http_filesystem then works
    deterministically."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except Exception:
        pass
    import sys
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder; real class requires aiohttp (absent)
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def _run_one_shard(
    shard_idx: int,
    shard_files: list[str],
    out_dir: str,
    chunk_size: int,
    chunk_overlap: int,
    concurrency,
    batch_size: int,
    actor_num_cpus: float | None = None,
) -> None:
    import ray.data

    from clawrag_ray.pipelines.extraction import _inline_branch, _mega_branch, extract_spans

    t0 = time.time()
    # route-partitioned corpora (write_corpus default layout) keep the 1x-
    # scan shape per shard: inline files feed the inline branch directly and
    # mega files the explode/reassemble branch — no second filtered read
    # (same trick as extract_spans_from_path, applied to the shard's file
    # list). Unpartitioned layouts fall back to the generic filter split.
    inline_files = [f for f in shard_files if "route_part=mega" not in f]
    mega_files = [f for f in shard_files if "route_part=mega" in f]
    partitioned = any("route_part=" in f for f in shard_files)
    if partitioned:
        parts = []
        if inline_files:
            raw_i = ray.data.read_parquet(
                inline_files, override_num_blocks=max(16, 2 * len(inline_files))
            )
            parts.append(
                _inline_branch(raw_i, chunk_size, chunk_overlap, concurrency, batch_size, actor_num_cpus)
            )
        if mega_files:
            raw_m = ray.data.read_parquet(mega_files)
            parts.append(
                _mega_branch(raw_m, chunk_size, chunk_overlap, (1, 4), 1024, 16, actor_num_cpus)
            )
        spans = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    else:
        raw = ray.data.read_parquet(shard_files)
        spans = extract_spans(
            raw,
            chunk_size=chunk_size,
            chunk_overlap=chunk_overlap,
            concurrency=concurrency,
            batch_size=batch_size,
            actor_num_cpus=actor_num_cpus,
        )
    final_dir = os.path.join(out_dir, f"shard={shard_idx}")
    tmp_dir = os.path.join(out_dir, f"_tmp-shard-{shard_idx}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(final_dir, ignore_errors=True)
    spans.write_parquet(tmp_dir)
    # gather lineage/metrics from the written shard (no second pass over the
    # pipeline; vectorized arrow kernels) — one Ray task per written file so
    # the stats pass parallelizes instead of serializing on the driver
    import ray

    @ray.remote(num_cpus=0.5)
    def _file_stats(paths: list[str]) -> tuple[int, int, int, int]:
        nd = ns = ne = nc = 0
        for path in paths:
            t = pq.read_table(path, columns=["n_spans", "error_code", "spans"])
            nd += t.num_rows
            ns += pa.compute.sum(t["n_spans"]).as_py() or 0
            ne += pa.compute.sum(pa.compute.not_equal(t["error_code"], "")).as_py() or 0
            flat = t["spans"].combine_chunks().flatten()
            if len(flat):
                nc += pa.compute.sum(pa.compute.utf8_length(flat.field("text"))).as_py() or 0
        return nd, ns, ne, nc

    files = sorted(glob.glob(os.path.join(tmp_dir, "*.parquet")))
    n_tasks = min(8, max(1, len(files)))  # bounded fan-out: no worker storm
    chunks = [files[i::n_tasks] for i in range(n_tasks)]
    stats = ray.get([_file_stats.remote(c) for c in chunks if c])
    n_docs = sum(s[0] for s in stats)
    n_spans = sum(s[1] for s in stats)
    n_errors = sum(s[2] for s in stats)
    n_chars = sum(s[3] for s in stats)
    os.rename(tmp_dir, final_dir)  # atomic commit of shard data
    manifest = {
        "shard": shard_idx,
        "files": shard_files,
        "n_docs": n_docs,
        "n_spans": n_spans,
        "n_errors": n_errors,
        "n_chars": n_chars,
        "wall_s": round(time.time() - t0, 3),
    }
    tmp_manifest = _manifest_path(out_dir, shard_idx) + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp_manifest, _manifest_path(out_dir, shard_idx))  # atomic


def run_resumable_extraction(
    input_dir: str,
    out_dir: str,
    n_shards: int = 8,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    concurrency=(1, 16),
    batch_size: int = 64,
    max_shards_this_run: int | None = None,
    concurrent_shards: int = 1,
    actor_num_cpus: float | None = None,
) -> dict:
    """Run (or resume) the extraction pipeline shard by shard.

    ``max_shards_this_run`` bounds how many incomplete shards to process
    (used by tests to simulate preemption). ``concurrent_shards`` > 1 runs
    that many shard pipelines at once from driver threads — separate
    streaming executors overlap each other's scheduling gaps (measured:
    29 s -> 20 s on a 320k-doc corpus at 32 CPUs) and this is the natural
    multi-node layout (one shard stream per node group). Returns a summary
    dict.

    CPU sizing caution: every concurrent shard runs TWO actor pools whose
    min-1 actors each reserve ``actor_num_cpus`` (default one full CPU).
    ``concurrent_shards * 2 * actor_num_cpus`` must stay below the
    cluster's CPUs or the pinned actors starve the read tasks and the run
    deadlocks — pass ``actor_num_cpus=0.5`` or fewer concurrent shards on
    small clusters."""
    files = list_input_files(input_dir)
    shards = make_shards(files, n_shards)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    done = completed_shards(out_dir)
    todo = [i for i in range(len(shards)) if i not in done]
    skipped = [i for i in range(len(shards)) if i in done]
    if max_shards_this_run is not None:
        todo = todo[:max_shards_this_run]
    kw = (chunk_size, chunk_overlap, concurrency, batch_size, actor_num_cpus)
    ran: list[int] = []
    if concurrent_shards > 1:
        # deadlock guard: every concurrent shard pins 2 min-size pool actors
        # (one per branch). If those reservations would cover the whole
        # cluster, the read tasks starve and the run hangs (observed at 4
        # shards x 2 pools x 1 CPU on an 8-CPU node). Shrink actor CPUs
        # first, then shard concurrency, to keep >= 2 CPUs free for reads.
        import ray

        cluster_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        acpu = actor_num_cpus or 1.0
        if concurrent_shards * 2 * acpu >= cluster_cpus - 1:
            acpu = 0.5
            actor_num_cpus = acpu
        max_conc = max(1, int((cluster_cpus - 2) / (2 * acpu)))
        concurrent_shards = min(concurrent_shards, max_conc)
        kw = (chunk_size, chunk_overlap, concurrency, batch_size, actor_num_cpus)
    if concurrent_shards <= 1 or len(todo) <= 1:
        for shard_idx in todo:
            _run_one_shard(shard_idx, shards[shard_idx], out_dir, *kw)
            ran.append(shard_idx)
    else:
        _install_fsspec_http_shim()

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrent_shards) as pool:
            futures = {
                pool.submit(_run_one_shard, i, shards[i], out_dir, *kw): i for i in todo
            }
            for fut, i in futures.items():
                fut.result()  # propagate shard failures
                ran.append(i)
    all_done = completed_shards(out_dir) == set(range(len(shards)))
    if all_done:
        write_metrics_table(out_dir)
    return {
        "n_shards": len(shards),
        "ran": sorted(ran),
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
