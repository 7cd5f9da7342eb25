"""Checkpoint/resume: preempted run resumes mid-scan, skips completed
shards, and the final output equals an uninterrupted run (FIXTURES.md §5 /
north-rule resumability)."""

import glob
import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from clawrag_ray.corpus import corpus_table
from clawrag_ray.state.checkpoint import (
    completed_shards,
    make_shards,
    run_resumable_extraction,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt_corpus")
    table = corpus_table(42, 80, mega_every=20, mega_pages=24, dup_every=9)
    # write as 8 separate files so sharding has units to work with
    for i in range(8):
        pq.write_table(table.slice(i * 10, 10), os.path.join(path, f"part-{i}.parquet"))
    return str(path)


def _span_fingerprint(out_dir):
    rows = []
    for f in sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet"))):
        t = pq.read_table(f)
        for r in t.to_pylist():
            rows.append((r["doc_id"], r["error_code"], tuple((s["kind"], s["text"], s["media_ref"]) for s in sorted(r["spans"], key=lambda s: s["offset"]))))
    return sorted(rows)


def test_make_shards_round_robin():
    shards = make_shards([f"f{i}" for i in range(10)], 4)
    assert len(shards) == 4
    assert sorted(sum(shards, [])) == [f"f{i}" for i in range(10)]


def test_preempt_and_resume_equals_uninterrupted(corpus_dir, tmp_path):
    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")

    # run 1: "preempted" after 2 shards
    s1 = run_resumable_extraction(corpus_dir, out_a, n_shards=4, concurrency=1, max_shards_this_run=2)
    assert s1["ran"] == [0, 1] and not s1["complete"]
    assert completed_shards(out_a) == {0, 1}
    mtimes_before = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(out_a, "shard=*", "*.parquet"))}

    # run 2: resume to completion — completed shards skipped untouched
    s2 = run_resumable_extraction(corpus_dir, out_a, n_shards=4, concurrency=1)
    assert s2["skipped_completed"] == [0, 1] and s2["ran"] == [2, 3] and s2["complete"]
    for f, m in mtimes_before.items():
        assert os.path.getmtime(f) == m, f"completed shard file rewritten: {f}"

    # uninterrupted reference run
    s3 = run_resumable_extraction(corpus_dir, out_b, n_shards=4, concurrency=1)
    assert s3["complete"]
    assert _span_fingerprint(out_a) == _span_fingerprint(out_b)
    # all docs present exactly once
    ids = [r[0] for r in _span_fingerprint(out_a)]
    assert len(ids) == 80 and len(set(ids)) == 80


def test_metrics_table(corpus_dir, tmp_path):
    out = str(tmp_path / "metrics_run")
    run_resumable_extraction(corpus_dir, out, n_shards=3, concurrency=1)
    metrics = pq.read_table(os.path.join(out, "_metrics.parquet")).to_pylist()
    assert len(metrics) == 3
    assert sum(m["n_docs"] for m in metrics) == 80
    assert all(m["wall_s"] > 0 for m in metrics)
    assert sum(m["n_spans"] for m in metrics) > 80  # multi-span docs exist
    # lineage: manifest records the exact input files per shard
    with open(os.path.join(out, "_manifest", "shard-0.json")) as f:
        man = json.load(f)
    assert all(fp.endswith(".parquet") for fp in man["files"])


def test_idempotent_rerun_noop(corpus_dir, tmp_path):
    out = str(tmp_path / "noop_run")
    run_resumable_extraction(corpus_dir, out, n_shards=2, concurrency=1)
    s = run_resumable_extraction(corpus_dir, out, n_shards=2, concurrency=1)
    assert s["ran"] == [] and s["skipped_completed"] == [0, 1] and s["complete"]


def test_concurrent_shards_equal_sequential(corpus_dir, tmp_path):
    out_seq = str(tmp_path / "seq_run")
    out_con = str(tmp_path / "con_run")
    s1 = run_resumable_extraction(corpus_dir, out_seq, n_shards=4, concurrency=1)
    # 4-CPU test session: 2 concurrent shards x 2 pools x 0.5-CPU actors = 2
    # reserved CPUs, leaving room for reads (see runner docstring)
    s2 = run_resumable_extraction(
        corpus_dir, out_con, n_shards=4, concurrency=1, concurrent_shards=2, actor_num_cpus=0.5
    )
    assert s1["complete"] and s2["complete"]
    assert sorted(s2["ran"]) == [0, 1, 2, 3]
    assert _span_fingerprint(out_seq) == _span_fingerprint(out_con)
    # metrics table written in both modes
    assert os.path.exists(os.path.join(out_con, "_metrics.parquet"))
