"""Dedup suite: exact (+ policies), MinHash/LSH, SimHash, n-gram Jaccard —
engineered fixtures with known duplicates."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from clawrag_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    dedup_versions,
    exact_dedup_stats,
    hamming_distance,
    minhash_near_dups,
    ngram_jaccard,
    simhash_table,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill "
    "and the birds sing in the old oak tree near the garden fence"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word change -> high jaccard
FAR = "completely different content about distributed data processing engines and arrow batches"


def _docs_ds():
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},  # exact dup of 1
        {"doc_id": 3, "text": NEAR},  # near dup of 1
        {"doc_id": 4, "text": FAR},
        {"doc_id": 5, "text": BASE},  # second exact dup
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


class TestExactDedup:
    def test_keepers_and_counts(self):
        df = exact_dedup_stats(_docs_ds()).to_pandas()
        by_keeper = dict(zip(df["keeper_doc_id"], df["n_copies"]))
        assert by_keeper[1] == 3  # docs 1,2,5 share text; min id wins
        assert by_keeper[3] == 1
        assert by_keeper[4] == 1
        assert len(df) == 3

    def test_versions_policy(self):
        df = dedup_versions(_docs_ds()).to_pandas().set_index("doc_id")
        # VERSION policy: copies versioned in id order, newest active
        assert df.loc[1, "version"] == 1 and not df.loc[1, "is_active"]
        assert df.loc[2, "version"] == 2 and not df.loc[2, "is_active"]
        assert df.loc[5, "version"] == 3 and df.loc[5, "is_active"]
        assert df.loc[4, "version"] == 1 and df.loc[4, "is_active"]


class TestMinHash:
    def test_shingles_deterministic(self):
        assert word_shingles(BASE) == word_shingles(BASE)
        assert word_shingles("a b") == {next(iter(word_shingles("a b")))}  # <k words -> 1 shingle

    def test_jaccard_bounds(self):
        assert ngram_jaccard(BASE, BASE) == 1.0
        assert ngram_jaccard(BASE, FAR) < 0.05
        assert 0.7 < ngram_jaccard(BASE, NEAR) < 1.0

    def test_signature_estimates_jaccard(self):
        mh = MinHasher(n_perm=128)
        sa, sb = mh.signature(BASE), mh.signature(NEAR)
        est = (sa == sb).mean()
        true = ngram_jaccard(BASE, NEAR)
        assert abs(est - true) < 0.2

    def test_near_dups_found_exact_excluded_far(self):
        df = minhash_near_dups(_docs_ds(), threshold=0.5, concurrency=1)
        pairs = {(a, b) for a, b in zip(df["doc_a"], df["doc_b"])}
        assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs  # exact dups
        assert (1, 3) in pairs  # near dup
        assert all(4 not in p for p in pairs)  # far doc never pairs
        jac = dict(zip(zip(df["doc_a"], df["doc_b"]), df["jaccard"]))
        assert jac[(1, 2)] == 1.0
        assert 0.7 < jac[(1, 3)] < 1.0


class TestSimHash:
    def test_identical_equal_near_close_far_far(self):
        sh = SimHasher()
        h_base, h_near, h_far = sh.simhash(BASE), sh.simhash(NEAR), sh.simhash(FAR)
        assert h_base == sh.simhash(BASE)
        assert hamming_distance(h_base, h_near) < 12
        assert hamming_distance(h_base, h_far) > 20

    def test_table_stage(self):
        df = simhash_table(_docs_ds(), concurrency=1).to_pandas().set_index("doc_id")
        assert df.loc[1, "simhash"] == df.loc[2, "simhash"] == df.loc[5, "simhash"]
        assert df["simhash"].dtype == "int64"


class TestJaccardAllPairs:
    def test_pairs_match_pairwise_fn(self):
        from clawrag_ray.stages.dedup import _shingle_strings, jaccard_near_dup_pairs

        df = jaccard_near_dup_pairs(_docs_ds(), threshold=0.5)
        pairs = set(zip(df["doc_a"], df["doc_b"]))
        # exact dups (1,2),(1,5),(2,5) at 1.0 and near pair with doc 3
        assert {(1, 2), (1, 5), (2, 5)}.issubset(pairs)
        assert (1, 3) in pairs and (1, 4) not in pairs
        jac = dict(zip(zip(df["doc_a"], df["doc_b"]), df["jaccard"]))
        assert jac[(1, 2)] == 1.0
        sa, sb = _shingle_strings(BASE, 3), _shingle_strings(NEAR, 3)
        want = round(len(sa & sb) / len(sa | sb), 6)
        assert jac[(1, 3)] == want

    def test_short_and_empty_text_semantics(self):
        from clawrag_ray.stages.dedup import _shingle_strings

        # <k words fall back to one joined shingle; empty text -> {''}
        assert _shingle_strings("one two", 3) == frozenset(["one two"])
        assert _shingle_strings("", 3) == frozenset([""])
