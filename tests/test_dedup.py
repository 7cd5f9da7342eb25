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


class TestDedupRateBySource:
    def test_rates_per_source(self):
        import pandas as pd
        import ray

        from clawrag_ray.stages.dedup import dedup_rate_by_source

        # source a: 4 docs / 2 distinct; source b: 3 docs all distinct
        df = pd.DataFrame(
            {
                "source": ["a", "a", "a", "a", "b", "b", "b"],
                "text": ["x", "x", "y", "y", "p", "q", "r"],
            }
        )
        out = (
            dedup_rate_by_source(ray.data.from_pandas(df).repartition(3))
            .to_pandas()
            .set_index("source")
        )
        assert out.loc["a", "n_docs"] == 4 and out.loc["a", "n_uniq"] == 2
        assert out.loc["a", "dup_rate"] == 0.5
        assert out.loc["b", "n_docs"] == 3 and out.loc["b", "n_uniq"] == 3
        assert out.loc["b", "dup_rate"] == 0.0


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

    def test_pruned_path_equals_brute_force(self):
        """The LSH-pruned jaccard path must reproduce the exact all-pairs
        result (the property its DuckDB oracle relies on)."""
        import itertools

        from clawrag_ray.stages.dedup import _shingle_strings, jaccard_near_dup_pairs

        texts = {}
        words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
        for i in range(30):
            # overlapping sliding vocabularies create a range of jaccards
            start = i % 6
            texts[i] = " ".join(words[start : start + 5] * 3)
        ds = ray.data.from_arrow(
            pa.Table.from_pylist([{"doc_id": i, "text": t} for i, t in texts.items()])
        ).repartition(4)
        got = jaccard_near_dup_pairs(ds, threshold=0.5)
        have = sorted(zip(got["doc_a"], got["doc_b"], got["jaccard"]))
        want = []
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = _shingle_strings(texts[a], 3), _shingle_strings(texts[b], 3)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                want.append((a, b, round(j, 6)))
        assert have == sorted(want)
        assert len(want) > 10  # fixture actually exercises the path


class TestSimHashPairs:
    def test_pairs_equal_brute_force(self):
        import itertools

        from clawrag_ray.stages.dedup import simhash_near_dup_pairs

        texts = [BASE, NEAR, FAR, BASE + " extra", NEAR + " words appended here"]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts * 2)]
        for r in rows[5:]:
            r["doc_id"] += 5
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        got = simhash_near_dup_pairs(ds, max_hamming=6)
        sh = simhash_table(ds).to_pandas().set_index("doc_id")["simhash"].to_dict()
        want = sorted(
            (a, b, hamming_distance(sh[a], sh[b]))
            for a, b in itertools.combinations(sorted(sh), 2)
            if hamming_distance(sh[a], sh[b]) <= 6
        )
        assert sorted(zip(got["doc_a"], got["doc_b"], got["hamming"])) == want
        assert want  # identical docs pair at hamming 0

    def test_max_hamming_must_fit_bands(self):
        from clawrag_ray.stages.dedup import simhash_near_dup_pairs

        with pytest.raises(ValueError):
            simhash_near_dup_pairs(_docs_ds(), max_hamming=8, n_bands=8)


class TestEmptyCandidateSet:
    def test_minhash_near_dups_no_collisions_returns_typed_empty(self, ray_session):
        import ray

        from clawrag_ray.stages.dedup import minhash_near_dups

        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
                {"doc_id": 2, "text": "one two three four five six seven"},
                {"doc_id": 3, "text": "red orange yellow green blue indigo"},
            ]
        )
        out = minhash_near_dups(docs, threshold=0.5)
        assert list(out.columns) == ["doc_a", "doc_b", "jaccard"]
        assert len(out) == 0


class TestSharedWindowPairs:
    def test_planted_substring_found_at_different_offsets(self, ray_session):
        import ray

        from clawrag_ray.stages.dedup import shared_window_pairs

        shared = "S" * 64  # one exact 64-byte substring
        docs = ray.data.from_items(
            [
                # the chars flanking the planted run differ between docs
                # (space vs hyphen / tail vs end) so ONLY the run itself is
                # a shared 64-byte substring
                {"doc_id": 1, "text": "prefix-one " + shared + " tail alpha"},
                {"doc_id": 2, "text": "a-different-and-much-longer-prefix-" + shared},
                {"doc_id": 3, "text": "no overlap with anyone here, totally distinct words " * 3},
            ]
        ).repartition(3)
        out = shared_window_pairs(docs)
        assert list(out["doc_a"]) == [1] and list(out["doc_b"]) == [2]
        assert out["n_shared_windows"].iloc[0] == 1

    def test_short_docs_have_no_windows(self, ray_session):
        import ray

        from clawrag_ray.stages.dedup import shared_window_pairs

        docs = ray.data.from_items(
            [{"doc_id": 1, "text": "tiny"}, {"doc_id": 2, "text": "tiny"}]
        )
        assert len(shared_window_pairs(docs)) == 0

    def test_identical_docs_share_all_windows(self, ray_session):
        import ray

        from clawrag_ray.stages.dedup import shared_window_pairs

        text = "abcdefgh" * 20  # 160 bytes, 97 windows, 89 DISTINCT (period 8)
        docs = ray.data.from_items(
            [{"doc_id": 1, "text": text}, {"doc_id": 2, "text": text}]
        )
        out = shared_window_pairs(docs)
        # distinct windows of a period-8 string of length 160: windows at
        # offsets 0..96 repeat with period 8 -> 8 distinct
        assert out["n_shared_windows"].iloc[0] == 8

    def test_matches_brute_force_sets(self, ray_session):
        import random

        import ray

        from clawrag_ray.stages.dedup import shared_window_pairs

        rng = random.Random(5)
        words = ["red", "blue", "green", "delta", "omega", "kappa"]
        texts = [" ".join(rng.choice(words) for _ in range(60)) for _ in range(12)]
        texts[7] = texts[2]  # exact dup
        docs = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        ).repartition(4)
        out = shared_window_pairs(docs)

        def wset(t: str) -> set:
            d = t.encode()
            return {d[i : i + 64] for i in range(len(d) - 63)} if len(d) >= 64 else set()

        expect = {}
        for a in range(12):
            for b in range(a + 1, 12):
                n = len(wset(texts[a]) & wset(texts[b]))
                if n:
                    expect[(a, b)] = n
        got = {(r.doc_a, r.doc_b): r.n_shared_windows for r in out.itertuples(index=False)}
        assert got == expect


class TestConnectedComponents:
    """Cluster consolidation: near-dup pairs -> component labels ->
    (doc_id, cluster_id, cluster_size) over the corpus."""

    def _brute_labels(self, edges):
        # driver-truth union-find
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    def test_fast_path_matches_bruteforce(self, ray_session):
        from clawrag_ray.stages.dedup import connected_components

        edges = [(1, 2), (2, 3), (5, 6), (7, 1), (10, 11), (11, 10)]
        pairs = ray.data.from_pandas(pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
        got = connected_components(pairs).to_pandas()
        expect = self._brute_labels(edges)
        assert dict(zip(got["node"], got["label"])) == expect

    def test_distributed_path_equals_fast_path(self, ray_session):
        """Force task_threshold=0 so every contraction round runs the
        hash-partitioned pass; include a 120-node chain (worst-case
        diameter) and random cross-links."""
        import numpy as np

        from clawrag_ray.stages.dedup import connected_components

        rng = np.random.default_rng(11)
        chain = pd.DataFrame({"doc_a": np.arange(0, 119), "doc_b": np.arange(1, 120)})
        ra = rng.integers(500, 900, 150)
        rb = rng.integers(500, 900, 150)
        g = pd.concat([chain, pd.DataFrame({"doc_a": ra, "doc_b": rb})])
        g = g[g["doc_a"] != g["doc_b"]].reset_index(drop=True)
        pairs = ray.data.from_pandas(g).repartition(5)
        fast = connected_components(pairs).to_pandas().sort_values("node").reset_index(drop=True)
        dist = (
            connected_components(pairs, task_threshold=0, num_partitions=6)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert fast.equals(dist)
        expect = self._brute_labels(list(zip(g["doc_a"], g["doc_b"])))
        assert dict(zip(fast["node"], fast["label"])) == expect

    def test_near_dup_clusters_labels_and_sizes(self, ray_session):
        from clawrag_ray.stages.dedup import near_dup_clusters

        out = near_dup_clusters(_docs_ds(), threshold=0.5).to_pandas()
        m = dict(zip(out["doc_id"], out["cluster_id"]))
        s = dict(zip(out["doc_id"], out["cluster_size"]))
        # docs 1,2,3,5 are one near-dup component (min id 1); 4 is a singleton
        assert m == {1: 1, 2: 1, 3: 1, 5: 1, 4: 4}
        assert s == {1: 4, 2: 4, 3: 4, 5: 4, 4: 1}

    def test_no_pairs_all_singletons(self, ray_session):
        from clawrag_ray.stages.dedup import near_dup_clusters

        docs = ray.data.from_items(
            [{"doc_id": i, "text": f"unique text number {i} " + "zz" * i} for i in range(4)]
        )
        out = near_dup_clusters(docs, threshold=0.9).to_pandas()
        assert (out["cluster_id"] == out["doc_id"]).all()
        assert (out["cluster_size"] == 1).all()


class TestBloomAntiJoin:
    def _sides(self, n_seen=60, n_new=40, n_dups=15):
        seen = pd.DataFrame(
            {"doc_id": range(n_seen), "key": [f"content-{i}" for i in range(n_seen)]}
        )
        # first n_dups of the batch duplicate seen content; rest are fresh
        new = pd.DataFrame(
            {
                "doc_id": range(1000, 1000 + n_new),
                "key": [f"content-{i}" if i < n_dups else f"fresh-{i}" for i in range(n_new)],
            }
        )
        return (
            ray.data.from_pandas(new).repartition(4),
            ray.data.from_pandas(seen).repartition(5),
            new,
        )

    def test_exact_anti_join_semantics(self, ray_session):
        from clawrag_ray.stages.dedup import bloom_anti_join

        new_ds, seen_ds, new = self._sides()
        got = bloom_anti_join(new_ds, seen_ds, "key").to_pandas().sort_values("doc_id")
        assert got["doc_id"].tolist() == new["doc_id"][15:].tolist()

    def test_exact_under_forced_false_positives(self, ray_session):
        from clawrag_ray.stages.dedup import bloom_anti_join

        # 64-bit filter over 60 seen keys: nearly every probe collides, so
        # the exact-verify leg carries the result alone
        new_ds, seen_ds, new = self._sides()
        got = bloom_anti_join(new_ds, seen_ds, "key", n_bits=64, n_hashes=2).to_pandas()
        assert sorted(got["doc_id"]) == new["doc_id"][15:].tolist()

    def test_empty_seen_passes_everything(self, ray_session):
        from clawrag_ray.stages.dedup import bloom_anti_join

        new_ds, _, new = self._sides()
        empty = ray.data.from_pandas(pd.DataFrame({"doc_id": [], "key": pd.Series([], dtype=str)}))
        got = bloom_anti_join(new_ds, empty, "key").to_pandas()
        assert sorted(got["doc_id"]) == new["doc_id"].tolist()


class TestEditDistanceNearDups:
    def test_levenshtein_matches_duckdb(self):
        import random

        import duckdb

        from clawrag_ray.stages.dedup import _levenshtein_capped

        random.seed(3)
        con = duckdb.connect()
        for _ in range(200):
            a = "".join(random.choice("abcd ") for _ in range(random.randint(0, 25)))
            b = "".join(random.choice("abcd ") for _ in range(random.randint(0, 25)))
            ref = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert _levenshtein_capped(a, b, 100) == ref, (a, b)

    def test_cap_early_exit(self):
        from clawrag_ray.stages.dedup import _levenshtein_capped

        assert _levenshtein_capped("abcdef" * 10, "zzzzzz" * 10, 3) == 4  # cap+1
        assert _levenshtein_capped("", "abc", 5) == 3
        assert _levenshtein_capped("abc", "", 3) == 3
        assert _levenshtein_capped("abc", "", 2) == 3  # over cap -> cap+1

    def _corpus(self):
        import numpy as np

        rng = np.random.default_rng(11)
        base = ["".join(rng.choice(list("abcdefg "), 80)) for _ in range(40)]
        docs = []
        for i, t in enumerate(base):
            docs.append(t)
            if i % 4 == 0:
                mut = list(t)
                mut[5], mut[20] = "z", "q"  # dist 2
                docs.append("".join(mut))
        docs.append("ab" * 40)  # repetitive (multiset q-gram regime)
        docs.append("ab" * 39 + "zz")
        return pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    def test_equals_brute_force(self, ray_session):
        from clawrag_ray.stages.dedup import _levenshtein_capped, edit_distance_near_dups

        df = self._corpus()
        ds = ray.data.from_pandas(df).repartition(5)
        got = (
            edit_distance_near_dups(ds, d=5, q=8)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        docs = df["text"].tolist()
        brute = [
            (i, j, _levenshtein_capped(docs[i], docs[j], 5))
            for i in range(len(docs))
            for j in range(i + 1, len(docs))
            if _levenshtein_capped(docs[i], docs[j], 5) <= 5
        ]
        exp = pd.DataFrame(brute, columns=["doc_a", "doc_b", "dist"])
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert len(exp) >= 11  # planted pairs + the repetitive pair found

    def test_short_doc_raises(self, ray_session):
        import pytest as _pytest

        from clawrag_ray.stages.dedup import edit_distance_near_dups

        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["short text"]}))
        with _pytest.raises(Exception, match="completeness regime"):
            edit_distance_near_dups(ds, d=5, q=8).to_pandas()

    def test_no_pairs_keeps_schema(self, ray_session):
        from clawrag_ray.stages.dedup import edit_distance_near_dups

        import numpy as np

        rng = np.random.default_rng(0)
        # far-apart random docs: no candidates at d=2
        df = pd.DataFrame(
            {"doc_id": range(6), "text": ["".join(rng.choice(list("abcdefghij"), 60)) for _ in range(6)]}
        )
        out = edit_distance_near_dups(ray.data.from_pandas(df), d=2, q=8)
        # to_pandas() drops zero-row blocks (schema lost there — known Ray
        # quirk); the Dataset itself pins the typed schema via the union'd
        # empty block
        assert out.count() == 0
        assert set(out.schema().names) == {"doc_a", "doc_b", "dist"}


class TestContainmentNearDups:
    def test_subset_doc_caught_jaccard_blind(self, ray_session):
        from clawrag_ray.stages.dedup import containment_near_dup_pairs

        short = "alpha beta gamma delta epsilon zeta"  # 6 words -> 4 shingles
        long = short + " " + " ".join(f"filler{i}" for i in range(40))
        other = "totally unrelated words with zero shingle overlap at all"
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [short, long, other],
            }
        )
        got = containment_near_dup_pairs(
            ray.data.from_arrow(t).repartition(2), threshold=0.9, num_partitions=4
        ).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        # all 4 of short's shingles appear in long: containment 1.0,
        # while Jaccard is 4/45 — far below any dedup threshold
        assert (row["doc_a"], row["doc_b"]) == (1, 2)
        assert row["n_shared"] == 4 and row["containment"] == 1.0


class TestContainmentPrefixPath:
    def test_prefix_equals_exact(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.dedup import (
            containment_near_dup_pairs,
            containment_near_dup_pairs_prefix,
        )

        rng = np.random.RandomState(5)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, size=rng.randint(4, 25))) for _ in range(40)]
        # plant a short-in-long pair and an exact dup
        texts[3] = texts[7] + " extra tail words beyond the shared part here now"
        texts[11] = texts[20]
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        ds = ray.data.from_arrow(t).repartition(3)
        for thr in (0.5, 0.8):
            exact = (
                containment_near_dup_pairs(ds, threshold=thr, num_partitions=4)
                .to_pandas()
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)
            )
            pref = (
                containment_near_dup_pairs_prefix(ds, threshold=thr, num_partitions=4)
                .to_pandas()
                .sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(exact, pref, check_dtype=False)
            assert ((exact["doc_a"] == 7) & (exact["doc_b"] == 3)).any() or (
                (exact["doc_a"] == 3) & (exact["doc_b"] == 7)
            ).any()


class TestRecordLinkageClusters:
    def test_planted_cluster_and_singletons(self, ray_session):
        from clawrag_ray.stages.dedup import record_linkage_clusters

        base = "johnathan smith 123 main street springfield apartment four"
        rows = [
            (1, base),
            (2, base.replace("johnathan", "jonathan")),   # 1 edit
            (3, base.replace("four", "főur")),            # tiny edit, same length
            (4, "completely different record about quarterly revenue numbers"),
            (5, "x"),
        ]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
        got = (
            record_linkage_clusters(
                ray.data.from_arrow(t).repartition(2), d=5, window=3, num_partitions=4
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert got.loc[1, "cluster_id"] == 1 and got.loc[2, "cluster_id"] == 1
        assert got.loc[3, "cluster_id"] == 1 and got.loc[1, "cluster_size"] == 3
        assert got.loc[4, "cluster_size"] == 1 and got.loc[5, "cluster_size"] == 1


class TestMinhashIncremental:
    def test_cross_and_within_batch_pairs_only(self, ray_session):
        from clawrag_ray.stages.dedup import minhash_incremental_near_dups

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
        seen_rows = [(1, base), (2, "totally unrelated seen text with many words here"),
                     (3, base + "tail one")]  # 1~3 near-dup WITHIN seen: must NOT appear
        new_rows = [(10, base + "tail two"),  # near-dup with seen 1 and 3
                    (11, base + "tail two"),  # exact dup of 10: within-batch pair
                    (12, "fresh unique content nothing like anything else at all")]
        seen = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([r[0] for r in seen_rows], pa.int64()),
                      "text": [r[1] for r in seen_rows]})
        ).repartition(2)
        new = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
                      "text": [r[1] for r in new_rows]})
        )
        got = (
            minhash_incremental_near_dups(new, seen, threshold=0.5, num_partitions=4)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
        )
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        assert (10, 11) in pairs            # within-batch
        assert (1, 10) in pairs and (3, 10) in pairs  # cross batch-vs-seen
        assert (1, 3) not in pairs          # seen x seen never emitted
        assert not any(a == 12 or b == 12 for a, b in pairs)


class TestMinhashBucketCap:
    """max_bucket_size: the skew guard for exact-duplicate-heavy crawls —
    oversized band buckets (every copy of a hot page) drop instead of
    emitting B^2/2 candidate pairs."""

    def _corpus(self):
        hot = "hot boilerplate page " * 20
        rows = [(i, hot) for i in range(1, 9)]  # 8 exact copies: bucket size 8
        rows += [(100, BASE), (101, NEAR)]      # a small legit near-dup pair
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                }
            )
        ).repartition(3)

    def test_oversized_bucket_dropped_small_kept(self, ray_session):
        got = minhash_near_dups(self._corpus(), threshold=0.5, max_bucket_size=4)
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        assert (100, 101) in pairs                       # size-2 bucket survives
        assert not any(a < 100 for a, _ in pairs)        # hot-copy pairs all dropped

    def test_uncapped_matches_default(self, ray_session):
        got = minhash_near_dups(self._corpus(), threshold=0.5)
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        assert (100, 101) in pairs
        assert (1, 2) in pairs and len([p for p in pairs if p[0] < 100]) == 28  # C(8,2)

    def test_incremental_cap(self, ray_session):
        from clawrag_ray.stages.dedup import minhash_incremental_near_dups

        hot = "hot boilerplate page " * 20
        seen = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()), "text": [hot] * 5})
        )
        new = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([10, 11, 100], pa.int64()),
                    "text": [hot, hot, BASE],
                }
            )
        )
        got = minhash_incremental_near_dups(
            new, seen, threshold=0.5, num_partitions=4, max_bucket_size=4
        ).to_pandas()
        assert got.empty  # the only colliding bucket is oversized (7 docs)


class TestMinhashIncrementalRecrawl:
    """A re-crawled doc carries its EXISTING doc_id: no self-pairs, and the
    verify corpus prefers the new side's text."""

    def test_self_pair_filtered_and_new_text_wins(self, ray_session):
        from clawrag_ray.stages.dedup import minhash_incremental_near_dups

        seen = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 3], pa.int64()),
                    # doc 1's OLD text is unrelated; doc 3 matches the re-crawl
                    "text": [FAR, BASE + " tail"],
                }
            )
        )
        new = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()), "text": [BASE]})
        )
        got = (
            minhash_incremental_near_dups(new, seen, threshold=0.5, num_partitions=4)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
        )
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        assert (1, 3) in pairs          # found via the NEW text's bands
        assert all(a != b for a, b in pairs)
        # prefer-new: jaccard computed on (BASE, BASE+" tail"), not (FAR, ...)
        j = float(got.set_index(["doc_a", "doc_b"]).loc[(1, 3), "jaccard"])
        assert j >= 0.5

    def test_identical_recrawl_no_self_pair(self, ray_session):
        from clawrag_ray.stages.dedup import minhash_incremental_near_dups

        seen = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1, 3], pa.int64()), "text": [BASE, BASE + " tail"]})
        )
        new = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()), "text": [BASE]})
        )
        got = minhash_incremental_near_dups(new, seen, threshold=0.5, num_partitions=4).to_pandas()
        pairs = set(zip(got["doc_a"], got["doc_b"]))
        assert (1, 3) in pairs and (1, 1) not in pairs


class TestMinhashPersistedBands:
    def test_seen_bands_path_identical(self, ray_session, tmp_path):
        from clawrag_ray.stages.dedup import minhash_band_table, minhash_incremental_near_dups

        seen_rows = [(1, BASE), (2, FAR), (3, BASE + " tail one")]
        new_rows = [(10, BASE + " tail two"), (11, BASE + " tail two"), (12, "nothing alike here at all")]
        seen = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([r[0] for r in seen_rows], pa.int64()),
                      "text": [r[1] for r in seen_rows]})
        ).repartition(2)
        new = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
                      "text": [r[1] for r in new_rows]})
        )
        kw = dict(shingle_k=3, n_perm=128, n_bands=64)
        band_dir = str(tmp_path / "bands")
        minhash_band_table(seen, **kw).write_parquet(band_dir)
        stored = ray.data.read_parquet(band_dir)
        a = (
            minhash_incremental_near_dups(new, seen, threshold=0.5, num_partitions=4, **kw)
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        b = (
            minhash_incremental_near_dups(
                new, seen, threshold=0.5, num_partitions=4, seen_bands=stored,
                assume_disjoint_ids=True, **kw
            )
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestContainmentShingleGuard:
    """max_shingle_df: a boilerplate-hot shingle raises (self-certifying)
    instead of expanding quadratically — on BOTH containment paths."""

    def _hot_corpus(self):
        hot = "all rights reserved legal"  # one shingle shared by every doc
        rows = [(i, f"{hot} unique{i} filler{i} words{i} here{i}") for i in range(1, 7)]
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                }
            )
        ).repartition(2)

    def test_exact_path_raises(self, ray_session):
        from clawrag_ray.stages.dedup import containment_near_dup_pairs

        with pytest.raises(Exception, match="max_shingle_df"):
            containment_near_dup_pairs(
                self._hot_corpus(), threshold=0.5, num_partitions=4, max_shingle_df=4
            ).materialize()

    def test_prefix_path_raises(self, ray_session):
        from clawrag_ray.stages.dedup import containment_near_dup_pairs_prefix

        with pytest.raises(Exception, match="max_shingle_df"):
            containment_near_dup_pairs_prefix(
                self._hot_corpus(), threshold=0.5, num_partitions=4, max_shingle_df=4
            ).materialize()

    def test_default_cap_passes_normal_corpus(self, ray_session):
        from clawrag_ray.stages.dedup import containment_near_dup_pairs

        got = containment_near_dup_pairs(
            self._hot_corpus(), threshold=0.9, num_partitions=4
        ).to_pandas()
        assert got.empty  # no qualifying pairs; guard silent below the cap


class TestRecordLinkagePackGuard:
    def test_oversized_id_raises(self, ray_session):
        from clawrag_ray.stages.dedup import record_linkage_clusters

        t = pa.table(
            {
                "doc_id": pa.array([1, 2**33], pa.int64()),
                "text": ["short text one", "short text two"],
            }
        )
        with pytest.raises(Exception, match="2\\^32"):
            record_linkage_clusters(
                ray.data.from_arrow(t), d=5, window=3, num_partitions=4
            ).materialize()
