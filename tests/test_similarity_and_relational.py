"""Similarity search + relational operator tests with engineered fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from clawrag_ray.stages.relational import (
    broadcast_join,
    pre_aggregate,
    sessionize,
    top_k,
    tumbling_window,
)
from clawrag_ray.stages.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)


def _emb_ds(n=200, d=16, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, d))
    # plant a near-duplicate of vector 0 at id n-1
    vecs[n - 1] = vecs[0] + 0.01 * rng.standard_normal(d)
    rows = [{"vec_id": i, "embedding": vecs[i].astype(np.float32).tolist()} for i in range(n)]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4), vecs


class TestSimilarity:
    def test_brute_force_matches_numpy(self):
        ds, vecs = _emb_ds()
        q = {0: vecs[0], 7: vecs[7]}
        got = brute_force_topk(ds, q, k=5, concurrency=1)
        # numpy oracle
        norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for qid in q:
            sims = norm @ norm[qid]
            want = set(np.argsort(-sims)[:5].tolist())
            got_ids = set(got[got["query_id"] == qid]["vec_id"])
            assert got_ids == want
        # self always rank 1 with cosine 1
        top = got[got["query_id"] == 0].iloc[0]
        assert top["vec_id"] == 0 and top["cosine"] == 1.0

    def test_planted_near_dup_found(self):
        ds, vecs = _emb_ds()
        got = brute_force_topk(ds, {0: vecs[0]}, k=2, concurrency=1)
        assert got["vec_id"].tolist() == [0, 199]

    def test_lsh_recall_reasonable(self):
        ds, vecs = _emb_ds()
        q = {0: vecs[0]}
        exact = set(brute_force_topk(ds, q, k=10, concurrency=1)["vec_id"])
        approx = set(lsh_topk(ds, q, k=10, n_bits=6, concurrency=1)["vec_id"])
        # planted dup lands in the same bucket; recall need not be 1
        assert 199 in approx
        assert len(exact & approx) >= 3

    def test_near_dup_pairs(self):
        ds, _ = _emb_ds()
        pairs = embedding_near_dup_pairs(ds, threshold=0.99, concurrency=1)
        assert [(0, 199)] == list(zip(pairs["vec_a"], pairs["vec_b"]))

    def test_tile_sweep_matches_numpy_all_pairs(self):
        ds, vecs = _emb_ds()
        got = embedding_near_dup_pairs(ds, threshold=0.5, num_blocks=5)
        # embeddings are float32 in the table; mirror that precision
        norm32 = (vecs.astype(np.float32)).astype(np.float64)
        norm32 = norm32 / np.linalg.norm(norm32, axis=1, keepdims=True)
        sims = norm32 @ norm32.T
        want = sorted(
            (a, b, round(float(sims[a, b]), 6))
            for a in range(len(vecs))
            for b in range(a + 1, len(vecs))
            if sims[a, b] >= 0.5
        )
        assert sorted(zip(got["vec_a"], got["vec_b"], got["cosine"])) == want
        assert len(want) >= 1

    def test_lsh_pairs_subset_of_exact_and_finds_planted(self):
        from clawrag_ray.stages.similarity import embedding_near_dup_pairs_lsh

        ds, _ = _emb_ds()
        exact = embedding_near_dup_pairs(ds, threshold=0.9)
        lsh = embedding_near_dup_pairs_lsh(ds, threshold=0.9)
        exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
        lsh_pairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
        assert lsh_pairs <= exact_pairs  # verification is exact -> never extra
        assert (0, 199) in lsh_pairs  # planted near-dup survives pruning

    def test_ivf_pairs_equal_exact_on_random_vectors(self):
        from clawrag_ray.stages.similarity import embedding_near_dup_pairs_ivf

        ds, _ = _emb_ds()
        exact = embedding_near_dup_pairs(ds, threshold=0.9).reset_index(drop=True)
        ivf = embedding_near_dup_pairs_ivf(ds, threshold=0.9, n_centroids=8, n_probe=3).reset_index(drop=True)
        assert exact.equals(ivf)
        assert (0, 199) in set(zip(ivf["vec_a"], ivf["vec_b"]))

    def test_ivf_pairs_equal_exact_on_correlated_embedder_corpus(self):
        """The wiring case the tile sweep used to own: HashEmbedder vectors
        over same-vocabulary documents are heavily correlated (random-pair
        cosine ~0.57) — the regime where hyperplane LSH degenerates. The
        IVF cell path must reproduce the exact sweep's pairs bit-for-bit."""
        import pyarrow.compute as pc

        from clawrag_ray.stages.embed import embed_texts
        from clawrag_ray.stages.similarity import embedding_near_dup_pairs_ivf

        words = ["spark", "merge", "window", "value", "shuffle", "join", "batch", "actor"]
        rows = []
        rng = np.random.RandomState(3)
        for i in range(150):
            text = " ".join(words[j % len(words)] for j in rng.randint(0, len(words), size=30))
            rows.append({"doc_id": i, "text": text})
        # planted near-dup: doc 149 = doc 0 with one word changed
        rows[149]["text"] = rows[0]["text"].replace("spark", "merge", 1)
        docs = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
        emb = embed_texts(docs, concurrency=1)

        def to_vec(b):
            return pa.table({"vec_id": pc.cast(b["doc_id"], pa.int64()), "embedding": b["embedding"]})

        vecs = emb.map_batches(to_vec, batch_format="pyarrow", zero_copy_batch=True)
        exact = embedding_near_dup_pairs(vecs, threshold=0.95).reset_index(drop=True)
        # this synthetic corpus is far denser than the sf documents table
        # (306 qualifying pairs among 150 docs) — n_probe=4 is the recall
        # knob setting that makes the cell cover exact here; the driver
        # wiring's n_probe=3 is verified against the real corpus at
        # sf0.001-0.1 (see _q_doc_embedding_near_dups)
        ivf = embedding_near_dup_pairs_ivf(vecs, threshold=0.95, n_centroids=8, n_probe=4).reset_index(drop=True)
        assert exact.equals(ivf)
        assert len(ivf) >= 1  # correlated corpus genuinely has near-dups


def _events_ds():
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1: two sessions (gap 45min), user 2: one session
    for i, mins in enumerate([0, 5, 10, 55, 60]):
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=mins), "value": float(i), "event_type": "a"})
    for mins in [0, 20]:
        rows.append({"user_id": 2, "ts": base + pd.Timedelta(minutes=mins), "value": 1.0, "event_type": "b"})
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)


class TestRelational:
    def test_pre_aggregate_matches_pandas(self):
        df = pd.DataFrame({"k": ["a", "a", "b"] * 10, "v": np.arange(30, dtype=float)})
        ds = ray.data.from_pandas(df).repartition(3)
        got = pre_aggregate(ds, ["k"], ["v"]).to_pandas().set_index("k")
        want = df.groupby("k")["v"].agg(["sum", "count"])
        for k in ("a", "b"):
            assert got.loc[k, "sum_v"] == want.loc[k, "sum"]
            assert got.loc[k, "n"] == want.loc[k, "count"]

    def test_broadcast_join(self):
        big = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 2, 3], "x": [10, 20, 21, 30]}))
        small = pd.DataFrame({"k": [1, 2], "name": ["one", "two"]})
        got = broadcast_join(big, small, on="k", concurrency=1).to_pandas()
        assert len(got) == 3  # inner join drops k=3
        assert set(got["name"]) == {"one", "two"}

    def test_tumbling_window(self):
        got = tumbling_window(_events_ds(), keys=["event_type"]).to_pandas()
        hour0_a = got[(got["event_type"] == "a") & (got["window_start"] == pd.Timestamp("2024-01-01 00:00:00"))]
        assert hour0_a["n_events"].iloc[0] == 4  # minutes 0,5,10,55
        hour1_a = got[(got["event_type"] == "a") & (got["window_start"] == pd.Timestamp("2024-01-01 01:00:00"))]
        assert hour1_a["n_events"].iloc[0] == 1  # minute 60

    def test_sessionize(self):
        got = sessionize(_events_ds(), gap_minutes=30.0).to_pandas().set_index("user_id")
        assert got.loc[1, "n_sessions"] == 2
        assert got.loc[1, "longest_session_events"] == 3
        assert got.loc[2, "n_sessions"] == 1
        assert got.loc[2, "n_events"] == 2

    def test_top_k(self):
        ds = ray.data.from_pandas(pd.DataFrame({"a": list(range(100))})).repartition(5)
        got = top_k(ds, "a", 3).to_pandas()
        assert got["a"].tolist() == [99, 98, 97]


class TestHotKeyVariants:
    """Two-phase variants for keys whose rows exceed one group task: one
    pathological key holds the bulk of the rows, spread over many blocks,
    and the salted/bucketed output must equal the single-phase output."""

    def test_top_n_per_group_salted(self):
        from clawrag_ray.stages.relational import top_n_per_group

        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {
                "k": [1] * 5000 + [2] * 20,
                "v": np.concatenate([rng.permutation(5000), rng.permutation(20)]).astype("int64"),
                "id": np.arange(5020, dtype="int64"),
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        plain = top_n_per_group(ds, ["k"], "v", 5, tiebreak_col="id").to_pandas()
        salted = top_n_per_group(ds, ["k"], "v", 5, tiebreak_col="id", salt=16).to_pandas()
        key = lambda d: sorted(zip(d["k"], d["v"], d["id"]))  # noqa: E731
        assert key(plain) == key(salted)
        assert len(salted) == 10

    def test_sessionize_bucketed_equals_plain(self):
        from clawrag_ray.stages.relational import sessionize, sessionize_bucketed

        rng = np.random.RandomState(7)
        base = pd.Timestamp("2024-01-01")
        rows = []
        t = base
        # one hot user with ~3000 events across days incl. cross-bucket gaps
        for _ in range(3000):
            t = t + pd.Timedelta(minutes=int(rng.choice([1, 2, 5, 50], p=[0.5, 0.3, 0.1, 0.1])))
            rows.append({"user_id": 1, "ts": t})
        for i in range(10):
            rows.append({"user_id": 2, "ts": base + pd.Timedelta(hours=i * 2)})
        ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(6)
        plain = sessionize(ds, gap_minutes=30).to_pandas().set_index("user_id").sort_index()
        buck = (
            sessionize_bucketed(ds, gap_minutes=30, bucket_hours=6.0)
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        pd.testing.assert_frame_equal(plain, buck, check_like=True)

    def test_sessionize_bucketed_session_spans_buckets(self):
        from clawrag_ray.stages.relational import sessionize_bucketed

        # events every 10 min straddling a bucket edge -> ONE session
        rows = [
            {"user_id": 9, "ts": pd.Timestamp("2024-01-01 05:40") + pd.Timedelta(minutes=10 * i)}
            for i in range(6)
        ]
        ds = ray.data.from_pandas(pd.DataFrame(rows))
        got = sessionize_bucketed(ds, gap_minutes=30, bucket_hours=1.0).to_pandas()
        assert got["n_sessions"].iloc[0] == 1
        assert got["longest_session_events"].iloc[0] == 6

    def test_asof_join_bucketed_equals_plain(self):
        from clawrag_ray.stages.relational import asof_join

        rng = np.random.RandomState(11)
        base = pd.Timestamp("2024-01-01")
        left = pd.DataFrame(
            {
                "event_id": np.arange(2000, dtype="int64"),
                "user_id": np.concatenate([np.full(1900, 1), rng.randint(2, 5, 100)]).astype("int64"),
                "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.randint(0, 50000, 2000)],
            }
        )
        right = pd.DataFrame(
            {
                "o_custkey": np.concatenate([np.full(300, 1), rng.randint(2, 5, 50)]).astype("int64"),
                "o_ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.randint(0, 50000, 350)],
                "o_id": np.arange(350, dtype="int64"),
                "o_val": rng.randint(0, 1000, 350).astype("int64"),
            }
        )
        lds = ray.data.from_pandas(left).repartition(7)
        rds = ray.data.from_pandas(right).repartition(3)
        kw = dict(
            by="user_id",
            right_by="o_custkey",
            left_ts="ts",
            right_ts="o_ts",
            right_value_cols=["o_id", "o_val"],
            right_tiebreak="o_id",
        )
        plain = asof_join(lds, rds, **kw).to_pandas()
        bucketed = asof_join(lds, rds, ts_bucket_us=3_600_000_000, **kw).to_pandas()
        key = lambda d: sorted(  # noqa: E731
            (int(e), None if pd.isna(i) else int(i), None if pd.isna(v) else int(v))
            for e, i, v in zip(d["event_id"], d["o_id"], d["o_val"])
        )
        assert key(plain) == key(bucketed)
        assert len(bucketed) == 2000


class TestIVF:
    def test_ivf_recall_and_determinism(self):
        from clawrag_ray.stages.similarity import ivf_topk

        ds, vecs = _emb_ds()
        q = {0: vecs[0], 7: vecs[7], 42: vecs[42]}
        got = ivf_topk(ds, q, k=5, n_centroids=8, n_probe=4, concurrency=1)
        again = ivf_topk(ds, q, k=5, n_centroids=8, n_probe=4, concurrency=1)
        pd.testing.assert_frame_equal(got, again)  # deterministic quantizer
        exact = brute_force_topk(ds, q, k=5, concurrency=1)
        hits = 0
        for qid in q:
            want = set(exact[exact["query_id"] == qid]["vec_id"])
            have = set(got[got["query_id"] == qid]["vec_id"])
            hits += len(want & have)
        assert hits / (5 * len(q)) >= 0.6  # probing half the cells
        # each query's own vector always lands in its probed cell
        for qid in q:
            assert got[got["query_id"] == qid].iloc[0]["vec_id"] == qid

    def test_ivf_assign_covers_all(self):
        from clawrag_ray.stages.similarity import ivf_assign, kmeans_centroids

        ds, _ = _emb_ds()
        cents = kmeans_centroids(ds, n_centroids=4, n_iters=3, concurrency=1)
        assert cents.shape == (4, 16)
        cells = ivf_assign(ds, cents, concurrency=1).to_pandas()["ivf_cell"]
        assert len(cells) == 200
        assert set(cells.unique()).issubset(set(range(4)))


class TestIVFPQ:
    def test_pq_recall_and_determinism(self):
        from clawrag_ray.stages.similarity import ivf_pq_topk

        ds, vecs = _emb_ds()
        q = {0: vecs[0], 7: vecs[7], 42: vecs[42]}
        got = ivf_pq_topk(ds, q, k=5, n_centroids=8, n_probe=6, m=4, n_codes=16, refine=8, concurrency=1)
        again = ivf_pq_topk(ds, q, k=5, n_centroids=8, n_probe=6, m=4, n_codes=16, refine=8, concurrency=1)
        pd.testing.assert_frame_equal(got, again)
        exact = brute_force_topk(ds, q, k=5, concurrency=1)
        hits = 0
        for qid in q:
            want = set(exact[exact["query_id"] == qid]["vec_id"])
            hits += len(want & set(got[got["query_id"] == qid]["vec_id"]))
        assert hits / (5 * len(q)) >= 0.6
        # refine rescans true vectors: every reported cosine is exact
        merged = got.merge(exact, on=["query_id", "vec_id"], suffixes=("", "_x"))
        assert (merged["cosine"] == merged["cosine_x"]).all()

    def test_encode_shapes_and_dtype(self):
        from clawrag_ray.stages.similarity import kmeans_centroids, pq_encode, pq_train_codebooks

        ds, _ = _emb_ds()
        cents = kmeans_centroids(ds, n_centroids=4, n_iters=3, concurrency=1)
        books = pq_train_codebooks(ds, m=4, n_codes=16)
        assert books.shape == (4, 16, 4)
        enc = pq_encode(ds, cents, books, concurrency=1).to_pandas()
        assert len(enc) == 200
        codes = np.stack(enc["codes"].to_numpy())
        assert codes.shape == (200, 4) and codes.dtype == np.uint8 and codes.max() < 16

    def test_indivisible_dim_raises(self):
        from clawrag_ray.stages.similarity import pq_train_codebooks

        ds, _ = _emb_ds()  # dim 16
        with pytest.raises(ValueError, match="divisible"):
            pq_train_codebooks(ds, m=5)


class TestNewRelationalOps:
    def test_hash_join_inner(self):
        from clawrag_ray.stages.relational import hash_join

        left = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 3], "v": [10, 20, 30, 31]}))
        right = ray.data.from_arrow(pa.table({"rk": [2, 3, 4], "w": ["b", "c", "d"]}))
        df = hash_join(left, right, on="k", right_on="rk", num_partitions=2).to_pandas()
        got = sorted(zip(df["k"], df["v"], df["w"]))
        assert got == [(2, 20, "b"), (3, 30, "c"), (3, 31, "c")]

    def test_asof_join_latest_prior(self):
        from clawrag_ray.stages.relational import asof_join

        left = ray.data.from_arrow(pa.table({"id": [1, 2, 3], "k": [7, 7, 8], "t": [10, 25, 10]}))
        right = ray.data.from_arrow(pa.table({"rk": [7, 7, 9], "rt": [5, 20, 1], "price": [1.0, 2.0, 9.0]}))
        df = asof_join(left, right, by="k", right_by="rk", left_ts="t", right_ts="rt",
                       right_value_cols=["price"]).to_pandas().set_index("id")
        assert df.loc[1, "price"] == 1.0      # t=10 -> rt=5
        assert df.loc[2, "price"] == 2.0      # t=25 -> rt=20
        assert pd.isna(df.loc[3, "price"])    # key 8 has no right rows

    def test_asof_join_equal_ts_matches(self):
        from clawrag_ray.stages.relational import asof_join

        left = ray.data.from_arrow(pa.table({"id": [1], "k": [7], "t": [20]}))
        right = ray.data.from_arrow(pa.table({"rk": [7], "rt": [20], "price": [5.0]}))
        df = asof_join(left, right, by="k", right_by="rk", left_ts="t", right_ts="rt",
                       right_value_cols=["price"]).to_pandas()
        assert df["price"].tolist() == [5.0]  # <= semantics

    def test_asof_join_tied_right_rows_deterministic(self):
        from clawrag_ray.stages.relational import asof_join

        left = ray.data.from_arrow(pa.table({"id": [1], "k": [7], "t": [30]}))
        # three right rows tied on (key, ts): greatest tiebreak (rid) wins
        right = ray.data.from_arrow(
            pa.table({"rk": [7, 7, 7], "rt": [20, 20, 20], "rid": [3, 1, 2], "price": [30.0, 10.0, 20.0]})
        ).repartition(3)
        df = asof_join(left, right, by="k", right_by="rk", left_ts="t", right_ts="rt",
                       right_value_cols=["rid", "price"], right_tiebreak="rid").to_pandas()
        assert df["rid"].tolist() == [3] and df["price"].tolist() == [30.0]

    def test_asof_join_null_right_value_propagates(self):
        from clawrag_ray.stages.relational import asof_join

        left = ray.data.from_arrow(pa.table({"id": [1], "k": [7], "t": [30]}))
        # matched right row (rt=20) has a NULL price; the earlier row's 1.0
        # must NOT leak into the match via value-ffill
        right = ray.data.from_arrow(
            pa.table({"rk": [7, 7], "rt": [5, 20], "price": pa.array([1.0, None], pa.float64())})
        )
        df = asof_join(left, right, by="k", right_by="rk", left_ts="t", right_ts="rt",
                       right_value_cols=["price"]).to_pandas()
        assert pd.isna(df["price"].iloc[0])

    def test_grouped_quantiles_matches_numpy(self):
        import numpy as np

        from clawrag_ray.stages.relational import grouped_quantiles

        vals = [1.0, 2.0, 3.0, 4.0, 100.0]
        ds = ray.data.from_arrow(pa.table({"g": ["a"] * 5, "v": vals}))
        df = grouped_quantiles(ds, ["g"], "v", [0.5, 0.9]).to_pandas()
        assert df["p50"].iloc[0] == round(float(np.percentile(vals, 50)), 4)
        assert df["p90"].iloc[0] == round(float(np.percentile(vals, 90)), 4)
        assert df["n"].iloc[0] == 5

    def test_grouped_quantiles_tdigest_exact_regime(self):
        """While group sizes stay under compression, the sketch path must
        equal the exact path bit-for-bit (all centroids are singletons and
        the midpoint interpolation reduces to numpy linear percentile)."""
        from clawrag_ray.stages.relational import grouped_quantiles, grouped_quantiles_tdigest

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {"k": np.repeat(["a", "b", "c"], 200), "v": rng.standard_normal(600) * 10}
        )
        ds = ray.data.from_pandas(df).repartition(5)
        exact = grouped_quantiles(ds, ["k"], "v", [0.5, 0.29, 0.95]).to_pandas().sort_values("k").reset_index(drop=True)
        sketch = (
            grouped_quantiles_tdigest(ds, ["k"], "v", [0.5, 0.29, 0.95], compression=1024)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact[sorted(exact.columns)], sketch[sorted(sketch.columns)])

    def test_grouped_quantiles_tdigest_bounded_error_when_merging(self):
        """Forced merging (compression far below group size): quantile rank
        error is bounded by W/compression, i.e. value error within the
        span of ~2W/compression neighboring order stats."""
        from clawrag_ray.stages.relational import grouped_quantiles_tdigest

        rng = np.random.RandomState(7)
        vals = rng.standard_normal(5000)
        df = pd.DataFrame({"k": "a", "v": vals})
        ds = ray.data.from_pandas(df).repartition(8)
        got = grouped_quantiles_tdigest(ds, ["k"], "v", [0.5, 0.95], compression=64).to_pandas()
        assert int(got["n"].iloc[0]) == 5000
        srt = np.sort(vals)
        for q, col in [(0.5, "p50"), (0.95, "p95")]:
            rank = q * (len(srt) - 1)
            slack = 2 * len(srt) / 64  # rank error bound (partial + merge passes)
            lo = srt[max(0, int(rank - slack))]
            hi = srt[min(len(srt) - 1, int(rank + slack) + 1)]
            assert lo <= got[col].iloc[0] <= hi

    def test_distinct_count(self):
        from clawrag_ray.stages.relational import distinct_count

        ds = ray.data.from_arrow(pa.table({"g": ["a", "a", "a", "b"], "u": [1, 1, 2, 9]})).repartition(3)
        df = distinct_count(ds, ["g"], "u").to_pandas().set_index("g")
        assert df.loc["a", "n_distinct_u"] == 2 and df.loc["b", "n_distinct_u"] == 1

    def test_top_n_per_group_with_ties(self):
        from clawrag_ray.stages.relational import top_n_per_group

        ds = ray.data.from_arrow(pa.table({"g": ["a"] * 4, "id": [1, 2, 3, 4], "s": [5.0, 9.0, 9.0, 1.0]}))
        df = top_n_per_group(ds, ["g"], "s", 2, tiebreak_col="id").to_pandas()
        assert sorted(df["id"]) == [2, 3]  # tie broken by id ascending

    def test_hopping_window_counts(self):
        from clawrag_ray.stages.relational import hopping_window

        ts = pa.array([0, 45 * 60_000_000], pa.timestamp("us"))  # 00:00 and 00:45
        ds = ray.data.from_arrow(pa.table({"ts": ts, "value": [1.0, 2.0]}))
        df = hopping_window(ds, size_minutes=60, hop_minutes=30).to_pandas()
        # event@00:00 -> windows [-30, 0]; event@00:45 -> windows [0, 30]
        win = {int(w.timestamp() / 60): n for w, n in zip(df["window_start"], df["n_events"])}
        assert win == {-30: 1, 0: 2, 30: 1}

    def test_deterministic_sample_stable(self):
        from clawrag_ray.stages.relational import deterministic_sample

        ds = ray.data.from_arrow(pa.table({"doc_id": list(range(1000))}))
        a = sorted(deterministic_sample(ds, "doc_id", 10, 0).to_pandas()["doc_id"])
        b = sorted(deterministic_sample(ds, "doc_id", 10, 0).to_pandas()["doc_id"])
        assert a == b and 50 < len(a) < 150  # ~10%
        # partition-independent: same rows at any layout
        c = sorted(deterministic_sample(ds.repartition(7), "doc_id", 10, 0).to_pandas()["doc_id"])
        assert a == c

    def test_distinct_count_hll_sparse_exact(self):
        from clawrag_ray.stages.relational import distinct_count, distinct_count_hll

        rows = pd.DataFrame(
            {"g": ["a"] * 600 + ["b"] * 100, "u": [i % 200 for i in range(600)] + [i % 7 for i in range(100)]}
        )
        ds = ray.data.from_pandas(rows).repartition(5)
        exact = distinct_count(ds, ["g"], "u").to_pandas().sort_values("g").reset_index(drop=True)
        hll = distinct_count_hll(ds, ["g"], "u").to_pandas().sort_values("g").reset_index(drop=True)
        pd.testing.assert_frame_equal(exact.astype({"n_distinct_u": "int64"}), hll)

    def test_distinct_count_hll_dense_bounded_error(self):
        from clawrag_ray.stages.relational import distinct_count_hll

        n = 5000  # >> sparse_limit below -> every partial folds dense
        ds = ray.data.from_pandas(pd.DataFrame({"g": ["x"] * n, "u": list(range(n))})).repartition(6)
        est = distinct_count_hll(ds, ["g"], "u", sparse_limit=64).to_pandas()["n_distinct_u"].iloc[0]
        # p=12 -> 1.04/sqrt(4096) ~ 1.6% standard error; allow 5 sigma
        assert abs(est - n) / n < 0.08

    def test_rrf_fuse_known_lists(self):
        from clawrag_ray.stages.retrieval import rrf_fuse

        l1 = pd.DataFrame({"doc_id": [1, 2, 3]})
        l2 = pd.DataFrame({"doc_id": [3, 1]})
        out = rrf_fuse([l1, l2])
        expect = {
            1: round(1 / 61 + 1 / 62, 6),
            2: round(1 / 62, 6),
            3: round(1 / 63 + 1 / 61, 6),
        }
        got = dict(zip(out["doc_id"], out["rrf_score"]))
        assert got == expect
        # sorted by score desc then doc_id asc
        assert list(out["doc_id"]) == sorted(expect, key=lambda d: (-expect[d], d))
        assert list(rrf_fuse([l1, l2], top=2)["doc_id"]) == list(out["doc_id"])[:2]


class TestRangeJoinAndWatermark:
    def test_range_join_matches_bruteforce(self):
        from clawrag_ray.stages.relational import range_join

        rng = np.random.RandomState(2)
        base = pd.Timestamp("2024-03-01")
        left = pd.DataFrame(
            {
                "eid": np.arange(400, dtype="int64"),
                "uid": rng.randint(0, 5, 400).astype("int64"),
                "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.randint(0, 3000, 400)],
            }
        )
        right = pd.DataFrame(
            {
                "wid": np.arange(30, dtype="int64"),
                "w_uid": rng.randint(0, 5, 30).astype("int64"),
                "start": [base + pd.Timedelta(minutes=int(m)) for m in rng.randint(0, 2800, 30)],
            }
        )
        right["end"] = right["start"] + pd.Timedelta(minutes=90)
        got = range_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            left_ts="ts",
            right_start="start",
            right_end="end",
            by="uid",
            right_by="w_uid",
            right_keep=["wid"],
            bucket_us=45 * 60 * 1_000_000,  # windows span multiple buckets
        ).to_pandas()
        want = set()
        for e in left.itertuples():
            for w in right.itertuples():
                if e.uid == w.w_uid and w.start <= e.ts < w.end:
                    want.add((e.eid, w.wid))
        assert set(zip(got["eid"].astype(int), got["wid"].astype(int))) == want
        assert len(got) == len(want)  # exactly-once per qualifying pair
        assert len(want) > 50

    def test_range_join_unkeyed(self):
        from clawrag_ray.stages.relational import range_join

        base = pd.Timestamp("2024-03-01")
        left = pd.DataFrame({"eid": [0, 1, 2], "ts": [base, base + pd.Timedelta(hours=1), base + pd.Timedelta(hours=5)]})
        right = pd.DataFrame({"wid": [7], "start": [base - pd.Timedelta(minutes=30)]})
        right["end"] = right["start"] + pd.Timedelta(hours=2)
        got = range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            left_ts="ts",
            right_start="start",
            right_end="end",
            right_keep=["wid"],
            bucket_us=3_600_000_000,
        ).to_pandas()
        assert sorted(got["eid"].astype(int)) == [0, 1]

    def test_watermark_late_split(self):
        from clawrag_ray.stages.relational import watermark_late_split

        base = pd.Timestamp("2024-03-01")
        df = pd.DataFrame({"ts": [base, base + pd.Timedelta(minutes=30), base + pd.Timedelta(minutes=100)]})
        got = watermark_late_split(ray.data.from_pandas(df), delay_minutes=60.0).to_pandas()
        got = got.sort_values("ts")
        # watermark = max - 60min = base+40min: events at base and base+30
        # are behind it (late); the max event itself never is
        assert got["is_late"].tolist() == [True, True, False]


class TestTileSweepIdOrder:
    def test_cross_block_pairs_survive_non_monotonic_ids(self):
        """A near-dup pair whose SMALLER id lives in the LATER block must
        still be found (cross tiles are computed once per unordered block
        pair — regression for the va < vb cross-tile filter bug)."""
        rng = np.random.RandomState(9)
        vecs = rng.standard_normal((40, 8))
        vecs[3] = vecs[39]  # identical pair with ids far apart
        ids = list(range(40))[::-1]  # ids strictly DECREASING across rows
        rows = [
            {"vec_id": ids[i], "embedding": vecs[i].astype(np.float32).tolist()} for i in range(40)
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
        got = embedding_near_dup_pairs(ds, threshold=0.999, num_blocks=8)
        pairs = set(zip(got["vec_a"].astype(int), got["vec_b"].astype(int)))
        assert (0, 36) in pairs  # row 3 has id 36, row 39 has id 0


class TestSemanticDedup:
    def _brute_labels(self, pairs, n):
        # union-find transitive closure, label = component min
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {i: find(i) for i in range(n)}

    def test_matches_exact_pair_graph_closure(self):
        from clawrag_ray.stages.similarity import semantic_dedup

        # three planted duplicate groups + noise vectors
        rng = np.random.RandomState(11)
        n, d = 120, 16
        vecs = rng.standard_normal((n, d))
        vecs[100] = vecs[0] + 0.001 * rng.standard_normal(d)
        vecs[101] = vecs[0] - 0.001 * rng.standard_normal(d)  # chain 0-100-101
        vecs[110] = vecs[50] + 0.001 * rng.standard_normal(d)
        rows = [{"vec_id": i, "embedding": vecs[i].astype(np.float32).tolist()} for i in range(n)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

        exact = embedding_near_dup_pairs(ds, threshold=0.99)
        labels = self._brute_labels(list(zip(exact["vec_a"], exact["vec_b"])), n)
        from collections import Counter

        sizes = Counter(labels.values())

        got = (
            semantic_dedup(ds, threshold=0.99, n_centroids=8, n_probe=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert got["cluster_id"].tolist() == [labels[i] for i in range(n)]
        assert got["cluster_size"].tolist() == [sizes[labels[i]] for i in range(n)]
        assert got["keep"].tolist() == [i == labels[i] for i in range(n)]
        # exactly one keeper per component; dup components shrank
        assert got["keep"].sum() == len(sizes)
        assert got.loc[got["vec_id"] == 101, "cluster_id"].item() == 0

    def test_no_pairs_all_singletons(self):
        from clawrag_ray.stages.similarity import semantic_dedup

        rng = np.random.RandomState(2)
        rows = [
            {"vec_id": i, "embedding": rng.standard_normal(8).astype(np.float32).tolist()}
            for i in range(30)
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = semantic_dedup(ds, threshold=0.9999, n_centroids=4).to_pandas()
        assert (got["cluster_id"] == got["vec_id"]).all()
        assert (got["cluster_size"] == 1).all()
        assert got["keep"].all()


class TestGroupedRunningSum:
    def test_matches_pandas_window(self):
        from clawrag_ray.stages.relational import grouped_running_sum

        rng = np.random.RandomState(7)
        n = 500
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 17, n),
                "o": rng.permutation(n),
                "v": rng.randint(-50, 50, n).astype("int64"),
            }
        )
        ds = ray.data.from_pandas(df).repartition(6)
        got = (
            grouped_running_sum(ds, ["k"], ["o"], "v", out_col="run")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "o"]).reset_index(drop=True)
        want["run"] = want.groupby("k")["v"].cumsum()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_tiebreak_by_secondary_order_col(self):
        from clawrag_ray.stages.relational import grouped_running_sum

        df = pd.DataFrame(
            {"k": [1, 1, 1], "t": [5, 5, 5], "i": [2, 0, 1], "v": [10, 1, 100]}
        )
        got = (
            grouped_running_sum(ray.data.from_pandas(df), ["k"], ["t", "i"], "v", out_col="run")
            .to_pandas()
            .sort_values("i")
        )
        assert got["run"].tolist() == [1, 101, 111]


class TestGroupedLag:
    def test_matches_pandas_window(self):
        from clawrag_ray.stages.relational import grouped_lag

        rng = np.random.RandomState(11)
        n = 400
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 13, n),
                "o": rng.permutation(n),
                "v": rng.randint(0, 1000, n).astype("int64"),
            }
        )
        ds = ray.data.from_pandas(df).repartition(5)
        got = (
            grouped_lag(ds, ["k"], ["o"], "v", out_col="prev")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "o"]).reset_index(drop=True)
        want["prev"] = want.groupby("k")["v"].shift(1)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_lead_negative_shift(self):
        from clawrag_ray.stages.relational import grouped_lag

        df = pd.DataFrame({"k": [1, 1, 1, 2], "o": [0, 1, 2, 0], "v": [10, 20, 30, 40]})
        got = (
            grouped_lag(ray.data.from_pandas(df), ["k"], ["o"], "v", out_col="nxt", shift=-1)
            .to_pandas()
            .sort_values(["k", "o"])
        )
        assert got["nxt"].tolist()[:2] == [20.0, 30.0]
        assert pd.isna(got["nxt"].tolist()[2]) and pd.isna(got["nxt"].tolist()[3])


class TestStatOps:
    def test_histogram_clamps_and_counts(self):
        from clawrag_ray.stages.relational import histogram_fixed_bins

        df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 2, "v": [-1.0, 0.0, 4.9, 5.0, 99.0, 100.0, 42.0]})
        got = (
            histogram_fixed_bins(ray.data.from_pandas(df).repartition(3), ["k"], "v", 0.0, 100.0, 20)
            .to_pandas()
            .sort_values(["k", "bin"])
        )
        m = {(r.k, r.bin): r.n for r in got.itertuples()}
        # -1 clamps to bin 0, 5.0 opens bin 1, 100 clamps into bin 19
        assert m == {("a", 0): 3, ("a", 1): 1, ("a", 19): 1, ("b", 19): 1, ("b", 8): 1}

    def test_grouped_mode_deterministic_ties(self):
        from clawrag_ray.stages.relational import grouped_mode

        df = pd.DataFrame({"k": [1, 1, 1, 1, 2], "v": ["b", "a", "a", "b", "z"]})
        got = grouped_mode(ray.data.from_pandas(df).repartition(2), ["k"], "v").to_pandas()
        m = {r.k: (r.v, r.n) for r in got.itertuples()}
        assert m == {1: ("a", 2), 2: ("z", 1)}  # tie 2-2 -> smallest value

    def test_zscore_matches_numpy(self):
        from clawrag_ray.stages.relational import grouped_zscore

        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {"i": range(200), "k": rng.choice(["x", "y"], 200), "v": rng.standard_normal(200) * 5 + 3}
        )
        got = (
            grouped_zscore(ray.data.from_pandas(df).repartition(4), ["k"], "v", id_cols=["i"])
            .to_pandas()
            .sort_values("i")
            .reset_index(drop=True)
        )
        want = df.copy()
        mu = want.groupby("k")["v"].transform("mean")
        sd = want.groupby("k")["v"].transform(lambda s: s.std(ddof=0))
        want_z = ((want["v"] - mu) / sd).round(4)
        assert np.allclose(got["z"], want_z, atol=2e-4)
        # constant group -> z = 0
        const = pd.DataFrame({"i": [0, 1], "k": ["c", "c"], "v": [7.0, 7.0]})
        gz = grouped_zscore(ray.data.from_pandas(const), ["k"], "v", id_cols=["i"]).to_pandas()
        assert (gz["z"] == 0.0).all()


class TestGroupedRollingSum:
    def test_matches_pandas_rolling(self):
        from clawrag_ray.stages.relational import grouped_rolling_sum

        rng = np.random.RandomState(13)
        n = 300
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 9, n),
                "o": rng.permutation(n),
                "v": rng.randint(-20, 20, n).astype("int64"),
            }
        )
        got = (
            grouped_rolling_sum(ray.data.from_pandas(df).repartition(4), ["k"], ["o"], "v", frame=4, out_col="r")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "o"]).reset_index(drop=True)
        want["r"] = (
            want.groupby("k")["v"].rolling(4, min_periods=1).sum().reset_index(level=0, drop=True).sort_index()
        )
        assert got["r"].astype("int64").tolist() == want["r"].astype("int64").tolist()


class TestFunnelConversion:
    def test_first_a_then_first_b_after(self):
        from clawrag_ray.stages.relational import funnel_conversion

        rows = [
            # u1: signup@2, purchase@1 (before -> ignored), purchase@5 -> converts at 5
            {"user_id": 1, "ts": 2, "event_type": "signup"},
            {"user_id": 1, "ts": 1, "event_type": "purchase"},
            {"user_id": 1, "ts": 5, "event_type": "purchase"},
            # u2: signup@3, no purchase after -> tb null
            {"user_id": 2, "ts": 3, "event_type": "signup"},
            {"user_id": 2, "ts": 3, "event_type": "purchase"},  # tie: strict > excludes
            # u3: purchase only -> not in output
            {"user_id": 3, "ts": 1, "event_type": "purchase"},
            # u4: two signups, purchase between them
            {"user_id": 4, "ts": 1, "event_type": "signup"},
            {"user_id": 4, "ts": 4, "event_type": "signup"},
            {"user_id": 4, "ts": 2, "event_type": "purchase"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        got = (
            funnel_conversion(ds, "signup", "purchase")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == [1, 2, 4]
        assert got["ta"].tolist() == [2, 3, 1]
        assert got["tb"].iloc[0] == 5 and pd.isna(got["tb"].iloc[1]) and got["tb"].iloc[2] == 2


class TestGroupedRank:
    def test_row_number_matches_pandas(self):
        from clawrag_ray.stages.relational import grouped_rank

        rng = np.random.RandomState(5)
        df = pd.DataFrame({"k": rng.randint(0, 7, 200), "o": rng.permutation(200)})
        got = (
            grouped_rank(ray.data.from_pandas(df).repartition(4), ["k"], ["o"], out_col="rn")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "o"]).reset_index(drop=True)
        want["rn"] = want.groupby("k").cumcount() + 1
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_ntile_matches_duckdb(self):
        import duckdb

        from clawrag_ray.stages.relational import grouped_rank

        rng = np.random.RandomState(9)
        # ragged group sizes incl. groups smaller than n_tiles
        df = pd.DataFrame({"k": rng.randint(0, 11, 137), "o": rng.permutation(137)})
        got = (
            grouped_rank(
                ray.data.from_pandas(df).repartition(3), ["k"], ["o"], out_col="t", method="ntile", n_tiles=4
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        want = duckdb.query(
            "SELECT k, o, ntile(4) OVER (PARTITION BY k ORDER BY o) AS t FROM df ORDER BY k, o"
        ).df()
        assert got["t"].astype("int64").tolist() == want["t"].astype("int64").tolist()


class TestHeavyHitters:
    def _zipf_df(self, n=20000, vocab=800, seed=3):
        rng = np.random.RandomState(seed)
        ranks = np.clip(rng.zipf(1.3, n), 1, vocab)
        return pd.DataFrame({"token": [f"w{r}" for r in ranks]})

    def test_matches_exact_topk_under_truncation(self):
        from clawrag_ray.stages.relational import heavy_hitters

        df = self._zipf_df()
        # capacity 128 << vocab 800: every block truncates, certificate
        # still holds for the skewed head (k-th count 276 > 20000/128)
        ds = ray.data.from_pandas(df).repartition(8)
        got = heavy_hitters(ds, "token", k=10, capacity=128).to_pandas()
        want = (
            df.value_counts("token")
            .reset_index(name="n")
            .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
            .head(10)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_certificate_failure_raises(self):
        from clawrag_ray.stages.relational import heavy_hitters

        # uniform keys: k-th count ~ N/vocab << N/capacity with capacity 4
        df = pd.DataFrame({"token": [f"u{i % 500}" for i in range(5000)]})
        ds = ray.data.from_pandas(df).repartition(4)
        with pytest.raises(ValueError, match="certificate"):
            heavy_hitters(ds, "token", k=10, capacity=4)
        # non-strict returns the (approximate) head instead of raising
        out = heavy_hitters(ds, "token", k=10, capacity=4, strict=False).to_pandas()
        assert len(out) <= 10


class TestRollupAggregate:
    def test_matches_manual_rollup(self):
        from clawrag_ray.stages.relational import rollup_aggregate

        df = pd.DataFrame(
            {
                "a": ["x", "x", "y", "y", "y"],
                "b": ["p", "q", "p", "p", "q"],
                "v": [1.0, 2.0, 4.0, 8.0, 16.0],
            }
        )
        got = rollup_aggregate(ray.data.from_pandas(df).repartition(3), ["a", "b"], "v").to_pandas()
        fin = got[got["b"].notna()].sort_values(["a", "b"]).reset_index(drop=True)
        assert fin["total"].tolist() == [1.0, 2.0, 12.0, 16.0]
        assert fin["n"].tolist() == [1, 1, 2, 1]
        lvl1 = got[got["b"].isna() & got["a"].notna()].sort_values("a")
        assert lvl1["total"].tolist() == [3.0, 28.0]
        assert lvl1["n"].tolist() == [2, 3]
        grand = got[got["a"].isna()]
        assert len(grand) == 1
        assert grand["total"].item() == 31.0 and grand["n"].item() == 5

    def test_cube_covers_all_subsets(self):
        from clawrag_ray.stages.relational import cube_aggregate

        df = pd.DataFrame(
            {
                "a": ["x", "x", "y", "y", "y"],
                "b": ["p", "q", "p", "p", "q"],
                "v": [1.0, 2.0, 4.0, 8.0, 16.0],
            }
        )
        got = cube_aggregate(ray.data.from_pandas(df).repartition(3), ["a", "b"], "v").to_pandas()
        # 4 finest + 2 by-a + 2 by-b + 1 grand = 9 rows
        assert len(got) == 9
        by_b = got[got["a"].isna() & got["b"].notna()].sort_values("b")
        assert by_b["total"].tolist() == [13.0, 18.0]
        assert by_b["n"].tolist() == [3, 2]
        grand = got[got["a"].isna() & got["b"].isna()]
        assert grand["total"].item() == 31.0 and grand["n"].item() == 5


class TestRetentionCohorts:
    def test_known_matrix(self):
        from clawrag_ray.stages.relational import retention_cohorts

        week = 7 * 86_400 * 1_000_000
        rows = []
        # u1 first in week 0, active weeks 0,1,3; u2 first week 1, active 1; u3 first week 0, active 0,1
        for u, wks in ((1, [0, 1, 3]), (2, [1]), (3, [0, 1])):
            for w in wks:
                rows.append({"user_id": u, "ts": w * week + u * 1000})
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": [r["user_id"] for r in rows],
                    "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
                }
            )
        ).repartition(3)
        got = retention_cohorts(ds).to_pandas()
        m = {(r.cohort_week, r.week_offset): r.n_distinct_user_id for r in got.itertuples()}
        assert m == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (1, 0): 1}


class TestValidateExpectations:
    def test_planted_violations(self):
        from clawrag_ray.stages.expectations import validate_expectations

        tbl = pa.table(
            {
                "id": pa.array([1, 2, 2, 4, None], pa.int64()),
                "v": pa.array([5, -1, 300, 10, 20], pa.int64()),
                "tag": pa.array(["a", "b", "weird", "a", "b"]),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        got = validate_expectations(
            ds,
            {
                "id": {"not_null": True, "unique": True},
                "v": {"min": 0, "max": 100},
                "tag": {"allowed": ["a", "b"]},
            },
        ).to_pandas()
        m = {(r.col, r.rule): (r.n_violations, r.passed) for r in got.itertuples()}
        assert m[("id", "not_null")] == (1, False)
        assert m[("id", "unique")] == (1, False)  # one duplicated row beyond the first
        assert m[("v", "min")] == (1, False)
        assert m[("v", "max")] == (1, False)
        assert m[("tag", "allowed")] == (1, False)

    def test_all_pass(self):
        from clawrag_ray.stages.expectations import validate_expectations

        ds = ray.data.from_pandas(pd.DataFrame({"id": [1, 2, 3]}))
        got = validate_expectations(ds, {"id": {"not_null": True, "unique": True, "min": 0}}).to_pandas()
        assert got["passed"].all() and (got["n_violations"] == 0).all()


class TestSemiAntiJoin:
    def _sides(self):
        left = ray.data.from_arrow(
            pa.table({"k": [1, 2, 3, 4, 4], "v": ["a", "b", "c", "d", "e"]})
        ).repartition(3)
        right = ray.data.from_arrow(pa.table({"rk": [2, 4, 4, 9]})).repartition(2)
        return left, right

    def test_semi_keeps_matching(self):
        from clawrag_ray.stages.relational import semi_join

        left, right = self._sides()
        got = semi_join(left, "k", right, "rk").to_pandas().sort_values(["k", "v"])
        assert list(zip(got["k"], got["v"])) == [(2, "b"), (4, "d"), (4, "e")]
        assert got["k"].dtype == "int64"  # no null-padding float-ification

    def test_anti_keeps_nonmatching(self):
        from clawrag_ray.stages.relational import anti_join

        left, right = self._sides()
        got = anti_join(left, "k", right, "rk").to_pandas().sort_values("k")
        assert list(zip(got["k"], got["v"])) == [(1, "a"), (3, "c")]

    def test_empty_results_keep_schema(self):
        # Dataset.to_pandas() drops zero-row blocks in Ray 2.49, so the
        # schema contract is asserted on the Dataset itself
        from clawrag_ray.stages.relational import anti_join, semi_join

        left, right = self._sides()
        all_match = ray.data.from_arrow(pa.table({"rk": [1, 2, 3, 4]}))
        got = anti_join(left, "k", all_match, "rk")
        assert got.count() == 0 and got.schema().names == ["k", "v"]
        none_match = ray.data.from_arrow(pa.table({"rk": [99]}))
        got2 = semi_join(left, "k", none_match, "rk")
        assert got2.count() == 0 and got2.schema().names == ["k", "v"]


class TestPageRank:
    def _edges(self):
        # 1 -> 2, 1 -> 3, 2 -> 3, 4 -> 3 (3 is a sink, 4 has no in-edges)
        return ray.data.from_arrow(
            pa.table({"src": [1, 1, 2, 4], "dst": [2, 3, 3, 3]})
        ).repartition(2)

    def test_one_iteration_hand_check(self):
        from clawrag_ray.stages.graph import pagerank

        got = pagerank(self._edges(), n_iters=1, damping=0.85).to_pandas().set_index("node")["rank"]
        # r0 = 1 everywhere; deg: 1->2, 2->1, 4->1
        assert got[4] == 0.15
        assert got[1] == 0.15
        assert got[2] == round(0.15 + 0.85 * 0.5, 6)
        assert got[3] == round(0.15 + 0.85 * (0.5 + 1.0 + 1.0), 6)

    def test_broadcast_equals_distributed(self):
        from clawrag_ray.stages.graph import pagerank

        b = pagerank(self._edges(), n_iters=3).to_pandas().sort_values("node").reset_index(drop=True)
        d = (
            pagerank(self._edges(), n_iters=3, state="distributed")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(b, d)


class TestReviewRegressions:
    def test_heavy_hitters_small_vocab_is_exact_not_error(self):
        from clawrag_ray.stages.relational import heavy_hitters

        # 10 distinct keys, k=20: no block ever truncates, so the complete
        # frequency table is provably exact and must NOT raise
        df = pd.DataFrame({"token": [f"t{i % 10}" for i in range(300)]})
        got = heavy_hitters(ray.data.from_pandas(df).repartition(3), "token", k=20).to_pandas()
        assert len(got) == 10 and (got["n"] == 30).all()

    def test_semi_anti_null_keys_sql_semantics(self):
        from clawrag_ray.stages.relational import anti_join, semi_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, None, 3], pa.int64()), "v": ["a", "b", "c"]})
        )
        right = ray.data.from_arrow(pa.table({"rk": pa.array([1, None], pa.int64())}))
        semi = semi_join(left, "k", right, "rk").to_pandas()
        anti = anti_join(left, "k", right, "rk").to_pandas()
        # NULL never equals NULL: semi keeps only k=1, anti keeps NULL and 3
        assert semi["v"].tolist() == ["a"]
        assert sorted(anti["v"]) == ["b", "c"]

    def test_expectations_unique_all_null(self):
        from clawrag_ray.stages.expectations import validate_expectations

        ds = ray.data.from_arrow(pa.table({"x": pa.array([None, None], pa.int64())}))
        got = validate_expectations(ds, {"x": {"unique": True}}).to_pandas()
        assert got["n_violations"].tolist() == [0] and got["passed"].all()

    def test_histogram_excludes_nulls(self):
        from clawrag_ray.stages.relational import histogram_fixed_bins

        tbl = pa.table({"k": ["a"] * 4, "v": pa.array([1.0, None, 99.0, None], pa.float64())})
        got = histogram_fixed_bins(ray.data.from_arrow(tbl), ["k"], "v", 0.0, 100.0, 10).to_pandas()
        assert got["n"].sum() == 2  # the two nulls carry no bin

    def test_cube_keeps_null_key_groups(self):
        from clawrag_ray.stages.relational import cube_aggregate

        df = pd.DataFrame({"a": ["x", None, None], "b": ["p", "p", "q"], "v": [1.0, 2.0, 4.0]})
        got = cube_aggregate(ray.data.from_pandas(df), ["a", "b"], "v").to_pandas()
        # by-a level must keep the NULL-a group so level sums equal the total
        by_a = got[got["b"].isna()]
        grand = by_a[by_a["a"].isna()]["total"]
        # rows: (x, None)=1, (None, None) appears twice — as the NULL-a
        # group (6.0) and as the grand total (7.0)
        assert sorted(by_a["total"]) == [1.0, 6.0, 7.0]
        assert 7.0 in set(grand)

    def test_bloom_anti_join_int_keys(self):
        from clawrag_ray.stages.dedup import _splitmix64, bloom_anti_join

        new = ray.data.from_arrow(pa.table({"id": list(range(100, 140)), "key": list(range(0, 40))}))
        seen = ray.data.from_arrow(pa.table({"key": list(range(0, 25))}))
        got = bloom_anti_join(new.repartition(3), seen.repartition(2), "key").to_pandas()
        assert sorted(got["key"]) == list(range(25, 40))
        # the second hash must decorrelate from h1 (hash_array ignores
        # hash_key for ints — the mixer provides independence)
        h1 = pd.util.hash_array(np.arange(64, dtype="int64"), hash_key="clawrag_bloom_k1")
        assert not np.array_equal(_splitmix64(h1) | np.uint64(1), h1 | np.uint64(1))

    def test_sampled_prefix_sum_monotone_block_layout(self):
        from clawrag_ray.stages.curation import global_prefix_sum

        # ids ascending across blocks — the layout that biased limit()
        ids = np.arange(300)
        vals = (ids % 7 + 1).astype("int64")
        ds = ray.data.from_pandas(pd.DataFrame({"id": ids, "v": vals})).repartition(6)
        got = global_prefix_sum(ds, "id", "v", num_buckets=8, boundaries="sampled").to_pandas()
        want = np.cumsum(vals) - vals
        assert got.sort_values("id")["cum_before"].tolist() == want.tolist()


class TestLabelCentroids:
    def test_matches_numpy_groupwise_mean(self):
        from clawrag_ray.stages.similarity import label_centroids

        rng = np.random.RandomState(6)
        vecs = rng.standard_normal((120, 8))
        labels = rng.randint(0, 4, 120)
        rows = [
            {"label": int(labels[i]), "embedding": vecs[i].astype(np.float32).tolist()}
            for i in range(120)
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
        got = label_centroids(ds).to_pandas()
        v32 = vecs.astype(np.float32).astype(np.float64)
        for lab in range(4):
            want = np.round(v32[labels == lab].mean(axis=0), 6)
            g = got[got["label"] == lab].sort_values("dim")
            assert np.allclose(g["mean_val"].to_numpy(), want, atol=1e-6)
        assert got["dim"].min() == 1 and got["dim"].max() == 8


class TestAdviceRegressions:
    """Round-4 advisory fixes: null partition keys through the window ops,
    sentinel-valued keys through heavy_hitters, nullable unique columns
    through validate_expectations, deterministic bounded sampling."""

    def _events(self):
        # user 'b' is NULL in two rows — SQL PARTITION BY groups nulls together
        return ray.data.from_arrow(
            pa.table(
                {
                    "user": pa.array(["a", None, "a", None, "c"], pa.string()),
                    "ts": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
                }
            )
        ).repartition(2)

    def test_running_sum_null_keys(self):
        from clawrag_ray.stages.relational import grouped_running_sum

        got = grouped_running_sum(self._events(), ["user"], ["ts"], "v", out_col="run").to_pandas()
        null_rows = got[got["user"].isna()].sort_values("ts")
        assert null_rows["run"].tolist() == [20.0, 60.0]
        a_rows = got[got["user"] == "a"].sort_values("ts")
        assert a_rows["run"].tolist() == [10.0, 40.0]

    def test_grouped_rank_null_keys(self):
        from clawrag_ray.stages.relational import grouped_rank

        got = grouped_rank(self._events(), ["user"], ["ts"], out_col="rnk").to_pandas()
        assert len(got) == 5  # no rows dropped, no length-mismatch crash
        null_rows = got[got["user"].isna()].sort_values("ts")
        assert null_rows["rnk"].tolist() == [1, 2]

    def test_grouped_lag_null_keys(self):
        from clawrag_ray.stages.relational import grouped_lag

        got = grouped_lag(self._events(), ["user"], ["ts"], "v", out_col="prev").to_pandas()
        null_rows = got[got["user"].isna()].sort_values("ts")
        assert null_rows["prev"].isna().tolist() == [True, False]
        assert null_rows["prev"].tolist()[1] == 20.0

    def test_heavy_hitters_sentinel_keys_excluded(self):
        from clawrag_ray.stages.relational import heavy_hitters

        keys = [""] * 50 + ["x"] * 5 + ["y"] * 3 + ["z"]
        ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.string())})).repartition(3)
        got = heavy_hitters(ds, "k", k=3, capacity=16).to_pandas()
        # '' never appears as a result key and never inflates N
        assert "" not in set(got["k"])
        assert got.sort_values("n", ascending=False)["k"].tolist() == ["x", "y", "z"]

    def test_expectations_unique_on_nullable_string(self):
        from clawrag_ray.stages.expectations import validate_expectations

        ds = ray.data.from_arrow(
            pa.table({"s": pa.array(["p", None, "p", None, "q"], pa.string())})
        ).repartition(2)
        got = validate_expectations(ds, {"s": {"unique": True}}).to_pandas()
        row = got[(got["col"] == "s") & (got["rule"] == "unique")].iloc[0]
        # nulls excluded: 3 non-null values, 2 distinct -> 1 duplicate
        assert int(row["n_violations"]) == 1 and not bool(row["passed"])

    def test_bounded_sample_membership_ignores_block_order(self):
        from clawrag_ray.stages.similarity import _bounded_sample

        rng = np.random.RandomState(3)
        vecs = rng.standard_normal((300, 8)).astype(np.float32)
        rows = [{"embedding": v.tolist()} for v in vecs]
        a = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(6)
        b = ray.data.from_arrow(pa.Table.from_pylist(rows[::-1])).repartition(6)
        sa = _bounded_sample(a, 64)
        sb = _bounded_sample(b, 64)
        # same corpus, reversed row order and different blocks -> same matrix
        assert np.allclose(sa, sb)


class TestRangeAndRankWindows:
    def test_range_sum_includes_peers_and_window_edge(self, ray_session):
        from clawrag_ray.stages.relational import grouped_range_sum

        # ts in plain int64 "microseconds"; window = 10us
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": ["a"] * 5,
                    "ts": pa.array([0, 5, 5, 11, 30], pa.int64()),
                    "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
                }
            )
        ).repartition(2)
        got = (
            grouped_range_sum(ds, ["u"], "ts", "v", preceding_us=10, out_col="s")
            .to_pandas()
            .sort_values("ts")
        )
        # peers at ts=5 both see 1+2+3; ts=11 window [1,11] -> 2+3+4;
        # ts=30 window [20,30] -> itself only
        assert got["s"].tolist() == [1.0, 6.0, 6.0, 9.0, 5.0]

    def test_cume_dist_and_percent_rank_ties(self, ray_session):
        from clawrag_ray.stages.relational import grouped_rank

        ds = ray.data.from_arrow(
            pa.table({"k": ["x"] * 4, "v": pa.array([10.0, 20.0, 20.0, 40.0])})
        ).repartition(2)
        pr = grouped_rank(ds, ["k"], ["v"], out_col="r", method="percent_rank").to_pandas()
        cd = grouped_rank(ds, ["k"], ["v"], out_col="r", method="cume_dist").to_pandas()
        assert sorted(pr.sort_values("v")["r"].tolist()) == sorted([0.0, 1 / 3, 1 / 3, 1.0])
        assert sorted(cd.sort_values("v")["r"].tolist()) == sorted([0.25, 0.75, 0.75, 1.0])

    def test_percent_rank_single_row_group(self, ray_session):
        from clawrag_ray.stages.relational import grouped_rank

        ds = ray.data.from_arrow(pa.table({"k": ["solo"], "v": [7.0]}))
        got = grouped_rank(ds, ["k"], ["v"], out_col="r", method="percent_rank").to_pandas()
        assert got["r"].tolist() == [0.0]


class TestGroupedCorr:
    def test_matches_numpy_corrcoef(self, ray_session):
        from clawrag_ray.stages.relational import grouped_corr

        rng = np.random.RandomState(11)
        x = rng.standard_normal(400)
        y = 0.6 * x + 0.4 * rng.standard_normal(400)
        t = pa.table(
            {
                "k": pa.array(["a"] * 200 + ["b"] * 200),
                "x": pa.array(np.concatenate([x[:200], x[200:]])),
                "y": pa.array(np.concatenate([y[:200], -y[200:]])),
            }
        )
        got = grouped_corr(ray.data.from_arrow(t).repartition(4), ["k"], "x", "y").to_pandas()
        ra = np.corrcoef(x[:200], y[:200])[0, 1]
        rb = np.corrcoef(x[200:], -y[200:])[0, 1]
        assert abs(got.set_index("k").loc["a", "corr"] - round(ra, 6)) < 2e-6
        assert abs(got.set_index("k").loc["b", "corr"] - round(rb, 6)) < 2e-6

    def test_zero_variance_is_null(self, ray_session):
        from clawrag_ray.stages.relational import grouped_corr

        t = pa.table({"k": ["c"] * 3, "x": [1.0, 1.0, 1.0], "y": [1.0, 2.0, 3.0]})
        got = grouped_corr(ray.data.from_arrow(t), ["k"], "x", "y").to_pandas()
        assert got["corr"].isna().all()


class TestCovarianceAndPCA:
    def test_covariance_matches_numpy(self, ray_session):
        from clawrag_ray.stages.similarity import embedding_covariance

        rng = np.random.RandomState(5)
        vm = rng.standard_normal((300, 8))
        rows = [{"vec_id": i, "embedding": vm[i].tolist()} for i in range(300)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
        got = embedding_covariance(ds)
        want = np.cov(vm, rowvar=False, bias=True)
        for i, j, c in zip(got["i"], got["j"], got["cov"]):
            assert abs(c - round(want[i, j], 6)) < 2e-6

    def test_pca_projection_matches_local(self, ray_session):
        from clawrag_ray.stages.similarity import pca_project

        rng = np.random.RandomState(7)
        base = rng.standard_normal((200, 2)) @ rng.standard_normal((2, 8)) * 3
        vm = base + 0.01 * rng.standard_normal((200, 8))
        rows = [{"vec_id": i, "embedding": vm[i].tolist()} for i in range(200)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
        got = pca_project(ds, k=2).to_pandas().sort_values("vec_id")
        proj = np.stack([np.asarray(p) for p in got["pca"]])
        # top-2 axes capture nearly all variance of the rank-2 data
        total_var = vm.var(axis=0, ddof=0).sum()
        centered = proj - proj.mean(axis=0)
        assert centered.var(axis=0, ddof=0).sum() / total_var > 0.99
        # deterministic across layouts
        got2 = pca_project(ds.repartition(9), k=2).to_pandas().sort_values("vec_id")
        proj2 = np.stack([np.asarray(p) for p in got2["pca"]])
        assert np.allclose(proj, proj2, atol=1e-9)

    def test_entropy_uniform_and_point_mass(self, ray_session):
        from clawrag_ray.stages.relational import grouped_entropy

        rows = [("u1", t) for t in ["a", "b", "c", "d"]] + [("u2", "a")] * 5
        ds = ray.data.from_arrow(
            pa.table({"u": [r[0] for r in rows], "t": [r[1] for r in rows]})
        ).repartition(2)
        got = grouped_entropy(ds, ["u"], "t").to_pandas().set_index("u")
        assert abs(got.loc["u1", "entropy"] - round(np.log(4), 6)) < 1e-9
        assert got.loc["u2", "entropy"] == 0.0


class TestKMeansFit:
    def test_matches_local_lloyd_and_layout_invariant(self, ray_session):
        from clawrag_ray.stages.similarity import kmeans_fit

        rng = np.random.RandomState(13)
        vm = np.concatenate(
            [rng.standard_normal((60, 6)) + off for off in (0.0, 4.0, -4.0)]
        )
        rows = [{"vec_id": i, "embedding": vm[i].tolist()} for i in range(len(vm))]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
        got = kmeans_fit(ds, k=3, n_iters=4)
        # local replay
        cents = vm[:3].copy()
        for _ in range(4):
            d2 = ((vm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(3):
                m = vm[a == c]
                if len(m):
                    cents[c] = m.mean(axis=0)
        want = np.round(cents.reshape(-1), 6)
        assert np.array_equal(got.sort_values(["cluster", "dim"])["mean_val"].to_numpy(), want)
        got2 = kmeans_fit(ds.repartition(9), k=3, n_iters=4)
        assert got.equals(got2)


class TestRuntimeFilteredJoin:
    def test_equals_plain_hash_join(self, ray_session):
        from clawrag_ray.stages.relational import hash_join, runtime_filtered_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array(list(range(200)), pa.int64()), "v": pa.array(range(200))})
        ).repartition(4)
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array([5, 17, 42, 99, 150], pa.int64()), "w": pa.array([1, 2, 3, 4, 5])})
        )
        a = (
            runtime_filtered_join(left, right, on="k", right_on="rk", num_partitions=4)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        b = (
            hash_join(left, right, on="k", right_on="rk", num_partitions=4)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert set(a["k"]) == {5, 17, 42, 99, 150}


class TestSaltedJoin:
    def _data(self):
        # key 7 holds 60% of the left side (the skew case)
        lk = [7] * 120 + list(range(100, 180))
        left = ray.data.from_arrow(
            pa.table({"k": pa.array(lk, pa.int64()), "v": pa.array(range(len(lk)))})
        ).repartition(5)
        right = ray.data.from_arrow(
            pa.table(
                {"rk": pa.array([7, 100, 150, 999], pa.int64()), "w": pa.array([10, 20, 30, 40])}
            )
        )
        return left, right

    def test_explicit_hot_keys_equal_plain_join(self, ray_session):
        from clawrag_ray.stages.relational import hash_join, salted_join

        left, right = self._data()
        a = (
            salted_join(left, right, on="k", right_on="rk", hot_keys=[7], salt=4)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        b = (
            hash_join(left, right, on="k", right_on="rk")
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert (a["k"] == 7).sum() == 120  # hot key joined exactly once per left row

    def test_auto_detect_hot_keys(self, ray_session):
        from clawrag_ray.stages.relational import hash_join, salted_join

        left, right = self._data()
        a = (
            salted_join(left, right, on="k", right_on="rk", salt=4)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        b = (
            hash_join(left, right, on="k", right_on="rk")
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestFirstLastAndConcat:
    def _events(self):
        import numpy as np

        rng = np.random.default_rng(7)
        n = 4000
        return pd.DataFrame(
            {
                "user_id": rng.integers(0, 60, n),
                "ts": rng.integers(0, 10**9, n),
                "event_id": np.arange(n, dtype=np.int64),
                "event_type": rng.choice(list("abcde"), n),
            }
        )

    def test_first_last_matches_pandas(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import grouped_first_last

        df = self._events()
        out = (
            grouped_first_last(rd.from_pandas(df).repartition(9), ["user_id"], ["ts", "event_id"], "event_type")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        s = df.sort_values(["ts", "event_id"], kind="mergesort")
        exp = (
            s.groupby("user_id")
            .agg(
                first_event_type=("event_type", "first"),
                last_event_type=("event_type", "last"),
                n=("event_type", "size"),
            )
            .reset_index()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp, check_dtype=False)

    def test_single_row_groups(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import grouped_first_last

        df = pd.DataFrame({"k": [1, 2], "o": [5, 3], "v": ["x", "y"]})
        out = grouped_first_last(rd.from_pandas(df).repartition(2), ["k"], ["o"], "v").to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        assert out["first_v"].tolist() == ["x", "y"]
        assert out["last_v"].tolist() == ["x", "y"]
        assert out["n"].tolist() == [1, 1]

    def test_ordered_concat_limit_equals_unlimited_head(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import grouped_ordered_concat

        df = self._events()
        out = (
            grouped_ordered_concat(
                rd.from_pandas(df).repartition(9), ["user_id"], ["ts", "event_id"], "event_type", sep=">", limit=6
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        s = df.sort_values(["ts", "event_id"], kind="mergesort")
        exp = (
            s.groupby("user_id")["event_type"]
            .apply(lambda x: ">".join(x.head(6)))
            .reset_index(name="path")
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["user_id", "path"]], exp, check_dtype=False)

    def test_ordered_concat_full(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import grouped_ordered_concat

        df = self._events().head(300)
        out = (
            grouped_ordered_concat(rd.from_pandas(df).repartition(4), ["user_id"], ["ts", "event_id"], "event_type")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        s = df.sort_values(["ts", "event_id"], kind="mergesort")
        exp = (
            s.groupby("user_id")["event_type"]
            .apply(lambda x: ">".join(x))
            .reset_index(name="path")
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["user_id", "path"]], exp, check_dtype=False)


class TestDenseRank:
    def test_matches_pandas_desc_with_ties(self, ray_session):
        import numpy as np
        import ray.data as rd

        from clawrag_ray.stages.relational import grouped_rank

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 20, 2000),
                "v": rng.integers(0, 15, 2000).astype(float),  # heavy ties
                "id": np.arange(2000, dtype=np.int64),
            }
        )
        out = (
            grouped_rank(rd.from_pandas(df).repartition(7), ["k"], ["v"], out_col="dr", method="dense_rank", ascending=False)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        exp = df.copy()
        exp["dr"] = exp.groupby("k")["v"].rank(method="dense", ascending=False).astype("int64")
        assert out.set_index("id")["dr"].equals(exp.set_index("id")["dr"])


class TestCmsCounts:
    def test_exact_regime(self, ray_session):
        import numpy as np
        import ray.data as rd

        from clawrag_ray.stages.relational import cms_counts

        rng = np.random.default_rng(11)
        df = pd.DataFrame({"t": rng.choice(["a", "b", "c", "d", "e"], 5000)})
        out = cms_counts(rd.from_pandas(df).repartition(8), "t", width=2048, depth=4).to_pandas()
        exp = df.groupby("t").size().reset_index(name="cnt")
        merged = out.merge(exp, on="t", suffixes=("_est", "_true"))
        assert (merged["cnt_est"] == merged["cnt_true"]).all()

    def test_sketch_regime_overcount_bound(self, ray_session):
        import numpy as np
        import ray.data as rd

        from clawrag_ray.stages.relational import cms_counts

        rng = np.random.default_rng(5)
        n, width = 20000, 64
        df = pd.DataFrame({"t": rng.integers(0, 2000, n).astype(str)})  # distinct >> width
        out = cms_counts(rd.from_pandas(df).repartition(8), "t", width=width, depth=4).to_pandas()
        exp = df.groupby("t").size().reset_index(name="true")
        merged = out.merge(exp, on="t")
        # CMS never undercounts
        assert (merged["cnt"] >= merged["true"]).all()
        # standard guarantee: err <= 2N/width with prob 1-2^-depth per key;
        # assert the 99th percentile of errors stays under that epsilon
        err = (merged["cnt"] - merged["true"]).to_numpy()
        assert np.quantile(err, 0.99) <= 2 * n / width


class TestPivotMeltSetOps:
    def test_pivot_counts_matches_pandas(self, ray_session):
        import numpy as np
        import ray.data as rd

        from clawrag_ray.stages.relational import pivot_counts

        rng = np.random.default_rng(2)
        df = pd.DataFrame({"k": rng.integers(0, 30, 3000), "t": rng.choice(list("abcd"), 3000)})
        out = (
            pivot_counts(rd.from_pandas(df).repartition(7), ["k"], "t", ["a", "b", "c"])
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        exp = (
            df[df["t"].isin(["a", "b", "c"])]
            .pivot_table(index="k", columns="t", values="t", aggfunc="size", fill_value=0)
            .reindex(columns=["a", "b", "c"], fill_value=0)
            .reset_index()
        )
        exp.columns = ["k", "n_a", "n_b", "n_c"]
        pd.testing.assert_frame_equal(out, exp.sort_values("k").reset_index(drop=True), check_dtype=False)

    def test_pivot_sum_values(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import pivot_counts

        df = pd.DataFrame({"k": [1, 1, 2], "t": ["a", "b", "a"], "v": [2.0, 3.0, 5.0]})
        out = (
            pivot_counts(rd.from_pandas(df).repartition(2), ["k"], "t", ["a", "b"], value_col="v", prefix="sum_")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out["sum_a"].tolist() == [2.0, 5.0]
        assert out["sum_b"].tolist() == [3.0, 0.0]

    def test_melt_roundtrip_shape(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import melt

        df = pd.DataFrame({"id": [1, 2], "x": [1.5, 2.5], "y": [3.0, 4.0]})
        out = melt(rd.from_pandas(df), ["id"], ["x", "y"]).to_pandas()
        exp = df.melt(id_vars="id", value_vars=["x", "y"], var_name="metric", value_name="value")
        out = out.sort_values(["id", "metric"]).reset_index(drop=True)
        exp = exp.sort_values(["id", "metric"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp, check_dtype=False)

    def test_except_and_intersect_distinct(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import except_distinct, intersect_distinct

        left = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2, 3, 4, 4]})).repartition(3)
        right = rd.from_pandas(pd.DataFrame({"r": [2, 4, 5]})).repartition(2)
        ex = sorted(except_distinct(left, "k", right, "r").to_pandas()["k"].tolist())
        assert ex == [1, 3]
        it = sorted(intersect_distinct(left, "k", right, "r").to_pandas()["k"].tolist())
        assert it == [2, 4]

    def test_except_empty_result_keeps_schema(self, ray_session):
        import ray.data as rd

        from clawrag_ray.stages.relational import except_distinct

        left = rd.from_pandas(pd.DataFrame({"k": [1, 2]}))
        right = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
        out = except_distinct(left, "k", right)
        assert out.count() == 0
        assert "k" in [f for f in out.schema().names]


class TestIntervalUnionLength:
    def test_merge_overlaps_and_ties(self, ray_session):
        from clawrag_ray.stages.relational import interval_union_length

        # u1: [0,10) + [5,20) -> 20; disjoint [30,31) -> 21
        # u2: containment [0,100) + [10,20) -> 100
        # u3: exact-tie starts [0,5) + [0,9) -> 9
        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
                "s": pa.array([0, 5, 30, 0, 10, 0, 0], pa.int64()),
                "e": pa.array([10, 20, 31, 100, 20, 5, 9], pa.int64()),
            }
        )
        got = (
            interval_union_length(ray.data.from_arrow(t).repartition(3), "k", "s", "e")
            .to_pandas()
            .set_index("k")["covered"]
            .to_dict()
        )
        assert got == {1: 21, 2: 100, 3: 9}


class TestTriangleCounts:
    def _k4_edges(self):
        # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 5
        # and a duplicate + reversed + self-loop to exercise canonicalization
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (2, 1), (3, 3)]
        return pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )

    def test_k4_hand_checked(self, ray_session):
        from clawrag_ray.stages.graph import triangle_counts

        got = (
            triangle_counts(ray.data.from_arrow(self._k4_edges()).repartition(2), num_partitions=4)
            .to_pandas()
            .set_index("node")["n_tri"]
            .to_dict()
        )
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # pendant 5 absent

    def test_broadcast_equals_distributed(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.graph import triangle_counts

        rng = np.random.RandomState(7)
        n = 300
        src = rng.randint(0, 40, size=n).astype(np.int64)
        dst = rng.randint(0, 40, size=n).astype(np.int64)
        e = ray.data.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})).repartition(3)
        a = (
            triangle_counts(e, num_partitions=4, state="broadcast")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        b = (
            triangle_counts(e, num_partitions=4, state="distributed")
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # brute force on the canonical simple graph
        edges = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
        from collections import Counter

        want = Counter()
        es = sorted(edges)
        eset = set(es)
        nodes = sorted({x for p in es for x in p})
        for i, x in enumerate(nodes):
            for y in [v for (u, v) in es if u == x]:
                for z in [v for (u, v) in es if u == y]:
                    if (x, z) in eset:
                        want[x] += 1
                        want[y] += 1
                        want[z] += 1
        assert a.set_index("node")["n_tri"].to_dict() == dict(want)


class TestSortedNeighborhoodPairs:
    def test_window_pairs_across_bucket_boundary(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import sorted_neighborhood_pairs

        n, w, bs = 40, 3, 8  # 5 buckets: boundary carries exercised
        ids = np.arange(100, 100 + n, dtype=np.int64)
        order = ((ids * 37) % 1000) * 1000 + ids  # scrambled but unique
        t = pa.table({"id": pa.array(ids), "o": pa.array(order)})
        got = (
            sorted_neighborhood_pairs(
                ray.data.from_arrow(t).repartition(4), "o", "id", window=w, bucket_size=bs, num_partitions=4
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        srt = ids[np.argsort(order)]
        want = sorted(
            (int(srt[i]), int(srt[i + j]), j)
            for i in range(n)
            for j in range(1, w + 1)
            if i + j < n
        )
        assert list(map(tuple, got[["id_a", "id_b", "gap"]].to_numpy())) == want

    def test_window_guard(self, ray_session):
        import pytest as _pytest

        from clawrag_ray.stages.relational import sorted_neighborhood_pairs

        t = pa.table({"id": pa.array([1], pa.int64()), "o": pa.array([1], pa.int64())})
        with _pytest.raises(ValueError):
            sorted_neighborhood_pairs(ray.data.from_arrow(t), "o", "id", window=8, bucket_size=8)


class TestGroupedRunningDistinct:
    def test_novelty_curve(self, ray_session):
        from clawrag_ray.stages.relational import grouped_running_distinct

        t = pa.table(
            {
                "u": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                "v": ["a", "b", "a", "c", "x", "x"],
                "o": pa.array([10, 20, 30, 40, 5, 6], pa.int64()),
            }
        )
        got = (
            grouped_running_distinct(
                ray.data.from_arrow(t).repartition(3), "u", "v", "o", num_partitions=4
            )
            .to_pandas()
            .sort_values(["u", "o"])
        )
        assert got["n_distinct_so_far"].tolist() == [1, 2, 2, 3, 1, 1]


class TestGroupedWelchTtest:
    def test_matches_scipy_formula(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import grouped_welch_ttest

        rng = np.random.RandomState(3)
        va = rng.normal(10.0, 2.0, 40)
        vb = rng.normal(8.5, 3.0, 25)
        t = pa.table(
            {
                "k": ["x"] * 65 + ["only_a"] * 3,
                "arm": ["a"] * 40 + ["b"] * 25 + ["a"] * 3,
                "v": pa.array(np.concatenate([va, vb, [1.0, 2.0, 3.0]]), pa.float64()),
            }
        )
        got = grouped_welch_ttest(
            ray.data.from_arrow(t).repartition(3), "k", "arm", "v", "a", "b"
        ).to_pandas()
        # key missing arm b is excluded
        assert got["k"].tolist() == ["x"]
        ma, mb = va.mean(), vb.mean()
        sa, sb = va.var(ddof=1), vb.var(ddof=1)
        want_t = (ma - mb) / np.sqrt(sa / len(va) + sb / len(vb))
        assert got["n_a"].iloc[0] == 40 and got["n_b"].iloc[0] == 25
        assert abs(got["mean_diff"].iloc[0] - round(ma - mb, 6)) < 1e-9
        assert abs(got["t_welch"].iloc[0] - want_t) < 1e-5


class TestGroupedRollingAnomaly:
    def test_spike_flagged(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import grouped_rolling_anomaly

        vals = [10.0] * 10 + [10.2] * 10 + [500.0] + [10.1] * 5
        t = pa.table(
            {
                "u": pa.array([1] * len(vals), pa.int64()),
                "v": pa.array(vals, pa.float64()),
                "o": pa.array(range(len(vals)), pa.int64()),
            }
        )
        got = (
            grouped_rolling_anomaly(
                ray.data.from_arrow(t).repartition(2), "u", "v", "o", window=10, k=3.0, num_partitions=4
            )
            .to_pandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
        flagged = got[got["anomaly"]]["o"].tolist()
        assert 20 in flagged            # the 500.0 spike vs its PRECEDING window
        assert 0 not in flagged         # cold start never flags
        assert 21 in flagged or got.loc[21, "roll_std"] > 0  # spike now in 21's window
        # pandas replay: mean of up to 10 PRECEDING rows
        import pandas as pd

        vc = pd.Series(np.floor(np.array(vals) * 100).astype("int64"))
        rm = vc.shift(1).rolling(10, min_periods=1).mean()
        assert np.allclose(
            got["roll_mean"].to_numpy(), np.round(rm.to_numpy(), 6), equal_nan=True
        )


class TestFunnelSteps:
    def test_three_step_cascade(self, ray_session):
        from clawrag_ray.stages.relational import funnel_steps

        rows = [
            # u1 completes A(1) -> B(3) -> C(5); B at t=0 (before A) ignored
            (1, 0, "B"), (1, 1, "A"), (1, 3, "B"), (1, 5, "C"),
            # u2 signs up, clicks, never purchases
            (2, 10, "A"), (2, 11, "B"),
            # u3: C before B-after-A chain -> drops at step 3
            (3, 20, "A"), (3, 19, "C"), (3, 22, "B"),
            # u4 never does A -> absent entirely
            (4, 30, "B"), (4, 31, "C"),
        ]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": [r[2] for r in rows],
            }
        )
        got = (
            funnel_steps(
                ray.data.from_arrow(t).repartition(3), ["A", "B", "C"], num_partitions=4
            )
            .to_pandas()
            .sort_values("user_id")
            .set_index("user_id")
        )
        assert got.index.tolist() == [1, 2, 3]
        assert got.loc[1].tolist() == [1, 3, 5]
        assert got.loc[2, "ts_1"] == 10 and got.loc[2, "ts_2"] == 11 and pd.isna(got.loc[2, "ts_3"])
        assert got.loc[3, "ts_1"] == 20 and got.loc[3, "ts_2"] == 22 and pd.isna(got.loc[3, "ts_3"])


class TestPersonalizedPagerank:
    def test_seed_proximity_and_zero_far_nodes(self, ray_session):
        from clawrag_ray.stages.graph import pagerank

        # chain 1 -> 2 -> 3, isolated 4 -> 5; seed = {1}
        t = pa.table(
            {
                "src": pa.array([1, 2, 4], pa.int64()),
                "dst": pa.array([2, 3, 5], pa.int64()),
            }
        )
        got = (
            pagerank(ray.data.from_arrow(t), n_iters=3, damping=0.85, ndigits=8, seeds=[1])
            .to_pandas()
            .set_index("node")["rank"]
        )
        # hand-computed: r(1)=0.15 after iter1 stays 0.15 (no in-edges);
        # r(2)=0.85*r(1); r(3)=0.85*r(2); nodes 4,5 get zero mass
        assert abs(got.loc[1] - 0.15) < 1e-8
        assert abs(got.loc[2] - 0.85 * 0.15) < 1e-8
        assert abs(got.loc[3] - 0.85 * 0.85 * 0.15) < 1e-8
        assert got.loc[4] == 0.0 and got.loc[5] == 0.0

    def test_unseeded_unchanged(self, ray_session):
        from clawrag_ray.stages.graph import pagerank

        t = pa.table({"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 1], pa.int64())})
        a = pagerank(ray.data.from_arrow(t), n_iters=2).to_pandas().set_index("node")["rank"]
        # symmetric 2-cycle: both nodes settle at the same value
        assert a.loc[1] == a.loc[2] and a.loc[1] > 0.9


class TestZorderKeys:
    def test_interleave_and_locality(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import zorder_keys

        t = pa.table(
            {
                "x": pa.array([0, 1, 0b1010, 65535], pa.int64()),
                "y": pa.array([0, 1, 0b0101, 65535], pa.int64()),
            }
        )
        got = zorder_keys(ray.data.from_arrow(t), "x", "y", bits=16).to_pandas()

        # reference interleave: x on even bits, y on odd bits
        def morton(x, y):
            z = 0
            for k in range(16):
                z |= ((x >> k) & 1) << (2 * k)
                z |= ((y >> k) & 1) << (2 * k + 1)
            return z

        assert got["z"].tolist() == [morton(0, 0), morton(1, 1), morton(0b1010, 0b0101), morton(65535, 65535)]
        # locality: nearby (x, y) points differ in fewer high bits than far ones
        near = morton(100, 100) ^ morton(101, 101)
        far = morton(100, 100) ^ morton(40000, 40000)
        assert near.bit_length() < far.bit_length()


class TestGroupedCusum:
    def test_reflection_equals_recurrence(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import grouped_cusum

        rng = np.random.RandomState(2)
        vals = np.concatenate([rng.uniform(8, 12, 30), rng.uniform(18, 22, 10)])  # level shift
        t = pa.table(
            {
                "u": pa.array([1] * len(vals), pa.int64()),
                "v": pa.array(vals, pa.float64()),
                "o": pa.array(range(len(vals)), pa.int64()),
            }
        )
        got = (
            grouped_cusum(ray.data.from_arrow(t).repartition(2), "u", "v", "o", num_partitions=4)
            .to_pandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
        # sequential recurrence replay
        vc = np.floor(vals * 100).astype("int64")
        mu = vc.sum() // len(vc)
        s, want = 0, []
        for v in vc:
            s = max(0, s + int(v - mu - 50))
            want.append(s)
        assert got["cusum"].tolist() == want
        # the level shift raises an alarm in the tail, none in the head
        assert not got["alarm"][:25].any() and got["alarm"][35:].all()


class TestGroupedMannWhitney:
    def test_matches_scipy_definition(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import grouped_mannwhitney

        rng = np.random.RandomState(4)
        va = np.round(rng.uniform(5, 15, 30), 2)
        vb = np.round(rng.uniform(3, 12, 20), 2)
        t = pa.table(
            {
                "k": ["x"] * 50,
                "arm": ["a"] * 30 + ["b"] * 20,
                "v": pa.array(np.concatenate([va, vb]), pa.float64()),
            }
        )
        got = grouped_mannwhitney(
            ray.data.from_arrow(t).repartition(3), "k", "arm", "v", "a", "b"
        ).to_pandas()
        # brute force: U = # (a > b) pairs + 0.5 * # ties (on cents)
        ca = np.floor(va * 100).astype(int)
        cb = np.floor(vb * 100).astype(int)
        gt = sum((x > y) for x in ca for y in cb)
        eq = sum((x == y) for x in ca for y in cb)
        want_u = gt + 0.5 * eq
        assert got["u_stat"].iloc[0] == want_u
        assert abs(got["auc"].iloc[0] - round(want_u / (30 * 20), 6)) < 1e-12
        # perfect separation: AUC = 1
        t2 = pa.table(
            {
                "k": ["y"] * 4,
                "arm": ["a", "a", "b", "b"],
                "v": pa.array([10.0, 11.0, 1.0, 2.0], pa.float64()),
            }
        )
        g2 = grouped_mannwhitney(ray.data.from_arrow(t2), "k", "arm", "v", "a", "b").to_pandas()
        assert g2["auc"].iloc[0] == 1.0


class TestSessionizeIncremental:
    def test_boundary_stitching_and_equality(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import sessionize, sessionize_incremental

        base = pd.Timestamp("2024-01-01")
        rows = []
        # u1: one 6-event session spanning every batch boundary (5-min gaps)
        rows += [(1, base + pd.Timedelta(minutes=5 * i)) for i in range(6)]
        # u2: two sessions split by a 2h gap
        rows += [(2, base + pd.Timedelta(minutes=m)) for m in (0, 10, 140, 150, 155)]
        # u3: appears only in the last slice
        rows += [(3, base + pd.Timedelta(minutes=27))]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        one = sessionize(ds, num_partitions=4).to_pandas().sort_values("user_id").reset_index(drop=True)
        for nb in (2, 5):
            inc = (
                sessionize_incremental(ds, n_batches=nb, num_partitions=4)
                .to_pandas()
                .sort_values("user_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(one, inc, check_dtype=False)
        # the spanning session counts ONCE with all 6 events
        u1 = one[one.user_id == 1].iloc[0]
        assert u1["n_sessions"] == 1 and u1["longest_session_events"] == 6


class TestScd2Enrich:
    def test_versions_gap_and_open_end(self, ray_session):
        from clawrag_ray.stages.relational import scd2_enrich

        T = pd.Timestamp("2024-06-01")
        facts = ray.data.from_arrow(
            pa.table(
                {
                    "fid": pa.array([1, 2, 3, 4], pa.int64()),
                    "k": pa.array([7, 7, 7, 7], pa.int64()),
                    "ts": pa.array(
                        [
                            T + pd.Timedelta(hours=1),   # inside v0
                            T + pd.Timedelta(hours=13),  # validity gap -> NULL
                            T + pd.Timedelta(days=2),    # inside open-ended v1
                            T - pd.Timedelta(hours=1),   # before any version -> NULL
                        ],
                        pa.timestamp("us"),
                    ),
                }
            )
        ).repartition(2)
        dim = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([7, 7], pa.int64()),
                    "valid_from": pa.array(
                        [T.to_pydatetime(), (T + pd.Timedelta(days=1)).to_pydatetime()],
                        pa.timestamp("us"),
                    ),
                    "valid_to": pa.array(
                        [(T + pd.Timedelta(hours=12)).to_pydatetime(), None], pa.timestamp("us")
                    ),
                    "attr": ["old", "new"],
                }
            )
        )
        got = (
            scd2_enrich(facts, dim, "k", "ts", ["attr"], num_partitions=4)
            .to_pandas()
            .sort_values("fid")
        )
        assert got["attr"].tolist() == ["old", None, "new", None]


class TestIntervalOverlapJoin:
    def test_exactly_once_across_buckets(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import interval_overlap_join

        B = 100  # tiny buckets so spans cross many
        t = pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "s": pa.array([0, 50, 410, 1000], pa.int64()),
                "e": pa.array([500, 450, 420, 1100], pa.int64()),
            }
        )
        got = (
            interval_overlap_join(
                ray.data.from_arrow(t).repartition(2), "id", "s", "e", bucket_us=B, num_partitions=4
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        # expected: (1,2) overlap 400, (1,3) overlap 10, (2,3) overlap 10;
        # 4 overlaps nothing; every pair appears exactly once despite
        # spanning multiple buckets
        assert list(map(tuple, got.to_numpy())) == [(1, 2, 400), (1, 3, 10), (2, 3, 10)]

    def test_empty_and_inverted_intervals_dropped(self, ray_session):
        from clawrag_ray.stages.relational import interval_overlap_join

        t = pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "s": pa.array([0, 50, 70, 300], pa.int64()),
                "e": pa.array([500, 50, 30, 400], pa.int64()),  # 2 empty, 3 inverted
            }
        )
        got = (
            interval_overlap_join(
                ray.data.from_arrow(t), "id", "s", "e", bucket_us=100, num_partitions=4
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        # degenerate rows crash nothing and pair with nothing
        assert list(map(tuple, got.to_numpy())) == [(1, 4, 100)]

    def test_dense_bucket_sweep_equals_merge(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import interval_overlap_join

        rng = np.random.RandomState(11)
        n = 600
        # one long bucket (bucket_us huge) holding every interval: dense path
        s = rng.randint(0, 10_000, size=n).astype(np.int64)
        e = s + rng.randint(1, 60, size=n)
        t = pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "s": pa.array(s),
                "e": pa.array(e),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        kw = dict(bucket_us=1_000_000, num_partitions=4)
        merge = (
            interval_overlap_join(ds, "id", "s", "e", dense_bucket_threshold=10**9, **kw)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        sweep = (
            interval_overlap_join(ds, "id", "s", "e", dense_bucket_threshold=8, **kw)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        assert len(merge) > 100  # the fixture actually generates overlap mass
        pd.testing.assert_frame_equal(merge, sweep)

    def test_dense_bucket_sweep_multi_bucket(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.relational import interval_overlap_join

        rng = np.random.RandomState(7)
        n = 400
        s = rng.randint(0, 3_000, size=n).astype(np.int64)
        e = s + rng.randint(1, 900, size=n)  # spans cross buckets (bucket=500)
        t = pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "s": pa.array(s),
                "e": pa.array(e),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        kw = dict(bucket_us=500, num_partitions=4)
        merge = (
            interval_overlap_join(ds, "id", "s", "e", dense_bucket_threshold=10**9, **kw)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        sweep = (
            interval_overlap_join(ds, "id", "s", "e", dense_bucket_threshold=16, **kw)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(merge, sweep)
