"""Similarity search over an embedding column (list<float>).

Two paths (the training-data-pipeline ANN suite):
  * brute_force_topk — exact cosine top-k: the query matrix is broadcast
    once via ray.put; every batch does one numpy matmul against it and
    emits only its LOCAL top-k per query (k rows per query per batch), so
    the final global reduce is tiny. This is the correctness baseline.
  * lsh_topk — random-hyperplane LSH bucketing: vectors are bucketed by
    sign-pattern once; queries probe only their own (and neighboring
    Hamming-1) buckets. The scale path: candidate set shrinks by ~2^bits.
  * embedding_near_dup_pairs — exact near-duplicate pairs above a cosine
    threshold via a distributed block-pair tile sweep (object-store block
    refs, one task per tile — no driver-side matrix); its scale companion
    embedding_near_dup_pairs_lsh prunes candidates with banded hyperplane
    LSH before the same exact verification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def _stack(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy where arrow
    allows; otherwise one contiguous copy per batch)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BatchTopK:
    """Actor-pool stage: local cosine top-k per query against one batch.

    Query matrix fetched from the object store once per actor."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)  # dict: query_id -> vector
        self.query_ids = list(q.keys())
        self.qm = _normalize(np.array(list(q.values()), dtype=np.float64))  # (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vm = _normalize(_stack(batch["embedding"]))  # (n, d)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.qm @ vm.T  # (nq, n)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k] if k < sims.shape[1] else np.tile(
            np.arange(sims.shape[1]), (sims.shape[0], 1)
        )
        for qi, qid in enumerate(self.query_ids):
            for vi in idx[qi]:
                out_q.append(qid)
                out_v.append(int(vec_ids[vi]))
                out_s.append(float(sims[qi, vi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(
    ds: Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Exact global top-k: per-batch local top-k (distributed) then a
    driver-side reduce over k*n_batches rows (small). Returns
    (query_id, vec_id, cosine rounded to 6) sorted by rank."""
    ref = ray.put(queries)
    local = ds.select_columns(["vec_id", "embedding"]).map_batches(
        BatchTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
    df = local.to_pandas()
    df = (
        df.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    df["cosine"] = df["cosine"].round(6)
    return df


def lsh_bucket_table(ds: Dataset, n_bits: int = 8, seed: int = 11, concurrency=(1, 8)) -> Dataset:
    """Adds an LSH bucket id: sign pattern of n_bits random hyperplanes
    (seeded, broadcast via closure constants — a few KB)."""

    class Bucketer:
        def __init__(self):
            rng = np.random.RandomState(seed)
            self.planes = None
            self.rng = rng

        def __call__(self, batch: pa.Table) -> pa.Table:
            vm = _stack(batch["embedding"])
            if self.planes is None:
                self.planes = np.random.RandomState(seed).standard_normal((vm.shape[1], n_bits))
            signs = (vm @ self.planes) > 0
            buckets = signs @ (1 << np.arange(n_bits))
            return batch.append_column("lsh_bucket", pa.array(buckets.astype(np.int32)))

    return ds.map_batches(Bucketer, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True)


def lsh_topk(
    ds: Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 11,
    probe_hamming: int = 1,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Approximate top-k: probe only buckets within Hamming distance
    ``probe_hamming`` of each query's bucket. Same output schema as
    brute_force_topk (recall < 1 by design)."""
    from itertools import combinations

    bucketed = lsh_bucket_table(ds, n_bits=n_bits, seed=seed, concurrency=concurrency)
    planes = np.random.RandomState(seed).standard_normal((len(next(iter(queries.values()))), n_bits))
    probe: set[int] = set()
    for v in queries.values():
        b = int(((np.asarray(v, dtype=np.float64) @ planes) > 0) @ (1 << np.arange(n_bits)))
        # probe every bucket within the full Hamming radius (flip each
        # subset of up to ``probe_hamming`` bits)
        for r in range(probe_hamming + 1):
            for bits in combinations(range(n_bits), r):
                flip = 0
                for i in bits:
                    flip |= 1 << i
                probe.add(b ^ flip)

    def keep_probed(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch["lsh_bucket"], value_set=pa.array(sorted(probe), pa.int32()))
        return batch.filter(mask)

    candidates = bucketed.map_batches(keep_probed, batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(candidates, queries, k=k, concurrency=concurrency)


def kmeans_centroids(
    ds: Dataset,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 13,
    sample_limit: int = 4096,
    concurrency=None,
) -> np.ndarray:
    """Deterministic coarse k-means (the IVF quantizer trainer).

    Trains on a BOUNDED driver-side sample (_bounded_sample — per-block
    evenly-spaced picks, never the full corpus and never limit()'s
    execution-order-dependent membership) with local numpy Lloyd
    iterations: the quantizer is a few KB of state and a sample trains it
    as well as the corpus does (the FAISS recipe), while distributed Lloyd
    costs one full dataset execution per iteration (measured 9.3 s -> ~2 s
    end-to-end for ivf_topk). Assignment of the full corpus stays
    distributed (ivf_assign)."""
    sample = _bounded_sample(ds, sample_limit)
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    centroids = _normalize(centroids)
    for _ in range(n_iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        new = centroids.copy()
        for cell in range(len(centroids)):
            members = sample[assign == cell]
            if len(members):
                new[cell] = members.mean(axis=0)
        centroids = _normalize(new)
    return centroids


def ivf_assign(ds: Dataset, centroids: np.ndarray, concurrency=(1, 8)) -> Dataset:
    """Adds an ``ivf_cell`` column: index of the nearest (cosine) centroid."""
    ref = ray.put(centroids)

    class Assigner:
        def __init__(self):
            self.c = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vm = _normalize(_stack(batch["embedding"]))
            assign = np.argmax(vm @ self.c.T, axis=1).astype(np.int32)
            return batch.append_column("ivf_cell", pa.array(assign))

    return ds.map_batches(Assigner, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True)


def ivf_topk(
    ds: Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 13,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """IVF approximate top-k (the scale path next to lsh_topk): train a
    coarse quantizer, bucket every vector into its nearest-centroid cell,
    and scan only the union of each query's ``n_probe`` nearest cells with
    the exact brute-force kernel. Same output schema as brute_force_topk;
    recall < 1 by design (cells outside the probe set are never scanned)."""
    centroids = kmeans_centroids(ds, n_centroids=n_centroids, seed=seed, concurrency=concurrency)
    bucketed = ivf_assign(ds, centroids, concurrency=concurrency)
    qm = _normalize(np.array(list(queries.values()), dtype=np.float64))
    sims = qm @ centroids.T  # (nq, n_centroids)
    probe: set[int] = set()
    for qi in range(sims.shape[0]):
        order = np.argsort(-sims[qi])[: min(n_probe, sims.shape[1])]
        probe.update(int(c) for c in order)

    def keep_probed(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch["ivf_cell"], value_set=pa.array(sorted(probe), pa.int32()))
        return batch.filter(mask)

    candidates = bucketed.map_batches(keep_probed, batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(candidates, queries, k=k, concurrency=concurrency)


def _bounded_sample(ds: Dataset, sample_limit: int) -> np.ndarray:
    """Bounded, execution-order-independent normalized sample matrix (the
    kmeans_centroids sampling contract, factored for PQ training).

    Membership comes from PER-BLOCK evenly-spaced row picks (the
    global_prefix_sum boundaries='sampled' pattern), NOT Dataset.limit():
    limit() reads whichever blocks execute first, so the sample SET would
    depend on block layout — the post-hoc lexsort can only fix ordering,
    not membership. Each block contributes <= per_block rows; the final
    lexsort + cap makes the matrix deterministic given the corpus."""
    per_block = max(8, sample_limit // 64)

    def block_sample(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.select(["embedding"])
        idx = np.unique(np.linspace(0, n - 1, min(per_block, n)).astype(np.int64))
        return b.select(["embedding"]).take(pa.array(idx))

    sample = _stack(
        pa.array(
            ds.select_columns(["embedding"])
            .map_batches(block_sample, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .to_pandas()["embedding"]
            .tolist()
        )
    )
    sample = sample[np.lexsort(sample.T[::-1])][:sample_limit]
    return _normalize(sample)


def pq_train_codebooks(
    ds: Dataset,
    m: int = 8,
    n_codes: int = 32,
    n_iters: int = 5,
    seed: int = 17,
    sample_limit: int = 4096,
) -> np.ndarray:
    """Product-quantization codebooks (m, n_codes, d/m): independent
    Lloyd k-means per subspace over the bounded sample (the FAISS
    IndexPQ trainer shape — a few KB of state; the corpus never
    participates in training, only in distributed encoding)."""
    sample = _bounded_sample(ds, sample_limit)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        k = min(n_codes, len(sub))
        cents = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        if k < n_codes:  # tiny corpora: pad with repeats so codes stay uint8-dense
            cents = np.concatenate([cents, np.repeat(cents[:1], n_codes - k, axis=0)])
        books[j] = cents
    return books


def pq_encode(ds: Dataset, centroids: np.ndarray, books: np.ndarray, concurrency=(1, 8)) -> Dataset:
    """Distributed IVF-PQ encoding: (vec_id, ivf_cell, m uint8 codes) —
    the compressed representation the ADC scan reads; the float vectors
    never leave this stage."""
    cref, bref = ray.put(centroids), ray.put(books)

    class Encoder:
        def __init__(self):
            self.c = ray.get(cref)
            self.b = ray.get(bref)  # (m, n_codes, dsub)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vm = _normalize(_stack(batch["embedding"]))
            cell = np.argmax(vm @ self.c.T, axis=1).astype(np.int32)
            m, _, dsub = self.b.shape
            codes = np.empty((len(vm), m), dtype=np.uint8)
            for j in range(m):
                sub = vm[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - self.b[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "ivf_cell": pa.array(cell),
                    "codes": pa.array(list(codes), pa.list_(pa.uint8())),
                }
            )

    return ds.map_batches(Encoder, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True)


def ivf_pq_topk(
    ds: Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 32,
    refine: int = 4,
    seed: int = 13,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """IVF-PQ approximate top-k — the MEMORY scale path next to ivf_topk:
    vectors compress to m uint8 codes (64x for d=64 float32), the probe
    scan reads only (vec_id, cell, codes) via per-query ADC lookup tables
    (sum of m table hits, no float vectors touched), and the exact kernel
    rescans just the top k*refine ADC candidates per query for the final
    ranking. At 10^12 vectors the code table is what fits in cluster RAM;
    the raw vectors stay in cold storage and surface only for the
    refine-candidate fetch. Output schema matches brute_force_topk;
    recall < 1 by design (quantization + probe pruning)."""
    centroids = kmeans_centroids(ds, n_centroids=n_centroids, seed=seed, concurrency=concurrency)
    books = pq_train_codebooks(ds, m=m, n_codes=n_codes, seed=seed + 4)
    encoded = pq_encode(ds, centroids, books, concurrency=concurrency)

    qm = _normalize(np.array(list(queries.values()), dtype=np.float64))
    query_ids = list(queries.keys())
    sims = qm @ centroids.T
    probe: set[int] = set()
    for qi in range(sims.shape[0]):
        for c in np.argsort(-sims[qi])[: min(n_probe, sims.shape[1])]:
            probe.add(int(c))
    # per-query ADC tables: dot(query_sub, code_sub) per (subspace, code)
    m_, n_codes_, dsub = books.shape
    luts = np.einsum("qjd,jcd->qjc", qm.reshape(len(qm), m_, dsub), books)

    lut_ref = ray.put((query_ids, luts))
    n_cand = k * refine

    class ADCScan:
        def __init__(self):
            self.query_ids, self.luts = ray.get(lut_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.compute.is_in(batch["ivf_cell"], value_set=pa.array(sorted(probe), pa.int32()))
            batch = batch.filter(mask)
            if not batch.num_rows:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "adc": pa.array([], pa.float64())}
                )
            codes = np.stack(batch["codes"].to_numpy(zero_copy_only=False))  # (n, m)
            vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            cols = np.arange(codes.shape[1])
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                scores = self.luts[qi][cols[None, :], codes].sum(axis=1)  # (n,)
                kk = min(n_cand, len(scores))
                idx = np.argpartition(-scores, kth=kk - 1)[:kk] if kk < len(scores) else np.arange(len(scores))
                out_q.extend([qid] * kk)
                out_v.extend(int(v) for v in vec_ids[idx])
                out_s.extend(float(s) for s in scores[idx])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "adc": pa.array(out_s, pa.float64()),
                }
            )

    local = encoded.map_batches(ADCScan, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True)
    cand = (
        local.to_pandas()
        .sort_values(["query_id", "adc", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(n_cand)
    )
    cand_ids = ray.put(pa.array(np.unique(cand["vec_id"].to_numpy()), pa.int64()))

    def keep_candidates(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.is_in(batch["vec_id"], value_set=ray.get(cand_ids)))

    survivors = ds.map_batches(keep_candidates, batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(survivors, queries, k=k, concurrency=concurrency)


def _block_pair_hits(ta: pa.Table, tb: pa.Table, threshold: float, same: bool) -> pa.Table:
    """Pairs (vec_a < vec_b, cosine >= threshold) between two vector blocks
    — one bounded matmul; only the qualifying pairs come back.

    Diagonal tiles keep the upper triangle (va < vb drops self-pairs and
    halves duplicates); CROSS tiles are computed once per unordered block
    pair, so every hit is kept and normalized to (min, max) — filtering
    va < vb there would silently drop pairs whenever ids are not
    block-monotonic (tile (j, i) is never computed)."""
    ids_a = ta["vec_id"].to_numpy(zero_copy_only=False)
    ids_b = tb["vec_id"].to_numpy(zero_copy_only=False)
    ma = _normalize(_stack(ta["embedding"]))
    mb = ma if same else _normalize(_stack(tb["embedding"]))
    sims = ma @ mb.T
    ai, bi = np.where(sims >= threshold)
    va, vb = ids_a[ai], ids_b[bi]
    cs = sims[ai, bi]
    if same:
        keep = va < vb
        va, vb, cs = va[keep], vb[keep], cs[keep]
    else:
        lo = np.minimum(va, vb)
        hi = np.maximum(va, vb)
        keep = lo != hi  # same id in both blocks (duplicated row) is a self-pair
        va, vb, cs = lo[keep], hi[keep], cs[keep]
    return pa.table(
        {
            "vec_a": pa.array(va.astype(np.int64)),
            "vec_b": pa.array(vb.astype(np.int64)),
            "cosine": pa.array(np.round(cs, 6)),
        }
    )


def embedding_near_dup_pairs(
    ds: Dataset, threshold: float = 0.9, num_blocks: int | None = None, concurrency=None
) -> pd.DataFrame:
    """All (vec_a < vec_b) pairs with cosine >= threshold — EXACT, with no
    driver-side matrix materialization: the dataset is repartitioned into B
    blocks held in the object store (to_arrow_refs — refs only, zero-copy),
    and one Ray task per block pair (i <= j) computes that tile of the
    similarity matrix. Memory per task = two blocks; the driver only ever
    sees qualifying pairs. The O(n^2/B^2)-per-task tile sweep is the exact
    baseline; at corpus scale use embedding_near_dup_pairs_lsh, which prunes
    candidates with banded hyperplane LSH before this same exact kernel.

    (``concurrency`` kept for API compatibility; tile tasks schedule like
    any Ray tasks.)"""
    blocks = ds.select_columns(["vec_id", "embedding"]).repartition(num_blocks or 8).to_arrow_refs()

    @ray.remote
    def tile(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        return _block_pair_hits(ta, tb, threshold, same)

    futures = [
        tile.remote(blocks[i], blocks[j], i == j)
        for i in range(len(blocks))
        for j in range(i, len(blocks))
    ]
    tables = [t for t in ray.get(futures) if t.num_rows]
    if not tables:
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    out = pa.concat_tables(tables).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_near_dup_pairs_ivf(
    ds: Dataset,
    threshold: float = 0.9,
    n_centroids: int = 32,
    n_probe: int = 3,
    seed: int = 13,
    num_partitions: int = 64,
    concurrency=None,
    as_dataset: bool = False,
) -> "pd.DataFrame | Dataset":
    """Near-dup pairs via a DATA-DEPENDENT partitioner — the scale path for
    corpora whose embeddings are correlated (same-vocabulary documents,
    random-pair cosine ~0.57), where hyperplane LSH degenerates (measured
    102 s vs 6.4 s at sf0.1): a coarse k-means quantizer adapts its cells
    to the corpus's correlation structure, so near-identical vectors land
    in the same cell regardless of how correlated the bulk is.

    Pipeline: train centroids on a bounded sample (kmeans_centroids), then
    MULTI-assign every vector to its ``n_probe`` nearest cells (replication
    factor n_probe), compute exact within-cell pairs (one numpy matmul per
    cell task), and drop cross-cell duplicate pairs with a hash-partitioned
    pass. Output schema identical to embedding_near_dup_pairs.

    Recall: a qualifying pair is found iff the two vectors share at least
    one assigned cell. At high thresholds the two vectors are within
    arccos(t) of each other (18° at t=0.95), so their centroid preference
    lists agree near the top; multi-probe (n_probe>=2) covers boundary
    splits. This is the standard IVF recall argument, not a proof — the
    suite pins equality against the exact tile sweep at test scale
    (tests/test_similarity_and_relational.py), and ``n_probe`` is the
    recall knob. Total work is sum(|cell|^2) ~= n_probe^2 * n^2 /
    n_centroids for balanced cells: size ``n_centroids`` ~ sqrt(n) (the
    standard IVF rule) so per-cell work stays bounded as the corpus grows —
    no stage does O(n^2) total work at that sizing."""
    centroids = kmeans_centroids(ds, n_centroids=n_centroids, seed=seed, concurrency=concurrency)
    cref = ray.put(centroids)

    class MultiAssign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vm = _normalize(_stack(batch["embedding"]))
            sims = vm @ self.c.T  # (n, k)
            m = min(n_probe, sims.shape[1])
            top = np.argpartition(-sims, kth=m - 1, axis=1)[:, :m]
            idx = np.repeat(np.arange(batch.num_rows), m)
            t = batch.take(pa.array(idx, pa.int64()))
            return t.append_column("cell", pa.array(top.reshape(-1).astype(np.int32)))

    assigned = ds.select_columns(["vec_id", "embedding"]).map_batches(
        MultiAssign, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency or (1, 8)
    )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        vm = _normalize(np.array(g["embedding"].tolist(), dtype=np.float64))
        sims = vm @ vm.T
        ai, bi = np.where(sims >= threshold)
        keep = ids[ai] < ids[bi]  # upper triangle by id: drops self + mirror
        va, vb, cs = ids[ai][keep], ids[bi][keep], sims[ai, bi][keep]
        return pd.DataFrame(
            {"vec_a": va.astype("int64"), "vec_b": vb.astype("int64"), "cosine": np.round(cs, 6)}
        )

    pairs = assigned.groupby("cell").map_groups(per_cell, batch_format="pandas")
    # cross-cell duplicates (both vectors multi-assigned to >=2 shared
    # cells) carry identical rounded cosine — one hash-partitioned dedup
    from clawrag_ray.stages.relational import hash_partitioned_groups

    deduped = hash_partitioned_groups(
        pairs, ["vec_a", "vec_b"], lambda g: g.drop_duplicates(subset=["vec_a", "vec_b"]), num_partitions=num_partitions
    )
    if as_dataset:
        # composition path (semantic_dedup): the verified pair set stays a
        # Dataset — at high duplication rates it is NOT driver-bounded
        return deduped
    out = deduped.to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_near_dup_pairs_lsh(
    ds: Dataset,
    threshold: float = 0.9,
    n_tables: int = 36,
    bits_per_table: int = 16,
    seed: int = 17,
    max_bucket_size: int = 1024,
    concurrency=None,
) -> pd.DataFrame:
    """Near-dup pairs via banded random-hyperplane LSH pruning — the scale
    path: vectors emit one (table_id, bucket) row per LSH table; bucket
    groupbys produce candidate pairs; candidates are verified exactly
    against the candidate vectors only (broadcast bounded by candidates).

    Recall: two vectors at cosine t agree on one hyperplane bit with
    p = 1 - arccos(t)/pi, so a pair is missed with (1 - p^r)^L; at the
    default r=16, L=36 and t=0.95 (p≈0.90) the miss probability is ~7e-4.
    r is deliberately LARGE: on corpora whose vectors are correlated
    (e.g. same-vocabulary documents, random-pair cosine ~0.57 ⇒ per-bit
    agreement ~0.69) a short band puts most of the corpus in a handful of
    buckets and the candidate set degenerates toward n^2 (measured: 6-bit
    bands stalled the pair-dedup shuffle at 5k docs). ``max_bucket_size``
    bounds the worst case regardless: oversized buckets are dropped (their
    pairs are recovered by the other L-1 tables with high probability —
    the standard LSH cap). Pruning still weakens as the threshold drops —
    for thresholds below ~0.7 prefer the exact tile sweep
    (embedding_near_dup_pairs)."""
    from ray.data.aggregate import AggregateFn, Count

    dim = len(ds.select_columns(["embedding"]).limit(1).to_pandas()["embedding"].iloc[0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, dim, bits_per_table))
    planes_ref = ray.put(planes)

    class BandRows:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vm = _stack(batch["embedding"])
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            tables = []
            weights = 1 << np.arange(bits_per_table)
            for t in range(n_tables):
                buckets = ((vm @ self.planes[t]) > 0) @ weights
                tables.append(
                    pa.table(
                        {
                            "vec_id": pa.array(vids.astype(np.int64)),
                            "table_id": pa.array(np.full(len(vids), t, dtype=np.int32)),
                            "bucket": pa.array(buckets.astype(np.int32)),
                        }
                    )
                )
            return pa.concat_tables(tables)

    bands = ds.select_columns(["vec_id", "embedding"]).map_batches(
        BandRows, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency or (1, 8)
    )
    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        name="vec_ids",
        accumulate_block=lambda a, block: a + block["vec_id"].to_pylist(),
    )
    buckets = bands.groupby(["table_id", "bucket"]).aggregate(collect)

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for ids in batch["vec_ids"].to_pylist():
            if len(ids) < 2 or len(ids) > max_bucket_size:
                continue
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table({"vec_a": pa.array(out_a, pa.int64()), "vec_b": pa.array(out_b, pa.int64())})

    pairs = (
        buckets.map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None)
        .groupby(["vec_a", "vec_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    # DISTRIBUTED exact verify: the candidate pair set is NOT
    # driver-bounded (a short band on a correlated corpus can emit near-n^2
    # candidates), so each leg's vector rides a keyed join instead of a
    # driver dict; the cosine is a vectorized row-wise dot per partition.
    from clawrag_ray.stages.dedup import _keyed_join

    # vectors ride the join as packed float64 BYTES: binary scalars survive
    # the join's pandas round-trip losslessly (list/tensor columns do not —
    # empty partitions re-infer their type) and decode with one frombuffer
    def _packed(key_out: str, emb_out: str):
        def pack(b: pa.Table) -> pa.Table:
            packed = [
                np.asarray(v, dtype=np.float64).tobytes() for v in b["embedding"].to_pylist()
            ]
            return pa.table({key_out: b["vec_id"], emb_out: pa.array(packed, pa.binary())})

        return pack

    vec_a_side = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _packed("__va", "emb_a"), batch_format="pyarrow", zero_copy_batch=True
    )
    vec_b_side = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _packed("__vb", "emb_b"), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = _keyed_join(pairs, "vec_a", vec_a_side, "__va", ["emb_a"])
    joined = _keyed_join(joined, "vec_b", vec_b_side, "__vb", ["emb_b"])

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ma = _normalize(np.stack([np.frombuffer(x, dtype=np.float64) for x in b["emb_a"].to_pylist()]))
        mb = _normalize(np.stack([np.frombuffer(x, dtype=np.float64) for x in b["emb_b"].to_pylist()]))
        cos = np.round((ma * mb).sum(axis=1), 6)
        keep = cos >= threshold
        return pa.table(
            {
                "vec_a": pa.array(b["vec_a"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)),
                "vec_b": pa.array(b["vec_b"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def semantic_dedup(
    ds: Dataset,
    threshold: float = 0.95,
    n_centroids: int = 32,
    n_probe: int = 3,
    id_col: str = "vec_id",
    num_partitions: int = 64,
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    group items whose embeddings are near-identical (cosine >= threshold)
    and keep ONE representative per semantic-duplicate component. Pairs
    come from the IVF-cell-bucketed generator (data-dependent cells — the
    scale path for correlated corpora, no O(n^2) stage), components from
    the distributed min-label contraction, labels via keyed joins — the
    same composition contract as near_dup_clusters, over embeddings
    instead of shingles.

    Keeper rule: deterministic min-id per component (SemDeDup proper keeps
    the item with lowest centroid similarity; min-id is the reproducible
    variant this engine standardizes on — swap the rule in the final map).
    Output: (id, cluster_id, cluster_size, keep)."""
    from clawrag_ray.stages.dedup import label_clusters

    # pairs remain a DATASET end-to-end (as_dataset=True): the verified
    # pair set is duplication-proportional, not driver-bounded, so it must
    # never materialize on the driver — label_clusters consumes it
    # distributed, exactly like near_dup_clusters' MinHash pairs
    verified = embedding_near_dup_pairs_ivf(
        ds,
        threshold=threshold,
        n_centroids=n_centroids,
        n_probe=n_probe,
        num_partitions=num_partitions,
        as_dataset=True,
    ).select_columns(["vec_a", "vec_b"])
    labeled = label_clusters(
        ds.select_columns([id_col]),
        verified,
        id_col=id_col,
        a_col="vec_a",
        b_col="vec_b",
        num_partitions=num_partitions,
    )

    def add_keep(b: pa.Table) -> pa.Table:
        return b.append_column("keep", pa.compute.equal(b[id_col], b["cluster_id"]))

    return labeled.map_batches(add_keep, batch_format="pyarrow", zero_copy_batch=True)


def label_centroids(ds: Dataset, label_col: str = "label", ndigits: int = 6) -> Dataset:
    """Per-label mean embedding (class prototypes / cluster centers) as a
    LONG (label, dim, mean) table — the vector aggregate under prototype
    classifiers, centroid-seeded clustering, and drift monitors. Each
    block folds its vectors into per-label (sum-vector, count) partials
    (one numpy add.at pass — label-cardinality x d state per block), so
    the shuffle carries partial centroids, never vectors. The division
    happens once on the label-sized reduce."""
    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        vm = _stack(b["embedding"]).astype(np.float64)
        labels = b[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), vm.shape[1]))
        np.add.at(sums, inv, vm)
        counts = np.bincount(inv, minlength=len(uniq)).astype("int64")
        return pa.table(
            {
                label_col: pa.array(uniq),
                "psum": pa.array(list(sums), pa.list_(pa.float64())),
                "pn": pa.array(counts, pa.int64()),
            }
        )

    partials = ds.select_columns([label_col, "embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # label-sized: reduce driver-side (the rollup bounded-driver contract)
    df = partials.to_pandas()
    out_l, out_d, out_m = [], [], []
    for lab, g in df.groupby(label_col, sort=True):
        total = np.sum(np.stack([np.asarray(v) for v in g["psum"]]), axis=0)
        n = int(g["pn"].sum())
        mean = np.round(total / n, ndigits)
        out_l.extend([lab] * len(mean))
        out_d.extend(range(1, len(mean) + 1))
        out_m.extend(mean.tolist())
    return rd.from_pandas(
        pd.DataFrame(
            {
                label_col: np.asarray(out_l),
                "dim": pd.array(out_d, dtype="int64"),
                "mean_val": out_m,
            }
        )
    )


def embedding_covariance(
    ds: Dataset, dims: int | None = None, id_col: str = "vec_id", ndigits: int = 6
) -> "pd.DataFrame":
    """Population covariance of embedding dimensions as a LONG
    (i, j, cov) upper-triangle table — the building block under
    distributed PCA / whitening / drift monitors. Pure partial-aggregate
    shape: every block folds its vectors into (n, Σx, Σxxᵀ) with one
    matmul (d + d² numbers per block — the only thing leaving workers);
    the driver reduce is d²-sized. cov_ij = Σx_i x_j / n − x̄_i x̄_j.

    ``dims`` restricts to the first ``dims`` components (oracle-friendly
    scoping); None uses the full dimension."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        vm = _stack(b["embedding"]).astype(np.float64)
        if dims is not None:
            vm = vm[:, :dims]
        s = vm.sum(axis=0)
        ss = vm.T @ vm
        return pa.table(
            {
                "n": pa.array([vm.shape[0]], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.float64())),
                "ss": pa.array([ss.reshape(-1).tolist()], pa.list_(pa.float64())),
            }
        )

    parts = ds.select_columns(["embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()  # one row per block: d²-sized, never corpus-sized
    n = int(parts["n"].sum())
    d = len(parts["s"].iloc[0])
    s = np.sum(np.stack([np.asarray(v) for v in parts["s"]]), axis=0)
    ss = np.sum(np.stack([np.asarray(v) for v in parts["ss"]]), axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    iu, ju = np.triu_indices(d)
    return pd.DataFrame(
        {
            "i": pd.array(iu, dtype="int64"),
            "j": pd.array(ju, dtype="int64"),
            "cov": np.round(cov[iu, ju], ndigits),
        }
    )


def pca_project(
    ds: Dataset, k: int = 8, id_col: str = "vec_id", concurrency=(1, 8)
) -> Dataset:
    """Distributed PCA projection: train the k principal axes from the
    covariance partials (driver-side eigh of the d×d matrix — d² state,
    never corpus-sized), then project every vector with one broadcast
    matmul map. Deterministic: eigenvectors sign-fixed so the largest-
    magnitude component of each axis is positive. Output:
    (id, pca: list<float64> length k)."""
    import ray

    cov_long = embedding_covariance(ds, ndigits=12)
    d = int(cov_long["i"].max()) + 1
    cov = np.zeros((d, d))
    cov[cov_long["i"], cov_long["j"]] = cov_long["cov"]
    cov = cov + np.triu(cov, 1).T
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    axes = v[:, order]
    # deterministic sign: flip each axis so its max-|component| entry > 0
    flip = np.sign(axes[np.abs(axes).argmax(axis=0), np.arange(axes.shape[1])])
    axes = axes * np.where(flip == 0, 1.0, flip)
    aref = ray.put(axes)

    class Project:
        def __init__(self):
            self.axes = ray.get(aref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vm = _stack(b["embedding"]).astype(np.float64)
            proj = vm @ self.axes
            return pa.table(
                {id_col: b[id_col], "pca": pa.array([r.tolist() for r in proj], pa.list_(pa.float64()))}
            )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        Project, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )


def kmeans_fit(
    ds: Dataset,
    k: int = 4,
    n_iters: int = 3,
    id_col: str = "vec_id",
    ndigits: int = 6,
) -> "pd.DataFrame":
    """TRUE distributed Lloyd k-means (unlike kmeans_centroids' bounded-
    sample trainer, every iteration scans the full corpus): init = the k
    vectors with the smallest ids (deterministic, SQL-mirrorable); each
    iteration broadcasts the k×d centroid matrix, assigns every vector
    map-only (argmin squared distance, ties to the lowest cluster id) and
    folds per-block (sum-vector, count) partials — k×d numbers per block,
    the only shuffle traffic — reduced driver-side to the next centroids.
    Empty clusters keep their previous centroid. Returns the long
    (cluster, n, dim, mean_val) table after ``n_iters``."""
    import ray

    init = (
        ds.select_columns([id_col, "embedding"]).sort(id_col).limit(k).to_pandas()
    )
    centroids = np.stack([np.asarray(v, dtype=np.float64) for v in init["embedding"]])
    counts = np.zeros(len(centroids), dtype=np.int64)

    for _ in range(n_iters):
        cref = ray.put(centroids)

        def partial(b: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            vm = _stack(b["embedding"]).astype(np.float64)
            # squared distance: argmin equals sqrt-distance argmin
            d2 = ((vm[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # numpy picks the FIRST (lowest id) on ties
            sums = np.zeros_like(c)
            np.add.at(sums, assign, vm)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cl": pa.array(np.arange(len(c)), pa.int64()),
                    "s": pa.array([r.tolist() for r in sums], pa.list_(pa.float64())),
                    "n": pa.array(cnt, pa.int64()),
                }
            )

        parts = (
            ds.select_columns(["embedding"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .to_pandas()
        )  # k rows per block
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for cl, s, n in zip(parts["cl"], parts["s"], parts["n"]):
            sums[cl] += np.asarray(s)
            counts[cl] += int(n)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    iu = np.repeat(np.arange(k), centroids.shape[1])
    dims = np.tile(np.arange(1, centroids.shape[1] + 1), k)
    return pd.DataFrame(
        {
            "cluster": pd.array(iu, dtype="int64"),
            "n": pd.array(counts[iu], dtype="int64"),
            "dim": pd.array(dims, dtype="int64"),
            "mean_val": np.round(centroids.reshape(-1), ndigits),
        }
    )


def label_centroid_similarity(ds: Dataset, label_col: str = "label", ndigits: int = 6) -> Dataset:
    """Pairwise cosine similarity between class centroids — the confusion
    /drift monitor over label prototypes (which classes are collapsing
    toward each other). Rides label_centroids' distributed (sum-vector,
    count) partial aggregate — vectors never leave the workers; only the
    label x dim mean table (label-sized, the bounded-driver contract)
    comes back, and the cosine matrix is computed over the ROUNDED means
    so both engines see identical inputs. Output: (label_a, label_b,
    cosine) for label_a < label_b."""
    import ray.data as rd

    cent = label_centroids(ds, label_col=label_col, ndigits=ndigits).to_pandas()
    mat = cent.pivot(index=label_col, columns="dim", values="mean_val").sort_index()
    labels = mat.index.to_numpy()
    m = mat.to_numpy(dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    out_a, out_b, out_c = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            c = float(m[i] @ m[j] / (norms[i] * norms[j]))
            out_a.append(labels[i])
            out_b.append(labels[j])
            out_c.append(round(c, ndigits))
    return rd.from_pandas(
        pd.DataFrame({"label_a": out_a, "label_b": out_b, "cosine": out_c})
    )
