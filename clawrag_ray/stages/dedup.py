"""Deduplication operators (SURVEY.md §2.8 + the training-data-pipeline
dedup suite: exact, versioning policies, MinHash+LSH, SimHash, n-gram
Jaccard).

Scale design notes:
  * exact dedup pre-aggregates per batch (arrow group_by) before the global
    groupby, so the shuffle moves one row per (key, batch) not per doc.
  * MinHash/LSH is the shingle -> signature -> band-bucket groupby pattern;
    only (band_hash, doc_id) pairs shuffle, never documents.
  * candidate verification is a DISTRIBUTED bucket join: pairs explode
    into doc-keyed legs, hash-join against the corpus, and a
    hash-partitioned group pass reassembles both legs per pair — nothing
    driver-side scales with the candidate set (the 10^12-doc shape).

Reference parity: exact dedup policies SKIP/VERSION/REPLACE_IF_NEWER/
NOTIFY_ONLY from ClawRag's DeduplicationService
(backend/src/services/deduplication_service.py:29-199); there is no
near-dup operator in the reference (SURVEY.md §2.8) — MinHash/SimHash are
the scale additions this engine needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from clawrag_ray.functions.kernels import re2_tokens, sha256_hex

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def with_text_hash(ds: Dataset, col: str = "text", out: str = "text_sha256") -> Dataset:
    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, sha256_hex(batch[col]))

    return ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def exact_dedup_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(keeper_doc_id, n_copies) per distinct text — D1 SKIP-policy keepers.

    Two-level aggregation: per-batch partials (arrow group_by inside
    map_batches), then a small global groupby over partial rows."""
    hashed = with_text_hash(ds.select_columns([id_col, text_col]), text_col)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("text_sha256").aggregate([(id_col, "min"), (id_col, "count")])
        return g.rename_columns(["text_sha256", "partial_min", "partial_count"])

    partials = hashed.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    agg = partials.groupby("text_sha256").aggregate(
        Min("partial_min", alias_name="keeper_doc_id"),
        Sum("partial_count", alias_name="n_copies"),
    )
    return agg.select_columns(["keeper_doc_id", "n_copies"])


def dedup_rate_by_source(ds: Dataset, text_col: str = "text", group_col: str = "source") -> Dataset:
    """Per-source duplication report: (source, n_docs, n_uniq, dup_rate)
    where n_uniq counts distinct texts and dup_rate = 1 - n_uniq/n_docs —
    the first diagnostic run on a new crawl slice (which sources are
    boilerplate farms, what exact-dedup will reclaim, per-source).

    Three-level aggregation keeps the shuffle thin: per-batch arrow
    group_by collapses to (source, digest, partial_count) partials, the
    global groupby on (source, digest) sums copies per distinct text, and
    the finishing groupby on source alone counts distinct rows + sums
    copies. Nothing corpus-sized ever sits on the driver; output is
    #sources rows."""
    hashed = with_text_hash(ds.select_columns([group_col, text_col]), text_col)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([group_col, "text_sha256"]).aggregate([("text_sha256", "count")])
        return g.rename_columns([group_col, "text_sha256", "partial_count"])

    partials = hashed.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    per_text = partials.groupby([group_col, "text_sha256"]).aggregate(
        Sum("partial_count", alias_name="n_copies")
    )

    def finish_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(group_col).aggregate([("n_copies", "sum"), ("n_copies", "count")])
        return g.rename_columns([group_col, "p_docs", "p_uniq"])

    fin = per_text.map_batches(finish_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    agg = fin.groupby(group_col).aggregate(
        Sum("p_docs", alias_name="n_docs"), Sum("p_uniq", alias_name="n_uniq")
    )

    def rate(batch: pa.Table) -> pa.Table:
        n_docs = batch["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_uniq = batch["n_uniq"].to_numpy(zero_copy_only=False).astype(np.float64)
        r = np.round(1.0 - n_uniq / n_docs, 6)
        return batch.append_column("dup_rate", pa.array(r, pa.float64()))

    return agg.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)


def dedup_versions(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", num_partitions: int = 64
) -> Dataset:
    """VERSION policy (deduplication_service.py:29-199): every copy of the
    same content gets a version number in id order; only the newest stays
    active. Returns (doc_id, version, is_active).

    Processes whole HASH PARTITIONS of groups (hash_partitioned_groups) so
    the per-group work is a vectorized cumcount, not one task per distinct
    text."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    hashed = with_text_hash(ds.select_columns([id_col, text_col]), text_col)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_sha256", id_col], kind="mergesort").reset_index(drop=True)
        grp = g.groupby("text_sha256", sort=False)
        version = (grp.cumcount() + 1).astype("int64")
        total = grp[id_col].transform("size")
        return pd.DataFrame({id_col: g[id_col], "version": version, "is_active": version == total})

    return hash_partitioned_groups(hashed, ["text_sha256"], per_part, num_partitions=num_partitions)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — a full
    64-bit avalanche, used to derive an independent second hash."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via double hashing h1 + i*h2
    (Kirsch-Mitzenmacher). h2 derives from h1 through a splitmix64
    avalanche rather than a second hash_array call: pd.util.hash_array
    IGNORES hash_key for numeric dtypes, so two keyed calls return the
    SAME hash for int columns — the mixer gives every dtype a decorrelated
    second hash. Fully vectorized; no per-row Python."""
    h1 = pd.util.hash_array(keys, hash_key="clawrag_bloom_k1")
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def build_bloom_ref(ds: Dataset, key_col: str, n_bits: int, n_hashes: int, fan_in: int = 16):
    """Fold a Dataset's key column into one packed-uint64 Bloom filter and
    ray.put it (returns the ObjectRef of the bytes): map-only per-block
    partials, two fixed-fan-in distributed OR-reduce levels, one
    n_bits/8-byte array on the driver. Shared by bloom_anti_join and
    runtime_filtered_join."""
    import ray

    n_words = (n_bits + 63) // 64

    def _keys_np(b: pa.Table) -> np.ndarray:
        col = b[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return col.to_numpy(zero_copy_only=False)

    def block_bloom(b: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        if b.num_rows:
            pos = _bloom_positions(_keys_np(b), n_bits, n_hashes).ravel()
            np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        return pa.table({"bloom": pa.array([words.tobytes()], pa.large_binary())})

    def or_partials(b: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for buf in b["bloom"].to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.large_binary())})

    partials = ds.map_batches(block_bloom, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    reduced = partials.repartition(fan_in).map_batches(or_partials, batch_format="pyarrow", batch_size=None)
    final = reduced.repartition(1).map_batches(or_partials, batch_format="pyarrow", batch_size=None)
    rows = final.take_all()  # n_bits/8 bytes, once (empty input -> zero filter)
    return ray.put(rows[0]["bloom"] if rows else np.zeros(n_words, dtype=np.uint64).tobytes())


def bloom_test_mask(b: pa.Table, key_col: str, bloom_ref, n_bits: int, n_hashes: int) -> np.ndarray:
    """Vectorized membership test of a batch's keys against a broadcast
    Bloom (True = possibly present; False = provably absent)."""
    import ray

    col = b[key_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    keys = col.to_numpy(zero_copy_only=False)
    words = np.frombuffer(ray.get(bloom_ref), dtype=np.uint64)
    pos = _bloom_positions(keys, n_bits, n_hashes)
    hit = np.ones(len(keys), dtype=bool)
    for j in range(n_hashes):
        p = pos[:, j]
        hit &= (words[p >> 6] >> (p.astype(np.uint64) & np.uint64(63))).astype(np.uint64) & np.uint64(1) != 0
    return hit


def bloom_anti_join(
    new: Dataset,
    seen: Dataset,
    key_col: str,
    n_bits: int = 1 << 22,
    n_hashes: int = 4,
    fan_in: int = 16,
) -> Dataset:
    """Incremental-ingest anti-join at corpus scale: rows of ``new`` whose
    ``key_col`` does NOT appear in ``seen`` — EXACT semantics with the big
    shuffle replaced by a Bloom prefilter.

    Shape: (1) every ``seen`` block folds its keys into a packed-uint64
    partial Bloom array (map-only); partials OR-reduce in two fixed-fan-in
    distributed levels (at extreme block counts add levels — each is one
    map_batches). (2) The final filter (n_bits/8 bytes) broadcasts via
    ray.put; ``new`` blocks test membership vectorized. Bloom misses are
    PROVABLY absent from ``seen`` (no false negatives) and pass through
    untouched — at the typical ingest ratio that is almost every row, and
    no seen-side data ever shuffles for them. (3) Only the Bloom HITS
    (true dups + ~(1-e^{-kn/m})^k false positives) are verified exactly:
    their key set broadcasts, ``seen`` filters map-side to keys actually
    present (bounded by the hit set), and hits drop iff their key truly
    exists. Output = misses ∪ surviving hits: exactly the anti-join.

    Contract: the suspected-dup key set must fit the object store (it is
    output-error-sized, not corpus-sized; size n_bits so the false-positive
    rate keeps it there — 4 MiB of bits covers ~10^6 seen keys at <2% FP).
    At 10^12 seen keys, shard the filter by key range and run one
    bloom_anti_join per shard (the filters stay independent)."""
    import ray

    def _keys_np(b: pa.Table) -> np.ndarray:
        col = b[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return col.to_numpy(zero_copy_only=False)

    bloom_ref = build_bloom_ref(seen, key_col, n_bits, n_hashes, fan_in)

    def split_hits(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b.append_column("__hit", pa.array([], pa.bool_()))
        return b.append_column(
            "__hit", pa.array(bloom_test_mask(b, key_col, bloom_ref, n_bits, n_hashes))
        )

    def keep_side(want_hit: bool):
        def f(b: pa.Table) -> pa.Table:
            mask = b["__hit"] if want_hit else pc.invert(b["__hit"])
            return b.filter(mask).drop_columns(["__hit"])

        return f

    tested = new.map_batches(split_hits, batch_format="pyarrow", zero_copy_batch=True).materialize()
    misses = tested.map_batches(keep_side(False), batch_format="pyarrow", zero_copy_batch=True)
    hits = tested.map_batches(keep_side(True), batch_format="pyarrow", zero_copy_batch=True).materialize()
    if hits.count() == 0:
        return misses

    # exact verify of the bounded hit set: which hit keys truly exist?
    hit_keys = np.unique(
        np.concatenate([_keys_np(b) for b in hits.select_columns([key_col]).iter_batches(batch_format="pyarrow")])
    )
    hit_ref = ray.put(pa.array(hit_keys))

    def present_keys(b: pa.Table) -> pa.Table:
        m = b.filter(pc.is_in(b[key_col], value_set=ray.get(hit_ref)))
        return pa.table({key_col: m[key_col].combine_chunks().unique() if m.num_rows else pa.array([], m.schema.field(key_col).type)})

    present = seen.map_batches(present_keys, batch_format="pyarrow", zero_copy_batch=True)
    present_set = np.unique(
        np.concatenate(
            [_keys_np(b) for b in present.iter_batches(batch_format="pyarrow")] or [hit_keys[:0]]
        )
    )
    present_ref = ray.put(pa.array(present_set))

    def drop_present(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(b[key_col], value_set=ray.get(present_ref))))

    survivors = hits.map_batches(drop_present, batch_format="pyarrow", zero_copy_batch=True)
    return misses.union(survivors)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def word_shingles(text: str, k: int = 3) -> set[int]:
    """k-word shingles hashed to stable 64-bit ints (md5-based — never
    Python's randomized hash())."""
    words = re2_tokens(text.lower())
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return {int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") >> 1 for g in grams}


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


class MinHasher:
    """Actor-pool stage: text column -> minhash signature + LSH band rows.

    Permutation params are built once per actor in __init__ (stateful-stage
    pattern); __call__ emits one row per (doc, band): (doc_id, band_id,
    band_hash) — the only thing that shuffles."""

    def __init__(self, n_perm: int = 128, n_bands: int = 32, shingle_k: int = 3, seed: int = 7):
        assert n_perm % n_bands == 0
        self.n_perm, self.n_bands, self.k = n_perm, n_bands, shingle_k
        self.rows_per_band = n_perm // n_bands
        self.a, self.b = _perm_params(n_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.full(self.n_perm, _MERSENNE, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.int64, count=len(sh))
        # (a * x + b) mod p for all perms at once: (n_perm, n_shingles)
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.signature(text or "")
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
            }
        )


_HASHER_CACHE: dict[tuple, "MinHasher"] = {}


def _cached_hasher(**kw) -> "MinHasher":
    key = tuple(sorted(kw.items()))
    if key not in _HASHER_CACHE:
        _HASHER_CACHE[key] = MinHasher(**kw)
    return _HASHER_CACHE[key]


def _sorted_group_pair_indices(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group (i < j, group-local) index pairs over rows whose
    group codes are CONTIGUOUS (rows pre-sorted by group) — pure numpy
    index algebra, no Python loop over groups. For a group of n rows
    emits its n*(n-1)/2 ordered row-index pairs; callers index any
    row-aligned array (ids, flags) with the result."""
    n = len(codes)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    idx = np.arange(n, dtype=np.int64)
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = codes[1:] != codes[:-1]
    starts = idx[new_grp]
    sizes = np.diff(np.append(starts, n))
    group_end = np.repeat(starts + sizes, sizes)  # exclusive end per row
    reps = group_end - idx - 1  # row i pairs with every later row in its group
    total = int(reps.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    a_idx = np.repeat(idx, reps)
    seg_start = np.repeat(np.cumsum(reps) - reps, reps)
    b_idx = np.repeat(idx + 1, reps) + (np.arange(total, dtype=np.int64) - seg_start)
    return a_idx, b_idx


def minhash_band_table(ds: Dataset, concurrency=None, **minhash_kw) -> Dataset:
    """documents(doc_id, text) -> the persistable LSH index rows
    (doc_id, band_id:int32, band_hash:string). Writing this table once
    per indexed corpus is what makes minhash_incremental_near_dups'
    ``seen_bands=`` path real: a new crawl batch bands only ITSELF and
    bucket-joins against the stored rows — the 10^12-doc corpus is never
    re-shingled. Runs as tasks with a per-worker cached hasher (the state
    is ~2 KB of permutation params)."""

    def band_rows(batch: pa.Table) -> pa.Table:
        return _cached_hasher(**minhash_kw)(batch)

    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.select_columns(["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow", zero_copy_batch=True, **kw
    )


def minhash_candidate_pairs(
    ds: Dataset, concurrency=None, max_bucket_size: int | None = None, **minhash_kw
) -> Dataset:
    """documents(doc_id, text) -> candidate near-dup pairs (doc_a, doc_b)
    via LSH band buckets. Pairs are deduped across bands.

    The banding stage runs as TASKS with a per-worker-process cached
    hasher, not an actor pool: the state is ~2 KB of permutation params, so
    pool ramp-up would cost more than the whole stage (measured 6.4 s ->
    ~2 s on 5k docs). Bucket formation and cross-band pair dedup both run
    as hash-partitioned group passes (64 partitions each, NOT one group
    per bucket/pair): per-partition pandas drops the overwhelmingly-
    singleton buckets vectorized, and pair emission is one numpy
    index-algebra pass over the sorted colliding rows (no Python loop
    at all). ``max_bucket_size`` caps the quadratic bucket blow-up on
    exact-duplicate-heavy crawls (a hot page's million copies share every
    band bucket -> 5e11 pairs from ONE bucket): oversized buckets drop
    with a documented recall trade — their members are exact/boilerplate
    duplicates the cheap exact-dedup pass (with_text_hash) catches first,
    the standard pipeline order (SimHash-parity knob, dedup.py simhash
    ``max_bucket_size``). Fully distributed — nothing corpus-sized ever
    lands on the driver."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    bands = minhash_band_table(ds, concurrency=concurrency, **minhash_kw)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=g["doc_id"].dtype),
                "doc_b": pd.Series([], dtype=g["doc_id"].dtype),
            }
        )
        # singleton buckets (the vast majority) drop in one vectorized mask
        colliding = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
        if colliding.empty:
            return empty
        srt = colliding.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
        codes = srt.groupby(["band_id", "band_hash"], sort=False).ngroup().to_numpy()
        ids = srt["doc_id"].to_numpy()
        if max_bucket_size:
            sizes = np.bincount(codes)
            keep = sizes[codes] <= max_bucket_size
            ids, codes = ids[keep], codes[keep]
        ai, bi = _sorted_group_pair_indices(codes)
        mask = ids[ai] != ids[bi]  # duplicate doc_id rows never self-pair
        if not mask.any():
            return empty
        return pd.DataFrame({"doc_a": ids[ai][mask], "doc_b": ids[bi][mask]}).drop_duplicates()

    cand = hash_partitioned_groups(bands, ["band_id", "band_hash"], part_pairs)
    # cross-band duplicates span partitions; dedup with one more 64-group pass
    return hash_partitioned_groups(cand, ["doc_a", "doc_b"], lambda g: g.drop_duplicates())


def _explode_pair_legs(pairs: Dataset) -> Dataset:
    """(doc_a, doc_b) pairs -> two LEG rows per pair (side 0 carries doc_a,
    side 1 carries doc_b) keyed by ``doc_id`` — the join key against the
    corpus. Purely columnar."""

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.concat_tables(
            [
                pa.table(
                    {"doc_a": b["doc_a"], "doc_b": b["doc_b"], "side": pa.array([0] * n, pa.int8()), "doc_id": b["doc_a"]}
                ),
                pa.table(
                    {"doc_a": b["doc_a"], "doc_b": b["doc_b"], "side": pa.array([1] * n, pa.int8()), "doc_id": b["doc_b"]}
                ),
            ]
        )

    return pairs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _join_legs(legs: Dataset, table: Dataset, value_cols: list[str], num_partitions: int = 64) -> Dataset:
    """Distributed hash join of pair legs against a corpus-keyed table via
    union + ONE hash-partitioned group pass (the asof_join shape) instead
    of the Dataset.join operator, whose fixed hash-shuffle setup dominates
    when the leg side is candidate-sized (measured: swapping it cut the
    sf0.1 minhash verify by ~4 s). Corpus rows ride the same shuffle as
    the legs (side -1) and attach per partition with a vectorized merge —
    nothing lands on the driver.

    An ID-SET SEMI-JOIN prunes the corpus side first: the distinct leg
    doc_ids (8-byte ints, bounded by 2x the candidate-pair count — the
    same bound the verify output itself carries) broadcast via ray.put and
    filter ``table`` inside map_batches, so only rows that actually have a
    leg ever enter the shuffle. Without it the full value payload (e.g.
    the text column) shuffles to attach values to a few hundred legs
    (measured: 13.9 -> ~7 s on the sf0.1 minhash verify). At extreme
    candidate counts swap the exact id set for a bloom filter — the filter
    is correctness-neutral (inner merge on doc_id downstream)."""
    import ray

    from clawrag_ray.stages.relational import _as_arrow_schema, hash_partitioned_groups

    legs = legs.materialize()  # candidate-sized by construction; reused twice below
    leg_ids = np.unique(
        np.concatenate([b["doc_id"].to_numpy() for b in legs.iter_batches(batch_format="pyarrow")])
        if legs.count()
        else np.array([], dtype="int64")
    )
    # store the id set as an ARROW array: ray.get then reconstructs it
    # zero-copy per task instead of re-running the O(|ids|) numpy->arrow
    # conversion in every corpus block's filter call
    ids_ref = ray.put(pa.array(leg_ids))
    # partition count scales with the candidate set: 64 fixed partitions on
    # a few thousand legs is ~128 near-empty group tasks of pure overhead
    num_partitions = int(min(num_partitions, max(4, legs.count() // 2000)))

    def semi_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["doc_id"], value_set=ray.get(ids_ref)))

    table = table.map_batches(semi_filter, batch_format="pyarrow", zero_copy_batch=True)

    id_type = _as_arrow_schema(legs.schema()).field("doc_id").type
    tbl_schema = _as_arrow_schema(table.schema())
    value_types = [tbl_schema.field(c).type for c in value_cols]

    zero_pad = _zero_pad  # shared typed-sentinel padding (defined below)

    def pad_legs(b: pa.Table) -> pa.Table:
        t = b
        for c, typ in zip(value_cols, value_types):
            t = t.append_column(c, zero_pad(b.num_rows, typ))
        return t

    def pad_table(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "doc_a": zero_pad(n, id_type),
            "doc_b": zero_pad(n, id_type),
            "side": pa.array([-1] * n, pa.int8()),
            "doc_id": b["doc_id"],
        }
        for c in value_cols:
            cols[c] = b[c]
        return pa.table(cols)

    unioned = legs.map_batches(pad_legs, batch_format="pyarrow", zero_copy_batch=True).union(
        table.select_columns(["doc_id"] + value_cols).map_batches(
            pad_table, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[g["side"] == -1][["doc_id"] + value_cols]
        lg = g[g["side"] != -1].drop(columns=value_cols)
        out = lg.merge(vals, on="doc_id", how="inner")
        # the side union NaN-pads int ids into floats; restore
        for c in ("doc_a", "doc_b"):
            if out[c].dtype.kind == "f":
                out[c] = out[c].astype("int64")
        return out

    return hash_partitioned_groups(unioned, ["doc_id"], per_part, num_partitions=num_partitions)


def _verify_pairs_jaccard_ds(
    ds: Dataset, pairs: Dataset, threshold: float, shingle_k: int, num_partitions: int = 64
) -> Dataset | None:
    """Exact per-pair word-k-gram Jaccard over CANDIDATE pairs via a
    DISTRIBUTED bucket join — no driver-side text dict (whose size scales
    with the candidate set): each pair explodes into two legs keyed by
    doc_id, legs hash-join against the corpus texts, and a hash-partitioned
    group pass reassembles both legs per pair and verifies. The corpus
    shuffles once (the standard verify-join shape at 10^12 docs); shingle
    sets are memoized per doc within each partition. Jaccard uses the
    string-shingle definition (_shingle_strings) so the values match the
    DuckDB oracle digit-for-digit. Returns the qualifying (doc_a, doc_b,
    jaccard rounded to 6) rows as a DATASET (None when there are no
    candidates at all — a schemaless empty Dataset cannot go through the
    leg join), so downstream consumers (cluster consolidation) keep the
    pairs distributed."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    pairs = pairs.materialize()  # candidate-sized; sizes both passes below
    if pairs.count() == 0:
        return None
    num_partitions = int(min(num_partitions, max(4, pairs.count() // 1000)))
    legs = _explode_pair_legs(pairs)
    joined = _join_legs(legs, ds.select_columns(["doc_id", "text"]), ["text"], num_partitions=num_partitions)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["doc_a", "doc_b", "text"]].rename(columns={"text": "text_a"})
        b = g[g["side"] == 1][["doc_a", "doc_b", "text"]].rename(columns={"text": "text_b"})
        m = a.merge(b, on=["doc_a", "doc_b"])
        cache: dict = {}

        def sh(key, text):
            if key not in cache:
                cache[key] = _shingle_strings(text or "", shingle_k)
            return cache[key]

        out_j = []
        for da, db, ta, tb in zip(m["doc_a"], m["doc_b"], m["text_a"], m["text_b"]):
            sa, sb = sh(da, ta), sh(db, tb)
            inter = len(sa & sb)
            out_j.append(round(inter / (len(sa) + len(sb) - inter), 6) if inter else 0.0)
        m = m.assign(jaccard=out_j)[["doc_a", "doc_b", "jaccard"]]
        return m[m["jaccard"] >= threshold]

    return hash_partitioned_groups(joined, ["doc_a", "doc_b"], per_part, num_partitions=num_partitions)


def _verify_pairs_jaccard(
    ds: Dataset, pairs: Dataset, threshold: float, shingle_k: int, num_partitions: int = 64
) -> pd.DataFrame:
    """Driver-side wrapper of _verify_pairs_jaccard_ds: materializes the
    (bounded, output-sized) qualifying pairs, sorted by (doc_a, doc_b)."""
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")})
    verified = _verify_pairs_jaccard_ds(ds, pairs, threshold, shingle_k, num_partitions)
    if verified is None:
        return empty
    out = verified.to_pandas()  # bounded: qualifying pairs only (output-sized)
    if out.empty:
        return empty
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def minhash_near_dups(
    ds: Dataset,
    threshold: float = 0.8,
    shingle_k: int = 3,
    n_perm: int = 128,
    n_bands: int = 64,
    concurrency=None,
    max_bucket_size: int | None = None,
) -> pd.DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact n-gram Jaccard
    verification (the production near-dup path). With the default r =
    n_perm/n_bands = 2 rows per band and b = 64 bands, the probability a
    pair at Jaccard J is MISSED is (1 - J^2)^64 — below 1e-8 at J = 0.5 —
    so at thresholds >= 0.5 the output equals the exact all-pairs result
    (and shares its DuckDB oracle). ``max_bucket_size`` is the
    production skew guard (see minhash_candidate_pairs); at test scale
    buckets stay far below any sane cap, so the oracle is unaffected.
    Returns (doc_a, doc_b, jaccard)."""
    pairs = minhash_candidate_pairs(
        ds,
        concurrency=concurrency,
        max_bucket_size=max_bucket_size,
        shingle_k=shingle_k,
        n_perm=n_perm,
        n_bands=n_bands,
    )
    return _verify_pairs_jaccard(ds, pairs, threshold, shingle_k)


def _shingle_strings(text: str, k: int) -> frozenset[str]:
    """Distinct k-word shingles as STRINGS (not hashed) — oracle-parity
    variant of word_shingles: matches DuckDB
    ``list_distinct([words[i]||' '||...])`` semantics exactly, including
    the <k-words fallback to one joined shingle ('' for empty text)."""
    words = re2_tokens(text.lower())
    if len(words) < k:
        return frozenset([" ".join(words)])
    return frozenset(" ".join(words[i : i + k]) for i in range(len(words) - k + 1))


def jaccard_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    concurrency=None,
    n_perm: int = 128,
    n_bands: int | None = None,
) -> pd.DataFrame:
    """Exact word-k-gram Jaccard near-dup pairs >= threshold, computed via
    LSH candidate pruning: MinHash band buckets generate the candidate set
    (only (doc_id, band_hash) rows ever shuffle — never documents, never an
    all-pairs scan), then every candidate pair is verified with the exact
    string-shingle Jaccard.

    Exactness argument (why a pruned path can carry an exact oracle): with
    n_perm=128 / n_bands=64 (2 minhash rows per band), a pair at Jaccard J
    collides in at least one band with probability 1 - (1 - J^2)^64; the
    miss probability at the J = 0.5 decision boundary is (3/4)^64 < 1e-8,
    vanishing further above it — so for thresholds >= 0.5 the candidate set
    contains every qualifying pair and verification makes the result exact.
    For much lower thresholds, raise n_bands (or drop to 1 row per band).

    Replaces the previous all-pairs broadcast-scan baseline, which held the
    whole corpus shingle list on the driver and did O(n^2) work.

    ``n_bands`` defaults adaptively: 2 rows/band for thresholds >= 0.5,
    1 row/band below (miss prob (1 - J)^n_perm — e.g. < 1e-19 at J = 0.3 —
    at the cost of a larger candidate set); pass explicitly to override."""
    if n_bands is None:
        n_bands = n_perm // 2 if threshold >= 0.5 else n_perm
    return minhash_near_dups(
        ds, threshold=threshold, shingle_k=shingle_k, n_perm=n_perm, n_bands=n_bands, concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word unigrams (stateless math, actor-pool for
    warm numpy buffers)."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        words = re2_tokens(text.lower())
        if not words:
            return 0
        acc = np.zeros(self.bits, dtype=np.int64)
        uniq, counts = np.unique(np.array(words), return_counts=True)
        for w, c in zip(uniq, counts):
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            bits = np.fromiter(((h >> i) & 1 for i in range(self.bits)), dtype=np.int64, count=self.bits)
            acc += (2 * bits - 1) * int(c)
        return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self.simhash(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                # store as int64 (top bit folded) for parquet/duckdb friendliness
                "simhash": pa.array([h & 0x7FFFFFFFFFFFFFFF for h in hashes], pa.int64()),
            }
        )


def simhash_table(ds: Dataset, concurrency=None) -> Dataset:
    """Task-based (per-worker cached hasher): SimHasher holds no heavy
    state, so an actor pool's ramp would dominate the stage."""
    hasher = SimHasher()
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.select_columns(["doc_id", "text"]).map_batches(
        lambda b: hasher(b), batch_format="pyarrow", zero_copy_batch=True, **kw
    )


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_near_dup_pairs(
    ds: Dataset,
    max_hamming: int = 3,
    n_bands: int = 8,
    concurrency=None,
    max_bucket_size: int | None = None,
) -> pd.DataFrame:
    """SimHash near-dup pairs: all (doc_a < doc_b) with
    Hamming(simhash_a, simhash_b) <= max_hamming. The MinHash-shaped
    distributed pipeline: band the 64-bit hash into ``n_bands`` bit-slices,
    groupby (band_id, band_value) buckets, emit bucket pairs, dedup with a
    grouped aggregate, then verify Hamming per candidate pair.

    EXACT by pigeonhole (not probabilistic like MinHash): a pair within
    Hamming distance d differs in at most d of the n_bands slices, so
    whenever d < n_bands it matches at least one band exactly and is always
    a candidate. Default 8 bands of 8 bits covers any max_hamming <= 7.

    Verification happens INSIDE the bucket group pass: band rows carry the
    64-bit hash (8 bytes — cheap to replicate), so each bucket computes its
    pairwise Hamming matrix vectorized (xor + unpackbits popcount, row-tiled
    to bound memory) and emits ONLY qualifying pairs. Candidate pairs are
    never materialized or shuffled — on correlated corpora the candidate
    set approaches all-pairs (measured: 4.1M candidates for 8k real pairs
    at sf0.1) and shuffling it dominated the old pipeline (130 s -> ~8 s).
    Cross-band duplicate hits collapse in one output-sized hash-partitioned
    pass. Returns (doc_a, doc_b, hamming) sorted.

    Degenerate inputs: a corpus with many IDENTICAL hashes (e.g. thousands
    of empty docs all at simhash 0) has an inherently quadratic OUTPUT —
    every identical pair qualifies — so bucket expansion is quadratic too.
    Run exact dedup first (exact_dedup_stats) and near-dup the distinct
    survivors, the standard pipeline order; ``max_bucket_size`` optionally
    caps expansion instead (drops pairs inside oversized buckets — recall
    loss, disabled by default to preserve the exactness guarantee)."""
    if max_hamming >= n_bands:
        raise ValueError(f"max_hamming={max_hamming} needs n_bands > max_hamming (pigeonhole guarantee)")
    from clawrag_ray.stages.relational import hash_partitioned_groups

    bits_per_band = 64 // n_bands
    hashed = simhash_table(ds, concurrency=concurrency)

    def band_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = batch["simhash"]
        tables = []
        mask = (1 << bits_per_band) - 1
        for band in range(n_bands):
            vals = pc.bit_wise_and(pc.shift_right(h, band * bits_per_band), mask)
            tables.append(
                pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "band_id": pa.array([band] * batch.num_rows, pa.int32()),
                        "band_value": pc.cast(vals, pa.int64()),
                        "simhash": h,
                    }
                )
            )
        return pa.concat_tables(tables)

    bands = hashed.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets (the common case) drop in one vectorized mask
        colliding = g[g.duplicated(subset=["band_id", "band_value"], keep=False)]
        out_frames = []
        for _, grp in colliding.groupby(["band_id", "band_value"], sort=False):
            n = len(grp)
            if max_bucket_size and n > max_bucket_size:
                continue
            order = np.argsort(grp["doc_id"].to_numpy(), kind="mergesort")
            ids = grp["doc_id"].to_numpy()[order]
            hs = grp["simhash"].to_numpy(dtype=np.int64)[order]
            for s in range(0, n, 512):  # row tiles bound the xor matrix
                e = min(n, s + 512)
                x = np.bitwise_xor(hs[s:e, None], hs[None, :])
                ham = np.unpackbits(x.view(np.uint8).reshape(e - s, n, 8), axis=2).sum(axis=2)
                ri, ci = np.where(ham <= max_hamming)
                keep = (ri + s) < ci  # upper triangle: a < b, no self-pairs
                if keep.any():
                    out_frames.append(
                        pd.DataFrame(
                            {
                                "doc_a": ids[ri[keep] + s],
                                "doc_b": ids[ci[keep]],
                                "hamming": ham[ri[keep], ci[keep]].astype("int64"),
                            }
                        )
                    )
        if not out_frames:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=g["doc_id"].dtype),
                    "doc_b": pd.Series([], dtype=g["doc_id"].dtype),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out_frames, ignore_index=True)

    qualifying = hash_partitioned_groups(bands, ["band_id", "band_value"], part_pairs)
    # cross-band duplicate hits carry identical hamming; one output-sized pass
    deduped = hash_partitioned_groups(
        qualifying, ["doc_a", "doc_b"], lambda g: g.drop_duplicates(subset=["doc_a", "doc_b"])
    )
    out = deduped.to_pandas()  # bounded: qualifying pairs only
    if out.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    return out.astype({"hamming": "int64"}).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact substring-level near-dup (shared window fingerprints)
# ---------------------------------------------------------------------------


def shared_window_pairs(
    ds: Dataset,
    window: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Substring-level near-dup: two docs pair iff they share at least one
    exact ``window``-byte substring, scored by the count of DISTINCT shared
    Rabin-Karp window hashes — the hash-window formulation of Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, public; suffix arrays there, rolling hashes here).
    Catches cross-document boilerplate and quotation overlap that
    word-shingle Jaccard dilutes away on long docs.

    Shape: each doc emits its distinct window hashes in one O(n) rolling
    pass (same polynomial as kernels.rolling_fingerprint — prefix-hash
    algebra mirrored by the DuckDB oracle); only (wh, doc_id) rows shuffle.
    One hash-partitioned pass self-merges each hash partition on ``wh``
    (vectorized — no per-group calls) into per-partition pair counts, and a
    small global groupby sums them. Docs shorter than ``window`` have no
    ``window``-byte substring and emit nothing, BY DEFINITION.

    Hash collisions (2^-61) and a window shared by k docs producing
    k(k-1)/2 pair rows are the two scale caveats: at boilerplate-heavy
    10^12-doc corpora, cap the per-window doc list (dropping ubiquitous
    windows — they are boilerplate, not duplication signal) before the
    self-merge; kept exact here to carry the oracle."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    mod, base = _MERSENNE, 257
    pw = pow(base, window - 1, mod)

    def explode(b: pa.Table) -> pa.Table:
        ids_out: list = []
        whs: list[int] = []
        for doc_id, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            data = (text or "").encode("utf-8", "surrogatepass")
            n = len(data)
            if n < window:
                continue
            h = 0
            for c in data[:window]:
                h = (h * base + c) % mod
            seen = {h}
            for i in range(window, n):
                h = ((h - data[i - window] * pw) * base + data[i]) % mod
                seen.add(h)
            ids_out.extend([doc_id] * len(seen))
            whs.extend(seen)
        # explicit types: an all-short batch otherwise emits null-typed
        # empty arrays and poisons the union schema
        return pa.table({id_col: pa.array(ids_out, b[id_col].type), "wh": pa.array(whs, pa.int64())})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="wh")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = (
            m.groupby([f"{id_col}_x", f"{id_col}_y"], sort=False)
            .size()
            .reset_index(name="n_shared")
        )
        return out.rename(columns={f"{id_col}_x": "doc_a", f"{id_col}_y": "doc_b"})

    partial = hash_partitioned_groups(rows, ["wh"], per_part, num_partitions=num_partitions)
    agg = partial.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("n_shared", alias_name="n_shared_windows")
    )
    out = agg.to_pandas()  # qualifying-pair-sized by construction
    if out.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "n_shared_windows": pd.Series([], dtype="int64"),
            }
        )
    return (
        out.astype({"n_shared_windows": "int64"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# connected-components cluster consolidation (pairs -> dedup clusters)
# ---------------------------------------------------------------------------


def _zero_pad(n: int, typ: pa.DataType) -> pa.Array:
    """Typed ZERO sentinels for union-schema padding (see _join_legs): a
    null in an int64 column turns the whole pandas column float64 inside a
    group pass and >53-bit values lose low bits in the float mantissa. Pad
    values are dropped before the merge, so the sentinel never leaks."""
    if pa.types.is_integer(typ):
        return pa.array(np.zeros(n, dtype="int64"), typ)
    if pa.types.is_floating(typ):
        return pa.array(np.zeros(n), typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, typ)
    return pa.nulls(n, typ)


def _keyed_join(
    left: Dataset,
    key: str,
    right: Dataset,
    right_key: str,
    right_vals: list[str],
    fill_with_key: str | None = None,
    num_partitions: int = 64,
    fill_values: dict | None = None,
) -> Dataset:
    """Distributed hash join of ``left`` (any columns) against ``right``
    (``right_key`` unique + ``right_vals``) via union + ONE
    hash-partitioned group pass — the verify-join shape (_join_legs) made
    generic so iterative algorithms (connected components) can join per
    round without Dataset.join's fixed shuffle setup cost. Nothing lands
    on the driver.

    ``fill_with_key=<col>``: LEFT join semantics — unmatched left rows get
    their own key value as ``<col>`` (the singleton-component fill);
    ``fill_values={col: const}`` fills other val columns of unmatched rows
    with constants (e.g. cluster_size=1 for singletons); otherwise INNER."""
    from clawrag_ray.stages.relational import _as_arrow_schema, hash_partitioned_groups

    lschema = _as_arrow_schema(left.schema())
    left_cols = [c for c in lschema.names]
    left_types = {c: lschema.field(c).type for c in left_cols}
    rschema = _as_arrow_schema(right.schema())
    val_types = {c: rschema.field(c).type for c in right_vals}

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {"__k": b[key], "__role": pa.array(np.zeros(b.num_rows, dtype="int8"), pa.int8())}
        for c in left_cols:
            cols[c] = b[c]
        for c in right_vals:
            cols[c] = _zero_pad(b.num_rows, val_types[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {"__k": b[right_key], "__role": pa.array(np.ones(b.num_rows, dtype="int8"), pa.int8())}
        for c in left_cols:
            cols[c] = _zero_pad(b.num_rows, left_types[c])
        for c in right_vals:
            cols[c] = b[c]
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    int_left = {c for c in left_cols if pa.types.is_integer(left_types[c])}

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[g["__role"] == 1][["__k"] + right_vals]
        lf = g[g["__role"] == 0].drop(columns=right_vals + ["__role"])
        how = "left" if (fill_with_key is not None or fill_values) else "inner"
        out = lf.merge(vals, on="__k", how=how)
        if fill_with_key is not None:
            miss = out[fill_with_key].isna()
            if miss.any():
                out.loc[miss, fill_with_key] = out.loc[miss, "__k"]
        if fill_values:
            for c, v in fill_values.items():
                miss = out[c].isna()
                if miss.any():
                    out.loc[miss, c] = v
        # a left/union NaN pad floats int columns; restore exact int64
        for c in list(int_left) + [c for c in right_vals if pa.types.is_integer(val_types[c])]:
            if c in out and out[c].dtype.kind == "f":
                out[c] = out[c].astype("int64")
        return out.drop(columns=["__k"])

    return hash_partitioned_groups(unioned, ["__k"], per_part, num_partitions=num_partitions)


def _minlabel_local(src: np.ndarray, dst: np.ndarray) -> pd.DataFrame:
    """Exact connected components over an in-memory edge list: vectorized
    numpy min-label propagation with pointer doubling (no scipy in this
    environment). Labels are NODE INDICES into the sorted-unique node
    array so ``lab[lab]`` path compression is an O(1) gather; sorted-unique
    order makes min-index equal min-node-id. O((E+V) log V) total work.
    Returns (node, label) with label = min node id of the component."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = lab
        lab = lab.copy()
        np.minimum.at(lab, si, prev[di])
        np.minimum.at(lab, di, prev[si])
        while True:  # pointer doubling to a compressed fixpoint
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, prev):
            break
    return pd.DataFrame({"node": nodes, "label": nodes[lab]})


def connected_components(
    pairs: Dataset,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int = 64,
    task_threshold: int = 4_000_000,
    max_rounds: int = 16,
) -> Dataset:
    """Undirected (doc_a, doc_b) edges -> (node, label) with label = the
    MINIMUM node id in each connected component — the cluster-consolidation
    step after near-dup pair generation (pairs say "a duplicates b"; the
    component gives each duplicate set ONE canonical keeper).

    Two-level contraction (the MapReduce-CC family — Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14, public):
    while the edge list exceeds ``task_threshold``, run ONE
    hash-partitioned contraction pass — every edge is sent to BOTH
    endpoints' partitions, each partition solves its local subgraph
    exactly (vectorized numpy union-find) and re-emits only (node ->
    local_min_label) star edges. Because a node's partition sees its
    entire incident edge set, each pass both propagates min labels one
    hop AND collapses all partition-local chains, so the edge list
    shrinks toward one star per component in O(log diameter) passes
    (fixpoint detected by an order-independent content hash — a scalar
    aggregate per round, never rows on the driver). Once the list fits
    ``task_threshold`` it is finished exactly in one bounded step — the
    same output-bounded materialization contract as the candidate-pair
    verify join (a few hundred MB at the 4M default, NOT corpus-sized:
    the edge list is proportional to the near-dup population even at
    10^12 docs). At fixpoint above the threshold the star edges ARE the
    label table and are returned directly."""
    edges = pairs.select_columns([a_col, b_col]).map_batches(
        lambda b: pa.table({"src": b[a_col], "dst": b[b_col]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        raise ValueError("connected_components needs at least one edge (schemaless empty input)")

    def content_sig(ds: Dataset) -> tuple[int, int]:
        """Order-independent (count, hash-sum) signature of an edge set."""
        def h(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table({"h": (s * np.uint64(0x9E3779B97F4A7C15) + d).astype(np.int64)})
        return ds.count(), ds.map_batches(h, batch_format="pyarrow").sum("h")

    def both_dirs(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"node": b["src"], "nbr": b["dst"]}),
                pa.table({"node": b["dst"], "nbr": b["src"]}),
            ]
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lab = _minlabel_local(g["node"].to_numpy(), g["nbr"].to_numpy())
        out = lab[lab["node"] != lab["label"]]
        return pd.DataFrame({"src": out["node"].to_numpy(), "dst": out["label"].to_numpy()}).drop_duplicates()

    prev_sig = None
    for _ in range(max_rounds):
        if n_edges <= task_threshold:
            df = edges.to_pandas()  # bounded by task_threshold — see docstring
            out = _minlabel_local(df["src"].to_numpy(), df["dst"].to_numpy())
            import ray.data as _rd

            return _rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
        parts = int(min(num_partitions, max(2, n_edges // 100_000)))
        legs = edges.map_batches(both_dirs, batch_format="pyarrow", zero_copy_batch=True)
        from clawrag_ray.stages.relational import hash_partitioned_groups

        contracted = hash_partitioned_groups(legs, ["node"], per_part, num_partitions=parts).materialize()
        sig = content_sig(contracted)
        if sig == prev_sig:
            # star fixpoint: (node -> component min) edges ARE the labels.
            # The same star edge can be emitted by both endpoints'
            # partitions, so collapse to one row per node (labels are
            # unique per node at fixpoint — Min is just the dedup), and
            # add the self-label row for each root (roots never appear
            # as src), matching the one-task path's full label table.
            from ray.data.aggregate import Min as AggMin

            stars = (
                contracted.groupby("src")
                .aggregate(AggMin("dst", alias_name="label"))
                .map_batches(
                    lambda b: pa.table({"node": b["src"], "label": b["label"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            roots = (
                contracted.groupby("dst")
                .aggregate(AggMin("dst", alias_name="r"))
                .map_batches(
                    lambda b: pa.table({"node": b["r"], "label": b["r"]}),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            return stars.union(roots)
        prev_sig = sig
        edges, n_edges = contracted, sig[0]
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


def near_dup_clusters(
    ds: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
    concurrency=None,
) -> Dataset:
    """Full cluster-consolidation pipeline over the corpus: MinHash-LSH
    candidates -> exact Jaccard verify (both distributed, see
    jaccard_near_dup_pairs for the exactness argument) -> connected
    components over the qualifying pairs -> every document labeled with
    (doc_id, cluster_id, cluster_size), cluster_id = min doc_id of its
    duplicate component (singletons label themselves, size 1). This is the
    step that turns pairwise near-dup output into actionable dedup: keep
    rows WHERE doc_id = cluster_id, or weight by 1/cluster_size.

    Everything stays distributed: pairs are output-sized, the component
    label table is pair-endpoint-sized, cluster assignment and sizes are
    keyed joins + grouped counts over the corpus — no driver-side
    materialization at any stage."""
    pairs = minhash_candidate_pairs(
        ds, concurrency=concurrency, shingle_k=shingle_k, n_perm=128,
        n_bands=64 if threshold >= 0.5 else 128,
    )
    verified = _verify_pairs_jaccard_ds(ds, pairs, threshold, shingle_k, num_partitions)
    ids = ds.select_columns([id_col])
    return label_clusters(ids, verified, id_col=id_col, num_partitions=num_partitions)


def label_clusters(
    ids: Dataset,
    verified: Dataset | None,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int = 64,
) -> Dataset:
    """Pairs -> per-item cluster labels: connected components over the
    verified (a, b) edges, then every id in ``ids`` gets (cluster_id =
    component min id, cluster_size); unpaired ids label themselves with
    size 1. Shared tail of near_dup_clusters / semantic_dedup — same
    distributed shapes (keyed joins + grouped counts; nothing driver-sized)."""
    from ray.data.aggregate import Sum as AggSum

    def singleton(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                "cluster_id": b[id_col],
                "cluster_size": pa.array(np.ones(b.num_rows, dtype="int64")),
            }
        )

    comp = None
    if verified is not None:
        verified = verified.materialize()  # qualifying-pair-sized
        if verified.count() > 0:
            comp = connected_components(verified, a_col=a_col, b_col=b_col, num_partitions=num_partitions)
    if comp is None:
        return ids.map_batches(singleton, batch_format="pyarrow", zero_copy_batch=True)

    relabeled = comp.map_batches(
        lambda b: pa.table({"node": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # pair-endpoint-sized (component members only)

    # cluster sizes over the COMPONENT TABLE, not the corpus: every node
    # with size > 1 appears in comp, so counting comp rows per label gives
    # exact sizes; singletons get size 1 via the join fill below. Both the
    # partial counts and the grouped sum here are pair-endpoint-sized.
    def partial_count(b: pa.Table) -> pa.Table:
        g = b.group_by("cluster_id").aggregate([("cluster_id", "count")])
        return g.rename_columns(["cluster_id", "pc"])

    sizes = (
        relabeled.map_batches(partial_count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster_id")
        .aggregate(AggSum("pc", alias_name="cluster_size"))
        .map_batches(
            lambda b: pa.table({"cl": b["cluster_id"], "cluster_size": pc.cast(b["cluster_size"], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    labeled = _keyed_join(relabeled, "cluster_id", sizes, "cl", ["cluster_size"], num_partitions=num_partitions)

    # the ONLY corpus-sized shuffle: ids join their (cluster_id, size) row;
    # unmatched ids are singleton clusters of themselves
    return _keyed_join(
        ids, id_col,
        labeled.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "cluster_id": b["cluster_id"], "cluster_size": b["cluster_size"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node", ["cluster_id", "cluster_size"],
        fill_with_key="cluster_id", fill_values={"cluster_size": 1},
        num_partitions=num_partitions,
    )


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Unit-cost Levenshtein distance, early-exited: returns the exact
    distance when <= cap, else cap + 1. Row-vectorized numpy DP — the
    left-to-right dependency cur[j] = min(..., cur[j-1] + 1) folds into
    one np.minimum.accumulate over (candidate - j) (a standard
    reformulation: cur[j] = j + min_{k<=j}(cand[k] - k)). Matches DuckDB's
    levenshtein() (insert/delete/substitute all cost 1)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la == 0 or lb == 0:
        return max(la, lb) if max(la, lb) <= cap else cap + 1
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    j = np.arange(lb + 1, dtype=np.int64)
    prev = j.copy()
    for i, ch in enumerate(a, 1):
        sub = prev[:-1] + (bb != np.uint32(ord(ch)))
        dele = prev[1:] + 1  # from the row above, same column
        cand = np.empty(lb + 1, dtype=np.int64)
        cand[0] = i
        np.minimum(sub, dele, out=cand[1:])
        cur = j + np.minimum.accumulate(cand - j)
        if cur.min() > cap:
            return cap + 1
        prev = cur
    return int(prev[-1]) if prev[-1] <= cap else cap + 1


def edit_distance_near_dups(
    ds: Dataset,
    d: int = 5,
    q: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_key_df: int = 1024,
    num_partitions: int = 64,
) -> Dataset:
    """Edit-distance near-duplicate pairs: all (doc_a < doc_b) with
    unit-cost Levenshtein <= d — the string-similarity join (ED-Join /
    q-gram filter family: Gravano et al. 2001, Xiao et al. 2008; public).

    Scale shape (nothing quadratic, nothing driver-sized):
      1. ONE pass explodes each doc into positional-MULTISET q-gram keys
         (hash64(gram) mixed with the per-doc occurrence index; multiset
         keys keep the count filter sound for repetitive text, and hash
         collisions only merge elements, which by min-superadditivity can
         only OVER-admit candidates — verification removes them).
      2. A key-df aggregate (inverted-index-sized) orders keys globally by
         rarity; each doc keeps its q*d + d + 1 RAREST keys — the PREFIX
         FILTER for the q-gram count bound T = (len_min - q + 1) - q*d
         under the |len_a - len_b| <= d window: any pair within distance d
         shares >= T multiset grams, hence shares a key inside both
         prefixes. Candidate generation therefore joins only df-bounded
         rare keys — hot grams ('the ', boilerplate) never pair-expand.
      3. Per-key pair generation (df >= 2 keys only; ``max_key_df`` guard
         raises on a degenerate key rather than silently exploding),
         hash-partitioned pair dedup, the shared verify-join (_join_legs)
         to attach both texts, and an exact banded Levenshtein verify.

    CONTRACT: every doc must have len >= q*(d+1) — below that T < 1 and
    the q-gram filter cannot prune (use a smaller q for short corpora);
    the gram stage raises on violation. Output: (doc_a, doc_b, dist)."""
    from clawrag_ray.stages.relational import hash_partitioned_groups, pre_aggregate

    min_len = q * (d + 1)
    prefix = q * d + d + 1

    def grams(b: pa.Table) -> pa.Table:
        import pandas as pd

        ids_out: list[np.ndarray] = []
        keys_out: list[np.ndarray] = []
        for doc_id, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            t = text or ""
            if len(t) < min_len:
                raise ValueError(
                    f"edit_distance_near_dups: doc {doc_id} has len {len(t)} < q*(d+1)={min_len} "
                    "(outside the q-gram filter's completeness regime — use a smaller q)"
                )
            g = np.array([t[i : i + q] for i in range(len(t) - q + 1)], dtype=object)
            h = pd.util.hash_array(g)
            occ = pd.Series(h).groupby(h).cumcount().to_numpy()
            # mix the occurrence index in as a second splitmix64 round so
            # (gram, occ) keys spread over the full 64-bit space
            key = _splitmix64(h + occ.astype(np.uint64)).astype(np.int64)
            keys_out.append(key)
            ids_out.append(np.full(len(key), doc_id, dtype=np.int64))
        if not keys_out:
            return pa.table({"key": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())})
        return pa.table(
            {"key": pa.array(np.concatenate(keys_out)), id_col: pa.array(np.concatenate(ids_out))}
        )

    gram_rows = ds.select_columns([id_col, text_col]).map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True
    )
    df_table = pre_aggregate(gram_rows, ["key"], [], count_alias="df")
    with_df = _keyed_join(gram_rows, "key", df_table, "key", ["df"], num_partitions=num_partitions)

    def per_doc_prefix(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["df", "key"], kind="mergesort")
        out = g.groupby(id_col, sort=False).head(prefix)
        # only keys shared by >= 2 docs can generate a pair
        return out[out["df"] >= 2][["key", id_col]]

    prefixes = hash_partitioned_groups(with_df, [id_col], per_doc_prefix, num_partitions=num_partitions)

    def per_key_pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, grp in g.groupby("key", sort=False):
            ids = np.unique(grp[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > max_key_df:
                raise ValueError(
                    f"edit_distance_near_dups: a prefix key is shared by {len(ids)} docs "
                    f"(> max_key_df={max_key_df}) — degenerate near-identical corpus; "
                    "raise max_key_df or dedup exactly first"
                )
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})

    # duplicate candidates (a pair found via several shared prefix keys)
    # are NOT deduped here: the verify pass groups by (doc_a, doc_b), so
    # all copies co-locate and one drop_duplicates there replaces a whole
    # extra shuffle stage (measured ~4 s of fixed cost at sf0.1)
    cand = hash_partitioned_groups(prefixes, ["key"], per_key_pairs, num_partitions=num_partitions)

    cand = cand.materialize()  # candidate-sized by construction
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(empty)

    legs = _explode_pair_legs(cand)
    joined = _join_legs(legs, ds.select_columns([id_col, text_col]), [text_col], num_partitions=num_partitions)

    def verify(g: "pd.DataFrame") -> "pd.DataFrame":
        a = (
            g[g["side"] == 0][["doc_a", "doc_b", text_col]]
            .drop_duplicates(subset=["doc_a", "doc_b"])
            .rename(columns={text_col: "ta"})
        )
        b = (
            g[g["side"] == 1][["doc_a", "doc_b", text_col]]
            .drop_duplicates(subset=["doc_a", "doc_b"])
            .rename(columns={text_col: "tb"})
        )
        m = a.merge(b, on=["doc_a", "doc_b"])
        dists = [_levenshtein_capped(ta or "", tb or "", d) for ta, tb in zip(m["ta"], m["tb"])]
        m = m.assign(dist=np.asarray(dists, dtype=np.int64))[["doc_a", "doc_b", "dist"]]
        return m[m["dist"] <= d]

    verified = hash_partitioned_groups(joined, ["doc_a", "doc_b"], verify, num_partitions=num_partitions)
    # typed empty block pins the schema when nothing qualifies
    import ray.data as rd

    return verified.union(rd.from_arrow(empty))


def containment_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.6,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
    max_shingle_df: int | None = 100_000,
) -> Dataset:
    """Containment near-dup join (Broder 1997's resemblance companion
    measure, public): pairs scored by ``max(|A∩B|/|A|, |A∩B|/|B|)`` over
    distinct word-k-shingle sets — the ASYMMETRIC overlap that catches a
    short doc embedded in a long one, which Jaccard dilutes below any
    usable threshold (|A∩B|/|A∪B| -> |A|/|B| for A ⊂ B).

    Shape: one explode to distinct (doc, shingle) rows (the shared
    _word_shingles rule, so Jaccard/containment/decontamination agree on
    the shingle space); per-doc cardinalities via the two-level count;
    pair intersection counts via ONE hash-partitioned self-merge per
    shingle partition (vectorized pandas merge, no per-group calls) + a
    small pair-keyed sum; cardinalities attach through two distributed
    keyed joins; the score is a single IEEE division per side — bit-equal
    cross-engine, so the threshold comparison is exact. Shingles join by
    their STRING (collision-free, mirrors the oracle); a k-docs-share-a-
    shingle hot key produces k(k-1)/2 pair rows, so ``max_shingle_df``
    is the self-certifying guard (edit_distance_near_dups' max_key_df
    parity): a shingle whose doc list exceeds it RAISES rather than
    quadratically expanding — ubiquitous shingles are boilerplate, not
    duplication signal; strip boilerplate (boilerplate_line_dedup) or
    route through the MinHash candidate path first. The check is exact
    (rows hash-partition BY shingle, so within-partition df == global
    df) and the result stays exact whenever it completes.
    Output: (doc_a, doc_b, n_shared, containment) at containment >=
    threshold."""
    from clawrag_ray.stages.curation import _word_shingles
    from clawrag_ray.stages.relational import hash_partitioned_groups, pre_aggregate

    def explode(b: pa.Table) -> pa.Table:
        ids: list = []
        sh: list[str] = []
        for doc_id, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            s = _word_shingles(text, shingle_k)
            ids.extend([doc_id] * len(s))
            sh.extend(s)
        return pa.table({id_col: pa.array(ids, b[id_col].type), "s": pa.array(sh, pa.string())})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    card = pre_aggregate(rows, [id_col], [], count_alias="c").materialize()

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if max_shingle_df:
            sizes = g["s"].value_counts()
            if len(sizes) and int(sizes.iloc[0]) > max_shingle_df:
                raise ValueError(
                    f"containment_near_dup_pairs: a shingle is shared by {int(sizes.iloc[0])} "
                    f"docs (> max_shingle_df={max_shingle_df}) — boilerplate-hot shingle would "
                    "expand quadratically; strip boilerplate first (boilerplate_line_dedup) or "
                    "raise max_shingle_df"
                )
        m = g.merge(g, on="s")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = (
            m.groupby([f"{id_col}_x", f"{id_col}_y"], as_index=False)
            .size()
            .rename(columns={f"{id_col}_x": "doc_a", f"{id_col}_y": "doc_b", "size": "p"})
        )
        out["p"] = out["p"].astype("int64")
        return out

    pair_partials = hash_partitioned_groups(rows, ["s"], per_part, num_partitions=num_partitions)

    # pair-keyed sum as ONE hash-partitioned vectorized pass (Ray's
    # sort-based two-key groupby measured 33 s on the same 1.1M pair rows
    # this pass does in ~2 s), then an EXACT count prune before the
    # cardinality joins: containment = i / min(|A|,|B|) >= t requires
    # i >= t * (corpus-min cardinality) — a tiny aggregate buys the floor.
    # The pruned pair set MATERIALIZES so the keyed joins' schema probes
    # don't re-execute the aggregation upstream (measured 3x re-run).
    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False)["p"].sum()
        out = out.rename(columns={"p": "sum_p"})
        out["sum_p"] = out["sum_p"].astype("int64")
        return out

    inter = hash_partitioned_groups(
        pair_partials, ["doc_a", "doc_b"], sum_pairs, num_partitions=num_partitions
    )

    from ray.data.aggregate import Min as AggMin

    gm = card.aggregate(AggMin("c"))
    min_card = int(gm["min(c)"]) if gm and gm.get("min(c)") is not None else 0
    floor = int(np.ceil(threshold * min_card))
    inter = inter.map_batches(
        lambda b: b.filter(pc.greater_equal(pc.cast(b["sum_p"], pa.int64()), max(1, floor))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if inter.count() == 0:
        # typed empty result: the keyed-join schema probe cannot read a
        # schemaless (all rows pruned) Dataset
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_a", pa.int64()),
                    ("doc_b", pa.int64()),
                    ("n_shared", pa.int64()),
                    ("containment", pa.float64()),
                ]
            ).empty_table()
        )

    with_ca = _keyed_join(
        inter.select_columns(["doc_a", "doc_b", "sum_p"]),
        "doc_a",
        card.select_columns([id_col, "c"]),
        id_col,
        ["c"],
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.rename_columns(["doc_a", "doc_b", "n_shared", "ca"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    with_cb = _keyed_join(
        with_ca,
        "doc_b",
        card.select_columns([id_col, "c"]),
        id_col,
        ["c"],
        num_partitions=num_partitions,
    )

    def score(b: pa.Table) -> pa.Table:
        i = pc.cast(b["n_shared"], pa.float64()).to_numpy(zero_copy_only=False)
        ca = pc.cast(b["ca"], pa.float64()).to_numpy(zero_copy_only=False)
        cb = pc.cast(b["c"], pa.float64()).to_numpy(zero_copy_only=False)
        cont = np.maximum(i / ca, i / cb)
        keep = cont >= threshold
        return pa.table(
            {
                "doc_a": b["doc_a"].filter(pa.array(keep)),
                "doc_b": b["doc_b"].filter(pa.array(keep)),
                "n_shared": pc.cast(b["n_shared"], pa.int64()).filter(pa.array(keep)),
                "containment": pa.array(np.round(cont[keep], 6)),
            }
        )

    return with_cb.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def containment_candidates_prefix(
    ds: Dataset,
    threshold: float = 0.6,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
    max_shingle_df: int | None = 100_000,
) -> Dataset:
    """Prefix-filtered candidate pairs for the containment join (the
    PPJoin/All-Pairs prefix principle, Bayardo 2007 / Xiao 2008, public):
    order every doc's shingles by GLOBAL rarity (ascending document
    frequency, ties by string) and emit only the first
    ``|A| - ceil(t*|A|) + 1`` as the doc's PREFIX. A pair with
    containment >= t overlaps in >= ceil(t*min(|A|,|B|)) shingles, and
    removing the smaller doc's prefix leaves only ceil(t*|A|) - 1 of its
    shingles — so every qualifying pair shares at least one (prefix,
    any) shingle occurrence: candidates = prefix-rows joined against all
    rows, a provable SUPERSET of the answer generated without touching
    the (boilerplate-hot) common-shingle mass that makes the naive
    self-join quadratic. ``max_shingle_df`` self-certifies even the
    prefix volume: a shingle whose doc list exceeds it raises (the
    prefix x all merge for that shingle would still be quadratic-ish on
    a degenerate corpus; strip boilerplate or dedup exactly first).
    Output: distinct (doc_a, doc_b)."""
    from ray.data.aggregate import Sum as AggSum

    from clawrag_ray.stages.relational import hash_partitioned_groups, pre_aggregate

    def explode(b: pa.Table) -> pa.Table:
        ids: list = []
        sh: list[str] = []
        for doc_id, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            s = _shingle_strings(text or "", shingle_k)
            ids.extend([doc_id] * len(s))
            sh.extend(sorted(s))
        return pa.table({id_col: pa.array(ids, b[id_col].type), "s": pa.array(sh, pa.string())})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    df_tbl = pre_aggregate(rows.select_columns(["s"]), ["s"], [], count_alias="df").map_batches(
        lambda b: pa.table({"s_f": b["s"], "df": pc.cast(b["df"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    with_df = _keyed_join(rows, "s", df_tbl, "s_f", ["df"], num_partitions=num_partitions)

    def mark_prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "df", "s"], kind="mergesort")
        grp = g.groupby(id_col, sort=False)
        pos = grp.cumcount().to_numpy()
        c = grp[id_col].transform("size").to_numpy()
        plen = c - np.ceil(threshold * c).astype(np.int64) + 1
        keep = pos < plen
        return g[keep][[id_col, "s"]]

    prefix_rows = hash_partitioned_groups(with_df, [id_col], mark_prefix, num_partitions=num_partitions)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("side", pa.array(np.full(b.num_rows, side, dtype=np.int8)))

        return fn

    unioned = prefix_rows.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True).union(
        rows.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 1][["s", id_col]].rename(columns={id_col: "dp"})
        a = g[g["side"] == 0][["s", id_col]].rename(columns={id_col: "da"})
        if max_shingle_df:
            sizes = a["s"].value_counts()
            if len(sizes) and int(sizes.iloc[0]) > max_shingle_df:
                raise ValueError(
                    f"containment_candidates_prefix: a shingle is shared by {int(sizes.iloc[0])} "
                    f"docs (> max_shingle_df={max_shingle_df}) — boilerplate-hot shingle; strip "
                    "boilerplate first (boilerplate_line_dedup) or raise max_shingle_df"
                )
        m = p.merge(a, on="s")
        m = m[m["dp"] != m["da"]]
        if m.empty:
            return pd.DataFrame(
                {"doc_a": pd.array([], dtype="int64"), "doc_b": pd.array([], dtype="int64")}
            )
        lo = np.minimum(m["dp"].to_numpy(), m["da"].to_numpy())
        hi = np.maximum(m["dp"].to_numpy(), m["da"].to_numpy())
        return pd.DataFrame({"doc_a": lo, "doc_b": hi}).drop_duplicates()

    cand = hash_partitioned_groups(unioned, ["s"], pairs, num_partitions=num_partitions)
    # cross-partition dedup (a pair can surface under several shingles)
    return pre_aggregate(cand, ["doc_a", "doc_b"], []).select_columns(["doc_a", "doc_b"])


def containment_near_dup_pairs_prefix(
    ds: Dataset,
    threshold: float = 0.6,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
    max_shingle_df: int | None = 100_000,
) -> Dataset:
    """Scale path for the containment join: prefix-filtered candidates
    (containment_candidates_prefix — provable superset) + exact
    containment verify through the pair-leg bucket join (the minhash
    verify machinery: legs join the corpus texts once, shingle sets
    memoized per doc per partition). Output equals
    containment_near_dup_pairs row-for-row (equality pinned in pytest);
    only the candidate-generation cost differs — rare-shingle-prefix
    volume instead of the full shared-shingle self-join."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    cand = containment_candidates_prefix(
        ds, threshold, shingle_k, id_col, text_col, num_partitions, max_shingle_df
    ).materialize()
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_shared", pa.int64()), ("containment", pa.float64())]
            ).empty_table()
        )
    legs = _explode_pair_legs(cand.map_batches(
        lambda b: pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"]}), batch_format="pyarrow"
    ))
    joined = _join_legs(legs, ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pa.table({"doc_id": b[id_col], "text": b[text_col]}), batch_format="pyarrow"
    ), ["text"], num_partitions=num_partitions)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["doc_a", "doc_b", "text"]].rename(columns={"text": "text_a"})
        b = g[g["side"] == 1][["doc_a", "doc_b", "text"]].rename(columns={"text": "text_b"})
        m = a.merge(b, on=["doc_a", "doc_b"])
        cache: dict = {}

        def sh(key, text):
            if key not in cache:
                cache[key] = _shingle_strings(text or "", shingle_k)
            return cache[key]

        out_i, out_c = [], []
        for da, db, ta, tb in zip(m["doc_a"], m["doc_b"], m["text_a"], m["text_b"]):
            sa, sb = sh(da, ta), sh(db, tb)
            inter = len(sa & sb)
            out_i.append(inter)
            out_c.append(inter / min(len(sa), len(sb)) if inter else 0.0)
        # threshold the UNROUNDED ratio (exact-path parity — rounding first
        # would keep a value 5e-7 below threshold the exact path drops),
        # round only for the output column
        m = m.assign(n_shared=pd.array(out_i, dtype="int64"), __c=out_c)
        m = m[m["__c"] >= threshold]
        m = m.assign(containment=np.round(m["__c"].to_numpy(), 6))
        return m[["doc_a", "doc_b", "n_shared", "containment"]]

    return hash_partitioned_groups(joined, ["doc_a", "doc_b"], per_part, num_partitions=num_partitions)


def record_linkage_clusters(
    ds: Dataset,
    d: int = 5,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """End-to-end entity resolution (the Hernandez-Stolfo merge/purge
    pipeline shape): sorted-neighborhood BLOCKING on the (length, id)
    key -> capped-Levenshtein VERIFY of the linear candidate stream
    (pair legs join the corpus texts once, the minhash verify machinery)
    -> connected-component CLUSTERING with min-id labels (label_clusters,
    shared with every near-dup consolidation here). Every record gets a
    (cluster_id, cluster_size); singletons label themselves. Linear
    candidate volume (n·window), candidate-bounded verify, nothing
    driver-sized."""
    from clawrag_ray.stages.curation import global_rank  # noqa: F401  (via sorted_neighborhood)
    from clawrag_ray.stages.relational import sorted_neighborhood_pairs

    def pack(b: pa.Table) -> pa.Table:
        n = pc.utf8_length(b[text_col]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        i = b[id_col].to_numpy(zero_copy_only=False)
        # int64 (len << 32) | id pack: silent wrap would corrupt the sort
        # order sorted_neighborhood_pairs requires — fail loudly instead
        if len(i) and (int(i.max()) >= (1 << 32) or int(i.min()) < 0 or int(n.max()) >= (1 << 31)):
            raise ValueError(
                "record_linkage_clusters: the (length, id) int64 pack requires "
                "0 <= doc_id < 2^32 and text length < 2^31; map ids through a "
                "surrogate rank (curation.global_rank) beyond that"
            )
        return pa.table(
            {id_col: b[id_col], "__ord": pa.array(n * (1 << 32) + i, pa.int64())}
        )

    packed = ds.select_columns([id_col, text_col]).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = (
        sorted_neighborhood_pairs(packed, "__ord", id_col, window=window, num_partitions=num_partitions)
        .map_batches(
            lambda b: pa.table({"doc_a": b["id_a"], "doc_b": b["id_b"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if cand.count() == 0:
        verified = None
    else:
        legs = _explode_pair_legs(cand)
        joined = _join_legs(
            legs,
            ds.select_columns([id_col, text_col]).map_batches(
                lambda b: pa.table({"doc_id": b[id_col], "text": b[text_col]}), batch_format="pyarrow"
            ),
            ["text"],
            num_partitions=num_partitions,
        )

        def verify(g: pd.DataFrame) -> pd.DataFrame:
            a = g[g["side"] == 0][["doc_a", "doc_b", "text"]].rename(columns={"text": "ta"})
            b = g[g["side"] == 1][["doc_a", "doc_b", "text"]].rename(columns={"text": "tb"})
            m = a.merge(b, on=["doc_a", "doc_b"])
            dists = [_levenshtein_capped(ta or "", tb or "", d) for ta, tb in zip(m["ta"], m["tb"])]
            m = m.assign(dist=np.asarray(dists, dtype=np.int64))
            return m[m["dist"] <= d][["doc_a", "doc_b"]]

        from clawrag_ray.stages.relational import hash_partitioned_groups

        verified = hash_partitioned_groups(
            joined, ["doc_a", "doc_b"], verify, num_partitions=num_partitions
        )
    return label_clusters(
        ds.select_columns([id_col]), verified, id_col=id_col, num_partitions=num_partitions
    )


def minhash_incremental_near_dups(
    new_ds: Dataset,
    seen_ds: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    n_perm: int = 128,
    n_bands: int = 64,
    num_partitions: int = 64,
    max_bucket_size: int | None = None,
    seen_bands: Dataset | None = None,
    assume_disjoint_ids: bool = False,
) -> Dataset:
    """Incremental MinHash dedup — near-dup pairs for a NEW crawl batch
    against an already-indexed corpus (plus within the batch itself)
    WITHOUT re-pairing the seen corpus against itself: band rows from
    both sides share the LSH bucket space, but bucket pair generation
    emits only pairs touching >= 1 new doc — the seen x seen quadratic
    mass (the bulk, forever re-found by a full re-run) never exists.

    Pass ``seen_bands`` (a Dataset of persisted (doc_id, band_id,
    band_hash) rows — minhash_band_table's output, written once when the
    corpus was indexed) and the seen corpus is never re-shingled: one
    banding pass over the BATCH plus a bucket join against the stored
    rows, the real 10^12-doc deployment shape. ``seen_ds`` is still
    required — the exact-Jaccard verify needs the seen TEXTS (joined
    once, distributed; only candidate docs' texts move).

    doc_id collisions across sides (a re-crawled doc) are handled: bucket
    pair emission never self-pairs, and the verify corpus dedupes by
    doc_id PREFERRING THE NEW side's text. Set
    ``assume_disjoint_ids=True`` when the caller guarantees disjoint ids
    to skip that dedup shuffle. ``max_bucket_size`` drops degenerate
    band buckets (see minhash_candidate_pairs — exact-dup-heavy crawls).

    Exact Jaccard verify via the pair-leg bucket join over the union
    corpus; same (1 - J^r)^b miss bound as minhash_near_dups, so at
    threshold >= 0.5 the output equals the exact cross-pair sweep (the
    oracle). Returns (doc_a, doc_b, jaccard) as a Dataset."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    minhash_kw = {"shingle_k": shingle_k, "n_perm": n_perm, "n_bands": n_bands}

    def tag(ds: Dataset, is_new: int) -> Dataset:
        def add_flag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "is_new", pa.array(np.full(t.num_rows, is_new, dtype=np.int8))
            )

        return ds.map_batches(add_flag, batch_format="pyarrow", zero_copy_batch=True)

    seen_band_rows = (
        seen_bands.select_columns(["doc_id", "band_id", "band_hash"])
        if seen_bands is not None
        else minhash_band_table(seen_ds, **minhash_kw)
    )
    bands = tag(minhash_band_table(new_ds, **minhash_kw), 1).union(tag(seen_band_rows, 0))

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=g["doc_id"].dtype),
                "doc_b": pd.Series([], dtype=g["doc_id"].dtype),
            }
        )
        colliding = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
        if colliding.empty:
            return empty
        srt = colliding.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
        codes = srt.groupby(["band_id", "band_hash"], sort=False).ngroup().to_numpy()
        ids = srt["doc_id"].to_numpy()
        isnew = srt["is_new"].to_numpy() != 0
        if max_bucket_size:
            sizes = np.bincount(codes)
            keep = sizes[codes] <= max_bucket_size
            ids, codes, isnew = ids[keep], codes[keep], isnew[keep]
        ai, bi = _sorted_group_pair_indices(codes)
        # >= 1 new side, and never a self-pair (re-crawled doc_id on both sides)
        mask = (isnew[ai] | isnew[bi]) & (ids[ai] != ids[bi])
        if not mask.any():
            return empty
        return pd.DataFrame({"doc_a": ids[ai][mask], "doc_b": ids[bi][mask]}).drop_duplicates()

    cand = hash_partitioned_groups(bands, ["band_id", "band_hash"], part_pairs, num_partitions=num_partitions)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    cand = hash_partitioned_groups(cand, ["doc_a", "doc_b"], dedup_pairs, num_partitions=num_partitions).materialize()

    corpus = tag(new_ds.select_columns(["doc_id", "text"]), 1).union(
        tag(seen_ds.select_columns(["doc_id", "text"]), 0)
    )
    if assume_disjoint_ids:
        corpus = corpus.select_columns(["doc_id", "text"])
    else:
        # re-crawled ids carry two texts; keep the NEW side's (stable sort)
        def prefer_new(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("is_new", ascending=False, kind="mergesort")
            return g.drop_duplicates("doc_id")[["doc_id", "text"]]

        corpus = hash_partitioned_groups(corpus, ["doc_id"], prefer_new, num_partitions=num_partitions)
    verified = _verify_pairs_jaccard_ds(corpus, cand, threshold, shingle_k, num_partitions)
    if verified is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
            ).empty_table()
        )
    return verified
