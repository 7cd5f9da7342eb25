"""Deduplication operators (SURVEY.md §2.8 + the training-data-pipeline
dedup suite: exact, versioning policies, MinHash+LSH, SimHash, n-gram
Jaccard).

Scale design notes:
  * exact dedup pre-aggregates per batch (arrow group_by) before the global
    groupby, so the shuffle moves one row per (key, batch) not per doc.
  * MinHash/LSH is the shingle -> signature -> band-bucket groupby pattern;
    only (band_hash, doc_id) pairs shuffle, never documents.
  * candidate verification broadcasts the shingle sets via ray.put for the
    sandbox-scale corpus; at 10^12 docs this becomes a hash-bucket join of
    (doc_id, shingles) against candidates (documented, not needed here).

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
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from clawrag_ray.functions.kernels import sha256_hex

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


def dedup_versions(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """VERSION policy (deduplication_service.py:29-199): every copy of the
    same content gets a version number in id order; only the newest stays
    active. Returns (doc_id, version, is_active)."""
    hashed = with_text_hash(ds.select_columns([id_col, text_col]), text_col)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col).reset_index(drop=True)
        group["version"] = np.arange(1, len(group) + 1, dtype=np.int64)
        group["is_active"] = group["version"] == len(group)
        return group[[id_col, "version", "is_active"]]

    return hashed.groupby("text_sha256").map_groups(assign, batch_format="pandas")


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
    words = text.lower().split()
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


def minhash_candidate_pairs(ds: Dataset, concurrency=None, **minhash_kw) -> Dataset:
    """documents(doc_id, text) -> candidate near-dup pairs (doc_a, doc_b)
    via LSH band buckets. Pairs are deduped across bands.

    The banding stage runs as TASKS with a per-worker-process cached
    hasher, not an actor pool: the state is ~2 KB of permutation params, so
    pool ramp-up would cost more than the whole stage (measured 6.4 s ->
    ~2 s on 5k docs). The bucket collection is a shuffle AGGREGATE (collect
    doc_ids per (band_id, band_hash)), not map_groups — per-group task
    overhead on the overwhelmingly-singleton buckets would dominate
    otherwise. Cross-band pair dedup happens on the driver: LSH candidate
    pairs are small by construction (bounded by band collisions, not corpus
    size); a shuffle dedup would add a full execution for a few thousand
    rows."""
    from ray.data.aggregate import AggregateFn

    def band_rows(batch: pa.Table) -> pa.Table:
        return _cached_hasher(**minhash_kw)(batch)

    kw = {"concurrency": concurrency} if concurrency else {}
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        band_rows,
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kw,
    )
    collect = AggregateFn(
        init=lambda k: [],
        merge=lambda a, b: a + b,
        name="doc_ids",
        accumulate_block=lambda a, block: a + block["doc_id"].to_pylist(),
    )
    buckets = bands.groupby(["band_id", "band_hash"]).aggregate(collect)

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for ids in batch["doc_ids"].to_pylist():
            if len(ids) < 2:
                continue
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        elem = batch.schema.field("doc_ids").type
        elem = elem.value_type if hasattr(elem, "value_type") else pa.int64()
        return pa.table({"doc_a": pa.array(out_a, elem), "doc_b": pa.array(out_b, elem)})

    pairs = buckets.map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None)
    # dedup pairs discovered in multiple bands: driver-side (pairs are
    # candidate-sized, not corpus-sized) — avoids a second shuffle execution
    import ray.data

    pdf = pairs.to_pandas().drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
    return ray.data.from_pandas(pdf)


def minhash_near_dups(
    ds: Dataset,
    threshold: float = 0.8,
    shingle_k: int = 3,
    concurrency=None,
) -> pd.DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact n-gram Jaccard
    verification. The verify step broadcasts the candidate docs' texts via
    ray.put (candidates only, not the corpus); returns a pandas DataFrame
    (doc_a, doc_b, jaccard) — small by construction."""
    import ray

    pairs = minhash_candidate_pairs(ds, concurrency=concurrency, shingle_k=shingle_k).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])

    def texts_of(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch["doc_id"], value_set=pa.array(list(cand_ids)))
        return batch.filter(mask).select(["doc_id", "text"])

    texts = ds.map_batches(texts_of, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    lookup_ref = ray.put(dict(zip(texts["doc_id"], texts["text"])))

    @ray.remote
    def verify(chunk: pd.DataFrame, lookup_ref) -> pd.DataFrame:
        lookup = lookup_ref
        chunk = chunk.copy()
        chunk["jaccard"] = [
            ngram_jaccard(lookup.get(a, ""), lookup.get(b, ""), shingle_k)
            for a, b in zip(chunk["doc_a"], chunk["doc_b"])
        ]
        return chunk

    n_chunks = max(1, min(16, len(pairs) // 256))
    futures = [verify.remote(c, lookup_ref) for c in np.array_split(pairs, n_chunks)]
    verified = pd.concat(ray.get(futures), ignore_index=True)
    return verified[verified["jaccard"] >= threshold].reset_index(drop=True)


def _shingle_strings(text: str, k: int) -> frozenset[str]:
    """Distinct k-word shingles as STRINGS (not hashed) — oracle-parity
    variant of word_shingles: matches DuckDB
    ``list_distinct([words[i]||' '||...])`` semantics exactly, including
    the <k-words fallback to one joined shingle ('' for empty text)."""
    words = text.lower().split()
    if len(words) < k:
        return frozenset([" ".join(words)])
    return frozenset(" ".join(words[i : i + k]) for i in range(len(words) - k + 1))


def jaccard_near_dup_pairs(
    ds: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    concurrency=(1, 8),
) -> pd.DataFrame:
    """Exact all-pairs word-k-gram Jaccard near-dup detection: all
    (doc_a < doc_b) pairs with Jaccard(shingles_a, shingles_b) >= threshold.
    Returns (doc_a, doc_b, jaccard rounded to 6), sorted.

    Distribution: the corpus's (doc_id, shingle-set) list is broadcast once
    via ray.put; each batch compares its docs against the broadcast list
    (only ids greater than its own, so every pair is computed once). This is
    the exact-verification kernel; at 10^12-doc scale the quadratic scan is
    replaced by LSH candidate pruning (minhash_candidate_pairs) feeding the
    same per-pair Jaccard — kept exact here as the correctness baseline the
    DuckDB oracle can check."""
    import ray

    shingled = ds.select_columns(["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "shingles": pa.array(
                    [sorted(_shingle_strings(t or "", shingle_k)) for t in b["text"].to_pylist()],
                    pa.list_(pa.string()),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    all_df = shingled.to_pandas()
    corpus = sorted(
        ((int(i), frozenset(s)) for i, s in zip(all_df["doc_id"], all_df["shingles"])),
        key=lambda t: t[0],
    )
    ref = ray.put(corpus)

    class PairScanner:
        def __init__(self):
            self.corpus = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for doc_id, sh in zip(batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()):
                sa = frozenset(sh)
                for other_id, sb in self.corpus:
                    if other_id <= doc_id:
                        continue
                    inter = len(sa & sb)
                    if not inter:
                        continue
                    j = inter / (len(sa) + len(sb) - inter)
                    if j >= threshold:
                        out_a.append(doc_id)
                        out_b.append(other_id)
                        out_j.append(round(j, 6))
            return pa.table(
                {
                    "doc_a": pa.array(out_a, pa.int64()),
                    "doc_b": pa.array(out_b, pa.int64()),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

    pairs = shingled.map_batches(
        PairScanner, batch_format="pyarrow", concurrency=concurrency, zero_copy_batch=True
    )
    return pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word unigrams (stateless math, actor-pool for
    warm numpy buffers)."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        words = text.lower().split()
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
