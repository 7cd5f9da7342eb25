"""Training-data curation operators: sequence packing (global ordered
prefix sum), per-stratum quota sampling and temperature-based data mixing,
deterministic train/val/test splitting, PII scrubbing, and benchmark
decontamination.

These are engine additions for the 100 TB training-data pipeline (no
counterpart in the reference, whose scope ends at extraction/retrieval —
see SURVEY.md §2.9): the operations a pretraining data pipeline runs
after dedup/quality filtering to turn a document table into model input.

Scale notes
-----------
* ``global_prefix_sum`` is the distributed primitive under packing: the
  classic two-phase scan (per-bucket partial sums -> tiny driver-side
  exclusive prefix over bucket totals -> broadcast offsets -> per-bucket
  ordered cumsum). Only bucket TOTALS (num_buckets rows) ever leave the
  workers; the data shuffles once, by bucket.
* ``quota_sample`` reuses the salted top-n machinery, so a stratum holding
  most of the corpus (the common "en is 90% of the web" skew) splits into
  subgroups before the per-group head.
* ``pii_scrub`` is pure vectorized Arrow RE2 kernels
  (count_substring_regex / replace_substring_regex) — no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from clawrag_ray.functions.kernels import md5_prefix_ints, re2_tokens

# ---------------------------------------------------------------------------
# token counting (whitespace tokens — SQL mirror: length(regexp_extract_all(text, '\S+')))
# ---------------------------------------------------------------------------


class _BpeTokenCounter:
    """Actor-pool stage: per-doc SUBWORD token count under a trained BPE
    merge table. The merge table (vocab-bounded, a few KB) broadcasts once
    via ray.put and each actor fetches it in __init__; encoded-word lengths
    memoize in a per-actor dict (vocab-bounded), so repeated words across
    batches cost one dict hit. Map-only — no shuffle; per-doc counts are a
    pure row function once the merges are broadcast."""

    def __init__(self, merges_ref, id_col: str, text_col: str):
        import ray

        self.merges = [tuple(m) for m in ray.get(merges_ref)]
        self.id_col, self.text_col = id_col, text_col
        self.cache: dict = {}

    def _wlen(self, w: str) -> int:
        k = self.cache.get(w)
        if k is None:
            from clawrag_ray.stages.text_analysis import bpe_apply

            k = len(bpe_apply(tuple(w), self.merges))
            self.cache[w] = k
        return k

    def __call__(self, b: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(pc.utf8_lower(b[self.text_col]), pattern=r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = lst.offsets.to_numpy(zero_copy_only=False)
        words = lst.values.to_pylist()
        wl = self._wlen
        lens = np.fromiter((wl(w) for w in words), dtype=np.int64, count=len(words))
        # per-doc sum via the offset ranges ('' boundary artifacts of \s+
        # split encode to 0 tokens, matching the \S+ extraction count)
        cums = np.concatenate([[0], np.cumsum(lens)])
        n = cums[offs[1:]] - cums[offs[:-1]]
        return pa.table({self.id_col: b[self.id_col], "n_tokens": pa.array(n, pa.int64())})


def token_count_table(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges=None,
    concurrency=(1, 8),
) -> Dataset:
    """(id, n_tokens): whitespace token counts by default, or — with
    ``merges=`` (ordered (left, right) pairs from
    text_analysis.bpe_train) — true BPE SUBWORD counts, so packing budgets
    real model tokens. Both paths are map-only; the BPE path is an actor
    pool holding the broadcast merge table (see _BpeTokenCounter)."""

    if merges is not None:
        import ray

        ref = ray.put([tuple(m) for m in merges])
        return ds.select_columns([id_col, text_col]).map_batches(
            _BpeTokenCounter,
            fn_constructor_kwargs={"merges_ref": ref, "id_col": id_col, "text_col": text_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b[text_col], pattern=r"\S+")
        return pa.table({id_col: b[id_col], "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# global ordered prefix sum -> sequence packing
# ---------------------------------------------------------------------------


def global_prefix_sum(
    ds: Dataset,
    order_col: str,
    value_col: str,
    num_buckets: int = 64,
    num_partitions: int = 64,
    boundaries: str = "range",
    sample_limit: int = 65536,
) -> Dataset:
    """Add ``cum_before`` = exclusive prefix sum of ``value_col`` in global
    ``order_col`` order, distributed as a two-phase scan:

    1. bucket rows by ``order_col`` (see below);
    2. per-bucket totals (num_buckets rows) come to the driver, which
       computes the exclusive prefix over buckets in order;
    3. offsets broadcast back; one hash-partitioned pass computes each
       bucket's internal ordered cumsum plus its offset.

    ``boundaries="range"`` uses equal-width buckets over [min, max] —
    right for roughly uniform ids (dense corpus ids). For skewed key
    spaces ``boundaries="sampled"`` derives the cut points from the
    quantiles of a bounded sample instead (the Ray sort-boundary recipe),
    which balances bucket sizes without touching steps 2-3 — the RESULT
    is identical either way (bucketing only partitions; the cumsum math
    never depends on boundary placement), only the per-task row balance
    changes. One bucket's rows must fit a task (same contract as
    hash_partitioned_groups)."""
    from clawrag_ray.stages.relational import hash_partitioned_groups
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(order_col), Max(order_col))
    lo, hi = mm[f"min({order_col})"], mm[f"max({order_col})"]
    if lo is None:  # empty input
        return ds.map_batches(
            lambda b: b.append_column("cum_before", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )

    if boundaries == "sampled":
        # per-block evenly-spaced sample, NOT limit(): limit reads the
        # first blocks in execution order, and when order_col correlates
        # with block order (monotone ids — the case that needs sampling)
        # every cut would land in the low range, funneling the corpus
        # into one bucket. Each block contributes <= per_block rows, so
        # the collected sample is ~per_block x n_blocks (at extreme block
        # counts, sample the sample again).
        per_block = max(8, sample_limit // 256)

        def block_sample(b: pa.Table) -> pa.Table:
            n = b.num_rows
            if n == 0:
                return b.select([order_col])
            idx = np.unique(np.linspace(0, n - 1, min(per_block, n)).astype(np.int64))
            return b.select([order_col]).take(pa.array(idx))

        sample = (
            ds.select_columns([order_col])
            .map_batches(block_sample, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .to_pandas()[order_col]
            .to_numpy()
        )
        qs = np.quantile(sample, np.linspace(0, 1, num_buckets + 1)[1:-1])
        cuts = np.unique(qs)  # interior cut points, sorted

        def bucket_of(b: pa.Table) -> pa.Table:
            v = b[order_col].to_numpy()
            return b.append_column("__bucket", pa.array(np.searchsorted(cuts, v, side="right"), pa.int64()))

    elif boundaries == "range":
        width = max(1, (int(hi) - int(lo) + num_buckets) // num_buckets)

        def bucket_of(b: pa.Table) -> pa.Table:
            v = b[order_col].to_numpy()
            return b.append_column("__bucket", pa.array((v - lo) // width, pa.int64()))

    else:
        raise ValueError(f"unknown boundaries mode: {boundaries}")

    bucketed = ds.map_batches(bucket_of, batch_format="pyarrow", zero_copy_batch=True)
    totals = (
        bucketed.groupby("__bucket").aggregate(Sum(value_col, alias_name="__tot")).to_pandas()
    )  # num_buckets rows — tiny by construction
    totals = totals.sort_values("__bucket")
    offsets = dict(
        zip(totals["__bucket"], np.concatenate([[0], np.cumsum(totals["__tot"].to_numpy())[:-1]]))
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bk, grp in g.groupby("__bucket", sort=False):
            grp = grp.sort_values(order_col, kind="mergesort")
            vals = grp[value_col].to_numpy()
            grp = grp.assign(cum_before=int(offsets[bk]) + np.cumsum(vals) - vals)
            out.append(grp)
        return pd.concat(out, ignore_index=True).drop(columns="__bucket")

    return hash_partitioned_groups(bucketed, ["__bucket"], per_part, num_partitions=num_partitions)


def global_rank(
    ds: Dataset,
    order_col: str,
    out_col: str = "rnk",
    num_buckets: int = 64,
    num_partitions: int = 64,
) -> Dataset:
    """Global ROW_NUMBER() OVER (ORDER BY order_col) — a materialized
    corpus-wide total order WITHOUT a single-node sort: ranking ones
    through the two-phase prefix-sum scan (per-range-bucket totals, tiny
    driver prefix, per-bucket ordered cumsum). ``order_col`` must be
    unique (pack tiebreak columns into it); ties would rank
    nondeterministically."""

    def with_one(b: pa.Table) -> pa.Table:
        return b.append_column("__one", pa.array(np.ones(b.num_rows, dtype=np.int64)))

    ranked = global_prefix_sum(
        ds.map_batches(with_one, batch_format="pyarrow", zero_copy_batch=True),
        order_col,
        "__one",
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.append_column(out_col, pc.add(b["cum_before"], 1))
        return b.drop_columns(["__one", "cum_before"])

    return ranked.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def pack_sequences(
    ds: Dataset,
    order_col: str,
    token_col: str,
    budget: int = 2048,
    num_buckets: int = 64,
) -> Dataset:
    """Concatenate-and-chunk sequence packing (the GPT-style pretraining
    layout): documents concatenate in ``order_col`` order and split every
    ``budget`` tokens; each doc reports the bin range it lands in —
    start_bin = cum_before // budget, end_bin covers its last token (a doc
    may straddle bins). Zero-token docs pin to their boundary bin.
    Built on global_prefix_sum, so nothing corpus-sized leaves the workers."""
    with_cum = global_prefix_sum(ds, order_col, token_col, num_buckets=num_buckets)

    def bins(b: pa.Table) -> pa.Table:
        cum = b["cum_before"].to_numpy()
        tok = b[token_col].to_numpy()
        return pa.table(
            {
                order_col: b[order_col],
                token_col: b[token_col],
                "start_bin": pa.array(cum // budget, pa.int64()),
                "end_bin": pa.array((cum + np.maximum(tok, 1) - 1) // budget, pa.int64()),
            }
        )

    return with_cum.map_batches(bins, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quota sampling (data mixing)
# ---------------------------------------------------------------------------


def quota_sample(
    ds: Dataset,
    stratum_cols: list[str],
    cap: int,
    id_col: str = "doc_id",
    salt: int | None = None,
) -> Dataset:
    """At most ``cap`` rows per stratum, chosen content-deterministically
    (md5(id) ascending, id tiebreak) — the data-mixing primitive that
    rebalances a skewed corpus (e.g. per-language caps) reproducibly
    across runs and cluster layouts, unlike random sampling. SQL mirror:
    row_number() OVER (PARTITION BY stratum ORDER BY md5-prefix-int, id)
    <= cap. Pass ``salt`` for strata too hot for one group task (same
    two-phase split as top_n_per_group — selection is split-invariant)."""
    from clawrag_ray.stages.relational import top_n_per_group

    def add_hash(b: pa.Table) -> pa.Table:
        # md5 is for cross-engine parity (DuckDB mirrors it exactly);
        # batched digest of the id column only — text never touched
        h = -md5_prefix_ints(b[id_col].to_pylist())
        return b.append_column("__neg_hash", pa.array(h, pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return top_n_per_group(
        hashed, stratum_cols, "__neg_hash", cap, tiebreak_col=id_col, salt=salt
    ).drop_columns(["__neg_hash"])


def temperature_sample(
    ds: Dataset,
    stratum_cols: list[str],
    temperature: float = 2.0,
    scale: float = 1.0,
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> Dataset:
    """Temperature-based data mixing (the multilingual-pretraining
    up/down-sampling rule, public mBERT/XLM-R formulation): stratum i with
    n_i rows keeps ``min(n_i, floor(scale * n_i^(1/temperature)))`` rows —
    T=1 preserves proportions, T->inf flattens strata toward parity.
    Selection within a stratum is content-deterministic (md5(id) asc, id
    tiebreak), so the sample is reproducible across runs and layouts.

    The per-stratum target deliberately avoids cross-stratum NORMALIZED
    weights (n_i^(1/T) / sum_j n_j^(1/T)): the sum's floating-point value
    depends on accumulation order, which differs between engines and would
    make floor() targets unverifiable. ``scale`` plays the normalizer's
    role explicitly; with T=2 the root is sqrt (IEEE-exact in numpy and
    DuckDB alike), making targets bit-reproducible for the oracle.

    Counts are a tiny per-stratum aggregate; selection is one
    hash-partitioned group pass (strata hotter than one group task: give
    ``quota_sample`` semantics with salt, selection is split-invariant)."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    # null-safe strata counts: Ray's sort-based groupby cannot order a
    # NULL string key against real ones, so count per batch with Arrow
    # (null keys group fine) and sum the strata-sized partials driver-side
    def count_partial(b: pa.Table) -> pa.Table:
        g = b.select(stratum_cols).group_by(stratum_cols).aggregate([([], "count_all")])
        return g.rename_columns(list(stratum_cols) + ["pcnt"])

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .to_pandas()
        .groupby(stratum_cols, sort=False, dropna=False, as_index=False)["pcnt"]
        .sum()
        .rename(columns={"pcnt": "count()"})
    )  # strata-sized: tiny
    n = counts["count()"].to_numpy().astype("float64")
    root = np.sqrt(n) if temperature == 2.0 else np.power(n, 1.0 / temperature)
    tgt = np.minimum(n.astype("int64"), np.floor(scale * root).astype("int64"))
    # NaN -> None so the per-partition lookup below (pandas groupby with
    # dropna=False yields NaN keys) finds NULL strata
    targets = {
        tuple(None if pd.isna(x) else x for x in row): int(t)
        for row, t in zip(counts[stratum_cols].itertuples(index=False), tgt)
    }

    def add_hash(b: pa.Table) -> pa.Table:
        h = md5_prefix_ints(b[id_col].to_pylist())
        return b.append_column("__h", pa.array(h, pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        # dropna=False: a NULL stratum is still a stratum with a target
        for key, grp in g.groupby(stratum_cols, sort=False, dropna=False):
            k = key if isinstance(key, tuple) else (key,)
            k = tuple(None if pd.isna(x) else x for x in k)
            t = targets.get(k, 0)
            grp = grp.sort_values(["__h", id_col], kind="mergesort")
            out.append(grp.iloc[:t])
        return pd.concat(out, ignore_index=True) if out else g.iloc[:0]

    return hash_partitioned_groups(
        hashed, stratum_cols, per_part, num_partitions=num_partitions
    ).drop_columns(["__h"])


SPLIT_BOUNDS = (80, 90)  # train < 80, val < 90, test < 100


def stratified_split(
    ds: Dataset,
    id_col: str = "doc_id",
    bounds: tuple[int, int] = SPLIT_BOUNDS,
) -> Dataset:
    """Deterministic train/val/test assignment: split = md5(id) mod 100
    against ``bounds`` — the standard content-hash split that is stable
    under re-partitioning, re-runs, and corpus growth (a doc's split never
    changes when other docs are added, unlike row_number() % k schemes).
    Hash uniformity gives each stratum the same expected proportions, so
    no per-stratum state is needed — one embarrassingly parallel pass.
    SQL mirror: ('0x' || substr(md5(id::VARCHAR), 1, 8))::UBIGINT % 100."""
    lo, hi = bounds

    def assign(b: pa.Table) -> pa.Table:
        m = md5_prefix_ints(b[id_col].to_pylist()) % 100
        split = np.where(m < lo, "train", np.where(m < hi, "val", "test"))
        return b.append_column("split", pa.array(split.tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def leakage_safe_split(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    bounds: tuple[int, int] = SPLIT_BOUNDS,
    num_partitions: int = 64,
) -> Dataset:
    """Cluster-aware train/val/test split: every exact-duplicate CLUSTER
    (docs with byte-identical text) is assigned to one split as a unit —
    split = md5(cluster_id) mod 100 where cluster_id = min(doc_id) in the
    cluster. A per-doc hash split (``stratified_split``) leaks: with 30-50%
    exact duplication (the web-crawl norm) a test doc's twin lands in
    train ~80% of the time, inflating eval (the contamination channel
    Lee et al. 2021 §6 measure). Returns (doc_id, cluster_id, split).

    Shape: ONE shuffle. Rows travel as thin (doc_id, text_sha256) pairs;
    ``hash_partitioned_groups`` on the digest co-locates each cluster, and
    the per-partition pandas transform computes the cluster min + hash
    assignment vectorized over MANY whole clusters at once. No
    corpus-sized join, no driver-side state.

    SQL mirror: min(doc_id) OVER (PARTITION BY text), then the
    ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::UBIGINT % 100 rule
    shared with stratified_split."""
    from clawrag_ray.stages.dedup import with_text_hash
    from clawrag_ray.stages.relational import hash_partitioned_groups

    lo, hi = bounds
    hashed = with_text_hash(ds.select_columns([id_col, text_col]), text_col).select_columns(
        [id_col, "text_sha256"]
    )

    def assign_clusters(df: pd.DataFrame) -> pd.DataFrame:
        cluster = df.groupby("text_sha256")[id_col].transform("min").to_numpy()
        m = md5_prefix_ints(cluster) % 100
        split = np.where(m < lo, "train", np.where(m < hi, "val", "test"))
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "cluster_id": cluster, "split": split}
        )

    return hash_partitioned_groups(
        hashed, ["text_sha256"], assign_clusters, num_partitions=num_partitions
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{1,2} \d{3}-\d{4}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(ds: Dataset, text_col: str = "text") -> Dataset:
    """Redact emails, phone numbers and IPv4 addresses and count each —
    the standard pretraining-corpus scrub (C4/RefinedWeb-style), fully
    vectorized: counts via Arrow count_substring_regex, redaction via
    replace_substring_regex (RE2 — same engine DuckDB uses, so the SQL
    oracle matches byte-for-byte). Redaction order is email -> ip ->
    phone; markers carry no digits/@ so passes cannot re-trigger."""

    def scrub(b: pa.Table) -> pa.Table:
        t = b[text_col]
        n_em = pc.cast(pc.count_substring_regex(t, pattern=PII_EMAIL_RE), pa.int64())
        n_ip = pc.cast(pc.count_substring_regex(t, pattern=PII_IP_RE), pa.int64())
        n_ph = pc.cast(pc.count_substring_regex(t, pattern=PII_PHONE_RE), pa.int64())
        clean = pc.replace_substring_regex(t, pattern=PII_EMAIL_RE, replacement="[EMAIL]")
        clean = pc.replace_substring_regex(clean, pattern=PII_IP_RE, replacement="[IP]")
        clean = pc.replace_substring_regex(clean, pattern=PII_PHONE_RE, replacement="[PHONE]")
        out = b.drop_columns([text_col])
        return (
            out.append_column("clean_text", clean)
            .append_column("n_emails", n_em)
            .append_column("n_ips", n_ip)
            .append_column("n_phones", n_ph)
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def synthesize_pii(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """FIXTURE: append deterministic id-derived PII (email, phone, IP) to
    each text so pii_scrub's regexes demonstrably fire on the synthetic
    corpus (which contains none) — the same generator-formula pattern as
    the media fixtures (functions/mediafixtures.py), mirrored exactly in
    the DuckDB oracle with string concatenation."""

    def synth(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        s = np.char.add
        tail = s(
            s(
                s(
                    s("contact u", ids.astype("U")),
                    s("@ex", (ids % 7).astype("U")),
                ),
                s(".org call +1 555-", np.char.zfill((ids % 10000).astype("U"), 4)),
            ),
            s(
                s(" host 10.", (ids % 256).astype("U")),
                s(".", s((ids // 256 % 256).astype("U"), s(".", (ids % 100).astype("U")))),
            ),
        )
        joined = pc.binary_join_element_wise(b[text_col], pa.array(tail, pa.string()), " ")
        return b.set_column(b.schema.get_field_index(text_col), text_col, joined)

    return ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def weighted_sample(
    ds: Dataset,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    key_out: str = "es_key",
    ndigits: int = 6,
) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, public): each row gets key = ln(u)/w with
    u = (md5_prefix_int(id) + 1) / 2^32 in (0, 1]; the n largest keys form
    a weighted sample (selection probability proportional to weight,
    exactly the E-S result with u standing in for the uniform draw). A
    pure function of (id, weight) — reproducible across runs, cluster
    layouts, and engines (the SQL oracle replays md5 + ln digit-for-digit).

    Shape: map-only key computation (batched md5 digests), per-block
    top-n prune (the global top-n is always inside the union of block
    top-ns), then the distributed sort-limit over the n-x-blocks-bounded
    candidate set. Rows with non-positive weight are excluded (E-S
    requires w > 0; mirror with WHERE w > 0 in SQL)."""
    import pyarrow.compute as pc_

    from clawrag_ray.functions.kernels import md5_prefix_ints
    from clawrag_ray.stages.relational import top_k

    def add_key(b: pa.Table) -> pa.Table:
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = w > 0
        if not keep.all():
            b = b.filter(pa.array(keep))
            w = w[keep]
        u = (md5_prefix_ints(b[id_col].to_pylist()).astype(np.float64) + 1.0) / 4294967296.0
        key = np.log(u) / w
        b = b.append_column(key_out, pa.array(key, pa.float64()))
        if b.num_rows > n:  # block-local prune
            idx = np.argpartition(key, -n)[-n:]
            b = b.take(pa.array(np.sort(idx)))
        return b

    pruned = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    picked = top_k(pruned, key_out, n, descending=True)

    def finish(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index(key_out), key_out, pc_.round(b[key_out], ndigits=ndigits)
        )

    return picked.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _word_shingles(text: str, shingle_k: int) -> set:
    """Distinct word-k-gram shingles; short texts fall back to the
    whole-text shingle (shared rule with the Jaccard shingler)."""
    words = re2_tokens((text or "").lower())
    if len(words) < shingle_k:
        return {" ".join(words)}
    return {" ".join(words[i : i + shingle_k]) for i in range(len(words) - shingle_k + 1)}


def decontaminate(
    ds: Dataset,
    eval_ds: Dataset,
    shingle_k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_side: str = "broadcast",
    num_partitions: int = 64,
) -> Dataset:
    """Flag training docs that overlap an evaluation set by word-k-gram
    collision (the GPT-3 appendix-C decontamination rule, public
    formulation; k=8 is the modern default). Output per doc: n_shingles
    (distinct), n_contaminated, contamination_frac (round 6), contaminated
    flag (any collision). Docs shorter than k words use the whole-text
    fallback shingle (same rule as the Jaccard shingler).

    ``eval_side="broadcast"`` (default — the production shape for real
    benchmark suites, which are thousands of docs by construction): the
    eval side's distinct shingles build once on the driver and broadcast
    via ray.put; each training doc counts its colliding shingles in one
    map_batches pass.

    ``eval_side="distributed"``: the corpus-sized-eval swap — NOTHING
    driver-sized. Both sides explode to shingle rows; a distributed semi
    join on shingle keeps the training (doc, shingle) rows that collide; a
    grouped count per doc and a keyed left join against the per-doc totals
    (computed map-only) produce the identical output. Use when the eval
    side is itself a corpus (e.g. cross-corpus overlap screening)."""
    import ray

    def shingles(text: str) -> set:
        return _word_shingles(text, shingle_k)

    if eval_side == "distributed":
        return _decontaminate_distributed(
            ds, eval_ds, shingle_k, id_col, text_col, num_partitions
        )
    if eval_side != "broadcast":
        raise ValueError(f"unknown eval_side: {eval_side}")

    eval_shingles: set = set()
    for b in eval_ds.select_columns([text_col]).iter_batches(batch_format="pyarrow"):
        for t in b[text_col].to_pylist():
            eval_shingles |= shingles(t)
    ref = ray.put(eval_shingles)

    class Checker:
        def __init__(self):
            self.idx = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            n_sh, n_hit = [], []
            for t in b[text_col].to_pylist():
                sh = shingles(t)
                n_sh.append(len(sh))
                n_hit.append(len(sh & self.idx))
            n_sh_a = np.array(n_sh, dtype="int64")
            n_hit_a = np.array(n_hit, dtype="int64")
            frac = np.round(n_hit_a / np.maximum(n_sh_a, 1), 6)
            return pa.table(
                {
                    id_col: b[id_col],
                    "n_shingles": pa.array(n_sh_a),
                    "n_contaminated": pa.array(n_hit_a),
                    "contamination_frac": pa.array(frac),
                    "contaminated": pa.array(n_hit_a > 0),
                }
            )

    return ds.map_batches(Checker, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8))


def _decontaminate_distributed(
    ds: Dataset,
    eval_ds: Dataset,
    shingle_k: int,
    id_col: str,
    text_col: str,
    num_partitions: int,
) -> Dataset:
    """Distributed-eval decontamination body (see decontaminate): shingle
    explodes on both sides, one semi-join shuffle by shingle, one grouped
    count by doc, one keyed left join against map-only per-doc totals."""
    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import pre_aggregate, semi_join

    def _hash_shingles(values: list) -> np.ndarray:
        # 64-bit fingerprints instead of 8-word strings: ~10x less shuffle
        # volume and int64 join keys (deterministic unsalted siphash —
        # pd.util.hash_array; ~2^-64 collision odds per pair, the standard
        # production trade for shingle joins)
        return pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.int64)

    def explode_train(b: pa.Table) -> pa.Table:
        ids_out, sh_out = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            sh = _word_shingles(t, shingle_k)
            ids_out.extend([i] * len(sh))
            sh_out.extend(sh)
        return pa.table(
            {id_col: pa.array(ids_out, b[id_col].type), "sh": pa.array(_hash_shingles(sh_out), pa.int64())}
        )

    def explode_eval(b: pa.Table) -> pa.Table:
        out: set = set()
        for t in b[text_col].to_pylist():
            out |= _word_shingles(t, shingle_k)
        vals = sorted(out)
        return pa.table({"sh": pa.array(_hash_shingles(vals), pa.int64())})

    # ONE tokenize/shingle pass: the fingerprint rows are consumed by both
    # the semi-join and the per-doc totals, and a lazy diamond would
    # re-execute the explode per consumer — materialize once (object-store
    # blocks, spillable; the bm25_topk row-table precedent). Totals derive
    # from the rows themselves (explode emits DISTINCT shingles per doc,
    # and every doc emits >= 1 row via the whole-text fallback).
    train_rows = ds.select_columns([id_col, text_col]).map_batches(
        explode_train, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    eval_rows = eval_ds.select_columns([text_col]).map_batches(
        explode_eval, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = pre_aggregate(
        train_rows.select_columns([id_col]), [id_col], [], count_alias="n_shingles"
    ).map_batches(
        lambda b: pa.table({id_col: b[id_col], "n_shingles": pc.cast(b["n_shingles"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    hits = semi_join(train_rows, "sh", eval_rows, "sh", num_partitions=num_partitions)
    per_doc = pre_aggregate(hits.select_columns([id_col]), [id_col], [], count_alias="n_contaminated")
    per_doc = per_doc.map_batches(
        lambda b: pa.table({"__d": b[id_col], "n_contaminated": pc.cast(b["n_contaminated"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = _keyed_join(
        totals, id_col, per_doc, "__d", ["n_contaminated"],
        fill_values={"n_contaminated": 0}, num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        n_sh = b["n_shingles"].to_numpy(zero_copy_only=False)
        n_hit = b["n_contaminated"].to_numpy(zero_copy_only=False)
        frac = np.round(n_hit / np.maximum(n_sh, 1), 6)
        return pa.table(
            {
                id_col: b[id_col],
                "n_shingles": b["n_shingles"],
                "n_contaminated": b["n_contaminated"],
                "contamination_frac": pa.array(frac, pa.float64()),
                "contaminated": pa.array(n_hit > 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# line-level boilerplate removal (CCNet-style)
# ---------------------------------------------------------------------------


def _explode_lines(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """(id, text) -> (id, idx, line): split each document on ``\\n`` with
    pure Arrow kernels (split_pattern / list_parent_indices /
    list_flatten — no Python row loop); ``idx`` is the line's position
    within its document. Shared explode head of the line-level corpus
    ops (boilerplate removal, first-occurrence paragraph dedup)."""

    def explode(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # a NULL text must behave like '' (one empty line), not poison the
        # repeat counts with a NaN->int64 cast
        col = pc.fill_null(col, "")
        parts = pc.split_pattern(col, "\n")
        parent = pc.list_parent_indices(parts)
        n = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        starts = np.repeat(np.cumsum(n) - n, n)
        idx = np.arange(total, dtype=np.int64) - starts
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids.take(parent),
                "idx": pa.array(idx),
                "line": pc.list_flatten(parts),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _rebuild_docs(g: pd.DataFrame, keep_mask: "pd.Series", id_col: str) -> pd.DataFrame:
    """Shared per-partition document rebuild for the line-level ops: sort
    lines back into (id, idx) order, newline-join the kept ones per doc,
    and account removed lines. One vectorized pass per PARTITION of whole
    doc groups (the hash_partitioned_groups contract)."""
    g = g.sort_values([id_col, "idx"], kind="stable")
    kept = g[keep_mask.reindex(g.index)]
    text_agg = kept.groupby(id_col, sort=False)["line"].agg("\n".join)
    n_lines = g.groupby(id_col, sort=False).size()
    n_kept = kept.groupby(id_col, sort=False).size().reindex(n_lines.index, fill_value=0)
    return pd.DataFrame(
        {
            id_col: n_lines.index,
            "clean_text": text_agg.reindex(n_lines.index, fill_value="").to_numpy(),
            "n_lines": n_lines.to_numpy().astype("int64"),
            "n_removed": (n_lines - n_kept).to_numpy().astype("int64"),
        }
    )


def remove_boilerplate_lines(
    ds: Dataset,
    min_docs: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Drop every line that appears verbatim in >= ``min_docs`` distinct
    documents (nav bars, cookie notices, footers — the CCNet / RefinedWeb
    line-dedup rule, Wenzek et al. 2020 / Penedo et al. 2023, public) and
    reassemble each document from its surviving lines in order. Returns
    (id, clean_text, n_lines, n_removed).

    The rule is uniform over exact line content (blank lines shared by
    many docs are boilerplate too) so the semantics are a pure function
    of the corpus — mirrored digit-for-digit by the SQL oracle.

    Scale shape (three shuffles, all corpus-line-proportional):
      1. explode to (id, idx, line) with Arrow kernels (split_pattern /
         list_parent_indices — no Python row loop), pre-distinct
         (line, id) per batch, then a two-level grouped count gives each
         line's distinct-doc frequency;
      2. join every line row against its frequency via the distributed
         keyed join (union + one hash-partitioned pass — nothing
         driver-side; the frequency table is line-vocabulary-sized);
      3. regroup by document and rebuild text with a vectorized pandas
         pass (sort by idx, grouped join) — one call per hash partition,
         not per document. Line strings are the shuffle key; at 10^12
         docs swap the key for a 128-bit line hash and keep text only on
         the document leg (same swap documented for the verify joins)."""
    from ray.data.aggregate import Sum as AggSum

    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import hash_partitioned_groups

    lines = _explode_lines(ds, id_col, text_col).materialize()

    # distinct-doc frequency per line: per-batch (line, id) distinct, global
    # (line, id) collapse, then per-batch partial counts + grouped sum
    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.select(["line", id_col]).group_by(["line", id_col]).aggregate([])

    collapsed = (
        lines.map_batches(batch_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["line", id_col])
        .count()
    )

    def partial_count(b: pa.Table) -> pa.Table:
        g = b.select(["line"]).group_by("line").aggregate([("line", "count")])
        return g.rename_columns(["line", "pcnt"])

    freq = (
        collapsed.map_batches(partial_count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("line")
        .aggregate(AggSum("pcnt", alias_name="df"))
        .map_batches(
            lambda b: pa.table({"line_f": b["line"], "df": pc.cast(b["df"], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    # every line has a frequency row, so the inner keyed join keeps all rows
    joined = _keyed_join(lines, "line", freq, "line_f", ["df"], num_partitions=num_partitions)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return _rebuild_docs(g, g["df"] < min_docs, id_col)

    return hash_partitioned_groups(joined, [id_col], per_part, num_partitions=num_partitions)


# idx fits in 24 bits (16M lines/doc) so (doc_id, idx) packs into one
# int64 occurrence rank for a single grouped-min pass; doc ids must fit
# 39 bits. At wider id spaces swap the packed key for a two-level min
# (min doc per line, then min idx within the keeper doc) — one extra
# grouped pass, same shapes.
_IDX_SPAN = 1 << 24


def paragraph_dedup(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """First-occurrence exact paragraph dedup (the RefinedWeb / MassiveText
    exact line-dedup rule, Penedo et al. 2023 / Rae et al. 2021, public):
    every line keeps only its FIRST occurrence in global (doc_id, idx)
    order; later verbatim repeats — across documents or within one — are
    dropped, and each document is rebuilt from its surviving lines in
    order. Complements ``remove_boilerplate_lines`` (frequency-threshold
    rule): this rule always keeps exactly one copy corpus-wide. Returns
    (id, clean_text, n_lines, n_removed).

    Scale shape (all shuffles corpus-line-proportional):
      1. Arrow-kernel explode to (id, idx, line) + packed occurrence rank;
      2. per-batch partial min + grouped min gives each line's first
         occurrence (line-vocabulary-sized table);
      3. distributed keyed join back, keep rows whose rank == min, then
         one hash-partitioned pass per document partition rebuilds text
         (vectorized grouped join — one call per partition, not per doc).
    Line strings are the shuffle key; at 10^12 docs swap the key for a
    128-bit line hash, as documented for the verify joins."""
    from ray.data.aggregate import Min as AggMin

    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import hash_partitioned_groups

    def with_rank(b: pa.Table) -> pa.Table:
        occ = b[id_col].to_numpy() * _IDX_SPAN + b["idx"].to_numpy()
        return b.append_column("occ", pa.array(occ, pa.int64()))

    lines = (
        _explode_lines(ds, id_col, text_col)
        .map_batches(with_rank, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def partial_min(b: pa.Table) -> pa.Table:
        g = b.select(["line", "occ"]).group_by("line").aggregate([("occ", "min")])
        return g.rename_columns(["line", "pmin"])

    first = (
        lines.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("line")
        .aggregate(AggMin("pmin", alias_name="first_occ"))
        .map_batches(
            lambda b: pa.table({"line_f": b["line"], "first_occ": pc.cast(b["first_occ"], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    # every line has a first-occurrence row, so the inner join keeps all rows
    joined = _keyed_join(lines, "line", first, "line_f", ["first_occ"], num_partitions=num_partitions)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return _rebuild_docs(g, g["occ"] == g["first_occ"], id_col)

    return hash_partitioned_groups(joined, [id_col], per_part, num_partitions=num_partitions)


# Double rolling hash over codepoints, fully vectorized. Moduli are primes
# below 2^31 so that residue*residue < 2^62 (uint64-safe) and per-element
# (codepoint * power) % m < 2^52 with prefix sums exact below ~2^33 rows.
_RH_M1, _RH_M2 = 2147483629, 2147483587
_RH_B = 257


def _modpow_tables(base: int, n: int, mod: int) -> tuple[np.ndarray, np.ndarray]:
    """(base^k % mod, base^-k % mod) for k in [0, n) — built by vectorized
    doubling (powers[t+i] = powers[t-1]*base * powers[i]), O(log n) numpy
    passes, no Python per-element loop."""
    inv = pow(base, mod - 2, mod)
    out = []
    for b in (base, inv):
        p = np.ones(1, dtype=np.uint64)
        bb, mm = np.uint64(b % mod), np.uint64(mod)
        while len(p) < max(n, 1):
            p = np.concatenate([p, (p * ((p[-1] * bb) % mm)) % mm])
        out.append(p[:max(n, 1)])
    return out[0], out[1]


def _window_hashes(
    codes: np.ndarray, window: int, pows: np.ndarray, ipows: np.ndarray, mod: int
) -> np.ndarray:
    """All length-``window`` rolling hashes of ``codes`` under one modulus:
    H_j = (P_{j+w} - P_j) * base^{-j} mod m with P the (c_k * base^k)
    prefix sum. Returns uint64 residues < mod, length n - window + 1."""
    mm = np.uint64(mod)
    n = len(codes)
    prod = (codes * pows[:n]) % mm  # < 2^31 each
    p = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(prod, out=p[1:])  # exact: n * 2^31 << 2^64
    p %= mm
    diff = (p[window:] + mm - p[:-window]) % mm
    return (diff * ipows[: n - window + 1]) % mm


def _winnow_select(h: np.ndarray, s: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer et al. 2003, public):
    for every window of ``s`` consecutive hash positions keep the position
    of the minimal hash (leftmost on ties). Content-defined — identical
    hash runs select identical relative positions — with >= 1 selection
    per ``s`` consecutive offsets. Vectorized via a zero-copy sliding
    window view."""
    m = len(h)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    if m <= s:
        return np.array([int(np.argmin(h))], dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(h, s)
    return np.unique(sw.argmin(axis=1) + np.arange(m - s + 1, dtype=np.int64))


def exact_substring_dedup(
    ds: Dataset,
    window: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
    stride: int = 1,
) -> Dataset:
    """ExactSubstr dedup (Lee et al. 2021, arXiv:2107.06499, public): cut
    from every document each character covered by a ``window``-char
    substring whose identical text occurs EARLIER in global (doc_id, pos)
    order — in another document or earlier in the same one. Exactly one
    copy of every duplicated region survives corpus-wide (the paper keeps
    one occurrence; first-in-id-order is the deterministic choice here).
    Returns (id, text cleaned, n_removed chars).

    Shape (all shuffles corpus-character-proportional):
      1. per-doc rolling Rabin-Karp over CODEPOINTS emits one
         (wh, doc_id, pos) row per offset — O(n) per doc, ~16 bytes per
         character into the shuffle. This is the honest cost of
         suffix-array-free ExactSubstr at stride=1; ``stride>1`` switches
         to WINNOWED probe selection (Schleimer et al. 2003, public): only
         positions whose fingerprint is the minimum of some length-stride
         hash window are emitted (~1/stride of the offsets, content-
         defined, so both copies of a duplicated region select the SAME
         relative probes). Shuffle volume drops by ~stride at the
         documented recall cost: only duplicated regions of length >=
         window + 2*(stride-1) are guaranteed probed in their interior,
         and up to window + stride edge characters of each duplicate can
         survive the cut — the production stride-sampling trade.
      2. ONE hash-partitioned pass by wh marks every occurrence that is
         not its hash's lexicographic minimum (vectorized duplicated());
         only the marked (doc_id, pos) rows — duplication-sized — leave.
      3. marked positions union with the doc table and ONE
         hash-partitioned pass by doc cuts the covered intervals via a
         numpy diff-array (no per-char Python), rebuilding each text.

    Positions pack as doc_id * 2^24 + pos for the grouped min, so docs
    are capped at 16M chars (the corpus contract shared with
    paragraph_dedup's index packing). Hash collisions (~2^-62 per pair
    under the double 31-bit-modulus hash) could delete a non-duplicate
    span; at 10^12 docs verify marked spans against the keeper text via
    the bucket-join machinery.

    The window hashes are computed with NUMPY modular prefix-sum algebra
    (no per-character Python): under each modulus m < 2^31,
    H_j = (P_{j+w} - P_j) * r^{-j} where P_i = sum_{k<i} c_k * r^k — every
    product of two sub-2^31 residues fits uint64, prefix sums of sub-2^31
    values stay exact below 2^33 rows, and power/inverse-power tables
    build in O(log n) vectorized doubling steps. Two independent moduli
    combine into one 62-bit fingerprint (equal windows hash equal under
    any scheme, so the fingerprint choice is internal)."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    def explode(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        per_doc: list[np.ndarray] = []
        cnts = np.zeros(len(texts), dtype=np.int64)
        max_n = max((len(t or "") for t in texts), default=0)
        pows1, ipows1 = _modpow_tables(_RH_B, max_n, _RH_M1)
        pows2, ipows2 = _modpow_tables(_RH_B, max_n, _RH_M2)
        per_pos: list[np.ndarray] = []
        for j, text in enumerate(texts):
            codes = np.frombuffer((text or "").encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            n = len(codes)
            if n < window:
                continue
            h1 = _window_hashes(codes, window, pows1, ipows1, _RH_M1)
            h2 = _window_hashes(codes, window, pows2, ipows2, _RH_M2)
            wh = (h1 * np.uint64(_RH_M2) + h2).astype(np.int64)
            if stride > 1:
                sel = _winnow_select(wh, stride)
                per_pos.append(sel)
                wh = wh[sel]
            per_doc.append(wh)
            cnts[j] = len(wh)
        total = int(cnts.sum())
        idx = np.repeat(np.arange(len(texts), dtype=np.int64), cnts)
        if stride > 1:
            poss = np.concatenate(per_pos) if per_pos else np.empty(0, dtype=np.int64)
        else:
            starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            poss = np.arange(total, dtype=np.int64) - np.repeat(starts, cnts)
        ids = b[id_col].take(pa.array(idx, pa.int64()))
        whs = np.concatenate(per_doc) if per_doc else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: ids,
                "pos": pa.array(poss, pa.int64()),
                "wh": pa.array(whs, pa.int64()),
            }
        )

    rows = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def mark_non_first(g: pd.DataFrame) -> pd.DataFrame:
        occ = g[id_col].to_numpy(dtype="int64") * _IDX_SPAN + g["pos"].to_numpy(dtype="int64")
        g = g.iloc[np.lexsort((occ, g["wh"].to_numpy()))]
        return g.loc[g["wh"].duplicated(), [id_col, "pos"]]

    removed = hash_partitioned_groups(rows, ["wh"], mark_non_first, num_partitions=num_partitions)

    def doc_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                "pos": pa.array(np.full(b.num_rows, -1), pa.int64()),
                text_col: b[text_col],
            }
        )

    def rem_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b[id_col], "pos": b["pos"], text_col: pa.nulls(b.num_rows, pa.string())}
        )

    unioned = ds.select_columns([id_col, text_col]).map_batches(
        doc_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(removed.map_batches(rem_rows, batch_format="pyarrow", zero_copy_batch=True))

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0]
        rem = g[g["pos"] >= 0]
        marks = {d: p.to_numpy(dtype="int64") for d, p in rem.groupby(id_col, sort=False)["pos"]}
        out_ids, out_texts, out_removed = [], [], []
        for doc_id, text in zip(docs[id_col], docs[text_col]):
            text = text or ""
            ps = marks.get(doc_id)
            if ps is None:
                out_ids.append(doc_id)
                out_texts.append(text)
                out_removed.append(0)
                continue
            n = len(text)
            cov = np.zeros(n + 1, dtype=np.int32)
            np.add.at(cov, ps, 1)
            np.add.at(cov, np.minimum(ps + window, n), -1)
            keep = np.cumsum(cov[:n]) == 0
            codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            out_ids.append(doc_id)
            out_texts.append(codes[keep].tobytes().decode("utf-32-le"))
            out_removed.append(int(n - keep.sum()))
        return pd.DataFrame(
            {id_col: out_ids, text_col: out_texts, "n_removed": pd.array(out_removed, dtype="int64")}
        )

    return hash_partitioned_groups(unioned, [id_col], cut, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# perplexity filtering (CCNet-style, corpus-trained unigram LM)
# ---------------------------------------------------------------------------


def _explode_tokens(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """(id, token) rows: lowercase + RE2 ``\\S+`` tokens (the repo-wide
    oracle tokenization), fully vectorized — utf8_lower + regex split +
    list_flatten, empty pieces filtered (split vs findall edge)."""

    def explode(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        parent = pc.list_parent_indices(parts)
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat = pa.table({id_col: ids.take(parent), "token": pc.list_flatten(parts)})
        return flat.filter(pc.not_equal(flat["token"], ""))

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def perplexity_filter(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_quantiles: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    num_partitions: int = 64,
) -> Dataset:
    """CCNet-style perplexity filtering (Wenzek et al. 2020, public): score
    every document by its cross-entropy under a language model and split
    the corpus into head/middle/tail buckets at corpus-level entropy
    quantiles (head = most natural text, the slice CCNet keeps).

    CCNet uses a pretrained KenLM; no model weights exist in this sandbox,
    so the LM is an add-one-smoothed UNIGRAM model trained on the corpus
    itself — a pure function of the input that DuckDB replays digit-for-
    digit (the same determinism trade the HashEmbedder paths make):
    ``lp(t) = ln((count(t)+1) / (total_tokens+vocab))``,
    ``entropy(d) = -mean(lp(t) for t in d)``. Swap ``lp`` for a broadcast
    KenLM scorer when weights are available; every distributed shape below
    is model-agnostic.

    Scale shape (token-row-proportional, nothing corpus-sized driver-side):
      1. explode to (id, token) with Arrow kernels; two-level grouped count
         gives the token frequency table (vocab-sized);
      2. total/vocab are one tiny aggregate; lp is a map over the frequency
         table; every token row joins its lp via the distributed keyed join
         (at 10^12 docs swap the token-string key for a 64-bit token hash,
         the same swap documented for the verify joins);
      3. per-doc sum/count via two-level partial aggregation;
      4. bucket cutoffs via the t-digest quantile sketch (exact — every
         centroid a singleton — while n_docs <= compression, the pinned
         contract; bounded rank error beyond), then one broadcast-scalar
         assignment pass.

    Zero-token docs carry no LM evidence and are excluded (mirrored by the
    oracle's inner join). Output: (id, n_tokens, entropy round-6, bucket)."""
    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import grouped_quantiles_tdigest, pre_aggregate

    toks = _explode_tokens(ds, id_col, text_col).materialize()

    # vocab-sized frequency table: arrow partial counts, global sum
    def partial_count(b: pa.Table) -> pa.Table:
        g = b.select(["token"]).group_by("token").aggregate([("token", "count")])
        return g.rename_columns(["token", "pcnt"])

    from ray.data.aggregate import Count as AggCount
    from ray.data.aggregate import Sum as AggSum

    freq = (
        toks.map_batches(partial_count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(AggSum("pcnt", alias_name="cnt"))
        .materialize()
    )

    tot = freq.aggregate(AggSum("cnt"), AggCount())
    # an empty / all-whitespace corpus aggregates to None: return the
    # empty typed result instead of dying in int(None)
    if not tot or tot.get("sum(cnt)") is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("n_tokens", pa.int64()), ("entropy", pa.float64()), ("ppl_bucket", pa.string())]
            ).empty_table()
        )
    total, vocab = int(tot["sum(cnt)"]), int(tot["count()"])

    def to_logprob(b: pa.Table) -> pa.Table:
        c = pc.cast(b["cnt"], pa.float64()).to_numpy(zero_copy_only=False)
        lp = np.log((c + 1.0) / float(total + vocab))
        return pa.table({"token_f": b["token"], "lp": pa.array(lp)})

    logp = freq.map_batches(to_logprob, batch_format="pyarrow", zero_copy_batch=True)

    scored_tok = _keyed_join(toks, "token", logp, "token_f", ["lp"], num_partitions=num_partitions)
    per_doc = pre_aggregate(scored_tok, [id_col], ["lp"], count_alias="n_tokens")

    def entropy(b: pa.Table) -> pa.Table:
        s = pc.cast(b["sum_lp"], pa.float64()).to_numpy(zero_copy_only=False)
        n = pc.cast(b["n_tokens"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": pa.array(n),
                "entropy": pa.array(-s / n),
            }
        )

    scored = per_doc.map_batches(entropy, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # ndigits=17 is the identity round for doubles in this range: a ROUNDED
    # cutoff falls below an exact tie at the quantile and misclassifies the
    # tied docs, while the unrounded interpolated cutoff equals the tied
    # value exactly in both engines (quantile_cont and np.interp agree on
    # ties bit-for-bit)
    q1, q2 = bucket_quantiles
    cuts = (
        grouped_quantiles_tdigest(
            scored.map_batches(
                lambda b: b.append_column("__all", pa.array(np.zeros(b.num_rows, dtype="int64"))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            ["__all"],
            "entropy",
            [q1, q2],
            ndigits=17,
        )
        .to_pandas()
        .iloc[0]
    )
    c1 = float(cuts[f"p{int(round(q1 * 100))}"])
    c2 = float(cuts[f"p{int(round(q2 * 100))}"])

    def assign(b: pa.Table) -> pa.Table:
        h = b["entropy"].to_numpy(zero_copy_only=False)
        bucket = np.where(h <= c1, "head", np.where(h <= c2, "middle", "tail"))
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": b["n_tokens"],
                "entropy": pa.array(np.round(h, 6)),
                "ppl_bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    return scored.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def source_overlap_matrix(
    ds: Dataset,
    group_col: str = "source",
    shingle_k: int = 8,
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Cross-corpus contamination profile: for every pair of sources, the
    number of DISTINCT word-k-gram shingles they share — the matrix a
    curation run consults before mixing corpora (high overlap = duplicated
    upstream crawl or licensing leak). Shape: per-block distinct
    (source, shingle-fingerprint) partials collapse through one
    pre_aggregate (the only corpus-proportional shuffle), then a
    hash-partitioned self-merge by fingerprint emits per-pair counts —
    rows leaving the fingerprint pass are pair-count-sized. Uses the same
    64-bit shingle fingerprints as the distributed decontaminate
    (collision odds ~2^-64 per pair)."""
    from clawrag_ray.stages.relational import hash_partitioned_groups, pre_aggregate

    def explode(b: pa.Table) -> pa.Table:
        srcs, hs = [], []
        for s, t in zip(b[group_col].to_pylist(), b[text_col].to_pylist()):
            sh = sorted(_word_shingles(t, shingle_k))
            srcs.extend([s] * len(sh))
            hs.append(pd.util.hash_array(np.asarray(sh, dtype=object)).astype(np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, dtype=np.int64)
        return pa.table({group_col: pa.array(srcs, b[group_col].type), "h": pa.array(h, pa.int64())})

    rows = ds.select_columns([group_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    distinct = pre_aggregate(rows, [group_col, "h"], [], count_alias="__c")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out: dict = {}
        for _, grp in g.groupby("h", sort=False):
            ss = sorted(set(grp[group_col]))
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    out[(ss[i], ss[j])] = out.get((ss[i], ss[j]), 0) + 1
        if not out:
            return pd.DataFrame({"source_a": [], "source_b": [], "p": []}).astype(
                {"source_a": str, "source_b": str, "p": "int64"}
            )
        ks = list(out)
        return pd.DataFrame(
            {
                "source_a": [k[0] for k in ks],
                "source_b": [k[1] for k in ks],
                "p": pd.array(list(out.values()), dtype="int64"),
            }
        )

    per_fp = hash_partitioned_groups(distinct, ["h"], pairs, num_partitions=num_partitions)
    return pre_aggregate(per_fp, ["source_a", "source_b"], ["p"]).map_batches(
        lambda b: pa.table(
            {
                "source_a": b["source_a"],
                "source_b": b["source_b"],
                "n_shared": pc.cast(b["sum_p"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _bigram_buckets(
    b: pa.Table, text_col: str, n_buckets: int
) -> tuple["np.ndarray", "np.ndarray"]:
    """Hashed word-bigram features for every row of a batch: returns
    (row_idx, bucket) arrays, one entry per bigram. Tokenization is the
    repo-wide oracle rule (lowercase + RE2 ``\\S+``, _explode_tokens);
    bucket = md5_prefix_int(w_i + ' ' + w_{i+1}) % n_buckets — the
    canonical md5 construct DuckDB mirrors. Rows with < 2 tokens emit no
    features. Token lists stay vectorized through Arrow; only the md5
    digests run per bigram (the hash IS per-item work)."""
    from clawrag_ray.functions.kernels import md5_prefix_ints

    col = b[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(parts)
    keep = pc.not_equal(flat, "")
    toks = flat.filter(keep).to_pylist()
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    if len(toks) < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # bigrams pair ADJACENT filtered tokens of the same row (split empties
    # occur only at string edges, so filtered order == token order)
    m = parent[:-1] == parent[1:]
    idx = np.nonzero(m)[0]
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    grams = [toks[j] + " " + toks[j + 1] for j in idx]
    buckets = md5_prefix_ints(grams) % n_buckets
    return parent[idx], buckets


def dsir_importance_sample(
    ds: Dataset,
    target_col: str = "lang",
    target_value: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    keep_frac: float = 0.25,
) -> Dataset:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling", public): score every raw document
    by how target-like it is under two hashed-bigram bag models — the
    target LM trained on the rows where ``target_col == target_value``,
    the raw LM on the whole corpus — and keep the top ``keep_frac`` by
    length-normalized log importance ratio. The paper resamples with
    Gumbel noise; this engine standardizes on the deterministic top-slice
    (score >= the (1-keep_frac) corpus quantile), same trade as every
    sampling op here.

    Scale shape (nothing corpus-sized leaves the workers):
      1. ONE feature pass folds each block's bigrams into per-block
         (bucket, c_all, c_tgt) partials via bincount — <= n_buckets rows
         per block; a bucket-keyed grouped sum yields the two LMs
         (n_buckets-bounded, the bounded-driver contract);
      2. the log-ratio table ``lr(b) = ln p_tgt(b) - ln p_raw(b)``
         (add-one smoothing over the FIXED n_buckets feature space) is a
         few KB — broadcast once into the scoring pass;
      3. a second map-only pass re-hashes features and computes each doc's
         mean lr locally (a doc's bigrams never leave its batch — no
         per-doc shuffle at all);
      4. the selection cutoff is the t-digest corpus quantile (exact while
         n_docs <= compression, the pinned contract), ndigits=17 for the
         same tie-exactness reason as perplexity_filter.

    Docs with < 2 tokens carry no features and are excluded (oracle
    mirrors via its bigram inner join). Output:
    (id, n_feats, dsir_logratio round-6, selected)."""
    from ray.data.aggregate import Sum as AggSum

    from clawrag_ray.stages.relational import grouped_quantiles_tdigest

    src = ds.select_columns([id_col, text_col, target_col])

    def partial_counts(b: pa.Table) -> pa.Table:
        rows, buckets = _bigram_buckets(b, text_col, n_buckets)
        if len(buckets) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "pc_all": pa.array([], pa.int64()),
                    "pc_tgt": pa.array([], pa.int64()),
                }
            )
        tgt_rows = pc.equal(b[target_col], target_value).to_numpy(zero_copy_only=False)
        c_all = np.bincount(buckets, minlength=n_buckets)
        c_tgt = np.bincount(buckets[tgt_rows[rows]], minlength=n_buckets)
        nz = np.nonzero(c_all)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "pc_all": pa.array(c_all[nz], pa.int64()),
                "pc_tgt": pa.array(c_tgt[nz], pa.int64()),
            }
        )

    freq = (
        src.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(AggSum("pc_all", alias_name="c_all"), AggSum("pc_tgt", alias_name="c_tgt"))
        .to_pandas()  # n_buckets-bounded
    )
    c_all = np.zeros(n_buckets, dtype=np.int64)
    c_tgt = np.zeros(n_buckets, dtype=np.int64)
    c_all[freq["bucket"].to_numpy()] = freq["c_all"].to_numpy()
    c_tgt[freq["bucket"].to_numpy()] = freq["c_tgt"].to_numpy()
    t_all, t_tgt = int(c_all.sum()), int(c_tgt.sum())
    lr = np.log((c_tgt + 1.0) / (t_tgt + n_buckets)) - np.log((c_all + 1.0) / (t_all + n_buckets))

    def score(b: pa.Table) -> pa.Table:
        rows, buckets = _bigram_buckets(b, text_col, n_buckets)
        sums = np.zeros(b.num_rows, dtype=np.float64)
        np.add.at(sums, rows, lr[buckets])
        n_feats = np.bincount(rows, minlength=b.num_rows).astype(np.int64)
        has = n_feats > 0
        return pa.table(
            {
                id_col: b[id_col].filter(pa.array(has)),
                "n_feats": pa.array(n_feats[has]),
                "__s": pa.array(sums[has] / n_feats[has]),
            }
        )

    scored = src.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).materialize()

    q = 1.0 - keep_frac
    cut_df = grouped_quantiles_tdigest(
        scored.map_batches(
            lambda b: b.append_column("__all", pa.array(np.zeros(b.num_rows, dtype="int64"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["__all"],
        "__s",
        [q],
        ndigits=17,
    ).to_pandas()
    cut = float(cut_df[f"p{int(round(q * 100))}"].iloc[0])

    def assign(b: pa.Table) -> pa.Table:
        s = b["__s"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "n_feats": b["n_feats"],
                "dsir_logratio": pa.array(np.round(s, 6)),
                "selected": pa.array(s >= cut),
            }
        )

    return scored.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def snapshot_diff(
    old: Dataset,
    new: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
) -> Dataset:
    """Corpus snapshot diff — the incremental-crawl bookkeeping operator:
    classify every id across two corpus versions as added / removed /
    changed / unchanged. Each side collapses to (id, sha256(text)) map-
    side first, so the FULL OUTER hash join shuffles 40-byte rows, never
    documents — at 100 TB the diff costs two metadata-narrow passes plus
    one id-keyed exchange. The content hash is the same sha256 the exact-
    dedup path uses (collision-free in practice; the oracle compares the
    texts directly — identical verdicts).
    Output: (id, status) for every id present in either snapshot."""
    from clawrag_ray.functions.kernels import sha256_hex
    from clawrag_ray.stages.relational import hash_join

    def digest(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b[id_col], f"h_{side}": sha256_hex(b[text_col])})

        return fn

    o = old.select_columns([id_col, text_col]).map_batches(
        digest("old"), batch_format="pyarrow", zero_copy_batch=True
    )
    n = new.select_columns([id_col, text_col]).map_batches(
        digest("new"), batch_format="pyarrow", zero_copy_batch=True
    )
    j = hash_join(
        o, n, on="id_old", right_on="id_new", join_type="full_outer", num_partitions=num_partitions
    )

    def classify(b: pa.Table) -> pa.Table:
        # Ray's outer join coalesces the key into the LEFT key column, so
        # id_old is populated for right-only rows too
        ho = b["h_old"].to_pandas()
        hn = b["h_new"].to_pandas()
        only_old = hn.isna().to_numpy()
        only_new = ho.isna().to_numpy()
        same = (ho == hn).to_numpy(dtype=bool, na_value=False)
        status = np.where(
            only_new, "added", np.where(only_old, "removed", np.where(same, "unchanged", "changed"))
        )
        return pa.table(
            {
                id_col: b["id_old"],
                "status": pa.array(status.tolist(), pa.string()),
            }
        )

    return j.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<path>[^?#]*)"


def normalize_urls(ds: Dataset, url_col: str = "url") -> Dataset:
    """URL canonicalization — the first step of every web-corpus domain
    pipeline (C4 / RefinedWeb dedup by URL, domain filters): lowercase
    scheme+host, strip query string and fragment, strip trailing slashes;
    ``domain`` = lowercased host minus a leading ``www.``. Pure vectorized
    Arrow RE2 kernels (extract_regex + replace), map-only. Rows that do
    not parse as absolute URLs pass through unchanged with domain ''
    (documented fallback). Adds: url_norm, domain."""

    def norm(b: pa.Table) -> pa.Table:
        col = b[url_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.extract_regex(col, _URL_RE)
        ok = pc.is_valid(parts)
        scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
        host = pc.utf8_lower(pc.struct_field(parts, "host"))
        path = pc.replace_substring_regex(pc.struct_field(parts, "path"), r"/+$", "")
        rebuilt = pc.binary_join_element_wise(scheme, "://", host, path, "")
        url_norm = pc.if_else(ok, rebuilt, col)
        domain = pc.if_else(ok, pc.replace_substring_regex(host, r"^www\.", ""), pa.scalar(""))
        return b.append_column("url_norm", url_norm).append_column("domain", domain)

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def domain_quality_filter(
    ds: Dataset,
    domain_col: str = "domain",
    value_col: str = "n_chars",
    min_mean: float = 600.0,
    min_docs: int = 5,
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> Dataset:
    """Domain-level quality gate (the RefinedWeb/C4 move of scoring hosts,
    not pages): per-domain mean of ``value_col`` + doc count via the
    two-level aggregate, verdict keep = mean >= min_mean AND n >= min_docs,
    verdicts joined back onto every doc through the distributed keyed join
    (domain table can exceed driver memory on the web — nothing
    domain-sized materializes). The mean is one IEEE division of an exact
    integer sum, so the threshold comparison is bit-equal cross-engine.
    Output: (id, domain, domain_mean round-6, n_domain_docs, keep)."""
    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import pre_aggregate

    stats = pre_aggregate(
        ds.select_columns([domain_col, value_col]), [domain_col], [value_col], count_alias="nd"
    )

    def verdict(b: pa.Table) -> pa.Table:
        s = pc.cast(b[f"sum_{value_col}"], pa.float64()).to_numpy(zero_copy_only=False)
        n = pc.cast(b["nd"], pa.int64()).to_numpy(zero_copy_only=False)
        mean = s / n
        return pa.table(
            {
                "__dom": b[domain_col],
                "domain_mean": pa.array(np.round(mean, 6)),
                "n_domain_docs": pa.array(n),
                "keep": pa.array((mean >= min_mean) & (n >= min_docs)),
            }
        )

    verdicts = stats.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)
    return _keyed_join(
        ds.select_columns([id_col, domain_col]),
        domain_col,
        verdicts,
        "__dom",
        ["domain_mean", "n_domain_docs", "keep"],
        num_partitions=num_partitions,
    )


def perplexity_filter_bigram(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    num_partitions: int = 64,
) -> Dataset:
    """Interpolated BIGRAM cross-entropy per doc — the n-gram-LM upgrade
    of perplexity_filter (one step toward the KenLM scorer CCNet actually
    ships): score(w_i | w_{i-1}) = lam·p_bg + (1-lam)·p_uni with add-one
    smoothing, ``p_bg(u,w) = (c(u,w)+1)/(c(u)+V)``,
    ``p_uni(w) = (c(w)+1)/(T+V)``; entropy = -mean ln score over the
    doc's bigram positions (docs with < 2 tokens carry no evidence and
    are excluded, the DSIR rule).

    Scale shape: the unigram table is a vocab-bounded aggregate broadcast
    once (the accepted vocab-aggregate driver bound; swap to the keyed
    join like perplexity_filter for open web vocabularies); the BIGRAM
    table is NOT bounded, so it stays distributed and attaches to the
    doc's bigram rows via the keyed join with fill 0 for unseen pairs;
    per-doc sums are the usual two-level aggregate. Both interpolation
    weights are explicit literals so the float op sequence is identical
    cross-engine. Output: (id, n_bigrams, entropy round-6)."""
    import ray

    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import pre_aggregate

    lam2 = round(1.0 - lam, 10)  # explicit literal both engines (0.3, not 0.30000000000000004)
    src = ds.select_columns([id_col, text_col])

    def bigram_rows(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        keep = pc.not_equal(flat, "")
        toks = flat.filter(keep).to_pylist()
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if len(toks) < 2:
            return pa.table(
                {
                    id_col: pa.array([], b[id_col].type),
                    "u": pa.array([], pa.string()),
                    "w": pa.array([], pa.string()),
                    "kbg": pa.array([], pa.string()),
                }
            )
        m = parent[:-1] == parent[1:]
        idx = np.nonzero(m)[0]
        us = [toks[j] for j in idx]
        ws = [toks[j + 1] for j in idx]
        return pa.table(
            {
                id_col: pa.array(ids[parent[idx]], b[id_col].type),
                "u": pa.array(us, pa.string()),
                "w": pa.array(ws, pa.string()),
                "kbg": pa.array([a + " " + c for a, c in zip(us, ws)], pa.string()),
            }
        )

    bg = src.map_batches(bigram_rows, batch_format="pyarrow", zero_copy_batch=True).materialize()

    uni = pre_aggregate(_explode_tokens(src, id_col, text_col), ["token"], [], count_alias="c").to_pandas()
    total = int(uni["c"].sum())
    vocab_n = len(uni)
    tok_arr = uni["token"].to_numpy()
    order = np.argsort(tok_arr, kind="mergesort")
    uni_ref = ray.put((tok_arr[order], uni["c"].to_numpy().astype(np.int64)[order]))

    bgc = pre_aggregate(bg.select_columns(["kbg"]), ["kbg"], [], count_alias="cbg")
    joined = _keyed_join(
        bg,
        "kbg",
        bgc.select_columns(["kbg", "cbg"]).map_batches(
            lambda b: b.rename_columns(["kbg_r", "cbg"]), batch_format="pyarrow"
        ),
        "kbg_r",
        ["cbg"],
        num_partitions=num_partitions,
    )

    def lp(b: pa.Table) -> pa.Table:
        vtok, vcnt = ray.get(uni_ref)
        u = b["u"].to_pylist()
        w = b["w"].to_pylist()
        cu = vcnt[np.searchsorted(vtok, u)]
        cw = vcnt[np.searchsorted(vtok, w)]
        cbg = pc.cast(b["cbg"], pa.int64()).to_numpy(zero_copy_only=False)
        p_bg = (cbg + 1.0) / (cu + float(vocab_n))
        p_uni = (cw + 1.0) / float(total + vocab_n)
        val = np.log(lam * p_bg + lam2 * p_uni)
        return pa.table({id_col: b[id_col], "lp": pa.array(val)})

    per_doc = pre_aggregate(
        joined.map_batches(lp, batch_format="pyarrow", zero_copy_batch=True),
        [id_col],
        ["lp"],
        count_alias="n_bigrams",
    )

    def finish(b: pa.Table) -> pa.Table:
        s = pc.cast(b["sum_lp"], pa.float64()).to_numpy(zero_copy_only=False)
        n = pc.cast(b["n_bigrams"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pa.array(n),
                "entropy": pa.array(np.round(-s / n, 6)),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def apply_changes(
    base: Dataset,
    changes: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    num_partitions: int = 16,
) -> Dataset:
    """Corpus MERGE (SCD-1 upsert/delete) — the maintenance operator that
    turns a base snapshot plus a changeset into the next snapshot:
    ``op='upsert'`` inserts or replaces the id's document, ``op='delete'``
    removes it, untouched ids carry through. One FULL OUTER hash join on
    the id (both sides shuffle once, by the same key a partitioned corpus
    is already laid out on); resolution is a vectorized map. Change ids
    must be unique (changeset contract — dedup upstream with the policy
    engine). Output: (id, text, change in {kept, updated, inserted})."""
    from clawrag_ray.stages.relational import hash_join

    b = base.select_columns([id_col, text_col]).map_batches(
        lambda t: t.rename_columns(["id_b", "text_b"]), batch_format="pyarrow", zero_copy_batch=True
    )
    c = changes.select_columns([id_col, text_col, op_col]).map_batches(
        lambda t: t.rename_columns(["id_c", "text_c", "op_c"]), batch_format="pyarrow", zero_copy_batch=True
    )
    j = hash_join(b, c, on="id_b", right_on="id_c", join_type="full_outer", num_partitions=num_partitions)

    def resolve(t: pa.Table) -> pa.Table:
        op = t["op_c"].to_pandas()
        tb = t["text_b"].to_pandas()
        is_delete = (op == "delete").to_numpy(dtype=bool, na_value=False)
        keep = ~is_delete
        op = op[keep]
        tb = tb[keep]
        tc = t["text_c"].to_pandas()[keep]
        ids = t["id_b"].filter(pa.array(keep))
        upsert = (op == "upsert").to_numpy(dtype=bool, na_value=False)
        base_missing = tb.isna().to_numpy()
        text = np.where(upsert, tc.to_numpy(dtype=object, na_value=None), tb.to_numpy(dtype=object, na_value=None))
        change = np.where(
            ~upsert, "kept", np.where(base_missing, "inserted", "updated")
        )
        return pa.table(
            {
                id_col: ids,
                text_col: pa.array(text.tolist(), pa.string()),
                "change": pa.array(change.tolist(), pa.string()),
            }
        )

    return j.map_batches(resolve, batch_format="pyarrow", zero_copy_batch=True)


def _window_hashes_leading(
    codes: "np.ndarray", window: int, pows: "np.ndarray", ipows: "np.ndarray", mod: int
) -> "np.ndarray":
    """Rolling hashes in the LEADING-coefficient orientation
    ``H_j = sum_t codes[j+t] * B^(w-1-t) mod m`` — the exact value the
    SQL prefix recurrence ``h_i = h_{i-1}*B + c_i`` yields for a window
    difference, so boundary rules on the VALUE (not just equality) are
    replayable cross-engine. Same vectorized prefix-sum algebra as
    _window_hashes, with B^{-t} products and a B^{j+w-1} unskew."""
    mm = np.uint64(mod)
    n = len(codes)
    prod = (codes.astype(np.uint64) * ipows[:n]) % mm
    q = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(prod, out=q[1:])
    q %= mm
    diff = (q[window:] + mm - q[:-window]) % mm
    return (diff * pows[window - 1 : n]) % mm


def cdc_chunks(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    mask_bits: int = 6,
) -> Dataset:
    """Content-defined chunking (Manber 1994 fingerprint anchors, public —
    the split rule under rsync/LBFS/dedup storage and chunk-level corpus
    dedup): a chunk boundary falls after every position whose trailing
    ``window``-char rolling hash satisfies ``h % 2^mask_bits == 0``
    (expected chunk length 2^mask_bits). Content-defined means an edit
    only reshapes the chunks it touches — insertions re-align, unlike
    fixed-size splitting — so chunk-hash dedup survives shifted content.
    Classic FastCDC min/max bounds are a sequential-greedy variant
    (documented; the pure anchor rule keeps the op fully declarative and
    oracle-replayable). MAP-ONLY: vectorized window hashes (numpy prefix
    algebra), sparse anchor positions, per-chunk md5. Docs shorter than
    ``window`` are one whole-doc chunk. Output: (id, chunk_idx, start
    1-based, length, chunk_hash)."""
    from clawrag_ray.functions.kernels import md5_prefix_ints

    mask = (1 << mask_bits) - 1

    def split(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_pylist()
        max_n = max((len(t or "") for t in texts), default=1)
        pows, ipows = _modpow_tables(_RH_B, max_n + window + 1, _RH_M1)
        out_id: list = []
        out_idx: list[int] = []
        out_start: list[int] = []
        out_len: list[int] = []
        chunk_texts: list[str] = []
        for doc_id, t in zip(ids, texts):
            t = t or ""
            n = len(t)
            if n == 0:
                continue
            if n >= window:
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
                wh = _window_hashes_leading(codes, window, pows, ipows, _RH_M1)
                ends = (np.flatnonzero((wh & np.uint64(mask)) == 0) + window).tolist()
            else:
                ends = []
            if not ends or ends[-1] != n:
                ends.append(n)
            prev = 0
            for k, e in enumerate(ends, start=1):
                out_id.append(doc_id)
                out_idx.append(k)
                out_start.append(prev + 1)
                out_len.append(e - prev)
                chunk_texts.append(t[prev:e])
                prev = e
        hashes = md5_prefix_ints(chunk_texts) if chunk_texts else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, b[id_col].type),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "start": pa.array(out_start, pa.int64()),
                "length": pa.array(out_len, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True
    )


def cdc_chunks_bounded(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    mask_bits: int = 6,
    min_len: int = 32,
    max_len: int = 128,
) -> Dataset:
    """FastCDC-style BOUNDED content-defined chunking (Xia 2016, public):
    the anchor rule of cdc_chunks plus greedy min/max enforcement — from
    position ``pos`` the next boundary is the SMALLEST anchor in
    ``[pos + min_len, min(pos + max_len, n)]``, else a forced cut at
    ``min(pos + max_len, n)``. Bounds kill the anchor rule's two failure
    modes at scale: pathological anchor-dense content (chunks of a few
    bytes each -> hash-table blow-up downstream) and anchor deserts
    (one giant chunk -> skewed blocks). Every chunk is <= max_len; every
    non-final chunk is >= min_len; edits still only reshape the chunks
    they touch until the next in-bound anchor re-aligns. The greedy fold
    is sequential PER DOC but steps per CHUNK (binary search into the
    sparse anchor array), so a batch stays one vectorized-hash pass plus
    ~n/expected_len tiny steps; MAP-ONLY like cdc_chunks, and the
    recursive-CTE oracle replays the identical rule. Output: (id,
    chunk_idx, start 1-based, length, chunk_hash)."""
    from clawrag_ray.functions.kernels import md5_prefix_ints

    if not (0 < min_len <= max_len):
        raise ValueError("cdc_chunks_bounded: need 0 < min_len <= max_len")
    mask = (1 << mask_bits) - 1

    def split(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_pylist()
        max_n = max((len(t or "") for t in texts), default=1)
        pows, ipows = _modpow_tables(_RH_B, max_n + window + 1, _RH_M1)
        out_id: list = []
        out_idx: list[int] = []
        out_start: list[int] = []
        out_len: list[int] = []
        chunk_texts: list[str] = []
        for doc_id, t in zip(ids, texts):
            t = t or ""
            n = len(t)
            if n == 0:
                continue
            if n >= window:
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
                wh = _window_hashes_leading(codes, window, pows, ipows, _RH_M1)
                anchors = np.flatnonzero((wh & np.uint64(mask)) == 0) + window
            else:
                anchors = np.empty(0, dtype=np.int64)
            pos, k = 0, 0
            while pos < n:
                lim = min(pos + max_len, n)
                lo = int(np.searchsorted(anchors, pos + min_len, side="left"))
                nxt = lim
                if lo < len(anchors) and int(anchors[lo]) <= lim:
                    nxt = int(anchors[lo])
                k += 1
                out_id.append(doc_id)
                out_idx.append(k)
                out_start.append(pos + 1)
                out_len.append(nxt - pos)
                chunk_texts.append(t[pos:nxt])
                pos = nxt
        hashes = md5_prefix_ints(chunk_texts) if chunk_texts else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, b[id_col].type),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "start": pa.array(out_start, pa.int64()),
                "length": pa.array(out_len, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True
    )
