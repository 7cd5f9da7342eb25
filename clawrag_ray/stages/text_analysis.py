"""Text-analysis operators: language-ID, quality scoring, token counting,
fingerprinting, clause/amount extraction (SURVEY.md §2.2 M4/M13/M14/M16-M18
+ the training-data text-analysis suite).

Every rule here is frozen and deliberately expressible in RE2-compatible
regex + arithmetic so the DuckDB oracle in __ray_entry__.oracle_sql can
mirror it exactly (pyarrow and DuckDB both use RE2). All hot paths are
pyarrow.compute kernels over Arrow batches; the only per-row Python is the
rolling-hash fingerprint (no vectorized kernel exists).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum

from clawrag_ray.functions.kernels import bpe_ish_token_count, re2_tokens, rolling_fingerprint, token_count

# Frozen language-ID n-gram (stopword) patterns — deterministic analog of
# the reference's seeded langdetect (metadata_extractor.py:17-27,91-115).
DE_STOPWORDS_RE = r"\b(der|die|das|und|ist|nicht|mit|für|ein|eine)\b"
EN_STOPWORDS_RE = r"\b(the|and|is|of|to|in|that|for|with|on)\b"
LANGID_MIN_CHARS = 50  # below this: "unknown" (metadata_extractor min 50 chars)

PUNCT_RE = r"[.,;:!?]"


def detect_language(ds: Dataset, text_col: str = "text") -> Dataset:
    """Adds de_hits / en_hits / detected_lang columns.

    Rule (frozen): unknown if len < 50; 'de' if de_hits > en_hits;
    'en' if en_hits > 0; else 'unknown'."""

    def detect(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[text_col])
        de = pc.count_substring_regex(lower, DE_STOPWORDS_RE)
        en = pc.count_substring_regex(lower, EN_STOPWORDS_RE)
        n = pc.utf8_length(batch[text_col])
        detected = pc.if_else(
            pc.less(n, LANGID_MIN_CHARS),
            pa.scalar("unknown"),
            pc.if_else(
                pc.greater(de, en),
                pa.scalar("de"),
                pc.if_else(pc.greater(en, 0), pa.scalar("en"), pa.scalar("unknown")),
            ),
        )
        return (
            batch.append_column("de_hits", de)
            .append_column("en_hits", en)
            .append_column("detected_lang", detected)
        )

    return ds.map_batches(detect, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def language_histogram(ds: Dataset, text_col: str = "text") -> Dataset:
    """(detected_lang, n_docs) — distributed with per-batch partials."""
    detected = detect_language(ds.select_columns([text_col]), text_col)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("detected_lang").aggregate([("detected_lang", "count")])
        return g.rename_columns(["detected_lang", "partial_n"])

    return (
        detected.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("detected_lang")
        .aggregate(Sum("partial_n", alias_name="n_docs"))
    )


# Quality score components (doc-level, no span structure available):
# frozen projection of reference quality_scorer.py:8-20,94-143 with default
# ocr confidence 0.5 and default structure 0.2.
def add_quality_score(ds: Dataset, text_col: str = "text") -> Dataset:
    detected = detect_language(ds, text_col)

    def score(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(batch[text_col]), pa.float64())
        length_part = pc.multiply(pc.min_element_wise(pc.divide(n, 5000.0), 1.0), 0.10)
        lang_part = pc.if_else(pc.not_equal(batch["detected_lang"], "unknown"), 0.20, 0.0)
        base = pc.add(pc.add(length_part, lang_part), 0.30 * 0.5 + 0.40 * 0.2)
        raw = pc.if_else(pc.less(n, 20.0), 0.0, base)
        clamped = pc.max_element_wise(pc.min_element_wise(raw, 1.0), 0.0)
        return batch.append_column("quality_score", pc.round(clamped, ndigits=4))

    return detected.map_batches(score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def quality_by_source(ds: Dataset) -> Dataset:
    """(source, n_docs, avg_quality) — rounded for stable comparison."""
    scored = add_quality_score(ds.select_columns(["source", "text"]))
    agg = scored.groupby("source").aggregate(
        Count(alias_name="n_docs"), Mean("quality_score", alias_name="avg_quality")
    )

    def round_out(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("avg_quality"), "avg_quality", pc.round(batch["avg_quality"], ndigits=4)
        )

    return agg.map_batches(round_out, batch_format="pyarrow")


def token_stats_by_lang(ds: Dataset) -> Dataset:
    """(lang, n_docs, total_tokens, total_bpe_tokens) via per-batch partial
    sums then a tiny global groupby."""
    projected = ds.select_columns(["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.append_column("tok", token_count(batch["text"])).append_column(
            "bpe", bpe_ish_token_count(batch["text"])
        )
        g = t.group_by("lang").aggregate([("tok", "sum"), ("bpe", "sum"), ("lang", "count")])
        return g.rename_columns(["lang", "p_tok", "p_bpe", "p_n"])

    return (
        projected.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("p_n", alias_name="n_docs"),
            Sum("p_tok", alias_name="total_tokens"),
            Sum("p_bpe", alias_name="total_bpe_tokens"),
        )
    )


def add_fingerprint(ds: Dataset, text_col: str = "text", window: int = 64) -> Dataset:
    """(.., fingerprint) rolling-hash document fingerprint (min-of-windows
    Rabin-Karp) — content-defined, deterministic."""

    def fp(batch: pa.Table) -> pa.Table:
        vals = [rolling_fingerprint(t or "", window) for t in batch[text_col].to_pylist()]
        return batch.append_column("fingerprint", pa.array(vals, pa.int64()))

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


# clause/amount extraction (ingest_v2/pipeline.py:123-139) — RE2-safe
# mirrors of reference.scoring.CLAUSE_RE / AMOUNT_RE.
CLAUSE_RE2 = r"(?:Abschnitt|Section|Klausel|Clause)\s+[0-9]+"
AMOUNT_RE2 = r"[0-9]{1,3}(?:[,.][0-9]{3})*(?:\.[0-9]{2})?\s?(?:€|\$|USD|EUR|GBP)"


def clause_amount_counts(ds: Dataset) -> Dataset:
    """(source, total_clauses, total_amounts, docs_with_amounts)."""
    projected = ds.select_columns(["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        cl = pc.count_substring_regex(batch["text"], CLAUSE_RE2)
        am = pc.count_substring_regex(batch["text"], AMOUNT_RE2)
        t = (
            batch.append_column("n_clauses", cl)
            .append_column("n_amounts", am)
            .append_column("has_amounts", pc.cast(pc.greater(am, 0), pa.int64()))
        )
        g = t.group_by("source").aggregate([("n_clauses", "sum"), ("n_amounts", "sum"), ("has_amounts", "sum")])
        return g.rename_columns(["source", "p_cl", "p_am", "p_has"])

    return (
        projected.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("p_cl", alias_name="total_clauses"),
            Sum("p_am", alias_name="total_amounts"),
            Sum("p_has", alias_name="docs_with_amounts"),
        )
    )


# Gopher/MassiveText-style repetition thresholds (frozen; chosen so both
# classes are non-empty on the synthetic corpus: 360 keep / 140 drop at
# sf0.01)
REP_TOP_TOKEN_MAX = 0.15
REP_DUP_2GRAM_MAX = 0.05


def repetition_metrics(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Per-doc repetition quality metrics (the Gopher repetition-rule
    family, arXiv:2112.11446 §A1.1 — public formulation): top_token_frac
    (occurrences of the most frequent token / total tokens) and
    dup_2gram_frac (1 - distinct 2-grams / total 2-grams), plus the
    keep flag under the frozen thresholds above. Tokenization is
    lowercase whitespace (SQL mirror: regexp_extract_all(lower(text),
    '\\S+')). Docs with no tokens score 0.0 on both; docs with one token
    have no 2-grams -> dup_2gram_frac 0.0.

    Per-doc token processing is an inherent Python loop (like the
    fingerprint kernel); it runs batched at the Arrow level inside
    map_batches, embarrassingly parallel across blocks. The verdict is a
    pure per-row function, so pipelines that filter on it should thread
    the columns they need through ``keep_cols`` and filter in place —
    no verdict join."""
    from collections import Counter

    def metrics(batch: pa.Table) -> pa.Table:
        top_fracs, dup_fracs = [], []
        for text in batch[text_col].to_pylist():
            toks = re2_tokens((text or "").lower())
            n = len(toks)
            top_fracs.append(round(max(Counter(toks).values()) / n, 6) if n else 0.0)
            if n >= 2:
                total = n - 1
                dup_fracs.append(round(1.0 - len(set(zip(toks, toks[1:]))) / total, 6))
            else:
                dup_fracs.append(0.0)
        top = pa.array(top_fracs, pa.float64())
        dup = pa.array(dup_fracs, pa.float64())
        keep = pc.and_(
            pc.less_equal(top, REP_TOP_TOKEN_MAX), pc.less_equal(dup, REP_DUP_2GRAM_MAX)
        )
        cols = {id_col: batch[id_col]}
        for c in keep_cols or []:
            cols[c] = batch[c]
        cols.update({"top_token_frac": top, "dup_2gram_frac": dup, "keep": keep})
        return pa.table(cols)

    return ds.map_batches(metrics, batch_format="pyarrow", zero_copy_batch=True)


# Frozen Gopher §A1.2 repetition thresholds (Rae et al. 2022 Table A1
# shape; values chosen so both classes are non-empty on the synthetic
# corpus — same convention as the §A1.1 constants above)
REP_DUP_LINE_MAX = 0.30
REP_DUP_LINE_CHAR_MAX = 0.20
REP_TOP_NGRAM_CHAR_MAX = {2: 0.20, 3: 0.18, 4: 0.16}


def gopher_repetition_full(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """The rest of the Gopher repetition-rule family (arXiv:2112.11446
    §A1.2, public formulation) beyond repetition_metrics' token/2-gram
    pair: LINE-level duplication and TOP-n-GRAM character coverage.

    - dup_line_frac: occurrences of non-empty '\\n'-lines whose value
      appears >= 2 times in the doc, over total non-empty lines.
    - dup_line_char_frac: characters in those duplicate occurrences over
      total non-empty-line characters.
    - top_{2,3,4}gram_char_frac: occurrences of the doc's most frequent
      word n-gram (lowercase \\S+ tokens joined by one space; ties break
      to the lexicographically smallest) x the n-gram's char length,
      over len(text).

    Every fraction is ONE IEEE division of exact int64 counts, so values
    are bit-equal cross-engine and the DuckDB oracle replays each rule
    verbatim. keep = all five fractions under the frozen thresholds.
    Map-only; the per-doc Counter pass is the same inherent-loop shape
    as repetition_metrics, batched at the Arrow level."""
    from collections import Counter

    from clawrag_ray.functions.kernels import round6_away

    def metrics(batch: pa.Table) -> pa.Table:
        dl, dlc = [], []
        tng: dict[int, list[float]] = {2: [], 3: [], 4: []}
        for text in batch[text_col].to_pylist():
            t = text or ""
            lines = [x for x in t.split("\n") if x]
            if lines:
                cnt = Counter(lines)
                total = len(lines)
                total_chars = sum(len(x) for x in lines)
                dup = sum(c for c in cnt.values() if c >= 2)
                dup_chars = sum(len(x) * c for x, c in cnt.items() if c >= 2)
                # round6_away, not round(): power-of-two denominators sit
                # exactly ON .5 rounding boundaries (see kernels.round6_away)
                dl.append(round6_away(dup / total))
                dlc.append(round6_away(dup_chars / total_chars) if total_chars else 0.0)
            else:
                dl.append(0.0)
                dlc.append(0.0)
            toks = re2_tokens(t.lower())
            for n in (2, 3, 4):
                if len(toks) < n or not t:
                    tng[n].append(0.0)
                    continue
                grams = Counter(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
                best_c = max(grams.values())
                best_g = min(g for g, c in grams.items() if c == best_c)
                tng[n].append(round6_away(best_c * len(best_g) / len(t)))
        cols = {id_col: batch[id_col]}
        for c in keep_cols or []:
            cols[c] = batch[c]
        dl_a = pa.array(dl, pa.float64())
        dlc_a = pa.array(dlc, pa.float64())
        g_a = {n: pa.array(tng[n], pa.float64()) for n in (2, 3, 4)}
        keep = pc.and_(
            pc.less_equal(dl_a, REP_DUP_LINE_MAX),
            pc.less_equal(dlc_a, REP_DUP_LINE_CHAR_MAX),
        )
        for n in (2, 3, 4):
            keep = pc.and_(keep, pc.less_equal(g_a[n], REP_TOP_NGRAM_CHAR_MAX[n]))
        cols.update(
            {
                "dup_line_frac": dl_a,
                "dup_line_char_frac": dlc_a,
                "top_2gram_char_frac": g_a[2],
                "top_3gram_char_frac": g_a[3],
                "top_4gram_char_frac": g_a[4],
                "keep": keep,
            }
        )
        return pa.table(cols)

    return ds.select_columns(
        [id_col, text_col] + [c for c in keep_cols or [] if c not in (id_col, text_col)]
    ).map_batches(metrics, batch_format="pyarrow", zero_copy_batch=True)


def token_kl_divergence(ds: Dataset, group_col: str = "lang", text_col: str = "text") -> Dataset:
    """Per-group token-distribution drift from the corpus: KL(P_group ||
    P_corpus) over the corpus vocabulary with add-one smoothing — the
    distribution-shift monitor a corpus-composition pipeline runs when a
    new crawl slice lands. The (group, token) counts run as the standard
    two-level distributed aggregate (Arrow split/flatten explode with
    list_parent_indices carrying the group, no Python loop); the KL sum
    itself runs on the vocabulary-x-groups count table, which is
    vocabulary-bounded — the same bounded-driver contract as
    rollup_aggregate (at web vocabularies, cap to the top-K tokens by
    corpus count via heavy_hitters first). Returns (group, n_tokens, kl
    rounded to 6)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from clawrag_ray.stages.relational import pre_aggregate

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        grp = b[group_col].take(pc.list_parent_indices(toks))
        t = pa.table({group_col: grp, "token": flat})
        return t.filter(pc.not_equal(t["token"], ""))

    rows = ds.select_columns([group_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = pre_aggregate(rows, [group_col, "token"], [], count_alias="c").to_pandas()
    dense = counts.pivot_table(index="token", columns=group_col, values="c", fill_value=0)
    ct = dense.sum(axis=1).to_numpy(dtype="int64")  # corpus count per token
    v, n = len(dense), int(ct.sum())
    p_corpus = (ct + 1.0) / (n + v)
    out_g, out_n, out_kl = [], [], []
    for g in dense.columns:
        c = dense[g].to_numpy(dtype="int64")
        ng = int(c.sum())
        p_g = (c + 1.0) / (ng + v)
        out_g.append(g)
        out_n.append(ng)
        out_kl.append(round(float(np.sum(p_g * np.log(p_g / p_corpus))), 6))
    return rd.from_pandas(
        pd.DataFrame({group_col: out_g, "n_tokens": pd.array(out_n, dtype="int64"), "kl": out_kl})
    )


def bpe_train(
    ds: Dataset,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> "pd.DataFrame":
    """Train BPE merge rules over the corpus (the classic Sennrich et al.
    2016 word-internal algorithm — the tokenizer-training step of a
    pretraining pipeline). Returns the ordered merge table
    (rank, left, right, freq).

    Shape: the corpus compresses to its DISTINCT-WORD frequency table via
    the standard two-level aggregate (the only corpus-proportional pass —
    lowercase whitespace words, one shuffle of (word, partial_count)
    rows); the merge loop then runs on that word table, which is
    vocabulary-sized — exactly how production tokenizer trainers work
    (count distributed, merge local). Determinism: ties on pair frequency
    break lexicographically, so the merge sequence is a pure function of
    the corpus bag-of-words."""
    import numpy as np
    import pandas as pd

    from clawrag_ray.stages.relational import pre_aggregate

    def words(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern_regex(pc.utf8_lower(b[text_col]), pattern=r"\s+"))
        return pa.table({"word": flat.filter(pc.not_equal(flat, ""))})

    rows = ds.select_columns([text_col]).map_batches(words, batch_format="pyarrow", zero_copy_batch=True)
    wf = pre_aggregate(rows, ["word"], [], count_alias="n").to_pandas()  # vocabulary-sized

    symbol_seqs = [tuple(w) for w in wf["word"]]
    counts = wf["n"].to_numpy(dtype="int64")
    merges = []
    for rank in range(n_merges):
        pair_freq: dict = {}
        for seq, c in zip(symbol_seqs, counts):
            for a, b_ in zip(seq, seq[1:]):
                pair_freq[(a, b_)] = pair_freq.get((a, b_), 0) + int(c)
        if not pair_freq:
            break
        # deterministic argmax: highest freq, then lexicographically
        # smallest pair
        best_freq = max(pair_freq.values())
        if best_freq < min_pair_freq:
            break
        best_pair = min(p for p, f in pair_freq.items() if f == best_freq)
        merges.append((rank, best_pair[0], best_pair[1], int(best_freq)))
        joined = best_pair[0] + best_pair[1]
        new_seqs = []
        for seq in symbol_seqs:
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best_pair[0] and seq[i + 1] == best_pair[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        symbol_seqs = new_seqs
    return pd.DataFrame(merges, columns=["rank", "left", "right", "freq"])


def bpe_apply(seq: tuple, merges) -> tuple:
    """Encode ONE symbol sequence with trained merge rules applied in rank
    order; each merge rewrites every leftmost-first non-overlapping
    occurrence — byte-for-byte the inner loop of bpe_train, so encoding a
    training word reproduces its training-end segmentation (and the SQL
    oracle's separator-string replace(), which shares the same
    leftmost-non-overlapping contract, replays it exactly).

    ``merges``: iterable of (left, right) pairs ordered by rank (the
    first two columns of bpe_train's output)."""
    for a, b in merges:
        n = len(seq)
        if n < 2:
            break
        out = []
        i = 0
        while i < n:
            if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = tuple(out)
    return seq


def refine_markdown(
    ds,
    text_col: str = "text",
    out_col: str = "refined",
    head_chars: int = 15000,
    model_path: str | None = None,
    concurrency=(1, 8),
):
    """Deterministic markdown/OCR refinement — the rule-based analog of
    the reference's LLM refine pass (docling_service.py:228-262: fix
    hyphenation, tidy structure, strip OCR artifacts, applied to the
    FIRST 15000 chars only with the tail passing through untouched). The
    LLM itself is non-deterministic and stays off by default; a
    ``model_path`` file defining ``refine_texts(texts: list[str]) ->
    list[str]`` plugs a real model in per actor (the head-window split is
    applied around it identically).

    Stand-in rules, all vectorized Arrow RE2 (mirrored digit-for-digit by
    the SQL oracle):
      1. join hyphenated line wraps: '-\\n' + lowercase letter
      2. collapse runs of 3+ newlines to one blank line
      3. strip U+FFFD replacement characters
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data import Dataset  # noqa: F401

    if model_path:
        from clawrag_ray.functions.kernels import load_kernel

        class PluggedRefine:
            def __init__(self):
                self.fn = load_kernel(model_path, "refine_texts")

            def __call__(self, b: pa.Table) -> pa.Table:
                texts = [t or "" for t in b[text_col].to_pylist()]
                heads = [t[:head_chars] for t in texts]
                tails = [t[head_chars:] for t in texts]
                refined = [h + t for h, t in zip(self.fn(heads), tails)]
                return b.append_column(out_col, pa.array(refined, pa.string()))

        return ds.map_batches(
            PluggedRefine, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
        )

    def refine(b: pa.Table) -> pa.Table:
        head = pc.utf8_slice_codeunits(b[text_col], 0, head_chars)
        tail = pc.utf8_slice_codeunits(b[text_col], head_chars, 2**31 - 1)
        h = pc.replace_substring_regex(head, pattern=r"-\n([a-z])", replacement=r"\1")
        h = pc.replace_substring_regex(h, pattern=r"\n{3,}", replacement="\n\n")
        h = pc.replace_substring_regex(h, pattern="�", replacement="")
        return b.append_column(out_col, pc.binary_join_element_wise(h, tail, ""))

    return ds.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)


def quality_classifier(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    model_path: str | None = None,
    keep_cols: list[str] | None = None,
) -> Dataset:
    """fastText-style linear quality classifier (Joulin et al. 2016,
    public; the shape behind CCNet/LLaMA "Wikipedia-like" page filters):
    each doc scores the MEAN weight of its hashed bag-of-words features,
    ``margin = mean(w[md5(token) % n_buckets])``, keep iff margin >= 0
    (the sign of a linear classifier — sigmoid is monotone, so the
    decision needs no exp and stays bit-exact cross-engine).

    No pretrained weights exist in this sandbox, so the frozen weight
    vector is the deterministic stand-in ``w[j] = md5_prefix_int('w'+j)
    / 2^32 * 2 - 1`` in [-1, 1) — every arithmetic step a power-of-two
    scale, so DuckDB replays it digit-for-digit. ``model_path=`` loads a
    real (weights, bias) pair per actor (load_kernel contract), same
    plug-point pattern as HashEmbedder/ImageFeatures.

    Scale shape: entirely MAP-ONLY — the weight table is a few KB closed
    over the batch fn (broadcast once per worker by Ray), a doc's tokens
    never leave its batch, no shuffle anywhere. Zero-token docs carry no
    features and are excluded (oracle mirrors via its inner join).
    Output: (id, n_tokens, clf_margin round-6, keep)."""
    import numpy as np

    from clawrag_ray.functions.kernels import md5_prefix_ints

    if model_path is not None:
        from clawrag_ray.functions.kernels import load_kernel

        weights, bias = load_kernel(model_path, "quality_weights")(n_buckets)
        weights = np.asarray(weights, dtype=np.float64)
    else:
        weights = (
            md5_prefix_ints([f"w{j}" for j in range(n_buckets)]).astype(np.float64)
            / 4294967296.0
            * 2.0
            - 1.0
        )
        bias = 0.0

    def score(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        keep_tok = pc.not_equal(flat, "")
        toks = flat.filter(keep_tok).to_pylist()
        parent = parent[keep_tok.to_numpy(zero_copy_only=False)]
        sums = np.zeros(b.num_rows, dtype=np.float64)
        if toks:
            buckets = md5_prefix_ints(toks) % n_buckets
            np.add.at(sums, parent, weights[buckets])
        n_tok = np.bincount(parent, minlength=b.num_rows).astype(np.int64)
        has = n_tok > 0
        margin = sums[has] / n_tok[has] + bias
        passthrough = {c: b[c].filter(pa.array(has)) for c in keep_cols or []}
        return pa.table(
            {
                id_col: b[id_col].filter(pa.array(has)),
                **passthrough,
                "n_tokens": pa.array(n_tok[has]),
                "clf_margin": pa.array(np.round(margin, 6)),
                "keep": pa.array(margin >= 0.0),
            }
        )

    return ds.select_columns([id_col, text_col] + [c for c in keep_cols or [] if c != text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def token_pmi_pairs(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    num_partitions: int = 64,
) -> Dataset:
    """Document-level token co-occurrence with pointwise mutual
    information (Church & Hanks 1990, public) — the association-mining
    primitive under collocation discovery, topic seeding, and
    related-term expansion: PMI(x, y) = ln(N·c_xy / (c_x·c_y)) where
    counts are DOCUMENT frequencies (a doc contributes each token once).

    A-priori pruning keeps the pair space tractable (Agrawal 1994): the
    document-frequency table is computed first (two-level aggregate) and
    only tokens with df >= min_count participate in pair generation — the
    frequent-token table is min_count-bounded (<= total_tokens/min_count
    entries) and broadcasts once; swap in heavy_hitters for web
    vocabularies where even that bound is too wide (documented). Pair
    generation is then map-side (numpy triu over each doc's frequent-token
    ids — a doc's pairs never leave its batch) into one pair-keyed count.
    The PMI argument is one IEEE division of two exact int64 products, so
    values are bit-equal cross-engine. Output: (tok_a, tok_b, n_ab, pmi)
    for pairs with n_ab >= min_count."""
    import numpy as np
    import pandas as pd

    import ray

    from clawrag_ray.stages.relational import pre_aggregate

    n_docs = ds.count()
    src = ds.select_columns([id_col, text_col])

    def distinct_tokens(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        keep = pc.not_equal(flat, "")
        toks = np.asarray(flat.filter(keep).to_pylist(), dtype=object)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        # distinct per doc: unique over (parent, token)
        d = pd.DataFrame({"p": parent, "token": toks}).drop_duplicates()
        return pa.table({"__row": pa.array(d["p"].to_numpy(), pa.int64()), "token": pa.array(d["token"], pa.string())})

    tok_rows = src.map_batches(distinct_tokens, batch_format="pyarrow", zero_copy_batch=True)
    df_tbl = pre_aggregate(tok_rows.select_columns(["token"]), ["token"], [], count_alias="c")
    freq = df_tbl.map_batches(
        lambda b: b.filter(pc.greater_equal(pc.cast(b["c"], pa.int64()), min_count)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()  # min_count-bounded (documented heavy_hitters swap beyond)
    vocab = freq["token"].to_numpy()
    order = np.argsort(vocab, kind="mergesort")
    vocab = vocab[order]
    dfs = freq["c"].to_numpy().astype(np.int64)[order]
    freq_ref = ray.put((vocab, dfs))

    def pairs(b: pa.Table) -> pa.Table:
        fvocab, _ = ray.get(freq_ref)
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        out_a, out_b = [], []
        for lst in parts.to_pylist():
            toks = {t for t in lst if t}
            idx = np.searchsorted(fvocab, sorted(toks))
            present = [
                j
                for t, j in zip(sorted(toks), idx)
                if j < len(fvocab) and fvocab[j] == t
            ]
            if len(present) < 2:
                continue
            arr = np.asarray(present, dtype=np.int64)
            i, j = np.triu_indices(len(arr), k=1)
            out_a.append(arr[i])
            out_b.append(arr[j])
        if not out_a:
            return pa.table(
                {"ia": pa.array([], pa.int64()), "ib": pa.array([], pa.int64())}
            )
        return pa.table(
            {"ia": pa.array(np.concatenate(out_a)), "ib": pa.array(np.concatenate(out_b))}
        )

    pair_counts = pre_aggregate(
        src.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["ia", "ib"],
        [],
        count_alias="n_ab",
    )

    def score(b: pa.Table) -> pa.Table:
        fvocab, fdfs = ray.get(freq_ref)
        ia = b["ia"].to_numpy(zero_copy_only=False)
        ib = b["ib"].to_numpy(zero_copy_only=False)
        n_ab = pc.cast(b["n_ab"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = n_ab >= min_count
        ia, ib, n_ab = ia[keep], ib[keep], n_ab[keep]
        arg = (n_ab * np.int64(n_docs)).astype(np.float64) / (fdfs[ia] * fdfs[ib]).astype(
            np.float64
        )
        return pa.table(
            {
                "tok_a": pa.array(fvocab[ia], pa.string()),
                "tok_b": pa.array(fvocab[ib], pa.string()),
                "n_ab": pa.array(n_ab),
                "pmi": pa.array(np.round(np.log(arg), 6)),
            }
        )

    return pair_counts.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# Frozen Gopher document-quality thresholds (Rae et al. 2022 §A1.1) —
# stopword requirement relaxed 2 -> 1 because the synthetic corpus
# vocabulary carries only one of Gopher's eight stopwords ("the"); the
# paper value is the documented production setting.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_MIN = 3.0
GOPHER_MWL_MAX = 10.0
GOPHER_SYMBOL_RATIO_MAX = 0.1
GOPHER_BULLET_FRAC_MAX = 0.9
GOPHER_ELLIPSIS_FRAC_MAX = 0.3
GOPHER_ALPHA_FRAC_MIN = 0.8
GOPHER_MIN_STOPWORDS = 1
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """The COMPLETE Gopher document-quality rule set (Rae et al. 2022
    §A1.1, public) beyond the repetition family repetition_metrics
    covers: word-count bounds, mean word length band, symbol-to-word
    ratio (#/ellipsis), bullet-start and ellipsis-end line fractions,
    alphabetic-word fraction, and required-stopword presence — the
    standard first-pass web filter before dedup/LM scoring.

    Entirely MAP-ONLY and fully vectorized: every metric is an Arrow RE2
    count kernel over the batch (multiline ``(?m)`` anchors for the line
    rules, non-overlapping match counts — the same RE2 semantics DuckDB
    uses, so each ratio is one exact-integer division and every threshold
    comparison is bit-equal cross-engine). Zero-word docs fail keep with
    all ratios 0. Output: (id, n_words, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_frac, n_stopwords, keep)."""
    import numpy as np

    def metrics(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        low = pc.utf8_lower(col)

        def cnt(pattern, src=col):
            return pc.cast(pc.count_substring_regex(src, pattern), pa.float64()).to_numpy(
                zero_copy_only=False
            )

        n_words = cnt(r"\S+")
        non_ws = cnt(r"\S")
        n_symbols = cnt(r"#|\.{3}|…")
        n_lines = cnt(r"\n") + 1.0
        n_bullet = cnt(r"(?m)^[-*•]")
        n_ellipsis_end = cnt(r"(?m)(?:\.{3}|…)$")
        n_alpha_words = cnt(r"\S*[A-Za-z]\S*")
        n_stop = np.zeros(len(n_words))
        for sw in GOPHER_STOPWORDS:
            n_stop += (
                pc.match_substring_regex(low, rf"\b{sw}\b").to_numpy(zero_copy_only=False)
            )
        safe_w = np.maximum(n_words, 1.0)
        mwl = non_ws / safe_w
        symbol_ratio = n_symbols / safe_w
        bullet_frac = n_bullet / n_lines
        ellipsis_frac = n_ellipsis_end / n_lines
        alpha_frac = n_alpha_words / safe_w
        keep = (
            (n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mwl >= GOPHER_MWL_MIN)
            & (mwl <= GOPHER_MWL_MAX)
            & (symbol_ratio <= GOPHER_SYMBOL_RATIO_MAX)
            & (bullet_frac <= GOPHER_BULLET_FRAC_MAX)
            & (ellipsis_frac <= GOPHER_ELLIPSIS_FRAC_MAX)
            & (alpha_frac >= GOPHER_ALPHA_FRAC_MIN)
            & (n_stop >= GOPHER_MIN_STOPWORDS)
        )
        zero = n_words == 0
        passthrough = {c: b[c] for c in keep_cols or []}
        return pa.table(
            {
                id_col: b[id_col],
                **passthrough,
                "n_words": pa.array(n_words.astype(np.int64)),
                "mean_word_len": pa.array(np.round(np.where(zero, 0.0, mwl), 6)),
                "symbol_ratio": pa.array(np.round(np.where(zero, 0.0, symbol_ratio), 6)),
                "bullet_frac": pa.array(np.round(bullet_frac, 6)),
                "ellipsis_frac": pa.array(np.round(ellipsis_frac, 6)),
                "alpha_frac": pa.array(np.round(np.where(zero, 0.0, alpha_frac), 6)),
                "n_stopwords": pa.array(n_stop.astype(np.int64)),
                "keep": pa.array(keep & ~zero),
            }
        )

    return ds.select_columns([id_col, text_col] + [c for c in keep_cols or [] if c != text_col]).map_batches(
        metrics, batch_format="pyarrow", zero_copy_batch=True
    )


def c4_filter(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, public): keep only
    lines that end in terminal punctuation (. ! ? ") AND contain >= 5
    words; drop the whole page if it contains "lorem ipsum" or a curly
    brace, or if the cleaned text has < 3 sentences ([.!?] marks — the
    sentence proxy; C4's langdetect and dirty-word list are out of scope
    here, the langid stage covers the former). MAP-ONLY: Arrow line
    split + flatten with parent indices, vectorized line predicates, and
    a per-batch grouped join rebuild (a doc's lines never leave its
    batch). Output: (id, clean_text, n_kept_lines, n_sentences, keep)."""
    import numpy as np
    import pandas as pd

    def clean(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lines = pc.split_pattern(col, "\n")
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lines)
        ok = pc.and_(
            pc.match_substring_regex(flat, r"[.!?\"]$"),
            pc.greater_equal(pc.count_substring_regex(flat, r"\S+"), 5),
        ).to_numpy(zero_copy_only=False)
        kept = pd.DataFrame({"p": parent[ok], "ln": np.asarray(flat.to_pylist(), dtype=object)[ok]})
        joined = kept.groupby("p", sort=True)["ln"].agg("\n".join)
        n_kept = kept.groupby("p", sort=True)["ln"].size()
        clean_text = np.full(b.num_rows, "", dtype=object)
        clean_text[joined.index.to_numpy()] = joined.to_numpy()
        nk = np.zeros(b.num_rows, dtype=np.int64)
        nk[n_kept.index.to_numpy()] = n_kept.to_numpy()
        clean_arr = pa.array(clean_text.tolist(), pa.string())
        n_sent = pc.cast(pc.count_substring_regex(clean_arr, r"[.!?]"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        has_lorem = pc.match_substring(col, "lorem ipsum").to_numpy(zero_copy_only=False)
        has_brace = pc.match_substring(col, "{").to_numpy(zero_copy_only=False)
        keep = (n_sent >= 3) & ~has_lorem & ~has_brace
        return pa.table(
            {
                id_col: b[id_col],
                "clean_text": clean_arr,
                "n_kept_lines": pa.array(nk),
                "n_sentences": pa.array(n_sent),
                "keep": pa.array(keep),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        clean, batch_format="pyarrow", zero_copy_batch=True
    )


def readability_scores(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Flesch reading-ease per doc (Flesch 1948, public) with the frozen
    counting rules every regex implementation of the metric uses: words =
    RE2 ``\\S+`` matches, sentences = ``[.!?]+`` runs (min 1 so the score
    is total), syllables = vowel-group runs ``[aeiouy]+`` over the
    lowercased text (no-vowel words contribute 0 — documented deviation
    from dictionary syllabification). MAP-ONLY Arrow count kernels; the
    score is two exact-count divisions and a fixed left-associated
    arithmetic chain, bit-equal cross-engine.
    Output: (id, n_words, n_sentences, n_syllables, flesch round-6)."""
    import numpy as np

    def score(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.cast(pc.count_substring_regex(col, r"\S+"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        sents = pc.cast(pc.count_substring_regex(col, r"[.!?]+"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        syll = pc.cast(
            pc.count_substring_regex(pc.utf8_lower(col), r"[aeiouy]+"), pa.float64()
        ).to_numpy(zero_copy_only=False)
        s1 = np.maximum(sents, 1.0)
        w1 = np.maximum(words, 1.0)
        flesch = 206.835 - 1.015 * (words / s1) - 84.6 * (syll / w1)
        return pa.table(
            {
                id_col: b[id_col],
                "n_words": pa.array(words.astype(np.int64)),
                "n_sentences": pa.array(sents.astype(np.int64)),
                "n_syllables": pa.array(syll.astype(np.int64)),
                "flesch": pa.array(np.round(flesch, 6)),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


# Deterministic stand-in blocklist (the C4 "List of Dirty, Naughty ..."
# filter shape — the real list is a drop-in replacement via the terms=
# argument; these tokens exist in the synthetic corpus so both keep
# classes are exercised)
DEFAULT_BLOCKLIST = ("spark", "vector")


def blocklist_filter(
    ds: Dataset,
    terms: tuple[str, ...] = DEFAULT_BLOCKLIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
) -> Dataset:
    """Blocklist page filter (the C4 §2.2 dirty-word rule, public): count
    whole-word occurrences of any blocklist term (case-insensitive) and
    keep docs with <= max_hits. One alternation regex compiled from the
    term list — a single RE2 scan per doc regardless of list size (the
    Aho-Corasick-equivalent RE2 builds internally), MAP-ONLY and
    vectorized. Output: (id, n_blocked, keep)."""
    import re as _re

    pattern = r"\b(?:" + "|".join(_re.escape(t.lower()) for t in terms) + r")\b"

    def scan(b: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(pc.utf8_lower(b[text_col]), pattern), pa.int64()
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_blocked": n,
                "keep": pc.less_equal(n, max_hits),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )
