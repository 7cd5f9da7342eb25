"""BM25 corpus build + scoring as grouped aggregates (SURVEY.md §2 M26/A5/T7).

Reimplements the dataflow contract of ClawRag's BM25 index build
(reference backend/src/core/bm25_index.py:94-176: tokenize every node,
build a corpus-wide BM25Okapi) and its §-aware tokenizer
(bm25_index.py:21-54) as Ray Data stages:

  * tokenization is a stateless batch map (pure regex — the per-doc token
    multiset never leaves the task; only (doc_id, token, tf) partials and
    per-doc lengths shuffle),
  * document frequencies are a two-level aggregate: per-batch distinct
    presence partials, then a global groupby(token) sum,
  * IDF uses the public BM25Okapi formula: ln((N - df + 0.5)/(df + 0.5))
    with negative values floored to epsilon * average-IDF (epsilon 0.25),
  * scoring joins the (small, broadcast) query-token IDF row set against
    the per-doc TF rows and reduces with a groupby(doc) sum — documents
    themselves never shuffle.

The reference rebuilds the whole index in one process on every add; here
the same numbers fall out of a streaming two-pass aggregate that scales
with the token vocabulary, not the corpus.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

BM25_EPSILON = 0.25
BM25_K1 = 1.5
BM25_B = 0.75

_SECTION_FIX_RE = re.compile(r"§\s+(\d+)")
_TOKEN_RE = re.compile(r"§\d+|[\w]+")
_DIGITS_RE = re.compile(r"[0-9]+$")


def bm25_tokenize(text: str) -> list[str]:
    """§-aware BM25 tokenizer — token-for-token port of the reference
    contract (bm25_index.py:21-54): lowercase, '§ 230' -> '§230', tokens
    are §-number or word runs; each §N also emits the bare number, and each
    multi-digit number emits its nonzero digits."""
    text = _SECTION_FIX_RE.sub(r"§\1", text.lower())
    tokens: list[str] = []
    for token in _TOKEN_RE.findall(text):
        tokens.append(token)
        if token.startswith("§"):
            number = token[1:]
            if number.isdigit():
                tokens.append(number)
        elif token.isdigit() and len(token) > 1:
            for digit in token:
                if digit != "0":
                    tokens.append(digit)
    return tokens


def _tf_rows(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, token, tf) rows + per-doc token count (dl) rows.

    Emits BOTH row kinds in one pass (token='' rows carry dl) so the
    corpus is tokenized exactly once."""
    ids, toks, tfs = [], [], []
    dl_ids, dls = [], []
    for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        counts: dict[str, int] = {}
        n = 0
        for t in bm25_tokenize(text or ""):
            counts[t] = counts.get(t, 0) + 1
            n += 1
        for t, c in counts.items():
            ids.append(doc_id)
            toks.append(t)
            tfs.append(c)
        dl_ids.append(doc_id)
        dls.append(n)
    id_type = batch.schema.field(id_col).type
    return pa.table(
        {
            "doc_id": pa.array(ids + dl_ids, id_type),
            "token": pa.array(toks + [""] * len(dl_ids), pa.string()),
            "tf": pa.array(tfs + dls, pa.int64()),
        }
    )


def bm25_token_rows(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Tokenize once -> (doc_id, token, tf) rows; token='' rows carry the
    document length (total token count) instead of a term frequency."""
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _tf_rows(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bm25_idf_table(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text", n_docs: int | None = None
) -> pd.DataFrame:
    """Corpus-wide (token, df, idf) — the distributed BM25Okapi._calc_idf.

    Two-level DF aggregate: per-batch presence partials (one row per
    (token, batch)) then a global groupby(token) sum; the epsilon floor
    needs the vocabulary-wide average IDF, which is a second tiny pass over
    the aggregated vocabulary (vocab-sized, not corpus-sized). Returns a
    DataFrame sorted by token with idf rounded to 6."""
    if n_docs is None:
        n_docs = ds.count()

    def presence_partial(batch: pa.Table) -> pa.Table:
        toks: dict[str, int] = {}
        for text in batch[text_col].to_pylist():
            for t in set(bm25_tokenize(text or "")):
                toks[t] = toks.get(t, 0) + 1
        return pa.table(
            {
                "token": pa.array(list(toks.keys()), pa.string()),
                "partial_df": pa.array(list(toks.values()), pa.int64()),
            }
        )

    partials = ds.select_columns([text_col]).map_batches(
        presence_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    df = partials.groupby("token").aggregate(Sum("partial_df", alias_name="df")).to_pandas()
    # vocabulary-sized from here on (BM25Okapi._calc_idf semantics)
    raw = np.log(n_docs - df["df"] + 0.5) - np.log(df["df"] + 0.5)
    eps = BM25_EPSILON * raw.mean() if len(raw) else 0.0
    df["idf"] = np.round(np.where(raw < 0, eps, raw), 6)
    df["df"] = df["df"].astype("int64")
    return df.sort_values("token").reset_index(drop=True)


def bm25_topk(
    ds: Dataset,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """BM25Okapi scores for one query, distributed: the query's token IDF
    rows (a handful) broadcast into a batch map over the per-doc TF rows;
    per-doc partial scores reduce with a groupby(doc) sum. Returns the
    top-k (doc_id, score rounded to 6) sorted by score desc, doc_id asc."""
    import ray

    import pyarrow.compute as pc

    # ONE tokenizer pass: materialize the (doc_id, token, tf) rows, then
    # derive df / n_docs / avgdl from them with a single grouped aggregate
    # (the token='' dl rows double as the per-doc marker: their count is
    # n_docs and their tf sum is the total token count)
    rows = bm25_token_rows(ds, id_col, text_col).materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("token").aggregate([("tf", "count"), ("tf", "sum")])
        return g.rename_columns(["token", "p_cnt", "p_sum"])

    stats = (
        rows.map_batches(stats_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("p_cnt", alias_name="cnt"), Sum("p_sum", alias_name="tfsum"))
        .to_pandas()
    )
    dl_row = stats[stats["token"] == ""]
    n_docs = int(dl_row["cnt"].iloc[0]) if len(dl_row) else 0
    avgdl = (float(dl_row["tfsum"].iloc[0]) / n_docs) if n_docs else 1.0
    vocab = stats[stats["token"] != ""]
    raw = np.log(n_docs - vocab["cnt"] + 0.5) - np.log(vocab["cnt"] + 0.5)
    eps = BM25_EPSILON * raw.mean() if len(raw) else 0.0
    idf_vals = np.round(np.where(raw < 0, eps, raw), 6)
    q_idf = dict(zip(vocab["token"], idf_vals))
    q_tokens = sorted(set(bm25_tokenize(query)))
    q_weights = {t: float(q_idf.get(t, 0.0)) for t in q_tokens}
    weights_ref = ray.put(q_weights)

    class Scorer:
        def __init__(self):
            self.w = ray.get(weights_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            dl_mask = pc.equal(batch["token"], "")
            dl_rows = batch.filter(dl_mask)
            tf_rows = batch.filter(
                pc.and_(pc.invert(dl_mask), pc.is_in(batch["token"], value_set=pa.array(list(self.w) or [""])))
            )
            # dl joins back per doc within the batch; docs are whole within a
            # block only if upstream kept them so — dl rows therefore emit as
            # their own partial keyed rows and merge in the groupby below
            parts = []
            if tf_rows.num_rows:
                w = pa.array([self.w[t] for t in tf_rows["token"].to_pylist()], pa.float64())
                parts.append(
                    pa.table({"doc_id": tf_rows["doc_id"], "kind": pa.array(["tf"] * tf_rows.num_rows), "tf": pc.cast(tf_rows["tf"], pa.float64()), "w": w})
                )
            if dl_rows.num_rows:
                parts.append(
                    pa.table({"doc_id": dl_rows["doc_id"], "kind": pa.array(["dl"] * dl_rows.num_rows), "tf": pc.cast(dl_rows["tf"], pa.float64()), "w": pa.nulls(dl_rows.num_rows, pa.float64())})
                )
            if not parts:
                return pa.table({"doc_id": pa.array([], batch.schema.field("doc_id").type), "kind": pa.array([], pa.string()), "tf": pa.array([], pa.float64()), "w": pa.array([], pa.float64())})
            return pa.concat_tables(parts)

    scored = rows.map_batches(Scorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8))

    # Reduce: one vectorized pandas pass per HASH PARTITION of whole doc
    # groups (hash_partitioned_groups), NOT one fn call per document — the
    # per-doc map_groups shape is the measured per-group-overhead trap
    # (relational.py:46-61). Each partition emits only its LOCAL top-k
    # (score desc, doc_id asc); top-k selection under a total order is
    # associative, so the driver-side merge over num_partitions * k rows is
    # exact and tiny. Zero-score docs (dl row, no matching tf rows) are
    # kept via the reindex so tie-at-zero behavior matches the oracle's
    # LEFT JOIN ... coalesce(score, 0).
    from clawrag_ray.stages.relational import hash_partitioned_groups

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        dl_per_doc = g.loc[g["kind"] == "dl"].groupby("doc_id", sort=False)["tf"].sum()
        tfg = g[g["kind"] == "tf"]
        dl_of = tfg["doc_id"].map(dl_per_doc).astype(float)
        denom_scale = k1 * (1 - b + b * dl_of / avgdl)
        contrib = tfg["w"] * tfg["tf"] * (k1 + 1) / (tfg["tf"] + denom_scale)
        scores = contrib.groupby(tfg["doc_id"], sort=False).sum()
        scores = scores.reindex(dl_per_doc.index, fill_value=0.0).round(6)
        out = pd.DataFrame({"doc_id": scores.index, "score": scores.to_numpy()})
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)

    per = hash_partitioned_groups(scored, ["doc_id"], part_topk).to_pandas()
    per = per.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
    return per.reset_index(drop=True)


def bm25_score_reference(corpus: list[str], query: str, k1: float = BM25_K1, b: float = BM25_B) -> list[float]:
    """Single-process oracle for tests: literal BM25Okapi math over the
    tokenizer above (public rank_bm25 semantics, no library import)."""
    toks = [bm25_tokenize(t) for t in corpus]
    n = len(corpus)
    df: dict[str, int] = {}
    for ts in toks:
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n - d + 0.5) - math.log(d + 0.5) for t, d in df.items()}
    if idf:
        eps = BM25_EPSILON * (sum(idf.values()) / len(idf))
        idf = {t: (eps if v < 0 else v) for t, v in idf.items()}
    avgdl = sum(len(ts) for ts in toks) / max(1, n)
    scores = []
    for ts in toks:
        dl = len(ts)
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        s = 0.0
        for qt in set(bm25_tokenize(query)):
            f = tf.get(qt, 0)
            if f:
                s += idf.get(qt, 0.0) * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return scores


def inverted_index(ds: Dataset, id_col: str = "doc_id", text_col: str = "text", num_partitions: int = 64) -> Dataset:
    """Posting-list build (the K2 index surface as a dataflow): one
    tokenizer pass emits per-doc distinct token rows; ONE hash-partition
    pass by token assembles each term's sorted posting list plus its
    document frequency — the shuffle carries one row per distinct
    (doc, token), and each partition builds MANY whole posting lists
    vectorized. Postings serialize as a comma-joined doc_id string (the
    oracle-comparable wire format; a list<int64> column is the binary
    variant). At web scale cap or tier ubiquitous terms' lists — they
    are stopwords, not retrieval signal."""
    from clawrag_ray.stages.relational import hash_partitioned_groups

    rows = bm25_token_rows(ds, id_col, text_col)

    def drop_dl(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.not_equal(b["token"], "")).select(["token", id_col])

    tok = rows.map_batches(drop_dl, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        grp = g.groupby("token", sort=False)
        out = grp[id_col].agg(lambda s: ",".join(s.astype(str)))
        df = grp.size()
        return pd.DataFrame(
            {"token": out.index, "df": df.to_numpy().astype("int64"), "postings": out.to_numpy()}
        )

    return hash_partitioned_groups(tok, ["token"], per_part, num_partitions=num_partitions)


def tfidf_topk(
    ds: Dataset,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """TF-IDF cosine retrieval (the classic ltc weighting — Salton &
    Buckley 1988, public): doc component c(t,d) = (1 + ln tf) * ln(N/df),
    doc norm = sqrt(sum c^2) over ALL its terms, query weight = ln(N/df)
    per distinct query token, score = dot / (|d| * |q|). The second
    lexical ranker next to BM25 (true vector cosine vs BM25's dl/avgdl
    saturation).

    Distributed shape (the bm25_topk layout): document frequencies are ONE
    vocabulary-sized two-level aggregate whose result broadcasts via
    ray.put (vocab state, like the BM25 IDF table — fine up to ~10^7-token
    vocabularies; beyond that swap the broadcast for a keyed join by
    token, trading one corpus shuffle for the vocab memory). Scoring is
    then MAP-ONLY: docs arrive whole per row, so per-doc tf, component
    vector, norm, and query dot all compute inside the batch; each block
    emits only its local top-k and the final sort-limit reduces the
    k-x-blocks candidate set. Two shuffles total (df aggregate + top-k)."""
    import ray

    import pyarrow.compute as pc
    from clawrag_ray.stages.relational import pre_aggregate

    n_docs = ds.count()

    def presence(b: pa.Table) -> pa.Table:
        # distinct (doc, token) presence partials for DF
        lst = pc.split_pattern_regex(pc.utf8_lower(b[text_col]), pattern=r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        idx = pc.list_parent_indices(lst)
        t = pa.table({"__i": idx, "token": lst.values})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["__i", "token"]).aggregate([]).group_by("token").aggregate([("__i", "count")])
        return g.rename_columns(["token", "p"])

    df = (
        ds.select_columns([text_col])
        .map_batches(presence, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("p", alias_name="df"))
        .to_pandas()
    )  # vocabulary-sized, the bm25_idf_table precedent
    idf = dict(zip(df["token"], np.log(float(n_docs) / df["df"].to_numpy(dtype=np.float64))))
    q_tokens = sorted({t for t in re.split(r"\s+", query.lower()) if t})
    q_w = {t: idf[t] for t in q_tokens if t in idf}
    q_norm = float(np.sqrt(sum(w * w for w in q_w.values()))) or 1.0
    idf_ref = ray.put(idf)
    qw_ref = ray.put(q_w)

    class Scorer:
        def __init__(self):
            self.idf = ray.get(idf_ref)
            self.qw = ray.get(qw_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids_out, scores = [], []
            for did, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                counts: dict[str, int] = {}
                for t in (text or "").lower().split():
                    counts[t] = counts.get(t, 0) + 1
                if not counts:
                    continue
                norm2 = dot = 0.0
                for t, tf_ in counts.items():
                    c = (1.0 + math.log(tf_)) * self.idf[t]
                    norm2 += c * c
                    w = self.qw.get(t)
                    if w is not None:
                        dot += c * w
                if dot > 0 and norm2 > 0:
                    ids_out.append(did)
                    scores.append(dot / (math.sqrt(norm2) * q_norm))
            t = pa.table({id_col: pa.array(ids_out, b[id_col].type), "score": pa.array(scores, pa.float64())})
            if t.num_rows > k:  # block-local prune
                arr = np.asarray(scores)
                keep = np.argpartition(arr, -k)[-k:]
                t = t.take(pa.array(np.sort(keep)))
            return t

    cands = ds.select_columns([id_col, text_col]).map_batches(
        Scorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    out = cands.to_pandas()
    out = out.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k)
    out["score"] = np.round(out["score"], 6)
    return out.reset_index(drop=True)
