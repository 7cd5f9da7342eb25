"""Retrieval-side fusion: Reciprocal Rank Fusion (RRF) over ranked lists.

The reference fuses multiple retriever outputs in its hybrid retriever
(backend/src/core/retrievers/enhanced_hybrid_retriever.py:8 — BM25 +
vector lists merged into one ranking); the LLM reranker next to it is
non-deterministic and stays out of scope, but RRF itself is pure
deterministic math over (doc_id, rank) lists and belongs in the engine:

    rrf_score(doc) = sum over lists containing doc of 1 / (k + rank)

with the standard k=60 damping (Cormack, Clarke & Buettcher 2009 — the
public RRF formulation). Ranked lists are top-k outputs and therefore
bounded-small BY CONSTRUCTION (k rows per retriever, not corpus-sized),
so fusion is driver-side pandas on purpose; the expensive parts — the
rankings themselves — are the distributed operators (bm25_topk,
brute_force_topk, top_k) that feed it.
"""

from __future__ import annotations

import pandas as pd

RRF_K = 60


def _fuse(parts: list[pd.DataFrame], score_name: str, top: int | None) -> pd.DataFrame:
    """Shared fusion tail: sum per-list contributions (column ``c``) per
    doc_id, round to 6, order by (score desc, doc_id asc), cut to ``top``."""
    allp = pd.concat(parts, ignore_index=True)
    fused = allp.groupby("doc_id", as_index=False)["c"].sum().rename(columns={"c": score_name})
    fused[score_name] = fused[score_name].round(6)
    fused = fused.sort_values([score_name, "doc_id"], ascending=[False, True]).reset_index(drop=True)
    return fused.head(top).reset_index(drop=True) if top is not None else fused


def rrf_fuse(rankings: list[pd.DataFrame], k: int = RRF_K, top: int | None = None) -> pd.DataFrame:
    """Fuse ranked lists into one RRF ranking.

    Each input frame must carry ``doc_id`` and be ORDERED best-first (its
    row order defines rank 1..n). Returns (doc_id, rrf_score rounded to 6)
    sorted by (score desc, doc_id asc), cut to ``top`` when given. A doc
    absent from a list simply contributes nothing for that list — the
    standard RRF union semantics."""
    parts = []
    for r in rankings:
        df = r.reset_index(drop=True)
        parts.append(pd.DataFrame({"doc_id": df["doc_id"], "c": 1.0 / (k + df.index + 1)}))
    return _fuse(parts, "rrf_score", top)


def weighted_fuse(
    rankings: list[pd.DataFrame],
    weights: list[float],
    score_col: str = "score",
    top: int | None = None,
) -> pd.DataFrame:
    """Weighted score fusion with per-list min-max normalization — the
    deterministic weighted-combination core of the reference's hybrid
    retriever (enhanced_hybrid_retriever.py:8), complementing rrf_fuse's
    rank-based variant. Each list's scores normalize to [0, 1] over the
    list ((s - min) / (max - min); 1.0 when the list is constant), then
    fused = sum of weight_i * norm_i over the lists containing the doc.
    Returns (doc_id, fused_score rounded to 6) sorted by (score desc,
    doc_id asc), cut to ``top``. Lists are bounded top-k outputs by
    construction, so fusion is driver-side like rrf_fuse."""
    parts = []
    for r, w in zip(rankings, weights):
        s = r[score_col].astype(float)
        lo, hi = s.min(), s.max()
        norm = pd.Series(1.0, index=s.index) if hi == lo else (s - lo) / (hi - lo)
        parts.append(pd.DataFrame({"doc_id": r["doc_id"], "c": w * norm}))
    return _fuse(parts, "fused_score", top)


def rerank_topk(
    ds,
    candidate_ids,
    query: str,
    k: int = 10,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_path: str | None = None,
    ndigits: int = 6,
) -> pd.DataFrame:
    """Second-stage reranker over a BOUNDED candidate list (the reference's
    reranker slot, backend/src/core/retrievers/reranker.py:18 — its model
    call is non-deterministic, so the engine ships a deterministic
    HashEmbedder-cosine stand-in with a ``model_path`` plug point: a Python
    file defining ``rerank_scores(query: str, texts: list[str]) ->
    array-like`` swaps in a real cross-encoder per actor).

    Stand-in scoring mirrors reference/chunkers.semantic_split's canonical
    cosine: dot/(|a|·|q|) over INTEGER-valued raw hash-bucket counts — every
    dot and norm exact in float64, so the DuckDB oracle replays it
    digit-for-digit. Zero-norm sides score 0.0.

    Shape: candidates are top-k output (k rows by construction), so the
    candidate filter broadcasts the id set into one map pass over the
    corpus; scoring runs in the same actor pool (embedder state in
    __init__); only candidate rows come back. Returns (doc_id, rerank_score)
    sorted by (score desc, doc_id asc), head(k)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from clawrag_ray.stages.embed import HashEmbedder

    ids_ref = ray.put(pa.array(sorted(int(i) for i in candidate_ids), pa.int64()))

    class Rerank:
        def __init__(self):
            self.ids = ray.get(ids_ref)
            self.plug = None
            if model_path:
                from clawrag_ray.functions.kernels import load_kernel

                self.plug = load_kernel(model_path, "rerank_scores")
            self.emb = HashEmbedder(dim=dim)
            self.q_raw = self.emb.embed_raw(query)
            self.q_norm = float(np.linalg.norm(self.q_raw))

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b[id_col], value_set=self.ids))
            texts = [t or "" for t in b[text_col].to_pylist()]
            if self.plug is not None:
                scores = np.asarray(self.plug(query, texts), dtype=np.float64)
            else:
                scores = np.empty(len(texts))
                for i, t in enumerate(texts):
                    d = self.emb.embed_raw(t)
                    dn = float(np.linalg.norm(d))
                    scores[i] = (
                        float(d @ self.q_raw) / (dn * self.q_norm) if dn and self.q_norm else 0.0
                    )
            return pa.table(
                {id_col: b[id_col], "rerank_score": pa.array(np.round(scores, ndigits), pa.float64())}
            )

    out = (
        ds.select_columns([id_col, text_col])
        .map_batches(Rerank, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8))
        .to_pandas()
    )
    out = out.sort_values(["rerank_score", id_col], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)
