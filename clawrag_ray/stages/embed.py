"""Embedding stages (SURVEY.md §2.4 T2): a batched, actor-pool embedding
stage with constructor-held model state.

The container has no embedding model, so ``HashEmbedder`` is a
DETERMINISTIC STAND-IN (feature hashing: tokens -> signed buckets, l2
normalized — the classic hashing-trick text vectorizer). The Ray-side
plumbing is the real thing: model loaded once per actor in __init__,
batched encode in __call__, list<float32> output column sized for
downstream ANN stages. Swap HashEmbedder for a sentence-transformers
encoder (plus ``num_gpus=...``) on a real cluster.

Reference parity: the embedding manager singleton + batch embed APIs
(backend/src/core/indexing_service.py:224-239,
backend/src/api/v1/rag/ingestion/ingest_folder.py:167-181) become one
actor-pool map_batches stage."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from clawrag_ray.functions.kernels import re2_tokens


class HashEmbedder:
    """Deterministic feature-hash embedder (model stand-in).

    token -> md5 -> (bucket, sign); vector = l2-normalized signed counts.
    Same text always embeds identically, on any worker.

    ``model_path``: plug point for a REAL encoder — a Python file defining
    ``encode(texts: list[str]) -> (n, d) array-like``; loaded once per
    actor (kernels.load_kernel) and used for encode()/__call__ in place of
    the hashing trick. The stand-in stays the default so the deterministic
    oracle suite is unaffected when no model is present."""

    def __init__(self, dim: int = 64, model_path: str | None = None):
        self.dim = dim
        self._plug = None
        if model_path:
            from clawrag_ray.functions.kernels import load_kernel

            self._plug = load_kernel(model_path, "encode")

    def embed_raw(self, text: str) -> np.ndarray:
        """Signed bucket counts, UN-normalized: every component is an
        integer (exactly representable in float64), so downstream dot
        products and squared norms are exact — the property the DuckDB
        oracles for the semantic splitter rely on."""
        v = np.zeros(self.dim, dtype=np.float64)
        for tok in re2_tokens((text or "").lower()):
            h = hashlib.md5(tok.encode()).digest()
            bucket = int.from_bytes(h[:4], "big") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            v[bucket] += sign
        return v

    def embed_one(self, text: str) -> np.ndarray:
        v = self.embed_raw(text)
        n = np.linalg.norm(v)
        return v / n if n else v

    def encode(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim))
        if self._plug is not None:
            return np.asarray(self._plug(texts), dtype=np.float64).reshape(len(texts), -1)
        return np.stack([self.embed_one(t) for t in texts])

    def encode_raw(self, texts: list[str]) -> np.ndarray:
        return np.stack([self.embed_raw(t) for t in texts]) if texts else np.zeros((0, self.dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = self.encode([t or "" for t in batch["text"].to_pylist()])
        return batch.append_column(
            "embedding", pa.array([row.astype(np.float32).tolist() for row in mat], pa.list_(pa.float32()))
        )


def embed_texts(
    ds: Dataset,
    text_col: str = "text",
    dim: int = 64,
    concurrency=(1, 4),
    batch_size: int = 256,
    model_path: str | None = None,
) -> Dataset:
    """Adds an ``embedding`` list<float32> column. Actor pool — a real
    encoder is heavy state; batch_size sized to model throughput.
    ``model_path`` plugs a real encoder (see HashEmbedder)."""
    if text_col != "text":
        ds = ds.rename_columns({text_col: "text"})
    return ds.map_batches(
        HashEmbedder,
        fn_constructor_kwargs={"dim": dim, "model_path": model_path},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
