"""Distributed chunking operators over flat text tables (SURVEY.md §2.3).

These run the frozen reference chunkers (clawrag_ray.reference.chunkers)
inside vectorized explode stages: one input row -> many chunk rows, emitted
as whole Arrow tables per batch (never ds.flat_map per row — pitfall list in
the Ray guide)."""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Sum

from clawrag_ray.reference.chunkers import char_window, code_split, parent_child, row_based, separator_cascade


def chunk_explode(
    ds: Dataset,
    size: int,
    overlap: int,
    method: str = "char_window",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """(doc_id, text) -> (doc_id, chunk_index, chunk_text, chunk_len).

    Methods mirror the reference's chunking strategies (SURVEY.md §2.3):
    char_window (C4), separator_cascade (C5), row_based (C7 — ``size`` is
    rows per chunk, overlap ignored). Code-structure chunking (C3) needs
    per-chunk metadata -> use code_chunk_explode."""
    chunker = {
        "char_window": char_window,
        "separator_cascade": separator_cascade,
        "row_based": lambda text, s, o: row_based(text, rows_per_chunk=s),
    }[method]

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, texts = [], [], []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for i, chunk in enumerate(chunker(text or "", size, overlap)):
                ids.append(doc_id)
                idxs.append(i)
                texts.append(chunk)
        t = pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "chunk_index": pa.array(idxs, pa.int32()),
                "chunk_text": pa.array(texts, pa.string()),
            }
        )
        return t.append_column("chunk_len", pa.compute.utf8_length(t["chunk_text"]))

    return ds.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def chunk_counts(ds: Dataset, size: int, overlap: int, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """(doc_id, n_chunks, total_chunk_chars) — runs the real distributed
    chunker and aggregates; the SQL oracle uses the closed-form count
    (reference.chunkers.n_char_window_chunks)."""
    chunks = chunk_explode(ds, size, overlap, "char_window", id_col, text_col)
    return chunks.groupby(id_col).aggregate(
        Count(alias_name="n_chunks"),
        Sum("chunk_len", alias_name="total_chunk_chars"),
    )


def code_chunk_explode(
    ds: Dataset,
    language: str | None = None,
    lang_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Code-structure chunking (C3, reference
    backend/src/services/loaders/code_loader.py:192-289): one row per
    detected construct with (type, name, start_line, end_line) metadata.
    Language comes from ``language`` (constant) or per-row ``lang_col``."""

    def explode(batch: pa.Table) -> pa.Table:
        langs = batch[lang_col].to_pylist() if lang_col else [language] * batch.num_rows
        ids, idxs, types, names, starts, ends, texts = [], [], [], [], [], [], []
        for doc_id, text, lang in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist(), langs):
            for i, ch in enumerate(code_split(text or "", lang or "")):
                ids.append(doc_id)
                idxs.append(i)
                types.append(ch.type)
                names.append(ch.name)
                starts.append(ch.start_line)
                ends.append(ch.end_line)
                texts.append(ch.text)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "chunk_index": pa.array(idxs, pa.int32()),
                "construct_type": pa.array(types, pa.string()),
                "construct_name": pa.array(names, pa.string()),
                "start_line": pa.array(starts, pa.int32()),
                "end_line": pa.array(ends, pa.int32()),
                "chunk_text": pa.array(texts, pa.string()),
            }
        )

    cols = [id_col, text_col] + ([lang_col] if lang_col else [])
    return ds.select_columns(cols).map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def parent_child_explode(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """(doc_id, role, parent_idx, child_idx, chunk_len) rows — the
    parent/child hierarchy (indexing_service.py:373-427 semantics)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, roles, pis, cis, lens = [], [], [], [], []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for row in parent_child(text or ""):
                ids.append(doc_id)
                roles.append(row["role"])
                pis.append(row["parent_idx"])
                cis.append(row["child_idx"])
                lens.append(len(row["text"]))
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "role": pa.array(roles, pa.string()),
                "parent_idx": pa.array(pis, pa.int32()),
                "child_idx": pa.array(cis, pa.int32()),
                "chunk_len": pa.array(lens, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def parent_child_counts(ds: Dataset) -> Dataset:
    """(role, n_chunks, total_chars, max_chunk_len) over the whole corpus."""
    rows = parent_child_explode(ds)
    return rows.groupby("role").aggregate(
        Count(alias_name="n_chunks"),
        Sum("chunk_len", alias_name="total_chars"),
        Max("chunk_len", alias_name="max_chunk_len"),
    )


def semantic_chunk_explode(
    ds: Dataset,
    breakpoint_percentile: float = 95.0,
    buffer_size: int = 1,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=(1, 4),
    batch_size: int = 64,
) -> Dataset:
    """Semantic chunking as an ACTOR-POOL explode (C2,
    resource_manager.py:43-110): the embedder is constructor-held state —
    the one chunker that genuinely needs the stateful-stage pattern. Ray's
    backpressure replaces the reference's manual GPU-memory polling and
    its sentence-split fallback path. Uses the deterministic HashEmbedder
    stand-in (stages/embed.py); swap for a real encoder + num_gpus on a
    real cluster."""
    from clawrag_ray.reference.chunkers import semantic_split
    from clawrag_ray.stages.embed import HashEmbedder

    class SemanticChunker:
        def __init__(self):
            self.embedder = HashEmbedder(dim=dim)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, idxs, texts = [], [], []
            for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
                for i, chunk in enumerate(
                    semantic_split(text or "", self.embedder.encode_raw, breakpoint_percentile, buffer_size)
                ):
                    ids.append(doc_id)
                    idxs.append(i)
                    texts.append(chunk)
            t = pa.table(
                {
                    id_col: pa.array(ids, batch[id_col].type),
                    "chunk_index": pa.array(idxs, pa.int32()),
                    "chunk_text": pa.array(texts, pa.string()),
                }
            )
            return t.append_column("chunk_len", pa.compute.utf8_length(t["chunk_text"]))

    return ds.select_columns([id_col, text_col]).map_batches(
        SemanticChunker,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
