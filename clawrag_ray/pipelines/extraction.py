"""Flagship extraction pipeline: interleaved docs table -> spans table.

Ray Data restatement of ClawRag's extraction lifecycle (SURVEY.md §3):

    read -> [filter: inline | mega] -> ExtractDocs actor pool (inline)
                                    -> explode pages -> ExtractPages actor
                                       pool -> groupby(doc_id) reassembly
         -> union -> (optionally) write partitioned parquet/lance

Scale notes:
  * The inline/mega split uses only the cheap ``n_pages``/``doc_kind``
    columns, so the predicate pushes down to the read and neither branch
    parses payloads it will not extract.
  * Only mega-docs (a tiny fraction, but the skew dominators) pay the
    groupby(doc_id) shuffle; everything else streams shuffle-free.
  * Actor pools size with ``concurrency``; each actor holds the parser
    state once (T1 analog, SURVEY.md §2.4).
"""

from __future__ import annotations

from ray.data import Dataset

from clawrag_ray.stages.extract import (
    MEGA_PAGE_THRESHOLD,
    ExtractDocs,
    ExtractPages,
    assemble_group,
    explode_mega_pages,
)


def extract_spans(
    raw: Dataset,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
    page_batch_size: int = 32,
) -> Dataset:
    """Raw interleaved docs Dataset -> nested spans Dataset
    (doc_id, doc_kind, route, error_code, n_spans, spans)."""
    import pyarrow.compute as pc

    def is_mega(b):
        return b.filter(pc.and_(pc.equal(b["doc_kind"], "pdf_like"), pc.greater(b["n_pages"], MEGA_PAGE_THRESHOLD)))

    def is_inline(b):
        return b.filter(
            pc.or_(pc.not_equal(b["doc_kind"], "pdf_like"), pc.less_equal(b["n_pages"], MEGA_PAGE_THRESHOLD))
        )

    inline = raw.map_batches(is_inline, batch_format="pyarrow", zero_copy_batch=True)
    mega = raw.map_batches(is_mega, batch_format="pyarrow", zero_copy_batch=True)

    inline_out = inline.map_batches(
        ExtractDocs,
        fn_constructor_kwargs={"chunk_size": chunk_size, "chunk_overlap": chunk_overlap},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
    mega_out = (
        mega.map_batches(explode_mega_pages, batch_format="pyarrow", batch_size=4, zero_copy_batch=True)
        .map_batches(
            ExtractPages,
            fn_constructor_kwargs={"chunk_size": chunk_size, "chunk_overlap": chunk_overlap},
            batch_format="pyarrow",
            batch_size=page_batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
        )
        # coalesce the many small per-page-batch blocks before the shuffle:
        # the groupby sort is scheduling-bound on block count, not row count
        .repartition(8)
        .groupby("doc_id")
        .map_groups(assemble_group, batch_format="pyarrow")
    )
    return inline_out.union(mega_out)


def read_corpus(path: str, columns: list[str] | None = None) -> Dataset:
    """Read the interleaved docs table (Lance-gated: read_lance when the
    lance package exists, else the parquet mirror with identical schema)."""
    import ray.data

    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path, columns=columns)
    except ImportError:
        return ray.data.read_parquet(path, columns=columns)


def write_spans(spans: Dataset, path: str, min_rows_per_file: int = 10_000) -> None:
    """Write the spans product, partitioned parquet (Lance-gated)."""
    try:
        import lance  # noqa: F401

        spans.write_lance(path)
    except ImportError:
        spans.write_parquet(path, min_rows_per_file=min_rows_per_file)
