"""Arrow schemas for the interleaved-document data model.

From BASELINE.json ``input_hint`` and SURVEY.md §1.3: the product of the
pipeline is a table ``(doc_id: string, spans: list<struct<kind, text,
media_ref, offset:int32>>)``; the pipeline's raw input is the payload
variant ``(doc_id, doc_kind, payload, n_pages, lang)`` (FIXTURES.md §1).
"""

from __future__ import annotations

import pyarrow as pa

# Span kinds emitted by the extractor (a superset of the structural elements
# ClawRag's Docling conversion distinguishes: headings/tables/lists/images,
# see quality_scorer structure inputs, reference backend/src/core/quality_scorer.py:22-60).
SPAN_KINDS = ("text", "heading", "list", "table", "figure", "code")

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

# Nested output table: one row per document.
SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
    ]
)

# Flat (exploded) span rows — the working representation between the extract
# stage and reassembly; cheap to shuffle and to write partitioned.
FLAT_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOC_KINDS = ("text", "markdown", "html", "pdf_like", "email")

# pdf_like docs with more pages than this take the explode/reassemble path
# (and land in the "mega" partition when the corpus is route-partitioned).
MEGA_PAGE_THRESHOLD = 16

# Raw input table (FIXTURES.md §1 payload variant).
RAW_DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("doc_kind", pa.string()),
        ("payload", pa.string()),
        ("n_pages", pa.int32()),
        ("lang", pa.string()),
    ]
)

# Error side-channel rows (encrypted PDFs, unparseable payloads — the analog
# of ClawRag's ExtractionResult.error, reference backend/src/models/extraction_result.py:5-41).
ERROR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("error_code", pa.string()),
        ("error_message", pa.string()),
    ]
)

# Per-partition lineage/metrics rows (analog of ExtractionMetadata /
# ExtractionResultDB persistence, reference backend/src/database/models.py:342-467).
METRICS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_errors", pa.int64()),
        ("n_chars", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)

# Offset encoding: offsets only need to be ORDER-consistent with the frozen
# reference extractor (the invariant compares (kind, text, media_ref, order)).
# We make them identical anyway: offset = page_idx * PAGE_STRIDE +
# block_rank * BLOCK_STRIDE + chunk_idx, computable independently per page so
# mega-doc pages can be extracted in parallel and reassembled by a plain sort.
PAGE_STRIDE = 1_000_000  # max ~2147 pages in int32
BLOCK_STRIDE = 1_000  # max 1000 blocks/page, 1000 chunks/block
