"""Extraction stages: raw interleaved docs -> span sequences.

Three physical paths, chosen per document (SURVEY.md §3 "Ray Data
restatement" and §7.2 steps 3-5):

  * inline path (the overwhelming majority): an actor-pool ``map_batches``
    stage (ExtractDocs) parses each document whole and builds the nested
    ``spans`` list column directly — no shuffle at all.
  * mega-doc path (pdf_like with n_pages > threshold — the skew fixture):
    explode to per-page rows (explode_mega_pages), extract each page
    independently (ExtractPages), then reassemble per doc_id with an
    offset sort (assemble_spans) — shuffle #2 of SURVEY.md §4.
  * error rows (encrypted/invalid payloads) surface as rows with
    ``error_code != ""`` and empty spans, the analog of ClawRag's
    ExtractionResult.error rows (backend/src/models/extraction_result.py).

Routing fast/heavy (digital vs scanned PDF; docling_service.py:295-325)
happens inside the extract UDFs via the frozen reference rules, so both
"branches" share one actor pool whose state covers both converters —
ClawRag's FAST/HEAVY converter pair held by one worker (T1, SURVEY.md §2.4).
"""

from __future__ import annotations

import json

import pyarrow as pa

from clawrag_ray.reference.chunkers import DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE
from clawrag_ray.reference.extractor import (
    ExtractError,
    extract_document,
    extract_pdf_page,
    pdf_has_text,
    route_document,
)
from clawrag_ray.schema import (  # noqa: F401  (MEGA_PAGE_THRESHOLD re-exported)
    FLAT_SPAN_SCHEMA,
    MEGA_PAGE_THRESHOLD,
    SPAN_STRUCT,
    SPANS_TYPE,
)

NESTED_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("doc_kind", pa.string()),
        ("route", pa.string()),
        ("error_code", pa.string()),
        ("n_spans", pa.int32()),
        ("spans", SPANS_TYPE),
    ]
)

PAGE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_idx", pa.int32()),
        ("page_json", pa.string()),
        ("heavy", pa.bool_()),
        ("error_code", pa.string()),
    ]
)

FLAT_ERR_SCHEMA = pa.schema(
    list(FLAT_SPAN_SCHEMA) + [pa.field("error_code", pa.string()), pa.field("route", pa.string())]
)


class ExtractDocs:
    """Actor-pool stage: whole-document extraction (inline path).

    State constructed once per actor (__init__), used per batch (__call__) —
    the Ray restatement of ClawRag's per-request Docling converter pair
    (docling_service.py:69-103): chunking params + both fast and heavy
    "converters" live here for the life of the actor.
    """

    def __init__(self, chunk_size: int = DEFAULT_CHUNK_SIZE, chunk_overlap: int = DEFAULT_CHUNK_OVERLAP):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        # touching the parser modules here forces regex compilation once per
        # actor rather than lazily inside the first batch
        from clawrag_ray.reference import extractor as _ext  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        kinds = batch["doc_kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        # flat span columns + list offsets — building the nested column from
        # four plain arrays is ~5x cheaper than from_pylist of dicts
        f_kind: list[str] = []
        f_text: list[str] = []
        f_ref: list[str] = []
        f_off: list[int] = []
        offsets: list[int] = [0]
        out_route: list[str] = []
        out_err: list[str] = []
        n_spans: list[int] = []
        for kind, payload in zip(kinds, payloads):
            route = route_document(kind, payload)
            out_route.append(route)
            if route == "error":
                n_spans.append(0)
                offsets.append(len(f_kind))
                try:
                    extract_document(kind, payload, self.chunk_size, self.chunk_overlap)
                    out_err.append("UNKNOWN")
                except ExtractError as e:
                    out_err.append(e.code)
                continue
            try:
                spans = extract_document(kind, payload, self.chunk_size, self.chunk_overlap)
                for s in spans:
                    f_kind.append(s.kind)
                    f_text.append(s.text)
                    f_ref.append(s.media_ref)
                    f_off.append(s.offset)
                n_spans.append(len(spans))
                out_err.append("")
            except ExtractError as e:  # defensive: route said ok but parse failed
                n_spans.append(0)
                out_err.append(e.code)
            offsets.append(len(f_kind))
        struct = pa.StructArray.from_arrays(
            [
                pa.array(f_kind, pa.string()),
                pa.array(f_text, pa.string()),
                pa.array(f_ref, pa.string()),
                pa.array(f_off, pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        spans_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(kinds, pa.string()),
                pa.array(out_route, pa.string()),
                pa.array(out_err, pa.string()),
                pa.array(n_spans, pa.int32()),
                spans_col,
            ],
            schema=NESTED_OUT_SCHEMA,
        )


def explode_mega_pages(batch: pa.Table) -> pa.Table:
    """Mega pdf_like docs -> one row per page (plus the per-doc routing
    decision, computed once from the first pages before the explode).
    Encrypted/invalid mega docs emit a single error row (page_idx = -1)."""
    rows_doc: list[str] = []
    rows_page: list[int] = []
    rows_json: list[str] = []
    rows_heavy: list[bool] = []
    rows_err: list[str] = []
    for doc_id, payload in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
        try:
            doc = json.loads(payload)
            if not isinstance(doc, dict) or "pages" not in doc:
                raise ValueError("missing pages")
        except (json.JSONDecodeError, ValueError, TypeError):
            rows_doc.append(doc_id)
            rows_page.append(-1)
            rows_json.append("")
            rows_heavy.append(False)
            rows_err.append("INVALID_PDF")
            continue
        if doc.get("encrypted"):
            rows_doc.append(doc_id)
            rows_page.append(-1)
            rows_json.append("")
            rows_heavy.append(False)
            rows_err.append("ENCRYPTED_PDF")
            continue
        heavy = not pdf_has_text(doc)
        for page_idx, page in enumerate(doc["pages"]):
            rows_doc.append(doc_id)
            rows_page.append(page_idx)
            rows_json.append(json.dumps(page, sort_keys=True))
            rows_heavy.append(heavy)
            rows_err.append("")
    return pa.Table.from_arrays(
        [
            pa.array(rows_doc, pa.string()),
            pa.array(rows_page, pa.int32()),
            pa.array(rows_json, pa.string()),
            pa.array(rows_heavy, pa.bool_()),
            pa.array(rows_err, pa.string()),
        ],
        schema=PAGE_SCHEMA,
    )


class ExtractPages:
    """Actor-pool stage: per-page extraction for exploded mega-docs.

    Emits flat span rows (offset = page_idx * PAGE_STRIDE + ...) so
    reassembly is a plain groupby(doc_id) + offset sort with no cross-page
    state. Error rows pass through with kind "__error__"."""

    def __init__(self, chunk_size: int = DEFAULT_CHUNK_SIZE, chunk_overlap: int = DEFAULT_CHUNK_OVERLAP):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "kind", "text", "media_ref", "offset", "error_code", "route")}

        def emit(doc_id, kind, text, media_ref, offset, err, route):
            out["doc_id"].append(doc_id)
            out["kind"].append(kind)
            out["text"].append(text)
            out["media_ref"].append(media_ref)
            out["offset"].append(offset)
            out["error_code"].append(err)
            out["route"].append(route)

        for doc_id, page_idx, page_json, heavy, err in zip(
            batch["doc_id"].to_pylist(),
            batch["page_idx"].to_pylist(),
            batch["page_json"].to_pylist(),
            batch["heavy"].to_pylist(),
            batch["error_code"].to_pylist(),
        ):
            route = "error" if err else ("heavy" if heavy else "fast")
            if err:
                emit(doc_id, "__error__", "", "", -1, err, route)
                continue
            page = json.loads(page_json)
            spans = extract_pdf_page(page, page_idx, heavy, self.chunk_size, self.chunk_overlap)
            if not spans:
                # page yielded nothing (e.g. scanned page on fast route):
                # emit a marker so the doc still appears in reassembly
                emit(doc_id, "__empty__", "", "", -1, "", route)
            for s in spans:
                emit(doc_id, s.kind, s.text, s.media_ref, s.offset, "", route)
        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"], pa.string()),
                pa.array(out["kind"], pa.string()),
                pa.array(out["text"], pa.string()),
                pa.array(out["media_ref"], pa.string()),
                pa.array(out["offset"], pa.int32()),
                pa.array(out["error_code"], pa.string()),
                pa.array(out["route"], pa.string()),
            ],
            schema=FLAT_ERR_SCHEMA,
        )


def assemble_group(group: pa.Table) -> pa.Table:
    """map_groups fn: all flat span rows of ONE doc_id -> one nested row,
    spans sorted by offset (restores the O4 ordering contract after the
    parallel page explode)."""
    doc_id = group["doc_id"][0].as_py()
    route = group["route"][0].as_py()
    errs = [e for e in group["error_code"].to_pylist() if e]
    if errs:
        return pa.Table.from_arrays(
            [
                pa.array([doc_id], pa.string()),
                pa.array(["pdf_like"], pa.string()),
                pa.array(["error"], pa.string()),
                pa.array([errs[0]], pa.string()),
                pa.array([0], pa.int32()),
                pa.array([[]], SPANS_TYPE),
            ],
            schema=NESTED_OUT_SCHEMA,
        )
    real = group.filter(pa.compute.not_equal(group["kind"], "__empty__"))
    sorted_g = real.take(pa.compute.sort_indices(real["offset"]))
    spans = pa.StructArray.from_arrays(
        [sorted_g.column(name).combine_chunks() for name in ("kind", "text", "media_ref", "offset")],
        fields=list(SPAN_STRUCT),
    )
    n = len(spans)
    spans_list = pa.ListArray.from_arrays(pa.array([0, n], pa.int32()), spans)
    return pa.Table.from_arrays(
        [
            pa.array([doc_id], pa.string()),
            pa.array(["pdf_like"], pa.string()),
            pa.array([route], pa.string()),
            pa.array([""], pa.string()),
            pa.array([n], pa.int32()),
            spans_list,
        ],
        schema=NESTED_OUT_SCHEMA,
    )
