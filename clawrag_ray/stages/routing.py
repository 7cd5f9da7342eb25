"""Classification + rules-engine routing + ingest-param advisor
(SURVEY.md §2.2 M20/M24/M25) as vectorized stages with the rules broadcast
as plain Python constants (they are KBs, not data).

Reference semantics:
  * classify_extension: extension -> (category, confidence)
    (data_classifier_service.py:130-170)
  * routing rules: (category, confidence >= θ) -> target collection +
    chunk params + pre/post steps (document_router_service.py:80-146,
    document_routing_rules.json)
  * param advisor: doc-type heuristic table with contextual adjustments
    (ingest_param_advisor.py:39-258)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from clawrag_ray.reference.scoring import classify_extension

# Routing rules (document_routing_rules.json analog): first match wins.
DEFAULT_ROUTING_RULES: list[dict] = [
    {"category": "source_code", "min_confidence": 0.9, "target_collection": "code", "chunk_size": 256, "chunk_overlap": 40, "strategy": "code", "requires_validation": False},
    {"category": "emails", "min_confidence": 0.9, "target_collection": "emails", "chunk_size": 512, "chunk_overlap": 80, "strategy": "sentence", "requires_validation": False},
    {"category": "spreadsheets", "min_confidence": 0.8, "target_collection": "tables", "chunk_size": 500, "chunk_overlap": 50, "strategy": "row_based", "requires_validation": True},
    {"category": "presentation", "min_confidence": 0.8, "target_collection": "slides", "chunk_size": 600, "chunk_overlap": 100, "strategy": "sentence", "requires_validation": False},
    {"category": "documents", "min_confidence": 0.5, "target_collection": "documents", "chunk_size": 800, "chunk_overlap": 120, "strategy": "semantic", "requires_validation": False},
]
DEFAULT_RULE = {"target_collection": "general", "chunk_size": 1000, "chunk_overlap": 200, "strategy": "sentence", "requires_validation": True}

# Param-advisor heuristics (ingest_param_advisor.py:39-258 / ingest_config.py:29-38)
LARGE_DOC_CHARS = 100_000  # large doc -> chunk_size x0.8
SMALL_DOC_CHARS = 1_000  # small doc -> chunk_size x1.2


def classify_by_extension(ds: Dataset, ext_col: str = "extension") -> Dataset:
    """Adds (category, confidence) from the frozen extension table."""

    def classify(batch: pa.Table) -> pa.Table:
        cats, confs = [], []
        for ext in batch[ext_col].to_pylist():
            c, p = classify_extension(ext or "")
            cats.append(c)
            confs.append(p)
        return batch.append_column("category", pa.array(cats, pa.string())).append_column(
            "confidence", pa.array(confs, pa.float64())
        )

    return ds.map_batches(classify, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def route_by_rules(ds: Dataset, rules: list[dict] | None = None, size_col: str | None = None) -> Dataset:
    """Adds routing-decision columns (target_collection, chunk_size,
    chunk_overlap, strategy, requires_validation, rule_matched) from the
    broadcast rules list; optional contextual size adjustment (M25)."""
    rules = DEFAULT_ROUTING_RULES if rules is None else rules

    def route(batch: pa.Table) -> pa.Table:
        tgts, sizes, overlaps, strats, vals, matched = [], [], [], [], [], []
        cats = batch["category"].to_pylist()
        confs = batch["confidence"].to_pylist()
        doc_sizes = batch[size_col].to_pylist() if size_col else [None] * batch.num_rows
        for cat, conf, dsz in zip(cats, confs, doc_sizes):
            rule, rid = DEFAULT_RULE, -1
            for i, r in enumerate(rules):
                if cat == r["category"] and conf >= r["min_confidence"]:
                    rule, rid = r, i
                    break
            size = rule["chunk_size"]
            if dsz is not None:
                if dsz > LARGE_DOC_CHARS:
                    size = int(size * 0.8)
                elif dsz < SMALL_DOC_CHARS:
                    size = int(size * 1.2)
            tgts.append(rule["target_collection"])
            sizes.append(size)
            overlaps.append(min(rule["chunk_overlap"], size - 1))
            strats.append(rule["strategy"])
            vals.append(rule["requires_validation"])
            matched.append(rid)
        return (
            batch.append_column("target_collection", pa.array(tgts, pa.string()))
            .append_column("chunk_size", pa.array(sizes, pa.int32()))
            .append_column("chunk_overlap", pa.array(overlaps, pa.int32()))
            .append_column("strategy", pa.array(strats, pa.string()))
            .append_column("requires_validation", pa.array(vals, pa.bool_()))
            .append_column("rule_matched", pa.array(matched, pa.int32()))
        )

    return ds.map_batches(route, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def recommend_strategy(ds: Dataset, size_col: str = "n_chars", ext_col: str = "extension") -> Dataset:
    """Chunking-strategy recommender (chunking_strategies.py:73-141):
    code exts -> CODE; .csv -> ROW_BASED; < 10 KB -> SENTENCE;
    > 10 MB -> SEMANTIC; else SENTENCE."""
    code_exts = (".py", ".js", ".ts", ".java", ".go", ".rs", ".c", ".cpp", ".h")

    def rec(batch: pa.Table) -> pa.Table:
        exts = batch[ext_col].to_pylist()
        sizes = batch[size_col].to_pylist()
        out = []
        for ext, size in zip(exts, sizes):
            e = (ext or "").lower()
            if e in code_exts:
                out.append("code")
            elif e in (".csv", ".tsv"):
                out.append("row_based")
            elif (size or 0) > 10_000_000:
                out.append("semantic")
            else:
                out.append("sentence")
        return batch.append_column("recommended_strategy", pa.array(out, pa.string()))

    return ds.map_batches(rec, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


# Magic-byte validation (SURVEY.md §2.2 M6; reference upload.py:48-116
# FIX BUG #7): first-512-bytes magic check per claimed extension, with the
# reference's text-extension rule (md/csv/html validate by UTF-8
# decodability instead of magic bytes). Extended with the image/audio
# container magics this engine's multimodal tier actually parses.
MAGIC_BYTES: dict[str, list[bytes]] = {
    ".pdf": [b"%PDF"],
    ".docx": [b"PK\x03\x04"],
    ".xlsx": [b"PK\x03\x04"],
    ".pptx": [b"PK\x03\x04"],
    ".png": [b"\x89PNG\r\n\x1a\n"],
    ".jpg": [b"\xff\xd8"],
    ".jpeg": [b"\xff\xd8"],
    ".tiff": [b"II*\x00", b"MM\x00*"],
    ".wav": [b"RIFF"],
}
TEXT_EXTENSIONS = (".md", ".csv", ".html")


def validate_magic(header: bytes, claimed_extension: str) -> tuple[bool, str]:
    """(valid, reason) for one header vs its claimed extension — the exact
    decision procedure of upload.py:validate_file_type: empty fails; text
    extensions pass iff the header decodes as UTF-8; known binary
    extensions must start with a registered magic; unknown extensions fail
    (nothing registered)."""
    ext = claimed_extension.lower()
    if not header:
        return False, "EMPTY"
    if ext in TEXT_EXTENSIONS:
        try:
            header.decode("utf-8")
            return True, ""
        except UnicodeDecodeError:
            return False, "BINARY_IN_TEXT"
    for magic in MAGIC_BYTES.get(ext, []):
        if header.startswith(magic):
            return True, ""
    return False, "MAGIC_MISMATCH"


def validate_magic_bytes(
    ds: Dataset, payload_col: str = "payload", ext_col: str = "extension", id_col: str = "doc_id"
) -> Dataset:
    """Stateless batch validation: (id, extension, valid, reason) per row,
    reading only the first 512 payload bytes (M6). Invalid rows are the
    error side-channel the upload path would reject."""

    def validate(batch: pa.Table) -> pa.Table:
        valids, reasons = [], []
        for payload, ext in zip(batch[payload_col].to_pylist(), batch[ext_col].to_pylist()):
            v, r = validate_magic((payload or b"")[:512], ext or "")
            valids.append(v)
            reasons.append(r)
        return pa.table(
            {
                id_col: batch[id_col],
                ext_col: batch[ext_col],
                "valid": pa.array(valids, pa.bool_()),
                "reason": pa.array(reasons, pa.string()),
            }
        )

    return ds.map_batches(validate, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
