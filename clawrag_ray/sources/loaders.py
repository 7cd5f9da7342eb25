"""Container-format loaders re-expressed as Ray Data explode stages
(SURVEY.md §2.1 S6-S12): one payload row -> many document rows.

In the reference these are file-path loaders (EmailLoader/MboxLoader/
JSONLoader/XMLLoader, backend/src/services/loaders/*.py); here the payload
arrives as a column (the table IS the filesystem at web scale) and each
loader is a vectorized batch explode. File-backed corpora enter through
``read_binary_column`` (ray.data.read_binary_files + decode with latin-1
fallback, extraction_service.py:150-163 semantics).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from collections import Counter

import pyarrow as pa
from ray.data import Dataset

from clawrag_ray.reference.textutils import clean_text, decode_fallback

MBOX_MAX_EMAILS = 10_000  # per-archive cap (email_loader.py:216-223)

DOC_OUT_SCHEMA = pa.schema(
    [
        ("source_id", pa.string()),
        ("item_index", pa.int32()),
        ("content", pa.string()),
        ("item_kind", pa.string()),
    ]
)


def _explode_table(rows: dict[str, list]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(rows["source_id"], pa.string()),
            pa.array(rows["item_index"], pa.int32()),
            pa.array(rows["content"], pa.string()),
            pa.array(rows["item_kind"], pa.string()),
        ],
        schema=DOC_OUT_SCHEMA,
    )


def _emit(rows, source_id, idx, content, kind):
    rows["source_id"].append(source_id)
    rows["item_index"].append(idx)
    rows["content"].append(content)
    rows["item_kind"].append(kind)


def explode_json(ds: Dataset, id_col: str = "doc_id", payload_col: str = "payload") -> Dataset:
    """JSON payload -> one row per item (json_loader.py:17-81 semantics):
    array-of-objects -> one doc per object; dict-with-array values -> one
    doc per item tagged with its key; objects render as "key: value"
    lines; scalars render verbatim."""

    def fmt(obj) -> str:
        if isinstance(obj, dict):
            return "\n".join(f"{k}: {v}" for k, v in obj.items())
        return str(obj)

    def explode(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in DOC_OUT_SCHEMA.names}
        for sid, payload in zip(batch[id_col].to_pylist(), batch[payload_col].to_pylist()):
            try:
                data = json.loads(payload)
            except (json.JSONDecodeError, TypeError):
                _emit(rows, str(sid), -1, "", "error")
                continue
            if isinstance(data, list):
                for i, item in enumerate(data):
                    _emit(rows, str(sid), i, fmt(item), "item")
            elif isinstance(data, dict):
                i = 0
                emitted = False
                for key, val in data.items():
                    if isinstance(val, list):
                        for item in val:
                            _emit(rows, str(sid), i, fmt(item), key)
                            i += 1
                            emitted = True
                if not emitted:
                    _emit(rows, str(sid), 0, fmt(data), "object")
            else:
                _emit(rows, str(sid), 0, str(data), "scalar")
        return _explode_table(rows)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _render_element(el: ET.Element, depth: int = 0) -> str:
    lines = []
    indent = "  " * depth
    text = (el.text or "").strip()
    if text:
        lines.append(f"{indent}{el.tag}: {text}")
    else:
        lines.append(f"{indent}{el.tag}:")
    for child in el:
        lines.append(_render_element(child, depth + 1))
    return "\n".join(lines)


def explode_xml(ds: Dataset, id_col: str = "doc_id", payload_col: str = "payload") -> Dataset:
    """XML payload -> one row per repeated child item (xml_loader.py:16-88):
    the most common direct-child tag of the root is the item tag; if no tag
    repeats, the whole tree is one document (indented rendering)."""

    def explode(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in DOC_OUT_SCHEMA.names}
        for sid, payload in zip(batch[id_col].to_pylist(), batch[payload_col].to_pylist()):
            try:
                root = ET.fromstring(payload)
            except ET.ParseError:
                _emit(rows, str(sid), -1, "", "error")
                continue
            tags = Counter(child.tag for child in root)
            if tags and tags.most_common(1)[0][1] > 1:
                item_tag = tags.most_common(1)[0][0]
                for i, child in enumerate(c for c in root if c.tag == item_tag):
                    _emit(rows, str(sid), i, _render_element(child), item_tag)
            else:
                _emit(rows, str(sid), 0, _render_element(root), root.tag)
        return _explode_table(rows)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def explode_mbox(
    ds: Dataset, id_col: str = "doc_id", payload_col: str = "payload", max_emails: int = MBOX_MAX_EMAILS
) -> Dataset:
    """mbox archive payload -> one row per message (mbox_loader semantics,
    email_loader.py:197-333): messages split on "From " separator lines,
    capped at max_emails, per-message parse errors skipped."""
    from clawrag_ray.reference.extractor import parse_email_blocks

    def explode(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in DOC_OUT_SCHEMA.names}
        for sid, payload in zip(batch[id_col].to_pylist(), batch[payload_col].to_pylist()):
            messages = []
            cur: list[str] = []
            for line in (payload or "").split("\n"):
                if line.startswith("From ") and cur:
                    messages.append("\n".join(cur))
                    cur = [line]
                else:
                    cur.append(line)
            if cur:
                messages.append("\n".join(cur))
            for i, msg in enumerate(messages[:max_emails]):
                body = msg.split("\n", 1)[1] if msg.startswith("From ") and "\n" in msg else msg
                try:
                    blocks = parse_email_blocks(body)
                    content = "\n".join(b.text for b in blocks)
                except Exception:
                    continue  # per-message error-skip
                _emit(rows, str(sid), i, content, "email")
        return _explode_table(rows)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def read_binary_column(paths: list[str] | str) -> Dataset:
    """File-backed entry: ray.data.read_binary_files + UTF-8/latin-1
    fallback decode into (doc_id=path, payload) rows."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        texts = [decode_fallback(b or b"") for b in batch["bytes"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["path"],
                "payload": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def text_preview(ds: Dataset, payload_col: str = "payload", n_chars: int = 4096) -> Dataset:
    """First-n-chars preview column (classifier preview, O2 semantics —
    data_classifier_service.py:172-197) via vectorized utf8 slice."""
    import pyarrow.compute as pc

    def preview(batch: pa.Table) -> pa.Table:
        return batch.append_column("preview", pc.utf8_slice_codeunits(batch[payload_col], 0, n_chars))

    return ds.map_batches(preview, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
