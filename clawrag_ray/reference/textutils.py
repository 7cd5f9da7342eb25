"""Text normalization primitives shared by the reference extractor and the
Ray stages.

Semantics modeled on ClawRag (citations into /root/reference):
  - clean_text: collapse all whitespace runs to a single space and strip
    (backend/src/services/ingest_v2/pipeline.py:118-121).
  - decode_fallback: UTF-8 with latin-1 fallback
    (backend/src/services/extraction_service.py:150-163).
"""

from __future__ import annotations

import hashlib
import re

_WS_RUN = re.compile(r"\s+")


def clean_text(text: str) -> str:
    """Collapse whitespace runs to single spaces and strip."""
    return _WS_RUN.sub(" ", text).strip()


def decode_fallback(data: bytes) -> str:
    """UTF-8 decode with latin-1 fallback (latin-1 never fails)."""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return data.decode("latin-1")


def content_hash(text: str) -> str:
    """sha256 hex of the payload — the dedup key (reference hashes file
    bytes, backend/src/services/extraction_service.py:93-99)."""
    return hashlib.sha256(text.encode("utf-8", errors="surrogatepass")).hexdigest()


def norm_chunk_hash(text: str) -> str:
    """Chunk-level dedup hash: first 16 hex of sha256 of strip+lower
    normalized text (backend/src/core/indexing_service.py:538-542)."""
    return hashlib.sha256(text.strip().lower().encode("utf-8")).hexdigest()[:16]


def doc_id_for_content(text: str) -> str:
    """Default doc id: first 16 hex of sha256(content)
    (backend/src/core/indexing_service.py:46-58)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()[:16]
