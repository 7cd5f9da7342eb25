"""Frozen single-threaded reference extractor.

This package defines, in pure Python with zero Ray/Arrow dependencies, the
exact extraction semantics the distributed pipeline must reproduce
(span-sequence equality ``(kind, text, media_ref, order)`` per ``doc_id``).
It is the oracle for the pytest conformance suite and is FROZEN: behavior
changes here invalidate every recorded expectation.

The semantics reimplement the behaviorally-relevant parts of ClawRag's
Docling-based extraction service (SURVEY.md §7.1) — smart routing, plaintext
fallback for degenerate markdown, reading-order page layout, boilerplate
stripping, hierarchical chunking — as deterministic rules we define and own.
"""

from clawrag_ray.reference.extractor import extract_document, ExtractError  # noqa: F401
