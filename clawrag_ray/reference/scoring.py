"""Frozen quality-scoring and classification semantics.

Reimplements ClawRag's scoring formulas exactly as specified by the survey
(citations into /root/reference):

  structure_score     backend/src/core/quality_scorer.py:22-60
  ocr_penalties       backend/src/core/quality_scorer.py:62-91
  quality_score       backend/src/core/quality_scorer.py:8-20,94-143
  classify_extension  backend/src/services/data_classifier_service.py:130-170
  clause/amount regex backend/src/services/ingest_v2/pipeline.py:123-139
"""

from __future__ import annotations

import re

# --- structure score (quality_scorer.py:22-60) -----------------------------


def structure_score(n_tables: int, n_headings: int, n_lists: int, n_images: int) -> float:
    """+0.4 tables, +0.3 headings, +0.2 lists, +0.1 images; x1.2 bonus when
    the element count exceeds 10; floor 0.1; cap 1.0."""
    score = 0.0
    if n_tables > 0:
        score += 0.4
    if n_headings > 0:
        score += 0.3
    if n_lists > 0:
        score += 0.2
    if n_images > 0:
        score += 0.1
    total = n_tables + n_headings + n_lists + n_images
    if total > 10:
        score *= 1.2
    return min(1.0, max(0.1, score))


# --- OCR artifact penalties (quality_scorer.py:62-91) ----------------------

_SPACED_LETTERS = re.compile(r"\b\w \w \w\b")


def ocr_penalty(text: str) -> float:
    """0.1 per triggered artifact class: replacement chars present, spaced
    single letters ("l i k e t h i s"), >10% of lines 1-2 chars long."""
    penalty = 0.0
    if "�" in text:
        penalty += 0.1
    if _SPACED_LETTERS.search(text):
        penalty += 0.1
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if lines:
        short = sum(1 for ln in lines if len(ln.strip()) <= 2)
        if short / len(lines) > 0.10:
            penalty += 0.1
    return penalty


# --- quality score (quality_scorer.py:8-20,94-143) -------------------------

LENGTH_TARGET = 5000
W_LENGTH, W_LANG, W_OCR, W_STRUCT = 0.10, 0.20, 0.30, 0.40
DEFAULT_OCR_CONF = 0.5
DEFAULT_STRUCT = 0.2
MIN_CHARS = 20


def quality_score(
    text_length: int,
    lang_known: bool,
    ocr_confidence: float | None = None,
    structure: float | None = None,
    penalty: float = 0.0,
) -> float:
    """Weighted sum, clamped [0, 1]; 0.0 below 20 chars."""
    if text_length < MIN_CHARS:
        return 0.0
    score = (
        W_LENGTH * min(1.0, text_length / LENGTH_TARGET)
        + W_LANG * (1.0 if lang_known else 0.0)
        + W_OCR * (DEFAULT_OCR_CONF if ocr_confidence is None else ocr_confidence)
        + W_STRUCT * (DEFAULT_STRUCT if structure is None else structure)
        - penalty
    )
    return min(1.0, max(0.0, score))


# --- heuristic extension classification (data_classifier_service.py:130-170)

_EXT_CATEGORIES: dict[str, tuple[str, float]] = {
    **{e: ("source_code", 0.95) for e in (".py", ".js", ".ts", ".java", ".go", ".rs", ".c", ".cpp", ".h")},
    **{e: ("emails", 0.95) for e in (".eml", ".mbox", ".msg")},
    **{e: ("spreadsheets", 0.9) for e in (".csv", ".xlsx", ".xls", ".tsv")},
    **{e: ("presentation", 0.9) for e in (".ppt", ".pptx")},
    **{e: ("documents", 0.6) for e in (".pdf", ".docx", ".doc", ".md", ".txt", ".html", ".rtf")},
}


def classify_extension(extension: str) -> tuple[str, float]:
    """Extension -> (category, confidence); unknown -> ("generic", 0.3)."""
    return _EXT_CATEGORIES.get(extension.lower(), ("generic", 0.3))


# --- clause / amount extraction (pipeline.py:123-139) ----------------------

CLAUSE_RE = re.compile(r"(?:Abschnitt|Section|Klausel|Clause)\s+\d+")
AMOUNT_RE = re.compile(r"\d{1,3}(?:[,.]\d{3})*(?:\.\d{2})?\s?(?:€|\$|USD|EUR|GBP)")


def extract_clauses(text: str) -> list[str]:
    return CLAUSE_RE.findall(text)


def extract_amounts(text: str) -> list[str]:
    return AMOUNT_RE.findall(text)
