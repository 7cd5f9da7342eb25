"""Frozen reference extractor: one document -> ordered span sequence.

This module is the single-threaded specification of extraction semantics.
The Ray pipeline (clawrag_ray.stages / pipelines) must reproduce its output
exactly per doc_id under span-sequence equality (kind, text, media_ref,
order). Pure Python, no Ray/Arrow imports.

Semantics reimplemented from ClawRag (citations into /root/reference), with
the Docling-internal parts (PDF layout, HTML main-content) specified by us
per SURVEY.md §7.1:

  * smart routing fast/heavy + encrypted error rows
      backend/src/services/docling_service.py:295-325,
      backend/src/services/pdf_analyzer.py:12-85
  * degenerate-markdown plaintext fallback (GitHub Issue #6)
      backend/src/services/docling_service.py:336-355,401-440
  * whitespace normalization
      backend/src/services/ingest_v2/pipeline.py:118-121
  * hierarchical chunking of long text via the separator cascade
      backend/src/core/indexing_service.py:576-612
  * email header/body extraction
      backend/src/services/loaders/email_loader.py:48-165
  * pdf_like reading order: per-page y-band clustering then x sort —
    our deterministic stand-in for Docling's layout model
  * html boilerplate strip: nav/footer/header/aside removal + per-block
    link-density > 0.5 filter — our deterministic stand-in for DOM
    text-density heuristics

Offset encoding (schema.PAGE_STRIDE / BLOCK_STRIDE): offset =
page_idx * 1_000_000 + block_rank * 1_000 + chunk_idx, computable per page
in isolation so the distributed per-page path needs no cross-page state.
"""

from __future__ import annotations

import json
import re
from email import message_from_string
from email.message import Message
from html.parser import HTMLParser
from typing import NamedTuple

from clawrag_ray.reference.chunkers import separator_cascade
from clawrag_ray.reference.textutils import clean_text

PAGE_STRIDE = 1_000_000
BLOCK_STRIDE = 1_000

DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 200

# pdf_like has_text heuristic (pdf_analyzer.py:59-76): >50 stripped chars of
# digital text in the first min(3, n_pages) pages.
HAS_TEXT_MIN_CHARS = 50
HAS_TEXT_PAGES = 3

LINE_BAND_PX = 12.0  # y-band height for reading-order clustering


class Span(NamedTuple):
    kind: str
    text: str
    media_ref: str
    offset: int


class Block(NamedTuple):
    kind: str
    text: str
    media_ref: str


class ExtractError(Exception):
    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}" if message else code)
        self.code = code
        self.message = message


# ---------------------------------------------------------------------------
# Block emission: blocks -> spans with offsets + hierarchical chunking
# ---------------------------------------------------------------------------


def emit_spans(
    blocks: list[Block],
    page_idx: int = 0,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[Span]:
    """Assign offsets and split long "text" blocks with the separator
    cascade; structural blocks (heading/list/table/figure/code) pass through
    whole so their media_refs survive (hierarchical chunking)."""
    spans: list[Span] = []
    for block_rank, blk in enumerate(blocks):
        base = page_idx * PAGE_STRIDE + block_rank * BLOCK_STRIDE
        if blk.kind == "text" and len(blk.text) > chunk_size:
            for ci, chunk in enumerate(separator_cascade(blk.text, chunk_size, chunk_overlap)):
                spans.append(Span("text", chunk, blk.media_ref, base + ci))
        else:
            spans.append(Span(blk.kind, blk.text, blk.media_ref, base))
    return spans


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

_BLANK_SPLIT = re.compile(r"\n\s*\n")


def parse_text_blocks(payload: str) -> list[Block]:
    """Plain text: one "text" block per blank-line-separated paragraph."""
    blocks = []
    for para in _BLANK_SPLIT.split(payload):
        t = clean_text(para)
        if t:
            blocks.append(Block("text", t, ""))
    return blocks


# ---------------------------------------------------------------------------
# markdown
# ---------------------------------------------------------------------------

_MD_HEADING = re.compile(r"^(#{1,6})\s*(.*)$")
_MD_LIST_ITEM = re.compile(r"^\s*(?:[-*+]|\d+\.)\s+(.*)$")
_MD_LIST_EMPTY = re.compile(r"^\s*(?:[-*+]|\d+\.)\s*$")
_MD_IMAGE = re.compile(r"^!\[([^\]]*)\]\(([^)\s]+)\)\s*$")


def parse_markdown_blocks(payload: str) -> list[Block]:
    """Line-based markdown parse with the Issue-#6 plaintext fallback:
    degenerate documents that yield no blocks fall back to one cleaned
    "text" block of the whole payload (docling_service.py:336-355)."""
    blocks: list[Block] = []
    lines = payload.split("\n")
    i = 0
    para: list[str] = []

    def flush_para() -> None:
        if para:
            t = clean_text(" ".join(para))
            if t:
                blocks.append(Block("text", t, ""))
            para.clear()

    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        if stripped.startswith("```"):
            flush_para()
            i += 1
            code_lines: list[str] = []
            while i < n and not lines[i].strip().startswith("```"):
                code_lines.append(lines[i])
                i += 1
            i += 1  # closing fence (or EOF)
            code = "\n".join(code_lines)
            if code.strip():
                blocks.append(Block("code", code, ""))
            continue
        m = _MD_HEADING.match(stripped)
        if m:
            flush_para()
            title = clean_text(m.group(2))
            if title:
                blocks.append(Block("heading", title, ""))
            i += 1
            continue
        m = _MD_IMAGE.match(stripped)
        if m:
            flush_para()
            blocks.append(Block("figure", clean_text(m.group(1)), m.group(2)))
            i += 1
            continue
        if _MD_LIST_ITEM.match(line) or _MD_LIST_EMPTY.match(line):
            flush_para()
            items: list[str] = []
            while i < n:
                im = _MD_LIST_ITEM.match(lines[i])
                if im:
                    it = clean_text(im.group(1))
                    if it:
                        items.append(it)
                    i += 1
                elif _MD_LIST_EMPTY.match(lines[i]):
                    i += 1
                else:
                    break
            if items:
                blocks.append(Block("list", "\n".join(items), ""))
            continue
        if stripped.startswith("|"):
            flush_para()
            rows: list[str] = []
            while i < n and lines[i].strip().startswith("|"):
                rows.append(lines[i].strip())
                i += 1
            if rows:
                blocks.append(Block("table", "\n".join(rows), ""))
            continue
        if not stripped:
            flush_para()
        else:
            para.append(stripped)
        i += 1
    flush_para()

    if not blocks:
        fallback = clean_text(payload)
        if fallback:
            blocks.append(Block("text", fallback, ""))
    return blocks


# ---------------------------------------------------------------------------
# html
# ---------------------------------------------------------------------------

_BOILERPLATE_TAGS = frozenset({"nav", "footer", "header", "aside", "script", "style"})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
LINK_DENSITY_MAX = 0.5


class _HtmlBlockParser(HTMLParser):
    """Single-pass block extractor with boilerplate stripping.

    Content under nav/footer/header/aside/script/style is dropped outright;
    paragraph blocks whose link-text density exceeds LINK_DENSITY_MAX are
    dropped (text-density boilerplate heuristic)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._skip_depth = 0
        self._link_depth = 0
        self._para: list[str] | None = None
        self._para_chars = 0
        self._link_chars = 0
        self._heading: list[str] | None = None
        self._list_items: list[str] | None = None
        self._cur_item: list[str] | None = None
        self._table_rows: list[list[str]] | None = None
        self._cur_row: list[str] | None = None
        self._cur_cell: list[str] | None = None
        self._pre: list[str] | None = None

    # -- helpers
    def _flush_para(self) -> None:
        if self._para is not None:
            text = clean_text("".join(self._para))
            if text and (self._para_chars == 0 or self._link_chars / self._para_chars <= LINK_DENSITY_MAX):
                self.blocks.append(Block("text", text, ""))
        self._para = None
        self._para_chars = 0
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BOILERPLATE_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        elif tag in _HEADING_TAGS:
            self._flush_para()
            self._heading = []
        elif tag == "p":
            self._flush_para()
            self._para = []
        elif tag in ("ul", "ol"):
            self._flush_para()
            self._list_items = []
        elif tag == "li" and self._list_items is not None:
            self._cur_item = []
        elif tag == "table":
            self._flush_para()
            self._table_rows = []
        elif tag == "tr" and self._table_rows is not None:
            self._cur_row = []
        elif tag in ("td", "th") and self._cur_row is not None:
            self._cur_cell = []
        elif tag == "pre":
            self._flush_para()
            self._pre = []
        elif tag == "img":
            d = dict(attrs)
            self.blocks.append(Block("figure", clean_text(d.get("alt") or ""), d.get("src") or ""))
        elif tag == "br" and self._para is not None:
            self._para.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _BOILERPLATE_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        elif tag in _HEADING_TAGS and self._heading is not None:
            text = clean_text("".join(self._heading))
            if text:
                self.blocks.append(Block("heading", text, ""))
            self._heading = None
        elif tag == "p":
            self._flush_para()
        elif tag in ("ul", "ol") and self._list_items is not None:
            if self._list_items:
                self.blocks.append(Block("list", "\n".join(self._list_items), ""))
            self._list_items = None
        elif tag == "li" and self._cur_item is not None:
            it = clean_text("".join(self._cur_item))
            if it and self._list_items is not None:
                self._list_items.append(it)
            self._cur_item = None
        elif tag == "table" and self._table_rows is not None:
            rows = ["| " + " | ".join(r) + " |" for r in self._table_rows if r]
            if rows:
                self.blocks.append(Block("table", "\n".join(rows), ""))
            self._table_rows = None
        elif tag == "tr" and self._cur_row is not None:
            if self._table_rows is not None and self._cur_row:
                self._table_rows.append(self._cur_row)
            self._cur_row = None
        elif tag in ("td", "th") and self._cur_cell is not None:
            if self._cur_row is not None:
                self._cur_row.append(clean_text("".join(self._cur_cell)))
            self._cur_cell = None
        elif tag == "pre" and self._pre is not None:
            code = "".join(self._pre)
            if code.strip():
                self.blocks.append(Block("code", code, ""))
            self._pre = None

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._pre is not None:
            self._pre.append(data)
        elif self._cur_cell is not None:
            self._cur_cell.append(data)
        elif self._cur_item is not None:
            self._cur_item.append(data)
        elif self._heading is not None:
            self._heading.append(data)
        elif self._para is not None:
            self._para.append(data)
            self._para_chars += len(data)
            if self._link_depth:
                self._link_chars += len(data)


_TAG_STRIP = re.compile(r"<[^>]+>")


def parse_html_blocks(payload: str) -> list[Block]:
    parser = _HtmlBlockParser()
    try:
        parser.feed(payload)
        parser.close()
        blocks = parser.blocks
    except Exception:
        blocks = []
    if not blocks:
        fallback = clean_text(_TAG_STRIP.sub(" ", payload))
        if fallback:
            blocks = [Block("text", fallback, "")]
    return blocks


# ---------------------------------------------------------------------------
# pdf_like
# ---------------------------------------------------------------------------


def parse_pdf_payload(payload: str) -> dict:
    """pdf_like payload is JSON: {"pages": [{"blocks": [{"x","y","kind",
    "text","media_ref"}...]}...], "encrypted": bool}."""
    try:
        doc = json.loads(payload)
    except (json.JSONDecodeError, TypeError) as e:
        raise ExtractError("INVALID_PDF", str(e)) from e
    if not isinstance(doc, dict) or "pages" not in doc:
        raise ExtractError("INVALID_PDF", "missing pages")
    return doc


def pdf_has_text(doc: dict) -> bool:
    """Digital-text heuristic: >50 stripped chars of non-OCR text in the
    first min(3, n_pages) pages (pdf_analyzer.py:59-76)."""
    chars = 0
    for page in doc["pages"][:HAS_TEXT_PAGES]:
        for blk in page.get("blocks", []):
            if blk.get("kind") != "ocr":
                chars += len((blk.get("text") or "").strip())
                if chars > HAS_TEXT_MIN_CHARS:
                    return True
    return chars > HAS_TEXT_MIN_CHARS


def route_pdf(doc: dict) -> str:
    if doc.get("encrypted"):
        return "error"
    return "fast" if pdf_has_text(doc) else "heavy"


def pdf_page_blocks(page: dict, heavy: bool) -> list[Block]:
    """Reading-order layout for one page: cluster blocks into lines by
    y-band (band = floor(y / LINE_BAND_PX)), order (band, x, input rank) —
    our deterministic stand-in for bbox clustering + reading-order sort.
    OCR blocks are included (as "text") only on the heavy route; the fast
    (digital) route ignores them (docling_service.py:295-325 routing)."""
    raw = page.get("blocks", [])
    keyed = []
    for rank, blk in enumerate(raw):
        kind = blk.get("kind", "text")
        if kind == "ocr":
            if not heavy:
                continue
            kind = "text"
        y = float(blk.get("y", 0.0))
        x = float(blk.get("x", 0.0))
        keyed.append(((int(y // LINE_BAND_PX), x, rank), kind, blk))
    keyed.sort(key=lambda t: t[0])
    blocks: list[Block] = []
    for _, kind, blk in keyed:
        media_ref = blk.get("media_ref") or ""
        if kind in ("text", "heading", "list"):
            text = clean_text(blk.get("text") or "")
        else:
            text = (blk.get("text") or "").strip()
        if text or media_ref:
            blocks.append(Block(kind, text, media_ref))
    return blocks


def extract_pdf_page(
    page: dict,
    page_idx: int,
    heavy: bool,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[Span]:
    """Per-page extraction — the unit of work for the distributed mega-doc
    path (explode pages -> extract -> reassemble by offset)."""
    return emit_spans(pdf_page_blocks(page, heavy), page_idx, chunk_size, chunk_overlap)


# ---------------------------------------------------------------------------
# email
# ---------------------------------------------------------------------------


def _email_body_text(msg: Message) -> str:
    """Prefer text/plain; fall back to tag-stripped text/html
    (email_loader.py:48-165 multipart walk)."""
    plain: list[str] = []
    html: list[str] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        payload = part.get_payload(decode=True)
        if payload is None:
            payload_str = part.get_payload()
            if not isinstance(payload_str, str):
                continue
        else:
            try:
                payload_str = payload.decode(part.get_content_charset() or "utf-8", errors="replace")
            except LookupError:
                payload_str = payload.decode("utf-8", errors="replace")
        if ctype == "text/plain":
            plain.append(payload_str)
        elif ctype == "text/html":
            html.append(payload_str)
    if plain:
        return "\n\n".join(plain)
    if html:
        return _TAG_STRIP.sub(" ", "\n\n".join(html))
    return ""


def parse_email_blocks(payload: str) -> list[Block]:
    msg = message_from_string(payload)
    blocks: list[Block] = []
    subject = clean_text(msg.get("Subject", ""))
    if subject:
        blocks.append(Block("heading", subject, ""))
    header_bits = []
    for h in ("From", "To", "Date"):
        v = clean_text(msg.get(h, ""))
        if v:
            header_bits.append(f"{h}: {v}")
    if header_bits:
        blocks.append(Block("text", " | ".join(header_bits), ""))
    blocks.extend(parse_text_blocks(_email_body_text(msg)))
    return blocks


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------

_FLAT_PARSERS = {
    "text": parse_text_blocks,
    "markdown": parse_markdown_blocks,
    "html": parse_html_blocks,
    "email": parse_email_blocks,
}


def route_document(doc_kind: str, payload: str) -> str:
    """Routing decision: pdf_like routes by encryption + has_text; all
    other kinds are 'fast' (docling_service.py:295-325: non-PDF -> FAST)."""
    if doc_kind == "pdf_like":
        try:
            return route_pdf(parse_pdf_payload(payload))
        except ExtractError:
            return "error"
    if doc_kind in _FLAT_PARSERS:
        return "fast"
    return "error"


def extract_document(
    doc_kind: str,
    payload: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[Span]:
    """Extract the full ordered span sequence for one document.

    Raises ExtractError for encrypted/invalid pdf_like payloads and unknown
    doc kinds (these become error-side-channel rows in the pipeline)."""
    if doc_kind == "pdf_like":
        doc = parse_pdf_payload(payload)
        if doc.get("encrypted"):
            raise ExtractError("ENCRYPTED_PDF", "document is encrypted")
        heavy = not pdf_has_text(doc)
        spans: list[Span] = []
        for page_idx, page in enumerate(doc["pages"]):
            spans.extend(extract_pdf_page(page, page_idx, heavy, chunk_size, chunk_overlap))
        return spans
    parser = _FLAT_PARSERS.get(doc_kind)
    if parser is None:
        raise ExtractError("UNSUPPORTED_KIND", doc_kind)
    return emit_spans(parser(payload), 0, chunk_size, chunk_overlap)
