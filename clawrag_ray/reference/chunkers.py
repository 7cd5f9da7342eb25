"""Deterministic chunkers — frozen reference semantics.

Each chunker reimplements the *observable contract* of a ClawRag chunking
strategy (SURVEY.md §2.3); the math here is the specification the Ray
`flat_map` stages must match chunk-for-chunk.

  char_window        C4  backend/src/services/ingest_v2/pipeline.py:141-154
  separator_cascade  C5  backend/src/core/indexing_service.py:576-612
  code_split         C3  backend/src/services/loaders/code_loader.py:38-289
  parent_child       C6  backend/src/core/indexing_service.py:373-427
  row_based          C7  declared-but-unimplemented in the reference
                         (falls through to sentence split); here: honest
                         row-boundary split for CSV/markdown tables
"""

from __future__ import annotations

import re
from dataclasses import dataclass

DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 200
SEPARATORS = ("\n\n", "\n", ". ", " ", "")


def char_window(text: str, size: int = DEFAULT_CHUNK_SIZE, overlap: int = DEFAULT_CHUNK_OVERLAP) -> list[str]:
    """Fixed char window with tail overlap and end-of-text loop guard.

    Contract (pipeline.py:141-154): start at 0; emit text[start:start+size];
    stop as soon as a chunk reaches the end; next start = end - overlap.
    Empty text -> no chunks. Requires overlap < size.
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    n = len(text)
    if n == 0:
        return []
    chunks: list[str] = []
    start = 0
    while start < n:
        end = min(start + size, n)
        chunks.append(text[start:end])
        if end == n:
            break
        start = end - overlap
    return chunks


def n_char_window_chunks(n_chars: int, size: int = DEFAULT_CHUNK_SIZE, overlap: int = DEFAULT_CHUNK_OVERLAP) -> int:
    """Closed form of len(char_window(text)) for len(text) == n_chars.

    1 chunk if n <= size, else 1 + ceil((n - size) / (size - overlap)).
    Used by the SQL oracle (__ray_entry__.oracle_sql) — keep in sync.
    """
    if n_chars <= 0:
        return 0
    if n_chars <= size:
        return 1
    step = size - overlap
    return 1 + -(-(n_chars - size) // step)


def _split_keep_sep(text: str, sep: str) -> list[str]:
    """Split on sep, re-attaching sep to the end of each non-final piece so
    concatenation of pieces reproduces the input exactly."""
    parts = text.split(sep)
    return [p + sep for p in parts[:-1]] + [parts[-1]]


def separator_cascade(
    text: str,
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    separators: tuple[str, ...] = SEPARATORS,
) -> list[str]:
    """Separator-cascade chunker: split on the first separator present in
    the text, greedy-fill pieces up to ``size``, and start each new chunk
    with the last ``overlap`` chars of the previous one (tail overlap).
    A piece longer than ``size`` is recursively split with the remaining
    separators ("" terminates the cascade as a plain char window).

    Matches the contract of indexing_service.py:576-612 (greedy fill +
    tail overlap over the cascade ["\\n\\n", "\\n", ". ", " ", ""]).
    """
    if not text:
        return []
    if len(text) <= size:
        return [text]
    sep = ""
    rest: tuple[str, ...] = ()
    for i, s in enumerate(separators):
        if s == "" or s in text:
            sep, rest = s, separators[i + 1 :]
            break
    if sep == "":
        return char_window(text, size, overlap)
    chunks: list[str] = []
    cur = ""
    for piece in _split_keep_sep(text, sep):
        if len(piece) > size:
            # oversized piece: flush, recurse with the remaining cascade,
            # append its chunks verbatim (no overlap chaining across it —
            # keeps every chunk bounded by size + overlap at any depth)
            if cur:
                chunks.append(cur)
                cur = ""
            chunks.extend(separator_cascade(piece, size, overlap, rest + ("",)))
        elif cur and len(cur) + len(piece) > size:
            chunks.append(cur)
            cur = (cur[-overlap:] if overlap > 0 else "") + piece
        else:
            cur += piece
    if cur:
        chunks.append(cur)
    return chunks


@dataclass(frozen=True)
class CodeChunk:
    type: str  # "function" | "class" | "module"
    name: str
    start_line: int  # 1-based inclusive
    end_line: int  # 1-based inclusive
    text: str


# Construct-boundary patterns per language (reference supports 10 languages
# via regex boundary detection, code_loader.py:38-117; we cover the common
# ones and fall back to separator_cascade for the rest).
_CODE_PATTERNS: dict[str, re.Pattern[str]] = {
    "python": re.compile(r"^(?:async\s+)?(def|class)\s+(\w+)", re.M),
    "javascript": re.compile(
        r"^(?:export\s+)?(?:default\s+)?(?:async\s+)?(function|class)\s+(\w+)"
        r"|^(?:export\s+)?(const|let|var)\s+(\w+)\s*=\s*(?:async\s*)?(?:\(|function)",
        re.M,
    ),
    "typescript": re.compile(
        r"^(?:export\s+)?(?:default\s+)?(?:async\s+)?(function|class|interface)\s+(\w+)"
        r"|^(?:export\s+)?(const|let|var)\s+(\w+)\s*=\s*(?:async\s*)?(?:\(|function)",
        re.M,
    ),
    "java": re.compile(r"^\s*(?:public|private|protected)?\s*(?:static\s+)?(?:final\s+)?(class|interface|enum)\s+(\w+)", re.M),
    "go": re.compile(r"^(func|type)\s+(?:\(\s*\w+\s+\*?\w+\s*\)\s*)?(\w+)", re.M),
    "rust": re.compile(r"^\s*(?:pub\s+)?(fn|struct|enum|trait|impl|mod)\s+(\w+)", re.M),
}

_KIND_MAP = {
    "def": "function",
    "fn": "function",
    "func": "function",
    "function": "function",
    "const": "function",
    "let": "function",
    "var": "function",
    "class": "class",
    "interface": "class",
    "enum": "class",
    "struct": "class",
    "trait": "class",
    "impl": "class",
    "mod": "class",
    "type": "class",
}


def code_split(text: str, language: str) -> list[CodeChunk]:
    """Split source code on function/class construct boundaries.

    Each chunk runs from its construct's first line to the line before the
    next construct (the last runs to EOF); a leading preamble before the
    first construct becomes a "module" chunk. Unknown language -> one
    "module" chunk (callers then apply separator_cascade — the reference's
    SentenceSplitter fallback, code_loader.py:311-348).
    """
    pattern = _CODE_PATTERNS.get(language.lower())
    lines = text.split("\n")
    if pattern is None:
        return [CodeChunk("module", "", 1, len(lines), text)] if text else []
    bounds: list[tuple[int, str, str]] = []  # (line_idx0, type, name)
    for m in pattern.finditer(text):
        groups = [g for g in m.groups() if g]
        if len(groups) < 2:
            continue
        kw, name = groups[0], groups[1]
        line_idx = text.count("\n", 0, m.start())
        bounds.append((line_idx, _KIND_MAP.get(kw, "function"), name))
    if not bounds:
        return [CodeChunk("module", "", 1, len(lines), text)] if text else []
    chunks: list[CodeChunk] = []
    if bounds[0][0] > 0:
        pre = "\n".join(lines[: bounds[0][0]])
        if pre.strip():
            chunks.append(CodeChunk("module", "", 1, bounds[0][0], pre))
    for i, (start, typ, name) in enumerate(bounds):
        end = bounds[i + 1][0] if i + 1 < len(bounds) else len(lines)
        chunks.append(CodeChunk(typ, name, start + 1, end, "\n".join(lines[start:end])))
    return chunks


def parent_child(
    text: str,
    parent_size: int = 2000,
    child_size: int = 200,
    child_overlap: int = 20,
) -> list[dict]:
    """Parent/child chunking: parents are non-overlapping char windows of
    ``parent_size``; children are char windows of ``child_size`` /
    ``child_overlap`` within each parent, back-linked via ``parent_idx``
    (indexing_service.py:373-427 — parent 2000 stored whole, children
    200/20 with parent_doc_id metadata).

    Returns rows {role, parent_idx, child_idx, text}.
    """
    rows: list[dict] = []
    parents = char_window(text, parent_size, 0) if text else []
    for pi, ptext in enumerate(parents):
        rows.append({"role": "parent", "parent_idx": pi, "child_idx": -1, "text": ptext})
        for ci, ctext in enumerate(char_window(ptext, child_size, child_overlap)):
            rows.append({"role": "child", "parent_idx": pi, "child_idx": ci, "text": ctext})
    return rows


def row_based(text: str, rows_per_chunk: int = 50, keep_header: bool = True) -> list[str]:
    """Row-boundary split for CSV-like / markdown-table text: groups of
    ``rows_per_chunk`` data lines per chunk, with the first line (header)
    prepended to every chunk when ``keep_header``.

    The reference only *declares* ROW_BASED (SplitterType.ROW_BASED,
    indexing_service.py:28) and falls through to sentence splitting; this is
    the honest implementation SURVEY.md §2.3 C7 calls for.
    """
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if not lines:
        return []
    header: list[str] = []
    if keep_header and len(lines) > 1:
        header, lines = [lines[0]], lines[1:]
    chunks = []
    for i in range(0, len(lines), rows_per_chunk):
        chunks.append("\n".join(header + lines[i : i + rows_per_chunk]))
    return chunks


def split_sentences(text: str) -> list[str]:
    """Sentence segmentation for the semantic splitter: split after
    [.!?] + whitespace or on blank lines; whitespace-collapsed pieces."""
    parts = re.split(r"(?<=[.!?])\s+|\n{2,}", text)
    return [p.strip() for p in parts if p and p.strip()]


def semantic_split(
    text: str,
    embed_fn,
    breakpoint_percentile: float = 95.0,
    buffer_size: int = 1,
) -> list[str]:
    """Percentile-breakpoint semantic chunking — the algorithm behind the
    reference's BatchSemanticSplitter (resource_manager.py:43-110, which
    delegates to LlamaIndex SemanticSplitterNodeParser with
    breakpoint_percentile_threshold=95): embed each sentence (with a
    +-buffer_size context window), compute cosine DISTANCE between adjacent
    windows, split where distance exceeds the given percentile of all
    distances. ``embed_fn(list[str]) -> (n, d) array`` is injected so the
    frozen reference stays model-free (tests use HashEmbedder encoders).

    Cosine is computed CANONICALLY — dot(a, b) / (|a| * |b|) on the raw
    vectors, one division at the end — rather than normalize-then-dot.
    Cosine is scale-invariant so any embedder works, and for
    integer-valued embeddings (HashEmbedder.encode_raw signed counts)
    every dot product and squared norm is exact in float64, which makes
    the breakpoint computation bit-reproducible across engines — that is
    what lets the driver verify semantic_chunks against a DuckDB oracle
    replaying the same arithmetic in SQL.
    """
    import numpy as np

    sentences = split_sentences(text)
    if len(sentences) <= 1:
        return sentences
    windows = [
        " ".join(sentences[max(0, i - buffer_size) : i + buffer_size + 1]) for i in range(len(sentences))
    ]
    emb = np.asarray(embed_fn(windows), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    dots = (emb[:-1] * emb[1:]).sum(axis=1)
    sims = dots / (norms[:-1] * norms[1:])
    dists = 1.0 - sims
    cutoff = float(np.percentile(dists, breakpoint_percentile))
    chunks: list[str] = []
    cur = [sentences[0]]
    for i, d in enumerate(dists):
        if d > cutoff:
            chunks.append(" ".join(cur))
            cur = []
        cur.append(sentences[i + 1])
    if cur:
        chunks.append(" ".join(cur))
    return chunks
