"""Vectorized pyarrow/numpy kernels shared by the Ray stages.

Everything here is batch-level: pyarrow.compute where a kernel exists, numpy
otherwise; sha256 is the one per-row Python loop (no vectorized sha256 in
pyarrow) and is kept tight (bytes in, hexdigest out).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WS_RUN_RE = r"\s+"
TOKEN_RE = r"\S+"
# RE2-parity word tokenizer for PYTHON-side loops: RE2 (Arrow + DuckDB's
# regex engine) defines \s as exactly [\t\n\f\r ] — no \v, no unicode
# whitespace — while Python str.split() splits on all unicode whitespace.
# Every Python tokenizer mirrored by a DuckDB '\S+' oracle must use this
# so texts with \x0b / NBSP / \x1c-\x1f tokenize identically on both sides.
_RE2_TOKEN = re.compile(r"[^\t\n\f\r ]+")


def re2_tokens(text: str) -> list[str]:
    """Tokenize like RE2's \\S+ (the oracle-side definition), not like
    str.split() (unicode whitespace)."""
    return _RE2_TOKEN.findall(text)


def round6_away(x: float) -> float:
    """round(x, 6) with HALF-AWAY-FROM-ZERO ties for non-negative x — the
    DuckDB/SQL convention, vs Python round()'s banker's rounding. Ratios
    of exact integers land on exact .5 boundaries whenever the
    denominator is a power of two (e.g. char fractions of a 256-char
    doc: 18/256*1e6 = 70312.5), where the two conventions diverge and an
    oracle hash flickers. x*1e6 is the same double on both engines, so
    floor(x*1e6 + 0.5)/1e6 reproduces DuckDB's round() bit-for-bit."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6
# BPE-ish word/number/punct tokenizer (public GPT-2-style pattern shape).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def md5_prefix_int(v) -> int:
    """Canonical deterministic-order hash: first 8 hex chars of
    md5(str(v)) as an int — THE construct every sampling/split oracle
    mirrors as ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::UBIGINT.
    One definition so engine/oracle parity cannot drift per call site."""
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def load_kernel(model_path: str, fn_name: str):
    """Load a user-supplied model kernel from a Python file — the plug
    point that swaps the deterministic stand-in kernels (HashEmbedder,
    image/audio decode) for real models on clusters that have them. The
    file must define ``fn_name``; it is imported ONCE per actor (call this
    from __init__, never per batch). Kept stdlib-importlib-only so the
    engine needs no model dependencies when no model is plugged."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"clawrag_plug_{abs(hash((model_path, fn_name)))}", model_path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, fn_name)


def md5_prefix_ints(values) -> "np.ndarray":
    """Batched md5_prefix_int over a sequence of ids -> int64 ndarray.
    Same digits as the scalar form (first 4 digest bytes big-endian ==
    first 8 hex chars), but one tight generator pass: bytes-level digest
    slicing instead of hexdigest + string slice + int(,16) per row, and no
    intermediate Python list. The md5 choice itself is cross-engine parity
    (DuckDB mirrors it) — see md5_prefix_int."""
    import numpy as np

    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(str(v).encode()).digest()[:4], "big") for v in values),
        dtype=np.int64,
        count=len(values),
    )


def sha256_hex(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hexdigest per string row."""
    out = [
        hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest() if v is not None else None
        for v in col.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def clean_text_arr(col) -> pa.ChunkedArray:
    """Vectorized clean_text: collapse whitespace runs, trim (matches
    reference.textutils.clean_text)."""
    collapsed = pc.replace_substring_regex(col, WS_RUN_RE, " ")
    return pc.utf8_trim_whitespace(collapsed)


def count_regex(col, pattern: str) -> pa.ChunkedArray:
    """Number of non-overlapping regex matches per row."""
    return pc.count_substring_regex(col, pattern)


def token_count(col) -> pa.ChunkedArray:
    """Whitespace token count per row."""
    return pc.count_substring_regex(col, TOKEN_RE)


def bpe_ish_token_count(col) -> pa.ChunkedArray:
    """BPE-ish token count: alpha runs + digit runs + single punct marks."""
    return pc.count_substring_regex(col, BPE_ISH_RE)


def stable_hash_u64(col) -> pa.Array:
    """Deterministic 64-bit hash per string (first 8 bytes of sha256).
    Used for hash-partitioning / salting; NOT Python's randomized hash()."""
    out = np.empty(len(col), dtype=np.uint64)
    for i, v in enumerate(col.to_pylist()):
        h = hashlib.sha256((v or "").encode("utf-8", "surrogatepass")).digest()
        out[i] = int.from_bytes(h[:8], "big")
    return pa.array(out, type=pa.uint64())


def rolling_fingerprint(text: str, window: int = 64, mod: int = (1 << 61) - 1, base: int = 257) -> int:
    """Rabin-Karp rolling-hash document fingerprint: min rolling hash over
    all ``window``-byte windows (a deterministic content fingerprint that is
    robust to concatenation position). Whole-text polynomial hash when the
    text is shorter than the window."""
    data = text.encode("utf-8", "surrogatepass")
    n = len(data)
    if n == 0:
        return 0
    if n <= window:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    h = 0
    pw = pow(base, window - 1, mod)
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, n):
        h = ((h - data[i - window] * pw) * base + data[i]) % mod
        if h < best:
            best = h
    return best


def json_int_field(col: pa.ChunkedArray | pa.Array, field: str) -> pa.Array:
    """Extract an integer field from a FLAT JSON string column — fully
    vectorized via one RE2 ``extract_regex`` pass (no per-row json.loads).
    Contract: scalar top-level fields only (the telemetry-props shape
    ``{"k": 69, ...}``); nested values, string-quoted numbers and
    duplicate keys need a real JSON parser stage. Rows where the field is
    absent (or the value non-integer) come back NULL — the SQL
    json_extract semantics."""
    pattern = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d+)'
    hit = pc.extract_regex(col, pattern)
    return pc.cast(pc.struct_field(hit, "v"), pa.int64())
