"""Single-box memory-bandwidth calibration for the scaling decomposition.

Runs the IDENTICAL per-document extraction work (the frozen reference
extractor — the same parsing the Ray pipeline's hot stage does) in K
concurrent worker processes with NO shared state, no Ray, no shuffle, no
I/O. Any per-doc slowdown at higher K is therefore pure hardware
contention (one socket's memory bandwidth / cache), not engine overhead —
the component of the 8->32 CPU scaling gap that a multi-node cluster does
not share, since added nodes bring their own sockets.

Prints one JSON line:
  {"per_doc_us": {"1": x, "8": y, "32": z}, "inflation_8": y/x,
   "inflation_32": z/x}

Usage: PYTHONPATH=/root/repo python scripts/bandwidth_probe.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("PROBE_DOCS", "400"))
REPS = int(os.environ.get("PROBE_REPS", "6"))
LEVELS = [int(c) for c in os.environ.get("PROBE_LEVELS", "1,8,32").split(",")]


def _docs() -> list[tuple[str, str]]:
    from clawrag_ray.corpus import corpus_table

    tab = corpus_table(seed=7, n_docs=N_DOCS)
    return list(zip(tab["doc_kind"].to_pylist(), tab["payload"].to_pylist()))


def _work(args) -> tuple[float, int]:
    docs, reps = args
    from clawrag_ray.reference.extractor import ExtractError, extract_document

    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for kind, payload in docs:
            try:
                extract_document(kind, payload)
            except ExtractError:
                pass
            n += 1
    return (time.perf_counter() - t0, n)


def probe(k: int, docs) -> float:
    """Mean per-doc wall seconds per worker at K-way concurrency (every
    worker does identical, independent work)."""
    if k == 1:
        wall, n = _work((docs, REPS))
        return wall / n
    with mp.get_context("fork").Pool(k) as pool:
        res = pool.map(_work, [(docs, REPS)] * k)
    walls = [w / n for w, n in res]
    return sum(walls) / len(walls)


def main() -> None:
    docs = _docs()
    _work((docs, 1))  # warm imports / allocator before timing
    per_doc = {}
    for k in LEVELS:
        best = min(probe(k, docs) for _ in range(2))
        per_doc[str(k)] = round(best * 1e6, 2)
    base = per_doc[str(LEVELS[0])]
    out = {"per_doc_us": per_doc, "n_docs": N_DOCS, "reps": REPS}
    for k in LEVELS[1:]:
        out[f"inflation_{k}"] = round(per_doc[str(k)] / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
