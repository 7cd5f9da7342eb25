"""Deterministic synthetic interleaved text+media corpus (FIXTURES.md §1).

Every document is a pure function of ``(seed, idx)`` — each row gets its own
``random.Random(f"{seed}:{idx}")`` — so generation is order-independent and
can run embarrassingly parallel inside Ray ``map_batches`` without breaking
determinism. No wall-clock, no os.urandom (the reference's nondeterminism,
indexing_service.py:563 / ingest_folder.py:165, is deliberately NOT carried
over; see SURVEY.md §7.3).

Doc-kind mix and edge cases covered (FIXTURES.md §§1,3,5):
  * text / markdown / html / pdf_like / email interleaved
  * degenerate markdown (Issue #6 corpus) sprinkled in
  * html with nav/footer/aside boilerplate and link-farm paragraphs
  * pdf_like with out-of-order block coordinates (reading-order exercise),
    scanned pages (OCR-only -> heavy route) and encrypted docs (error rows)
  * mega-docs: every ``mega_every``-th doc is a pdf_like with
    ``mega_pages`` pages (skew fixture)
  * duplicate payloads (exact-dup fixture) every ``dup_every``-th doc
"""

from __future__ import annotations

import json
import random

WORDS = (
    "data pipeline ray arrow batch stream shard block actor worker table span "
    "document extract parse chunk index score route merge sort shuffle lance "
    "quality language heading figure media offset partition lineage metric "
    "throughput cluster node memory spill backpressure vector token corpus"
).split()

MEGA_EVERY_DEFAULT = 500
DUP_EVERY_DEFAULT = 23
MEGA_PAGES_DEFAULT = 1200


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(WORDS) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, n_sentences: int | None = None) -> str:
    n = n_sentences or rng.randint(2, 6)
    return " ".join(_sentence(rng, rng.randint(5, 14)) for _ in range(n))


_DEGENERATE_MD = ["## \n### \n", "- \n- \n- ", "# Title\n- \n- ", "# Hello\n\nThis is content."]


def _gen_text(rng: random.Random, big: bool) -> str:
    n_paras = rng.randint(60, 120) if big else rng.randint(2, 8)
    return "\n\n".join(_paragraph(rng) for _ in range(n_paras))


def _gen_markdown(rng: random.Random, doc_id: str, big: bool) -> str:
    if rng.random() < 0.06:
        return rng.choice(_DEGENERATE_MD)
    parts: list[str] = []
    media_n = 0
    for _ in range(rng.randint(40, 80) if big else rng.randint(3, 10)):
        r = rng.random()
        if r < 0.15:
            parts.append("#" * rng.randint(1, 3) + " " + _sentence(rng, rng.randint(2, 5)).rstrip("."))
        elif r < 0.25:
            parts.append("\n".join("- " + _sentence(rng, rng.randint(3, 7)) for _ in range(rng.randint(2, 5))))
        elif r < 0.32:
            cols = rng.randint(2, 4)
            header = "| " + " | ".join(rng.choice(WORDS) for _ in range(cols)) + " |"
            sep = "|" + "---|" * cols
            rows = ["| " + " | ".join(rng.choice(WORDS) for _ in range(cols)) + " |" for _ in range(rng.randint(1, 4))]
            parts.append("\n".join([header, sep] + rows))
        elif r < 0.38:
            media_n += 1
            parts.append(f"![{_sentence(rng, 3).rstrip('.')}](media://{doc_id}/{media_n})")
        elif r < 0.44:
            parts.append("```\n" + "\n".join(_sentence(rng, rng.randint(3, 6)) for _ in range(rng.randint(2, 5))) + "\n```")
        else:
            parts.append(_paragraph(rng))
    return "\n\n".join(parts)


def _gen_html(rng: random.Random, doc_id: str, big: bool) -> str:
    nav_links = " ".join(f'<a href="/{rng.choice(WORDS)}">{rng.choice(WORDS)}</a>' for _ in range(6))
    body: list[str] = []
    media_n = 0
    for _ in range(rng.randint(40, 80) if big else rng.randint(3, 10)):
        r = rng.random()
        if r < 0.15:
            body.append(f"<h{rng.randint(1, 3)}>{_sentence(rng, rng.randint(2, 5)).rstrip('.')}</h{rng.randint(1, 3)}>")
        elif r < 0.25:
            items = "".join(f"<li>{_sentence(rng, rng.randint(3, 7))}</li>" for _ in range(rng.randint(2, 5)))
            body.append(f"<ul>{items}</ul>")
        elif r < 0.32:
            cells = lambda: "".join(f"<td>{rng.choice(WORDS)}</td>" for _ in range(3))  # noqa: E731
            rows = "".join(f"<tr>{cells()}</tr>" for _ in range(rng.randint(2, 4)))
            body.append(f"<table>{rows}</table>")
        elif r < 0.38:
            media_n += 1
            body.append(f'<img src="media://{doc_id}/{media_n}" alt="{_sentence(rng, 3).rstrip(".")}">')
        elif r < 0.46:
            # link-farm paragraph — must be dropped by the density heuristic
            links = " ".join(f'<a href="/x">{rng.choice(WORDS)} {rng.choice(WORDS)}</a>' for _ in range(5))
            body.append(f"<p>{links} {rng.choice(WORDS)}</p>")
        else:
            body.append(f"<p>{_paragraph(rng)}</p>")
    return (
        f"<html><head><title>t</title></head><body><nav>{nav_links}</nav>"
        f"<header><p>{_sentence(rng, 6)}</p></header>" + "".join(body) + f"<footer><p>{nav_links}</p></footer></body></html>"
    )


def _gen_pdf_page(rng: random.Random, doc_id: str, page_idx: int, scanned: bool, media_state: list[int]) -> dict:
    blocks = []
    y = 10.0
    for _ in range(rng.randint(3, 8)):
        r = rng.random()
        if scanned:
            kind = "ocr"
        elif r < 0.12:
            kind = "heading"
        elif r < 0.2:
            kind = "table"
        elif r < 0.26:
            kind = "figure"
        else:
            kind = "text"
        blk: dict = {"x": round(rng.uniform(0, 40), 1), "y": round(y + rng.uniform(0, 4), 1), "kind": kind}
        if kind == "figure":
            media_state[0] += 1
            blk["media_ref"] = f"media://{doc_id}/{media_state[0]}"
            blk["text"] = _sentence(rng, 3).rstrip(".")
        elif kind == "table":
            blk["text"] = "\n".join("| " + " | ".join(rng.choice(WORDS) for _ in range(3)) + " |" for _ in range(rng.randint(2, 4)))
        else:
            blk["text"] = _paragraph(rng, rng.randint(1, 3))
        blocks.append(blk)
        y += rng.uniform(20, 60)
    # out-of-order storage: shuffle so reading order != storage order
    rng.shuffle(blocks)
    return {"blocks": blocks}


def _gen_pdf(rng: random.Random, doc_id: str, n_pages: int, scanned: bool, encrypted: bool) -> str:
    media_state = [0]
    pages = [_gen_pdf_page(rng, doc_id, p, scanned, media_state) for p in range(n_pages)]
    return json.dumps({"pages": pages, "encrypted": encrypted}, sort_keys=True)


def _gen_email(rng: random.Random) -> str:
    subj = _sentence(rng, rng.randint(3, 6)).rstrip(".")
    body = "\n\n".join(_paragraph(rng) for _ in range(rng.randint(1, 4)))
    return (
        f"From: {rng.choice(WORDS)}@example.com\n"
        f"To: {rng.choice(WORDS)}@example.com\n"
        f"Date: Mon, 1 Jan 2024 0{rng.randint(0, 9)}:00:00 +0000\n"
        f"Subject: {subj}\n"
        f"Content-Type: text/plain; charset=utf-8\n\n{body}\n"
    )


def gen_doc(
    seed: int,
    idx: int,
    mega_every: int = MEGA_EVERY_DEFAULT,
    dup_every: int = DUP_EVERY_DEFAULT,
    mega_pages: int = MEGA_PAGES_DEFAULT,
) -> dict:
    """Generate document ``idx`` of the corpus — pure function of args."""
    if dup_every and idx % dup_every == dup_every - 1 and idx >= dup_every:
        # exact duplicate of an earlier doc's payload under a new doc_id
        src = gen_doc(seed, idx - dup_every, mega_every=0, dup_every=0, mega_pages=mega_pages)
        return {**src, "doc_id": f"doc-{idx:012d}"}
    rng = random.Random(f"{seed}:{idx}")
    doc_id = f"doc-{idx:012d}"
    big = rng.random() < 0.01  # 1% ~1 MB-ish docs, 99% small (skew fixture)
    if mega_every and idx % mega_every == mega_every - 1:
        payload = _gen_pdf(rng, doc_id, mega_pages, scanned=False, encrypted=False)
        return {"doc_id": doc_id, "doc_kind": "pdf_like", "payload": payload, "n_pages": mega_pages, "lang": "en"}
    kind = rng.choices(("text", "markdown", "html", "pdf_like", "email"), weights=(20, 30, 25, 20, 5))[0]
    lang = rng.choice(("en", "en", "en", "de"))
    if kind == "text":
        payload, n_pages = _gen_text(rng, big), 1
    elif kind == "markdown":
        payload, n_pages = _gen_markdown(rng, doc_id, big), 1
    elif kind == "html":
        payload, n_pages = _gen_html(rng, doc_id, big), 1
    elif kind == "email":
        payload, n_pages = _gen_email(rng), 1
    else:
        r = rng.random()
        encrypted = r < 0.03
        scanned = (not encrypted) and r < 0.2
        n_pages = rng.randint(30, 60) if big else rng.randint(1, 8)
        payload = _gen_pdf(rng, doc_id, n_pages, scanned, encrypted)
    return {"doc_id": doc_id, "doc_kind": kind, "payload": payload, "n_pages": n_pages, "lang": lang}


def gen_docs(seed: int, start: int, stop: int, **kw) -> list[dict]:
    return [gen_doc(seed, i, **kw) for i in range(start, stop)]


def corpus_table(seed: int, n_docs: int, **kw):
    """Small-scale in-memory corpus as a pyarrow Table (tests)."""
    import pyarrow as pa

    from clawrag_ray.schema import RAW_DOC_SCHEMA

    rows = gen_docs(seed, 0, n_docs, **kw)
    return pa.Table.from_pylist(rows, schema=RAW_DOC_SCHEMA)


def corpus_dataset(seed: int, n_docs: int, parallelism: int = 32, **kw):
    """Corpus as a Ray Dataset, generated distributed: range(n) ->
    map_batches(gen). Used by bench.py to build inputs without a driver
    loop; at real scale this is how the 10^12-doc table would be seeded."""
    import pyarrow as pa
    import ray.data

    from clawrag_ray.schema import RAW_DOC_SCHEMA

    def gen_batch(batch: pa.Table) -> pa.Table:
        idxs = batch["id"].to_pylist()
        return pa.Table.from_pylist([gen_doc(seed, i, **kw) for i in idxs], schema=RAW_DOC_SCHEMA)

    return ray.data.range(n_docs, override_num_blocks=parallelism).map_batches(
        gen_batch, batch_format="pyarrow", batch_size=256
    )


def write_corpus(
    path: str, seed: int, n_docs: int, parallelism: int = 32, partition_by_route: bool = True, **kw
) -> None:
    """Write the corpus as partitioned parquet (Lance-gated: uses
    write_lance when the lance package is importable, else parquet —
    the sandbox has no lance wheel; the schema/layout is identical).

    ``partition_by_route=True`` hive-partitions by ``route_part``
    (inline vs mega — the extraction pipeline's branch predicate), the ONE
    partitioning key reused across stages: each extraction branch then scans
    only its own files instead of filtering a full second read. At 10^12-doc
    scale this is the difference between 1x and 2x input I/O.

    File/row-group sizing: the writer targets many small-ish files and
    2048-row parquet row groups. A handful of single-row-group files caps
    read parallelism at the FILE count (measured: 4 read tasks spending 65 s
    serially splitting a 320k-doc corpus while 28 cores idled); small row
    groups let ray.data split reads within a file as well."""
    n_files = max(parallelism, n_docs // 2000)
    ds = corpus_dataset(seed, n_docs, max(parallelism, n_files), **kw)
    if partition_by_route:
        import pyarrow as pa
        import pyarrow.compute as pc

        from clawrag_ray.schema import MEGA_PAGE_THRESHOLD

        def add_route_part(batch: pa.Table) -> pa.Table:
            mega = pc.and_(
                pc.equal(batch["doc_kind"], "pdf_like"), pc.greater(batch["n_pages"], MEGA_PAGE_THRESHOLD)
            )
            part = pc.if_else(mega, "mega", "inline")
            return batch.append_column("route_part", part)

        ds = ds.map_batches(add_route_part, batch_format="pyarrow", zero_copy_batch=True)
    try:
        import lance  # noqa: F401

        ds.write_lance(path)
    except ImportError:
        pq_kw = dict(row_group_size=2048)
        if partition_by_route:
            ds.write_parquet(path, partition_cols=["route_part"], **pq_kw)
        else:
            ds.write_parquet(path, **pq_kw)
