"""Flagship extraction pipeline: interleaved docs table -> spans table.

Ray Data restatement of ClawRag's extraction lifecycle (SURVEY.md §3):

    read -> [inline | mega] -> ExtractDocs actor pool (inline)
                            -> explode pages -> ExtractPages actor
                               pool -> groupby(doc_id) reassembly
         -> union -> (optionally) write partitioned parquet/lance

Scale notes:
  * The inline/mega split uses only the cheap ``n_pages``/``doc_kind``
    columns. For a route-partitioned corpus (write_corpus default) use
    ``extract_spans_from_path``: each branch reads ONLY its own hive
    partition (``route_part=inline`` / ``route_part=mega``), so total input
    I/O is 1x. ``extract_spans`` on an arbitrary Dataset keeps the generic
    shape — both branches re-execute the shared lineage with a cheap batch
    filter (2x scan worst case; documented trade-off for unpartitioned
    inputs).
  * Only mega-docs (a tiny fraction, but the skew dominators) pay the
    groupby(doc_id) shuffle; everything else streams shuffle-free.
  * Actor pools size with ``concurrency``; each actor holds the parser
    state once (T1 analog, SURVEY.md §2.4). The inline and mega pools are
    sized INDEPENDENTLY — the sum of their min sizes must stay well below
    the cluster's CPUs, or the pools pin every core at startup and starve
    the read tasks (observed livelock with two (N/2, N) pools on an N-CPU
    node: 32 pinned actor CPUs, zero left for ReadParquet).
  * ``actor_num_cpus=0.5`` with ``concurrency=(1, 2*CPUs)`` doubles the
    actor count per CPU budget. The streaming executor's reservation
    allocator caps any single operator near half the cluster's CPUs
    (ratio 0.5), which idles ~half the node on an extraction-dominated
    pipeline; half-CPU actors fill that gap with mild oversubscription
    (measured: 24s -> 17s wall at 4 CPUs, identical total CPU seconds).
"""

from __future__ import annotations

import os

from ray.data import Dataset

from clawrag_ray.stages.extract import (
    MEGA_PAGE_THRESHOLD,
    ExtractDocs,
    ExtractPages,
    assemble_group,
    explode_mega_pages,
)


def _inline_branch(
    inline: Dataset,
    chunk_size: int,
    chunk_overlap: int,
    concurrency,
    batch_size: int,
    actor_num_cpus: float | None = None,
) -> Dataset:
    kw = {"num_cpus": actor_num_cpus} if actor_num_cpus else {}
    return inline.map_batches(
        ExtractDocs,
        fn_constructor_kwargs={"chunk_size": chunk_size, "chunk_overlap": chunk_overlap},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
        **kw,
    )


def _mega_branch(
    mega: Dataset,
    chunk_size: int,
    chunk_overlap: int,
    concurrency,
    page_batch_size: int,
    shuffle_blocks: int,
    actor_num_cpus: float | None = None,
) -> Dataset:
    kw = {"num_cpus": actor_num_cpus} if actor_num_cpus else {}
    return (
        mega.map_batches(explode_mega_pages, batch_format="pyarrow", batch_size=4, zero_copy_batch=True)
        # CRITICAL for skew: the repartition sits BETWEEN explode and
        # extract. Without it Ray fuses the two map_batches, the batch
        # granularity stays per-DOC, and a handful of fused tasks extract
        # every page of every mega doc serially (measured: 5 tasks for 427k
        # pages — parallelism 5 on a 32-CPU node, scaling efficiency 0.25).
        # The repartition materializes the cheap exploded page rows and
        # deals them evenly, so page extraction parallelizes page-wise —
        # the north rule's explicit explode -> repartition -> extract ->
        # groupby reassembly shape.
        .repartition(shuffle_blocks)
        .map_batches(
            ExtractPages,
            fn_constructor_kwargs={"chunk_size": chunk_size, "chunk_overlap": chunk_overlap},
            batch_format="pyarrow",
            batch_size=page_batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
            **kw,
        )
        .groupby("doc_id")
        .map_groups(assemble_group, batch_format="pyarrow")
    )


def extract_spans(
    raw: Dataset,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
    page_batch_size: int = 1024,
    mega_concurrency: int | tuple[int, int] = (1, 4),
    shuffle_blocks: int = 8,
    actor_num_cpus: float | None = None,
) -> Dataset:
    """Raw interleaved docs Dataset -> nested spans Dataset
    (doc_id, doc_kind, route, error_code, n_spans, spans).

    ``concurrency`` sizes the inline actor pool, ``mega_concurrency`` the
    (much smaller) mega-doc pool. Keep both mins tiny — autoscaling pools
    grow on queued work; large mins deadlock the read (module docstring).
    """
    import pyarrow.compute as pc

    def is_mega(b):
        return b.filter(pc.and_(pc.equal(b["doc_kind"], "pdf_like"), pc.greater(b["n_pages"], MEGA_PAGE_THRESHOLD)))

    def is_inline(b):
        return b.filter(
            pc.or_(pc.not_equal(b["doc_kind"], "pdf_like"), pc.less_equal(b["n_pages"], MEGA_PAGE_THRESHOLD))
        )

    inline = raw.map_batches(is_inline, batch_format="pyarrow", zero_copy_batch=True)
    mega = raw.map_batches(is_mega, batch_format="pyarrow", zero_copy_batch=True)
    inline_out = _inline_branch(inline, chunk_size, chunk_overlap, concurrency, batch_size, actor_num_cpus)
    mega_out = _mega_branch(
        mega, chunk_size, chunk_overlap, mega_concurrency, page_batch_size, shuffle_blocks, actor_num_cpus
    )
    return inline_out.union(mega_out)


def extract_spans_from_path(
    path: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
    page_batch_size: int = 1024,
    mega_concurrency: int | tuple[int, int] = (1, 4),
    shuffle_blocks: int = 8,
    read_num_blocks: int | None = None,
    actor_num_cpus: float | None = None,
) -> Dataset:
    """Extraction over a route-partitioned corpus directory (write_corpus
    default layout): the inline branch reads ``route_part=inline`` files
    and the mega branch reads ``route_part=mega`` files — 1x total input
    I/O, no re-filter. Falls back to extract_spans over a single full read
    when the directory is not hive-partitioned.

    ``read_num_blocks`` splits the inline scan into that many blocks
    (see read_corpus; ~4x worker count recommended)."""
    inline_dir = os.path.join(path, "route_part=inline")
    mega_dir = os.path.join(path, "route_part=mega")
    if not os.path.isdir(inline_dir):
        return extract_spans(
            read_corpus(path),
            chunk_size,
            chunk_overlap,
            concurrency,
            batch_size,
            page_batch_size,
            mega_concurrency,
            shuffle_blocks,
            actor_num_cpus,
        )
    inline_out = _inline_branch(
        read_corpus(inline_dir, num_blocks=read_num_blocks),
        chunk_size,
        chunk_overlap,
        concurrency,
        batch_size,
        actor_num_cpus,
    )
    if not os.path.isdir(mega_dir):
        return inline_out
    mega_out = _mega_branch(
        read_corpus(mega_dir),
        chunk_size,
        chunk_overlap,
        mega_concurrency,
        page_batch_size,
        shuffle_blocks,
        actor_num_cpus,
    )
    return inline_out.union(mega_out)


def read_corpus(path: str, columns: list[str] | None = None, num_blocks: int | None = None) -> Dataset:
    """Read the interleaved docs table (Lance-gated: read_lance when the
    lance package exists, else the parquet mirror with identical schema).

    ``num_blocks``: target block count for the scan. For the inline branch
    ~4x the worker count keeps actor-pool ramp-up smooth (many sub-second
    tasks) without drowning the scheduler; the default (None) lets Ray size
    blocks by bytes, which at small file counts yields ~1s-long tasks that
    quantize the pool ramp."""
    import ray.data

    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path, columns=columns, override_num_blocks=num_blocks)
    except ImportError:
        return ray.data.read_parquet(path, columns=columns, override_num_blocks=num_blocks)


def write_spans(spans: Dataset, path: str, min_rows_per_file: int = 10_000) -> None:
    """Write the spans product, partitioned parquet (Lance-gated)."""
    try:
        import lance  # noqa: F401

        spans.write_lance(path)
    except ImportError:
        spans.write_parquet(path, min_rows_per_file=min_rows_per_file)


def extract_spans_dedup(
    raw: Dataset,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> Dataset:
    """Parse-once-per-distinct-payload variant (the dataflow replacement
    for ClawRag's sha256-keyed Docling result cache, docling_service.py:
    135-226 / SURVEY.md §2.4 T4): hash payloads, extract ONE representative
    per distinct hash, then hash-join the span results back onto the full
    (doc_id, hash) mapping.

    Worth it when the corpus has real duplication (web crawls routinely
    carry 30-50% exact dups — every duplicate's parse is saved); for
    near-unique corpora the extra shuffle costs more than the saved
    parses, so this is an explicit variant, not the default. Output rows
    carry each ORIGINAL doc_id with its payload's spans — identical row
    set to extract_spans.

    Join-back mechanics: Arrow's hash join rejects nested non-key columns
    (list<struct> spans), so the fan-out is a union + groupby(hash)
    instead — reps extract under doc_id=payload_sha, then one group per
    hash holds its single span row plus the (hash -> original doc_id)
    mapping rows and emits a copy per original doc. One shuffle, and the
    span payload moves once per DISTINCT document, not per duplicate."""
    import hashlib

    import pyarrow as pa

    from clawrag_ray.schema import SPANS_TYPE

    def add_hash(b: pa.Table) -> pa.Table:
        # hash covers kind + n_pages + payload: extraction routing reads
        # n_pages (mega split), so two docs with identical kind+payload but
        # different n_pages must not share a representative's parse
        shas = [
            hashlib.sha256(f"{k}\x00{n}\x00{p}".encode("utf-8", "surrogatepass")).hexdigest()
            for k, n, p in zip(b["doc_kind"].to_pylist(), b["n_pages"].to_pylist(), b["payload"].to_pylist())
        ]
        return b.append_column("payload_sha", pa.array(shas, pa.string()))

    hashed = raw.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    # one representative per distinct payload, extracted under the HASH as
    # its doc_id (so span rows are already keyed for the fan-out). One
    # vectorized pass per hash PARTITION of whole payload groups — not one
    # map_groups call per distinct payload (the per-group-overhead trap,
    # relational.py:46-61); arrow format so payload bytes never round-trip
    # pandas.
    import numpy as np
    import pandas as pd

    from clawrag_ray.stages.relational import hash_partitioned_groups

    def first_per_hash_part(t: pa.Table) -> pa.Table:
        keys = t["payload_sha"].to_pandas()
        first_idx = np.flatnonzero(~keys.duplicated().to_numpy())
        one = t.take(pa.array(first_idx, pa.int64()))
        return one.set_column(one.schema.get_field_index("doc_id"), "doc_id", one["payload_sha"]).drop_columns(
            ["payload_sha"]
        )

    reps = hash_partitioned_groups(hashed, ["payload_sha"], first_per_hash_part, batch_format="pyarrow")
    rep_spans = extract_spans(reps, chunk_size, chunk_overlap, concurrency, batch_size)

    def tag_span(b: pa.Table) -> pa.Table:
        return b.append_column("orig_doc_id", pa.nulls(b.num_rows, pa.string()))

    def tag_mapping(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "doc_id": b["payload_sha"],
                "doc_kind": pa.nulls(n, pa.string()),
                "route": pa.nulls(n, pa.string()),
                "error_code": pa.nulls(n, pa.string()),
                "n_spans": pa.nulls(n, pa.int32()),
                "spans": pa.nulls(n, SPANS_TYPE),
                "orig_doc_id": b["doc_id"],
            }
        )

    spans_side = rep_spans.map_batches(tag_span, batch_format="pyarrow", zero_copy_batch=True)
    mapping_side = hashed.select_columns(["doc_id", "payload_sha"]).map_batches(
        tag_mapping, batch_format="pyarrow", zero_copy_batch=True
    )

    # fan-out: one vectorized arrow pass per hash partition — each mapping
    # row gathers its payload's single span row by index (take), so the
    # nested spans replicate without a pandas round-trip and without one
    # map_groups call per distinct payload hash.
    def fan_out_part(g: pa.Table) -> pa.Table:
        mask = pa.compute.is_valid(g["orig_doc_id"])
        docs = g.filter(mask)  # mapping rows (doc_id = payload_sha, orig_doc_id = original)
        span_rows = g.filter(pa.compute.invert(mask))  # one span row per distinct payload
        if docs.num_rows == 0 or span_rows.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in (pa.string(), pa.string(), pa.string(), pa.string(), pa.int32())]
                + [pa.nulls(0, SPANS_TYPE)],
                names=["doc_id", "doc_kind", "route", "error_code", "n_spans", "spans"],
            )
        span_idx = pd.Series(np.arange(span_rows.num_rows), index=span_rows["doc_id"].to_pandas())
        pos = span_idx.reindex(docs["doc_id"].to_pandas()).to_numpy()
        have = ~pd.isna(pos)
        docs = docs.filter(pa.array(have))
        rep = span_rows.take(pa.array(pos[have].astype("int64")))
        return pa.table(
            {
                "doc_id": docs["orig_doc_id"],
                "doc_kind": rep["doc_kind"],
                "route": rep["route"],
                "error_code": rep["error_code"],
                "n_spans": rep["n_spans"],
                "spans": rep["spans"],
            }
        )

    return hash_partitioned_groups(
        spans_side.union(mapping_side), ["doc_id"], fan_out_part, batch_format="pyarrow"
    )
