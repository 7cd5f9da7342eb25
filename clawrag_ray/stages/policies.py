"""Exact-dedup POLICY engine with audit side-output — full D1 semantics
(reference backend/src/services/deduplication_service.py:29-199):

  SKIP              keep the first copy (min id), drop the rest
  VERSION           keep all copies, versioned in id order, newest active
  REPLACE_IF_NEWER  keep the copy with the newest modified_date
                    (size as tie-break fallback), drop the rest
  NOTIFY_ONLY       keep everything, only audit

Every non-keeper copy produces an audit row (original_id, duplicate_id,
action_taken, metadata_diff) — the DuplicationAuditLog analog
(backend/src/database/models.py:381-408).

Implemented as one hash-partitioned group pass (hash_partitioned_groups —
NOT one map_groups call per distinct text, which at 10k+ mostly-singleton
groups is dominated by per-call overhead; relational.py:46-61) emitting
BOTH streams in a single output table discriminated by a ``record`` column
("doc" | "audit"), so the shuffle runs once; callers split with
split_policy_output(). All keeper/version/ordering logic is vectorized
over whole partitions; only the audit metadata_diff JSON strings are built
per DUPLICATE row (bounded by the duplicate count, not the corpus).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from ray.data import Dataset

from clawrag_ray.stages.dedup import with_text_hash

POLICIES = ("SKIP", "VERSION", "REPLACE_IF_NEWER", "NOTIFY_ONLY")

_ACTION = {
    "SKIP": "SKIPPED",
    "VERSION": "VERSIONED",
    "REPLACE_IF_NEWER": "REPLACED",
    "NOTIFY_ONLY": "NOTIFIED",
}


def apply_dedup_policy(
    ds: Dataset,
    policy: str = "SKIP",
    id_col: str = "doc_id",
    text_col: str = "text",
    mtime_col: str | None = None,
    size_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Returns a unified stream: rows with record="doc" are surviving
    documents (plus version/is_active for VERSION); rows with
    record="audit" are DuplicationAuditLog entries."""
    if policy not in POLICIES:
        raise ValueError(f"unknown policy {policy}; expected one of {POLICIES}")
    from clawrag_ray.stages.relational import hash_partitioned_groups

    cols = [id_col, text_col] + [c for c in (mtime_col, size_col) if c]
    hashed = with_text_hash(ds.select_columns(cols), text_col).drop_columns([text_col])
    action = _ACTION[policy]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # keeper order within each text group: REPLACE_IF_NEWER ranks by
        # (mtime desc, size desc, id asc); every other policy by id asc
        if policy == "REPLACE_IF_NEWER" and (mtime_col or size_col):
            by = ["text_sha256"] + [c for c in (mtime_col, size_col) if c] + [id_col]
            asc = [True] + [False] * ((1 if mtime_col else 0) + (1 if size_col else 0)) + [True]
            g = g.sort_values(by, ascending=asc, kind="mergesort").reset_index(drop=True)
        else:
            g = g.sort_values(["text_sha256", id_col], kind="mergesort").reset_index(drop=True)
        grp = g.groupby("text_sha256", sort=False)
        rank = grp.cumcount().to_numpy()
        total = grp[id_col].transform("size").to_numpy()
        keeper_id = grp[id_col].transform("first")
        is_first = rank == 0

        # ---- doc stream (vectorized) ----
        if policy == "SKIP" or policy == "REPLACE_IF_NEWER":
            doc_mask = is_first
        else:  # VERSION / NOTIFY_ONLY keep every copy
            doc_mask = np.ones(len(g), dtype=bool)
        docs = pd.DataFrame(
            {
                "record": "doc",
                id_col: g.loc[doc_mask, id_col].to_numpy(),
                "version": (rank[doc_mask] + 1).astype("int64") if policy == "VERSION" else np.int64(1),
                "is_active": (rank[doc_mask] == total[doc_mask] - 1) if policy == "VERSION" else True,
                "action_taken": "",
                "original_id": g.loc[doc_mask, id_col].to_numpy(),
                "metadata_diff": "",
            }
        )

        # ---- audit stream: one row per non-keeper copy ----
        dup_mask = ~is_first
        dups = g[dup_mask]
        keepers = keeper_id[dup_mask]
        # metadata_diff JSON per duplicate (json.dumps-compatible layout:
        # sorted keys, ", "/": " separators — mtime values as str, size as
        # int). Built only for duplicates, so the Python loop is bounded by
        # the duplicate count.
        if mtime_col or size_col:
            parts = []
            if mtime_col:
                # json.dumps per VALUE (not per row-dict): keeps the loop
                # bounded by dup count while escaping quotes/backslashes in
                # string mtimes — raw '"'-concat emits invalid JSON for them
                km = np.array(
                    [json.dumps(v) for v in grp[mtime_col].transform("first")[dup_mask].astype(str)]
                )
                dm = np.array([json.dumps(v) for v in dups[mtime_col].astype(str)])
                parts.append(('"%s": [' % mtime_col, km, ", ", dm, "]"))
            if size_col:
                ks = grp[size_col].transform("first")[dup_mask].astype("int64").to_numpy()
                dsz = dups[size_col].astype("int64").to_numpy()
                parts.append(('"%s": [' % size_col, ks, ", ", dsz, "]"))
            # assemble with key-sorted field order, matching json.dumps(sort_keys=True)
            parts.sort(key=lambda p: p[0])
            diffs = []
            for i in range(len(dups)):
                fields = [f"{p[0]}{p[1][i]}{p[2]}{p[3][i]}{p[4]}" for p in parts]
                diffs.append("{" + ", ".join(fields) + "}")
        else:
            diffs = ["{}"] * len(dups)
        audit = pd.DataFrame(
            {
                "record": "audit",
                id_col: dups[id_col].to_numpy(),
                "version": np.int64(-1),
                "is_active": False,
                "action_taken": action,
                "original_id": keepers.to_numpy(),
                "metadata_diff": diffs,
            }
        )
        out = pd.concat([docs, audit], ignore_index=True)
        return out.astype({"version": "int64", "is_active": "bool"})

    return hash_partitioned_groups(hashed, ["text_sha256"], per_part, num_partitions=num_partitions)


def split_policy_output(unified: Dataset) -> tuple[Dataset, Dataset]:
    """(docs, audit) — note each side re-executes the upstream; materialize
    the unified stream first when both sides are consumed."""
    import pyarrow.compute as pc

    docs = unified.map_batches(
        lambda t: t.filter(pc.equal(t["record"], "doc")).drop_columns(
            ["record", "action_taken", "original_id", "metadata_diff"]
        ),
        batch_format="pyarrow",
    )
    audit = unified.map_batches(
        lambda t: t.filter(pc.equal(t["record"], "audit")).drop_columns(["record", "version", "is_active"]),
        batch_format="pyarrow",
    )
    return docs, audit
