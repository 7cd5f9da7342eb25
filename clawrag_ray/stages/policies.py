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

Implemented as one groupby(text_hash) pass emitting BOTH streams in a
single output table discriminated by a ``record`` column ("doc" | "audit"),
so the shuffle runs once; callers split with split_policy_output().
"""

from __future__ import annotations

import json

import pandas as pd
from ray.data import Dataset

from clawrag_ray.stages.dedup import with_text_hash

POLICIES = ("SKIP", "VERSION", "REPLACE_IF_NEWER", "NOTIFY_ONLY")


def apply_dedup_policy(
    ds: Dataset,
    policy: str = "SKIP",
    id_col: str = "doc_id",
    text_col: str = "text",
    mtime_col: str | None = None,
    size_col: str | None = None,
) -> Dataset:
    """Returns a unified stream: rows with record="doc" are surviving
    documents (plus version/is_active for VERSION); rows with
    record="audit" are DuplicationAuditLog entries."""
    if policy not in POLICIES:
        raise ValueError(f"unknown policy {policy}; expected one of {POLICIES}")
    cols = [id_col, text_col] + [c for c in (mtime_col, size_col) if c]
    hashed = with_text_hash(ds.select_columns(cols), text_col)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        n = len(g)
        out_rows = []

        def doc_row(r, version=1, is_active=True):
            out_rows.append(
                {
                    "record": "doc",
                    id_col: r[id_col],
                    "version": version,
                    "is_active": is_active,
                    "action_taken": "",
                    "original_id": r[id_col],
                    "metadata_diff": "",
                }
            )

        def audit_row(keeper, dup, action):
            diff = {}
            if mtime_col:
                diff[mtime_col] = [str(keeper[mtime_col]), str(dup[mtime_col])]
            if size_col:
                diff[size_col] = [int(keeper[size_col]), int(dup[size_col])]
            out_rows.append(
                {
                    "record": "audit",
                    id_col: dup[id_col],
                    "version": -1,
                    "is_active": False,
                    "action_taken": action,
                    "original_id": keeper[id_col],
                    "metadata_diff": json.dumps(diff, sort_keys=True),
                }
            )

        if n == 1:
            doc_row(g.iloc[0])
        elif policy == "SKIP":
            doc_row(g.iloc[0])
            for i in range(1, n):
                audit_row(g.iloc[0], g.iloc[i], "SKIPPED")
        elif policy == "VERSION":
            for i in range(n):
                doc_row(g.iloc[i], version=i + 1, is_active=(i == n - 1))
                if i > 0:
                    audit_row(g.iloc[0], g.iloc[i], "VERSIONED")
        elif policy == "REPLACE_IF_NEWER":
            if mtime_col:
                order = g.sort_values(
                    [mtime_col] + ([size_col] if size_col else []) + [id_col],
                    ascending=[False] + ([False] if size_col else []) + [True],
                )
            elif size_col:
                order = g.sort_values([size_col, id_col], ascending=[False, True])
            else:
                order = g
            keeper = order.iloc[0]
            doc_row(keeper)
            for i in range(1, n):
                audit_row(keeper, order.iloc[i], "REPLACED")
        else:  # NOTIFY_ONLY
            for i in range(n):
                doc_row(g.iloc[i])
                if i > 0:
                    audit_row(g.iloc[0], g.iloc[i], "NOTIFIED")
        return pd.DataFrame(out_rows)

    return hashed.groupby("text_sha256").map_groups(per_group, batch_format="pandas")


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
