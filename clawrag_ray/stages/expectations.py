"""Data-quality expectations over a Dataset — the schema/contract gate a
pipeline runs before committing a new corpus slice (the Great-Expectations
/ dbt-test surface, engine-native).

Scale shape: every scalar rule (not_null / min / max / allowed) folds into
ONE shared map-only pass emitting per-batch violation partials — a few
rows per block regardless of width — reduced by a tiny grouped sum.
Uniqueness is the only rule that shuffles: a two-level per-value count
(distinct-value-sized, the exact_dedup shape) reduced to
``total - distinct`` by a second tiny aggregate. The report is
rule-count-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def validate_expectations(ds: Dataset, rules: dict[str, dict]) -> Dataset:
    """Evaluate ``rules`` ({column: {not_null, unique, min, max,
    allowed}}) and return the report table (col, rule, n_violations,
    passed) — one row per (column, rule). min/max are inclusive bounds;
    ``allowed`` is a value whitelist; nulls only violate ``not_null``
    (bound/whitelist checks skip them, the SQL comparison convention)."""
    import ray.data as rd

    scalar_checks: list[tuple[str, str]] = []  # (col, rule) order for the report
    unique_cols: list[str] = []
    for col, spec in rules.items():
        for rule in spec:
            if rule == "unique":
                unique_cols.append(col)
            else:
                scalar_checks.append((col, rule))

    def partials(b: pa.Table) -> pa.Table:
        cols, rls, viol = [], [], []
        for col, rule in scalar_checks:
            arr = b[col]
            spec = rules[col][rule]
            if rule == "not_null":
                n = arr.null_count
            elif rule == "min":
                n = pc.sum(pc.less(arr, spec)).as_py() or 0
            elif rule == "max":
                n = pc.sum(pc.greater(arr, spec)).as_py() or 0
            elif rule == "allowed":
                n = pc.sum(pc.invert(pc.is_in(arr, value_set=pa.array(spec)))).as_py() or 0
            else:
                raise ValueError(f"unknown rule: {rule}")
            cols.append(col)
            rls.append(rule)
            viol.append(int(n))
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "rule": pa.array(rls, pa.string()),
                "v": pa.array(viol, pa.int64()),
            }
        )

    frames = []
    if scalar_checks:
        agg = (
            ds.map_batches(partials, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
            .groupby(["col", "rule"])
            .aggregate(Sum("v", alias_name="n_violations"))
            .to_pandas()
        )
        frames.append(agg)
    for col in unique_cols:
        from clawrag_ray.stages.relational import pre_aggregate

        # drop null keys MAP-SIDE (nulls-excluded semantics, matching SQL
        # count(col) - count(DISTINCT col)): a null group surviving into
        # pre_aggregate would ride Ray's sort-based groupby, which cannot
        # order NULL string keys against real ones (the same crash
        # temperature_sample documents) — so it must never reach the shuffle
        nonnull = ds.select_columns([col]).map_batches(
            lambda b, c=col: b.filter(pc.is_valid(b[c])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        counts = pre_aggregate(nonnull, [col], [], count_alias="c").materialize()
        row = counts.aggregate(Sum("c", alias_name="total"))
        # distinct = rows of the count table; total - distinct = dup rows.
        # Sum over an empty table is None (all-null column / empty input):
        # zero non-null values means zero duplicates, not a crash.
        total = row["total"] if row and row.get("total") is not None else 0
        n_dups = max(0, int(total) - counts.count())
        frames.append(
            pd.DataFrame({"col": [col], "rule": ["unique"], "n_violations": pd.array([n_dups], dtype="int64")})
        )
    report = pd.concat(frames, ignore_index=True)
    report["n_violations"] = report["n_violations"].astype("int64")
    report["passed"] = report["n_violations"] == 0
    return rd.from_pandas(report.sort_values(["col", "rule"]).reset_index(drop=True))
