"""Declarative step-pipeline registry (SURVEY.md §2.10 rebuild mapping):
pipelines declared as ``[("clean_text", {}), ("chunk", {"size": 512}), ...]``
compile to a chain of map_batches/explode stages.

The reference's string-dispatched pre/post steps live in
backend/src/services/ingest_v2/pipeline.py:70-101 (clean_text,
extract_clauses, extract_amounts, validate_clauses, validate_amounts);
this registry reimplements them vectorized and is user-extensible via
``register_step``.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from clawrag_ray.functions.kernels import WS_RUN_RE
from clawrag_ray.stages.text_analysis import AMOUNT_RE2, CLAUSE_RE2

StepFn = Callable[[Dataset, dict], Dataset]

_REGISTRY: dict[str, StepFn] = {}


def register_step(name: str) -> Callable[[StepFn], StepFn]:
    def deco(fn: StepFn) -> StepFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def available_steps() -> list[str]:
    return sorted(_REGISTRY)


def compile_pipeline(steps: list[tuple[str, dict]]) -> Callable[[Dataset], Dataset]:
    """[(step_name, params), ...] -> Dataset transform. Unknown step names
    raise at compile time, not mid-run."""
    missing = [name for name, _ in steps if name not in _REGISTRY]
    if missing:
        raise KeyError(f"unknown steps {missing}; available: {available_steps()}")

    def run(ds: Dataset) -> Dataset:
        for name, params in steps:
            ds = _REGISTRY[name](ds, params)
        return ds

    return run


@register_step("clean_text")
def _clean_text(ds: Dataset, params: dict) -> Dataset:
    col = params.get("col", "text")

    def fn(batch: pa.Table) -> pa.Table:
        cleaned = pc.utf8_trim_whitespace(pc.replace_substring_regex(batch[col], WS_RUN_RE, " "))
        return batch.set_column(batch.schema.get_field_index(col), col, cleaned)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


@register_step("extract_clauses")
def _extract_clauses(ds: Dataset, params: dict) -> Dataset:
    col = params.get("col", "text")

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("n_clauses", pc.count_substring_regex(batch[col], CLAUSE_RE2))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


@register_step("extract_amounts")
def _extract_amounts(ds: Dataset, params: dict) -> Dataset:
    col = params.get("col", "text")

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("n_amounts", pc.count_substring_regex(batch[col], AMOUNT_RE2))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


@register_step("validate_clauses")
def _validate_clauses(ds: Dataset, params: dict) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("clause_validation_passed", pc.greater(batch["n_clauses"], 0))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


@register_step("validate_amounts")
def _validate_amounts(ds: Dataset, params: dict) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("amount_validation_passed", pc.greater(batch["n_amounts"], 0))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


@register_step("preserve_syntax")
def _preserve_syntax(ds: Dataset, params: dict) -> Dataset:
    """Parity no-op: the reference's preserve_syntax step
    (ingest_v2/pipeline.py:70-101) only flags downstream chunking to use the
    code splitter; here the flag is a column the chunk step reads."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("preserve_syntax", pa.array([True] * batch.num_rows, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


@register_step("chunk")
def _chunk(ds: Dataset, params: dict) -> Dataset:
    from clawrag_ray.stages.chunk_ops import chunk_explode

    return chunk_explode(
        ds,
        size=params.get("size", 1000),
        overlap=params.get("overlap", 200),
        method=params.get("method", "char_window"),
        id_col=params.get("id_col", "doc_id"),
        text_col=params.get("col", "text"),
    )


@register_step("quality_score")
def _quality(ds: Dataset, params: dict) -> Dataset:
    from clawrag_ray.stages.text_analysis import add_quality_score

    return add_quality_score(ds, text_col=params.get("col", "text"))


@register_step("fingerprint")
def _fingerprint(ds: Dataset, params: dict) -> Dataset:
    from clawrag_ray.stages.text_analysis import add_fingerprint

    return add_fingerprint(ds, text_col=params.get("col", "text"), window=params.get("window", 64))


@register_step("filter_min_length")
def _filter_min_length(ds: Dataset, params: dict) -> Dataset:
    col, n = params.get("col", "text"), params.get("min_chars", 20)

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(pc.utf8_length(batch[col]), n))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
