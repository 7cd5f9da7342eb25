"""The correctness gate: Ray pipeline output == frozen reference extractor,
span-sequence equality (kind, text, media_ref, order) per doc_id
(BASELINE.json north_rule), over the deterministic synthetic corpus with
multi-partition inputs so ordering must survive parallelism."""

import pyarrow as pa
import pytest
import ray.data

from clawrag_ray.corpus import corpus_table, gen_docs
from clawrag_ray.pipelines.extraction import extract_spans
from clawrag_ray.reference.extractor import ExtractError, extract_document
from clawrag_ray.schema import RAW_DOC_SCHEMA

N_DOCS = 120
SEED = 42
# small mega threshold exercised via small mega docs: corpus mega docs get
# 40 pages (> MEGA_PAGE_THRESHOLD=16) so the explode path runs in tests
CORPUS_KW = dict(mega_every=25, mega_pages=40, dup_every=11)


def reference_results(docs):
    """doc_id -> (error_code, [(kind, text, media_ref), ...] in offset order)."""
    out = {}
    for d in docs:
        try:
            spans = extract_document(d["doc_kind"], d["payload"])
            out[d["doc_id"]] = ("", [(s.kind, s.text, s.media_ref) for s in spans])
        except ExtractError as e:
            out[d["doc_id"]] = (e.code, [])
    return out


@pytest.fixture(scope="module")
def pipeline_result():
    table = corpus_table(SEED, N_DOCS, **CORPUS_KW)
    raw = ray.data.from_arrow(table).repartition(8)  # force multi-block input
    # concurrency=1 per pool: the test session has only 4 CPUs and two actor
    # pools; larger minimum pools would starve the shuffle/assemble tasks
    result = extract_spans(raw, concurrency=1, batch_size=16).to_pandas()
    return result


@pytest.fixture(scope="module")
def expected():
    return reference_results(gen_docs(SEED, 0, N_DOCS, **CORPUS_KW))


def test_every_doc_present_exactly_once(pipeline_result, expected):
    got_ids = list(pipeline_result["doc_id"])
    assert len(got_ids) == len(set(got_ids)), "duplicate doc_id rows"
    assert set(got_ids) == set(expected.keys())


def test_span_sequence_equality(pipeline_result, expected):
    mismatches = []
    for _, row in pipeline_result.iterrows():
        err, ref_spans = expected[row["doc_id"]]
        got = [(s["kind"], s["text"], s["media_ref"]) for s in sorted(row["spans"], key=lambda s: s["offset"])]
        if got != ref_spans:
            mismatches.append(row["doc_id"])
    assert not mismatches, f"{len(mismatches)} docs mismatch: {mismatches[:5]}"


def test_error_rows(pipeline_result, expected):
    for _, row in pipeline_result.iterrows():
        err, _ = expected[row["doc_id"]]
        assert row["error_code"] == err, (row["doc_id"], row["error_code"], err)
        if err:
            assert len(row["spans"]) == 0


def test_mega_docs_took_explode_path(pipeline_result, expected):
    # corpus guarantees mega docs exist; their spans must still be complete
    megas = [d for d in gen_docs(SEED, 0, N_DOCS, **CORPUS_KW) if d["n_pages"] > 16]
    assert megas, "fixture should contain mega docs"
    by_id = pipeline_result.set_index("doc_id")
    for d in megas:
        _, ref_spans = expected[d["doc_id"]]
        assert int(by_id.loc[d["doc_id"], "n_spans"]) == len(ref_spans)


def test_routes_recorded(pipeline_result):
    routes = set(pipeline_result["route"])
    assert routes <= {"fast", "heavy", "error"}
    assert "fast" in routes


def test_offsets_strictly_increasing(pipeline_result):
    for spans in pipeline_result["spans"]:
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(offs) == len(set(offs))


def test_nested_schema(pipeline_result):
    # arrow schema of the spans column survives the round trip
    table = pa.Table.from_pandas(pipeline_result[["doc_id"]])
    assert table.num_rows == len(pipeline_result)
    assert set(pipeline_result.columns) == {"doc_id", "doc_kind", "route", "error_code", "n_spans", "spans"}


def test_raw_schema_matches_contract():
    t = corpus_table(SEED, 5)
    assert t.schema.equals(RAW_DOC_SCHEMA)


def test_dedup_parse_variant_matches_base():
    """extract_spans_dedup (parse once per distinct payload, fan out via
    union+groupby) must emit exactly the same (doc_id -> spans) set as the
    base pipeline on a heavily-duplicated corpus."""
    import ray.data

    from clawrag_ray.corpus import corpus_table
    from clawrag_ray.pipelines.extraction import extract_spans, extract_spans_dedup

    tbl = corpus_table(11, 200, dup_every=4)

    def canon(df):
        return {
            r.doc_id: (
                r.error_code,
                tuple((s["kind"], s["text"], s["media_ref"]) for s in sorted(r.spans, key=lambda s: s["offset"])),
            )
            for r in df.itertuples(index=False)
        }

    base = canon(extract_spans(ray.data.from_arrow(tbl).repartition(4), concurrency=1, batch_size=32).to_pandas())
    dedup = canon(
        extract_spans_dedup(ray.data.from_arrow(tbl).repartition(4), concurrency=1, batch_size=32).to_pandas()
    )
    assert base == dedup and len(base) == 200
