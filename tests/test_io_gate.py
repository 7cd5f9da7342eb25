"""Lance/parquet storage gate (BASELINE input_hint names a Lance table;
this container may not ship the lance package). Exactly one of these two
tests runs in any environment, so the gated branch taken is always the one
exercised — the Lance branch stops being dead code the moment the package
appears."""

import importlib.util
import shutil

import pyarrow as pa
import pytest
import ray.data

from clawrag_ray.pipelines.extraction import read_corpus, write_spans

HAVE_LANCE = importlib.util.find_spec("lance") is not None


def _tiny_spans_ds():
    rows = [
        {"doc_id": "d1", "doc_kind": "text", "route": "fast", "error_code": "", "n_spans": 1},
        {"doc_id": "d2", "doc_kind": "text", "route": "fast", "error_code": "", "n_spans": 2},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


@pytest.mark.skipif(not HAVE_LANCE, reason="lance package not installed")
def test_lance_roundtrip(tmp_path):
    out = str(tmp_path / "spans_lance")
    write_spans(_tiny_spans_ds(), out)
    back = read_corpus(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == ["d1", "d2"]


@pytest.mark.skipif(HAVE_LANCE, reason="lance present: parquet fallback not taken")
def test_parquet_fallback_when_lance_absent(tmp_path):
    out = str(tmp_path / "spans_pq")
    write_spans(_tiny_spans_ds(), out)
    import glob

    files = glob.glob(out + "/*.parquet")
    assert files, "fallback must write parquet files"
    back = read_corpus(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == ["d1", "d2"]
    shutil.rmtree(out, ignore_errors=True)
