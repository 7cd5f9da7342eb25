"""Property-based tests (hypothesis) over the frozen reference extractor
and chunker math — the conformance-depth the reference itself lacks
(SURVEY.md §5: no property tests exist upstream). Pure functions only, no
Ray session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from clawrag_ray.corpus import gen_doc
from clawrag_ray.reference.chunkers import char_window, n_char_window_chunks, separator_cascade
from clawrag_ray.reference.extractor import ExtractError, extract_document


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10**6), idx=st.integers(0, 500))
def test_extractor_deterministic_and_ordered(seed, idx):
    doc = gen_doc(seed, idx, mega_every=7, dup_every=3, mega_pages=20)
    try:
        spans_a = extract_document(doc["doc_kind"], doc["payload"], 1000, 200)
        spans_b = extract_document(doc["doc_kind"], doc["payload"], 1000, 200)
    except ExtractError:
        # error docs must error deterministically too
        try:
            extract_document(doc["doc_kind"], doc["payload"], 1000, 200)
            raise AssertionError("nondeterministic error behavior")
        except ExtractError:
            return
    assert spans_a == spans_b
    offsets = [s.offset for s in spans_a]
    # offsets are unique -> (kind, text, media_ref, order) is well-defined
    assert len(offsets) == len(set(offsets))
    for s in spans_a:
        assert s.kind and isinstance(s.offset, int) and s.offset >= 0


@settings(max_examples=60, deadline=None)
@given(
    text=st.text(min_size=0, max_size=3000),
    size=st.integers(10, 400),
    overlap_frac=st.floats(0.0, 0.9),
)
def test_char_window_covers_text_and_matches_closed_form(text, size, overlap_frac):
    overlap = int(size * overlap_frac)
    chunks = char_window(text, size, overlap)
    assert len(chunks) == n_char_window_chunks(len(text), size, overlap)
    if not text:
        assert chunks == []
        return
    # stitching chunks with overlap removed reproduces the text exactly
    rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
    assert rebuilt == text
    assert all(len(c) <= size for c in chunks)


@settings(max_examples=40, deadline=None)
@given(
    paras=st.lists(st.text(alphabet="ab c.\n", min_size=1, max_size=120), min_size=1, max_size=12),
    size=st.integers(20, 300),
)
def test_separator_cascade_loses_no_content(paras, size):
    text = "\n\n".join(paras)
    chunks = separator_cascade(text, size, 0)
    # with zero overlap, concatenation contains every original character in
    # order (separators are kept with their pieces)
    assert "".join(chunks) == text


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n=st.integers(1, 300),
    buckets=st.integers(1, 9),
    parts=st.integers(1, 6),
)
def test_global_prefix_sum_matches_pandas(seed, n, buckets, parts):
    """Distributed two-phase prefix sum == pandas cumsum for any id space,
    value distribution, bucket count, and partition layout."""
    import numpy as np
    import pandas as pd
    import ray.data

    from clawrag_ray.stages.curation import global_prefix_sum

    rng = np.random.default_rng(seed)
    ids = rng.choice(np.arange(-1000, 10**6), size=n, replace=False)
    vals = rng.integers(0, 500, size=n)
    ds = ray.data.from_pandas(pd.DataFrame({"id": ids, "v": vals})).repartition(parts)
    got = global_prefix_sum(ds, "id", "v", num_buckets=buckets).to_pandas().sort_values("id")
    order = np.argsort(ids)
    want = np.cumsum(vals[order]) - vals[order]
    assert got["cum_before"].to_numpy().tolist() == want.tolist()
