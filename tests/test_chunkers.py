"""Chunking-math fixtures (FIXTURES.md §6)."""

import pytest

from clawrag_ray.reference.chunkers import (
    char_window,
    code_split,
    n_char_window_chunks,
    parent_child,
    row_based,
    separator_cascade,
)


class TestCharWindow:
    def test_empty(self):
        assert char_window("") == []

    def test_shorter_than_size(self):
        assert char_window("abc", 10, 2) == ["abc"]

    def test_exactly_size(self):
        assert char_window("a" * 10, 10, 2) == ["a" * 10]

    def test_window_math(self):
        text = "abcdefghij"  # 10 chars, size 4, overlap 1 -> step 3
        chunks = char_window(text, 4, 1)
        assert chunks == ["abcd", "defg", "ghij"]

    def test_loop_guard_tail(self):
        # end-of-text guard: last chunk may be shorter, never loops
        chunks = char_window("abcdefgh", 5, 2)
        assert chunks == ["abcde", "defgh"]
        assert "".join(c[: 5 - 2] for c in chunks[:-1]) + chunks[-1] == "abcdefgh"

    def test_overlap_ge_size_raises(self):
        with pytest.raises(ValueError):
            char_window("abc", 3, 3)

    @pytest.mark.parametrize("n", [0, 1, 999, 1000, 1001, 1800, 1801, 5000, 123_457])
    def test_closed_form_matches(self, n):
        assert n_char_window_chunks(n, 1000, 200) == len(char_window("x" * n, 1000, 200))


class TestSeparatorCascade:
    def test_short_passthrough(self):
        assert separator_cascade("hello world", 100, 10) == ["hello world"]

    def test_paragraph_split(self):
        text = "para one is here.\n\npara two is here.\n\npara three."
        chunks = separator_cascade(text, 25, 5)
        assert all(len(c) <= 25 or "\n\n" not in c for c in chunks)
        # first chunk starts at text start; overlap chains chunks
        assert chunks[0].startswith("para one")

    def test_tail_overlap(self):
        text = ("A" * 10 + "\n\n") * 5
        chunks = separator_cascade(text, 30, 6)
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt.startswith(prev[-6:])

    def test_content_coverage(self):
        # every input char appears in some chunk (no data loss)
        text = "one two three. four five six. seven eight nine. ten."
        chunks = separator_cascade(text, 20, 4)
        joined = "".join(chunks)
        for word in text.replace(".", "").split():
            assert word in joined

    def test_oversized_piece_recurses(self):
        text = "x" * 50 + "\n\n" + "y z " * 30
        chunks = separator_cascade(text, 20, 4)
        assert all(len(c) <= 24 for c in chunks)  # size + overlap slack

    def test_deterministic(self):
        text = "word " * 500
        assert separator_cascade(text) == separator_cascade(text)


class TestCodeSplit:
    def test_python_constructs(self):
        src = "import os\n\n\ndef alpha():\n    return 1\n\n\nclass Beta:\n    def meth(self):\n        pass\n"
        chunks = code_split(src, "python")
        kinds = [(c.type, c.name) for c in chunks]
        assert ("module", "") == kinds[0]
        assert ("function", "alpha") in kinds
        assert ("class", "Beta") in kinds
        # line ranges tile the file
        assert chunks[0].start_line == 1
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt.start_line == prev.end_line + 1

    def test_unknown_language_single_module(self):
        chunks = code_split("some text", "brainfuck")
        assert len(chunks) == 1 and chunks[0].type == "module"

    def test_go(self):
        src = "package main\n\nfunc Hello() {}\n\ntype Point struct{}\n"
        kinds = [(c.type, c.name) for c in code_split(src, "go")]
        assert ("function", "Hello") in kinds
        assert ("class", "Point") in kinds


class TestParentChild:
    def test_linkage_and_sizes(self):
        rows = parent_child("z" * 4500, 2000, 200, 20)
        parents = [r for r in rows if r["role"] == "parent"]
        children = [r for r in rows if r["role"] == "child"]
        assert len(parents) == 3  # 2000+2000+500
        assert {p["parent_idx"] for p in parents} == {0, 1, 2}
        assert all(len(p["text"]) <= 2000 for p in parents)
        assert all(len(c["text"]) <= 200 for c in children)
        for c in children:
            assert c["parent_idx"] in {0, 1, 2}

    def test_empty(self):
        assert parent_child("") == []


class TestRowBased:
    def test_header_replicated(self):
        text = "h1,h2\n" + "\n".join(f"a{i},b{i}" for i in range(120))
        chunks = row_based(text, rows_per_chunk=50)
        assert len(chunks) == 3
        assert all(c.startswith("h1,h2\n") for c in chunks)

    def test_empty(self):
        assert row_based("") == []


class TestChunkExplodeStages:
    """Dataset-level explode stages over the reference chunkers."""

    def _ds(self):
        import pyarrow as pa
        import ray.data

        code = "import os\n\n\ndef alpha():\n    return 1\n\n\nclass Beta:\n    pass\n"
        csvish = "h1,h2\n" + "\n".join(f"a{i},b{i}" for i in range(120))
        rows = [
            {"doc_id": 1, "text": code, "lang": "python"},
            {"doc_id": 2, "text": csvish, "lang": ""},
        ]
        return ray.data.from_arrow(pa.Table.from_pylist(rows))

    def test_row_based_method(self):
        from clawrag_ray.reference.chunkers import row_based
        from clawrag_ray.stages.chunk_ops import chunk_explode

        df = chunk_explode(self._ds(), size=50, overlap=0, method="row_based").to_pandas()
        per_doc = df.groupby("doc_id")["chunk_index"].count().to_dict()
        # 120 data lines / 50 per chunk -> 3 chunks; code doc lines -> ref fn
        csvish = "h1,h2\n" + "\n".join(f"a{i},b{i}" for i in range(120))
        assert per_doc[2] == len(row_based(csvish, 50))
        assert per_doc[2] == 3
        # header prepended to every chunk
        texts = df[df["doc_id"] == 2]["chunk_text"].tolist()
        assert all(t.startswith("h1,h2\n") for t in texts)

    def test_code_chunk_explode(self):
        from clawrag_ray.stages.chunk_ops import code_chunk_explode

        df = code_chunk_explode(self._ds(), lang_col="lang").to_pandas()
        d1 = df[df["doc_id"] == 1]
        assert list(d1["construct_type"]) == ["module", "function", "class"]
        assert list(d1["construct_name"]) == ["", "alpha", "Beta"]
        assert d1.iloc[1]["start_line"] == 4
        # unknown language -> single module chunk
        d2 = df[df["doc_id"] == 2]
        assert list(d2["construct_type"]) == ["module"]


class TestSemanticSplit:
    def _embed(self):
        from clawrag_ray.stages.embed import HashEmbedder

        return HashEmbedder(dim=32).encode

    def test_single_sentence_passthrough(self):
        from clawrag_ray.reference.chunkers import semantic_split

        assert semantic_split("One sentence only.", self._embed()) == ["One sentence only."]
        assert semantic_split("", self._embed()) == []

    def test_topic_shift_splits(self):
        from clawrag_ray.reference.chunkers import semantic_split

        text = (
            "The cat sat on the mat. The cat chased the mouse. The cat slept on the mat. "
            "Gradient descent optimizes neural networks. Backpropagation computes network gradients."
        )
        chunks = semantic_split(text, self._embed(), breakpoint_percentile=75.0)
        assert len(chunks) >= 2
        # the topic boundary lands between cat-sentences and ML-sentences
        assert any("cat" in c and "Gradient" not in c for c in chunks)
        assert any("Gradient" in c and "cat" not in c.lower() for c in chunks)
        # deterministic + lossless word coverage
        assert chunks == semantic_split(text, self._embed(), breakpoint_percentile=75.0)
        assert " ".join(chunks).split() == text.split()

    def test_semantic_explode_stage(self):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.chunk_ops import semantic_chunk_explode

        rows = [{"doc_id": 1, "text": "A b c. D e f. G h i."}, {"doc_id": 2, "text": "Short."}]
        df = semantic_chunk_explode(
            ray.data.from_arrow(pa.Table.from_pylist(rows)), concurrency=1
        ).to_pandas()
        assert set(df["doc_id"]) == {1, 2}
        assert (df[df["doc_id"] == 2]["chunk_index"] == 0).all()


class TestHashEmbedder:
    def test_deterministic_and_normalized(self):
        import numpy as np

        from clawrag_ray.stages.embed import HashEmbedder

        e = HashEmbedder(dim=16)
        a, b = e.embed_one("hello world"), e.embed_one("hello world")
        assert np.allclose(a, b) and abs(np.linalg.norm(a) - 1.0) < 1e-9
        assert not np.allclose(a, e.embed_one("different text entirely"))

    def test_embed_stage(self):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.embed import embed_texts

        ds = ray.data.from_arrow(pa.table({"doc_id": [1, 2], "text": ["a b", "c d"]}))
        df = embed_texts(ds, dim=8, concurrency=1).to_pandas()
        assert all(len(v) == 8 for v in df["embedding"])


class TestSemanticOracleParity:
    def test_semantic_chunks_sql_matches_engine_on_edge_texts(self, ray_session):
        """The DuckDB oracle replays split_sentences + HashEmbedder + the
        canonical cosine; pin parity on texts the sf corpus may not cover:
        blank-line splits, punctuation runs, single sentences, repeated
        sentences (duplicate distances -> percentile ties)."""
        import duckdb
        import pandas as pd
        import ray

        import __ray_entry__ as entry
        from clawrag_ray.stages.chunk_ops import semantic_chunk_explode

        texts = [
            "One sentence only.",
            "Alpha beta gamma. Alpha beta gamma. Alpha beta gamma. Alpha beta gamma.",
            "First topic here. More of the first!   Then a question?\n\nNew paragraph topic. "
            "Totally different words now. zebra quark lattice.",
            "No terminal punctuation at all just words",
            "A. B. C. D. E. F. G. H.",
            "Ends abruptly.\n\n\n\nAfter many blank lines. Yes!",
        ]
        docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        ours = (
            semantic_chunk_explode(ray.data.from_pandas(docs), concurrency=1)
            .select_columns(["doc_id", "chunk_index", "chunk_len"])
            .to_pandas()
            .sort_values(["doc_id", "chunk_index"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs)
        oracle = (
            con.execute(entry.oracle_sql()["semantic_chunks"])
            .df()
            .sort_values(["doc_id", "chunk_index"])
            .reset_index(drop=True)
        )
        assert len(ours) == len(oracle)
        assert list(ours["chunk_len"].astype(int)) == list(oracle["chunk_len"].astype(int))
        assert list(ours["chunk_index"].astype(int)) == list(oracle["chunk_index"].astype(int))
