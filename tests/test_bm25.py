"""BM25 build/scoring vs an independent single-process reference."""

import math

import pyarrow as pa
import ray.data

from clawrag_ray.stages.bm25 import (
    bm25_idf_table,
    bm25_score_reference,
    bm25_tokenize,
    bm25_topk,
)

CORPUS = [
    "The contract under § 230 pays 250 EUR per month",
    "section 230 is unrelated to §17 entirely",
    "spark merge window value spark spark",
    "merge merge merge window",
    "completely unrelated words here",
    "",
]


def _ds():
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


class TestTokenizer:
    def test_section_rules(self):
        # '§ 230' -> '§230' + bare number; digits of multi-digit numbers
        toks = bm25_tokenize("Pay § 230 and 250 EUR")
        assert "§230" in toks and "230" in toks
        assert "250" in toks
        # digits of 250: '2','5' ('0' skipped)
        assert "2" in toks and "5" in toks and "0" not in toks

    def test_lowercase_and_word_runs(self):
        assert bm25_tokenize("Hello WORLD_x") == ["hello", "world_x"]

    def test_single_digit_not_expanded(self):
        assert bm25_tokenize("7") == ["7"]


class TestIdf:
    def test_matches_reference_math(self):
        idf = bm25_idf_table(_ds())
        n = len(CORPUS)
        df = {}
        for t in CORPUS:
            for tok in set(bm25_tokenize(t)):
                df[tok] = df.get(tok, 0) + 1
        raw = {t: math.log(n - d + 0.5) - math.log(d + 0.5) for t, d in df.items()}
        eps = 0.25 * sum(raw.values()) / len(raw)
        want = {t: (eps if v < 0 else v) for t, v in raw.items()}
        got = dict(zip(idf["token"], idf["idf"]))
        assert set(got) == set(want)
        for t in want:
            assert abs(got[t] - want[t]) < 1e-5, t
        got_df = dict(zip(idf["token"], idf["df"]))
        assert got_df == df

    def test_negative_idf_floored(self):
        # a token in most docs goes negative and is replaced by
        # eps = 0.25 * avg(raw idf) — which rank_bm25 allows to be negative
        # itself; the invariant is exact equality with that floor value
        rows = [{"doc_id": i, "text": "common word"} for i in range(9)] + [
            {"doc_id": 9, "text": "rare"}
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        idf = bm25_idf_table(ds)
        common = float(idf.loc[idf["token"] == "common", "idf"].iloc[0])
        rare = float(idf.loc[idf["token"] == "rare", "idf"].iloc[0])
        raw_common = math.log(10 - 9 + 0.5) - math.log(9 + 0.5)
        raw_rare = math.log(10 - 1 + 0.5) - math.log(1 + 0.5)
        eps = 0.25 * (2 * raw_common + raw_rare) / 3
        assert abs(rare - raw_rare) < 1e-5
        assert abs(common - eps) < 1e-5  # floored, not raw
        assert common > raw_common


class TestTopK:
    def test_scores_match_reference(self):
        got = bm25_topk(_ds(), "spark merge window", k=6)
        ref = bm25_score_reference(CORPUS, "spark merge window")
        ranked = sorted(range(len(CORPUS)), key=lambda i: (-round(ref[i], 6), i))
        assert got["doc_id"].tolist() == ranked
        for doc_id, score in zip(got["doc_id"], got["score"]):
            assert abs(score - ref[doc_id]) < 1e-5

    def test_query_with_section_token(self):
        got = bm25_topk(_ds(), "§ 230", k=2)
        # docs 0 and 1 both contain '230'; doc 0 also matches '§230'
        assert got["doc_id"].iloc[0] == 0
        assert set(got["doc_id"]) == {0, 1}


class TestInvertedIndex:
    def test_postings_sorted_and_complete(self, ray_session):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.bm25 import inverted_index

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [3, 1, 2],
                    "text": ["alpha beta", "beta gamma beta", "alpha"],
                }
            )
        ).repartition(3)
        got = inverted_index(docs).to_pandas().set_index("token")
        assert got.loc["alpha", "postings"] == "2,3" and got.loc["alpha", "df"] == 2
        assert got.loc["beta", "postings"] == "1,3"  # tf>1 still one posting
        assert got.loc["gamma", "postings"] == "1" and got.loc["gamma", "df"] == 1


class TestTfIdfTopK:
    def test_matches_local_ltc_cosine(self, ray_session):
        import math

        import numpy as np
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.bm25 import tfidf_topk

        docs = [
            (1, "spark merge window value spark"),
            (2, "merge value value other words here"),
            (3, "completely unrelated text body"),
            (4, "window window window spark"),
        ]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": [d[0] for d in docs], "text": [d[1] for d in docs]})
        ).repartition(2)
        got = tfidf_topk(ds, "spark merge window value", k=3)
        # local replay
        tf = {d: {} for d, _ in docs}
        for d, t in docs:
            for w in t.split():
                tf[d][w] = tf[d].get(w, 0) + 1
        df = {}
        for d, _ in docs:
            for w in tf[d]:
                df[w] = df.get(w, 0) + 1
        n = len(docs)
        idf = {w: math.log(n / c) for w, c in df.items()}
        q = ["merge", "spark", "value", "window"]
        qw = {w: idf[w] for w in q if w in idf}
        qn = math.sqrt(sum(v * v for v in qw.values()))
        want = []
        for d, _ in docs:
            comp = {w: (1 + math.log(c)) * idf[w] for w, c in tf[d].items()}
            nrm = math.sqrt(sum(v * v for v in comp.values()))
            dot = sum(comp.get(w, 0.0) * qw[w] for w in qw)
            if dot > 0:
                want.append((d, round(dot / (nrm * qn), 6)))
        want.sort(key=lambda x: (-x[1], x[0]))
        got_pairs = list(zip(got["doc_id"], got["score"]))
        assert got_pairs == want[:3]


class TestRerankTopK:
    def test_standin_cosine_and_plug(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.embed import HashEmbedder
        from clawrag_ray.stages.retrieval import rerank_topk

        docs = [
            (1, "spark merge window value"),
            (2, "value value value other"),
            (3, "nothing shared at all"),
        ]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": [d[0] for d in docs], "text": [d[1] for d in docs]})
        ).repartition(2)
        got = rerank_topk(ds, [1, 2, 3], "spark merge window value", k=3)
        emb = HashEmbedder()
        q = emb.embed_raw("spark merge window value")
        want = []
        for d, t in docs:
            v = emb.embed_raw(t)
            dn, qn = np.linalg.norm(v), np.linalg.norm(q)
            want.append((d, round(float(v @ q) / (dn * qn) if dn and qn else 0.0, 6)))
        want.sort(key=lambda x: (-x[1], x[0]))
        assert list(zip(got["doc_id"], got["rerank_score"])) == want
        assert got["doc_id"].iloc[0] == 1  # exact query text ranks first

        plug = tmp_path / "ce.py"
        plug.write_text(
            "def rerank_scores(query, texts):\n"
            "    return [float(len(t)) for t in texts]\n"
        )
        got2 = rerank_topk(ds, [1, 2, 3], "q", k=1, model_path=str(plug))
        assert got2["doc_id"].iloc[0] == 1 and got2["rerank_score"].iloc[0] == float(
            len("spark merge window value")
        )
