"""Text-analysis operators + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import ray.data

from clawrag_ray.functions.kernels import rolling_fingerprint
from clawrag_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioFeatures,
    frame_sample,
    image_feature_pipeline,
)
from clawrag_ray.stages.text_analysis import (
    add_fingerprint,
    add_quality_score,
    clause_amount_counts,
    detect_language,
    language_histogram,
    token_stats_by_lang,
)

EN = "the cat and the dog sat on the mat in the house with the mouse and that was that for the day"
DE = "der hund und die katze sind nicht mit der maus in einem haus und das ist eine gute sache für alle"
SHORT = "tiny"


def _docs():
    rows = [
        {"doc_id": 1, "text": EN, "lang": "en", "source": "s1"},
        {"doc_id": 2, "text": DE, "lang": "de", "source": "s1"},
        {"doc_id": 3, "text": SHORT, "lang": "en", "source": "s2"},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)


class TestTextAnalysis:
    def test_langid(self):
        df = detect_language(_docs()).to_pandas().set_index("doc_id")
        assert df.loc[1, "detected_lang"] == "en"
        assert df.loc[2, "detected_lang"] == "de"
        assert df.loc[3, "detected_lang"] == "unknown"  # < 50 chars

    def test_histogram(self):
        df = language_histogram(_docs()).to_pandas()
        hist = dict(zip(df["detected_lang"], df["n_docs"]))
        assert hist == {"en": 1, "de": 1, "unknown": 1}

    def test_quality_score(self):
        df = add_quality_score(_docs()).to_pandas().set_index("doc_id")
        assert df.loc[3, "quality_score"] == 0.0  # < 20 chars
        assert 0.0 < df.loc[1, "quality_score"] <= 1.0
        # known lang beats unknown at same length
        assert df.loc[1, "quality_score"] > 0.2

    def test_token_stats(self):
        df = token_stats_by_lang(_docs()).to_pandas().set_index("lang")
        assert df.loc["en", "total_tokens"] == len(EN.split()) + len(SHORT.split())
        assert df.loc["de", "total_tokens"] == len(DE.split())

    def test_clause_amounts(self):
        rows = [{"doc_id": 1, "text": "Section 1 says pay 1,234.56 EUR now. Clause 5 adds 999 $.", "source": "s"}]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        df = clause_amount_counts(ds).to_pandas()
        assert df["total_clauses"].iloc[0] == 2
        assert df["total_amounts"].iloc[0] == 2
        assert df["docs_with_amounts"].iloc[0] == 1

    def test_fingerprint_properties(self):
        assert rolling_fingerprint(EN) == rolling_fingerprint(EN)
        assert rolling_fingerprint(EN) != rolling_fingerprint(DE)
        # content-defined: prefixing only ADDS windows, so the min-window
        # fingerprint can only stay equal or decrease
        long_a = EN * 5
        assert rolling_fingerprint("PREFIX " + long_a) <= rolling_fingerprint(long_a)
        df = add_fingerprint(_docs()).to_pandas()
        assert df["fingerprint"].nunique() == 3


def _media_ds(n=10):
    rows = [
        {
            "media_id": f"m{i}",
            "media_kind": "image" if i % 2 == 0 else "audio",
            "payload": bytes([i]) * 100,
            "mime_type": "application/octet-stream",
            "width": -1,
            "height": -1,
            "duration_ms": 3500 * i,
        }
        for i in range(n)
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)).repartition(2)


class TestMultimodal:
    def test_schema_roundtrip(self):
        assert _media_ds().schema().names == MEDIA_SCHEMA.names

    def test_image_features_deterministic(self):
        df1 = image_feature_pipeline(_media_ds(), concurrency=1).to_pandas()
        df2 = image_feature_pipeline(_media_ds(), concurrency=1).to_pandas()
        assert len(df1) == 10
        assert df1.sort_values("media_id")["mean_intensity"].tolist() == df2.sort_values("media_id")[
            "mean_intensity"
        ].tolist()
        assert all(len(f) == 16 for f in df1["feature"])

    def test_audio_features(self):
        out = AudioFeatures()(_media_ds().take_batch(10, batch_format="pyarrow"))
        assert out.num_rows == 10
        assert all(0 <= v <= 1.5 for v in out["rms"].to_pylist())

    def test_frame_sample_explode(self):
        df = frame_sample(_media_ds(), every_ms=1000, concurrency=1).to_pandas()
        # media i has duration 3500*i -> max(1, 3500*i // 1000) frames
        counts = df.groupby("media_id").size()
        assert counts["m0"] == 1
        assert counts["m2"] == 7
        assert df[df["media_id"] == "m2"]["ts_ms"].max() == 6000


class TestModelPlugPoints:
    """model_path= constructor hooks: the deterministic stand-ins stay the
    default (oracle suite untouched); a user-supplied kernel file swaps in
    real models per actor."""

    def _write_plug(self, tmp_path, body: str) -> str:
        p = tmp_path / "plug_kernels.py"
        p.write_text(body)
        return str(p)

    def test_embedder_plug_and_standin(self, tmp_path, ray_session):
        import numpy as np

        from clawrag_ray.stages.embed import HashEmbedder

        path = self._write_plug(
            tmp_path,
            "import numpy as np\n"
            "def encode(texts):\n"
            "    return np.array([[float(len(t)), 1.0] for t in texts])\n",
        )
        plugged = HashEmbedder(model_path=path)
        got = plugged.encode(["ab", "abcd"])
        assert got.shape == (2, 2) and got[0, 0] == 2.0 and got[1, 0] == 4.0
        # stand-in unchanged by the hook's existence
        std = HashEmbedder(dim=8)
        assert np.allclose(std.encode(["x y"]), HashEmbedder(dim=8).encode(["x y"]))
        assert std._plug is None

    def test_image_plug_and_standin(self, tmp_path, ray_session):
        import numpy as np
        import pyarrow as pa

        from clawrag_ray.stages.multimodal import ImageFeatures

        path = self._write_plug(
            tmp_path,
            "def image_features(payload):\n"
            "    return [float(len(payload)), 0.5], float(len(payload)) / 2\n",
        )
        batch = pa.table({"media_id": ["m1"], "payload": [b"abcdef"]})
        got = ImageFeatures(model_path=path)(batch)
        assert got["feature"][0].as_py() == [6.0, 0.5]
        assert got["mean_intensity"][0].as_py() == 3.0
        std = ImageFeatures()(batch)
        again = ImageFeatures()(batch)
        assert std["feature"][0].as_py() == again["feature"][0].as_py()

    def test_audio_plug_and_standin(self, tmp_path, ray_session):
        import numpy as np
        import pyarrow as pa

        from clawrag_ray.stages.multimodal import AudioFeatures

        path = self._write_plug(
            tmp_path,
            "import numpy as np\n"
            "def decode_audio(payload, n_samples):\n"
            "    return np.ones(n_samples, dtype=np.float32)\n",
        )
        batch = pa.table({"media_id": ["a1"], "payload": [b"\x00\x01"]})
        got = AudioFeatures(n_samples=32, model_path=path)(batch)
        assert got["rms"][0].as_py() == 1.0 and got["zero_crossings"][0].as_py() == 0
        std = AudioFeatures(n_samples=32)(batch)
        again = AudioFeatures(n_samples=32)(batch)
        assert std["rms"][0].as_py() == again["rms"][0].as_py()


class TestRefineMarkdown:
    def test_rules_and_head_window(self, ray_session):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.text_analysis import refine_markdown

        text = "pad " * 10 + "exam-\nple\n\n\n\nA�B" + " tail-\nx�"
        head = len("pad " * 10 + "exam-\nple\n\n\n\nA�B")
        ds = ray.data.from_arrow(pa.table({"text": [text]}))
        got = refine_markdown(ds, head_chars=head).to_pandas()["refined"].iloc[0]
        # head rules applied; tail untouched (still hyphenated, still FFFD)
        assert "example" in got and "\n\n\n" not in got[:head]
        assert got.endswith(" tail-\nx�")
        assert "�" not in got[: len(got) - 10]

    def test_plug_mode(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.text_analysis import refine_markdown

        plug = tmp_path / "refine.py"
        plug.write_text("def refine_texts(texts):\n    return [t.upper() for t in texts]\n")
        ds = ray.data.from_arrow(pa.table({"text": ["abcdef"]}))
        got = refine_markdown(ds, head_chars=3, model_path=str(plug)).to_pandas()["refined"].iloc[0]
        assert got == "ABCdef"  # head refined by the plug, tail untouched


class TestJsonIntField:
    def test_extract_and_null_semantics(self):
        from clawrag_ray.functions.kernels import json_int_field

        col = pa.array(
            [
                '{"k": 69}',
                '{"a": 1, "k": -3}',
                '{"k": 7, "k2": 99}',
                '{"z": 5}',  # field absent -> NULL
                '{"k": "str"}',  # non-integer value -> NULL
                None,
            ]
        )
        got = json_int_field(col, "k").to_pylist()
        assert got == [69, -3, 7, None, None, None]

    def test_field_name_is_escaped(self):
        from clawrag_ray.functions.kernels import json_int_field

        col = pa.array(['{"a.b": 12}', '{"aXb": 34}'])
        # regex metacharacter in the field name must match literally
        assert json_int_field(col, "a.b").to_pylist() == [12, None]

    def test_matches_duckdb_json_extract(self):
        import duckdb

        from clawrag_ray.functions.kernels import json_int_field

        vals = ['{"k": %d}' % i for i in range(-5, 5)] + ['{"j": 1}']
        col = pa.array(vals)
        ours = json_int_field(col, "k").to_pylist()
        theirs = [
            r[0]
            for r in duckdb.connect()
            .execute(
                "SELECT CAST(json_extract(p, '$.k') AS BIGINT) FROM (SELECT unnest(?) AS p)",
                [vals],
            )
            .fetchall()
        ]
        assert ours == theirs


class TestQualityClassifier:
    def test_matches_brute_force(self, ray_session):
        import hashlib
        import re

        import numpy as np

        from clawrag_ray.stages.text_analysis import quality_classifier

        B = 1024

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        texts = [
            "The Quick brown fox JUMPS over the lazy dog",
            "alpha beta gamma  delta",
            "   ",  # zero tokens: excluded
            "solo",
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()), "text": texts})
        got = (
            quality_classifier(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [1, 2, 4]
        for _, row in got.iterrows():
            toks = re.findall(r"\S+", texts[int(row["doc_id"]) - 1].lower())
            ws = [h(f"w{h(tk) % B}") / 4294967296.0 * 2.0 - 1.0 for tk in toks]
            m = sum(ws) / len(ws)
            assert row["n_tokens"] == len(toks)
            assert abs(row["clf_margin"] - round(m, 6)) < 1e-12
            assert bool(row["keep"]) == (m >= 0.0)

    def test_model_path_plug(self, ray_session, tmp_path):
        from clawrag_ray.stages.text_analysis import quality_classifier

        p = tmp_path / "clf_plug.py"
        p.write_text(
            "import numpy as np\n"
            "def quality_weights(n_buckets):\n"
            "    return np.ones(n_buckets), -0.5\n"
        )
        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["two words"]})
        got = quality_classifier(ray.data.from_arrow(t), model_path=str(p)).to_pandas()
        # all-ones weights, bias -0.5: margin = 1 - 0.5 = 0.5, keep
        assert got["clf_margin"].iloc[0] == 0.5 and bool(got["keep"].iloc[0])


class TestTokenPmiPairs:
    def test_matches_brute_force(self, ray_session):
        import itertools
        import math
        import re
        from collections import Counter

        from clawrag_ray.stages.text_analysis import token_pmi_pairs

        texts = [
            "data engine data spark",
            "data engine flow",
            "data engine",
            "spark flow rare",
            "data spark engine",
        ]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
        got = (
            token_pmi_pairs(ray.data.from_arrow(t).repartition(2), min_count=2)
            .to_pandas()
            .sort_values(["tok_a", "tok_b"])
            .reset_index(drop=True)
        )
        # brute force
        sets = [set(re.findall(r"\S+", s.lower())) for s in texts]
        dfc = Counter(tok for s in sets for tok in s)
        freq = {tok for tok, c in dfc.items() if c >= 2}
        pc_ = Counter()
        for s in sets:
            for a, b in itertools.combinations(sorted(s & freq), 2):
                pc_[(a, b)] += 1
        want = {
            (a, b): (n, round(math.log(n * len(texts) / (dfc[a] * dfc[b])), 6))
            for (a, b), n in pc_.items()
            if n >= 2
        }
        assert {
            (r.tok_a, r.tok_b): (r.n_ab, r.pmi) for r in got.itertuples()
        } == want
        # "rare" (df=1) never participates
        assert not any("rare" in k for k in want)


class TestGopherQualityFilter:
    def test_each_rule_fires(self, ray_session):
        from clawrag_ray.stages.text_analysis import gopher_quality_filter

        good = "the quick brown fox jumps over lazy dogs " * 8  # 64 words, has 'the'
        too_short = "the quick fox"
        no_stopword = "alpha beta gamma delta " * 15
        bullets = "\n".join("- item here" for _ in range(20)) + "\n" + "the end of it all " * 10
        symbols = ("the word " + "# " * 30) * 3
        numeric = "the " + "12345 " * 60  # alpha fraction ~1/61
        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": [good, too_short, no_stopword, bullets, symbols, numeric],
            }
        )
        got = (
            gopher_quality_filter(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert bool(got.loc[0, "keep"]) is True
        assert bool(got.loc[1, "keep"]) is False  # < 50 words
        assert bool(got.loc[2, "keep"]) is False and got.loc[2, "n_stopwords"] == 0
        assert bool(got.loc[3, "keep"]) is False and got.loc[3, "bullet_frac"] > 0.9
        assert bool(got.loc[4, "keep"]) is False and got.loc[4, "symbol_ratio"] > 0.1
        assert bool(got.loc[5, "keep"]) is False and got.loc[5, "alpha_frac"] < 0.8
        assert got.loc[0, "n_words"] == 64


class TestC4Filter:
    def test_line_and_page_rules(self, ray_session):
        from clawrag_ray.stages.text_analysis import c4_filter

        good = (
            "this line has five words.\nshort one.\n"
            "another good line with punctuation!\nno punct line here at all\n"
            "last line keeps five words."
        )
        lorem = good + "\nsome lorem ipsum filler text."
        brace = good + "\ncode { block } line here."
        thin = "only one good sentence here."
        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": [good, lorem, brace, thin],
            }
        )
        got = (
            c4_filter(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.loc[0, "clean_text"] == (
            "this line has five words.\nanother good line with punctuation!\n"
            "last line keeps five words."
        )
        assert got.loc[0, "n_kept_lines"] == 3 and bool(got.loc[0, "keep"]) is True
        assert bool(got.loc[1, "keep"]) is False  # lorem ipsum page drop
        assert bool(got.loc[2, "keep"]) is False  # curly brace page drop
        assert bool(got.loc[3, "keep"]) is False and got.loc[3, "n_sentences"] == 1


class TestReadabilityScores:
    def test_known_values(self, ray_session):
        from clawrag_ray.stages.text_analysis import readability_scores

        # "the cat sat." -> 3 words, 1 sentence, 3 syllables (e/a/a)
        # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["the cat sat.", "zzz zzz"],  # doc 2: 0 syllables, 0 sentences
            }
        )
        got = readability_scores(ray.data.from_arrow(t)).to_pandas().set_index("doc_id")
        assert got.loc[1, "n_words"] == 3 and got.loc[1, "n_sentences"] == 1
        assert got.loc[1, "n_syllables"] == 3
        assert abs(got.loc[1, "flesch"] - 119.19) < 1e-9
        assert got.loc[2, "n_syllables"] == 0 and got.loc[2, "n_sentences"] == 0
        # min-1 guards: 206.835 - 1.015*2 - 84.6*0 = 204.805
        assert abs(got.loc[2, "flesch"] - 204.805) < 1e-9


class TestBlocklistFilter:
    def test_whole_word_hits_and_custom_terms(self, ray_session):
        from clawrag_ray.stages.text_analysis import blocklist_filter

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "clean words only here",
                    "the Spark engine sparked a sparkle",  # 1 whole-word hit only
                    "bad BAD bad",
                ],
            }
        )
        got = (
            blocklist_filter(ray.data.from_arrow(t), terms=("spark", "bad"))
            .to_pandas()
            .set_index("doc_id")
        )
        assert got.loc[1, "n_blocked"] == 0 and bool(got.loc[1, "keep"])
        assert got.loc[2, "n_blocked"] == 1 and not bool(got.loc[2, "keep"])
        assert got.loc[3, "n_blocked"] == 3


class TestGopherRepetitionFull:
    def test_engineered_fixture(self, ray_session):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.text_analysis import gopher_repetition_full

        dup_lines = "same line here\nsame line here\nunique one\nsame line here\n"
        loop_gram = ("buy now " * 30) + "totally distinct ending words"
        words = (
            "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
            "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
            "xray yankee zulu amber birch cedar dune ember frost grove harbor inlet"
        ).split()
        clean = "\n".join(
            " ".join(words[i * 4 : i * 4 + 4]) for i in range(8)
        )
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [dup_lines, loop_gram, clean],
            }
        )
        got = (
            gopher_repetition_full(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .set_index("doc_id")
        )
        # doc 1: 3 of 4 non-empty lines are duplicates (3/4 = .75)
        assert got.loc[1, "dup_line_frac"] == 0.75
        assert got.loc[1, "dup_line_char_frac"] > 0.7
        assert not got.loc[1, "keep"]
        # doc 2: 'buy now' dominates the 2-gram mass
        assert got.loc[2, "top_2gram_char_frac"] > 0.5
        assert not got.loc[2, "keep"]
        # doc 3: clean
        assert got.loc[3, "dup_line_frac"] == 0.0
        assert bool(got.loc[3, "keep"])

    def test_round6_away_boundary(self):
        from clawrag_ray.functions.kernels import round6_away

        # 18/256 * 1e6 = 70312.5 exactly: banker's rounding gives .070312,
        # the SQL convention gives .070313
        assert round6_away(18 / 256) == 0.070313
        assert round(18 / 256, 6) == 0.070312  # the divergence this guards

    def test_edge_docs(self, ray_session):
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.text_analysis import gopher_repetition_full

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["", "\n\n\n", "one"],
            }
        )
        got = (
            gopher_repetition_full(ray.data.from_arrow(t))
            .to_pandas()
            .set_index("doc_id")
        )
        for d in (1, 2, 3):
            assert got.loc[d, "dup_line_frac"] == 0.0
            assert got.loc[d, "top_2gram_char_frac"] == 0.0
            assert bool(got.loc[d, "keep"])
