"""Tests for training-data curation ops (stages/curation.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from clawrag_ray.stages.curation import (
    global_prefix_sum,
    pack_sequences,
    pii_scrub,
    quota_sample,
    synthesize_pii,
    token_count_table,
)


class TestPrefixSumAndPacking:
    def test_prefix_sum_matches_numpy_any_layout(self):
        ids = np.arange(200)
        vals = (ids * 7) % 13 + 1
        want = np.cumsum(vals) - vals  # exclusive prefix in id order
        for parts in (1, 3, 8):
            ds = ray.data.from_pandas(pd.DataFrame({"id": ids[::-1], "v": vals[::-1]})).repartition(parts)
            got = global_prefix_sum(ds, "id", "v", num_buckets=5).to_pandas().sort_values("id")
            assert got["cum_before"].to_numpy().tolist() == want.tolist()

    def test_prefix_sum_sparse_nonzero_ids(self):
        # ids far from 0 and non-dense: range bucketing must still be exact
        ids = np.array([1000, 1007, 5000, 5001, 99999])
        vals = np.array([3, 4, 5, 6, 7])
        ds = ray.data.from_pandas(pd.DataFrame({"id": ids, "v": vals})).repartition(3)
        got = global_prefix_sum(ds, "id", "v", num_buckets=4).to_pandas().sort_values("id")
        assert got["cum_before"].tolist() == [0, 3, 7, 12, 18]

    def test_sampled_boundaries_match_range_on_skewed_ids(self):
        # 95% of ids clustered in [0, 100), the rest flung to 10^9: range
        # bucketing piles everything into bucket 0; sampled quantiles
        # balance it — and the RESULT must be identical either way
        rng = np.random.RandomState(31)
        ids = np.unique(
            np.concatenate([rng.randint(0, 100, 190), rng.randint(1_000_000_000, 2_000_000_000, 10)])
        )
        vals = (ids % 11 + 1).astype("int64")
        df = pd.DataFrame({"id": ids, "v": vals})
        want = df.sort_values("id")
        want = dict(zip(want["id"], np.cumsum(want["v"]) - want["v"]))
        for mode in ("range", "sampled"):
            ds = ray.data.from_pandas(df.sample(frac=1, random_state=1)).repartition(4)
            got = global_prefix_sum(ds, "id", "v", num_buckets=8, boundaries=mode).to_pandas()
            assert dict(zip(got["id"], got["cum_before"])) == want

    def test_pack_sequences_bins(self):
        # budget 10: docs of 4,4,4 tokens -> third doc straddles bins 0/1
        ds = ray.data.from_pandas(pd.DataFrame({"id": [1, 2, 3, 4], "n": [4, 4, 4, 0]}))
        out = pack_sequences(ds, "id", "n", budget=10).to_pandas().sort_values("id")
        assert out["start_bin"].tolist() == [0, 0, 0, 1]
        assert out["end_bin"].tolist() == [0, 0, 1, 1]  # doc3 spans tokens 8..11

    def test_token_count_table(self):
        ds = ray.data.from_arrow(pa.table({"doc_id": [1, 2], "text": ["a b  c", ""]}))
        out = token_count_table(ds).to_pandas().sort_values("doc_id")
        assert out["n_tokens"].tolist() == [3, 0]


class TestQuotaSample:
    def test_cap_and_determinism(self):
        df = pd.DataFrame({"doc_id": range(100), "lang": ["en"] * 90 + ["de"] * 10})
        ds = ray.data.from_pandas(df).repartition(4)
        out = quota_sample(ds, ["lang"], cap=5).to_pandas()
        sizes = out.groupby("lang").size()
        assert sizes["en"] == 5 and sizes["de"] == 5
        # deterministic across layouts
        out2 = quota_sample(ds.repartition(7), ["lang"], cap=5).to_pandas()
        assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
        # salted two-phase equals single-phase (selection is split-invariant)
        out3 = quota_sample(ds, ["lang"], cap=5, salt=4).to_pandas()
        assert sorted(out["doc_id"]) == sorted(out3["doc_id"])

    def test_small_stratum_kept_whole(self):
        df = pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["zh"] * 3})
        out = quota_sample(ray.data.from_pandas(df), ["lang"], cap=10).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2, 3]


class TestPiiScrub:
    def test_redaction_and_counts(self):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "mail a.b+c@foo.org from 192.168.0.1 call +1 555-0199 ok",
                        "clean text no pii 1.2 here",
                    ],
                }
            )
        )
        out = pii_scrub(ds).to_pandas().sort_values("doc_id")
        assert out["clean_text"].tolist()[0] == "mail [EMAIL] from [IP] call [PHONE] ok"
        assert out[["n_emails", "n_ips", "n_phones"]].values.tolist() == [[1, 1, 1], [0, 0, 0]]
        assert out["clean_text"].tolist()[1] == "clean text no pii 1.2 here"

    def test_synthesize_then_scrub_counts_everything(self):
        ds = ray.data.from_arrow(pa.table({"doc_id": [0, 6, 300], "text": ["x", "y", "z"]}))
        out = pii_scrub(synthesize_pii(ds)).to_pandas()
        assert (out["n_emails"] == 1).all() and (out["n_phones"] == 1).all()
        # the synthesized host plus any ip-like text: host is always present
        assert (out["n_ips"] >= 1).all()
        assert out["clean_text"].str.contains(r"\[EMAIL\]").all()


class TestRepetitionFilter:
    def test_known_values_and_edges(self):
        from clawrag_ray.stages.text_analysis import repetition_metrics

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        "a a a a b",  # top 4/5, 2-grams: aa,aa,aa,ab -> dup 2/4
                        "w x y z",  # all distinct
                        "solo",  # one token: no 2-grams
                        "",  # empty
                    ],
                }
            )
        )
        out = repetition_metrics(ds).to_pandas().sort_values("doc_id")
        assert out["top_token_frac"].tolist() == [0.8, 0.25, 1.0, 0.0]
        assert out["dup_2gram_frac"].tolist() == [0.5, 0.0, 0.0, 0.0]
        assert out["keep"].tolist() == [False, False, False, True]


class TestWeightedFuse:
    def test_known_values(self):
        from clawrag_ray.stages.retrieval import weighted_fuse

        l1 = pd.DataFrame({"doc_id": [1, 2, 3], "score": [10.0, 5.0, 0.0]})
        l2 = pd.DataFrame({"doc_id": [3, 4], "score": [2.0, 2.0]})  # constant -> all 1.0
        out = weighted_fuse([l1, l2], [0.7, 0.3])
        got = dict(zip(out["doc_id"], out["fused_score"]))
        assert got == {1: 0.7, 2: 0.35, 3: 0.3, 4: 0.3}
        assert list(out["doc_id"]) == [1, 2, 3, 4]  # score desc, id tiebreak


class TestDecontaminate:
    def test_planted_overlap(self):
        from clawrag_ray.stages.curation import decontaminate

        train = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "alpha beta gamma delta epsilon zeta eta theta iota",  # shares 8-gram w/ eval
                        "one two three four five six seven",  # <8 words, whole-text shingle, no match
                        "p q r s t u v w x y z",  # no overlap
                    ],
                }
            )
        )
        ev = ray.data.from_arrow(
            pa.table({"doc_id": [99], "text": ["alpha beta gamma delta epsilon zeta eta theta"]})
        )
        out = decontaminate(train, ev, shingle_k=8).to_pandas().sort_values("doc_id")
        assert out["contaminated"].tolist() == [True, False, False]
        assert out["n_shingles"].tolist() == [2, 1, 4]
        assert out["n_contaminated"].tolist() == [1, 0, 0]
        assert out["contamination_frac"].tolist() == [0.5, 0.0, 0.0]


class TestFusionTopBoundary:
    def test_top_zero_returns_zero_rows(self):
        import pandas as pd

        from clawrag_ray.stages.retrieval import rrf_fuse, weighted_fuse

        a = pd.DataFrame({"doc_id": [1, 2], "score": [2.0, 1.0]})
        b = pd.DataFrame({"doc_id": [2, 3], "score": [5.0, 4.0]})
        assert len(rrf_fuse([a, b], top=0)) == 0
        assert len(weighted_fuse([a, b], weights=[0.5, 0.5], top=0)) == 0
        # and None still means "no cut"
        assert len(rrf_fuse([a, b], top=None)) == 3


class TestTemperatureSample:
    def test_flattens_skew_and_is_deterministic(self, ray_session):
        import pandas as pd
        import ray

        from clawrag_ray.stages.curation import temperature_sample

        rows = [{"doc_id": i, "lang": "en"} for i in range(400)] + [
            {"doc_id": 1000 + i, "lang": "de"} for i in range(16)
        ]
        ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
        out = temperature_sample(ds, ["lang"], temperature=2.0, scale=2.0).to_pandas()
        got = out.groupby("lang").size().to_dict()
        # en: floor(2*sqrt(400)) = 40; de: floor(2*sqrt(16)) = 8 — the
        # 25:1 skew compresses to 5:1 under T=2
        assert got == {"en": 40, "de": 8}
        # selection is content-deterministic: same ids on a different layout
        out2 = temperature_sample(
            ray.data.from_pandas(pd.DataFrame(rows)).repartition(9),
            ["lang"],
            temperature=2.0,
            scale=2.0,
        ).to_pandas()
        assert sorted(out["doc_id"]) == sorted(out2["doc_id"])

    def test_target_caps_at_stratum_size(self, ray_session):
        import pandas as pd
        import ray

        from clawrag_ray.stages.curation import temperature_sample

        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": range(5), "lang": ["fr"] * 5}))
        out = temperature_sample(ds, ["lang"], temperature=2.0, scale=100.0).to_pandas()
        assert len(out) == 5  # min(n, floor(scale*sqrt(n)))


class TestStratifiedSplit:
    def test_split_is_stable_and_roughly_proportional(self, ray_session):
        import pandas as pd
        import ray

        from clawrag_ray.stages.curation import stratified_split

        df = pd.DataFrame({"doc_id": range(2000)})
        out = stratified_split(ray.data.from_pandas(df).repartition(4)).to_pandas()
        frac = out["split"].value_counts(normalize=True)
        assert 0.74 < frac["train"] < 0.86
        assert 0.06 < frac["val"] < 0.14
        assert 0.06 < frac["test"] < 0.14
        # a doc's split never changes when the corpus grows
        bigger = pd.DataFrame({"doc_id": range(4000)})
        out2 = stratified_split(ray.data.from_pandas(bigger).repartition(7)).to_pandas()
        merged = out.merge(out2, on="doc_id", suffixes=("_a", "_b"))
        assert (merged["split_a"] == merged["split_b"]).all()


class TestLeakageSafeSplit:
    def test_clusters_land_in_one_split_and_match_hash_rule(self, ray_session):
        import ray

        from clawrag_ray.functions.kernels import md5_prefix_ints
        from clawrag_ray.stages.curation import leakage_safe_split

        # 300 distinct texts; every 3rd text duplicated under two extra ids
        rows = []
        for i in range(300):
            rows.append((i, f"document body {i}"))
            if i % 3 == 0:
                rows.append((1000 + i, f"document body {i}"))
                rows.append((2000 + i, f"document body {i}"))
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        out = (
            leakage_safe_split(
                ray.data.from_pandas(df).repartition(5), num_partitions=7
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert len(out) == len(df)
        # cluster_id is the min doc_id over identical text
        want_cluster = df.groupby("text")["doc_id"].transform("min")
        merged = df.assign(want=want_cluster).merge(out, on="doc_id")
        assert (merged["cluster_id"] == merged["want"]).all()
        # every member of a cluster gets the SAME split (the leakage property)
        assert (out.groupby("cluster_id")["split"].nunique() == 1).all()
        # and the assignment is exactly the md5(cluster_id) % 100 rule
        m = md5_prefix_ints(out["cluster_id"].to_numpy()) % 100
        want_split = np.where(m < 80, "train", np.where(m < 90, "val", "test"))
        assert (out["split"].to_numpy() == want_split).all()

    def test_duplicate_free_corpus_degenerates_to_doc_split(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import leakage_safe_split, stratified_split

        df = pd.DataFrame({"doc_id": range(400), "text": [f"unique {i}" for i in range(400)]})
        ds = ray.data.from_pandas(df).repartition(3)
        a = leakage_safe_split(ds).to_pandas().sort_values("doc_id")
        b = stratified_split(ds.select_columns(["doc_id"])).to_pandas().sort_values("doc_id")
        assert (a["cluster_id"].to_numpy() == a["doc_id"].to_numpy()).all()
        assert a["split"].tolist() == b["split"].tolist()


class TestBoilerplateRemoval:
    def _brute(self, docs: dict[int, str], min_docs: int) -> pd.DataFrame:
        from collections import Counter

        df = Counter()
        for text in docs.values():
            df.update(set(text.split("\n")))
        rows = []
        for doc_id, text in docs.items():
            lines = text.split("\n")
            kept = [ln for ln in lines if df[ln] < min_docs]
            rows.append(
                {
                    "doc_id": doc_id,
                    "clean_text": "\n".join(kept),
                    "n_lines": len(lines),
                    "n_removed": len(lines) - len(kept),
                }
            )
        return pd.DataFrame(rows)

    def test_matches_brute_force(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import remove_boilerplate_lines

        docs = {
            i: f"shared header\nunique body {i}\n" + ("promo" if i % 2 == 0 else f"tail {i}")
            for i in range(20)
        }
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
        ).repartition(4)
        got = (
            remove_boilerplate_lines(ds, min_docs=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(docs, 5).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_threshold_boundary_and_blank_lines(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import remove_boilerplate_lines

        # "at" appears in exactly min_docs docs (removed); "below" in
        # min_docs-1 (kept); shared blank lines are boilerplate too
        # blank line appears in docs 0/1/3 -> df=3 -> removed everywhere
        docs = {0: "at\n\nx0", 1: "at\n\nx1", 2: "at\nbelow\nx2", 3: "below\n\nx3"}
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        got = remove_boilerplate_lines(ds, min_docs=3).to_pandas().sort_values("doc_id")
        assert got["clean_text"].tolist() == ["x0", "x1", "below\nx2", "below\nx3"]
        assert got["n_removed"].tolist() == [2, 2, 1, 1]

    def test_all_lines_removed_yields_empty_text(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import remove_boilerplate_lines

        docs = {i: "same" for i in range(4)}
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        got = remove_boilerplate_lines(ds, min_docs=2).to_pandas()
        assert (got["clean_text"] == "").all()
        assert (got["n_removed"] == 1).all()
        assert len(got) == 4


class TestPerplexityFilter:
    def _brute(self, docs: dict[int, str]) -> pd.DataFrame:
        import re
        from collections import Counter

        tok = re.compile(r"\S+")
        per_doc = {i: tok.findall(t.lower()) for i, t in docs.items()}
        cnt = Counter()
        for ts in per_doc.values():
            cnt.update(ts)
        total, vocab = sum(cnt.values()), len(cnt)
        lp = {t: np.log((c + 1) / (total + vocab)) for t, c in cnt.items()}
        rows = []
        for i, ts in per_doc.items():
            if not ts:
                continue
            h = -sum(lp[t] for t in ts) / len(ts)
            rows.append({"doc_id": i, "n_tokens": len(ts), "h": h})
        df = pd.DataFrame(rows)
        c1 = float(np.percentile(df["h"], 100 / 3))
        c2 = float(np.percentile(df["h"], 200 / 3))
        df["ppl_bucket"] = np.where(df["h"] <= c1, "head", np.where(df["h"] <= c2, "middle", "tail"))
        df["entropy"] = df["h"].round(6)
        return df[["doc_id", "n_tokens", "entropy", "ppl_bucket"]]

    def test_matches_brute_force(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import perplexity_filter

        rng = np.random.RandomState(7)
        vocab = [f"w{j}" for j in range(30)]
        docs = {
            i: " ".join(rng.choice(vocab, size=rng.randint(3, 25)))
            for i in range(60)
        }
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
        ).repartition(5)
        got = (
            perplexity_filter(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(docs).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
        # thirds split: each bucket non-empty and roughly a third
        sizes = got["ppl_bucket"].value_counts()
        assert set(sizes.index) == {"head", "middle", "tail"}
        assert sizes.min() >= len(got) // 5

    def test_zero_token_docs_excluded(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import perplexity_filter

        docs = {0: "alpha beta", 1: "   ", 2: "", 3: "alpha gamma delta"}
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        got = perplexity_filter(ds).to_pandas()
        assert sorted(got["doc_id"]) == [0, 3]

    def test_repeated_common_doc_scores_head(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import perplexity_filter

        # docs made of the dominant token score lowest entropy -> head;
        # docs of singleton tokens land in tail
        docs = {i: "the the the the" for i in range(10)}
        docs.update({10 + i: f"zzz{i} qqq{i} xxx{i}" for i in range(5)})
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        got = perplexity_filter(ds).to_pandas().set_index("doc_id")
        assert (got.loc[range(10), "ppl_bucket"] == "head").all()
        assert (got.loc[range(10, 15), "ppl_bucket"] == "tail").all()


class TestParagraphDedup:
    def _brute(self, docs: dict[int, str]) -> pd.DataFrame:
        seen: set[str] = set()
        rows = []
        for doc_id in sorted(docs):
            lines = docs[doc_id].split("\n")
            kept = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            rows.append(
                {
                    "doc_id": doc_id,
                    "clean_text": "\n".join(kept),
                    "n_lines": len(lines),
                    "n_removed": len(lines) - len(kept),
                }
            )
        return pd.DataFrame(rows)

    def test_matches_brute_force(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import paragraph_dedup

        # cross-doc repeats, in-doc repeats, and a doc that is all repeats
        docs = {
            i: f"shared header\nbody {i % 7}\nbody {i % 7}\ntail {i % 3}" for i in range(20)
        }
        docs[20] = "shared header\nbody 0\ntail 0"
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
        ).repartition(4)
        got = (
            paragraph_dedup(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(docs).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got.loc[got["doc_id"] == 20, "n_removed"].item() == 3

    def test_in_doc_repeat_keeps_first_index(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import paragraph_dedup

        docs = {5: "a\nb\na\na", 9: "b\nc"}
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        got = paragraph_dedup(ds).to_pandas().sort_values("doc_id")
        assert got["clean_text"].tolist() == ["a\nb", "c"]
        assert got["n_removed"].tolist() == [2, 1]

    def test_no_repeats_is_identity(self, ray_session):
        import ray

        from clawrag_ray.stages.curation import paragraph_dedup

        docs = {i: f"x{i}\ny{i}" for i in range(6)}
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        got = paragraph_dedup(ds).to_pandas().sort_values("doc_id")
        assert got["clean_text"].tolist() == list(docs.values())
        assert (got["n_removed"] == 0).all()


class TestExactSubstringDedup:
    @staticmethod
    def _brute(rows, window=64):
        # naive reference: mark every window occurrence that is not the
        # lexicographically-first (doc_id, pos) for its text, cut unions
        occ = {}
        for doc_id, text in rows:
            for p in range(len(text) - window + 1):
                occ.setdefault(text[p : p + window], []).append((doc_id, p))
        marked = {}
        for _, places in occ.items():
            for d, p in sorted(places)[1:]:
                marked.setdefault(d, []).append(p)
        out = {}
        for doc_id, text in rows:
            keep = [True] * len(text)
            for p in marked.get(doc_id, []):
                for c in range(p, min(p + window, len(text))):
                    keep[c] = False
            out[doc_id] = "".join(ch for ch, k in zip(text, keep) if k)
        return out

    def _run(self, rows, window=64):
        from clawrag_ray.stages.curation import exact_substring_dedup

        ds = ray.data.from_arrow(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
        ).repartition(3)
        got = exact_substring_dedup(ds, window=window).to_pandas()
        return dict(zip(got["doc_id"], got["text"])), dict(zip(got["doc_id"], got["n_removed"]))

    def test_cross_doc_region_removed_once(self, ray_session):
        shared = "the quick brown fox jumps over the lazy dog again and again, ok!"[:64]
        assert len(shared) == 64
        rows = [
            (1, "AAA " + shared + " tail one unique marker text"),
            (2, "BBBB " + shared + " other unique trailing content"),
            (3, "totally unrelated short document"),
        ]
        texts, removed = self._run(rows)
        brute = self._brute(rows)
        assert texts == brute
        assert shared in texts[1] and shared not in texts[2]
        assert removed[3] == 0

    def test_within_doc_repeat_removed(self, ray_session):
        block = "x" * 30 + "y" * 34  # 64 chars
        rows = [(7, block + "-mid-" + block)]
        texts, removed = self._run(rows)
        assert texts == self._brute(rows)
        assert removed[7] > 0

    def test_exact_dup_doc_fully_cut(self, ray_session):
        # non-periodic body: no within-doc window repeats, so the first
        # copy survives whole and the second is cut entirely
        body = "".join(chr(33 + (i * 7) % 90) for i in range(100))
        rows = [(1, body), (2, body), (3, "short")]
        texts, removed = self._run(rows)
        assert texts[1] == body and texts[2] == "" and texts[3] == "short"
        assert removed[2] == 100 and removed[1] == 0

    def test_self_repetitive_doc_self_dedups(self, ray_session):
        # 100 identical chars: every window equals the first, so only the
        # char at position 0 survives (the paper's within-doc rule)
        rows = [(9, "z" * 100)]
        texts, removed = self._run(rows)
        assert texts == self._brute(rows)
        assert texts[9] == "z" and removed[9] == 99

    def test_random_brute_parity(self, ray_session):
        import numpy as np

        rng = np.random.RandomState(21)
        alphabet = list("abc ")
        rows = []
        for i in range(12):
            n = int(rng.randint(40, 160))
            rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
        # small alphabet + window 8 forces plenty of collisions/overlaps
        texts, _ = self._run(rows, window=8)
        assert texts == self._brute(rows, window=8)


class TestGlobalRank:
    def test_matches_argsort(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.curation import global_rank

        rng = np.random.RandomState(17)
        keys = rng.permutation(500) * 3 + 7  # unique, gappy
        ds = ray.data.from_arrow(pa.table({"k": keys, "payload": keys * 2})).repartition(6)
        got = global_rank(ds, "k").to_pandas().sort_values("k").reset_index(drop=True)
        assert got["rnk"].tolist() == list(range(1, 501))
        assert (got["payload"] == got["k"] * 2).all()  # other columns ride along


class TestTokenKLDivergence:
    def test_matches_manual_kl(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.text_analysis import token_kl_divergence

        rows = [
            {"lang": "en", "text": "the cat sat on the mat"},
            {"lang": "en", "text": "the dog sat"},
            {"lang": "de", "text": "der hund der katze"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
        got = token_kl_divergence(ds).to_pandas().set_index("lang")
        # manual add-one KL over the corpus vocab
        from collections import Counter

        by_lang = {"en": Counter(), "de": Counter()}
        for r in rows:
            by_lang[r["lang"]].update(r["text"].split())
        corpus = by_lang["en"] + by_lang["de"]
        v, n = len(corpus), sum(corpus.values())
        for lang, cnt in by_lang.items():
            ng = sum(cnt.values())
            kl = sum(
                ((cnt[t] + 1) / (ng + v)) * np.log(((cnt[t] + 1) / (ng + v)) / ((corpus[t] + 1) / (n + v)))
                for t in corpus
            )
            assert got.loc[lang, "kl"] == round(kl, 6)
            assert got.loc[lang, "n_tokens"] == ng
        # identical distributions diverge less than disjoint ones
        assert got.loc["de", "kl"] > 0


class TestNullAndEmptyRegressions:
    def test_line_ops_survive_null_text(self, ray_session):
        from clawrag_ray.stages.curation import paragraph_dedup, remove_boilerplate_lines

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["keep me\nshared line", None, "shared line\nother"], pa.string()),
                }
            )
        )
        pd_out = paragraph_dedup(docs).to_pandas().set_index("doc_id")
        assert pd_out.loc[2, "clean_text"] == ""  # null behaves like ''
        assert pd_out.loc[1, "clean_text"] == "keep me\nshared line"
        rb = remove_boilerplate_lines(docs, min_docs=2).to_pandas().set_index("doc_id")
        assert rb.loc[2, "n_lines"] == 1  # the single empty line

    def test_temperature_sample_null_stratum(self, ray_session):
        from clawrag_ray.stages.curation import temperature_sample

        rows = [{"doc_id": i, "lang": "en"} for i in range(100)] + [
            {"doc_id": 1000 + i, "lang": None} for i in range(16)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            }
        )
        out = temperature_sample(
            ray.data.from_arrow(tbl).repartition(4), ["lang"], temperature=2.0, scale=1.0
        ).to_pandas()
        # null stratum sampled to floor(sqrt(16)) = 4, not dropped
        assert (out["lang"].isna()).sum() == 4
        assert (out["lang"] == "en").sum() == 10

    def test_perplexity_filter_empty_corpus(self, ray_session):
        from clawrag_ray.stages.curation import perplexity_filter

        docs = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        )
        out = perplexity_filter(docs)
        assert out.count() == 0
        assert out.schema().names == ["doc_id", "n_tokens", "entropy", "ppl_bucket"]


class TestBpeTrain:
    @staticmethod
    def _reference(word_counts, n_merges, min_pair_freq=2):
        # slow reference: same Sennrich BPE over an explicit word bag
        seqs = {tuple(w): c for w, c in word_counts.items()}
        merges = []
        for rank in range(n_merges):
            pf = {}
            for seq, c in seqs.items():
                for a, b in zip(seq, seq[1:]):
                    pf[(a, b)] = pf.get((a, b), 0) + c
            if not pf or max(pf.values()) < min_pair_freq:
                break
            best_f = max(pf.values())
            pair = min(p for p, f in pf.items() if f == best_f)
            merges.append((rank, pair[0], pair[1], best_f))
            joined = pair[0] + pair[1]
            new = {}
            for seq, c in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                        out.append(joined)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                new[tuple(out)] = new.get(tuple(out), 0) + c
            seqs = new
        return merges

    def test_matches_reference_and_merges_known_pair(self, ray_session):
        from collections import Counter

        from clawrag_ray.stages.text_analysis import bpe_train

        texts = [
            "low lower lowest low low",
            "new newer newest new",
            "low newer lowest",
        ]
        ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
        got = bpe_train(ds, n_merges=6)
        wc = Counter(w for t in texts for w in t.lower().split())
        want = self._reference(wc, 6)
        assert [tuple(r) for r in got.itertuples(index=False)] == want
        # 'lo' or 'ow' must be the first merge ('low' dominates)
        assert (got.loc[0, "left"], got.loc[0, "right"]) in {("l", "o"), ("o", "w"), ("lo", "w"), ("l", "ow")}

    def test_stops_below_min_pair_freq(self, ray_session):
        from clawrag_ray.stages.text_analysis import bpe_train

        ds = ray.data.from_arrow(pa.table({"text": ["ab", "cd", "ef"]}))
        got = bpe_train(ds, n_merges=10, min_pair_freq=2)
        assert len(got) == 0  # every pair occurs once


class TestSubstringDedupStride:
    """Winnowed stride-sampling variant (the documented ExactSubstr scale
    swap): ~1/stride of the probe offsets, content-defined selection."""

    def _run(self, rows, window=32, stride=4):
        from clawrag_ray.stages.curation import exact_substring_dedup

        ds = ray.data.from_arrow(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
        ).repartition(3)
        got = exact_substring_dedup(ds, window=window, stride=stride).to_pandas()
        return dict(zip(got["doc_id"], got["text"])), dict(zip(got["doc_id"], got["n_removed"]))

    def test_long_cross_doc_region_interior_cut(self, ray_session):
        # shared region well above window + 2*(stride-1): interior of the
        # SECOND copy must be cut; the first copy survives whole
        import numpy as np

        rng = np.random.RandomState(9)
        shared = "".join(chr(33 + c) for c in rng.randint(0, 90, 200))  # non-periodic
        rows = [(1, "head-A " + shared + " tail-A"), (2, "B " + shared + " longer tail B")]
        texts, removed = self._run(rows)
        assert texts[1] == rows[0][1]
        assert removed[1] == 0 and removed[2] > 100
        assert shared not in texts[2]

    def test_stride_removals_subset_of_full(self, ray_session):
        from clawrag_ray.stages.curation import exact_substring_dedup

        body = "".join(chr(33 + (i * 7) % 90) for i in range(150))
        rows = [(1, body + " xyz"), (2, "pre " + body), (3, "unrelated text entirely here")]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
        ).repartition(2)
        full = dict(
            zip(*(lambda d: (d["doc_id"], d["n_removed"]))(
                exact_substring_dedup(ds, window=32, stride=1).to_pandas()
            ))
        )
        strided = dict(
            zip(*(lambda d: (d["doc_id"], d["n_removed"]))(
                exact_substring_dedup(ds, window=32, stride=4).to_pandas()
            ))
        )
        for k in full:
            assert strided[k] <= full[k]
        assert strided[2] > 0  # the long duplicate is still caught

    def test_short_duplicates_may_survive_but_unique_text_untouched(self, ray_session):
        rows = [(1, "alpha bravo charlie delta echo"), (2, "zulu yankee xray whiskey victor")]
        texts, removed = self._run(rows, window=8, stride=4)
        assert removed[1] == 0 and removed[2] == 0
        assert texts[1] == rows[0][1] and texts[2] == rows[1][1]


class TestDecontaminateDistributed:
    def test_distributed_equals_broadcast(self, ray_session):
        from clawrag_ray.stages.curation import decontaminate

        train = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten eleven"),
            (3, "clean text with no overlap against anything evaluated today"),
        ]
        evals = [(100, "alpha beta gamma delta epsilon zeta eta theta extra tail")]
        tds = ray.data.from_arrow(
            pa.table({"doc_id": [r[0] for r in train], "text": [r[1] for r in train]})
        ).repartition(2)
        eds = ray.data.from_arrow(
            pa.table({"doc_id": [r[0] for r in evals], "text": [r[1] for r in evals]})
        )
        a = decontaminate(tds, eds, shingle_k=8).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = (
            decontaminate(tds, eds, shingle_k=8, eval_side="distributed")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert bool(a.loc[a["doc_id"] == 1, "contaminated"].iloc[0])
        assert not bool(a.loc[a["doc_id"] == 3, "contaminated"].iloc[0])


class TestWeightedSample:
    def test_layout_invariant_and_weight_biased(self, ray_session):
        from clawrag_ray.stages.curation import weighted_sample

        # 200 light docs (w=1) + 50 heavy docs (w=100): a 50-doc sample
        # must be dominated by heavy docs, and identical across layouts
        ids = list(range(250))
        w = [1] * 200 + [100] * 50
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "w": pa.array(w, pa.int64())})
        a = weighted_sample(ray.data.from_arrow(t).repartition(2), 50, "w").to_pandas()
        b = weighted_sample(ray.data.from_arrow(t).repartition(7), 50, "w").to_pandas()
        sa = set(a["doc_id"]); sb = set(b["doc_id"])
        assert sa == sb and len(sa) == 50
        heavy = sum(1 for d in sa if d >= 200)
        assert heavy >= 35  # strong weight bias (deterministic given md5 keys)

    def test_nonpositive_weights_excluded(self, ray_session):
        from clawrag_ray.stages.curation import weighted_sample

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "w": pa.array([0, -5, 7], pa.int64())})
        got = weighted_sample(ray.data.from_arrow(t), 3, "w").to_pandas()
        assert got["doc_id"].tolist() == [3]


class TestSourceOverlapMatrix:
    def test_counts_distinct_shared_shingles(self, ray_session):
        from clawrag_ray.stages.curation import source_overlap_matrix

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
        rows = [
            ("s1", shared + " one two"),
            ("s2", shared + " three four"),
            ("s3", "totally different text with no gram overlap at all here"),
        ]
        ds = ray.data.from_arrow(
            pa.table({"source": [r[0] for r in rows], "text": [r[1] for r in rows]})
        ).repartition(2)
        got = source_overlap_matrix(ds).to_pandas()
        got = {(a, b): n for a, b, n in zip(got["source_a"], got["source_b"], got["n_shared"])}
        assert got.get(("s1", "s2")) == 1  # only the exact 8-word shingle is shared
        assert ("s1", "s3") not in got and ("s2", "s3") not in got


class TestDsirImportanceSample:
    def _brute(self, rows, n_buckets=64, keep_frac=0.5):
        """Pure-Python DSIR replay: hashed-bigram LMs + mean log ratio."""
        import hashlib
        import math
        import re

        def feats(text):
            toks = re.findall(r"\S+", text.lower())
            return [
                int(hashlib.md5((toks[i] + " " + toks[i + 1]).encode()).hexdigest()[:8], 16)
                % n_buckets
                for i in range(len(toks) - 1)
            ]
        c_all = [0] * n_buckets
        c_tgt = [0] * n_buckets
        per_doc = {}
        for doc_id, text, lang in rows:
            f = feats(text)
            if f:
                per_doc[doc_id] = f
            for b in f:
                c_all[b] += 1
                if lang == "en":
                    c_tgt[b] += 1
        t_all, t_tgt = sum(c_all), sum(c_tgt)
        lr = [
            math.log((c_tgt[b] + 1) / (t_tgt + n_buckets))
            - math.log((c_all[b] + 1) / (t_all + n_buckets))
            for b in range(n_buckets)
        ]
        return {d: sum(lr[b] for b in f) / len(f) for d, f in per_doc.items()}

    def test_matches_brute_force_and_layout_invariant(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.curation import dsir_importance_sample

        rows = [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "der schnelle braune fuchs springt ueber den hund", "de"),
            (3, "the lazy dog sleeps while the quick fox runs", "en"),
            (4, "ein hund schlaeft hier gar nicht schnell heute", "de"),
            (5, "quick brown dog and lazy fox play together", "en"),
            (6, "one", "de"),  # < 2 tokens: no features, excluded
        ]
        want = self._brute(rows)
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        )
        for parts in (1, 3):
            got = (
                dsir_importance_sample(
                    ray.data.from_arrow(t).repartition(parts),
                    n_buckets=64,
                    keep_frac=0.5,
                )
                .to_pandas()
                .sort_values("doc_id")
            )
            assert got["doc_id"].tolist() == sorted(want)
            np.testing.assert_allclose(
                got["dsir_logratio"].to_numpy(),
                np.round([want[d] for d in sorted(want)], 6),
                atol=1e-9,
            )
            # English docs score higher than German under the en-target LM
            by_id = dict(zip(got["doc_id"], got["dsir_logratio"]))
            assert min(by_id[1], by_id[3], by_id[5]) > max(by_id[2], by_id[4])
            # top-half selection by score, deterministic
            n_sel = int(got["selected"].sum())
            assert 0 < n_sel < len(got)
            assert got[got["selected"]]["dsir_logratio"].min() >= got[~got["selected"]]["dsir_logratio"].max()


class TestSnapshotDiff:
    def test_all_four_statuses(self, ray_session):
        from clawrag_ray.stages.curation import snapshot_diff

        old = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": ["same", "will change", "will vanish"],
                }
            )
        ).repartition(2)
        new = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 4], pa.int64()),
                    "text": ["same", "changed!", "brand new"],
                }
            )
        ).repartition(2)
        got = snapshot_diff(old, new).to_pandas().set_index("doc_id")["status"].to_dict()
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


class TestUrlDomainOps:
    def test_normalize_rules(self, ray_session):
        from clawrag_ray.stages.curation import normalize_urls

        urls = [
            "HTTPS://WWW.Example.COM/A/B/?q=1#frag",   # case, www, query, frag, slash
            "http://site.org/CasePreservedPath",        # path case kept
            "not a url at all",                         # passthrough, domain ''
        ]
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "url": urls})
        got = normalize_urls(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
        assert got["url_norm"].tolist() == [
            "https://www.example.com/A/B",
            "http://site.org/CasePreservedPath",
            "not a url at all",
        ]
        assert got["domain"].tolist() == ["example.com", "site.org", ""]

    def test_domain_filter_thresholds(self, ray_session):
        from clawrag_ray.stages.curation import domain_quality_filter

        rows = (
            [(i, "good.com", 1000) for i in range(5)]        # mean 1000, n=5: keep
            + [(10 + i, "thin.com", 1000) for i in range(4)]  # n=4 < 5: drop
            + [(20 + i, "bad.com", 100) for i in range(6)]    # mean 100 < 600: drop
        )
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "domain": [r[1] for r in rows],
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        got = (
            domain_quality_filter(ray.data.from_arrow(t).repartition(2), num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        by_dom = got.drop_duplicates("domain").set_index("domain")
        assert bool(by_dom.loc["good.com", "keep"]) is True
        assert bool(by_dom.loc["thin.com", "keep"]) is False
        assert bool(by_dom.loc["bad.com", "keep"]) is False
        assert by_dom.loc["good.com", "domain_mean"] == 1000.0
        assert len(got) == len(rows)


class TestPerplexityBigram:
    def test_matches_brute_force(self, ray_session):
        import math
        import re
        from collections import Counter

        from clawrag_ray.stages.curation import perplexity_filter_bigram

        texts = [
            "a b a b a",
            "a b c",
            "c c c c",
            "x",  # < 2 tokens: excluded
        ]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
        got = (
            perplexity_filter_bigram(ray.data.from_arrow(t).repartition(2), num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        toks = [re.findall(r"\S+", s.lower()) for s in texts]
        uni = Counter(w for ts in toks for w in ts)
        T, V = sum(uni.values()), len(uni)
        bgc = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
        want = {}
        for d, ts in enumerate(toks):
            lps = [
                math.log(
                    0.7 * (bgc[(ts[i], ts[i + 1])] + 1) / (uni[ts[i]] + V)
                    + 0.3 * (ts and (uni[ts[i + 1]] + 1) / (T + V))
                )
                for i in range(len(ts) - 1)
            ]
            if lps:
                want[d] = (len(lps), round(-sum(lps) / len(lps), 6))
        assert {r.doc_id: (r.n_bigrams, r.entropy) for r in got.itertuples()} == want
        # the self-repetitive doc ("a b a b a") scores LOWER entropy than
        # the unseen-transition doc ("a b c")
        by = {r.doc_id: r.entropy for r in got.itertuples()}
        assert by[0] < by[1]


class TestWebCurate:
    def test_funnel_and_dedup(self, ray_session):
        from clawrag_ray.pipelines.curation import web_curate

        keeper = (
            "the quick brown fox jumps over it.\n"
            "another sentence with the five words!\n"
            "a third good line stands here."
        )
        rows = [
            (1, keeper),                      # survives everything
            (2, keeper),                      # exact dup of 1's clean text -> dropped
            (3, "no terminal punctuation lines at all here"),   # C4 drops (0 kept lines)
            (4, keeper + "\nlorem ipsum tail."),                # page drop
        ]
        # pad keeper docs to >= 50 words for the Gopher word-count rule
        pad = " ".join(f"the word{i} fills space." for i in range(15))
        rows = [(i, (t + "\n" + pad) if i in (1, 2, 4) else t) for i, t in rows]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
        got = web_curate(ray.data.from_arrow(t).repartition(2), num_partitions=4).to_pandas()
        assert got["doc_id"].tolist() == [1]
        assert got["n_words"].iloc[0] >= 50


class TestApplyChanges:
    def test_upsert_delete_insert_kept(self, ray_session):
        from clawrag_ray.stages.curation import apply_changes

        base = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": ["one", "two", "three"],
                }
            )
        ).repartition(2)
        changes = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([2, 3, 4], pa.int64()),
                    "text": ["two-new", None, "four"],
                    "op": ["upsert", "delete", "upsert"],
                }
            )
        )
        got = (
            apply_changes(base, changes, num_partitions=4)
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        assert got.index.tolist() == [1, 2, 4]
        assert got.loc[1, "text"] == "one" and got.loc[1, "change"] == "kept"
        assert got.loc[2, "text"] == "two-new" and got.loc[2, "change"] == "updated"
        assert got.loc[4, "text"] == "four" and got.loc[4, "change"] == "inserted"


class TestCdcChunks:
    def test_edit_stability_and_coverage(self, ray_session):
        import hashlib

        from clawrag_ray.stages.curation import cdc_chunks

        import numpy as np

        rng = np.random.RandomState(9)
        base = " ".join(
            "".join(rng.choice(list("abcdefghijklmnop"), size=rng.randint(2, 9)))
            for _ in range(400)
        )
        shifted = "INSERTED PREFIX !! " + base  # shifts all content right
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [base, shifted, "tiny"],
            }
        )
        got = cdc_chunks(ray.data.from_arrow(t).repartition(2)).to_pandas()
        g1 = got[got.doc_id == 1].sort_values("chunk_idx")
        g2 = got[got.doc_id == 2].sort_values("chunk_idx")
        # chunks tile the doc exactly
        assert g1["length"].sum() == len(base)
        assert g1["start"].iloc[0] == 1
        assert (g1["start"].to_numpy()[1:] == (g1["start"] + g1["length"]).to_numpy()[:-1]).all()
        # content-defined: most of base's chunk hashes survive the prefix insertion
        h1, h2 = set(g1["chunk_hash"]), set(g2["chunk_hash"])
        assert len(h1 & h2) >= max(1, len(h1) - 2)
        # short doc: one whole-doc chunk with the canonical md5 id
        g3 = got[got.doc_id == 3]
        assert len(g3) == 1 and g3["length"].iloc[0] == 4
        assert g3["chunk_hash"].iloc[0] == int(hashlib.md5(b"tiny").hexdigest()[:8], 16)


class TestCdcChunksBounded:
    def test_bounds_tiling_and_edit_stability(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.curation import cdc_chunks, cdc_chunks_bounded

        rng = np.random.RandomState(9)
        base = " ".join(
            "".join(rng.choice(list("abcdefghijklmnop"), size=rng.randint(2, 9)))
            for _ in range(400)
        )
        shifted = "INSERTED PREFIX !! " + base
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [base, shifted, "tiny"],
            }
        )
        got = cdc_chunks_bounded(
            ray.data.from_arrow(t).repartition(2), min_len=32, max_len=128
        ).to_pandas()
        for did, text in ((1, base), (2, shifted)):
            g = got[got.doc_id == did].sort_values("chunk_idx")
            assert g["length"].sum() == len(text)
            assert g["start"].iloc[0] == 1
            assert (g["start"].to_numpy()[1:] == (g["start"] + g["length"]).to_numpy()[:-1]).all()
            assert (g["length"] <= 128).all()
            assert (g["length"].to_numpy()[:-1] >= 32).all()  # only the tail may be short
        # content-defined survives the shift: most chunk hashes shared
        h1 = set(got[got.doc_id == 1]["chunk_hash"])
        h2 = set(got[got.doc_id == 2]["chunk_hash"])
        assert len(h1 & h2) >= len(h1) // 2
        # short doc: one whole-doc chunk
        assert len(got[got.doc_id == 3]) == 1

    def test_greedy_matches_python_reference(self, ray_session):
        import numpy as np

        from clawrag_ray.stages.curation import cdc_chunks, cdc_chunks_bounded

        rng = np.random.RandomState(21)
        texts = [
            "".join(rng.choice(list("abcdefgh ij"), size=rng.randint(0, 900)))
            for _ in range(12)
        ]
        t = pa.table({"doc_id": pa.array(range(12), pa.int64()), "text": texts})
        ds = ray.data.from_arrow(t).repartition(3)
        minl, maxl = 20, 70
        # reference greedy over the UNBOUNDED op's anchor set (chunk ends
        # minus the forced final cut are exactly the anchors)
        unb = cdc_chunks(ds).to_pandas()
        got = cdc_chunks_bounded(ds, min_len=minl, max_len=maxl).to_pandas()
        for did, text in enumerate(texts):
            n = len(text)
            g = unb[unb.doc_id == did].sort_values("chunk_idx")
            ends = (g["start"] + g["length"] - 1).to_numpy()
            anchors = [int(e) for e in ends if e != n] if n else []
            # docs < window: unbounded yields one whole-doc chunk, no anchors
            want = []
            pos = 0
            a = np.asarray(anchors, dtype=np.int64)
            while pos < n:
                lim = min(pos + maxl, n)
                lo = int(np.searchsorted(a, pos + minl, side="left"))
                nxt = int(a[lo]) if lo < len(a) and a[lo] <= lim else lim
                want.append((pos + 1, nxt - pos))
                pos = nxt
            gb = got[got.doc_id == did].sort_values("chunk_idx")
            assert list(zip(gb["start"], gb["length"])) == want, did


class TestWebCurateEmpty:
    def test_no_survivors_returns_typed_empty(self, ray_session):
        from clawrag_ray.pipelines.curation import web_curate

        # no terminal punctuation anywhere -> C4 keeps nothing
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["no punctuation here at all", "and none here either"],
            }
        )
        out = web_curate(ray.data.from_arrow(t), num_partitions=4)
        # schema is pinned on the Dataset (to_pandas drops zero-row
        # blocks — the documented Ray behavior)
        assert out.schema().names == ["doc_id", "n_words", "clf_margin"]
        assert out.count() == 0
