"""Loader explodes, dedup policy engine, routing rules, step registry."""

import json

import pyarrow as pa
import pytest
import ray.data

from clawrag_ray.pipelines.steps import available_steps, compile_pipeline
from clawrag_ray.sources.loaders import explode_json, explode_mbox, explode_xml, text_preview
from clawrag_ray.stages.policies import apply_dedup_policy, split_policy_output
from clawrag_ray.stages.routing import classify_by_extension, recommend_strategy, route_by_rules


def _payload_ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


class TestLoaders:
    def test_json_array(self):
        payload = json.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
        df = explode_json(_payload_ds([{"doc_id": "j1", "payload": payload}])).to_pandas()
        assert len(df) == 2
        assert df["content"].iloc[0] == "a: 1\nb: x"
        assert df["item_kind"].iloc[0] == "item"

    def test_json_dict_with_arrays(self):
        payload = json.dumps({"products": [{"n": 1}, {"n": 2}], "extras": [{"n": 3}]})
        df = explode_json(_payload_ds([{"doc_id": "j2", "payload": payload}])).to_pandas()
        assert len(df) == 3
        assert set(df["item_kind"]) == {"products", "extras"}

    def test_json_invalid(self):
        df = explode_json(_payload_ds([{"doc_id": "bad", "payload": "{nope"}])).to_pandas()
        assert df["item_kind"].tolist() == ["error"]

    def test_xml_repeated_items(self):
        payload = "<root><item><name>a</name></item><item><name>b</name></item><meta>x</meta></root>"
        df = explode_xml(_payload_ds([{"doc_id": "x1", "payload": payload}])).to_pandas()
        assert len(df) == 2
        assert "name: a" in df["content"].iloc[0]

    def test_xml_single_tree(self):
        payload = "<doc><title>t</title></doc>"
        df = explode_xml(_payload_ds([{"doc_id": "x2", "payload": payload}])).to_pandas()
        assert len(df) == 1 and df["item_kind"].iloc[0] == "doc"

    def test_mbox_split_and_cap(self):
        msg = "From a@x\nFrom: a@x.com\nSubject: s{i}\n\nbody {i}\n"
        payload = "".join(msg.replace("{i}", str(i)) for i in range(5))
        ds = _payload_ds([{"doc_id": "m1", "payload": payload}])
        df = explode_mbox(ds, max_emails=3).to_pandas()
        assert len(df) == 3  # capped
        assert "s0" in df["content"].iloc[0]

    def test_preview(self):
        df = text_preview(_payload_ds([{"doc_id": "p", "payload": "x" * 9000}]), n_chars=4096).to_pandas()
        assert len(df["preview"].iloc[0]) == 4096


def _dup_rows():
    return [
        {"doc_id": 1, "text": "same", "mtime": 100, "size": 10},
        {"doc_id": 2, "text": "same", "mtime": 300, "size": 12},
        {"doc_id": 3, "text": "same", "mtime": 200, "size": 11},
        {"doc_id": 4, "text": "unique", "mtime": 50, "size": 5},
    ]


class TestDedupPolicies:
    def _run(self, policy, **kw):
        ds = _payload_ds(_dup_rows())
        unified = apply_dedup_policy(ds, policy=policy, **kw).materialize()
        docs, audit = split_policy_output(unified)
        return docs.to_pandas(), audit.to_pandas()

    def test_skip(self):
        docs, audit = self._run("SKIP")
        assert sorted(docs["doc_id"]) == [1, 4]
        assert sorted(audit["doc_id"]) == [2, 3]
        assert set(audit["action_taken"]) == {"SKIPPED"}
        assert set(audit["original_id"]) == {1}

    def test_version(self):
        docs, audit = self._run("VERSION")
        d = docs.set_index("doc_id")
        assert d.loc[1, "version"] == 1 and not d.loc[1, "is_active"]
        assert d.loc[3, "version"] == 3 and d.loc[3, "is_active"]
        assert d.loc[4, "version"] == 1 and d.loc[4, "is_active"]
        assert set(audit["action_taken"]) == {"VERSIONED"}

    def test_replace_if_newer(self):
        docs, audit = self._run("REPLACE_IF_NEWER", mtime_col="mtime", size_col="size")
        assert sorted(docs["doc_id"]) == [2, 4]  # newest mtime wins
        assert sorted(audit["doc_id"]) == [1, 3]
        diff = json.loads(audit.sort_values("doc_id")["metadata_diff"].iloc[0])
        assert "mtime" in diff and "size" in diff

    def test_notify_only(self):
        docs, audit = self._run("NOTIFY_ONLY")
        assert sorted(docs["doc_id"]) == [1, 2, 3, 4]  # nothing dropped
        assert set(audit["action_taken"]) == {"NOTIFIED"} and len(audit) == 2

    def test_unknown_policy(self):
        with pytest.raises(ValueError):
            apply_dedup_policy(_payload_ds(_dup_rows()), policy="YOLO")


class TestRouting:
    def test_classify_and_route(self):
        rows = [
            {"doc_id": 1, "extension": ".py", "n_chars": 500},
            {"doc_id": 2, "extension": ".pdf", "n_chars": 200_000},
            {"doc_id": 3, "extension": ".weird", "n_chars": 5_000},
        ]
        ds = classify_by_extension(_payload_ds(rows))
        routed = route_by_rules(ds, size_col="n_chars").to_pandas().set_index("doc_id")
        assert routed.loc[1, "target_collection"] == "code"
        assert routed.loc[1, "chunk_size"] == int(256 * 1.2)  # small-doc boost
        assert routed.loc[2, "target_collection"] == "documents"
        assert routed.loc[2, "chunk_size"] == int(800 * 0.8)  # large-doc shrink
        assert routed.loc[3, "target_collection"] == "general"  # default rule
        assert routed.loc[3, "rule_matched"] == -1

    def test_strategy_recommender(self):
        rows = [
            {"doc_id": 1, "extension": ".py", "n_chars": 100},
            {"doc_id": 2, "extension": ".csv", "n_chars": 100},
            {"doc_id": 3, "extension": ".txt", "n_chars": 20_000_000},
            {"doc_id": 4, "extension": ".txt", "n_chars": 100},
        ]
        df = recommend_strategy(_payload_ds(rows)).to_pandas().set_index("doc_id")
        assert df.loc[1, "recommended_strategy"] == "code"
        assert df.loc[2, "recommended_strategy"] == "row_based"
        assert df.loc[3, "recommended_strategy"] == "semantic"
        assert df.loc[4, "recommended_strategy"] == "sentence"


class TestStepRegistry:
    def test_available(self):
        steps = available_steps()
        for s in ("clean_text", "extract_clauses", "validate_clauses", "chunk"):
            assert s in steps

    def test_compile_unknown_raises(self):
        with pytest.raises(KeyError):
            compile_pipeline([("nope", {})])

    def test_declared_pipeline_runs(self):
        ds = _payload_ds(
            [{"doc_id": 1, "text": "  A   Section 1 contract.   Pay 999 $ now.  "}]
        )
        pipe = compile_pipeline(
            [
                ("clean_text", {}),
                ("extract_clauses", {}),
                ("extract_amounts", {}),
                ("validate_clauses", {}),
                ("validate_amounts", {}),
            ]
        )
        df = pipe(ds).to_pandas()
        assert df["text"].iloc[0] == "A Section 1 contract. Pay 999 $ now."
        assert df["n_clauses"].iloc[0] == 1
        assert df["n_amounts"].iloc[0] == 1
        assert bool(df["clause_validation_passed"].iloc[0])

    def test_chunk_step(self):
        ds = _payload_ds([{"doc_id": 1, "text": "x" * 250}])
        pipe = compile_pipeline([("chunk", {"size": 100, "overlap": 20})])
        df = pipe(ds).to_pandas()
        assert len(df) == 3  # 1 + ceil(150/80)
        assert df["chunk_index"].tolist() == [0, 1, 2]


class TestAuditJsonEscaping:
    def test_string_mtime_with_quote_emits_valid_json(self, ray_session):
        import json

        import ray

        from clawrag_ray.stages.policies import apply_dedup_policy

        rows = [
            {"doc_id": 1, "text": "same", "modified": 'v"1\\x'},
            {"doc_id": 2, "text": "same", "modified": "v2"},
        ]
        unified = apply_dedup_policy(
            ray.data.from_items(rows), policy="REPLACE_IF_NEWER", mtime_col="modified"
        ).to_pandas()
        audit = unified[unified["record"] == "audit"]
        assert len(audit) == 1
        diff = json.loads(audit["metadata_diff"].iloc[0])  # must parse
        assert diff["modified"] == ["v2", 'v"1\\x']


class TestRe2TokenParity:
    def test_re2_tokens_matches_re2_not_str_split(self):
        from clawrag_ray.functions.kernels import re2_tokens

        # \x0b and NBSP are python-whitespace but NOT RE2 \s
        assert re2_tokens("a\x0bb  c\xa0d e") == ["a\x0bb", "c\xa0d", "e"]
        assert re2_tokens("") == []
        assert re2_tokens("  \t\n ") == []

    def test_repetition_metrics_matches_duckdb_on_exotic_whitespace(self, ray_session):
        import duckdb
        import pandas as pd
        import ray

        from clawrag_ray.stages.text_analysis import repetition_metrics

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["tok tok\x0btok tok tok", "x\xa0y x\xa0y z w q r s t u v"],
            }
        )
        ours = (
            repetition_metrics(ray.data.from_pandas(docs))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", docs)
        oracle = con.execute(
            "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS word, "
            "generate_subscripts(regexp_extract_all(lower(text), '\\S+'), 1) AS i FROM documents), "
            "tc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2), "
            "top AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_token_frac FROM tc GROUP BY 1) "
            "SELECT doc_id, top_token_frac FROM top ORDER BY doc_id"
        ).df()
        assert list(ours["top_token_frac"]) == list(oracle["top_token_frac"])
