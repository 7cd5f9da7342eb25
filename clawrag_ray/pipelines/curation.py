"""Flagship end-to-end corpus curation pipeline: the chain a pretraining
data build actually runs, composed from the engine's curation stages —

    exact dedup (keep min-id per exact text)
      -> Gopher repetition filter (top-token / dup-2-gram rules)
      -> CCNet perplexity filter (unigram-LM stand-in TRAINED ON THE
         SURVIVORS — the realistic order: the LM never sees dropped docs;
         tail bucket dropped)
      -> deterministic train/val/test split.

Every stage is the already-oracled distributed operator; this module only
wires them with the engine's keyed semi-joins, so the whole chain stays
corpus-proportional: the only driver-sized values are the perplexity
cutoffs (two scalars) and the stage row counts. The `curated_corpus`
driver query replays the full chain in one DuckDB statement — the
composition itself is under the exact-match gate, not just the pieces.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def curate_corpus(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    strat_col: str = "lang",
    num_partitions: int = 64,
) -> Dataset:
    """Run the full curation chain over ``docs`` (id, text, stratum).
    Returns one row per SURVIVING document:
    (id, stratum, n_tokens, entropy, ppl_bucket in {head, middle}, split).

    Scale notes: dedup keepers are a two-level grouped min keyed by the
    text sha256 (hash, not text, is the shuffle key); the repetition and
    perplexity verdicts attach via distributed keyed joins; the split is
    a stateless hash pass. No stage materializes the corpus driver-side.
    """
    from ray.data.aggregate import Min as AggMin

    from clawrag_ray.stages.curation import perplexity_filter, stratified_split
    from clawrag_ray.stages.dedup import _keyed_join, with_text_hash
    from clawrag_ray.stages.text_analysis import repetition_metrics

    # 1. exact dedup: keeper = min id per distinct text
    hashed = with_text_hash(docs.select_columns([id_col, text_col, strat_col]), text_col)

    def partial_min(b: pa.Table) -> pa.Table:
        g = b.select(["text_sha256", id_col]).group_by("text_sha256").aggregate([(id_col, "min")])
        return g.rename_columns(["text_sha256", "pmin"])

    keepers = (
        hashed.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_sha256")
        .aggregate(AggMin("pmin", alias_name="keeper"))
        .map_batches(
            lambda b: pa.table({"hash_f": b["text_sha256"], "keeper": pc.cast(b["keeper"], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    joined = _keyed_join(hashed, "text_sha256", keepers, "hash_f", ["keeper"], num_partitions=num_partitions)
    d1 = joined.map_batches(
        lambda b: b.filter(pc.equal(b[id_col], b["keeper"])).select([id_col, text_col, strat_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # 2. Gopher repetition rules: the verdict is per-row, so score and
    # filter in ONE pass with the columns threaded through — no join.
    d2 = repetition_metrics(
        d1, id_col=id_col, text_col=text_col, keep_cols=[text_col, strat_col]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["keep"], True)).select([id_col, text_col, strat_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # scored twice below (LM corpus + stratum legs); the upstream join
    # pass emits one tiny block per hash partition — compact to row-
    # proportional blocks so downstream stages don't pay per-block
    # overhead x num_partitions (measured 93 s -> 10 s on the perplexity
    # leg at sf0.1)
    d2 = d2.materialize()
    d2 = d2.repartition(max(2, d2.count() // 50_000 + 1)).materialize()

    # 3. perplexity filter trained on the survivors; drop the tail bucket
    ppl = perplexity_filter(d2, id_col=id_col, text_col=text_col, num_partitions=num_partitions)
    kept = ppl.map_batches(
        lambda b: b.filter(pc.not_equal(b["ppl_bucket"], "tail")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    kept = kept.materialize()
    kept = kept.repartition(max(2, kept.count() // 50_000 + 1)).materialize()  # same block compaction
    strat = d2.map_batches(
        lambda b: pa.table({"id_f": b[id_col], strat_col: b[strat_col]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labeled = _keyed_join(kept, id_col, strat, "id_f", [strat_col], num_partitions=num_partitions)

    # 4. deterministic stratified split (stable under corpus growth)
    return stratified_split(labeled, id_col=id_col)


def web_curate(
    docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
) -> Dataset:
    """Second flagship chain — the WEB-tier page pipeline composed from
    the round-4 stages:

        C4 line/page cleaning (terminal-punct + 5-word lines, lorem/brace
        page drops, >= 3 sentences)
          -> Gopher full quality rules over the CLEANED text
          -> hashed linear quality classifier (margin >= 0)
          -> exact dedup on the cleaned text (keep min id per distinct
             clean_text).

    The first three stages are MAP-ONLY, so the whole chain costs ONE
    shuffle (the dedup grouped-min + keyed semi-join) plus a single
    streaming map pass — the shape that matters at 10^12 pages. The
    `web_curated` driver query replays the entire chain in one DuckDB
    statement, putting the composition (not just the pieces) under the
    exact-match gate. Output per survivor:
    (id, n_words, clf_margin)."""
    from ray.data.aggregate import Min as AggMin

    from clawrag_ray.stages.dedup import _keyed_join, with_text_hash
    from clawrag_ray.stages.text_analysis import c4_filter, gopher_quality_filter, quality_classifier

    cleaned = c4_filter(docs, id_col=id_col, text_col=text_col)

    def keep_clean(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["keep"], True))
        return pa.table({id_col: b[id_col], text_col: b["clean_text"]})

    kept = cleaned.map_batches(keep_clean, batch_format="pyarrow", zero_copy_batch=True)

    g = gopher_quality_filter(kept, id_col=id_col, text_col=text_col, keep_cols=[text_col])

    def keep_gopher(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["keep"], True))
        return pa.table({id_col: b[id_col], text_col: b[text_col], "n_words": b["n_words"]})

    g2 = g.map_batches(keep_gopher, batch_format="pyarrow", zero_copy_batch=True)

    clf = quality_classifier(g2, id_col=id_col, text_col=text_col, keep_cols=[text_col, "n_words"])

    def keep_clf(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["keep"], True))
        return pa.table(
            {
                id_col: b[id_col],
                text_col: b[text_col],
                "n_words": b["n_words"],
                "clf_margin": b["clf_margin"],
            }
        )

    survivors = clf.map_batches(keep_clf, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # a corpus where no page survives the filters yields a schemaless
    # empty Dataset — return the typed empty result instead of feeding
    # it to the keyed join (whose schema probe would die)
    if survivors.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("n_words", pa.int64()), ("clf_margin", pa.float64())]
            ).empty_table()
        )

    hashed = with_text_hash(survivors, text_col)

    def partial_min(b: pa.Table) -> pa.Table:
        g = b.select(["text_sha256", id_col]).group_by("text_sha256").aggregate([(id_col, "min")])
        return g.rename_columns(["text_sha256", "pmin"])

    keepers = (
        hashed.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_sha256")
        .aggregate(AggMin("pmin", alias_name="keeper"))
        .map_batches(
            lambda b: pa.table(
                {"hash_f": b["text_sha256"], "keeper": pc.cast(b["keeper"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    joined = _keyed_join(
        hashed, "text_sha256", keepers, "hash_f", ["keeper"], num_partitions=num_partitions
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b[id_col], b["keeper"]))
        return pa.table(
            {id_col: b[id_col], "n_words": b["n_words"], "clf_margin": b["clf_margin"]}
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
