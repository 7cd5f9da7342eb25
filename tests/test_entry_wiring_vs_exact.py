"""Pin the DRIVER WIRING of doc_embedding_near_dups — not just the
operator — against the exact tile sweep on the real documents corpus.

The query is rows-only in the driver's oracle gate (HashEmbedder is not
SQL-expressible), so a recall miss from an undersized ``n_probe`` would be
invisible there; this test closes that hole by running the exact
``_q_doc_embedding_near_dups`` code path (same embedder, same n_centroids
/ n_probe constants) on /root/testdata/sf0.001 and requiring pair-for-pair
equality with the exact O(n^2) sweep at the same threshold.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_doc_embedding_near_dups_wiring_equals_exact_sweep(ray_session):
    import __ray_entry__ as entry
    from clawrag_ray.stages.embed import embed_texts
    from clawrag_ray.stages.similarity import embedding_near_dup_pairs

    ivf = entry.queries()["doc_embedding_near_dups"](SF_DIR)
    ivf = ivf.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    emb = embed_texts(entry._read(SF_DIR, "documents", ["doc_id", "text"]), concurrency=(1, 4))

    def to_vec(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": pc.cast(batch["doc_id"], pa.int64()), "embedding": batch["embedding"]}
        )

    vecs = emb.map_batches(to_vec, batch_format="pyarrow", zero_copy_batch=True)
    exact = embedding_near_dup_pairs(vecs, threshold=0.95)
    exact = exact.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    assert exact.equals(ivf), (
        f"IVF wiring missed/added pairs: ivf={len(ivf)} exact={len(exact)}"
    )
    # the corpus genuinely contains near-dups at this threshold — an empty
    # intersection would make the equality vacuous
    assert len(exact) >= 1


class TestLabelCentroidSimilarity:
    def test_identical_and_orthogonal_labels(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from clawrag_ray.stages.similarity import label_centroid_similarity

        # labels 0 and 1 share the same centroid direction; label 2 orthogonal
        rows = []
        for i in range(10):
            rows.append((0, [1.0, 0.0, 0.0, float(i % 2)]))
            rows.append((1, [2.0, 0.0, 0.0, 2.0 * (i % 2)]))
            rows.append((2, [0.0, 3.0, 0.0, 0.0]))
        t = pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int32()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            }
        )
        got = (
            label_centroid_similarity(ray.data.from_arrow(t).repartition(3))
            .to_pandas()
            .set_index(["label_a", "label_b"])["cosine"]
        )
        assert abs(got.loc[(0, 1)] - 1.0) < 1e-6
        assert abs(got.loc[(0, 2)]) < 1e-6
        assert abs(got.loc[(1, 2)]) < 1e-6
