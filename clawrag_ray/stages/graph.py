"""Graph operators over edge-list Datasets.

Connected components (near-dup cluster consolidation) lives with the
dedup suite (`stages/dedup.py:connected_components`); this module holds
the iterative-computation operators whose state is a node-keyed table
refreshed per round — power iteration over Ray Data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def pagerank(
    edges: Dataset,
    n_iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    ndigits: int = 6,
    num_partitions: int = 64,
    state: str = "broadcast",
) -> Dataset:
    """Unnormalized PageRank over a directed edge list, ``n_iters`` fixed
    power iterations of r(v) = (1-d) + d * sum_{u->v} r(u)/outdeg(u),
    starting from r = 1 (the classic Brin/Page formulation without
    dangling-mass redistribution — documented simplification mirrored by
    the SQL oracle). Nodes = union of sources and destinations; a node
    with no in-edges settles at (1-d). Returns (node, rank rounded to
    ``ndigits``).

    ``state="broadcast"`` (default): the rank/degree state is NODE-sized,
    so it broadcasts once per iteration (ray.put) and each round is one
    map-only contribution pass over the edges plus ONE grouped sum —
    the Ray shape whenever node state fits the object store (up to ~10^9
    nodes). ``state="distributed"``: state never leaves the cluster;
    each round is two distributed keyed joins + one grouped sum — the
    10^12-node path (equality with broadcast pinned by tests; measured
    ~8 s of fixed shuffle-stage overhead per join on the dev VM, which
    is why it is not the default at bench scale)."""
    if state == "distributed":
        return _pagerank_distributed(
            edges, n_iters, damping, src_col, dst_col, ndigits, num_partitions
        )
    if state != "broadcast":
        raise ValueError(f"unknown state mode: {state}")

    import ray
    import ray.data as rd

    from clawrag_ray.stages.relational import pre_aggregate

    edges = edges.select_columns([src_col, dst_col]).materialize()  # reused every round
    # node universe + out-degree: node-sized by definition of this mode
    deg_df = pre_aggregate(edges, [src_col], [], count_alias="deg").to_pandas()
    dst_nodes = pre_aggregate(
        edges.map_batches(
            lambda b: pa.table({src_col: b[dst_col]}), batch_format="pyarrow", zero_copy_batch=True
        ),
        [src_col],
        [],
        count_alias="__n",
    ).to_pandas()[src_col]
    all_nodes = pd.Index(np.union1d(deg_df[src_col].to_numpy(), dst_nodes.to_numpy()), name="node")
    deg = deg_df.set_index(src_col)["deg"].astype("float64").reindex(all_nodes)  # NaN: no out-edges
    ranks = pd.Series(1.0, index=all_nodes)
    base = 1.0 - damping

    for _ in range(n_iters):
        ratio_ref = ray.put((ranks / deg).dropna())  # rank/outdeg per source

        def contrib(b: pa.Table) -> pa.Table:
            ratio = ray.get(ratio_ref)
            src = b[src_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {"node": b[dst_col], "c": pa.array(ratio.reindex(src).to_numpy(), pa.float64())}
            )

        sums = pre_aggregate(
            edges.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True), ["node"], ["c"]
        ).to_pandas()  # node-sized
        in_sum = sums.set_index("node")["sum_c"].reindex(all_nodes).fillna(0.0)
        ranks = base + damping * in_sum

    out = pd.DataFrame({"node": all_nodes.to_numpy(), "rank": np.round(ranks.to_numpy(), ndigits)})
    return rd.from_pandas(out)


def _pagerank_distributed(
    edges: Dataset,
    n_iters: int,
    damping: float,
    src_col: str,
    dst_col: str,
    ndigits: int,
    num_partitions: int,
) -> Dataset:
    """Keyed-join power iteration: the rank table stays in the object
    store; every round is one distributed keyed join attaching (rank,
    deg) state to the out-edges, one grouped contribution sum, and one
    state refresh join. Nothing node-sized touches the driver."""
    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import pre_aggregate

    edges = edges.select_columns([src_col, dst_col]).materialize()
    num_partitions = int(min(num_partitions, max(4, edges.count() // 2000)))

    def srcs(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[src_col]})

    def dsts(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[dst_col]})

    nodes = edges.map_batches(srcs, batch_format="pyarrow", zero_copy_batch=True).union(
        edges.map_batches(dsts, batch_format="pyarrow", zero_copy_batch=True)
    )
    nodes = pre_aggregate(nodes, ["node"], [], count_alias="__n").drop_columns(["__n"]).materialize()
    deg = pre_aggregate(edges, [src_col], [], count_alias="deg").map_batches(
        lambda b: pa.table({"__d": b[src_col], "deg": pc.cast(b["deg"], pa.float64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # fold (rank, deg) into ONE node-keyed state table so each iteration
    # joins state onto edges once, not twice
    state = _keyed_join(
        nodes.map_batches(
            lambda b: b.append_column("rank", pa.array(np.ones(b.num_rows))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node",
        deg,
        "__d",
        ["deg"],
        num_partitions=num_partitions,
        fill_values={"deg": float("nan")},
    ).materialize()

    base = 1.0 - damping
    for _ in range(n_iters):
        with_state = _keyed_join(
            edges,
            src_col,
            state.map_batches(
                lambda b: pa.table({"__s": b["node"], "r": b["rank"], "d": b["deg"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "__s",
            ["r", "d"],
            num_partitions=num_partitions,
        )

        def contrib(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[dst_col], "c": pc.divide(b["r"], b["d"])})

        sums = pre_aggregate(
            with_state.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True),
            ["node"],
            ["c"],
        ).map_batches(
            lambda b: pa.table({"__in": b["node"], "in_sum": b["sum_c"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = _keyed_join(
            state.drop_columns(["rank"]),
            "node",
            sums,
            "__in",
            ["in_sum"],
            num_partitions=num_partitions,
            fill_values={"in_sum": 0.0},
        )
        state = joined.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "deg": b["deg"],
                    "rank": pc.add(base, pc.multiply(damping, b["in_sum"])),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "rank": pc.round(b["rank"], ndigits=ndigits)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
