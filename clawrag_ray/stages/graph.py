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
    seeds=None,
) -> Dataset:
    """Unnormalized PageRank over a directed edge list, ``n_iters`` fixed
    power iterations of r(v) = (1-d)·s(v) + d * sum_{u->v} r(u)/outdeg(u),
    starting from r = s (the classic Brin/Page formulation without
    dangling-mass redistribution — documented simplification mirrored by
    the SQL oracle). By default s = 1 everywhere (global PageRank); pass
    ``seeds`` (an iterable of node ids) for PERSONALIZED PageRank
    (Haveliwala 2002, public): s = 1 on the seed set, 0 elsewhere — the
    topic-/trust-rank restart that scores nodes by proximity to the
    seeds. Nodes = union of sources and destinations; a non-seed node
    with no in-edges settles at 0 under personalization. Returns (node,
    rank rounded to ``ndigits``).

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
        if seeds is not None:
            raise ValueError(
                "personalized restart is broadcast-mode only today (the "
                "distributed swap joins s like the rank table — not built)"
            )
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
    if seeds is None:
        ranks = pd.Series(1.0, index=all_nodes)
        base = 1.0 - damping
    else:
        s = pd.Series(0.0, index=all_nodes)
        s[s.index.isin(np.asarray(list(seeds)))] = 1.0
        ranks = s.copy()
        base = (1.0 - damping) * s

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


def triangle_counts(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 64,
    state: str = "broadcast",
) -> Dataset:
    """Per-node triangle counts over an undirected graph — the classic
    degree-ordered node-iterator (the MapReduce formulation of Suri &
    Vassilvitskii 2011, public). Edges are canonicalized (min, max) and
    deduplicated, self-loops dropped; each edge is then ORIENTED from the
    lower-(degree, node) endpoint to the higher, wedges are generated at
    each node from its out-neighbor list, and a wedge (v, w) is a triangle
    iff the oriented edge (v, w) exists. Degree ordering bounds total
    wedge work at O(m^1.5) regardless of skew (a hub of degree D generates
    no wedges at itself unless its neighbors out-rank it), the property
    that makes the operator survive power-law web graphs.

    Every stage is a bounded dataflow pass: distinct-edge + degree
    aggregates, endpoint degrees attached map-side, ONE hash-partitioned
    wedge-generation pass (numpy triu per node), and the wedge-vs-edge
    existence check as the same union + hash-partitioned merge every
    verify join here uses. Each triangle is found exactly once (at its
    lowest-rank vertex) and credits all three corners.

    ``state="broadcast"`` (default): the (node, deg) table broadcasts once
    (ray.put, searchsorted lookup per batch) and orientation is MAP-SIDE —
    two fewer shuffles; holds to ~10^9 nodes like pagerank's broadcast
    mode. ``state="distributed"``: degrees attach via two keyed joins,
    nothing node-sized leaves the workers — the 10^12-node path. Both
    orders produce identical output (equality pinned in pytest).
    Output: (node, n_tri) for nodes in >= 1 triangle."""
    import ray

    from clawrag_ray.stages.dedup import _keyed_join
    from clawrag_ray.stages.relational import hash_partitioned_groups, pre_aggregate

    def canon(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False)
        d = b[dst_col].to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        return pa.table(
            {"a": pa.array(np.minimum(s, d), pa.int64()), "b": pa.array(np.maximum(s, d), pa.int64())}
        )

    e = pre_aggregate(
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True), ["a", "b"], []
    ).select_columns(["a", "b"]).materialize()

    deg = pre_aggregate(
        e.map_batches(
            lambda b: pa.table({"node": pa.concat_arrays([b["a"].combine_chunks(), b["b"].combine_chunks()])}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["node"],
        [],
        count_alias="deg",
    )

    def orient_arrays(a, bb, da, db) -> pa.Table:
        # rank(u) = (deg, node): orient low -> high
        a_first = (da < db) | ((da == db) & (a < bb))
        u = np.where(a_first, a, bb)
        v = np.where(a_first, bb, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "dv": pa.array(dv, pa.int64()),
            }
        )

    if state == "broadcast":
        deg_df = deg.select_columns(["node", "deg"]).to_pandas()  # node-bounded
        nodes = deg_df["node"].to_numpy()
        order = np.argsort(nodes, kind="mergesort")
        deg_ref = ray.put((nodes[order], deg_df["deg"].to_numpy().astype(np.int64)[order]))

        def orient_bcast(b: pa.Table) -> pa.Table:
            dnodes, ddegs = ray.get(deg_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            da = ddegs[np.searchsorted(dnodes, a)]
            db = ddegs[np.searchsorted(dnodes, bb)]
            return orient_arrays(a, bb, da, db)

        oriented = e.map_batches(orient_bcast, batch_format="pyarrow", zero_copy_batch=True).materialize()
    else:
        with_da = _keyed_join(
            e, "a", deg.select_columns(["node", "deg"]), "node", ["deg"], num_partitions=num_partitions
        )
        with_db = _keyed_join(
            with_da.map_batches(lambda b: b.rename_columns(["a", "b", "deg_a"]), batch_format="pyarrow"),
            "b",
            deg.select_columns(["node", "deg"]),
            "node",
            ["deg"],
            num_partitions=num_partitions,
        )

        def orient(b: pa.Table) -> pa.Table:
            return orient_arrays(
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False),
                pc.cast(b["deg_a"], pa.int64()).to_numpy(zero_copy_only=False),
                pc.cast(b["deg"], pa.int64()).to_numpy(zero_copy_only=False),
            )

        oriented = with_db.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_v, out_w = [], [], []
        for u, grp in g.groupby("u", sort=False):
            if len(grp) < 2:
                continue
            order = np.lexsort((grp["v"].to_numpy(), grp["dv"].to_numpy()))
            nb = grp["v"].to_numpy()[order]  # out-neighbors by ascending rank
            i, j = np.triu_indices(len(nb), k=1)
            out_u.append(np.full(len(i), u, dtype=np.int64))
            out_v.append(nb[i])
            out_w.append(nb[j])
        if not out_u:
            return pd.DataFrame(
                {
                    "wu": pd.array([], dtype="int64"),
                    "wv": pd.array([], dtype="int64"),
                    "ww": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "wu": np.concatenate(out_u),
                "wv": np.concatenate(out_v),
                "ww": np.concatenate(out_w),
            }
        )

    wedge_ds = hash_partitioned_groups(
        oriented.select_columns(["u", "v", "dv"]), ["u"], wedges, num_partitions=num_partitions
    )

    def pack_wedge(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(b["wv"], pa.string()), pc.cast(b["ww"], pa.string()), "_"
        )
        return b.append_column("wk", k)

    def pack_edge(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(b["u"], pa.string()), pc.cast(b["v"], pa.string()), "_"
        )
        return pa.table({"ek": k, "hit": pa.array(np.ones(b.num_rows, dtype=np.int8))})

    tri = _keyed_join(
        wedge_ds.map_batches(pack_wedge, batch_format="pyarrow", zero_copy_batch=True),
        "wk",
        oriented.map_batches(pack_edge, batch_format="pyarrow", zero_copy_batch=True),
        "ek",
        ["hit"],
        num_partitions=num_partitions,
    )

    def corners(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b["wu"].combine_chunks(),
                        b["wv"].combine_chunks(),
                        b["ww"].combine_chunks(),
                    ]
                )
            }
        )

    counts = pre_aggregate(
        tri.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
        [],
        count_alias="n_tri",
    )
    return counts.select_columns(["node", "n_tri"])
