"""General relational operators: grouped aggregates with per-batch partial
combining, broadcast hash joins, windowed/sessionized event aggregation,
top-k. These give the engine the generic query capabilities a user of the
reference's pandas-agent path (SURVEY.md §2.1 S12) would expect, expressed
Ray-Data-first.

Scale notes:
  * broadcast_join ships the small side ONCE via ray.put; each actor
    resolves the ObjectRef in __init__, not per batch.
  * pre_aggregate() keeps every wide groupby small: the shuffle moves one
    partial row per (key, batch).
  * tumbling windows derive the bucket column vectorized, pre-aggregate,
    then a tiny global groupby; sessionization is a per-user map_groups
    (partitioned by the shuffle key user_id).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum


def pre_aggregate(ds: Dataset, keys: list[str], sums: list[str], count_alias: str = "n") -> Dataset:
    """Two-level grouped aggregate: arrow group_by partials per batch, then
    global groupby over partial rows. Output columns: keys + sum_<col> +
    count_alias."""

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums] + [(keys[0], "count")]
        g = batch.group_by(keys).aggregate(aggs)
        return g.rename_columns(keys + [f"p_{c}" for c in sums] + ["p_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return partials.groupby(keys).aggregate(
        *[Sum(f"p_{c}", alias_name=f"sum_{c}") for c in sums],
        Sum("p_n", alias_name=count_alias),
    )


class BroadcastJoiner:
    """Actor-pool map-side hash join against a broadcast small table.

    The driver calls ray.put(small_df) once; every actor fetches it once in
    __init__ (zero-copy from the local object store) and merges per batch —
    no shuffle (SURVEY.md §2.5 J4 pattern / Ray guide joins section)."""

    def __init__(self, small_ref, on: str, how: str = "inner"):
        self.small = ray.get(small_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(ds: Dataset, small: pd.DataFrame, on: str, how: str = "inner", concurrency=(1, 8)) -> Dataset:
    ref = ray.put(small)
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs={"small_ref": ref, "on": on, "how": how},
        batch_format="pandas",
        concurrency=concurrency,
    )


def tumbling_window(
    ds: Dataset,
    ts_col: str = "ts",
    window: str = "hour",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> Dataset:
    """Tumbling event-time window aggregate: (window_start, *keys,
    n_events, sum_value). Bucket derivation is vectorized (floor_temporal);
    aggregation is partial-then-global."""
    keys = keys or []

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("window_start", pc.floor_temporal(batch[ts_col], unit=window))

    bucketed = ds.select_columns([ts_col, value_col] + keys).map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = pre_aggregate(bucketed, ["window_start"] + keys, [value_col], count_alias="n_events")
    if value_col != "value":
        agg = agg.rename_columns({f"sum_{value_col}": "sum_value"})
    return agg


def sessionize(
    ds: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> Dataset:
    """Session windows per user: events sorted by ts; a gap > gap_minutes
    starts a new session. Returns (user_id, n_sessions, n_events,
    longest_session_events). Partitioned by the groupby(user_id) shuffle;
    per-group logic is vectorized pandas."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values().reset_index(drop=True)
        new_session = ts.diff() > gap
        session_ids = new_session.cumsum()
        sizes = session_ids.value_counts()
        return pd.DataFrame(
            {
                user_col: [g[user_col].iloc[0]],
                "n_sessions": [int(session_ids.nunique())],
                "n_events": [len(g)],
                "longest_session_events": [int(sizes.max())],
            }
        )

    return ds.select_columns([user_col, ts_col]).groupby(user_col).map_groups(per_user, batch_format="pandas")


def top_k(ds: Dataset, by: str, k: int, descending: bool = True) -> Dataset:
    """Global top-k via sort + limit (Ray Data handles the distributed
    boundary merge)."""
    return ds.sort(by, descending=descending).limit(k)


def lineitem_pricing_summary(lineitem: Dataset) -> Dataset:
    """Q1-style pricing summary over lineitem (the canonical wide-aggregate
    exercise): revenue derived vectorized, partial-combined groupby."""

    def derive(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("revenue", disc)

    derived = lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(derive, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    agg = pre_aggregate(
        derived,
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "revenue"],
        count_alias="count_order",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.round(batch["sum_l_quantity"], ndigits=2),
                "sum_base_price": pc.round(batch["sum_l_extendedprice"], ndigits=2),
                "sum_revenue": pc.round(batch["sum_revenue"], ndigits=2),
                "count_order": batch["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(orders: Dataset, customer: pd.DataFrame, nation: pd.DataFrame) -> Dataset:
    """orders ⋈ customer ⋈ nation via a driver-side dim-dim merge plus one
    broadcast join (dimension tables are small by construction), then a
    partial-combined groupby. No shuffle join anywhere."""
    cust_nation = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ].rename(columns={"c_custkey": "o_custkey"})
    joined = broadcast_join(orders.select_columns(["o_custkey", "o_totalprice"]), cust_nation, on="o_custkey")
    agg = pre_aggregate(joined, ["n_name"], ["o_totalprice"], count_alias="n_orders")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch["n_name"],
                "n_orders": batch["n_orders"],
                "total_revenue": pc.round(batch["sum_o_totalprice"], ndigits=2),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
