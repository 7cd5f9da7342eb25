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


def _as_arrow_schema(schema) -> pa.Schema:
    """Dataset.schema() -> pyarrow.Schema, tolerating pandas-backed
    datasets whose base schema is a PandasBlockSchema (names + numpy
    dtypes) rather than an Arrow schema."""
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(base.names, base.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
            continue
        try:
            fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
        except (pa.ArrowNotImplementedError, ValueError, TypeError):
            fields.append(pa.field(name, pa.string()))  # object dtype: strings
    return pa.schema(fields)


def hash_partitioned_groups(
    ds: Dataset, keys: list[str], part_fn, num_partitions: int = 64, batch_format: str = "pandas"
) -> Dataset:
    """Run ``part_fn`` once per HASH PARTITION of complete key groups
    instead of once per key: Ray's groupby().map_groups() invokes the fn
    per group, which at 10k+ small groups is dominated by per-call
    overhead. Adding a deterministic ``__part = hash(keys) % P`` column and
    grouping by it keeps each key's rows together while cutting the fn
    calls to P; ``part_fn`` receives a pandas frame holding MANY whole
    groups (plus the ``__part`` column) and must handle them vectorized
    (measured: the sf0.1 asof join dropped 10.8 s -> 3.3 s).

    Memory contract: one partition (~1/num_partitions of the grouped
    columns) must fit a task's pandas heap, and parallelism is capped at
    ``num_partitions`` — size it to ~2-4x the cluster's cores for big
    inputs (callers expose the knob).

    ``batch_format="pyarrow"`` hands ``part_fn`` the partition as a
    pa.Table instead — required when columns carry nested types
    (list<struct> spans) that do not survive a pandas round-trip."""
    import numpy as np

    def add_part(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for i, k in enumerate(keys):
            col = b[k].combine_chunks() if isinstance(b[k], pa.ChunkedArray) else b[k]
            # dtype-STABLE hash: an integer batch containing nulls would
            # convert to float64/NaN while a null-free batch stays int64,
            # and pd.util.hash_array(1) != hash_array(1.0) — the same key
            # would land in different partitions depending on which batch
            # it rode in. Filling nulls (integer sentinel 0) keeps the
            # dtype int64 in every batch; nulls merely co-locate with key
            # 0 — partition placement only, group identity untouched.
            if pa.types.is_integer(col.type) and col.null_count:
                col = col.fill_null(0)
            arr = col.to_numpy(zero_copy_only=False)
            h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(arr)
        return b.append_column("__part", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    if batch_format == "pyarrow":

        def run(t: pa.Table) -> pa.Table:
            return part_fn(t.drop_columns(["__part"]))

    else:

        def run(g: pd.DataFrame) -> pd.DataFrame:
            return part_fn(g.drop(columns=["__part"]))

    parted = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return parted.groupby("__part").map_groups(run, batch_format=batch_format)


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
    num_partitions: int = 64,
) -> Dataset:
    """Session windows per user: events sorted by ts; a gap > gap_minutes
    starts a new session. Returns (user_id, n_sessions, n_events,
    longest_session_events). Partitioned by the groupby(user_id) shuffle;
    per-group logic is vectorized pandas."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # many whole users per partition, one vectorized pass: session ids
        # restart at both gap breaks and user boundaries
        g = g.sort_values([user_col, ts_col], kind="mergesort").reset_index(drop=True)
        new_user = g[user_col] != g[user_col].shift()
        new_session = (g[ts_col].diff() > gap) | new_user
        sid = new_session.cumsum()
        per_sess = (
            pd.DataFrame({user_col: g[user_col], "sid": sid})
            .groupby([user_col, "sid"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out = per_sess.groupby(user_col, sort=False, as_index=False).agg(
            n_sessions=("sid", "count"),
            n_events=("cnt", "sum"),
            longest_session_events=("cnt", "max"),
        )
        return out.astype({"n_sessions": "int64", "n_events": "int64", "longest_session_events": "int64"})

    return hash_partitioned_groups(ds.select_columns([user_col, ts_col]), [user_col], per_part, num_partitions=num_partitions)


def sessionize_bucketed(
    ds: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    bucket_hours: float = 24.0,
) -> Dataset:
    """Two-phase sessionize for pathological users whose event history does
    not fit one group task: events first group by (user, time-bucket) and
    reduce to a per-bucket session SUMMARY (counts plus the first/last
    session sizes and first/last timestamps — the only state a boundary
    merge needs); then a per-user merge over the (tiny) ordered bucket
    summaries stitches sessions that span bucket edges. Output is
    identical to sessionize() for any bucket width."""
    gap = pd.Timedelta(minutes=gap_minutes)
    bucket_us = int(bucket_hours * 3600 * 1_000_000)

    def add_bucket(b: pa.Table) -> pa.Table:
        # normalize to microseconds regardless of the column's unit
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        arr = ts.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(ts, pa.ChunkedArray) else ts.to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(arr // bucket_us, pa.int64()))

    bucketed = ds.select_columns([user_col, ts_col]).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket_part(g: pd.DataFrame) -> pd.DataFrame:
        # one call per hash partition of whole (user, bucket) groups — the
        # hash_partitioned_groups shape, not one fn call per group
        rows = []
        for (u, bk), grp in g.groupby([user_col, "__bucket"], sort=False, dropna=False):
            ts = grp[ts_col].sort_values().reset_index(drop=True)
            sid = (ts.diff() > gap).cumsum()
            sizes = sid.value_counts().sort_index()
            z = sizes.to_numpy()
            mid_max = int(z[1:-1].max()) if len(z) > 2 else 0
            rows.append((u, bk, ts.iloc[0], ts.iloc[-1], len(ts), len(z), int(z[0]), int(z[-1]), mid_max))
        return pd.DataFrame(
            rows,
            columns=[user_col, "__bucket", "first_ts", "last_ts", "n_events", "m", "z_first", "z_last", "mid_max"],
        )

    summaries = hash_partitioned_groups(bucketed, [user_col, "__bucket"], per_bucket_part)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for u, gu in g.groupby(user_col, sort=False, dropna=False):
            gu = gu.sort_values("__bucket").reset_index(drop=True)
            total = 0
            longest = 0
            open_size = None
            prev_last_ts = None
            for row in gu.itertuples(index=False):
                merging = open_size is not None and (row.first_ts - prev_last_ts) <= gap
                f = (open_size + row.z_first) if merging else row.z_first
                if open_size is not None and not merging:
                    total += 1
                    longest = max(longest, open_size)
                if row.m == 1:
                    open_size = f
                else:
                    total += 1 + (row.m - 2)
                    longest = max(longest, f, row.mid_max)
                    open_size = row.z_last
                prev_last_ts = row.last_ts
            if open_size is not None:
                total += 1
                longest = max(longest, open_size)
            out.append((u, total, int(gu["n_events"].sum()), longest))
        return pd.DataFrame(out, columns=[user_col, "n_sessions", "n_events", "longest_session_events"])

    return hash_partitioned_groups(summaries, [user_col], merge_part)


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


def hash_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> Dataset:
    """Big-big distributed hash join (both sides shuffle by key) — the
    complement of broadcast_join for when neither side fits in one object.
    Thin wrapper over ray.data.Dataset.join with explicit partition count
    (size to cluster: ~2-4x total CPUs; skewed keys need salting upstream)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def runtime_filtered_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
    n_bits: int = 1 << 22,
    n_hashes: int = 4,
) -> Dataset:
    """Runtime-filter join (sideways information passing — the classic
    engine optimization for SELECTIVE big-big joins): the right side's
    join keys fold into a distributed Bloom filter (per-block partials,
    fixed-fan-in OR-reduce, n_bits/8 bytes broadcast once) and left rows
    whose key is PROVABLY absent from the right drop map-side — they never
    enter the join shuffle. Bloom false positives survive the prefilter
    but the exact hash join removes them, so the output equals
    hash_join(..., "inner") row-for-row; only the shuffle volume changes
    (by the join selectivity, e.g. ~5x for a 20%-selective dimension
    filter). Inner joins only — an outer join must keep the misses."""
    from clawrag_ray.stages.dedup import bloom_test_mask, build_bloom_ref

    rkey = right_on or on
    bloom_ref = build_bloom_ref(right.select_columns([rkey]), rkey, n_bits, n_hashes)

    def prefilter(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b
        return b.filter(pa.array(bloom_test_mask(b, on, bloom_ref, n_bits, n_hashes)))

    filtered = left.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return hash_join(filtered, right, on, right_on, "inner", num_partitions)


def salted_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    hot_keys=None,
    salt: int = 8,
    num_partitions: int = 16,
) -> Dataset:
    """Big-big INNER join with HOT-KEY salting — the skew fix for joins
    where one key holds a large fraction of the left side (the web-scale
    'one domain is 10% of the crawl' case): a hot key's left rows scatter
    round-robin across ``salt`` sub-keys and its right rows replicate
    ``salt`` times, turning one straggler partition into ``salt`` balanced
    ones. Non-hot keys ride sub-key 0 untouched. Sub-key placement varies
    with block layout (only balance depends on it); the OUTPUT equals
    hash_join(..., 'inner') row-for-row regardless, because every left row
    meets exactly the replica carrying its own sub-key.

    ``hot_keys``: explicit list, or None to auto-detect via the
    heavy-hitter candidate pass (keys holding > left_rows/capacity).
    Right-side replication cost = salt x |right rows with hot keys| —
    bounded by construction since hot keys are few."""
    import numpy as np

    rkey = right_on or on

    if hot_keys is None:
        # dtype-generic hot-key sniff (heavy_hitters' sentinel scheme is
        # string-keyed): per-block top-``capacity`` value counts summed —
        # a LOWER bound per key, so a key flagged hot truly is; a key whose
        # mass hides below per-block truncation merely stays unsalted
        # (balance heuristic only; correctness never depends on detection)
        capacity = 64

        def block_top(b: pa.Table) -> pa.Table:
            col = b[on].combine_chunks() if isinstance(b[on], pa.ChunkedArray) else b[on]
            vc = pc.value_counts(col)
            vals, cnts = vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)
            if len(vals) > capacity:
                keep = np.argpartition(cnts, -capacity)[-capacity:]
                vals, cnts = vals.take(pa.array(keep)), cnts[keep]
            return pa.table({on: vals, "p": pa.array(cnts, pa.int64())})

        cand = pre_aggregate(
            left.select_columns([on]).map_batches(
                block_top, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            ),
            [on],
            ["p"],
        ).to_pandas()
        n_left = left.count()
        hot_keys = [k for k, c in zip(cand[on], cand["sum_p"]) if c * 16 > n_left]
    hot = set(hot_keys)
    if not hot:
        return hash_join(left, right, on, right_on, "inner", num_partitions)

    def salt_left(b: pa.Table) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False)
        ishot = np.isin(keys, np.asarray(list(hot)))
        sub = np.where(ishot, np.arange(len(keys), dtype=np.int64) % salt, 0)
        return b.append_column("__sk", pa.array(sub, pa.int64()))

    def replicate_right(b: pa.Table) -> pa.Table:
        keys = b[rkey].to_numpy(zero_copy_only=False)
        ishot = np.isin(keys, np.asarray(list(hot)))
        reps = np.where(ishot, salt, 1)
        idx = np.repeat(np.arange(len(keys), dtype=np.int64), reps)
        out = b.take(pa.array(idx))
        # sub-key sequence: 0..salt-1 for hot rows, 0 for the rest
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
        sub = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
        return out.append_column("__sk", pa.array(sub, pa.int64()))

    lsalted = left.map_batches(salt_left, batch_format="pyarrow", zero_copy_batch=True)
    rsalted = right.map_batches(replicate_right, batch_format="pyarrow", zero_copy_batch=True)
    joined = lsalted.join(
        rsalted,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, "__sk"),
        right_on=(rkey, "__sk") if rkey != on else None,
    )
    return joined.drop_columns(["__sk"])


def semi_join(
    left: Dataset, on: str, right: Dataset, right_on: str | None = None, num_partitions: int = 64
) -> Dataset:
    """Distributed LEFT SEMI join: left rows whose key appears in
    ``right`` — the EXISTS filter. See anti_join for the shape."""
    return _semi_anti(left, on, right, right_on or on, anti=False, num_partitions=num_partitions)


def anti_join(
    left: Dataset, on: str, right: Dataset, right_on: str | None = None, num_partitions: int = 64
) -> Dataset:
    """Distributed LEFT ANTI join: left rows whose key does NOT appear in
    ``right`` — the NOT EXISTS filter (orphan detection, "never
    converted" cohorts). Both sides shuffle ONCE by key through the
    union + hash-partitioned-pass shape (no Dataset.join fixed setup,
    no driver state): right contributes only per-batch-deduplicated key
    rows, so its shuffle volume is distinct-keys-per-block, not rows.
    For a bounded right side prefer the broadcast ID-set filter; for a
    huge seen-side by CONTENT prefer dedup.bloom_anti_join."""
    return _semi_anti(left, on, right, right_on or on, anti=True, num_partitions=num_partitions)


def _semi_anti(
    left: Dataset, on: str, right: Dataset, right_on: str, anti: bool, num_partitions: int
) -> Dataset:
    import numpy as np

    left_schema = _as_arrow_schema(left.schema())
    cols = left_schema.names

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column("__side", pa.array(np.zeros(b.num_rows, dtype=np.int8)))

    def right_keys(b: pa.Table) -> pa.Table:
        col = b[right_on]
        # a NULL key never matches in SQL EXISTS/NOT EXISTS — drop it from
        # the membership set (pyarrow is_in would otherwise match nulls)
        keys = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).drop_null().unique()
        out = {}
        for name in cols:
            out[name] = keys if name == on else pa.nulls(len(keys), left_schema.field(name).type)
        out["__side"] = pa.array(np.ones(len(keys), dtype=np.int8))
        return pa.table(out)

    unioned = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.select_columns([right_on]).map_batches(right_keys, batch_format="pyarrow", zero_copy_batch=True)
    )

    # Arrow-mode partition pass: the null-padded union would otherwise
    # float-ify int columns through a pandas round-trip
    def per_part(g: pa.Table) -> pa.Table:
        keys = g.filter(pc.equal(g["__side"], 1))[on]
        present = (keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys).drop_null().unique()
        # NULL left keys: is_in yields null -> fill false, so semi drops
        # them and anti keeps them, matching SQL null-equality semantics
        lhs = g.filter(pc.equal(g["__side"], 0))
        mask = pc.fill_null(pc.is_in(lhs[on], value_set=present), False)
        return lhs.filter(pc.invert(mask) if anti else mask).select(cols)

    out = hash_partitioned_groups(unioned, [on], per_part, num_partitions=num_partitions, batch_format="pyarrow")
    # an all-empty result would otherwise lose its schema (Ray drops empty
    # map_groups blocks); one typed zero-row block pins it
    import ray.data as rd

    return out.union(rd.from_arrow(left_schema.empty_table()))


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    right_by: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    right_tiebreak: str | None = None,
    ts_bucket_us: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """As-of join (Ray Data has no native one — task-level custom operator):
    for each left row, attach the LATEST right row of the same ``by`` key
    with ``right_ts`` <= ``left_ts``; right columns are null when no such
    row exists.

    ``right_tiebreak``: when several right rows share (key, ts), the row
    with the GREATEST tiebreak value wins — without it the winner would be
    whichever tied row the shuffle delivered last (nondeterministic).
    Matched rows take the winning right row's ACTUAL values (a legitimate
    null right value propagates as null; the fill is by row index, not by
    value).

    Implementation: tag both sides, union, groupby(key), per-group sort by
    (ts, side, tiebreak) and vectorized forward-fill of the winning right
    ROW INDEX — one shuffle, no per-row search.

    Partitioning: rows shuffle by hash(key) into ``num_partitions``
    partitions processed vectorized (one partition's rows must fit a task;
    size num_partitions accordingly).
    ``ts_bucket_us`` lifts that for pathological keys by time-bucketing the
    shuffle key to (key, ts-bucket): each bucket joins locally after a
    CARRY row — the latest right row from any earlier bucket — is routed to
    every bucket with left rows (two small extra aggregates over per-bucket
    summaries, never raw rows). Output identical to the unbucketed path."""
    import numpy as np

    left_schema = _as_arrow_schema(left.schema())
    left_cols = list(left_schema.names)
    left_only = [c for c in left_cols if c not in (by, left_ts)]
    left_only_types = {c: left_schema.field(c).type for c in left_only}
    right_schema = _as_arrow_schema(right.schema())
    right_types = {c: right_schema.field(c).type for c in right_value_cols}

    # union requires identical schemas: each side fills the other side's
    # columns with nulls
    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__key": b[by], "__ts": b[left_ts], "__side": pa.array([1] * n, pa.int8())}
        for c in left_only:
            cols[c] = b[c]
        for c in right_value_cols:
            cols[c] = pa.nulls(n, right_types[c])
        return pa.table(cols)

    tb_cols = [right_tiebreak] if right_tiebreak and right_tiebreak not in right_value_cols else []

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__key": b[right_by], "__ts": b[right_ts], "__side": pa.array([0] * n, pa.int8())}
        for c in left_only:
            cols[c] = pa.nulls(n, left_only_types[c])
        for c in right_value_cols:
            cols[c] = b[c]
        if right_tiebreak:
            cols["__tb"] = b[right_tiebreak]
        return pa.table(cols)

    if right_tiebreak:

        def tag_left_tb(b: pa.Table) -> pa.Table:
            t = tag_left(b)
            return t.append_column("__tb", pa.nulls(t.num_rows, right_schema.field(right_tiebreak).type))

        lt = left.map_batches(tag_left_tb, batch_format="pyarrow", zero_copy_batch=True)
    else:
        lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns([right_by, right_ts] + right_value_cols + tb_cols).map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        """Process one hash partition holding MANY complete key groups —
        one vectorized pass instead of one task per key (measured 10.8 s ->
        ~3 s on the 100k-event asof at sf0.1 with ~10k distinct keys).

        Right rows (side 0) sort before left rows at equal (key, ts) -> a
        right row at exactly left_ts matches (<= semantics, DuckDB ASOF
        parity); among right rows tied on ts, ascending tiebreak puts the
        greatest value LAST so the index-ffill picks it deterministically.
        The ffill runs across the whole partition and cross-key fills are
        invalidated by comparing the gathered row's key."""
        sort_cols = ["__key", "__ts", "__side"] + (["__tb"] if right_tiebreak else [])
        g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        is_right = (g["__side"] == 0).to_numpy()
        # forward-fill the winning right ROW INDEX, then gather values by
        # index — a matched row's legitimately-null right value stays null
        ridx = pd.Series(np.where(is_right, np.arange(len(g)), np.nan)).ffill()
        out = g[g["__side"] == 1].copy()
        pos = ridx[~is_right]
        matched = pos.notna().to_numpy()
        gather = pos.fillna(0).astype(int).to_numpy()
        keys = g["__key"].to_numpy()
        matched &= keys[gather] == out["__key"].to_numpy()  # no cross-key fill
        for col in right_value_cols:
            vals = g[col].to_numpy()[gather]
            out[col] = pd.Series(vals, index=out.index).where(matched)
        keep = ["__key", "__ts"] + left_only + right_value_cols
        out = out[keep].rename(columns={"__key": by, "__ts": left_ts})
        # the side-union floats integer columns (NaN padding); restore
        # nullable ints so joined ids compare as ints downstream
        for c, typ in list(left_only_types.items()) + list(right_types.items()):
            if pa.types.is_integer(typ):
                out[c] = out[c].astype("Int64")
        return out

    def _hash_part(arr: np.ndarray, extra: np.ndarray | None = None) -> np.ndarray:
        h = pd.util.hash_array(arr)  # deterministic across processes
        if extra is not None:
            h = h + extra.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(num_partitions)).astype(np.int64)

    def add_part(b: pa.Table) -> pa.Table:
        keys = b["__key"].combine_chunks() if isinstance(b["__key"], pa.ChunkedArray) else b["__key"]
        karr = keys.to_numpy(zero_copy_only=False)
        extra = None
        if "__bucket" in b.column_names:
            bk = b["__bucket"].combine_chunks() if isinstance(b["__bucket"], pa.ChunkedArray) else b["__bucket"]
            extra = bk.to_numpy(zero_copy_only=False)
        return b.append_column("__part", pa.array(_hash_part(karr, extra)))

    if not ts_bucket_us:
        parted = lt.union(rt).map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        return parted.groupby("__part").map_groups(per_part, batch_format="pandas")

    # ---- bucketed variant: shuffle key is (key, ts-bucket) ----
    tagged_cols = ["__key", "__ts", "__side"] + left_only + right_value_cols + (["__tb"] if right_tiebreak else [])

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b["__ts"], pa.timestamp("us")), pa.int64())
        arr = ts.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(ts, pa.ChunkedArray) else ts.to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(arr // ts_bucket_us, pa.int64()))

    ltb = lt.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    rtb = rt.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # per-(key, bucket) latest right row — a summary, one row per bucket
    def latest_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = ["__ts"] + (["__tb"] if right_tiebreak else [])
        return g.sort_values(sort_cols, kind="mergesort").tail(1)

    right_latest = rtb.groupby(["__key", "__bucket"]).map_groups(latest_in_bucket, batch_format="pandas")

    # distinct (key, bucket) pairs that contain LEFT rows (partial distinct
    # per batch, then the groupby collapse — presence rows only)
    def left_presence_partial(b: pa.Table) -> pa.Table:
        return b.select(["__key", "__bucket"]).group_by(["__key", "__bucket"]).aggregate([])

    presence = (
        ltb.map_batches(left_presence_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["__key", "__bucket"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    # route the latest earlier-bucket right row (carry) to each left bucket:
    # group BOTH summary kinds by key; rights are marked __p=0, lefts __p=1
    ts_type = left_schema.field(left_ts).type
    key_type = left_schema.field(by).type
    want_types = {"__key": key_type, "__ts": ts_type, "__side": pa.int8(), "__bucket": pa.int64()}
    want_types.update(left_only_types)
    want_types.update(right_types)
    if right_tiebreak:
        want_types["__tb"] = right_schema.field(right_tiebreak).type

    def mark(b: pa.Table, p: int) -> pa.Table:
        # rebuild in canonical column order with canonical types: summary
        # rows round-tripped through pandas carry float64 for all-null int
        # columns and ns timestamps — casts realign them for the unions
        n = b.num_rows
        cols = {}
        for c in tagged_cols + ["__bucket"]:
            want = want_types[c]
            if c in b.column_names:
                cols[c] = pc.cast(b[c], want)
            elif c == "__side":
                cols[c] = pa.array([0] * n, pa.int8())
            else:
                cols[c] = pa.nulls(n, want)
        return pa.table(cols).append_column("__p", pa.array([p] * n, pa.int8()))

    rl_marked = right_latest.map_batches(lambda b: mark(b, 0), batch_format="pyarrow")
    pr_marked = presence.map_batches(lambda b: mark(b, 1), batch_format="pyarrow")

    def emit_carry(g: pd.DataFrame) -> pd.DataFrame:
        rights = g[g["__p"] == 0].sort_values("__bucket").reset_index(drop=True)
        lefts = g[g["__p"] == 1]
        out_rows = []
        if len(rights):
            rbuckets = rights["__bucket"].to_numpy()
            for b in lefts["__bucket"]:
                i = int(np.searchsorted(rbuckets, b, side="left")) - 1  # last bucket < b
                if i >= 0:
                    row = rights.iloc[i].copy()
                    row["__bucket"] = b
                    out_rows.append(row)
        cols = [c for c in g.columns if c != "__p"]
        if not out_rows:
            return g.iloc[0:0][cols]
        return pd.DataFrame(out_rows)[cols]

    def normalize(b: pa.Table) -> pa.Table:
        cols = {c: pc.cast(b[c], want_types[c]) for c in tagged_cols + ["__bucket"]}
        return pa.table(cols)

    carry = (
        rl_marked.union(pr_marked)
        .groupby("__key")
        .map_groups(emit_carry, batch_format="pandas")
        .map_batches(normalize, batch_format="pyarrow")
    )
    # shuffle by hash(key, bucket): every (key, bucket) group lands whole in
    # one partition; per_part's (key, ts) sort makes co-resident rows from
    # other buckets of the same key harmless (they are either legitimate
    # earlier matches or sort after every left row of earlier buckets)
    parted = (
        ltb.union(rtb)
        .union(carry)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    )
    return parted.groupby("__part").map_groups(per_part, batch_format="pandas")


def grouped_quantiles(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    quantiles: list[float],
    ndigits: int = 4,
    num_partitions: int = 64,
) -> Dataset:
    """Exact per-group quantiles (linear interpolation — numpy percentile
    and SQL quantile_cont agree). Per-group exact math needs the group's
    values together -> ONE hash-partitioned shuffle (the same
    hash_partitioned_groups shape as every other grouped op here; one
    map_groups call per partition of whole key groups, not per key);
    grouped_quantiles_tdigest is the sketch-state swap (same output
    schema) for 10^12-row groups."""
    import numpy as np

    # round() not int(): int truncates float artifacts (q=0.29 -> 28.999 -> 'p28')
    qcols = [f"p{int(round(q * 100))}" for q in quantiles]
    qpcts = [q * 100 for q in quantiles]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {k: [] for k in keys}
        for name in qcols:
            rows[name] = []
        rows["n"] = []
        for key_vals, grp in g.groupby(keys, sort=False, dropna=False):
            if not isinstance(key_vals, tuple):
                key_vals = (key_vals,)
            vals = grp[value_col].to_numpy(dtype=float)
            pcts = np.percentile(vals, qpcts)
            for k, kv in zip(keys, key_vals):
                rows[k].append(kv)
            for name, v in zip(qcols, pcts):
                rows[name].append(round(float(v), ndigits))
            rows["n"].append(len(vals))
        out = pd.DataFrame(rows)
        out["n"] = out["n"].astype("int64")
        return out

    return hash_partitioned_groups(
        ds.select_columns(keys + [value_col]), keys, per_part, num_partitions=num_partitions
    )


def _merge_centroids(means: "np.ndarray", weights: "np.ndarray", compression: int):
    """Deterministic t-digest-style merge (uniform k0 scale): centroids
    sorted by mean, adjacent centroids greedily coalesced so no merged
    centroid exceeds W/compression weight. Rank error of any quantile read
    from the result is bounded by the largest centroid's half-weight, i.e.
    <= W/compression ranks (documented bound; exact when nothing merges)."""
    import numpy as np

    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    if len(means) <= compression:
        return means, weights
    w_total = float(weights.sum())
    cap = w_total / compression
    out_m, out_w = [], []
    acc_w, acc_mw = 0.0, 0.0
    for m, w in zip(means, weights):
        if acc_w and acc_w + w > cap:
            out_m.append(acc_mw / acc_w)
            out_w.append(acc_w)
            acc_w, acc_mw = 0.0, 0.0
        acc_w += w
        acc_mw += m * w
    if acc_w:
        out_m.append(acc_mw / acc_w)
        out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w)


def _centroid_quantile(means: "np.ndarray", weights: "np.ndarray", q: float) -> float:
    """Quantile from weighted centroids: linear interpolation between
    centroid means placed at their rank midpoints. When every centroid is
    a singleton (weight 1) this IS numpy's linear percentile — and
    therefore SQL quantile_cont — exactly."""
    import numpy as np

    cum = np.cumsum(weights)
    w_total = cum[-1]
    mid = cum - (weights + 1.0) / 2.0  # 0-indexed rank midpoint of each centroid
    target = q * (w_total - 1.0)
    return float(np.interp(target, mid, means))


def grouped_quantiles_tdigest(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    quantiles: list[float],
    ndigits: int = 4,
    compression: int = 8192,
    num_partitions: int = 64,
) -> Dataset:
    """Sketch-based grouped quantiles — the 10^12-rows-per-group swap for
    grouped_quantiles, same output schema: per-batch partial DIGESTS (one
    (means, weights) centroid list per key per batch, each capped at
    ``compression`` centroids) shuffle instead of raw values; a
    hash-partitioned pass merges each key's partials and reads the
    quantiles off the merged digest.

    Exactness contract: while a group's total row count stays <=
    ``compression`` every centroid remains a singleton and the result
    equals the exact path / SQL quantile_cont bit-for-bit (pinned in
    tests); beyond that the rank error is bounded by W/compression per
    query (see _merge_centroids). State per (key, partial) is O(compression)
    regardless of group size — the property the exact path lacks."""
    import numpy as np

    qcols = [f"p{int(round(q * 100))}" for q in quantiles]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key_vals, g in b.groupby(keys, sort=False, dropna=False):
            vals = g[value_col].to_numpy(dtype=float)
            m, w = _merge_centroids(vals, np.ones(len(vals)), compression)
            key_vals = key_vals if isinstance(key_vals, tuple) else (key_vals,)
            rows.append(dict(zip(keys, key_vals)) | {"means": m.tolist(), "weights": w.tolist()})
        return pd.DataFrame(rows)

    partials = ds.select_columns(keys + [value_col]).map_batches(partial, batch_format="pandas")

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key_vals, kg in g.groupby(keys, sort=False, dropna=False):
            means = np.concatenate([np.asarray(m, dtype=float) for m in kg["means"]])
            weights = np.concatenate([np.asarray(w, dtype=float) for w in kg["weights"]])
            m, w = _merge_centroids(means, weights, compression)
            key_vals = key_vals if isinstance(key_vals, tuple) else (key_vals,)
            row = dict(zip(keys, key_vals))
            for q, name in zip(quantiles, qcols):
                row[name] = round(_centroid_quantile(m, w, q), ndigits)
            row["n"] = int(round(weights.sum()))
            rows.append(row)
        return pd.DataFrame(rows)

    return hash_partitioned_groups(partials, keys, merge_part, num_partitions=num_partitions)


def distinct_count(ds: Dataset, keys: list[str], value_col: str) -> Dataset:
    """count(DISTINCT value) per key, two-level: per-batch arrow distinct
    (key, value) pairs first, then a pair-level groupby collapse, then the
    tiny per-key count — the shuffle moves one row per distinct pair per
    batch, never raw rows. distinct_count_hll is the sketch-state swap
    (same output schema) for 10^12-row groups."""
    from ray.data.aggregate import Count

    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.select(keys + [value_col]).group_by(keys + [value_col]).aggregate([])

    pairs = ds.map_batches(batch_distinct, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    collapsed = pairs.groupby(keys + [value_col]).aggregate(Count(alias_name="_dup"))
    return collapsed.groupby(keys[0] if len(keys) == 1 else keys).aggregate(
        Count(alias_name=f"n_distinct_{value_col}")
    ).select_columns(keys + [f"n_distinct_{value_col}"])


def _bit_length_u64(x: "np.ndarray") -> "np.ndarray":
    """Exact vectorized bit_length for uint64 (6 shift/compare steps — no
    float log2, whose rounding miscounts near powers of two)."""
    import numpy as np

    r = np.zeros(len(x), dtype=np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        r[m] += s
        x[m] >>= np.uint64(s)
    return r + (x > 0)


def distinct_count_hll(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    precision: int = 12,
    sparse_limit: int = 4096,
    num_partitions: int = 64,
) -> Dataset:
    """Sketch-based count(DISTINCT) — the 10^12-rows-per-group swap for
    distinct_count, same output schema (keys + n_distinct_<value_col>).

    The production HLL shape (sparse -> dense, as in Redis/BigQuery): each
    (key, batch) partial emits its distinct value hashes while they number
    <= ``sparse_limit``, else folds to 2^precision max-rank registers; the
    per-key merge unions sparse partials (EXACT count — bit-for-bit equal
    to distinct_count / SQL count(DISTINCT) while a key's true distinct
    count stays under sparse_limit, pinned in tests) and otherwise merges
    registers and reads the bias-corrected HLL estimate (standard error
    1.04/sqrt(2^precision) ~ 1.6% at the default p=12; linear counting for
    the small-range regime). Per-partial state is O(sparse_limit +
    2^precision) regardless of group size. Hashing is pd.util.hash_array
    (deterministic across processes — the same primitive the partitioner
    relies on)."""
    import numpy as np

    m = 1 << precision
    alpha = 0.7213 / (1 + 1.079 / m)
    out_col = f"n_distinct_{value_col}"

    def to_registers(hashes: "np.ndarray") -> "np.ndarray":
        h = hashes.view(np.uint64) if hashes.dtype != np.uint64 else hashes
        idx = (h >> np.uint64(64 - precision)).astype(np.int64)
        rem = h & np.uint64((1 << (64 - precision)) - 1)
        rho = (64 - precision) - _bit_length_u64(rem) + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, idx, rho)
        return regs

    def estimate(regs: "np.ndarray") -> int:
        e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
        zeros = int((regs == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting (small-range correction)
        return int(round(e))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key_vals, g in b.groupby(keys, sort=False, dropna=False):
            h = np.unique(pd.util.hash_array(g[value_col].to_numpy()))
            key_vals = key_vals if isinstance(key_vals, tuple) else (key_vals,)
            if len(h) <= sparse_limit:
                rows.append(dict(zip(keys, key_vals)) | {"mode": 0, "payload": h.view(np.int64).tolist()})
            else:
                rows.append(dict(zip(keys, key_vals)) | {"mode": 1, "payload": to_registers(h).tolist()})
        return pd.DataFrame(rows)

    partials = ds.select_columns(keys + [value_col]).map_batches(partial, batch_format="pandas")

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key_vals, kg in g.groupby(keys, sort=False, dropna=False):
            sparse = [np.asarray(p, dtype=np.int64) for p, md in zip(kg["payload"], kg["mode"]) if md == 0]
            dense = [np.asarray(p, dtype=np.int64) for p, md in zip(kg["payload"], kg["mode"]) if md == 1]
            union = np.unique(np.concatenate(sparse)) if sparse else np.array([], dtype=np.int64)
            if not dense and len(union) <= sparse_limit:
                count = len(union)
            else:
                regs = to_registers(union) if len(union) else np.zeros(m, dtype=np.int64)
                for d in dense:
                    regs = np.maximum(regs, d)
                count = estimate(regs)
            key_vals = key_vals if isinstance(key_vals, tuple) else (key_vals,)
            rows.append(dict(zip(keys, key_vals)) | {out_col: count})
        return pd.DataFrame(rows).astype({out_col: "int64"})

    return hash_partitioned_groups(partials, keys, merge_part, num_partitions=num_partitions)


def top_n_per_group(
    ds: Dataset,
    keys: list[str],
    order_col: str,
    n: int,
    tiebreak_col: str | None = None,
    salt: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Top-n rows per group by ``order_col`` desc (window rank semantics).
    Per-group head after the groupby shuffle; ``tiebreak_col`` ascending
    makes results deterministic under ties.

    ``salt``: two-phase variant for pathological keys whose rows exceed one
    group task. Rows first split into ``salt`` subgroups (arbitrary
    assignment — top-n is a selection, so any split is correct), each
    subgroup takes a local top-n, then the survivors (<= salt*n per key)
    take the global top-n. Identical output to the single-phase path."""

    by = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    asc = [False] + ([True] if tiebreak_col else [])

    def head_part(group_keys: list[str]):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(by, ascending=asc, kind="mergesort")
            return g.groupby(group_keys, sort=False, as_index=False, group_keys=False).head(n)

        return fn

    if not salt or salt <= 1:
        return hash_partitioned_groups(ds, keys, head_part(keys), num_partitions=num_partitions)
    import numpy as np

    def add_salt(b: pa.Table) -> pa.Table:
        return b.append_column("__salt", pa.array(np.arange(b.num_rows) % salt, pa.int32()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    local = hash_partitioned_groups(salted, keys + ["__salt"], head_part(keys + ["__salt"]), num_partitions=num_partitions)
    return hash_partitioned_groups(local.drop_columns(["__salt"]), keys, head_part(keys), num_partitions=num_partitions)


def hopping_window(
    ds: Dataset,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    size_minutes: int = 60,
    hop_minutes: int = 30,
) -> Dataset:
    """Hopping (sliding) event-time windows: each event lands in
    size/hop overlapping windows (explode vectorized per batch), then the
    standard partial-combined aggregate. Output: (window_start, *keys,
    n_events, sum_value)."""
    keys = keys or []
    n_windows = size_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def explode(b: pa.Table) -> pa.Table:
        import numpy as np

        ts = pc.cast(b[ts_col], pa.int64())  # microseconds since epoch
        # numpy // floors toward -inf (arrow divide truncates toward zero,
        # which would misalign pre-epoch/negative timestamps)
        ts_np = ts.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(ts, pa.ChunkedArray) else ts.to_numpy(zero_copy_only=False)
        base = pa.array((ts_np // hop_us) * hop_us, pa.int64())  # newest window start
        parts = []
        for i in range(n_windows):
            start = pc.subtract(base, i * hop_us)
            t = b.select(keys + [value_col]).append_column("window_start", pc.cast(start, b[ts_col].type))
            parts.append(t)
        return pa.concat_tables(parts)

    exploded = ds.select_columns([ts_col, value_col] + keys).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = pre_aggregate(exploded, ["window_start"] + keys, [value_col], count_alias="n_events")
    if value_col != "value":
        agg = agg.rename_columns({f"sum_{value_col}": "sum_value"})
    return agg


def range_join(
    left: Dataset,
    right: Dataset,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: str | None = None,
    right_by: str | None = None,
    right_keep: list[str] | None = None,
    bucket_us: int = 86_400_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Range (interval) join — another operator Ray Data lacks natively:
    each left row pairs with every right row whose [start, end) interval
    contains its timestamp (optionally also matching ``by`` == ``right_by``).

    Distribution: time is cut into ``bucket_us`` buckets; left rows land in
    their timestamp's bucket once, right INTERVALS are replicated to every
    bucket they overlap (intervals are assumed short relative to the
    corpus; replication factor = interval span / bucket width). A
    hash(key, bucket) shuffle then co-locates candidates, and each
    partition resolves the containment predicate with one vectorized
    pandas merge — no all-pairs scan, no single giant group."""
    import numpy as np

    right_keep = right_keep or []

    def bucket_of(col) -> np.ndarray:
        arr = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return arr.to_numpy(zero_copy_only=False)

    def tag_left(b: pa.Table) -> pa.Table:
        ts = bucket_of(b[left_ts])
        cols = {c: b[c] for c in b.column_names}
        cols["__bucket"] = pa.array(ts // bucket_us, pa.int64())
        cols["__side"] = pa.array([1] * b.num_rows, pa.int8())
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        starts = bucket_of(b[right_start])
        ends = bucket_of(b[right_end])
        first = starts // bucket_us
        last = np.maximum(first, (ends - 1) // bucket_us)  # end exclusive
        idx, buckets = [], []
        for i, (f, l) in enumerate(zip(first, last)):
            for bk in range(f, l + 1):
                idx.append(i)
                buckets.append(bk)
        taken = b.take(pa.array(idx, pa.int64()))
        cols = {c: taken[c] for c in taken.column_names}
        if by and right_by and right_by != by:
            # the key must share ONE name before the union so right rows
            # hash-partition on the key value, not on a null pad column
            cols[by] = cols.pop(right_by)
        cols["__bucket"] = pa.array(buckets, pa.int64())
        cols["__side"] = pa.array([0] * len(idx), pa.int8())
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)

    left_cols = list(left.schema().names)
    right_cols = [right_start, right_end] + right_keep

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 1][left_cols + ["__bucket"]]
        # each right interval appears exactly once per bucket and each left
        # row lives in exactly one bucket, so the merge yields every
        # qualifying (left, right) pair exactly once — multiset-correct
        rf = g[g["__side"] == 0][right_cols + ([by] if by else []) + ["__bucket"]]
        join_on = ([by] if by else []) + ["__bucket"]
        m = lf.merge(rf, on=join_on, how="inner")
        m = m[(m[left_ts] >= m[right_start]) & (m[left_ts] < m[right_end])]
        m = m.drop(columns=["__bucket"])
        # the side union NaN-pads integer columns into floats; restore
        for c in m.columns:
            if c in all_fields and pa.types.is_integer(all_fields[c]):
                m[c] = m[c].astype("Int64")
        return m

    keys = ([by] if by else []) + ["__bucket"]
    # union needs identical schemas; sides differ -> pad with typed nulls
    l_schema = _as_arrow_schema(lt.schema())
    r_schema = _as_arrow_schema(rt.schema())
    all_fields: dict[str, pa.DataType] = {}
    for sch in (l_schema, r_schema):
        for f in sch:
            all_fields.setdefault(f.name, f.type)

    def pad(b: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in all_fields.items():
            cols[name] = pc.cast(b[name], typ) if name in b.column_names else pa.nulls(b.num_rows, typ)
        return pa.table(cols)

    unioned = lt.map_batches(pad, batch_format="pyarrow").union(rt.map_batches(pad, batch_format="pyarrow"))
    return hash_partitioned_groups(unioned, keys, per_part, num_partitions=num_partitions)


def watermark_late_split(
    ds: Dataset, ts_col: str = "ts", delay_minutes: float = 60.0
) -> Dataset:
    """Watermark semantics for batch replays of event streams: the
    watermark is max(event time) - delay (what a streaming engine would
    have advanced to by end of input); rows below it are LATE. Adds
    (watermark, is_late) — downstream aggregates can then drop or
    side-channel late rows exactly like a streaming window with allowed
    lateness. The max() is a metadata-cheap global aggregate broadcast
    into a vectorized flagging map."""
    wm = ds.max(ts_col)
    delay = pd.Timedelta(minutes=delay_minutes)
    watermark = (pd.Timestamp(wm) - delay).to_pydatetime()

    def flag(b: pa.Table) -> pa.Table:
        late = pc.less(b[ts_col], pa.scalar(watermark, type=b.schema.field(ts_col).type))
        return b.append_column("is_late", late)

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def deterministic_sample(ds: Dataset, id_col: str, mod: int = 10, keep: int = 0) -> Dataset:
    """Content-deterministic sampling: keep rows whose md5(id) prefix mod
    ``mod`` equals ``keep`` — reproducible across runs/cluster sizes and
    SQL-mirrorable (DuckDB: ('0x' || substr(md5(id), 1, 8))::UBIGINT),
    unlike random_sample. The standard train/validation carve at scale."""
    from clawrag_ray.functions.kernels import md5_prefix_int

    def flt(b: pa.Table) -> pa.Table:
        vals = b[id_col].to_pylist()
        mask = pa.array(
            [md5_prefix_int(v) % mod == keep for v in vals],
            pa.bool_(),
        )
        return b.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def grouped_running_sum(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key ordered cumulative sum — the SUM() OVER (PARTITION BY keys
    ORDER BY order_cols) window, the workhorse of per-user spend/counter
    features. ONE hash-partition shuffle by key; each partition sorts its
    rows and computes a grouped cumsum vectorized (one pandas pass per
    partition, not per key — the hash_partitioned_groups contract).

    Contract: one key's rows must fit a task (true for per-user event
    streams); a single key wider than that wants global_prefix_sum run
    per key-bucket instead (same two-phase scan, documented in
    curation.global_prefix_sum)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(keys) + list(order_cols), kind="mergesort")
        g[out_col] = g.groupby(list(keys), sort=False, dropna=False)[value_col].cumsum()
        return g

    return hash_partitioned_groups(ds, list(keys), per_part, num_partitions=num_partitions)


def grouped_lag(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "lag",
    shift: int = 1,
    num_partitions: int = 64,
) -> Dataset:
    """LAG/LEAD(value, |shift|) OVER (PARTITION BY keys ORDER BY
    order_cols) — positive ``shift`` is LAG, negative is LEAD; the first
    (resp. last) |shift| rows of each key get NULL. Per-user inter-event
    deltas, previous-purchase features and churn gaps are all this window.
    Same shape and contract as grouped_running_sum: ONE hash-partition
    shuffle by key, then a vectorized grouped ``shift`` per partition (one
    pandas pass per partition, not per key). One key's rows must fit a
    task; a wider key wants the key-bucket + boundary-row carry variant
    (sessionize_bucketed's two-phase merge is the template)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(keys) + list(order_cols), kind="mergesort")
        g[out_col] = g.groupby(list(keys), sort=False, dropna=False)[value_col].shift(shift)
        return g

    return hash_partitioned_groups(ds, list(keys), per_part, num_partitions=num_partitions)


def histogram_fixed_bins(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    count_alias: str = "n",
) -> Dataset:
    """Equi-width histogram per key over EXPLICIT bounds [lo, hi) — the
    distribution-profile aggregate. Explicit bounds keep the operator one
    map-only bin-assign + the standard two-level grouped count (a
    data-derived range would cost an extra min/max pass); values outside
    clamp into the edge bins so totals reconcile. Empty bins are absent
    (sparse output), matching the SQL GROUP BY."""
    width = (hi - lo) / n_bins

    def assign(b: pa.Table) -> pa.Table:
        import numpy as np

        # null values carry no bin (SQL-aggregate convention shared with
        # the expectations gate) — a NaN->int64 cast would land them in
        # bin 0 silently
        b = b.filter(pc.is_valid(b[value_col]))
        v = b[value_col].to_numpy(zero_copy_only=False)
        bins = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        return b.append_column("bin", pa.array(bins, pa.int64())).drop_columns([value_col])

    binned = ds.select_columns(list(keys) + [value_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return pre_aggregate(binned, list(keys) + ["bin"], [], count_alias=count_alias)


def grouped_mode(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    count_alias: str = "n",
) -> Dataset:
    """Most frequent value per key (deterministic: smallest value wins
    ties) — two-level grouped counts over (key, value), then a
    hash-partitioned argmax per key. The shuffle carries one row per
    DISTINCT (key, value), never per input row."""
    counts = pre_aggregate(ds.select_columns(list(keys) + [value_col]), list(keys) + [value_col], [], count_alias=count_alias)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(keys) + [count_alias, value_col], ascending=[True] * len(keys) + [False, True], kind="mergesort")
        return g.groupby(list(keys), sort=False, as_index=False, dropna=False).head(1)[list(keys) + [value_col, count_alias]]

    return hash_partitioned_groups(counts, list(keys), per_part)


def grouped_zscore(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    id_cols: list[str],
    out_col: str = "z",
    ndigits: int = 4,
) -> Dataset:
    """Per-key standardization z = (v - mean) / stddev_pop — the feature
    normalization map. Two passes, both map-shaped: a two-level grouped
    (sum, sum-of-squares, count) aggregate produces the per-key moments
    (key-cardinality-sized), which broadcast once; the normalization is
    then a pure per-batch kernel. Keys with zero variance emit z = 0."""
    import numpy as np
    import ray

    if len(keys) != 1:
        raise ValueError("grouped_zscore broadcasts moments by a single key column")

    def sq(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        return b.append_column("__v2", pa.array(v * v, pa.float64()))

    moments = (
        pre_aggregate(
            ds.select_columns(list(keys) + [value_col]).map_batches(sq, batch_format="pyarrow", zero_copy_batch=True),
            list(keys),
            [value_col, "__v2"],
        )
        .to_pandas()
        .set_index(list(keys) if len(keys) > 1 else keys[0])
    )
    mean = moments[f"sum_{value_col}"] / moments["n"]
    var = (moments["sum___v2"] / moments["n"] - mean * mean).clip(lower=0.0)
    stats_ref = ray.put((mean, np.sqrt(var)))

    class Normalize:
        def __init__(self):
            self.mean, self.std = ray.get(stats_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            kv = b[keys[0]].to_numpy(zero_copy_only=False)
            mu = self.mean.reindex(kv).to_numpy()
            sd = self.std.reindex(kv).to_numpy()
            v = b[value_col].to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                z = np.where(sd > 0, (v - mu) / sd, 0.0)
            out = b.select(list(id_cols) + list(keys))
            return out.append_column(out_col, pa.array(np.round(z, ndigits), pa.float64()))

    return ds.map_batches(Normalize, batch_format="pyarrow", concurrency=(1, 8), zero_copy_batch=True)


def grouped_rolling_sum(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    frame: int,
    out_col: str = "rolling",
    num_partitions: int = 64,
) -> Dataset:
    """Bounded-frame window — SUM(value) OVER (PARTITION BY keys ORDER BY
    order_cols ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW), the
    trailing-k-events feature. Same one-shuffle shape as
    grouped_running_sum; the bounded frame is cumsum minus the
    frame-shifted cumsum (two vectorized grouped passes, no per-row
    Python, exact for integer values)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(keys) + list(order_cols), kind="mergesort")
        grp = g.groupby(list(keys), sort=False, dropna=False)[value_col]
        run = grp.cumsum()
        g[out_col] = run - grp.shift(frame).groupby([g[k] for k in keys], sort=False, dropna=False).cumsum().fillna(0)
        return g

    return hash_partitioned_groups(ds, list(keys), per_part, num_partitions=num_partitions)


def funnel_conversion(
    ds: Dataset,
    step_a: str,
    step_b: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 64,
) -> Dataset:
    """First-conversion funnel: per user, the earliest ``step_a`` event
    time and the earliest ``step_b`` event STRICTLY AFTER it (NULL when
    the user never converts) — the A-then-B behavioral primitive under
    activation/retention funnels. Map-side filter prunes the stream to
    the two step types before the single hash-partition shuffle by user;
    the per-partition pass is two vectorized grouped mins + a masked
    merge (no per-user Python). Returns (user_col, ta, tb) for users
    with at least one ``step_a`` event."""

    def prune(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[type_col], value_set=pa.array([step_a, step_b]))
        return b.filter(mask).select([user_col, ts_col, type_col])

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        ta = g.loc[g[type_col] == step_a].groupby(user_col, sort=False)[ts_col].min().rename("ta")
        b_rows = g.loc[g[type_col] == step_b, [user_col, ts_col]].merge(
            ta, left_on=user_col, right_index=True
        )
        tb = (
            b_rows.loc[b_rows[ts_col] > b_rows["ta"]]
            .groupby(user_col, sort=False)[ts_col]
            .min()
            .rename("tb")
        )
        out = ta.to_frame().join(tb).reset_index()
        return out[[user_col, "ta", "tb"]]

    return hash_partitioned_groups(pruned, [user_col], per_part, num_partitions=num_partitions)


_WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(
    ds: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> Dataset:
    """Retention cohort matrix: users cohort by the epoch-week of their
    FIRST event; each (cohort_week, week_offset) cell counts the distinct
    users active that many weeks later — the activation/retention report.
    Epoch-week integers (us // week) keep both sides calendar-free.

    Shape: per-user first-event week is a two-level grouped min
    (user-cardinality-sized); it joins back to the stream through the
    distributed keyed join (one shuffle, nothing driver-side), and the
    cell counts run as the exact pair-collapse distinct_count — the
    shuffle after the join carries one row per distinct
    (cohort, offset, user), never per event."""
    from ray.data.aggregate import Min as AggMin

    from clawrag_ray.stages.dedup import _keyed_join

    def to_week(b: pa.Table) -> pa.Table:
        import numpy as np

        w = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False) // _WEEK_US
        return pa.table({user_col: b[user_col], "week": pa.array(w, pa.int64())})

    weeks = ds.select_columns([user_col, ts_col]).map_batches(
        to_week, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial_min(b: pa.Table) -> pa.Table:
        g = b.group_by(user_col).aggregate([("week", "min")])
        return g.rename_columns([user_col, "pmin"])

    firsts = (
        weeks.map_batches(partial_min, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(user_col)
        .aggregate(AggMin("pmin", alias_name="cohort_week"))
        .map_batches(
            lambda b: pa.table({"__u": b[user_col], "cohort_week": pc.cast(b["cohort_week"], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    joined = _keyed_join(weeks, user_col, firsts, "__u", ["cohort_week"], num_partitions=num_partitions)

    def offsets(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": b["cohort_week"],
                "week_offset": pc.subtract(b["week"], b["cohort_week"]),
                user_col: b[user_col],
            }
        )

    cells = joined.map_batches(offsets, batch_format="pyarrow", zero_copy_batch=True)
    return distinct_count(cells, ["cohort_week", "week_offset"], user_col)


def grouped_rank(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    out_col: str = "rnk",
    method: str = "row_number",
    n_tiles: int = 4,
    ascending: bool = True,
    num_partitions: int = 64,
) -> Dataset:
    """ROW_NUMBER() / DENSE_RANK() / NTILE(n) OVER (PARTITION BY keys
    ORDER BY order_cols) — per-key dense ordering and equal-depth
    bucketing (the quantile-bin feature / per-group position window).
    Same one-shuffle hash-partitioned shape as grouped_running_sum; ranks
    are a vectorized grouped cumcount per partition. NTILE follows SQL
    semantics exactly: with c rows and n tiles the first c % n tiles hold
    ceil(c/n) rows. row_number/ntile ties rank by position after the
    mergesort on order_cols — pass a unique final order column for
    deterministic output (the SQL oracle needs the same tiebreak);
    dense_rank/percent_rank/cume_dist are tie-aware and deterministic
    without one. ``ascending=False`` ranks descending (ORDER BY ... DESC)
    on the order columns."""
    import numpy as np

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            list(keys) + list(order_cols),
            kind="mergesort",
            ascending=[True] * len(keys) + [ascending] * len(order_cols),
        )
        grp = g.groupby(list(keys), sort=False, dropna=False)
        rn = grp.cumcount().to_numpy()
        if method == "row_number":
            g[out_col] = rn + 1
            return g
        if method == "dense_rank":
            # tie-aware: equal order values share a rank and no gaps follow
            g[out_col] = grp[order_cols[0]].rank(method="dense", ascending=ascending).astype("int64").to_numpy()
            return g
        if method in ("percent_rank", "cume_dist"):
            # tie-aware, so ORDER BY a non-unique column is deterministic
            # exactly like SQL: percent_rank = (RANK-1)/(n-1) with min-rank
            # ties; cume_dist = peers-inclusive max-rank / n
            c = grp[order_cols[0]].transform("size").to_numpy()
            if method == "percent_rank":
                rk = grp[order_cols[0]].rank(method="min", ascending=ascending).to_numpy()
                g[out_col] = np.where(c > 1, (rk - 1) / np.maximum(c - 1, 1), 0.0)
            else:
                rk = grp[order_cols[0]].rank(method="max", ascending=ascending).to_numpy()
                g[out_col] = rk / c
            return g
        if method != "ntile":
            raise ValueError(f"unknown rank method: {method}")
        c = grp[order_cols[0]].transform("size").to_numpy()
        q, r = c // n_tiles, c % n_tiles
        cut = r * (q + 1)  # rows consumed by the (q+1)-sized leading tiles
        small_q = np.maximum(q, 1)  # c < n_tiles: every row lands in its own tile
        g[out_col] = np.where(rn < cut, rn // np.maximum(q + 1, 1), r + (rn - cut) // small_q) + 1
        return g

    return hash_partitioned_groups(ds, list(keys), per_part, num_partitions=num_partitions)


def grouped_range_sum(
    ds: Dataset,
    keys: list[str],
    ts_col: str,
    value_col: str,
    preceding_us: int,
    out_col: str = "range_sum",
    num_partitions: int = 64,
) -> Dataset:
    """SUM(value) OVER (PARTITION BY keys ORDER BY ts RANGE BETWEEN
    ``preceding_us`` microseconds PRECEDING AND CURRENT ROW) — the
    TIME-window rolling aggregate (trailing 7-day spend, rate limits),
    distinct from the ROWS-frame grouped_rolling_sum: the frame is defined
    by timestamp distance and includes ALL peers of the current ts.

    Same one-shuffle hash-partitioned shape as the other window ops; per
    key the frame sums are a vectorized prefix-sum + two searchsorted
    calls (no per-row loop)."""
    import numpy as np

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(keys) + [ts_col], kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy()
        ts = ts.astype("datetime64[us]").astype("int64") if ts.dtype.kind == "M" else ts.astype("int64")
        vals = g[value_col].to_numpy(dtype=float)
        out = np.empty(len(g), dtype=float)
        # group boundaries from the sorted key columns (vectorized)
        sizes = g.groupby(list(keys), sort=False, dropna=False)[value_col].transform("size").to_numpy()
        start = 0
        n = len(g)
        while start < n:
            end = start + int(sizes[start])
            t = ts[start:end]
            cum = np.concatenate([[0.0], np.cumsum(vals[start:end])])
            lo = np.searchsorted(t, t - preceding_us, side="left")
            hi = np.searchsorted(t, t, side="right")
            out[start:end] = cum[hi] - cum[lo]
            start = end
        g[out_col] = out
        return g

    # no projection here: callers prune at the read, and carry-through
    # columns (event ids) must survive like the other window ops
    return hash_partitioned_groups(ds, list(keys), per_part, num_partitions=num_partitions)


def grouped_corr(
    ds: Dataset,
    keys: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "corr",
    ndigits: int = 6,
) -> Dataset:
    """Pearson correlation per group — the profiling aggregate under
    feature-drift and quality dashboards. Pure partial-aggregate shape:
    each block folds to per-key (n, Σx, Σy, Σxy, Σx², Σy²) with one Arrow
    group_by (six numbers per key per block — the only thing that
    shuffles), a grouped Sum reduces, and the closed form
    (nΣxy − ΣxΣy) / √(nΣx² − (Σx)²) / √(nΣy² − (Σy)²) finishes map-side.
    Zero-variance groups yield NULL (SQL corr() semantics). Oracles should
    replay the identical sum-of-squares formula (not corr(), whose
    Welford-style accumulation differs in low digits)."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(b[x_col], pa.float64())
        y = pc.cast(b[y_col], pa.float64())
        t = pa.table(
            {
                **{k: b[k] for k in keys},
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
            }
        )
        g = t.group_by(keys).aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"), ("yy", "sum"), ("x", "count")]
        )
        return g.rename_columns(list(keys) + ["sx", "sy", "sxy", "sxx", "syy", "pn"])

    partials = ds.select_columns(list(keys) + [x_col, y_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    agg = partials.groupby(keys[0] if len(keys) == 1 else list(keys)).aggregate(
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
        Sum("pn", alias_name="n"),
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False)
        sy = b["sy"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        syy = b["syy"].to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (vx > 0) & (vy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(ok, (n * sxy - sx * sy) / (np.sqrt(vx) * np.sqrt(vy)), np.nan)
        cols = {k: b[k] for k in keys}
        cols["n"] = pc.cast(b["n"], pa.int64())
        cols[out_col] = pa.array(np.round(r, ndigits), pa.float64(), from_pandas=True)
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def heavy_hitters(
    ds: Dataset,
    key_col: str,
    k: int = 20,
    capacity: int = 8192,
    count_alias: str = "n",
    strict: bool = True,
) -> Dataset:
    """EXACT distributed top-k most frequent values (heavy hitters) via
    the two-pass candidate + recount shape — the way frequent-token /
    frequent-URL tables are built over corpora whose raw key space
    (misspellings, URLs, hashes) is far too wide to groupby directly.

    Pass 1 (candidates, map-only): each block computes exact local
    value_counts and keeps its top ``capacity`` keys. By pigeonhole a key
    with global frequency > N/capacity has, in at least one block, local
    frequency > block_N/capacity and therefore ranks in that block's
    top-capacity — so the union of block survivors is a SUPERSET of every
    global heavy hitter. Survivor partials (capacity-bounded per block)
    are pre-aggregated to distinct candidate keys: the only shuffle is
    candidate-sized, never corpus- or vocabulary-sized.

    Pass 2 (recount, map-only + tiny shuffle): the candidate key set
    broadcasts once (ray.put), blocks filter to candidate rows and
    pre_aggregate recounts them EXACTLY; top-k by (count desc, key asc).

    Self-certifying: the returned top-k is provably the true top-k
    whenever the k-th recounted count > N/capacity (every non-candidate
    key's frequency is <= N/capacity, so none can displace the top-k).
    With ``strict`` the operator raises when the certificate fails —
    resize ``capacity`` — instead of silently returning approximations.
    N rides pass 1 as a sentinel row under the empty key; sentinel-valued
    input keys ('' and the \\x00 truncation marker — never real tokens)
    are dropped in block_top itself rather than trusted to a caller
    contract, so they can neither inflate n_total nor shadow candidates.
    """
    import numpy as np
    import ray
    import ray.data as rd

    sentinel = ""

    sentinel_trunc = "\x00truncated"

    def block_top(b: pa.Table) -> pa.Table:
        col = b[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # enforce the sentinel contract here (see docstring): drop rows
        # whose key IS a sentinel value instead of silently miscounting
        bad = pc.fill_null(pc.is_in(col, value_set=pa.array([sentinel, sentinel_trunc])), False)
        if pc.any(bad).as_py():
            col = col.filter(pc.invert(bad))
        vc = pc.value_counts(col)
        vals, cnts = vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)
        truncated = len(vals) > capacity
        if truncated:
            keep = np.argpartition(cnts, -capacity)[-capacity:]
            vals, cnts = vals.take(pa.array(keep)), cnts[keep]
        out = pa.table({key_col: vals, "p_cnt": pa.array(cnts, pa.int64())})
        marks = pa.table(
            {
                key_col: pa.array([sentinel] + ([sentinel_trunc] if truncated else [])),
                # len(col), not b.num_rows: N must count only the rows that
                # actually participate (sentinel-keyed rows were dropped)
                "p_cnt": pa.array([len(col)] + ([1] if truncated else []), pa.int64()),
            }
        )
        return pa.concat_tables([out, marks])

    partials = ds.map_batches(block_top, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    # candidate-sized: distinct survivors + per-block sentinel totals
    agg = pre_aggregate(partials, [key_col], ["p_cnt"]).to_pandas()
    n_total = int(agg.loc[agg[key_col] == sentinel, "sum_p_cnt"].sum())
    n_truncated = int(agg.loc[agg[key_col] == sentinel_trunc, "sum_p_cnt"].sum())
    cand = agg.loc[~agg[key_col].isin([sentinel, sentinel_trunc]), key_col]
    cand_ref = ray.put(pa.array(cand.to_numpy(dtype=object), type=pa.string()))

    def recount_filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[key_col], value_set=ray.get(cand_ref)))

    exact = pre_aggregate(
        ds.map_batches(recount_filter, batch_format="pyarrow", zero_copy_batch=True),
        [key_col],
        [],
        count_alias=count_alias,
    )
    top = (
        exact.to_pandas()
        .sort_values([count_alias, key_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    # exact when (a) NO block ever truncated — candidates are then the
    # complete vocabulary, so the recount IS the full frequency table
    # (covers vocabularies smaller than k) — or (b) the k-th count clears
    # the pigeonhole threshold
    certified = n_truncated == 0 or (
        len(top) >= k and int(top[count_alias].iloc[k - 1]) * capacity > n_total
    )
    if strict and not certified:
        raise ValueError(
            f"heavy_hitters certificate failed: k-th count "
            f"{int(top[count_alias].iloc[-1]) if len(top) else 0} <= N/capacity "
            f"({n_total}/{capacity}) — raise capacity"
        )
    return rd.from_pandas(top)


def rollup_aggregate(
    ds: Dataset,
    keys: list[str],
    sum_col: str,
    total_alias: str = "total",
    count_alias: str = "n",
) -> Dataset:
    """GROUP BY ROLLUP(keys): sum + count at every key prefix level
    (finest, each coarser prefix, grand total), rolled-up key columns
    NULL. The FINEST level is the only corpus-proportional work and runs
    distributed (pre_aggregate: per-batch Arrow partials + one grouped
    sum). Coarser levels re-aggregate the finest RESULT, which is
    group-cardinality-sized — the same bounded-driver contract as
    global_prefix_sum's bucket totals. At vocabulary-sized key spaces,
    re-aggregate each prefix level with pre_aggregate over the finest
    Dataset instead (one extra tiny shuffle per level)."""
    sets = [tuple(keys[:lvl]) for lvl in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, sum_col, total_alias, count_alias)


def cube_aggregate(
    ds: Dataset,
    keys: list[str],
    sum_col: str,
    total_alias: str = "total",
    count_alias: str = "n",
) -> Dataset:
    """GROUP BY CUBE(keys): sum + count at EVERY subset of the keys
    (2^len(keys) grouping sets). Same bounded-driver contract as
    rollup_aggregate — one distributed finest-level pass, subset levels
    re-aggregated from the group-cardinality-sized finest result."""
    n = len(keys)
    sets = sorted(
        (tuple(k for j, k in enumerate(keys) if m & (1 << j)) for m in range(1 << n)),
        key=lambda s: -len(s),
    )
    return grouping_sets_aggregate(ds, keys, sets, sum_col, total_alias, count_alias)


def grouping_sets_aggregate(
    ds: Dataset,
    keys: list[str],
    sets: list[tuple],
    sum_col: str,
    total_alias: str = "total",
    count_alias: str = "n",
) -> Dataset:
    """GROUP BY GROUPING SETS(sets), each set a subset of ``keys``: the
    FINEST level (all keys) is the only corpus-proportional work and runs
    distributed (pre_aggregate: per-batch Arrow partials + one grouped
    sum); every requested set re-aggregates the finest RESULT, which is
    group-cardinality-sized (the bounded-driver contract). Keys absent
    from a set come back NULL, exactly like the SQL construct. At
    vocabulary-sized key spaces, re-aggregate each set with pre_aggregate
    over the finest Dataset instead (one extra tiny shuffle per set)."""
    import ray.data as rd

    finest = pre_aggregate(ds, keys, [sum_col], count_alias=count_alias)
    fin = finest.to_pandas().rename(columns={f"sum_{sum_col}": total_alias})
    cols = list(keys) + [total_alias, count_alias]
    frames = []
    for s in sets:
        s = list(s)
        if s == list(keys):
            g = fin.copy()
        elif s:
            # dropna=False: genuinely-NULL input keys stay grouping values
            # at every level (SQL CUBE keeps them; dropping would make
            # sub-level sums disagree with the grand total)
            g = fin.groupby(s, sort=False, dropna=False)[[total_alias, count_alias]].sum().reset_index()
        else:
            g = fin[[total_alias, count_alias]].sum().to_frame().T
            g[count_alias] = g[count_alias].astype("int64")
        for k in keys:
            if k not in s:
                g[k] = None
        frames.append(g[cols])
    out = pd.concat(frames, ignore_index=True)
    for k in keys:
        out[k] = out[k].astype(object).where(out[k].notna(), None)
    return rd.from_pandas(out)


def grouped_entropy(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    out_col: str = "entropy",
    ndigits: int = 6,
    num_partitions: int = 64,
) -> Dataset:
    """Shannon entropy (nats) of the ``value_col`` distribution per key —
    the behavioral-diversity profile (event-mix per user, token-mix per
    source). Two-level shape: distinct (key, value) counts via
    pre_aggregate (the only corpus shuffle), then one hash-partitioned
    pass folds each key's distribution: H = ln(n) − Σ c·ln(c) / n."""
    import numpy as np

    counts = pre_aggregate(ds.select_columns(list(keys) + [value_col]), list(keys) + [value_col], [], count_alias="c")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.float64)
        g = g.assign(__clc=c * np.log(c))
        agg = g.groupby(list(keys), sort=False, dropna=False).agg(
            n=("c", "sum"), s=("__clc", "sum")
        ).reset_index()
        n = agg["n"].to_numpy(dtype=np.float64)
        agg[out_col] = np.round(np.log(n) - agg["s"].to_numpy() / n, ndigits)
        agg["n"] = agg["n"].astype("int64")
        return agg.drop(columns="s")

    return hash_partitioned_groups(counts, list(keys), per_part, num_partitions=num_partitions)


def grouped_first_last(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """FIRST_VALUE / LAST_VALUE OVER (PARTITION BY keys ORDER BY
    order_cols) collapsed to one row per key: keys + first_<v> + last_<v>
    + n (the per-entity entry/exit profile — first touchpoint, latest
    state, activity count).

    Scale shape: a map-side COMBINER keeps only each key's first and last
    row PER BLOCK (plus a per-block count), so the shuffle moves <= 2 rows
    + 1 count per (key, block) instead of the raw table; one
    hash-partitioned pass then reduces block candidates to the global
    first/last per key. Ties on order_cols resolve by position after a
    stable mergesort — pass a unique final order column (the SQL oracle
    needs the same tiebreak)."""

    cols = list(keys) + list(order_cols) + [value_col]

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort")
        grp = g.groupby(list(keys), sort=False, dropna=False)
        firsts = grp.head(1)[cols].copy()
        firsts["__end"] = 0
        # per-block count rides the first-candidate rows only (no double count)
        firsts = firsts.merge(grp.size().reset_index(name="__n"), on=list(keys))
        lasts = grp.tail(1)[cols].copy()
        lasts["__end"] = 1
        lasts["__n"] = 0
        return pd.concat([firsts, lasts], ignore_index=True)

    partials = ds.select_columns(cols).map_batches(partial, batch_format="pandas", batch_size=None)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort")
        f = g[g["__end"] == 0]
        fgrp = f.groupby(list(keys), sort=False, dropna=False)
        first = fgrp.head(1)[list(keys) + [value_col]].rename(columns={value_col: f"first_{value_col}"})
        last = (
            g[g["__end"] == 1]
            .groupby(list(keys), sort=False, dropna=False)
            .tail(1)[list(keys) + [value_col]]
            .rename(columns={value_col: f"last_{value_col}"})
        )
        n = fgrp["__n"].sum().reset_index().rename(columns={"__n": "n"})
        out = first.merge(last, on=list(keys)).merge(n, on=list(keys))
        out["n"] = out["n"].astype("int64")
        return out

    return hash_partitioned_groups(partials, list(keys), finish, num_partitions=num_partitions)


def grouped_ordered_concat(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    sep: str = ">",
    limit: int | None = None,
    out_col: str = "path",
    num_partitions: int = 64,
) -> Dataset:
    """Ordered STRING_AGG per key: keys + the sep-joined value sequence in
    order_cols order (the per-user event-path / clickstream-journey
    aggregate). With ``limit=k`` only the first k values per key join —
    and a map-side prune keeps at most k rows per (key, block) before the
    shuffle, so hot keys ship k rows per block instead of their whole
    history. Without a limit every row of a key must co-locate (honest
    all-rows shuffle — the SQL STRING_AGG contract). Ties on order_cols
    resolve by position after a stable mergesort — pass a unique final
    order column for deterministic output."""

    cols = list(keys) + list(order_cols) + [value_col]
    work = ds.select_columns(cols)

    if limit is not None:

        def prune(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(list(order_cols), kind="mergesort")
            return g.groupby(list(keys), sort=False, dropna=False).head(limit)

        work = work.map_batches(prune, batch_format="pandas", batch_size=None)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort")
        grp = g.groupby(list(keys), sort=False, dropna=False)
        if limit is not None:
            g = grp.head(limit)
            grp = g.groupby(list(keys), sort=False, dropna=False)
        out = grp[value_col].agg(lambda s: sep.join(s.astype(str))).reset_index()
        return out.rename(columns={value_col: out_col})

    return hash_partitioned_groups(work, list(keys), per_part, num_partitions=num_partitions)


def cms_counts(
    ds: Dataset,
    key_col: str,
    width: int = 4096,
    depth: int = 4,
    query_keys: Dataset | None = None,
    out_col: str = "cnt",
) -> Dataset:
    """Count-Min sketch frequency estimates — the bounded-memory
    heavy-traffic counter (Cormode & Muthukrishnan 2005). Each block folds
    into a local depth x width int64 counter grid (hash row d uses a
    splitmix64-mixed second hash, Kirsch-Mitzenmacher style); block
    partials SUM-reduce in one bounded pass (the reduced state is
    depth*width counters, independent of corpus size), and the final grid
    broadcasts once to answer point queries map-side:
    est(k) = min_d grid[d][h_d(k)].

    Estimates never undercount; overcount <= 2N/width with prob
    1 - (1/2)^depth per query (pinned in pytest). EXACT-REGIME CONTRACT
    (the t-digest/HLL pattern): when the distinct-key count is far below
    ``width`` the collision probability is ~(n_distinct/width)^depth and
    the estimates equal exact GROUP BY counts — the regime the driver
    oracle pins; the sketch regime is covered by error-bound tests.

    ``query_keys``: bounded Dataset of keys to answer (defaults to the
    distinct keys of ``ds`` — only sensible when that set is small);
    output = one row (key, est) per query key."""
    import numpy as np

    seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def _rows(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).to_numpy(
            zero_copy_only=False
        )
        h1 = pd.util.hash_array(arr)
        # depth x n matrix of column indices, one mixed hash family per row
        from clawrag_ray.stages.dedup import _splitmix64

        return np.stack([_splitmix64(h1 ^ s) % np.uint64(width) for s in seeds])

    def partial(b: pa.Table) -> pa.Table:
        grid = np.zeros((depth, width), dtype=np.int64)
        idx = _rows(b[key_col])
        for d in range(depth):
            np.add.at(grid[d], idx[d], 1)
        return pa.table({"g": pa.array([grid.tobytes()], pa.binary())})

    def combine(b: pa.Table) -> pa.Table:
        acc = np.zeros(depth * width, dtype=np.int64)
        for buf in b["g"].to_pylist():
            acc += np.frombuffer(buf, dtype=np.int64)
        return pa.table({"g": pa.array([acc.tobytes()], pa.binary())})

    partials = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # fixed fan-in reduce: block partials -> per-task partials -> one grid
    reduced = partials.map_batches(combine, batch_format="pyarrow", batch_size=64)
    final = np.zeros(depth * width, dtype=np.int64)
    for row in reduced.take_all():  # bounded: one row per reduce task
        final += np.frombuffer(row["g"], dtype=np.int64)
    grid_ref = ray.put(final.reshape(depth, width))

    if query_keys is None:
        query_keys = ds.select_columns([key_col]).map_batches(
            lambda b: pa.table({key_col: b[key_col].combine_chunks().drop_null().unique()}),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).groupby(key_col).count().drop_columns(["count()"])

    def estimate(b: pa.Table) -> pa.Table:
        grid = ray.get(grid_ref)
        idx = _rows(b[key_col])
        est = np.min(np.stack([grid[d][idx[d]] for d in range(depth)]), axis=0)
        return pa.table({key_col: b[key_col], out_col: pa.array(est, pa.int64())})

    return query_keys.map_batches(estimate, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(
    ds: Dataset,
    keys: list[str],
    pivot_col: str,
    pivot_values: list[str],
    value_col: str | None = None,
    prefix: str = "n_",
    num_partitions: int = 64,
) -> Dataset:
    """Long-to-wide PIVOT: one row per key with one column per
    ``pivot_values`` entry holding the count (or SUM of ``value_col``) of
    matching rows — the fixed-schema feature-table transform (per-entity
    event-type mix, per-doc token-class counts).

    ``pivot_values`` must be the explicit column list (a distributed
    engine cannot discover output schema from data without an extra
    pass — same contract as SQL PIVOT ... IN (...)). Shape: one
    pre-aggregated (keys + pivot) shuffle — partial rows, never the raw
    table — then a hash-partitioned per-key spread; unlisted pivot values
    are dropped, absent combinations fill 0."""
    import numpy as np

    sums = [value_col] if value_col else []
    agg = pre_aggregate(ds.select_columns(list(keys) + [pivot_col] + sums), list(keys) + [pivot_col], sums)
    src = f"sum_{value_col}" if value_col else "n"

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[pivot_col].isin(pivot_values)]
        # dropna=False: a NULL key is a group like any other (SQL GROUP BY
        # semantics — the same null-key rule as the window ops above)
        wide = g.pivot_table(
            index=list(keys), columns=pivot_col, values=src, aggfunc="sum", fill_value=0, dropna=False
        )
        wide = wide.reindex(columns=list(pivot_values), fill_value=0).reset_index()
        wide.columns = list(keys) + [f"{prefix}{v}" for v in pivot_values]
        for v in pivot_values:
            wide[f"{prefix}{v}"] = wide[f"{prefix}{v}"].astype("float64" if value_col else "int64")
        return wide

    return hash_partitioned_groups(agg, list(keys), per_part, num_partitions=num_partitions)


def melt(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> Dataset:
    """Wide-to-long UNPIVOT: each input row emits one (id_cols, metric,
    value) row per entry of ``value_cols`` — the inverse of pivot_counts
    and the normalization step feeding metric-keyed aggregates. Pure
    map-side Arrow (concat of per-metric projections inside each block);
    no shuffle, output rows = n x len(value_cols)."""

    def explode(b: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: b[k] for k in id_cols}
            cols[var_name] = pa.array([c] * b.num_rows, pa.string())
            cols[value_name] = b[c].cast(pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.select_columns(list(id_cols) + list(value_cols)).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def except_distinct(
    left: Dataset, on: str, right: Dataset, right_on: str | None = None, num_partitions: int = 64
) -> Dataset:
    """SQL EXCEPT (set difference, distinct): keys present in ``left``
    and absent from ``right``. Composition of tested primitives: a
    distinct-keys pre-aggregate on the left (partial rows shuffle, not
    the raw table) followed by the one-pass distributed anti-join (right
    side ships per-batch-deduplicated keys only)."""
    lk = pre_aggregate(left.select_columns([on]), [on], [], count_alias="__n").drop_columns(["__n"])
    return anti_join(lk, on, right.select_columns([right_on or on]), right_on, num_partitions=num_partitions)


def intersect_distinct(
    left: Dataset, on: str, right: Dataset, right_on: str | None = None, num_partitions: int = 64
) -> Dataset:
    """SQL INTERSECT (set intersection, distinct): keys present in both
    sides. Same two-pass composition as except_distinct with the
    semi-join finish."""
    lk = pre_aggregate(left.select_columns([on]), [on], [], count_alias="__n").drop_columns(["__n"])
    return semi_join(lk, on, right.select_columns([right_on or on]), right_on, num_partitions=num_partitions)


def interval_union_length(
    ds: Dataset,
    key_col: str,
    start_col: str,
    end_col: str,
    out_col: str = "covered",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key length of the UNION of half-open [start, end) intervals —
    the sweep behind "active time per user", sensor uptime, and span
    coverage stats. Classic merge-overlaps: within a key, sorted by start,
    each interval contributes ``max(0, end - max(start, max_prev_end))``;
    the sum is the union length (order-invariant under start ties, so the
    tiebreak only needs to be deterministic, not semantic).

    ONE hash-partitioned shuffle of (key, start, end) rows; inside each
    partition the sweep is fully vectorized — sort, grouped cummax,
    grouped shift, clip, grouped sum — no per-group Python. Timestamps
    are normalized to int64 microseconds so the arithmetic is exact.
    Output: (key, out_col int64)."""
    import numpy as np

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: [], out_col: pd.array([], dtype="int64")})
        s = g[start_col]
        e = g[end_col]
        if not pd.api.types.is_integer_dtype(s):
            s = pd.to_datetime(s).astype("int64")
            e = pd.to_datetime(e).astype("int64")
        d = pd.DataFrame({key_col: g[key_col].to_numpy(), "s": s.to_numpy(), "e": e.to_numpy()})
        d = d.sort_values([key_col, "s", "e"], kind="mergesort").reset_index(drop=True)
        cm = d.groupby(key_col, sort=False, dropna=False)["e"].cummax()
        prev = (
            pd.DataFrame({key_col: d[key_col], "cm": cm})
            .groupby(key_col, sort=False, dropna=False)["cm"]
            .shift(1)
        )
        lower = np.maximum(d["s"].to_numpy(), prev.fillna(d["s"]).to_numpy().astype("int64"))
        cov = np.clip(d["e"].to_numpy() - lower, 0, None)
        out = (
            pd.DataFrame({key_col: d[key_col], out_col: cov})
            .groupby(key_col, sort=False, dropna=False, as_index=False)[out_col]
            .sum()
        )
        out[out_col] = out[out_col].astype("int64")
        return out

    return hash_partitioned_groups(
        ds.select_columns([key_col, start_col, end_col]), [key_col], per_part, num_partitions=num_partitions
    )


def sorted_neighborhood_pairs(
    ds: Dataset,
    order_col: str,
    id_col: str,
    window: int = 3,
    bucket_size: int = 4096,
    num_partitions: int = 64,
) -> Dataset:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995, public) —
    the entity-resolution candidate generator: impose a global total order
    on the blocking key and emit every pair within ``window`` positions.
    Linear candidate volume (n·window, vs n² for naive blocking) with the
    classic guarantee that near-identical records sort adjacently.

    ``order_col`` must be a unique integer (pack tiebreaks in, the
    global_rank contract). Shape: ranks come from the two-phase
    prefix-sum scan (no single-node sort); rows bucket by rank range and
    the first ``window`` rows of each bucket REPLICATE to the previous
    bucket (boundary carry, same trick as the bucketed as-of join), so
    every window pair is generated in exactly one bucket; pair emission is
    one vectorized shift per gap inside a hash-partitioned pass.
    Output: (id_a, id_b, gap) with gap in [1, window], id_a the lower-
    ranked record."""
    import numpy as np

    from clawrag_ray.stages.curation import global_rank

    if window >= bucket_size:
        raise ValueError("window must be < bucket_size (one-bucket boundary carry)")
    ranked = global_rank(
        ds.select_columns([id_col, order_col]), order_col, out_col="rnk", num_partitions=num_partitions
    )

    def assign(b: pa.Table) -> pa.Table:
        r0 = pc.cast(pc.subtract(b["rnk"], 1), pa.int64()).to_numpy(zero_copy_only=False)
        ids = b[id_col]
        bucket = r0 // bucket_size
        own = pa.table(
            {
                id_col: ids,
                "rnk": b["rnk"],
                "__bucket": pa.array(bucket, pa.int64()),
                "__own": pa.array(np.ones(len(r0), dtype=np.int8)),
            }
        )
        carry_mask = (r0 % bucket_size < window) & (bucket > 0)
        carried = pa.table(
            {
                id_col: ids.filter(pa.array(carry_mask)),
                "rnk": b["rnk"].filter(pa.array(carry_mask)),
                "__bucket": pa.array(bucket[carry_mask] - 1, pa.int64()),
                "__own": pa.array(np.zeros(int(carry_mask.sum()), dtype=np.int8)),
            }
        )
        return pa.concat_tables([own, carried])

    rows = ranked.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_g = [], [], []
        for _, grp in g.groupby("__bucket", sort=False):
            grp = grp.sort_values("rnk", kind="mergesort")
            ids = grp[id_col].to_numpy()
            own = grp["__own"].to_numpy()
            for j in range(1, window + 1):
                if j >= len(ids):
                    break
                a, b_, o = ids[:-j], ids[j:], own[:-j].astype(bool)
                out_a.append(a[o])
                out_b.append(b_[o])
                out_g.append(np.full(int(o.sum()), j, dtype=np.int64))
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": pd.array([], dtype="int64"),
                    "id_b": pd.array([], dtype="int64"),
                    "gap": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "gap": np.concatenate(out_g),
            }
        )

    return hash_partitioned_groups(rows, ["__bucket"], per_part, num_partitions=num_partitions)


def grouped_running_distinct(
    ds: Dataset,
    key_col: str,
    value_col: str,
    order_col: str,
    out_col: str = "n_distinct_so_far",
    num_partitions: int = 64,
) -> Dataset:
    """Running COUNT(DISTINCT value) OVER (PARTITION BY key ORDER BY
    order) — "how many distinct event types has this user produced so
    far", the novelty-curve window SQL cannot express directly (window
    COUNT(DISTINCT) is unsupported in most engines; the standard rewrite
    is a first-occurrence flag + running sum, which is exactly what this
    computes). ONE hash-partitioned shuffle; per partition: sort by
    (key, order), first-occurrence flag via vectorized duplicated() over
    (key, value), grouped cumsum — no per-group Python. Ties on
    ``order_col`` are broken by input order deterministically only if
    ``order_col`` is unique per key (the usual window contract)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort")
        first = ~g.duplicated([key_col, value_col])
        out = g[[key_col, value_col, order_col]].copy()
        out[out_col] = (
            pd.Series(first.to_numpy().astype("int64"), index=g.index)
            .groupby(g[key_col].to_numpy())
            .cumsum()
            .astype("int64")
        )
        return out

    return hash_partitioned_groups(
        ds.select_columns([key_col, value_col, order_col]),
        [key_col],
        per_part,
        num_partitions=num_partitions,
    )


def grouped_welch_ttest(
    ds: Dataset,
    key_col: str,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
    ndigits: int = 6,
) -> Dataset:
    """Per-key two-sample Welch comparison (Welch 1947, public) — the A/B
    readout: for each key, mean difference between arms and the Welch t
    statistic ``(m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b)`` with SAMPLE
    variances (n-1). One two-level grouped (sum, sum-of-squares, count)
    aggregate per (key, arm) — the moments table is key-cardinality-sized
    and finishes driver-free in a map; no row-level data crosses arms.
    Variance uses the same textbook (ssq - s^2/n)/(n-1) expansion the
    oracle replays so rounding agrees. Keys missing either arm, or with
    n < 2 in either arm, or with zero pooled variance are excluded.
    Output: (key, n_a, n_b, mean_diff, t_welch)."""
    import numpy as np

    def sq(b: pa.Table) -> pa.Table:
        v = pc.cast(b[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        return b.append_column("__v2", pa.array(v * v, pa.float64()))

    moments = pre_aggregate(
        ds.select_columns([key_col, arm_col, value_col]).map_batches(
            sq, batch_format="pyarrow", zero_copy_batch=True
        ),
        [key_col, arm_col],
        [value_col, "__v2"],
        count_alias="n",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df[arm_col] == arm_a].set_index(key_col)
        bb = df[df[arm_col] == arm_b].set_index(key_col)
        common = a.index.intersection(bb.index)
        a, bb = a.loc[common], bb.loc[common]
        na = a["n"].to_numpy(dtype=np.float64)
        nb = bb["n"].to_numpy(dtype=np.float64)
        ok = (na >= 2) & (nb >= 2)
        ma = a[f"sum_{value_col}"].to_numpy() / na
        mb = bb[f"sum_{value_col}"].to_numpy() / nb
        va = (a["sum___v2"].to_numpy() - a[f"sum_{value_col}"].to_numpy() ** 2 / na) / (na - 1.0)
        vb = (bb["sum___v2"].to_numpy() - bb[f"sum_{value_col}"].to_numpy() ** 2 / nb) / (nb - 1.0)
        se2 = va / na + vb / nb
        ok &= se2 > 0.0
        t = (ma - mb) / np.sqrt(np.where(se2 > 0, se2, 1.0))
        out = pd.DataFrame(
            {
                key_col: np.asarray(common)[ok],
                "n_a": na[ok].astype("int64"),
                "n_b": nb[ok].astype("int64"),
                "mean_diff": np.round((ma - mb)[ok], ndigits),
                "t_welch": np.round(t[ok], ndigits),
            }
        )
        return out

    # moments are key-cardinality-sized: both arms of a key land in the
    # same partition of the usual hash-partitioned group pass
    return hash_partitioned_groups(moments, [key_col], finish, num_partitions=8)


def grouped_rolling_anomaly(
    ds: Dataset,
    key_col: str,
    value_col: str,
    order_col: str,
    window: int = 20,
    k: float = 3.0,
    num_partitions: int = 64,
) -> Dataset:
    """Trailing-window spike detection per key: flag rows where
    ``|v - rolling_mean| > k * rolling_std`` with moments taken over the
    ``window`` rows strictly BEFORE the current one — the current row
    must not contaminate its own baseline (with it included, a lone spike
    over a constant history tops out at exactly sqrt(n-1) sigmas and a
    k=3 rule can never fire at n=10). Rows with fewer than 5 preceding
    rows never flag (cold-start gate, frozen). Values are fixed-pointed
    to integer cents (floor(v*100) — floor, not round, so both engines
    agree on every tie), which makes the window sum and sum-of-squares
    EXACT integers no matter the summation order; mean/variance are then
    single IEEE divisions in a fixed op order, so the k·sigma comparison
    is bit-equal cross-engine (the integer-cents contract of
    user_rolling_spend3). ONE hash-partitioned shuffle; per partition:
    sort, grouped cumsum of (v, v²), frame-shifted subtraction, clip —
    all vectorized. Output: (key, order, value_cents, roll_mean,
    roll_std, anomaly); mean/std are NULL on the first row of a key."""
    import numpy as np

    MIN_HISTORY = 5

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        vc = np.floor(g[value_col].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        keys = g[key_col].to_numpy()
        gb = pd.Series(vc).groupby(keys, sort=False)
        cs = gb.cumsum().to_numpy()
        cq = pd.Series(vc * vc).groupby(keys, sort=False).cumsum().to_numpy()
        pos = pd.Series(np.ones(len(vc), dtype=np.int64)).groupby(keys, sort=False).cumsum().to_numpy()
        # frame = [window PRECEDING, 1 PRECEDING]: end at the previous row
        cs_end = pd.Series(cs).groupby(keys, sort=False).shift(1).fillna(0).to_numpy()
        cq_end = pd.Series(cq).groupby(keys, sort=False).shift(1).fillna(0).to_numpy()
        cs_start = pd.Series(cs).groupby(keys, sort=False).shift(window + 1).fillna(0).to_numpy()
        cq_start = pd.Series(cq).groupby(keys, sort=False).shift(window + 1).fillna(0).to_numpy()
        s = (cs_end - cs_start).astype(np.int64)
        q = (cq_end - cq_start).astype(np.int64)
        n = np.minimum(pos - 1, window).astype(np.float64)
        has = n >= 1
        n_safe = np.where(has, n, 1.0)
        mean = s / n_safe
        var = (q - (s.astype(np.float64) * s.astype(np.float64)) / n_safe) / n_safe
        var = np.maximum(var, 0.0)
        std = np.sqrt(var)
        anomaly = (n >= MIN_HISTORY) & (np.abs(vc - mean) > k * std)
        rm = np.round(mean, 6)
        rs = np.round(std, 6)
        return pd.DataFrame(
            {
                key_col: g[key_col],
                order_col: g[order_col],
                "value_cents": vc,
                "roll_mean": np.where(has, rm, np.nan),
                "roll_std": np.where(has, rs, np.nan),
                "anomaly": anomaly,
            }
        )

    return hash_partitioned_groups(
        ds.select_columns([key_col, value_col, order_col]),
        [key_col],
        per_part,
        num_partitions=num_partitions,
    )


def funnel_steps(
    ds: Dataset,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 64,
) -> Dataset:
    """N-step sequential funnel — the generalization of funnel_conversion
    to arbitrary step chains: per user, t_1 = first ``steps[0]`` event,
    t_i = first ``steps[i-1]`` event STRICTLY AFTER t_{i-1}; a NULL at
    step i cascades (the user fell out of the funnel there). Map-side
    type prune to funnel events only, ONE user-keyed shuffle; inside each
    partition the per-step first-after scan is a vectorized grouped min
    per step (len(steps) passes over funnel-event rows — k is small, the
    rows are the pruned stream). Output: (user, ts_1..ts_k) for every
    user with at least a step-1 event."""
    import numpy as np

    step_set = set(steps)

    def prune(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b[type_col], value_set=pa.array(sorted(step_set)))
        return b.filter(mask)

    pruned = ds.select_columns([user_col, ts_col, type_col]).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col], kind="mergesort")
        users_all = g[user_col].to_numpy()
        out: dict = {}
        # step 1: plain grouped min over step-1 rows
        s1 = g[g[type_col] == steps[0]]
        cur = s1.groupby(user_col, sort=True)[ts_col].min()
        idx0 = cur.index  # every user with a step-1 event: the output rows
        out[user_col] = idx0.to_numpy()
        out["ts_1"] = cur.to_numpy()
        prev = cur  # users who reached the previous step (non-null times)
        for i, st in enumerate(steps[1:], start=2):
            si = g[g[type_col] == st][[user_col, ts_col]].copy()
            prev_df = prev.rename("prev").rename_axis(user_col).reset_index()
            si = si.merge(prev_df, on=user_col, how="inner")
            si = si[si[ts_col] > si["prev"]]
            cur = si.groupby(user_col, sort=True)[ts_col].min()
            out[f"ts_{i}"] = cur.reindex(idx0).to_numpy()
            prev = cur
        return pd.DataFrame(out)

    return hash_partitioned_groups(pruned, [user_col], per_part, num_partitions=num_partitions)


def zorder_keys(
    ds: Dataset,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "z",
    bucket_shift: int | None = None,
) -> Dataset:
    """Z-order (Morton) interleave key over two integer columns — the
    multi-dimensional clustering primitive behind Delta/Iceberg OPTIMIZE
    ZORDER: rows close in BOTH dimensions land close in the one-dimensional
    key, so range-partitioned output files prune on either column.
    ``z = interleave(x mod 2^bits, y mod 2^bits)`` with x on even bits —
    fully vectorized numpy bit algebra, MAP-ONLY (the subsequent
    repartition-by-z-range is the standard range exchange every sort here
    uses). ``bucket_shift`` adds ``z_bucket = z >> shift`` — the file/
    partition assignment readout. Output adds: z (int64) [+ z_bucket]."""
    import numpy as np

    def interleave(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64) & ((1 << bits) - 1)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64) & ((1 << bits) - 1)
        z = np.zeros(len(x), dtype=np.int64)
        for k in range(bits):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        t = b.append_column(out_col, pa.array(z))
        if bucket_shift is not None:
            t = t.append_column("z_bucket", pa.array(z >> bucket_shift))
        return t

    return ds.map_batches(interleave, batch_format="pyarrow", zero_copy_batch=True)


def grouped_cusum(
    ds: Dataset,
    key_col: str,
    value_col: str,
    order_col: str,
    slack_cents: int = 50,
    alarm_cents: int = 500,
    num_partitions: int = 64,
) -> Dataset:
    """One-sided CUSUM drift detection per key (Page 1954, public — the
    classic sequential change-point statistic): S_i = max(0, S_{i-1} +
    (v_i - mu - k)) with alarm at S > h, computed VECTORIZED via the
    reflection identity ``S_i = cs_i - min(0, running_min(cs))`` (cs the
    plain cumsum of the slacked deviations) — no sequential loop, one
    grouped cumsum + one grouped cummin inside ONE hash-partitioned
    shuffle. Everything is exact int64 arithmetic: values fixed-pointed
    to floor-cents, the per-key baseline mu = floor(sum/n) (integer
    division of the exact sums — non-negative values assumed, the floor
    semantics both engines share), and k/h given in cents — so the alarm
    comparison is bit-exact cross-engine. Output: (key, order,
    value_cents, cusum, alarm)."""
    import numpy as np

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort").reset_index(drop=True)
        vc = np.floor(g[value_col].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        keys = g[key_col].to_numpy()
        s = pd.Series(vc).groupby(keys, sort=False).transform("sum").to_numpy()
        n = pd.Series(vc).groupby(keys, sort=False).transform("size").to_numpy()
        mu = s // n
        y = vc - mu - slack_cents
        cs = pd.Series(y).groupby(keys, sort=False).cumsum().to_numpy()
        rmin = pd.Series(cs).groupby(keys, sort=False).cummin().to_numpy()
        cusum = cs - np.minimum(rmin, 0)
        return pd.DataFrame(
            {
                key_col: g[key_col],
                order_col: g[order_col],
                "value_cents": vc,
                "cusum": cusum.astype("int64"),
                "alarm": cusum > alarm_cents,
            }
        )

    return hash_partitioned_groups(
        ds.select_columns([key_col, value_col, order_col]),
        [key_col],
        per_part,
        num_partitions=num_partitions,
    )


def grouped_mannwhitney(
    ds: Dataset,
    key_col: str,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Mann-Whitney U / AUC between two arms (Mann & Whitney
    1947, public) — the nonparametric sibling of grouped_welch_ttest and
    the exact ROC-AUC of "does arm a stochastically dominate arm b":
    U = R_a - n_a(n_a+1)/2 with R_a the rank sum of arm a in the pooled
    per-key ordering (average ranks on ties), AUC = U / (n_a·n_b).

    Exactness: values fixed-pointed to floor-cents and ranks DOUBLED so
    tie-averages stay integers (avg2 = 2·min_rank + ties - 1); U and the
    rank sums are exact int64, AUC is one IEEE division of two exact
    integers — bit-equal cross-engine. ONE hash-partitioned shuffle;
    per partition everything is pandas grouped rank/transform, no Python
    loops. Keys missing either arm are excluded.
    Output: (key, n_a, n_b, u_stat, auc round-6)."""
    import numpy as np

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        vc = np.floor(g[value_col].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        d = pd.DataFrame({key_col: g[key_col].to_numpy(), "arm": g[arm_col].to_numpy(), "vc": vc})
        minrank = d.groupby(key_col, sort=False)["vc"].rank(method="min").astype("int64")
        ties = d.groupby([key_col, "vc"], sort=False)["vc"].transform("size").astype("int64")
        d["avg2"] = 2 * minrank + ties - 1
        agg = (
            d.groupby([key_col, "arm"], sort=False)
            .agg(n=("vc", "size"), r2=("avg2", "sum"))
            .reset_index()
        )
        a = agg[agg["arm"] == arm_a].set_index(key_col)
        b = agg[agg["arm"] == arm_b].set_index(key_col)
        common = a.index.intersection(b.index)
        a, b = a.loc[common], b.loc[common]
        na = a["n"].to_numpy(dtype=np.int64)
        nb = b["n"].to_numpy(dtype=np.int64)
        u2 = a["r2"].to_numpy(dtype=np.int64) - na * (na + 1)
        auc = u2.astype(np.float64) / (2.0 * (na * nb).astype(np.float64))
        return pd.DataFrame(
            {
                key_col: np.asarray(common),
                "n_a": na,
                "n_b": nb,
                "u_stat": u2.astype(np.float64) / 2.0,
                "auc": np.round(auc, 6),
            }
        )

    return hash_partitioned_groups(
        ds.select_columns([key_col, arm_col, value_col]), [key_col], per_part, num_partitions=num_partitions
    )


def sessionize_incremental(
    ds: Dataset,
    n_batches: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    num_partitions: int = 64,
) -> Dataset:
    """Micro-batch sessionization with per-user STATE CARRYOVER — the
    structured-streaming execution model over this engine's batch
    machinery: events arrive as ``n_batches`` consecutive time slices,
    and each slice folds into a per-user state table
    (last_ts, open-session length, session/event counters, longest) via
    ONE hash-partitioned pass; a session spanning a batch boundary is
    stitched by the carried last_ts/open-length, never recomputed. The
    final state projects to EXACTLY sessionize()'s output — incremental
    == one-shot is the correctness contract (pinned in pytest and by
    sharing the one-shot SQL oracle), the property that lets a 100 TB
    event log be absorbed crawl-by-crawl instead of reprocessed.

    ``longest`` tracks the max over all realized session lengths
    including the open one (monotone, so carryover is just max); batch
    slicing uses equal-width time cuts from one (min, max) aggregate —
    any deterministic time-ordered slicing yields the same final state."""
    import numpy as np

    from ray.data.aggregate import Max as AggMax
    from ray.data.aggregate import Min as AggMin

    gap = pd.Timedelta(minutes=gap_minutes)
    src = ds.select_columns([user_col, ts_col]).materialize()
    mm = src.aggregate(AggMin(ts_col), AggMax(ts_col))
    lo, hi = mm[f"min({ts_col})"], mm[f"max({ts_col})"]
    cuts = pd.date_range(pd.Timestamp(lo), pd.Timestamp(hi), periods=n_batches + 1)

    state: pd.DataFrame | None = None  # folded via Datasets; see below
    state_ds = None

    def fold(batch_ds: Dataset, state_ds: Dataset | None) -> Dataset:
        def tag_events(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table(
                {
                    user_col: b[user_col],
                    ts_col: b[ts_col],
                    "__last": pa.nulls(n, pa.timestamp("us")),
                    "__curr": pa.nulls(n, pa.int64()),
                    "__ns": pa.nulls(n, pa.int64()),
                    "__ne": pa.nulls(n, pa.int64()),
                    "__lg": pa.nulls(n, pa.int64()),
                    "__side": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        def tag_state(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table(
                {
                    user_col: b[user_col],
                    ts_col: pa.nulls(n, pa.timestamp("us")),
                    "__last": b["__last"],
                    "__curr": b["__curr"],
                    "__ns": b["__ns"],
                    "__ne": b["__ne"],
                    "__lg": b["__lg"],
                    "__side": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

        unioned = batch_ds.map_batches(tag_events, batch_format="pyarrow", zero_copy_batch=True)
        if state_ds is not None:
            unioned = unioned.union(
                state_ds.map_batches(tag_state, batch_format="pyarrow", zero_copy_batch=True)
            )

        def per_part(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["__side"] == 1]
            ev = g[g["__side"] == 0].sort_values([user_col, ts_col], kind="mergesort")
            st = st.set_index(user_col)
            out_rows = []
            if len(ev):
                users = ev[user_col].to_numpy()
                ts = ev[ts_col]
                new_user = ev[user_col] != ev[user_col].shift()
                carry_last = pd.Series(
                    st["__last"].reindex(ev[user_col]).to_numpy(), index=ev.index
                )
                eff_prev = ts.shift().where(~new_user, carry_last)
                brk = (ts - eff_prev > gap) | eff_prev.isna()
                sid = brk.cumsum()
                seg = (
                    pd.DataFrame({user_col: users, "sid": sid.to_numpy()})
                    .groupby([user_col, "sid"], sort=False)
                    .size()
                    .reset_index(name="cnt")
                )
                first_brk = brk.groupby(users, sort=False).first()
                carry_curr = st["__curr"].reindex(first_brk.index).fillna(0).astype("int64")
                # first segment continues the carried open session when the
                # user's first event did NOT break
                fseg = seg.groupby(user_col, sort=False).head(1).set_index(user_col)["cnt"]
                add = carry_curr.where(~first_brk, 0)
                seg_first_adj = fseg + add
                seg = seg.set_index(user_col)
                per_user = seg.groupby(level=0, sort=False)["cnt"]
                n_breaks = brk.groupby(users, sort=False).sum().astype("int64")
                max_mid = per_user.max()
                last_seg = seg.groupby(level=0, sort=False)["cnt"].last()
                batch_cnt = pd.Series(np.ones(len(ev), dtype=np.int64)).groupby(users, sort=False).sum()
                last_ts_new = ts.groupby(users, sort=False).max()
                prev_ns = st["__ns"].reindex(n_breaks.index).fillna(0).astype("int64")
                prev_ne = st["__ne"].reindex(n_breaks.index).fillna(0).astype("int64")
                prev_lg = st["__lg"].reindex(n_breaks.index).fillna(0).astype("int64")
                # candidates for longest: every batch segment total (first
                # adjusted by carry), plus the carried longest
                longest_new = np.maximum.reduce(
                    [
                        prev_lg.to_numpy(),
                        max_mid.reindex(n_breaks.index).to_numpy(),
                        seg_first_adj.reindex(n_breaks.index).to_numpy(),
                    ]
                )
                # open session length: last segment, adjusted if the user
                # had exactly one segment that continued the carry
                one_seg = per_user.count() == 1
                curr_new = last_seg + add.where(one_seg, 0)
                upd = pd.DataFrame(
                    {
                        user_col: n_breaks.index,
                        "__last": last_ts_new.to_numpy(),
                        "__curr": curr_new.reindex(n_breaks.index).astype("int64").to_numpy(),
                        "__ns": (prev_ns + n_breaks).to_numpy(),
                        "__ne": (prev_ne + batch_cnt.reindex(n_breaks.index)).to_numpy(),
                        "__lg": np.maximum(
                            longest_new, curr_new.reindex(n_breaks.index).to_numpy()
                        ).astype("int64"),
                    }
                )
                out_rows.append(upd)
            untouched = st[~st.index.isin(ev[user_col])].reset_index()
            if len(untouched):
                out_rows.append(
                    untouched[[user_col, "__last", "__curr", "__ns", "__ne", "__lg"]]
                )
            if not out_rows:
                return pd.DataFrame(
                    {
                        user_col: pd.array([], dtype="int64"),
                        "__last": pd.array([], dtype="datetime64[us]"),
                        "__curr": pd.array([], dtype="int64"),
                        "__ns": pd.array([], dtype="int64"),
                        "__ne": pd.array([], dtype="int64"),
                        "__lg": pd.array([], dtype="int64"),
                    }
                )
            return pd.concat(out_rows, ignore_index=True)

        return hash_partitioned_groups(unioned, [user_col], per_part, num_partitions=num_partitions)

    for i in range(n_batches):
        lo_c, hi_c = cuts[i], cuts[i + 1]

        def in_slice(b: pa.Table, lo_c=lo_c, hi_c=hi_c, last=(i == n_batches - 1)) -> pa.Table:
            ts = b[ts_col].to_pandas()
            m = (ts >= lo_c) & ((ts <= hi_c) if last else (ts < hi_c))
            return b.filter(pa.array(m.to_numpy()))

        batch_ds = src.map_batches(in_slice, batch_format="pyarrow", zero_copy_batch=True)
        state_ds = fold(batch_ds, state_ds).materialize()

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: b[user_col],
                "n_sessions": b["__ns"],
                "n_events": b["__ne"],
                "longest_session_events": b["__lg"],
            }
        )

    return state_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def scd2_enrich(
    facts: Dataset,
    dim: Dataset,
    key: str,
    ts_col: str,
    value_cols: list[str],
    right_key: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    num_partitions: int = 64,
) -> Dataset:
    """Slowly-changing-dimension (type 2) enrichment — the warehouse
    lookup "which version of this entity was in effect when the fact
    happened": each fact row attaches the dimension version with
    ``valid_from <= ts`` and (``valid_to`` NULL or ``ts < valid_to``).
    Composed from the as-of join (latest valid_from <= ts per key) plus a
    vectorized expiry pass that NULLs the attached values when the
    matched version had already closed (validity GAPS yield NULLs, same
    as SQL's interval left join). One keyed exchange (the as-of union
    shuffle); no per-row probing."""

    j = asof_join(
        facts,
        dim,
        by=key,
        right_by=right_key or key,
        left_ts=ts_col,
        right_ts=valid_from,
        right_value_cols=value_cols + [valid_to],
        num_partitions=num_partitions,
    )

    def expire(b: pa.Table) -> pa.Table:
        vt = b[valid_to]
        expired = pc.and_kleene(pc.is_valid(vt), pc.greater_equal(b[ts_col], vt))
        expired = pc.fill_null(expired, False)
        t = b
        for c in value_cols:
            t = t.set_column(
                t.schema.get_field_index(c),
                c,
                pc.if_else(expired, pa.nulls(b.num_rows, b.schema.field(c).type), b[c]),
            )
        return t.drop_columns([valid_to])

    return j.map_batches(expire, batch_format="pyarrow", zero_copy_batch=True)


def interval_overlap_join(
    ds: Dataset,
    id_col: str,
    s_col: str,
    e_col: str,
    bucket_us: int = 6 * 3600 * 1_000_000,
    num_partitions: int = 64,
    dense_bucket_threshold: int = 4096,
) -> Dataset:
    """Interval x interval overlap self-join: all pairs with
    ``a.s < b.e AND b.s < a.e`` plus the overlap length — the
    concurrency/conflict detector (overlapping sessions, double
    bookings, co-active sensors). Each interval replicates only to the
    time buckets it spans, and a pair is emitted ONLY from the bucket
    containing ``max(a.s, b.s)`` (the overlap's start bucket) — exactly
    once, no cross-bucket dedup pass. Empty/inverted intervals
    (``e <= s``) overlap nothing under the strict predicate and are
    dropped map-side (they would also break the bucket-span algebra).

    Inside each hash partition, buckets up to ``dense_bucket_threshold``
    rows pair via one vectorized self-merge + mask (density² candidates
    scanned — fine when small); denser buckets switch to a per-bucket
    SWEEP LINE (sort by start + min-end heap of active intervals:
    O(n log n + output) instead of density² for long buckets full of
    short intervals). Identical output either way (pinned in pytest).
    int64 microseconds end-to-end so overlap lengths are exact. Size
    ``bucket_us`` near the typical interval length: replication factor
    ~len/bucket. Output: (id_a, id_b, overlap_us)."""
    import heapq

    import numpy as np

    def explode(b: pa.Table) -> pa.Table:
        s = b[s_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = b[e_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        valid = e > s  # empty/inverted intervals participate in no overlap
        s, e, ids = s[valid], e[valid], ids[valid]
        b0 = s // bucket_us
        b1 = (e - 1) // bucket_us
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        # bucket ranges via index algebra (no per-row listcomp)
        seg_start = np.repeat(np.cumsum(reps) - reps, reps)
        bkt = b0[idx] + (np.arange(idx.size, dtype=np.int64) - seg_start)
        return pa.table(
            {
                "__bkt": pa.array(bkt, pa.int64()),
                id_col: pa.array(ids[idx], b[id_col].type),
                "s": pa.array(s[idx]),
                "e": pa.array(e[idx]),
            }
        )

    rows = ds.select_columns([id_col, s_col, e_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    _EMPTY = {
        "id_a": pd.array([], dtype="int64"),
        "id_b": pd.array([], dtype="int64"),
        "overlap_us": pd.array([], dtype="int64"),
    }

    def _merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="__bkt")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if m.empty:
            return pd.DataFrame(_EMPTY)
        os_ = np.maximum(m["s_x"].to_numpy(), m["s_y"].to_numpy())
        oe = np.minimum(m["e_x"].to_numpy(), m["e_y"].to_numpy())
        keep = (os_ < oe) & (os_ // bucket_us == m["__bkt"].to_numpy())
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_x"].to_numpy()[keep],
                "id_b": m[f"{id_col}_y"].to_numpy()[keep],
                "overlap_us": (oe - os_)[keep].astype("int64"),
            }
        )

    def _sweep_bucket(sub: pd.DataFrame, bkt: int) -> pd.DataFrame:
        ids = sub[id_col].to_numpy()
        s = sub["s"].to_numpy()
        e = sub["e"].to_numpy()
        order = np.lexsort((ids, s))
        ids, s, e = ids[order], s[order], e[order]
        emit_here = (s // bucket_us) == bkt  # overlap start = s_i for sorted scan
        active: list[tuple[int, int]] = []  # (end, row pos) min-end heap
        out_a: list = []
        out_b: list = []
        out_ov: list = []
        for i in range(len(s)):
            si = int(s[i])
            while active and active[0][0] <= si:
                heapq.heappop(active)
            if emit_here[i]:
                for ej, j in active:  # every active j overlaps i (e_j > s_i)
                    if ids[j] != ids[i]:
                        a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                        out_a.append(a)
                        out_b.append(b)
                        out_ov.append(min(int(e[i]), ej) - si)
            heapq.heappush(active, (int(e[i]), i))
        return pd.DataFrame(
            {
                "id_a": np.asarray(out_a, dtype="int64"),
                "id_b": np.asarray(out_b, dtype="int64"),
                "overlap_us": np.asarray(out_ov, dtype="int64"),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(_EMPTY)
        counts = g["__bkt"].value_counts()
        dense = counts[counts > dense_bucket_threshold].index
        if len(dense) == 0:
            return _merge_pairs(g)
        frames = []
        sparse = g[~g["__bkt"].isin(set(dense))]
        if len(sparse):
            frames.append(_merge_pairs(sparse))
        for bkt in dense:
            frames.append(_sweep_bucket(g[g["__bkt"] == bkt], int(bkt)))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(_EMPTY)

    return hash_partitioned_groups(rows, ["__bkt"], per_part, num_partitions=num_partitions)
