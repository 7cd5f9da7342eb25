"""Local stand-in for the driver's correctness gate: run every
__ray_entry__ query at a given sf, run its oracle SQL through DuckDB on the
same parquet views, compare row count + column names + order-insensitive
values. Usage: PYTHONPATH=/root/repo python scripts/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(round(v, 6))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                row.append(tuple(round(float(x), 5) for x in v))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(map(repr, rows))


def main(sf_dir: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = {s for s in os.environ.get("ORACLE_ONLY", "").split(",") if s}
    skip = {s for s in os.environ.get("ORACLE_SKIP", "").split(",") if s}
    failures = 0
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok~  {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            cg, cw = canon(got), canon(want)
            if cg != cw:
                diff = [(a, b) for a, b in zip(cg, cw) if a != b][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    print(f"\n{len(qs) - failures}/{len(qs)} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    code = main(sf)
    import ray

    ray.shutdown()
    sys.exit(code)
