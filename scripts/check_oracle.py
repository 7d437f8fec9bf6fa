"""Local mirror of the driver's correctness gate.

Runs every registered query at the given SF dir in Spark AND its DuckDB
oracle, compares row count, column names, and an order-insensitive value
multiset. Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from wikidatabots_spark import plans
from wikidatabots_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name, entry in plans.REGISTRY.items():
        if only and name not in only:
            continue
        sdf = entry.fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        sset = sorted(
            tuple(canon(r[c]) for c in scols) for r in srows
        )
        if entry.oracle is None:
            print(f"{name}: rows-only ({len(srows)} rows) OK")
            continue
        ddf = con.execute(entry.oracle).fetch_arrow_table()
        dcols = sorted(ddf.column_names)
        drows = ddf.to_pylist()
        dset = sorted(tuple(canon(r[c]) for c in dcols) for r in drows)
        ok = scols == dcols and len(sset) == len(dset) and sset == dset
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            print(f"{name}: MISMATCH spark_rows={len(sset)} duck_rows={len(dset)}")
            print(f"  spark cols: {scols}")
            print(f"  duck  cols: {dcols}")
            sonly = [r for r in sset if r not in set(dset)][:3]
            donly = [r for r in dset if r not in set(sset)][:3]
            print(f"  spark-only sample: {sonly}")
            print(f"  duck-only  sample: {donly}")
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries consistent with oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
