"""Local emulation of the driver's correctness gate.

For each queries() entry with an oracle_sql(): run the Spark query and the
DuckDB SQL over the same sf_dir, then compare row count, column-name set and
an order-insensitive value multiset (floats compared exactly — both sides
round engine-side).

Usage: python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<null>")
            elif isinstance(v, float):
                vals.append(f"{v:.9g}")
            elif isinstance(v, (list, tuple)):
                vals.append(repr([str(x) for x in v]))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def run_one(spark, con, name, fn, sql, sf_dir) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir).toPandas()
    ddf = con.sql(sql).df()
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    if s_cols != d_cols:
        return False, f"columns differ: spark={s_cols} duck={d_cols}"
    if len(sdf) != len(ddf):
        return False, f"row count differs: spark={len(sdf)} duck={len(ddf)}"
    a = normalize(sdf.to_dict("records"), s_cols)
    b = normalize(ddf.to_dict("records"), s_cols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ, first diffs: {diff}"
    return True, f"OK ({len(sdf)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from datasmith_spark.queries import ORACLE_SQL, QUERIES
    from datasmith_spark.session import get_spark

    spark = get_spark(app="check-queries", cores=8, driver_mem="16g")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failed = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:32s} ROWS-ONLY ({n} rows)")
            except Exception as e:  # noqa: BLE001
                print(f"{name:32s} FAIL (rows-only): {e}")
                failed.append(name)
            continue
        try:
            ok, msg = run_one(spark, con, name, fn, sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {e}"
        print(f"{name:32s} {'OK' if ok else 'FAIL'}  {msg[:300]}")
        if not ok:
            failed.append(name)
    print(f"\n{len(failed)} failures: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
