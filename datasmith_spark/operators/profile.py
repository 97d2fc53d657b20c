"""Table profiling — the per-column data-quality audit (row count, null
count, exact distinct count) every ingestion run publishes next to its
data. One row per column.

Shape: ONE aggregate pass emitting (count, null-count, countDistinct)
for every column, then an explode of the per-column struct array — so
the profile costs one job regardless of column count. Exact distinct
counts plan as Expand (one replica per distinct-agg) + a single
exchange; at 10^12 rows swap `exact=False` to use HLL++
`approx_count_distinct` (same single-pass shape, sketch-sized state) —
exactness is kept as the default because the q109 oracle compares
values and HLL estimates never match across engines (same argument as
q69's KMV vs HLL)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """(column string, n bigint, n_null bigint, n_distinct bigint) per column."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact
             else F.approx_count_distinct(F.col(c))).alias(f"_dist_{c}")
        )
    row = df.agg(*aggs)
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in df.columns
        ]
    )
    return row.select(F.explode(cols).alias("s")).select(
        "s.column", "s.n", "s.n_null", "s.n_distinct"
    )
