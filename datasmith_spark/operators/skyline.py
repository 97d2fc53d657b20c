"""2D Pareto skyline (maxima) — the non-dominated frontier of points
maximizing two metrics, e.g. picking training-data sources that are
pareto-optimal on (quality, volume).

A point p is dominated if some q has q.x >= p.x AND q.y >= p.y with at
least one strict. The naive form is the quadratic NOT EXISTS self-join
(exactly what the q102 DuckDB oracle runs); the Spark operator is the
classic sort-sweep [Kung/Luccio/Preparata 1975] expressed as TWO window
functions over ONE sort:

  * m_gt  = max(y) over points with STRICTLY greater x
            (range frame (unboundedPreceding, -1) on x DESC — for
            integer metrics "-1 preceding" is exactly x' >= x+1)
  * m_eq  = max(y) within the same-x partition

  keep <=> (m_gt is null or m_gt < y) and y = m_eq

Duplicate points do not dominate each other (both kept), pinned in
pytest. No joins, no cross product.

Scale: the sweep needs a TOTAL order on x, i.e. a single-partition
window — fine for the usual per-entity-aggregate input, wrong for raw
10^12-row input. skyline2d is therefore two-phase [Borzsony/Kossmann/
Stocker ICDE'01 shape]: phase 1 runs the same sweep INSIDE hash buckets
(distributed; a global-skyline point is undominated in every subset, so
phase 1 never loses one), phase 2 re-sweeps the few local survivors on
one partition. Metrics must be integers (exactness + the -1 range
trick)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ALL = tuple()


def _sweep(df: DataFrame, x: str, y: str, bucket: str | None) -> DataFrame:
    part = [bucket] if bucket else []
    w_gt = (
        Window.partitionBy(*part)
        .orderBy(F.col(x).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*part, x)
    out = df.withColumn("_mgt", F.max(y).over(w_gt)).withColumn(
        "_meq", F.max(y).over(w_eq)
    )
    keep = (F.col("_mgt").isNull() | (F.col("_mgt") < F.col(y))) & (
        F.col(y) == F.col("_meq")
    )
    return out.filter(keep).drop("_mgt", "_meq")


def skyline2d(
    points: DataFrame, x: str, y: str, id_col: str | None = None, n_buckets: int = 32
) -> DataFrame:
    """Rows of `points` on the maxima frontier of integer columns (x, y).

    id_col (any deterministic column) hash-buckets phase 1; omit it to
    run the plain single-sweep form (small inputs)."""
    if id_col is not None and n_buckets > 1:
        local = _sweep(
            points.withColumn(
                "_bk",
                F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(n_buckets)),
            ),
            x, y, "_bk",
        ).drop("_bk")
    else:
        local = points
    return _sweep(local, x, y, None)
