"""Weighted sampling operators.

Probability-proportional-to-size sampling without replacement via
SEQUENTIAL POISSON SAMPLING [Ohlsson 1998, "Sequential Poisson Sampling",
J. Official Statistics 14(2); the order-sampling family also covers
Rosén's Pareto sampling]: each row gets the key u/w (u uniform in [0,1),
w its weight) and the k smallest keys per group are the sample.

Why this variant and not the better-known A-ES exponential key
(u^(1/w), Efraimidis & Spirakis 2006): the engine's portability contract.
Every value the driver's DuckDB oracle re-derives must be bit-identical
across engines, and `pow`/`ln` are libm calls whose last-ulp behavior is
implementation-defined. Sequential Poisson needs only md5 (shared), one
integer scale and two IEEE-754 divisions — all correctly-rounded
operations that any binary64 engine reproduces exactly. The inclusion
probabilities are approximately (not exactly) proportional to w — the
published, surveyed trade-off (Ohlsson §3) — and the determinism is what
makes resumes/backfills re-pick the same rows.

Reference ancestry: the reference samples dashboards uniformly with a
host RNG (/root/reference/src/datasmith/collect.py); this operator is the
weighted, seedless, engine-portable generalization a training-data
pipeline needs ("sample clips ∝ duration", "sample docs ∝ tokens").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

U_SCALE = float(1 << 32)  # value space of the first 8 md5 hex digits


def pps_key(id_col, weight_col):
    """The sequential-Poisson order key u/w: u = first-8-md5-hex(id) as a
    uint32 scaled to [0,1). Exactly two IEEE binary64 divisions in a fixed
    order — mirror the same order in any oracle SQL:
    (hex::BIGINT::DOUBLE / 4294967296.0) / w::DOUBLE."""
    u_int = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return (u_int.cast("double") / F.lit(U_SCALE)) / weight_col.cast("double")


def pps_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    weight_col: str = "w",
    id_col: str = "doc_id",
    oversample: float = 4.0,
    prefilter: bool = True,
) -> DataFrame:
    """Per-group PPS-without-replacement sample of k rows (smallest k
    sequential-Poisson keys), skew-safe.

    The naive form is one window over each full group — shuffle-hostile
    when a group is hot (the 10^12-row `en` stratum). This decomposition
    never windows a full group unless it must:

      1. ONE map-side-combined groupBy -> per-group sum(w) (tiny table).
      2. Broadcast threshold t_g = oversample*k / sum_w(g); the map-side
         filter key <= t_g keeps ~oversample*k expected survivors per
         group (E[#{key <= t}] = sum_i min(1, t*w_i) ~ t*sum_w), so the
         window shuffles O(k) rows per group, not the group.
      3. Any group with fewer than k survivors (tiny groups, extreme
         weight skew) falls back to the exact window over THAT group
         only. If >= k rows pass the cut, the global k smallest are all
         within it, so the union is VALUE-EQUAL to the plain one-window
         form regardless of the threshold's float rounding — the same
         prove-the-decomposition contract as budget_fill (sketches.py).

    Returns (group, id, weight as int, rk) for rk <= k.
    """
    keyed = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("int").alias("w"),
        pps_key(F.col(id_col), F.col(weight_col)).alias("_key"),
    )
    if prefilter:
        stats = keyed.groupBy("g").agg(F.sum(F.col("w").cast("double")).alias("_sw"))
        thr = stats.select("g", (F.lit(oversample * k) / F.col("_sw")).alias("_t"))
        sliver = keyed.join(F.broadcast(thr), "g").filter(F.col("_key") <= F.col("_t"))
        counts = sliver.groupBy("g").agg(F.count("*").alias("_n"))
        ok = counts.filter(F.col("_n") >= k).select("g")
        # deficient = every group NOT in ok (including zero-survivor groups)
        bad = stats.select("g").join(ok, "g", "left_anti")
        cand = sliver.drop("_t").join(F.broadcast(ok), "g", "left_semi").unionByName(
            keyed.join(F.broadcast(bad), "g", "left_semi")
        )
    else:
        cand = keyed
    win = Window.partitionBy("g").orderBy(F.col("_key").asc(), F.col("id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
        .select(
            F.col("g").alias(group_col),
            F.col("id").alias(id_col),
            "w",
            "rk",
        )
    )


def with_global_rank(
    df: DataFrame, order: list, rank_col: str = "_rk", n_parts: int | None = None
) -> DataFrame:
    """Exact 1-based row_number over a TOTAL order WITHOUT a
    single-partition window — the boundary-rank decomposition the
    entity-grain ranking queries (q48/q112/q145) need at 10^9+ rows:

      1. range-repartition by the order columns (each partition owns a
         contiguous key range, in order), materialized so the partition
         layout — and spark_partition_id — is pinned;
      2. local row_number per partition (ordinary partitioned window);
      3. global rank = local rank + broadcast prefix-offset of the
         partition row counts (a bounded n_parts-row side table).

    `order` must be a total order (include a unique tiebreak column) or
    ranks of ties are partition-placement-dependent — same contract as
    the row_number window it replaces.
    """
    spark = df.sparkSession
    if n_parts is None:
        # data-adaptive width: ~2M rows per range partition (a comfortable
        # per-task sort), capped at the session parallelism — a bench-scale
        # entity table ranks in one partition with near-zero machinery
        # overhead, a 10^9-entity table fans out. The sizing count is one
        # map-side aggregate over the (entity-grain, already reduced) input.
        n_rows = df.count()
        n_parts = max(
            1, min(n_rows // 2_000_000 + 1, spark.sparkContext.defaultParallelism, 64)
        )
    d2 = df.repartitionByRange(n_parts, *order).localCheckpoint(eager=True)
    d3 = d2.withColumn("_pid", F.spark_partition_id())
    counts = d3.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    return (
        d3.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, F.row_number().over(w_local) + F.col("_off"))
        .drop("_pid", "_off")
    )
