"""Similarity search over an embedding column (array<float>).

  * cosine_topk — brute-force exact top-k for a bounded query set: the query
    side is broadcast, the corpus is scanned once (the right baseline; at
    10^12 rows you bound the query set, never the corpus side).
  * lsh_buckets — random-hyperplane LSH signatures: the scale path. Bucket
    by sign pattern, then run brute-force only within buckets.
  * embedding_dup_pairs — near-duplicate vectors (cosine ~ 1); demo uses a
    bounded self-join, the docstring marks the LSH-prefilter production path.

Dot products are computed with F.aggregate over zip_with in DOUBLE — a
sequential left-to-right fold, reproducible in the DuckDB oracle
(list_dot_product over DOUBLE[]); all cosines are rounded engine-side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_N_PLANES = 8
LSH_SEED = 2024


def dot_col(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / F.sqrt(dot_col(a, a) * dot_col(b, b))


def cosine_topk(emb: DataFrame, n_queries: int = 5, k: int = 3) -> DataFrame:
    """Exact top-k cosine neighbors for vec_id < n_queries.

    Query side is tiny => broadcast nested-loop; corpus side streams.
    Ranking uses the ROUNDED cosine with vec_id tie-break so the result set
    is fully deterministic and oracle-reproducible.
    """
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_col(F.col("qe"), F.col("ce")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def hyperplanes(dims: int, n_planes: int = LSH_N_PLANES, seed: int = LSH_SEED) -> list[list[float]]:
    """Frozen seeded hyperplanes, rounded so they embed as SQL literals."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 4) for x in row] for row in rng.normal(size=(n_planes, dims))]


def lsh_bucket_col(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id ('10110...') from the frozen hyperplanes."""
    bits = [
        F.when(dot_col(emb, F.array(*[F.lit(v) for v in p])) > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_bucket_counts(emb: DataFrame, dims: int = 64) -> DataFrame:
    """ANN scale path: histogram of LSH buckets (candidate sets)."""
    planes = hyperplanes(dims)
    return (
        emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.999) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold).

    Demo shape: bounded self-join (fine at testdata scale). Production path
    at 10^12 rows: group by lsh_bucket_col first and self-join within
    buckets only — identical results for any threshold near 1.
    """
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(cosine_col(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
