"""Distributed k-means on an integer lattice + SemDeDup-style semantic
near-dup pairs (Spark operators).

Lloyd's algorithm as DataFrame ops with broadcast centroids — the standard
distributed shape (assignment is a narrow map against k broadcast
centroids; the update is one map-side-combinable aggregation per round;
the only driver-side data is the k x dims centroid table, bounded metadata
like the pipeline's n_parts). What makes THIS k-means oracle-checkable is
that every decision is integer-exact:

  * embeddings are quantized to a 2^16 lattice (floor((x + 1) * 65536) —
    float32 -> double is exact, +1 and the power-of-two scale are exact,
    floor is deterministic), so
  * every distance is an int64 sum of int64 squares (exact in ANY
    summation order — no float reduction to pin), and
  * centroid updates are per-dim integer floor-means of non-negative sums
    (Spark `div` truncation == DuckDB `//` floor on non-negative ints).

Ties in the assignment argmin break to the LOWEST centroid id on both
sides. Initialization is seedless and engine-portable: the k vectors with
the smallest md5(vec_id) (the q45 shuffle construction). The result is a
deterministic function of the input that DuckDB re-derives bit-for-bit —
an ITERATIVE ML algorithm under the same value-check discipline as the
relational operators.

SemDeDup (Abbas et al. 2023): cluster first, then look for near-dups ONLY
within a cluster — the cluster assignment bounds the pair join the way
LSH bands bound the text/audio dedup joins. semantic_dup_pairs emits
within-cluster pairs with exact lattice distance <= tau.

At 10^12 vectors: assignment is shuffle-free; each update is ONE hash
aggregation on k keys; the within-cluster pair join is the SemDeDup bound
(clusters are capped in practice by re-splitting oversized ones — noted,
not needed at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KM_K = 10
KM_ITERS = 3
KM_SCALE = 65536
KM_DIMS = 64


def quantized_points(embs: DataFrame) -> DataFrame:
    """(vec_id, xq: array<long>) — embeddings on the 2^16 integer lattice."""
    xq = F.transform(
        "embedding",
        lambda v: F.floor((v.cast("double") + F.lit(1.0)) * F.lit(float(KM_SCALE))).cast(
            "long"
        ),
    )
    return embs.select("vec_id", xq.alias("xq"))


def _dist_to(c: list[int]):
    """int64 squared lattice distance from column xq to constant centroid c."""
    carr = F.array(*[F.lit(int(v)).cast("long") for v in c])
    return F.aggregate(
        F.zip_with("xq", carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(pts: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """(vec_id, xq, cluster, dist): nearest centroid, ties -> lowest cid."""
    cids = sorted(cents)
    dists = F.array(*[_dist_to(cents[c]) for c in cids])
    best = F.array_min(dists)
    # array_position returns the FIRST index of the minimum (1-based), so
    # ties break to the lowest centroid id — mirrored in the SQL oracle
    cluster = F.array_position(dists, best) - 1
    return pts.select(
        "vec_id", "xq", cluster.cast("int").alias("cluster"), best.alias("dist")
    )


def kmeans_assign(
    embs: DataFrame, k: int = KM_K, iters: int = KM_ITERS, dims: int | None = None
) -> DataFrame:
    """(vec_id, cluster, dist) after `iters` Lloyd rounds from the seedless
    md5 init. dist is the exact int64 lattice distance to the final
    centroid (a free per-row quality signal, and it pins the centroid
    values through the value check without emitting 64-wide arrays)."""
    pts = quantized_points(embs).persist()
    try:
        cents = _fit_centroids(pts, k, iters, dims)
        assigned = _assign(pts, cents)
        # materialize before unpersisting the lineage source
        out = assigned.select("vec_id", "cluster", "dist").localCheckpoint(eager=True)
        return out
    finally:
        pts.unpersist()


def _fit_centroids(
    pts: DataFrame, k: int, iters: int, dims: int | None
) -> dict[int, list[int]]:
    """Seedless md5 init + `iters` Lloyd rounds over a persisted quantized
    points frame; returns the final centroid table (k x dims ints, bounded
    metadata). Extracted so kmeans_assign and kmeans_quality share the
    identical iteration bit-for-bit."""
    if dims is None:  # one first() of one int — bounded metadata
        dims = int(pts.select(F.size("xq")).first()[0])
    init = (
        pts.orderBy(F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    )
    cents = {i: [int(v) for v in r["xq"]] for i, r in enumerate(init)}
    assigned = _assign(pts, cents)
    for _ in range(iters):
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("xq", d + 1)).alias(f"s{d}")
                    for d in range(dims)
                ],
            )
            .collect()
        )
        for r in sums:  # empty clusters keep their previous centroid
            n = int(r["n"])
            cents[int(r["cluster"])] = [int(r[f"s{d}"]) // n for d in range(dims)]
        assigned = _assign(pts, cents)
    return cents


def kmeans_quality(
    embs: DataFrame, k: int = KM_K, iters: int = KM_ITERS, dims: int | None = None
) -> DataFrame:
    """Per-cluster QUALITY audit of the exact k-means: (cluster, n,
    n_boundary, sse) where sse = exact int64 sum of squared lattice
    distances to the own centroid and a point is BOUNDARY when its
    second-closest centroid is less than twice as far (squared units):
    d2 < 2*d1, the simplified-silhouette margin test kept exact by
    cross-multiplication. High boundary fractions mean the clustering is
    not separating the corpus (semdedup q74 inherits exactly that risk:
    near-dups split across two touching clusters are never compared).

    Same fit as kmeans_assign (shared _fit_centroids — bit-identical
    centroids); the final pass computes the SORTED per-point distance
    array against the k broadcast centroids (narrow map), then ONE
    map-side-combinable rollup. Everything integer-exact, so the DuckDB
    oracle re-derives fit AND audit bit-for-bit."""
    pts = quantized_points(embs).persist()
    try:
        cents = _fit_centroids(pts, k, iters, dims)
        cids = sorted(cents)
        dists = F.array(*[_dist_to(cents[c]) for c in cids])
        sorted_d = F.array_sort(dists)
        per_point = pts.select(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
            F.element_at(sorted_d, 1).alias("d1"),
            F.element_at(sorted_d, 2).alias("d2"),
        )
        out = (
            per_point.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum((F.col("d2") < 2 * F.col("d1")).cast("long"))
                .cast("long")
                .alias("n_boundary"),
                F.sum("d1").cast("long").alias("sse"),
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        pts.unpersist()


def semantic_dup_pairs(
    embs: DataFrame,
    tau: int,
    k: int = KM_K,
    iters: int = KM_ITERS,
    dims: int | None = None,
) -> DataFrame:
    """SemDeDup: (vec_a, vec_b, sq_dist) pairs with exact lattice distance
    <= tau, searched ONLY within a k-means cluster — the cluster bounds the
    pair join exactly like LSH bands bound the text dedup joins. tau is in
    squared lattice units ((2^16 * (x+1))^2 scale)."""
    pts = quantized_points(embs)
    asg = kmeans_assign(embs, k=k, iters=iters, dims=dims).select("vec_id", "cluster")
    pc = pts.join(asg, "vec_id")
    a = pc.select(
        F.col("cluster"), F.col("vec_id").alias("vec_a"), F.col("xq").alias("xa")
    )
    b = pc.select(
        F.col("cluster"), F.col("vec_id").alias("vec_b"), F.col("xq").alias("xb")
    )
    d = F.aggregate(
        F.zip_with("xa", "xb", lambda p, q: (p - q) * (p - q)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", d.alias("sq_dist"))
        .filter(F.col("sq_dist") <= tau)
    )
