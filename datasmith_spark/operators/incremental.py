"""Incremental near-dup dedup against a persisted seen-key store.

The continuous-ingest companion of the batch self-join lanes (q38/q40): a
long-lived store holds the fingerprint keys of every clip already accepted
into the corpus; each incoming batch is checked against the store and only
novel clips' keys are appended. This is how dedup actually runs at 10^12
clips — the corpus is never re-self-joined; each ingest joins ONE bounded
batch against the store.

Scale design:
  * The store is a hash-bucketed catalog table on the key
    (tables.TableLayer.write_bucketed), so the store side of the probe
    join never shuffles — only the (small) incoming batch moves. Appends
    preserve the bucket spec.
  * Hot keys are frequency-capped on BOTH sides before matching (shared
    convention with operators/pairs.py): per-key join work is bounded by
    cap^2, and a pair glued together only by degenerate globally-hot keys
    cannot pass the Jaccard verify anyway.
  * Verification is exact-integer set-Jaccard, the same rule as
    audio_neardup_pairs: den*inter >= num*(sz_batch + sz_seen - inter).

Reference ancestry: the reference's resume semantics skip work whose cache
key already exists (/root/reference/src/datasmith/utils.py:85-119); this
lifts the same idea from "skip identical inputs" to "skip acoustic
near-duplicates of anything ever seen".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import TableLayer

SEEN_KEYS_DDL = "clip_id string, fp_key string"


def seen_store_neardup(
    batch_keys: DataFrame,
    store_keys: DataFrame,
    num: int = 35,
    den: int = 100,
    cap: int | None = None,
) -> DataFrame:
    """(batch_id, seen_id, n_shared, sz_batch, sz_seen) pairs where an
    incoming clip's key set has Jaccard >= num/den with an already-seen
    clip. Set semantics (per-id distinct keys) on both sides; hot keys
    (frequency > cap on either side) are excluded from matching."""
    from .pairs import pair_key_cap

    cap = pair_key_cap(cap)
    bk = (
        batch_keys.select(F.col("clip_id").alias("bid"), F.col("fp_key").alias("k"))
        .distinct()
    )
    sk = (
        store_keys.select(F.col("clip_id").alias("sid"), F.col("fp_key").alias("k"))
        .distinct()
    )
    cold = (
        bk.groupBy("k").agg(F.count("*").alias("_bc"))
        .join(sk.groupBy("k").agg(F.count("*").alias("_sc")), "k")
        .filter((F.col("_bc") <= cap) & (F.col("_sc") <= cap))
        .select("k")
    )
    inter = (
        bk.join(cold, "k")
        .join(sk, "k")
        .groupBy("bid", "sid")
        .agg(F.count("*").alias("n_shared"))
    )
    b_sz = bk.groupBy("bid").agg(F.count("*").alias("sz_batch"))
    s_sz = sk.groupBy("sid").agg(F.count("*").alias("sz_seen"))
    return (
        inter.join(b_sz, "bid")
        .join(s_sz, "sid")
        .filter(
            F.lit(den) * F.col("n_shared")
            >= F.lit(num)
            * (F.col("sz_batch") + F.col("sz_seen") - F.col("n_shared"))
        )
        .select(
            F.col("bid").alias("batch_id"),
            F.col("sid").alias("seen_id"),
            "n_shared",
            "sz_batch",
            "sz_seen",
        )
    )


def init_seen_store(
    tl: TableLayer, name: str, keys: DataFrame, n_buckets: int = 32
) -> None:
    """Create the seen-key store as a bucketed catalog table on fp_key."""
    tl.write_bucketed(keys, name, "fp_key", n_buckets=n_buckets)


def ingest_batch(
    spark: SparkSession,
    tl: TableLayer,
    store: str,
    batch_keys: DataFrame,
    num: int = 35,
    den: int = 100,
    cap: int | None = None,
    n_buckets: int = 32,
) -> tuple[DataFrame, int, int]:
    """One ingest step: probe the store, append only novel clips' keys.

    Returns (pairs, n_novel, n_dup). pairs is materialized (collected into
    the return frame via cache+count) BEFORE the append so the probe never
    sees its own batch. Novel keys are appended with the same bucket spec
    (mode=append + bucketBy keeps the layout; Spark refuses silently
    mismatched specs). Crash between probe and append = the batch is
    re-ingested next run; the store append is idempotent per batch only if
    the caller keys batches (same contract as the pipeline's checkpoint
    adoption) — dup rows in the store only widen future matching, never
    corrupt it."""
    if not tl.exists(spark, store):
        init_seen_store(tl, store, batch_keys, n_buckets=n_buckets)
        n = batch_keys.select("clip_id").distinct().count()
        empty = seen_store_neardup(batch_keys.limit(0), batch_keys.limit(0))
        return empty, n, 0
    store_df = tl.read(spark, store)
    # eager localCheckpoint, NOT persist: the append below refreshes the
    # catalog table, and Spark invalidates caches derived from a refreshed
    # table — a merely-persisted probe result would silently recompute
    # against the grown store (matching the batch to itself). Checkpointing
    # severs the lineage so the returned pairs are pinned pre-append.
    pairs = seen_store_neardup(
        batch_keys, store_df, num=num, den=den, cap=cap
    ).localCheckpoint(eager=True)
    dup_ids = pairs.select(F.col("batch_id").alias("clip_id")).distinct()
    novel = batch_keys.join(dup_ids, "clip_id", "left_anti")
    n_dup = dup_ids.count()
    n_novel = novel.select("clip_id").distinct().count()
    (
        novel.write.format(tl.fmt)
        .mode("append")
        .bucketBy(n_buckets, "fp_key")
        .sortBy("fp_key")
        .saveAsTable(tl.ident(store))
    )
    # saveAsTable refreshes only the WRITING session's relation cache. Under
    # foreachBatch, `novel` is bound to the micro-batch's cloned session, so
    # the caller's session would keep serving the stale pre-append file list
    # — and the NEXT batch's probe would silently miss these keys. Refresh
    # the caller's view explicitly (no-op when the sessions coincide).
    spark.catalog.refreshTable(tl.ident(store))
    return pairs, n_novel, n_dup


def compact_store(
    spark: SparkSession,
    tl: TableLayer,
    store: str,
    n_buckets: int = 32,
) -> tuple[int, int]:
    """Compact the seen-key store to distinct rows; returns (rows_before,
    rows_after).

    Why it exists: run_streaming_dedup's crash window (store append
    committed, streaming checkpoint not) re-appends at most one batch's
    keys on restart. Duplicate rows never corrupt matching (the probe is
    set-semantic), but they inflate probe-join work linearly — compaction
    is the maintenance op that restores minimality, the parquet-mode
    analogue of Iceberg's rewrite_data_files.

    Crash-safe staging: the distinct rows are written to a staging table
    with the SAME bucket spec (so the zero-exchange probe-join property
    survives compaction), then swapped in with DROP + RENAME. A crash
    between drop and rename loses only the compaction (the staging table
    still holds every key); callers recover by re-running compact_store,
    which adopts a complete staging table left by a crashed predecessor.
    """
    staging = f"{store}__compact"
    if tl.exists(spark, store):
        before = tl.read(spark, store).count()
        (
            tl.read(spark, store)
            .distinct()
            .write.format(tl.fmt)
            .mode("overwrite")
            .bucketBy(n_buckets, "fp_key")
            .sortBy("fp_key")
            .saveAsTable(tl.ident(staging))
        )
        spark.sql(f"DROP TABLE {tl.ident(store)}")
    elif tl.exists(spark, staging):
        # crashed predecessor: staging is complete (it was written before
        # the drop), adopt it
        before = -1
    else:
        raise ValueError(f"no store or staging table named {store!r}")
    spark.sql(f"ALTER TABLE {tl.ident(staging)} RENAME TO {tl.ident(store)}")
    after = tl.read(spark, store).count()
    return before, after


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table: one row per
    key whose membership or content changed, with status in
    {'added', 'removed', 'changed'} (unchanged keys are pruned).

    This is the changelog an Iceberg MERGE pipeline audits with — "what
    did this ingest actually do" — computed from the snapshots themselves,
    so it works on any keyed table, not just ones written through a
    CDC-aware sink (the reference's caching layer answers the same
    question per cache key by content-digest comparison:
    /root/reference/src/datasmith/utils.py:85-119).

    Scale design: each side is first projected to (key, md5(content)) —
    32 bytes + key — so the equi-join shuffles fingerprints, never row
    payloads; the join is a co-partitioned full outer on the key (plain
    shuffle join, no broadcast: both snapshots are corpus-sized) and the
    WHERE prunes the unchanged majority before anything downstream runs.
    Content hash uses concat_ws('|', ...) over string-cast columns —
    callers with nullable content columns should coalesce them to a
    sentinel first (concat_ws skips NULLs, so ('a', NULL) and ('a',)
    would collide; both engines share this semantic, so parity is
    unaffected either way).
    """
    def fp(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.md5(
                F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
            ).alias(alias),
        )

    o = fp(old, "h_old")
    n = fp(new, "h_new")
    joined = o.join(n, on=key, how="full_outer")
    return joined.select(
        F.col(key),
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    ).filter(
        F.col("h_old").isNull()
        | F.col("h_new").isNull()
        | (F.col("h_old") != F.col("h_new"))
    )


def rollup_partial(df: DataFrame, keys: list[str], val: str) -> DataFrame:
    """Per-key MERGEABLE partial aggregate of an integer value column:
    (n, s, mn, mx) — the materialized-rollup row format. Every field
    merges associatively (counts/sums add, min/max combine), which is
    what makes the rollup maintainable under late data without
    recomputing history."""
    v = F.col(val)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("bigint").alias("s"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def merge_rollups(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of rollup_partial tables into one: union + ONE
    re-aggregate with the merge functions (sum of n, sum of s, min of
    mn, max of mx). Incremental view maintenance for the distributive
    aggregates: merging the materialized base with a late-delta partial
    is VALUE-EQUAL to recomputing over base+delta rows (pinned by the
    q119 oracle, which recomputes from scratch) — at 10^12 rows the
    delta path touches only the affected key cells, never history."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
