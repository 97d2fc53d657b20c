"""Deterministic mergeable sketches for corpus statistics at scale.

KMV (k-minimum-values) distinct-cardinality estimation [Bar-Yossef et al.
2002]: hash every key, keep only the k smallest hash values per group; if
fewer than k distinct hashes exist the count is exact, otherwise estimate
D = (k-1) / v_k where v_k is the k-th smallest hash mapped to (0, 1).

Why not approx_count_distinct: Spark's HLL++ and DuckDB's approx sketch
are different algorithms with different registers — their estimates can
never value-match, so the operator would be untestable against the oracle.
KMV over md5 is EXACTLY reproducible in any engine with the same hash
(both engines here share md5, and hex strings order like the integers they
encode), giving a sketch that is deterministic, mergeable, AND
value-checked — the property this repo requires of every operator.

Scale shape: the partial pass keeps k smallest distinct hashes per group
PER ARROW BATCH (bounded state, the mergeable-sketch property), so the
final exact selection sees at most batches x k rows per group instead of
the full distinct set. The group-hot window at the end therefore runs on a
bounded candidate set — no single reducer ever sorts a full group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 64
_HEX15 = 1 << 60  # value space of the first 15 md5 hex digits


def kmv_distinct(
    df: DataFrame, key: str, group: str, k: int = KMV_K, exact: bool = True
) -> DataFrame:
    """(group, n_exact?, k_used, kth_hash, est_distinct) per group value.

    est_distinct = n if the group has n < k distinct keys (exact by
    construction), else (k-1) * 2^60 / int(kth_hash[:15], 16) — both sides
    of the driver's value check compute the identical IEEE double.

    `exact=True` adds the true distinct count for comparison; it is the
    only full-shuffle column and would be dropped at 10^12 rows (the
    sketch path alone is the scale path — that is its point).
    """
    from collections.abc import Iterator

    import pandas as pd

    sel = df.filter(F.col(key).isNotNull()).select(
        F.col(group).alias("g"), F.md5(F.col(key).cast("string")).alias("h")
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # k smallest DISTINCT hashes per group per batch — bounded state
        for pdf in batches:
            yield (
                pdf.drop_duplicates()
                .sort_values(["g", "h"])
                .groupby("g", sort=False)
                .head(k)
            )

    cand = sel.mapInPandas(_partial, schema="g string, h string").dropDuplicates()
    w = Window.partitionBy("g").orderBy("h")
    topk = cand.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    sketch = topk.groupBy("g").agg(
        F.count("*").alias("n_min"), F.max("h").alias("kth_hash")
    )
    est = F.when(F.col("n_min") < k, F.col("n_min").cast("double")).otherwise(
        F.lit(float(k - 1) * _HEX15)
        / F.conv(F.substring("kth_hash", 1, 15), 16, 10).cast("double")
    )
    out = sketch.select(
        F.col("g").alias(group),
        F.lit(k).alias("k_used"),
        "kth_hash",
        est.alias("est_distinct"),
    )
    if exact:
        truth = sel.distinct().groupBy("g").agg(F.count("*").alias("n_exact"))
        out = out.join(truth.withColumnRenamed("g", group), group)
    return out


def kmv_sql(table_expr: str, key: str, group: str, k: int = KMV_K) -> str:
    """DuckDB mirror of kmv_distinct(exact=True) — the full computation
    (md5, distinct, per-group k-smallest window, hex->int parse, the
    (k-1)*2^60/v_k estimate) re-derived in SQL."""
    parse = (
        "list_sum(list_transform(range(1, 16), i -> "
        "(strpos('0123456789abcdef', substr(kth_hash, i, 1)) - 1)::BIGINT"
        " * (16::BIGINT ** (15 - i))::BIGINT))"
    )
    return f"""
    WITH d AS (
      SELECT DISTINCT {group} AS g, md5({key}::VARCHAR) AS h
      FROM {table_expr} WHERE {key} IS NOT NULL
    ),
    rn AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r FROM d
    ),
    sk AS (
      SELECT g, count(*)::BIGINT AS n_min, max(h) AS kth_hash
      FROM rn WHERE r <= {k} GROUP BY g
    ),
    truth AS (SELECT g, count(*)::BIGINT AS n_exact FROM d GROUP BY g)
    SELECT sk.g AS {group}, {k} AS k_used, kth_hash,
           CASE WHEN n_min < {k} THEN n_min::DOUBLE
                ELSE {float(k - 1) * _HEX15} / ({parse})::DOUBLE END AS est_distinct,
           n_exact
    FROM sk JOIN truth ON truth.g = sk.g
    """


def kmv_vocab_overlap(docs: DataFrame, k: int = KMV_K, exact: bool = True) -> DataFrame:
    """Pairwise cross-source VOCABULARY overlap via KMV set algebra
    [Beyer et al. SIGMOD 2007]: per source build the k-minimum-values
    sketch of its distinct-token md5 set, then for every source pair
    estimate |A ∪ B| from the merged-and-retrimmed sketch (union = merge +
    re-trim — the mergeability a 10^12-row planner relies on: sketches are
    k tiny hashes per source, so the pair stage never touches the corpus)
    and |A ∩ B| from the fraction of union-sketch members present in BOTH
    input sketches: est_inter = (n_common / k) * est_union. Sound because
    the k smallest of A ∪ B is a subset of K(A) ∪ K(B), and any common
    member of the union sketch must appear in both per-source sketches.
    When the union sketch is un-truncated (n_min < k) both estimates are
    EXACT by construction.

    The curation planning statistic this feeds: lexical similarity between
    sources (shared vocabulary mass) for domain-mixing and dedup-scope
    decisions — without ever shuffling the full token sets.

    KMV over md5 is exactly reproducible in any engine, so the DuckDB
    oracle (kmv_vocab_overlap_sql) re-derives the ENTIRE computation —
    sketches, pairwise merge, estimates — and the driver value-hashes the
    identical IEEE doubles (the q69 contract, extended to set algebra).

    exact=True adds the true distinct union/intersection per pair for
    comparison; those are the only corpus-wide joins and would be dropped
    at scale (the sketch path alone is the scale path). The source-pair
    frame is a broadcast nested-loop over the SOURCE LIST (tiny by
    definition: pairs of corpora, not pairs of rows)."""
    tok = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.col("source").alias("g"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    d = tok.select("g", F.md5("token").alias("h")).dropDuplicates()
    w = Window.partitionBy("g").orderBy("h")
    topk = (
        d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).select("g", "h")
    )
    srcs = topk.select("g").distinct()
    pairs = srcs.withColumnRenamed("g", "a").join(
        F.broadcast(srcs.withColumnRenamed("g", "b")), F.col("a") < F.col("b")
    )
    ua = pairs.join(topk.withColumnRenamed("g", "a"), "a").select(
        "a", "b", "h", F.lit(0).alias("side")
    )
    ub = pairs.join(topk.withColumnRenamed("g", "b"), "b").select(
        "a", "b", "h", F.lit(1).alias("side")
    )
    grp = ua.unionByName(ub).groupBy("a", "b", "h").agg(F.countDistinct("side").alias("ns"))
    wu = Window.partitionBy("a", "b").orderBy("h")
    top_u = grp.withColumn("_rn", F.row_number().over(wu)).filter(F.col("_rn") <= k)
    sk = top_u.groupBy("a", "b").agg(
        F.count("*").alias("n_min"),
        F.max("h").alias("kth_hash"),
        F.sum(F.when(F.col("ns") == 2, 1).otherwise(0)).cast("bigint").alias("n_common"),
    )
    est_union = F.when(F.col("n_min") < k, F.col("n_min").cast("double")).otherwise(
        F.lit(float(k - 1) * _HEX15)
        / F.conv(F.substring("kth_hash", 1, 15), 16, 10).cast("double")
    )
    est_inter = F.when(F.col("n_min") < k, F.col("n_common").cast("double")).otherwise(
        (F.col("n_common").cast("double") * est_union) / F.lit(float(k))
    )
    out = sk.select(
        F.col("a").alias("source_a"),
        F.col("b").alias("source_b"),
        F.lit(k).alias("k_used"),
        "n_min",
        "kth_hash",
        "n_common",
        est_union.alias("est_union"),
        est_inter.alias("est_inter"),
    )
    if exact:
        dd = tok.dropDuplicates()
        n_per = dd.groupBy("g").agg(F.count("*").alias("nd"))
        inter = (
            dd.withColumnRenamed("g", "a")
            .join(dd.withColumnRenamed("g", "b"), "token")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").cast("bigint").alias("n_inter_exact"))
        )
        out = (
            out.join(
                inter.withColumnRenamed("a", "source_a").withColumnRenamed("b", "source_b"),
                ["source_a", "source_b"],
                "left",
            )
            .withColumn("n_inter_exact", F.coalesce("n_inter_exact", F.lit(0)))
            .join(
                F.broadcast(n_per.select(F.col("g").alias("source_a"), F.col("nd").alias("_na"))),
                "source_a",
            )
            .join(
                F.broadcast(n_per.select(F.col("g").alias("source_b"), F.col("nd").alias("_nb"))),
                "source_b",
            )
            .withColumn(
                "n_union_exact",
                (F.col("_na") + F.col("_nb") - F.col("n_inter_exact")).cast("bigint"),
            )
            .drop("_na", "_nb")
        )
    return out


def kmv_vocab_overlap_sql(table_expr: str, k: int = KMV_K) -> str:
    """DuckDB mirror of kmv_vocab_overlap(exact=True) — sketches, pairwise
    merge+retrim, union/intersection estimates, and the exact comparison
    columns re-derived in SQL."""
    parse = (
        "list_sum(list_transform(range(1, 16), i -> "
        "(strpos('0123456789abcdef', substr(kth_hash, i, 1)) - 1)::BIGINT"
        " * (16::BIGINT ** (15 - i))::BIGINT))"
    )
    return rf"""
    WITH tok AS (
      SELECT source AS g, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM {table_expr} WHERE text IS NOT NULL
    ),
    tk AS (SELECT DISTINCT g, token FROM tok WHERE token <> ''),
    d AS (SELECT DISTINCT g, md5(token) AS h FROM tk),
    rn AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r FROM d),
    topk AS (SELECT g, h FROM rn WHERE r <= {k}),
    srcs AS (SELECT DISTINCT g FROM topk),
    pairs AS (SELECT s1.g AS a, s2.g AS b FROM srcs s1 JOIN srcs s2 ON s1.g < s2.g),
    u AS (
      SELECT p.a, p.b, t.h, 0 AS side FROM pairs p JOIN topk t ON t.g = p.a
      UNION ALL
      SELECT p.a, p.b, t.h, 1 AS side FROM pairs p JOIN topk t ON t.g = p.b
    ),
    grp AS (SELECT a, b, h, count(DISTINCT side) AS ns FROM u GROUP BY 1, 2, 3),
    tu AS (SELECT a, b, h, ns, row_number() OVER (PARTITION BY a, b ORDER BY h) AS r FROM grp),
    sk AS (
      SELECT a, b, count(*)::BIGINT AS n_min, max(h) AS kth_hash,
             sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END)::BIGINT AS n_common
      FROM tu WHERE r <= {k} GROUP BY a, b
    ),
    est AS (
      SELECT *, CASE WHEN n_min < {k} THEN n_min::DOUBLE
                     ELSE {float(k - 1) * _HEX15} / ({parse})::DOUBLE END AS est_union
      FROM sk
    ),
    n_per AS (SELECT g, count(*)::BIGINT AS nd FROM tk GROUP BY g),
    inter AS (
      SELECT x.g AS a, y.g AS b, count(*)::BIGINT AS n_inter_exact
      FROM tk x JOIN tk y ON y.token = x.token AND x.g < y.g
      GROUP BY 1, 2
    )
    SELECT e.a AS source_a, e.b AS source_b, {k} AS k_used, e.n_min, e.kth_hash,
           e.n_common, e.est_union,
           CASE WHEN e.n_min < {k} THEN e.n_common::DOUBLE
                ELSE (e.n_common::DOUBLE * e.est_union) / {float(k)} END AS est_inter,
           coalesce(i.n_inter_exact, 0) AS n_inter_exact,
           na.nd + nb.nd - coalesce(i.n_inter_exact, 0) AS n_union_exact
    FROM est e
    LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
    JOIN n_per na ON na.g = e.a
    JOIN n_per nb ON nb.g = e.b
    """


def binned_histogram(
    df: DataFrame, value: str, group: str, bin_width: int, pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Fixed-width integer-binned histogram per group, with cumulative
    counts and exact percentile-bin markers — the mergeable distribution
    manifest a corpus release ships (duration/length profiles per codec,
    language, source).

    Output per (group, bin): n, cum_n, total, and one boolean per requested
    percentile marking THE bin where that percentile lands:

        is_pXX  <=>  100*cum_n >= XX*total  AND  100*(cum_n - n) < XX*total

    — all-integer logic, so any engine reproduces it bit-for-bit (the
    determinism bar approx_percentile/t-digest cannot meet; same reasoning
    as kmv_distinct above).

    Scale shape: the histogram is ONE map-side-combined groupBy to at most
    (groups x bins) rows — the mergeable-sketch property (partial
    histograms from any partitioning sum to the same result). The windows
    run on the AGGREGATED bins, never the corpus: per-group state is the
    bin count (bounded by value range / bin_width), not the row count.
    """
    h = (
        df.filter(F.col(value).isNotNull())
        .groupBy(
            F.col(group).alias("grp"),
            F.floor(F.col(value) / F.lit(bin_width)).cast("long").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )
    wc = Window.partitionBy("grp").orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("grp")
    out = h.withColumn("cum_n", F.sum("n").over(wc)).withColumn(
        "total", F.sum("n").over(wt)
    )
    for p in pcts:
        out = out.withColumn(
            f"is_p{p}",
            (100 * F.col("cum_n") >= p * F.col("total"))
            & (100 * (F.col("cum_n") - F.col("n")) < p * F.col("total")),
        )
    return out


def budget_fill(
    df: DataFrame,
    group: str,
    key: str,
    cost: str,
    budget: int,
) -> DataFrame:
    """Greedy per-group budget fill without a per-row window over any full
    group: keep rows in (cost DESC, key ASC) order while the running total
    BEFORE each row is under `budget` (so the fill overshoots by at most
    one row per group). Requires cost > 0 on every row (filter upstream;
    zero-cost rows would divide by zero in the boundary math).

    Equivalent to the one-window form
        sum(cost) OVER (PARTITION BY group ORDER BY cost DESC, key ASC)
            - cost < budget
    by the identity cum_before(row i of value-group v) = cbv + (i-1)*v,
    but decomposed so a hot group never funnels through one reducer:
      1. groupBy(group, cost) -> cnt   (map-side combined, tiny result);
      2. a prefix-sum window over that value table plus integer math
         k = min(cnt, (budget - cbv + v - 1) DIV v) gives each value
         group's exact kept-count;
      3. value groups with k == cnt pass via a broadcast semi-join;
         only the (at most one per group) boundary value-group is
         row_number()-ranked, partitioned by (group, cost) — the boundary
         group alone, never the whole stratum.
    """
    agg = df.groupBy(group, cost).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(group).orderBy(F.desc(cost))
    vals = (
        agg.withColumn("cum", F.sum(F.col("cnt") * F.col(cost)).over(w))
        .withColumn("r", F.lit(budget) - F.col("cum") + F.col("cnt") * F.col(cost))
        .withColumn(
            "k",
            F.when(F.col("r") <= 0, F.lit(0).cast("long")).otherwise(
                F.least(F.col("cnt"), F.expr(f"(r + {cost} - 1) DIV {cost}"))
            ),
        )
    )
    full = vals.filter(F.col("k") == F.col("cnt")).select(group, cost)
    boundary = vals.filter((F.col("k") > 0) & (F.col("k") < F.col("cnt"))).select(
        group, cost, "k"
    )
    kept_full = df.join(F.broadcast(full), [group, cost], "left_semi")
    wb = Window.partitionBy(group, cost).orderBy(F.col(key).asc())
    kept_boundary = (
        df.join(F.broadcast(boundary), [group, cost])
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= F.col("k"))
    )
    out_cols = [key, group, cost]
    return kept_full.select(*out_cols).unionByName(kept_boundary.select(*out_cols))


CMS_D = 4   # CountMin hash rows
CMS_W = 32  # CountMin buckets per row


def _cms_bucket(key_col, j_col, w: int):
    """Row-j bucket for a key: first 8 md5 hex digits of 'key#j' as an
    integer, mod w — engine-portable (Spark conv(...,16,10) == DuckDB
    CAST('0x'||hex AS BIGINT), value-verified in tests)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", key_col, j_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_sketch(keys: DataFrame, key: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """CountMin sketch [Cormode & Muthukrishnan 2005] of a key stream:
    one (j, b, c) cell per hash row x bucket, c = how many stream items
    hashed there. The ONLY full-data pass is this map-side-combined
    groupBy down to d*w cells — bounded state no matter the stream size,
    and MERGEABLE (union of streams == cell-wise sum of sketches), the
    two properties that let 10^12-token frequency estimation run as a
    partial aggregate. Deterministic md5 bucketing (not Spark's xxhash)
    so any engine reproduces the sketch bit-for-bit — same portability
    argument as kmv_distinct above."""
    rows = keys.select(
        F.col(key).alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
    )
    return (
        rows.withColumn("b", _cms_bucket(F.col("k"), F.col("j"), w))
        .groupBy("j", "b")
        .agg(F.count("*").alias("c"))
    )


def cms_heavy_hitters(
    keys: DataFrame,
    key: str,
    threshold: int,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Heavy hitters by CountMin estimate: (key, est_cnt, true_cnt) for
    every distinct key whose sketch estimate min_j sketch[j][b_j(key)]
    reaches `threshold`. est_cnt >= true_cnt always (CMS never
    underestimates), so the filter has no false NEGATIVES; colliding keys
    can pass with true_cnt < threshold — the classic CMS false positive,
    deliberately present at the registered (d=4, w=32) sizing and exactly
    reproduced by the oracle. The probe runs on the DISTINCT key set
    (vocabulary-bounded) against the broadcast d*w-cell sketch — the raw
    stream is touched only by the sketch pass. true_cnt is emitted so the
    overestimate property itself is value-checked; a pure-sketch deploy
    at 10^12 keys drops it and keeps only the bounded passes."""
    # ONE map-side-combined groupBy is the only pass over the raw stream;
    # the sketch is then folded from the exact per-key counts (cell value =
    # sum of counts of the keys hashing there — identical to sketching the
    # raw stream, by sum-through-groups), so the d-way explode and its d
    # md5s per STREAM ITEM become d md5s per DISTINCT key.
    tf = keys.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("true_cnt"))
    tf = tf.localCheckpoint(eager=True)  # feeds sketch build AND probe
    probe = tf.select(
        "k", "true_cnt", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j")
    ).withColumn("b", _cms_bucket(F.col("k"), F.col("j"), w))
    sketch = probe.groupBy("j", "b").agg(F.sum("true_cnt").alias("c"))
    est = (
        probe.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("k")
        .agg(F.min("c").alias("est_cnt"), F.min("true_cnt").alias("true_cnt"))
    )
    return est.filter(F.col("est_cnt") >= threshold).select(
        F.col("k").alias(key), "est_cnt", "true_cnt"
    )


# ---------------------------------------------------------------------
# HyperLogLog with value-checkable registers
# ---------------------------------------------------------------------

HLL_M = 16           # registers (p=4): bucket = first md5 hex digit
_HLL_ALPHA_MILLI = 673  # alpha_16 = 0.673, scaled x1000 (integer math)
_HLL_CAP = 40        # cap rho so 2^(CAP - rho) terms stay exact BIGINTs


def hll_distinct(df: DataFrame, key: str, group: str, exact: bool = True) -> DataFrame:
    """HyperLogLog [Flajolet et al. 2007] per group, built so the SKETCH
    itself is value-checkable across engines (the same bar kmv_distinct
    sets): bucket = first md5 hex digit (m=16 registers), rho = leading-
    zero rank of the next 60 hash bits, register = max rho per bucket.

    The estimate is exact-integer end to end: the harmonic sum is
    Sigma 2^(40-min(rho,40)) over present registers plus 2^40 per empty
    register (all exact BIGINTs), and est_milli = (673 * m^2 * 2^40) DIV
    hsum — one integer division both engines reproduce bit-for-bit; the
    small-range linear-counting branch (V empty registers, raw estimate
    <= 2.5m) uses m*ln(m/V) rounded to milli-units. reg_digest is md5
    over the sorted bucket:rho pairs — two engines agree on the estimate
    BECAUSE they agree on every register.

    Scale shape: groupBy(group, bucket).max(rho) map-side combines to
    <= m rows per group per partition — the classic mergeable-register
    property; no row ever carries more than (group, 1 hex char, 1 int).
    n_exact (full distinct) is the accuracy exhibit; drop it at 10^12.
    """
    sel = df.filter(F.col(key).isNotNull()).select(
        F.col(group).alias("g"), F.md5(F.col(key).cast("string")).alias("h")
    )
    v = F.conv(F.substring("h", 2, 15), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(61)).otherwise(F.lit(61) - F.length(F.bin(v)))
    regs = (
        sel.select("g", F.substring("h", 1, 1).alias("bucket"), rho.alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_CAP} - least(m_rho, {_HLL_CAP}))")
    sk = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.sum(term).alias("hsum_present"),
        F.md5(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(":", F.col("bucket"), F.col("m_rho").cast("string"))
                    )
                ),
            )
        ).alias("reg_digest"),
    )
    empty = F.lit(HLL_M) - F.col("n_registers")
    hsum = F.col("hsum_present") + empty.cast("bigint") * F.lit(1 << _HLL_CAP)
    raw_milli = F.expr(
        f"CAST({_HLL_ALPHA_MILLI * HLL_M * HLL_M} AS BIGINT) "
        f"* CAST({1 << _HLL_CAP} AS BIGINT) DIV hsum"
    )
    lc_milli = F.floor(
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / empty.cast("double")) * 1000
    ).cast("bigint")
    est_milli = F.when(
        (empty > 0) & (raw_milli <= HLL_M * 2500), lc_milli
    ).otherwise(raw_milli)
    out = sk.withColumn("hsum", hsum).select(
        F.col("g").alias(group),
        "n_registers",
        "reg_digest",
        est_milli.alias("est_milli"),
        (est_milli.cast("double") / 1000.0).alias("hll_est"),
    )
    if exact:
        truth = sel.distinct().groupBy("g").agg(F.count("*").alias("n_exact"))
        out = out.join(truth.withColumnRenamed("g", group), group)
    return out


def hll_sql(table_expr: str, key: str, group: str) -> str:
    """DuckDB mirror of hll_distinct(exact=True) — md5, register build,
    integer harmonic sum, DIV estimate and digest re-derived in SQL."""
    parse = (
        "list_sum(list_transform(range(2, 17), i -> "
        "(strpos('0123456789abcdef', substr(h, i, 1)) - 1)::BIGINT"
        " * (16::BIGINT ** (16 - i))::BIGINT))"
    )
    cap, m, am = _HLL_CAP, HLL_M, _HLL_ALPHA_MILLI
    return f"""
    WITH d AS (
      SELECT DISTINCT {group} AS g, md5({key}::VARCHAR) AS h
      FROM {table_expr} WHERE {key} IS NOT NULL
    ),
    r AS (
      SELECT g, substr(h, 1, 1) AS bucket,
             CASE WHEN ({parse}) = 0 THEN 61
                  ELSE 61 - length(bin({parse})) END AS rho
      FROM d
    ),
    regs AS (
      SELECT g, bucket, max(rho) AS m_rho FROM r GROUP BY g, bucket
    ),
    sk AS (
      SELECT g, count(*)::INT AS n_registers,
             sum((1::BIGINT << ({cap} - least(m_rho, {cap}))))::BIGINT
               AS hsum_present,
             md5(string_agg(bucket || ':' || m_rho::VARCHAR, ','
                            ORDER BY bucket)) AS reg_digest
      FROM regs GROUP BY g
    ),
    est AS (
      SELECT *,
             hsum_present + ({m} - n_registers)::BIGINT * {1 << cap} AS hsum,
             ({am * m * m}::BIGINT * {1 << cap}::BIGINT)
               // (hsum_present + ({m} - n_registers)::BIGINT * {1 << cap})
               AS raw_milli
      FROM sk
    ),
    fin AS (
      SELECT g, n_registers, reg_digest,
             CASE WHEN ({m} - n_registers) > 0 AND raw_milli <= {m * 2500}
                  THEN CAST(floor({m}::DOUBLE
                            * ln({m}::DOUBLE / ({m} - n_registers)::DOUBLE)
                            * 1000) AS BIGINT)
                  ELSE raw_milli END AS est_milli
      FROM est
    ),
    truth AS (SELECT g, count(*)::BIGINT AS n_exact FROM d GROUP BY g)
    SELECT fin.g AS {group}, n_registers, reg_digest, est_milli,
           est_milli::DOUBLE / 1000.0 AS hll_est, n_exact
    FROM fin JOIN truth ON truth.g = fin.g
    """
