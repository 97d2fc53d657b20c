"""Text-analysis operators over a document/transcript table.

All-native Column expressions (whole-stage codegen; regexes chosen to behave
identically under Java regex and RE2 so DuckDB oracles can mirror them).

These are the documents-table counterparts of the clips pipeline's transcript
stages: token counting, quality scoring, marker-based classification and
content fingerprinting for a training-data curation pipeline at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORD_PATTERN = r"\b(the|a|and|of|to|in)\b"
SYMBOL_PATTERN = r"[^a-z0-9 ]"

# marker-token classes for the SQL-expressible argmax classifier
CLASS_MARKERS = {
    "db": r"\b(table|row|column|index|key)\b",
    "stream": r"\b(stream|batch|window|event)\b",
    "compute": r"\b(scan|hash|sort|merge|join)\b",
}


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language token statistics (F12-family tokenizer counting,
    /root/reference/src/datasmith/scrape/build_reports.py:235-246)."""
    n_tok = F.size(tokens_col(F.col("text")))
    return (
        docs.withColumn("n_tokens", n_tok)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def quality_flags(docs: DataFrame) -> DataFrame:
    """Per-language heuristic quality-rule hit counts (the documents-table
    mirror of the clips rules stage; ancestry filter_dashboards.py:113-121)."""
    length = F.length("text").cast("double")
    n_tok = F.size(tokens_col(F.col("text"))).cast("double")
    sym_ratio = F.regexp_count(F.col("text"), F.lit(SYMBOL_PATTERN)).cast("double") / length
    stop_ratio = F.regexp_count(F.col("text"), F.lit(STOPWORD_PATTERN)).cast("double") / n_tok
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((length < 100).cast("long")).alias("n_short"),
        F.sum((sym_ratio > 0.05).cast("long")).alias("n_symbolic"),
        F.sum((stop_ratio < 0.02).cast("long")).alias("n_low_stopword"),
    )


def classify_argmax(docs: DataFrame) -> DataFrame:
    """Marker-token argmax classifier (fixed tie-break precedence db >
    stream > compute) — the SQL-expressible skeleton of langid scoring."""
    s = {k: F.regexp_count(F.col("text"), F.lit(p)) for k, p in CLASS_MARKERS.items()}
    pred = (
        F.when((s["db"] >= s["stream"]) & (s["db"] >= s["compute"]), F.lit("db"))
        .when(s["stream"] >= s["compute"], F.lit("stream"))
        .otherwise(F.lit("compute"))
    )
    return docs.withColumn("pred", pred).groupBy("lang", "pred").agg(F.count("*").alias("n"))


def fingerprint_col(text: Column) -> Column:
    """md5 over whitespace-normalized lowercase text — the exact-dedup key.

    md5 hex is identical across Spark and DuckDB, so this fingerprint is
    oracle-checkable end to end.
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm.cast("binary"))


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """MOSS-style winnowing document fingerprints (rolling k-gram + window min).

    words -> k-gram strings -> md5 (hex, engine-portable) -> sliding window
    of w hashes -> per-window min -> DISTINCT (doc_id, fingerprint). All
    native exprs; the window min runs inside each doc's partition (map-side
    after a hash repartition on doc_id), so the op scales as a single
    shuffle-by-doc no matter the corpus size.

    Ancestry: content-key dedup (seen-set of (typ, url) pairs,
    /root/reference/src/datasmith/scrape/code_coverage.py:83-88) upgraded to
    locality-sensitive document fingerprints.
    """
    # fully-native k-gram hashing (no HOF lambdas — an interpreted
    # transform(sequence, slice) re-evaluated split(text) per element):
    # zip k shifted slices of the materialized words array, then md5 the
    # concatenated struct fields. posexplode keeps the k-gram position for
    # the winnowing window.
    words = F.col("_w")
    n_kg = F.size(words) - (k - 1)
    zipped = F.arrays_zip(*[F.slice(words, 1 + j, n_kg) for j in range(k)])
    # guard: slice with non-positive length errors; short docs get no k-gram
    kgrams = F.when(n_kg >= 1, zipped).otherwise(
        F.array().cast("array<struct<" + ",".join(f"`{j}`:string" for j in range(k)) + ">>")
    )
    g = (
        docs.withColumn("_w", F.split(F.trim(F.col("text")), r"\s+"))
        .select("doc_id", F.posexplode(kgrams).alias("pos", "_z"))
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.concat_ws(" ", *[F.col("_z").getField(str(j)) for j in range(k)]).cast("binary")
            ).alias("h"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        g.withColumn("fp", F.min("h").over(win))
        .select("doc_id", "fp")
        .distinct()
    )


def fingerprint_pairs(
    docs: DataFrame, k: int = 3, w: int = 4, min_shared: int = 10, cap: int | None = None
) -> DataFrame:
    """Near-duplicate candidates: doc pairs sharing >= min_shared winnowing
    fingerprints (equi-join on fingerprint, count per pair).

    The fingerprint join is hot-key-capped (operators/pairs.py): a
    boilerplate fingerprint shared by m > cap documents contributes star
    pairs (min-id representative, member) instead of m^2 rows — such
    fingerprints carry no discriminative signal anyway."""
    from .pairs import capped_key_pairs

    fp = winnow_fingerprints(docs, k, w)
    return (
        capped_key_pairs(fp, "fp", "doc_id", cap)
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def bpe_token_hist(docs: DataFrame) -> DataFrame:
    """BPE-ish regex tokenization histogram: word / number / punctuation
    token counts per language (class-based pattern, Java+RE2 dialect-safe)."""
    def n_tok(pat: str):
        return F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0))).cast("bigint")

    return docs.groupBy("lang").agg(
        n_tok("[a-z]+").alias("n_word"),
        n_tok("[0-9]+").alias("n_num"),
        n_tok(r"[^a-z0-9\s]").alias("n_punct"),
        F.count("*").alias("n_docs"),
    )
