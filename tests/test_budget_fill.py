"""q87 budget fill: the two-phase (value-aggregate + boundary-rank)
decomposition must equal the direct one-window form on inputs designed to
stress every branch — value ties crossing the boundary, exact-budget hits,
groups entirely past the budget, and single-row languages."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from datasmith_spark.operators.sketches import budget_fill


def _direct_window(docs, budget):
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("cost"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum", F.sum("cost").over(w))
        .filter(F.col("cum") - F.col("cost") < budget)
        .select("doc_id", "lang", "cost")
    )


def _rows(df):
    return sorted((r["doc_id"], r["lang"], r["cost"]) for r in df.collect())


def test_two_phase_equals_window_on_tie_heavy_random_corpus(spark):
    rng = random.Random(87)
    rows = []
    for i in range(600):
        lang = rng.choice(["en", "de", "fr", "zz"])
        # tiny value domain -> many exact value ties, ties straddle budgets
        rows.append((i, lang, rng.choice([50, 50, 100, 100, 100, 300, 999])))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, cost bigint")
    for budget in (1, 49, 50, 100, 150, 1000, 10**9):
        got = _rows(budget_fill(docs, "lang", "doc_id", "cost", budget))
        want = _rows(_direct_window(docs, budget))
        assert got == want, (budget, len(got), len(want))


def test_edges_single_row_languages_and_exact_budget(spark):
    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 7), (3, "b", 7), (4, "b", 7)],
        "doc_id bigint, lang string, cost bigint",
    )
    # budget 14: lang b keeps docs 2,3 (cum-before 0,7 < 14; doc 4 cum-before 14)
    got = _rows(budget_fill(docs, "lang", "doc_id", "cost", 14))
    assert got == [(1, "a", 10), (2, "b", 7), (3, "b", 7)]


def test_registered_q87_exercises_the_boundary_branch(spark):
    # the sf0.01 documents table must hit the partial value-group path
    # (the cost cap guarantees a big tied group per language), otherwise
    # the oracle check would not cover the ranked branch
    from datasmith_spark.queries import _BUDGET_CHARS, _DOC_COST_CAP, _t

    docs = _t(spark, "/root/testdata/sf0.01", "documents").filter(F.col("n_chars") > 0)
    priced = docs.select(
        "doc_id", "lang", F.least(F.col("n_chars"), F.lit(_DOC_COST_CAP)).alias("cost")
    )
    agg = priced.groupBy("lang", "cost").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cost"))
    vals = (
        agg.withColumn("cum", F.sum(F.col("cnt") * F.col("cost")).over(w))
        .withColumn("r", F.lit(_BUDGET_CHARS) - F.col("cum") + F.col("cnt") * F.col("cost"))
        .withColumn(
            "k",
            F.when(F.col("r") <= 0, F.lit(0).cast("long")).otherwise(
                F.least(F.col("cnt"), F.expr("(r + cost - 1) DIV cost"))
            ),
        )
    )
    n_boundary = vals.filter((F.col("k") > 0) & (F.col("k") < F.col("cnt"))).count()
    assert n_boundary > 0
