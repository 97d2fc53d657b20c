"""Isotonic (antitonic) calibration via parallel Pool-Adjacent-Violators.

The calibration curve every threshold gate wants behind it: given per-clip
(score, outcome) pairs — here perplexity vs the pipeline's keep decision —
fit the best monotone (non-increasing) step function of outcome rate vs
score. PAVA computes the UNIQUE L2-optimal monotone fit, and because the
optimum is unique, a partition-parallel pooling pass followed by a merge
of boundary violations lands on exactly the same blocks as a sequential
scan — the construction Spark MLlib's IsotonicRegression uses, reproduced
here with EXACT integer arithmetic (block means are (sum, count) rational
pairs; every violation test is the cross-multiplied s_i*c_j vs s_j*c_i —
no float division anywhere, so the fixture oracle matches bit-for-bit).

Scale shape: rows are range-partitioned by score (global sort order), each
partition pools its slice with a LOCAL stack-based PAVA inside one Arrow
batch, and only the pooled blocks — in practice a tiny fraction of the
rows; worst case (strictly alternating outcomes) linear, the same bound
MLlib accepts — travel to the driver for the final boundary merge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCKS_DDL = "part_id int, ord long, n long, s long"


def pava_merge(blocks: list[tuple[int, int]], decreasing: bool = True) -> list[tuple[int, int]]:
    """Stack-based PAVA over ordered (n, s) blocks; returns pooled blocks.

    decreasing=True enforces non-increasing rates s/n along the order:
    a violation (rate_i < rate_{i+1}, i.e. s_i*n_{i+1} < s_{i+1}*n_i)
    pools the two blocks. All-integer; the unique optimal fit."""
    out: list[list[int]] = []
    for n, s in blocks:
        out.append([n, s])
        while len(out) >= 2:
            n2, s2 = out[-1]
            n1, s1 = out[-2]
            bad = s1 * n2 < s2 * n1 if decreasing else s1 * n2 > s2 * n1
            if not bad:
                break
            out[-2] = [n1 + n2, s1 + s2]
            out.pop()
    return [(n, s) for n, s in out]


def merge_equal_rates(blocks: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Canonicalize PAVA output to maximal LEVEL SETS of the fitted
    function: adjacent blocks with exactly equal rates (s1*n2 == s2*n1)
    merge. PAVA's fitted VALUES are unique but its block boundaries
    between equal-rate neighbors depend on pooling history — after this
    pass the block list is a pure function of the input, so independent
    implementations (and the committed fixture) agree exactly."""
    out: list[list[int]] = []
    for n, s in blocks:
        if out and out[-1][1] * n == s * out[-1][0]:
            out[-1][0] += n
            out[-1][1] += s
        else:
            out.append([n, s])
    return [(n, s) for n, s in out]


def isotonic_calibration(
    pairs: DataFrame, n_parts: int = 8, decreasing: bool = True
) -> DataFrame:
    """Antitonic calibration blocks for an (x: double, y: long 0/1, id)
    frame: (block_id, n, n_pos, rate_milli) with rates monotone
    non-increasing in x. Global order is (x, id) — deterministic under
    ties. Two-stage parallel PAVA (see module docstring); the merged
    block list is bounded metadata on the driver."""
    spark = pairs.sparkSession
    ordered = pairs.select("x", "y", "id").repartitionByRange(
        n_parts, F.asc("x"), F.asc("id")
    )

    def _pool(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"part_id": [], "ord": [], "n": [], "s": []})
        pdf = pdf.sort_values(["x", "id"], kind="mergesort")
        blocks = pava_merge(
            [(1, int(v)) for v in pdf["y"]], decreasing=decreasing
        )
        # partition identity: the minimum (x, id) keys the global order of
        # this partition's block run
        pid = int(pdf["_pid"].iloc[0])
        return pd.DataFrame(
            {
                "part_id": [pid] * len(blocks),
                "ord": range(len(blocks)),
                "n": [b[0] for b in blocks],
                "s": [b[1] for b in blocks],
            }
        )

    import pyspark.sql.functions as _F

    with_pid = ordered.withColumn("_pid", _F.spark_partition_id())
    partial = with_pid.groupBy("_pid").applyInPandas(_pool, schema=BLOCKS_DDL)
    rows = partial.collect()  # pooled blocks only — bounded metadata
    rows.sort(key=lambda r: (r["part_id"], r["ord"]))
    merged = merge_equal_rates(
        pava_merge([(int(r["n"]), int(r["s"])) for r in rows], decreasing)
    )
    return spark.createDataFrame(
        [
            (i, n, s, (1000 * s) // n)
            for i, (n, s) in enumerate(merged)
        ],
        "block_id long, n long, n_pos long, rate_milli long",
    )
