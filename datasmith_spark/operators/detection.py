"""Per-group ordered-series changepoint detection with pluggable methods.

Mirror of the reference's strategy registry
(/root/reference/src/datasmith/detection/detect_breakpoints.py:76-83
`get_detection_method`, dispatching "rbf" | "asv"): here the two
interchangeable strategies are

  * "delta" — adjacent-point percentage shift (the rbf-analogue: compare
    each point to its predecessor, delta_pct = (cur-prev)/(prev+1e-10)*100,
    emit where below threshold). Implemented as applyInPandas (D3
    group-map), numpy-vectorized per group.
  * "step"  — windowed-mean step detection (the asv step_detect analogue:
    compare the mean of W points before vs W points after each position).
    Fully SQL-expressible, so it runs as NATIVE window functions — no
    Python in the plan at all.

Both emit the same output schema (user_id, idx, delta_pct), both are
oracle-checked (q15 / q15b). Scale: one shuffle on the group key either
way; the "step" plan stays entirely inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-10  # reference's epsilon guard (detect_breakpoints.py:27)
OUT_SCHEMA = "user_id bigint, idx int, delta_pct double"


def _detect_delta(events: DataFrame, threshold: float) -> DataFrame:
    """Adjacent-point shift via applyInPandas (reference get_breakpoints
    math, detect_breakpoints.py:15-38, incl. the 1e-10 epsilon)."""

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = pdf["value"].to_numpy(dtype=np.float64)
        if len(v) < 2:
            return pd.DataFrame({"user_id": [], "idx": [], "delta_pct": []})
        prev, cur = v[:-1], v[1:]
        delta = (cur - prev) / (prev + EPS) * 100.0
        pos = np.nonzero(delta < threshold)[0]
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "idx": pos + 2,  # 1-based row_number of the post-shift element
                "delta_pct": delta[pos],
            }
        )

    return events.groupBy("user_id").applyInPandas(detect, OUT_SCHEMA)


def _detect_step(events: DataFrame, threshold: float, w: int = 3) -> DataFrame:
    """Windowed-mean step shift as NATIVE window expressions (asv
    step_detect analogue): mean of w rows before vs w rows from the current
    position; positions without full windows are skipped."""
    order = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    before = F.avg("value").over(order.rowsBetween(-w, -1))
    after = F.avg("value").over(order.rowsBetween(0, w - 1))
    n = F.count("*").over(Window.partitionBy("user_id"))
    rn = F.row_number().over(order)
    delta = (F.col("after_m") - F.col("before_m")) / (F.col("before_m") + EPS) * 100.0
    return (
        events.select(
            "user_id",
            rn.alias("rn"),
            before.alias("before_m"),
            after.alias("after_m"),
            n.alias("n"),
        )
        .filter((F.col("rn") > w) & (F.col("rn") + (w - 1) <= F.col("n")) & (delta < threshold))
        .select("user_id", F.col("rn").cast("int").alias("idx"), delta.alias("delta_pct"))
    )


_METHODS: dict[str, Callable[..., DataFrame]] = {"delta": _detect_delta, "step": _detect_step}


def get_detection_method(method: str) -> Callable[..., DataFrame]:
    """Strategy lookup, same contract as the reference's get_detection_method."""
    try:
        return _METHODS[method]
    except KeyError:
        raise ValueError(f"Unknown method: {method}. Use {sorted(_METHODS)}.") from None


def detect_changepoints(
    events: DataFrame, method: str = "delta", threshold: float = -95.0
) -> DataFrame:
    """Per-user changepoints with the selected strategy; rounded delta_pct."""
    out = get_detection_method(method)(events.select("user_id", "ts", "event_id", "value"), threshold)
    return out.withColumn("delta_pct", F.round("delta_pct", 6))


def rolling_zscore_flags(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    cents_col: str,
    window: int = 10,
    min_n: int = 5,
    z: int = 2,
) -> DataFrame:
    """Rolling z-score anomaly flags with ALL-INTEGER arithmetic.

    For each row, over the trailing `window` rows of the same key
    (ordered by ts, id — a total order, so deterministic), flag when
    the value deviates more than z population-stddevs from the trailing
    mean. The float-free trick: with n, S = sum, SS = sum of squares
    (all BIGINT over integer cents), (x - S/n)^2 > z^2 * var_pop
    multiplies through by n^2 to (n*x - S)^2 > z^2 * (n*SS - S^2) —
    exact 64-bit integer compares, so the q101 oracle re-derives the
    decision bit-for-bit (no epsilon, no summation-order term).

    Output: one row per input row with n_prev and the flag.

    Shape: ONE window over the key partition (single shuffle); per-
    partition width = per-key row count. Overflow headroom: |cents| <
    2^26 and window < 2^7 keeps n*SS < 2^60."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window, -1)
    )
    x = F.col(cents_col)
    n = F.count(x).over(w)
    s = F.sum(x).over(w)
    ss = F.sum(x * x).over(w)
    dev = n * x - s
    flag = (n >= min_n) & (dev * dev > F.lit(z * z) * (n * ss - s * s))
    return events.select(
        key_col,
        id_col,
        ts_col,
        cents_col,
        n.alias("n_prev"),
        F.coalesce(flag, F.lit(False)).alias("flagged"),
    )


def group_ols_trend(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group closed-form OLS slope/intercept over INTEGER (x, y) —
    drift detection for per-entity metrics (spend trend, quality trend)
    without any float accumulation.

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); every sum is a BIGINT
    aggregate (exact, order-independent), the numerator/denominator are
    emitted as exact BIGINTs, and slope/intercept are each ONE IEEE
    division of exact integers — bit-identical across engines, so the
    q103 oracle compares the regression itself, no epsilon. Groups with
    n < 2 or zero x-variance are dropped (no slope exists).

    One shuffle (the groupBy); map-side partial aggregation applies.
    Overflow headroom documented in q103; for |y| ~ 2^26-cents-scale and
    group sizes into the tens of thousands, stay in int64; beyond that
    promote the sums to DECIMAL(38,0)."""
    x, y = F.col(x_col), F.col(y_col)
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.withColumn("num", num.cast("bigint"))
        .withColumn("den", den.cast("bigint"))
        .filter((F.col("n") >= 2) & (F.col("den") != 0))
        .select(
            key_col, "n", "num", "den",
            (F.col("num").cast("double") / F.col("den").cast("double"))
            .alias("slope"),
            (
                (F.col("sy") * F.col("den") - F.col("num") * F.col("sx"))
                .cast("double")
                / (F.col("n") * F.col("den")).cast("double")
            ).alias("intercept"),
        )
    )


def group_trimmed_mean(
    df: DataFrame,
    key_col: str,
    val_col: str,
    id_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """Two-sided trimmed mean per group over INTEGER values — the
    robust-location statistic (outlier-resistant per-entity average)
    with EXACT trim bounds: rank rows by (value, id) (a total order, so
    deterministic under duplicates), drop floor(n*trim_pct/100) rows at
    each end, emit the kept BIGINT sum/count and the mean as ONE IEEE
    division — bit-identical across engines, no float accumulation.

    One window shuffle; the rollup reuses the same key partitioning."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(val_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(key_col)
    t = (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn("_cut", F.floor(F.col("_n") * trim_pct / 100))
    )
    kept = t.filter(
        (F.col("_rk") > F.col("_cut")) & (F.col("_rk") <= F.col("_n") - F.col("_cut"))
    )
    return kept.groupBy(key_col).agg(
        F.first("_n").alias("n"),
        F.count(F.lit(1)).alias("kept_n"),
        F.sum(val_col).cast("bigint").alias("kept_sum"),
        (F.sum(val_col).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("tmean"),
    )


def group_weighted_median(
    df: DataFrame,
    key_col: str,
    val_col: str,
    weight_col: str,
    id_col: str,
) -> DataFrame:
    """Exact weighted median per group over INTEGER values and weights:
    the smallest value whose running weight (in (value, id) order)
    reaches half the group's total — lower weighted median, the
    integer-exact convention (2*cum >= total, no float midpoint), so
    the q111 oracle reproduces it bit-for-bit.

    One window shuffle: cumulative weight + total weight over the key
    partition, then min-filter on the crossing row. The same shape
    scales as every per-key window here (width = per-key rows)."""
    wc = (
        Window.partitionBy(key_col)
        .orderBy(F.col(val_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(key_col)
    t = (
        df.withColumn("_cum", F.sum(weight_col).over(wc))
        .withColumn("_tot", F.sum(weight_col).over(wt))
        .filter(2 * F.col("_cum") >= F.col("_tot"))
    )
    return (
        t.groupBy(key_col)
        .agg(
            F.min(F.struct(F.col(val_col), F.col(id_col))).alias("_m"),
            F.first("_tot").alias("w_total"),
        )
        .select(
            key_col,
            F.col(f"_m.{val_col}").alias("wmedian"),
            F.col("w_total"),
        )
    )


def group_auc(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney rank-sum identity —
    the filter-evaluation metric (how well does `score_col` separate
    `label_col`?) computed WITHOUT thresholds, curves, or floats:
    with doubled midranks mr2 = 2*rank + ties - 1 (integers even at
    tied scores), 2U = Σ_pos mr2 - n_pos*(n_pos+1) and
    AUC = 2U / (2*n_pos*n_neg) — BIGINT numerator/denominator emitted
    exactly plus ONE IEEE division. Groups with a single class are
    dropped (AUC undefined). Ties get the standard 0.5 credit via
    midranks. One window shuffle at group grain + same-key rollup."""
    wr = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    wt = Window.partitionBy(group_col, score_col)
    r = df.withColumn(
        "_mr2",
        2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1,
    )
    lab = F.col(label_col).cast("boolean")
    agg = r.groupBy(group_col).agg(
        F.sum(F.when(lab, F.col("_mr2")).otherwise(F.lit(0))).alias("_pos_mr2"),
        F.sum(lab.cast("bigint")).alias("n_pos"),
        F.count(F.lit(1)).alias("_n"),
    )
    num = F.col("_pos_mr2") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * (F.col("_n") - F.col("n_pos"))
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("_n") - F.col("n_pos") > 0))
        .select(
            group_col,
            F.col("n_pos").cast("bigint").alias("n_pos"),
            (F.col("_n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
            num.cast("bigint").alias("auc_num"),
            den.cast("bigint").alias("auc_den"),
            (num.cast("double") / den.cast("double")).alias("auc"),
        )
    )
