"""As-of (point-in-time) join — attach to each left row the latest right
row with the same key at-or-before the left timestamp.

Spark has no native ASOF JOIN (DuckDB, Pandas and kdb do); the naive SQL
rewrite is a range join that Catalyst plans as a per-key cross product.
Two published-shape implementations instead:

* `asof_join` — the union+ordered-window form: tag both sides, union,
  one window per key ordered by (ts, side) carrying the last-seen right
  payload forward (`F.last(ignorenulls=True)`). ONE shuffle by key, no
  range join, no cross product. Partition size is bounded by per-key row
  count — right shape when keys are plentiful (user_id), wrong when one
  key is hot.

* `asof_join_bucketed` — the skew-safe form for hot keys / few keys:
  rows window inside (key, time-bucket) partitions (bounded by bucket
  width no matter how hot the key), then a SECOND, tiny union-window over
  the per-(key, bucket) "latest right row" aggregates carries matches
  across bucket boundaries; left rows that found no in-bucket match join
  the carry table on (key, bucket) and coalesce. VALUE-EQUAL to the plain
  form (pinned in tests) — the same prove-the-decomposition contract as
  budget_fill / pps_sample.

Both are inclusive (right.ts == left.ts matches) with right-side ties
broken by a caller-named tiebreak column (max wins), matching DuckDB's
`ASOF LEFT JOIN ... ON l.ts >= r.ts` used as the q92 oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_L, _R = 1, 0  # side tags: right rows sort before left rows at equal ts


def _prefixed(right_cols: list[str], prefix: str) -> list[str]:
    return [prefix + c for c in right_cols]


def _union_frame(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    prefix: str,
    extra_part: list[str] | None = None,
) -> tuple[DataFrame, list[str], list[str]]:
    """Tag + union the two sides into one frame with left columns nulled
    on right rows and vice versa."""
    lcarry = [c for c in left.columns if c not in (on, ts) and c not in (extra_part or [])]
    rcarry = _prefixed([ts, *right_cols], prefix)
    l = left.select(
        on,
        *(extra_part or []),
        F.col(ts).alias("_ts"),
        F.lit(_L).alias("_side"),
        *lcarry,
        *[F.lit(None).cast(right.schema[c.removeprefix(prefix)].dataType).alias(c)
          for c in rcarry],
    )
    r = right.select(
        on,
        *(extra_part or []),
        F.col(ts).alias("_ts"),
        F.lit(_R).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcarry],
        F.col(ts).alias(prefix + ts),
        *[F.col(c).alias(prefix + c) for c in right_cols],
    )
    return l.unionByName(r), lcarry, rcarry


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "r_",
    direction: str = "backward",
    _extra_part: list[str] | None = None,
) -> DataFrame:
    """Union+window as-of join. Output: every left row with `prefix+ts`
    and `prefix+c` for c in right_cols from the matched right row
    (nulls when none). direction="backward" (default) matches the
    LATEST right at-or-before the left ts; direction="forward" matches
    the EARLIEST right at-or-after it — the time-to-next-event shape —
    by simply flipping the scan order (same single shuffle, same
    inclusive semantics). `tiebreak` names a right column that breaks
    equal-ts ties deterministically (max wins in both directions)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    u, lcarry, rcarry = _union_frame(left, right, on, ts, right_cols, prefix, _extra_part)
    # _side AFTER ts (rights sort before lefts at equal ts -> inclusive),
    # tiebreak LAST (orders equal-ts rights among themselves; max wins
    # because last() takes the latest row in sort order)
    ts_ord = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    order = [ts_ord, F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(prefix + tiebreak).asc())
    w = (
        Window.partitionBy(on, *(_extra_part or []))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        on,
        *(_extra_part or []),
        "_ts",
        "_side",
        *lcarry,
        # one carried struct, not per-column last(): all right fields must
        # come from the SAME right row even when some of its values are null
        F.last(
            F.when(F.col("_side") == _R, F.struct(*rcarry)), ignorenulls=True
        ).over(w).alias("_m"),
    )
    out = matched.filter(F.col("_side") == _L).select(
        on,
        *(_extra_part or []),
        F.col("_ts").alias(ts),
        *lcarry,
        *[F.col(f"_m.{c}").alias(c) for c in rcarry],
    )
    return out


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str,
    start: str,
    end: str,
    point_ts: str,
    bucket_sec: int = 1800,
    prefix: str = "p_",
) -> DataFrame:
    """Interval-containment join: every (interval, point) pair with the
    same key where start <= point_ts <= end (inclusive both ends).

    The naive `ON key = key AND ts BETWEEN start AND end` plans the range
    predicate as a post-filter on the per-key equi-join — quadratic on a
    hot key. Bucket-explode instead: each interval explodes to the time
    buckets it covers (`F.sequence` — ceil(len/W)+1 rows, bounded because
    interval length is bounded), each point maps to exactly ONE bucket,
    and the join is a plain equi-join on (key, bucket) with the exact
    range check as the join residual. Every qualifying pair appears
    exactly once (the point's single bucket), so no dedup pass is needed.
    Partition width is (key, bucket), so key heat is capped by bucket
    width — the same skew lever as asof_join_bucketed."""
    ep = lambda c: F.col(c).cast("timestamp").cast("double")
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(ep(start) / bucket_sec), F.floor(ep(end) / bucket_sec)
            )
        ),
    )
    pcarry = [c for c in points.columns if c != on]
    pt = points.select(
        on,
        F.floor(ep(point_ts) / bucket_sec).alias("_b"),
        *[F.col(c).alias(prefix + c) for c in pcarry],
    )
    return (
        iv.join(pt, [on, "_b"])
        .filter(
            (F.col(prefix + point_ts) >= F.col(start))
            & (F.col(prefix + point_ts) <= F.col(end))
        )
        .drop("_b")
    )


def gapfill_locf(
    obs: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Regularize an irregular per-key time series to a DAILY grid with
    last-observation-carried-forward — the feature-engineering step that
    turns event logs into fixed-step model inputs.

    Three stages, all reusing existing shapes: (1) collapse to one row
    per (key, day) — latest by (ts, tiebreak) via a single max-struct
    aggregate (no window, map-side partials); (2) per-key day grid
    [first obs day, last obs day] via sequence+explode (bounded by the
    table's time span); (3) `asof_join` of grid onto the daily table on
    integer-free DATE ordering. Every grid day ≥ the key's first obs day,
    so the output is total (no nulls).

    Output: (on, day date, <value_cols...>) — one row per key per day.

    At 10^12 events: stage 1 is the wide stage and keys on (key, day) —
    heat-capped like every bucketed op here; the grid explode emits
    span-days rows per key (bounded, known); the as-of is one more
    (key)-keyed exchange. DuckDB oracle: generate_series + native ASOF."""
    d = F.col(ts).cast("timestamp").cast("date")
    daily = (
        obs.groupBy(on, d.alias("_d"))
        .agg(
            F.max(
                F.struct(F.col(ts), F.col(tiebreak), *[F.col(c) for c in value_cols])
            ).alias("_m")
        )
        .select(on, "_d", *[F.col(f"_m.{c}").alias(c) for c in value_cols])
    )
    span = daily.groupBy(on).agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    grid = span.select(
        on, F.explode(F.expr("sequence(_lo, _hi, interval 1 day)")).alias("_d")
    )
    out = asof_join(grid, daily, on=on, ts="_d", right_cols=value_cols, prefix="r_")
    return out.select(
        on,
        F.col("_d").alias("day"),
        *[F.col("r_" + c).alias(c) for c in value_cols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    tiebreak: str,
    bucket_sec: int = 86400,
    prefix: str = "r_",
) -> DataFrame:
    """Skew-safe as-of join: windows run inside (key, bucket) partitions,
    then a tiny per-bucket carry closes matches across boundaries."""
    b = lambda c: F.floor(F.col(c).cast("timestamp").cast("double") / bucket_sec)
    lb = left.withColumn("_b", b(ts))
    rb = right.withColumn("_b", b(ts))
    rcarry = _prefixed([ts, *right_cols], prefix)

    # stage 1: in-bucket as-of — partitions bounded by bucket width
    in_bucket = asof_join(
        lb, rb, on, ts, right_cols,
        tiebreak=tiebreak, prefix=prefix, _extra_part=["_b"],
    )

    # stage 2: per-(key, bucket) latest right row — struct max orders by
    # (ts, tiebreak) so it IS the row the plain form would carry
    rest = [c for c in right_cols if c != tiebreak]
    agg = rb.groupBy(on, "_b").agg(
        F.max(F.struct(F.col(ts), F.col(tiebreak), *[F.col(c) for c in rest]))
        .alias("_last")
    )
    # carry at each LEFT bucket: latest right-agg from STRICTLY earlier
    # buckets (same-bucket rights are stage 1's job) — left bucket markers
    # sort before the same bucket's right-agg row
    lbuckets = lb.select(on, "_b").distinct().withColumn("_side", F.lit(0))
    aggs = agg.withColumn("_side", F.lit(1))
    cu = lbuckets.withColumn("_last", F.lit(None).cast(aggs.schema["_last"].dataType)) \
        .unionByName(aggs)
    cw = (
        Window.partitionBy(on)
        .orderBy(F.col("_b").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        cu.withColumn("_c", F.last("_last", ignorenulls=True).over(cw))
        .filter(F.col("_side") == 0)
        .select(on, "_b", "_c")
    )

    joined = in_bucket.join(carry, [on, "_b"], "left")
    matched_in_bucket = F.col(prefix + ts).isNotNull()
    sel = [on, ts] + [c for c in left.columns if c not in (on, ts)]
    out_cols = [F.col(c) for c in sel]
    for c in [ts, *right_cols]:
        out_cols.append(
            F.when(matched_in_bucket, F.col(prefix + c))
            .otherwise(F.col(f"_c.{c}"))
            .alias(prefix + c)
        )
    return joined.select(*out_cols)
