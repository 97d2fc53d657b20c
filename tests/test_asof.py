"""As-of join (operators/asof.py, q92)."""

from datetime import datetime, timedelta

import pyspark.sql.functions as F
import pytest


def _ts(m):
    return datetime(2024, 1, 1) + timedelta(minutes=m)


@pytest.fixture(scope="module")
def hand(spark):
    ddl = "user_id bigint, ts timestamp, event_id bigint, value double"
    left = spark.createDataFrame(
        [
            (1, _ts(10), 100, 0.0),   # matches v2 (ts 5)
            (1, _ts(5), 101, 0.0),    # equal ts -> inclusive, matches v2
            (1, _ts(1), 102, 0.0),    # before all views -> null
            (2, _ts(60 * 24 * 3), 103, 0.0),  # 2 buckets later -> carry
            (3, _ts(30), 104, 0.0),   # user with no views at all -> null
        ],
        ddl,
    )
    right = spark.createDataFrame(
        [
            (1, _ts(2), 200, 1.5),
            (1, _ts(5), 201, 2.5),    # equal-ts tie with 202
            (1, _ts(5), 202, 3.5),    # tiebreak: max event_id wins
            (2, _ts(20), 203, 4.5),   # day 0; left is day 3
        ],
        ddl,
    )
    return left, right


def test_asof_hand_semantics(spark, hand):
    from datasmith_spark.operators.asof import asof_join

    left, right = hand
    out = {
        r.event_id: (r.r_event_id, r.r_value)
        for r in asof_join(
            left, right, "user_id", "ts", ["event_id", "value"], tiebreak="event_id"
        ).collect()
    }
    assert out[100] == (202, 3.5)   # latest at-or-before, tie resolved max
    assert out[101] == (202, 3.5)   # inclusive equal-ts match
    assert out[102] == (None, None)
    assert out[103] == (203, 4.5)
    assert out[104] == (None, None)


def test_bucketed_equals_plain(spark, hand):
    """The skew-safe decomposition must be value-equal to the plain
    union+window form — including cross-bucket carries and ties."""
    from datasmith_spark.operators.asof import asof_join, asof_join_bucketed

    left, right = hand
    args = (left, right, "user_id", "ts", ["event_id", "value"])
    plain = asof_join(*args, tiebreak="event_id").collect()
    for bucket in (3600, 86400):
        fast = asof_join_bucketed(
            *args, tiebreak="event_id", bucket_sec=bucket
        ).collect()
        assert sorted(map(str, fast)) == sorted(map(str, plain)), bucket


def test_bucketed_equals_plain_on_events(spark):
    """Same equality over the real sf0.001 events table (hot users, many
    buckets, unmatched clicks)."""
    from datasmith_spark.operators.asof import asof_join, asof_join_bucketed

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    args = (clicks, views, "user_id", "ts", ["event_id", "value"])
    plain = asof_join(*args, tiebreak="event_id").collect()
    fast = asof_join_bucketed(*args, tiebreak="event_id", bucket_sec=6 * 3600).collect()
    assert len(plain) == clicks.count()
    assert sorted(map(str, fast)) == sorted(map(str, plain))


def test_asof_plan_has_no_cross_product(spark, hand):
    from datasmith_spark.operators.asof import asof_join_bucketed

    left, right = hand
    plan = asof_join_bucketed(
        left, right, "user_id", "ts", ["event_id", "value"], tiebreak="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_registry_has_q92(spark):
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q92_asof_attribution" in QUERIES and "q92_asof_attribution" in ORACLE_SQL


def test_interval_point_hand_semantics(spark):
    """Boundary inclusivity at both ends, multi-bucket intervals, a point
    in a bucket the interval covers but outside the exact range, and
    key separation."""
    from datasmith_spark.operators.asof import interval_point_join

    iv = spark.createDataFrame(
        [
            (1, 10, _ts(0), _ts(90)),     # spans 4 buckets at 1800s
            (1, 11, _ts(120), _ts(125)),  # short, same bucket
            (2, 12, _ts(0), _ts(90)),     # other key, same window
        ],
        "user_id bigint, iv_id bigint, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame(
        [
            (1, 20, _ts(0)),    # == start: inclusive
            (1, 21, _ts(90)),   # == end: inclusive
            (1, 22, _ts(91)),   # bucket covered (60..90 bucket) but > end
            (1, 23, _ts(50)),   # mid-window
            (1, 24, _ts(122)),  # inside the short interval
            (2, 25, _ts(50)),   # key 2 only
        ],
        "user_id bigint, p_id bigint, t timestamp",
    )
    got = sorted(
        (r.iv_id, r.p_p_id)
        for r in interval_point_join(
            iv, pt, on="user_id", start="s", end="e", point_ts="t",
            bucket_sec=1800,
        ).collect()
    )
    assert got == [(10, 20), (10, 21), (10, 23), (11, 24), (12, 25)]


def test_interval_point_equals_naive_on_events(spark):
    """Bucket-explode form == the naive range join over real sf0.001
    events (each pair exactly once, no dups, no misses)."""
    from datasmith_spark.operators.asof import interval_point_join

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_interval(0, 0, 0, 0, 0, CAST(ceil(value) AS INT), 0)"
        ).alias("e"),
    )
    pt = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("t")
    )
    fast = sorted(
        (r.iv_id, r.p_p_id)
        for r in interval_point_join(
            iv, pt, on="user_id", start="s", end="e", point_ts="t",
            bucket_sec=1800,
        ).collect()
    )
    naive = sorted(
        (r.iv_id, r.p_id)
        for r in iv.join(pt, "user_id")
        .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
        .collect()
    )
    assert fast == naive and len(fast) == len(set(fast))


def test_interval_point_plan_is_equi_join(spark):
    """The range predicate must be a residual on a hash equi-join, never
    a nested-loop/cartesian plan."""
    from datasmith_spark.operators.asof import interval_point_join

    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(90))], "user_id bigint, s timestamp, e timestamp"
    )
    pt = spark.createDataFrame([(1, _ts(5))], "user_id bigint, t timestamp")
    plan = interval_point_join(
        iv, pt, on="user_id", start="s", end="e", point_ts="t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_registry_has_q93(spark):
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q93_interval_point_join" in QUERIES and "q93_interval_point_join" in ORACLE_SQL


def test_gapfill_locf_hand(spark):
    """Gaps fill with the carried value; same-day ties pick the latest
    (ts, event_id); per-user span is [first obs day, last obs day]."""
    from datasmith_spark.operators.asof import gapfill_locf

    rows = [
        # u1: day1 twice (tie -> later ts wins), gap day2-3, day4
        (1, _ts(10), 100, 1.0),
        (1, _ts(40), 101, 2.0),          # same day, later ts -> wins day 1
        (1, _ts(3 * 1440 + 5), 102, 9.0),  # day 4
        # u2: single day -> single row
        (2, _ts(1440 + 7), 200, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint, value double")
    got = sorted(
        (r.user_id, str(r.day), r.value)
        for r in gapfill_locf(
            df, on="user_id", ts="ts", value_cols=["value"], tiebreak="event_id"
        ).collect()
    )
    assert got == [
        (1, "2024-01-01", 2.0),
        (1, "2024-01-02", 2.0),
        (1, "2024-01-03", 2.0),
        (1, "2024-01-04", 9.0),
        (2, "2024-01-02", 5.0),
    ]


def test_gapfill_equal_ts_tiebreak_by_id(spark):
    """At the exact same timestamp, max event_id wins."""
    from datasmith_spark.operators.asof import gapfill_locf

    df = spark.createDataFrame(
        [(1, _ts(0), 7, 1.0), (1, _ts(0), 9, 2.0), (1, _ts(0), 8, 3.0)],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    out = gapfill_locf(
        df, on="user_id", ts="ts", value_cols=["value"], tiebreak="event_id"
    ).collect()
    assert len(out) == 1 and out[0].value == 2.0


def test_gapfill_plan_no_cross_product(spark):
    from datasmith_spark.operators.asof import gapfill_locf

    df = spark.createDataFrame(
        [(1, _ts(0), 7, 1.0)],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    plan = gapfill_locf(
        df, on="user_id", ts="ts", value_cols=["value"], tiebreak="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_registry_has_q96(spark):
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q96_gapfill_locf" in QUERIES and "q96_gapfill_locf" in ORACLE_SQL


def test_asof_forward_hand_semantics(spark, hand):
    """direction='forward': earliest right at-or-after, inclusive, max
    tiebreak at equal ts, null when no later right exists."""
    from datasmith_spark.operators.asof import asof_join

    left, right = hand
    out = {
        r.event_id: (r.r_event_id, r.r_value)
        for r in asof_join(
            left, right, "user_id", "ts", ["event_id", "value"],
            tiebreak="event_id", direction="forward",
        ).collect()
    }
    # left 100 @10min: rights at 2,5,5 -> all before -> null
    assert out[100] == (None, None)
    # left 101 @5min: equal-ts rights 201/202 -> inclusive, max id wins
    assert out[101] == (202, 3.5)
    # left 102 @1min: earliest right after is @2min
    assert out[102] == (200, 1.5)
    # left 103 @day3: user 2's only right was day 0 -> null
    assert out[103] == (None, None)
    assert out[104] == (None, None)


def test_asof_forward_matches_reversed_backward(spark, hand):
    """forward(t) == backward on negated epoch — a full consistency
    check across every row of the real events table."""
    from datasmith_spark.operators.asof import asof_join

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    fwd = {
        r.event_id: r.r_event_id
        for r in asof_join(
            clicks, views, "user_id", "ts", ["event_id"],
            tiebreak="event_id", direction="forward",
        ).collect()
    }
    neg = lambda df: df.withColumn("nts", -F.col("ts").cast("timestamp").cast("double"))
    bwd = {
        r.event_id: r.r_event_id
        for r in asof_join(
            neg(clicks), neg(views), "user_id", "nts", ["event_id"],
            tiebreak="event_id", direction="backward",
        ).collect()
    }
    assert fwd == bwd and any(v is not None for v in fwd.values())


def test_registry_has_q118(spark):
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q118_time_to_purchase" in QUERIES and "q118_time_to_purchase" in ORACLE_SQL
