"""Kaplan-Meier risk table (q191): hand-built cohort with known risk
sets, censoring semantics, mass conservation."""

from __future__ import annotations

import datetime as dt

from datasmith_spark.queries import QUERIES


def _orders(spark, rows):
    return spark.createDataFrame(
        [
            (ok, ck, "O", 1.0, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), "1-URGENT")
            for ok, ck, d in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_hand_cohort(spark, tmp_path):
    """4 customers: c1 reorders at day 5, c2 at day 5, c3 at day 10,
    c4 never (censored at horizon day 20 -> dur 18 from its day-2 start).
    Risk table: t=5 (n_risk=4, d=2), t=10 (n_risk=2, d=1)."""
    rows = [
        (1, 1, 0), (2, 1, 5),
        (3, 2, 0), (4, 2, 5),
        (5, 3, 0), (6, 3, 10),
        (7, 4, 2),
        (8, 5, 20),  # 5th customer: single order AT the horizon (dur 0,
                     # censored) — at risk only at t=0, never an event row
    ]
    path = str(tmp_path / "t1")
    _orders(spark, rows).write.mode("overwrite").parquet(path + "/orders.parquet")
    out = {r.t: r for r in QUERIES["q191_kaplan_meier_table"](spark, path).collect()}
    assert set(out) == {5, 10}
    assert (out[5].n_risk, out[5].n_events, out[5].n_censored) == (4, 2, 0)
    # c5 (dur 0, censored) left risk before t=5; c1/c2 exited at t=5;
    # remaining at t=10: c3 (event) and c4 (censored at 18)
    assert (out[10].n_risk, out[10].n_events, out[10].n_censored) == (2, 1, 0)


def test_censored_only_times_not_emitted_but_counted(spark, tmp_path):
    """Censoring times without events emit no row, yet censored subjects
    must still deplete later risk sets."""
    rows = [
        (1, 1, 0), (2, 1, 10),   # event at 10
        (3, 2, 0),               # censored at horizon (day 10 -> dur 10)
        (4, 3, 5),               # censored at horizon (dur 5)
    ]
    path = str(tmp_path / "t2")
    _orders(spark, rows).write.mode("overwrite").parquet(path + "/orders.parquet")
    out = {r.t: r for r in QUERIES["q191_kaplan_meier_table"](spark, path).collect()}
    assert set(out) == {10}
    # at t=10: c3 (dur 5, censored) already left; c1 and c2 (dur 10) at risk
    assert out[10].n_risk == 2
    assert out[10].n_events == 1
    assert out[10].n_censored == 1  # c2 censored AT the event time


def test_mass_conservation_pinned(spark):
    out = QUERIES["q191_kaplan_meier_table"](
        spark, "/root/testdata/sf0.01"
    ).toPandas().sort_values("t")
    # first event time's risk set = all subjects whose dur >= t1; with
    # min dur possibly < t1 only for censored-only times
    assert (out.n_events >= 1).all()
    assert (out.n_risk.diff().dropna() <= 0).all()  # risk sets shrink
    # total events across the table equals subjects with a second order
    import pandas as pd

    o = pd.read_parquet("/root/testdata/sf0.01/orders.parquet")
    n_repeat = (o.groupby("o_custkey").size() >= 2).sum()
    assert int(out.n_events.sum()) == int(n_repeat)
