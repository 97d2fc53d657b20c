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


class TestDataContract:
    def test_planted_violations_counted_exactly(self, spark):
        from datasmith_spark.queries import QUERIES

        import pandas as pd

        out = {
            r.kind: r
            for r in QUERIES["q192_data_contract"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert set(out) == {"not_null", "range_gt0", "in_set", "unique", "fk"}
        o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
        n_bad1 = int((o.o_orderkey % 1000 == 1).sum())
        n_bad2 = int((o.o_orderkey % 2000 == 3).sum())
        # each bad1 twin carries the NULL custkey, negated price and bogus
        # priority; each bad2 twin is the dangling FK and duplicate key
        assert out["not_null"].n_violations == n_bad1
        assert out["range_gt0"].n_violations == n_bad1
        assert out["in_set"].n_violations == n_bad1
        assert out["unique"].n_violations == n_bad1 + n_bad2
        assert out["fk"].n_violations == n_bad2
        assert not any(r.pass_ if hasattr(r, "pass_") else r["pass"] for r in out.values())

    def test_clean_table_passes_every_constraint(self, spark, tmp_path):
        """Without the plants (a corrupt-free orders table whose keys all
        resolve), every lane must pass — checked by pointing the query at
        a clean copy with keys excluded from the plant residues."""
        import datetime as dt

        path = str(tmp_path / "clean")
        orders = spark.createDataFrame(
            [
                (i, 10 + i % 3, "O", 100.0 + i, dt.datetime(2024, 1, 1), "5-LOW")
                for i in range(2, 30, 2)  # even keys: no %1000==1 / %2000==3 hits
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        cust = spark.createDataFrame(
            [(10, "a", 1, 0.0, "BUILDING"), (11, "b", 1, 0.0, "AUTOMOBILE"),
             (12, "c", 1, 0.0, "MACHINERY")],
            "c_custkey long, c_name string, c_nationkey long, "
            "c_acctbal double, c_mktsegment string",
        )
        orders.write.mode("overwrite").parquet(path + "/orders.parquet")
        cust.write.mode("overwrite").parquet(path + "/customer.parquet")
        from datasmith_spark.queries import QUERIES

        out = QUERIES["q192_data_contract"](spark, path).toPandas()
        assert (out.n_violations == 0).all()
        assert out["pass"].all()


class TestSourceDupMatrix:
    def test_matrix_mass_equals_pair_count_and_keys_ordered(self, spark):
        from datasmith_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        mat = QUERIES["q193_source_dup_matrix"](spark, sf).toPandas()
        pairs = QUERIES["q22_ngram_jaccard"](spark, sf).toPandas()
        assert int(mat.n_pairs.sum()) == len(pairs) > 0
        assert (mat.source_a <= mat.source_b).all()

    def test_salted_copies_map_to_base_source(self, spark):
        """A verified pair (d, d+100000) must land on (source(d),
        source(d)) — the exact-copy diagonal."""
        import pandas as pd

        from datasmith_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        pairs = QUERIES["q22_ngram_jaccard"](spark, sf).toPandas()
        docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "source"]]
        smap = dict(zip(docs.doc_id, docs.source))
        diag = pairs[(pairs.doc_b % 100000) == (pairs.doc_a % 100000)]
        assert len(diag) > 0
        mat = QUERIES["q193_source_dup_matrix"](spark, sf).toPandas()
        mat_idx = {(r.source_a, r.source_b): r.n_pairs for r in mat.itertuples()}
        import collections

        want_diag = collections.Counter(
            (smap[int(r.doc_a) % 100000], smap[int(r.doc_a) % 100000])
            for r in diag.itertuples()
        )
        for (sa, sb), n in want_diag.items():
            assert mat_idx.get((sa, sb), 0) >= n


class TestFrequentTriples:
    def test_prune_is_lossless_vs_bruteforce(self, spark):
        """Apriori-pruned plan == brute-force enumeration on a hand
        corpus where the prune actually removes work (items in no
        frequent pair must not suppress real triples)."""
        import itertools

        import collections

        baskets = [
            (1, [10, 20, 30]),
            (2, [10, 20, 30, 99]),   # 99 appears once -> pruned item
            (3, [10, 20, 40]),
            (4, [50, 60]),           # isolated pair, support 1
            (5, [10, 20, 30]),
        ]
        rows = [
            (o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             __import__("datetime").datetime(2024, 1, 1))
            for o, items in baskets for p in items
        ]
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            li.write.mode("overwrite").parquet(td + "/lineitem.parquet")
            from datasmith_spark.queries import QUERIES

            got = {
                (r.part_a, r.part_b, r.part_c): r.support
                for r in QUERIES["q194_frequent_triples"](spark, td).collect()
            }
        cnt = collections.Counter()
        for _, items in baskets:
            for t in itertools.combinations(sorted(set(items)), 3):
                cnt[t] += 1
        want = {t: n for t, n in cnt.items() if n >= 2}
        assert got == want
        assert got[(10, 20, 30)] == 3


class TestSurvivalByCohort:
    def test_cohort_tables_partition_the_q191_population(self, spark):
        """Per-cohort event masses sum to the ungrouped q191 totals, and
        each cohort's risk sets shrink monotonically."""
        from datasmith_spark.queries import QUERIES

        sf = "/root/testdata/sf0.01"
        g = QUERIES["q196_survival_by_cohort"](spark, sf).toPandas()
        u = QUERIES["q191_kaplan_meier_table"](spark, sf).toPandas()
        assert set(g.cohort) == {"a", "b"}
        assert int(g.n_events.sum()) == int(u.n_events.sum())
        for _, sub in g.groupby("cohort"):
            s = sub.sort_values("t")
            assert (s.n_risk.diff().dropna() <= 0).all()
            assert (s.n_events >= 1).all()
        # first-event-time risk sets sum to the full subject population
        n_subjects = int(u.n_risk.max())  # q191's t=min row sees everyone
        firsts = g.sort_values("t").groupby("cohort").first()
        # each cohort's max risk set is bounded by its population share
        assert int(firsts.n_risk.sum()) <= n_subjects
