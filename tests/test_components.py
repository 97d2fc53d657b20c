"""Connected components / dedup keep-set (operators/components.py)."""

from __future__ import annotations

import random

import pytest

from datasmith_spark.operators.components import connected_components, dedup_keep_set


def _union_find(nodes, edges):
    """Independent reference: classic path-compressed union-find, then
    relabel every component by its min member."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = connected_components(df).collect()
    return {r.id: r.component for r in got}


class TestConnectedComponents:
    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(7)
        nodes = list(range(60))
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(45)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        expect = _union_find({u for e in edges for u in e}, edges)
        assert _cc_spark(spark, edges) == expect

    def test_chain_needs_multi_hop(self, spark):
        # a 9-node path: min label must travel 8 hops — proves the
        # iteration really propagates transitively, not just one round
        edges = [(i, i + 1) for i in range(8)]
        got = _cc_spark(spark, edges)
        assert got == {i: 0 for i in range(9)}

    def test_two_components_and_self_loops_ignored(self, spark):
        edges = [(1, 2), (2, 3), (10, 11), (5, 5)]
        got = _cc_spark(spark, edges)
        # the self-loop-only node never appears (no real edge touches it)
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_string_ids(self, spark):
        df = spark.createDataFrame(
            [("b", "c"), ("c", "a"), ("x", "y")], "src string, dst string"
        )
        got = {r.id: r.component for r in connected_components(df).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_max_iter_guard_raises(self, spark):
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "src bigint, dst bigint"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(df, max_iter=2)


class TestDedupKeepSet:
    def test_keep_is_min_id_and_sizes(self, spark):
        pairs = spark.createDataFrame(
            [(3, 7), (7, 9), (20, 21)], "doc_a bigint, doc_b bigint"
        )
        rows = {r.doc_id: r for r in dedup_keep_set(pairs).collect()}
        assert set(rows) == {3, 7, 9, 20, 21}
        assert all(rows[d].cluster_id == 3 and rows[d].n_members == 3 for d in (3, 7, 9))
        assert all(rows[d].cluster_id == 20 and rows[d].n_members == 2 for d in (20, 21))
        assert {d for d, r in rows.items() if r.keep} == {3, 20}
        # exactly one survivor per cluster
        assert sum(r.keep for r in rows.values()) == 2


class TestLeakageSafeSplit:
    def test_no_cluster_straddles_splits(self, spark):
        from datasmith_spark.queries import QUERIES

        import pyspark.sql.functions as F

        df = QUERIES["q53_leakage_safe_split"](spark, "/root/testdata/sf0.001")
        # every group maps to exactly one split — leakage-safe by construction
        assert (
            df.groupBy("group_key")
            .agg(F.countDistinct("split").alias("n"))
            .filter("n > 1")
            .count()
            == 0
        )
        # planted dup pairs (doc_id + 100000 / + 200000) co-travel with the source
        joined = df.alias("a").join(
            df.alias("b"), F.col("a.doc_id") + 100000 == F.col("b.doc_id")
        )
        mismatched = joined.filter(F.col("a.split") != F.col("b.split")).count()
        assert mismatched == 0
        splits = {r.split for r in df.select("split").distinct().collect()}
        assert splits <= {"train", "val", "test"} and "train" in splits


class TestDupSpans:
    def test_known_positions_and_no_self_match(self, spark):
        from datasmith_spark.queries import QUERIES

        shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
        rows = [
            # doc 0: shared run at token pos 3
            (0, "alpha beta gamma " + shared + " tail0"),
            # doc 1: same run at pos 1
            (1, shared + " other words here"),
            # doc 2: unrelated
            (2, "completely different text with no overlap at all " * 3),
            # doc 3: repeats ITS OWN 10-token run twice -> must NOT be flagged
            (3, ("unique3 " * 10) + ("unique3 " * 10)),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        import datasmith_spark.queries as Q

        orig = Q._corpus
        Q._corpus = lambda s, sf: df
        try:
            got = QUERIES["q60_dup_spans"](spark, "unused").toPandas()
        finally:
            Q._corpus = orig
        by_doc = {d: sorted(g.pos) for d, g in got.groupby("doc_id")}
        assert by_doc == {0: [4], 1: [1]}
        # the shared span has the same hash in both docs
        assert got.span_md5.nunique() == 1


class TestCutDupSpans:
    def test_canonical_keeps_other_loses_span(self, spark):
        from datasmith_spark.queries import QUERIES

        shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
        rows = [
            (0, "alpha beta gamma " + shared + " tail0"),
            (5, shared + " other words here"),
            (7, "nothing in common with anybody at all whatsoever today friends"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        import datasmith_spark.queries as Q

        orig = Q._corpus
        Q._corpus = lambda s, sf: df
        try:
            got = {
                r.doc_id: r
                for r in QUERIES["q61_cut_dup_spans"](spark, "unused").collect()
            }
        finally:
            Q._corpus = orig
        # doc 0 is canonical (min doc_id): untouched
        assert got[0].clean_text == "alpha beta gamma " + shared + " tail0"
        assert got[0].n_removed == 0
        # doc 5 loses exactly the shared 10-token run
        assert got[5].clean_text == "other words here"
        assert (got[5].n_kept, got[5].n_removed) == (3, 10)
        # doc 7 untouched
        assert got[7].n_removed == 0 and got[7].n_kept == 10
