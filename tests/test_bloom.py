"""Bloom membership prefilter (operators/bloom.py): value-equality with the
plain anti-join, the no-false-negative guarantee, and the map-side plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _dfs(spark, n_store=400, n_new=300, overlap=120):
    store = spark.createDataFrame(
        [(f"key-{i}",) for i in range(n_store)], "h string"
    )
    # new batch: `overlap` seen keys + the rest unseen (arbitrary strings)
    new = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(overlap)]
        + [(i, f"fresh/{i}?x") for i in range(overlap, n_new)],
        "row_id long, h string",
    )
    return store, new


class TestBloom:
    def test_equals_plain_anti_join(self, spark):
        from datasmith_spark.operators.bloom import anti_join_via_bloom

        store, new = _dfs(spark)
        got = sorted(
            (r.row_id, r.h) for r in anti_join_via_bloom(new, store, "h").collect()
        )
        want = sorted(
            (r.row_id, r.h) for r in new.join(store, "h", "left_anti").collect()
        )
        assert got == want and len(got) == 180

    def test_tiny_filter_still_exact(self, spark):
        """A deliberately undersized filter (64 bits for 400 keys -> almost
        every probe collides) must still return the EXACT result: the bloom
        only prunes, the exact join decides."""
        from datasmith_spark.operators.bloom import anti_join_via_bloom

        store, new = _dfs(spark)
        got = sorted(
            r.row_id
            for r in anti_join_via_bloom(new, store, "h", m_bits=64, k=2).collect()
        )
        assert got == list(range(120, 300))

    def test_no_false_negatives(self, spark):
        """Every store key must probe as maybe-member in its own filter."""
        from datasmith_spark.operators.bloom import bloom_build, bloom_maybe

        store, _ = _dfs(spark)
        filt = bloom_build(store, "h")
        flagged = bloom_maybe(store, "h", filt)
        assert flagged.filter(~F.col("_bloom_maybe")).count() == 0

    def test_filter_is_tiny_and_mergeable(self, spark):
        from datasmith_spark.operators.bloom import BLOOM_M_BITS, bloom_build

        store, _ = _dfs(spark)
        whole = {
            (r.word, r.bits) for r in bloom_build(store, "h").collect()
        }
        assert len(whole) <= BLOOM_M_BITS // 64
        # mergeable: build from two halves, OR the words -> identical filter
        h1 = bloom_build(store.limit(200), "h")
        h2 = bloom_build(store.subtract(store.limit(200)), "h")
        merged = {
            (r.word, r.bits)
            for r in h1.unionByName(h2)
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
            .collect()
        }
        assert merged == whole

    def test_probe_plan_is_broadcast_no_shuffle(self, spark):
        from datasmith_spark.operators.bloom import bloom_build, bloom_maybe
        from tests.test_plans import _plan

        store, new = _dfs(spark)
        filt = bloom_build(store, "h").localCheckpoint(eager=True)
        plan = _plan(bloom_maybe(new, "h", filt))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
        # probing must not shuffle the batch: every Exchange in the plan
        # must be a broadcast (or the degenerate single-partition collect),
        # never a repartitioning of the probed rows
        body = plan.split("== Physical Plan ==")[-1]
        import re

        exchanges = re.findall(r"(\w*Exchange)\b", body)
        assert exchanges, body  # the broadcasts themselves must be present
        assert all(
            e in ("BroadcastExchange", "ReusedExchange") for e in exchanges
        ), exchanges

    def test_registry_has_q82(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q82_bloom_store_dedup" in QUERIES
        assert "q82_bloom_store_dedup" in ORACLE_SQL
