"""KMV distinct sketch (q69): exactness below k, estimate quality at and
above k, batch-partition invariance, merge property."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from datasmith_spark.operators.sketches import KMV_K, kmv_distinct


def _rows(lang: str, n: int, start: int = 0):
    return [(lang, f"text {lang} {i}") for i in range(start, start + n)]


class TestKmv:
    def test_exact_below_k_estimates_above(self, spark):
        pdf = pd.DataFrame(
            _rows("small", 10) + _rows("big", 5000) + [("small", "text small 3")],
            columns=["lang", "text"],
        )
        out = {
            r["lang"]: r
            for r in kmv_distinct(
                spark.createDataFrame(pdf).repartition(9), "text", "lang"
            ).collect()
        }
        s, b = out["small"], out["big"]
        assert s["n_exact"] == 10 and s["est_distinct"] == 10.0  # exact lane
        assert b["n_exact"] == 5000
        # KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 3 sigma
        assert abs(b["est_distinct"] - 5000) / 5000 < 0.4, b["est_distinct"]
        assert s["k_used"] == b["k_used"] == KMV_K

    def test_partitioning_invariance(self, spark):
        pdf = pd.DataFrame(_rows("en", 800), columns=["lang", "text"])
        a = kmv_distinct(spark.createDataFrame(pdf).repartition(2), "text", "lang")
        b = kmv_distinct(spark.createDataFrame(pdf).repartition(13), "text", "lang")
        ra, rb = a.collect()[0], b.collect()[0]
        # the k-th smallest distinct hash is a set property — partition-free
        assert ra["kth_hash"] == rb["kth_hash"]
        assert ra["est_distinct"] == rb["est_distinct"]

    def test_kth_hash_is_true_kth_smallest(self, spark):
        texts = [f"doc {i}" for i in range(300)]
        pdf = pd.DataFrame([("en", t) for t in texts], columns=["lang", "text"])
        r = kmv_distinct(spark.createDataFrame(pdf), "text", "lang").collect()[0]
        hs = sorted(hashlib.md5(t.encode()).hexdigest() for t in set(texts))
        assert r["kth_hash"] == hs[KMV_K - 1]

    def test_duplicates_do_not_inflate(self, spark):
        # 2000 copies of 30 distinct texts -> exact count 30
        pdf = pd.DataFrame(
            [("en", f"dup {i % 30}") for i in range(2000)], columns=["lang", "text"]
        )
        r = kmv_distinct(spark.createDataFrame(pdf).repartition(7), "text", "lang").collect()[0]
        assert r["n_exact"] == 30 and r["est_distinct"] == 30.0


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
