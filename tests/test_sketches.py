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


class TestBinnedHistogram:
    def test_exact_markers_hand_case(self, spark):
        from datasmith_spark.operators.sketches import binned_histogram

        # group g: values -> bins [0,0,0,1,2,2,2,2,3,9]; total 10
        vals = [1, 2, 3, 10, 20, 21, 22, 23, 30, 95]
        df = spark.createDataFrame([("g", v) for v in vals], "grp0 string, v long")
        out = {
            r.bin: r
            for r in binned_histogram(df, "v", "grp0", bin_width=10).collect()
        }
        assert {b: out[b].n for b in out} == {0: 3, 1: 1, 2: 4, 3: 1, 9: 1}
        assert [out[b].cum_n for b in sorted(out)] == [3, 4, 8, 9, 10]
        # p50 lands in bin 2 (cum 8 >= 5, prev cum 4 < 5); p90 in bin 3
        # (cum 9 >= 9, prev 8 < 9); p99 in bin 9 (cum 10 >= 9.9, prev 9 < 9.9)
        assert [b for b in out if out[b].is_p50] == [2]
        assert [b for b in out if out[b].is_p90] == [3]
        assert [b for b in out if out[b].is_p99] == [9]

    def test_merge_invariance(self, spark):
        """Partial histograms from any partitioning sum to the same result
        (the mergeable-sketch property, asserted end-to-end)."""
        from datasmith_spark.operators.sketches import binned_histogram

        rows = [(f"g{i % 3}", (i * 37) % 500) for i in range(300)]
        df1 = spark.createDataFrame(rows, "grp0 string, v long").repartition(1)
        df8 = spark.createDataFrame(rows, "grp0 string, v long").repartition(8, "v")
        key = lambda df: sorted(
            map(tuple, binned_histogram(df, "v", "grp0", 50).collect())
        )
        assert key(df1) == key(df8)

    def test_registry_has_q81(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q81_duration_histogram" in QUERIES
        assert "q81_duration_histogram" in ORACLE_SQL


def test_registry_has_q83():
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q83_keep_rate_drift" in QUERIES
    assert "q83_keep_rate_drift" in ORACLE_SQL


class TestCountMin:
    def _keys(self, spark, items):
        return spark.createDataFrame([(k,) for k in items], "tok string")

    def test_sketch_is_mergeable_cellwise(self, spark):
        from datasmith_spark.operators.sketches import cms_sketch

        a = ["x"] * 5 + ["y"] * 3 + ["z"]
        b = ["x"] * 2 + ["w"] * 7
        def cells(items):
            return {
                (r["j"], r["b"]): r["c"]
                for r in cms_sketch(self._keys(spark, items), "tok").collect()
            }
        ca, cb, cab = cells(a), cells(b), cells(a + b)
        merged = dict(ca)
        for k, v in cb.items():
            merged[k] = merged.get(k, 0) + v
        assert merged == cab

    def test_never_underestimates_and_exact_when_wide(self, spark):
        from datasmith_spark.operators.sketches import cms_heavy_hitters

        items = ["a"] * 10 + ["b"] * 4 + ["c"]
        out = {
            r["tok"]: (r["est_cnt"], r["true_cnt"])
            for r in cms_heavy_hitters(
                self._keys(spark, items), "tok", threshold=1, w=4096
            ).collect()
        }
        # w=4096 >> 3 keys: no collisions, estimates exact
        assert out == {"a": (10, 10), "b": (4, 4), "c": (1, 1)}

    def test_collisions_overestimate_one_sided(self, spark):
        from datasmith_spark.operators.sketches import cms_heavy_hitters

        items = [f"k{i}" for i in range(40) for _ in (0, 1)]  # 40 keys x2, w=8
        rows = cms_heavy_hitters(
            self._keys(spark, items), "tok", threshold=1, d=2, w=8
        ).collect()
        assert len(rows) == 40
        assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)
        assert any(r["est_cnt"] > r["true_cnt"] for r in rows)  # collisions real

    def test_registered_sizing_has_passing_false_positives(self, spark):
        # the q88 threshold must be crossed by at least one colliding token
        # (est >= thr > true) at sf0.01, or the oracle would not cover the
        # one-sided-error path
        from datasmith_spark.queries import _CMS_HH_THR, QUERIES

        rows = QUERIES["q88_cms_heavy_hitters"](spark, "/root/testdata/sf0.01").collect()
        assert any(
            r["est_cnt"] >= _CMS_HH_THR > r["true_cnt"] for r in rows
        )
        assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)


class TestHll:
    def test_registers_match_reference_construction(self, spark):
        """Registers equal a straight python HLL over the same hashes."""
        from datasmith_spark.operators.sketches import hll_distinct

        texts = [f"doc {i}" for i in range(500)]
        pdf = pd.DataFrame([("en", t) for t in texts], columns=["lang", "text"])
        r = hll_distinct(spark.createDataFrame(pdf).repartition(7), "text", "lang").collect()[0]
        regs: dict[str, int] = {}
        for t in set(texts):
            h = hashlib.md5(t.encode()).hexdigest()
            v = int(h[1:16], 16)
            rho = 61 - v.bit_length() if v else 61
            b = h[0]
            regs[b] = max(regs.get(b, 0), rho)
        digest = hashlib.md5(
            ",".join(f"{b}:{m}" for b, m in sorted(regs.items())).encode()
        ).hexdigest()
        assert r["reg_digest"] == digest
        assert r["n_registers"] == len(regs)
        assert r["n_exact"] == 500

    def test_partitioning_invariance_and_accuracy(self, spark):
        from datasmith_spark.operators.sketches import hll_distinct

        pdf = pd.DataFrame(
            [("en", f"t {i}") for i in range(3000)] * 2, columns=["lang", "text"]
        )
        a = hll_distinct(spark.createDataFrame(pdf).repartition(2), "text", "lang").collect()[0]
        b = hll_distinct(spark.createDataFrame(pdf).repartition(17), "text", "lang").collect()[0]
        assert a["reg_digest"] == b["reg_digest"]  # registers are a set property
        assert a["est_milli"] == b["est_milli"]
        # m=16 -> relative error ~ 1.04/sqrt(16) = 26%; allow 3 sigma
        assert abs(a["hll_est"] - 3000) / 3000 < 0.8, a["hll_est"]

    def test_small_range_linear_counting(self, spark):
        from datasmith_spark.operators.sketches import hll_distinct

        pdf = pd.DataFrame([("en", f"x{i}") for i in range(3)], columns=["lang", "text"])
        r = hll_distinct(spark.createDataFrame(pdf), "text", "lang").collect()[0]
        # 3 distinct, most registers empty -> linear counting m*ln(m/V)
        assert r["n_registers"] <= 3 and r["n_exact"] == 3
        assert 0 < r["hll_est"] < 16  # ln-based, bounded by register count

    def test_registry_has_q137(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q137_hll_distinct" in QUERIES
        assert "q137_hll_distinct" in ORACLE_SQL


class TestKmvOverlap:
    """q162: KMV set algebra — pairwise union/intersection estimation from
    per-source sketches (merge + re-trim), exact when un-truncated."""

    @staticmethod
    def _docs(spark, spec):
        # spec: {source: list of vocab word-lists per doc}
        rows = [
            (src, " ".join(words))
            for src, docs in spec.items()
            for words in docs
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["source", "text"])
        ).repartition(5)

    def test_exact_when_union_fits_in_sketch(self, spark):
        from datasmith_spark.operators.sketches import kmv_vocab_overlap

        spec = {
            "x": [[f"w{i}" for i in range(20)]],
            "y": [[f"w{i}" for i in range(10, 40)]],  # overlap = w10..w19
        }
        out = kmv_vocab_overlap(self._docs(spark, spec)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.source_a, r.source_b) == ("x", "y")
        assert r.n_min == 40 and r.n_common == 10
        assert r.est_union == 40.0 and r.est_inter == 10.0
        assert r.n_union_exact == 40 and r.n_inter_exact == 10

    def test_estimates_track_truth_above_k(self, spark):
        from datasmith_spark.operators.sketches import kmv_vocab_overlap

        # 1200 shared + 800/1000 private tokens; union 3000, inter 1200
        shared = [f"s{i}" for i in range(1200)]
        spec = {
            "x": [shared + [f"xp{i}" for i in range(800)]],
            "y": [shared + [f"yp{i}" for i in range(1000)]],
        }
        r = kmv_vocab_overlap(self._docs(spark, spec)).collect()[0]
        assert r.n_union_exact == 3000 and r.n_inter_exact == 1200
        # KMV sigma ~ est/sqrt(k-1) ≈ 12.6%; allow 3-sigma bands
        assert abs(r.est_union - 3000) / 3000 < 0.4, r.est_union
        assert abs(r.est_inter - 1200) / 1200 < 0.6, r.est_inter

    def test_disjoint_sources_estimate_zero_intersection(self, spark):
        from datasmith_spark.operators.sketches import kmv_vocab_overlap

        spec = {
            "x": [[f"a{i}" for i in range(500)]],
            "y": [[f"b{i}" for i in range(500)]],
        }
        r = kmv_vocab_overlap(self._docs(spark, spec)).collect()[0]
        assert r.n_common == 0 and r.est_inter == 0.0 and r.n_inter_exact == 0

    def test_union_sketch_equals_sketch_of_union(self, spark):
        """Merge + re-trim == sketching the concatenated corpus directly:
        the mergeability property the pair stage relies on."""
        from datasmith_spark.operators.sketches import kmv_distinct, kmv_vocab_overlap

        spec = {
            "x": [[f"t{i}" for i in range(700)]],
            "y": [[f"t{i}" for i in range(350, 1400)]],
        }
        pair = kmv_vocab_overlap(self._docs(spark, spec)).collect()[0]
        # sketch the union corpus directly under one group
        toks = [(w,) for w in {f"t{i}" for i in range(1400)}]
        union_df = spark.createDataFrame(
            pd.DataFrame(toks, columns=["text"]).assign(lang="u")
        )
        direct = kmv_distinct(union_df, "text", "lang").collect()[0]
        assert pair.kth_hash == direct.kth_hash
        assert pair.est_union == direct.est_distinct

    def test_registry_has_q162(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q162_kmv_vocab_overlap" in QUERIES and "q162_kmv_vocab_overlap" in ORACLE_SQL
