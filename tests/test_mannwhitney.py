"""Exact Mann-Whitney drift test (q189): hand-computed U on a tiny
sample, rank-mass conservation, verdict polarity on the pinned corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasmith_spark.queries import QUERIES, _mw_lane


def _frame(spark, rows):
    return spark.createDataFrame(rows, "half string, v long")


def test_hand_computed_u_with_ties(spark):
    """a = [1, 3, 3], b = [2, 3] — ties across groups exercise the
    doubled average-rank construction. Hand ranks: 1->1, 2->2,
    three 3s share avg rank (3+4+5)/3 = 4. R_a = 1 + 4 + 4 = 9,
    U_a = R_a - n_a(n_a+1)/2 = 9 - 6 = 3."""
    rows = [("a", 1), ("a", 3), ("a", 3), ("b", 2), ("b", 3)]
    r = _mw_lane(_frame(spark, rows), "t").collect()[0]
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.r2_a == 18          # 2 * R_a
    assert r.u2_a == 6           # 2 * U_a
    assert r.tie_cube == 3**3 - 3  # one tie group of size 3


def test_rank_mass_conservation(spark):
    """r2_a + r2_b == n(n+1) exactly, for any sample (the doubled rank
    total) — checked by swapping the half labels."""
    rows = [("a", v) for v in (5, 7, 7, 9)] + [("b", v) for v in (6, 7, 10)]
    swapped = [("b" if h == "a" else "a", v) for h, v in rows]
    ra = _mw_lane(_frame(spark, rows), "t").collect()[0]
    rb = _mw_lane(_frame(spark, swapped), "t").collect()[0]
    n = ra.n_a + ra.n_b
    assert ra.r2_a + rb.r2_a == n * (n + 1)


def test_identical_distributions_do_not_drift(spark):
    """Same multiset in both halves => U exactly at its null mean, no
    drift regardless of sample size."""
    vals = list(range(100)) * 2
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    r = _mw_lane(_frame(spark, rows), "t").collect()[0]
    assert r.u2_a == r.n_a * r.n_b  # 2U == 2 * (nA*nB/2)
    assert not r.drift


def test_pinned_corpus_polarity(spark):
    out = {
        r.lane: r
        for r in QUERIES["q189_mannwhitney_drift"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert not out["observed"].drift
    assert out["planted"].drift
    assert out["observed"].n_a + out["observed"].n_b == 500


class TestSpearman:
    def test_perfect_monotone_and_anti(self, spark):
        from datasmith_spark.queries import _spearman_lane

        up = spark.createDataFrame(
            [(i, i * 7) for i in range(20)], "x long, y long"
        )
        r = _spearman_lane(up, "t").collect()[0]
        # rho = +1: num^2 * den_t^2 > num_t^2 * denx*deny and positive
        assert r.corr_pos
        assert r.sx == r.sy == r.n * (r.n + 1)
        assert r.sxx == r.syy == r.sxy  # identical rank vectors
        down = spark.createDataFrame(
            [(i, -i) for i in range(20)], "x long, y long"
        )
        assert not _spearman_lane(down, "t").collect()[0].corr_pos

    def test_constant_y_not_flagged(self, spark):
        """Zero variance in y -> deny = 0 -> verdict must be False (no
        division ever happens, so no crash either)."""
        from datasmith_spark.queries import _spearman_lane

        d = spark.createDataFrame([(i, 5) for i in range(10)], "x long, y long")
        r = _spearman_lane(d, "t").collect()[0]
        assert not r.corr_pos
        assert r.sy == r.n * (r.n + 1)  # one big tie group still sums right

    def test_hand_computed_tied_case(self, spark):
        """x = [1,2,2,3], y = [10,10,20,20]: doubled ranks
        rx = [2,5,5,8], ry = [3,3,7,7]; verify all six sums exactly."""
        from datasmith_spark.queries import _spearman_lane

        d = spark.createDataFrame(
            [(1, 10), (2, 10), (2, 20), (3, 20)], "x long, y long"
        )
        r = _spearman_lane(d, "t").collect()[0]
        rx, ry = [2, 5, 5, 8], [3, 3, 7, 7]
        assert r.sx == sum(rx) and r.sy == sum(ry)
        assert r.sxx == sum(v * v for v in rx)
        assert r.syy == sum(v * v for v in ry)
        assert r.sxy == sum(a * b for a, b in zip(rx, ry))

    def test_pinned_corpus_polarity(self, spark):
        from datasmith_spark.queries import QUERIES

        out = {
            r.lane: r
            for r in QUERIES["q190_spearman_corr"](
                spark, "/root/testdata/sf0.01"
            ).collect()
        }
        assert not out["observed"].corr_pos
        assert out["planted"].corr_pos


class TestRankStatProperties:
    """Property tests: the engine's histogram-rank construction equals an
    independent per-row average-rank reference on randomized samples."""

    @staticmethod
    def _ref_ranks2(values):
        """Doubled average ranks by brute force (independent of the
        histogram construction): 2*avg_rank = 2*(#less) + (#equal) + 1."""
        import numpy as np

        v = np.asarray(values)
        return [int(2 * (v < x).sum() + (v == x).sum() + 1) for x in v]

    def test_mw_matches_bruteforce_reference(self, spark):
        import numpy as np

        from datasmith_spark.queries import _mw_lane

        rng = np.random.default_rng(42)
        for trial in range(5):
            na, nb = int(rng.integers(3, 30)), int(rng.integers(3, 30))
            a = rng.integers(0, 12, na).tolist()  # small domain -> many ties
            b = rng.integers(0, 12, nb).tolist()
            rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
            r = _mw_lane(spark.createDataFrame(rows, "half string, v long"), "t").collect()[0]
            all_v = a + b
            r2 = self._ref_ranks2(all_v)
            want_r2a = sum(r2[:na])
            assert r.r2_a == want_r2a, trial
            assert r.u2_a == want_r2a - na * (na + 1)
            # tie term
            import collections

            t = sum(c**3 - c for c in collections.Counter(all_v).values())
            assert r.tie_cube == t

    def test_spearman_matches_bruteforce_reference(self, spark):
        import numpy as np

        from datasmith_spark.queries import _spearman_lane

        rng = np.random.default_rng(7)
        for trial in range(5):
            n = int(rng.integers(4, 40))
            x = rng.integers(0, 10, n).tolist()
            y = rng.integers(0, 10, n).tolist()
            d = spark.createDataFrame(
                [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long"
            )
            r = _spearman_lane(d, "t").collect()[0]
            rx = self._ref_ranks2(x)
            ry = self._ref_ranks2(y)
            assert r.sx == sum(rx) and r.sy == sum(ry), trial
            assert r.sxx == sum(v * v for v in rx)
            assert r.syy == sum(v * v for v in ry)
            assert r.sxy == sum(p * q for p, q in zip(rx, ry))
            # verdict consistent with float rho when clear of the boundary
            fx = np.asarray(rx, dtype=float)
            fy = np.asarray(ry, dtype=float)
            if fx.std() > 0 and fy.std() > 0:
                rho = float(np.corrcoef(fx, fy)[0, 1])
                if abs(rho - 0.1) > 1e-6:  # away from the threshold
                    assert r.corr_pos == (rho > 0.1), (trial, rho)
