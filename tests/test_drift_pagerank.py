"""Audio feature drift (q184) and integer PageRank (q185): hand-built
ground truth, arbitrary-id handling, exact-reproducibility invariants."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import functions as F

from datasmith_spark.queries import QUERIES


class TestFeatureDrift:
    def test_md5_split_matches_python_and_accepts_arbitrary_ids(self, spark):
        """The half assignment is md5 of the raw id bytes — defined for any
        id shape and identical to hashlib's on the same UTF-8 bytes."""
        ids = ["clip_000000000007", "weird id #1", "ümlaut", "x" * 100]
        df = spark.createDataFrame([(i,) for i in ids], "clip_id string")
        got = {
            r.clip_id: r.half
            for r in df.select(
                "clip_id",
                F.when(
                    F.substring(
                        F.md5(F.col("clip_id").cast("binary")), 1, 1
                    ).isin(*"01234567"),
                    "a",
                )
                .otherwise("b")
                .alias("half"),
            ).collect()
        }
        for i in ids:
            want = "a" if hashlib.md5(i.encode()).hexdigest()[0] in "01234567" else "b"
            assert got[i] == want

    def test_drift_verdict_algebra(self):
        """Cross-multiplied verdict == float comparison on exact inputs."""
        rng = np.random.default_rng(5)
        for _ in range(200):
            n_a, n_b = rng.integers(1, 10**6, 2)
            s_a, s_b = rng.integers(-(10**9), 10**9, 2)
            diff = abs(int(s_a) * int(n_b) - int(s_b) * int(n_a))
            lhs = diff > 200 * int(n_a) * int(n_b)
            rhs = abs(s_a / n_a - s_b / n_b) > 200  # float view
            # exact integer test may only disagree within float epsilon
            if lhs != rhs:
                assert abs(abs(s_a / n_a - s_b / n_b) - 200) < 1e-6

    def test_pinned_corpus_flags(self, spark):
        out = QUERIES["q184_feature_drift"](spark, "/root/testdata/sf0.01").toPandas()
        assert len(out) == 40
        assert set(out.bin) == set(range(40))
        # mixed verdict set on the pinned corpus (measured: 12 drift bins)
        assert 0 < int(out.drift.sum()) < 40
        # verdict re-derivable from the emitted exact columns
        recheck = out.diff_num > 200 * out.n_a * out.n_b
        assert (out.drift == recheck).all()


def _tiny_lineitem(spark):
    """3 orders over 4 parts: o1={1,2}, o2={1,2,3}, o3={3,4}."""
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 3), (3, 4)]
    return spark.createDataFrame(
        [(o, p, 1.0) for o, p in rows],
        "l_orderkey long, l_partkey long, l_quantity double",
    )


def _hand_pagerank(rows, iters=3):
    import collections

    per_order = collections.defaultdict(set)
    for o, p in rows:
        per_order[o].add(p)
    w = collections.Counter()
    for parts in per_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    w[(u, v)] += 1
    wu = collections.Counter()
    for (u, _), k in w.items():
        wu[u] += k
    r = {u: 10**6 for u in wu}
    for _ in range(iters):
        nxt = collections.defaultdict(lambda: 150000)
        for (u, v), k in w.items():
            nxt[v] += (17 * r[u] * k) // (20 * wu[u])
        r = dict(nxt)
    return r


class TestIntegerPagerank:
    def test_tiny_graph_matches_hand_computation(self, spark, tmp_path):
        li = _tiny_lineitem(spark)
        path = str(tmp_path / "li")
        li.write.mode("overwrite").parquet(path + "/lineitem.parquet")
        got = {
            r.part_key: r.rank_i
            for r in QUERIES["q185_pagerank_copurchase"](spark, path).collect()
        }
        rows = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 3), (3, 4)]
        want = _hand_pagerank(rows)
        assert got == want
        # part 3 bridges both clusters -> highest rank
        assert max(got, key=got.get) == 3

    def test_partition_layout_cannot_move_ranks(self, spark, tmp_path):
        """Exact-by-construction: floor-division contributions commute, so
        the result is identical under different physical layouts."""
        li = _tiny_lineitem(spark)
        outs = []
        for parts in (1, 5):
            path = str(tmp_path / f"li{parts}")
            li.repartition(parts).write.mode("overwrite").parquet(
                path + "/lineitem.parquet"
            )
            outs.append(
                sorted(
                    (r.part_key, r.rank_i)
                    for r in QUERIES["q185_pagerank_copurchase"](
                        spark, path
                    ).collect()
                )
            )
        assert outs[0] == outs[1]
