"""Sequential-Poisson PPS sampling (operators/sampling.py, q91)."""

import pyspark.sql.functions as F
import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, w int")


@pytest.fixture(scope="module")
def mixed(spark):
    # one hot group (400 rows), one mid (40), one tiny (3 < k)
    rows = [(i, "en", 10 + i % 50) for i in range(400)]
    rows += [(1000 + i, "de", 5 + i % 9) for i in range(40)]
    rows += [(2000 + i, "xx", 7) for i in range(3)]
    return _df(spark, rows)


def test_decomposition_equals_plain_window(spark, mixed):
    """The prefilter+fallback decomposition must be VALUE-EQUAL to the
    naive one-window form — the q91 correctness contract."""
    from datasmith_spark.operators.sampling import pps_sample

    fast = pps_sample(mixed, k=12, weight_col="w").collect()
    plain = pps_sample(mixed, k=12, weight_col="w", prefilter=False).collect()
    key = lambda r: (r.lang, r.rk)
    assert sorted(map(tuple, fast), key=str) == sorted(map(tuple, plain), key=str)
    assert {key(r) for r in fast} == {key(r) for r in plain}


def test_small_group_returns_all_rows(spark, mixed):
    from datasmith_spark.operators.sampling import pps_sample

    out = pps_sample(mixed, k=12, weight_col="w").toPandas()
    xx = out[out.lang == "xx"]
    assert len(xx) == 3 and sorted(xx.rk) == [1, 2, 3]
    assert len(out[out.lang == "en"]) == 12
    assert len(out[out.lang == "de"]) == 12


def test_weight_bias_is_real(spark):
    """A row with overwhelming weight gets key ~ u/1e9 and must be
    sampled; and across a 1:9 weight split the heavy class must be
    overrepresented vs its 10% row share (deterministic md5 keys, so
    this is a fixed outcome, not a flaky statistic)."""
    from datasmith_spark.operators.sampling import pps_sample

    rows = [(i, "en", 9 if i % 10 == 0 else 1) for i in range(1, 2000)]
    rows.append((0, "en", 1_000_000_000))
    out = pps_sample(_df(spark, rows), k=50, weight_col="w").toPandas()
    assert 0 in set(out.doc_id)
    heavy = (out.w == 9).sum()
    # heavy rows are 10% of the population but ~50% of the weight
    assert heavy >= 0.25 * len(out)


def test_keys_match_duckdb(spark):
    """The portability contract itself: Spark's pps_key and DuckDB's
    two-division SQL form produce bit-identical doubles."""
    import duckdb

    from datasmith_spark.operators.sampling import pps_key

    rows = [(i, "x", 3 + (i * 7) % 45) for i in range(200)]
    df = _df(spark, rows).select(
        "doc_id", pps_key(F.col("doc_id"), F.col("w")).alias("key")
    )
    got = {r.doc_id: r.key for r in df.collect()}
    want = duckdb.sql(
        """
        SELECT i AS doc_id,
               (CAST(concat('0x', substr(md5(CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)::DOUBLE
                  / 4294967296.0) / (3 + (i * 7) % 45)::DOUBLE AS key
        FROM range(200) t(i)
        """
    ).fetchall()
    for i, k in want:
        assert got[i] == k, (i, got[i], k)


def test_registry_has_q91(spark):
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q91_pps_weighted_sample" in QUERIES
    assert "q91_pps_weighted_sample" in ORACLE_SQL


class TestEpochShuffle:
    def test_each_epoch_is_a_permutation_and_epochs_differ(self, spark):
        from datasmith_spark.queries import QUERIES

        out = QUERIES["q187_epoch_shuffle"](spark, "/root/testdata/sf0.001").toPandas()
        n_docs = out.doc_id.nunique()
        assert set(out.epoch) == {0, 1, 2}
        assert set(out.bucket) <= set(range(8))
        orders = {}
        for e, sub in out.groupby("epoch"):
            # bijection: every doc exactly once per epoch
            assert len(sub) == n_docs == sub.doc_id.nunique()
            # pos is 1..n within each bucket, no gaps
            for _, bsub in sub.groupby("bucket"):
                assert sorted(bsub.pos) == list(range(1, len(bsub) + 1))
            orders[e] = tuple(
                sub.sort_values(["bucket", "pos"]).doc_id.tolist()
            )
        # different epochs produce different permutations
        assert orders[0] != orders[1] != orders[2]

    def test_reproducible_no_rng_state(self, spark):
        from datasmith_spark.queries import QUERIES

        a = QUERIES["q187_epoch_shuffle"](spark, "/root/testdata/sf0.001").toPandas()
        b = QUERIES["q187_epoch_shuffle"](spark, "/root/testdata/sf0.001").toPandas()
        key = ["epoch", "bucket", "pos"]
        assert (
            a.sort_values(key).doc_id.tolist() == b.sort_values(key).doc_id.tolist()
        )
