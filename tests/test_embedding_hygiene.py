"""Embedding hygiene audit (q176): per-lane flags, plant corruption
recovery, null/empty edges."""

from __future__ import annotations

import pyspark.sql.types as T

from datasmith_spark.operators.similarity import embedding_hygiene

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _embs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_lane_flags_exact(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        (1, [0.1] * 64, 0),                       # clean
        (2, [0.1] * 63 + [nan], 0),               # one NaN
        (3, [0.1] * 63 + [inf], 0),               # one Inf
        (4, [0.1] * 48, 0),                       # short
        (5, [0.0] * 64, 0),                       # all-zero
        (6, None, 0),                             # null -> dim 0
        (7, [0.0] * 63 + [0.5], 0),               # one nonzero entry: kept
    ]
    out = {r.vec_key: r for r in embedding_hygiene(_embs(spark, rows)).collect()}
    assert out["vec_1"].keep and out["vec_1"].dim == 64
    assert not out["vec_2"].keep and out["vec_2"].n_nonfinite == 1
    assert not out["vec_3"].keep and not out["vec_3"].finite_ok
    assert not out["vec_4"].keep and not out["vec_4"].dim_ok and out["vec_4"].finite_ok
    assert not out["vec_5"].keep and not out["vec_5"].nonzero_ok and out["vec_5"].n_zero == 64
    assert not out["vec_6"].keep and out["vec_6"].dim == 0 and not out["vec_6"].nonzero_ok
    assert out["vec_7"].keep and out["vec_7"].n_zero == 63


def test_plants_recovered_per_lane(spark):
    rows = [(i, [0.25 + i * 1e-3] * 64, 0) for i in range(90)]
    got = embedding_hygiene(_embs(spark, rows), plant_every=30).toPandas()
    base = got[got.vec_key.str.startswith("vec_")]
    assert base.keep.all() and len(base) == 90
    for pre, lane in (("nf_", "finite_ok"), ("sh_", "dim_ok"), ("zr_", "nonzero_ok")):
        sub = got[got.vec_key.str.startswith(pre)]
        assert len(sub) == 3 and (~sub.keep).all()
        assert (~sub[lane]).all(), pre
    sh = got[got.vec_key.str.startswith("sh_")]
    assert (sh.dim == 48).all()


def test_registry_has_q176():
    from datasmith_spark.queries import ORACLE_SQL, QUERIES

    assert "q176_embedding_hygiene" in QUERIES and "q176_embedding_hygiene" in ORACLE_SQL
