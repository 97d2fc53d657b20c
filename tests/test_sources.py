"""Round-trip tests for schema-pinned sources/sinks (SURVEY.md §2.1)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from datasmith_spark import sources
from tests.conftest import cache_dir

SF_DIR = "/root/testdata/sf0.001"
EVENTS_DDL = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
)


def _events(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")
        .limit(500)
    )


def test_csv_roundtrip(spark):
    d = cache_dir() / "src_csv"
    shutil.rmtree(d, ignore_errors=True)
    want = _events(spark)
    sources.write_csv(want, str(d))
    got = sources.read_csv(spark, str(d), EVENTS_DDL)
    assert got.schema == spark.createDataFrame([], EVENTS_DDL).schema
    assert got.count() == want.count()
    assert got.agg(F.sum("event_id")).first()[0] == want.agg(F.sum("event_id")).first()[0]


def test_jsonl_roundtrip(spark):
    d = cache_dir() / "src_jsonl"
    shutil.rmtree(d, ignore_errors=True)
    want = _events(spark)
    sources.write_jsonl(want, str(d))
    got = sources.read_jsonl(spark, str(d), EVENTS_DDL)
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("value").cast("decimal(30,6)")).first()[0]
        == want.agg(F.sum("value").cast("decimal(30,6)")).first()[0]
    )


def test_pydict_jsonl_repair(spark, tmp_path):
    """Python-dict reprs with single quotes / None parse like the reference's
    string-repair pass (/root/reference/scripts/filter_commits.py:104-105)."""
    p = tmp_path / "pseudo.jsonl"
    rows = [
        {"repo_name": "a/x", "stars": 10, "sha": "abc"},
        {"repo_name": "b/y", "stars": None, "sha": "def"},
        {"repo_name": "c/z", "stars": 3, "sha": None},
    ]
    p.write_text("\n".join(str(r) for r in rows))
    got = sources.read_pydict_jsonl(
        spark, str(p), "repo_name string, stars int, sha string"
    ).orderBy("repo_name").collect()
    assert [r.repo_name for r in got] == ["a/x", "b/y", "c/z"]
    assert [r.stars for r in got] == [10, None, 3]
    assert [r.sha for r in got] == ["abc", "def", None]


def test_pydict_jsonl_structtype_schema(spark, tmp_path):
    """The StructType overload of the declared schema interface must parse
    identically to the DDL-string path."""
    from pyspark.sql import types as T

    p = tmp_path / "pseudo2.jsonl"
    rows = [{"a": 1, "b": "x"}, {"a": None, "b": "y"}]
    p.write_text("\n".join(str(r) for r in rows))
    st = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    got = sources.read_pydict_jsonl(spark, str(p), st).orderBy("b").collect()
    assert [(r.a, r.b) for r in got] == [(1, "x"), (None, "y")]
