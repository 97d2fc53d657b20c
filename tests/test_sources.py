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


def test_with_retries_backoff_sequence():
    from datasmith_spark.sources import with_retries

    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RuntimeError("transient")
        return "ok"

    assert with_retries(flaky, retries=5, base_delay=0.5, sleep=sleeps.append)() == "ok"
    assert sleeps == [0.5, 1.0, 2.0]  # x2 backoff, one sleep per failure

    def always_fails():
        raise RuntimeError("hard")

    sleeps.clear()
    try:
        with_retries(always_fails, retries=2, base_delay=8.0, max_delay=10.0, sleep=sleeps.append)()
        raise AssertionError("should have raised")
    except RuntimeError:
        pass
    assert sleeps == [8.0, 10.0]  # capped at max_delay, then the error surfaces


def test_paginated_scan_distributed_with_flaky_pages(spark, tmp_path):
    """S11: page indices fan out over tasks, each page fetched worker-side
    with retry/backoff; the union equals the full dataset exactly once even
    when every page's first fetch attempt fails."""
    import pandas as pd

    from datasmith_spark.sources import paginated_scan

    marker = str(tmp_path)  # task-local retry state, per page

    def fetch_page(i: int) -> pd.DataFrame:
        import os

        flag = os.path.join(marker, f"tried-{i}")
        if not os.path.exists(flag):  # first attempt per page fails
            open(flag, "w").close()
            raise RuntimeError(f"transient page {i}")
        return pd.DataFrame({"page": [i] * 10, "row": list(range(10))})

    df = paginated_scan(
        spark, fetch_page, n_pages=8, schema="page bigint, row bigint",
        retries=3, base_delay=0.0, sleep=lambda _s: None,
    )
    got = df.toPandas().sort_values(["page", "row"]).reset_index(drop=True)
    assert len(got) == 80
    assert sorted(set(got.page)) == list(range(8))
    assert (got.groupby("page").row.count() == 10).all()


def test_paginated_scan_dead_letters_and_coalescing(spark, tmp_path):
    """A page that exhausts its retries must NOT fail the stage: its
    (page, error) lands in the dead-letter rows while every other page's
    data arrives exactly once. Pages are coalesced into few Arrow batches."""
    import pandas as pd

    from datasmith_spark.sources import (
        DL_ERROR_COL,
        DL_PAGE_COL,
        paginated_scan,
        split_dead_letters,
    )

    def fetch_page(i: int) -> pd.DataFrame:
        if i in (2, 5):
            raise ValueError(f"page {i} permanently broken")
        return pd.DataFrame({"page": [i] * 10, "row": list(range(10))})

    df = paginated_scan(
        spark, fetch_page, n_pages=8, schema="page bigint, row bigint",
        retries=2, base_delay=0.0, sleep=lambda _s: None,
        dead_letter=True, coalesce_pages=4,
    )
    ok, dead = split_dead_letters(df)

    got = ok.toPandas().sort_values(["page", "row"]).reset_index(drop=True)
    assert len(got) == 60  # 6 surviving pages x 10 rows
    assert sorted(set(got.page)) == [0, 1, 3, 4, 6, 7]
    assert (got[DL_PAGE_COL] == got.page).all()  # provenance column

    dl = dead.toPandas().sort_values(DL_PAGE_COL)
    assert list(dl[DL_PAGE_COL]) == [2, 5]
    assert all("permanently broken" in e for e in dl[DL_ERROR_COL])


def test_dead_letter_placeholder_uses_declared_dtypes(spark):
    """The dead-letter placeholder row must carry the DECLARED nullable
    dtypes (Int64/float64/boolean), not object arrays — a wide numeric
    schema coalesced into the same Arrow batch as real pages must not
    round-trip through object (r4 ADVICE polish)."""
    import pandas as pd

    from datasmith_spark.sources import DL_ERROR_COL, paginated_scan, split_dead_letters

    def fetch_page(i: int) -> pd.DataFrame:
        if i == 1:
            raise ValueError("broken")
        return pd.DataFrame(
            {"a": pd.array([i], dtype="Int64"), "b": [float(i)], "c": [i % 2 == 0]}
        )

    df = paginated_scan(
        spark, fetch_page, n_pages=4, schema="a bigint, b double, c boolean",
        retries=1, base_delay=0.0, sleep=lambda _s: None,
        dead_letter=True, coalesce_pages=4,
    )
    assert dict(df.dtypes)["a"] == "bigint"
    ok, dead = split_dead_letters(df)
    assert ok.count() == 3 and dead.count() == 1
    row = df.filter(F.col(DL_ERROR_COL).isNotNull()).first()
    assert row.a is None and row.b is None and row.c is None


def test_paginated_scan_coalesces_small_pages(spark):
    """Many 1-row pages must arrive in few Arrow batches (bounded per-batch
    overhead), with content identical to the uncoalesced scan."""
    import pandas as pd

    from datasmith_spark.sources import paginated_scan

    def fetch_page(i: int) -> pd.DataFrame:
        return pd.DataFrame({"page": [i], "row": [0]})

    df = paginated_scan(
        spark, fetch_page, n_pages=64, schema="page bigint, row bigint",
        parallelism=2, coalesce_pages=16,
    )
    # count Arrow batches per task via mapInArrow passthrough
    import pyarrow as pa

    def count_batches(batches):
        n = sum(1 for _ in batches)
        yield pa.RecordBatch.from_pydict({"n": [n]})

    n_batches = sum(r.n for r in df.mapInArrow(count_batches, "n long").collect())
    got = df.toPandas().sort_values("page").reset_index(drop=True)
    assert list(got.page) == list(range(64))
    # 64 pages over 2 tasks, 16 pages/batch -> ~4 batches, certainly << 64
    assert n_batches <= 8, n_batches


def test_orc_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from datasmith_spark.sources import read_orc, write_orc

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    p = str(tmp_path / "orc_rt")
    write_orc(df, p)
    back = read_orc(spark, p, "id long, k long, s string")
    assert back.count() == 100
    assert sorted(r["s"] for r in back.collect()) == sorted(r["s"] for r in df.collect())
    # predicate pushdown reaches the ORC scan
    qe = back.filter(F.col("k") == 3)._jdf.queryExecution()
    jvm = back.sparkSession._jvm
    plan = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan, plan
