"""Schema-pinned sources and sinks (SURVEY.md §2.1, S1-S7).

The reference reads CSV (pd.read_csv, /root/reference/scripts/filter_commits.py:87),
JSONL (pd.read_json(lines=True), /root/reference/scripts/benchmark_commits.py:65),
hand-repaired pseudo-JSONL (python-dict reprs with single quotes / None,
/root/reference/scripts/filter_commits.py:104-105 and
/root/reference/scripts/collate_benchmark_results.py:46-51), and writes CSV/JSONL
(/root/reference/scripts/scrape_repositories.py:89, filter_commits.py:128).

Rebuild rules:
  * every scan takes an explicit StructType/DDL schema — inference is forbidden
    (SURVEY.md §1.3); at 100 TB an inference pass is a full extra scan.
  * the "repair" pre-pass is expressed as JVM-side regexp_replace over a
    text scan, then from_json — no Python in the scan path.
  * sinks are plain df.write wrappers so callers never touch mode strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True) -> DataFrame:
    """S1: CSV scan with pinned schema (header names ignored for typing)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """S2: JSON-lines scan, PERMISSIVE mode (bad rows -> nulls, not failures)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_pydict_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """S3: pseudo-JSONL of python-dict reprs (single quotes, None) repaired
    JVM-side then parsed — the reference's replace("'", '"').replace("None","null")
    (/root/reference/scripts/filter_commits.py:104-105) without a Python loop.

    The repair is intentionally as naive as the reference's (a quote inside a
    value breaks both implementations identically).
    """
    lines = spark.read.text(path)
    fixed = F.regexp_replace(F.regexp_replace(F.col("value"), "'", '"'), r"\bNone\b", "null")
    # from_json accepts a StructType or a DDL string directly — no conversion
    return (
        lines.select(F.from_json(fixed, schema).alias("r"))
        .filter(F.col("r").isNotNull())
        .select("r.*")
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: CSV sink with header."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: JSONL sink (one JSON object per line, like to_json(orient='records'))."""
    df.write.mode(mode).json(path)


# ---------------------------------------------------------------- S9 + S11

def with_retries(fn, retries: int = 5, base_delay: float = 0.5, max_delay: float = 60.0,
                 sleep=None):
    """S9: exponential-backoff retry wrapper for flaky per-task fetchers —
    the worker-side analogue of the reference's `_request_with_backoff`
    (/root/reference/src/datasmith/utils.py:147-155: x2 backoff capped 60s,
    5 retries). `sleep` is injectable so tests run without wall-clock waits.

    On Spark this wraps the PAGE FETCH inside each task (paginated_scan), so
    a transient per-page failure retries locally instead of failing the task
    and re-running the whole partition through Spark's coarse task retry.
    """
    import time as _time

    do_sleep = _time.sleep if sleep is None else sleep

    def wrapped(*args, **kwargs):
        delay = base_delay
        for attempt in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception:
                if attempt == retries:
                    raise
                do_sleep(min(delay, max_delay))
                delay *= 2.0
        raise AssertionError("unreachable")  # pragma: no cover

    return wrapped


# dead-letter provenance columns (dead_letter=True mode)
DL_PAGE_COL = "_page_id"
DL_ERROR_COL = "_page_error"


def paginated_scan(
    spark: SparkSession,
    fetch_page,
    n_pages: int,
    schema: T.StructType | str,
    parallelism: int | None = None,
    retries: int = 5,
    base_delay: float = 0.5,
    sleep=None,
    dead_letter: bool = False,
    coalesce_pages: int = 32,
) -> DataFrame:
    """S11: distributed paginated source. Page indices are DATA (one row per
    page), distributed over tasks; each task calls `fetch_page(page_index)
    -> pandas.DataFrame(schema)` with retry/backoff. The Spark-idiomatic
    lift of the reference's paginated search scan
    (/root/reference/src/datasmith/scrape/scrape_dashboards.py pager loop):
    the driver never loops over pages, so a 10^6-page listing fans out
    across the cluster, failed pages retry locally, and the result is an
    ordinary DataFrame any downstream operator can consume.

    fetch_page must be deterministic per page (Spark may re-run tasks) and
    importable on workers (top-level function or closure over serializable
    state).

    dead_letter=True degrades gracefully when a page exhausts its retries —
    the reference's skip-and-log loops
    (/root/reference/src/datasmith/scrape/utils.py:116-141) instead of
    failing the task (and with it the stage and every sibling page): the
    output gains {DL_PAGE_COL} (every row's source page) and {DL_ERROR_COL}
    (null on success; the error string on a row standing in for the failed
    page). split_dead_letters() separates the two.

    coalesce_pages batches that many fetched pages into ONE Arrow batch
    before yielding, so a million small pages do not become a million tiny
    Arrow batches (per-batch overhead dominates below ~1k rows).
    """
    from collections.abc import Iterator

    import pandas as pd

    if parallelism is None:
        parallelism = min(n_pages, spark.sparkContext.defaultParallelism) or 1
    pages = spark.range(n_pages).repartition(parallelism)
    fetch = with_retries(fetch_page, retries=retries, base_delay=base_delay, sleep=sleep)

    struct = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
    data_cols = [f.name for f in struct.fields]
    # dead-letter placeholder dtypes: declared nullable dtypes, not object
    # arrays, so wide numeric schemas round-trip through Arrow cleanly
    _pd_dtypes = {
        T.ByteType(): "Int8", T.ShortType(): "Int16", T.IntegerType(): "Int32",
        T.LongType(): "Int64", T.FloatType(): "float32", T.DoubleType(): "float64",
        T.BooleanType(): "boolean",
    }
    dl_dtypes = {f.name: _pd_dtypes.get(f.dataType, "object") for f in struct.fields}
    out_schema: T.StructType | str = schema
    if dead_letter:
        out_schema = T.StructType(
            list(struct.fields)
            + [T.StructField(DL_PAGE_COL, T.LongType()), T.StructField(DL_ERROR_COL, T.StringType())]
        )

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []
        for b in batches:
            for i in b["id"]:
                i = int(i)
                try:
                    page = fetch(i)
                except Exception as e:  # noqa: BLE001 - dead-letter boundary
                    if not dead_letter:
                        raise
                    page = pd.DataFrame(
                        {c: pd.Series([None], dtype=dl_dtypes[c]) for c in data_cols}
                    )
                    page[DL_PAGE_COL] = [i]
                    page[DL_ERROR_COL] = [f"{type(e).__name__}: {e}"]
                else:
                    if dead_letter:
                        page = page.copy()
                        page[DL_PAGE_COL] = i
                        page[DL_ERROR_COL] = None
                buf.append(page)
                if len(buf) >= coalesce_pages:
                    yield pd.concat(buf, ignore_index=True)
                    buf = []
        if buf:
            yield pd.concat(buf, ignore_index=True)

    return pages.mapInPandas(_scan, schema=out_schema)


def split_dead_letters(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a dead_letter=True paginated_scan into (data, dead_letters):
    data carries the declared schema plus {DL_PAGE_COL} provenance;
    dead_letters is one (page, error) row per permanently-failed page."""
    ok = df.filter(F.col(DL_ERROR_COL).isNull()).drop(DL_ERROR_COL)
    dead = df.filter(F.col(DL_ERROR_COL).isNotNull()).select(DL_PAGE_COL, DL_ERROR_COL)
    return ok, dead


def read_orc(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """ORC scan with pinned schema — the columnar alternative to parquet
    that ships in Spark's builtin datasources (no extra jar), rounding out
    the source matrix (CSV / JSONL / pseudo-JSONL / parquet / ORC). Same
    pushdown/pruning properties as the parquet scan (ORC carries min/max
    stripe stats Catalyst uses for predicate pushdown)."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (snappy, Spark default)."""
    df.write.mode(mode).orc(path)
