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
