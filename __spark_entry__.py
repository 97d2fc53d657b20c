"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full curation pipeline (rules -> decode ->
                 langid -> perplexity -> scrub) over the deterministic
                 synthetic clips table at SF=0.001; returns the labels
                 DataFrame.
queries()      — operator inventory from SURVEY.md §2, each (spark, sf_dir)
                 -> DataFrame over /root/testdata parquet.
oracle_sql()   — DuckDB-dialect equivalents for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single-threaded BLAS for any worker forked after this import (each Spark
# task is its own parallel unit; multi-threaded BLAS spin on tiny dot calls
# measurably serializes) — best-effort under a driver-created session, exact
# under datasmith_spark.session.get_spark which sets it before JVM launch
for _k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_k, "1")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full quality-filter chain at SF=0.001 (1k clips)."""
    from datasmith_spark import datagen
    from datasmith_spark.pipeline import ARROW_BATCH, label_clips

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
    clips = datagen.clips_df(spark, datagen.n_rows_for_sf(0.001))
    return label_clips(clips, n_parts=32)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datasmith_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datasmith_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
