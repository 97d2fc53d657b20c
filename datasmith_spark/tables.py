"""Table layer: hash-partitioned parquet with Iceberg-ready semantics.

The pipeline's tables (`labels`, `lineage`, `metrics`, `checkpoints`) are
written through this module only, so swapping parquet for an Iceberg catalog
(`bucket(N, clip_id)` partition transform, MERGE INTO checkpoints) is a
config change, not a code fork (SURVEY.md §7.4 risk 5).

Parquet mode semantics:
  * labels: directory-partitioned by part_id, dynamic partition overwrite
    => per-partition idempotent rewrite (the `replaceWhere` analogue).
  * checkpoints/lineage/metrics: append-only logs; readers take the latest
    row per key (last-write-wins upsert, mirroring the reference's
    INSERT OR REPLACE cache at /root/reference/src/datasmith/utils.py:94-101).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableLayer:
    def __init__(self, base_dir: str, catalog: str | None = None):
        self.base = base_dir
        self.catalog = catalog  # reserved: Iceberg catalog name when available

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def exists(self, spark: SparkSession, name: str) -> bool:
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        return any(not f.startswith(("_", ".")) for f in os.listdir(p))

    def read(self, spark: SparkSession, name: str, schema=None) -> DataFrame:
        """Read a table; pass schema to stay well-defined on empty writes."""
        reader = spark.read.schema(schema) if schema is not None else spark.read
        return reader.parquet(self.path(name))

    def overwrite_partitions(self, df: DataFrame, name: str, partition_col: str = "part_id") -> None:
        """Idempotent per-partition overwrite (Iceberg replaceWhere analogue)."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(self.path(name))
        )

    def drop_partitions(self, name: str, partition_col: str, values) -> None:
        """Delete partition directories outright (deletion semantics for
        parts whose input rows vanished — the parquet-mode stand-in for an
        Iceberg MERGE delete; see pipeline.run_pipeline)."""
        import shutil

        for v in values:
            p = os.path.join(self.path(name), f"{partition_col}={v}")
            if os.path.isdir(p):
                shutil.rmtree(p)

    def wipe(self, name: str) -> None:
        """Delete a table outright (used by the partition-layout guard when
        n_parts changes: the old labels/checkpoints describe a different
        partitioning and every part recomputes anyway)."""
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)

    def read_unified(self, spark: SparkSession, name: str, schema=None) -> DataFrame:
        """Read a table in BATCH shape regardless of which writer produced
        it: the streaming sink partitions by (batch_id, part_id) for
        idempotent batch replay, so a streaming-written labels dir carries an
        extra batch_id partition column — this reader drops it, making batch
        and streaming outputs interchangeable downstream."""
        df = self.read(spark, name, schema=schema)
        return df.drop("batch_id") if "batch_id" in df.columns else df

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.path(name))

    def latest_per_key(self, spark: SparkSession, name: str, keys: list[str], order_col: str = "ts") -> DataFrame:
        """Last-write-wins view over an append-only log."""
        from pyspark.sql import Window

        df = self.read(spark, name)
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
