"""SparkSession factory with the tuned configuration for this engine.

local[N] in the sandbox; the same conf set is what we'd ship for a real
multi-executor cluster (AQE, skew-join handling, Arrow batching, dynamic
partition overwrite). Everything the pipeline strictly requires is also set
at runtime (spark.conf.set) so entry() works under a driver-created session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "datasmith_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str = "48g",
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/root/repo/.data/tmp")
    )
    os.makedirs("/root/repo/.data/tmp", exist_ok=True)
    return b.getOrCreate()
