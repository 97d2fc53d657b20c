"""Preloading pyspark worker daemon (spark.python.daemon.module).

Python workers are forked from this daemon, so everything imported and
materialized here is inherited by every worker via copy-on-write — paid
once per executor instead of once per worker. That covers the heavy
imports (numpy / pandas / pyarrow) and the frozen model artifacts
(langid weights, LM count tables), which otherwise cost seconds of
page-faulting per fresh worker on this sandbox's slow-fault kernel.

Equivalent of the reference's one-time model load per process
(tiktoken encoder init, /root/reference/src/datasmith/scrape/build_reports.py:235-246)
hoisted to the process-tree root.
"""

from __future__ import annotations

import os

# must land before numpy loads OpenBLAS: a 32-thread BLAS spin per tiny dot
# call serializes on this kernel (~8x on the fused label kernel); each Spark
# task is already a parallel unit, so workers get exactly one BLAS thread
for _k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_k, "1")


def _preload() -> None:
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.parquet  # noqa: F401

    try:
        from datasmith_spark.core import langid, lm

        langid.model()
        lm.model()
    except Exception:
        # never block worker startup on artifact problems; workers will
        # rebuild lazily (correctness unaffected, only warmup cost)
        pass
    try:
        # the modules every Arrow-UDF closure unpickles into the worker:
        # without this, each worker pays the full import chain (queries.py
        # pulls the whole operator surface) on its FIRST task of a lane —
        # measured ~2.5 s x 32 workers of pure wait in the first
        # profile-kernel stage of a session. COW-shared from here instead.
        import datasmith_spark.queries  # noqa: F401
        import datasmith_spark.streaming  # noqa: F401
    except Exception:
        pass


if __name__ == "__main__":
    _preload()
    from pyspark.daemon import manager

    manager()
