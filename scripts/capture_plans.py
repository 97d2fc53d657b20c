"""Capture .explain("formatted") for a list of registered queries.

Usage: python scripts/capture_plans.py OUT_DIR SUFFIX SF_DIR q21_minhash_lsh ...
Writes OUT_DIR/<name>_<SUFFIX>.txt for each query. Plans are the
pre-execution (initial) plans; queries that materialize eager checkpoints
at build time execute those sub-jobs, so the captured plan shows the
checkpoint boundaries exactly as the bench executes them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as e

    from datasmith_spark.session import get_spark

    spark = get_spark(app=f"plans-{suffix}", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # capture the failure instead of dying
            txt = f"PLAN CAPTURE FAILED: {ex!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
