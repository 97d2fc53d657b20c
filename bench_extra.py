"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

bench.py is frozen for measurement; this harness exists to isolate and
iterate on individual queries: same methodology as bench.py's query loop
(build + count() on the shared session), plus optional noop-sink timing,
repeat counts, and .explain("formatted") capture into plans/r06/.

Usage:
  python bench_extra.py SF_DIR q154_prefix_filter_pairs q74_semdedup_pairs
  python bench_extra.py SF_DIR all --reps 1
  python bench_extra.py SF_DIR q21_minhash_lsh --plan plans/r06/q21_before.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir = args[0]
    names = args[1:]
    reps = 1
    plan_path = None
    noop = False
    for o in opts:
        if o.startswith("--reps="):
            reps = int(o.split("=", 1)[1])
        elif o.startswith("--plan="):
            plan_path = o.split("=", 1)[1]
        elif o == "--noop":
            noop = True

    import __spark_entry__ as e

    from datasmith_spark.session import get_spark

    qs = e.queries()
    if names == ["all"]:
        names = list(qs)

    spark = get_spark(app="bench-extra", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        walls = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
        print(f"{name}: {walls}", flush=True)
        if plan_path:
            df = fn(spark, sf_dir)
            os.makedirs(os.path.dirname(plan_path), exist_ok=True)
            with open(plan_path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    print("RESULT::" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
