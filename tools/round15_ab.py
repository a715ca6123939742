"""Round-15 interleaved two-tree A/B runner (BASELINE.md round-14 protocol).

One invocation = one fresh JVM/SparkSession = one sample. Usage:

    python tools/round15_ab.py <tree_path> <query> [<query> ...]

Prints one JSON line {"tree": ..., "timings": {name: sec}}. The driver
loop alternates HEAD vs the r13-end worktree (ff8f6c9) so host shadow
(page-cache state, hypervisor contention) cancels across trees. Mirrors
bench.py's measurement discipline: lineitem warmup + Python worker pool
spin-up + one sf0.001 codegen warmup query, then each target query timed
end-to-end into the noop sink, min-of-2 WITHIN the session (the cross-
session min is taken by the caller, per the r14 lesson).
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    names = sys.argv[2:]
    sys.path.insert(0, tree)

    from pasardassist_spark import get_spark
    from pasardassist_spark.queries import all_queries
    from pasardassist_spark.tables import load

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pasardassist-ab")
    qs = all_queries()

    load(spark, sf_dir, "lineitem").count()
    from pyspark.sql import functions as F

    def _noop_pandas(batches):
        for pdf in batches:
            yield pdf

    spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        F.col("id")
    ).mapInPandas(_noop_pandas, "id long").write.format("noop").mode("overwrite").save()
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    controls = ["q1_pricing_summary"]
    for _ in range(2):
        for name in controls + names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    print(json.dumps({"tree": tree, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
