"""Round-19 cold/warm isolated sampler: like tools/r18_isolate.py (fresh
JVM, lineitem + Python-pool + codegen warmup, q1 control, noop sink,
release between entries) but reports the FIRST execution (what the
driver's cold `queries` field sees) and the min-of-2 warm separately.

    python tools/r19_cold.py <query> [<query> ...]
Prints {"cold": {...}, "warm": {...}, "control": q1_first}.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]

    from pasardassist_spark import get_spark
    from pasardassist_spark.queries import all_queries
    from pasardassist_spark.tables import load

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pasardassist-cold")
    qs = all_queries()

    load(spark, sf_dir, "lineitem").count()
    from pyspark.sql import functions as F

    def _noop_pandas(batches):
        for pdf in batches:
            yield pdf

    spark.range(256).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).select(F.col("id")).mapInPandas(_noop_pandas, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    def _clear() -> None:
        try:
            from pasardassist_spark.caching import release_all

            release_all(spark)
        except Exception:
            spark.catalog.clearCache()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    control = None
    for pass_i in range(3):
        for name in ["q1_pricing_summary"] + names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if pass_i == 0:
                if name == "q1_pricing_summary":
                    control = dt
                else:
                    cold[name] = dt
            elif name != "q1_pricing_summary":
                warm[name] = min(warm.get(name, dt), dt)
            _clear()

    print(json.dumps({"cold": cold, "warm": warm, "control": control}))
    spark.stop()


if __name__ == "__main__":
    main()
