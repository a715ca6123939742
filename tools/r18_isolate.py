"""Round-18 isolated re-measure runner (the round-15 A/B protocol plus the
r17 persist-hygiene fix bench.py carries).

One invocation = one fresh JVM/SparkSession = one sample:

    python tools/r18_isolate.py <query> [<query> ...]

Prints one JSON line {"timings": {name: sec}, "control": q1_sec}. Mirrors
bench.py exactly: lineitem warmup + Python worker pool spin-up + one
sf0.001 codegen warmup, per-query noop sink, min-of-2 within the session,
and — the r18 addition — ``spark.catalog.clearCache()`` between entries so
a persisting query cannot shadow-tax its successors (the round15_ab tool
predates that fix; its multi-query sessions showed the q1 control itself
doubling from cache crowding).
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
    spark = get_spark("pasardassist-isolate")
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

    timings: dict[str, float] = {}
    for _ in range(2):
        for name in ["q1_pricing_summary"] + names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            spark.catalog.clearCache()

    control = timings.pop("q1_pricing_summary")
    print(json.dumps({"timings": timings, "control": control}))
    spark.stop()


if __name__ == "__main__":
    main()
