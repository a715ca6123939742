"""Capture .explain('formatted') for registered queries into plans/r18/.

    python tools/r18_plan.py <suffix> <query> [<query> ...]

Writes plans/r18/<query>_<suffix>.txt for each query (suffix: before/after).
Uses sf0.1 by default ($SPARK_GRAFT_SF_DIR overrides).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pasardassist_spark import get_spark
    from pasardassist_spark.queries.registry import REGISTRY, _load_all

    _load_all()
    spark = get_spark("r19-plan")
    os.makedirs(os.path.join(REPO, "plans", "r19"), exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(REPO, "plans", "r19", f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
