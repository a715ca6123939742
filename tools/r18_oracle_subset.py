"""Targeted oracle re-check for queries touched by an optimization.

    python tools/r18_oracle_subset.py <query> [<query> ...] [--sf <dir> ...]

Runs each named registered query and diffs it against its DuckDB oracle
via tests.oracle_compare (the exact driver-mirror check) at each sf dir
(default sf0.01 and sf0.1). Rows-only entries (no oracle SQL) report the
row count only. Exits non-zero on any mismatch.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dirs: list[str] = []
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dirs.append(next(it))
        else:
            names.append(a)
    if not sf_dirs:
        sf_dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from pasardassist_spark import get_spark
    from pasardassist_spark.queries.registry import REGISTRY, _load_all
    from tests import oracle_compare as oc

    _load_all()
    spark = get_spark("r18-oracle-subset")
    failed = []
    for sf_dir in sf_dirs:
        for name in names:
            entry = REGISTRY[name]
            fn, sql = entry.fn, entry.oracle
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                if sql:
                    oc.assert_matches_oracle(df, sql, sf_dir, name=name)
                    status = "match"
                else:
                    status = f"rows_only n={df.count()}"
            except Exception as e:  # noqa: BLE001
                status = f"FAIL: {e}"
                failed.append((sf_dir, name))
            finally:
                spark.catalog.clearCache()
            dt = time.perf_counter() - t0
            print(f"{sf_dir} {name}: {status} ({dt:.1f}s)", flush=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
