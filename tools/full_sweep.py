"""Full-registry oracle sweep — the builder-side superset of the driver's
50-entry correctness window (VERDICT r15 task 5).

The per-round driver gate re-checks only DRIVER_WINDOW entries; everything
else rests on its archived green row plus pytest. This tool re-runs EVERY
registered query against its DuckDB oracle (tests/oracle_compare, the exact
driver-mirror check) at one or more scale factors and records a committed
artifact (SWEEP_r{N}.json), so each round carries a fresh 287/287 proof
instead of an r6-era one.

Usage:
    python tools/full_sweep.py SWEEP_r16.json [sf_dir ...]
    # default sf_dirs: /root/testdata/sf0.01 /root/testdata/sf0.1

Rows-only entries (no oracle SQL) get the driver's weaker check: the query
runs and its row count and schema are recorded. Results stream to
<out>.jsonl as they finish, so a crashed sweep keeps its partial record;
the final JSON summarizes red names first.
"""

from __future__ import annotations

import json
import sys
import time
import traceback


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "SWEEP.json"
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    sys.path.insert(0, "/root/repo")
    from pasardassist_spark import get_spark
    from pasardassist_spark.queries.registry import REGISTRY, _load_all
    from tests.oracle_compare import assert_matches_oracle

    _load_all()
    spark = get_spark(app_name="full-sweep")
    names = sorted(REGISTRY)
    results: dict[str, dict] = {}
    jsonl = open(out + ".jsonl", "w")
    t_start = time.time()
    for i, name in enumerate(names, 1):
        spec = REGISTRY[name]
        row: dict = {"oracle": bool(spec.oracle)}
        for sf_dir in sf_dirs:
            sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
            t0 = time.time()
            try:
                df = spec.fn(spark, sf_dir)
                if spec.oracle:
                    assert_matches_oracle(df, spec.oracle, sf_dir, name=name)
                    row[sf] = {"ok": True, "mode": "hash"}
                else:
                    n = df.count()
                    row[sf] = {"ok": True, "mode": "rows_only", "rows": n}
            except Exception as ex:  # noqa: BLE001 - recorded, not raised
                row[sf] = {
                    "ok": False,
                    "err": f"{type(ex).__name__}: {ex}"[:500],
                    "trace": traceback.format_exc()[-1500:],
                }
            row[sf]["sec"] = round(time.time() - t0, 2)
        results[name] = row
        jsonl.write(json.dumps({"name": name, **row}) + "\n")
        jsonl.flush()
        status = "ok" if all(
            v.get("ok") for k, v in row.items() if isinstance(v, dict)
        ) else "RED"
        print(f"[{i}/{len(names)}] {name}: {status}", flush=True)
    jsonl.close()

    red = sorted(
        n for n, row in results.items()
        if not all(v.get("ok") for k, v in row.items() if isinstance(v, dict))
    )
    n_oracle = sum(1 for r in results.values() if r["oracle"])
    summary = {
        "sf_dirs": sf_dirs,
        "total": len(results),
        "oracle_backed": n_oracle,
        "rows_only": len(results) - n_oracle,
        "red": red,
        "green": len(results) - len(red),
        "wall_sec": round(time.time() - t_start, 1),
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"\nSWEEP: {summary['green']}/{summary['total']} green "
        f"({n_oracle} oracle-backed), {len(red)} red -> {out}"
    )
    if red:
        print("RED:", red)
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
