"""Zone-map manifest: Iceberg/Delta-style file-level min/max pruning
without a table format.

``write_zordered``/``write_bucketed`` produce layouts whose parquet
footers carry tight per-file stats, and ``rowgroups_overlapping`` PROVES
row-group skipping — but an engine reading a 100 TB table should not open
a million footers to plan a scan. A real lake keeps the per-file stats in
a metadata layer (Iceberg manifests, Delta transaction log, Hive
partition catalog) and prunes the FILE LIST before the first byte of data
I/O. This module is that layer in its minimal honest form:

- ``write_with_manifest`` writes the data and then records one JSON
  manifest row per file: row count + [min, max] for the chosen stats
  columns (driver-side pyarrow footer read at WRITE time, once — the cost
  moves out of every future scan);
- ``pruned_files`` intersects predicate ranges against the manifest and
  returns the surviving file list (files without stats for a predicate
  column are conservatively kept);
- ``read_pruned`` scans only the surviving files and re-applies the
  predicate, so pruning is a pure I/O optimization that can never change
  results — the same contract Catalyst's partition pruning has.

Manifest publication is write-then-rename (the data directory is fully
written before ``_manifest.json`` lands, and readers treat a missing
manifest as "no pruning, scan everything"), with the same single-writer
contract as the generational stores. Stats columns must be numeric or
string (parquet footer min/max round-trips through JSON for those types).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_NAME = "_manifest.json"


def write_with_manifest(
    df: DataFrame, path: str, stats_cols: list[str], n_files: int | None = None
) -> None:
    """Write ``df`` as parquet and publish the zone-map manifest for
    ``stats_cols``. Pass ``n_files`` to control stats granularity (more
    files = tighter zones = better pruning, at footer/manifest overhead);
    sort or z-order upstream for the zones to be selective."""
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").parquet(path)
    _publish_manifest(path, stats_cols)


def _publish_manifest(path: str, stats_cols: list[str]) -> None:
    import pyarrow.parquet as pq

    entries = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        stats: dict[str, list] = {}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                col = rg.column(c)
                name = col.path_in_schema
                if name not in stats_cols:
                    continue
                if col.statistics is None or not col.statistics.has_min_max:
                    # one stats-less row group poisons the whole file's
                    # zone for that column — it must be scanned
                    stats[name] = None
                    continue
                mn, mx = col.statistics.min, col.statistics.max
                if isinstance(mn, bytes):
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                if stats.get(name, ...) is None:
                    continue
                if name in stats:
                    stats[name] = [min(stats[name][0], mn), max(stats[name][1], mx)]
                else:
                    stats[name] = [mn, mx]
        entries.append(
            {
                "file": os.path.basename(f),
                "rows": md.num_rows,
                "stats": {k: v for k, v in stats.items() if v is not None},
            }
        )
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"stats_cols": stats_cols, "files": entries}, fh)
    os.rename(tmp, os.path.join(path, MANIFEST_NAME))


def pruned_files(
    path: str, preds: dict[str, tuple]
) -> tuple[list[str], int]:
    """(surviving file paths, total file count) for conjunctive range
    predicates ``{col: (lo, hi)}`` — the planning-time skip. A file
    survives unless SOME predicate range provably misses its zone; files
    with no recorded zone for a predicate column are kept."""
    mf = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mf):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return files, len(files)
    with open(mf) as fh:
        manifest = json.load(fh)
    keep = []
    for entry in manifest["files"]:
        ok = True
        for name, (lo, hi) in preds.items():
            zone = entry["stats"].get(name)
            if zone is None:
                continue
            mn, mx = zone
            if mx < lo or mn > hi:
                ok = False
                break
        if ok:
            keep.append(os.path.join(path, entry["file"]))
    return keep, len(manifest["files"])


def read_pruned(
    spark: SparkSession, path: str, preds: dict[str, tuple]
) -> DataFrame:
    """Scan only the files whose zones can contain the predicate ranges,
    then re-apply the predicates — result-identical to a full scan +
    filter by construction (pruning only ever drops files the predicate
    could not match), with data I/O proportional to the surviving zones.
    An empty survivor list still returns an empty frame with the right
    schema (schema from the directory, zero data reads)."""
    files, _total = pruned_files(path, preds)
    if files:
        df = spark.read.parquet(*files)
    else:
        df = spark.read.parquet(path).limit(0)
    for name, (lo, hi) in preds.items():
        df = df.filter(F.col(name).between(lo, hi))
    return df
