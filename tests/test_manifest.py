"""Zone-map manifest: planning-time file pruning must be result-identical
to a full scan + filter, actually skip files on selective ranges over a
sorted layout, stay conservative without stats, and degrade to
scan-everything when no manifest exists."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pasardassist_spark.sources.manifest import (
    MANIFEST_NAME,
    pruned_files,
    read_pruned,
    write_with_manifest,
)
from pasardassist_spark.tables import load


def _sorted_rows(df):
    return sorted(map(str, df.collect()))


def test_pruned_scan_result_identical_and_skips_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_zoned")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # range-sorted layout => tight disjoint zones per file
    (
        o.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(path)
    )
    from pasardassist_spark.sources.manifest import _publish_manifest

    _publish_manifest(path, ["o_totalprice"])

    preds = {"o_totalprice": (50_000.0, 60_000.0)}
    files, total = pruned_files(path, preds)
    assert total == 8
    assert 0 < len(files) < total  # selective range must skip files

    got = read_pruned(spark, path, preds)
    want = spark.read.parquet(path).filter(
        F.col("o_totalprice").between(*preds["o_totalprice"])
    )
    assert _sorted_rows(got) == _sorted_rows(want)
    assert want.count() > 0

    # a range outside every zone: zero files read, empty result, schema kept
    none_files, _ = pruned_files(path, {"o_totalprice": (1e12, 2e12)})
    assert none_files == []
    empty = read_pruned(spark, path, {"o_totalprice": (1e12, 2e12)})
    assert empty.count() == 0
    assert empty.columns == want.columns


def test_write_with_manifest_and_missing_stats_conservative(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("v")
    )
    write_with_manifest(df, path, ["k"], n_files=4)
    mf = json.load(open(os.path.join(path, MANIFEST_NAME)))
    assert len(mf["files"]) == 4
    assert all("k" in e["stats"] for e in mf["files"])

    # predicate on a column with no recorded zone => every file kept
    files, total = pruned_files(path, {"v": (3, 3)})
    assert len(files) == total == 4
    got = read_pruned(spark, path, {"v": (3, 3)})
    assert got.count() == 100

    # no manifest at all => scan everything, never fewer files
    os.remove(os.path.join(path, MANIFEST_NAME))
    files, total = pruned_files(path, {"k": (0, 1)})
    assert len(files) == total == 4


def test_manifest_string_zones(spark, tmp_path):
    path = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(c * 3,) for c in "abcdefgh"], "name string"
    ).repartitionByRange(4, "name").sortWithinPartitions("name")
    df.write.mode("overwrite").parquet(path)
    from pasardassist_spark.sources.manifest import _publish_manifest

    _publish_manifest(path, ["name"])
    files, total = pruned_files(path, {"name": ("aaa", "bbb")})
    assert 0 < len(files) < total
    got = read_pruned(spark, path, {"name": ("aaa", "bbb")})
    assert {r.name for r in got.collect()} == {"aaa", "bbb"}


def test_zorder_write_publishes_manifest_and_prunes_both_dims(spark, sf_dir, tmp_path):
    """write_zordered(manifest_cols=...) pairs z-clustering with the
    zone-map: a 2-dim box predicate must skip FILES via the manifest on
    BOTH dimensions (single-column sorting could only zone one)."""
    from pasardassist_spark.operators.zorder import write_zordered

    path = str(tmp_path / "z")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_zordered(
        o, path,
        [F.col("o_custkey"), F.col("o_totalprice")],
        n_files=16,
        manifest_cols=["o_custkey", "o_totalprice"],
    )
    lo_c, hi_c = 100, 200
    lo_p, hi_p = 50_000.0, 80_000.0
    preds = {"o_custkey": (lo_c, hi_c), "o_totalprice": (lo_p, hi_p)}
    files, total = pruned_files(path, preds)
    assert total == 16
    assert len(files) < total  # the 2-dim box prunes files, not just row groups
    got = read_pruned(spark, path, preds)
    want = spark.read.parquet(path).filter(
        F.col("o_custkey").between(lo_c, hi_c)
        & F.col("o_totalprice").between(lo_p, hi_p)
    )
    assert _sorted_rows(got) == _sorted_rows(want)
