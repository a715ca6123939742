"""Z-order (Morton curve) clustering for multi-column data skipping.

A parquet scan prunes row groups by min/max stats. Sorting the file by one
column gives perfect pruning on that column and none on any other; the
Morton curve interleaves the bits of several columns so that rows close in
EVERY dimension land close in the file — a range predicate on any subset
of the z-ordered columns then overlaps few row groups (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout, re-expressed as plain Spark expressions).

All bit math is built-in shift/mask expressions (codegen'd, no UDF); the
sort is Spark's regular range-partitioned global sort. At 100 TB this is
a per-partition rewrite job: z-sort WITHIN each date partition, so the
sort never globalizes across the retention axis.

Pruning efficacy (z-order beats single-column sort on 2-dim predicates)
is asserted against real parquet row-group stats in tests/test_lake.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(
    cols: list[Column],
    bits: int = 16,
    ranges: list[tuple[float, float]] | None = None,
) -> Column:
    """Morton-interleave the low ``bits`` of each (non-negative integer)
    column into one LONG sort key. Column i's bit b lands at position
    b * n_cols + i — round-robin interleave, most-significant bits
    dominate equally for every column. n_cols * bits must be <= 63.

    Values are clamped into [0, 2^bits) (capped, not wrapped: out-of-range
    values keep their ordering at the top instead of aliasing to 0).

    ``ranges`` (one ``(lo, hi)`` per column) affinely rescales each column
    onto the FULL ``bits`` width before interleaving. Without it, a
    narrow-domain column (say 5 significant bits) contributes constant
    zeros in its high bits and the wide column's high bits dominate the
    curve — the file then clusters by the wide column only and stats-based
    skipping on the narrow column collapses. Rescaling is what makes the
    curve's equal-weight property hold for real data; it is the
    min/max-normalization step of Delta/Iceberg ``OPTIMIZE ZORDER BY``
    (their implementations rank- or range-normalize for the same reason).
    Rescaling may merge distinct values into one bucket when the domain
    is wider than 2^bits or non-uniformly spaced — that only coarsens
    layout granularity (the z-key is a sort key, not an identifier);
    distinct values are guaranteed distinct buckets only for integer
    domains spanning at most 2^bits consecutive values."""
    n = len(cols)
    if ranges is not None:
        if len(ranges) != n:
            raise ValueError("ranges must align 1:1 with cols")
        top = float((1 << bits) - 1)
        scaled = []
        for c, (lo, hi) in zip(cols, ranges):
            span = float(hi) - float(lo)
            if span <= 0:  # constant column: every row maps to 0
                scaled.append(F.lit(0).cast("long"))
            else:
                scaled.append(
                    F.floor(
                        (c.cast("double") - F.lit(float(lo)))
                        * F.lit(top / span)
                    )
                )
        cols = scaled
    if n < 1:
        raise ValueError("need at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cap = F.lit((1 << bits) - 1)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = F.least(F.greatest(c.cast("long"), F.lit(0)), cap)
        for b in range(bits):
            z = z + (
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
                ).cast("long")
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[Column],
    bits: int = 16,
    n_files: int = 20,
    manifest_cols: list[str] | None = None,
) -> None:
    """Write ``df`` z-clustered: range-partition on the Morton key into
    ``n_files`` z-contiguous files, sorted within each (explicit
    repartitionByRange — AQE would otherwise coalesce a small sort into
    one file and erase the stats granularity). File/row-group count
    trades stats granularity against footer overhead; on a real lake
    n_files follows the partition's data volume.

    Each column is min/max-normalized onto the full bit width first (one
    metadata-cheap agg job — parquet footers already carry the min/max on
    a real lake), so mismatched column domains cannot let one column
    dominate the curve (see ``zorder_value``).

    ``manifest_cols`` additionally publishes the zone-map manifest
    (sources/manifest.py) over the z-clustered files, so scans prune the
    FILE list at plan time on top of the row-group skipping the footers
    provide — the z-order + manifest pairing is exactly OPTIMIZE ZORDER
    BY + data-skipping stats in the table formats."""
    stats = df.agg(
        *[
            f(c.cast("double")).alias(f"{tag}{i}")
            for i, c in enumerate(cols)
            for tag, f in (("lo", F.min), ("hi", F.max))
        ]
    ).first()
    # Empty input or an all-NULL column yields None stats: map such
    # columns to a degenerate (0, 0) range (every row -> bucket 0) so
    # the write still succeeds — a per-partition rewrite job must not
    # die on its first empty partition.
    ranges = [
        (stats[f"lo{i}"], stats[f"hi{i}"])
        if stats[f"lo{i}"] is not None
        else (0.0, 0.0)
        for i in range(len(cols))
    ]
    (
        df.withColumn("_z", zorder_value(cols, bits, ranges=ranges))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )
    if manifest_cols:
        from pasardassist_spark.sources.manifest import _publish_manifest

        _publish_manifest(path, manifest_cols)


def rowgroups_overlapping(
    path: str, preds: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(matching, total) parquet row groups whose [min, max] stats overlap
    EVERY predicate range — the skip decision a stats-based reader makes.
    Test/inspection helper (pyarrow footer read, driver-side)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    match = total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats = {}
            for c in range(rg.num_columns):
                col = rg.column(c)
                name = col.path_in_schema
                # statistics can exist with has_min_max=False (e.g. binary
                # columns past the stats size cap) — min/max would be None
                # and the range test below would TypeError on comparison.
                if col.statistics is not None and col.statistics.has_min_max:
                    stats[name] = (col.statistics.min, col.statistics.max)
            total += 1
            ok = True
            for name, (lo, hi) in preds.items():
                if name not in stats:
                    continue
                mn, mx = stats[name]
                if mx < lo or mn > hi:
                    ok = False
                    break
            if ok:
                match += 1
    return match, total
