"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.

At 100 TB these would be partitioned tables (bronze partitioned by
chain/date in the reference domain — SURVEY.md §1.4); here each is a single
parquet file, but every query still goes through ``load`` so the scan layer
is one swap away from a catalog/Delta table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_SHIPPED_APPS: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``pasardassist_spark`` importable on Python workers regardless of
    the driver process's cwd/PYTHONPATH: mapInPandas closures reference
    module-level helpers (pickled by reference), so workers must be able to
    import the package. Zips the package once per session and addPyFile()s
    it — the Spark-idiomatic dependency shipping path, same as on a real
    cluster."""
    app = spark.sparkContext.applicationId
    if app in _SHIPPED_APPS:
        return
    import tempfile
    import zipfile

    pkg = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg)
    fd, zpath = tempfile.mkstemp(prefix="pasardassist_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED_APPS.add(app)


# Payload tables feeding per-row CPU-heavy operators (shingling, hashing,
# vector math, pandas stages): fanning these out pays for its shuffle many
# times over. Measure tables (lineitem/orders/events) are NOT fanned out —
# their queries are scan -> partial-agg shapes where map-side combine before
# the first shuffle is the whole optimization, and an injected repartition
# would trade it for a full-row shuffle. Dims are broadcast-joined and must
# never be repartitioned.
_FANOUT_TABLES = {"documents", "embeddings"}

_SPLIT_CACHE: dict[str, int] = {}


def _max_scan_tasks(path: str) -> int:
    """Upper bound on scan parallelism for a single parquet file: Spark
    assigns one task per row group (footer metadata read only, no job)."""
    if path not in _SPLIT_CACHE:
        try:
            import pyarrow.parquet as pq

            _SPLIT_CACHE[path] = pq.ParquetFile(path).num_row_groups
        except Exception:
            _SPLIT_CACHE[path] = 1 << 30  # unknown layout: assume parallel
    return _SPLIT_CACHE[path]


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP regardless of how the
    parquet generation encoded it.

    Known encodings across driver testdata generations:
    - TIMESTAMP(NANOS), surfaced as ``bigint`` nanos under
      ``spark.sql.legacy.parquet.nanosAsLong`` — values are
      microsecond-aligned so ``timestamp_micros(ts div 1000)`` is lossless;
    - plain ``timestamp[us]`` / ``timestamp_ntz`` — already event time,
      pass through untouched.

    A schema-drifted upstream silently corrupting event time is a
    catastrophic bug at lake scale, so the conversion is keyed off the
    *loaded* dtype, never assumed.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dtype == "timestamp_ntz":
        # Downstream code (windows, watermarks, oracles) expects a plain
        # TIMESTAMP; values are wall-clock UTC either way in this dataset.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    elif dtype != "timestamp":
        # A new upstream encoding must be added here DELIBERATELY — the r4
        # incident was exactly a drifted encoding flowing through silently
        # and corrupting every event-time result downstream.
        raise TypeError(
            f"events.ts has unrecognized dtype {dtype!r}; expected one of "
            "bigint (TIMESTAMP(NANOS) under nanosAsLong), timestamp, "
            "timestamp_ntz. Refusing to guess an event-time conversion."
        )
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ship_package(spark)
    # Prefer the prepared bucketed silver layout (sources/lake.py) over the
    # plain parquet dir: same rows, but the scan carries hash-partitioning
    # metadata that makes the dominant joins Exchange-free. Only substituted
    # when prepare_silver(make_default=True) ran for THIS sf_dir.
    from pasardassist_spark.sources import lake

    silver = lake.silver_table_for(spark, name, sf_dir)
    if silver is not None:
        return spark.table(silver)
    if name == "events":
        # Some generations of events.parquet carry TIMESTAMP(NANOS); Spark
        # refuses that type unless nanosAsLong is set. Harmless for files
        # that encode ts as timestamp[us]. The driver's harness builds its
        # own SparkSession (not via session.get_spark), so set it here at
        # the scan layer — it is runtime-settable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_time(df)
    if name in _FANOUT_TABLES:
        # The driver testdata is one single-row-group file per table, so the
        # whole map side (scan -> explode -> hash -> partial agg) would run
        # as ONE task. Fan out when — and only when — the file layout cannot
        # feed the cores; on a real lake (many files/row groups) this is a
        # no-op, so no extra shuffle exists at scale. Catalyst pushes
        # filters and column pruning below the repartition, so the shuffle
        # carries pruned, filtered rows only.
        target = spark.sparkContext.defaultParallelism
        if _max_scan_tasks(f"{sf_dir}/{name}.parquet") < target:
            df = df.repartition(target)
            if name == "documents":
                # Pushdown fence (r19, measured): Catalyst pushes every
                # deterministic filter BELOW this repartition, so a query
                # gating on a heavy text expression (quality score, the
                # char-trigram language model, tokenize-and-count) ran
                # that expression inside the ONE scan task the single-
                # row-group file allows — serializing exactly the work
                # the fan-out exists to spread (curate_corpus: 2.2 s ->
                # 0.9 s warm at 32c once fenced). A filter on
                # spark_partition_id() is always true (ids are
                # non-negative), deterministic in value, and — being
                # formally non-deterministic to the optimizer — blocks
                # predicate pushdown through it while leaving column
                # pruning intact (verified: the scan still reads only
                # referenced columns). Nothing useful is lost below: a
                # single-row-group parquet file cannot row-group-prune,
                # and this branch does not exist on a real multi-file
                # lake. Scoped to documents: its consumers gate on heavy
                # text math; embeddings filters are cheap id predicates
                # that benefit from staying at the scan.
                df = df.filter(F.spark_partition_id() >= 0)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
