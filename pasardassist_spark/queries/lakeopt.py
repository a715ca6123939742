"""Lake-layout optimization operators: Z-order (Morton) clustering keys
and the min/max data-skipping effectiveness readout they exist for.

At 100 TB the cheapest scan is the one that never happens: engines prune
parquet files whose footer min/max stats exclude the predicate.  A table
written in insertion order has every file span the whole custkey range
(nothing prunes); sorting by one column fixes that column and ruins every
other; Z-ORDER interleaving keeps files rectangular in BOTH dimensions —
the Delta/Iceberg OPTIMIZE ZORDER primitive, re-expressed here as plain
column arithmetic so Catalyst folds the unrolled bit interleave into one
codegen span and the layout job is a single scan + write.

Quantization is value-linear off a 1-row min/max broadcast (NOT a global
rank/ntile sort — a streaming writer can't total-order 100 TB, and the
skipping readout only needs rectangles, not equi-depth).  All arithmetic
is exact BIGINT; both engines evaluate the identical unrolled expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pasardassist_spark.queries.registry import query
from pasardassist_spark.tables import load

# 8 bits per dimension -> 16-bit Morton code; plenty for file-level
# (not row-level) clustering: 2^16 cells map onto ~64-4096 files.
Z_BITS = 8
N_FILES = 64

# The fixed audit predicates: a 10%-wide band in each dimension.
CK_BAND = (0.45, 0.55)
DT_BAND = (0.45, 0.55)


def _morton_sql(qx: str, qy: str) -> str:
    """Bit-interleave two {Z_BITS}-bit SQL expressions (x even lanes)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({qx} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({qy} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _morton_col(qx: Column, qy: Column) -> Column:
    """The same unrolled interleave as a Spark Column (integer div/mod,
    exact BIGINT, constant-folded into one codegen expression)."""
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = z + ((qx / (1 << i)).cast("long") % 2) * (1 << (2 * i))
        z = z + ((qy / (1 << i)).cast("long") % 2) * (1 << (2 * i + 1))
    return z


_Q_SQL = """
    o AS (
        SELECT o_orderkey, o_custkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS dt
        FROM orders
    ),
    b AS (
        SELECT CAST(min(o_custkey) AS BIGINT) AS ck_lo,
               CAST(max(o_custkey) AS BIGINT) AS ck_hi,
               min(dt) AS dt_lo, max(dt) AS dt_hi,
               CAST(min(o_orderkey) AS BIGINT) AS ok_lo,
               CAST(max(o_orderkey) AS BIGINT) AS ok_hi
        FROM o
    ),
    q AS (
        SELECT o.o_orderkey, o.o_custkey, o.dt,
               (({nq} * (o.o_custkey - b.ck_lo))
                // (b.ck_hi - b.ck_lo + 1)) AS qx,
               (({nq} * (o.dt - b.dt_lo))
                // (b.dt_hi - b.dt_lo + 1)) AS qy,
               b.ck_lo, b.ck_hi, b.dt_lo, b.dt_hi, b.ok_lo, b.ok_hi
        FROM o CROSS JOIN b
    )
""".replace("{nq}", str(1 << Z_BITS))


@query(
    "lake_zorder_layout",
    oracle=f"""
    WITH {_Q_SQL},
    z AS (
        SELECT {_morton_sql('qx', 'qy')} AS morton, o_custkey, dt
        FROM q
    ),
    f AS (
        SELECT morton // {(1 << (2 * Z_BITS)) // N_FILES} AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(max(o_custkey) - min(o_custkey) AS BIGINT) AS ck_span,
               max(dt) - min(dt) AS dt_span
        FROM z GROUP BY 1
    )
    SELECT CAST(file_id AS INTEGER) AS file_id, n_rows, ck_span, dt_span
    FROM f
    """,
)
def lake_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys for orders on (o_custkey, o_orderdate):
    quantize each dimension to {Z_BITS} bits off a 1-row min/max
    broadcast, bit-interleave into a 16-bit Morton code, route rows to
    {N_FILES} files by Morton range, and report each file's row count
    plus its custkey/date spans — the min/max footer stats an engine
    would prune on.  Every file covers ~1/sqrt(files) of EACH dimension
    (the Z-curve rectangle property) instead of one file spanning
    everything.

    Spark plan: scan + 1-row bounds broadcast + one hash aggregate on
    file_id — the interleave is pure integer column arithmetic inside
    one WholeStageCodegen span (no sort, no window; a layout writer at
    100 TB would repartitionByRange on this same key).  Exact BIGINT
    end to end."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("dt"),
    )
    b = o.agg(
        F.min("o_custkey").cast("long").alias("ck_lo"),
        F.max("o_custkey").cast("long").alias("ck_hi"),
        F.min("dt").alias("dt_lo"),
        F.max("dt").alias("dt_hi"),
    )
    nq = 1 << Z_BITS
    q = o.crossJoin(F.broadcast(b)).select(
        "o_custkey",
        "dt",
        F.floor(
            (nq * (F.col("o_custkey") - F.col("ck_lo")))
            / (F.col("ck_hi") - F.col("ck_lo") + 1)
        ).alias("qx"),
        F.floor(
            (nq * (F.col("dt") - F.col("dt_lo")))
            / (F.col("dt_hi") - F.col("dt_lo") + 1)
        ).alias("qy"),
    )
    z = q.select(
        _morton_col(F.col("qx"), F.col("qy")).alias("morton"),
        "o_custkey",
        "dt",
    )
    per_file = (1 << (2 * Z_BITS)) // N_FILES
    f = z.groupBy(
        F.floor(F.col("morton") / per_file).alias("file_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.max("o_custkey") - F.min("o_custkey")).cast("long").alias("ck_span"),
        (F.max("dt") - F.min("dt")).alias("dt_span"),
    )
    return f.select(
        F.col("file_id").cast("int").alias("file_id"),
        "n_rows",
        "ck_span",
        "dt_span",
    )


_LAYOUT_SQL = f"""
    z AS (
        SELECT o_orderkey, o_custkey, dt,
               ck_lo, ck_hi, dt_lo, dt_hi,
               {_morton_sql('qx', 'qy')}
                   // {(1 << (2 * Z_BITS)) // N_FILES} AS zorder,
               ({N_FILES} * (o_orderkey - ok_lo)) // (ok_hi - ok_lo + 1)
                   AS linear,
               ({N_FILES} * (o_custkey - ck_lo)) // (ck_hi - ck_lo + 1)
                   AS bycust
        FROM q
    ),
    lay AS (
        SELECT 'linear' AS layout, linear AS file_id, o_custkey, dt,
               ck_lo, ck_hi, dt_lo, dt_hi FROM z
        UNION ALL
        SELECT 'bycust', bycust, o_custkey, dt,
               ck_lo, ck_hi, dt_lo, dt_hi FROM z
        UNION ALL
        SELECT 'zorder', zorder, o_custkey, dt,
               ck_lo, ck_hi, dt_lo, dt_hi FROM z
    ),
    stats AS (
        SELECT layout, file_id,
               CAST(min(o_custkey) AS BIGINT) AS ck_min,
               CAST(max(o_custkey) AS BIGINT) AS ck_max,
               min(dt) AS dt_min, max(dt) AS dt_max,
               max(ck_lo) AS ck_lo, max(ck_hi) AS ck_hi,
               max(dt_lo) AS dt_lo, max(dt_hi) AS dt_hi
        FROM lay GROUP BY layout, file_id
    )
"""


@query(
    "lake_skipping_effectiveness",
    oracle=f"""
    WITH {_Q_SQL},
    {_LAYOUT_SQL}
    SELECT layout, predicate,
           CAST(SUM(hit) AS BIGINT) AS files_hit,
           CAST(COUNT(*) AS BIGINT) AS files_total
    FROM (
        SELECT layout, 'ck_band' AS predicate,
               CASE WHEN ck_max >= ck_lo + CAST(floor({CK_BAND[0]}
                        * (ck_hi - ck_lo)) AS BIGINT)
                     AND ck_min <= ck_lo + CAST(floor({CK_BAND[1]}
                        * (ck_hi - ck_lo)) AS BIGINT)
                    THEN 1 ELSE 0 END AS hit
        FROM stats
        UNION ALL
        SELECT layout, 'dt_band',
               CASE WHEN dt_max >= dt_lo + CAST(floor({DT_BAND[0]}
                        * (dt_hi - dt_lo)) AS BIGINT)
                     AND dt_min <= dt_lo + CAST(floor({DT_BAND[1]}
                        * (dt_hi - dt_lo)) AS BIGINT)
                    THEN 1 ELSE 0 END
        FROM stats
    ) AS hits
    GROUP BY layout, predicate
    """,
)
def lake_skipping_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many of {N_FILES} files must a min/max-pruning scan read for
    a 10%-wide predicate band, under three write layouts of the SAME
    rows: insertion order (``linear`` — every file spans everything,
    nothing prunes), single-column sort (``bycust`` — perfect on the
    custkey band, useless on the date band), and ``zorder`` (good on
    BOTH).  This is the audit a lake OPTIMIZE decision is made from;
    the Morton layout's hit counts ~ sqrt(files) per dimension are the
    whole reason lake_zorder_layout exists.

    Spark plan: the three file assignments are pure column arithmetic
    over one scan (+ the 1-row bounds broadcast), a 3-way unioned
    file-grain aggregate ({N_FILES}x3 rows — metadata-scale), then the
    predicate-overlap CASE on that tiny frame.  Exact integers end to
    end; the oracle replays the identical arithmetic."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("dt"),
    )
    b = o.agg(
        F.min("o_custkey").cast("long").alias("ck_lo"),
        F.max("o_custkey").cast("long").alias("ck_hi"),
        F.min("dt").alias("dt_lo"),
        F.max("dt").alias("dt_hi"),
        F.min("o_orderkey").cast("long").alias("ok_lo"),
        F.max("o_orderkey").cast("long").alias("ok_hi"),
    )
    nq = 1 << Z_BITS
    per_file = (1 << (2 * Z_BITS)) // N_FILES
    q = o.crossJoin(F.broadcast(b))
    qx = F.floor(
        (nq * (F.col("o_custkey") - F.col("ck_lo")))
        / (F.col("ck_hi") - F.col("ck_lo") + 1)
    )
    qy = F.floor(
        (nq * (F.col("dt") - F.col("dt_lo")))
        / (F.col("dt_hi") - F.col("dt_lo") + 1)
    )
    z = q.select(
        "o_custkey",
        "dt",
        "ck_lo", "ck_hi", "dt_lo", "dt_hi",
        F.floor(_morton_col(qx, qy) / per_file).alias("zorder"),
        F.floor(
            (N_FILES * (F.col("o_orderkey") - F.col("ok_lo")))
            / (F.col("ok_hi") - F.col("ok_lo") + 1)
        ).alias("linear"),
        F.floor(
            (N_FILES * (F.col("o_custkey") - F.col("ck_lo")))
            / (F.col("ck_hi") - F.col("ck_lo") + 1)
        ).alias("bycust"),
    )
    keep = ["o_custkey", "dt", "ck_lo", "ck_hi", "dt_lo", "dt_hi"]
    lay = (
        z.select(F.lit("linear").alias("layout"), F.col("linear").alias("file_id"), *keep)
        .unionByName(
            z.select(F.lit("bycust").alias("layout"), F.col("bycust").alias("file_id"), *keep)
        )
        .unionByName(
            z.select(F.lit("zorder").alias("layout"), F.col("zorder").alias("file_id"), *keep)
        )
    )
    stats = lay.groupBy("layout", "file_id").agg(
        F.min("o_custkey").cast("long").alias("ck_min"),
        F.max("o_custkey").cast("long").alias("ck_max"),
        F.min("dt").alias("dt_min"),
        F.max("dt").alias("dt_max"),
        F.max("ck_lo").alias("ck_lo"),
        F.max("ck_hi").alias("ck_hi"),
        F.max("dt_lo").alias("dt_lo"),
        F.max("dt_hi").alias("dt_hi"),
    )
    ck_band_lo = F.col("ck_lo") + F.floor(
        CK_BAND[0] * (F.col("ck_hi") - F.col("ck_lo"))
    ).cast("long")
    ck_band_hi = F.col("ck_lo") + F.floor(
        CK_BAND[1] * (F.col("ck_hi") - F.col("ck_lo"))
    ).cast("long")
    dt_band_lo = F.col("dt_lo") + F.floor(
        DT_BAND[0] * (F.col("dt_hi") - F.col("dt_lo"))
    ).cast("long")
    dt_band_hi = F.col("dt_lo") + F.floor(
        DT_BAND[1] * (F.col("dt_hi") - F.col("dt_lo"))
    ).cast("long")
    hits = stats.select(
        "layout",
        F.lit("ck_band").alias("predicate"),
        F.when(
            (F.col("ck_max") >= ck_band_lo) & (F.col("ck_min") <= ck_band_hi),
            1,
        ).otherwise(0).alias("hit"),
    ).unionByName(
        stats.select(
            "layout",
            F.lit("dt_band").alias("predicate"),
            F.when(
                (F.col("dt_max") >= dt_band_lo)
                & (F.col("dt_min") <= dt_band_hi),
                1,
            ).otherwise(0).alias("hit"),
        )
    )
    return hits.groupBy("layout", "predicate").agg(
        F.sum("hit").cast("long").alias("files_hit"),
        F.count(F.lit(1)).cast("long").alias("files_total"),
    )
