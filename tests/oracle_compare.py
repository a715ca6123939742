"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
then compares row count, column-name set, and the order-insensitive multiset
of row values. Comparison is strict: floats must match to 1e-12 relative
(the decimal-exact patterns in the queries are designed to make them
bit-identical; the tolerance only absorbs float-repr noise in pandas
round-trips).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pasardassist_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9) if abs(v) < 1e6 else round(v, 4))
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(v))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = run_oracle(sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    g, w = _canon(got), _canon(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs (spark, oracle): {diffs}")
