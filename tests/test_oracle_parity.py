"""Differential test: every registered query with an oracle must match DuckDB
on the sf0.001 tables — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from pasardassist_spark.queries.registry import REGISTRY, _load_all

_load_all()
CASES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
NO_ORACLE = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    from tests.oracle_compare import assert_matches_oracle

    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, spec.oracle, sf_dir, name=name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    """Rows-only check for non-SQL-expressible ops (driver's weaker gate)."""
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
