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


def test_driver_window_covers_unverified_entries():
    """Registry hygiene guard (round-2 lesson): the driver correctness gate
    checks only the first DRIVER_WINDOW entries of queries(); every entry
    without an archived green driver row (or changed since it) MUST order
    inside that window, or it silently escapes verification."""
    from pasardassist_spark.queries.registry import (
        DRIVER_WINDOW,
        all_queries,
        needs_driver_check,
    )

    names = list(all_queries())
    escaped = [
        n for i, n in enumerate(names) if needs_driver_check(n) and i >= DRIVER_WINDOW
    ]
    assert not escaped, (
        f"{len(escaped)} unverified queries fall outside the driver's "
        f"{DRIVER_WINDOW}-entry window: {escaped}. Either trim the registry "
        "or extend _DRIVER_GREEN only with names that have a green "
        "CORRECTNESS row."
    )


def test_archive_names_exist():
    """Every archived name must still be a registered query (catches renames
    that would silently mark a new query as verified)."""
    from pasardassist_spark.queries.registry import _DRIVER_GREEN, _FORCE_RECHECK

    missing = (_DRIVER_GREEN | _FORCE_RECHECK) - set(REGISTRY)
    assert not missing, f"archived names not in registry: {sorted(missing)}"
