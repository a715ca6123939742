"""Scalar-function property tests — uint256 hex beyond the 64-bit conv path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pasardassist_spark.functions.chain import uint256_hex, uint256_hex_wide


@given(
    ids=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=2**64 - 1),
            st.integers(min_value=2**63, max_value=2**256 - 1),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(deadline=None, max_examples=12, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_uint256_hex_wide_matches_python(spark, ids):
    df = spark.createDataFrame([(str(v),) for v in ids], "id string")
    got = [r.h for r in df.select(uint256_hex_wide("id").alias("h")).collect()]
    want = [format(v, "x") for v in ids]
    assert got == want


def test_narrow_and_wide_agree_below_2_63(spark):
    vals = [0, 1, 255, 2**53, 2**63 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "id long")
    narrow = [r.h for r in df.select(uint256_hex("id").alias("h")).collect()]
    wide = [r.h for r in df.select(uint256_hex_wide("id").alias("h")).collect()]
    assert narrow == wide == [format(v, "x") for v in vals]
