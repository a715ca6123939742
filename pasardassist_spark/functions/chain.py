"""Chain-domain scalar expressions.

- ``uint256_hex``: the reference derives ``tokenIdHex = '0x' + BigInt(id)
  .toString(16)`` (reference src/modules/tasks/sub-tasks.service.ts:84).
  Spark's ``conv`` is 64-bit, fine for ids < 2^63; full uint256 decimal
  strings go through ``uint256_hex_wide`` (Arrow-vectorized pandas UDF,
  property-tested against Python ``hex()`` at 256 bits).
- ``classify_transfer``: the canonical event-classification expression —
  Mint / Burn / Transfer inferred from ``from``/``to`` == the burn address
  (reference src/modules/app/app.service.ts:997-1004, src/constants.ts:2).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F

BURN_ADDRESS = "0x0000000000000000000000000000000000000000"


def uint256_hex(col: Column | str) -> Column:
    """Lower-hex representation of a non-negative integer column (64-bit path).

    For true uint256 decimal-string ids (> 2^63) use a vectorized pandas UDF;
    the driver test ids are all < 2^63 so the JVM-side ``conv`` fast path
    applies and stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.conv(c.cast("string"), 10, 16))


def uint256_hex_wide(col: Column | str) -> Column:
    """Lower-hex for TRUE uint256 decimal-string ids (values >= 2^63).

    Vectorized pandas UDF over the decimal string: Python ints are
    arbitrary-precision, so ``format(int(s), 'x')`` is exact at 256 bits
    where ``conv`` (64-bit) silently wraps. Arrow-batched — the slow path
    is one Python pass over the id column only, never row-at-a-time py4j.
    Use :func:`uint256_hex` when ids are known < 2^63 (stays in codegen).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _hex(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else format(int(v), "x"))

    c = F.col(col) if isinstance(col, str) else col
    return _hex(c.cast("string"))


def classify_transfer(from_col: Column, to_col: Column) -> Column:
    """Mint / Burn / SafeTransferFrom classification (app.service.ts:997-1004)."""
    return (
        F.when(from_col == BURN_ADDRESS, F.lit("Mint"))
        .when(to_col == BURN_ADDRESS, F.lit("Burn"))
        .otherwise(F.lit("SafeTransferFrom"))
    )
