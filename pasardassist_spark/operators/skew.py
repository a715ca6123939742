"""Skew mitigation: salted joins and two-phase argmax (SURVEY.md §4).

The reference domain has guaranteed hot keys — a handful of popular
collections receive most orders/events (the reason its stats job iterates
collections individually). AQE's skew-join splitting handles most shuffle
joins at runtime; these operators cover the two cases it does not:

- ``salted_join``: a fact–dimension join where the dimension is too big to
  broadcast AND a few join keys dominate. The fact side gets a salt in
  [0, n); the dimension is replicated once per salt; joining on
  (key, salt) spreads each hot key over n reducer partitions. Salt values
  are irrelevant to the result (the dimension is complete per salt), so
  non-deterministic salting under task retry is safe — documented
  invariant, tested by equality with the plain join.

- ``salted_latest_per_key``: window-based latest-per-key sends ALL rows of
  a hot key to one task. The two-phase form computes a partial argmax per
  (key, salt) — n small groups instead of one huge one — then the final
  argmax over n partials per key. max_by is associative, so the result is
  exactly latest_per_key's (given a total order), at two cheap shuffles
  instead of one skewed one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``keys`` with hot-key salting. Result
    equals ``fact.join(dim, keys, how)`` for how in (inner, left)."""
    salts = dim.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.crossJoin(F.broadcast(salts))
    return salted_fact.join(replicated_dim, [*keys, "_salt"], how).drop("_salt")


def salted_latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_struct: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Latest row per key via two-phase argmax. ``order_struct`` must be a
    total order (e.g. ``F.struct(ts, event_id)``) — ties would make both
    this and the window form nondeterministic."""
    payload = F.struct(*[F.col(c) for c in df.columns])
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.max_by(payload, order_struct).alias("_row"), F.max(order_struct).alias("_ord")
    )
    final = partial.groupBy(*keys).agg(
        F.max_by(F.col("_row"), F.col("_ord")).alias("_row")
    )
    return final.select("_row.*")
