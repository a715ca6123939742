"""Focused pins for the round-19 rewrites: each optimization that changed
an operator's internals gets a brute-force twin here, independent of the
DuckDB oracles (which also re-certify via the driver window).

- minhash_lsh_pairs moved from a bucket self-join (+persist) to
  groupBy + per-bucket pair explode: pin that an m>2 duplicate cluster
  emits ALL m*(m-1)/2 pairs (the explode path's non-trivial case).
- dedup_fuzzy_levenshtein now computes levenshtein once per DISTINCT
  name pair and fans ids back via equi-joins: pin row-set equality
  against the naive brand-blocked predicate computed in Python,
  including duplicate-name (dist-0 diagonal) and symmetric-orientation
  cases.
- mondrian's relaxed validity check was fused into one aggregate
  (sum/count instead of two stacked groupBys): pin the one-side-empty
  edge — a partition whose widest-dimension cut puts every row on one
  side must leaf (old gate: "2 sides present AND min >= k"; new gate:
  sum >= k AND n - sum >= k).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def test_minhash_bucket_explode_emits_full_clusters(spark):
    from pasardassist_spark.operators.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),  # 3-doc exact cluster: every band collides
        (2, base),
        (3, base),
        (4, "one two three four five six seven eight"),
        (5, "completely different words appear in this document here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(df, "text", "doc_id").collect()
    }
    # all 3 pairs of the cluster, nothing across clusters
    assert {(1, 2), (1, 3), (2, 3)} <= got
    assert not any({a, b} & {4, 5} and {a, b} & {1, 2, 3} for a, b in got)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_levenshtein_matches_bruteforce(spark, tmp_path):
    """The distinct-name rewrite must reproduce the naive predicate on a
    frame with heavy name duplication, cross-brand name reuse, and both
    id orientations."""
    from pasardassist_spark.queries.matching import (
        FUZZY_MAX_DIST,
        dedup_fuzzy_levenshtein,
    )

    rows = [
        # (p_partkey, p_brand, p_name)
        (1, "B1", "hot bolt"),
        (2, "B1", "hot bolt"),      # same-name pair (dist 0)
        (3, "B1", "hot gear"),      # dist 4 from "hot bolt"
        (4, "B1", "cold plate"),    # too far from the others
        (5, "B2", "hot bolt"),      # same name, other brand: no cross-brand pair
        (6, "B2", "hot bolts"),     # dist 1
        (7, "B2", "large ring"),
        (8, "B1", "hot boat"),      # dist 2 from "hot bolt"
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_brand": pa.array([r[1] for r in rows]),
            "p_name": pa.array([r[2] for r in rows]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "part.parquet", row_group_size=len(rows))

    expected = set()
    for (ia, ba, na), (ib, bb, nb) in itertools.combinations(rows, 2):
        if ba == bb and _lev(na, nb) <= FUZZY_MAX_DIST:
            lo, hi = min(ia, ib), max(ia, ib)
            expected.add((ba, lo, hi, _lev(na, nb)))
    got = {
        (r.brand, r.id_a, r.id_b, r.dist)
        for r in dedup_fuzzy_levenshtein(spark, str(d)).collect()
    }
    assert got == expected
    spark.catalog.clearCache()


def test_mondrian_one_sided_cut_leafs(spark):
    """A partition whose widest-dimension median cut leaves one side
    empty must become a LEAF (not split) under the relaxed form — the
    exact edge the fused sum/count validity gate must preserve."""
    from pasardassist_spark.operators.mondrian import mondrian_anonymize

    # y is constant => after the first x-cut, any partition where x is
    # also constant can never produce two non-empty sides.
    rows = [(i, 1.0 if i < 8 else 2.0, 5.0) for i in range(16)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    rel = mondrian_anonymize(df, ["x", "y"], k=4)
    out = rel.collect()
    assert len(out) == 16
    sizes = {}
    for r in out:
        sizes.setdefault(r.class_id, 0)
        sizes[r.class_id] += 1
        assert r.x_lo <= r.x_hi and r.y_lo <= r.y_hi
    assert all(v >= 4 for v in sizes.values())
    # the x-cut splits 8/8; within each side x and y are constant, so
    # both children must LEAF at size 8 (no further split possible)
    assert sorted(sizes.values()) == [8, 8]
