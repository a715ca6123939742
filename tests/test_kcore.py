"""k-core extraction (operators/components.py:kcore): exact equality
with a sequential peeler, minimum-degree soundness, maximality, and
determinism under input shuffling."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pasardassist_spark.operators.components import kcore


def _seq_kcore(edges: list[tuple], k: int) -> dict:
    """Reference peeler: repeatedly drop vertices with degree < k;
    returns {node: in-core degree}."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {e for e in es if e[0] not in drop and e[1] not in drop}


EDGES = [
    # a 4-clique (every node degree 3) ...
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    # ... a pendant chain hanging off it ...
    (4, 5), (5, 6), (6, 7),
    # ... a separate triangle ...
    (10, 11), (11, 12), (10, 12),
    # ... and a star (hub degree 4, leaves degree 1)
    (20, 21), (20, 22), (20, 23), (20, 24),
]


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_matches_sequential_reference(spark, k):
    df = spark.createDataFrame(EDGES, ["a", "b"])
    got = {r.node: r.core_degree for r in kcore(df, k).collect()}
    assert got == _seq_kcore(EDGES, k)


def test_kcore_3core_is_exactly_the_clique(spark):
    df = spark.createDataFrame(EDGES, ["a", "b"])
    got = {r.node: r.core_degree for r in kcore(df, 3).collect()}
    # chain, triangle, and star all peel away; only the 4-clique survives
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_min_degree_soundness_and_recursion(spark):
    """Every survivor's in-core degree >= k, and the cut is RECURSIVE —
    a raw degree filter would keep chain nodes 5 and 6 (both start at
    degree 2), but peeling the degree-1 tail cascades through them."""
    df = spark.createDataFrame(EDGES, ["a", "b"])
    got = {r.node: r.core_degree for r in kcore(df, 2).collect()}
    assert all(d >= 2 for d in got.values())
    # 7 (deg 1) peels, which drops 6 to deg 1, which drops 5: the whole
    # chain cascades even though 5 and 6 start at degree 2.
    assert {5, 6, 7}.isdisjoint(got)
    # triangle and clique survive k=2 intact; star peels entirely
    assert {10, 11, 12} <= set(got) and {20, 21, 22, 23, 24}.isdisjoint(got)


def test_kcore_deterministic_under_shuffled_input(spark):
    import random

    shuffled = EDGES[:]
    random.Random(7).shuffle(shuffled)
    flipped = [(b, a) for a, b in shuffled]
    df1 = spark.createDataFrame(shuffled, ["a", "b"]).repartition(7)
    df2 = spark.createDataFrame(flipped, ["a", "b"]).repartition(3)
    r1 = sorted(map(tuple, kcore(df1, 2).collect()))
    r2 = sorted(map(tuple, kcore(df2, 2).collect()))
    assert r1 == r2


def test_kcore_rejects_bad_k(spark):
    df = spark.createDataFrame(EDGES, ["a", "b"])
    with pytest.raises(ValueError, match="k must be"):
        kcore(df, 0)


def test_kcore_empty_result_when_k_exceeds_density(spark):
    df = spark.createDataFrame(EDGES, ["a", "b"])
    assert kcore(df, 4).count() == 0
