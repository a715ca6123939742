"""Round-18 packed-long node-id conversions (graph_khop_reach,
graph_kcore): the iteration runs on long ids (customer 2k, supplier
2k+1) while the contract output stays the r17 string form. These tests
pin the bijection and the output contract the oracle certifies
differentially, so a future edit can't silently break either half."""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pasardassist_spark.queries.registry import REGISTRY, _load_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    _load_all()


def test_pack_unpack_bijection(spark):
    # the exact expressions the queries use: pack k -> 2k / 2k+1,
    # display unpack via shiftright; round-trip must be the identity
    df = spark.range(1, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("c_packed"),
        (F.col("id") * 2 + 1).alias("s_packed"),
    )
    bad = df.filter(
        (F.shiftright("c_packed", 1) != F.col("k"))
        | (F.col("c_packed") % 2 != 0)
        | (F.shiftright("s_packed", 1) != F.col("k"))
        | (F.col("s_packed") % 2 != 1)
    )
    assert bad.count() == 0


def test_kcore_output_contract(spark):
    out = REGISTRY["graph_kcore"].fn(spark, SF_DIR).collect()
    pat = re.compile(r"^[cs]\d+$")
    assert all(pat.match(r.node) for r in out)
    # ORDER BY runs on the rebuilt display string (string collation,
    # 'c1' < 'c10' < 'c2'), exactly the r17 contract
    nodes = [r.node for r in out]
    assert nodes == sorted(nodes)
    assert all(r.core_degree >= 1 for r in out)


def test_khop_counts_match_string_keyed_reference(spark):
    from pasardassist_spark.queries.mining import KHOP_HOPS, KHOP_SEED_MOD
    from pasardassist_spark.tables import load

    got = {
        r.hop: r.n_new
        for r in REGISTRY["graph_khop_reach"].fn(spark, SF_DIR).collect()
    }
    # independent string-keyed BFS over the same edge definition
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).collect()
    adj: dict[str, set[str]] = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
    visited = {
        n for n in adj
        if n.startswith("c") and int(n[1:]) % KHOP_SEED_MOD == 0
    }
    want = {0: len(visited)}
    frontier = set(visited)
    for h in range(1, KHOP_HOPS + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        frontier = nxt - visited
        visited |= frontier
        want[h] = len(frontier)
    assert got == want
