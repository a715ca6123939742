"""Record linkage composite: typo CHAINS must collapse into one cluster
(transitivity — the thing pairwise matching alone cannot do),
survivorship must pick exactly one canonical per cluster by the supplied
order, blocks must never link, singletons stay canonical."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasardassist_spark.operators.linkage import fuzzy_pairs, link_records

ROWS = [
    # a typo chain in block "us": 1~2 (2 edits), 2~3 (2 edits), but 1~3
    # is 4 edits (duckdb-verified) — linked only THROUGH 2; transitive
    # closure must put all three together regardless
    (1, "us", "acme corporation", 10),
    (2, "us", "acme corporatian.", 30),
    (3, "us", "acma corporatian..", 20),
    # same text as id 1 but a different block: must NOT link
    (4, "eu", "acme corporation", 99),
    # singleton in "us"
    (5, "us", "zenith holdings", 7),
    # an exact-duplicate pair in "eu"
    (6, "eu", "nordwind gmbh", 2),
    (7, "eu", "nordwind gmbh", 1),
]
SCHEMA = "id long, region string, name string, updated_at long"


def test_chain_collapses_and_blocks_isolate(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    pairs = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(df, ["region"], "id", "name", 2).collect()
    }
    # the chain ends (1,3) are 3 edits apart: NOT a direct pair
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs
    assert (6, 7) in pairs
    assert not any(4 in p for p in pairs)

    out = link_records(df, ["region"], "id", "name", 2).collect()
    cl = {r.id: r.cluster_id for r in out}
    assert cl[1] == cl[2] == cl[3] == 1  # transitive closure, min-id label
    assert cl[4] == 4 and cl[5] == 5
    assert cl[6] == cl[7] == 6


def test_survivorship_orders(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    # default: lowest id canonical
    out = link_records(df, ["region"], "id", "name", 2).collect()
    canon = {r.cluster_id: r.id for r in out if r.is_canonical}
    assert canon == {1: 1, 4: 4, 5: 5, 6: 6}
    assert sum(1 for r in out if r.is_canonical) == len(canon)

    # latest-wins: highest updated_at canonical per cluster
    out2 = link_records(
        df, ["region"], "id", "name", 2,
        survivor_order=[F.col("updated_at")],
    ).collect()
    canon2 = {r.cluster_id: r.id for r in out2 if r.is_canonical}
    assert canon2 == {1: 2, 4: 4, 5: 5, 6: 6}  # id 2 has updated_at 30
    # every row labeled, exactly one canonical per cluster
    clusters = {r.cluster_id for r in out2}
    assert set(canon2) == clusters


def test_type_collapsed_closure_equals_record_level(spark, sf_dir):
    """The exact-collapse-before-fuzzy optimization must be lossless: the
    type-collapsed graph's clusters and survivors equal the record-level
    pair graph's, at two operating distances."""
    from pyspark.sql import functions as F

    from pasardassist_spark.operators.components import connected_components
    from pasardassist_spark.operators.linkage import fuzzy_pairs, link_records
    from pasardassist_spark.tables import load

    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("block"),
        F.col("p_name").alias("name"),
    )
    for dist in (2, 4):
        new = {
            r.id: (r.cluster_id, r.is_canonical)
            for r in link_records(part, ["block"], "id", "name", dist).collect()
        }
        pairs = fuzzy_pairs(part, ["block"], "id", "name", dist)
        comp = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
            "node", "id"
        )
        out = (
            part.join(comp, "id", "left")
            .withColumn("cluster_id", F.coalesce("component", F.col("id")))
            .drop("component")
        )
        winners = out.groupBy("cluster_id").agg(
            F.max_by(
                F.col("id"), F.struct((-F.col("id")).alias("_neg_id"))
            ).alias("_win")
        )
        old = {
            r.id: (r.cluster_id, r.is_canonical)
            for r in out.join(winners, "cluster_id")
            .withColumn("is_canonical", F.col("id") == F.col("_win"))
            .collect()
        }
        assert new == old, f"divergence at dist={dist}"
