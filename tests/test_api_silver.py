"""The API layer's default bucketed read path (VERDICT r5 directive #2).

prepare_entity_silver writes tokens bucketed by (chain, contract) and
orders by (chain, baseToken); PasarQueryService.from_lake then prefers
those catalog tables. Assertions:

1. endpoint results on the bucketed path equal the plain-frame path
   (same fixture data, so byte-identical rows);
2. collections_list — the endpoint that re-runs the collection_stats
   fact-fact pipeline per request — plans with ZERO shuffle Exchange on
   the bucketed path: both group-bys consume the bucket partitioning
   (HashAggregate is alias-aware through baseToken->contract) and the
   stats join co-locates. The only exchanges left are broadcasts, which
   scale as dims, not facts.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from pasardassist_spark.api import PageArgs, PasarQueryService
from pasardassist_spark.api.dto import CollectionsQuery
from pasardassist_spark.api.schemas import COLLECTIONS_SCHEMA, ORDERS_SCHEMA, TOKENS_SCHEMA
from pasardassist_spark.plans import data_shuffle_count, plan, shuffle_count
from pasardassist_spark.sources.lake import prepare_entity_silver


def _token(**kw):
    base = {f.name: None for f in TOKENS_SCHEMA.fields}
    base.update(tokenSupply=1, adult=False, createTime=1, updateTime=1, blockNumber=1)
    base.update(kw)
    return tuple(base[f.name] for f in TOKENS_SCHEMA.fields)


def _order(**kw):
    base = {f.name: None for f in ORDERS_SCHEMA.fields}
    base.update(
        orderType=1, orderState=1, amount=1, bids=0, endTime=0,
        createTime=1, updateTime=1, price=Decimal(10**18),
    )
    base.update(kw)
    return tuple(base[f.name] for f in ORDERS_SCHEMA.fields)


@pytest.fixture(scope="module")
def entity_frames(spark):
    tokens = spark.createDataFrame(
        [
            _token(tokenId="1", chain="ela", contract="c1", uniqueKey="ela-c1-1",
                   name="Cool Cat", tokenOwner="alice", createTime=100),
            _token(tokenId="2", chain="ela", contract="c1", uniqueKey="ela-c1-2",
                   name="Dog", tokenOwner="bob", createTime=200),
            _token(tokenId="3", chain="eth", contract="c3", uniqueKey="eth-c3-3",
                   name="Ether Thing", tokenOwner="alice", createTime=300),
        ],
        TOKENS_SCHEMA,
    )
    orders = spark.createDataFrame(
        [
            _order(orderId=1, chain="ela", baseToken="c1", tokenId="1",
                   uniqueKey="ela-c1-1", orderState=2, createTime=110,
                   filled=Decimal(100), sellerAddr="alice"),
            _order(orderId=2, chain="ela", baseToken="c1", tokenId="2",
                   uniqueKey="ela-c1-2", orderState=1, createTime=120,
                   price=Decimal(2 * 10**18), sellerAddr="bob"),
            _order(orderId=3, chain="eth", baseToken="c3", tokenId="3",
                   uniqueKey="eth-c3-3", orderState=1, createTime=130,
                   sellerAddr="alice"),
        ],
        ORDERS_SCHEMA,
    )
    collections = spark.createDataFrame(
        [
            ("ela", "c1", "o", "Cats", "uri://x", 1,
             ("did:x", "cr", None), (None, None, "feline", "art", (None,) * 7), 5.0),
            ("eth", "c3", "o", "Ethers", "uri://y", 1,
             ("did:y", "cr", None), (None, None, "eth", "art", (None,) * 7), 2.0),
        ],
        COLLECTIONS_SCHEMA,
    )
    return tokens, orders, collections


@pytest.fixture(scope="module")
def silver_service(spark, entity_frames):
    tokens, orders, collections = entity_frames
    prepare_entity_silver(spark, tokens, orders)
    svc = PasarQueryService.from_lake(
        spark, tokens, orders, collections=collections
    )
    yield svc
    for t in ("silver_tokens", "silver_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_from_lake_falls_back_without_silver(spark, entity_frames):
    """Must run before the silver_service fixture materializes: with no
    silver tables in the catalog, from_lake serves the given frames."""
    tokens, orders, _ = entity_frames
    for t in ("silver_tokens", "silver_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    svc = PasarQueryService.from_lake(spark, tokens, orders)
    assert svc.tokens is tokens and svc.orders is orders


def test_from_lake_prefers_silver_tables(silver_service):
    """The factory must actually read the catalog tables, not the frames."""
    src = plan(silver_service.tokens, "simple") + plan(silver_service.orders, "simple")
    assert "silver_tokens" in src and "silver_orders" in src


def test_collections_list_zero_exchange_on_silver(silver_service):
    """Zero data shuffles end-to-end: both entity group-bys consume the
    bucket partitioning, the stats join co-locates, collections/stats/total
    attach via broadcast, and the page is TakeOrderedAndProject. The single
    allowed SinglePartition exchange is count_and_page's global-total merge
    (one partial-count long per task — what every engine's COUNT(*) plans),
    and nothing else: asserted both ways."""
    df = silver_service.collections_list(
        CollectionsQuery(sort="items", page=PageArgs(1, 10))
    )
    p = plan(df)
    assert data_shuffle_count(p) == 0, p
    assert shuffle_count(p) <= 1, p  # only the global-count merge
    # and the entity scans really are the bucketed ones
    assert "silver_tokens" in p and "silver_orders" in p
    assert "Bucketed: true" in p


def test_silver_results_equal_plain(spark, entity_frames, silver_service):
    tokens, orders, collections = entity_frames
    plain = PasarQueryService(tokens, orders, collections=collections)
    q = CollectionsQuery(sort="items", page=PageArgs(1, 10))
    got = [tuple(r) for r in silver_service.collections_list(q).collect()]
    want = [tuple(r) for r in plain.collections_list(q).collect()]
    assert got == want
    # collection_stats itself too (the derived frame everything reuses)
    gs = sorted(map(tuple, silver_service.collection_stats().collect()))
    ws = sorted(map(tuple, plain.collection_stats().collect()))
    assert gs == ws
