"""Explicit StructType schemas for the reference-domain entity tables.

The reference's mongoose schemas are dynamic (presence unenforced); here they
are fixed (SURVEY.md §1.4). Deliberate type upgrades from the reference,
documented per SURVEY.md §7 "decisions to lock early":

- wei money -> DECIMAL(38,0) (the reference stores JS doubles, lossy >= 2^53
  — app.service.ts:642-645); divide by 1e18 only at the display edge.
- uint256 tokenId -> canonical decimal string + derived tokenIdHex.
- all timestamps epoch SECONDS; orders.endTime is epoch ms in the reference
  (compared against Date.now(), app.service.ts:605) — normalized to seconds
  at ingest behind ``END_TIME_IS_MS``.

Schema citations: tokens TokenInfoModel.ts:3-31, orders OrderInfoModel.ts:
3-42, token_events TokenEventModel.ts:3-19, order_events OrderEventModel.ts:
3-38, collections CollectionInfoModel.ts:3-30.
"""

from __future__ import annotations

from pyspark.sql import types as T

WEI = T.DecimalType(38, 0)

# reference: endTime is ms (app.service.ts:605,617-620); we normalize to s.
END_TIME_IS_MS = False

CREATOR_SCHEMA = T.StructType(
    [
        T.StructField("did", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)

TOKEN_DATA_SCHEMA = T.StructType(
    [
        T.StructField("image", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("thumbnail", T.StringType()),
        T.StructField("signature", T.StringType()),
    ]
)

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("tokenId", T.StringType(), False),
        T.StructField("tokenIdHex", T.StringType()),
        T.StructField("chain", T.StringType(), False),
        T.StructField("contract", T.StringType(), False),
        T.StructField("uniqueKey", T.StringType(), False),
        T.StructField("tokenSupply", T.LongType()),
        T.StructField("tokenOwner", T.StringType()),
        T.StructField("tokenUri", T.StringType()),
        T.StructField("royaltyOwner", T.StringType()),
        T.StructField("royaltyFee", T.LongType()),
        T.StructField("tokenMinter", T.StringType()),
        T.StructField("createTime", T.LongType()),
        T.StructField("updateTime", T.LongType()),
        T.StructField("blockNumber", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("creator", CREATOR_SCHEMA),
        T.StructField("data", TOKEN_DATA_SCHEMA),
        T.StructField("adult", T.BooleanType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
        T.StructField("notGetDetail", T.BooleanType()),
        T.StructField("retryTimes", T.IntegerType()),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("orderId", T.LongType(), False),
        T.StructField("chain", T.StringType(), False),
        T.StructField("contract", T.StringType()),
        T.StructField("baseToken", T.StringType()),
        T.StructField("tokenId", T.StringType()),
        T.StructField("uniqueKey", T.StringType(), False),
        T.StructField("orderType", T.IntegerType()),  # 1=Sale 2=Auction
        T.StructField("orderState", T.IntegerType()),  # 1=Created 2=Filled 3=Cancelled
        T.StructField("amount", T.LongType()),
        T.StructField("quoteToken", T.StringType()),
        T.StructField("price", WEI),
        T.StructField("filled", WEI),
        T.StructField("lastBid", WEI),
        T.StructField("buyoutPrice", WEI),
        T.StructField("reservePrice", WEI),
        T.StructField("startTime", T.LongType()),
        T.StructField("endTime", T.LongType()),  # seconds (normalized)
        T.StructField("createTime", T.LongType()),
        T.StructField("updateTime", T.LongType()),
        T.StructField("sellerAddr", T.StringType()),
        T.StructField("buyerAddr", T.StringType()),
        T.StructField("lastBidder", T.StringType()),
        T.StructField("bids", T.IntegerType()),
        T.StructField("royaltyOwners", T.ArrayType(T.StringType())),
        T.StructField("royaltyFees", T.ArrayType(T.LongType())),
        T.StructField("platformFee", T.LongType()),
        T.StructField("isBlindBox", T.BooleanType()),
    ]
)

TOKEN_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType(), False),
        T.StructField("contract", T.StringType(), False),
        T.StructField("blockNumber", T.LongType(), False),
        T.StructField("transactionHash", T.StringType(), False),
        T.StructField("from", T.StringType()),
        T.StructField("to", T.StringType()),
        T.StructField("tokenId", T.StringType()),
        T.StructField("operator", T.StringType()),
        T.StructField("value", T.LongType()),
        T.StructField("gasFee", T.LongType()),
        T.StructField("timestamp", T.LongType()),
    ]
)

ORDER_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType(), False),
        T.StructField("baseToken", T.StringType()),
        T.StructField("blockNumber", T.LongType(), False),
        T.StructField("transactionHash", T.StringType(), False),
        T.StructField("orderId", T.LongType()),
        T.StructField("tokenId", T.StringType()),
        T.StructField("seller", T.StringType()),
        T.StructField("buyer", T.StringType()),
        T.StructField("quoteToken", T.StringType()),
        T.StructField("price", WEI),
        T.StructField("eventType", T.IntegerType()),  # 0..5, interfaces.ts:122-129
        T.StructField("gasFee", T.LongType()),
        T.StructField("timestamp", T.LongType()),
    ]
)

SOCIALS_SCHEMA = T.StructType(
    [
        T.StructField("website", T.StringType()),
        T.StructField("profile", T.StringType()),
        T.StructField("feeds", T.StringType()),
        T.StructField("twitter", T.StringType()),
        T.StructField("telegram", T.StringType()),
        T.StructField("discord", T.StringType()),
        T.StructField("medium", T.StringType()),
    ]
)

COLLECTION_DATA_SCHEMA = T.StructType(
    [
        T.StructField("avatar", T.StringType()),
        T.StructField("background", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("social", SOCIALS_SCHEMA),
    ]
)

COLLECTIONS_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("owner", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("creator", CREATOR_SCHEMA),
        T.StructField("data", COLLECTION_DATA_SCHEMA),
        T.StructField("dia", T.DoubleType()),  # DIA stake, tasks.common.ts:124-154
    ]
)  # CollectionInfoModel.ts:3-29

REWARDS_SCHEMA = T.StructType(
    [
        T.StructField("pool", T.StringType(), False),
        T.StructField("address", T.StringType()),
        T.StructField("amount", WEI),
        T.StructField("timestamp", T.LongType()),
    ]
)  # rewards_distribution_records, read in app.service.ts:2351-2365

DID_PROFILES_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType(), False),
        T.StructField("did", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)  # per-address DID profile cache, read in app.service.ts:192-194,230-235

# Order event kinds (interfaces.ts:122-129) / order state (142-146)
ORDER_EVENT_NAMES = {
    0: "OrderForAuction",
    1: "OrderBid",
    2: "OrderForSale",
    3: "OrderFilled",
    4: "OrderCancelled",
    5: "OrderPriceChanged",
}
ORDER_EVENT_BID = 1  # OrderBid, interfaces.ts:124
ORDER_EVENT_PRICE_CHANGED = 5  # OrderPriceChanged, interfaces.ts:128
ORDER_STATE_CREATED, ORDER_STATE_FILLED, ORDER_STATE_CANCELLED = 1, 2, 3
