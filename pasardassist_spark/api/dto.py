"""Typed query DTOs — the validated request shapes of the reference
(src/modules/app/dto/*.ts), as frozen dataclasses."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PageArgs:
    """QueryPageDTO.ts:3-10 — 1-based page, size bounded to 50."""

    page_num: int = 1
    page_size: int = 10

    def __post_init__(self) -> None:
        if not (1 <= self.page_size <= 50):
            raise ValueError("pageSize must be in [1, 50]")
        if self.page_num < 1:
            raise ValueError("pageNum must be >= 1")


# status tags, QueryMarketplaceDTO + app.service.ts:611-625
STATUS_BUY_NOW = "BuyNow"
STATUS_ON_AUCTION = "OnAuction"
STATUS_HAS_ENDED = "HasEnded"
STATUS_HAS_BIDS = "HasBids"

SORT_KEYS = (
    "createTime",  # newest listing first (default)
    "price_asc",
    "price_desc",
    "endTime",
    "token_createTime",
)


@dataclass(frozen=True)
class MarketplaceQuery:
    """QueryMarketplaceDTO.ts:4-16 -> getMarketplace (app.service.ts:604-757)."""

    chain: str | None = None
    status: tuple[str, ...] = ()
    collection: str | None = None  # "{chain}-{baseToken}"
    min_price: float | None = None  # user units; x1e18 applied engine-side
    max_price: float | None = None
    keyword: str | None = None
    adult: bool | None = None
    sort: str = "createTime"
    page: PageArgs = field(default_factory=PageArgs)
    now_seconds: int | None = None  # injected clock (reference uses Date.now())


@dataclass(frozen=True)
class WalletQuery:
    """Collectibles-by-wallet family (owned/listed/sold/minted/bidded)."""

    wallet: str
    chain: str | None = None
    keyword: str | None = None
    page: PageArgs = field(default_factory=PageArgs)


@dataclass(frozen=True)
class TransactionQuery:
    """listTransactions family: merged order+token event timeline."""

    unique_key: str | None = None
    wallet: str | None = None
    event_types: tuple[str, ...] = ()
    page: PageArgs = field(default_factory=PageArgs)


COLLECTION_SORTS = ("dia", "items", "owners", "tradeVolume", "lowestPrice")


@dataclass(frozen=True)
class CollectionsQuery:
    """QueryCollectionDTO -> listCollections (app.service.ts:560-601):
    chain/category filters, keyword over name/description, sort by a stats
    column, paged."""

    chain: str | None = None
    category: str | None = None
    keyword: str | None = None
    # getCollectionsByWalletAddr (app.service.ts:1656-1684): same listing
    # shape with match = {owner: walletAddr} (+ optional chain).
    owner: str | None = None
    sort: str = "dia"
    page: PageArgs = field(default_factory=PageArgs)
