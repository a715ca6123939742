"""Query-API surface parity: the reference's 47 HTTP endpoints
(reference src/modules/app/app.controller.ts:23-433) re-expressed as
parameterized DataFrame builders over explicit-schema entity tables.

Endpoints group into families (SURVEY.md §7 phase 1.6); each family is one
function in ``service`` taking (tables, dto) -> DataFrame, so the "IR" is a
Catalyst logical plan instead of a hand-built Mongo pipeline document.
"""

from pasardassist_spark.api.schemas import (
    ORDER_EVENTS_SCHEMA,
    ORDERS_SCHEMA,
    TOKEN_EVENTS_SCHEMA,
    TOKENS_SCHEMA,
)
from pasardassist_spark.api.service import PasarQueryService
from pasardassist_spark.api.dto import MarketplaceQuery, PageArgs, WalletQuery

__all__ = [
    "PasarQueryService",
    "MarketplaceQuery",
    "WalletQuery",
    "PageArgs",
    "TOKENS_SCHEMA",
    "ORDERS_SCHEMA",
    "TOKEN_EVENTS_SCHEMA",
    "ORDER_EVENTS_SCHEMA",
]
