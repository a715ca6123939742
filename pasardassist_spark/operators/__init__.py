from pasardassist_spark.operators.asof import asof_join, asof_join_broadcast
from pasardassist_spark.operators.components import connected_components
from pasardassist_spark.operators.fold import (
    fold_entity_state,
    fold_order_state,
    fold_token_ownership,
    merge_entity_states,
)
from pasardassist_spark.operators.latest import latest_per_key, top_k_per_key
from pasardassist_spark.operators.pagination import count_and_page, paginate
from pasardassist_spark.operators.rangejoin import range_join
from pasardassist_spark.operators.skew import salted_join, salted_latest_per_key

__all__ = [
    "latest_per_key",
    "top_k_per_key",
    "paginate",
    "count_and_page",
    "asof_join",
    "asof_join_broadcast",
    "connected_components",
    "range_join",
    "salted_join",
    "salted_latest_per_key",
    "fold_entity_state",
    "merge_entity_states",
    "fold_order_state",
    "fold_token_ownership",
]
