from pasardassist_spark.operators.latest import latest_per_key, top_k_per_key
from pasardassist_spark.operators.pagination import count_and_page, paginate

__all__ = ["latest_per_key", "top_k_per_key", "paginate", "count_and_page"]
