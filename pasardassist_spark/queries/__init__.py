from pasardassist_spark.queries.registry import REGISTRY, all_oracles, all_queries

__all__ = ["REGISTRY", "all_queries", "all_oracles"]
