from pasardassist_spark.plans.inspect import (
    data_shuffle_count,
    executed_plan,
    plan,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "plan",
    "executed_plan",
    "read_schemas",
    "shuffle_count",
    "data_shuffle_count",
]
