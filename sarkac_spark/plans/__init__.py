from sarkac_spark.plans.audit import (
    executed_plan,
    final_plan,
    has_broadcast_hash_join,
    plan_digest,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "executed_plan",
    "final_plan",
    "has_broadcast_hash_join",
    "plan_digest",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
]
