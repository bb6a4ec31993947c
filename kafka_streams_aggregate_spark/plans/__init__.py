from kafka_streams_aggregate_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "has_broadcast_hash_join",
    "count_exchanges",
]
