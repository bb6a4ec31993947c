"""Operator library. Import the specific module for full APIs; the
most-used entry points are re-exported here."""

from kafka_streams_aggregate_spark.operators.inventory_fold import (
    inventory_count_fold,
    latest_per_key,
)
from kafka_streams_aggregate_spark.operators.joins import (
    asof_join,
    range_join_buckets,
)
from kafka_streams_aggregate_spark.operators.windows import (
    sessionize,
    topk_per_group,
)

__all__ = [
    "inventory_count_fold",
    "latest_per_key",
    "asof_join",
    "range_join_buckets",
    "sessionize",
    "topk_per_group",
]
