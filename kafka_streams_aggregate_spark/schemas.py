"""Declared schemas.

The reference keeps schema implicit in Java class shapes enforced by
Jackson at runtime (``KafkaStreamsInventoryCountApplication.java:71-74``,
``application.yml:10-12``). Here every schema is explicit — the idiomatic
Spark stance — so Catalyst can prune/pushdown and `from_json` can parse
without inference.

Reference record shapes (see SURVEY.md §1.2):
  - ProductKey {productCode: String}            (ProductKey.java:21)
  - InventoryUpdateEvent {delta: int, key: ProductKey,
                          action: INC|DEC|REP}  (InventoryUpdateEvent.java:25-33)
  - InventoryCountEvent {count: int, key: ProductKey}
                                                (InventoryCountEvent.java:27-29)

``count`` widens int -> long here: at 100 TB-scale accumulation a 32-bit
counter overflows.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Grouping key. The struct mirrors the reference; the flat product_code
# column is the preferred working form (struct keys add nothing in Spark).
PRODUCT_KEY_SCHEMA = T.StructType(
    [T.StructField("productCode", T.StringType(), True)]
)

# Input stream value: kafka topic inventory-update-events.
INVENTORY_UPDATE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("delta", T.IntegerType(), True),
        T.StructField("key", PRODUCT_KEY_SCHEMA, True),
        T.StructField("action", T.StringType(), True),  # domain {INC, DEC, REP}
    ]
)

# Aggregate/output value: kafka topic inventory-count-events.
INVENTORY_COUNT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType(), True),
        T.StructField("key", PRODUCT_KEY_SCHEMA, True),
    ]
)

VALID_ACTIONS = ("INC", "DEC", "REP")

# Flat working shape of the update stream used by the fold operators:
# (product_code, seq, action, delta). `seq` stands in for the Kafka
# partition offset — required because REP makes the fold order-sensitive
# (InventoryCountUpdateEventUpdater.java:37-39).
INVENTORY_UPDATE_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("product_code", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("delta", T.IntegerType(), True),
    ]
)

# Driver test table: events.parquet (TESTDATA.md / FIXTURES.md §F3).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
