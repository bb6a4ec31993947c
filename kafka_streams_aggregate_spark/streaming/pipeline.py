"""End-to-end streaming pipeline builders mirroring the reference's
topology: Kafka topic -> JSON deserialize -> keyed fold -> JSON
serialize -> Kafka topic (``application.yml:3-7``).

The Kafka connector itself needs the spark-sql-kafka jar (not present
in this environment), so the source/sink builders are configuration
factories; the JSON (de)serialization expressions — the reference's
JsonSerde twin (``KafkaStreamsInventoryCountApplication.java:71-74``) —
are plain Catalyst expressions, testable on static frames without a
broker (see tests/test_streaming.py).

Delivery semantics (SURVEY.md §7 Phase 1(c)): Spark's Kafka sink is
at-least-once — a failed micro-batch may replay its output records.
That is safe here by the same argument that makes the reference's
conflation safe: the output stream is an upsert changelog (latest
aggregate per key), so consumers keyed on the record key converge to
identical state under replays (the reference's own tests read output
into a latest-wins map, ``KafkaStreamsInventoryCountTests.java:175-189``).
For an exactly-once *table* sink, route ``foreachBatch`` to an
idempotent upsert keyed by (key, batch_id) — see
``streaming/snapshot.py`` for the changelog-table form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.schemas import (
    INVENTORY_UPDATE_EVENT_SCHEMA,
    PRODUCT_KEY_SCHEMA,
)

INPUT_TOPIC = "inventory-update-events"  # application.yml:3-5
OUTPUT_TOPIC = "inventory-count-events"  # application.yml:6-7
CONSUMER_GROUP = "inventory-processor"  # application.yml:5


def kafka_update_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = INPUT_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Raw Kafka source for the update-event topic. Requires the
    spark-sql-kafka package on the classpath."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.group.id", CONSUMER_GROUP)
        .load()
    )


def parse_update_records(raw: DataFrame) -> DataFrame:
    """JSON deserialize + flatten to the fold's working shape
    ``(product_code, seq, action, delta)``.

    Identity comes from the Kafka *record key* (a ProductKey JSON), not
    the value's embedded key — the reference never populates the
    latter (SURVEY.md §1.2). The Kafka offset is the per-partition
    fold order, surfaced as ``seq``.
    """
    key = F.from_json(F.col("key").cast("string"), PRODUCT_KEY_SCHEMA)
    value = F.from_json(F.col("value").cast("string"), INVENTORY_UPDATE_EVENT_SCHEMA)
    return raw.select(
        key.getField("productCode").alias("product_code"),
        F.col("offset").alias("seq"),
        value.getField("action").alias("action"),
        value.getField("delta").alias("delta"),
    )


def count_event_output(folded: DataFrame) -> DataFrame:
    """Serialize ``(product_code, count)`` to the reference's output
    record shape: record key = ProductKey JSON, record value =
    InventoryCountEvent JSON (embedded key carried, unlike the
    reference which leaves it null — declared schema wins here)."""
    return folded.select(
        F.to_json(F.struct(F.col("product_code").alias("productCode"))).alias("key"),
        F.to_json(
            F.struct(
                F.col("count").alias("count"),
                F.struct(F.col("product_code").alias("productCode")).alias("key"),
            )
        ).alias("value"),
    )


def start_kafka_pipeline(
    spark: SparkSession,
    bootstrap_servers: str,
    checkpoint_dir: str,
    trigger_interval: str = "1 second",
):
    """Wire the full topology and start it. Trigger interval mirrors the
    reference's commit.interval.ms=1000 conflation cadence."""
    from kafka_streams_aggregate_spark.streaming.inventory_stream import (
        streaming_inventory_fold,
    )

    raw = kafka_update_source(spark, bootstrap_servers)
    folded = streaming_inventory_fold(parse_update_records(raw))
    out = count_event_output(folded)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", OUTPUT_TOPIC)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(processingTime=trigger_interval)
        .start()
    )
