"""Queryable state snapshot — the stretch-goal twin of the reference
README's dropped ``/events`` HTTP surface (``README.adoc:19``; no
controller exists in the reference — SURVEY.md §0 marks it stale).

The engine's equivalent: the streaming fold's update-mode changelog is
written to a parquet sink partitioned by micro-batch; the *snapshot* of
the KTable ("inventory-counts" store) at any moment is simply
latest-row-per-key over that changelog — a batch query, servable by
anything that can run Spark SQL. No interactive-query RPC layer needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators.inventory_fold import latest_per_key


def write_changelog_batch(batch_df: DataFrame, batch_id: int, sink_dir: str) -> None:
    """foreachBatch body: append this micro-batch's changelog rows with
    their batch id (the conflation epoch) and a wall-clock write stamp.

    The stamp exists because ``_batch_id`` alone is only a total order
    within one checkpoint lineage — resetting the checkpoint restarts
    batch numbering at 0, and a snapshot ordered purely by batch id
    would then prefer the OLD run's higher-numbered rows. Ordering by
    (write stamp, batch id) stays correct across checkpoint resets;
    within a run, batches are written sequentially so the stamp is
    monotone there too."""
    import time

    batch_df.withColumn("_batch_id", F.lit(batch_id)).withColumn(
        "_written_ms", F.lit(int(time.time() * 1000))
    ).write.mode("append").parquet(sink_dir)


def latest_counts_snapshot(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Current state of the fold: latest count per key across all
    changelog epochs. One window over (key order by epoch desc) — the
    batch read that replaces the reference's (nonexistent) REST
    endpoint."""
    # Update mode emits at most one row per key per micro-batch;
    # (write stamp, batch id) totally orders a key's rows both within a
    # run and across checkpoint resets (see write_changelog_batch).
    changelog = spark.read.parquet(sink_dir).withColumn(
        "_ord", F.struct(F.col("_written_ms"), F.col("_batch_id"))
    )
    return latest_per_key(
        changelog,
        key_cols=["product_code"],
        order_col="_ord",
        value_cols=["count"],
    )
