"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the single biggest join cost is the shuffle that hash-
partitions both sides on the join key. Spark's answer is *bucketing*
(`DataFrameWriter.bucketBy`): each side is written pre-hashed into N
buckets on the key, the metastore records the layout, and a later
equi-join on that key reads bucket i against bucket i directly —
`SortMergeJoin` with **no Exchange on either side**. Same for a
`groupBy` on the bucket key: partial/final aggregation collapses into
one stage. This is the batch analog of Kafka Streams' co-partitioned
topics (the reference relies on the broker hashing both topics by key
— `KafkaStreamsInventoryCountApplication.java:76-84` assumes input
co-partitioning the same way).

Rules encoded here:
- both sides must use the SAME bucket count (or one a divisor of the
  other with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
- `sortBy` within buckets lets SortMergeJoin skip its Sort too;
- bucket pruning: an equality filter on the bucket key reads 1/N of
  the files (`spark.sql.sources.bucketing.enabled` scan-side prune).

Bucketing requires a table in the session catalog (`saveAsTable`) —
plain `.parquet(path)` writes carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted)
    managed parquet table, replacing any previous version."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed (and sorted) on ``on``, the physical plan is a
    SortMergeJoin whose children are bare FileScans — zero Exchange,
    zero Sort. Callers should assert that property in tests via
    `plans.inspect.count_exchanges`."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
