"""Bucketed-table co-location: the shuffle-free join/agg path.

Pins the property that makes bucketing worth it at 100 TB: an
equi-join (and a groupBy) on the bucket key over two tables bucketed
with the same count produces ZERO Exchange nodes — the scan layout
satisfies the distribution requirement, like Kafka Streams'
co-partitioned topics do for the reference."""

from __future__ import annotations

import pytest

from kafka_streams_aggregate_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
)
from kafka_streams_aggregate_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from kafka_streams_aggregate_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    write_bucketed(orders, "b_orders", "o_custkey", n_buckets=4)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        n_buckets=4,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Disable broadcast so the join exercises the bucketed SMJ path
        # (at real scale neither side would broadcast anyway).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = formatted_plan(joined)
        assert count_exchanges(joined) == 0, plan
        assert "SortMergeJoin" in plan, plan
        # Same rows as the plain shuffle join.
        plain = load_table(spark, "orders", SF).join(
            load_table(spark, "customer", SF).withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    agg = spark.table("b_orders").groupBy("o_custkey").count()
    assert count_exchanges(agg) == 0, formatted_plan(agg)


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    # An equality filter on the bucket key should prune to 1 of 4
    # buckets: the scan reports the selected bucket count. The planner
    # auto-disables bucketed scans when no join/agg needs the
    # distribution, which also forfeits pruning — pin it on for a
    # filter-only read (autoBucketedScan is the *output-partitioning*
    # optimization; pruning is the reason to keep the bucketed scan).
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        df = spark.table("b_orders").filter("o_custkey = 42")
        plan = formatted_plan(df)
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
