"""Scale-feature demonstrations pinned as tests: bucketed co-located
joins (no shuffle), observation metrics (the S6 peek twin), AQE
configuration."""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators.observe import observe, peek_rows
from kafka_streams_aggregate_spark.plans.inspect import count_exchanges
from kafka_streams_aggregate_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_needs_no_shuffle(spark, tmp_path):
    """Bucketing both join sides on the key co-locates matching rows:
    the join plan has zero shuffle exchanges — the pattern for repeated
    large-fact joins at 100 TB (pay the shuffle once at write time)."""
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF)
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        4, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("lineitem_b")

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    joined = ob.join(lb, "o_orderkey").groupBy("o_orderstatus").count()
    # groupBy still shuffles its small aggregate; the JOIN itself must
    # not. With bucketed sides the only exchange is the post-join agg.
    assert count_exchanges(joined) <= 1
    # and the result is correct:
    plain = (
        load_table(spark, "orders", SF)
        .join(
            load_table(spark, "lineitem", SF),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_observe_metrics_no_extra_job(spark):
    """S6 peek twin: named metrics ride along with the action."""
    events = load_table(spark, "events", SF)
    df, obs = observe(
        events,
        "peek_events",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor("value").cast("bigint")).alias("sum_v"),
    )
    n = df.count()
    assert obs.get["n_rows"] == n == 1000
    assert obs.get["sum_v"] > 0


def test_peek_rows_logs_bounded(spark, caplog):
    events = load_table(spark, "events", SF)
    with caplog.at_level(logging.DEBUG, logger="kafka_streams_aggregate_spark.operators.observe"):
        peek_rows(events.select("event_id", "user_id"), max_rows=3)
    assert len([r for r in caplog.records if "peek:" in r.message]) == 3


def test_aqe_and_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
