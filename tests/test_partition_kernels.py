"""Cross-batch state carry in the round-10 partition kernels.

The mapInPandas rewrites (ss_policy_sim, avco_perpetual_fold,
brown_double_smoothing, brown_backtest, mann_kendall) hold the OPEN
group's state between Arrow batches because a batch boundary can split
a group's row run. The default 10k-row Arrow batch never splits the
small test groups, so this suite forces 3-row batches and pins that
every kernel's output is IDENTICAL to its default-batch output — the
regression net for the exact failure mode the rewrite introduced.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def tiny_arrow_batches(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "3")
    yield
    spark.conf.set(key, prev)


def _canon(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _events(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "events", "/root/testdata/sf0.001").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )


def test_brown_pair_split_batches(spark, tiny_arrow_batches):
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        brown_backtest,
        brown_double_smoothing,
    )

    ev = _events(spark)
    a = _canon(brown_double_smoothing(ev, "user_id", "value", "ts", "event_id"))
    b = _canon(brown_backtest(ev, "user_id", "value", "ts", "event_id"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    assert a == _canon(
        brown_double_smoothing(ev, "user_id", "value", "ts", "event_id")
    )
    assert b == _canon(
        brown_backtest(ev, "user_id", "value", "ts", "event_id")
    )


def test_mann_kendall_split_batches(spark, tiny_arrow_batches):
    from kafka_streams_aggregate_spark.operators.stats import mann_kendall

    ev = _events(spark)
    a = _canon(mann_kendall(ev, "user_id", "ts", "event_id", "v_cents"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    assert a == _canon(
        mann_kendall(ev, "user_id", "ts", "event_id", "v_cents")
    )


def test_costing_folds_split_batches(spark, tiny_arrow_batches):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import (
        avco_perpetual_fold,
        ss_policy_sim,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    ledger = events.filter(
        F.col("event_type").isin("purchase", "error")
    ).select(
        F.col("user_id").alias("product"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", "IN")
        .otherwise("OUT")
        .alias("side"),
        (1 + F.floor("value").cast("bigint") % 10).alias("qty"),
        F.floor(F.col("value") * 100).cast("bigint").alias("unit_cents"),
    )
    li = load_table(spark, "lineitem", "/root/testdata/sf0.001").select(
        F.col("l_partkey").alias("product"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        F.col("l_quantity").alias("qty"),
    )
    a = _canon(avco_perpetual_fold(ledger))
    s = _canon(ss_policy_sim(li, "product", "d", "qty"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    assert a == _canon(avco_perpetual_fold(ledger))
    assert s == _canon(ss_policy_sim(li, "product", "d", "qty"))


def test_holt_winters_split_batches(spark, tiny_arrow_batches):
    # r16-opt regression net: holt_winters_additive moved to the
    # partition kernel this round; a 3-row Arrow batch must split its
    # series without changing any of the ten float outputs.
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        holt_winters_additive,
    )

    ev = _events(spark)
    a = _canon(holt_winters_additive(ev, "user_id", "value", "ts", "event_id"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    assert a == _canon(
        holt_winters_additive(ev, "user_id", "value", "ts", "event_id")
    )
    assert a  # non-vacuous: sf0.001 has series with >= 2 periods


def test_ewma_query_split_batches(spark, tiny_arrow_batches):
    # r16-opt regression net for the q_ewma_smoothing kernel rewrite.
    from kafka_streams_aggregate_spark.registry import load_all

    q = load_all()["q_ewma_smoothing"].spark
    a = _canon(q(spark, "/root/testdata/sf0.001"))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    assert a == _canon(q(spark, "/root/testdata/sf0.001"))
    assert a
