"""Quantile normalization — pre-validation for the round-10
registration queue (operators/stats.py:quantile_normalize).

Two customer metrics on wildly different scales (account balance cents
vs total order spend cents) forced onto their shared per-rank-mean
distribution. Oracle text registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

QN_ORACLE = """
    WITH spend AS (
        SELECT c.c_custkey AS id,
               CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
               CAST(COALESCE(
                   SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)),
                   0) AS BIGINT) AS spend_cents
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    ),
    melted AS (
        SELECT id, 'bal_cents' AS metric, bal_cents AS value FROM spend
        UNION ALL
        SELECT id, 'spend_cents', spend_cents FROM spend
    ),
    ranked AS (
        SELECT id, metric, value,
               CAST(row_number() OVER (
                   PARTITION BY metric ORDER BY value, id) AS BIGINT)
                   AS rank
        FROM melted
    ),
    per_rank AS (
        SELECT rank, CAST(SUM(value) AS BIGINT) AS qn_sum
        FROM ranked GROUP BY rank
    )
    SELECT r.id, r.metric, r.rank, r.value, p.qn_sum,
           CAST(p.qn_sum AS DOUBLE) / 2.0 AS qn_mean
    FROM ranked r JOIN per_rank p ON p.rank = r.rank
"""


def test_quantile_normalize_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        quantile_normalize,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("spend_cents")
        )
        .select(
            F.col("c_custkey").alias("id"),
            F.floor(F.col("c_acctbal") * 100)
            .cast("bigint")
            .alias("bal_cents"),
            "spend_cents",
        )
    )
    got = (
        quantile_normalize(spend, "id", ["bal_cents", "spend_cents"])
        .toPandas()
        .sort_values(["metric", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(QN_ORACLE.format(sf=SF))
        .df()
        .sort_values(["metric", "rank"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert [v.hex() for v in got["qn_mean"]] == [
        v.hex() for v in exp["qn_mean"]
    ]


def test_quantile_normalize_properties(spark):
    """After QN every metric has the SAME multiset of values (the
    defining property), and a metric already equal to the target
    distribution is unchanged."""
    from kafka_streams_aggregate_spark.operators.stats import (
        quantile_normalize,
    )

    rows = [(1, 10, 700), (2, 30, 100), (3, 20, 400)]
    df = spark.createDataFrame(rows, "id int, a long, b long")
    out = quantile_normalize(df, "id", ["a", "b"]).collect()
    by_metric: dict = {}
    for r in out:
        by_metric.setdefault(r["metric"], []).append(r["qn_mean"])
    assert sorted(by_metric["a"]) == sorted(by_metric["b"])
    # hand check: sorted a = [10,20,30], sorted b = [100,400,700]
    # rank means: (10+100)/2=55, (20+400)/2=210, (30+700)/2=365
    got = {
        (r["metric"], r["id"]): r["qn_mean"] for r in out
    }
    assert got[("a", 1)] == 55.0 and got[("b", 2)] == 55.0
    assert got[("a", 3)] == 210.0 and got[("b", 3)] == 210.0
    assert got[("a", 2)] == 365.0 and got[("b", 1)] == 365.0


def test_quantile_normalize_null_cells(spark):
    """NULL cells are dropped before ranking — they neither consume a
    rank (which would desync per-metric rank alignment) nor deflate
    qn_mean (which divides by the per-rank metric count, not the
    column count)."""
    from kafka_streams_aggregate_spark.operators.stats import (
        quantile_normalize,
    )

    rows = [(1, 10, 700), (2, 30, None), (3, 20, 400)]
    df = spark.createDataFrame(rows, "id int, a long, b long")
    out = quantile_normalize(df, "id", ["a", "b"]).collect()
    # no NULL-valued cells survive
    assert all(r["value"] is not None for r in out)
    got = {(r["metric"], r["id"]): (r["rank"], r["qn_mean"]) for r in out}
    # metric b ranks its two non-NULL values 1..2 (no gap for the NULL)
    assert got[("b", 3)][0] == 1 and got[("b", 1)][0] == 2
    # rank 1: (10+400)/2 ; rank 2: (20+700)/2 ; rank 3: a alone -> 30
    assert got[("a", 1)][1] == 205.0 and got[("b", 3)][1] == 205.0
    assert got[("a", 3)][1] == 360.0 and got[("b", 1)][1] == 360.0
    assert got[("a", 2)] == (3, 30.0)
