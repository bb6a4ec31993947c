"""Temporal earliest-arrival reachability — pre-validation for the
round-10 registration queue (operators/graph.py:temporal_reachability).

Edges: directed co-purchase pairs stamped with the order date (epoch
days via the repo's datediff rule). Seeds: parts < 10 at arrival 0.
The oracle's recursive CTE explores every (node, arrival, depth) state
and MINs; the operator's per-round min fold must land on identical
values (earlier-arrival dominance).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

TEMPORAL_ORACLE = """
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
               datediff('day', DATE '1970-01-01',
                        CAST(o.o_orderdate AS DATE)) AS ts
        FROM read_parquet('{sf}/lineitem.parquet') a
        JOIN read_parquet('{sf}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_orderkey = a.l_orderkey
    ),
    walk(node, arrival, depth) AS (
        SELECT p_partkey, CAST(0 AS BIGINT), 0
        FROM read_parquet('{sf}/part.parquet') WHERE p_partkey < 10
        UNION
        SELECT e.dst, CAST(e.ts AS BIGINT), w.depth + 1
        FROM walk w JOIN edges e
          ON e.src = w.node AND e.ts >= w.arrival
        WHERE w.depth < 3
    )
    SELECT node, CAST(MIN(arrival) AS BIGINT) AS arrival
    FROM walk GROUP BY node
"""


def _inputs(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_partkey")
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("ts"),
    )
    sets = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "ts")
        .agg(F.collect_set("l_partkey").alias("ps"))
    )
    edges = (
        sets.select(F.explode("ps").alias("src"), "ps", "ts")
        .select("src", F.explode("ps").alias("dst"), "ts")
        .filter(F.col("src") != F.col("dst"))
        .repartition("src")
        .dropDuplicates(["src", "dst", "ts"])
    )
    part = load_table(spark, "part", SF)
    seeds = part.filter(F.col("p_partkey") < 10).select(
        F.col("p_partkey").alias("node"), F.lit(0).cast("bigint").alias("arrival")
    )
    return edges, seeds


def test_temporal_reach_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        temporal_reachability,
    )

    edges, seeds = _inputs(spark)
    got = (
        temporal_reachability(edges, seeds, hops=3)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(TEMPORAL_ORACLE.format(sf=SF))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_temporal_vs_static_hand_graph(spark):
    """The case static BFS gets wrong: 1-(t=5)->2-(t=3)->3 — node 3 is
    NOT temporally reachable from 1 (the 2->3 edge departs before we
    arrive at 2), but 1->2->4 with nondecreasing stamps is."""
    from kafka_streams_aggregate_spark.operators.graph import (
        temporal_reachability,
    )

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 4, 7)], "src long, dst long, ts long"
    )
    seeds = spark.createDataFrame([(1, 0)], "node long, arrival long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(edges, seeds, hops=3).collect()
    }
    assert got == {1: 0, 2: 5, 4: 7}
    assert 3 not in got
