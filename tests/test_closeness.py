"""Sampled-seed closeness centrality — pre-validation for the
round-11 registration queue (operators/graph.py:closeness_sampled).

Bounded-hop multi-source BFS (Eppstein–Wang estimator shape) over the
bipartite supplier–part graph; exact int64 (n_reached, dist_sum) +
scaled inverse average distance. Registration-ready oracle text in
CLOSENESS_ORACLE (recursive CTE scoped by the same hop bound).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

CLOSENESS_ORACLE = """
    WITH RECURSIVE
    li AS (
        SELECT DISTINCT l_suppkey, l_partkey
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    edges AS (
        SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
               'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM li
        UNION ALL
        SELECT 'p' || CAST(l_partkey AS VARCHAR),
               's' || CAST(l_suppkey AS VARCHAR)
        FROM li
    ),
    seeds AS (
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS seed
        FROM li WHERE l_suppkey % 5 = 0
    ),
    walk(seed, node, dist) AS (
        SELECT seed, seed, CAST(0 AS BIGINT) FROM seeds
        UNION
        SELECT w.seed, e.dst, w.dist + 1
        FROM walk w JOIN edges e ON w.node = e.src
        WHERE w.dist < 3
    ),
    md AS (
        SELECT seed, node, MIN(dist) AS dist
        FROM walk GROUP BY seed, node
    )
    SELECT seed,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS dist_sum,
           CAST((1000000 * COUNT(*)) // SUM(dist) AS BIGINT)
               AS closeness_ppm
    FROM md WHERE dist > 0 GROUP BY seed
"""


def test_closeness_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import closeness_sampled
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = (
        load_table(spark, "lineitem", SF)
        .select("l_suppkey", "l_partkey")
        .dropDuplicates()
    )
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        li.where(F.col("l_suppkey") % 5 == 0)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "seed"
            )
        )
        .dropDuplicates()
    )
    got = (
        closeness_sampled(edges, seeds, hops=3)
        .toPandas()
        .sort_values("seed")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(CLOSENESS_ORACLE.format(sf=SF))
        .df()
        .sort_values("seed")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_closeness_hand_values(spark):
    """Path a->b->c, seed a, hops=2: reaches {b:1, c:2} ->
    n_reached 2, dist_sum 3, ppm = 2e6 // 3 = 666666."""
    from kafka_streams_aggregate_spark.operators.graph import closeness_sampled

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "seed string")
    [r] = closeness_sampled(edges, seeds, hops=2).collect()
    assert (r["n_reached"], r["dist_sum"], r["closeness_ppm"]) == (
        2,
        3,
        666_666,
    )
