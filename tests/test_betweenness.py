"""Hop-bounded Brandes betweenness from sampled seeds
(operators/graph.py:betweenness_sampled). Registration-ready oracle
text in BETW_ORACLE (hops=2 over the supplier-part bipartite graph).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def betw_oracle(sf_or_view: str, seed_mod: int, topk: int = 100) -> str:
    """Unrolled two-level Brandes: forward sigma levels, one backward
    floored-ppm dependency stage (the outermost level's delta is 0).
    ``sf_or_view``: a read_parquet(...) ref or the driver's
    ``lineitem`` view name."""
    return f"""
    WITH li AS MATERIALIZED (
        SELECT DISTINCT l_suppkey, l_partkey FROM {sf_or_view}
    ),
    edges AS MATERIALIZED (
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
        FROM li WHERE l_suppkey % {seed_mod} = 0
    ),
    l1 AS MATERIALIZED (
        SELECT s.seed, e.dst AS node, CAST(COUNT(*) AS BIGINT) AS sigma
        FROM seeds s JOIN edges e ON e.src = s.seed
        WHERE e.dst <> s.seed
        GROUP BY s.seed, e.dst
    ),
    l2 AS MATERIALIZED (
        SELECT a.seed, e.dst AS node, CAST(SUM(a.sigma) AS BIGINT) AS sigma
        FROM l1 a JOIN edges e ON e.src = a.node
        LEFT JOIN l1 x ON x.seed = a.seed AND x.node = e.dst
        WHERE e.dst <> a.seed AND x.node IS NULL
        GROUP BY a.seed, e.dst
    ),
    delta1 AS (
        SELECT a.seed, a.node,
               CAST(SUM((a.sigma * 1000000) // w.sigma) AS BIGINT) AS d_fp
        FROM l1 a JOIN edges e ON e.src = a.node
        JOIN l2 w ON w.seed = a.seed AND w.node = e.dst
        GROUP BY a.seed, a.node
    ),
    bc AS (
        SELECT node, CAST(SUM(d_fp) AS BIGINT) AS betweenness_fp
        FROM delta1 GROUP BY node
    )
    SELECT node, betweenness_fp,
           CAST(row_number() OVER (ORDER BY betweenness_fp DESC, node)
                AS BIGINT) AS rank
    FROM bc QUALIFY rank <= {topk}
    """


BETW_ORACLE = betw_oracle("lineitem", 50)  # the registration text


def _bipartite(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = (
        load_table(spark, "lineitem", SF)
        .select("l_suppkey", "l_partkey")
        .dropDuplicates()
    )
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    p = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    edges = li.select(s.alias("src"), p.alias("dst")).unionAll(
        li.select(p.alias("src"), s.alias("dst"))
    )
    seeds = (
        li.where(F.col("l_suppkey") % 3 == 0)
        .select(s.alias("seed"))
        .distinct()
    )
    return edges, seeds


def test_betweenness_parity(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        betweenness_sampled,
    )

    edges, seeds = _bipartite(spark)
    got = (
        betweenness_sampled(edges, seeds, hops=2, topk=100)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(
            betw_oracle(f"read_parquet('{SF}/lineitem.parquet')", 3)
        )
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert (got["betweenness_fp"] > 0).any()


def test_betweenness_hand_path(spark):
    """Path a-b-c-d, seed a, hops=3: delta(c) = 1/1*(1+0) = 1e6 (c
    brokers a->d), delta(b) = 1/1*(1+delta(c)) = 2e6 (b brokers
    a->c AND a->d) — the classic Brandes accumulation."""
    from kafka_streams_aggregate_spark.operators.graph import (
        betweenness_sampled,
    )

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    rows = und + [(y, x) for x, y in und]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "seed string")
    out = {
        r["node"]: r["betweenness_fp"]
        for r in betweenness_sampled(edges, seeds, hops=3).collect()
    }
    assert out == {"b": 2_000_000, "c": 1_000_000}


def test_betweenness_hand_diamond(spark):
    """Diamond a-b-d / a-c-d, seed a, hops=2: sigma(d) = 2, so b and
    c each carry HALF the a->d dependency: delta = 1*(1e6+0) div 2 =
    500000 each — the path-count split naive BFS counting misses."""
    from kafka_streams_aggregate_spark.operators.graph import (
        betweenness_sampled,
    )

    und = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    rows = und + [(y, x) for x, y in und]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "seed string")
    out = {
        r["node"]: r["betweenness_fp"]
        for r in betweenness_sampled(edges, seeds, hops=2).collect()
    }
    assert out == {"b": 500_000, "c": 500_000}


def test_betweenness_two_seeds_sum(spark):
    """Path a-b-c with seeds {a, c}, hops=2: b brokers one pair from
    each direction -> betweenness 2e6 (per-seed deltas SUM)."""
    from kafka_streams_aggregate_spark.operators.graph import (
        betweenness_sampled,
    )

    und = [("a", "b"), ("b", "c")]
    rows = und + [(y, x) for x, y in und]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("c",)], "seed string")
    out = {
        r["node"]: r["betweenness_fp"]
        for r in betweenness_sampled(edges, seeds, hops=2).collect()
    }
    assert out == {"b": 2_000_000}
