"""HITS hub/authority — pre-validation for the round-10 registration
queue (operators/graph.py:hits_scores).

Unnormalized integer HITS over a DIRECTED co-purchase graph (edge
src < dst, so hub and auth genuinely differ). The oracle unrolls the
two iterations as plain join+sum CTEs — all exact int64.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

HITS_ORACLE = """
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM read_parquet('{sf}/lineitem.parquet') a
        JOIN read_parquet('{sf}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (
        SELECT src AS node FROM edges
        UNION SELECT dst FROM edges
    ),
    a1 AS (  -- h0 = 1 everywhere: a1(v) = in-degree
        SELECT e.dst AS node, CAST(COUNT(*) AS BIGINT) AS a
        FROM edges e GROUP BY e.dst
    ),
    h1 AS (
        SELECT e.src AS node, CAST(SUM(COALESCE(a1.a, 0)) AS BIGINT) AS h
        FROM edges e LEFT JOIN a1 ON a1.node = e.dst GROUP BY e.src
    ),
    a2 AS (
        SELECT e.dst AS node, CAST(SUM(COALESCE(h1.h, 0)) AS BIGINT) AS a
        FROM edges e LEFT JOIN h1 ON h1.node = e.src GROUP BY e.dst
    ),
    h2 AS (
        SELECT e.src AS node, CAST(SUM(COALESCE(a2.a, 0)) AS BIGINT) AS h
        FROM edges e LEFT JOIN a2 ON a2.node = e.dst GROUP BY e.src
    )
    SELECT n.node,
           CAST(COALESCE(h2.h, 0) AS BIGINT) AS hub,
           CAST(COALESCE(a2.a, 0) AS BIGINT) AS auth
    FROM nodes n
    LEFT JOIN h2 ON h2.node = n.node
    LEFT JOIN a2 ON a2.node = n.node
"""


def _edges(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    return (
        sets.select(F.explode("ps").alias("src"), F.col("ps"))
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )


def test_hits_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.graph import hits_scores

    got = (
        hits_scores(_edges(spark), iters=2)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(HITS_ORACLE.format(sf=SF))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    # directed graph: hub and auth must genuinely differ somewhere
    assert (got["hub"] != got["auth"]).any()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_hits_hand_graph(spark):
    """1->3, 2->3, 3->4: hand-unrolled two iterations."""
    from kafka_streams_aggregate_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_scores(edges, iters=2).collect()
    }
    # a1 = in-deg: {3:2, 4:1}; h1 = {1:2, 2:2, 3:1}
    # a2 = {3: h1(1)+h1(2)=4, 4: h1(3)=1}; h2 = {1:4, 2:4, 3:1}
    assert got == {1: (4, 0), 2: (4, 0), 3: (1, 4), 4: (0, 1)}


def test_hits_partitioning_invariance(spark):
    from kafka_streams_aggregate_spark.operators.graph import hits_scores

    e = _edges(spark)
    a = (
        hits_scores(e, iters=2)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        hits_scores(e.repartition(13), iters=2)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
