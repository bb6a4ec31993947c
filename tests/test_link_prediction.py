"""Resource-allocation link prediction — pre-validation for the
round-11 registration queue (operators/graph.py:link_prediction_ra).

RA = sum over common neighbors of scale div deg(z) — the log-free
member of the common-neighbor family (Adamic-Adar needs the banned
ln), exact int64 cross-engine. Registration-ready oracle text in
RA_ORACLE (support->=2 co-purchase edges, same family as
q_triangle_per_node).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

RA_ORACLE = """
    WITH ik AS (SELECT DISTINCT l_orderkey, l_partkey
                FROM read_parquet('{sf}/lineitem.parquet')),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM ik a JOIN ik b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (
        SELECT src AS z, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ),
    wedges AS (
        SELECT za.dst AS node_a, zb.dst AS node_b, d.deg
        FROM sym za
        JOIN sym zb ON zb.src = za.src AND za.dst < zb.dst
        JOIN deg d ON d.z = za.src
    ),
    scored AS (
        SELECT node_a, node_b,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(1000000000 // deg) AS BIGINT) AS ra_scaled
        FROM wedges GROUP BY node_a, node_b
    ),
    nonedges AS (
        SELECT s.* FROM scored s
        LEFT JOIN edges e
          ON e.src = s.node_a AND e.dst = s.node_b
        WHERE e.src IS NULL
    )
    SELECT node_a, node_b, n_common, ra_scaled,
           CAST(row_number() OVER (
               ORDER BY ra_scaled DESC, node_a, node_b) AS BIGINT) AS rank
    FROM nonedges QUALIFY rank <= 100
"""


def _edges(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    ik = li.select("l_orderkey", "l_partkey").distinct()
    a = ik.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("src")
    )
    b = ik.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("dst")
    )
    return (
        a.join(b, "_ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_support"))
        .where(F.col("_support") >= 2)
        .select("src", "dst")
    )


def test_ra_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        link_prediction_ra,
    )

    got = (
        link_prediction_ra(_edges(spark), topk=100)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(RA_ORACLE.format(sf=SF))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_ra_hand_graph(spark):
    """Path 1-2-3 plus hub 2-4: non-edges scored through hub 2
    (deg 3); existing edges excluded; (1,3),(1,4),(3,4) all share
    exactly hub 2 -> ra = 10^9 div 3 each."""
    from kafka_streams_aggregate_spark.operators.graph import (
        link_prediction_ra,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["ra_scaled"])
        for r in link_prediction_ra(edges, topk=10).collect()
    }
    third = 10**9 // 3
    assert got == {
        (1, 3): (1, third),
        (1, 4): (1, third),
        (3, 4): (1, third),
    }
