"""Grid-file spatial self-join — pre-validation for the round-11
registration queue (operators/spatial.py:grid_neighbor_join).

Candidates from radius-sized grid cells (3x3 neighborhood), exact
squared-Euclidean verify — the LSH candidates-then-verify shape with
the grid as the band index. The oracle is the direct quadratic pair
join (fine at sf0.001; the OPERATOR never materializes it).
Registration-ready oracle text in GRID_JOIN_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
RADIUS = 256

GRID_JOIN_ORACLE = """
    WITH pts AS (
        SELECT CAST(o_orderkey AS BIGINT) AS id,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT AS x,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))::BIGINT AS y
        FROM read_parquet('{sf}/orders.parquet')
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {r} * {r}
"""


def _spark_points(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "orders", SF).select(
        F.col("o_orderkey").alias("id"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 5, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("y"),
    )


def test_grid_join_parity(spark):
    from kafka_streams_aggregate_spark.operators.spatial import (
        grid_neighbor_join,
    )

    got = (
        grid_neighbor_join(_spark_points(spark), "id", "x", "y", RADIUS)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(GRID_JOIN_ORACLE.format(sf=SF, r=RADIUS))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_grid_join_hand_values(spark):
    """(0,0)-(3,4) at distance 5 included at r=5 (25 <= 25); (0,0)-
    (6,0) at 6 excluded; cross-cell pair (4,0)-(9,0) at 5 included
    (cells 0 and 1 at cell size 5 — the neighborhood explode)."""
    from kafka_streams_aggregate_spark.operators.spatial import (
        grid_neighbor_join,
    )

    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 3, 4), (3, 6, 0), (4, 9, 0)],
        "id long, x long, y long",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in grid_neighbor_join(pts, "id", "x", "y", 5).collect()
    }
    assert rows[(1, 2)] == 25
    assert (1, 3) not in rows  # dist 6 > 5
    assert rows[(3, 4)] == 9
    assert rows[(2, 3)] == 25  # (3,4)-(6,0): 9+16
