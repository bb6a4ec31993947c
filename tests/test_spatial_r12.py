"""Spatial round-12 staging — 3-D Morton buckets and bounded-radius
kNN (operators/spatial.py). Registration-ready oracle texts in
ZORDER3D_ORACLE / KNN_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.operators.spatial import morton3_expr_sql

SF = "/root/testdata/sf0.001"

ZORDER3D_ORACLE = """
    WITH pts AS (
        SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT AS x,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))::BIGINT AS y,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4))::BIGINT AS z
        FROM read_parquet('{sf}/orders.parquet')
    ),
    coded AS (SELECT x, y, z, {morton} AS m FROM pts)
    SELECT CAST(m // {shift} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max,
           CAST(MIN(z) AS BIGINT) AS z_min, CAST(MAX(z) AS BIGINT) AS z_max
    FROM coded GROUP BY 1
""".replace(
    "{morton}", morton3_expr_sql("x", "y", "z", 16, idiv="//")
).replace(
    "{shift}", str(1 << (3 * 16 - 6))
)

KNN_ORACLE = """
    WITH pts AS (
        SELECT CAST(o_orderkey AS BIGINT) AS id,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT AS x,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))::BIGINT AS y
        FROM read_parquet('{sf}/orders.parquet')
    ),
    q AS (SELECT * FROM pts WHERE id % 20 = 0),
    cand AS (
        SELECT q.id AS id_a, p.id AS id_b,
               CAST((q.x - p.x) * (q.x - p.x)
                    + (q.y - p.y) * (q.y - p.y) AS BIGINT) AS dist_sq
        FROM q JOIN pts p ON q.id <> p.id
        WHERE (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y)
              <= {r} * {r}
    )
    SELECT id_a, id_b, dist_sq,
           CAST(row_number() OVER (PARTITION BY id_a
                                   ORDER BY dist_sq, id_b) AS BIGINT) AS rank
    FROM cand QUALIFY rank <= {k}
"""


def _pts(spark, with_z=False):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    cols = [
        F.col("o_orderkey").alias("id"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 5, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("y"),
    ]
    if with_z:
        cols.append(
            F.expr(
                "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 9, 4),"
                " 16, 10) AS BIGINT)"
            ).alias("z")
        )
    return load_table(spark, "orders", SF).select(*cols)


def test_zorder3d_parity(spark):
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder3d_bucket_stats,
    )

    got = (
        zorder3d_bucket_stats(
            _pts(spark, with_z=True), "x", "y", "z", bits=16, bucket_bits=6
        )
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ZORDER3D_ORACLE.format(sf=SF))
        .df()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_zorder3d_buckets_are_octree_cells(spark):
    """bucket_bits=6 -> top 2 bits per axis -> every bucket bbox sits
    inside one aligned 2^14-wide octree cell on all three axes."""
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder3d_bucket_stats,
    )

    rows = zorder3d_bucket_stats(
        _pts(spark, with_z=True), "x", "y", "z", bits=16, bucket_bits=6
    ).collect()
    assert len(rows) == 64  # uniform points fill all 2^6 buckets
    cell = 1 << 14
    for r in rows:
        assert r["x_min"] // cell == r["x_max"] // cell
        assert r["y_min"] // cell == r["y_max"] // cell
        assert r["z_min"] // cell == r["z_max"] // cell


def test_morton3_hand_value(spark):
    """morton3(1, 1, 1) = bits 0+1+2 = 7; morton3(2, 0, 0): x bit 1
    -> out bit 3 = 8."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 1, 1), (2, 0, 0)], "x long, y long, z long")
    got = [
        r["m"]
        for r in df.select(
            F.expr(morton3_expr_sql("x", "y", "z", 2)).alias("m")
        ).collect()
    ]
    assert got == [7, 8]


def test_knn_grid_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.spatial import knn_grid

    pts = _pts(spark)
    queries = pts.where(F.col("id") % 20 == 0).select("id")
    got = (
        knn_grid(pts, queries, "id", "x", "y", radius=2048, k=5)
        .toPandas()
        .sort_values(["id_a", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(KNN_ORACLE.format(sf=SF, r=2048, k=5))
        .df()
        .sort_values(["id_a", "rank"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_knn_grid_hand_values(spark):
    """Query at (0,0), neighbors at 3-4-5 distances; k=2 keeps the
    two nearest; a point beyond the radius never appears even if k
    has room; cross-cell neighbor found (cell size = radius = 5)."""
    from kafka_streams_aggregate_spark.operators.spatial import knn_grid

    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 3, 0), (3, 0, 4), (4, 3, 4), (5, 100, 100)],
        "id long, x long, y long",
    )
    q = spark.createDataFrame([(1,)], "id long")
    rows = knn_grid(pts, q, "id", "x", "y", radius=5, k=2).collect()
    assert [(r["rank"], r["id_b"], r["dist_sq"]) for r in rows] == [
        (1, 2, 9),
        (2, 3, 16),
    ]
    rows3 = knn_grid(pts, q, "id", "x", "y", radius=5, k=10).collect()
    assert [(r["id_b"], r["dist_sq"]) for r in rows3] == [
        (2, 9), (3, 16), (4, 25),
    ]
