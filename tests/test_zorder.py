"""Z-order (Morton) bucketing — pre-validation for the round-11
registration queue (operators/spatial.py).

Coordinates are synthesized from the md5 hash family (the repo's
round-8 rule: prime-multiplier lattices produce no spatial structure;
md5 gives uniform, cross-engine-identical 16-bit coordinates). The
interleave itself comes from ONE generator (morton_expr_sql) emitted
into both engines, differing only in the integer-division token.
Registration-ready oracle text in ZORDER_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.operators.spatial import morton_expr_sql

SF = "/root/testdata/sf0.001"

ZORDER_ORACLE = """
    WITH pts AS (
        SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT AS x,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))::BIGINT AS y
        FROM read_parquet('{sf}/orders.parquet')
    ),
    coded AS (SELECT x, y, {morton} AS morton FROM pts)
    SELECT CAST(morton // 67108864 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(x) AS BIGINT) AS x_min,
           CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min,
           CAST(MAX(y) AS BIGINT) AS y_max
    FROM coded GROUP BY 1
""".replace(
    "{morton}", morton_expr_sql("x", "y", 16, idiv="//")
)


def _spark_points(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "orders", SF).select(
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 5, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("y"),
    )


def test_zorder_bucket_parity(spark):
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder_bucket_stats,
    )

    got = (
        zorder_bucket_stats(_spark_points(spark), "x", "y", bits=16, bucket_bits=6)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ZORDER_ORACLE.format(sf=SF))
        .df()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_zorder_buckets_are_aligned_tiles(spark):
    """bucket_bits=6 gives each coordinate its top 3 bits -> every
    bucket's bbox sits inside one aligned 2^13-wide tile (the locality
    property that makes code-range file stats prune 2-D predicates)."""
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder_bucket_stats,
    )

    rows = zorder_bucket_stats(
        _spark_points(spark), "x", "y", bits=16, bucket_bits=6
    ).collect()
    assert len(rows) == 64  # 1500 uniform points fill all 2^6 buckets
    tile = 1 << 13
    for r in rows:
        assert r["x_min"] // tile == r["x_max"] // tile
        assert r["y_min"] // tile == r["y_max"] // tile


def test_morton_hand_value(spark):
    """morton(3, 1): x bits {0,1} -> out bits {0,2} = 5; y bit {0} ->
    out bit {1} = 2; code 7."""
    from kafka_streams_aggregate_spark.operators.spatial import morton_key

    df = spark.createDataFrame([(3, 1)], "x long, y long")
    [r] = morton_key(df, "x", "y", bits=2).collect()
    assert r["morton"] == 7
