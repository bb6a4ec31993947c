"""Z-order pruning win quantified — pre-validation for the round-11
registration queue (operators/spatial.py:zorder_prune_compare).

Same data, same bucket count, two layouts; scanned rows = buckets
whose real (x, y) bbox intersects the query box (parquet row-group
stats semantics). The zorder layout must scan strictly fewer rows
than the x-sorted layout on a 2-D box — the whole point of the
operator family. Registration-ready oracle text in PRUNE_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.operators.spatial import morton_expr_sql

SF = "/root/testdata/sf0.001"
BOX = dict(x_lo=10_000, x_hi=12_000, y_lo=30_000, y_hi=34_000)
BITS, BUCKET_BITS = 16, 10

PRUNE_ORACLE = """
    WITH pts AS (
        SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT AS x,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))::BIGINT AS y
        FROM read_parquet('{sf}/orders.parquet')
    ),
    coded AS (
        SELECT x, y,
               ({morton}) // {zshift} AS zb,
               x // {xwidth} AS xb
        FROM pts
    ),
    totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN x BETWEEN {x_lo} AND {x_hi}
                              AND y BETWEEN {y_lo} AND {y_hi}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        FROM coded
    ),
    layouts AS (
        SELECT 'zorder' AS layout, zb AS b, COUNT(*) AS n,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(y) AS y_min, MAX(y) AS y_max
        FROM coded GROUP BY zb
        UNION ALL
        SELECT 'xsort', xb, COUNT(*), MIN(x), MAX(x), MIN(y), MAX(y)
        FROM coded GROUP BY xb
    ),
    agg AS (
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(CASE WHEN NOT (x_max < {x_lo} OR x_min > {x_hi}
                                   OR y_max < {y_lo} OR y_min > {y_hi})
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS buckets_scanned,
               CAST(SUM(CASE WHEN NOT (x_max < {x_lo} OR x_min > {x_hi}
                                   OR y_max < {y_lo} OR y_min > {y_hi})
                             THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
        FROM layouts GROUP BY layout
    )
    SELECT layout, n_total, n_match, n_buckets, buckets_scanned,
           rows_scanned,
           CAST((1000000 * rows_scanned) // n_total AS BIGINT) AS scan_ppm
    FROM agg CROSS JOIN totals
""".replace(
    "{morton}", morton_expr_sql("x", "y", BITS, idiv="//")
).replace(
    "{zshift}", str(1 << (2 * BITS - BUCKET_BITS))
).replace(
    "{xwidth}", str((1 << BITS) // (1 << BUCKET_BITS))
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


def test_zorder_prune_parity(spark):
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder_prune_compare,
    )

    got = (
        zorder_prune_compare(
            _spark_points(spark), "x", "y",
            BOX["x_lo"], BOX["x_hi"], BOX["y_lo"], BOX["y_hi"],
            bits=BITS, bucket_bits=BUCKET_BITS,
        )
        .toPandas()
        .sort_values("layout")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(PRUNE_ORACLE.format(sf=SF, **BOX))
        .df()
        .sort_values("layout")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) == 2
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_zorder_prunes_more_than_xsort(spark):
    """The claim the operator exists to make: on a 2-D box, quadtree
    tiles scan fewer rows than x-stripes at equal bucket count, and
    both scan at least the matching rows (stats pruning is sound)."""
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder_prune_compare,
    )

    rows = {
        r["layout"]: r
        for r in zorder_prune_compare(
            _spark_points(spark), "x", "y",
            BOX["x_lo"], BOX["x_hi"], BOX["y_lo"], BOX["y_hi"],
            bits=BITS, bucket_bits=BUCKET_BITS,
        ).collect()
    }
    z, xs = rows["zorder"], rows["xsort"]
    assert z["rows_scanned"] < xs["rows_scanned"]
    assert z["rows_scanned"] >= z["n_match"] > 0
    assert xs["rows_scanned"] >= xs["n_match"]
