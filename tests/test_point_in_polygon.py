"""Point-in-polygon (exact integer ray cast) — pre-validation for the
round-10 registration queue (operators/joins.py:point_in_polygon).

Points get md5-derived lattice coordinates (the hash-family rule for
synthetic coordinates); the polygon is a non-convex L-shape, so the
crossing-number parity genuinely matters. Oracle text
registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# L-shape: unit square 60x60 with the top-right 30x30 notch removed
L_POLY = [(0, 0), (60, 0), (60, 30), (30, 30), (30, 60), (0, 60)]

_EDGES_SQL = ", ".join(
    f"({x1}, {y1}, {x2}, {y2})"
    for (x1, y1), (x2, y2) in zip(L_POLY, L_POLY[1:] + L_POLY[:1])
)

PIP_ORACLE = f"""
    WITH pts AS (
        SELECT doc_id AS id,
               CAST(CONCAT('0x', substr(md5(
                   'px|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 AS px,
               CAST(CONCAT('0x', substr(md5(
                   'py|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 AS py
        FROM read_parquet('{{sf}}/documents.parquet')
    ),
    edges(x1, y1, x2, y2) AS (VALUES {_EDGES_SQL}),
    joined AS (
        SELECT p.id, p.px, p.py,
               CASE WHEN (e.y1 <= p.py) <> (e.y2 <= p.py)
                     AND (((e.y2 > e.y1) AND
                           (e.x2 - e.x1) * (p.py - e.y1)
                           - (p.px - e.x1) * (e.y2 - e.y1) > 0)
                       OR ((e.y2 < e.y1) AND
                           (e.x2 - e.x1) * (p.py - e.y1)
                           - (p.px - e.x1) * (e.y2 - e.y1) < 0))
                    THEN 1 ELSE 0 END AS crossed
        FROM pts p CROSS JOIN edges e
    )
    SELECT id, px, py,
           CAST(SUM(crossed) AS BIGINT) AS n_crossings,
           CAST(SUM(crossed) % 2 AS BIGINT) AS inside
    FROM joined GROUP BY id, px, py
"""


def _points(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.functions.hashing import hash60
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    return docs.select(
        F.col("doc_id").alias("id"),
        (
            hash60(F.concat(F.lit("px|"), F.col("doc_id").cast("string")))
            % 100
        ).alias("px"),
        (
            hash60(F.concat(F.lit("py|"), F.col("doc_id").cast("string")))
            % 100
        ).alias("py"),
    )


def test_pip_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.joins import (
        point_in_polygon,
    )

    got = (
        point_in_polygon(_points(spark), L_POLY)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(PIP_ORACLE.format(sf=SF))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    # both classes must occur or the polygon test is vacuous
    assert set(got["inside"]) == {0, 1}
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_pip_hand_points(spark):
    """Known geometry: (10,10) inside the L; (50,50) in the notch ->
    outside; (70,10) right of everything -> outside; (10,50) in the
    left arm -> inside."""
    from kafka_streams_aggregate_spark.operators.joins import (
        point_in_polygon,
    )

    pts = spark.createDataFrame(
        [(1, 10, 10), (2, 50, 50), (3, 70, 10), (4, 10, 50)],
        "id long, px long, py long",
    )
    got = {
        r["id"]: r["inside"]
        for r in point_in_polygon(pts, L_POLY).collect()
    }
    assert got == {1: 1, 2: 0, 3: 0, 4: 1}
