"""Round-13 staging — int8 embedding-quantization recall audit
(operators/similarity.py:int8_quant_recall). Registration-ready
oracle text in INT8_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

INT8_ORACLE = """
    WITH sc AS (
        SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS e,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                    x -> abs(x))) AS s
        FROM read_parquet('{sf}/embeddings.parquet')
    ),
    coded AS (
        SELECT vid,
               list_transform(e, x -> CAST(floor(127 * x / s) AS BIGINT))
                   AS c8,
               list_transform(e, x -> CAST(floor(1048576 * x / s)
                   AS BIGINT)) AS cr
        FROM sc WHERE s > 0
    ),
    nrm AS (
        SELECT vid, c8, cr,
               CAST(list_sum(list_transform(c8, x -> x * x)) AS BIGINT)
                   AS n8,
               CAST(list_sum(list_transform(cr, x -> x * x)) AS BIGINT)
                   AS nr
        FROM coded
    ),
    pairs AS (
        SELECT p.vid AS pid, c.vid AS vid,
               CAST(list_dot_product(p.c8, c.c8) AS DOUBLE)
                   / (sqrt(CAST(p.n8 AS DOUBLE)) * sqrt(CAST(c.n8 AS DOUBLE)))
                   AS cos8,
               CAST(list_dot_product(p.cr, c.cr) AS DOUBLE)
                   / (sqrt(CAST(p.nr AS DOUBLE)) * sqrt(CAST(c.nr AS DOUBLE)))
                   AS cosr
        FROM nrm p JOIN nrm c ON c.vid <> p.vid
        WHERE p.vid % 50 = 0
    ),
    top8 AS (
        SELECT pid, vid FROM (
            SELECT pid, vid, row_number() OVER (PARTITION BY pid
                   ORDER BY cos8 DESC, vid) AS r FROM pairs)
        WHERE r <= 10
    ),
    topr AS (
        SELECT pid, vid FROM (
            SELECT pid, vid, row_number() OVER (PARTITION BY pid
                   ORDER BY cosr DESC, vid) AS r FROM pairs)
        WHERE r <= 10
    ),
    hits AS (
        SELECT t.pid, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM top8 t JOIN topr r ON r.pid = t.pid AND r.vid = t.vid
        GROUP BY t.pid
    ),
    base AS (
        SELECT pid, CAST(COUNT(*) AS BIGINT) AS k FROM topr GROUP BY pid
    )
    SELECT base.pid AS probe_id, k,
           CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
           CAST((1000000 * COALESCE(n_hit, 0)) // k AS BIGINT)
               AS recall_ppm
    FROM base LEFT JOIN hits ON hits.pid = base.pid
"""


def test_int8_recall_parity(spark):
    from kafka_streams_aggregate_spark.operators.similarity import (
        int8_quant_recall,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    got = (
        int8_quant_recall(emb, k=10, probe_mod=50)
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(INT8_ORACLE.format(sf=SF))
        .df()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # int8 keeps most of the neighborhood (the audit's whole point);
    # it is NOT vacuously perfect on every probe at 2000 vectors
    assert got["recall_ppm"].mean() > 600_000


def test_int8_codes_are_within_range(spark):
    """Codes bounded by construction: |floor(127*x/maxabs)| <= 127,
    and the max-magnitude component hits exactly +127 or -128."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF).select(
        F.expr("CAST(embedding AS array<double>)").alias("e")
    ).select(
        F.expr(
            "transform(e, x -> CAST(floor(127 * x /"
            " array_max(transform(e, y -> abs(y)))) AS BIGINT))"
        ).alias("c8")
    )
    row = emb.select(
        F.max(F.expr("array_max(c8)")).alias("hi"),
        F.min(F.expr("array_min(c8)")).alias("lo"),
    ).collect()[0]
    assert row["hi"] == 127 and row["lo"] >= -128


def test_int8_recall_hand_identical_vectors(spark):
    """Probe 0 with two exact duplicates and seven noise vectors at
    k=2: both rankings put the duplicates first -> recall 1e6."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        int8_quant_recall,
    )

    base = [0.5, -0.25, 0.125, 1.0]
    rows = [(0, base), (50, base), (100, base)] + [
        (i, [((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(4)])
        for i in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["probe_id"]: r
        for r in int8_quant_recall(df, k=2, probe_mod=50).collect()
    }
    assert 0 in got and got[0]["recall_ppm"] == 1_000_000
