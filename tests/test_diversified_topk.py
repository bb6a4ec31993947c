"""Diversified top-k — pre-validation for the round-10 registration
queue (operators/similarity.py:diversified_topk). Candidates are exact
cosine scores over embeddings, diversity axis = label; per-label cap 2,
final top-10. Oracle text registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_COS = (
    "list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))"
    " / sqrt(list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))"
    " * list_inner_product(CAST(e.embedding AS DOUBLE[]),"
    " CAST(e.embedding AS DOUBLE[])))"
)

DTOPK_ORACLE = f"""
    WITH emb AS (
        SELECT * FROM read_parquet('{{sf}}/embeddings.parquet')
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM emb
        WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, e.label AS src, e.vec_id AS neighbor_id,
               {_COS} AS score
        FROM q JOIN emb e ON e.vec_id <> q.query_id
    ),
    capped AS (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id, src
                   ORDER BY score DESC, neighbor_id ASC) AS BIGINT)
                   AS src_rank
        FROM scored QUALIFY src_rank <= 2
    )
    SELECT query_id, src, neighbor_id, score, src_rank,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY score DESC, neighbor_id ASC) AS BIGINT)
               AS final_rank
    FROM capped QUALIFY final_rank <= 10
"""


def test_diversified_topk_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.functions.vectors import (
        as_double_array,
        cosine,
    )
    from kafka_streams_aggregate_spark.operators.similarity import (
        diversified_topk,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        as_double_array("embedding").alias("_qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("src"),
        as_double_array("embedding").alias("_cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "src",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("score"),
        )
    )
    got = (
        diversified_topk(scored, "query_id", "neighbor_id", "src", "score")
        .toPandas()
        .sort_values(["query_id", "final_rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(DTOPK_ORACLE.format(sf=SF))
        .df()
        .sort_values(["query_id", "final_rank"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    # the diversity cap must hold and must have actually bitten
    per = got.groupby(["query_id", "src"]).size()
    assert per.max() <= 2
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_diversified_topk_hand(spark):
    """One source dominates raw scores; the cap forces source variety."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        diversified_topk,
    )

    rows = [
        # query 1: source A holds the 4 best raw scores
        (1, "A", 10, 0.99), (1, "A", 11, 0.98), (1, "A", 12, 0.97),
        (1, "A", 13, 0.96), (1, "B", 20, 0.95), (1, "B", 21, 0.94),
        (1, "C", 30, 0.93),
    ]
    df = spark.createDataFrame(
        rows, "query_id int, src string, neighbor_id int, score double"
    )
    got = [
        (r["neighbor_id"], r["final_rank"])
        for r in diversified_topk(
            df, "query_id", "neighbor_id", "src", "score",
            per_group=2, topk=5,
        )
        .orderBy("final_rank")
        .collect()
    ]
    # A capped to its best two; 12/13 evicted despite higher raw scores
    assert got == [(10, 1), (11, 2), (20, 3), (21, 4), (30, 5)]
