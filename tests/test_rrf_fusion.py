"""Reciprocal-rank fusion — pre-validation for the round-10
registration queue (operators/similarity.py:rrf_fuse).

The fused query: cosine top-20 and raw-dot-product top-20 rankings over
the embeddings table for 5 query points, RRF-combined into a fused
top-10. Oracle text registration-ready; both rankers reuse the repo's
exact vector-expression rules (DOUBLE[] casts, sequential fold,
single-sqrt cosine) so the input ranks are already cell-exact.
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

RRF_ORACLE = f"""
    WITH emb AS (
        SELECT * FROM read_parquet('{{sf}}/embeddings.parquet')
    ),
    q AS (
        SELECT vec_id AS qid, embedding AS qv FROM emb WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.qid, e.vec_id AS nid,
               {_COS} AS cs,
               list_inner_product(CAST(q.qv AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])) AS dp
        FROM q, emb e WHERE e.vec_id <> q.qid
    ),
    ra AS (
        SELECT qid, nid,
               row_number() OVER (
                   PARTITION BY qid ORDER BY cs DESC, nid) AS r
        FROM scored QUALIFY r <= 20
    ),
    rb AS (
        SELECT qid, nid,
               row_number() OVER (
                   PARTITION BY qid ORDER BY dp DESC, nid) AS r
        FROM scored QUALIFY r <= 20
    ),
    u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
    fused AS (
        SELECT qid, nid,
               CAST(SUM(1000000000000 // (60 + r)) AS BIGINT)
                   AS rrf_scaled,
               CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM u GROUP BY qid, nid
    )
    SELECT qid AS query_id, nid AS neighbor_id, rrf_scaled, n_lists,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY rrf_scaled DESC, nid) AS BIGINT) AS fused_rank
    FROM fused QUALIFY fused_rank <= 10
"""


def _spark_frame(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.functions.vectors import (
        as_double_array,
        dot,
    )
    from kafka_streams_aggregate_spark.operators.similarity import (
        cosine_topk,
        rrf_fuse,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ra = cosine_topk(emb, queries, k=20).select(
        "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank")
    )
    # second ranker: raw dot product (different norm -> different order)
    q = queries.select("query_id", as_double_array("embedding").alias("_qv"))
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("_cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("_qv"), F.col("_cv")).alias("dp"),
        )
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("dp").desc(), F.col("neighbor_id").asc()
    )
    rb = (
        scored.withColumn("rank", F.row_number().over(wb).cast("bigint"))
        .filter(F.col("rank") <= 20)
        .select("query_id", "neighbor_id", "rank")
    )
    return rrf_fuse(ra.unionAll(rb), topk=10)


def test_rrf_parity_sf0001(spark):
    got = (
        _spark_frame(spark)
        .toPandas()
        .sort_values(["query_id", "fused_rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(RRF_ORACLE.format(sf=SF))
        .df()
        .sort_values(["query_id", "fused_rank"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_rrf_hand_values(spark):
    """Two 3-doc lists with a shared winner: hand-computed fusion."""
    from kafka_streams_aggregate_spark.operators.similarity import rrf_fuse

    rows = [
        # (query, doc, rank) — list A
        (1, 10, 1), (1, 11, 2), (1, 12, 3),
        # list B: doc 11 tops, doc 10 second
        (1, 11, 1), (1, 10, 2), (1, 13, 3),
    ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id int, rank int"
    )
    got = {
        r["neighbor_id"]: (r["rrf_scaled"], r["n_lists"], r["fused_rank"])
        for r in rrf_fuse(df, k=60, scale=10**12, topk=10).collect()
    }
    s = 10**12
    # doc 10: 1/(60+1) + 1/(60+2); doc 11: 1/(60+1) + 1/(60+2) (tie!)
    # doc 12: 1/63; doc 13: 1/63 — doc-id tiebreak orders both pairs
    assert got[10] == (s // 61 + s // 62, 2, 1)
    assert got[11] == (s // 61 + s // 62, 2, 2)
    assert got[12] == (s // 63, 1, 3)
    assert got[13] == (s // 63, 1, 4)
