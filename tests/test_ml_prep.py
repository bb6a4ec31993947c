"""Stratified k-fold CV + hard-negative mining — pre-validation for
the round-10 registration queue (operators/sampling.py,
operators/similarity.py). Oracle texts registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

KFOLD_ORACLE = """
    SELECT lang AS stratum, doc_id AS id,
           CAST((row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(CONCAT('0x', substr(md5(
                   'cv|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                   doc_id) - 1) % 5 AS BIGINT) AS fold
    FROM read_parquet('{sf}/documents.parquet')
"""

_COS = (
    "list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))"
    " / sqrt(list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))"
    " * list_inner_product(CAST(e.embedding AS DOUBLE[]),"
    " CAST(e.embedding AS DOUBLE[])))"
)

HARDNEG_ORACLE = f"""
    WITH emb AS (
        SELECT * FROM read_parquet('{{sf}}/embeddings.parquet')
    ),
    q AS (
        SELECT vec_id AS query_id, label AS query_label,
               embedding AS qv
        FROM emb WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, q.query_label,
               e.vec_id AS neighbor_id, e.label AS neighbor_label,
               {_COS} AS sim
        FROM q JOIN emb e ON e.label <> q.query_label
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, sim,
           CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 3
"""


def test_kfold_parity_and_balance(spark):
    from kafka_streams_aggregate_spark.operators.sampling import (
        stratified_kfold,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        stratified_kfold(docs, "lang", "doc_id", k=5)
        .toPandas()
        .sort_values(["stratum", "id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(KFOLD_ORACLE.format(sf=SF))
        .df()
        .sort_values(["stratum", "id"])
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # stratification guarantee: per stratum, fold sizes differ by <= 1
    sizes = got.groupby(["stratum", "fold"]).size()
    for stratum, grp in sizes.groupby(level=0):
        assert grp.max() - grp.min() <= 1, f"unbalanced folds in {stratum}"


def test_hard_negative_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.similarity import (
        hard_negative_topk,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    got = (
        hard_negative_topk(emb, queries, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(HARDNEG_ORACLE.format(sf=SF))
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert (got["query_label"] != got["neighbor_label"]).all()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
