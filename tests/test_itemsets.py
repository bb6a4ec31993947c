"""Round-13 staging — frequent 3-itemsets (operators/graph.py).
Registration-ready oracle text in TRIPLES_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

TRIPLES_ORACLE = """
    WITH ik AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    triples AS (
        SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM ik a
        JOIN ik b ON b.bk = a.bk AND a.item < b.item
        JOIN ik c ON c.bk = a.bk AND b.item < c.item
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= {support}
    )
    SELECT item_a, item_b, item_c, support,
           CAST(row_number() OVER (ORDER BY support DESC,
                item_a, item_b, item_c) AS BIGINT) AS rank
    FROM triples QUALIFY rank <= 100
"""


def test_triples_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import (
        frequent_itemset_triples,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ik = (
        load_table(spark, "lineitem", SF)
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
    )
    got = (
        frequent_itemset_triples(ik, min_support=2, topk=100)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(TRIPLES_ORACLE.format(sf=SF, support=2))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_triples_hand_values(spark):
    """Baskets {1,2,3}, {1,2,3,4}, {1,2,4}: triple (1,2,3) support 2,
    (1,2,4) support 2, (1,3,4)/(2,3,4) support 1 -> min_support=2
    keeps exactly two triples; canonical a<b<c ordering."""
    from kafka_streams_aggregate_spark.operators.graph import (
        frequent_itemset_triples,
    )

    rows = (
        [(10, i) for i in (1, 2, 3)]
        + [(20, i) for i in (1, 2, 3, 4)]
        + [(30, i) for i in (1, 2, 4)]
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["support"]
        for r in frequent_itemset_triples(df, min_support=2).collect()
    }
    assert got == {(1, 2, 3): 2, (1, 2, 4): 2}
