"""Bipartite projection — pre-validation for the round-11 registration
queue (operators/graph.py:bipartite_projection).

Customer x part purchase relation projected onto parts with cosine
weights n_ab / sqrt(n_a*n_b) — n's exact int64, weight one multiply +
one IEEE-exact sqrt + one divide (hex-pinned bit-equal).
Registration-ready oracle text in BIPARTITE_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

BIPARTITE_ORACLE = """
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
    ),
    sizes AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS n FROM cp GROUP BY part
    ),
    co AS (
        SELECT a.part AS item_a, b.part AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM cp a JOIN cp b
          ON b.cust = a.cust AND a.part < b.part
        GROUP BY a.part, b.part
        HAVING COUNT(*) >= 2
    ),
    weighted AS (
        SELECT co.item_a, co.item_b, co.n_common,
               sa.n AS n_a, sb.n AS n_b,
               CAST(co.n_common AS DOUBLE)
                   / sqrt(CAST(sa.n * sb.n AS DOUBLE)) AS weight
        FROM co
        JOIN sizes sa ON sa.part = co.item_a
        JOIN sizes sb ON sb.part = co.item_b
    )
    SELECT item_a, item_b, n_common, n_a, n_b, weight,
           CAST(row_number() OVER (
               ORDER BY weight DESC, item_a, item_b) AS BIGINT) AS rank
    FROM weighted QUALIFY rank <= 100
"""


def test_bipartite_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import (
        bipartite_projection,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    cp = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    got = (
        bipartite_projection(cp, "cust", "part")
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(BIPARTITE_ORACLE.format(sf=SF))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert [v.hex() for v in got["weight"]] == [
        v.hex() for v in exp["weight"]
    ]


def test_bipartite_hand_values(spark):
    """Items x,y shared by both customers (n=2 each): w = 2/sqrt(4)
    = 1.0; pair below support drops."""
    from kafka_streams_aggregate_spark.operators.graph import (
        bipartite_projection,
    )

    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
    ]
    df = spark.createDataFrame(rows, "cust long, part long")
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_common"], r["n_a"], r["n_b"], r["weight"]
        )
        for r in bipartite_projection(df, "cust", "part").collect()
    }
    assert got == {(10, 20): (2, 2, 2, 1.0)}


def test_bipartite_max_degree_cap(spark):
    """A hot customer above max_degree is dropped BEFORE pair
    generation (its co-counts AND its contribution to item sizes
    vanish) and self-reports via the constant n_capped column;
    keys at the cap survive; max_degree=None keeps the old schema."""
    from kafka_streams_aggregate_spark.operators.graph import (
        bipartite_projection,
    )

    rows = (
        # hot customer 9: degree 4 > cap 3
        [(9, p) for p in (10, 20, 30, 40)]
        # two normal customers sharing (10, 20)
        + [(1, 10), (1, 20), (2, 10), (2, 20)]
    )
    df = spark.createDataFrame(rows, "cust long, part long")
    out = bipartite_projection(
        df, "cust", "part", max_degree=3
    ).collect()
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_common"], r["n_a"], r["n_b"], r["n_capped"]
        )
        for r in out
    }
    # without the cap, customer 9 would push (10,20) to n_common=3
    # and n_a=n_b=3; capped, only customers 1 and 2 count
    assert got == {(10, 20): (2, 2, 2, 1)}
    # cap high enough -> nothing dropped, audit reports 0
    out2 = bipartite_projection(
        df, "cust", "part", max_degree=10
    ).collect()
    assert all(r["n_capped"] == 0 for r in out2)
    assert {(r["item_a"], r["item_b"]): r["n_common"] for r in out2}[
        (10, 20)
    ] == 3
    # default path: no audit column, unchanged behavior
    legacy = bipartite_projection(df, "cust", "part").collect()
    assert "n_capped" not in legacy[0].asDict()
