"""Dyad census / reciprocity — pre-validation for the round-11
registration queue (operators/graph.py:dyad_census).

Directed arcs synthesized from co-order pairs with an md5 keep
predicate applied independently per direction (so mutual, asymmetric,
and dropped dyads all occur); the null class is the closed-form
remainder, never enumerated. Registration-ready oracle text in
DYAD_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

DYAD_ORACLE = """
    WITH li AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    arcs AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
        WHERE ('0x' || substr(md5(CAST(a.p AS VARCHAR) || '-'
                    || CAST(b.p AS VARCHAR)), 1, 2))::BIGINT % 4 <> 0
    ),
    pairs AS (
        SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
               CAST(src < dst AS INT) AS fwd
        FROM arcs
    ),
    per_pair AS (
        SELECT lo, hi, COUNT(DISTINCT fwd) AS n_dirs
        FROM pairs GROUP BY lo, hi
    ),
    nodes AS (
        SELECT COUNT(*) AS n FROM (
            SELECT src AS node FROM arcs
            UNION SELECT dst FROM arcs)
    ),
    agg AS (
        SELECT COUNT(*) AS interacting,
               COALESCE(SUM(CASE WHEN n_dirs = 2 THEN 1 ELSE 0 END), 0)
                   AS n_mutual
        FROM per_pair
    )
    SELECT CAST(nodes.n AS BIGINT) AS n_nodes,
           CAST(interacting + n_mutual AS BIGINT) AS n_arcs,
           CAST(n_mutual AS BIGINT) AS n_mutual,
           CAST(interacting - n_mutual AS BIGINT) AS n_asymmetric,
           CAST(nodes.n * (nodes.n - 1) // 2 - interacting AS BIGINT)
               AS n_null,
           CASE WHEN interacting + n_mutual > 0
                THEN CAST((1000000 * 2 * n_mutual)
                          // (interacting + n_mutual) AS BIGINT)
           END AS reciprocity_ppm
    FROM agg CROSS JOIN nodes
"""


def test_dyad_census_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import dyad_census
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = (
        load_table(spark, "lineitem", SF)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .dropDuplicates()
    )
    b = li.select("o", F.col("p").alias("p2"))
    arcs = (
        li.join(b, "o")
        .where(F.col("p") != F.col("p2"))
        .where(
            F.expr(
                "CAST(conv(substr(md5(CAST(p AS STRING) || '-'"
                " || CAST(p2 AS STRING)), 1, 2), 16, 10) AS BIGINT)"
                " % 4 <> 0"
            )
        )
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .dropDuplicates()
    )
    got = dyad_census(arcs).toPandas()
    con = duckdb.connect()
    exp = con.sql(DYAD_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    assert 0 < got["n_mutual"][0] and 0 < got["n_asymmetric"][0]
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_dyad_census_hand_values(spark):
    """Arcs a->b, b->a, a->c (+ a self-loop and a dup, both dropped):
    3 nodes, 3 arcs, 1 mutual, 1 asymmetric, 1 null dyad (b-c),
    reciprocity 2/3."""
    from kafka_streams_aggregate_spark.operators.graph import dyad_census

    arcs = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("a", "a"), ("a", "b")],
        "src string, dst string",
    )
    [r] = dyad_census(arcs).collect()
    assert (
        r["n_nodes"],
        r["n_arcs"],
        r["n_mutual"],
        r["n_asymmetric"],
        r["n_null"],
        r["reciprocity_ppm"],
    ) == (3, 3, 1, 1, 1, 666_666)
