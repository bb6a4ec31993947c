"""Round-13 staging — modularity score, global transitivity
(operators/graph.py). Registration-ready oracle texts in
MODULARITY_ORACLE / TRANSITIVITY_ORACLE.

Partition under test: part brand (p_brand) over the support>=2
co-purchase part graph — fully deterministic attribute communities,
so the modularity audit needs no clustering run.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_EDGES_SQL = """
    ik AS (SELECT DISTINCT l_orderkey, l_partkey
           FROM read_parquet('{sf}/lineitem.parquet')),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM ik a JOIN ik b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
"""

MODULARITY_ORACLE = (
    "WITH "
    + _EDGES_SQL
    + """,
    lab AS (SELECT p_partkey AS node, p_brand AS community
            FROM read_parquet('{sf}/part.parquet')),
    e AS (
        SELECT la.community AS ca, lb.community AS cb
        FROM edges
        JOIN lab la ON la.node = edges.src
        JOIN lab lb ON lb.node = edges.dst
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    intra AS (
        SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS m_intra
        FROM e WHERE ca = cb GROUP BY ca
    ),
    deg AS (
        SELECT community, CAST(COUNT(*) AS BIGINT) AS degree_sum
        FROM (SELECT ca AS community FROM e
              UNION ALL SELECT cb FROM e)
        GROUP BY community
    ),
    nn AS (
        SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM lab GROUP BY community
    ),
    per_c AS (
        SELECT nn.community, nn.n_nodes,
               CAST(COALESCE(i.m_intra, 0) AS BIGINT) AS m_intra,
               CAST(COALESCE(d.degree_sum, 0) AS BIGINT) AS degree_sum,
               m.m
        FROM nn
        LEFT JOIN deg d ON d.community = nn.community
        LEFT JOIN intra i ON i.community = nn.community
        CROSS JOIN m
    ),
    q AS (
        SELECT CAST((1000000 * SUM(4 * m * m_intra
                    - degree_sum * degree_sum))
                    // (4 * MAX(m) * MAX(m)) AS BIGINT) AS q_ppm
        FROM per_c
    )
    SELECT community, n_nodes, m_intra, degree_sum,
           CAST((1000000 * (4 * m * m_intra - degree_sum * degree_sum))
                // (4 * m * m) AS BIGINT) AS contrib_ppm,
           q.q_ppm
    FROM per_c CROSS JOIN q
"""
)

TRANSITIVITY_ORACLE = (
    "WITH "
    + _EDGES_SQL
    + """,
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM edges x JOIN edges y ON x.dst = y.src
        JOIN edges z ON z.src = x.src AND z.dst = y.dst
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION ALL SELECT dst, src FROM edges
    ),
    wed AS (
        SELECT CAST(SUM(deg * (deg - 1)) AS BIGINT) AS n_wedges_x2
        FROM (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src)
    ),
    me AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT n_edges, n_triangles,
           CAST(n_wedges_x2 // 2 AS BIGINT) AS n_wedges,
           CASE WHEN n_wedges_x2 > 0 THEN CAST(
                (1000000 * 3 * n_triangles * 2) // n_wedges_x2 AS BIGINT)
           END AS transitivity_ppm
    FROM me CROSS JOIN tri CROSS JOIN wed
"""
)


def _edges(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    ik = li.select("l_orderkey", "l_partkey").distinct()
    a = ik.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("src"))
    b = ik.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "_ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_support"))
        .where(F.col("_support") >= 2)
        .select("src", "dst")
    )


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_modularity_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import modularity_score
    from kafka_streams_aggregate_spark.sources.tables import load_table

    labels = load_table(spark, "part", SF).select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("community")
    )
    got = modularity_score(_edges(spark), labels).toPandas()
    con = duckdb.connect()
    exp = con.sql(MODULARITY_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["community"])


def test_modularity_hand_values(spark):
    """Two triangles joined by one bridge edge, labeled by triangle:
    m = 7, per community m_c = 3, D_c = 7 (6 intra-degree + 1 bridge
    end): num = 4*7*3 - 49 = 35 per community; bridge endpoints'
    communities are the same two -> Q = (35+35)/196 = 5/14 ->
    357142 ppm (floor)."""
    from kafka_streams_aggregate_spark.operators.graph import modularity_score

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "B")],
        "node long, community string",
    )
    rows = {r["community"]: r for r in modularity_score(edges, labels).collect()}
    for c in ("A", "B"):
        assert rows[c]["m_intra"] == 3 and rows[c]["degree_sum"] == 7
        assert rows[c]["contrib_ppm"] == (1_000_000 * 35) // 196
        assert rows[c]["q_ppm"] == (1_000_000 * 70) // 196


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: Q = (4m*m - (2m)^2)/4m^2 = 0
    exactly."""
    from kafka_streams_aggregate_spark.operators.graph import modularity_score

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "X")], "node long, community string"
    )
    [r] = modularity_score(edges, labels).collect()
    assert r["q_ppm"] == 0 and r["contrib_ppm"] == 0


def test_transitivity_parity(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        transitivity_global,
    )

    got = transitivity_global(_edges(spark)).toPandas()
    con = duckdb.connect()
    exp = con.sql(TRANSITIVITY_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert 0 < got["transitivity_ppm"][0] <= 1_000_000


def test_transitivity_hand_values(spark):
    """Triangle + pendant: 1 triangle; degrees (2,2,3,1) -> wedges =
    (2+2+6+0)/2 = 5; transitivity = 3/5."""
    from kafka_streams_aggregate_spark.operators.graph import (
        transitivity_global,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
        "src string, dst string",
    )
    [r] = transitivity_global(edges).collect()
    assert (r["n_edges"], r["n_triangles"], r["n_wedges"]) == (4, 1, 5)
    assert r["transitivity_ppm"] == 600_000
