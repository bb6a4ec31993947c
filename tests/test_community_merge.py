"""One greedy modularity-agglomeration round (CNM step) over an
existing partition (operators/graph.py:community_merge_step).
Registration-ready oracle text in MERGE_ORACLE (brand partition over
the support>=2 co-purchase graph).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

MERGE_ORACLE = """
    WITH ik AS (SELECT DISTINCT l_orderkey, l_partkey FROM
        read_parquet('{sf}/lineitem.parquet')),
    raw_edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM ik a JOIN ik b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    lab AS (SELECT p_partkey AS node, p_brand AS community FROM
        read_parquet('{sf}/part.parquet')),
    e AS MATERIALIZED (
        SELECT la.community AS ca, lb.community AS cb
        FROM raw_edges
        JOIN lab la ON la.node = raw_edges.src
        JOIN lab lb ON lb.node = raw_edges.dst
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    tot AS MATERIALIZED (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS tot
        FROM (SELECT ca AS c FROM e UNION ALL SELECT cb FROM e)
        GROUP BY c
    ),
    pairs AS (
        SELECT least(ca, cb) AS lo, greatest(ca, cb) AS hi,
               CAST(COUNT(*) AS BIGINT) AS e_ab
        FROM e WHERE ca <> cb GROUP BY 1, 2
    ),
    cand AS MATERIALIZED (
        SELECT x.c, x.partner,
               CAST(2 * m.m * x.e_ab - ta.tot * tb.tot AS BIGINT)
                   AS delta_num
        FROM (SELECT lo AS c, hi AS partner, e_ab FROM pairs
              UNION ALL SELECT hi, lo, e_ab FROM pairs) x
        JOIN tot ta ON ta.c = x.c
        JOIN tot tb ON tb.c = x.partner
        CROSS JOIN m
        WHERE 2 * m.m * x.e_ab - ta.tot * tb.tot > 0
    ),
    best AS MATERIALIZED (
        SELECT c, partner FROM (
            SELECT c, partner, row_number() OVER (PARTITION BY c
                   ORDER BY delta_num DESC, partner) AS rn
            FROM cand)
        WHERE rn = 1
    ),
    merges AS MATERIALIZED (
        SELECT a.c AS m_lo, a.partner AS m_hi
        FROM best a JOIN best b ON b.c = a.partner AND b.partner = a.c
        WHERE a.c < a.partner
    ),
    e_after AS MATERIALIZED (
        SELECT COALESCE(ra.m_lo, e.ca) AS ca,
               COALESCE(rb.m_lo, e.cb) AS cb
        FROM e
        LEFT JOIN merges ra ON ra.m_hi = e.ca
        LEFT JOIN merges rb ON rb.m_hi = e.cb
    ),
    qb AS (
        SELECT SUM(4 * CAST(m.m AS HUGEINT) * COALESCE(i.e_cc, 0)
                   - CAST(t.tot AS HUGEINT) * t.tot) AS qn
        FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS tot
              FROM (SELECT ca AS c FROM e UNION ALL SELECT cb FROM e)
              GROUP BY c) t
        LEFT JOIN (SELECT ca AS c, CAST(COUNT(*) AS BIGINT) AS e_cc
                   FROM e WHERE ca = cb GROUP BY ca) i ON i.c = t.c
        CROSS JOIN m
    ),
    qa AS (
        SELECT SUM(4 * CAST(m.m AS HUGEINT) * COALESCE(i.e_cc, 0)
                   - CAST(t.tot AS HUGEINT) * t.tot) AS qn
        FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS tot
              FROM (SELECT ca AS c FROM e_after
                    UNION ALL SELECT cb FROM e_after)
              GROUP BY c) t
        LEFT JOIN (SELECT ca AS c, CAST(COUNT(*) AS BIGINT) AS e_cc
                   FROM e_after WHERE ca = cb GROUP BY ca) i
          ON i.c = t.c
        CROSS JOIN m
    )
    SELECT (SELECT CAST(COUNT(DISTINCT community) AS BIGINT) FROM lab)
               AS n_communities,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM merges) AS n_merges,
           (SELECT CAST(COUNT(DISTINCT community) AS BIGINT) FROM lab)
             - (SELECT CAST(COUNT(*) AS BIGINT) FROM merges)
               AS n_communities_after,
           CAST((1000000 * qb.qn)
                // (4 * CAST(m.m AS HUGEINT) * m.m) AS BIGINT)
               AS q_before_ppm,
           CAST((1000000 * qa.qn)
                // (4 * CAST(m.m AS HUGEINT) * m.m) AS BIGINT)
               AS q_after_ppm
    FROM m CROSS JOIN qb CROSS JOIN qa
"""


def _copurchase(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    ik = (
        load_table(spark, "lineitem", SF)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = ik.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("src")
    )
    b = ik.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("dst")
    )
    edges = (
        a.join(b, "_ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("src", "dst")
    )
    labels = load_table(spark, "part", SF).select(
        F.col("p_partkey").alias("node"),
        F.col("p_brand").alias("community"),
    )
    return edges, labels


def test_community_merge_parity(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        community_merge_step,
    )

    edges, labels = _copurchase(spark)
    got = community_merge_step(edges, labels).toPandas()
    con = duckdb.connect()
    exp = con.sql(MERGE_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # the additivity invariant: merges fire only with positive dQ
    r = got.iloc[0]
    if r["n_merges"] > 0:
        assert r["q_after_ppm"] > r["q_before_ppm"]
    else:
        assert r["q_after_ppm"] == r["q_before_ppm"]


def test_community_merge_hand_k4_singletons(spark):
    """K4 with singleton communities: every connected pair has
    delta = 2*6*1 - 3*3 = 3 > 0 and every best-partner choice ties on
    delta -> smallest partner id wins: best(1)=2, best(2)=1 (mutual),
    best(3)=1, best(4)=1 (not mutual) -> exactly one merge {1,2}.
    Q_before = -36/144 -> -250000 ppm; Q_after = -30/144 -> -208333
    (truncation toward zero, identical cross-engine)."""
    from kafka_streams_aggregate_spark.operators.graph import (
        community_merge_step,
    )

    und = [("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"),
           ("3", "4")]
    edges = spark.createDataFrame(und, "src string, dst string")
    labels = spark.createDataFrame(
        [(str(i), str(i)) for i in range(1, 5)],
        "node string, community string",
    )
    [r] = community_merge_step(edges, labels).collect()
    assert (r["n_communities"], r["n_merges"], r["n_communities_after"]) == (
        4, 1, 3,
    )
    assert r["q_before_ppm"] == -250_000
    assert r["q_after_ppm"] == -208_333
    assert r["q_after_ppm"] > r["q_before_ppm"]


def test_community_merge_hand_no_merge(spark):
    """Two triangles joined by one bridge, communities = the
    triangles: merging loses (delta = 2*7*1 - 7*7 = -35 < 0) -> zero
    merges and Q unchanged — the step never degrades a good
    partition."""
    from kafka_streams_aggregate_spark.operators.graph import (
        community_merge_step,
    )

    und = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
           ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
           ("a1", "b1")]
    edges = spark.createDataFrame(und, "src string, dst string")
    labels = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("a3", "A"),
         ("b1", "B"), ("b2", "B"), ("b3", "B")],
        "node string, community string",
    )
    [r] = community_merge_step(edges, labels).collect()
    assert r["n_merges"] == 0
    assert r["q_after_ppm"] == r["q_before_ppm"]
