"""Bounded-round k-truss — pre-validation for the round-11
registration queue (operators/graph.py:ktruss).

The oracle replicates the bounded peeling EXACTLY as generated
chained CTEs (one tri/sup/peel stage per round — no recursion
needed: the round count is a compile-time constant, so bounded
iteration unrolls mechanically). Convergence is data-computed on the
survivor set in both engines. Graph: parts co-ordered in the same
order (triangle-rich, unlike the bipartite supplier-part graph).
Registration-ready oracle builder in ktruss_oracle().
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
K, ROUNDS = 4, 3


def ktruss_oracle(sf: str, k: int, rounds: int) -> str:
    thresh = k - 2
    parts = [
        f"""WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    )"""
    ]
    cur = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f"""tri{i} AS MATERIALIZED (
        SELECT x.src AS a, x.dst AS b, y.dst AS c
        FROM {cur} x JOIN {cur} y ON x.dst = y.src
        JOIN {cur} z ON z.src = x.src AND z.dst = y.dst
    ),
    sup{i} AS (
        SELECT side.src, side.dst, CAST(COUNT(*) AS BIGINT) AS support
        FROM (SELECT a AS src, b AS dst FROM tri{i}
              UNION ALL SELECT b, c FROM tri{i}
              UNION ALL SELECT a, c FROM tri{i}) side
        GROUP BY 1, 2
    ),
    e{i} AS MATERIALIZED (
        SELECT e.src, e.dst FROM {cur} e
        JOIN sup{i} s ON e.src = s.src AND e.dst = s.dst
        WHERE s.support >= {thresh}
    )"""
        )
        cur = f"e{i}"
    parts.append(
        f"""trif AS (
        SELECT x.src AS a, x.dst AS b, y.dst AS c
        FROM {cur} x JOIN {cur} y ON x.dst = y.src
        JOIN {cur} z ON z.src = x.src AND z.dst = y.dst
    ),
    supf AS (
        SELECT side.src, side.dst, CAST(COUNT(*) AS BIGINT) AS support
        FROM (SELECT a AS src, b AS dst FROM trif
              UNION ALL SELECT b, c FROM trif
              UNION ALL SELECT a, c FROM trif) side
        GROUP BY 1, 2
    ),
    fin AS (
        SELECT e.src, e.dst, COALESCE(s.support, 0) AS support
        FROM {cur} e LEFT JOIN supf s
          ON e.src = s.src AND e.dst = s.dst
    ),
    ms AS (SELECT COALESCE(MIN(support), {thresh}) AS ms FROM fin)
    SELECT fin.src, fin.dst, CAST(fin.support AS BIGINT) AS support,
           (ms.ms >= {thresh}) AS converged
    FROM fin CROSS JOIN ms"""
    )
    return ",\n    ".join(parts)


def _edges(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = (
        load_table(spark, "lineitem", SF)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .dropDuplicates()
    )
    b = li.select(F.col("o"), F.col("p").alias("p2"))
    return (
        li.join(b, "o")
        .where(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .dropDuplicates()
    )


def test_ktruss_parity(spark):
    from kafka_streams_aggregate_spark.operators.graph import ktruss

    got = (
        ktruss(_edges(spark), k=K, rounds=ROUNDS)
        .toPandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ktruss_oracle(SF, K, ROUNDS))
        .df()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["converged"].all()  # dense co-order graph settles fast
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_ktruss_hand_values(spark):
    """Triangle + pendant edge: 3-truss keeps the triangle (support 1
    each) and drops the pendant; 4-truss is empty (and trivially
    converged)."""
    from kafka_streams_aggregate_spark.operators.graph import ktruss

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    t3 = ktruss(edges, k=3, rounds=2).collect()
    assert sorted((r["src"], r["dst"]) for r in t3) == [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
    ]
    assert all(r["support"] == 1 and r["converged"] for r in t3)
    t4 = ktruss(edges, k=4, rounds=2).collect()
    assert t4 == []
