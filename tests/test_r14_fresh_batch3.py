"""Round-14 fresh queue, batch 6 — near-dup cluster profile
(operators/dedup.py), Ansari-Bradley scale test and Ljung-Box
portmanteau (operators/stats.py). Registration-ready oracle texts in
the *_ORACLE constants (the cluster profile's pairs CTE reuses the
q_dedup_minhash_lsh_md5 oracle builder).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _cluster_profile_oracle() -> str:
    from kafka_streams_aggregate_spark.queries.llm_data import (
        _minhash_md5_oracle,
    )

    pairs_sql = _minhash_md5_oracle()
    return f"""
    WITH RECURSIVE
    pairs AS ({pairs_sql}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    walk(node, reach) AS (
        SELECT src, src FROM edges
        UNION
        SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ),
    comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node),
    sizes AS (
        SELECT component, CAST(COUNT(*) AS BIGINT) AS size
        FROM comp GROUP BY component
        HAVING COUNT(*) >= 2
    )
    SELECT CAST(length(bin(size)) AS BIGINT) AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(size) AS BIGINT) AS n_docs_in_clusters,
           CAST(SUM(size) - COUNT(*) AS BIGINT) AS dup_excess
    FROM sizes GROUP BY 1
    """


AB_ORACLE = """
    WITH base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS in_x,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
    ),
    cells AS (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY g, v
    ),
    nrow AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT) AS m
        FROM base GROUP BY g
    ),
    ranked AS (
        SELECT g, v,
               CAST(2 * (SUM(c) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT) AS r2
        FROM cells
    ),
    scored AS (
        SELECT b.g, b.in_x,
               CAST(CASE WHEN r2 < 2 * (n.n + 1) - r2 THEN r2
                    ELSE 2 * (n.n + 1) - r2 END AS BIGINT) AS score2
        FROM base b
        JOIN ranked r ON r.g = b.g AND r.v = b.v
        JOIN nrow n ON n.g = b.g
    ),
    agg AS (
        SELECT g,
               CAST(SUM(CASE WHEN in_x THEN score2 ELSE 0 END) AS BIGINT)
                   AS w2,
               CAST(SUM(score2) AS BIGINT) AS t2
        FROM scored GROUP BY g
    )
    SELECT n.g AS group_key, n.n, n.m, w2, t2,
           CASE WHEN n.m > 0 AND n.m < n.n AND t2 > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * n.n * w2)
                     // (CAST(n.m AS HUGEINT) * t2) AS BIGINT) END
               AS ab_ppm
    FROM nrow n JOIN agg ON agg.g = n.g
"""


def _lb_oracle(max_lag: int = 12) -> str:
    c_cols = ",\n               ".join(
        f"CAST(SUM(d0 * d{k}) AS BIGINT) AS c{k}"
        for k in range(1, max_lag + 1)
    )
    d_cols = ",\n               ".join(
        f"n * lag(x, {k}) OVER (PARTITION BY b.g ORDER BY t) - s AS d{k}"
        for k in range(1, max_lag + 1)
    )
    r_cols = ",\n           ".join(
        f"CASE WHEN c0 > 0 THEN (10000 * c{k}) // c0 ELSE 0 END AS r{k}"
        for k in range(1, max_lag + 1)
    )
    q_expr = " + ".join(
        f"(n * (n + 2) * r{k} * r{k}) // ((n - {k}) * 100)"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    // 100000 AS BIGINT) AS x
        FROM read_parquet('{{sf}}/orders.parquet') o
        JOIN read_parquet('{{sf}}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span
        FROM base GROUP BY g
    ),
    lagged AS (
        SELECT b.g, n, s, span,
               n * x - s AS d0,
               {d_cols}
        FROM base b JOIN tot ON tot.g = b.g
    ),
    sums AS (
        SELECT g, MAX(n) AS n, MAX(span) AS span,
               CAST(SUM(d0 * d0) AS BIGINT) AS c0,
               {c_cols}
        FROM lagged GROUP BY g
    ),
    scored AS (
        SELECT g, n, span, c0,
           {r_cols}
        FROM sums
    )
    SELECT g AS group_key, n, c0,
           CASE WHEN n > {max_lag} AND span = n - 1 THEN
                CAST({q_expr} AS BIGINT) END AS q_ppm
    FROM scored
    """


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT *"
            f" FROM read_parquet('{SF}/documents.parquet')"
        )
        return con.sql(sql.format(sf=SF)).df()
    finally:
        con.close()


def test_cluster_profile_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        dedup_cluster_profile,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = dedup_cluster_profile(
        docs, hash_family="md5", threshold=0.02
    ).toPandas()
    _cmp(got, _duck(_cluster_profile_oracle()), ["size_bucket"])


def test_cluster_profile_hand_values(spark):
    """Three identical docs + one singleton: one 3-doc cluster in
    bucket length(bin(3)) = 2 with dup_excess 2; the singleton never
    appears."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        dedup_cluster_profile,
    )

    text = "alpha beta gamma delta epsilon zeta"
    rows = [(1, text), (2, text), (3, text), (4, "totally different words x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_cluster_profile(df, hash_family="md5",
                                threshold=0.5).collect()
    assert len(out) == 1
    [r] = out
    assert (r["size_bucket"], r["n_clusters"], r["dup_excess"]) == (2, 1, 2)


def test_ansari_bradley_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import ansari_bradley
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = orders.join(cust, cust.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.expr("o_orderpriority IN ('1-URGENT', '2-HIGH')").alias("in_x"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    got = ansari_bradley(base, "g", "in_x", "v").toPandas()
    _cmp(got, _duck(AB_ORACLE), ["group_key"])


def test_ansari_bradley_hand_values(spark):
    """X = {2,3} (center), Y = {1,4} (extremes) on distinct values:
    r2 = 2,4,6,8; scores = min(r2, 10-r2) = 2,4,4,2; W2 = 8, T2 = 12,
    ab = 1e6*4*8/(2*12) = 1333333 > 1e6: X is NARROWER. Symmetric
    scores make a sample holding the extremes score low."""
    from kafka_streams_aggregate_spark.operators.stats import ansari_bradley

    rows = [("g", False, 1), ("g", True, 2), ("g", True, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = ansari_bradley(df, "g", "in_x", "v").collect()
    assert (r["n"], r["m"], r["w2"], r["t2"]) == (4, 2, 8, 12)
    assert r["ab_ppm"] == (10**6 * 4 * 8) // (2 * 12)

    one = [("h", True, 1), ("h", True, 2)]
    df2 = spark.createDataFrame(one, "g string, in_x boolean, v long")
    [r] = ansari_bradley(df2, "g", "in_x", "v").collect()
    assert r["ab_ppm"] is None  # m == n: no second sample


def test_ljung_box_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import ljung_box
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " div 100000 AS BIGINT)"
            ).alias("x")
        )
    )
    got = ljung_box(base, "g", "t", "x", max_lag=12).toPandas()
    _cmp(got, _duck(_lb_oracle(12)), ["group_key"])


def test_ljung_box_hand_values(spark):
    """A constant series has c0 = 0, every r_k = 0 by the guard, and
    q = 0 (white-noise verdict). A perfectly alternating series has
    r1 near -1e4 (pp10k): its lag-1 term dominates. A gapped series
    emits NULL."""
    from kafka_streams_aggregate_spark.operators.stats import ljung_box

    const = [("g", t, 5) for t in range(8)]
    df = spark.createDataFrame(const, "g string, t long, x long")
    [r] = ljung_box(df, "g", "t", "x", max_lag=2).collect()
    assert r["c0"] == 0 and r["q_ppm"] == 0

    alt = [("h", t, 10 if t % 2 == 0 else -10) for t in range(8)]
    df2 = spark.createDataFrame(alt, "g string, t long, x long")
    [r] = ljung_box(df2, "h"[0:0] or "g", "t", "x", max_lag=2).collect()
    # r1 for a +/-10 alternating series: c1/c0 = -7/8 (edge effects)
    assert r["q_ppm"] is not None and r["q_ppm"] > 0

    gapped = [("i", t, t * 3 % 7) for t in [0, 1, 2, 4, 5, 6, 7, 8]]
    df3 = spark.createDataFrame(gapped, "g string, t long, x long")
    [r] = ljung_box(df3, "g", "t", "x", max_lag=2).collect()
    assert r["q_ppm"] is None
