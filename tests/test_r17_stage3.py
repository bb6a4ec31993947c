"""Round-17 staging, batch 3 — Lepage joint location-scale test
(operators/stats.py). Registration-ready view-based oracle text in
LEPAGE_ORACLE; planned input is the per-nation even/odd-year monthly
revenue epoch split. NOT registered this round.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_MONTHLY_X = """
    base AS (
        SELECT g, t, v, (t // 12) % 2 = 0 AS in_x FROM (
            SELECT CAST(c.c_nationkey AS BIGINT) AS g,
                   CAST((year(o.o_orderdate) - 1992) * 12
                        + month(o.o_orderdate) - 1 AS BIGINT) AS t,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
    )
"""

LEPAGE_ORACLE = (
    "    WITH "
    + _MONTHLY_X
    + """,
    cells AS (
        SELECT g, v,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS cx,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS cy
        FROM base GROUP BY g, v
    ),
    ranked AS (
        SELECT g, cx, cy,
               CAST(2 * (SUM(cx + cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cx - cy)
                    + cx + cy + 1 AS BIGINT) AS r2,
               CAST(SUM(cx + cy) OVER (PARTITION BY g) AS BIGINT) AS nn
        FROM cells
    ),
    scored AS (
        SELECT g, cx, cy, r2 AS sw,
               CAST(least(r2, 2 * (nn + 1) - r2) AS BIGINT) AS sa
        FROM ranked
    ),
    agg AS (
        SELECT g, CAST(SUM(cx) AS BIGINT) AS m,
               CAST(SUM(cy) AS BIGINT) AS n,
               SUM(cx * CAST(sw AS HUGEINT)) AS tw,
               SUM((cx + cy) * CAST(sw AS HUGEINT)) AS s1w,
               SUM((cx + cy) * CAST(sw AS HUGEINT) * sw) AS s2w,
               SUM(cx * CAST(sa AS HUGEINT)) AS ta,
               SUM((cx + cy) * CAST(sa AS HUGEINT)) AS s1a,
               SUM((cx + cy) * CAST(sa AS HUGEINT) * sa) AS s2a
        FROM scored GROUP BY g
    ),
    z AS (
        SELECT g, m, n,
               CASE WHEN m > 0 AND n > 0
                    AND (m + n) * s2w - s1w * s1w > 0 THEN
                    CAST((CAST(1000000 AS HUGEINT)
                          * ((m + n) * tw - m * s1w)
                          * ((m + n) * tw - m * s1w) * (m + n - 1))
                         // (CAST(m AS HUGEINT) * n
                             * ((m + n) * s2w - s1w * s1w)) AS BIGINT)
               END AS z2w_ppm,
               CASE WHEN m > 0 AND n > 0
                    AND (m + n) * s2a - s1a * s1a > 0 THEN
                    CAST((CAST(1000000 AS HUGEINT)
                          * ((m + n) * ta - m * s1a)
                          * ((m + n) * ta - m * s1a) * (m + n - 1))
                         // (CAST(m AS HUGEINT) * n
                             * ((m + n) * s2a - s1a * s1a)) AS BIGINT)
               END AS z2ab_ppm
        FROM agg
    )
    SELECT g AS group_key, m, n, z2w_ppm, z2ab_ppm,
           CASE WHEN z2w_ppm IS NOT NULL AND z2ab_ppm IS NOT NULL THEN
                CAST((z2w_ppm + z2ab_ppm) // 1000 AS BIGINT) END
               AS lepage_milli
    FROM z
"""
)


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
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _monthly_x(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    return (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
        .select("g", "t", "v", F.expr("(t div 12) % 2 = 0").alias("in_x"))
    )


def test_lepage_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import lepage_test

    # pure location shift X={1,2}, Y={3,4}: the Wilcoxon component
    # equals the tie-free MW z2 (2.4e6) and the AB component is 0
    # (symmetric fold scores are identical across samples)
    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = lepage_test(df, "g", "in_x", "v").collect()
    assert r["z2w_ppm"] == 2_400_000
    assert r["z2ab_ppm"] == 0
    assert r["lepage_milli"] == 2_400

    # pure scale: X = tails {1,4}, Y = middle {2,3}: W component 0
    # (rank sums equal), AB component positive
    rows = [("s", True, 1), ("s", True, 4), ("s", False, 2), ("s", False, 3)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = lepage_test(df, "g", "in_x", "v").collect()
    assert r["z2w_ppm"] == 0
    assert r["z2ab_ppm"] > 0

    # all tied: both score populations constant -> NULLs
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = lepage_test(df, "g", "in_x", "v").collect()
    assert r["z2w_ppm"] is None and r["lepage_milli"] is None


def test_lepage_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import lepage_test

    got = lepage_test(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(LEPAGE_ORACLE), ["group_key"])
