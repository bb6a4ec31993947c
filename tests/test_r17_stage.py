"""Round-17 staging — Mann-Whitney U (tie-corrected z²) and
Brunner-Munzel W² (operators/stats.py). Registration-ready oracle
texts in MWU_ORACLE / BM_ORACLE (view-based — the planned input is the
per-nation even/odd-year monthly revenue split, the q_kuiper input).
NOT registered this round.
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
    ),
    cells AS (
        SELECT g, v,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS cx,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS cy
        FROM base GROUP BY g, v
    )
"""

MWU_ORACLE = (
    "    WITH "
    + _MONTHLY_X
    + """,
    cum AS (
        SELECT g, cx, cy,
               CAST(SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_y,
               CAST(SUM(cx) OVER (PARTITION BY g) AS BIGINT) AS m,
               CAST(SUM(cy) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM cells
    ),
    agg AS (
        SELECT g, CAST(MAX(m) AS BIGINT) AS m,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(2 * cx * (cum_y - cy) + cx * cy) AS BIGINT)
                   AS u2,
               CAST(SUM((cx + cy) * (cx + cy) * (cx + cy) - (cx + cy))
                    AS BIGINT) AS tie_term
        FROM cum GROUP BY g
    )
    SELECT g AS group_key, m, n, u2, tie_term,
           CASE WHEN m > 0 AND n > 0 AND
                (m + n) * (m + n) * (m + n) - (m + n) - tie_term > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * 3
                      * (u2 - m * n) * (u2 - m * n)
                      * (m + n) * (m + n - 1))
                     // (CAST(m AS HUGEINT) * n
                         * ((m + n) * (m + n) * (m + n) - (m + n)
                            - tie_term)) AS BIGINT) END AS z2_ppm
    FROM agg
"""
)

BM_ORACLE = (
    "    WITH "
    + _MONTHLY_X
    + """,
    placed AS (
        SELECT g, cx, cy,
               CAST(2 * (SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cy) + cy AS BIGINT)
                   AS dx,
               CAST(2 * (SUM(cx) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cx) + cx AS BIGINT)
                   AS dy,
               CAST(SUM(cx) OVER (PARTITION BY g) AS BIGINT) AS m,
               CAST(SUM(cy) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM cells
    ),
    sums AS (
        SELECT g, CAST(MAX(m) AS BIGINT) AS m,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(cx * dx) AS BIGINT) AS a,
               CAST(SUM(cy * dy) AS BIGINT) AS b
        FROM placed GROUP BY g
    ),
    v12 AS (
        SELECT p.g,
               SUM(p.cx * (CAST(p.m AS HUGEINT) * p.dx - s.a)
                        * (CAST(p.m AS HUGEINT) * p.dx - s.a)) AS v1,
               SUM(p.cy * (CAST(p.n AS HUGEINT) * p.dy - s.b)
                        * (CAST(p.n AS HUGEINT) * p.dy - s.b)) AS v2
        FROM placed p JOIN sums s ON s.g = p.g
        GROUP BY p.g
    )
    SELECT s.g AS group_key, s.m, s.n,
           CAST(s.m * s.n * (s.n - s.m) + s.m * s.b - s.n * s.a
                AS BIGINT) AS num,
           CASE WHEN s.m >= 2 AND s.n >= 2
                AND v.v1 * (s.n - 1) + v.v2 * (s.m - 1) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT)
                      * (s.m * s.n * (s.n - s.m) + s.m * s.b
                         - s.n * s.a)
                      * (s.m * s.n * (s.n - s.m) + s.m * s.b
                         - s.n * s.a)
                      * (s.m - 1) * (s.n - 1))
                     // (CAST(s.m + s.n AS HUGEINT)
                         * (v.v1 * (s.n - 1) + v.v2 * (s.m - 1)))
                     AS BIGINT) END AS w2_ppm
    FROM sums s JOIN v12 v ON v.g = s.g
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


def test_mwu_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import mann_whitney_u

    # complete separation X={1,2}, Y={3,4}: 2U = 0, T = 0, N = 4:
    # z2 = 3*16*4*3 / (4*60) = 2.4 -> 2400000 ppm
    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mann_whitney_u(df, "g", "in_x", "v").collect()
    assert (r["u2"], r["tie_term"]) == (0, 0)
    assert r["z2_ppm"] == 2_400_000

    # one tie: X={1,3}, Y={2,3}: 2U = 3, T = 6: z2 = 1/6
    rows = [("h", True, 1), ("h", True, 3), ("h", False, 2), ("h", False, 3)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mann_whitney_u(df, "g", "in_x", "v").collect()
    assert (r["u2"], r["tie_term"]) == (3, 6)
    assert r["z2_ppm"] == 166_666

    # all tied: variance 0 -> NULL (never a throw)
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mann_whitney_u(df, "g", "in_x", "v").collect()
    assert r["z2_ppm"] is None


def test_mwu_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import mann_whitney_u

    got = mann_whitney_u(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(MWU_ORACLE), ["group_key"])


def test_bm_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import brunner_munzel

    # X={1,3}, Y={2,4}: A=2, B=6, NUM=8, V1=V2=8 -> W^2 = 1 exactly
    # (matches the published rank formulation: W = (Rbar2-Rbar1)/1)
    rows = [("g", True, 1), ("g", True, 3), ("g", False, 2), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = brunner_munzel(df, "g", "in_x", "v").collect()
    assert r["num"] == 8
    assert r["w2_ppm"] == 1_000_000

    # complete separation: placement variance 0 both sides -> NULL
    # with the direction kept in num
    rows = [("s", True, 1), ("s", True, 2), ("s", False, 8), ("s", False, 9)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = brunner_munzel(df, "g", "in_x", "v").collect()
    assert r["w2_ppm"] is None and r["num"] > 0

    # all tied -> NULL, num = 0
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = brunner_munzel(df, "g", "in_x", "v").collect()
    assert r["w2_ppm"] is None and r["num"] == 0


def test_bm_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import brunner_munzel

    got = brunner_munzel(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(BM_ORACLE), ["group_key"])
