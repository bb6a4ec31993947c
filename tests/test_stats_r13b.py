"""Round-13 staging, batch 2 — single-split changepoint (binary
segmentation step) and classical monthly seasonal decomposition
(operators/stats.py). Registration-ready oracle texts in
BINSEG_ORACLE / SEASONAL_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

BINSEG_ORACLE = """
    WITH s AS (
        SELECT user_id AS g,
               CAST(floor(value * 100) AS BIGINT) AS x,
               ts, event_id
        FROM read_parquet('{sf}/events.parquet')
    ),
    staged AS (
        SELECT g,
               CAST(row_number() OVER (PARTITION BY g ORDER BY ts, event_id)
                    AS BIGINT) AS rn,
               CAST(SUM(x) OVER (PARTITION BY g ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_l,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
               CAST(SUM(x) OVER (PARTITION BY g) AS BIGINT) AS s
        FROM s
    ),
    scored AS (
        SELECT g, rn, n, s, s_l, s - s_l AS s_r,
               CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE)
                   / CAST(rn AS DOUBLE)
               + CAST(s - s_l AS DOUBLE) * CAST(s - s_l AS DOUBLE)
                   / CAST(n - rn AS DOUBLE) AS j
        FROM staged WHERE rn < n
    ),
    top AS (
        SELECT *, row_number() OVER (PARTITION BY g
                   ORDER BY j DESC, rn) AS _r
        FROM scored
    )
    SELECT g AS group_key, rn AS split_at, rn AS n_left,
           n - rn AS n_right, s_l AS s_left, s_r AS s_right,
           CAST((1000000 * ((s_l * s_l) // rn + (s_r * s_r) // (n - rn)
                 - (s * s) // n)) // ((s * s) // n + 1) AS BIGINT)
               AS gain_ppm
    FROM top WHERE _r = 1
"""

# monthly revenue cents per nation (orders x customer), absolute
# month index year*12 + month
_MONTHLY_SQL = """
    monthly AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                    AS BIGINT) AS month_idx,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
"""

SEASONAL_ORACLE = (
    "WITH "
    + _MONTHLY_SQL
    + """,
    trend AS (
        SELECT g, month_idx, v,
               CAST(lag(v, 6) OVER w + 2 * SUM(v) OVER (PARTITION BY g
                        ORDER BY month_idx
                        ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
                    + lead(v, 6) OVER w AS BIGINT) AS trend2x24,
               COUNT(*) OVER (PARTITION BY g ORDER BY month_idx
                    ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS win_n,
               MAX(month_idx) OVER (PARTITION BY g ORDER BY month_idx
                    ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
               - MIN(month_idx) OVER (PARTITION BY g ORDER BY month_idx
                    ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS win_span
        FROM monthly
        WINDOW w AS (PARTITION BY g ORDER BY month_idx)
    ),
    detr AS (
        SELECT g, month_idx, v, trend2x24,
               CAST(24 * v - trend2x24 AS BIGINT) AS detr24,
               month_idx % 12 AS moy
        FROM trend
        WHERE win_n = 13 AND win_span = 12 AND trend2x24 IS NOT NULL
    ),
    seas AS (
        SELECT g, moy, CAST(SUM(detr24) // COUNT(*) AS BIGINT) AS seas24
        FROM detr GROUP BY g, moy
    )
    SELECT d.g AS group_key, d.month_idx, d.v, d.trend2x24, s.seas24,
           CAST(d.detr24 - s.seas24 AS BIGINT) AS resid24
    FROM detr d JOIN seas s ON s.g = d.g AND s.moy = d.moy
"""
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_binseg_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        changepoint_binseg,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.col("user_id").alias("g"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("x"),
        "ts",
        "event_id",
    )
    got = changepoint_binseg(ev, "g", ["ts", "event_id"], "x").toPandas()
    con = duckdb.connect()
    exp = con.sql(BINSEG_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_binseg_hand_values(spark):
    """Level shift 0,0,0 -> 12,12,12: the best split is exactly at
    t=3 (J = 0 + 36²/3 = 432 vs alternatives); gains computed in
    exact floor form: jl+jr = 0+432, j0 = 36²/6 = 216 ->
    gain_ppm = 1e6*216/217."""
    from kafka_streams_aggregate_spark.operators.stats import (
        changepoint_binseg,
    )

    rows = [("g", i + 1, v) for i, v in enumerate([0, 0, 0, 12, 12, 12])]
    df = spark.createDataFrame(rows, "g string, i long, x long")
    [r] = changepoint_binseg(df, "g", ["i"], "x").collect()
    assert (r["split_at"], r["n_left"], r["n_right"]) == (3, 3, 3)
    assert (r["s_left"], r["s_right"]) == (0, 36)
    assert r["gain_ppm"] == (1_000_000 * 216) // 217


def test_seasonal_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_decompose_monthly,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    monthly = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            ).alias("month_idx"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = seasonal_decompose_monthly(
        monthly, "g", "month_idx", "v"
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(SEASONAL_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key", "month_idx"])
    # additive identity in the x24 space: 24*v = trend + seas + resid
    recomposed = got["trend2x24"] + got["seas24"] + got["resid24"]
    assert (recomposed == 24 * got["v"]).all()


def test_seasonal_hand_values(spark):
    """Constant series: trend2x24 = 24*v everywhere the window is
    complete, detrended/seasonal/residual all 0; series shorter than
    13 months emits nothing."""
    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_decompose_monthly,
    )

    rows = [("g", m, 100) for m in range(1, 15)]  # 14 months
    df = spark.createDataFrame(rows, "g string, month_idx long, v long")
    out = seasonal_decompose_monthly(df, "g", "month_idx", "v").collect()
    assert [r["month_idx"] for r in sorted(out, key=lambda r: r["month_idx"])] == [7, 8]
    assert all(r["trend2x24"] == 2400 for r in out)
    assert all(r["seas24"] == 0 and r["resid24"] == 0 for r in out)

    short = spark.createDataFrame(
        [("h", m, 5) for m in range(1, 13)], "g string, month_idx long, v long"
    )
    assert seasonal_decompose_monthly(short, "g", "month_idx", "v").count() == 0
