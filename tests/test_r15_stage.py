"""Round-15 staging — Durbin-Watson on exact integer-scaled OLS
residuals and the Bartels rank von Neumann randomness test
(operators/stats.py). Registration-ready oracle texts in DW_ORACLE /
BARTELS_ORACLE; the planned registration input is the GLOBAL monthly
revenue series in 1000-dollar units (dense at every SF; the
n^2-scaled residual squares need the unit scaling — cents overflow
DECIMAL(38,0) at sf0.1, the ljung_box lesson).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# one global series: month index -> revenue in k$ units
_SERIES = """
    base AS (
        SELECT CAST(0 AS BIGINT) AS g,
               CAST((year(o_orderdate) - 1992) * 12
                    + month(o_orderdate) - 1 AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    // 100000 AS BIGINT) AS y
        FROM read_parquet('{sf}/orders.parquet')
        GROUP BY 2
    )
"""

DW_ORACLE = (
    "    WITH "
    + _SERIES
    + """,
    mom AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(t AS HUGEINT) * t) AS stt,
               SUM(CAST(t AS HUGEINT) * y) AS sty,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span
        FROM base GROUP BY g
    ),
    resid AS (
        SELECT b.g, n, span, t,
               (CAST(n AS HUGEINT) * stt - CAST(st AS HUGEINT) * st)
               * (CAST(n AS HUGEINT) * y - sy)
               - (CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy)
               * (CAST(n AS HUGEINT) * t - st) AS e
        FROM base b JOIN mom ON mom.g = b.g
    ),
    diffed AS (
        SELECT g, n, span, e,
               e - lag(e) OVER (PARTITION BY g ORDER BY t) AS de
        FROM resid
    ),
    agg AS (
        SELECT g, MAX(n) AS n, MAX(span) AS span,
               SUM(e * e) AS see, SUM(de * de) AS sdd
        FROM diffed GROUP BY g
    )
    SELECT g AS group_key, n,
           CASE WHEN n >= 3 AND span = n - 1 AND see > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * sdd) // see AS BIGINT)
           END AS dw_ppm
    FROM agg
"""
)

BARTELS_ORACLE = (
    "    WITH "
    + _SERIES.replace(" AS y", " AS v")
    + """,
    cells AS (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY g, v
    ),
    ranked AS (
        SELECT g, v,
               CAST(2 * (SUM(c) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT) AS r2
        FROM cells
    ),
    nrow AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span
        FROM base GROUP BY g
    ),
    seq AS (
        SELECT b.g, n, span, t, r2,
               r2 - lead(r2) OVER (PARTITION BY b.g ORDER BY t) AS dr
        FROM base b
        JOIN ranked r ON r.g = b.g AND r.v = b.v
        JOIN nrow nr ON nr.g = b.g
    ),
    agg AS (
        SELECT g, MAX(n) AS n, MAX(span) AS span,
               CAST(SUM(dr * dr) AS BIGINT) AS num2,
               CAST(SUM((r2 - (n + 1)) * (r2 - (n + 1))) AS BIGINT)
                   AS den2
        FROM seq GROUP BY g
    )
    SELECT g AS group_key, n, num2, den2,
           CASE WHEN n >= 3 AND span = n - 1 AND den2 > 0 THEN
                CAST((1000000 * num2) // den2 AS BIGINT) END AS rvn_ppm
    FROM agg
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
        return con.sql(sql.format(sf=SF)).df()
    finally:
        con.close()


def _series(spark, v_name):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return (
        load_table(spark, "orders", SF)
        .groupBy(
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " div 100000 AS BIGINT)"
            ).alias(v_name)
        )
        .select(F.lit(0).cast("bigint").alias("g"), "t", v_name)
    )


def test_durbin_watson_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import durbin_watson

    got = durbin_watson(_series(spark, "y"), "g", "t", "y").toPandas()
    _cmp(got, _duck(DW_ORACLE), ["group_key"])
    assert got["dw_ppm"].notna().all()


def test_durbin_watson_hand_values(spark):
    """A perfectly linear series has zero residuals -> NULL (see=0).
    An alternating series around a flat trend has DW near 4: residuals
    e = D*(n*y - Sy) flip sign every step, so sum de^2 = 4*sum e^2
    exactly when |e| is constant -> dw_ppm close to 4e6. A gapped
    series emits NULL."""
    from kafka_streams_aggregate_spark.operators.stats import durbin_watson

    lin = [("g", t, 10 + 3 * t) for t in range(6)]
    df = spark.createDataFrame(lin, "g string, t long, y long")
    [r] = durbin_watson(df, "g", "t", "y").collect()
    assert r["dw_ppm"] is None

    alt = [("g", t, 10 if t % 2 == 0 else -10) for t in range(6)]
    df2 = spark.createDataFrame(alt, "g string, t long, y long")
    [r] = durbin_watson(df2, "g", "t", "y").collect()
    # alternating +/-10, n=6: slope ~ small, residuals alternate; the
    # exact rational is pinned by the oracle — here assert the regime
    assert r["dw_ppm"] is not None and r["dw_ppm"] > 3_000_000

    gapped = [("g", t, t * 7 % 5) for t in (0, 1, 3, 4, 5)]
    df3 = spark.createDataFrame(gapped, "g string, t long, y long")
    [r] = durbin_watson(df3, "g", "t", "y").collect()
    assert r["dw_ppm"] is None


def test_bartels_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        bartels_rank_test,
    )

    got = bartels_rank_test(_series(spark, "v"), "g", "t", "v").toPandas()
    _cmp(got, _duck(BARTELS_ORACLE), ["group_key"])
    assert got["rvn_ppm"].notna().all()


def test_bartels_hand_values(spark):
    """Monotone series: ranks 1..n, every adjacent doubled-rank diff
    is 2 -> num2 = 4(n-1); den2 = sum (2i - (n+1))^2 over i=1..n.
    n=5: num2 = 16, den2 = 16+4+0+4+16 = 40 -> rvn = 400000 ppm
    (trending, far below 2e6). Oscillating series scores above 2e6."""
    from kafka_streams_aggregate_spark.operators.stats import (
        bartels_rank_test,
    )

    mono = [("g", t, 10 * t) for t in range(5)]
    df = spark.createDataFrame(mono, "g string, t long, v long")
    [r] = bartels_rank_test(df, "g", "t", "v").collect()
    assert (r["num2"], r["den2"]) == (16, 40)
    assert r["rvn_ppm"] == 400_000

    osc = [("g", t, 10 if t % 2 == 0 else -10 * (t + 1)) for t in range(6)]
    df2 = spark.createDataFrame(osc, "g string, t long, v long")
    [r] = bartels_rank_test(df2, "g", "t", "v").collect()
    assert r["rvn_ppm"] > 2_000_000
