"""Round-13 staging, batch 5 — top 3-step paths, lead-lag
cross-correlation, two-arm log-rank, seasonal/trend strength
(operators/stats.py). Registration-ready oracle texts in
PATHS_ORACLE / XCORR_ORACLE / LOGRANK_ORACLE / STRENGTH_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

PATHS_ORACLE = """
    WITH s AS (
        SELECT user_id AS g, event_type AS step, ts, event_id
        FROM read_parquet('{sf}/events.parquet')
    ),
    p AS (
        SELECT step AS step_1,
               lead(step, 1) OVER w AS step_2,
               lead(step, 2) OVER w AS step_3
        FROM s WINDOW w AS (PARTITION BY g ORDER BY ts, event_id)
    ),
    c AS (
        SELECT step_1, step_2, step_3, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM p WHERE step_2 IS NOT NULL AND step_3 IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT step_1, step_2, step_3, n_paths,
           CAST(row_number() OVER (ORDER BY n_paths DESC,
                step_1, step_2, step_3) AS BIGINT) AS rank
    FROM c QUALIFY rank <= 50
"""

XCORR_ORACLE = """
    WITH a AS (
        SELECT epoch_us(ts) // 86400000000 AS t,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM read_parquet('{sf}/events.parquet') GROUP BY 1
    ),
    b AS (
        SELECT epoch_us(ts) // 86400000000 AS t,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM read_parquet('{sf}/events.parquet') GROUP BY 1
    ),
    lagged AS (
        SELECT CAST(r.lag AS BIGINT) AS lag, a.v AS va, b.v AS vb
        FROM a
        CROSS JOIN (SELECT unnest(range(-7, 8)) AS lag) r
        JOIN b ON b.t = a.t + r.lag
    ),
    m AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(va) AS BIGINT) AS sa,
               CAST(SUM(vb) AS BIGINT) AS sb,
               SUM(CAST(va AS HUGEINT) * va) AS saa,
               SUM(CAST(vb AS HUGEINT) * vb) AS sbb,
               SUM(CAST(va AS HUGEINT) * vb) AS sab
        FROM lagged GROUP BY lag
    )
    SELECT lag, n,
           CASE WHEN n >= 2
                 AND (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                               - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
           END AS r
    FROM m
"""

LOGRANK_ORACLE = """
    WITH life AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(datediff('day',
                    MIN(CAST(o.o_orderdate AS DATE)),
                    MAX(CAST(o.o_orderdate AS DATE))) AS BIGINT) AS t,
               CAST(c.c_custkey % 2 AS BIGINT) AS e,
               ('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)), 1, 2))
                   ::BIGINT % 2 AS a
        FROM read_parquet('{sf}/customer.parquet') c
        JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    by_t AS (
        SELECT g, t, CAST(COUNT(*) AS BIGINT) AS n_at,
               CAST(SUM(a) AS BIGINT) AS n1_at,
               CAST(SUM(e) AS BIGINT) AS d,
               CAST(SUM(e * a) AS BIGINT) AS d1
        FROM life GROUP BY g, t
    ),
    risk AS (
        SELECT g, t, d, d1,
               CAST(SUM(n_at) OVER (PARTITION BY g)
                    - SUM(n_at) OVER (PARTITION BY g ORDER BY t
                        ROWS UNBOUNDED PRECEDING) + n_at AS BIGINT)
                   AS n_risk,
               CAST(SUM(n1_at) OVER (PARTITION BY g)
                    - SUM(n1_at) OVER (PARTITION BY g ORDER BY t
                        ROWS UNBOUNDED PRECEDING) + n1_at AS BIGINT)
                   AS n1_risk
        FROM by_t
    ),
    terms AS (
        SELECT g, d1,
               CAST((1000000 * d * n1_risk) // n_risk AS BIGINT) AS e_fp_t,
               CAST((CAST(1000000 AS HUGEINT) * d * (n_risk - d)
                     * n1_risk * (n_risk - n1_risk))
                    // (CAST(n_risk AS HUGEINT) * n_risk * (n_risk - 1))
                    AS BIGINT) AS v_fp_t
        FROM risk WHERE d > 0 AND n_risk > 1
    ),
    agg AS (
        SELECT g AS group_key,
               CAST(SUM(d1) AS BIGINT) AS o1,
               CAST(SUM(e_fp_t) AS BIGINT) AS e_fp,
               CAST(SUM(v_fp_t) AS BIGINT) AS v_fp
        FROM terms GROUP BY g
    )
    SELECT group_key, o1, e_fp, v_fp,
           CASE WHEN v_fp > 0 THEN
                CAST(1000000 * o1 - e_fp AS DOUBLE)
                / sqrt(CAST(v_fp AS DOUBLE) * CAST(1000000 AS DOUBLE)) END
               AS z
    FROM agg
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_top_paths_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import top_paths3
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.col("user_id").alias("g"),
        F.col("event_type").alias("step"),
        "ts",
        "event_id",
    )
    got = top_paths3(ev, "g", ["ts", "event_id"], "step", topk=50).toPandas()
    con = duckdb.connect()
    exp = con.sql(PATHS_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["rank"])


def test_top_paths_hand_values(spark):
    """Sequence A B C B C for one user: windows (A,B,C), (B,C,B),
    (C,B,C) each once; a 2-event user contributes nothing."""
    from kafka_streams_aggregate_spark.operators.stats import top_paths3

    rows = [("u", i, s) for i, s in enumerate("ABCBC")] + [
        ("w", 0, "A"), ("w", 1, "B"),
    ]
    df = spark.createDataFrame(rows, "g string, i long, step string")
    got = {
        (r["step_1"], r["step_2"], r["step_3"]): r["n_paths"]
        for r in top_paths3(df, "g", ["i"], "step").collect()
    }
    assert got == {("A", "B", "C"): 1, ("B", "C", "B"): 1, ("C", "B", "C"): 1}


def test_xcorr_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import xcorr_leadlag
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    a = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("t")
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("v")
    )
    b = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    got = xcorr_leadlag(a, b, max_lag=7).toPandas()
    con = duckdb.connect()
    exp = con.sql(XCORR_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["lag"])
    gr = [v.hex() for v in got.sort_values("lag")["r"] if v == v]
    er = [v.hex() for v in exp.sort_values("lag")["r"] if v == v]
    assert gr == er and len(gr) == 15


def test_xcorr_hand_shift_detection(spark):
    """b is a by +2 shifted: |r| peaks (== 1 within fp) exactly at
    lag +2 where the joined pairs line up value-for-value."""
    from kafka_streams_aggregate_spark.operators.stats import xcorr_leadlag

    vals = [1, 5, 2, 8, 3, 9, 4, 7, 0, 6]
    a = spark.createDataFrame(
        [(t, v) for t, v in enumerate(vals)], "t long, v long"
    )
    b = spark.createDataFrame(
        [(t + 2, v) for t, v in enumerate(vals)], "t long, v long"
    )
    rows = {r["lag"]: r["r"] for r in xcorr_leadlag(a, b, max_lag=3).collect()}
    assert rows[2] == 1.0  # values line up exactly at the true shift
    # every other lag scores strictly below (short-overlap lags can
    # still reach |r| ~ 0.99 — magnitude alone is not the read; the
    # argmax is)
    assert all(v < rows[2] for k, v in rows.items() if k != 2 and v is not None)


def test_logrank_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import logrank_test
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    life = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("bigint")
            .alias("t")
        )
        .select(
            F.col("c_nationkey").cast("bigint").alias("g"),
            "t",
            (F.col("c_custkey") % 2).cast("bigint").alias("e"),
            F.expr(
                "CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 2),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("a"),
        )
    )
    got = logrank_test(life, "g", "t", "e", "a").toPandas()
    con = duckdb.connect()
    exp = con.sql(LOGRANK_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_logrank_hand_values(spark):
    """Arm 1 dies at t=1 (both at risk), arm 0 at t=2 (alone, n=1 ->
    excluded): e_fp = 1e6*1*1/2 = 500000, v_fp = 1e6*1*1*1*1/(4*1)
    = 250000, O1 = 1 -> z = 500000 / sqrt(250000 * 1e6) = 1.0."""
    from kafka_streams_aggregate_spark.operators.stats import logrank_test

    rows = [("g", 1, 1, 1), ("g", 2, 1, 0)]
    df = spark.createDataFrame(rows, "g string, t long, e long, a long")
    [r] = logrank_test(df, "g", "t", "e", "a").collect()
    assert (r["o1"], r["e_fp"], r["v_fp"]) == (1, 500_000, 250_000)
    assert r["z"] == 1.0


def test_seasonal_strength_pinned(spark):
    """A clean 12-month sawtooth over a flat level: residuals are
    EXACTLY zero, so F_s = 1 (exactly 1e6 ppm); the trend component
    is exactly constant, so Var(trend + resid) = 0 and F_t is
    honestly NULL (nothing to attribute). Adding a linear drift turns
    F_t ~ 1 while F_s stays ~ 1."""
    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_decompose_monthly,
        seasonal_strength,
    )

    rows = [("g", m, 1000 + (m % 12) * 10) for m in range(1, 49)]
    df = spark.createDataFrame(rows, "g string, month_idx long, v long")
    dec = seasonal_decompose_monthly(df, "g", "month_idx", "v")
    [r] = seasonal_strength(dec).collect()
    assert r["f_seasonal_ppm"] == 1_000_000
    assert r["f_trend_ppm"] is None

    drift = [("g", m, 1000 + m * 5 + (m % 12) * 10) for m in range(1, 49)]
    df2 = spark.createDataFrame(drift, "g string, month_idx long, v long")
    [r] = seasonal_strength(
        seasonal_decompose_monthly(df2, "g", "month_idx", "v")
    ).collect()
    assert r["f_seasonal_ppm"] > 990_000 and r["f_trend_ppm"] > 990_000

    flat = spark.createDataFrame(
        [("h", m, 500) for m in range(1, 40)],
        "g string, month_idx long, v long",
    )
    [r] = seasonal_strength(
        seasonal_decompose_monthly(flat, "g", "month_idx", "v")
    ).collect()
    assert r["f_seasonal_ppm"] is None and r["f_trend_ppm"] is None


def test_seasonal_strength_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_decompose_monthly,
        seasonal_strength,
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
    got = seasonal_strength(
        seasonal_decompose_monthly(monthly, "g", "month_idx", "v")
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(STRENGTH_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    # ppm columns are exact integers — _cmp already compared them
    # cell-for-cell; assert the gate is non-degenerate somewhere
    assert got["f_seasonal_ppm"].notna().any()


STRENGTH_ORACLE = """
    WITH monthly AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                    AS BIGINT) AS month_idx,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
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
    ),
    dd AS (
        SELECT d.g,
               CAST(d.detr24 - s.seas24 AS BIGINT) AS r,
               CAST(d.detr24 AS BIGINT) AS sr,
               CAST(d.trend2x24 + d.detr24 - s.seas24 AS BIGINT) AS tr
        FROM detr d JOIN seas s ON s.g = d.g AND s.moy = d.moy
    ),
    m AS (
        SELECT g AS group_key, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS s_r,
               CAST(SUM(sr) AS BIGINT) AS s_sr,
               CAST(SUM(tr) AS BIGINT) AS s_tr,
               SUM(CAST(r AS HUGEINT) * r) AS q_r,
               SUM(CAST(sr AS HUGEINT) * sr) AS q_sr,
               SUM(CAST(tr AS HUGEINT) * tr) AS q_tr
        FROM dd GROUP BY g
    )
    SELECT group_key, n,
           CASE WHEN (CAST(n AS HUGEINT) * q_sr
                      - CAST(s_sr AS HUGEINT) * s_sr) > 0
                THEN greatest(CAST(0 AS BIGINT),
                     CAST(1000000
                     - (1000000 * (CAST(n AS HUGEINT) * q_r
                                   - CAST(s_r AS HUGEINT) * s_r))
                       // (CAST(n AS HUGEINT) * q_sr
                           - CAST(s_sr AS HUGEINT) * s_sr) AS BIGINT))
           END AS f_seasonal_ppm,
           CASE WHEN (CAST(n AS HUGEINT) * q_tr
                      - CAST(s_tr AS HUGEINT) * s_tr) > 0
                THEN greatest(CAST(0 AS BIGINT),
                     CAST(1000000
                     - (1000000 * (CAST(n AS HUGEINT) * q_r
                                   - CAST(s_r AS HUGEINT) * s_r))
                       // (CAST(n AS HUGEINT) * q_tr
                           - CAST(s_tr AS HUGEINT) * s_tr) AS BIGINT))
           END AS f_trend_ppm
    FROM m
"""
