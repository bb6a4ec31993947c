"""Round-13 staging, batch 3 — Kendall tau-b (support-grid exact) and
median/MAD robust scaler (operators/stats.py). Registration-ready
oracle texts in KENDALL_ORACLE / MAD_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# per-customer: x = order count, y = spend bucket (strongly
# correlated by construction)
_XY_SQL = """
    xy AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               c.c_custkey AS id,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS x,
               CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100)
                    AS BIGINT)), 0) // 5000000 AS BIGINT) AS y
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
"""

KENDALL_ORACLE = (
    "WITH "
    + _XY_SQL
    + """,
    cells AS (
        SELECT g, x, y, CAST(COUNT(*) AS BIGINT) AS c
        FROM xy GROUP BY g, x, y
    ),
    pair_mass AS (
        SELECT a.g,
               CAST(COALESCE(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT)
                   AS n_concordant,
               CAST(COALESCE(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT)
                   AS n_discordant
        FROM cells a JOIN cells b
          ON b.g = a.g AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
        GROUP BY a.g
    ),
    xm AS (
        SELECT g, CAST(SUM(tx * (tx - 1) // 2) AS BIGINT) AS n1t
        FROM (SELECT g, x, SUM(c) AS tx FROM cells GROUP BY g, x)
        GROUP BY g
    ),
    ym AS (
        SELECT g, CAST(SUM(ty * (ty - 1) // 2) AS BIGINT) AS n2t
        FROM (SELECT g, y, SUM(c) AS ty FROM cells GROUP BY g, y)
        GROUP BY g
    ),
    nrow AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY g),
    j AS (
        SELECT nrow.g, n,
               CAST(COALESCE(p.n_concordant, 0) AS BIGINT) AS n_concordant,
               CAST(COALESCE(p.n_discordant, 0) AS BIGINT) AS n_discordant,
               CAST(n * (n - 1) // 2 AS BIGINT) AS n0, n1t, n2t
        FROM nrow
        LEFT JOIN pair_mass p ON p.g = nrow.g
        JOIN xm ON xm.g = nrow.g
        JOIN ym ON ym.g = nrow.g
    )
    SELECT g AS group_key, n, n_concordant, n_discordant,
           CASE WHEN n0 - n1t > 0 AND n0 - n2t > 0 THEN
                CAST(n_concordant - n_discordant AS DOUBLE)
                / (sqrt(CAST(n0 - n1t AS DOUBLE))
                   * sqrt(CAST(n0 - n2t AS DOUBLE))) END AS tau_b
    FROM j
"""
)

_MED_STAGE = """
    {out} AS (
        SELECT g,
               CAST(CASE WHEN MAX(n) % 2 = 1
                    THEN 2 * MAX(CASE WHEN rn * 2 = n + 1 THEN _v END)
                    ELSE MAX(CASE WHEN rn * 2 = n THEN _v END)
                         + MAX(CASE WHEN rn * 2 = n + 2 THEN _v END) END
                    AS BIGINT) AS {out}
        FROM (
            SELECT g, {col} AS _v,
                   row_number() OVER (PARTITION BY g ORDER BY {col}, id)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS n
            FROM {src})
        WHERE rn * 2 IN (n, n + 1, n + 2)
        GROUP BY g
    )
"""

MAD_ORACLE = (
    """
    WITH base AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(c_custkey AS BIGINT) AS id,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
    ),"""
    + _MED_STAGE.format(out="med2", col="v", src="base")
    + """,
    dev AS (
        SELECT base.g, id, v, med2,
               CAST(abs(2 * v - med2) AS BIGINT) AS adev2
        FROM base JOIN med2 ON med2.g = base.g
    ),"""
    + _MED_STAGE.format(out="mad4", col="adev2", src="dev")
    + """
    SELECT dev.g AS group_key, id, v, dev.med2, mad4.mad4,
           CASE WHEN mad4 > 0 THEN
                CAST((1000000 * 2 * (2 * v - dev.med2)) // mad4 AS BIGINT)
           END AS robust_z_ppm
    FROM dev JOIN mad4 ON mad4.g = dev.g
    WHERE id % {mod} = 0
"""
)


def _xy(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.col("c_custkey").alias("id"),
        )
        .agg(
            F.count("o_orderkey").cast("bigint").alias("x"),
            F.expr(
                "CAST(COALESCE(SUM(CAST(floor(o_totalprice * 100)"
                " AS BIGINT)), 0) div 5000000 AS BIGINT)"
            ).alias("y"),
        )
    )


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_kendall_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.stats import kendall_tau_b

    got = kendall_tau_b(_xy(spark), "g", "x", "y").toPandas()
    con = duckdb.connect()
    exp = con.sql(KENDALL_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    gt = [v.hex() for v in got["tau_b"] if v == v]
    et = [v.hex() for v in exp["tau_b"] if v == v]
    assert gt == et and len(gt) > 0
    # order count and spend are concordant by construction (small
    # nations at sf0.001 dip to ~0.2; the median sits ~0.8)
    assert (got["tau_b"].dropna() > 0).all()
    assert got["tau_b"].dropna().median() > 0.5


def test_kendall_hand_values(spark):
    """Perfect concordance (1,1)(2,2)(3,3): tau = 3/(sqrt(3)*sqrt(3))
    — which is 1.0000000000000002, NOT 1.0 (sqrt(3)^2 overshoots by
    one ulp; the fixed op chain is the contract, the hand pin
    documents the ulp). With an x tie (1,1)(1,2)(2,3): C=2, D=0,
    n0=3, n1=1, n2=0 -> tau = 2/(sqrt(2)*sqrt(3))."""
    import math

    from kafka_streams_aggregate_spark.operators.stats import kendall_tau_b

    perf = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 2), ("g", 3, 3)], "g string, x long, y long"
    )
    [r] = kendall_tau_b(perf, "g", "x", "y").collect()
    assert (r["n_concordant"], r["n_discordant"]) == (3, 0)
    assert r["tau_b"] == 3.0 / (math.sqrt(3.0) * math.sqrt(3.0))
    assert abs(r["tau_b"] - 1.0) < 1e-15

    tied = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 2), ("g", 2, 3)], "g string, x long, y long"
    )
    [r] = kendall_tau_b(tied, "g", "x", "y").collect()
    assert (r["n_concordant"], r["n_discordant"]) == (2, 0)
    assert abs(r["tau_b"] - 2.0 / (math.sqrt(2.0) * math.sqrt(3.0))) < 1e-15


def test_mad_scaler_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import mad_scaler
    from kafka_streams_aggregate_spark.sources.tables import load_table

    base = load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_custkey").cast("bigint").alias("id"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )
    got = mad_scaler(base, "g", "id", "v", sample_mod=2).toPandas()
    con = duckdb.connect()
    exp = con.sql(MAD_ORACLE.format(sf=SF, mod=2)).df()
    con.close()
    _cmp(got, exp, ["group_key", "id"])


def test_mad_scaler_hand_values(spark):
    """{1,2,3,4,100}: med=3 (med2=6), adev2={4,2,0,2,194}, mad4=4
    (doubled median of devs = 2*2): score(100) = 1e6*2*194/4 = 97e6;
    score(1) = 1e6*2*(-4)/4 = -2e6 — the outlier scores huge, the
    near-median point small, SIGNED."""
    from kafka_streams_aggregate_spark.operators.stats import mad_scaler

    rows = [("g", i + 1, v) for i, v in enumerate([1, 2, 3, 4, 100])]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {r["id"]: r for r in mad_scaler(df, "g", "id", "v").collect()}
    assert out[5]["robust_z_ppm"] == 97_000_000
    assert out[1]["robust_z_ppm"] == -2_000_000
    assert out[3]["robust_z_ppm"] == 0
    assert out[1]["med2"] == 6 and out[1]["mad4"] == 4
