"""Round-13 staging — CUPED variance reduction and the md5
permutation test (operators/ml_eval.py). Registration-ready oracle
texts in CUPED_ORACLE / PERM_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC (the TVD cut)

# per-user pre/post spend cents, md5 arm, user_id % 4 cohorts
_CUPED_INPUT = f"""
    u AS (
        SELECT user_id % 4 AS g,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                   % 2 AS t,
               CAST(SUM(CASE WHEN epoch_us(ts) < {CUT_US}
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) >= {CUT_US}
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM read_parquet('{{sf}}/events.parquet')
        GROUP BY user_id
    )
"""

_COVN = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_VARXN = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_VARYN = (
    "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_DX = (
    "(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
)
_DY = (
    "(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
)
_THETA = f"({_COVN} / {_VARXN})"
_GUARD = f"n1 > 0 AND n0 > 0 AND {_VARXN} > 0"

CUPED_ORACLE = (
    "WITH "
    + _CUPED_INPUT
    + f""",
    m AS (
        SELECT g AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS n1,
               CAST(SUM(1 - t) AS BIGINT) AS n0,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(t * x) AS BIGINT) AS sx1,
               CAST(SUM(t * y) AS BIGINT) AS sy1,
               CAST(SUM((1 - t) * x) AS BIGINT) AS sx0,
               CAST(SUM((1 - t) * y) AS BIGINT) AS sy0,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM u GROUP BY g
    )
    SELECT group_key, n, n1, n0, sx, sy,
           CASE WHEN {_GUARD} THEN {_THETA} END AS theta,
           CASE WHEN n1 > 0 AND n0 > 0 THEN {_DY} END AS diff_raw,
           CASE WHEN {_GUARD} THEN {_DY} - {_THETA} * {_DX} END
               AS diff_adj,
           CASE WHEN {_VARXN} > 0 AND {_VARYN} > 0 THEN
                ({_COVN} * {_COVN}) / ({_VARXN} * {_VARYN}) END AS rho_sq
    FROM m
"""
)

PERM_ORACLE = """
    WITH units AS (
        SELECT event_type AS g, CAST(user_id AS VARCHAR) AS u,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY event_type, user_id
    ),
    assigned AS (
        SELECT g, v, CAST(r.b AS BIGINT) AS b,
               ('0x' || substr(md5(CASE WHEN r.b = 0 THEN u
                    ELSE u || '#' || r.b::VARCHAR END), 1, 2))::BIGINT % 2
                   AS t
        FROM units CROSS JOIN (SELECT unnest(range(0, 33)) AS b) r
    ),
    per_b AS (
        SELECT g, b,
               CAST(SUM(t) AS BIGINT) AS n1,
               CAST(SUM(1 - t) AS BIGINT) AS n0,
               CAST(SUM(t * v) AS BIGINT) AS s1,
               CAST(SUM((1 - t) * v) AS BIGINT) AS s0
        FROM assigned GROUP BY g, b
    ),
    obs AS (
        SELECT g, n1 AS n1_o, n0 AS n0_o, s1 AS s1_o, s0 AS s0_o
        FROM per_b WHERE b = 0
    ),
    ex AS (
        SELECT p.g, n1_o, n0_o, s1_o, s0_o,
               CASE WHEN p.n1 > 0 AND p.n0 > 0 AND n1_o > 0 AND n0_o > 0
                    AND abs(CAST(p.s1 * p.n0 - p.s0 * p.n1 AS HUGEINT))
                        * CAST(n1_o * n0_o AS HUGEINT)
                        >= abs(CAST(s1_o * n0_o - s0_o * n1_o AS HUGEINT))
                           * CAST(p.n1 * p.n0 AS HUGEINT)
                    THEN 1 ELSE 0 END AS is_extreme
        FROM per_b p JOIN obs ON obs.g = p.g
        WHERE p.b > 0
    )
    SELECT g AS group_key,
           CAST(MAX(n1_o) AS BIGINT) AS n1,
           CAST(MAX(n0_o) AS BIGINT) AS n0,
           CAST(MAX(s1_o * n0_o - s0_o * n1_o) AS BIGINT) AS diff_num_obs,
           CAST(SUM(is_extreme) AS BIGINT) AS n_extreme,
           CAST((1000000 * (1 + SUM(is_extreme))) // 33 AS BIGINT) AS p_ppm
    FROM ex GROUP BY g
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def _cuped_input(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return (
        load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN unix_micros(ts) < {CUT_US}"
                " THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)"
                " AS BIGINT)"
            ).alias("x"),
            F.expr(
                f"CAST(SUM(CASE WHEN unix_micros(ts) >= {CUT_US}"
                " THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)"
                " AS BIGINT)"
            ).alias("y"),
        )
        .select(
            (F.col("user_id") % 4).alias("g"),
            F.expr(
                "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("t"),
            "x",
            "y",
        )
    )


def test_cuped_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.ml_eval import cuped_adjust

    got = cuped_adjust(_cuped_input(spark), "g", "t", "x", "y").toPandas()
    con = duckdb.connect()
    exp = con.sql(CUPED_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    for col in ("theta", "diff_raw", "diff_adj", "rho_sq"):
        ga = [v.hex() for v in got[col] if v == v]
        ea = [v.hex() for v in exp[col] if v == v]
        assert ga == ea and len(ga) > 0, col
    assert ((got["rho_sq"].dropna() >= 0) & (got["rho_sq"].dropna() <= 1)).all()


def test_cuped_hand_values(spark):
    """X == Y exactly: theta = 1, rho_sq = 1 (up to the spelled op
    chain), diff_adj = diff_raw - 1*diff_raw = 0."""
    from kafka_streams_aggregate_spark.operators.ml_eval import cuped_adjust

    rows = [
        ("g", 1, 10, 10), ("g", 1, 20, 20),
        ("g", 0, 10, 10), ("g", 0, 30, 30),
    ]
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    [r] = cuped_adjust(df, "g", "t", "x", "y").collect()
    assert r["theta"] == 1.0 and r["rho_sq"] == 1.0
    assert r["diff_raw"] == 15.0 - 20.0
    assert r["diff_adj"] == 0.0


def test_permutation_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import (
        permutation_test,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.col("event_type").alias("g"),
        F.col("user_id").alias("u"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
    )
    got = permutation_test(ev, "g", "u", "v", n_perms=32).toPandas()
    con = duckdb.connect()
    exp = con.sql(PERM_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    # p in [1/33, 1] by the add-one convention
    assert (got["p_ppm"] >= 1_000_000 // 33).all()
    assert (got["p_ppm"] <= 1_000_000).all()


def test_permutation_null_data_p_is_one(spark):
    """All units identical: every permutation diff ties the observed
    0 -> n_extreme = 32, p = 33/33 = 1."""
    from kafka_streams_aggregate_spark.operators.ml_eval import (
        permutation_test,
    )

    rows = [("g", i, 100) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, u long, v long")
    [r] = permutation_test(df, "g", "u", "v", n_perms=32).collect()
    assert r["n_extreme"] == 32
    assert r["p_ppm"] == 1_000_000
    assert r["diff_num_obs"] == 0
