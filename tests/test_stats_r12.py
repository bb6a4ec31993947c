"""Nonparametric / monitoring round-12 staging — runs test, Friedman,
Page-Hinkley, newsvendor, DiD uplift (operators/stats.py, costing.py,
ml_eval.py). Registration-ready oracle texts in *_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC (the TVD cut)

RUNS_ORACLE = """
    WITH s AS (
        SELECT user_id AS g,
               CASE WHEN value >= 250 THEN 1 ELSE 0 END AS b,
               ts, event_id
        FROM read_parquet('{sf}/events.parquet')
    ),
    isl AS (
        SELECT g, b,
               row_number() OVER (PARTITION BY g ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY g, b ORDER BY ts, event_id)
                   AS island
        FROM s
    ),
    per_run AS (
        SELECT g, b, island, CAST(COUNT(*) AS BIGINT) AS _len
        FROM isl GROUP BY 1, 2, 3
    ),
    agg AS (
        SELECT g AS group_key,
               CAST(COUNT(*) AS BIGINT) AS runs,
               CAST(SUM(b * _len) AS BIGINT) AS n1,
               CAST(SUM((1 - b) * _len) AS BIGINT) AS n0
        FROM per_run GROUP BY g
    )
    SELECT group_key, n1, n0, runs,
           CASE WHEN n1 > 0 AND n0 > 0 AND n1 + n0 >= 2 THEN
                (CAST(runs AS DOUBLE)
                 - (1.0 + CAST(2 * n1 * n0 AS DOUBLE)
                          / CAST(n1 + n0 AS DOUBLE)))
                / sqrt(CAST(2 * n1 * n0 AS DOUBLE)
                       * CAST(2 * n1 * n0 - (n1 + n0) AS DOUBLE)
                       / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 AS DOUBLE)
                          * CAST(n1 + n0 - 1 AS DOUBLE))) END AS z
    FROM agg
"""

# blocks = epoch weeks, treatments = epoch weekday (0 = Thursday),
# value = daily revenue cents
FRIEDMAN_ORACLE = """
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY 1
    ),
    base AS (
        SELECT CAST(day // 7 AS BIGINT) AS block,
               CAST(day % 7 AS BIGINT) AS treatment, v
        FROM daily
    ),
    ks AS (SELECT COUNT(DISTINCT treatment) AS k FROM base),
    complete AS (
        SELECT block FROM base GROUP BY block
        HAVING COUNT(DISTINCT treatment) = (SELECT k FROM ks)
           AND COUNT(*) = (SELECT k FROM ks)
    ),
    scoped AS (SELECT base.* FROM base JOIN complete USING (block)),
    by_val AS (
        SELECT block, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM scoped GROUP BY 1, 2
    ),
    ranked AS (
        SELECT block, v, c,
               CAST(SUM(c) OVER (PARTITION BY block ORDER BY v
                                 ROWS UNBOUNDED PRECEDING) - c AS BIGINT)
                   AS cum_prev
        FROM by_val
    ),
    with_r2 AS (
        SELECT s.block, s.treatment,
               CAST(2 * r.cum_prev + r.c + 1 AS BIGINT) AS r2
        FROM scoped s JOIN ranked r ON r.block = s.block AND r.v = s.v
    ),
    per_treat AS (
        SELECT treatment, CAST(SUM(r2) AS BIGINT) AS r2_sum,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM with_r2 GROUP BY treatment
    ),
    g AS (
        SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
               CAST(MIN(n_blocks) AS BIGINT) AS nb_min,
               CAST(COUNT(*) AS BIGINT) AS k_treatments,
               CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS sum_r2_sq
        FROM per_treat
    )
    SELECT n_blocks, k_treatments, sum_r2_sq,
           CASE WHEN nb_min = n_blocks AND n_blocks > 0 THEN
           CAST((1000000 * 3 * (sum_r2_sq - n_blocks * n_blocks
                 * k_treatments * (k_treatments + 1) * (k_treatments + 1)))
                // (n_blocks * k_treatments * (k_treatments + 1)) AS BIGINT)
           END AS chi2_ppm
    FROM g
"""

PH_ORACLE = """
    WITH s AS (
        SELECT user_id AS g,
               CAST(floor(value * 100) AS BIGINT) AS x,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM read_parquet('{sf}/events.parquet')
    ),
    cum AS (
        SELECT g, CAST(rn AS BIGINT) AS rn,
               SUM(x - 25000) OVER (PARTITION BY g ORDER BY rn
                                    ROWS UNBOUNDED PRECEDING) AS gsum
        FROM s
    ),
    ph AS (
        SELECT g, rn,
               CAST(gsum - least(0, MIN(gsum) OVER (
                   PARTITION BY g ORDER BY rn
                   ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS ph
        FROM cum
    ),
    top AS (
        SELECT g, rn, ph,
               row_number() OVER (PARTITION BY g ORDER BY ph DESC, rn)
                   AS _r
        FROM ph
    )
    SELECT g AS group_key, ph AS ph_max, rn AS at_rn,
           ph > 500000 AS alarm
    FROM top WHERE _r = 1
"""

NEWSVENDOR_ORACLE = """
    WITH dem AS (
        SELECT l_partkey AS product,
               CAST(datediff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE)) AS BIGINT) AS d,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT product, q,
               CAST(row_number() OVER (PARTITION BY product ORDER BY q, d)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY product) AS BIGINT) AS n
        FROM dem
    )
    SELECT product AS group_key,
           CAST(MAX(n) AS BIGINT) AS n_periods,
           CAST(666666 AS BIGINT) AS cr_ppm,
           CAST(MIN(CASE WHEN rn >= (666666 * n + 999999) // 1000000
                         THEN q END) AS BIGINT) AS q_star,
           CAST(MAX(q) AS BIGINT) AS q_max
    FROM ranked GROUP BY product
"""

UPLIFT_ORACLE = f"""
    WITH s AS (
        SELECT event_type AS g,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                   % 2 AS t,
               CASE WHEN epoch_us(ts) >= {CUT_US} THEN 1 ELSE 0 END AS p,
               CAST(floor(value * 100) AS BIGINT) AS v
        FROM read_parquet('{{sf}}/events.parquet')
    ),
    c AS (
        SELECT g AS group_key,
               CAST(SUM(CASE WHEN t=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tpre,
               CAST(SUM(CASE WHEN t=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tpost,
               CAST(SUM(CASE WHEN t=0 AND p=0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cpre,
               CAST(SUM(CASE WHEN t=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cpost,
               CAST(SUM(CASE WHEN t=1 AND p=0 THEN v ELSE 0 END) AS BIGINT)
                   AS s_tpre,
               CAST(SUM(CASE WHEN t=1 AND p=1 THEN v ELSE 0 END) AS BIGINT)
                   AS s_tpost,
               CAST(SUM(CASE WHEN t=0 AND p=0 THEN v ELSE 0 END) AS BIGINT)
                   AS s_cpre,
               CAST(SUM(CASE WHEN t=0 AND p=1 THEN v ELSE 0 END) AS BIGINT)
                   AS s_cpost
        FROM s GROUP BY g
    )
    SELECT group_key, n_tpre, n_tpost, n_cpre, n_cpost,
           s_tpre, s_tpost, s_cpre, s_cpost,
           CASE WHEN n_tpre > 0 AND n_tpost > 0 AND n_cpre > 0
                 AND n_cpost > 0 THEN CAST(
                ((1000000 * s_tpost) // n_tpost
                 - (1000000 * s_tpre) // n_tpre)
                - ((1000000 * s_cpost) // n_cpost
                   - (1000000 * s_cpre) // n_cpre) AS BIGINT) END
               AS did_scaled
    FROM c
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_runs_test_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import runs_test
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.col("user_id").alias("g"),
        F.expr("CASE WHEN value >= 250 THEN 1 ELSE 0 END").alias("b"),
        "ts",
        "event_id",
    )
    got = runs_test(ev, "g", "b", ["ts", "event_id"]).toPandas()
    con = duckdb.connect()
    exp = con.sql(RUNS_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    gz = [v.hex() for v in got["z"] if v == v]
    ez = [v.hex() for v in exp["z"] if v == v]
    assert gz == ez and len(gz) > 0


def test_runs_test_hand_values(spark):
    """1 0 1 0 -> 4 runs of n1=n0=2: E[R] = 3, Var = 2*4*4/(16*3)
    = 2/3 -> z = 1/sqrt(2/3). All-same sequence -> NULL."""
    import math

    from kafka_streams_aggregate_spark.operators.stats import runs_test

    alt = spark.createDataFrame(
        [("g", 1, 1), ("g", 0, 2), ("g", 1, 3), ("g", 0, 4),
         ("h", 1, 1), ("h", 1, 2)],
        "g string, b long, i long",
    )
    rows = {r["group_key"]: r for r in runs_test(alt, "g", "b", ["i"]).collect()}
    g = rows["g"]
    assert (g["n1"], g["n0"], g["runs"]) == (2, 2, 4)
    assert abs(g["z"] - (4 - 3) / math.sqrt(2 * 4 * (8 - 4) / (16.0 * 3))) < 1e-12
    assert rows["h"]["z"] is None


def test_friedman_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import friedman_chi2
    from kafka_streams_aggregate_spark.sources.tables import load_table

    daily = (
        load_table(spark, "events", SF)
        .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(
            F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    base = daily.select(
        F.expr("CAST(day div 7 AS BIGINT)").alias("block"),
        F.expr("CAST(day % 7 AS BIGINT)").alias("treatment"),
        "v",
    )
    got = friedman_chi2(base, "block", "treatment", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(FRIEDMAN_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    assert got["n_blocks"][0] > 0 and got["k_treatments"][0] == 7
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_friedman_hand_values(spark):
    """Two complete blocks over 3 treatments, same order both times
    (v: a<b<c): R_j = {2, 4, 6} doubled = {4, 8, 12}; chi2 =
    3*(16+64+144 - 4*3*16)/(2*3*4) = 3*32/24 = 4.0 (the k=3, n=2
    maximum); an incomplete third block is dropped."""
    from kafka_streams_aggregate_spark.operators.stats import friedman_chi2

    rows = [
        (1, "a", 10), (1, "b", 20), (1, "c", 30),
        (2, "a", 1), (2, "b", 2), (2, "c", 3),
        (3, "a", 5),  # incomplete block
    ]
    df = spark.createDataFrame(rows, "block long, t string, v long")
    [r] = friedman_chi2(df, "block", "t", "v").collect()
    assert (r["n_blocks"], r["k_treatments"]) == (2, 3)
    assert r["chi2_ppm"] == 4_000_000


def test_friedman_duplicate_cell_block_dropped(spark):
    """A block observing treatment 'a' TWICE passes a countDistinct
    gate but violates one-observation-per-cell — the round-12 gate
    (count(*) == countDistinct == k) drops it, leaving the same two
    clean blocks as the hand case above."""
    from kafka_streams_aggregate_spark.operators.stats import friedman_chi2

    rows = [
        (1, "a", 10), (1, "b", 20), (1, "c", 30),
        (2, "a", 1), (2, "b", 2), (2, "c", 3),
        (3, "a", 5), (3, "a", 6), (3, "b", 7), (3, "c", 8),  # dup cell
    ]
    df = spark.createDataFrame(rows, "block long, t string, v long")
    [r] = friedman_chi2(df, "block", "t", "v").collect()
    assert (r["n_blocks"], r["k_treatments"]) == (2, 3)
    assert r["chi2_ppm"] == 4_000_000


def test_page_hinkley_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import page_hinkley
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.col("user_id").alias("g"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("x"),
        "ts",
        "event_id",
    )
    got = page_hinkley(
        ev, "g", "x", ["ts", "event_id"], delta=25000, lam=500000
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(PH_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_page_hinkley_hand_values(spark):
    """delta=0: values 5, -10, 7, 1: g = 5, -5, 2, 3;
    min-prefix = 0, 0(-5), -5, -5 -> PH = 5, 0, 7, 8: max 8 at rn 4;
    lam=7 -> alarm."""
    from kafka_streams_aggregate_spark.operators.stats import page_hinkley

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", -10, 2), ("g", 7, 3), ("g", 1, 4)],
        "g string, x long, i long",
    )
    [r] = page_hinkley(df, "g", "x", ["i"], delta=0, lam=7).collect()
    assert (r["ph_max"], r["at_rn"], r["alarm"]) == (8, 4, True)


def test_newsvendor_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import (
        newsvendor_policy,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    dem = (
        load_table(spark, "lineitem", SF)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    got = newsvendor_policy(
        dem, "product", "q", "d", price_cents=300, cost_cents=100
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(NEWSVENDOR_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    assert (got["q_star"] <= got["q_max"]).all()


def test_newsvendor_hand_values(spark):
    """Demands {10, 20, 30, 40}, CR = 2/3: rank target =
    ceil(666666*4/1e6) = ceil(2.67) = 3 -> q* = 30. CR = 1/2 ->
    target 2 -> 20."""
    from kafka_streams_aggregate_spark.operators.costing import (
        newsvendor_policy,
    )

    df = spark.createDataFrame(
        [("p", 10, 1), ("p", 20, 2), ("p", 30, 3), ("p", 40, 4)],
        "product string, q long, d long",
    )
    [r] = newsvendor_policy(df, "product", "q", "d", 300, 100).collect()
    assert (r["cr_ppm"], r["q_star"]) == (666_666, 30)
    [r] = newsvendor_policy(df, "product", "q", "d", 200, 100).collect()
    assert (r["cr_ppm"], r["q_star"]) == (500_000, 20)


def test_uplift_did_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import uplift_did
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.col("event_type").alias("g"),
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10)"
            " AS BIGINT) % 2"
        ).alias("t"),
        F.expr(f"CASE WHEN unix_micros(ts) >= {CUT_US} THEN 1 ELSE 0 END").alias(
            "p"
        ),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
    )
    got = uplift_did(ev, "g", "t", "p", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(UPLIFT_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_uplift_did_hand_values(spark):
    """Treated moves +10 cents, control +4: DiD = 6 cents =
    6,000,000 scaled (means over single observations)."""
    from kafka_streams_aggregate_spark.operators.ml_eval import uplift_did

    rows = [
        ("g", 1, 0, 100), ("g", 1, 1, 110),
        ("g", 0, 0, 50), ("g", 0, 1, 54),
    ]
    df = spark.createDataFrame(rows, "g string, t long, p long, v long")
    [r] = uplift_did(df, "g", "t", "p", "v").collect()
    assert r["did_scaled"] == 6_000_000
