"""Round-14 staging, batch 3 — Cronbach's alpha and Lin's concordance
correlation (operators/ml_eval.py). Registration-ready oracle texts
in ALPHA_ORACLE / CCC_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
CUT_US = 1705363200000000  # the TVD cut (2024-01-16 UTC)

# group = user cohort, unit = user, item = event type, v = spend cents
ALPHA_ORACLE = """
    WITH base AS (
        SELECT user_id % 4 AS g, user_id AS u, event_type AS item,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM read_parquet('{sf}/events.parquet')
        GROUP BY 1, 2, 3
    ),
    k_per AS (SELECT g, CAST(COUNT(DISTINCT item) AS BIGINT) AS k
              FROM base GROUP BY g),
    gate AS (
        SELECT b.g, b.u,
               COUNT(*) = MAX(k) AND COUNT(DISTINCT item) = MAX(k) AS ok
        FROM base b JOIN k_per ON k_per.g = b.g
        GROUP BY b.g, b.u
    ),
    gated AS (
        SELECT base.* FROM base
        JOIN gate ON gate.g = base.g AND gate.u = base.u
        WHERE gate.ok
    ),
    per_item AS (
        SELECT g, item, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s,
               SUM(CAST(v AS HUGEINT) * v) AS q
        FROM gated GROUP BY g, item
    ),
    item_vn AS (
        SELECT g, CAST(MAX(n) AS BIGINT) AS n_units,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(n AS HUGEINT) * q
                   - CAST(s AS HUGEINT) * s) AS vn_items
        FROM per_item GROUP BY g
    ),
    totals AS (
        SELECT g,
               CAST(COUNT(*) AS HUGEINT) * SUM(CAST(t AS HUGEINT) * t)
               - CAST(SUM(t) AS HUGEINT) * SUM(t) AS vn_total
        FROM (SELECT g, u, CAST(SUM(v) AS BIGINT) AS t
              FROM gated GROUP BY g, u)
        GROUP BY g
    ),
    dropped AS (
        SELECT g, CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_units_dropped
        FROM gate GROUP BY g
    )
    SELECT d.g AS group_key, n_units, k,
           CASE WHEN k >= 2 AND vn_total > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * k
                      * (vn_total - vn_items))
                     // ((k - 1) * vn_total) AS BIGINT) END AS alpha_ppm,
           n_units_dropped
    FROM dropped d
    LEFT JOIN item_vn i ON i.g = d.g
    LEFT JOIN totals t ON t.g = d.g
"""

# x = pre-cut spend, y = post-cut spend per user; cohorts
CCC_ORACLE = f"""
    WITH u AS (
        SELECT user_id % 4 AS g,
               CAST(SUM(CASE WHEN epoch_us(ts) < {CUT_US}
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) >= {CUT_US}
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM read_parquet('{{sf}}/events.parquet')
        GROUP BY user_id
    ),
    m AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM u GROUP BY g
    )
    SELECT g AS group_key, n,
           CASE WHEN (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                      + CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
                      + (CAST(sx AS HUGEINT) - sy)
                        * (CAST(sx AS HUGEINT) - sy)) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * 2
                      * (CAST(n AS HUGEINT) * sxy
                         - CAST(sx AS HUGEINT) * sy))
                     // (CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx
                         + CAST(n AS HUGEINT) * syy
                         - CAST(sy AS HUGEINT) * sy
                         + (CAST(sx AS HUGEINT) - sy)
                           * (CAST(sx AS HUGEINT) - sy)) AS BIGINT) END
               AS ccc_ppm
    FROM m
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_cronbach_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import cronbach_alpha
    from kafka_streams_aggregate_spark.sources.tables import load_table

    base = (
        load_table(spark, "events", SF)
        .groupBy(
            (F.col("user_id") % 4).alias("g"),
            F.col("user_id").alias("u"),
            F.col("event_type").alias("item"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = cronbach_alpha(base, "g", "u", "item", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(ALPHA_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_cronbach_hand_values(spark):
    """Duplicate items (b == a): alpha = exactly 1e6 ppm. Two
    anti-correlated items with tiny total variance: alpha_ppm =
    (1e6*2*(1-181)) div 1 = -360e6 — alpha is unbounded below and
    the exact rational shows it. Units missing an item are dropped
    and counted."""
    from kafka_streams_aggregate_spark.operators.ml_eval import cronbach_alpha

    dup = [("g", u, i, v) for u, v in ((1, 3), (2, 7), (3, 11))
           for i in ("a", "b")]
    df = spark.createDataFrame(dup, "g string, u long, i string, v long")
    [r] = cronbach_alpha(df, "g", "u", "i", "v").collect()
    assert (r["n_units"], r["k"], r["alpha_ppm"]) == (3, 2, 1_000_000)

    anti = [("g", 1, "a", 0), ("g", 1, "b", 10),
            ("g", 2, "a", 10), ("g", 2, "b", 1)]
    df2 = spark.createDataFrame(anti, "g string, u long, i string, v long")
    [r] = cronbach_alpha(df2, "g", "u", "i", "v").collect()
    assert r["alpha_ppm"] == -360_000_000

    gapped = dup + [("g", 4, "a", 5)]  # unit 4 missing item b
    df3 = spark.createDataFrame(gapped, "g string, u long, i string, v long")
    [r] = cronbach_alpha(df3, "g", "u", "i", "v").collect()
    assert r["n_units"] == 3 and r["n_units_dropped"] == 1

    # r13-advice fix: a group whose units are ALL incomplete still
    # emits its row — NULL stats, non-NULL drop count.
    all_dropped = [("h", 1, "a", 5), ("h", 2, "b", 7)]  # k=2, no complete unit
    df4 = spark.createDataFrame(
        all_dropped, "g string, u long, i string, v long"
    )
    [r] = cronbach_alpha(df4, "g", "u", "i", "v").collect()
    assert r["n_units"] is None and r["alpha_ppm"] is None
    assert r["n_units_dropped"] == 2


def test_ccc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import lin_ccc
    from kafka_streams_aggregate_spark.sources.tables import load_table

    u = (
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
        .select((F.col("user_id") % 4).alias("g"), "x", "y")
    )
    got = lin_ccc(u, "g", "x", "y").toPandas()
    con = duckdb.connect()
    exp = con.sql(CCC_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    assert got["ccc_ppm"].notna().all()


def test_ccc_hand_values(spark):
    """y == x -> CCC exactly 1e6. y = x + 5 (constant bias, n=2,
    x = 0/10): Pearson would be 1, but CCC = 2*100e6 div
    (100+100+100) = 666666 — the agreement penalty is the whole
    point."""
    from kafka_streams_aggregate_spark.operators.ml_eval import lin_ccc

    same = [("g", 0, 0), ("g", 10, 10)]
    df = spark.createDataFrame(same, "g string, x long, y long")
    [r] = lin_ccc(df, "g", "x", "y").collect()
    assert r["ccc_ppm"] == 1_000_000

    bias = [("g", 0, 5), ("g", 10, 15)]
    df2 = spark.createDataFrame(bias, "g string, x long, y long")
    [r] = lin_ccc(df2, "g", "x", "y").collect()
    assert r["ccc_ppm"] == 666_666
