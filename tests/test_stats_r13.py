"""Round-13 staging, batch 1 — one-way ANOVA, Brown-Forsythe,
Wilcoxon signed-rank, Cochran's Q (operators/stats.py).
Registration-ready oracle texts in *_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# k=5 market segments per nation, balances in cents
_SEG_SQL = """
        SELECT CAST(c_nationkey AS BIGINT) AS g, c_mktsegment AS t,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
"""

_ANOVA_TAIL = """
    agg AS (
        SELECT g AS group_key,
               CAST(COUNT(*) AS BIGINT) AS k_treatments,
               CAST(SUM(n_j) AS BIGINT) AS n_total,
               CAST(SUM(s_j) AS BIGINT) AS s_total,
               SUM((n_j * q_j - CAST(s_j AS HUGEINT) * s_j) // n_j)
                   AS ssw_w,
               SUM((CAST(s_j AS HUGEINT) * s_j) // n_j) AS sqn_w
        FROM per_t GROUP BY g
    )
    SELECT group_key, k_treatments, n_total,
           CAST(ssw_w AS BIGINT) AS ssw,
           CAST(sqn_w - (CAST(s_total AS HUGEINT) * s_total) // n_total
                AS BIGINT) AS ssb,
           CASE WHEN k_treatments >= 2 AND n_total > k_treatments
                 AND ssw_w > 0 THEN
                CAST((CAST(1000000 AS HUGEINT)
                      * (sqn_w - (CAST(s_total AS HUGEINT) * s_total)
                         // n_total)
                      * (n_total - k_treatments))
                     // (ssw_w * (k_treatments - 1)) AS BIGINT) END
               AS f_ppm
    FROM agg
"""

ANOVA_ORACLE = (
    f"""
    WITH s AS ({_SEG_SQL}),
    per_t AS (
        SELECT g, t, CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(v) AS BIGINT) AS s_j,
               SUM(CAST(v AS HUGEINT) * v) AS q_j
        FROM s GROUP BY g, t
    ),"""
    + _ANOVA_TAIL
)

LEVENE_ORACLE = (
    f"""
    WITH s AS ({_SEG_SQL}),
    ranked AS (
        SELECT g, t, v,
               row_number() OVER (PARTITION BY g, t ORDER BY v) AS rn,
               COUNT(*) OVER (PARTITION BY g, t) AS n
        FROM s
    ),
    med AS (
        SELECT g, t,
               CAST(CASE WHEN MAX(n) % 2 = 1
                    THEN 2 * MAX(CASE WHEN rn * 2 = n + 1 THEN v END)
                    ELSE MAX(CASE WHEN rn * 2 = n THEN v END)
                         + MAX(CASE WHEN rn * 2 = n + 2 THEN v END) END
                    AS BIGINT) AS med2
        FROM ranked WHERE rn * 2 IN (n, n + 1, n + 2)
        GROUP BY g, t
    ),
    dev AS (
        SELECT s.g, s.t, abs(2 * s.v - m.med2) AS z2
        FROM s JOIN med m ON m.g = s.g AND m.t = s.t
    ),
    per_t AS (
        SELECT g, t, CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(z2) AS BIGINT) AS s_j,
               SUM(CAST(z2 AS HUGEINT) * z2) AS q_j
        FROM dev GROUP BY g, t
    ),"""
    + _ANOVA_TAIL
)

# paired md5 scores per document (independent 16-bit fields)
_PAIRED_SQL = """
        SELECT source AS g,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4))::BIGINT
                   AS a,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 4))::BIGINT
                   AS b
        FROM read_parquet('{sf}/documents.parquet')
"""

WILCOXON_ORACLE = f"""
    WITH p AS ({_PAIRED_SQL}),
    nz AS (SELECT g, a - b AS d FROM p WHERE a - b <> 0),
    by_mag AS (
        SELECT g, abs(d) AS ad,
               CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM nz GROUP BY g, abs(d)
    ),
    ranked AS (
        SELECT g, cp, c,
               CAST(SUM(c) OVER (PARTITION BY g ORDER BY ad
                    ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS cum_prev
        FROM by_mag
    ),
    agg AS (
        SELECT g AS group_key,
               CAST(SUM(c) AS BIGINT) AS n_pairs,
               CAST(SUM(cp * (2 * cum_prev + c + 1)) AS BIGINT) AS w2_plus,
               CAST(SUM(c * c * c - c) AS BIGINT) AS t_ties
        FROM ranked GROUP BY g
    )
    SELECT group_key, n_pairs, w2_plus, t_ties,
           CASE WHEN n_pairs > 0 AND
                2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - t_ties > 0
                THEN (CAST(2 * w2_plus - n_pairs * (n_pairs + 1) AS DOUBLE)
                      / 2.0)
                     / sqrt(CAST(2 * n_pairs * (n_pairs + 1)
                                 * (2 * n_pairs + 1) - t_ties AS DOUBLE)
                            / 12.0) END AS z
    FROM agg
"""

# k=3 md5 raters per document (complete blocks by construction)
_RATER3_SQL = """
        SELECT source AS g, doc_id AS i, r.t,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                          1 + 2 * r.t, 2))::BIGINT % 3 = 0
                    THEN 1 ELSE 0 END AS y
        FROM read_parquet('{sf}/documents.parquet')
        CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2)) v(t)) r
"""

COCHRAN_ORACLE = f"""
    WITH s AS ({_RATER3_SQL}),
    rows_ AS (
        SELECT g, i, CAST(SUM(y) AS BIGINT) AS l_i
        FROM s GROUP BY g, i
    ),
    row_agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(l_i) AS BIGINT) AS n_success,
               CAST(SUM(l_i * l_i) AS BIGINT) AS l2
        FROM rows_ GROUP BY g
    ),
    cols_ AS (
        SELECT g, t, CAST(SUM(y) AS BIGINT) AS g_j
        FROM s GROUP BY g, t
    ),
    col_agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS k_treatments,
               CAST(SUM(g_j * g_j) AS BIGINT) AS g2
        FROM cols_ GROUP BY g
    )
    SELECT r.g AS group_key, k_treatments, n_items, n_success,
           CASE WHEN k_treatments * n_success - l2 > 0 THEN CAST(
                (1000000 * (k_treatments - 1)
                 * (k_treatments * g2 - n_success * n_success))
                // (k_treatments * n_success - l2) AS BIGINT) END AS q_ppm
    FROM row_agg r JOIN col_agg c ON c.g = r.g
"""


def _seg(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_mktsegment").alias("t"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_anova_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import anova_oneway

    got = anova_oneway(_seg(spark), "g", "t", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(ANOVA_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_anova_hand_values(spark):
    """Treatments {0,0} and {10,10}: SSW = 0 -> F NULL; {0,2} and
    {10,12}: S=24, N=4; sqn terms 4//2 + 484//2 = 2+242=244;
    ssb = 244 - 576//4 = 100; ssw = (2*4-4)//2 + (2*244-484)//2
    = 2+2 = 4; F = 1e6*100*2/(4*1) = 50e6."""
    from kafka_streams_aggregate_spark.operators.stats import anova_oneway

    df0 = spark.createDataFrame(
        [("g", "a", 0), ("g", "a", 0), ("g", "b", 10), ("g", "b", 10)],
        "g string, t string, v long",
    )
    [r] = anova_oneway(df0, "g", "t", "v").collect()
    assert r["ssw"] == 0 and r["f_ppm"] is None

    df = spark.createDataFrame(
        [("g", "a", 0), ("g", "a", 2), ("g", "b", 10), ("g", "b", 12)],
        "g string, t string, v long",
    )
    [r] = anova_oneway(df, "g", "t", "v").collect()
    assert (r["k_treatments"], r["n_total"]) == (2, 4)
    assert (r["ssb"], r["ssw"]) == (100, 4)
    assert r["f_ppm"] == 50_000_000


def test_levene_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        levene_brown_forsythe,
    )

    got = levene_brown_forsythe(_seg(spark), "g", "t", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(LEVENE_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_levene_hand_values(spark):
    """Tight sample {10,10,10} (median 10, all z2=0) vs spread
    {0,50,100} (median 50, z2 = 100,0,100): unequal spreads give a
    positive F on the deviations; equal samples give ssb 0."""
    from kafka_streams_aggregate_spark.operators.stats import (
        levene_brown_forsythe,
    )

    rows = [("g", "a", 10)] * 3 + [("g", "b", 0), ("g", "b", 50), ("g", "b", 100)]
    df = spark.createDataFrame(rows, "g string, t string, v long")
    [r] = levene_brown_forsythe(df, "g", "t", "v").collect()
    # z2 sets: a = {0,0,0}; b = {100,0,100}
    # per_t b: n=3, s=200, q=20000; ssw_b = (3*20000-40000)//3 = 6666
    # sqn: 0 + 40000//3 = 13333; ssb = 13333 - 40000//6 = 6667
    assert (r["ssw"], r["ssb"]) == (6666, 6667)
    assert r["f_ppm"] == (1_000_000 * 6667 * 4) // (6666 * 1)


def test_wilcoxon_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        wilcoxon_signed_rank,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    p = load_table(spark, "documents", SF).select(
        F.col("source").alias("g"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 9, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("a"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 13, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("b"),
    )
    got = wilcoxon_signed_rank(p, "g", "a", "b").toPandas()
    con = duckdb.connect()
    exp = con.sql(WILCOXON_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    gz = [v.hex() for v in got["z"] if v == v]
    ez = [v.hex() for v in exp["z"] if v == v]
    assert gz == ez and len(gz) > 0


def test_wilcoxon_hand_values(spark):
    """Diffs +1, +2, +3, -4: |d| ranks 1..4, W+ = 1+2+3 = 6 (doubled
    12); E[W+] = 5, Var = 4*5*9/24 = 7.5 -> z = 1/sqrt(7.5).
    A zero diff is dropped."""
    import math

    from kafka_streams_aggregate_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    rows = [
        ("g", 11, 10), ("g", 12, 10), ("g", 13, 10), ("g", 6, 10),
        ("g", 5, 5),  # zero diff dropped
    ]
    df = spark.createDataFrame(rows, "g string, a long, b long")
    [r] = wilcoxon_signed_rank(df, "g", "a", "b").collect()
    assert (r["n_pairs"], r["w2_plus"], r["t_ties"]) == (4, 12, 0)
    assert abs(r["z"] - 1.0 / math.sqrt(7.5)) < 1e-12


def test_cochran_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import cochran_q
    from kafka_streams_aggregate_spark.sources.tables import load_table

    y = (
        "CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)),"
        " {off}, 2), 16, 10) AS BIGINT) % 3 = 0 THEN 1 ELSE 0 END"
    )
    s = load_table(spark, "documents", SF).selectExpr(
        "source AS g",
        "doc_id AS i",
        f"stack(3, CAST(0 AS BIGINT), {y.format(off=1)},"
        f" CAST(1 AS BIGINT), {y.format(off=3)},"
        f" CAST(2 AS BIGINT), {y.format(off=5)}) AS (t, y)",
    )
    got = cochran_q(s, "g", "i", "t", "y").toPandas()
    con = duckdb.connect()
    exp = con.sql(COCHRAN_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_cochran_hand_values(spark):
    """3 raters, 4 items; rater totals G = (3, 1, 1), row totals
    L = (3, 1, 1, 0) -> N = 5, sum G² = 11, sum L² = 11:
    Q = 2*(33-25)/(15-11) = 4 -> 4e6 ppm. An incomplete item (only
    2 of 3 raters) is dropped by the gate."""
    from kafka_streams_aggregate_spark.operators.stats import cochran_q

    rows = [
        # item 1: all mark
        ("g", 1, 0, 1), ("g", 1, 1, 1), ("g", 1, 2, 1),
        # item 2: only rater 0
        ("g", 2, 0, 1), ("g", 2, 1, 0), ("g", 2, 2, 0),
        # item 3: only rater 1... swap: only rater 2 for asymmetry
        ("g", 3, 0, 1), ("g", 3, 1, 0), ("g", 3, 2, 0),
        # item 4: none
        ("g", 4, 0, 0), ("g", 4, 1, 0), ("g", 4, 2, 0),
        # item 5: INCOMPLETE (2 raters) -> dropped
        ("g", 5, 0, 1), ("g", 5, 1, 1),
    ]
    df = spark.createDataFrame(rows, "g string, i long, t long, y long")
    [r] = cochran_q(df, "g", "i", "t", "y").collect()
    assert (r["k_treatments"], r["n_items"], r["n_success"]) == (3, 4, 5)
    # G = (3,1,0)? recompute: rater0 marks items 1,2,3 -> 3; rater1
    # marks item 1 -> 1; rater2 marks item 1 -> 1. sum G² = 11.
    # L = (3,1,1,0), sum L² = 11.
    # Q = 2*(3*11 - 25)/(3*5 - 11) = 2*8/4 = 4
    assert r["q_ppm"] == 4_000_000
