"""Round-15 fresh queue, stats batch — turning points, Cox-Stuart,
Kendall's W, ICC(1), squared Theil's U2, tracking signal, Dixon's Q,
ordinal patterns, Grubbs max, Bowker symmetry (operators/stats.py).
Registration-ready oracle texts in *_ORACLE constants.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_MONTHLY = """
    base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
"""

TURNING_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    marked AS (
        SELECT g, t, v,
               lag(v) OVER (PARTITION BY g ORDER BY t) AS pv,
               lead(v) OVER (PARTITION BY g ORDER BY t) AS nv
        FROM base
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span,
               CAST(SUM(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                    AND ((v > pv AND v > nv) OR (v < pv AND v < nv))
                    THEN 1 ELSE 0 END) AS BIGINT) AS tt
        FROM marked GROUP BY g
    )
    SELECT g AS group_key, n, span = n - 1 AS gapless,
           CASE WHEN span = n - 1 AND n >= 3 THEN tt END AS n_turning,
           CASE WHEN span = n - 1 AND n >= 3 THEN 2 * (n - 2) END
               AS expected_x3,
           CASE WHEN span = n - 1 AND n >= 3 THEN
                CAST((1000000 * 10 * (3 * tt - 2 * (n - 2))
                      * (3 * tt - 2 * (n - 2))) // (16 * n - 29)
                     AS BIGINT) END AS z2_ppm
    FROM agg
"""
)

COXSTUART_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    rn AS (
        SELECT g, v,
               CAST(row_number() OVER (PARTITION BY g ORDER BY t)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM base
    ),
    paired AS (
        SELECT a.g, a.n, a.v AS vi, b.v AS vj
        FROM rn a JOIN rn b
          ON b.g = a.g AND b.rn = a.rn + (a.n + 1) // 2
        WHERE a.rn <= a.n - (a.n + 1) // 2
    ),
    agg AS (
        SELECT g, CAST(MAX(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN vj > vi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
               CAST(SUM(CASE WHEN vj < vi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_neg,
               CAST(SUM(CASE WHEN vj = vi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tie
        FROM paired GROUP BY g
    )
    SELECT g AS group_key, n, n_pairs, n_pos, n_neg, n_tie,
           CASE WHEN n_pos + n_neg > 0 THEN
                CAST((1000000 * (n_pos - n_neg)) // (n_pos + n_neg)
                     AS BIGINT) END AS margin_ppm
    FROM agg
"""
)

# judges = years, items = nations, v = annual revenue cents, g = region
KENDALLW_ORACLE = """
    WITH base AS (
        SELECT CAST(n.n_regionkey AS BIGINT) AS g,
               CAST(year(o.o_orderdate) AS BIGINT) AS judge,
               CAST(c.c_nationkey AS BIGINT) AS item,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{sf}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3
    ),
    k_per AS (SELECT g, CAST(COUNT(DISTINCT item) AS BIGINT) AS k
              FROM base GROUP BY g),
    gate AS (
        SELECT b.g, b.judge,
               COUNT(*) = MAX(k) AND COUNT(DISTINCT item) = MAX(k) AS ok
        FROM base b JOIN k_per ON k_per.g = b.g
        GROUP BY b.g, b.judge
    ),
    gated AS (
        SELECT base.* FROM base
        JOIN gate ON gate.g = base.g AND gate.judge = base.judge
        WHERE gate.ok
    ),
    cells AS (
        SELECT g, judge, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM gated GROUP BY g, judge, v
    ),
    ranked AS (
        SELECT g, judge, v,
               CAST(2 * (SUM(c) OVER (PARTITION BY g, judge ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT)
                   AS r2
        FROM cells
    ),
    scored AS (
        SELECT b.g, b.judge, b.item, r.r2
        FROM gated b
        JOIN ranked r ON r.g = b.g AND r.judge = b.judge AND r.v = b.v
    ),
    ties AS (SELECT g, CAST(SUM(c * c * c - c) AS BIGINT) AS tie_t
             FROM cells GROUP BY g),
    totals AS (
        SELECT g, item, CAST(SUM(r2) AS BIGINT) AS r2i,
               CAST(COUNT(DISTINCT judge) AS BIGINT) AS m
        FROM scored GROUP BY g, item
    ),
    km AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS k_items,
                  CAST(MAX(m) AS BIGINT) AS m_judges
           FROM totals GROUP BY g),
    s2 AS (
        SELECT t.g, km.k_items, km.m_judges,
               CAST(SUM((r2i - m_judges * (k_items + 1))
                    * (r2i - m_judges * (k_items + 1))) AS BIGINT) AS s2x
        FROM totals t JOIN km ON km.g = t.g
        GROUP BY t.g, km.k_items, km.m_judges
    ),
    dropped AS (
        SELECT g, CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_judges_dropped
        FROM gate GROUP BY g
    )
    SELECT d.g AS group_key, m_judges, k_items, n_judges_dropped, s2x,
           CAST(COALESCE(tie_t, 0) AS BIGINT) AS tie_t,
           CASE WHEN m_judges >= 2 AND k_items >= 2 AND
                m_judges * m_judges
                * (k_items * k_items * k_items - k_items)
                - m_judges * COALESCE(tie_t, 0) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * 3 * s2x)
                     // (m_judges * m_judges
                         * (k_items * k_items * k_items - k_items)
                         - m_judges * COALESCE(tie_t, 0)) AS BIGINT) END
               AS w_ppm
    FROM dropped d
    LEFT JOIN s2 ON s2.g = d.g
    LEFT JOIN ties ON ties.g = d.g
"""

# g = region, target = nation, v = monthly revenue in 1000-dollar units
ICC_ORACLE = """
    WITH m AS (
        SELECT CAST(n.n_regionkey AS BIGINT) AS g,
               CAST(c.c_nationkey AS BIGINT) AS target,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) // 100000 AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{sf}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3
    ),
    per_t AS (
        SELECT g, target, CAST(COUNT(*) AS BIGINT) AS ki,
               CAST(SUM(v) AS BIGINT) AS ti,
               SUM(CAST(v AS HUGEINT) * v) AS qi
        FROM m GROUP BY g, target
    ),
    kmax AS (SELECT g, CAST(MAX(ki) AS BIGINT) AS k
             FROM per_t GROUP BY g),
    agg AS (
        SELECT p.g, MAX(k.k) AS k,
               CAST(SUM(CASE WHEN ki = k THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_targets,
               CAST(SUM(CASE WHEN ki = k THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_targets_dropped,
               CAST(SUM(CASE WHEN ki = k THEN ti ELSE 0 END) AS BIGINT)
                   AS gsum,
               SUM(CASE WHEN ki = k THEN CAST(ti AS HUGEINT) * ti
                   ELSE 0 END) AS a,
               SUM(CASE WHEN ki = k THEN qi ELSE 0 END) AS b
        FROM per_t p JOIN kmax k ON k.g = p.g
        GROUP BY p.g
    )
    SELECT g AS group_key, n_targets, k, n_targets_dropped,
           CASE WHEN n_targets >= 2 AND k >= 2 AND
                (k - 1) * (n_targets * (n_targets * a
                    - CAST(gsum AS HUGEINT) * gsum)
                + (n_targets - 1) * (n_targets * (k * b - a))) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT)
                      * (n_targets * (k - 1) * (n_targets * a
                         - CAST(gsum AS HUGEINT) * gsum)
                      - (n_targets - 1) * (n_targets * (k * b - a))))
                     // ((k - 1) * (n_targets * (n_targets * a
                         - CAST(gsum AS HUGEINT) * gsum)
                      + (n_targets - 1) * (n_targets * (k * b - a))))
                     AS BIGINT) END AS icc_ppm
    FROM agg
"""

_MONTHLY_K = """
    base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) // 100000 AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
"""

THEILU2_ORACLE = (
    "    WITH "
    + _MONTHLY_K
    + """,
    lagged AS (
        SELECT g, t, v AS y,
               lag(v, 12) OVER (PARTITION BY g ORDER BY t) AS ys,
               lag(v, 1) OVER (PARTITION BY g ORDER BY t) AS y1,
               t - lag(t, 12) OVER (PARTITION BY g ORDER BY t) = 12
                   AS oks,
               t - lag(t, 1) OVER (PARTITION BY g ORDER BY t) = 1 AS ok1
        FROM base
        QUALIFY ys IS NOT NULL AND y1 IS NOT NULL AND oks AND ok1
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM((y - ys) * (y - ys)) AS BIGINT) AS num_ss,
               CAST(SUM((y - y1) * (y - y1)) AS BIGINT) AS den_ss
        FROM lagged GROUP BY g
    )
    SELECT g AS group_key, n_eval, num_ss, den_ss,
           CASE WHEN den_ss > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * num_ss) // den_ss
                     AS BIGINT) END AS u2sq_ppm
    FROM agg
"""
)

TRACKING_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    lagged AS (
        SELECT g, t, v AS y,
               lag(v, 12) OVER (PARTITION BY g ORDER BY t) AS ys,
               t - lag(t, 12) OVER (PARTITION BY g ORDER BY t) = 12
                   AS ok
        FROM base
        QUALIFY ys IS NOT NULL AND ok
    ),
    run AS (
        SELECT g, CAST(y - ys AS BIGINT) AS e,
               CAST(SUM(y - ys) OVER (PARTITION BY g ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cus
        FROM lagged
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(e) AS BIGINT) AS sum_err,
               CAST(SUM(abs(e)) AS BIGINT) AS sum_abs_err,
               CAST(MAX(cus) AS BIGINT) AS mx,
               CAST(MIN(cus) AS BIGINT) AS mn
        FROM run GROUP BY g
    )
    SELECT g AS group_key, n_eval, sum_err, sum_abs_err,
           CASE WHEN sum_abs_err > 0 THEN
                CAST((1000000 * sum_err) // sum_abs_err AS BIGINT) END
               AS ts_ppm,
           CASE WHEN sum_abs_err > 0 THEN
                CAST((1000000 * greatest(mx, -mn)) // sum_abs_err
                     AS BIGINT) END AS peak_ppm
    FROM agg
"""
)

DIXON_ORACLE = """
    WITH base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
    ),
    ranked AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v ASC) AS ra,
               row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rd
        FROM base
    ),
    ext AS (
        SELECT g,
               CAST(MAX(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS x_min,
               CAST(MAX(CASE WHEN ra = 2 THEN v END) AS BIGINT) AS x2,
               CAST(MAX(CASE WHEN rd = 2 THEN v END) AS BIGINT) AS xn1,
               CAST(MAX(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS x_max
        FROM ranked WHERE ra <= 2 OR rd <= 2 GROUP BY g
    ),
    n_per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n
              FROM base GROUP BY g)
    SELECT n_per.g AS group_key, n, x_min, x_max,
           CASE WHEN n >= 3 AND x_max > x_min THEN
                CAST((1000000 * (x2 - x_min)) // (x_max - x_min)
                     AS BIGINT) END AS q_low_ppm,
           CASE WHEN n >= 3 AND x_max > x_min THEN
                CAST((1000000 * (x_max - xn1)) // (x_max - x_min)
                     AS BIGINT) END AS q_high_ppm
    FROM n_per JOIN ext ON ext.g = n_per.g
"""

ORDPAT_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    tri AS (
        SELECT g, v AS v0,
               lead(v, 1) OVER (PARTITION BY g ORDER BY t) AS v1,
               lead(v, 2) OVER (PARTITION BY g ORDER BY t) AS v2,
               lead(t, 1) OVER (PARTITION BY g ORDER BY t) - t = 1 AS s1,
               lead(t, 2) OVER (PARTITION BY g ORDER BY t) - t = 2 AS s2
        FROM base
        QUALIFY v1 IS NOT NULL AND v2 IS NOT NULL AND s1 AND s2
    ),
    coded AS (
        SELECT g,
               CASE WHEN v0 = v1 OR v0 = v2 OR v1 = v2 THEN NULL ELSE
                    CAST(CASE WHEN v0 > v1 THEN 1 ELSE 0 END
                         + CASE WHEN v0 > v2 THEN 1 ELSE 0 END AS VARCHAR)
                    || CAST(CASE WHEN v1 > v0 THEN 1 ELSE 0 END
                         + CASE WHEN v1 > v2 THEN 1 ELSE 0 END AS VARCHAR)
                    || CAST(CASE WHEN v2 > v0 THEN 1 ELSE 0 END
                         + CASE WHEN v2 > v1 THEN 1 ELSE 0 END AS VARCHAR)
               END AS pat
        FROM tri
    ),
    agg AS (
        SELECT g,
               CAST(SUM(CASE WHEN pat IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_triples,
               CAST(SUM(CASE WHEN pat IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_tied,
               CAST(SUM(CASE WHEN pat = '012' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_012,
               CAST(SUM(CASE WHEN pat = '021' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_021,
               CAST(SUM(CASE WHEN pat = '102' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_102,
               CAST(SUM(CASE WHEN pat = '120' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_120,
               CAST(SUM(CASE WHEN pat = '201' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_201,
               CAST(SUM(CASE WHEN pat = '210' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_210
        FROM coded GROUP BY g
    )
    SELECT g AS group_key, n_triples, n_tied, n_012, n_021, n_102,
           n_120, n_201, n_210,
           CASE WHEN n_triples > 0 THEN
                CAST((1000000 * greatest(n_012, n_021, n_102, n_120,
                     n_201, n_210)) // n_triples AS BIGINT) END
               AS max_share_ppm
    FROM agg
"""
)

GRUBBS_ORACLE = (
    "    WITH "
    + _MONTHLY_K
    + """,
    staged AS (
        SELECT g, t AS id, v,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
               CAST(SUM(v) OVER (PARTITION BY g) AS BIGINT) AS s,
               SUM(CAST(v AS HUGEINT) * v) OVER (PARTITION BY g) AS q
        FROM base
    ),
    scored AS (
        SELECT g, id, v, n, s, q,
               (CAST(n AS HUGEINT) * v - s)
               * (CAST(n AS HUGEINT) * v - s) AS d2
        FROM staged
    ),
    picked AS (
        SELECT * FROM (
            SELECT g, id, v, n, s, q, d2,
                   row_number() OVER (PARTITION BY g
                       ORDER BY d2 DESC, id ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT g AS group_key, n,
           CASE WHEN n >= 3 AND CAST(n AS HUGEINT) * q
                - CAST(s AS HUGEINT) * s > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * (n - 1) * d2)
                     // (n * (CAST(n AS HUGEINT) * q
                         - CAST(s AS HUGEINT) * s)) AS BIGINT) END
               AS g2_ppm,
           CAST(id AS BIGINT) AS outlier_id,
           CAST(v AS BIGINT) AS outlier_v
    FROM picked
"""
)

BOWKER_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM read_parquet('{sf}/events.parquet')
    ),
    pairs AS (
        SELECT event_type AS fa, next_type AS fb,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered
        WHERE next_type IS NOT NULL AND event_type <> next_type
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT least(fa, fb) AS type_a, greatest(fa, fb) AS type_b,
               CAST(SUM(CASE WHEN fa < fb THEN n ELSE 0 END) AS BIGINT)
                   AS n_ab,
               CAST(SUM(CASE WHEN fa > fb THEN n ELSE 0 END) AS BIGINT)
                   AS n_ba
        FROM pairs GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_ab, n_ba,
           CAST(n_ab - n_ba AS BIGINT) AS d,
           CASE WHEN n_ab + n_ba > 0 THEN
                CAST((1000000 * (n_ab - n_ba) * (n_ab - n_ba))
                     // (n_ab + n_ba) AS BIGINT) END AS term_ppm
    FROM agg
"""


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


def _monthly(spark, kilodollar=False):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    out = (
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
    )
    if kilodollar:
        out = out.select(
            "g", "t", F.expr("CAST(v div 100000 AS BIGINT)").alias("v")
        )
    return out


# ---------------------------------------------------------------- parity


def test_turning_points_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        turning_points_test,
    )

    got = turning_points_test(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(TURNING_ORACLE), ["group_key"])


def test_cox_stuart_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        cox_stuart_test,
    )

    got = cox_stuart_test(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(COXSTUART_ORACLE), ["group_key"])


def test_kendall_w_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import kendall_w
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .groupBy(
            F.col("n_regionkey").cast("bigint").alias("g"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("judge"),
            F.col("c_nationkey").cast("bigint").alias("item"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = kendall_w(base, "g", "judge", "item", "v").toPandas()
    _cmp(got, _duck(KENDALLW_ORACLE), ["group_key"])


def test_icc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import icc_oneway
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    m = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .groupBy(
            F.col("n_regionkey").cast("bigint").alias("g"),
            F.col("c_nationkey").cast("bigint").alias("target"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT) div 100000 AS BIGINT)"
            ).alias("v")
        )
    )
    got = icc_oneway(m, "g", "target", "v").toPandas()
    _cmp(got, _duck(ICC_ORACLE), ["group_key"])


def test_theil_u2_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import theil_u2_sq

    got = theil_u2_sq(
        _monthly(spark, kilodollar=True), "g", "t", "v", period=12
    ).toPandas()
    _cmp(got, _duck(THEILU2_ORACLE), ["group_key"])


def test_tracking_signal_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        tracking_signal,
    )

    got = tracking_signal(
        _monthly(spark), "g", "t", "v", period=12
    ).toPandas()
    _cmp(got, _duck(TRACKING_ORACLE), ["group_key"])


def test_dixon_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import dixon_q
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = orders.join(cust, cust.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    got = dixon_q(base, "g", "v").toPandas()
    _cmp(got, _duck(DIXON_ORACLE), ["group_key"])


def test_ordinal_patterns_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        ordinal_patterns,
    )

    got = ordinal_patterns(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(ORDPAT_ORACLE), ["group_key"])


def test_grubbs_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import grubbs_max

    m = _monthly(spark, kilodollar=True).select(
        "g", F.col("t").alias("id"), "v"
    )
    got = grubbs_max(m, "g", "id", "v").toPandas()
    _cmp(got, _duck(GRUBBS_ORACLE), ["group_key"])


def test_bowker_parity(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        bowker_symmetry,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    got = bowker_symmetry(trans, "a", "b").toPandas()
    _cmp(got, _duck(BOWKER_ORACLE), ["type_a", "type_b"])


# ------------------------------------------------------------- hand pins


def test_turning_points_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        turning_points_test,
    )

    rows = [("g", t, v) for t, v in enumerate([1, 3, 2, 4, 3])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = turning_points_test(df, "g", "t", "v").collect()
    # turns at 3 (max), 2 (min), 4 (max): T = 3; d = 9 - 6 = 3
    assert r["gapless"] and r["n_turning"] == 3
    assert r["expected_x3"] == 6
    assert r["z2_ppm"] == (1_000_000 * 10 * 9) // (16 * 5 - 29)

    gapped = [("h", 0, 1), ("h", 1, 3), ("h", 3, 2)]
    df2 = spark.createDataFrame(gapped, "g string, t long, v long")
    [r] = turning_points_test(df2, "g", "t", "v").collect()
    assert r["gapless"] is False and r["n_turning"] is None


def test_cox_stuart_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        cox_stuart_test,
    )

    rows = [("g", t, v) for t, v in enumerate([1, 2, 3, 4, 5, 6])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = cox_stuart_test(df, "g", "t", "v").collect()
    assert (r["n_pairs"], r["n_pos"], r["n_neg"]) == (3, 3, 0)
    assert r["margin_ppm"] == 1_000_000

    rows = [("h", t, v) for t, v in enumerate([5, 4, 3, 2, 1])]
    df2 = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = cox_stuart_test(df2, "g", "t", "v").collect()
    # odd n: middle dropped, pairs (5,2), (4,1) — both down
    assert (r["n_pairs"], r["n_pos"], r["n_neg"]) == (2, 0, 2)
    assert r["margin_ppm"] == -1_000_000


def test_kendall_w_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import kendall_w

    # two judges, identical rankings of 3 items -> W = 1
    rows = [
        ("g", "j1", "a", 10), ("g", "j1", "b", 20), ("g", "j1", "c", 30),
        ("g", "j2", "a", 1), ("g", "j2", "b", 2), ("g", "j2", "c", 3),
    ]
    df = spark.createDataFrame(rows, "g string, j string, i string, v long")
    [r] = kendall_w(df, "g", "j", "i", "v").collect()
    assert (r["m_judges"], r["k_items"], r["s2x"]) == (2, 3, 32)
    assert r["w_ppm"] == 1_000_000

    # opposite rankings -> W = 0; third judge incomplete -> dropped
    rows = [
        ("h", "j1", "a", 10), ("h", "j1", "b", 20), ("h", "j1", "c", 30),
        ("h", "j2", "a", 3), ("h", "j2", "b", 2), ("h", "j2", "c", 1),
        ("h", "j3", "a", 5),
    ]
    df2 = spark.createDataFrame(rows, "g string, j string, i string, v long")
    [r] = kendall_w(df2, "g", "j", "i", "v").collect()
    assert r["n_judges_dropped"] == 1
    assert (r["m_judges"], r["w_ppm"]) == (2, 0)


def test_icc_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import icc_oneway

    # zero within-variance, distinct between -> ICC = 1
    rows = [("g", "a", 1), ("g", "a", 1), ("g", "b", 5), ("g", "b", 5)]
    df = spark.createDataFrame(rows, "g string, tg string, v long")
    [r] = icc_oneway(df, "g", "tg", "v").collect()
    assert (r["n_targets"], r["k"]) == (2, 2)
    assert r["icc_ppm"] == 1_000_000

    # an unbalanced target is dropped and counted
    rows.append(("g", "c", 9))
    df2 = spark.createDataFrame(rows, "g string, tg string, v long")
    [r] = icc_oneway(df2, "g", "tg", "v").collect()
    assert r["n_targets_dropped"] == 1 and r["icc_ppm"] == 1_000_000


def test_theil_u2_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import theil_u2_sq

    rows = [("g", t, v) for t, v in enumerate([10, 20, 10, 20])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = theil_u2_sq(df, "g", "t", "v", period=2).collect()
    # seasonal-naive is perfect (num 0), naive lag-1 misses by 10 twice
    assert (r["n_eval"], r["num_ss"], r["den_ss"]) == (2, 0, 200)
    assert r["u2sq_ppm"] == 0


def test_tracking_signal_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        tracking_signal,
    )

    rows = [("g", t, v) for t, v in enumerate([10, 20, 14, 26])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = tracking_signal(df, "g", "t", "v", period=2).collect()
    assert (r["sum_err"], r["sum_abs_err"]) == (10, 10)
    assert r["ts_ppm"] == 1_000_000 and r["peak_ppm"] == 1_000_000

    # balanced errors +5 then -5: signal 0, but the peak remembers
    rows = [("h", t, v) for t, v in enumerate([10, 20, 15, 15])]
    df2 = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = tracking_signal(df2, "g", "t", "v", period=2).collect()
    assert r["ts_ppm"] == 0 and r["peak_ppm"] == 500_000


def test_dixon_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import dixon_q

    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 3), ("g", 10)], "g string, v long"
    )
    [r] = dixon_q(df, "g", "v").collect()
    assert r["q_low_ppm"] == 1_000_000 // 9
    assert r["q_high_ppm"] == 7_000_000 // 9

    df2 = spark.createDataFrame([("h", 1), ("h", 2)], "g string, v long")
    [r] = dixon_q(df2, "g", "v").collect()
    assert r["q_low_ppm"] is None and r["q_high_ppm"] is None


def test_ordinal_patterns_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        ordinal_patterns,
    )

    rows = [("g", t, v) for t, v in enumerate([1, 2, 3, 2, 1])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = ordinal_patterns(df, "g", "t", "v").collect()
    # (1,2,3)=012, (2,3,2)=tied (v0=v2), (3,2,1)=210
    assert (r["n_triples"], r["n_tied"]) == (2, 1)
    assert r["n_012"] == 1 and r["n_210"] == 1
    assert r["max_share_ppm"] == 500_000


def test_grubbs_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import grubbs_max

    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 0), ("g", 4, 9)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    [r] = grubbs_max(df, "g", "id", "v").collect()
    # the all-but-one-equal case attains Grubbs' maximum (n-1)/sqrt(n):
    # G^2 = 9/4 = 2.25
    assert (r["outlier_id"], r["outlier_v"]) == (4, 9)
    assert r["g2_ppm"] == 2_250_000


def test_bowker_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        bowker_symmetry,
    )

    rows = [("a", "b")] * 3 + [("b", "a")] + [("a", "c")] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r["type_a"], r["type_b"]): r
           for r in bowker_symmetry(df, "a", "b").collect()}
    ab = out[("a", "b")]
    assert (ab["n_ab"], ab["n_ba"], ab["d"]) == (3, 1, 2)
    assert ab["term_ppm"] == 1_000_000
    ac = out[("a", "c")]
    assert (ac["n_ab"], ac["n_ba"]) == (2, 0)
    assert ac["term_ppm"] == 2_000_000
