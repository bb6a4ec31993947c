"""Round-12 staging, batch 2 — knee detection, Cramér-von Mises,
1-D energy distance (operators/stats.py). Registration-ready oracle
texts in KNEE_ORACLE / CVM_ORACLE / ENERGY_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# per-nation curve: x = spend-rank decile 1..10, y = cumulative spend
# share ppm (a concave curve with a knee) — built identically in both
# engines from exact integers
_CURVE_SQL = """
    spend AS (
        SELECT c.c_nationkey AS g,
               CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100)
                    AS BIGINT)), 0) AS BIGINT) AS v,
               c.c_custkey AS id
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    ranked AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v DESC, id)
                   AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n,
               SUM(v) OVER (PARTITION BY g) AS total
        FROM spend
    ),
    curve AS (
        SELECT g,
               CAST((10 * (rn - 1)) // n + 1 AS BIGINT) AS x,
               CAST((1000000 * SUM(SUM(v)) OVER (
                       PARTITION BY g
                       ORDER BY (10 * (rn - 1)) // n + 1
                       ROWS UNBOUNDED PRECEDING))
                    // MAX(MAX(total)) OVER (PARTITION BY g)
                    AS BIGINT) AS y
        FROM ranked
        GROUP BY g, (10 * (rn - 1)) // n + 1, total
    )
"""

KNEE_ORACLE = (
    "WITH " + _CURVE_SQL + """,
    pts AS (SELECT DISTINCT g, x, y FROM curve),
    ends AS (
        SELECT g,
               MIN(struct_pack(x := x, y := y)) AS p1,
               MAX(struct_pack(x := x, y := y)) AS pn
        FROM pts GROUP BY g
    ),
    scored AS (
        SELECT pts.g, x, y,
               CAST(abs((pn.x - p1.x) * (y - p1.y)
                        - (pn.y - p1.y) * (x - p1.x)) AS BIGINT)
                   AS cross_dist
        FROM pts JOIN ends ON ends.g = pts.g
    )
    SELECT g AS group_key,
           CAST(x AS BIGINT) AS knee_x, CAST(y AS BIGINT) AS knee_y,
           cross_dist
    FROM (SELECT *, row_number() OVER (PARTITION BY g
                ORDER BY cross_dist DESC, x) AS _r FROM scored)
    WHERE _r = 1
"""
)

_TWO_SAMPLE_SQL = """
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(c_custkey % 2 AS BIGINT) AS is_a,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
"""

CVM_ORACLE = f"""
    WITH s AS ({_TWO_SAMPLE_SQL}),
    by_val AS (
        SELECT g, v,
               CAST(SUM(is_a) AS BIGINT) AS ca,
               CAST(SUM(1 - is_a) AS BIGINT) AS cb
        FROM s GROUP BY g, v
    ),
    cum AS (
        SELECT g, ca, cb,
               CAST(SUM(ca) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
               CAST(SUM(cb) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
        FROM by_val
    ),
    totals AS (
        SELECT g, CAST(SUM(ca) AS BIGINT) AS n1,
               CAST(SUM(cb) AS BIGINT) AS n2
        FROM by_val GROUP BY g
    ),
    agg AS (
        SELECT cum.g, MAX(n1) AS n1, MAX(n2) AS n2,
               CAST(SUM((ca + cb) * (n2 * c1 - n1 * c2)
                        * (n2 * c1 - n1 * c2)) AS BIGINT) AS t_num
        FROM cum JOIN totals ON totals.g = cum.g
        GROUP BY cum.g
    )
    SELECT g AS group_key, n1, n2, t_num,
           CASE WHEN n1 > 0 AND n2 > 0 THEN CAST(
                (1000000 * t_num) // (n1 * n2 * (n1 + n2) * (n1 + n2))
                AS BIGINT) END AS cvm_ppm
    FROM agg
"""

ENERGY_ORACLE = f"""
    WITH s AS ({_TWO_SAMPLE_SQL}),
    pool AS (
        SELECT g,
               CAST(SUM((2 * rn - n - 1) * v) AS BIGINT) AS s_pool
        FROM (
            SELECT g, v,
                   row_number() OVER (PARTITION BY g
                       ORDER BY v, is_a) AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS n
            FROM s)
        GROUP BY g
    ),
    within AS (
        SELECT g, is_a, CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM((2 * rn - n - 1) * v) AS BIGINT) AS sw
        FROM (
            SELECT g, is_a, v,
                   row_number() OVER (PARTITION BY g, is_a
                       ORDER BY v, is_a) AS rn,
                   COUNT(*) OVER (PARTITION BY g, is_a) AS n
            FROM s)
        GROUP BY g, is_a
    ),
    wide AS (
        SELECT g,
               CAST(SUM(CASE WHEN is_a = 1 THEN n END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN is_a = 0 THEN n END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN is_a = 1 THEN sw END) AS BIGINT) AS s_xx,
               CAST(SUM(CASE WHEN is_a = 0 THEN sw END) AS BIGINT) AS s_yy
        FROM within GROUP BY g
    )
    SELECT wide.g AS group_key, n1, n2,
           CAST(s_pool - s_xx - s_yy AS BIGINT) AS s_xy,
           s_xx, s_yy,
           CASE WHEN n1 > 0 AND n2 > 0 THEN CAST(
                2 * (1000000 * ((s_pool - s_xx - s_yy) // (n1 * n2))
                     + (1000000 * ((s_pool - s_xx - s_yy) % (n1 * n2)))
                       // (n1 * n2))
                - 2 * (1000000 * (s_xx // (n1 * n1))
                       + (1000000 * (s_xx % (n1 * n1))) // (n1 * n1))
                - 2 * (1000000 * (s_yy // (n2 * n2))
                       + (1000000 * (s_yy % (n2 * n2))) // (n2 * n2))
                AS BIGINT) END AS energy_ppm
    FROM wide JOIN pool ON pool.g = wide.g
"""


def _two_sample(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        (F.col("c_custkey") % 2).cast("bigint").alias("is_a"),
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


def _curve(spark):
    from pyspark.sql import Window, functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("v")
        )
        .select(
            F.col("c_nationkey").alias("g"),
            "v",
            F.col("c_custkey").alias("id"),
        )
    )
    wg = Window.partitionBy("g")
    ranked = spend.select(
        "g",
        "v",
        F.row_number()
        .over(Window.partitionBy("g").orderBy(F.col("v").desc(), "id"))
        .alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
        F.sum("v").over(wg).alias("total"),
    )
    decile = ranked.groupBy(
        "g", F.expr("CAST((10 * (rn - 1)) div n + 1 AS BIGINT)").alias("x"),
        "total",
    ).agg(F.sum("v").alias("dv"))
    wc = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return decile.select(
        "g",
        "x",
        F.expr(
            "CAST((1000000 * sum(dv) OVER (PARTITION BY g ORDER BY x"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
            " div total AS BIGINT)"
        ).alias("y"),
    ).dropDuplicates(["g", "x"])


def test_knee_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import knee_detection

    got = knee_detection(_curve(spark), "g", "x", "y").toPandas()
    con = duckdb.connect()
    exp = con.sql(KNEE_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_knee_hand_values(spark):
    """Sharp elbow: (1,0) (2,100) (3,101) (4,102): chord from (1,0)
    to (4,102); cross dist at x=2 is |3*100 - 102*1| = 198, at x=3
    |3*101 - 102*2| = 99 -> knee at x=2."""
    from kafka_streams_aggregate_spark.operators.stats import knee_detection

    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 100), ("g", 3, 101), ("g", 4, 102)],
        "g string, x long, y long",
    )
    [r] = knee_detection(df, "g", "x", "y").collect()
    assert (r["knee_x"], r["knee_y"], r["cross_dist"]) == (2, 100, 198)


def test_cvm_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import cramer_von_mises

    got = cramer_von_mises(_two_sample(spark), "g", "is_a", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(CVM_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_cvm_hand_values(spark):
    """Identical samples a={1,2}, b={1,2}: every pooled gap
    n2*C1 - n1*C2 = 0 -> T = 0. Disjoint a={1,2}, b={3,4}: gaps at
    v=1,2 are (2*1-2*0)=2 and 4, v=3: (2*2-2*1)=2, v=4: 0;
    T = 1*4 + 1*16 + 1*4 + 0 = 24."""
    from kafka_streams_aggregate_spark.operators.stats import cramer_von_mises

    same = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 2), ("g", 0, 1), ("g", 0, 2)],
        "g string, is_a long, v long",
    )
    [r] = cramer_von_mises(same, "g", "is_a", "v").collect()
    assert r["t_num"] == 0 and r["cvm_ppm"] == 0

    disj = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 2), ("g", 0, 3), ("g", 0, 4)],
        "g string, is_a long, v long",
    )
    [r] = cramer_von_mises(disj, "g", "is_a", "v").collect()
    assert r["t_num"] == 24


def test_energy_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        energy_distance_1d,
    )

    got = energy_distance_1d(_two_sample(spark), "g", "is_a", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(ENERGY_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    ok = got["energy_ppm"].dropna()
    assert (ok >= -4).all()  # >= 0 up to the three documented floors


def test_energy_hand_values(spark):
    """a = {0, 0}, b = {2, 2}: Sxx = Syy = 0, Sxy = 2*2*2... pooled
    sorted (0,0,2,2): s_pool = (2*3-5)*2 + (2*4-5)*2 = 2+6 = 8 ->
    s_xy = 8; E = 2*8/(2*2) - 0 - 0 = 4 -> 4e6 ppm.
    Identical samples -> 0."""
    from kafka_streams_aggregate_spark.operators.stats import (
        energy_distance_1d,
    )

    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 1, 0), ("g", 0, 2), ("g", 0, 2)],
        "g string, is_a long, v long",
    )
    [r] = energy_distance_1d(df, "g", "is_a", "v").collect()
    assert (r["s_xy"], r["s_xx"], r["s_yy"]) == (8, 0, 0)
    assert r["energy_ppm"] == 4_000_000

    same = spark.createDataFrame(
        [("g", 1, 5), ("g", 1, 7), ("g", 0, 5), ("g", 0, 7)],
        "g string, is_a long, v long",
    )
    [r] = energy_distance_1d(same, "g", "is_a", "v").collect()
    assert r["energy_ppm"] == 0
