"""Round-17 staging, batch 7 — first-order partial correlation and the
balanced Brown-Forsythe variance-homogeneity F (operators/stats.py).
Registration-ready view-based oracle texts in PCORR_ORACLE /
BROWN_FORSYTHE_ORACLE; planned inputs are the per-nation monthly
(revenue k$, order count, month index) frames. NOT registered this
round.
"""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_MONTHLY_XYZ = """
    base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS z,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    // 100000 AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
"""

PCORR_ORACLE = (
    "    WITH "
    + _MONTHLY_XYZ
    + """,
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(z AS HUGEINT)) AS sz,
               SUM(CAST(x AS HUGEINT) * x) AS qxx,
               SUM(CAST(y AS HUGEINT) * y) AS qyy,
               SUM(CAST(z AS HUGEINT) * z) AS qzz,
               SUM(CAST(x AS HUGEINT) * y) AS qxy,
               SUM(CAST(x AS HUGEINT) * z) AS qxz,
               SUM(CAST(y AS HUGEINT) * z) AS qyz
        FROM base GROUP BY g
    ),
    com AS (
        SELECT g, n,
               (n * qxy - sx * sy) * (n * qzz - sz * sz)
                 - (n * qxz - sx * sz) * (n * qyz - sy * sz) AS nn,
               (n * qxx - sx * sx) * (n * qzz - sz * sz)
                 - (n * qxz - sx * sz) * (n * qxz - sx * sz) AS dx,
               (n * qyy - sy * sy) * (n * qzz - sz * sz)
                 - (n * qyz - sy * sz) * (n * qyz - sy * sz) AS dy
        FROM agg
    )
    SELECT g AS group_key, n,
           CASE WHEN dx > 0 AND dy > 0 THEN
                CAST(sign(nn) AS BIGINT) END AS sign_n,
           CASE WHEN dx > 0 AND dy > 0 THEN
                CAST((CAST(1000000 AS HUGEINT)
                      * ((nn * nn) // dx)) // dy AS BIGINT) END
               AS pc2_ppm
    FROM com
"""
)

BROWN_FORSYTHE_ORACLE = (
    "    WITH "
    + _MONTHLY_XYZ
    + """,
    ranked AS (
        SELECT g, x AS v,
               CAST(row_number() OVER (PARTITION BY g ORDER BY x)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM base
    ),
    med AS (
        SELECT g, MIN(n) AS n,
               CAST(CASE WHEN COUNT(*) = 1 THEN 2 * MIN(v)
                    ELSE MIN(v) + MAX(v) END AS BIGINT) AS med2
        FROM ranked
        WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        GROUP BY g
    ),
    zf AS (
        SELECT b.g, m.n, abs(2 * b.x - m.med2) AS z
        FROM base b JOIN med m ON m.g = b.g
    ),
    per AS (
        SELECT g, MAX(n) AS n,
               SUM(CAST(z AS HUGEINT)) AS t,
               SUM(CAST(z AS HUGEINT) * z) AS q
        FROM zf GROUP BY g
    ),
    j AS (SELECT *, MAX(n) OVER () AS n_obs FROM per),
    gl AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n = n_obs THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_balanced,
               CAST(MAX(n_obs) AS BIGINT) AS n_obs,
               SUM(CASE WHEN n = n_obs THEN t ELSE 0 END) AS tt,
               SUM(CASE WHEN n = n_obs THEN t * t ELSE 0 END) AS t2,
               SUM(CASE WHEN n = n_obs THEN q ELSE 0 END) AS qq
        FROM j
    )
    SELECT n_groups, n_balanced, n_obs,
           CASE WHEN n_balanced >= 2 AND n_obs * qq - t2 > 0 THEN
                CAST((CAST(1000 AS HUGEINT)
                      * (n_balanced * t2 - tt * tt) * (n_obs - 1))
                     // ((n_balanced - 1) * (n_obs * qq - t2))
                     AS BIGINT) END AS f_milli
    FROM gl
"""
)


def _cmp(got, exp, keys):
    if keys:
        got = got.sort_values(keys).reset_index(drop=True)
        exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql):
    con = duckdb.connect()
    try:
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def test_pcorr_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        partial_corr_first_order,
    )

    # y = x: partialling any z leaves a perfect correlation
    rows = [("g", 0, 0, 1), ("g", 1, 1, 0), ("g", 2, 2, 2), ("g", 5, 5, 1)]
    df = spark.createDataFrame(rows, "g string, x long, y long, z long")
    [r] = partial_corr_first_order(df, "g", "x", "y", "z").collect()
    assert (r["sign_n"], r["pc2_ppm"]) == (1, 1_000_000)

    # y = -x: same magnitude, negative direction
    rows = [("m", 0, 0, 1), ("m", 1, -1, 0), ("m", 2, -2, 2),
            ("m", 5, -5, 1)]
    df = spark.createDataFrame(rows, "g string, x long, y long, z long")
    [r] = partial_corr_first_order(df, "g", "x", "y", "z").collect()
    assert (r["sign_n"], r["pc2_ppm"]) == (-1, 1_000_000)

    # constant z: the partial is undefined -> NULL
    rows = [("c", 0, 1, 7), ("c", 1, 3, 7), ("c", 2, 0, 7)]
    df = spark.createDataFrame(rows, "g string, x long, y long, z long")
    [r] = partial_corr_first_order(df, "g", "x", "y", "z").collect()
    assert r["pc2_ppm"] is None and r["sign_n"] is None


def test_pcorr_matches_fraction(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        partial_corr_first_order,
    )

    rng = random.Random(12)
    rows = [
        (f"g{i % 5}", rng.randint(0, 100), rng.randint(0, 40),
         rng.randint(0, 20))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long, z long")
    got = {
        r["group_key"]: r
        for r in partial_corr_first_order(
            df, "g", "x", "y", "z"
        ).collect()
    }
    for g in {g for g, *_ in rows}:
        pts = [(x, y, z) for gg, x, y, z in rows if gg == g]
        n = len(pts)
        sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
        sz = sum(p[2] for p in pts)
        qxx = sum(p[0] * p[0] for p in pts)
        qyy = sum(p[1] * p[1] for p in pts)
        qzz = sum(p[2] * p[2] for p in pts)
        qxy = sum(p[0] * p[1] for p in pts)
        qxz = sum(p[0] * p[2] for p in pts)
        qyz = sum(p[1] * p[2] for p in pts)
        cxy = n * qxy - sx * sy; cxx = n * qxx - sx * sx
        cyy = n * qyy - sy * sy; czz = n * qzz - sz * sz
        cxz = n * qxz - sx * sz; cyz = n * qyz - sy * sz
        nn = cxy * czz - cxz * cyz
        dx = cxx * czz - cxz * cxz
        dy = cyy * czz - cyz * cyz
        r = got[g]
        assert r["pc2_ppm"] == 10**6 * (nn * nn // dx) // dy
        # the floored value brackets the exact rational from below
        exact = Fraction(10**6 * nn * nn, dx * dy)
        assert r["pc2_ppm"] <= exact < r["pc2_ppm"] + 2


def test_pcorr_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        partial_corr_first_order,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("z"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " div 100000 AS BIGINT)"
            ).alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    got = partial_corr_first_order(base, "g", "x", "y", "z").toPandas()
    _cmp(got, _duck(PCORR_ORACLE), ["group_key"])


def test_brown_forsythe_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        brown_forsythe_balanced,
    )

    # a: [0,2,4] -> z = [4,0,4]; b: [0,10,20] -> z = [20,0,20]
    # F = (k*sumT^2 - T^2)(n-1) / ((k-1)(nQ - sumT^2))
    #   = 1024*2/832 -> f_milli = 2461
    rows = [("a", 0), ("a", 2), ("a", 4), ("b", 0), ("b", 10), ("b", 20)]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = brown_forsythe_balanced(df, "g", "v").collect()
    assert (r["n_groups"], r["n_balanced"], r["n_obs"]) == (2, 2, 3)
    assert r["f_milli"] == 1000 * 1024 * 2 // 832

    # equal spreads -> z identical across groups -> F = 0
    rows = [("a", 0), ("a", 4), ("a", 8), ("b", 10), ("b", 14), ("b", 18)]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = brown_forsythe_balanced(df, "g", "v").collect()
    assert r["f_milli"] == 0

    # all z constant within groups -> within-sum 0 -> NULL
    rows = [("a", 0), ("a", 2), ("b", 0), ("b", 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = brown_forsythe_balanced(df, "g", "v").collect()
    assert r["f_milli"] is None


def test_brown_forsythe_matches_anova_fractions(spark):
    # replicate through the ANOVA definition (SSB/SSW from means) in
    # Fractions — a different algebra path than the cleared form
    from kafka_streams_aggregate_spark.operators.stats import (
        brown_forsythe_balanced,
    )

    rng = random.Random(3)
    rows = [
        (f"g{i % 4}", rng.randint(0, 1000)) for i in range(48)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = brown_forsythe_balanced(df, "g", "v").collect()
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    zs = {}
    for g, vs in groups.items():
        s = sorted(vs)
        n = len(s)
        med2 = s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]
        zs[g] = [abs(2 * v - med2) for v in vs]
    k = len(zs)
    n = len(next(iter(zs.values())))
    gm = Fraction(sum(sum(z) for z in zs.values()), n * k)
    ssb = sum(n * (Fraction(sum(z), n) - gm) ** 2 for z in zs.values())
    ssw = sum(
        sum((zz - Fraction(sum(z), n)) ** 2 for zz in z)
        for z in zs.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n * k - k))
    assert r["f_milli"] == (1000 * f.numerator) // f.denominator


def test_brown_forsythe_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        brown_forsythe_balanced,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " div 100000 AS BIGINT)"
            ).alias("v")
        )
    )
    got = brown_forsythe_balanced(base, "g", "v").toPandas()
    _cmp(got, _duck(BROWN_FORSYTHE_ORACLE), [])
