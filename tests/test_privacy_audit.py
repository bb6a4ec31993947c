"""l-diversity + t-closeness audit — pre-validation for the round-10
registration queue (operators/privacy.py:ldiv_tclose_audit).

QI = (market segment, nation); ordered sensitive attribute = $1000
account-balance band. All flags and EMD terms exact int64 (no division
anywhere). Oracle text registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

LDIV_ORACLE = """
    WITH base AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS s
        FROM read_parquet('{sf}/customer.parquet')
    ),
    gcounts AS (
        SELECT c_mktsegment, c_nationkey, s,
               CAST(COUNT(*) AS BIGINT) AS gc
        FROM base GROUP BY c_mktsegment, c_nationkey, s
    ),
    gtot AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(SUM(gc) AS BIGINT) AS group_size,
               CAST(COUNT(*) AS BIGINT) AS distinct_sensitive
        FROM gcounts GROUP BY c_mktsegment, c_nationkey
    ),
    dom AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY s
    ),
    dom2 AS (
        SELECT s, c,
               CAST(SUM(c) OVER (ORDER BY s) AS BIGINT) AS cum_c,
               CAST(SUM(c) OVER () AS BIGINT) AS n_total,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM dom
    ),
    grid AS (
        SELECT g.c_mktsegment, g.c_nationkey, g.group_size,
               g.distinct_sensitive, d.s, d.cum_c, d.n_total, d.m,
               COALESCE(gc.gc, 0) AS gc0
        FROM gtot g CROSS JOIN dom2 d
        LEFT JOIN gcounts gc
          ON gc.c_mktsegment = g.c_mktsegment
         AND gc.c_nationkey = g.c_nationkey AND gc.s = d.s
    ),
    terms AS (
        SELECT c_mktsegment, c_nationkey, group_size,
               distinct_sensitive, n_total, m,
               ABS(CAST(SUM(gc0) OVER (
                       PARTITION BY c_mktsegment, c_nationkey
                       ORDER BY s) AS BIGINT) * n_total
                   - cum_c * group_size) AS term
        FROM grid
    ),
    agg AS (
        SELECT c_mktsegment, c_nationkey, group_size,
               distinct_sensitive, n_total, m,
               CAST(SUM(term) AS BIGINT) AS emd_scaled
        FROM terms
        GROUP BY c_mktsegment, c_nationkey, group_size,
                 distinct_sensitive, n_total, m
    )
    SELECT c_mktsegment, c_nationkey, group_size, distinct_sensitive,
           CAST(CASE WHEN distinct_sensitive < 3 THEN 1 ELSE 0 END
                AS BIGINT) AS l_violation,
           emd_scaled,
           CAST(group_size * n_total * (m - 1) AS BIGINT)
               AS emd_denom_scaled,
           CAST(CASE WHEN 5 * emd_scaled
                          > 1 * group_size * n_total * (m - 1)
                     THEN 1 ELSE 0 END AS BIGINT) AS t_violation
    FROM agg
"""


def test_ldiv_tclose_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.privacy import (
        ldiv_tclose_audit,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF).select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    got = (
        ldiv_tclose_audit(
            cust, ["c_mktsegment", "c_nationkey"], "band",
            l_min=3, t_num=1, t_den=5,
        )
        .toPandas()
        .sort_values(["c_mktsegment", "c_nationkey"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(LDIV_ORACLE.format(sf=SF))
        .df()
        .sort_values(["c_mktsegment", "c_nationkey"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_ldiv_tclose_hand_values(spark):
    """A homogeneous group (1 sensitive value) violates both l and t;
    a group mirroring the global mix violates neither."""
    from kafka_streams_aggregate_spark.operators.privacy import (
        ldiv_tclose_audit,
    )

    # global domain {0,1}: 6 rows of each. Group A: 3x0+3x1 (mirror);
    # group B: 3x0 only (homogeneous); group C: 3x1 only.
    rows = (
        [("A", 0)] * 3 + [("A", 1)] * 3
        + [("B", 0)] * 3 + [("C", 1)] * 3
    )
    df = spark.createDataFrame(rows, "g string, s long")
    got = {
        r["g"]: (
            r["distinct_sensitive"], r["l_violation"],
            r["emd_scaled"], r["t_violation"],
        )
        for r in ldiv_tclose_audit(
            df, ["g"], "s", l_min=2, t_num=1, t_den=5
        ).collect()
    }
    # N=12, m=2, global cum at s=0: 6. Group A: cum_gc=3 at s=0:
    # |3*12 - 6*6| = 0 -> no violations.
    assert got["A"] == (2, 0, 0, 0)
    # Group B (gn=3): s=0 cum 3: |3*12 - 6*3| = 18; denom = 3*12*1=36;
    # 5*18=90 > 1*36 -> t violation; distinct 1 < 2 -> l violation.
    assert got["B"] == (1, 1, 18, 1)
    # Group C: s=0 cum 0: |0 - 18| = 18 -> same flags.
    assert got["C"] == (1, 1, 18, 1)
