"""Deterministic bootstrap CI — pre-validation for the round-10
registration queue (operators/resample.py:bootstrap_mean_ci).

The oracle text below is registration-ready: the md5 hash family
places every draw identically in both engines, all arithmetic is
exact integer cents, and the final floor(s/n) is the same single
IEEE divide + floor on both sides.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

BOOTSTRAP_ORACLE = """
    WITH vals AS (
        SELECT CAST(c_nationkey AS BIGINT) AS grp,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v_cents,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY c_custkey) - 1 AS rn
        FROM read_parquet('{sf}/customer.parquet')
    ),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v_cents) AS BIGINT) AS s
        FROM vals GROUP BY grp
    ),
    draws AS (
        SELECT g.grp, b.range AS b, sl.range AS slot,
               CAST(CONCAT('0x', substr(md5(
                   'bs|' || CAST(g.grp AS VARCHAR) || '|'
                         || CAST(b.range AS VARCHAR) || '|'
                         || CAST(sl.range AS VARCHAR)), 1, 15))
                    AS BIGINT) % g.n AS idx
        FROM g, range(64) b, range(100) sl
    ),
    sums AS (
        SELECT d.grp, d.b, CAST(SUM(v.v_cents) AS BIGINT) AS rs
        FROM draws d JOIN vals v ON v.grp = d.grp AND v.rn = d.idx
        GROUP BY d.grp, d.b
    ),
    ranked AS (
        SELECT grp, b, rs,
               row_number() OVER (
                   PARTITION BY grp ORDER BY rs, b) AS rk
        FROM sums
    ),
    ci AS (
        SELECT grp,
               MAX(CASE WHEN rk = 2 THEN rs END) AS lo_s,
               MAX(CASE WHEN rk = 63 THEN rs END) AS hi_s
        FROM ranked GROUP BY grp
    )
    SELECT g.grp AS group_key, g.n,
           CAST(64 AS BIGINT) AS b_resamples,
           CAST(floor(g.s / g.n) AS BIGINT) AS point_mean_cents,
           CAST(floor(ci.lo_s / 100) AS BIGINT) AS boot_mean_lo_cents,
           CAST(floor(ci.hi_s / 100) AS BIGINT) AS boot_mean_hi_cents
    FROM g JOIN ci ON g.grp = ci.grp
"""


def test_bootstrap_ci_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.resample import (
        bootstrap_mean_ci,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF).select(
        "c_nationkey",
        "c_custkey",
        # floor, not cast: Spark casts truncate toward zero while DuckDB
        # casts round — floor() is identical in both engines (CLAUDE.md).
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("v_cents"),
    )
    got = (
        bootstrap_mean_ci(cust, "c_nationkey", "v_cents", "c_custkey")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(BOOTSTRAP_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_bootstrap_ci_sanity(spark):
    """CI brackets the point estimate for large-enough groups and is
    invariant to input partitioning (hash-derived draws)."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.resample import (
        bootstrap_mean_ci,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF).select(
        "c_nationkey",
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("v_cents"),
    )
    a = (
        bootstrap_mean_ci(cust, "c_nationkey", "v_cents", "c_custkey")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    b = (
        bootstrap_mean_ci(
            cust.repartition(13), "c_nationkey", "v_cents", "c_custkey"
        )
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["boot_mean_lo_cents"] <= a["boot_mean_hi_cents"]).all()
    # the bootstrap distribution straddles the point mean in the bulk
    inside = (
        (a["boot_mean_lo_cents"] <= a["point_mean_cents"])
        & (a["point_mean_cents"] <= a["boot_mean_hi_cents"])
    ).mean()
    assert inside >= 0.8
