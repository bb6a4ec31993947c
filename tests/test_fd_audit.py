"""FD-violation audit — pre-validation for the round-10 registration
queue (operators/stats.py:fd_violation_audit).

Audited dependency: l_partkey -> l_suppkey (genuinely violated: parts
ship from several suppliers). Oracle text registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

FD_ORACLE = """
    WITH pairs AS (
        SELECT l_partkey, l_suppkey AS rhs,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT l_partkey, rhs, cnt,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY cnt DESC, rhs ASC) AS rk
        FROM pairs
    ),
    agg AS (
        SELECT l_partkey,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_rhs,
               MAX(CASE WHEN rk = 1 THEN rhs END) AS modal_rhs,
               CAST(MAX(CASE WHEN rk = 1 THEN cnt END) AS BIGINT)
                   AS modal_count
        FROM ranked GROUP BY l_partkey
    )
    SELECT l_partkey, n_rows, n_distinct_rhs, modal_rhs, modal_count,
           CAST(n_rows - modal_count AS BIGINT) AS n_violations
    FROM agg WHERE n_distinct_rhs > 1
"""


def test_fd_audit_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        fd_violation_audit,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    got = (
        fd_violation_audit(li, ["l_partkey"], "l_suppkey")
        .toPandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(FD_ORACLE.format(sf=SF))
        .df()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_fd_audit_hand_values(spark):
    """LHS 'x' maps to rhs 1x3 + 2x1 -> modal 1 (count 3), 1 violation;
    LHS 'y' maps only to 7 -> FD holds, not reported. A modal TIE
    (2 vs 2) resolves to the smaller rhs."""
    from kafka_streams_aggregate_spark.operators.stats import (
        fd_violation_audit,
    )

    rows = (
        [("x", 1)] * 3 + [("x", 2)]
        + [("y", 7)] * 2
        + [("z", 5)] * 2 + [("z", 4)] * 2
    )
    df = spark.createDataFrame(rows, "k string, v int")
    got = {
        r["k"]: (
            r["n_rows"], r["n_distinct_rhs"], r["modal_rhs"],
            r["modal_count"], r["n_violations"],
        )
        for r in fd_violation_audit(df, ["k"], "v").collect()
    }
    assert got == {
        "x": (4, 2, 1, 3, 1),
        "z": (4, 2, 4, 2, 2),
    }
