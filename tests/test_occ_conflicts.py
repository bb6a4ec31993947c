"""OCC write-write conflict detection — pre-validation for the
round-10 registration queue (operators/cdc_merge.py:
occ_conflict_check).

Write sets derive deterministically from orders (shared keys are the
multiples of 15): txn A touches every 3rd key (+1 cents; DELETE at
%45), txn B every 5th key (+1 on even keys else +2; DELETE at %75) —
so shared keys mix identical writes (benign), differing updates
(conflict), delete-vs-update (conflict) and double-delete at %225
(benign). Oracle text registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

OCC_ORACLE = """
    WITH a AS (
        SELECT o_orderkey AS key,
               CASE WHEN o_orderkey % 45 = 0 THEN NULL
                    ELSE CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              + 1 AS VARCHAR) END AS v
        FROM read_parquet('{sf}/orders.parquet')
        WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey AS key,
               CASE WHEN o_orderkey % 75 = 0 THEN NULL
                    ELSE CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              + CASE WHEN o_orderkey % 2 = 0
                                     THEN 1 ELSE 2 END AS VARCHAR)
               END AS v
        FROM read_parquet('{sf}/orders.parquet')
        WHERE o_orderkey % 5 = 0
    ),
    j AS (
        SELECT COALESCE(a.key, b.key) AS key,
               a.key IS NOT NULL AS ia, b.key IS NOT NULL AS ib,
               a.v AS va, b.v AS vb
        FROM a FULL OUTER JOIN b ON b.key = a.key
    )
    SELECT key,
           CAST(CASE WHEN ia THEN 1 ELSE 0 END AS BIGINT) AS in_a,
           CAST(CASE WHEN ib THEN 1 ELSE 0 END AS BIGINT) AS in_b,
           CASE WHEN NOT ib THEN 'a_only'
                WHEN NOT ia THEN 'b_only'
                WHEN va IS NOT DISTINCT FROM vb THEN 'benign'
                ELSE 'conflict' END AS status
    FROM j
"""


def _txns(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    a = orders.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 45 == 0, F.lit(None))
        .otherwise((cents + 1).cast("string"))
        .alias("value"),
    )
    b = orders.where(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 75 == 0, F.lit(None))
        .otherwise(
            (
                cents
                + F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(2)
            ).cast("string")
        )
        .alias("value"),
    )
    return a, b


def test_occ_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        occ_conflict_check,
    )

    a, b = _txns(spark)
    got = (
        occ_conflict_check(a, b, "key", "value")
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(OCC_ORACLE.format(sf=SF))
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con.close()
    # all four statuses must occur or the scenario is vacuous
    assert set(got["status"]) == {"a_only", "b_only", "benign", "conflict"}
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_occ_hand_semantics(spark):
    """delete-vs-delete is benign; delete-vs-update conflicts;
    same-value double write is benign."""
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        occ_conflict_check,
    )

    a = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "x"), (4, "x")], "key long, value string"
    )
    b = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (5, "y")], "key long, value string"
    )
    got = {
        r["key"]: r["status"]
        for r in occ_conflict_check(a, b, "key", "value").collect()
    }
    assert got == {
        1: "benign",  # both deleted
        2: "conflict",  # update vs delete
        3: "benign",  # identical write
        4: "a_only",
        5: "b_only",
    }
