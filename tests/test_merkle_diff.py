"""Merkle table reconciliation — pre-validation for the round-10
registration queue (operators/cdc_merge.py:merkle_table_diff).

The oracle is the DIRECT full-outer diff — deliberately stronger than
the operator's bucket-pruned path, so any pruning bug (a mismatched
bucket not drilled, a digest false-match) shows up as missing or extra
rows. Mutations are deterministic arithmetic: fp+1 every 997th key,
delete every 991st, add three negative keys.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

MERKLE_ORACLE = """
    WITH a AS (
        SELECT o_orderkey AS key,
               CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                   AS fp
        FROM read_parquet('{sf}/orders.parquet')
    ),
    b AS (
        SELECT o_orderkey AS key,
               CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                    + CASE WHEN o_orderkey % 997 = 0 THEN 1 ELSE 0 END
                    AS VARCHAR) AS fp
        FROM read_parquet('{sf}/orders.parquet')
        WHERE o_orderkey % 991 <> 0
        UNION ALL
        SELECT * FROM (VALUES (-1, '101'), (-2, '202'), (-3, '303'))
    ),
    j AS (
        SELECT COALESCE(a.key, b.key) AS key, a.fp AS fa, b.fp AS fb
        FROM a FULL OUTER JOIN b ON b.key = a.key
    ),
    d AS (
        SELECT key,
               CASE WHEN fa IS NULL THEN 'only_right'
                    WHEN fb IS NULL THEN 'only_left'
                    WHEN fa <> fb THEN 'changed' END AS status
        FROM j
    )
    SELECT CAST(CAST(CONCAT('0x', substr(md5(
               'mk|' || CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) % 64
               AS BIGINT) AS bucket,
           key, status
    FROM d WHERE status IS NOT NULL
"""


def _sides(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    a = orders.select(
        F.col("o_orderkey").alias("key"),
        F.floor(F.col("o_totalprice") * 100)
        .cast("bigint")
        .cast("string")
        .alias("fp"),
    )
    b = (
        orders.where(F.col("o_orderkey") % 991 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            (
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
                + F.when(F.col("o_orderkey") % 997 == 0, 1).otherwise(0)
            )
            .cast("string")
            .alias("fp"),
        )
        .unionByName(
            spark.createDataFrame(
                [(-1, "101"), (-2, "202"), (-3, "303")],
                "key long, fp string",
            )
        )
    )
    return a, b


def test_merkle_diff_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merkle_table_diff,
    )

    a, b = _sides(spark)
    got = (
        merkle_table_diff(a, b, "key", "fp", n_buckets=64)
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(MERKLE_ORACLE.format(sf=SF))
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con.close()
    # all three statuses must occur for the test to be non-vacuous
    assert set(got["status"]) == {"changed", "only_left", "only_right"}
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_merkle_identical_tables_empty_diff(spark):
    """Identical sides -> every bucket digest matches -> zero rows
    and, critically, the row-level diff stage scans NOTHING."""
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merkle_table_diff,
    )

    a, _ = _sides(spark)
    out = merkle_table_diff(a, a, "key", "fp", n_buckets=64)
    assert out.count() == 0
