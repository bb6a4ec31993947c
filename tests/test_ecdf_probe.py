"""ECDF probe table — pre-validation for the round-11 registration
queue (operators/stats.py:ecdf_probe).

ECDF at fixed integer probes as exact (hits, n, ppm) integers; one
scan + stack, no probe-table join. Registration-ready oracle text in
ECDF_ORACLE (the §9 overlap check vs q_latency_percentiles resolved:
percentiles INVERT the ECDF at fixed ranks, probes EVALUATE it at
fixed values — complementary summaries, no shared code path).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

ECDF_ORACLE = """
    WITH v AS (
        SELECT l_returnflag AS g,
               CAST(floor(l_quantity) AS BIGINT) AS q
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    probes AS (SELECT * FROM (VALUES (10), (25), (40)) t(p))
    SELECT v.g AS group_key,
           CAST(p.p AS BIGINT) AS probe,
           CAST(COUNT(v.q) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v.q <= p.p THEN 1 ELSE 0 END) AS BIGINT)
               AS hits,
           CAST((1000000 * SUM(CASE WHEN v.q <= p.p THEN 1 ELSE 0 END))
                    // COUNT(v.q) AS BIGINT) AS ecdf_ppm
    FROM v CROSS JOIN probes p
    GROUP BY v.g, p.p
"""


def test_ecdf_probe_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import ecdf_probe
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("q"),
    )
    got = (
        ecdf_probe(li, "g", "q", [10, 25, 40])
        .toPandas()
        .sort_values(["group_key", "probe"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ECDF_ORACLE.format(sf=SF))
        .df()
        .sort_values(["group_key", "probe"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_ecdf_probe_hand_values(spark):
    from kafka_streams_aggregate_spark.operators.stats import ecdf_probe

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", None)],
        "g string, v long",
    )
    rows = {
        r["probe"]: r
        for r in ecdf_probe(df, "g", "v", [0, 2, 9]).collect()
    }
    assert rows[0]["hits"] == 0 and rows[0]["ecdf_ppm"] == 0
    assert rows[2]["n"] == 4  # NULL excluded
    assert rows[2]["hits"] == 2 and rows[2]["ecdf_ppm"] == 500_000
    assert rows[9]["hits"] == 4 and rows[9]["ecdf_ppm"] == 1_000_000
