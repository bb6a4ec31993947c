"""Key-skew diagnostic — pre-validation for the round-11 registration
queue (operators/skew.py:skew_report).

The report this module's salting cures are prescribed from: top-k hot
keys + exact distribution summary (max, ceil-rank p99, straggler
factor in ppm). Registration-ready oracle text in SKEW_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

SKEW_ORACLE = """
    WITH counts AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS cnt
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY 1
    ),
    enriched AS (
        SELECT key, CAST(cnt AS BIGINT) AS cnt,
               COUNT(*) OVER () AS n_keys,
               SUM(cnt) OVER () AS n_rows,
               MAX(cnt) OVER () AS max_cnt,
               row_number() OVER (ORDER BY cnt) AS rn_asc,
               row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
        FROM counts
    ),
    p99 AS (
        SELECT MIN(CASE WHEN rn_asc >= (99 * n_keys + 99) // 100
                        THEN cnt END) AS p99_cnt
        FROM enriched
    )
    SELECT CAST(rank AS BIGINT) AS rank, key, cnt,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(max_cnt AS BIGINT) AS max_cnt,
           CAST(p99.p99_cnt AS BIGINT) AS p99_cnt,
           CAST((1000000 * max_cnt * n_keys) // n_rows AS BIGINT)
               AS skew_ppm
    FROM enriched CROSS JOIN p99
    WHERE rank <= 10
"""


def test_skew_report_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.skew import skew_report
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select(
        F.col("l_suppkey").cast("string").alias("k")
    )
    got = (
        skew_report(li, "k")
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(SKEW_ORACLE.format(sf=SF))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) == 10
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_skew_report_hand_values(spark):
    """Keys: a x6, b x2, c x1, d x1 (10 rows, 4 keys): max 6,
    skew = 1e6 * 6 * 4 // 10 = 2.4e6 (hot key is 2.4x the mean);
    p99 rank = ceil(99*4/100) = 4 -> 6. NULL keys count as a key."""
    from kafka_streams_aggregate_spark.operators.skew import skew_report

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", topk=2).collect()
    assert [(r["rank"], r["key"], r["cnt"]) for r in out] == [
        (1, "a", 6),
        (2, "b", 2),
    ]
    top = out[0]
    assert (top["n_rows"], top["n_keys"], top["max_cnt"], top["p99_cnt"]) == (
        10,
        4,
        6,
        6,
    )
    assert top["skew_ppm"] == 2_400_000

    with_null = spark.createDataFrame(
        [("a",), ("a",), (None,)], "k string"
    )
    rows2 = skew_report(with_null, "k").collect()
    assert rows2[0]["n_keys"] == 2  # NULL is a key
