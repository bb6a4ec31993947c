"""Run-length islands — pre-validation for the round-11 registration
queue (operators/stats.py:run_length_islands).

Maximal same-label runs per user event stream under the (ts, event_id)
total order. Registration-ready oracle text in RLE_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

RLE_ORACLE = """
    WITH ordered AS (
        SELECT user_id AS key, event_type AS label,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS BIGINT) AS rn
        FROM read_parquet('{sf}/events.parquet')
    ),
    isl AS (
        SELECT key, label, rn,
               rn - row_number() OVER (
                   PARTITION BY key, label ORDER BY rn) AS island
        FROM ordered
    )
    SELECT key, label,
           CAST(MIN(rn) AS BIGINT) AS start_rn,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM isl GROUP BY key, label, island
"""


def test_rle_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        run_length_islands,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    got = (
        run_length_islands(ev, "user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["key", "start_rn"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(RLE_ORACLE.format(sf=SF))
        .df()
        .sort_values(["key", "start_rn"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    # runs are non-trivial somewhere (a run of length >= 2 exists)
    assert (got["run_len"] >= 2).any()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_rle_hand_sequence(spark):
    """a a b a -> runs (a,1,2), (b,3,1), (a,4,1): maximality pinned
    (the second 'a' island does NOT merge across the 'b')."""
    from kafka_streams_aggregate_spark.operators.stats import (
        run_length_islands,
    )

    rows = [(1, "a", 1, 1), (1, "a", 2, 2), (1, "b", 3, 3), (1, "a", 4, 4)]
    df = spark.createDataFrame(rows, "k long, lab string, t long, i long")
    got = sorted(
        (r["start_rn"], r["label"], r["run_len"])
        for r in run_length_islands(df, "k", "lab", "t", "i").collect()
    )
    assert got == [(1, "a", 2), (3, "b", 1), (4, "a", 1)]
