"""Brown double-exponential smoothing — pre-validation for the
round-10 registration queue (operators/pandas_ops.py:
brown_double_smoothing).

Bit-equality layer: the fold's two coupled alpha=1/2 EWMA states and
the three derived columns (level / trend / one-step forecast) must be
float-bit-identical to a DuckDB recursive CTE executing the same op
sequence — the registration-ready oracle text lives here as
BROWN_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

BROWN_ORACLE = """
    WITH RECURSIVE ordered AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM read_parquet('{sf}/events.parquet')
    ),
    r AS (
        SELECT user_id, rn, v AS s1, v AS s2 FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn,
               0.5 * o.v + 0.5 * r.s1,
               0.5 * (0.5 * o.v + 0.5 * r.s1) + 0.5 * r.s2
        FROM r JOIN ordered o
          ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(MAX(rn) AS BIGINT) AS n_events,
           max_by(s1, rn) AS s1_last,
           max_by(s2, rn) AS s2_last,
           2 * max_by(s1, rn) - max_by(s2, rn) AS level,
           max_by(s1, rn) - max_by(s2, rn) AS trend,
           (2 * max_by(s1, rn) - max_by(s2, rn))
               + (max_by(s1, rn) - max_by(s2, rn)) AS forecast_1
    FROM r GROUP BY user_id
"""


def test_brown_smoothing_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        brown_double_smoothing,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", SF)
    got = (
        brown_double_smoothing(events, "user_id", "value", "ts", "event_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(BROWN_ORACLE.format(sf=SF))
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con.close()
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["n_events"]) == list(exp["n_events"])
    for col in ("s1_last", "s2_last", "level", "trend", "forecast_1"):
        assert [v.hex() for v in got[col]] == [
            v.hex() for v in exp[col]
        ], col


def test_brown_identities(spark):
    """level - trend == s1 (exact float identity: (2a-b)-(a-b) is NOT
    guaranteed == a in general, so pin the identities that ARE computed:
    forecast_1 == level + trend as-computed, and trend == s1 - s2."""
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        brown_double_smoothing,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", SF)
    pdf = brown_double_smoothing(
        events, "user_id", "value", "ts", "event_id"
    ).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        assert r["trend"] == r["s1_last"] - r["s2_last"]
        assert r["level"] == 2.0 * r["s1_last"] - r["s2_last"]
        assert r["forecast_1"] == r["level"] + r["trend"]
        # single-event series: s1 == s2 == v, trend exactly 0
        if r["n_events"] == 1:
            assert r["trend"] == 0.0
