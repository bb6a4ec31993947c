"""Holt-Winters additive seasonal smoothing — pre-validation for the
round-11 registration queue
(operators/pandas_ops.py:holt_winters_additive).

Bit-equality layer: alpha=beta=gamma=1/2 makes every update a short
fixed chain of correctly-rounded IEEE ops; the oracle's recursive CTE
carries (level, trend, s0..s6) and repeats the update expressions
textually (same ops => same bits). Init means are spelled as explicit
left-associative sums to match Python's sequential sum(). Series
shorter than 2 periods are dropped. Registration-ready oracle text in
HW_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _hw_update(col: str) -> str:
    """new_level expression, repeated textually wherever needed."""
    return (
        f"0.5 * (o.v - {col}) + 0.5 * (r.level + r.trend)"
    )


_S_OLD = (
    "CASE (o.rn - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 "
    "WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 "
    "WHEN 5 THEN r.s5 ELSE r.s6 END"
)
_NL = _hw_update(_S_OLD)

_S_UPDATES = ", ".join(
    f"CASE WHEN (o.rn - 1) % 7 = {i} "
    f"THEN 0.5 * (o.v - ({_NL})) + 0.5 * r.s{i} "
    f"ELSE r.s{i} END"
    for i in range(7)
)

HW_ORACLE = f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS BIGINT) AS rn
        FROM read_parquet('{{sf}}/events.parquet')
    ),
    nn AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered GROUP BY user_id
    ),
    piv AS (
        SELECT user_id,
               {", ".join(f"MAX(CASE WHEN rn = {k} THEN v END) AS x{k}"
                          for k in range(1, 15))}
        FROM ordered WHERE rn <= 14 GROUP BY user_id
    ),
    init AS (
        SELECT p.user_id,
               (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0 AS level,
               ((x8 + x9 + x10 + x11 + x12 + x13 + x14) / 7.0
                - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0) / 7.0
                   AS trend,
               {", ".join(
                   f"x{i + 1} - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0"
                   f" AS s{i}" for i in range(7))}
        FROM piv p JOIN nn ON nn.user_id = p.user_id
        WHERE nn.n >= 14
    ),
    r AS (
        SELECT user_id, CAST(7 AS BIGINT) AS rn,
               level, trend, s0, s1, s2, s3, s4, s5, s6
        FROM init
        UNION ALL
        SELECT o.user_id, o.rn,
               {_NL},
               0.5 * (({_NL}) - r.level) + 0.5 * r.trend,
               {_S_UPDATES}
        FROM r JOIN ordered o
          ON o.user_id = r.user_id AND o.rn = r.rn + 1
    ),
    last AS (
        SELECT user_id,
               max_by(level, rn) AS level, max_by(trend, rn) AS trend,
               {", ".join(f"max_by(s{i}, rn) AS s{i}" for i in range(7))}
        FROM r GROUP BY user_id
    )
    SELECT nn.user_id AS key, nn.n AS n_obs,
           l.level, l.trend, l.s0, l.s1, l.s2, l.s3, l.s4, l.s5, l.s6,
           l.level + l.trend
           + CASE nn.n % 7 WHEN 0 THEN l.s0 WHEN 1 THEN l.s1
                  WHEN 2 THEN l.s2 WHEN 3 THEN l.s3 WHEN 4 THEN l.s4
                  WHEN 5 THEN l.s5 ELSE l.s6 END AS forecast_1
    FROM last l JOIN nn ON nn.user_id = l.user_id
"""


def test_holt_winters_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        holt_winters_additive,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", SF)
    got = (
        holt_winters_additive(events, "user_id", "value", "ts", "event_id")
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(HW_ORACLE.format(sf=SF))
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert list(got["key"]) == list(exp["key"])
    assert list(got["n_obs"]) == list(exp["n_obs"])
    for col in ("level", "trend", "forecast_1") + tuple(
        f"s{i}" for i in range(7)
    ):
        assert [v.hex() for v in got[col]] == [
            v.hex() for v in exp[col]
        ], col


def test_holt_winters_hand_series(spark):
    """A perfectly periodic series (period 7, constant base): after
    init, level stays at the base, trend at 0, and the forecast
    reproduces the next point exactly. Series shorter than 14 drop."""
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        holt_winters_additive,
    )

    pattern = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    rows = [
        (1, float(pattern[i % 7]), i, i) for i in range(21)
    ] + [(2, 5.0, i, i) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, v double, t long, i long")
    out = holt_winters_additive(df, "k", "v", "t", "i").collect()
    assert [r["key"] for r in out] == [1]
    [r] = out
    base = sum(pattern) / 7
    assert r["n_obs"] == 21
    assert abs(r["level"] - base) < 1e-9
    assert abs(r["trend"]) < 1e-9
    # next point is index 21 -> slot 0 -> pattern[0]
    assert abs(r["forecast_1"] - pattern[0]) < 1e-6
