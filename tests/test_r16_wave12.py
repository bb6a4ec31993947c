"""Round-16 wave 12 — the streaming-telemetry engine-row graduation:
the progress feed as verified data. Oracle single-sourced from
queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    STREAM_TELEMETRY_ORACLE,
    q_stream_telemetry,
)


def test_stream_telemetry_semantics(spark):
    got = (
        q_stream_telemetry(spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("batch_id")
        .reset_index(drop=True)
    )
    # batch 0: 3 rows, keys {a, b}; batch 1: 1 row, {b} (state total
    # stays 2); batch 2: 2 rows, {c, d} (state total 4)
    assert list(got["batch_id"]) == [0, 1, 2]
    assert list(got["num_input_rows"]) == [3, 1, 2]
    assert list(got["rows_updated"]) == [2, 1, 2]
    assert list(got["state_rows_total"]) == [2, 2, 4]

    exp = duckdb.connect().execute(STREAM_TELEMETRY_ORACLE).fetchdf()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        exp[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )
