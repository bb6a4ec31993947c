"""Round-15 engine-row graduations: listagg WITHIN GROUP and sink
exactly-once across a restart, exercised exactly as registered
(queries/round15.py) against the DuckDB oracles at sf0.001.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT *"
            f" FROM read_parquet('{SF}/events.parquet')"
        )
        return con.sql(sql).df()
    finally:
        con.close()


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_listagg_ordered_parity(spark):
    from kafka_streams_aggregate_spark.registry import load_all

    qd = load_all()["q_listagg_ordered"]
    got = qd.spark(spark, SF).toPandas()
    _cmp(got, _duck(qd.oracle), ["user_id"])


def test_sink_exactly_once_parity(spark):
    from kafka_streams_aggregate_spark.registry import load_all

    qd = load_all()["q_sink_exactly_once"]
    got = qd.spark(spark, SF).toPandas()
    assert got["exactly_once"].all()
    _cmp(got, _duck(qd.oracle), ["event_type"])
