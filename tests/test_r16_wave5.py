"""Round-16 wave 5 — dropDuplicatesWithinWatermark engine graduation
and the MinHash calibration audit. Oracle texts single-sourced from
queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    STREAM_DEDUP_WM_ORACLE,
    _minhash_calibration_oracle,
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql, tables=()):
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def test_minhash_calibration_identical_docs(spark):
    """An exact-duplicate pair agrees on every signature row: bucket
    10, est = exact = 1e6, zero error."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        minhash_calibration,
    )

    body = " ".join(f"tok{i}" for i in range(30))
    rows = [(1, body), (2, body), (3, "something else entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in minhash_calibration(
        df, hash_family="md5").collect()}
    assert 10 in out
    r = out[10]
    assert r["n_pairs"] == 1
    assert r["sum_est_ppm"] == r["sum_exact_ppm"] == 1_000_000
    assert r["sum_abs_err_ppm"] == 0


def test_minhash_calibration_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        minhash_calibration,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    got = minhash_calibration(
        load_table(spark, "documents", SF), hash_family="md5"
    ).toPandas()
    _cmp(got, _duck(_minhash_calibration_oracle(), ("documents",)),
         ["bucket"])
    assert got["n_pairs"].sum() > 0


def test_stream_dedup_watermark_semantics(spark):
    """The registered plant end to end: in-delay dup dropped, evicted
    key re-admitted, eviction lagging one batch behind the raise (the
    probed semantics documented at the registration)."""
    from kafka_streams_aggregate_spark.queries.round16 import (
        q_stream_dedup_watermark,
    )

    got = q_stream_dedup_watermark(spark, SF).toPandas()
    by_k = {r["k"]: r for _, r in got.iterrows()}
    assert by_k["x"]["n_emitted"] == 1       # dup at 12:02 dropped
    assert by_k["y"]["n_emitted"] == 2       # evicted then re-admitted
    assert by_k["w"]["n_emitted"] == 1       # fresh key while x/y live
    assert by_k["z"]["n_emitted"] == 1
    _cmp(got, _duck(STREAM_DEDUP_WM_ORACLE), ["k"])
