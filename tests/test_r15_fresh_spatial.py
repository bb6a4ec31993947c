"""Round-15 spatial batch — Moran's I + Geary's C
(operators/spatial.py:spatial_autocorr), oracle single-sourced from
queries/round15.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round15 import (  # noqa: E402
    SPATIAL_AC_ORACLE,
)


def test_spatial_autocorr_parity(spark):
    from kafka_streams_aggregate_spark.registry import load_all

    got = (
        load_all()["q_spatial_autocorr"].spark(spark, SF)
        .toPandas()
        .sort_index(axis=1)
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT *"
            f" FROM read_parquet('{SF}/customer.parquet')"
        )
        exp = con.sql(SPATIAL_AC_ORACLE).df().sort_index(axis=1)
    finally:
        con.close()
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_spatial_autocorr_hand(spark):
    from kafka_streams_aggregate_spark.operators.spatial import (
        spatial_autocorr,
    )

    # perfect 2x2 checkerboard: I = -1, C = 1.5
    rows = [(0, 0, 0), (1, 0, 10), (0, 1, 10), (1, 1, 0)]
    df = spark.createDataFrame(rows, "gx long, gy long, v long")
    [r] = spatial_autocorr(df).collect()
    assert (r["n_cells"], r["w_edges"]) == (4, 8)
    assert r["moran_ppm"] == -1_000_000
    assert r["geary_ppm"] == 1_500_000
    assert r["expected_i_ppm"] == -333_333

    # 1D cluster 0,0,10,10: positive I, C < 1
    rows = [(0, 0, 0), (1, 0, 0), (2, 0, 10), (3, 0, 10)]
    df = spark.createDataFrame(rows, "gx long, gy long, v long")
    [r] = spatial_autocorr(df).collect()
    assert r["moran_ppm"] == 333_333
    assert r["geary_ppm"] == 500_000

    # constant surface: SZ2 = 0 -> NULL stats
    rows = [(0, 0, 5), (1, 0, 5)]
    df = spark.createDataFrame(rows, "gx long, gy long, v long")
    [r] = spatial_autocorr(df).collect()
    assert r["moran_ppm"] is None and r["geary_ppm"] is None
