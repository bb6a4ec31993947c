"""Round-16 fresh queue, spatial batch — global Getis-Ord G and
join-count statistics on the md5 rook grid (operators/spatial.py).
Oracle texts single-sourced from queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    GETIS_ORACLE,
    JOINCOUNT_ORACLE,
    _grid_counts,
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT *"
            f" FROM read_parquet('{SF}/customer.parquet')"
        )
        return con.sql(sql).df()
    finally:
        con.close()


def test_getis_ord_hand(spark):
    from kafka_streams_aggregate_spark.operators.spatial import getis_ord_g

    # 2x2 grid, v = 1,2,3,4: 4 rook edges, sum(va*vb) over unordered
    # edges = 2+12+3+8 = 25; denom = S^2 - sum v^2 = 100 - 30 = 70
    rows = [(0, 0, 1), (1, 0, 2), (0, 1, 3), (1, 1, 4)]
    df = spark.createDataFrame(rows, "gx long, gy long, v long")
    [r] = getis_ord_g(df).collect()
    assert r["n_cells"] == 4 and r["w_edges"] == 8
    assert r["g_ppm"] == (1_000_000 * 50) // 70
    assert r["expected_g_ppm"] == (1_000_000 * 8) // 12

    # isolated cells: no edges -> NULL G, expectation still defined
    rows = [(0, 0, 1), (5, 5, 2)]
    df = spark.createDataFrame(rows, "gx long, gy long, v long")
    [r] = getis_ord_g(df).collect()
    assert r["g_ppm"] is None and r["w_edges"] == 0


def test_getis_ord_parity(spark):
    from kafka_streams_aggregate_spark.operators.spatial import getis_ord_g

    got = getis_ord_g(_grid_counts(spark, SF)).toPandas()
    _cmp(got, _duck(GETIS_ORACLE), ["n_cells"])


def test_join_counts_hand(spark):
    from kafka_streams_aggregate_spark.operators.spatial import join_counts

    # 2x2 checkerboard columns: B W / B W -> edges: 2 BW (rows),
    # 1 BB + 1 WW (columns)
    rows = [(0, 0, True), (1, 0, False), (0, 1, True), (1, 1, False)]
    df = spark.createDataFrame(rows, "gx long, gy long, is_b boolean")
    [r] = join_counts(df).collect()
    assert (r["n_edges"], r["bb"], r["ww"], r["bw"]) == (4, 1, 1, 2)
    assert (r["n_b"], r["n_w"]) == (2, 2)
    # E[BW] = 2*J*nB*nW / (n(n-1)) = 2*4*2*2/12 = 8/3 -> 2666 milli
    assert r["e_bw_milli"] == 2666
    # obs/exp = 2 / (8/3) = 3/4
    assert r["bw_ratio_ppm"] == 750_000


def test_join_counts_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.spatial import join_counts

    flagged = _grid_counts(spark, SF).select(
        "gx", "gy", F.expr("v % 2 = 0").alias("is_b")
    )
    got = join_counts(flagged).toPandas()
    _cmp(got, _duck(JOINCOUNT_ORACLE), ["n_cells"])
