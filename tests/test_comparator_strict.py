"""The local comparator must be dtype-strict at the int/float boundary.

Round 9's only red driver row (q_cohort_ltv) was an oracle-side DuckDB
HUGEINT that pandas fetched as float64 while Spark emitted int64: every
cell compared equal under Python's ``100 == 100.0``, so the in-repo gate
passed while the driver's value-hash failed. These tests pin the
stricter contract: equal VALUES with different numeric KINDS must fail
locally, exactly like they fail at the driver.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.oracle import compare_frames


def test_int_vs_float_same_values_fails():
    a = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"),
                      "v": pd.array([100, 200], dtype="int64")})
    b = pd.DataFrame({"k": pd.array([1, 2], dtype="int64"),
                      "v": pd.array([100.0, 200.0], dtype="float64")})
    assert not compare_frames("int_vs_float", a, b).ok


def test_hugeint_oracle_column_fails_locally():
    # The exact round-9 failure class: DuckDB SUM(BIGINT) window -> HUGEINT,
    # fetched by pandas as float64/object; an int64 Spark side must NOT pass.
    con = duckdb.connect()
    try:
        oracle_pdf = con.execute(
            "SELECT g, SUM(x) OVER (PARTITION BY g ORDER BY x) AS s "
            "FROM (VALUES (1, 100::BIGINT), (1, 200::BIGINT)) t(g, x)"
        ).fetchdf()
    finally:
        con.close()
    assert oracle_pdf["s"].dtype != "int64"  # HUGEINT leaks out of int64
    spark_pdf = pd.DataFrame({"g": pd.array([1, 1], dtype="int32"),
                              "s": pd.array([100, 300], dtype="int64")})
    spark_pdf["g"] = oracle_pdf["g"]  # match the grouping col exactly
    assert not compare_frames("hugeint", spark_pdf, oracle_pdf).ok


def test_matching_kinds_still_pass():
    a = pd.DataFrame({"i": pd.array([1, 2], dtype="int64"),
                      "f": pd.array([1.5, 2.5], dtype="float64"),
                      "s": ["x", "y"]})
    b = a.copy()
    assert compare_frames("same", a, b).ok
    # NULL/NaN canonicalization unaffected by strictness
    c = pd.DataFrame({"v": pd.array([1.0, None], dtype="float64")})
    d = pd.DataFrame({"v": pd.array([1.0, float("nan")], dtype="float64")})
    assert compare_frames("nulls", c, d).ok


def test_bool_vs_int_fails():
    a = pd.DataFrame({"v": pd.array([True, False], dtype="bool")})
    b = pd.DataFrame({"v": pd.array([1, 0], dtype="int64")})
    assert not compare_frames("bool_vs_int", a, b).ok
