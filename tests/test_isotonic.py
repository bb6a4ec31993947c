"""Isotonic regression (PAVA) — pre-validation for the round-10
registration queue (operators/stats.py:isotonic_fit).

Oracle strategy: the minimax identity iso[i] = max_{j<=i} min_{k>=i}
avg(y[j..k]) — O(n^3) per group, verification-only — is exact under
IEEE rounding because rounding is monotone: min/max over the
correctly-rounded interval averages equals the rounded exact value.
Registration-ready oracle text in ISOTONIC_ORACLE (sized for bounded
groups; the operator itself is O(n) per group).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

ISOTONIC_ORACLE = """
    WITH spend AS (
        SELECT c.c_nationkey, c.c_custkey,
               CAST(COALESCE(
                   SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)),
                   0) AS BIGINT) AS y
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    r AS (
        SELECT c_nationkey AS grp,
               CAST(row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_custkey) AS BIGINT) AS rn,
               y,
               SUM(y) OVER (PARTITION BY c_nationkey
                            ORDER BY c_custkey) AS ps
        FROM spend
    ),
    iv AS (
        SELECT a.grp, a.rn AS j, b.rn AS k,
               CAST(b.ps - a.ps + a.y AS DOUBLE)
                   / CAST(b.rn - a.rn + 1 AS DOUBLE) AS avgjk
        FROM r a JOIN r b ON b.grp = a.grp AND b.rn >= a.rn
    ),
    inner_ AS (
        SELECT iv.grp, i.rn AS i, iv.j, MIN(iv.avgjk) AS m
        FROM iv JOIN r i ON i.grp = iv.grp
                        AND iv.j <= i.rn AND iv.k >= i.rn
        GROUP BY iv.grp, i.rn, iv.j
    ),
    iso AS (
        SELECT grp, i AS rn, MAX(m) AS iso_fit
        FROM inner_ GROUP BY grp, i
    )
    SELECT CAST(r.grp AS BIGINT) AS group_key, r.rn, r.y, iso.iso_fit
    FROM r JOIN iso ON iso.grp = r.grp AND iso.rn = r.rn
"""


def test_isotonic_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import isotonic_fit
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("y")
        )
    )
    got = (
        isotonic_fit(spend, "c_nationkey", "c_custkey", "y")
        .toPandas()
        .sort_values(["group_key", "rn"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ISOTONIC_ORACLE.format(sf=SF))
        .df()
        .sort_values(["group_key", "rn"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # bit-equality of the fitted doubles, not merely closeness
    assert [v.hex() for v in got["iso_fit"]] == [
        v.hex() for v in exp["iso_fit"]
    ]


def _pava_reference(ys):
    """Exact-rational PAVA via Fraction, independent implementation."""
    from fractions import Fraction

    blocks = []  # (sum, count)
    for v in ys:
        s, c = v, 1
        while blocks and Fraction(blocks[-1][0], blocks[-1][1]) > Fraction(
            s, c
        ):
            ps, pc = blocks.pop()
            s, c = s + ps, c + pc
        blocks.append((s, c))
    out = []
    for s, c in blocks:
        out.extend([Fraction(s, c)] * c)
    return out


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40))
def test_pava_properties(ys):
    """The closure's algorithm (re-stated here) matches an exact
    Fraction reference, is nondecreasing, and preserves the total."""
    blocks = []
    for v in ys:
        s, c = v, 1
        while blocks and blocks[-1][0] * c > s * blocks[-1][1]:
            ps, pc = blocks.pop()
            s, c = s + ps, c + pc
        blocks.append((s, c))
    fits = []
    for s, c in blocks:
        fits.extend([s / c] * c)

    ref = _pava_reference(ys)
    assert len(fits) == len(ys)
    assert all(
        abs(f - float(r)) == 0.0 for f, r in zip(fits, ref)
    ), "fit differs from exact-rational reference"
    assert all(a <= b for a, b in zip(fits, fits[1:])), "not monotone"
    from fractions import Fraction

    assert sum(r for r in ref) == Fraction(sum(ys)), "total not preserved"


def test_isotonic_already_monotone(spark):
    """A y sequence already nondecreasing must be returned unchanged."""
    from kafka_streams_aggregate_spark.operators.stats import isotonic_fit

    rows = [(1, i, 10 * i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g int, o int, y long")
    got = {
        r["rn"]: r["iso_fit"]
        for r in isotonic_fit(df, "g", "o", "y").collect()
    }
    assert got == {i: float(10 * i) for i in range(1, 21)}
