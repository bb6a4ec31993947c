"""Costing-method operators (periodic LIFO, perpetual AVCO) —
pre-validation for the round-10 registration queue.

Three layers, per the repo's verification stack:
1. Hypothesis property: the periodic-LIFO closed form (clamp over the
   newest-first consumption axis) vs an independent Python newest-first
   simulator, adversarial lot/outflow mixes, DuckDB evaluates the SQL
   formula (no Spark session — hundreds of examples are cheap).
2. Cell-exact Spark-vs-DuckDB parity at sf0.001 for the LIFO operator,
   using the exact oracle text that will register next round.
3. Cell-exact (bit-equal floats) parity for the AVCO fold vs the
   recursive-CTE oracle — the op-sequence-identical IEEE argument from
   operators/costing.py, checked for real.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

# Shared events -> ledger derivation (identical to q_fifo_cost_allocation).
LEDGER_SQL = f"""
    SELECT user_id AS product,
           event_id AS seq,
           CASE WHEN event_type = 'purchase' THEN 'IN'
                WHEN event_type = 'error' THEN 'OUT' END AS side,
           1 + CAST(floor(value) AS BIGINT) % 10 AS qty,
           CAST(floor(value * 100) AS BIGINT) AS unit_cents
    FROM read_parquet('{SF}/events.parquet')
    WHERE event_type IN ('purchase', 'error')
"""

LIFO_ORACLE = """
    WITH ledger AS ({ledger}),
    outs AS (
        SELECT product, CAST(SUM(qty) AS BIGINT) AS total_out
        FROM ledger WHERE side = 'OUT' GROUP BY product
    ),
    ins AS (
        SELECT product, qty, unit_cents,
               SUM(qty) OVER (
                   PARTITION BY product ORDER BY seq DESC
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_desc
        FROM ledger WHERE side = 'IN'
    ),
    alloc AS (
        SELECT i.product, i.qty, i.unit_cents,
               greatest(0, least(
                   i.qty,
                   COALESCE(o.total_out, 0) - (i.cum_desc - i.qty)
               )) AS consumed_qty
        FROM ins i LEFT JOIN outs o ON i.product = o.product
    )
    SELECT alloc.product,
           CAST(SUM(qty) AS BIGINT) AS total_in,
           CAST(MAX(COALESCE(o.total_out, 0)) AS BIGINT) AS total_out,
           CAST(SUM(consumed_qty * unit_cents) AS BIGINT)
               AS consumed_value_cents,
           CAST(SUM((qty - consumed_qty) * unit_cents) AS BIGINT)
               AS remaining_value_cents
    FROM alloc LEFT JOIN outs o ON alloc.product = o.product
    GROUP BY alloc.product
"""

AVCO_ORACLE = """
    WITH RECURSIVE ledger AS ({ledger}),
    ordered AS (
        SELECT product, side, qty, unit_cents,
               row_number() OVER (
                   PARTITION BY product ORDER BY seq) AS rn
        FROM ledger
    ),
    r AS (
        SELECT DISTINCT product, 0 AS rn,
               CAST(0 AS BIGINT) AS on_hand,
               CAST(0 AS BIGINT) AS unfilled,
               CAST(0 AS DOUBLE) AS value,
               CAST(0 AS DOUBLE) AS cogs
        FROM ordered
        UNION ALL
        SELECT o.product, o.rn,
               CASE WHEN o.side = 'IN' THEN r.on_hand + o.qty
                    ELSE r.on_hand - least(o.qty, r.on_hand) END,
               CASE WHEN o.side = 'IN' THEN r.unfilled
                    WHEN r.on_hand > 0
                        THEN r.unfilled + (o.qty - least(o.qty, r.on_hand))
                    ELSE r.unfilled + o.qty END,
               CASE WHEN o.side = 'IN'
                        THEN r.value + CAST(o.qty * o.unit_cents AS DOUBLE)
                    WHEN r.on_hand > 0
                        THEN r.value - least(o.qty, r.on_hand)
                                       * (r.value / r.on_hand)
                    ELSE r.value END,
               CASE WHEN o.side = 'OUT' AND r.on_hand > 0
                        THEN r.cogs + least(o.qty, r.on_hand)
                                      * (r.value / r.on_hand)
                    ELSE r.cogs END
        FROM r JOIN ordered o
          ON o.product = r.product AND o.rn = r.rn + 1
    )
    SELECT product,
           max_by(on_hand, rn) AS on_hand,
           max_by(unfilled, rn) AS unfilled_qty,
           max_by(value, rn) AS value_cents,
           max_by(cogs, rn) AS cogs_cents
    FROM r GROUP BY product
"""


# -- layer 1: the closed form vs a newest-first simulator ---------------
def _py_periodic_lifo(lots, total_out):
    """Independent reference: consume newest lots first, one by one.
    lots: list of (seq, qty, unit_cents); newest = highest seq."""
    consumed_value = 0
    remaining_value = 0
    left = total_out
    for seq, qty, cost in sorted(lots, key=lambda t: -t[0]):
        take = min(qty, left)
        consumed_value += take * cost
        remaining_value += (qty - take) * cost
        left -= take
    return consumed_value, remaining_value


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),  # qty
            st.integers(min_value=-50, max_value=500),  # unit_cents
        ),
        min_size=0,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=150),  # total outflow
)
def test_lifo_closed_form_matches_simulator(lots_raw, total_out):
    lots = [(i + 1, q, c) for i, (q, c) in enumerate(lots_raw)]
    exp_cons, exp_rem = _py_periodic_lifo(lots, total_out)

    con = duckdb.connect()
    rows = ",".join(f"(1, {s}, 'IN', {q}, {c})" for s, q, c in lots)
    out_row = f"(1, {len(lots) + 1}, 'OUT', {total_out}, 0)"
    all_rows = rows + ("," if rows else "") + out_row if total_out else rows
    if not all_rows:
        return
    ledger = (
        "SELECT * FROM (VALUES " + all_rows + ") "
        "AS t(product, seq, side, qty, unit_cents)"
    )
    got = con.sql(LIFO_ORACLE.format(ledger=ledger)).fetchall()
    con.close()
    if not lots:
        # no IN lots: alloc is empty -> no row; simulator also 0/0
        assert exp_cons == 0 and exp_rem == 0
        return
    assert len(got) == 1
    _, total_in, got_out, cons, rem = got[0]
    assert total_in == sum(q for _, q, _ in lots)
    assert cons == exp_cons
    assert rem == exp_rem


# -- layers 2+3: Spark operator vs DuckDB oracle at sf0.001 -------------
@pytest.fixture(scope="module")
def spark_ledger(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", SF)
    return (
        events.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            F.col("user_id").alias("product"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "purchase", "IN")
            .otherwise("OUT")
            .alias("side"),
            (1 + F.floor("value").cast("bigint") % 10).alias("qty"),
            F.floor(F.col("value") * 100).cast("bigint").alias("unit_cents"),
        )
    )


def _duck(sql):
    con = duckdb.connect()
    out = con.sql(sql).df()
    con.close()
    return out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .sort_values("product")
        .reset_index(drop=True)
    )


def test_periodic_lifo_parity_sf0001(spark, spark_ledger):
    from kafka_streams_aggregate_spark.operators.costing import (
        periodic_lifo_allocation,
    )

    got = _sorted(periodic_lifo_allocation(spark_ledger).toPandas())
    exp = _sorted(_duck(LIFO_ORACLE.format(ledger=LEDGER_SQL)))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_avco_fold_parity_sf0001_bit_equal(spark, spark_ledger):
    from kafka_streams_aggregate_spark.operators.costing import (
        avco_perpetual_fold,
    )

    got = _sorted(avco_perpetual_fold(spark_ledger).toPandas())
    exp = _sorted(_duck(AVCO_ORACLE.format(ledger=LEDGER_SQL)))
    assert list(got["product"]) == list(exp["product"])
    assert list(got["on_hand"]) == list(exp["on_hand"])
    assert list(got["unfilled_qty"]) == list(exp["unfilled_qty"])
    # bit-equality on the float columns — no tolerance
    assert [v.hex() for v in got["value_cents"]] == [
        v.hex() for v in exp["value_cents"]
    ]
    assert [v.hex() for v in got["cogs_cents"]] == [
        v.hex() for v in exp["cogs_cents"]
    ]


def test_avco_conservation_invariants(spark, spark_ledger):
    """sum(IN qty) == on_hand + (sum(OUT qty) - unfilled) per product;
    value + cogs == total IN value (float identity does NOT hold
    exactly, but the integer quantity ledger must balance exactly)."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import (
        avco_perpetual_fold,
    )

    got = avco_perpetual_fold(spark_ledger).toPandas().set_index("product")
    raw = (
        spark_ledger.groupBy("product", "side")
        .agg(F.sum("qty").alias("q"))
        .toPandas()
        .pivot_table(index="product", columns="side", values="q",
                     fill_value=0)
    )
    for product, row in got.iterrows():
        tin = int(raw["IN"].get(product, 0)) if "IN" in raw else 0
        tout = int(raw["OUT"].get(product, 0)) if "OUT" in raw else 0
        assert tin == row["on_hand"] + (tout - row["unfilled_qty"]), product
        # value never goes negative; filled quantity bounded by inflow
        assert row["value_cents"] >= -1e-6
