"""Unit tests for the batch inventory fold (SURVEY.md §2.2, FIXTURES.md F1/F2).

Covers the reference's edge cases independently of DuckDB: REP-last,
REP-first, multiple REPs, no-REP pure signed sum, negative counts,
null-value drops, all-null keys absent, plus the reference's randomized
generator shape (10 keys, delta in [1,10], uniform actions, 2 rounds)
checked against a plain-Python fold.
"""

from __future__ import annotations

import random

from kafka_streams_aggregate_spark.operators.inventory_fold import (
    inventory_count_fold,
    latest_per_key,
    python_fold_oracle,
)
from kafka_streams_aggregate_spark.schemas import INVENTORY_UPDATE_FLAT_SCHEMA


def _run_fold(spark, rows):
    df = spark.createDataFrame(rows, schema=INVENTORY_UPDATE_FLAT_SCHEMA)
    out = inventory_count_fold(df).collect()
    return {r["product_code"]: r["count"] for r in out}


def test_inc_dec_sum(spark):
    rows = [("a", 1, "INC", 5), ("a", 2, "DEC", 3), ("a", 3, "INC", 2)]
    assert _run_fold(spark, rows) == {"a": 4}


def test_rep_last_wins(spark):
    rows = [("a", 1, "INC", 5), ("a", 2, "INC", 7), ("a", 3, "REP", 9)]
    assert _run_fold(spark, rows) == {"a": 9}


def test_rep_then_updates(spark):
    rows = [("a", 1, "REP", 10), ("a", 2, "DEC", 4), ("a", 3, "INC", 1)]
    assert _run_fold(spark, rows) == {"a": 7}


def test_multiple_reps_only_last_matters(spark):
    rows = [
        ("a", 1, "REP", 100),
        ("a", 2, "INC", 1),
        ("a", 3, "REP", 50),
        ("a", 4, "DEC", 20),
    ]
    assert _run_fold(spark, rows) == {"a": 30}


def test_rep_first_event(spark):
    rows = [("a", 5, "REP", 3)]
    assert _run_fold(spark, rows) == {"a": 3}


def test_negative_counts_not_clamped(spark):
    rows = [("a", 1, "DEC", 7)]
    assert _run_fold(spark, rows) == {"a": -7}


def test_null_value_rows_dropped(spark):
    rows = [("a", 1, "INC", 5), ("a", 2, None, None), ("a", 3, "DEC", 2)]
    assert _run_fold(spark, rows) == {"a": 3}


def test_all_null_key_absent(spark):
    rows = [("a", 1, "INC", 5), ("b", 1, None, None)]
    assert _run_fold(spark, rows) == {"a": 5}


def test_empty_input(spark):
    assert _run_fold(spark, []) == {}


def test_seq_order_not_input_order(spark):
    # REP at seq 1 arrives "late" in input order — must still be folded first.
    rows = [("a", 3, "INC", 2), ("a", 1, "REP", 10), ("a", 2, "DEC", 5)]
    assert _run_fold(spark, rows) == {"a": 7}


def test_randomized_vs_python_oracle_two_rounds(spark):
    """Mirror of the reference's randomized scenario
    (KafkaStreamsInventoryCountTests.java:147-173): 10 keys x 5 events
    x 2 rounds, delta in [1,10], uniform actions, plus injected
    null-value rows, against an independent Python fold."""
    rng = random.Random(42)
    rows = []
    seq = 0
    for _round in range(2):
        for k in range(10):
            for _ in range(5):
                seq += 1
                if rng.random() < 0.1:
                    rows.append((f"key{k}", seq, None, None))
                else:
                    rows.append(
                        (
                            f"key{k}",
                            seq,
                            rng.choice(["INC", "DEC", "REP"]),
                            rng.randint(1, 10),
                        )
                    )
    expected = python_fold_oracle(rows)
    assert _run_fold(spark, rows) == expected


def test_accumulation_across_rounds(spark):
    """State accumulates: folding round1+round2 together equals folding
    round2 seeded with round1's result (REP-free check)."""
    rng = random.Random(7)
    r1 = [(f"k{i}", s, "INC", rng.randint(1, 10)) for i in range(3) for s in range(5)]
    r2 = [
        (f"k{i}", 100 + s, rng.choice(["INC", "DEC"]), rng.randint(1, 10))
        for i in range(3)
        for s in range(5)
    ]
    full = _run_fold(spark, r1 + r2)
    part1 = _run_fold(spark, r1)
    part2 = _run_fold(spark, r2)
    assert full == {k: part1.get(k, 0) + part2.get(k, 0) for k in part1 | part2}


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 3, 30.0), ("a", 2, 20.0), ("b", 1, 1.0)],
        "k string, seq long, v double",
    )
    out = {
        r["k"]: (r["seq"], r["v"])
        for r in latest_per_key(df, ["k"], "seq", ["seq", "v"]).collect()
    }
    assert out == {"a": (3, 30.0), "b": (1, 1.0)}
