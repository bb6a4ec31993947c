"""Bitemporal as-of — pre-validation for the round-10 registration
queue (operators/joins.py:bitemporal_asof).

Facts: events as per-user attribute corrections, valid time = event
time (exact int64 micros), transaction time = arrival batch
(event_id div 500 — synthetic but deterministic). Probes: a 2x3 grid
of (tx_cutoff, valid_us). The key property pinned: facts with tx >
tx_cutoff are INVISIBLE even when their valid time qualifies.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# probe valid times: Jan 8 / Jan 16 / Jan 24 2024 (UTC, micros)
V1, V2, V3 = 1704672000000000, 1705363200000000, 1706054400000000

BITEMPORAL_ORACLE = f"""
    WITH facts AS (
        SELECT user_id AS key, event_id AS fact_id,
               epoch_us(ts) AS valid_us,
               event_id // 500 AS tx,
               CAST(floor(value * 100) AS BIGINT) AS value_cents
        FROM read_parquet('{{sf}}/events.parquet')
    ),
    probes(tx_cutoff, probe_valid_us) AS (
        VALUES (0, {V1}), (0, {V2}), (0, {V3}),
               (1, {V1}), (1, {V2}), (1, {V3})
    ),
    fanned AS (
        SELECT p.tx_cutoff, p.probe_valid_us, f.*,
               row_number() OVER (
                   PARTITION BY f.key, p.tx_cutoff, p.probe_valid_us
                   ORDER BY f.valid_us DESC, f.tx DESC,
                            f.fact_id DESC) AS rn
        FROM facts f CROSS JOIN probes p
        WHERE f.tx <= p.tx_cutoff AND f.valid_us <= p.probe_valid_us
    )
    SELECT CAST(tx_cutoff AS BIGINT) AS tx_cutoff,
           CAST(probe_valid_us AS BIGINT) AS probe_valid_us,
           key, fact_id, valid_us, CAST(tx AS BIGINT) AS tx, value_cents
    FROM fanned WHERE rn = 1
"""


def _facts(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "events", SF).select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("fact_id"),
        F.expr("unix_micros(ts)").alias("valid_us"),
        F.expr("event_id div 500").cast("bigint").alias("tx"),
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )


def test_bitemporal_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.joins import (
        bitemporal_asof,
    )

    probes = spark.createDataFrame(
        [(t, v) for t in (0, 1) for v in (V1, V2, V3)],
        "tx_cutoff long, valid_us long",
    )
    got = (
        bitemporal_asof(_facts(spark), probes)
        .toPandas()
        .sort_values(["tx_cutoff", "probe_valid_us", "key"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(BITEMPORAL_ORACLE.format(sf=SF))
        .df()
        .sort_values(["tx_cutoff", "probe_valid_us", "key"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_bitemporal_correction_invisibility(spark):
    """A late-arriving correction (higher tx) must change the answer
    at tx_cutoff=1 but stay invisible at tx_cutoff=0."""
    from kafka_streams_aggregate_spark.operators.joins import (
        bitemporal_asof,
    )

    facts = spark.createDataFrame(
        [
            # key 7: original fact at valid 100 (tx 0), corrected
            # RETROACTIVELY at the same valid time by tx 1
            (7, 1, 100, 0, 1000),
            (7, 2, 100, 1, 2000),
            # key 8: only ever one fact, tx 0
            (8, 3, 50, 0, 500),
        ],
        "key long, fact_id long, valid_us long, tx long, value_cents long",
    )
    probes = spark.createDataFrame(
        [(0, 200), (1, 200)], "tx_cutoff long, valid_us long"
    )
    got = {
        (r["tx_cutoff"], r["key"]): (r["fact_id"], r["value_cents"])
        for r in bitemporal_asof(facts, probes).collect()
    }
    assert got[(0, 7)] == (1, 1000)  # the correction is invisible
    assert got[(1, 7)] == (2, 2000)  # and visible once committed
    assert got[(0, 8)] == (3, 500) and got[(1, 8)] == (3, 500)
