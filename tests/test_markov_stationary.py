"""Markov stationary distribution — round-12 staging
(operators/stats.py:markov_stationary). Integer fixed-point power
iteration over the q_markov_transitions matrix; oracle = generated
chained CTEs, one iteration per stage (the bounded-iteration trick).
Registration-ready oracle builder in stationary_oracle().
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_PAIRS_SQL = """
    ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM read_parquet('{sf}/events.parquet')
    ),
    pairs AS (
        SELECT event_type AS src, next_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
"""


def stationary_oracle(sf: str, iterations: int = 6) -> str:
    parts = [
        "WITH "
        + _PAIRS_SQL.format(sf=sf)
        + """,
    p AS MATERIALIZED (
        SELECT src, dst,
               CAST((1000000 * n)
                    // SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_fp
        FROM pairs
    ),
    states AS MATERIALIZED (
        SELECT src AS state FROM p
        UNION SELECT dst FROM p
    ),
    ks AS (SELECT COUNT(*) AS k FROM states),
    pi0 AS MATERIALIZED (
        SELECT state, CAST(1000000 // ks.k AS BIGINT) AS pi_fp
        FROM states CROSS JOIN ks
    )"""
    ]
    cur = "pi0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""pi{i} AS MATERIALIZED (
        SELECT p.dst AS state,
               CAST(SUM(r.pi_fp * p.p_fp) // 1000000 AS BIGINT) AS pi_fp
        FROM {cur} r JOIN p ON p.src = r.state
        GROUP BY p.dst
    )"""
        )
        cur = f"pi{i}"
    parts.append(
        f"""fin AS (
        SELECT s.state,
               CAST(COALESCE(last.pi_fp, 0) AS BIGINT) AS pi_ppm,
               CAST(COALESCE(prev.pi_fp, 0) AS BIGINT) AS pi_prev_ppm
        FROM states s
        LEFT JOIN pi{iterations} last ON last.state = s.state
        LEFT JOIN pi{iterations - 1} prev ON prev.state = s.state
    )
    SELECT state, pi_ppm, pi_prev_ppm,
           CAST(pi_ppm - pi_prev_ppm AS BIGINT) AS delta_ppm
    FROM fin"""
    )
    return ",\n    ".join(parts)


def _pairs(spark):
    from pyspark.sql import Window, functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def test_stationary_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        markov_stationary,
    )

    got = (
        markov_stationary(_pairs(spark), iterations=6)
        .toPandas()
        .sort_values("state")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(stationary_oracle(SF, 6))
        .df()
        .sort_values("state")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # converged to the floor-leak fixed point: small per-state drift
    assert got["delta_ppm"].abs().max() <= 2_000  # <= 0.2% of mass
    # total mass stays near scale (floors only leak downward)
    assert 0 < got["pi_ppm"].sum() <= 1_000_000


def test_stationary_hand_chain(spark):
    """Two-state chain a->b (always), b->a (always): stationary is
    uniform (500000, 500000) and the even-iteration count returns
    exactly to it from the uniform start."""
    from kafka_streams_aggregate_spark.operators.stats import (
        markov_stationary,
    )

    pairs = spark.createDataFrame(
        [("a", "b", 7), ("b", "a", 3)], "from_type string, to_type string, n long"
    )
    rows = {
        r["state"]: r for r in markov_stationary(pairs, iterations=4).collect()
    }
    assert rows["a"]["pi_ppm"] == rows["b"]["pi_ppm"] == 500_000
    assert rows["a"]["delta_ppm"] == 0


def test_stationary_absorbing_state(spark):
    """a -> a only; b -> a: all mass flows to a (b ends at 0, a at
    ~1e6 minus floor leak)."""
    from kafka_streams_aggregate_spark.operators.stats import (
        markov_stationary,
    )

    pairs = spark.createDataFrame(
        [("a", "a", 5), ("b", "a", 5)], "from_type string, to_type string, n long"
    )
    rows = {
        r["state"]: r for r in markov_stationary(pairs, iterations=5).collect()
    }
    assert rows["b"]["pi_ppm"] == 0
    assert rows["a"]["pi_ppm"] >= 999_990
