"""Round-16 wave 6 — rank autocorrelation, hapax profile, event-gap
cadence. Oracle texts single-sourced from queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    EVENT_GAP_ORACLE,
    HAPAX_ORACLE,
    RANK_AUTOCORR_ORACLE,
    q_event_gap_profile,
    q_hapax_ratio,
    q_rank_autocorr,
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql, tables):
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


def test_rank_autocorr_hand(spark):
    """A strictly rising gapless series has every lag pair concordant
    -> rho = 1; a month gap drops exactly its pair."""
    from pyspark.sql import Window, functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        spearman_rank_corr,
    )

    rows = [("g", t, 10 * t) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    w = Window.partitionBy("g").orderBy("t")
    lagged = df.select(
        "g", "t", F.lag("v").over(w).alias("x"), F.col("v").alias("y"),
        (F.col("t") - F.lag("t").over(w)).alias("dt"),
    )
    pairs = lagged.where(F.col("dt") == 1).select("g", "t", "x", "y")
    [r] = spearman_rank_corr(pairs, "g", "x", "y", "t").collect()
    assert r["n"] == 5 and r["sum_d2"] == 0 and r["spearman_rho"] == 1.0

    rows = [("h", t, 10 * t) for t in (0, 1, 2, 5, 6)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    lagged = df.select(
        "g", "t", F.lag("v").over(w).alias("x"), F.col("v").alias("y"),
        (F.col("t") - F.lag("t").over(w)).alias("dt"),
    )
    pairs = lagged.where(F.col("dt") == 1).select("g", "t", "x", "y")
    [r] = spearman_rank_corr(pairs, "g", "x", "y", "t").collect()
    assert r["n"] == 3  # (0,1), (1,2), (5,6) — the 2->5 pair dropped


def test_rank_autocorr_parity(spark):
    got = q_rank_autocorr(spark, SF).toPandas()
    _cmp(got, _duck(RANK_AUTOCORR_ORACLE, ("orders", "customer")),
         ["group_key"])


def test_hapax_hand(spark):
    from kafka_streams_aggregate_spark.operators.text import hapax_ratio

    rows = [
        (1, "s", "a a b c"),    # a:2 b:1 c:1
        (2, "s", "b d"),        # b -> 2, d:1
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    [r] = hapax_ratio(df).collect()
    # counts: a=2, b=2, c=1, d=1 -> vocab 4, hapax 2, dis 2, tokens 6
    assert (r["tokens_total"], r["vocab_size"]) == (6, 4)
    assert (r["n_hapax"], r["n_dis"]) == (2, 2)
    assert r["hapax_ppm"] == 500_000


def test_hapax_parity(spark):
    got = q_hapax_ratio(spark, SF).toPandas()
    _cmp(got, _duck(HAPAX_ORACLE, ("documents",)), ["source"])


def test_event_gap_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        event_gap_profile,
    )

    # gaps: 10, 20, 30, 40 -> p50 = rank 2 -> 20, p90 = rank 4 -> 40
    rows = [("g", ms, i) for i, ms in enumerate((0, 10, 30, 60, 100))]
    rows += [("solo", 5, 99)]  # single event: NULL gaps, present row
    df = spark.createDataFrame(rows, "g string, ms long, id long")
    out = {r["group_key"]: r for r in event_gap_profile(
        df, "g", "ms", "id").collect()}
    r = out["g"]
    assert (r["n_events"], r["n_gaps"]) == (5, 4)
    assert (r["p50_gap_ms"], r["p90_gap_ms"], r["max_gap_ms"]) == (20, 40, 40)
    s = out["solo"]
    assert s["n_events"] == 1 and s["n_gaps"] == 0
    assert s["p50_gap_ms"] is None and s["max_gap_ms"] is None


def test_event_gap_parity(spark):
    got = q_event_gap_profile(spark, SF).toPandas()
    _cmp(got, _duck(EVENT_GAP_ORACLE, ("events",)), ["group_key"])
