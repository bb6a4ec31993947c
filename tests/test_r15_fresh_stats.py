"""Round-15 fresh queue, stats batch — turning points, Cox-Stuart,
Kendall's W, ICC(1), squared Theil's U2, tracking signal, Dixon's Q,
ordinal patterns, Grubbs max, Bowker symmetry (operators/stats.py).
Registration-ready oracle texts in *_ORACLE constants.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# Single source of truth for the oracle texts: the registration module.
# They reference the driver's view names; _duck() below creates those
# views over the sf0.001 parquet before running them.
from kafka_streams_aggregate_spark.queries.round15 import (  # noqa: E402
    BOWKER_ORACLE,
    COXSTUART_ORACLE,
    DIXON_ORACLE,
    GRUBBS_ORACLE,
    ICC_ORACLE,
    KENDALLW_ORACLE,
    ORDPAT_ORACLE,
    THEILU2_ORACLE,
    TRACKING_ORACLE,
    TURNING_ORACLE,
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
        for t in ("orders", "customer", "nation", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _monthly(spark, kilodollar=False):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    out = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    if kilodollar:
        out = out.select(
            "g", "t", F.expr("CAST(v div 100000 AS BIGINT)").alias("v")
        )
    return out


# ---------------------------------------------------------------- parity


def test_turning_points_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        turning_points_test,
    )

    got = turning_points_test(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(TURNING_ORACLE), ["group_key"])


def test_cox_stuart_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        cox_stuart_test,
    )

    got = cox_stuart_test(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(COXSTUART_ORACLE), ["group_key"])


def test_kendall_w_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import kendall_w
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .groupBy(
            F.col("n_regionkey").cast("bigint").alias("g"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("judge"),
            F.col("c_nationkey").cast("bigint").alias("item"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = kendall_w(base, "g", "judge", "item", "v").toPandas()
    _cmp(got, _duck(KENDALLW_ORACLE), ["group_key"])


def test_icc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import icc_oneway
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    m = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .groupBy(
            F.col("n_regionkey").cast("bigint").alias("g"),
            F.col("c_nationkey").cast("bigint").alias("target"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT) div 100000 AS BIGINT)"
            ).alias("v")
        )
    )
    got = icc_oneway(m, "g", "target", "v").toPandas()
    _cmp(got, _duck(ICC_ORACLE), ["group_key"])


def test_theil_u2_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import theil_u2_sq

    got = theil_u2_sq(
        _monthly(spark, kilodollar=True), "g", "t", "v", period=12
    ).toPandas()
    _cmp(got, _duck(THEILU2_ORACLE), ["group_key"])


def test_tracking_signal_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        tracking_signal,
    )

    got = tracking_signal(
        _monthly(spark), "g", "t", "v", period=12
    ).toPandas()
    _cmp(got, _duck(TRACKING_ORACLE), ["group_key"])


def test_dixon_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import dixon_q
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = orders.join(cust, cust.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    got = dixon_q(base, "g", "v").toPandas()
    _cmp(got, _duck(DIXON_ORACLE), ["group_key"])


def test_ordinal_patterns_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        ordinal_patterns,
    )

    got = ordinal_patterns(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(ORDPAT_ORACLE), ["group_key"])


def test_grubbs_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import grubbs_max

    m = _monthly(spark, kilodollar=True).select(
        "g", F.col("t").alias("id"), "v"
    )
    got = grubbs_max(m, "g", "id", "v").toPandas()
    _cmp(got, _duck(GRUBBS_ORACLE), ["group_key"])


def test_bowker_parity(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        bowker_symmetry,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    got = bowker_symmetry(trans, "a", "b").toPandas()
    _cmp(got, _duck(BOWKER_ORACLE), ["type_a", "type_b"])


# ------------------------------------------------------------- hand pins


def test_turning_points_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        turning_points_test,
    )

    rows = [("g", t, v) for t, v in enumerate([1, 3, 2, 4, 3])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = turning_points_test(df, "g", "t", "v").collect()
    # turns at 3 (max), 2 (min), 4 (max): T = 3; d = 9 - 6 = 3
    assert r["gapless"] and r["n_turning"] == 3
    assert r["expected_x3"] == 6
    assert r["z2_ppm"] == (1_000_000 * 10 * 9) // (16 * 5 - 29)

    gapped = [("h", 0, 1), ("h", 1, 3), ("h", 3, 2)]
    df2 = spark.createDataFrame(gapped, "g string, t long, v long")
    [r] = turning_points_test(df2, "g", "t", "v").collect()
    assert r["gapless"] is False and r["n_turning"] is None


def test_cox_stuart_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        cox_stuart_test,
    )

    rows = [("g", t, v) for t, v in enumerate([1, 2, 3, 4, 5, 6])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = cox_stuart_test(df, "g", "t", "v").collect()
    assert (r["n_pairs"], r["n_pos"], r["n_neg"]) == (3, 3, 0)
    assert r["margin_ppm"] == 1_000_000

    rows = [("h", t, v) for t, v in enumerate([5, 4, 3, 2, 1])]
    df2 = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = cox_stuart_test(df2, "g", "t", "v").collect()
    # odd n: middle dropped, pairs (5,2), (4,1) — both down
    assert (r["n_pairs"], r["n_pos"], r["n_neg"]) == (2, 0, 2)
    assert r["margin_ppm"] == -1_000_000


def test_kendall_w_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import kendall_w

    # two judges, identical rankings of 3 items -> W = 1
    rows = [
        ("g", "j1", "a", 10), ("g", "j1", "b", 20), ("g", "j1", "c", 30),
        ("g", "j2", "a", 1), ("g", "j2", "b", 2), ("g", "j2", "c", 3),
    ]
    df = spark.createDataFrame(rows, "g string, j string, i string, v long")
    [r] = kendall_w(df, "g", "j", "i", "v").collect()
    assert (r["m_judges"], r["k_items"], r["s2x"]) == (2, 3, 32)
    assert r["w_ppm"] == 1_000_000

    # opposite rankings -> W = 0; third judge incomplete -> dropped
    rows = [
        ("h", "j1", "a", 10), ("h", "j1", "b", 20), ("h", "j1", "c", 30),
        ("h", "j2", "a", 3), ("h", "j2", "b", 2), ("h", "j2", "c", 1),
        ("h", "j3", "a", 5),
    ]
    df2 = spark.createDataFrame(rows, "g string, j string, i string, v long")
    [r] = kendall_w(df2, "g", "j", "i", "v").collect()
    assert r["n_judges_dropped"] == 1
    assert (r["m_judges"], r["w_ppm"]) == (2, 0)


def test_icc_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import icc_oneway

    # zero within-variance, distinct between -> ICC = 1
    rows = [("g", "a", 1), ("g", "a", 1), ("g", "b", 5), ("g", "b", 5)]
    df = spark.createDataFrame(rows, "g string, tg string, v long")
    [r] = icc_oneway(df, "g", "tg", "v").collect()
    assert (r["n_targets"], r["k"]) == (2, 2)
    assert r["icc_ppm"] == 1_000_000

    # an unbalanced target is dropped and counted
    rows.append(("g", "c", 9))
    df2 = spark.createDataFrame(rows, "g string, tg string, v long")
    [r] = icc_oneway(df2, "g", "tg", "v").collect()
    assert r["n_targets_dropped"] == 1 and r["icc_ppm"] == 1_000_000


def test_theil_u2_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import theil_u2_sq

    rows = [("g", t, v) for t, v in enumerate([10, 20, 10, 20])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = theil_u2_sq(df, "g", "t", "v", period=2).collect()
    # seasonal-naive is perfect (num 0), naive lag-1 misses by 10 twice
    assert (r["n_eval"], r["num_ss"], r["den_ss"]) == (2, 0, 200)
    assert r["u2sq_ppm"] == 0


def test_tracking_signal_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        tracking_signal,
    )

    rows = [("g", t, v) for t, v in enumerate([10, 20, 14, 26])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = tracking_signal(df, "g", "t", "v", period=2).collect()
    assert (r["sum_err"], r["sum_abs_err"]) == (10, 10)
    assert r["ts_ppm"] == 1_000_000 and r["peak_ppm"] == 1_000_000

    # balanced errors +5 then -5: signal 0, but the peak remembers
    rows = [("h", t, v) for t, v in enumerate([10, 20, 15, 15])]
    df2 = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = tracking_signal(df2, "g", "t", "v", period=2).collect()
    assert r["ts_ppm"] == 0 and r["peak_ppm"] == 500_000


def test_dixon_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import dixon_q

    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 3), ("g", 10)], "g string, v long"
    )
    [r] = dixon_q(df, "g", "v").collect()
    assert r["q_low_ppm"] == 1_000_000 // 9
    assert r["q_high_ppm"] == 7_000_000 // 9

    df2 = spark.createDataFrame([("h", 1), ("h", 2)], "g string, v long")
    [r] = dixon_q(df2, "g", "v").collect()
    assert r["q_low_ppm"] is None and r["q_high_ppm"] is None


def test_ordinal_patterns_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        ordinal_patterns,
    )

    rows = [("g", t, v) for t, v in enumerate([1, 2, 3, 2, 1])]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = ordinal_patterns(df, "g", "t", "v").collect()
    # (1,2,3)=012, (2,3,2)=tied (v0=v2), (3,2,1)=210
    assert (r["n_triples"], r["n_tied"]) == (2, 1)
    assert r["n_012"] == 1 and r["n_210"] == 1
    assert r["max_share_ppm"] == 500_000


def test_grubbs_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import grubbs_max

    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 0), ("g", 4, 9)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    [r] = grubbs_max(df, "g", "id", "v").collect()
    # the all-but-one-equal case attains Grubbs' maximum (n-1)/sqrt(n):
    # G^2 = 9/4 = 2.25
    assert (r["outlier_id"], r["outlier_v"]) == (4, 9)
    assert r["g2_ppm"] == 2_250_000


def test_bowker_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        bowker_symmetry,
    )

    rows = [("a", "b")] * 3 + [("b", "a")] + [("a", "c")] * 2
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r["type_a"], r["type_b"]): r
           for r in bowker_symmetry(df, "a", "b").collect()}
    ab = out[("a", "b")]
    assert (ab["n_ab"], ab["n_ba"], ab["d"]) == (3, 1, 2)
    assert ab["term_ppm"] == 1_000_000
    ac = out[("a", "c")]
    assert (ac["n_ab"], ac["n_ba"]) == (2, 0)
    assert ac["term_ppm"] == 2_000_000
