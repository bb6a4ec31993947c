"""Classifier/experiment-eval family — pre-validation for the
round-12 registration queue (operators/ml_eval.py).

Labels/scores/predictions are synthesized from the md5 hash family
(cross-engine identical, correlated by construction so every metric
is non-degenerate). Registration-ready oracle texts in *_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# score: 16-bit md5; label: 1 when a SECOND md5 16-bit field is below
# the score -> P(label=1 | score) ~ score/65536 (a calibrated
# classifier); pred: score >= 32768.
_SCORED_SQL = """
        SELECT source AS g, doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   AS score,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))
                             ::BIGINT
                         < ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                             ::BIGINT
                    THEN 1 ELSE 0 END AS label
        FROM read_parquet('{sf}/documents.parquet')
"""

CONFUSION_ORACLE = f"""
    WITH s AS ({_SCORED_SQL}),
    p AS (
        SELECT g, label AS y,
               CASE WHEN score >= 32768 THEN 1 ELSE 0 END AS pr
        FROM s
    ),
    c AS (
        SELECT g AS group_key,
               CAST(SUM(CASE WHEN y = 1 AND pr = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN y = 0 AND pr = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN y = 1 AND pr = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN y = 0 AND pr = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM p GROUP BY g
    )
    SELECT group_key, tp, fp, fn, tn,
           CAST((1000000 * (tp + tn)) // (tp + fp + fn + tn) AS BIGINT)
               AS accuracy_ppm,
           CASE WHEN tp + fp > 0
                THEN CAST((1000000 * tp) // (tp + fp) AS BIGINT) END
               AS precision_ppm,
           CASE WHEN tp + fn > 0
                THEN CAST((1000000 * tp) // (tp + fn) AS BIGINT) END
               AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST((1000000 * 2 * tp) // (2 * tp + fp + fn) AS BIGINT)
           END AS f1_ppm,
           CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0 AND (tn + fp) > 0
                 AND (tn + fn) > 0 THEN
                CAST(tp * tn - fp * fn AS DOUBLE)
                / (sqrt(CAST(tp + fp AS DOUBLE))
                   * sqrt(CAST(tp + fn AS DOUBLE))
                   * sqrt(CAST(tn + fp AS DOUBLE))
                   * sqrt(CAST(tn + fn AS DOUBLE))) END AS mcc
    FROM c
"""

PR_SWEEP_ORACLE = f"""
    WITH s AS ({_SCORED_SQL}),
    t AS (SELECT * FROM (VALUES (16384), (32768), (49152)) v(thr)),
    c AS (
        SELECT s.g AS group_key, CAST(t.thr AS BIGINT) AS threshold,
               CAST(SUM(CASE WHEN score >= thr AND label = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN score >= thr AND label = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN score < thr AND label = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM s CROSS JOIN t GROUP BY s.g, t.thr
    )
    SELECT group_key, threshold, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST((1000000 * tp) // (tp + fp) AS BIGINT) END
               AS precision_ppm,
           CASE WHEN tp + fn > 0
                THEN CAST((1000000 * tp) // (tp + fn) AS BIGINT) END
               AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST((1000000 * 2 * tp) // (2 * tp + fp + fn) AS BIGINT)
           END AS f1_ppm
    FROM c
"""

CALIBRATION_ORACLE = f"""
    WITH s AS ({_SCORED_SQL}),
    b AS (
        SELECT g AS group_key,
               (1000000 * score) // 65536 AS sp, label AS y
        FROM s
    ),
    binned AS (
        SELECT group_key,
               least((sp * 10) // 1000000, 9) AS bin, sp, y
        FROM b
    ),
    agg AS (
        SELECT group_key, CAST(bin AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(sp) AS BIGINT) AS score_sum
        FROM binned GROUP BY group_key, bin
    )
    SELECT group_key, bin, n, n_pos,
           CAST(score_sum // n AS BIGINT) AS mean_score_ppm,
           CAST((1000000 * n_pos) // n AS BIGINT) AS pos_rate_ppm,
           CAST((1000000 * n_pos) // n - score_sum // n AS BIGINT) AS gap_ppm
    FROM agg
"""

# two samples per nation: odd/even custkey account balances (cents)
_TWO_SAMPLE_SQL = """
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(c_custkey % 2 AS BIGINT) AS is_a,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
"""

CLIFFS_ORACLE = f"""
    WITH s AS ({_TWO_SAMPLE_SQL}),
    by_val AS (
        SELECT g, v,
               CAST(SUM(is_a) AS BIGINT) AS ca,
               CAST(SUM(1 - is_a) AS BIGINT) AS cb
        FROM s GROUP BY g, v
    ),
    ranked AS (
        SELECT g, ca, cb,
               SUM(ca + cb) OVER (PARTITION BY g ORDER BY v
                                  ROWS UNBOUNDED PRECEDING)
                   - ca - cb AS cum_prev
        FROM by_val
    ),
    agg AS (
        SELECT g AS group_key,
               CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(cb) AS BIGINT) AS n_b,
               CAST(SUM(ca * (2 * cum_prev + ca + cb + 1)) AS BIGINT) AS r1_x2
        FROM ranked GROUP BY g
    )
    SELECT group_key, n_a, n_b,
           CAST(r1_x2 - n_a * (n_a + 1) - n_a * n_b AS BIGINT) AS delta_num,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
                CAST((1000000 * (r1_x2 - n_a * (n_a + 1) - n_a * n_b))
                     // (n_a * n_b) AS BIGINT) END AS delta_ppm
    FROM agg
"""

_SS1 = (
    "(CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n1 AS DOUBLE)"
)
_SS2 = (
    "(CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / CAST(n2 AS DOUBLE)"
)
_MDIFF = (
    "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
)

COHENS_D_ORACLE = f"""
    WITH s AS ({_TWO_SAMPLE_SQL}),
    m AS (
        SELECT g AS group_key,
               CAST(SUM(is_a) AS BIGINT) AS n1,
               CAST(SUM(1 - is_a) AS BIGINT) AS n2,
               CAST(SUM(is_a * v) AS BIGINT) AS s1,
               CAST(SUM((1 - is_a) * v) AS BIGINT) AS s2,
               SUM(is_a * v * v) AS q1,
               SUM((1 - is_a) * v * v) AS q2
        FROM s GROUP BY g
    )
    SELECT group_key, n1, n2, s1, s2,
           CASE WHEN n1 >= 2 AND n2 >= 2 THEN
                {_MDIFF} / sqrt(({_SS1} + {_SS2})
                                / CAST(n1 + n2 - 2 AS DOUBLE)) END
               AS cohens_d,
           CASE WHEN n1 >= 2 AND n2 >= 2 THEN
                {_MDIFF} / sqrt({_SS1} / CAST(n1 * (n1 - 1) AS DOUBLE)
                                + {_SS2} / CAST(n2 * (n2 - 1) AS DOUBLE)) END
               AS t_welch
    FROM m
"""

# paired raters from the kappa synthesis (a0, flip from md5 bytes)
_RATERS_SQL = """
        SELECT source AS g,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                             ::BIGINT % 3 = 0 THEN 1 ELSE 0 END AS a,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))
                             ::BIGINT % 3 = 0 THEN 1 ELSE 0 END AS b
        FROM read_parquet('{sf}/documents.parquet')
"""

MCNEMAR_ORACLE = f"""
    WITH r AS ({_RATERS_SQL}),
    c AS (
        SELECT g AS group_key,
               CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_both,
               CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_neither,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_only_a,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_only_b
        FROM r GROUP BY g
    )
    SELECT group_key, n_both, n_neither, n_only_a, n_only_b,
           CASE WHEN n_only_a + n_only_b > 0 THEN
                CAST((1000000 * (n_only_a - n_only_b)
                      * (n_only_a - n_only_b))
                     // (n_only_a + n_only_b) AS BIGINT) END AS chi2_scaled
    FROM c
"""


def _scored(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "documents", SF).select(
        F.col("source").alias("g"),
        F.col("doc_id"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("score"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 5, 4),"
            " 16, 10) AS BIGINT)"
            " < CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT) THEN 1 ELSE 0 END"
        ).alias("label"),
    )


def _two_sample(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        (F.col("c_custkey") % 2).cast("bigint").alias("is_a"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_confusion_mcc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import confusion_mcc

    s = _scored(spark).select(
        "g", "label", F.expr("CASE WHEN score >= 32768 THEN 1 ELSE 0 END").alias("pred")
    )
    got = confusion_mcc(s, "g", "label", "pred").toPandas()
    con = duckdb.connect()
    exp = con.sql(CONFUSION_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    assert [v.hex() for v in got["mcc"]] == [v.hex() for v in exp["mcc"]]
    assert got["tp"].sum() > 0 and got["fn"].sum() > 0


def test_confusion_mcc_hand_values(spark):
    """tp=4 fp=1 fn=1 tn=4: acc 0.8, P = R = F1 = 0.8,
    MCC = (16-1)/sqrt(5*5*5*5) = 0.6 — compared against the SAME
    four-sqrt left-associative product the operator (and oracle)
    spell, which rounds to 24.999999999999996, not 25."""
    import math

    from kafka_streams_aggregate_spark.operators.ml_eval import confusion_mcc

    rows = (
        [("g", 1, 1)] * 4 + [("g", 0, 1)] + [("g", 1, 0)] + [("g", 0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "g string, y long, p long")
    [r] = confusion_mcc(df, "g", "y", "p").collect()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (4, 1, 1, 4)
    assert r["accuracy_ppm"] == 800_000
    assert r["precision_ppm"] == r["recall_ppm"] == r["f1_ppm"] == 800_000
    s5 = math.sqrt(5.0)
    assert r["mcc"] == 15.0 / (s5 * s5 * s5 * s5)
    assert abs(r["mcc"] - 0.6) < 1e-15


def test_pr_sweep_parity(spark):
    from kafka_streams_aggregate_spark.operators.ml_eval import (
        pr_threshold_sweep,
    )

    got = pr_threshold_sweep(
        _scored(spark), "g", "score", "label", [16384, 32768, 49152]
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(PR_SWEEP_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key", "threshold"])
    # recall decreases (weakly) as the threshold rises
    for _, grp in got.groupby("group_key"):
        rs = list(grp.sort_values("threshold")["recall_ppm"])
        assert rs == sorted(rs, reverse=True)


def test_calibration_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import (
        calibration_bins,
    )

    s = _scored(spark).select(
        "g",
        F.expr("CAST((1000000 * score) div 65536 AS BIGINT)").alias("sp"),
        "label",
    )
    got = calibration_bins(s, "g", "sp", "label", n_bins=10).toPandas()
    con = duckdb.connect()
    exp = con.sql(CALIBRATION_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key", "bin"])
    # the synthesis is calibrated by construction: pooled top-bin rate
    # beats pooled bottom-bin rate
    lo = got[got["bin"] == 0]
    hi = got[got["bin"] == 9]
    assert (
        hi["n_pos"].sum() * lo["n"].sum()
        > lo["n_pos"].sum() * hi["n"].sum()
    )


def test_calibration_hand_bins(spark):
    """score 999999 -> bin 9 (least() cap); 100000 -> bin 1;
    gap = pos_rate - mean_score, signed."""
    from kafka_streams_aggregate_spark.operators.ml_eval import (
        calibration_bins,
    )

    df = spark.createDataFrame(
        [("g", 999_999, 1), ("g", 100_000, 1)], "g string, sp long, y long"
    )
    rows = {r["bin"]: r for r in calibration_bins(df, "g", "sp", "y").collect()}
    assert set(rows) == {1, 9}
    assert rows[1]["pos_rate_ppm"] == 1_000_000
    assert rows[1]["gap_ppm"] == 1_000_000 - 100_000


def test_cliffs_delta_parity(spark):
    from kafka_streams_aggregate_spark.operators.ml_eval import cliffs_delta

    got = cliffs_delta(_two_sample(spark), "g", "is_a", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(CLIFFS_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_cliffs_delta_hand_values(spark):
    """a = {3, 4}, b = {1, 2}: every a beats every b -> delta = 1.
    a = {1, 2}, b = {1, 2}: ties split -> delta = 0."""
    from kafka_streams_aggregate_spark.operators.ml_eval import cliffs_delta

    dom = spark.createDataFrame(
        [("g", 1, 3), ("g", 1, 4), ("g", 0, 1), ("g", 0, 2)],
        "g string, is_a long, v long",
    )
    [r] = cliffs_delta(dom, "g", "is_a", "v").collect()
    assert (r["delta_num"], r["delta_ppm"]) == (4, 1_000_000)

    tie = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 2), ("g", 0, 1), ("g", 0, 2)],
        "g string, is_a long, v long",
    )
    [r] = cliffs_delta(tie, "g", "is_a", "v").collect()
    assert (r["delta_num"], r["delta_ppm"]) == (0, 0)


def test_cohens_d_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.ml_eval import cohens_d

    got = cohens_d(_two_sample(spark), "g", "is_a", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(COHENS_D_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    for col in ("cohens_d", "t_welch"):
        assert [v.hex() for v in got[col]] == [v.hex() for v in exp[col]], col


def test_cohens_d_hand_values(spark):
    """a = {0, 2} (mean 1, ss 2), b = {4, 6} (mean 5, ss 2):
    pooled var = 4/2 = 2 -> d = -4/sqrt(2); welch denom =
    sqrt(2/2 + 2/2) = sqrt(2) -> same value here."""
    import math

    from kafka_streams_aggregate_spark.operators.ml_eval import cohens_d

    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 1, 2), ("g", 0, 4), ("g", 0, 6)],
        "g string, is_a long, v long",
    )
    [r] = cohens_d(df, "g", "is_a", "v").collect()
    assert r["cohens_d"] == -4.0 / math.sqrt(2.0)
    assert r["t_welch"] == -4.0 / math.sqrt(2.0)


def test_mcnemar_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import mcnemar
    from kafka_streams_aggregate_spark.sources.tables import load_table

    r = load_table(spark, "documents", SF).select(
        F.col("source").alias("g"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2),"
            " 16, 10) AS BIGINT) % 3 = 0 THEN 1 ELSE 0 END"
        ).alias("a"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 3, 2),"
            " 16, 10) AS BIGINT) % 3 = 0 THEN 1 ELSE 0 END"
        ).alias("b"),
    )
    got = mcnemar(r, "g", "a", "b").toPandas()
    con = duckdb.connect()
    exp = con.sql(MCNEMAR_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_mcnemar_hand_values(spark):
    """b-discordant 3, c-discordant 1: chi2 = 4/4 = 1 -> 1e6 scaled;
    all-concordant group -> NULL."""
    from kafka_streams_aggregate_spark.operators.ml_eval import mcnemar

    rows = (
        [("g", 1, 0)] * 3 + [("g", 0, 1)] + [("g", 1, 1)] * 2
        + [("h", 1, 1), ("h", 0, 0)]
    )
    df = spark.createDataFrame(rows, "g string, a long, b long")
    out = {r["group_key"]: r for r in mcnemar(df, "g", "a", "b").collect()}
    assert out["g"]["chi2_scaled"] == 1_000_000
    assert out["g"]["n_only_a"] == 3 and out["g"]["n_only_b"] == 1
    assert out["h"]["chi2_scaled"] is None
