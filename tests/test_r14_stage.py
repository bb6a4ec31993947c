"""Round-14 staging — Kruskal-Wallis H, Siegel repeated-median slope,
Mood's median test (operators/stats.py), packed-chunk mixing audit
(operators/llm_prep.py). Registration-ready oracle texts in
KW_ORACLE / SIEGEL_ORACLE / MOOD_ORACLE / CHUNK_MIX_ORACLE.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

KW_ORACLE = """
    WITH base AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g, c_mktsegment AS t,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet')
    ),
    cells AS (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY g, v
    ),
    ranked AS (
        SELECT g, v, c,
               CAST(2 * (SUM(c) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT) AS r2
        FROM cells
    ),
    per_tv AS (
        SELECT g, t, v, CAST(COUNT(*) AS BIGINT) AS c_tv
        FROM base GROUP BY g, t, v
    ),
    rj AS (
        SELECT p.g, p.t, CAST(SUM(c_tv * r2) AS BIGINT) AS r2_j,
               CAST(SUM(c_tv) AS BIGINT) AS n_j
        FROM per_tv p JOIN ranked r ON r.g = p.g AND r.v = p.v
        GROUP BY p.g, p.t
    ),
    terms AS (
        SELECT g, n_j,
               (CAST(3000000 AS HUGEINT) * r2_j * r2_j) // n_j AS t_fp
        FROM rj
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n, SUM(t_fp) AS s_fp
        FROM terms GROUP BY g
    ),
    ties AS (
        SELECT g, CAST(SUM(c * c * c - c) AS BIGINT) AS tie3
        FROM cells GROUP BY g
    ),
    h AS (
        SELECT a.g, n, k, tie3,
               CAST(s_fp // (CAST(n AS HUGEINT) * (n + 1))
                    - 3000000 * (n + 1) AS BIGINT) AS h_ppm
        FROM agg a JOIN ties ON ties.g = a.g
    )
    SELECT g AS group_key, n, k, h_ppm,
           CASE WHEN CAST(n AS HUGEINT) * n * n - n - tie3 > 0 THEN
                CAST((CAST(h_ppm AS HUGEINT)
                      * (CAST(n AS HUGEINT) * n * n - n))
                     // (CAST(n AS HUGEINT) * n * n - n - tie3) AS BIGINT)
           END AS h_tie_ppm
    FROM h
"""

SIEGEL_ORACLE = """
    WITH base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                    AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    sl AS (
        SELECT a.g, a.t AS ti, b.t AS tj,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
        FROM base a JOIN base b ON b.g = a.g AND b.t <> a.t
    ),
    med_i AS (
        SELECT g, ti, s AS med_i FROM (
            SELECT g, ti, s,
                   row_number() OVER (PARTITION BY g, ti
                       ORDER BY s, tj) AS rn,
                   COUNT(*) OVER (PARTITION BY g, ti) AS m
            FROM sl)
        WHERE rn = (m + 1) // 2
    ),
    pick AS (
        SELECT g, med_i AS siegel_slope FROM (
            SELECT g, med_i, ti,
                   row_number() OVER (PARTITION BY g
                       ORDER BY med_i, ti) AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS m
            FROM med_i)
        WHERE rn = (m + 1) // 2
    ),
    nr AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM base GROUP BY g
    )
    SELECT nr.g AS group_key, n_points, siegel_slope
    FROM nr JOIN pick ON pick.g = nr.g
"""

MOOD_ORACLE = """
    WITH base AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g, c_mktsegment AS t,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v,
               c_custkey AS id
        FROM read_parquet('{sf}/customer.parquet')
    ),
    staged AS (
        SELECT g, t, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM base
    ),
    med2 AS (
        SELECT g, CAST(CASE WHEN MAX(n) % 2 = 1
                 THEN 2 * MAX(CASE WHEN rn * 2 = n + 1 THEN v END)
                 ELSE MAX(CASE WHEN rn * 2 = n THEN v END)
                      + MAX(CASE WHEN rn * 2 = n + 2 THEN v END) END
                 AS BIGINT) AS med2
        FROM staged WHERE rn * 2 IN (n, n + 1, n + 2) GROUP BY g
    ),
    cls AS (
        SELECT b.g, t,
               CASE WHEN 2 * v > med2 THEN 1 ELSE 0 END AS ab,
               CASE WHEN 2 * v < med2 THEN 1 ELSE 0 END AS be
        FROM base b JOIN med2 ON med2.g = b.g
    ),
    per_t AS (
        SELECT g, t, CAST(SUM(ab) AS BIGINT) AS a_j,
               CAST(SUM(be) AS BIGINT) AS b_j
        FROM cls GROUP BY g, t
    ),
    tot AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(a_j) AS BIGINT) AS ca,
               CAST(SUM(b_j) AS BIGINT) AS cb
        FROM per_t GROUP BY g
    ),
    wide AS (
        SELECT p.g, a_j, b_j, a_j + b_j AS rowtot, ca, cb,
               ca + cb AS np
        FROM per_t p JOIN tot ON tot.g = p.g
    ),
    chi AS (
        SELECT g,
               SUM((CAST(1000000 AS HUGEINT)
                    * (a_j * np - rowtot * ca) * (a_j * np - rowtot * ca))
                   // (CAST(np AS HUGEINT) * rowtot * ca)
                 + (CAST(1000000 AS HUGEINT)
                    * (b_j * np - rowtot * cb) * (b_j * np - rowtot * cb))
                   // (CAST(np AS HUGEINT) * rowtot * cb)) AS _chi
        FROM wide WHERE ca > 0 AND cb > 0 AND rowtot > 0
        GROUP BY g
    )
    SELECT tot.g AS group_key, k, ca AS n_above, cb AS n_below,
           CASE WHEN ca > 0 AND cb > 0 THEN CAST(_chi AS BIGINT) END
               AS chi2_ppm
    FROM tot LEFT JOIN chi ON chi.g = tot.g
"""

CHUNK_MIX_ORACLE = """
    WITH toks AS (
        SELECT source, doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS BIGINT) AS n_tokens,
               CASE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                        ::BIGINT % 10
                    WHEN 8 THEN 'val' WHEN 9 THEN 'test'
                    ELSE 'train' END AS split
        FROM read_parquet('{sf}/documents.parquet')
    ),
    staged AS (
        SELECT source, doc_id, n_tokens, split,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS o
        FROM toks
    ),
    spans AS (
        SELECT source, doc_id, split,
               unnest(range(o // 256, (o + n_tokens - 1) // 256 + 1))
                   AS chunk
        FROM staged WHERE n_tokens > 0
    ),
    per_chunk AS (
        SELECT source, chunk,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits
        FROM spans GROUP BY 1, 2
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi_doc_chunks,
           CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mixed_split_chunks,
           CAST((1000000 * SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS mixed_ppm
    FROM per_chunk GROUP BY source
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_kruskal_wallis_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import kruskal_wallis
    from kafka_streams_aggregate_spark.sources.tables import load_table

    base = load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_mktsegment").alias("t"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )
    got = kruskal_wallis(base, "g", "t", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(KW_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_kruskal_wallis_hand_values(spark):
    """{t1: [1,2], t2: [3,4]}: R1 = 3, R2 = 7 -> H = 12/20 * 29 - 15
    = 2.4 -> 2_400_000 ppm (no ties -> tie-corrected identical).
    All-tied values -> H = 0 exactly and h_tie NULL (divisor 0)."""
    from kafka_streams_aggregate_spark.operators.stats import kruskal_wallis

    a = spark.createDataFrame(
        [("g", "t1", 1), ("g", "t1", 2), ("g", "t2", 3), ("g", "t2", 4)],
        "g string, t string, v long",
    )
    [r] = kruskal_wallis(a, "g", "t", "v").collect()
    assert (r["n"], r["k"]) == (4, 2)
    assert r["h_ppm"] == 2_400_000 and r["h_tie_ppm"] == 2_400_000

    b = spark.createDataFrame(
        [("g", "t1", 7), ("g", "t1", 7), ("g", "t2", 7), ("g", "t2", 7)],
        "g string, t string, v long",
    )
    [r] = kruskal_wallis(b, "g", "t", "v").collect()
    assert r["h_ppm"] == 0 and r["h_tie_ppm"] is None


def test_siegel_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import siegel_slope
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    monthly = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = siegel_slope(monthly, "g", "t", "v").toPandas()
    con = duckdb.connect()
    exp = con.sql(SIEGEL_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    gs = [v.hex() for v in got["siegel_slope"] if v == v]
    es = [v.hex() for v in exp["siegel_slope"] if v == v]
    assert gs == es and len(gs) > 0


def test_siegel_hand_outlier_immunity(spark):
    """Line v = 2t (t = 0..4) plus one wild outlier (10, 1000): every
    on-line point's slope median is exactly 2.0 (4 line slopes of 2
    vs 1 outlier slope; lower median rank 3 of 5), the outlier's own
    median is large, and the median of medians is 2.0 — the 50%
    breakdown in action (Theil-Sen's pair median would also survive
    ONE outlier; Siegel survives up to half)."""
    from kafka_streams_aggregate_spark.operators.stats import siegel_slope

    rows = [("g", t, 2 * t) for t in range(5)] + [("g", 10, 1000)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = siegel_slope(df, "g", "t", "v").collect()
    assert r["n_points"] == 6
    assert r["siegel_slope"] == 2.0


def test_mood_median_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import mood_median_test
    from kafka_streams_aggregate_spark.sources.tables import load_table

    base = load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_mktsegment").alias("t"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
        F.col("c_custkey").alias("id"),
    )
    got = mood_median_test(base, "g", "t", "v", "id").toPandas()
    con = duckdb.connect()
    exp = con.sql(MOOD_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_mood_median_hand_values(spark):
    """Perfect separation {t1: [1,2], t2: [9,10]}: med2 = 11, above =
    t2 both, below = t1 both -> chi2 = 4.0 for the 2x2 (each cell
    contributes (o*N - row*col)^2/(N*row*col) = 16/16 = 1) ->
    4_000_000 ppm."""
    from kafka_streams_aggregate_spark.operators.stats import mood_median_test

    rows = [("g", "t1", 1, 1), ("g", "t1", 2, 2),
            ("g", "t2", 9, 3), ("g", "t2", 10, 4)]
    df = spark.createDataFrame(rows, "g string, t string, v long, id long")
    [r] = mood_median_test(df, "g", "t", "v", "id").collect()
    assert (r["k"], r["n_above"], r["n_below"]) == (2, 2, 2)
    assert r["chi2_ppm"] == 4_000_000


def _split_of(doc_id: int) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 10
    return {8: "val", 9: "test"}.get(b, "train")


def test_chunk_mixing_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        chunk_mixing_audit,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = chunk_mixing_audit(docs, budget=256).toPandas()
    con = duckdb.connect()
    exp = con.sql(CHUNK_MIX_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["source"])
    # packing at 256 over 10-100-token docs mixes docs in most chunks
    assert (got["n_multi_doc_chunks"] > 0).any()


def test_chunk_mixing_hand_corpus(spark):
    """Budget 10: a train doc (8 tokens, offsets 0-7) and a val doc
    (8 tokens, offsets 8-15) share chunk 0 -> 1 mixed chunk of 2;
    chunk 1 holds only the val doc's tail."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        chunk_mixing_audit,
    )

    ids = list(range(400))
    train = next(i for i in ids if _split_of(i) == "train")
    val = next(i for i in ids if _split_of(i) == "val" and i > train)
    text8 = "a b c d e f g h"
    rows = [("s", train, text8), ("s", val, text8)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    [r] = chunk_mixing_audit(df, budget=10).collect()
    assert r["n_chunks"] == 2
    assert r["n_multi_doc_chunks"] == 1
    assert r["n_mixed_split_chunks"] == 1
    assert r["mixed_ppm"] == 500_000
