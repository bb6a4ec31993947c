"""Round-13 staging, batch 4 — trimmed mean (operators/stats.py) and
Benjamini-Hochberg FDR cutoff (operators/ml_eval.py).
Registration-ready oracle texts in TRIMMED_ORACLE / BH_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

TRIMMED_ORACLE = """
    WITH ranked AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM (SELECT CAST(c_nationkey AS BIGINT) AS g,
                     c_custkey AS id,
                     CAST(floor(c_acctbal * 100) AS BIGINT) AS v
              FROM read_parquet('{sf}/customer.parquet'))
    ),
    kk AS (SELECT *, (n * 10 + 99) // 100 AS k FROM ranked),
    agg AS (
        SELECT g AS group_key, CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN rn > k AND rn <= n - k
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN rn > k AND rn <= n - k
                    THEN v ELSE 0 END) AS BIGINT) AS sum_kept
        FROM kk GROUP BY g
    )
    SELECT group_key, n, n_kept, sum_kept,
           CASE WHEN n_kept > 0 THEN
                CAST((1000000 * sum_kept) // n_kept AS BIGINT) END
               AS trimmed_mean_scaled
    FROM agg
"""

# per-source p-value families: uniform md5 16-bit ppm with a planted
# signal block (doc_id % 7 = 0 -> p/100)
_PVALS_SQL = """
        SELECT source AS g, doc_id AS id,
               CASE WHEN doc_id % 7 = 0
                    THEN ((1000000 * ('0x' || substr(md5(CAST(doc_id
                         AS VARCHAR)), 1, 4))::BIGINT) // 65536) // 100
                    ELSE (1000000 * ('0x' || substr(md5(CAST(doc_id
                         AS VARCHAR)), 1, 4))::BIGINT) // 65536 END
                   AS p_ppm
        FROM read_parquet('{sf}/documents.parquet')
"""

BH_ORACLE = f"""
    WITH pv AS ({_PVALS_SQL}),
    ranked AS (
        SELECT g, p_ppm,
               row_number() OVER (PARTITION BY g ORDER BY p_ppm, id) AS rk
        FROM pv
    ),
    m_per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS m FROM ranked GROUP BY g),
    scored AS (
        SELECT r.g, r.p_ppm, CAST(r.rk AS BIGINT) AS rk, m,
               CASE WHEN r.p_ppm * m <= 50000 * r.rk THEN r.rk END AS ok_rk
        FROM ranked r JOIN m_per ON m_per.g = r.g
    ),
    agg AS (
        SELECT g AS group_key, CAST(MAX(m) AS BIGINT) AS m,
               CAST(COALESCE(MAX(ok_rk), 0) AS BIGINT) AS k_cut
        FROM scored GROUP BY g
    ),
    cut AS (
        SELECT s.g AS group_key, CAST(s.p_ppm AS BIGINT) AS p_cut_ppm
        FROM scored s JOIN agg ON agg.group_key = s.g AND s.rk = agg.k_cut
    )
    SELECT agg.group_key, m, k_cut, cut.p_cut_ppm,
           k_cut AS n_rejected
    FROM agg LEFT JOIN cut ON cut.group_key = agg.group_key
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_trimmed_mean_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import trimmed_mean
    from kafka_streams_aggregate_spark.sources.tables import load_table

    base = load_table(spark, "customer", SF).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_custkey").alias("id"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )
    got = trimmed_mean(base, "g", "id", "v", trim_pct=10).toPandas()
    con = duckdb.connect()
    exp = con.sql(TRIMMED_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_trimmed_mean_hand_values(spark):
    """{1..10} trim 10%: k = 1, keep ranks 2..9 (values 2..9),
    sum 44 over 8 -> 5.5 -> 5_500_000 scaled. An outlier at 1000
    instead of 10 changes NOTHING (it's trimmed) while the raw mean
    would jump. n <= 2k -> NULL."""
    from kafka_streams_aggregate_spark.operators.stats import trimmed_mean

    rows = [("g", i, i) for i in range(1, 10)] + [("g", 10, 1000)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    [r] = trimmed_mean(df, "g", "id", "v", trim_pct=10).collect()
    assert (r["n"], r["n_kept"], r["sum_kept"]) == (10, 8, 44)
    assert r["trimmed_mean_scaled"] == 5_500_000

    tiny = spark.createDataFrame([("h", 1, 5)], "g string, id long, v long")
    [r] = trimmed_mean(tiny, "g", "id", "v", trim_pct=50).collect()
    assert r["n_kept"] == 0 and r["trimmed_mean_scaled"] is None


def test_bh_fdr_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.ml_eval import bh_fdr_cutoff
    from kafka_streams_aggregate_spark.sources.tables import load_table

    pv = load_table(spark, "documents", SF).select(
        F.col("source").alias("g"),
        F.col("doc_id").alias("id"),
        F.expr(
            "CASE WHEN doc_id % 7 = 0 THEN"
            " ((1000000 * CAST(conv(substr(md5(CAST(doc_id AS STRING)),"
            " 1, 4), 16, 10) AS BIGINT)) div 65536) div 100"
            " ELSE (1000000 * CAST(conv(substr(md5(CAST(doc_id AS STRING)),"
            " 1, 4), 16, 10) AS BIGINT)) div 65536 END"
        ).alias("p_ppm"),
    )
    got = bh_fdr_cutoff(pv, "g", "id", "p_ppm", alpha_ppm=50_000).toPandas()
    con = duckdb.connect()
    exp = con.sql(BH_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    # the planted signal block must clear the cutoff somewhere
    assert (got["k_cut"] > 0).any()


def test_bh_fdr_hand_values(spark):
    """m=4, alpha=5%: p = (1000, 20000, 30000, 900000) ppm -> every
    prefix rank clears (p*4 <= 50000*rk) through rank 3 -> k=3.
    Step-up property: p = (10000, 49000, 50000): rank 2 FAILS its own
    test (147000 > 100000) but rank 3 passes (150000 <= 150000) ->
    BH rejects ALL THREE including the rank-2 straggler. All-large
    p's -> k_cut 0, NULL p_cut."""
    from kafka_streams_aggregate_spark.operators.ml_eval import bh_fdr_cutoff

    a = spark.createDataFrame(
        [("g", 1, 1000), ("g", 2, 20000), ("g", 3, 30000),
         ("g", 4, 900000)],
        "g string, id long, p_ppm long",
    )
    [r] = bh_fdr_cutoff(a, "g", "id", "p_ppm").collect()
    assert (r["k_cut"], r["p_cut_ppm"], r["n_rejected"]) == (3, 30000, 3)

    b = spark.createDataFrame(
        [("g", 1, 10000), ("g", 2, 49000), ("g", 3, 50000)],
        "g string, id long, p_ppm long",
    )
    [r] = bh_fdr_cutoff(b, "g", "id", "p_ppm").collect()
    assert (r["k_cut"], r["p_cut_ppm"], r["n_rejected"]) == (3, 50000, 3)

    c = spark.createDataFrame(
        [("g", 1, 700000), ("g", 2, 800000)], "g string, id long, p_ppm long"
    )
    [r] = bh_fdr_cutoff(c, "g", "id", "p_ppm").collect()
    assert r["k_cut"] == 0 and r["p_cut_ppm"] is None and r["n_rejected"] == 0
