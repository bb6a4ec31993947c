"""Round-13 second batch — boilerplate spans, per-source unigram TVD
(operators/text.py), Hodges-Lehmann estimator, Jonckheere-Terpstra
trend test (operators/stats.py). Registration-ready oracle texts in
BOILER_ORACLE / TVD_SRC_ORACLE / HL_ORACLE / JT_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

BOILER_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM read_parquet('{sf}/documents.parquet')
    ),
    spans AS (
        SELECT doc_id,
               array_to_string(list_slice(t, i * 5 + 1, i * 5 + 5), ' ')
                   AS span
        FROM toks, LATERAL (SELECT unnest(range(0,
             CAST(ceil(len(t) / 5.0) AS INT))) AS i)
        WHERE len(t) > 0
    ),
    dfp AS (
        SELECT span, COUNT(DISTINCT doc_id) AS d FROM spans GROUP BY span
    ),
    boiler AS (SELECT span AS bspan FROM dfp WHERE d >= 3)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN bspan IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler_spans,
           CAST((1000000 * SUM(CASE WHEN bspan IS NOT NULL
                THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS boiler_ppm
    FROM spans LEFT JOIN boiler ON bspan = span
    GROUP BY doc_id
"""

TVD_SRC_ORACLE = """
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS token
        FROM read_parquet('{sf}/documents.parquet')
    ),
    cst AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_st
        FROM toks GROUP BY 1, 2
    ),
    ct AS (
        SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst
        GROUP BY token
    ),
    ns AS (
        SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst
        GROUP BY source
    ),
    ntot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM ct),
    grid AS (
        SELECT ns.source, ns.n_s, ct.token, ct.c_t, ntot.n,
               COALESCE(cst.c_st, 0) AS c_st
        FROM ns CROSS JOIN ct CROSS JOIN ntot
        LEFT JOIN cst ON cst.source = ns.source AND cst.token = ct.token
    )
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens_source,
           CAST((1000000 * SUM(abs(CAST(c_st AS HUGEINT) * n
                - CAST(c_t AS HUGEINT) * n_s)))
                // (2 * CAST(MAX(n_s) AS HUGEINT) * MAX(n)) AS BIGINT)
               AS tvd_ppm
    FROM grid GROUP BY source
"""

HL_ORACLE = """
    WITH xy AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS x
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    cells AS (
        SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c FROM xy GROUP BY g, x
    ),
    walsh AS (
        SELECT a.g, CAST(a.x + b.x AS BIGINT) AS w2,
               CAST(SUM(CASE WHEN a.x = b.x THEN a.c * (a.c + 1) // 2
                    ELSE a.c * b.c END) AS BIGINT) AS wt
        FROM cells a JOIN cells b ON b.g = a.g AND a.x <= b.x
        GROUP BY a.g, a.x + b.x
    ),
    staged AS (
        SELECT g, w2,
               CAST(SUM(wt) OVER (PARTITION BY g ORDER BY w2
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(wt) OVER (PARTITION BY g ORDER BY w2
                    ROWS UNBOUNDED PRECEDING) - wt AS BIGINT) AS cum_prev,
               CAST(SUM(wt) OVER (PARTITION BY g) AS BIGINT) AS np
        FROM walsh
    ),
    agg AS (
        SELECT g, CAST(MAX(np) AS BIGINT) AS n_pairs,
               CAST(CASE WHEN MAX(np) % 2 = 1 THEN
                    2 * MAX(CASE WHEN cum_prev * 2 < np + 1
                            AND np + 1 <= cum * 2 THEN w2 END)
                    ELSE MAX(CASE WHEN cum_prev * 2 < np
                             AND np <= cum * 2 THEN w2 END)
                       + MAX(CASE WHEN cum_prev * 2 < np + 2
                             AND np + 2 <= cum * 2 THEN w2 END) END
                    AS BIGINT) AS hl4
        FROM staged GROUP BY g
    ),
    nr AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM xy GROUP BY g)
    SELECT nr.g AS group_key, n, n_pairs, hl4
    FROM nr JOIN agg ON agg.g = nr.g
"""

JT_ORACLE = """
    WITH base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(year(o.o_orderdate) AS BIGINT) AS o,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) // 5000000 AS x
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
    ),
    cells AS (
        SELECT g, o, x, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY g, o, x
    ),
    j AS (
        SELECT a.g,
               CAST(SUM(CASE WHEN a.x < b.x THEN 2 * a.c * b.c
                    WHEN a.x = b.x THEN a.c * b.c ELSE 0 END) AS BIGINT)
                   AS j2,
               CAST(SUM(a.c * b.c) AS BIGINT) AS ej2
        FROM cells a JOIN cells b ON b.g = a.g AND a.o < b.o
        GROUP BY a.g
    ),
    nr AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY g)
    SELECT nr.g AS group_key, n, j2, ej2,
           CASE WHEN ej2 > 0 THEN
                CAST((1000000 * j2) // ej2 AS BIGINT) END AS trend_ppm
    FROM nr JOIN j ON j.g = nr.g
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_boilerplate_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import boilerplate_spans
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = boilerplate_spans(docs, span_tokens=5, min_df=3).toPandas()
    con = duckdb.connect()
    exp = con.sql(BOILER_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["doc_id"])
    # the planted near-dups make some spans cross-doc boilerplate
    assert (got["n_boiler_spans"] > 0).any()
    assert (got["n_boiler_spans"] == 0).any()


def test_boilerplate_hand_corpus(spark):
    """A 10-token license blurb shared by 3 docs is boilerplate at
    min_df=3 (2 spans each); each doc's unique tail is not. A doc
    with 12 tokens has 3 spans (5+5+2 — the short last span counts)."""
    from kafka_streams_aggregate_spark.operators.text import boilerplate_spans

    blurb = "this text is licensed under the creative commons by law"
    rows = [
        (1, blurb + " alpha beta"),
        (2, blurb + " gamma delta"),
        (3, blurb + " epsilon zeta"),
        (4, "totally unrelated words live here now ok fine yes sure maybe no"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_spans(df, span_tokens=5, min_df=3).collect()
    }
    # 12 tokens -> spans: [0:5], [5:10], [10:12]; first two are blurb
    assert out[1]["n_spans"] == 3 and out[1]["n_boiler_spans"] == 2
    assert out[1]["boiler_ppm"] == (1_000_000 * 2) // 3
    assert out[4]["n_boiler_spans"] == 0 and out[4]["boiler_ppm"] == 0


def test_source_tvd_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import source_token_tvd
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = source_token_tvd(docs).toPandas()
    con = duckdb.connect()
    exp = con.sql(TVD_SRC_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["source"])
    assert (got["tvd_ppm"] > 0).all()  # finite samples never match exactly
    assert (got["tvd_ppm"] < 1_000_000).all()


def test_source_tvd_hand_values(spark):
    """Source A = corpus half 'a a b b', source B = 'a a b b': both
    match the pooled distribution exactly -> TVD 0. Skewed source
    C = 'a a a a' vs pooled (8a, 4b over 12): |4/4-8/12|/2 +
    |0-4/12|/2 = 1/3 -> 333333 ppm."""
    from kafka_streams_aggregate_spark.operators.text import source_token_tvd

    rows = [("A", "a a b b"), ("B", "a a b b")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in source_token_tvd(df).collect()}
    assert out["A"]["tvd_ppm"] == 0 and out["B"]["tvd_ppm"] == 0

    rows2 = [("A", "a a b b"), ("B", "a a b b"), ("C", "a a a a")]
    df2 = spark.createDataFrame(rows2, "source string, text string")
    out2 = {r["source"]: r for r in source_token_tvd(df2).collect()}
    assert out2["C"]["tvd_ppm"] == 333_333


def test_hodges_lehmann_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import hodges_lehmann
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    xy = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.col("c_custkey"),
        )
        .agg(F.count("o_orderkey").cast("bigint").alias("x"))
        .select("g", "x")
    )
    got = hodges_lehmann(xy, "g", "x").toPandas()
    con = duckdb.connect()
    exp = con.sql(HL_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["group_key"])
    assert (got["n_pairs"] == got["n"] * (got["n"] + 1) // 2).all()


def test_hodges_lehmann_hand_values(spark):
    """{1,2,9}: Walsh sums (doubled) = [2,3,4,10,11,18], N=6 even ->
    med2 = 4+10 = 14 -> HL = 14/4 = 3.5 (robust: the 9 pulls less
    than the mean 4.0 would). {5}: single value, N=1 -> hl4 = 20."""
    from kafka_streams_aggregate_spark.operators.stats import hodges_lehmann

    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 9), ("h", 5)], "g string, x long"
    )
    out = {r["group_key"]: r for r in hodges_lehmann(df, "g", "x").collect()}
    assert out["g"]["n_pairs"] == 6 and out["g"]["hl4"] == 14
    assert out["h"]["n_pairs"] == 1 and out["h"]["hl4"] == 20


def test_jonckheere_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        jonckheere_terpstra,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = orders.join(cust, cust.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("o"),
        F.expr(
            "CAST(floor(o_totalprice * 100) AS BIGINT) div 5000000"
        ).alias("x"),
    )
    got = jonckheere_terpstra(base, "g", "o", "x").toPandas()
    con = duckdb.connect()
    exp = con.sql(JT_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["group_key"])


def test_jonckheere_hand_values(spark):
    """Three ordered groups {1,2} < {3,4} < {5,6}: every cross-group
    pair is concordant -> j2 = 2 * (4+4+4) = 24 = 2*ej2 ->
    trend_ppm = 2e6 (perfectly increasing). Reversed values ->
    j2 = 0, trend 0. Identical values -> all ties, j2 = ej2 ->
    trend 1e6 (no trend)."""
    from kafka_streams_aggregate_spark.operators.stats import (
        jonckheere_terpstra,
    )

    inc = [("g", o, o * 2 + d) for o in (1, 2, 3) for d in (0, 1)]
    df = spark.createDataFrame(inc, "g string, o long, x long")
    [r] = jonckheere_terpstra(df, "g", "o", "x").collect()
    assert (r["j2"], r["ej2"], r["trend_ppm"]) == (24, 12, 2_000_000)

    dec = [("g", o, -o) for o in (1, 2, 3)]
    df2 = spark.createDataFrame(dec, "g string, o long, x long")
    [r] = jonckheere_terpstra(df2, "g", "o", "x").collect()
    assert r["j2"] == 0 and r["trend_ppm"] == 0

    flat = [("g", o, 7) for o in (1, 2, 3)]
    df3 = spark.createDataFrame(flat, "g string, o long, x long")
    [r] = jonckheere_terpstra(df3, "g", "o", "x").collect()
    assert r["j2"] == r["ej2"] and r["trend_ppm"] == 1_000_000
