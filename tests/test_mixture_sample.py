"""Round-13 staging — training-mixture sampler (operators/
llm_prep.py:mixture_sample): exact Hamilton apportionment of a doc
budget across weighted sources + md5-rank deterministic selection.
Registration-ready oracle text in MIXTURE_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
TOTAL_N = 1000  # > the 500-doc pool at sf0.001 -> shortfalls exercise

MIXTURE_ORACLE = f"""
    WITH pop AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pop,
               CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS BIGINT)
                   AS weight
        FROM read_parquet('{{sf}}/documents.parquet') GROUP BY source
    ),
    wt AS (SELECT CAST(SUM(weight) AS BIGINT) AS w FROM pop),
    staged AS (
        SELECT source, n_pop, weight,
               CAST(({TOTAL_N} * weight) // w AS BIGINT) AS base,
               CAST(({TOTAL_N} * weight) % w AS BIGINT) AS rem
        FROM pop CROSS JOIN wt
    ),
    alloc AS (
        SELECT source, n_pop, weight,
               CAST(base + CASE WHEN row_number() OVER
                        (ORDER BY rem DESC, source)
                        <= {TOTAL_N} - SUM(base) OVER ()
                    THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
        FROM staged
    ),
    ranked AS (
        SELECT source, doc_id AS id,
               row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM read_parquet('{{sf}}/documents.parquet')
    ),
    sampled AS (
        SELECT r.source, r.id
        FROM ranked r JOIN alloc a USING (source)
        WHERE r.rn <= a.n_alloc
    ),
    per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(id) AS BIGINT) AS id_sum,
               CAST(SUM(('0x' || substr(md5('dig#' || CAST(id AS VARCHAR)),
                    1, 7))::BIGINT) AS BIGINT) AS digest31
        FROM sampled GROUP BY source
    )
    SELECT a.source, n_pop, weight, n_alloc,
           CAST(COALESCE(n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(n_alloc - COALESCE(n_sampled, 0) AS BIGINT) AS shortfall,
           CAST(COALESCE(id_sum, 0) AS BIGINT) AS id_sum,
           CAST(COALESCE(digest31, 0) AS BIGINT) AS digest31
    FROM alloc a LEFT JOIN per_src p ON p.source = a.source
"""


def _weights(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return (
        load_table(spark, "documents", SF)
        .select("source")
        .distinct()
        .select(
            "source",
            F.expr(
                "CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS BIGINT)"
            ).alias("weight"),
        )
    )


def test_mixture_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        mixture_sample,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        mixture_sample(docs, _weights(spark), total_n=TOTAL_N)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(MIXTURE_ORACLE.format(sf=SF))
        .df()
        .sort_values("source")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # Hamilton allocation sums to exactly the budget; the 500-doc pool
    # cannot fill 1000 -> shortfalls self-report
    assert got["n_alloc"].sum() == TOTAL_N
    assert got["shortfall"].sum() == TOTAL_N - got["n_sampled"].sum()
    assert (got["shortfall"] > 0).any()


def test_mixture_hand_allocation(spark):
    """Weights A:2 B:1 C:2 over n=6 (W=5): bases 2/1/2, remainders
    2/1/2, one leftover seat -> tie on remainder 2 broken by source
    name -> A gets it: alloc 3/1/2. C has only 1 doc -> shortfall 1;
    selection is the md5 rank order (deterministic)."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        mixture_sample,
    )

    docs_rows = (
        [("A", i) for i in range(1, 6)]
        + [("B", i) for i in range(10, 15)]
        + [("C", 20)]
    )
    docs = spark.createDataFrame(docs_rows, "source string, doc_id long")
    weights = spark.createDataFrame(
        [("A", 2), ("B", 1), ("C", 2)], "source string, weight long"
    )
    out = {
        r["source"]: r
        for r in mixture_sample(docs, weights, total_n=6).collect()
    }
    assert (out["A"]["n_alloc"], out["B"]["n_alloc"], out["C"]["n_alloc"]) == (
        3, 1, 2,
    )
    assert out["C"]["n_sampled"] == 1 and out["C"]["shortfall"] == 1
    assert out["A"]["n_sampled"] == 3 and out["A"]["shortfall"] == 0
    total_alloc = sum(r["n_alloc"] for r in out.values())
    assert total_alloc == 6


def test_mixture_determinism(spark):
    """Identical inputs -> identical sample checksums on a re-run."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        mixture_sample,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    a = (
        mixture_sample(docs, _weights(spark), total_n=200)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    b = (
        mixture_sample(docs, _weights(spark), total_n=200)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
