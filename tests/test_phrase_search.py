"""Positional-index phrase search — pre-validation for the round-10
registration queue (operators/text.py:phrase_search).

Oracle note (registration-ready): DuckDB has no WITH ORDINALITY /
lateral range(), so positions come from the repo's bounded-constant-
range trick (CLAUDE.md): range(128) + WHERE i < len(l) — documents
bodies are <= 100 tokens at every SF (TESTDATA).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

PHRASE_ORACLE = """
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM read_parquet('{sf}/documents.parquet')
    ),
    toks AS (
        SELECT doc_id AS doc, i.range AS pos, l[i.range + 1] AS tok
        FROM d, range(128) i
        WHERE i.range < len(l)
    )
    SELECT t1.doc, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(t1.pos) AS BIGINT) AS first_pos
    FROM toks t1
    JOIN toks t2 ON t2.doc = t1.doc AND t2.pos = t1.pos + 1
                AND t2.tok = 'scan'
    WHERE t1.tok = 'table'
    GROUP BY t1.doc
"""


def test_phrase_search_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.text import phrase_search
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        phrase_search(docs, "doc_id", "text", "table scan")
        .toPandas()
        .sort_values("doc")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(PHRASE_ORACLE.format(sf=SF))
        .df()
        .sort_values("doc")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_phrase_search_three_words_and_overlaps(spark):
    from kafka_streams_aggregate_spark.operators.text import phrase_search

    rows = [
        (1, "a b c x a b c"),  # two non-overlapping hits of "a b c"
        (2, "a a a a"),  # overlapping hits of "a a": positions 0,1,2
        (3, "a b x c"),  # no hit
        (4, "c b a"),  # order matters: no hit
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    abc = {
        r["doc"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(df, "doc_id", "text", "a b c").collect()
    }
    assert abc == {1: (2, 0)}
    aa = {
        r["doc"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(df, "doc_id", "text", "a a").collect()
    }
    assert aa == {2: (3, 0)}


def test_phrase_search_pushdown_plan(spark):
    """The index scan must push the token predicate down — the plan
    reads posting lists, not the corpus (PushedFilters on tok would
    appear only post-explode, so assert the pre-explode filter exists
    and no CartesianProduct sneaks in)."""
    from kafka_streams_aggregate_spark.operators.text import phrase_search
    from kafka_streams_aggregate_spark.plans.inspect import formatted_plan
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    plan = formatted_plan(phrase_search(docs, "doc_id", "text", "table scan"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
