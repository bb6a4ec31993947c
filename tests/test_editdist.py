"""Edit-distance verification of shingle candidates — pre-validation
for the round-11 registration queue
(operators/dedup.py:edit_distance_verify).

Both engines ship a NATIVE exact Levenshtein (Spark codegen builtin,
DuckDB levenshtein()), so the oracle reuses the registered
q_dedup_ngram_jaccard candidate SQL and adds the metric — no
reimplementation on either side. Registration-ready oracle text in
EDITDIST_ORACLE (swap read_parquet for the `documents` view).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_SHINGLES_3 = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1)"
    " + 1), i -> array_to_string(list_slice(string_split(text, ' '), "
    "CAST(i AS INT), CAST(i + 2 AS INT)), ' '))"
)

EDITDIST_ORACLE = f"""
    WITH raw_idx AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id, unnest({_SHINGLES_3}) AS shingle
              FROM read_parquet('{{sf}}/documents.parquet'))
    ),
    idx AS (
        SELECT doc_id, shingle FROM raw_idx
        WHERE shingle IN (
            SELECT shingle FROM raw_idx GROUP BY shingle
            HAVING COUNT(*) <= 50
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM idx a JOIN idx b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    cands AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE)
              >= 0.02
    ),
    docs AS (
        SELECT doc_id, text
        FROM read_parquet('{{sf}}/documents.parquet')
    ),
    m AS (
        SELECT cands.id_a, cands.id_b,
               CAST(strlen(ta.text) AS BIGINT) AS len_a,
               CAST(strlen(tb.text) AS BIGINT) AS len_b,
               CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist
        FROM cands
        JOIN docs ta ON ta.doc_id = cands.id_a
        JOIN docs tb ON tb.doc_id = cands.id_b
    )
    SELECT id_a, id_b, len_a, len_b, edit_dist,
           (1000 * (greatest(len_a, len_b) - edit_dist))
               // greatest(len_a, len_b) AS sim_permille
    FROM m
"""


def test_editdist_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        edit_distance_verify,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        edit_distance_verify(docs, "doc_id", "text")
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(EDITDIST_ORACLE.format(sf=SF))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_editdist_hand_values(spark):
    """kitten->sitting = 3 (the canonical example); identical texts
    = 0 with sim 1000; candidates require a shared rare shingle."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        edit_distance_verify,
    )

    rows = [
        (1, "the quick brown fox jumps kitten"),
        (2, "the quick brown fox jumps sitting"),
        (3, "the quick brown fox jumps kitten"),
        (4, "completely unrelated text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["sim_permille"])
        for r in edit_distance_verify(
            df, "doc_id", "text", jaccard_threshold=0.1, max_doc_freq=None
        ).collect()
    }
    assert got[(1, 3)] == (0, 1000)
    assert got[(1, 2)][0] == 3  # kitten -> sitting
    assert got[(2, 3)][0] == 3
    assert not any(4 in k for k in got)
