"""RAKE keyword extraction — pre-validation for the round-10
registration queue (operators/text.py:rake_keywords).

Oracle: bounded-constant-range positions (docs <= 100 tokens), the
pos - row_number islands formula for stopword-free runs, exact int64
(scale*deg) // freq word scores. Registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

RAKE_ORACLE = """
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM read_parquet('{sf}/documents.parquet')
    ),
    toks AS (
        SELECT doc_id AS doc, i.range AS pos, l[i.range + 1] AS tok
        FROM d, range(128) i
        WHERE i.range < len(l)
    ),
    nonstop AS (
        SELECT doc, pos, tok FROM toks WHERE tok NOT IN ('the', 'a')
    ),
    runs AS (
        SELECT doc, pos, tok,
               pos - row_number() OVER (
                   PARTITION BY doc ORDER BY pos) AS run
        FROM nonstop
    ),
    words AS (
        SELECT doc, run, pos, tok,
               CAST(COUNT(*) OVER (PARTITION BY doc, run) AS BIGINT)
                   AS plen
        FROM runs
    ),
    stats AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS deg
        FROM words GROUP BY tok
    ),
    scored AS (
        SELECT w.doc, w.run, w.pos, w.tok,
               (CAST(1000000000 AS BIGINT) * s.deg) // s.freq AS wscore
        FROM words w JOIN stats s ON s.tok = w.tok
    ),
    phrases AS (
        SELECT doc, run,
               string_agg(tok, ' ' ORDER BY pos) AS phrase,
               CAST(SUM(wscore) AS BIGINT) AS score_scaled
        FROM scored GROUP BY doc, run
    ),
    dedup AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MAX(score_scaled) AS BIGINT) AS score_scaled
        FROM phrases GROUP BY phrase
    )
    SELECT phrase, n_occurrences, score_scaled,
           CAST(row_number() OVER (
               ORDER BY score_scaled DESC, phrase ASC) AS BIGINT) AS rank
    FROM dedup QUALIFY rank <= 50
"""


def test_rake_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.text import rake_keywords
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        rake_keywords(docs, "doc_id", "text", ("the", "a"), topk=50)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(RAKE_ORACLE.format(sf=SF))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_rake_hand_example(spark):
    """Two docs, known degree/frequency arithmetic."""
    from kafka_streams_aggregate_spark.operators.text import rake_keywords

    rows = [
        (1, "fast join the fast join"),
        (2, "fast scan"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["phrase"]: (r["n_occurrences"], r["score_scaled"])
        for r in rake_keywords(df, "doc_id", "text", ("the",), topk=10)
        .collect()
    }
    # phrases: "fast join" x2 (doc 1), "fast scan" x1 (doc 2)
    # freq: fast=3, join=2, scan=1; deg: fast=2+2+2=6, join=4, scan=2
    s = 10**9
    fast = (s * 6) // 3  # 2e9
    join = (s * 4) // 2  # 2e9
    scan = (s * 2) // 1  # 2e9
    assert out["fast join"] == (2, fast + join)
    assert out["fast scan"] == (1, fast + scan)
