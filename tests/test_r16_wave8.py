"""Round-16 wave 8 — vocabulary-overlap matrix and token burstiness
(operators/text.py). Oracle texts single-sourced from
queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    BURSTINESS_ORACLE,
    VOCAB_OVERLAP_ORACLE,
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
        con.execute(
            "CREATE VIEW documents AS SELECT *"
            f" FROM read_parquet('{SF}/documents.parquet')"
        )
        return con.sql(sql).df()
    finally:
        con.close()


def test_vocab_overlap_hand(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        vocab_overlap_matrix,
    )

    rows = [
        (1, "sA", "a b c"),
        (2, "sA", "c d"),        # vocab A = {a,b,c,d}
        (3, "sB", "c d e"),      # vocab B = {c,d,e}
        (4, "sC", "x y"),        # disjoint from both
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["source_a"], r["source_b"]): r
           for r in vocab_overlap_matrix(df).collect()}
    r = out[("sA", "sB")]
    # intersection {c,d} = 2, union 5 -> 400000 ppm
    assert (r["n_a"], r["n_b"], r["n_common"]) == (4, 3, 2)
    assert r["jaccard_ppm"] == 400_000
    # disjoint pairs produce NO row (intersection-driven join) — the
    # absence IS the signal, like cross_source_dup_matrix
    assert ("sA", "sC") not in out and ("sB", "sC") not in out


def test_vocab_overlap_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        vocab_overlap_matrix,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    got = vocab_overlap_matrix(load_table(spark, "documents", SF)).toPandas()
    _cmp(got, _duck(VOCAB_OVERLAP_ORACLE), ["source_a", "source_b"])
    assert len(got) == 190  # all 20*19/2 pairs share vocabulary here


def test_burstiness_hand(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        token_burstiness,
    )

    rows = [
        (1, "s", "w w w x"),   # w: cf 3 in doc1
        (2, "s", "w x"),       # w: cf 4 df 2 -> 2000; x: cf 2 df 2 -> 1000
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    [r] = token_burstiness(df).collect()
    assert (r["n_types"], r["n_tokens"]) == (2, 6)
    assert r["n_bursty_types"] == 1      # only w has cf > df
    assert r["avg_burst_milli"] == 1500  # (2000 + 1000) div 2


def test_burstiness_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        token_burstiness,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    got = token_burstiness(load_table(spark, "documents", SF)).toPandas()
    _cmp(got, _duck(BURSTINESS_ORACLE), ["source"])
