"""Round-15 wave 4 — the eval-set preparation capstone
(operators/llm_prep.py:eval_prep_pipeline). Oracle single-sourced from
queries/round15.py (_eval_prep_oracle).
"""

from __future__ import annotations

import duckdb
import hashlib
import pandas as pd

SF = "/root/testdata/sf0.001"


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


def test_eval_prep_parity(spark):
    from kafka_streams_aggregate_spark.queries.round15 import (
        _eval_prep_oracle,
    )
    from kafka_streams_aggregate_spark.registry import load_all

    got = load_all()["q_eval_prep_pipeline"].spark(spark, SF).toPandas()
    exp = _duck(_eval_prep_oracle())
    got = got.sort_values("stage").reset_index(drop=True)
    exp = exp.sort_values("stage").reset_index(drop=True)
    assert len(got) == len(exp) == 4
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # the funnel must be monotone non-increasing in docs
    assert list(got["n_docs"]) == sorted(got["n_docs"], reverse=True)
    assert got["n_docs"].iloc[0] > 0


def test_eval_prep_hand(spark):
    """Planted corpus: one train doc, one eval twin of it (leaked ->
    dropped at decontam), one fresh eval doc (survives to the
    stratified sample). Split residues computed with hashlib so the
    pin controls who is train/eval."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        eval_prep_pipeline,
    )

    def res(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 10

    train_id = next(i for i in range(1, 200) if res(i) <= 7)
    eval_ids = [i for i in range(1, 400) if res(i) >= 8][:2]
    leak_id, fresh_id = eval_ids
    long_text = " ".join(f"w{j}" for j in range(20))
    fresh_text = " ".join(f"q{j}" for j in range(20))
    rows = [
        (train_id, "s", long_text),
        (leak_id, "s", long_text),   # identical to train -> 100% hit
        (fresh_id, "s", fresh_text),  # disjoint shingles -> 0% hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["stage_name"]: r for r in eval_prep_pipeline(df).collect()}
    assert out["eval_pool"]["n_docs"] == 2
    assert out["quality"]["n_docs"] == 2
    assert out["decontam"]["n_docs"] == 1
    assert out["stratified"]["n_docs"] == 1
    dg = int(
        hashlib.md5(f"dg|{fresh_id}".encode()).hexdigest()[:8], 16
    ) % (1 << 31)
    assert out["stratified"]["digest31"] == dg
    assert out["stratified"]["n_strata"] == 1


def test_dup_weighted_mixture_parity(spark):
    from kafka_streams_aggregate_spark.queries.round15 import (
        DUPWEIGHT_ORACLE,
    )
    from kafka_streams_aggregate_spark.registry import load_all

    got = load_all()["q_dup_weighted_mixture"].spark(spark, SF).toPandas()
    exp = _duck(DUPWEIGHT_ORACLE)
    got = got.sort_values("source").reset_index(drop=True)
    exp = exp.sort_values("source").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_dup_weighted_mixture_hand(spark):
    """Two sources, equal raw tokens; s1 is one doc repeated (same
    lede) 4x, s2 is 4 distinct docs -> s1's effective mass is 1/4 of
    s2's and the budget splits 20/80."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        dup_weighted_mixture,
    )

    same = " ".join(f"w{j}" for j in range(10))
    rows = [(i, "s1", same) for i in range(4)] + [
        (10 + i, "s2", " ".join(f"u{i}x{j}" for j in range(10)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in dup_weighted_mixture(
        df, token_budget=100).collect()}
    assert out["s1"]["n_tokens"] == out["s2"]["n_tokens"] == 40
    # s1: 4 docs of cluster size 4 -> 4 * (1000*10 div 4) = 10000
    assert out["s1"]["eff_milli"] == 10_000
    assert out["s2"]["eff_milli"] == 40_000
    assert out["s1"]["alloc_tokens"] == 20
    assert out["s2"]["alloc_tokens"] == 80
