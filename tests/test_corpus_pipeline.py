"""Round-13 capstone — end-to-end corpus-prep pipeline
(operators/llm_prep.py:corpus_prep_pipeline): split -> quality ->
exact dedup -> LSH near-dedup -> decontamination -> Hamilton mixture
-> packing stats, one membership-digest funnel row per stage.
Oracle text shared with the registration
(queries/round13.py:_corpus_pipeline_oracle).
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_corpus_pipeline_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        corpus_prep_pipeline,
    )
    from kafka_streams_aggregate_spark.queries.round13 import (
        _corpus_pipeline_oracle,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = corpus_prep_pipeline(docs).toPandas()
    con = duckdb.connect()
    exp = con.sql(
        _corpus_pipeline_oracle(
            table_ref=f"read_parquet('{SF}/documents.parquet')"
        )
    ).df()
    con.close()
    got, exp = _cmp(got, exp, ["stage"])
    # the funnel is monotone over stages 1..6 and every planted
    # hazard class fires somewhere: quality, near-dedup, decontam
    n = dict(zip(got["stage"], got["n_docs"]))
    assert n[0] > n[1]              # eval split carved out
    assert n[1] > n[2]              # quality gate drops short docs
    assert n[3] > n[4]              # near-dedup drops train twins
    assert n[4] > n[5]              # decontam drops leaked train docs
    assert n[6] <= n[5] and n[6] > 0
    assert n[7] == n[6]             # packing preserves membership
    d = dict(zip(got["stage"], got["digest31"]))
    assert d[7] == d[6]
    assert got[got["stage"] == 7]["n_chunks"].iloc[0] > 0


def _split_of(doc_id: int) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 10
    return {8: "val", 9: "test"}.get(b, "train")


def test_corpus_pipeline_hand_corpus(spark):
    """Plant one hazard per stage and check each is dropped at the
    right stage and nowhere else: a short doc (quality), an exact
    twin (exact_dedup), a near-dup train pair (near_dedup), and a
    train doc identical to an eval doc (decontam)."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        corpus_prep_pipeline,
    )

    long_a = " ".join(f"alpha{i} beta{i}" for i in range(10))  # 20 toks
    long_b = " ".join(f"alpha{i} beta{i}" for i in range(9)) + " gammaX omega"
    leak_text = " ".join(f"leak{i} word{i}" for i in range(10))
    other = " ".join(f"solo{i} token{i}" for i in range(10))

    ids = list(range(400))
    train_ids = [i for i in ids if _split_of(i) == "train"]
    eval_ids = [i for i in ids if _split_of(i) != "train"]
    t = train_ids
    rows = [
        ("src1", t[0], "too short"),              # quality drop
        ("src1", t[1], long_a),                   # exact-twin keeper (min id)
        ("src1", t[2], long_a),                   # exact dup -> dropped
        ("src1", t[3], long_b),                   # near-dup of long_a -> dropped
        ("src1", t[4], leak_text),                # identical to eval -> decontam
        ("src1", t[5], other),                    # clean survivor
        ("src2", eval_ids[0], leak_text),         # the eval twin (fixed)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        r["stage_name"]: r
        for r in corpus_prep_pipeline(df, total_n=10).collect()
    }
    assert got["raw"]["n_docs"] == 7
    assert got["train_split"]["n_docs"] == 6
    assert got["quality"]["n_docs"] == 5          # 'too short' gone
    assert got["exact_dedup"]["n_docs"] == 4      # t[2] gone, t[1] kept
    assert got["near_dedup"]["n_docs"] == 3       # max(t1,t3) gone
    assert got["decontam"]["n_docs"] == 2         # t[4] gone
    assert got["sampled"]["n_docs"] == 2          # budget 10 > pool
    assert got["packed"]["n_docs"] == 2
    assert got["packed"]["digest31"] == got["sampled"]["digest31"]
    # 2 survivors x 20 tokens in one src1 stream, budget 256 -> 1 chunk
    assert got["packed"]["n_tokens"] == 40
    assert got["packed"]["n_chunks"] == 1
    assert got["packed"]["n_split_docs"] == 0


def test_corpus_pipeline_eval_is_fixed(spark):
    """Near-dedup never deletes eval rows: two identical EVAL docs
    both survive (the funnel counts only train; the eval pool is
    raw - train at every stage by construction)."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        corpus_prep_pipeline,
    )

    text = " ".join(f"evaltwin{i} tok{i}" for i in range(10))
    ids = list(range(400))
    eval_ids = [i for i in ids if _split_of(i) != "train"]
    train_ids = [i for i in ids if _split_of(i) == "train"]
    rows = [
        ("src1", eval_ids[0], text),
        ("src1", eval_ids[1], text),
        ("src1", train_ids[0], " ".join(f"clean{i} tok{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        r["stage_name"]: r
        for r in corpus_prep_pipeline(df, total_n=5).collect()
    }
    assert got["raw"]["n_docs"] == 3
    assert got["train_split"]["n_docs"] == 1
    # the clean train doc shares nothing with the eval twins: it
    # survives decontam; the eval twins were never candidates to drop
    assert got["decontam"]["n_docs"] == 1
