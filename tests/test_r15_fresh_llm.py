"""Round-15 fresh queue, LLM-data batch — near-dup-aware packing,
URL normalization dedup, quality-weighted mixture, cross-source dup
matrix, vocab coverage, held-out n-gram novelty (operators/llm_prep.py,
dedup.py, text.py). Oracle texts single-sourced from
kafka_streams_aggregate_spark/queries/round15.py.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round15 import (  # noqa: E402
    NGRAMNOV_ORACLE,
    QREWEIGHT_ORACLE,
    URLDEDUP_ORACLE,
    VOCABCOV_ORACLE,
    XSRCDUP_ORACLE,
    _canonical_packing_oracle,
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


def _docs(spark):
    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "documents", SF)


# ---------------------------------------------------------------- parity


def test_canonical_packing_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        dedup_aware_packing,
    )

    got = dedup_aware_packing(
        _docs(spark), budget=256, threshold=0.02, hash_family="md5"
    ).toPandas()
    _cmp(got, _duck(_canonical_packing_oracle()), ["source"])


def test_url_dedup_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.dedup import (
        url_normalize_dedup,
    )

    raw = _docs(spark).select(
        "source",
        F.expr(
            "concat("
            " CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END,"
            " '://',"
            " CASE WHEN doc_id % 2 = 0"
            "      THEN upper(concat(source, '.Example.com'))"
            "      ELSE concat(source, '.example.com') END,"
            " '/p/', CAST(doc_id % 50 AS STRING),"
            " CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,"
            " CASE WHEN doc_id % 4 = 0"
            "      THEN concat('?utm_source=feed&id=',"
            "                  CAST(doc_id % 10 AS STRING))"
            "      WHEN doc_id % 4 = 1"
            "      THEN concat('?id=', CAST(doc_id % 10 AS STRING))"
            "      WHEN doc_id % 4 = 2 THEN '?utm_campaign=x'"
            "      ELSE '' END,"
            " CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
        ).alias("url"),
    )
    got = url_normalize_dedup(raw, "url", "source").toPandas()
    _cmp(got, _duck(URLDEDUP_ORACLE), ["group_key"])


def test_quality_reweight_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        quality_mixture_reweight,
    )

    got = quality_mixture_reweight(
        _docs(spark), token_budget=100_000
    ).toPandas()
    _cmp(got, _duck(QREWEIGHT_ORACLE), ["source"])


def test_cross_source_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        cross_source_dup_matrix,
    )

    got = cross_source_dup_matrix(_docs(spark), lead_k=8).toPandas()
    _cmp(got, _duck(XSRCDUP_ORACLE), ["source_a", "source_b"])


def test_vocab_coverage_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import vocab_coverage

    got = vocab_coverage(_docs(spark)).toPandas()
    _cmp(got, _duck(VOCABCOV_ORACLE), ["k"])


def test_ngram_novelty_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import ngram_novelty

    got = ngram_novelty(_docs(spark)).toPandas()
    _cmp(got, _duck(NGRAMNOV_ORACLE), ["source"])


# ------------------------------------------------------------- hand pins


def test_canonical_packing_hand(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        dedup_aware_packing,
    )

    rows = [
        (1, "s", "a b c d e f"),
        (2, "s", "a b c d e f"),  # exact twin of 1 -> LSH pair
        (3, "s", "zz yy xx ww vv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    [r] = dedup_aware_packing(
        df, budget=8, threshold=0.02, hash_family="md5"
    ).collect()
    assert (r["n_docs"], r["n_kept"]) == (3, 2)
    assert (r["tokens_total"], r["tokens_kept"]) == (17, 11)
    # ceil(17/8) = 3 chunks before, ceil(11/8) = 2 after
    assert (r["chunks_before"], r["chunks_after"], r["chunks_saved"]) == (
        3, 2, 1,
    )


def test_url_normalize_hand(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        url_normalize_dedup,
    )

    rows = [
        ("s", "HTTPS://Host.com/a/?utm_source=x#f"),
        ("s", "https://host.com/a"),          # same after normalization
        ("s", "https://host.com/a?id=1&utm_c=2"),
        ("s", "https://host.com/a?id=1"),     # same after normalization
        ("s", "https://host.com/"),           # root slash preserved
    ]
    df = spark.createDataFrame(rows, "source string, url string")
    [r] = url_normalize_dedup(df, "url", "source").collect()
    assert (r["n_docs"], r["n_raw_urls"], r["n_norm_urls"]) == (5, 5, 3)
    assert r["dup_excess"] == 2
    assert r["dup_ppm"] == 400_000


def test_quality_reweight_hand(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        quality_mixture_reweight,
    )

    rows = [
        (1, "s1", "a a"), (2, "s1", "a a"),   # high-probability tokens
        (3, "s2", "b c"),                      # singletons
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in quality_mixture_reweight(
        df, token_budget=100_000).collect()}
    # N = 6; s1: 4 tokens of cnt 4 -> sum 16, ppb = 1e9*16/(4*6)
    assert out["s1"]["quality_ppb"] == (10**9 * 16) // 24
    assert out["s2"]["quality_ppb"] == (10**9 * 2) // 12
    assert out["s1"]["alloc_tokens"] + out["s2"]["alloc_tokens"] == 100_000
    assert out["s1"]["alloc_tokens"] > out["s2"]["alloc_tokens"]


def test_cross_source_hand(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        cross_source_dup_matrix,
    )

    rows = [
        (1, "s1", "x y"), (2, "s2", "x y"), (3, "s2", "q r"),
        (4, "s3", "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r["source_a"], r["source_b"]): r
           for r in cross_source_dup_matrix(df).collect()}
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s2")]["n_shared_hashes"] == 1
    assert out[("s1", "s2")]["n_docs_a"] == 1
    assert out[("s1", "s2")]["n_docs_b"] == 1


def test_vocab_coverage_hand(spark):
    from kafka_streams_aggregate_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    out = {r["k"]: r for r in vocab_coverage(df, ks=(1, 2)).collect()}
    assert out[1]["n_vocab"] == 3 and out[1]["total_tokens"] == 6
    assert out[1]["covered_tokens"] == 3
    assert out[1]["coverage_ppm"] == 500_000
    assert out[2]["covered_tokens"] == 5
    assert out[2]["coverage_ppm"] == 833_333


def test_ngram_novelty_hand(spark):
    from kafka_streams_aggregate_spark.operators.text import ngram_novelty

    def res(i):
        return int(
            hashlib.md5(f"nov|{i}".encode()).hexdigest()[:15], 16
        ) % 64

    train_id = next(i for i in range(1, 100) if res(i) < 48)
    held_id = next(i for i in range(1, 100) if res(i) >= 48)
    rows = [
        (train_id, "s", "a b c d"),
        (held_id, "s", "a b c d"),   # both 3-grams seen in train
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    [r] = ngram_novelty(df, "doc_id", "text", "source").collect()
    assert (r["n_heldout_docs"], r["n_instances"], r["n_unseen"]) == (
        1, 2, 0,
    )
    assert r["novelty_ppm"] == 0

    held_id2 = next(
        i for i in range(held_id + 1, 200) if res(i) >= 48
    )
    rows.append((held_id2, "s", "zz yy xx ww"))  # fresh 3-grams
    df2 = spark.createDataFrame(rows, "doc_id long, source string, text string")
    [r] = ngram_novelty(df2, "doc_id", "text", "source").collect()
    assert (r["n_heldout_docs"], r["n_instances"], r["n_unseen"]) == (
        2, 4, 2,
    )
    assert r["novelty_ppm"] == 500_000
