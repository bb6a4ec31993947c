"""Round-16 fresh queue, LLM-data batch — SemDeDup-style semantic
dedup, cross-source near-dup matrix, 13-gram decontamination
(operators/similarity.py, operators/dedup.py, operators/llm_prep.py).
Oracle texts single-sourced from queries/round16.py (the r15 pattern).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    _eval_decontam_13g_oracle,
    _semantic_dedup_oracle,
    _xsrc_neardup_oracle,
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
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


# ---------------------------------------------------------------- semantic


def test_semantic_dedup_hand(spark):
    """Identical vectors share every sign bit (same bucket) and have
    cosine 1.0 -> the higher id drops; an antipodal vector flips every
    non-zero plane dot (different bucket, and cosine -1 anyway)."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        semantic_dedup,
    )

    v = [1.0] + [0.0] * 63
    w = [0.0, 1.0] + [0.0] * 62
    rows = [
        (1, "a", v),
        (2, "a", v),         # duplicate of 1 -> dropped (keep-lowest-id)
        (3, "a", [-x for x in v]),  # antipodal -> kept
        (4, "b", w),
        (5, "b", w),         # duplicate of 4 -> dropped
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    out = {r["label"]: r for r in semantic_dedup(
        df, threshold=0.95).collect()}
    assert out["a"]["n_docs"] == 3 and out["a"]["n_dropped"] == 1
    assert out["b"]["n_docs"] == 2 and out["b"]["n_dropped"] == 1
    assert out["a"]["n_kept"] == 2
    assert out["b"]["drop_ppm"] == 500000


def test_semantic_dedup_parity(spark):
    from kafka_streams_aggregate_spark.operators.similarity import (
        semantic_dedup,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    got = semantic_dedup(load_table(spark, "embeddings", SF)).toPandas()
    _cmp(got, _duck(_semantic_dedup_oracle()), ["label"])
    # non-vacuous: something actually drops at the registered knobs
    assert got["n_dropped"].sum() > 0


# ------------------------------------------------------------ cross-source


def test_cross_source_neardup_hand(spark):
    """Two sources sharing one exact dup and one near dup; a third
    source with a within-source dup (must NOT appear: same source)."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        cross_source_neardup_matrix,
    )

    body = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " zz yy"
    rows = [
        (1, "sA", body),
        (2, "sB", body),      # exact cross-source dup
        (3, "sA", near),      # near dup of 1 (within-source) and 2
        (4, "sC", "totally different words entirely here now"),
        (5, "sC", "totally different words entirely here now"),  # same-src
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = cross_source_neardup_matrix(
        df, hash_family="md5", threshold=0.02
    ).collect()
    by_pair = {(r["source_a"], r["source_b"]): r for r in out}
    # sC's dup is within-source -> no sC row anywhere
    assert all("sC" not in p for p in by_pair)
    r = by_pair[("sA", "sB")]
    # pairs (1,2) exact and (2,3) near -> 2 cross-source pairs, 1 exact
    assert r["n_pairs"] == 2
    assert r["n_exact_pairs"] == 1
    assert r["max_jaccard"] == 1.0


def test_cross_source_neardup_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        cross_source_neardup_matrix,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    got = cross_source_neardup_matrix(
        load_table(spark, "documents", SF),
        hash_family="md5",
        threshold=0.02,
    ).toPandas()
    _cmp(got, _duck(_xsrc_neardup_oracle()), ["source_a", "source_b"])
    assert len(got) > 0


# ---------------------------------------------------------------- 13-gram


def test_eval_decontam_n_plumbs(spark):
    """contam_n reaches the shingle stage: a val doc sharing a full
    13-gram with a train doc is dropped at 13; sharing only an 8-token
    span it is dropped at 8 but KEPT at 13 (longer n-grams are the
    conservative published practice)."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        eval_prep_pipeline,
    )

    span13 = " ".join(f"w{i}" for i in range(13))
    span8 = " ".join(f"u{i}" for i in range(8))

    def pad(d):  # unique per doc: no accidental shared n-grams
        return " ".join(f"d{d}x{j}" for j in range(16))

    # ids 4 and 5 land in the md5 val split ('8'); 0-3 are train.
    rows = [
        (0, "s", span13 + " " + pad(0)),          # train: donates 13-gram
        (1, "s", span8 + " " + pad(1)),           # train: donates 8-gram
        (2, "s", "filler one " + pad(2)),
        (3, "s", "filler two " + pad(3)),
        (4, "s", span13 + " " + pad(4)),          # val: leaked 13-gram
        (5, "s", span8 + " " + pad(5)),           # val: leaked 8-gram only
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    f13 = {r["stage_name"]: r for r in eval_prep_pipeline(
        df, contam_n=13, contam_max_ppm=0).collect()}
    f8 = {r["stage_name"]: r for r in eval_prep_pipeline(
        df, contam_n=8, contam_max_ppm=0).collect()}
    assert f13["quality"]["n_docs"] == 2
    # at 13-grams only doc 4 is contaminated; at 8-grams both are
    assert f13["decontam"]["n_docs"] == 1
    assert f8["decontam"]["n_docs"] == 0


def test_eval_decontam_13g_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        eval_prep_pipeline,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    got = eval_prep_pipeline(
        load_table(spark, "documents", SF), contam_n=13
    ).toPandas()
    _cmp(got, _duck(_eval_decontam_13g_oracle()), ["stage"])
