"""Incremental MinHash+LSH maintenance — pre-validation for the
round-10 registration queue (operators/dedup.py:
incremental_minhash_pairs).

Two independent pins:
 1. ENGINE-INTERNAL equivalence: incremental(base, delta) == the full
    batch minhash_lsh_pairs(base UNION delta) restricted to pairs
    touching a delta id — for BOTH hash families.
 2. CROSS-ENGINE: the md5-family incremental output equals the
    registered md5 oracle SQL (reused verbatim) filtered the same way.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.02


def _split(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    base = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    return docs, base, delta


def _norm(df):
    return (
        df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )


def test_incremental_equals_batch_restricted(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    docs, base, delta = _split(spark)
    for fam in ("xxhash64", "md5"):
        inc = _norm(
            incremental_minhash_pairs(
                base, delta, "doc_id", "text",
                threshold=THRESHOLD, hash_family=fam,
            ).toPandas()
        )
        full = minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=THRESHOLD, hash_family=fam
        ).where(
            (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
        )
        fullp = _norm(full.toPandas())
        assert len(inc) > 0, f"no delta pairs found ({fam}) — vacuous"
        pd.testing.assert_frame_equal(inc, fullp, check_dtype=False)


def test_incremental_md5_vs_registered_oracle(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        incremental_minhash_pairs,
    )
    from kafka_streams_aggregate_spark.queries.llm_data import (
        _minhash_md5_oracle,
    )

    _, base, delta = _split(spark)
    got = _norm(
        incremental_minhash_pairs(
            base, delta, "doc_id", "text",
            threshold=THRESHOLD, hash_family="md5",
        ).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = _norm(
        con.sql(
            f"SELECT * FROM ({_minhash_md5_oracle()}) "
            "WHERE id_a % 10 = 0 OR id_b % 10 = 0"
        ).df()
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
