"""Exact integer Gram matrix — pre-validation for the round-10
registration queue (operators/similarity.py:gram_matrix_int).

The oracle cross-checks the per-partition numpy GEMM partials against
a plain posexplode self-join sum — same floor(x*1000) int64 codes.
Registration-ready oracle text in GRAM_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

GRAM_ORACLE = """
    WITH q AS (
        SELECT vec_id, i.range AS i,
               CAST(floor(CAST(embedding[i.range + 1] AS DOUBLE) * 1000)
                    AS BIGINT) AS qi
        FROM read_parquet('{sf}/embeddings.parquet'), range(64) i
    )
    SELECT a.i, b.i AS j,
           CAST(SUM(a.qi * b.qi) AS BIGINT) AS gram,
           CAST((SELECT COUNT(*)
                 FROM read_parquet('{sf}/embeddings.parquet')) AS BIGINT)
               AS n_vectors
    FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.i >= a.i
    GROUP BY a.i, b.i
"""


def test_gram_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.similarity import (
        gram_matrix_int,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    got = (
        gram_matrix_int(emb)
        .toPandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(GRAM_ORACLE.format(sf=SF))
        .df()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == 64 * 65 // 2 == len(exp)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_gram_partitioning_invariance_and_psd(spark):
    """Partition-count independence (exact int partials) and the
    positive-semidefinite sanity of any Gram matrix."""
    import numpy as np

    from kafka_streams_aggregate_spark.operators.similarity import (
        gram_matrix_int,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    a = (
        gram_matrix_int(emb)
        .toPandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    b = (
        gram_matrix_int(emb.repartition(13))
        .toPandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    g = np.zeros((64, 64))
    for r in a.itertuples():
        g[r.i, r.j] = r.gram
        g[r.j, r.i] = r.gram
    evals = np.linalg.eigvalsh(g)
    assert evals.min() > -1e-6 * max(1.0, evals.max())
