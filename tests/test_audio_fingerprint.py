"""Perceptual audio fingerprint — pre-validation for the round-11
registration queue (operators/multimodal.py:audio_fingerprint).

The WAV twin of image_dhash: the kernel REALLY decodes (RIFF chunk
walk, 16-bit LE signed samples), the oracle computes the identical
62-bit energy-gradient signature analytically from the synthesis
byte formula. Short clips leave trailing frames EMPTY (energy 0) —
the oracle materializes all 63 frames via a left join, which the
n=51 clips in the corpus exercise. Registration-ready oracle text in
AUDIO_FP_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

AUDIO_FP_ORACLE = """
    WITH wavs AS (
        SELECT doc_id AS id,
               (1 + (doc_id // 2) % 2) * (50 + doc_id % 200) AS n
        FROM read_parquet('{sf}/documents.parquet')
        WHERE doc_id % 2 = 1
    ),
    samp AS (
        SELECT id, n, t.k,
               ((id * 31 + 2 * t.k) % 256)
               + 256 * ((id * 31 + 2 * t.k + 1) % 256) AS s
        FROM wavs CROSS JOIN range(0, 500) t(k)
        WHERE t.k < n
    ),
    v AS (
        SELECT id, n, k,
               CASE WHEN s >= 32768 THEN s - 65536 ELSE s END AS v
        FROM samp
    ),
    nonempty AS (
        SELECT id, n, (k * 63) // n AS j, SUM(v * v) AS energy
        FROM v GROUP BY 1, 2, 3
    ),
    frames AS (
        SELECT w.id, w.n, t.j, COALESCE(ne.energy, 0) AS energy
        FROM wavs w CROSS JOIN range(0, 63) t(j)
        LEFT JOIN nonempty ne ON ne.id = w.id AND ne.j = t.j
    ),
    bits AS (
        SELECT a.id, a.n, a.j,
               CASE WHEN b.energy > a.energy
                    THEN CAST(1 AS BIGINT) << a.j ELSE 0 END AS term
        FROM frames a JOIN frames b ON b.id = a.id AND b.j = a.j + 1
        WHERE a.j < 62
    )
    SELECT id AS asset_id,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM(term) AS BIGINT) AS fingerprint
    FROM bits GROUP BY id
"""


def test_audio_fingerprint_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        audio_fingerprint,
        synthesize_media_assets,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    assets = synthesize_media_assets(docs).where(F.col("asset_id") % 2 == 1)
    got = (
        audio_fingerprint(assets)
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(AUDIO_FP_ORACLE.format(sf=SF))
        .df()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["fingerprint"].nunique() > 10
    got = got.astype({c: "int64" for c in got.columns})
    exp = exp.astype({c: "int64" for c in exp.columns})
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_audio_fingerprint_non_wav_null(spark):
    """BMP payload (even id) passes through with NULL fingerprint."""
    from kafka_streams_aggregate_spark.operators.multimodal import (
        audio_fingerprint,
        synthesize_media_assets,
    )

    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    rows = {
        r["asset_id"]: r
        for r in audio_fingerprint(synthesize_media_assets(docs)).collect()
    }
    assert rows[0]["fingerprint"] is None  # BMP
    assert rows[1]["fingerprint"] is not None  # WAV, n = 51 samples
    assert rows[1]["n_samples"] == 51
