"""Perceptual dHash over real decoded BMPs — pre-validation for the
round-11 registration queue (operators/multimodal.py:image_dhash).

The kernel REALLY decodes (header walk, bottom-up unflip, stride
unpad); the oracle computes the identical 62-bit hash analytically
from the synthesis pixel formula — pinning the decode path
byte-for-byte against closed-form SQL (the multimodal family's
standard trick). Registration-ready oracle text in DHASH_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

DHASH_ORACLE = """
    WITH imgs AS (
        SELECT doc_id AS id,
               1 + doc_id % 32 AS w,
               1 + (7 * doc_id) % 24 AS h,
               (1 + doc_id % 32) * (1 + (7 * doc_id) % 24) AS n
        FROM read_parquet('{sf}/documents.parquet')
        WHERE doc_id % 2 = 0
    ),
    samples AS (
        SELECT id, w, h, n, t.j,
               (t.j * (n - 1)) // 62 AS idx
        FROM imgs CROSS JOIN range(0, 63) t(j)
    ),
    g AS (
        SELECT id, w, h, n, j,
               (  (id + 3 * (idx % w)     + (h - 1 - idx // w)) % 256
                + (id + 3 * (idx % w) + 1 + (h - 1 - idx // w)) % 256
                + (id + 3 * (idx % w) + 2 + (h - 1 - idx // w)) % 256
               ) // 3 AS gray
        FROM samples
    ),
    bits AS (
        SELECT a.id, a.w, a.h, a.n, a.j,
               CASE WHEN b.gray > a.gray
                    THEN CAST(1 AS BIGINT) << a.j ELSE 0 END AS term
        FROM g a JOIN g b ON b.id = a.id AND b.j = a.j + 1
        WHERE a.j < 62
    )
    SELECT id AS asset_id,
           CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(MAX(n) AS BIGINT) AS n_pix,
           CAST(SUM(term) AS BIGINT) AS dhash
    FROM bits GROUP BY id
"""


def test_image_dhash_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        image_dhash,
        synthesize_media_assets,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    assets = synthesize_media_assets(docs).where(
        F.col("asset_id") % 2 == 0
    )
    got = (
        image_dhash(assets)
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(DHASH_ORACLE.format(sf=SF))
        .df()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["dhash"].nunique() > 10  # hashes actually discriminate
    got = got.astype({c: "int64" for c in got.columns})
    exp = exp.astype({c: "int64" for c in exp.columns})
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_image_dhash_hand_values(spark):
    """doc_id 0 -> 1x1 image: every sample position is pixel 0, all
    gradients are 0 -> dhash 0. Non-BMP (odd id -> WAV) passes
    through with NULL dhash."""
    from kafka_streams_aggregate_spark.operators.multimodal import (
        image_dhash,
        synthesize_media_assets,
    )

    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    rows = {
        r["asset_id"]: r
        for r in image_dhash(synthesize_media_assets(docs)).collect()
    }
    img = rows[0]
    assert (img["width"], img["height"], img["n_pix"], img["dhash"]) == (
        1,
        1,
        1,
        0,
    )
    assert rows[1]["dhash"] is None  # WAV payload
