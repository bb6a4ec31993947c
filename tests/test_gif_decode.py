"""GIF + real LZW entropy decode — pre-validation for the round-10
registration queue (operators/multimodal.py:synthesize_gif_assets /
decode_gif_frames).

The parity test's oracle text is registration-ready: it computes the
decoded-pixel checksums ANALYTICALLY from the synthesis arithmetic, so
a wrong LZW bit-unpack, wrong code-width bump, or palette mix-up breaks
the hash match.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

GIF_ORACLE = """
    WITH params AS (
        SELECT doc_id,
               1 + doc_id % 24 AS w,
               1 + (7 * doc_id) % 16 AS h,
               1 + doc_id % 4 AS nf,
               4 + doc_id % 10 AS delay
        FROM read_parquet('{sf}/documents.parquet')
    ),
    grid AS (
        SELECT p.doc_id, x.range AS x, y.range AS y, f.range AS f,
               (p.doc_id + f.range + 3 * x.range + 5 * y.range) % 4 AS i
        FROM params p, range(24) x, range(16) y, range(4) f
        WHERE x.range < p.w AND y.range < p.h AND f.range < p.nf
    ),
    px AS (
        SELECT doc_id,
               CAST(SUM((doc_id + 37 * i) % 256 + (2 * doc_id + 11 * i) % 256
                        + (5 * doc_id + 23 * i) % 256) AS BIGINT) AS px_sum,
               CAST(SUM((f + 1) * (x + 1) * (y + 1)
                        * ((doc_id + 37 * i) % 256
                           + (2 * doc_id + 11 * i) % 256
                           + (5 * doc_id + 23 * i) % 256)) AS BIGINT)
                   AS px_wsum
        FROM grid GROUP BY doc_id
    )
    SELECT p.doc_id AS asset_id,
           'image/gif' AS media_type,
           CAST(p.w AS INTEGER) AS width,
           CAST(p.h AS INTEGER) AS height,
           CAST(p.nf AS INTEGER) AS n_frames,
           CAST(4 AS INTEGER) AS palette_size,
           CAST(p.nf * p.delay AS BIGINT) AS delay_cs_total,
           px.px_sum, px.px_wsum
    FROM params p JOIN px ON p.doc_id = px.doc_id
"""


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 3), min_size=1, max_size=600),
    st.integers(2, 4),
)
def test_lzw_roundtrip_property(indices, mcs):
    """Encoder/decoder agree across code-width bumps (table sizes cross
    8/16/32/64/... within 600 symbols) including the KwKwK case that
    runs of repeated symbols force."""
    from kafka_streams_aggregate_spark.operators.multimodal import _gif_lzw

    enc, dec = _gif_lzw()
    assert dec(enc(indices, mcs), mcs) == bytes(indices)


def test_lzw_kwkwk_and_width_boundary():
    from kafka_streams_aggregate_spark.operators.multimodal import _gif_lzw

    enc, dec = _gif_lzw()
    # the canonical KwKwK trigger: aaaa... emits a just-added code
    for n in (1, 2, 3, 7, 8, 9, 50, 400):
        seq = [1] * n
        assert dec(enc(seq, 2), 2) == bytes(seq)
    # truncated stream (EOI cut off) must fail closed, not loop/throw
    full = enc([0, 1, 2, 3] * 30, 2)
    assert dec(full[:-2], 2) is None


def test_lzw_dictionary_overflow_clear_reset():
    """A stream long/noisy enough to fill all 4096 codes forces the
    encoder's CLEAR-and-reset path (one table add per emitted phrase,
    so ~4100 phrase emissions overflow the 12-bit table); the decoder
    must resynchronize through the reset and round-trip exactly."""
    from kafka_streams_aggregate_spark.operators.multimodal import _gif_lzw

    enc, dec = _gif_lzw()
    # deterministic pseudo-random 4-symbol stream: phrases stay short,
    # so 40k symbols -> well over 4096 table entries
    seq = [(i * 2654435761) >> 13 & 3 for i in range(40_000)]
    encoded = enc(seq, 2)
    assert dec(encoded, 2) == bytes(seq)
    # and with a larger alphabet / 8-bit min code size
    seq8 = [(i * 40503) >> 7 & 255 for i in range(30_000)]
    assert dec(enc(seq8, 8), 8) == bytes(seq8)


def test_gif_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_gif_frames,
        synthesize_gif_assets,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        decode_gif_frames(synthesize_gif_assets(docs))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(GIF_ORACLE.format(sf=SF))
        .df()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    con.close()
    assert (got["media_type"] == "image/gif").all()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_gif_corrupt_payloads_fail_closed(spark):
    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_gif_frames,
        synthesize_gif_assets,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).limit(8)
    assets = synthesize_gif_assets(docs)
    rows = assets.collect()
    import pyspark.sql.types as T

    broken = []
    for i, r in enumerate(rows):
        p = bytearray(r["payload"])
        if i % 4 == 0:
            p = p[:10]  # truncated before palette
        elif i % 4 == 1:
            p[0:3] = b"BMP"  # wrong signature
        elif i % 4 == 2:
            p = p[:-5]  # trailer + final sub-blocks cut off
        else:
            # flip a byte in the middle of the LZW stream
            p[len(p) // 2] ^= 0xFF
        broken.append((r["asset_id"], bytes(p), None))
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", T.StringType()),
        ]
    )
    bdf = spark.createDataFrame(broken, schema)
    out = decode_gif_frames(bdf).collect()
    assert len(out) == len(broken)
    # every structurally-broken payload must be 'unknown' with NULL
    # checksums — a byte flip inside LZW data may still decode to the
    # wrong pixels ONLY if the stream stays self-consistent; the
    # pixel-count and EOI guards catch the rest. Require: no crash, and
    # the three structural corruptions are all unknown.
    by_id = {r["asset_id"]: r for r in out}
    for i, (aid, _, _) in enumerate(broken):
        if i % 4 in (0, 1, 2):
            assert by_id[aid]["media_type"] == "unknown"
            assert by_id[aid]["px_sum"] is None
