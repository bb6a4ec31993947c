"""ZIP stored-member shards — round-12 staging
(operators/multimodal.py:synthesize_zip_shards / read_zip_members).

The random-access twin of the tar shard family: the reader resolves
members THROUGH the central directory (EOCD -> central entries ->
local headers), verifies CRC-32 (recomputed with zlib) and both size
fields. Content integrity rides on md5(text), which DuckDB computes
natively — the oracle needs no ZIP decoder. Registration-ready oracle
text in ZIP_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

ZIP_ORACLE = """
    SELECT doc_id // 8 AS shard_id,
           printf('doc_%08d.txt', doc_id) AS member_name,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           TRUE AS crc_ok
    FROM read_parquet('{sf}/documents.parquet')
"""


def test_zip_roundtrip_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.multimodal import (
        read_zip_members,
        synthesize_zip_shards,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        read_zip_members(synthesize_zip_shards(docs))
        .toPandas()
        .sort_values(["shard_id", "member_name"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ZIP_ORACLE.format(sf=SF))
        .df()
        .sort_values(["shard_id", "member_name"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["crc_ok"].all()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_zip_bytes_are_real_zipfiles(spark):
    """The emitted payloads open with the stdlib zipfile module — the
    archives are genuine PKZIP, not a lookalike; stdlib extraction
    agrees with the walker byte-for-byte."""
    import io
    import zipfile

    from kafka_streams_aggregate_spark.operators.multimodal import (
        synthesize_zip_shards,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "second doc"), (8, "next shard")],
        "doc_id long, text string",
    )
    shards = {
        r["shard_id"]: bytes(r["payload"])
        for r in synthesize_zip_shards(docs).collect()
    }
    assert set(shards) == {0, 1}
    zf = zipfile.ZipFile(io.BytesIO(shards[0]))
    assert zf.namelist() == ["doc_00000000.txt", "doc_00000001.txt"]
    assert zf.read("doc_00000000.txt") == b"hello world"
    assert zf.read("doc_00000001.txt") == b"second doc"
    zf2 = zipfile.ZipFile(io.BytesIO(shards[1]))
    assert zf2.read("doc_00000008.txt") == b"next shard"


def test_zip_corrupt_shard_fails_closed(spark):
    """A flipped content byte breaks the CRC (crc_ok False); a broken
    EOCD signature poisons the shard entirely (no rows)."""
    from kafka_streams_aggregate_spark.operators.multimodal import (
        read_zip_members,
        synthesize_zip_shards,
    )

    docs = spark.createDataFrame(
        [(0, "payload under test")], "doc_id long, text string"
    )
    [row] = synthesize_zip_shards(docs).collect()
    good = bytes(row["payload"])

    # flip one content byte (after the 30-byte local header + name)
    body_off = 30 + len("doc_00000000.txt")
    bad_crc = (
        good[:body_off]
        + bytes([good[body_off] ^ 0xFF])
        + good[body_off + 1 :]
    )
    # break the EOCD signature
    bad_eocd = good[:-22] + b"XX" + good[-20:]

    df = spark.createDataFrame(
        [(0, good), (1, bad_crc), (2, bad_eocd)],
        "shard_id long, payload binary",
    )
    rows = {
        (r["shard_id"], r["member_name"]): r["crc_ok"]
        for r in read_zip_members(df).collect()
    }
    assert rows[(0, "doc_00000000.txt")] is True
    assert rows[(1, "doc_00000000.txt")] is False
    assert not any(k[0] == 2 for k in rows)
