"""Concatenated-gzip member shards — round-13 staging
(operators/multimodal.py:synthesize_gzip_shards / read_gzip_members).

The sequential-streaming twin of the ZIP/tar shard family and the
exact container shape Common Crawl WET/WARC files use (one gzip
MEMBER per record, RFC 1952 §2.2 concatenation). Integrity rides on
the INFLATED bytes (recomputed CRC-32 + ISIZE; content md5 DuckDB-
native), so parity never depends on compressed-byte stability.
Registration-ready oracle text in GZIP_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

GZIP_ORACLE = """
    SELECT doc_id // 8 AS shard_id,
           printf('doc_%08d.txt', doc_id) AS member_name,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           TRUE AS crc_ok
    FROM read_parquet('{sf}/documents.parquet')
"""


def test_gzip_roundtrip_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.multimodal import (
        read_gzip_members,
        synthesize_gzip_shards,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        read_gzip_members(synthesize_gzip_shards(docs))
        .toPandas()
        .sort_values(["shard_id", "member_name"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(GZIP_ORACLE.format(sf=SF))
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


def test_gzip_bytes_are_real_gzip(spark):
    """The emitted payloads decompress with the stdlib gzip module —
    genuine RFC 1952 multi-member streams: gzip.decompress handles
    concatenated members and returns the joined content."""
    import gzip

    from kafka_streams_aggregate_spark.operators.multimodal import (
        synthesize_gzip_shards,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "second doc"), (8, "next shard")],
        "doc_id long, text string",
    )
    shards = {
        r["shard_id"]: bytes(r["payload"])
        for r in synthesize_gzip_shards(docs).collect()
    }
    assert set(shards) == {0, 1}
    assert gzip.decompress(shards[0]) == b"hello worldsecond doc"
    assert gzip.decompress(shards[1]) == b"next shard"


def test_gzip_corrupt_shard_fails_closed(spark):
    """A corrupted stored CRC flips crc_ok; a broken member magic
    poisons the shard entirely (no rows) — a torn WET shard must not
    pass as partially fine."""
    from kafka_streams_aggregate_spark.operators.multimodal import (
        read_gzip_members,
        synthesize_gzip_shards,
    )

    docs = spark.createDataFrame(
        [(0, "payload under test")], "doc_id long, text string"
    )
    [row] = synthesize_gzip_shards(docs).collect()
    good = bytes(row["payload"])

    # flip a bit in the stored CRC (trailer = last 8 bytes: CRC+ISIZE)
    bad_crc = good[:-8] + bytes([good[-8] ^ 0xFF]) + good[-7:]
    # break the member magic
    bad_magic = b"XX" + good[2:]

    df = spark.createDataFrame(
        [(0, good), (1, bad_crc), (2, bad_magic)],
        "shard_id long, payload binary",
    )
    rows = {
        (r["shard_id"], r["member_name"]): r["crc_ok"]
        for r in read_gzip_members(df).collect()
    }
    assert rows[(0, "doc_00000000.txt")] is True
    assert rows[(1, "doc_00000000.txt")] is False
    assert not any(k[0] == 2 for k in rows)


def test_gzip_member_names_and_sizes(spark):
    """FNAME is parsed from each member header; n_bytes is the
    INFLATED length (not the compressed length)."""
    from kafka_streams_aggregate_spark.operators.multimodal import (
        read_gzip_members,
        synthesize_gzip_shards,
    )

    docs = spark.createDataFrame(
        [(0, "x" * 500), (1, "abc")], "doc_id long, text string"
    )
    rows = {
        r["member_name"]: r["n_bytes"]
        for r in read_gzip_members(synthesize_gzip_shards(docs)).collect()
    }
    assert rows == {"doc_00000000.txt": 500, "doc_00000001.txt": 3}
