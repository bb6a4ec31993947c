"""TAR shard (WebDataset-style) synthesis + real ustar walk-back —
pre-validation for the round-10 registration queue
(operators/multimodal.py:synthesize_tar_shards / read_tar_members).

Oracle needs NO decoder: member names/sizes are doc_id arithmetic and
content integrity is md5(text), which DuckDB computes natively from
the same column. stdlib tarfile cross-checks spec conformance.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

TAR_ORACLE = """
    SELECT doc_id // 8 AS shard_id,
           printf('doc_%08d.txt', doc_id) AS member_name,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM read_parquet('{sf}/documents.parquet')
"""


def test_tar_roundtrip_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.multimodal import (
        read_tar_members,
        synthesize_tar_shards,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        read_tar_members(synthesize_tar_shards(docs))
        .toPandas()
        .sort_values("member_name")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(TAR_ORACLE.format(sf=SF))
        .df()
        .sort_values("member_name")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_tar_is_spec_conformant(spark):
    """The synthesized shards must be readable by stdlib tarfile —
    pinning actual ustar conformance, not just self-consistency."""
    import io
    import tarfile

    from kafka_streams_aggregate_spark.operators.multimodal import (
        synthesize_tar_shards,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).limit(20)
    shards = synthesize_tar_shards(docs).collect()
    assert shards
    n_members = 0
    for r in shards:
        with tarfile.open(fileobj=io.BytesIO(bytes(r["payload"]))) as tf:
            for m in tf.getmembers():
                body = tf.extractfile(m).read()
                assert len(body) == m.size
                assert m.name.startswith("doc_")
                n_members += 1
    assert n_members == 20


def test_tar_corruption_fails_closed(spark):
    import pyspark.sql.types as T

    from kafka_streams_aggregate_spark.operators.multimodal import (
        TAR_SHARD_SCHEMA,
        read_tar_members,
        synthesize_tar_shards,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).limit(16)
    rows = synthesize_tar_shards(docs).collect()
    broken = []
    for i, r in enumerate(rows):
        p = bytearray(r["payload"])
        if i % 3 == 0:
            p[130] ^= 0x01  # corrupt the size octal -> checksum mismatch
        elif i % 3 == 1:
            p = p[: len(p) // 2]  # truncate mid-member
        else:
            pass  # leave intact
        broken.append((int(r["shard_id"]), bytes(p)))
    bdf = spark.createDataFrame(broken, TAR_SHARD_SCHEMA)
    out = read_tar_members(bdf).collect()
    bad_ids = {sid for i, (sid, _) in enumerate(broken) if i % 3 != 2}
    good_ids = {sid for i, (sid, _) in enumerate(broken) if i % 3 == 2}
    seen = {r["shard_id"] for r in out}
    assert seen == good_ids
    assert not (seen & bad_ids)
