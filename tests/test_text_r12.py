"""Round-12 staging — rendezvous sharding + Unicode NFC audit
(operators/sharding.py, operators/text.py). Registration-ready
oracle texts in HRW_ORACLE / NFC_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_H = "CAST(CONCAT('0x', substr(md5({e}), 1, 15)) AS BIGINT)"
_W56 = "CAST(CONCAT('0x', substr(md5({e}), 1, 14)) AS BIGINT)"


def _hrw_best_sql(key_expr: str, n: int) -> str:
    """DuckDB argmax over shards via greatest() on PACKED w*16+shard
    ordinals — mirrors the Spark construction exactly (DuckDB's
    greatest rejects structs; ties toward the higher shard id)."""
    packed = ", ".join(
        _W56.format(e=f"{key_expr} || '#{s}'") + f" * 16 + {s}"
        for s in range(n)
    )
    return f"greatest({packed}) % 16"


HRW_ORACLE = f"""
    WITH k AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders
    ),
    a AS (
        SELECT key,
               {_hrw_best_sql('key', 8)} AS shard_before,
               {_hrw_best_sql('key', 9)} AS shard_after,
               {_H.format(e='key')} % 8 AS mb,
               {_H.format(e='key')} % 9 AS ma
        FROM k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN shard_before <> shard_after
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_hrw,
           CAST(SUM(CASE WHEN mb <> ma THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved_mod,
           CAST((1000000 * SUM(CASE WHEN shard_before <> shard_after
                    THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
               AS hrw_moved_ppm,
           CAST((1000000 * SUM(CASE WHEN mb <> ma THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS mod_moved_ppm
    FROM a
""".replace("FROM orders", "FROM read_parquet('{sf}/orders.parquet')")

# plant a decomposed sequence (e + combining acute) so NFC really
# rewrites; chr() agrees across engines (Unicode code points)
NFC_ORACLE = """
    WITH aug AS (
        SELECT doc_id AS id,
               text || ' cafe' || chr(769) || ' no' || chr(776) || 'el'
                   AS t
        FROM read_parquet('{sf}/documents.parquet')
    )
    SELECT id,
           CAST(length(t) AS BIGINT) AS n_chars_raw,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars_nfc,
           t <> nfc_normalize(t) AS changed,
           md5(nfc_normalize(t)) AS nfc_md5
    FROM aug
"""


def test_hrw_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.sharding import (
        rendezvous_movement_audit,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    keys = load_table(spark, "orders", SF).select(
        F.col("o_orderkey").cast("string").alias("key")
    )
    got = rendezvous_movement_audit(keys, "key", 8, 9).toPandas()
    con = duckdb.connect()
    exp = con.sql(HRW_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # the minimal-movement property: HRW moves far fewer keys than mod
    assert got["n_moved_hrw"][0] * 3 < got["n_moved_mod"][0]
    # expected ~1/9 of keys move; allow a generous band
    ppm = got["hrw_moved_ppm"][0]
    assert 40_000 < ppm < 250_000


def test_hrw_moved_keys_land_on_new_shard(spark):
    """Growing 8 -> 9: a key moves IFF the new shard 8 wins its
    rendezvous — so every moved key's shard_after is 8 and no
    incumbent assignment is disturbed otherwise."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.sharding import (
        rendezvous_assignment,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    keys = load_table(spark, "orders", SF).select(
        F.col("o_orderkey").cast("string").alias("key")
    )
    a = rendezvous_assignment(keys, "key", 8, 9)
    moved = a.where(F.col("moved"))
    assert moved.count() > 0
    assert moved.where(F.col("shard_after") != 8).count() == 0
    # balance sanity: all 9 shards occupied afterwards
    assert a.select("shard_after").distinct().count() == 9


def test_nfc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.text import unicode_nfc_audit
    from kafka_streams_aggregate_spark.sources.tables import load_table

    aug = load_table(spark, "documents", SF).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" cafe\u0301 no\u0308el")
        ).alias("t"),
    )
    got = (
        unicode_nfc_audit(aug, "doc_id", "t")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(NFC_ORACLE.format(sf=SF))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["changed"].all()  # the planted sequences always rewrite
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_nfc_hand_values(spark):
    """'e' + U+0301 collapses to one precomposed char; ASCII text is
    untouched (changed = False, same md5 as the raw text)."""
    import hashlib

    from kafka_streams_aggregate_spark.operators.text import unicode_nfc_audit

    df = spark.createDataFrame(
        [(1, "caf" + "é"), (2, "plain ascii")],
        "doc_id long, t string",
    )
    rows = {r["id"]: r for r in unicode_nfc_audit(df, "doc_id", "t").collect()}
    assert (rows[1]["n_chars_raw"], rows[1]["n_chars_nfc"]) == (5, 4)
    assert rows[1]["changed"] is True
    assert rows[1]["nfc_md5"] == hashlib.md5("café".encode()).hexdigest()
    assert rows[2]["changed"] is False
    assert rows[2]["nfc_md5"] == hashlib.md5(b"plain ascii").hexdigest()


def test_nfc_null_text_propagates_null(spark):
    """NULL text -> NULL in every output column (not the md5 of the
    literal 'None'), matching the DuckDB nfc_normalize twin."""
    from kafka_streams_aggregate_spark.operators.text import unicode_nfc_audit

    df = spark.createDataFrame(
        [(1, "café"), (2, None)], "doc_id long, t string"
    )
    rows = {r["id"]: r for r in unicode_nfc_audit(df, "doc_id", "t").collect()}
    assert rows[2]["n_chars_raw"] is None
    assert rows[2]["n_chars_nfc"] is None
    assert rows[2]["changed"] is None
    assert rows[2]["nfc_md5"] is None
    assert rows[1]["nfc_md5"] is not None
