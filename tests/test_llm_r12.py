"""LLM-pipeline round-12 staging — Zipf rank-frequency, base64
round-trip, MinHash-LSH recall audit (operators/text.py, dedup.py).

Registration-ready oracle texts in ZIPF_ORACLE / B64_ORACLE /
lsh_recall_oracle() (the last reuses the md5 hash-family twin of the
registered q_dedup_minhash_lsh_md5 machinery).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

ZIPF_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM read_parquet('{sf}/documents.parquet')
    ),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks WHERE token <> '' GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
    ranked AS (
        SELECT token, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, token)
                    AS BIGINT) AS rank
        FROM counts
    )
    SELECT rank, token, cnt,
           CAST(rank * cnt AS BIGINT) AS zipf_product,
           CAST((1000000 * cnt) // total AS BIGINT) AS share_ppm,
           total
    FROM ranked CROSS JOIN tot
    WHERE rank <= 100
"""

B64_ORACLE = """
    SELECT doc_id AS id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(base64(encode(text))) AS BIGINT) AS n_b64,
           md5(base64(encode(text))) AS b64_md5,
           decode(from_base64(base64(encode(text)))) = text AS roundtrip_ok
    FROM read_parquet('{sf}/documents.parquet')
"""


def lsh_recall_oracle(sf: str, threshold: float = 0.5) -> str:
    from kafka_streams_aggregate_spark.operators.dedup import (
        _MERSENNE61,
        _affine_params,
    )

    k, bands, seed = 32, 8, 42
    params = _affine_params(k, seed)
    rpb = k // bands
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {_MERSENNE61}) AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\n        UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, substr(md5("
        + " || ',' || ".join(f"s{bi * rpb + ri}::VARCHAR" for ri in range(rpb))
        + "), 1, 16) AS bkey FROM sigs"
        for bi in range(bands)
    )
    shingles = (
        "list_transform(range(1, greatest(len(string_split(text, ' ')) - 2,"
        " 1) + 1), i -> array_to_string(list_slice(string_split(text, ' '),"
        " CAST(i AS INT), CAST(i + 2 AS INT)), ' '))"
    )
    return f"""
    WITH idx AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id, unnest({shingles}) AS shingle
              FROM read_parquet('{sf}/documents.parquet'))
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
    allpairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM idx a JOIN idx b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b FROM allpairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE)
              >= {threshold}
    ),
    hs AS (
        SELECT doc_id,
               ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483648 AS h
        FROM idx
    ),
    sigs AS (
        SELECT doc_id,
           {mins}
        FROM hs GROUP BY doc_id
    ),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    ),
    lsh AS (
        SELECT c.id_a, c.id_b FROM cand c
        JOIN allpairs p ON p.id_a = c.id_a AND p.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
        WHERE CAST(p.c AS DOUBLE) / CAST(sa.sz + sb.sz - p.c AS DOUBLE)
              >= {threshold}
    ),
    hit AS (
        SELECT l.* FROM lsh l
        JOIN truth t ON t.id_a = l.id_a AND t.id_b = l.id_b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lsh) AS n_lsh,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0 THEN
                CAST((1000000 * (SELECT COUNT(*) FROM hit))
                     // (SELECT COUNT(*) FROM truth) AS BIGINT) END
               AS recall_ppm
    """


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_zipf_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import zipf_rank_freq
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = zipf_rank_freq(docs, "text", topk=100).toPandas()
    con = duckdb.connect()
    exp = con.sql(ZIPF_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["rank"])
    # usage concentrates: rank-1 share strictly above rank-100 share
    assert got.iloc[0]["share_ppm"] > got.iloc[-1]["share_ppm"]


def test_zipf_hand_values(spark):
    """'a a a b b c': ranks (a,3),(b,2),(c,1); products 3,4,3;
    shares 500000/333333/166666 ppm."""
    from kafka_streams_aggregate_spark.operators.text import zipf_rank_freq

    df = spark.createDataFrame([("a a a b b c",)], "text string")
    rows = {r["rank"]: r for r in zipf_rank_freq(df, "text").collect()}
    assert (rows[1]["token"], rows[1]["cnt"], rows[1]["zipf_product"]) == (
        "a", 3, 3,
    )
    assert (rows[2]["token"], rows[2]["zipf_product"]) == ("b", 4)
    assert rows[1]["share_ppm"] == 500_000
    assert rows[3]["share_ppm"] == 166_666


def test_base64_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        base64_roundtrip_audit,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = base64_roundtrip_audit(docs, "doc_id", "text").toPandas()
    con = duckdb.connect()
    exp = con.sql(B64_ORACLE.format(sf=SF)).df()
    con.close()
    got, exp = _cmp(got, exp, ["id"])
    assert got["roundtrip_ok"].all()


def test_base64_hand_value(spark):
    """'Man' -> 'TWFu' (the RFC 4648 example); padding case 'Ma' ->
    'TWE='."""
    from kafka_streams_aggregate_spark.operators.text import (
        base64_roundtrip_audit,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "Man"), (2, "Ma")], "doc_id long, text string")
    b64 = {
        r["doc_id"]: r["b64"]
        for r in df.select(
            "doc_id", F.base64(F.col("text").cast("binary")).alias("b64")
        ).collect()
    }
    assert b64 == {1: "TWFu", 2: "TWE="}
    out = {r["id"]: r for r in base64_roundtrip_audit(df, "doc_id", "text").collect()}
    assert out[1]["n_b64"] == 4 and out[1]["roundtrip_ok"]
    assert out[2]["n_b64"] == 4 and out[2]["roundtrip_ok"]


def test_lsh_recall_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import lsh_recall_audit
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = lsh_recall_audit(
        docs, "doc_id", "text", threshold=0.5, hash_family="md5"
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(lsh_recall_oracle(SF, 0.5)).df()
    con.close()
    assert len(got) == len(exp) == 1
    assert got["n_truth"][0] > 0  # the corpus plants near-dups
    assert got["n_hit"][0] == got["n_lsh"][0]  # lsh subset of truth
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_lsh_recall_hand_corpus(spark):
    """Two identical docs (jaccard 1, LSH must catch: identical
    signatures share every band) + one unrelated: truth = lsh = hit
    = 1 pair, recall 1e6."""
    from kafka_streams_aggregate_spark.operators.dedup import lsh_recall_audit

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different words appear in this other document here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    [r] = lsh_recall_audit(df, "doc_id", "text", threshold=0.5).collect()
    assert (r["n_truth"], r["n_lsh"], r["n_hit"], r["recall_ppm"]) == (
        1, 1, 1, 1_000_000,
    )


def test_lsh_recall_sampled_parity(spark):
    """The REGISTERED scope (round-12 verdict scale fix): the whole
    audit on the deterministic md5-residue document half, operator
    vs the sample_mod-aware oracle — and strictly fewer truth pairs
    than the full-corpus audit (the sample is doing real work)."""
    from kafka_streams_aggregate_spark.operators.dedup import lsh_recall_audit
    from kafka_streams_aggregate_spark.queries.round12 import (
        _lsh_recall_oracle,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = lsh_recall_audit(
        docs, "doc_id", "text", threshold=0.5, hash_family="md5",
        sample_mod=2,
    ).toPandas()
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF}/{t}.parquet')"
        )
    exp = con.sql(_lsh_recall_oracle(threshold=0.5, sample_mod=2)).df()
    full = con.sql(lsh_recall_oracle(SF, 0.5)).df()
    con.close()
    assert len(got) == len(exp) == 1
    assert 0 < got["n_truth"][0] < full["n_truth"][0]
    assert got["n_hit"][0] == got["n_lsh"][0]
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
