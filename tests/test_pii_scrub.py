"""PII scrub + audit — pre-validation for the round-11 registration
queue (operators/text.py:pii_scrub_audit).

The synthetic corpus contains no natural PII, so the test PLANTS it
deterministically (md5-derived email / id / hex token appended
identically in both engines) — guaranteeing every pattern fires and
the scrubbed text + counts compare cell-exact. Patterns live in the
Java-regex ∩ RE2 common subset. Registration-ready oracle text in
PII_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_AUG_SQL = (
    "text || ' contact u' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)"
    " || '@mail.example.com ref ' || CAST(doc_id * 7919 + 1000 AS VARCHAR)"
    " || ' tok ' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)"
)

PII_ORACLE = """
    WITH aug AS (
        SELECT doc_id AS id, {aug} AS t
        FROM read_parquet('{sf}/documents.parquet')
    )
    SELECT id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+', '<EMAIL>', 'g'),
               '[0-9][0-9][0-9][0-9]+', '<NUM>', 'g'),
             '\\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\\b', '<HEX>', 'g')
               AS scrubbed,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(t, '[0-9][0-9][0-9][0-9]+'))
               AS BIGINT) AS n_digit_run,
           CAST(len(regexp_extract_all(t,
               '\\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\\b'))
               AS BIGINT) AS n_hex_token,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+'))
             + len(regexp_extract_all(t, '[0-9][0-9][0-9][0-9]+'))
             + len(regexp_extract_all(t,
               '\\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\\b'))
               AS BIGINT) AS n_redactions
    FROM aug
""".replace("{aug}", _AUG_SQL)


def test_pii_scrub_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.text import pii_scrub_audit
    from kafka_streams_aggregate_spark.sources.tables import load_table

    aug = load_table(spark, "documents", SF).select(
        "doc_id",
        F.expr(
            "text || ' contact u' || substr(md5(CAST(doc_id AS STRING)), 1, 6)"
            " || '@mail.example.com ref '"
            " || CAST(doc_id * 7919 + 1000 AS STRING)"
            " || ' tok ' || substr(md5(CAST(doc_id AS STRING)), 9, 8)"
        ).alias("t"),
    )
    got = (
        pii_scrub_audit(aug, "doc_id", "t")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(PII_ORACLE.format(sf=SF))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert (got["n_email"] >= 1).all()
    assert (got["n_digit_run"] >= 1).all()
    assert (got["n_hex_token"] >= 1).all()
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_pii_scrub_hand_values(spark):
    """Counts on the ORIGINAL text, replacements sequential: the
    email is one email match; its digit run is also counted by
    digit_run but already scrubbed by the earlier email replace."""
    from kafka_streams_aggregate_spark.operators.text import pii_scrub_audit

    df = spark.createDataFrame(
        [(1, "mail a1234@x.co and card 999911112222 plus deadbeef done")],
        "doc_id long, t string",
    )
    [r] = pii_scrub_audit(df, "doc_id", "t").collect()
    assert r["n_email"] == 1
    assert r["n_digit_run"] == 2  # 1234 inside the email + the card
    # hex chars are a superset of digits: a1234, 999911112222, deadbeef
    assert r["n_hex_token"] == 3
    assert r["n_redactions"] == 6
    assert r["scrubbed"] == "mail <EMAIL> and card <NUM> plus <HEX> done"
