"""VARIANT shredding (Spark 4 engine surface) — round-12 staging
(operators/text.py:variant_shred_audit).

Spark parses machine-minified JSON into the binary VARIANT encoding
and extracts typed fields with variant_get; DuckDB reads the SAME
fields with native JSON path functions — parity is on the VALUES,
which is what shredding must preserve. GOTCHA pinned here: Spark's
``to_json(variant)`` SORTS object keys alphabetically (the VARIANT
binary encoding canonicalizes), so the synthesized JSON writes keys
pre-sorted ("meta" < "score" < "tags") to make the round-trip exact.
Registration-ready oracle builder in variant_oracle() (built by
concatenation — literal JSON braces break str.format).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# machine-minified JSON, keys pre-sorted, synthesized identically in
# both engines
_JSON_SPARK = (
    "concat('{\"meta\":{\"src\":\"', source, '\"},\"score\":', "
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT),"
    " ',\"tags\":[\"t', CAST(doc_id % 7 AS STRING), '\",\"t',"
    " CAST(doc_id % 3 AS STRING), '\"]}')"
)

_JSON_DUCK = (
    "'{\"meta\":{\"src\":\"' || source || '\"},\"score\":' ||"
    " (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))"
    "::BIGINT)::VARCHAR || ',\"tags\":[\"t' || (doc_id % 7)::VARCHAR ||"
    " '\",\"t' || (doc_id % 3)::VARCHAR || '\"]}'"
)


def variant_oracle(sf: str) -> str:
    return (
        "\n    WITH j AS (\n        SELECT doc_id AS id, "
        + _JSON_DUCK
        + "\n               AS js\n        FROM read_parquet('"
        + sf
        + "/documents.parquet')\n    )\n"
        + """    SELECT id,
           CAST(js->>'$.score' AS BIGINT) AS score,
           js->>'$.meta.src' AS src,
           js->>'$.tags[0]' AS first_tag,
           CAST(json_array_length(js, '$.tags') AS BIGINT) AS n_tags,
           js AS canonical
    FROM j
"""
    )


def _json_docs(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "documents", SF).select(
        "doc_id", F.expr(_JSON_SPARK).alias("js")
    )


def test_variant_shred_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        variant_shred_audit,
    )

    got = (
        variant_shred_audit(_json_docs(spark), "doc_id", "js")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(variant_oracle(SF))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_variant_shred_hand_values(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        variant_shred_audit,
    )

    df = spark.createDataFrame(
        [(1, '{"meta":{"src":"web"},"score":42,"tags":["ta","tb","tc"]}')],
        "doc_id long, js string",
    )
    [r] = variant_shred_audit(df, "doc_id", "js").collect()
    assert (r["score"], r["src"], r["first_tag"], r["n_tags"]) == (
        42,
        "web",
        "ta",
        3,
    )
    assert r["canonical"] == (
        '{"meta":{"src":"web"},"score":42,"tags":["ta","tb","tc"]}'
    )
