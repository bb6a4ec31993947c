"""Rule-table quality-gate audit — pre-validation for the round-11
registration queue (operators/text.py:rule_fail_audit /
rule_fail_counts).

C4/Gopher-style corpus filters as a config table: one pass emits a
per-doc failure bitmask; the per-rule rollup recovers counts FROM the
mask. Registration-ready oracle text in RULE_AUDIT_ORACLE (rule
constants embedded as literals — the seeded-constants trick; the only
dialect split is regexp_replace's 'g' flag).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# (name, spark_violation_expr, duckdb_violation_expr)
RULES = [
    ("too_short", "length(text) < 200", "length(text) < 200"),
    ("too_long", "length(text) > 1500", "length(text) > 1500"),
    (
        "digit_heavy",
        "(length(text) - length(regexp_replace(text, '[0-9]', ''))) * 10"
        " > length(text)",
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 10"
        " > length(text)",
    ),
    (
        "caps_heavy",
        "(length(text) - length(regexp_replace(text, '[A-Z]', ''))) * 5"
        " > length(text)",
        "(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 5"
        " > length(text)",
    ),
]

RULE_AUDIT_ORACLE = """
    SELECT doc_id AS id,
           CAST({mask} AS BIGINT) AS fail_mask,
           CAST({nf} AS BIGINT) AS n_fails
    FROM read_parquet('{sf}/documents.parquet')
""".replace(
    "{mask}",
    " + ".join(
        f"(CASE WHEN ({expr}) THEN {1 << i} ELSE 0 END)"
        for i, (_, _, expr) in enumerate(RULES)
    ),
).replace(
    "{nf}",
    " + ".join(
        f"(CASE WHEN ({expr}) THEN 1 ELSE 0 END)" for _, _, expr in RULES
    ),
)


def test_rule_audit_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import rule_fail_audit
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        rule_fail_audit(docs, "doc_id", [(n, e) for n, e, _ in RULES])
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(RULE_AUDIT_ORACLE.format(sf=SF))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["fail_mask"].sum() > 0  # some rule fires on real data
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_rule_counts_recover_from_mask(spark):
    """Per-rule rollup counts == direct per-rule evaluation counts."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.text import (
        rule_fail_audit,
        rule_fail_counts,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    spark_rules = [(n, e) for n, e, _ in RULES]
    audited = rule_fail_audit(docs, "doc_id", spark_rules)
    rollup = {
        r["rule_name"]: (r["n_fail"], r["n_docs"], r["fail_ppm"])
        for r in rule_fail_counts(audited, spark_rules).collect()
    }
    n_docs = docs.count()
    for name, expr in spark_rules:
        direct = docs.where(F.expr(expr)).count()
        assert rollup[name] == (
            direct,
            n_docs,
            (1_000_000 * direct) // n_docs,
        ), name


def test_rule_audit_hand_mask(spark):
    """Bit layout: doc violating rules 0 and 2 -> mask 1 + 4 = 5."""
    from kafka_streams_aggregate_spark.operators.text import rule_fail_audit

    df = spark.createDataFrame([(7, "ab1")], "doc_id long, text string")
    rules = [
        ("short", "length(text) < 5"),
        ("has_z", "text LIKE '%z%'"),
        ("has_digit", "text RLIKE '[0-9]'"),
    ]
    [r] = rule_fail_audit(df, "doc_id", rules).collect()
    assert (r["id"], r["fail_mask"], r["n_fails"]) == (7, 5, 2)
