"""Round-14 registrations: the staged batch-3 queue (Cronbach's alpha,
Lin's CCC) graduating to driver-verified queries, plus this round's
fresh registrations as they land.

Every query wraps an operator that staged with unit tests and a
pre-validated cross-engine oracle text (tests/test_r14_stage3.py);
oracle SQL is the test file's registration-ready text with
``read_parquet`` refs swapped for the driver's pre-registered view
names. Spark derivations mirror the parity tests verbatim, so the
driver's hash check re-verifies exactly what the tests pinned at
sf0.001.

Reference scope note: the reference app (dturanski/
kafka-streams-aggregate, KafkaStreamsInventoryCountApplication.java:
69-85) has no batch-analytics surface — all rows here are
absent-category build-out per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table

# The TVD cut timestamp (2024-01-16 UTC) — shared with q_source_token_tvd
# and the CUPED pre/post split; events.ts is a true TIMESTAMP so
# unix_micros/epoch_us agree exactly (CLAUDE.md epoch rule).
_CUT_US = 1705363200000000

# --------------------------------------------------------------------------
# ML evaluation / reliability (operators/ml_eval.py; tests/test_r14_stage3.py)
# --------------------------------------------------------------------------


@register(
    "q_cronbach_alpha",
    oracle="""
    WITH base AS (
        SELECT user_id % 4 AS g, user_id AS u, event_type AS item,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events
        GROUP BY 1, 2, 3
    ),
    k_per AS (SELECT g, CAST(COUNT(DISTINCT item) AS BIGINT) AS k
              FROM base GROUP BY g),
    gate AS (
        SELECT b.g, b.u,
               COUNT(*) = MAX(k) AND COUNT(DISTINCT item) = MAX(k) AS ok
        FROM base b JOIN k_per ON k_per.g = b.g
        GROUP BY b.g, b.u
    ),
    gated AS (
        SELECT base.* FROM base
        JOIN gate ON gate.g = base.g AND gate.u = base.u
        WHERE gate.ok
    ),
    per_item AS (
        SELECT g, item, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s,
               SUM(CAST(v AS HUGEINT) * v) AS q
        FROM gated GROUP BY g, item
    ),
    item_vn AS (
        SELECT g, CAST(MAX(n) AS BIGINT) AS n_units,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(n AS HUGEINT) * q
                   - CAST(s AS HUGEINT) * s) AS vn_items
        FROM per_item GROUP BY g
    ),
    totals AS (
        SELECT g,
               CAST(COUNT(*) AS HUGEINT) * SUM(CAST(t AS HUGEINT) * t)
               - CAST(SUM(t) AS HUGEINT) * SUM(t) AS vn_total
        FROM (SELECT g, u, CAST(SUM(v) AS BIGINT) AS t
              FROM gated GROUP BY g, u)
        GROUP BY g
    ),
    dropped AS (
        SELECT g, CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_units_dropped
        FROM gate GROUP BY g
    )
    SELECT d.g AS group_key, n_units, k,
           CASE WHEN k >= 2 AND vn_total > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * k
                      * (vn_total - vn_items))
                     // ((k - 1) * vn_total) AS BIGINT) END AS alpha_ppm,
           n_units_dropped
    FROM dropped d
    LEFT JOIN item_vn i ON i.g = d.g
    LEFT JOIN totals t ON t.g = d.g
    """,
    doc=(
        "Cronbach's alpha per user cohort (units = users, items = "
        "event types, v = spend cents): internal-consistency "
        "reliability as ONE exact integer rational — population-"
        "variance numerators n*Q - S^2 computed AND cancelled on "
        "DECIMAL(38,0)/HUGEINT (the round-13 wide-int-cast rule), "
        "alpha_ppm floored once. Friedman-style complete-unit gate "
        "with dropped units reported. Scale: two groupBy passes over "
        "the (group, unit, item) rollup — group cardinality rows "
        "only, no window over raw events. tests/test_r14_stage3.py."
    ),
    tags=("ml-eval", "reliability", "exact-integer"),
)
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.ml_eval import cronbach_alpha

    base = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            (F.col("user_id") % 4).alias("g"),
            F.col("user_id").alias("u"),
            F.col("event_type").alias("item"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    return cronbach_alpha(base, "g", "u", "item", "v")


@register(
    "q_lin_ccc",
    oracle=f"""
    WITH u AS (
        SELECT user_id % 4 AS g,
               CAST(SUM(CASE WHEN epoch_us(ts) < {_CUT_US}
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) >= {_CUT_US}
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM events
        GROUP BY user_id
    ),
    m AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM u GROUP BY g
    )
    SELECT g AS group_key, n,
           CASE WHEN (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                      + CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
                      + (CAST(sx AS HUGEINT) - sy)
                        * (CAST(sx AS HUGEINT) - sy)) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * 2
                      * (CAST(n AS HUGEINT) * sxy
                         - CAST(sx AS HUGEINT) * sy))
                     // (CAST(n AS HUGEINT) * sxx
                         - CAST(sx AS HUGEINT) * sx
                         + CAST(n AS HUGEINT) * syy
                         - CAST(sy AS HUGEINT) * sy
                         + (CAST(sx AS HUGEINT) - sy)
                           * (CAST(sx AS HUGEINT) - sy)) AS BIGINT) END
               AS ccc_ppm
    FROM m
    """,
    doc=(
        "Lin's concordance correlation per cohort over pre/post-cut "
        "spend (the CUPED input shape): the method-AGREEMENT "
        "statistic Pearson r cannot be — CCC penalizes constant bias "
        "(y = x + 5 gives 666666 ppm where Pearson says 1.0). "
        "Multiplying through by n^2 makes CCC one integer rational "
        "over raw moments, cancelled on DECIMAL(38,0)/HUGEINT and "
        "floored once. Scale: one groupBy over events, one over "
        "users — no shuffle wider than user cardinality. "
        "tests/test_r14_stage3.py."
    ),
    tags=("ml-eval", "agreement", "exact-integer"),
)
def q_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.ml_eval import lin_ccc

    u = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN unix_micros(ts) < {_CUT_US}"
                " THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)"
                " AS BIGINT)"
            ).alias("x"),
            F.expr(
                f"CAST(SUM(CASE WHEN unix_micros(ts) >= {_CUT_US}"
                " THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)"
                " AS BIGINT)"
            ).alias("y"),
        )
        .select((F.col("user_id") % 4).alias("g"), "x", "y")
    )
    return lin_ccc(u, "g", "x", "y")
