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


# --------------------------------------------------------------------------
# Engine-row graduations (the bloom r11 / AQE r12 / scan-split r13
# precedent): test-pinned engine features become driver-hashed queries
# whose DATA is the assertion.
# --------------------------------------------------------------------------


@register(
    "q_rocksdb_changelog_restore",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           TRUE AS changelog_written
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "RocksDB changelog checkpointing, query-backed (graduating "
        "tests/test_scale_features.py:"
        "test_rocksdb_changelog_checkpointing_recovers): a streaming "
        "count+sum fold over events runs in TWO availableNow drains "
        "from the SAME checkpoint — half the rows, stop, append the "
        "other half, restart — under the RocksDB provider with "
        "changelogCheckpointing enabled (the production setting that "
        "makes commit cost O(batch changes), not O(state size), and "
        "the restart path every long-lived 100 TB streaming job "
        "exercises). The result is the FINAL STATE read back via the "
        "``statestore`` batch source (internal buffer field names "
        "count/sum, the r8 gotcha): if restart ever reset or "
        "half-recovered state, per-type counts cover only the second "
        "drain and the driver row goes red on DATA vs the oracle's "
        "whole-table aggregate. changelog_written pins that per-batch "
        ".changelog deltas actually appeared in the checkpoint. "
        "Conf restored; temp dirs removed after an eager "
        "localCheckpoint."
    ),
    tags=("streaming", "state-store", "engine-surface", "fault-tolerance"),
)
def q_rocksdb_changelog_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_rocksdb_clog_")
    src, ckpt = f"{work}/src", f"{work}/ckpt"
    confs = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    }
    # Pin a modest state-partition count for the drain: the vanilla
    # driver session defaults to 200 shuffle partitions, which would
    # make every microbatch a 200-task state stage over this
    # events-sized input (the q_state_store_read precedent).
    confs["spark.sql.shuffle.partitions"] = "16"
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        base = load_table(spark, "events", sf_dir).select(
            "event_id",
            "event_type",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )

        def drain():
            q = (
                spark.readStream.schema(
                    "event_id BIGINT, event_type STRING, cents BIGINT"
                )
                .parquet(src)
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("cents").alias("s"),
                )
                .writeStream.outputMode("update")
                .format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        for k, v in confs.items():
            spark.conf.set(k, v)
        base.where("event_id % 2 = 0").write.parquet(src)
        drain()
        changelogs = bool(
            glob.glob(ckpt + "/state/**/*.changelog", recursive=True)
        )
        base.where("event_id % 2 = 1").write.mode("append").parquet(src)
        drain()
        state = spark.read.format("statestore").load(ckpt)
        return (
            state.select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").cast("bigint").alias("n_events"),
                F.col("value.sum").cast("bigint").alias("sum_cents"),
            )
            .withColumn("changelog_written", F.lit(changelogs))
            .localCheckpoint(eager=True)
        )
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_cbo_stats_selectivity",
    oracle="""
    WITH b AS (
        SELECT min(o_orderkey) + (max(o_orderkey) - min(o_orderkey)) // 4
               AS cut
        FROM orders
    ),
    eq AS (
        SELECT 'priority_eq' AS predicate,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    rng AS (
        SELECT 'orderkey_range' AS predicate,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM orders, b WHERE o_orderkey < b.cut
    )
    SELECT predicate, n_rows, sum_cents,
           TRUE AS est_present, TRUE AS est_within_2x
    FROM eq
    UNION ALL
    SELECT predicate, n_rows, sum_cents,
           TRUE AS est_present, TRUE AS est_within_2x
    FROM rng
    """,
    doc=(
        "CBO/ANALYZE selectivity, query-backed (graduating "
        "tests/test_scale_features.py:"
        "test_cbo_statistics_drive_selectivity_estimates): orders is "
        "materialized as a catalog table, ANALYZE ... FOR ALL "
        "COLUMNS collects ndv/min/max, and with spark.sql.cbo.enabled "
        "the optimizer's Filter rowCount estimates become available — "
        "the statistics machinery that drives join reordering and "
        "broadcast decisions on a 1000-executor plan. Two predicate "
        "shapes: equality on o_orderpriority (estimate = total/ndv) "
        "and a range on o_orderkey at the 25% point (estimate from "
        "min/max interpolation; the cut is exact integer math both "
        "engines). The compared DATA is each predicate's actual "
        "count + cents sum computed THROUGH the analyzed table "
        "(probed within-2x at sf0.001/0.01/0.1: eq 300/273, range "
        "375/374 at sf0.001); est_present pins that ANALYZE stats "
        "actually produced a rowCount, est_within_2x pins estimate "
        "quality. Conf and catalog restored; temp dir removed after "
        "an eager localCheckpoint."
    ),
    tags=("scale", "cbo", "engine-surface", "statistics"),
)
def q_cbo_stats_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_cbo_")
    tbl = "t_ksa_cbo_r14"
    old_cbo = spark.conf.get("spark.sql.cbo.enabled")
    try:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, "orders", sf_dir)
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
            .write.option("path", f"{work}/t")
            .saveAsTable(tbl)
        )
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        t = spark.table(tbl)
        mn, mx = t.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
        cut = mn + (mx - mn) // 4

        def one(label: str, pred: str) -> DataFrame:
            filt = t.where(pred)
            st = filt._jdf.queryExecution().optimizedPlan().stats()
            rc = st.rowCount()
            est = int(str(rc.get())) if rc.isDefined() else None
            agg = filt.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
                .cast("bigint")
                .alias("sum_cents"),
            )
            [row] = agg.collect()
            act = row["n_rows"]
            within = (
                est is not None
                and act > 0
                and est <= 2 * act
                and act <= 2 * est
            )
            return spark.createDataFrame(
                [(label, act, row["sum_cents"], est is not None, within)],
                "predicate STRING, n_rows BIGINT, sum_cents BIGINT,"
                " est_present BOOLEAN, est_within_2x BOOLEAN",
            )

        result = (
            one("priority_eq", "o_orderpriority = '1-URGENT'")
            .unionAll(one("orderkey_range", f"o_orderkey < {cut}"))
            .localCheckpoint(eager=True)
        )
        return result
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old_cbo)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(work, ignore_errors=True)
