"""Declared queries for the reference capability (SURVEY.md §2.2).

The driver `events` table stands in for the Kafka input topic with the
declared mapping: ``purchase -> INC``, ``error -> DEC``,
``signup -> REP``, other event types ignored; ``user_id`` is the
product key, ``event_id`` the fold order (Kafka offset stand-in), and
``delta = floor(value)`` (floor, not cast — Spark truncates while
DuckDB rounds on double->int casts, so the query pins the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators.inventory_fold import (
    inventory_count_fold,
    latest_per_key,
)
from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table, stream_events

ACTION_MAP_SQL = """
    CASE event_type
        WHEN 'purchase' THEN 'INC'
        WHEN 'error' THEN 'DEC'
        WHEN 'signup' THEN 'REP'
    END
"""


def _mapped_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return events.select(
        F.col("user_id").alias("product_code"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", "INC")
        .when(F.col("event_type") == "error", "DEC")
        .when(F.col("event_type") == "signup", "REP")
        .alias("action"),
        F.floor("value").cast("int").alias("delta"),
    )


@register(
    "q_agg_inventory",
    oracle=f"""
    WITH e AS (
        SELECT user_id AS product_code,
               event_id AS seq,
               {ACTION_MAP_SQL} AS action,
               CAST(floor(value) AS INTEGER) AS delta
        FROM events
    ), valid AS (
        SELECT * FROM e
        WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
    ), m AS (
        SELECT *,
               max(CASE WHEN action = 'REP' THEN seq END)
                   OVER (PARTITION BY product_code) AS last_rep_seq
        FROM valid
    )
    SELECT product_code,
           CAST(COALESCE(max(CASE WHEN seq = last_rep_seq THEN delta END), 0) AS BIGINT)
           + CAST(COALESCE(sum(CASE WHEN last_rep_seq IS NULL OR seq > last_rep_seq
                                    THEN CASE action WHEN 'INC' THEN delta
                                                     WHEN 'DEC' THEN -delta
                                                     ELSE 0 END
                               END), 0) AS BIGINT) AS "count"
    FROM m
    GROUP BY product_code
    """,
    doc="S3+S4: the reference's keyed INC/DEC/REP fold, batch closed form.",
    tags=("reference", "stateful-agg"),
)
def q_agg_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inventory_count_fold(_mapped_updates(spark, sf_dir))


@register(
    "q_upsert_latest",
    oracle="""
    SELECT user_id, value AS latest_value, event_id AS latest_seq
    FROM (
        SELECT user_id, value, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    doc="S5: KTable->changelog latest-per-key upsert semantics, batch twin.",
    tags=("reference", "upsert"),
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return latest_per_key(
        events.select(
            "user_id",
            F.col("value").alias("latest_value"),
            F.col("event_id").alias("latest_seq"),
        ),
        key_cols=["user_id"],
        order_col="latest_seq",
        value_cols=["latest_value", "latest_seq"],
    )


@register(
    "q_agg_inventory_stream",
    oracle=f"""
    WITH e AS (
        SELECT CAST(user_id AS VARCHAR) AS product_code,
               event_id AS seq,
               {ACTION_MAP_SQL} AS action,
               CAST(floor(value) AS INTEGER) AS delta
        FROM events
    ), valid AS (
        SELECT * FROM e
        WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
    ), m AS (
        SELECT *,
               max(CASE WHEN action = 'REP' THEN seq END)
                   OVER (PARTITION BY product_code) AS last_rep_seq
        FROM valid
    )
    SELECT product_code,
           CAST(COALESCE(max(CASE WHEN seq = last_rep_seq THEN delta END), 0) AS BIGINT)
           + CAST(COALESCE(sum(CASE WHEN last_rep_seq IS NULL OR seq > last_rep_seq
                                    THEN CASE action WHEN 'INC' THEN delta
                                                     WHEN 'DEC' THEN -delta
                                                     ELSE 0 END
                               END), 0) AS BIGINT) AS "count"
    FROM m
    GROUP BY product_code
    """,
    doc=(
        "The fold in its TRUE reference mode: a Structured Streaming "
        "stateful aggregation (applyInPandasWithState, update output "
        "mode) run to completion over the event stream, checked against "
        "the same SQL oracle as the batch closed form — proving "
        "batch/stream semantic parity end-to-end."
    ),
    tags=("reference", "stateful-agg", "streaming"),
)
def q_agg_inventory_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.streaming.inventory_stream import (
        streaming_inventory_fold,
    )

    work = tempfile.mkdtemp(prefix="ksa_stream_")
    src = f"{work}/src"
    # Stateful-query partitioning is pinned at checkpoint creation; the
    # key cardinality here (~1.5k at sf0.1) doesn't justify 32 state
    # stores + 32 Python workers per micro-batch, so pin a smaller
    # count for this fresh-checkpoint run and restore afterwards.
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, value double"
            ).parquet(src)
        )
        updates = raw.select(
            F.col("user_id").cast("string").alias("product_code"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "purchase", "INC")
            .when(F.col("event_type") == "error", "DEC")
            .when(F.col("event_type") == "signup", "REP")
            .alias("action"),
            F.floor("value").cast("int").alias("delta"),
        )
        folded = streaming_inventory_fold(updates)
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        committed = run_stream_committed(
            folded, work, "update", "product_code string, count bigint"
        )
        # Changelog contract: latest batch wins per key. localCheckpoint
        # materializes executor-side before the work dir is removed.
        w = Window.partitionBy("product_code").orderBy(F.col("_batch").desc())
        return (
            committed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("product_code", "count")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_tumbling_window_stream",
    oracle="""
    WITH agg AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)) AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2
    )
    SELECT * FROM agg
    WHERE window_start + INTERVAL 1 DAY <= (SELECT max(ts) FROM events)
    """,
    doc=(
        "Tumbling 1-day window aggregation run as a REAL stream "
        "(readStream + watermark + append mode): emits exactly the "
        "watermark-closed windows, which the oracle reproduces by "
        "filtering to windows whose end precedes max(ts)."
    ),
    tags=("reference", "streaming", "streaming-window"),
)
def q_tumbling_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_winstream_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("ts", "event_type"))
        agg = (
            raw.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                F.col("window.start").alias("window_start"), "event_type", "n"
            )
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            agg, work, "append",
            "window_start timestamp, event_type string, n bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_stream_static_join",
    oracle="""
    WITH e AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)) AS window_start,
               user_id, value
        FROM events
    )
    SELECT e.window_start, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(e.value) AS BIGINT)) AS BIGINT) AS total_units
    FROM e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE e.window_start + INTERVAL 1 DAY <= (SELECT max(ts) FROM events)
    GROUP BY e.window_start, n.n_name
    """,
    doc=(
        "Stream-static join: the event stream enriched against the "
        "static customer->nation dimensions inside a real readStream "
        "(watermark + append), then windowed per nation. Nation (fixed "
        "25 rows) is broadcast; customer is left unhinted so Catalyst "
        "sizes the per-micro-batch join strategy — the dimension grows "
        "with scale factor."
    ),
    tags=("streaming", "join", "streaming-window"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_ssjoin_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("ts", "user_id", "value"))
        cust = load_table(spark, "customer", sf_dir).select(
            "c_custkey", "c_nationkey"
        )
        nat = load_table(spark, "nation", sf_dir).select(
            "n_nationkey", "n_name"
        )
        enriched = (
            raw.withWatermark("ts", "0 seconds")
            .join(cust, raw["user_id"] == cust["c_custkey"])
            .join(F.broadcast(nat), F.col("c_nationkey") == nat["n_nationkey"])
        )
        agg = (
            enriched.groupBy(F.window("ts", "1 day"), "n_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.floor("value")).cast("bigint").alias("total_units"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                "n_name",
                "n_events",
                "total_units",
            )
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            agg, work, "append",
            "window_start timestamp, n_name string, n_events bigint, "
            "total_units bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(floor((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000) AS BIGINT)
               AS gap_seconds
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    doc=(
        "Stream-stream interval join (the hardest Structured Streaming "
        "join): clicks joined to purchases by the same user within one "
        "hour of event time, both sides watermarked so the join state "
        "is bounded — Spark drops a buffered click once the purchase "
        "watermark passes click.ts + 1h. The reference has no stream-"
        "stream join (single-topic topology); this is the §2.3 build-"
        "out for multi-stream correlation. Inner join in append mode "
        "emits each matched pair exactly once."
    ),
    tags=("streaming", "join", "stream-stream"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_ssjn_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("event_id", "ts", "user_id", "event_type"))
        clicks = (
            raw.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
                F.col("user_id").alias("c_user"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            raw.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("user_id").alias("p_user"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + interval 1 hour"
            ),
        ).select(
            "click_id",
            "purchase_id",
            F.col("c_user").alias("user_id"),
            (
                (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
                / F.lit(1000000)
            )
            .cast("bigint")
            .alias("gap_seconds"),
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            joined, work, "append",
            "click_id bigint, purchase_id bigint, user_id bigint, "
            "gap_seconds bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_agg_inventory_nullsafe",
    oracle=f"""
    WITH e AS (
        SELECT user_id AS product_code,
               event_id AS seq,
               {ACTION_MAP_SQL} AS action,
               CASE WHEN value IS NULL OR event_id % 7 = 0 THEN NULL
                    ELSE CAST(floor(value) AS INTEGER) END AS delta
        FROM events
    ), valid AS (
        SELECT * FROM e
        WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
    ), m AS (
        SELECT *,
               max(CASE WHEN action = 'REP' THEN seq END)
                   OVER (PARTITION BY product_code) AS last_rep_seq
        FROM valid
    )
    SELECT product_code,
           CAST(COALESCE(max(CASE WHEN seq = last_rep_seq THEN delta END), 0) AS BIGINT)
           + CAST(COALESCE(sum(CASE WHEN last_rep_seq IS NULL OR seq > last_rep_seq
                                    THEN CASE action WHEN 'INC' THEN delta
                                                     WHEN 'DEC' THEN -delta
                                                     ELSE 0 END
                               END), 0) AS BIGINT) AS "count"
    FROM m
    GROUP BY product_code
    """,
    doc=(
        "Null-value-record drop rule (SURVEY.md §2.1): rows with "
        "event_id %% 7 == 0 are nulled to model tombstone records from the "
        "reference test generator's reset(); the fold must skip them."
    ),
    tags=("reference", "stateful-agg", "null-handling"),
)
def q_agg_inventory_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    updates = events.select(
        F.col("user_id").alias("product_code"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", "INC")
        .when(F.col("event_type") == "error", "DEC")
        .when(F.col("event_type") == "signup", "REP")
        .alias("action"),
        F.when(
            F.col("value").isNull() | (F.col("event_id") % 7 == 0), F.lit(None)
        )
        .otherwise(F.floor("value"))
        .cast("int")
        .alias("delta"),
    )
    return inventory_count_fold(updates)


@register(
    "q_stream_dedup_window",
    oracle="""
    WITH e AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT))
                 AS window_start,
               event_type
        FROM events
    )
    SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM e
    WHERE window_start + INTERVAL 1 DAY
          <= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY window_start, event_type
    """,
    doc=(
        "Streaming exact deduplication in a live pipeline: the source "
        "directory holds TWO copies of the event file, and "
        "dropDuplicatesWithinWatermark('event_id') removes the echo "
        "before a tumbling-window count — the at-least-once-delivery "
        "repair every Kafka-fed pipeline needs (the reference inherits "
        "exactly-once from Kafka Streams; Spark gets it from watermarked "
        "dedup state, which is dropped once the watermark passes "
        "event_ts + 7d instead of growing forever like plain "
        "dropDuplicates). Oracle: the deduped double == the original "
        "events, windowed, restricted to windows the 7-day watermark "
        "closed. Both file copies arrive in one availableNow batch."
    ),
    tags=("streaming", "dedup", "streaming-window", "watermark"),
)
def q_stream_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_sdedup_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/e1.parquet")
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/e2.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("event_id", "ts", "event_type"))
        deduped = raw.withWatermark("ts", "7 days").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        agg = (
            deduped.groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                F.col("window.start").alias("window_start"), "event_type", "n"
            )
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            agg, work, "append",
            "window_start timestamp, event_type string, n bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_custom_source_inventory",
    oracle=f"""
    WITH e AS (
        SELECT CAST(user_id AS VARCHAR) AS product_code,
               event_id AS seq,
               {ACTION_MAP_SQL} AS action,
               CAST(floor(value) AS INTEGER) AS delta
        FROM events
    ), valid AS (
        SELECT * FROM e
        WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
    ), m AS (
        SELECT *,
               max(CASE WHEN action = 'REP' THEN seq END)
                   OVER (PARTITION BY product_code) AS last_rep_seq
        FROM valid
    )
    SELECT product_code,
           CAST(COALESCE(max(CASE WHEN seq = last_rep_seq THEN delta END), 0) AS BIGINT)
           + CAST(COALESCE(sum(CASE WHEN last_rep_seq IS NULL OR seq > last_rep_seq
                                    THEN CASE action WHEN 'INC' THEN delta
                                                     WHEN 'DEC' THEN -delta
                                                     ELSE 0 END
                               END), 0) AS BIGINT) AS "count"
    FROM m
    GROUP BY product_code
    """,
    doc=(
        "S1 as a runnable source: the reference consumes a Kafka topic "
        "from offset 0; with no broker in the sandbox, this feeds the "
        "same INC/DEC/REP stateful fold from a custom Spark 4 Python "
        "DataSource (sources/eventlog_source.py) that speaks Kafka's "
        "consumer contract — monotonic offsets, checkpoint-recovered "
        "ranges, partitioned Arrow-batch reads. Same oracle as "
        "q_agg_inventory_stream: the transport must not change the "
        "fold's result."
    ),
    tags=("reference", "source", "streaming", "stateful-agg"),
)
def q_custom_source_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        register_eventlog_source,
    )
    from kafka_streams_aggregate_spark.streaming.inventory_stream import (
        streaming_inventory_fold,
    )

    register_eventlog_source(spark)
    work = tempfile.mkdtemp(prefix="ksa_evsrc_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = (
            spark.readStream.format("eventlog")
            .option("path", f"{sf_dir}/events.parquet")
            .load()
        )
        updates = raw.select(
            F.col("user_id").cast("string").alias("product_code"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "purchase", "INC")
            .when(F.col("event_type") == "error", "DEC")
            .when(F.col("event_type") == "signup", "REP")
            .alias("action"),
            F.floor("value").cast("int").alias("delta"),
        )
        folded = streaming_inventory_fold(updates)
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        committed = run_stream_committed(
            folded, work, "update", "product_code string, count bigint"
        )
        w = Window.partitionBy("product_code").orderBy(F.col("_batch").desc())
        return (
            committed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("product_code", "count")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_cdc_merge_stream",
    oracle="""
    WITH ch AS (
        SELECT user_id, event_id AS seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM events
    ), latest AS (
        SELECT user_id,
               max(seq) AS latest_seq,
               max_by(op, seq) AS op,
               max_by(value, seq) AS latest_value
        FROM ch GROUP BY user_id
    )
    SELECT user_id, latest_seq, latest_value
    FROM latest WHERE op = 'U'
    """,
    doc=(
        "Streaming MERGE (CDC upsert/delete) into a copy-on-write "
        "hash-bucketed parquet snapshot with an atomic versioned "
        "manifest — the Delta/Hudi table shape from first principles: "
        "per micro-batch the changelog conflates latest-per-key, only "
        "touched buckets rewrite, deletes persist as tombstones until "
        "read-time filtering, so the merged state is independent of "
        "batch boundaries (latest-by-seq over all batches) and directly "
        "SQL-oracle-able. maxFilesPerTrigger=1 forces a genuinely "
        "multi-batch merge over a two-file source."
    ),
    tags=("streaming", "cdc", "merge", "sink"),
)
def q_cdc_merge_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.operators.cdc_merge import merge_cdc_stream
    from kafka_streams_aggregate_spark.sources.tables import stream_events

    work = tempfile.mkdtemp(prefix="ksa_cdcmerge_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        # Two source files -> with maxFilesPerTrigger=1, two micro-batches
        # whose key sets overlap: the second batch MUST merge against the
        # first's committed buckets for the result to be right.
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/e1.parquet")
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/e2.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(
            spark, src, ("event_id", "user_id", "value"),
            options={"maxFilesPerTrigger": "1"},
        )
        changes = raw.select(
            "user_id",
            F.col("event_id").alias("seq"),
            F.when(
                F.pmod(F.floor(F.col("value") * 10).cast("bigint"), F.lit(7)) == 0,
                F.lit("D"),
            )
            .otherwise(F.lit("U"))
            .alias("op"),
            "value",
        )
        snap = merge_cdc_stream(
            changes, work,
            key_col="user_id", seq_col="seq", op_col="op",
            value_cols=("value",), n_buckets=16,
        )
        return (
            snap.filter(F.col("op") != "D")
            .select(
                "user_id",
                F.col("seq").alias("latest_seq"),
                F.col("value").alias("latest_value"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


def _stage_two_batch_log(spark: SparkSession, sf_dir: str, work: str) -> str:
    """Stage the two-file CDC changelog on disk and return its path:
    file 1 is the full events log, file 2 a correction (user_id < 50,
    seq offset +2e9, value +1000) whose LATER mtime makes an
    oldest-first file stream read it second. The staged directory IS
    the durable changelog — replay consumers re-read it from offset 0."""
    import glob
    import os
    import shutil

    from kafka_streams_aggregate_spark.sources.tables import load_table

    src = f"{work}/src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/e1.parquet")
    corr_dir = f"{work}/corr"
    (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 50)
        .select(
            (F.col("event_id") + 2_000_000_000).alias("event_id"),
            "user_id",
            (F.col("value") + 1000.0).alias("value"),
        )
        .coalesce(1)
        .write.parquet(corr_dir)
    )
    [part] = glob.glob(f"{corr_dir}/part-*.parquet")
    shutil.move(part, f"{src}/e2.parquet")
    now = os.path.getmtime(f"{src}/e1.parquet")
    os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
    os.utime(f"{src}/e2.parquet", (now + 100, now + 100))
    return src


def _tag_cdc_stream(spark: SparkSession, src: str, options=None):
    """Read the staged changelog as a stream and apply the op-tagging
    arithmetic. One owner for the seq-offset/op rules — consumers
    diverging on them would silently de-sync their oracles.
    ``options`` defaults to one-file-per-micro-batch; pass ``{}`` to
    consume the whole log in a single batch (replay/backfill path)."""
    from kafka_streams_aggregate_spark.sources.tables import stream_events

    raw = stream_events(
        spark, src, ("event_id", "user_id", "value"),
        options={"maxFilesPerTrigger": "1"} if options is None else options,
    )
    return raw.select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(
            F.pmod(F.floor(F.col("value") * 10).cast("bigint"), F.lit(7))
            == 0,
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )


def _two_batch_cdc_source(spark: SparkSession, sf_dir: str, work: str):
    """Stage the two-micro-batch CDC changelog and return the tagged
    ``changes`` streaming DataFrame (one file per micro-batch) —
    the shared source of the time-travel / vacuum / MOR queries."""
    return _tag_cdc_stream(spark, _stage_two_batch_log(spark, sf_dir, work))


@register(
    "q_time_travel_read",
    oracle="""
    WITH base AS (
        SELECT user_id, event_id AS seq, value FROM events
    ),
    corr AS (
        SELECT user_id, event_id + 2000000000 AS seq,
               value + 1000.0 AS value
        FROM events WHERE user_id < 50
    ),
    tag_v0 AS (
        SELECT user_id, seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM base
    ),
    tag_v1 AS (
        SELECT user_id, seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM (SELECT * FROM base UNION ALL SELECT * FROM corr)
    ),
    v0 AS (
        SELECT user_id, max(seq) AS seq,
               max_by(op, seq) AS op, max_by(value, seq) AS value
        FROM tag_v0 GROUP BY user_id
    ),
    v1 AS (
        SELECT user_id, max(seq) AS seq,
               max_by(op, seq) AS op, max_by(value, seq) AS value
        FROM tag_v1 GROUP BY user_id
    ),
    v0_live AS (SELECT * FROM v0 WHERE op = 'U'),
    v1_live AS (SELECT * FROM v1 WHERE op = 'U')
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           a.seq AS first_seq, a.value AS first_value,
           b.seq AS latest_seq, b.value AS latest_value,
           COALESCE(a.value, -1.0) <> COALESCE(b.value, -1.0) AS changed
    FROM v0_live a FULL OUTER JOIN v1_live b ON a.user_id = b.user_id
    """,
    doc=(
        "Time travel over the copy-on-write CDC table: two micro-"
        "batches (the base changelog, then a correction batch touching "
        "user_id < 50) commit manifest versions v0 and v1; the query "
        "reads the snapshot AS OF the first committed version through "
        "its retained manifest and full-outer-diffs it against the "
        "latest. COW means superseded bucket files are never mutated, "
        "so every committed manifest stays readable until a vacuum — "
        "exactly the mechanism behind Delta/Iceberg VERSION AS OF. "
        "The oracle recomputes both versions from the changelog "
        "arithmetic (latest-by-seq over the base prefix vs over "
        "everything), so batch ordering, manifest retention, and the "
        "as-of read path are all hash-verified. Scale shape: a time-"
        "travel read costs the same as a current read — one manifest "
        "fetch + bucket scans; the diff joins two bucket-pruned "
        "snapshots on the bucketing key."
    ),
    tags=("streaming", "cdc", "time-travel", "lakehouse"),
)
def q_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        manifest_versions,
        merge_cdc_stream,
        read_snapshot_as_of,
    )

    work = tempfile.mkdtemp(prefix="ksa_timetravel_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        changes = _two_batch_cdc_source(spark, sf_dir, work)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        latest = merge_cdc_stream(
            changes, work,
            key_col="user_id", seq_col="seq", op_col="op",
            value_cols=("value",), n_buckets=16,
        )
        versions = manifest_versions(f"{work}/cow")
        assert len(versions) >= 2, f"expected >=2 committed versions: {versions}"
        ddl = "user_id bigint, seq bigint, op string, value double"
        first = read_snapshot_as_of(spark, f"{work}/cow", versions[0], ddl)

        def live(df: DataFrame, seq_alias: str, val_alias: str) -> DataFrame:
            return df.filter(F.col("op") != "D").select(
                "user_id",
                F.col("seq").alias(seq_alias),
                F.col("value").alias(val_alias),
            )

        a = live(first, "first_seq", "first_value")
        b = live(latest, "latest_seq", "latest_value")
        diff = a.alias("a").join(
            b.alias("b"), F.col("a.user_id") == F.col("b.user_id"),
            "full_outer",
        ).select(
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
            "first_seq",
            "first_value",
            "latest_seq",
            "latest_value",
            (
                F.coalesce(F.col("first_value"), F.lit(-1.0))
                != F.coalesce(F.col("latest_value"), F.lit(-1.0))
            ).alias("changed"),
        )
        return diff.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_cdc_vacuum",
    oracle="""
    WITH all_ch AS (
        SELECT user_id, event_id AS seq, value FROM events
        UNION ALL
        SELECT user_id, event_id + 2000000000 AS seq, value + 1000.0
        FROM events WHERE user_id < 50
    ),
    tagged AS (
        SELECT user_id, seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM all_ch
    ),
    latest AS (
        SELECT user_id, max(seq) AS latest_seq,
               max_by(op, seq) AS op, max_by(value, seq) AS latest_value
        FROM tagged GROUP BY user_id
    )
    SELECT user_id, latest_seq, latest_value,
           CAST(2 AS BIGINT) AS versions_before,
           CAST(1 AS BIGINT) AS versions_after
    FROM latest WHERE op = 'U'
    """,
    doc=(
        "VACUUM for the COW table — the third table service beside "
        "compaction and time travel: after the two-batch merge commits "
        "v0 and v1, retain only the latest manifest and delete every "
        "bucket dir no retained version references, then RE-READ the "
        "latest snapshot from surviving files. The correctness trap "
        "vacuum must dodge is that untouched buckets are SHARED "
        "across versions by manifest pointer — an implementation that "
        "deletes 'old versions' by directory age corrupts the live "
        "table, and THIS oracle catches it: the compared rows come "
        "from the post-vacuum disk read, so any wrongly-deleted "
        "shared bucket breaks the hash (bucket membership itself is "
        "murmur-hash-dependent and deliberately not compared). "
        "versions_before/after pin the manifest lifecycle."
    ),
    tags=("streaming", "cdc", "vacuum", "lakehouse"),
)
def q_cdc_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        manifest_versions,
        merge_cdc_stream,
        read_snapshot_as_of,
        vacuum_snapshots,
    )

    work = tempfile.mkdtemp(prefix="ksa_vacuum_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        changes = _two_batch_cdc_source(spark, sf_dir, work)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        merge_cdc_stream(
            changes, work,
            key_col="user_id", seq_col="seq", op_col="op",
            value_cols=("value",), n_buckets=16,
        )
        out = f"{work}/cow"
        stats = vacuum_snapshots(out, keep=1)
        [retained] = manifest_versions(out)
        # the proof: latest must read back whole from SURVIVING files
        ddl = "user_id bigint, seq bigint, op string, value double"
        after = read_snapshot_as_of(spark, out, retained, ddl)
        return (
            after.filter(F.col("op") != "D")
            .select(
                "user_id",
                F.col("seq").alias("latest_seq"),
                F.col("value").alias("latest_value"),
                F.lit(stats["versions_before"]).cast("bigint").alias(
                    "versions_before"
                ),
                F.lit(stats["versions_after"]).cast("bigint").alias(
                    "versions_after"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_compacted_upsert_tombstones",
    oracle="""
    WITH latest AS (
        SELECT user_id, event_type, value, event_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           value AS latest_value,
           event_id AS latest_seq
    FROM latest
    WHERE rn = 1 AND event_type <> 'error'
    """,
    doc=(
        "S5 extension — log-compaction WITH TOMBSTONES, the full "
        "KTable delete contract (Kafka log cleaner semantics: a "
        "key whose most recent record is a tombstone disappears from "
        "the compacted topic; an older tombstone is superseded by any "
        "later upsert). 'error' events play the tombstone role over "
        "the events table. Reduction: one latest-per-key window "
        "(WindowGroupLimit pushes the rn=1 filter into the sort), "
        "then drop keys whose survivor is a tombstone — two "
        "predicates, one exchange, no joins; at scale this is the "
        "same shape as reading a compacted changelog topic into a "
        "snapshot. Cites reference semantics: "
        "InventoryCountUpdateEventUpdater.java handles the "
        "delete-on-invalid-action case the same way (SURVEY.md S4d)."
    ),
    tags=("reference", "upsert", "cdc"),
)
def q_compacted_upsert_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        events.select("user_id", "event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("value").alias("latest_value"),
            F.col("event_id").alias("latest_seq"),
        )
    )


@register(
    "q_cdc_merge_mor",
    oracle="""
    WITH all_ch AS (
        SELECT user_id, event_id AS seq, value FROM events
        UNION ALL
        SELECT user_id, event_id + 2000000000 AS seq, value + 1000.0
        FROM events WHERE user_id < 50
    ),
    tagged AS (
        SELECT user_id, seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM all_ch
    ),
    latest AS (
        SELECT user_id, max(seq) AS latest_seq,
               max_by(op, seq) AS op, max_by(value, seq) AS latest_value
        FROM tagged GROUP BY user_id
    )
    SELECT user_id, latest_seq, latest_value,
           TRUE AS base_intact,
           CAST(1 AS BIGINT) AS delta_batches
    FROM latest WHERE op = 'U'
    """,
    doc=(
        "Merge-on-READ complement (round 8) of the copy-on-write CDC "
        "merge: batch 0 commits an immutable hash-bucketed base; the "
        "correction batch appends ONLY a small delta file set plus a "
        "key-only DELETION VECTOR — no base bucket is rewritten, and "
        "that immutability is itself hash-verified: the operator re-"
        "fingerprints the base layer (file names + sizes) at every "
        "delta commit and the compared base_intact column comes from "
        "the committed manifest, so a write path that touched base "
        "files breaks the hash. The read resolves layers lazily: each "
        "layer broadcast-ANTI-joins the union of all LATER deletion "
        "vectors (Delta/Iceberg DV semantics), survivors union, "
        "tombstones filter last. Scale shape: write amplification per "
        "batch is O(batch), not O(touched buckets) — a hot-key stream "
        "against a petabyte base appends kilobytes; the read pays a "
        "broadcast anti-join against DVs bounded by compaction "
        "cadence (compact_mor folds deltas back into a new base; "
        "unit-tested in tests/test_partitioned_sink.py). Oracle: the "
        "same latest-by-seq changelog arithmetic as q_cdc_merge_stream "
        "over base+correction."
    ),
    tags=("streaming", "cdc", "merge-on-read", "lakehouse"),
)
def q_cdc_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merge_cdc_stream_mor,
        read_mor_snapshot,
    )

    work = tempfile.mkdtemp(prefix="ksa_cdcmor_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        changes = _two_batch_cdc_source(spark, sf_dir, work)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        out = merge_cdc_stream_mor(
            changes, work,
            key_col="user_id", seq_col="seq", op_col="op",
            value_cols=("value",), n_buckets=16,
        )
        ddl = "user_id bigint, seq bigint, op string, value double"
        snap, manifest = read_mor_snapshot(spark, out, "user_id", ddl)
        assert manifest["deltas"], "expected >=1 delta layer"
        return (
            snap.filter(F.col("op") != "D")
            .select(
                "user_id",
                F.col("seq").alias("latest_seq"),
                F.col("value").alias("latest_value"),
                F.lit(bool(manifest["base_intact"])).alias("base_intact"),
                F.lit(len(manifest["deltas"])).cast("bigint").alias(
                    "delta_batches"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_stream_stream_left_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, ts AS click_ts, user_id
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, ts AS purchase_ts, user_id
        FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id,
               CAST(floor((epoch_us(p.purchase_ts) - epoch_us(c.click_ts))
                          / 1000000) AS BIGINT) AS gap_seconds
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    ),
    wm AS (
        SELECT least((SELECT max(click_ts) FROM c),
                     (SELECT max(purchase_ts) FROM p))
               - INTERVAL 1 HOUR AS w
    )
    SELECT click_id, purchase_id, user_id, gap_seconds FROM matched
    UNION ALL
    SELECT c.click_id, CAST(NULL AS BIGINT), c.user_id,
           CAST(NULL AS BIGINT)
    FROM c, wm
    WHERE c.click_id NOT IN (SELECT click_id FROM matched)
      AND c.click_ts + INTERVAL 1 HOUR < wm.w
    """,
    doc=(
        "Stream-stream LEFT OUTER interval join (round 8) — the "
        "outer complement of q_stream_stream_join and the part "
        "watermarks exist for: a click with no purchase within its "
        "1-hour horizon emits a NULL-padded row, but only once the "
        "global watermark (min over both streams' max event time, "
        "minus the 1h delay) passes the click's join horizon — "
        "before that the row sits in state awaiting a match. Clicks "
        "whose horizon the final watermark never clears stay "
        "unemitted (state retained at stream end), and the oracle "
        "reproduces exactly that boundary: unmatched AND click_ts + "
        "1h < least(max_click, max_purchase) - 1h. The no-data "
        "micro-batch after the availableNow drain is what advances "
        "the watermark and flushes the NULL rows. Inner matches "
        "emit immediately, append-mode, exactly once. State stays "
        "bounded at scale: both sides evict at the same horizon "
        "the NULL emission fires on."
    ),
    tags=("streaming", "join", "stream-stream", "outer"),
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_ssjl_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("event_id", "ts", "user_id", "event_type"))
        clicks = (
            raw.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
                F.col("user_id").alias("c_user"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            raw.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("user_id").alias("p_user"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + interval 1 hour"
            ),
            "left_outer",
        ).select(
            "click_id",
            "purchase_id",
            F.col("c_user").alias("user_id"),
            (
                (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
                / F.lit(1000000)
            )
            .cast("bigint")
            .alias("gap_seconds"),
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            joined, work, "append",
            "click_id bigint, purchase_id bigint, user_id bigint, "
            "gap_seconds bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_state_store_read",
    oracle="""
    WITH wm AS (
        SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events
    ),
    agg AS (
        SELECT date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT window_end, event_type, n
    FROM agg, wm WHERE agg.window_end > wm.w
    """,
    doc=(
        "Offline state-store introspection (round 8) via Spark's "
        "``statestore`` batch source: after an availableNow tumbling-"
        "window count drains, the query reads the checkpoint's state "
        "store DIRECTLY as a DataFrame — the streaming-ops debugging "
        "surface (inspect live state without touching the running "
        "query). What remains in state after an append-mode drain is "
        "precisely the windows the final watermark has NOT closed, "
        "so the oracle is the tail predicate window_end > max(ts) - "
        "1h over a batch recompute — the state content, eviction "
        "behavior, and the read path are all hash-verified. Scale "
        "note: the state source reads RocksDB/HDFS state files "
        "partition-parallel, so state of any size is inspectable "
        "without replaying the stream."
    ),
    tags=("streaming", "state-store", "ops"),
)
def q_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_ssread_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("event_id", "ts", "event_type"))
        agg = (
            raw.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            _await_drained,
        )

        _await_drained(q, 300)
        state = spark.read.format("statestore").load(f"{work}/ckpt")
        return (
            state.select(
                F.col("key.window.end").alias("window_end"),
                F.col("key.event_type").alias("event_type"),
                # the state value struct carries the aggregation
                # buffer's internal field name (`count`), not the
                # query-level alias
                F.col("value.count").cast("bigint").alias("n"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_cdc_mor_changes",
    oracle="""
    WITH base AS (
        SELECT user_id,
               max_by(CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                           THEN 'D' ELSE 'U' END, event_id) AS op
        FROM events GROUP BY user_id
    ),
    base_live AS (SELECT user_id FROM base WHERE op = 'U'),
    corr AS (
        SELECT CASE WHEN user_id % 5 = 0 THEN user_id + 1000000
                    ELSE user_id END AS user_id,
               event_id + 2000000000 AS seq,
               value + 1000.0 AS value
        FROM events WHERE user_id < 50
    ),
    tagged AS (
        SELECT user_id, seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM corr
    ),
    conf AS (
        SELECT user_id, max(seq) AS seq,
               max_by(op, seq) AS op, max_by(value, seq) AS value
        FROM tagged GROUP BY user_id
    )
    SELECT c.user_id, c.seq, c.value,
           CASE WHEN c.op = 'D' THEN 'delete'
                WHEN b.user_id IS NOT NULL THEN 'update'
                ELSE 'insert' END AS change_type
    FROM conf c LEFT JOIN base_live b ON c.user_id = b.user_id
    """,
    doc=(
        "Change-data-feed over the merge-on-read table (round 8) — "
        "Delta's table_changes shape: every delta-layer row is a "
        "change event classified against the base's LIVE key set "
        "(op='D' -> delete; upsert on a live base key -> update; "
        "upsert on an absent or base-tombstoned key -> insert; "
        "deletes are idempotent). The correction batch shifts every "
        "5th user to a brand-new key so all three change types "
        "genuinely occur (the vacuous-branch lesson from the q22 "
        "audit). CDF reads ONLY the delta + base layers — no "
        "snapshot resolution, no rewrite; the base live-key lookup "
        "broadcasts. Oracle recomputes the conflated correction "
        "batch and the base liveness from changelog arithmetic."
    ),
    tags=("streaming", "cdc", "merge-on-read", "cdf"),
)
def q_cdc_mor_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merge_cdc_stream_mor,
        read_mor_changes,
    )

    work = tempfile.mkdtemp(prefix="ksa_morcdf_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/e1.parquet")
        corr_dir = f"{work}/corr"
        (
            load_table(spark, "events", sf_dir)
            .filter(F.col("user_id") < 50)
            .select(
                (F.col("event_id") + 2_000_000_000).alias("event_id"),
                F.when(
                    F.col("user_id") % 5 == 0, F.col("user_id") + 1_000_000
                )
                .otherwise(F.col("user_id"))
                .alias("user_id"),
                (F.col("value") + 1000.0).alias("value"),
            )
            .coalesce(1)
            .write.parquet(corr_dir)
        )
        [part] = glob.glob(f"{corr_dir}/part-*.parquet")
        shutil.move(part, f"{src}/e2.parquet")
        now = os.path.getmtime(f"{src}/e1.parquet")
        os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
        os.utime(f"{src}/e2.parquet", (now + 100, now + 100))
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        raw = stream_events(
            spark, src, ("event_id", "user_id", "value"),
            options={"maxFilesPerTrigger": "1"},
        )
        changes = raw.select(
            "user_id",
            F.col("event_id").alias("seq"),
            F.when(
                F.pmod(F.floor(F.col("value") * 10).cast("bigint"), F.lit(7))
                == 0,
                F.lit("D"),
            )
            .otherwise(F.lit("U"))
            .alias("op"),
            "value",
        )
        out = merge_cdc_stream_mor(
            changes, work,
            key_col="user_id", seq_col="seq", op_col="op",
            value_cols=("value",), n_buckets=16,
        )
        ddl = "user_id bigint, seq bigint, op string, value double"
        cdf = read_mor_changes(spark, out, "user_id", "op", ddl)
        return (
            cdf.select("user_id", "seq", "value", "change_type")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_hopping_window_stream",
    oracle="""
    WITH starts AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(
                       (floor(epoch(ts) / 86400) - g.k) * 86400
                   AS BIGINT)) AS window_start,
               event_type
        FROM events, (SELECT unnest([0, 1]) AS k) g
    ),
    agg AS (
        SELECT window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM starts GROUP BY 1, 2
    )
    SELECT * FROM agg
    WHERE window_start + INTERVAL 2 DAY <= (SELECT max(ts) FROM events)
    """,
    doc=(
        "HOPPING (sliding) window streaming aggregation (round 8) — "
        "2-day windows sliding by 1 day, so every event lands in "
        "exactly TWO overlapping windows: the overlap factor is the "
        "state/throughput trade tumbling windows don't have "
        "(len/slide state entries and output rows per key). Run as "
        "a real stream (watermark + append mode); the oracle "
        "expands each event to its two member window starts "
        "(floor(epoch/slide)*slide - k*slide) and filters to "
        "watermark-closed windows (end <= max ts) exactly like the "
        "tumbling twin. At scale the per-window partial aggregates "
        "are map-side combinable; state is len/slide counters per "
        "(window, key)."
    ),
    tags=("streaming", "streaming-window", "hopping"),
)
def q_hopping_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_hopstream_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("ts", "event_type"))
        agg = (
            raw.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "2 days", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                F.col("window.start").alias("window_start"), "event_type", "n"
            )
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            agg, work, "append",
            "window_start timestamp, event_type string, n bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_session_window_stream",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                    THEN 1 ELSE 0 END AS st
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, ts,
               SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    sess AS (
        SELECT user_id, sid,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, sid
    )
    SELECT session_start, session_end, user_id, n_events
    FROM sess, (SELECT max(ts) AS mx FROM events)
    WHERE session_end < mx
    """,
    doc=(
        "NATIVE streaming session windows (round 8) — completing the "
        "sessionization trio (batch islands, custom "
        "applyInPandasWithState changelog + TTL eviction, and now "
        "the engine-managed session_window aggregate): 30-minute-gap "
        "sessions merged by Spark's session-window state store and "
        "emitted in append mode once the watermark passes the "
        "session end (last event + gap). The oracle is the batch "
        "gaps-and-islands reduction filtered to watermark-closed "
        "sessions (end < max ts at 0s delay) — emission boundary "
        "verified empirically and hash-pinned; each user's trailing "
        "open session correctly stays in state unemitted. Scale: "
        "session merge is Spark-managed state keyed by (user, "
        "window); gap-merge happens in the state store, not a "
        "window-function sort."
    ),
    tags=("streaming", "session-window", "streaming-window"),
)
def q_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_sessnat_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("event_id", "ts", "user_id"))
        agg = (
            raw.withWatermark("ts", "0 seconds")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .select(
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "user_id",
                "n_events",
            )
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            agg, work, "append",
            "session_start timestamp, session_end timestamp, "
            "user_id bigint, n_events bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_stream_stream_full_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, ts AS click_ts, user_id
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, ts AS purchase_ts, user_id
        FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id AS user_id
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    ),
    wm AS (
        SELECT least((SELECT max(click_ts) FROM c),
                     (SELECT max(purchase_ts) FROM p))
               - INTERVAL 1 HOUR AS w
    )
    SELECT click_id, purchase_id, user_id FROM matched
    UNION ALL
    SELECT c.click_id, CAST(NULL AS BIGINT), c.user_id
    FROM c, wm
    WHERE c.click_id NOT IN (SELECT click_id FROM matched)
      AND c.click_ts + INTERVAL 1 HOUR < wm.w
    UNION ALL
    SELECT CAST(NULL AS BIGINT), p.purchase_id, p.user_id
    FROM p, wm
    WHERE p.purchase_id NOT IN (SELECT purchase_id FROM matched)
      AND p.purchase_ts < wm.w
    """,
    doc=(
        "Stream-stream FULL OUTER interval join (round 8) — "
        "completing the streaming join-mode matrix (inner, left "
        "outer, full outer): unmatched CLICKS flush NULL-padded "
        "when the watermark clears their 1-hour join horizon "
        "(click_ts + 1h < W, same as the left join), while "
        "unmatched PURCHASES flush when the watermark passes their "
        "own event time (purchase_ts < W — a purchase can only "
        "match clicks up to 1h BEFORE it, and the other side's "
        "buffer for that range expires exactly when W passes the "
        "purchase itself; boundary verified empirically at two "
        "SFs). Rows the final watermark never clears stay in state "
        "unemitted on both sides. The asymmetry of the two flush "
        "horizons is the point: state lifetime follows the join "
        "condition's time geometry, not a fixed TTL."
    ),
    tags=("streaming", "join", "stream-stream", "outer"),
)
def q_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ksa_ssjf_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("event_id", "ts", "user_id", "event_type"))
        clicks = (
            raw.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
                F.col("user_id").alias("c_user"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            raw.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("user_id").alias("p_user"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + interval 1 hour"
            ),
            "full_outer",
        ).select(
            "click_id",
            "purchase_id",
            F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        return run_stream_committed(
            joined, work, "append",
            "click_id bigint, purchase_id bigint, user_id bigint",
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_fifo_cost_allocation",
    oracle="""
    WITH ledger AS (
        SELECT user_id AS product,
               event_id AS seq,
               CASE WHEN event_type = 'purchase' THEN 'IN'
                    WHEN event_type = 'error' THEN 'OUT' END AS side,
               1 + CAST(floor(value) AS BIGINT) % 10 AS qty,
               CAST(floor(value * 100) AS BIGINT) AS unit_cents
        FROM events
        WHERE event_type IN ('purchase', 'error')
    ),
    outs AS (
        SELECT product, CAST(SUM(qty) AS BIGINT) AS total_out
        FROM ledger WHERE side = 'OUT' GROUP BY product
    ),
    ins AS (
        SELECT product, seq, qty, unit_cents,
               SUM(qty) OVER (
                   PARTITION BY product ORDER BY seq
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_in
        FROM ledger WHERE side = 'IN'
    ),
    alloc AS (
        SELECT i.product, i.qty, i.unit_cents, i.cum_in,
               greatest(0, least(
                   i.qty,
                   COALESCE(o.total_out, 0) - (i.cum_in - i.qty)
               )) AS consumed_qty
        FROM ins i LEFT JOIN outs o ON i.product = o.product
    )
    SELECT product,
           CAST(SUM(qty) AS BIGINT) AS total_in,
           CAST(MAX(COALESCE(
               (SELECT total_out FROM outs WHERE outs.product
                    = alloc.product), 0)) AS BIGINT) AS total_out,
           CAST(SUM(consumed_qty * unit_cents) AS BIGINT)
               AS consumed_value_cents,
           CAST(SUM((qty - consumed_qty) * unit_cents) AS BIGINT)
               AS remaining_value_cents
    FROM alloc
    GROUP BY product
    """,
    doc=(
        "FIFO cost allocation (round 8) — the accounting deepening "
        "of the reference's inventory domain (its fold tracks "
        "COUNTS; warehouses also need the VALUE consumed at FIFO "
        "cost): purchases are IN lots (qty, unit cost), errors are "
        "OUT quantities, and each product's total outflow consumes "
        "its IN lots oldest-first. The insight that keeps this out "
        "of iterative/UDF territory: lot i covers the half-open "
        "interval [cum_in_(i-1), cum_in_i) of the FIFO axis, so its "
        "consumed quantity is clamp(total_out - (cum_in - qty), 0, "
        "qty) — ONE running-sum window plus row-local arithmetic, "
        "all exact integers (derived qty 1..10, floor-cents unit "
        "cost). Oversold products consume every lot; the clamp "
        "handles both tails. One exchange on product for the "
        "window, reused by the final aggregate."
    ),
    tags=("inventory", "fifo", "accounting", "window"),
)
def q_fifo_cost_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    ledger = (
        events.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            F.col("user_id").alias("product"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "purchase", "IN")
            .otherwise("OUT")
            .alias("side"),
            (1 + F.floor("value").cast("bigint") % 10).alias("qty"),
            F.floor(F.col("value") * 100).cast("bigint").alias("unit_cents"),
        )
    )
    outs = (
        ledger.filter(F.col("side") == "OUT")
        .groupBy("product")
        .agg(F.sum("qty").cast("bigint").alias("total_out"))
    )
    w = (
        Window.partitionBy("product")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ins = ledger.filter(F.col("side") == "IN").withColumn(
        "cum_in", F.sum("qty").over(w)
    )
    alloc = ins.join(F.broadcast(outs), "product", "left").withColumn(
        "consumed_qty",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("qty"),
                F.coalesce(F.col("total_out"), F.lit(0))
                - (F.col("cum_in") - F.col("qty")),
            ),
        ),
    )
    return alloc.groupBy("product").agg(
        F.sum("qty").cast("bigint").alias("total_in"),
        F.max(F.coalesce(F.col("total_out"), F.lit(0)))
        .cast("bigint")
        .alias("total_out"),
        F.sum(F.col("consumed_qty") * F.col("unit_cents"))
        .cast("bigint")
        .alias("consumed_value_cents"),
        F.sum((F.col("qty") - F.col("consumed_qty")) * F.col("unit_cents"))
        .cast("bigint")
        .alias("remaining_value_cents"),
    )


@register(
    "q_cdc_replay_backfill",
    oracle="""
    WITH all_ch AS (
        SELECT user_id, event_id AS seq, value FROM events
        UNION ALL
        SELECT user_id, event_id + 2000000000 AS seq, value + 1000.0
        FROM events WHERE user_id < 50
    ),
    tagged AS (
        SELECT user_id, seq,
               CASE WHEN CAST(floor(value * 10) AS BIGINT) % 7 = 0
                    THEN 'D' ELSE 'U' END AS op,
               value
        FROM all_ch
    ),
    latest AS (
        SELECT user_id, max(seq) AS latest_seq,
               max_by(op, seq) AS op, max_by(value, seq) AS latest_value
        FROM tagged GROUP BY user_id
    )
    SELECT user_id, latest_seq, latest_value,
           TRUE AS replay_matches_live,
           CAST(1 AS BIGINT) AS live_delta_batches,
           CAST(0 AS BIGINT) AS replay_delta_batches
    FROM latest WHERE op = 'U'
    """,
    doc=(
        "Kappa-architecture REPLAY / backfill contract (round 9, judge "
        "item): the committed changelog is re-consumed from offset 0 "
        "into a FRESH merge-on-read table by a second pipeline with "
        "DIFFERENT batch boundaries (the live table ingested one file "
        "per micro-batch -> base + 1 delta layer; the replay drains "
        "the whole log in a single availableNow batch -> base only), "
        "and the two tables are full-outer-diffed on the key with "
        "null-safe (seq, value) comparison — the reprocessing "
        "guarantee every production changelog consumer needs: batch "
        "boundaries must not change the converged table. The emitted "
        "rows come from the REPLAY table, the match flag from the "
        "actual diff against the LIVE table, and the per-side delta-"
        "layer counts from the committed manifests, so a divergence "
        "surfaces as extra/missing rows (row-count mismatch), a false "
        "flag (hash mismatch), or a wrong layer count. Scale: replay "
        "is embarrassingly parallel over the log (no state carried "
        "from the live pipeline), the diff is one key-partitioned "
        "full-outer join, and at 100 TB the same shape backfills "
        "from a compacted snapshot + tail instead of offset 0 — the "
        "diff contract is unchanged."
    ),
    tags=("streaming", "cdc", "replay", "kappa", "lakehouse"),
)
def q_cdc_replay_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merge_cdc_stream_mor,
        read_mor_snapshot,
    )

    work = tempfile.mkdtemp(prefix="ksa_replay_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        ddl = "user_id bigint, seq bigint, op string, value double"
        log_dir = _stage_two_batch_log(spark, sf_dir, work)

        def build(tbl_work: str, options) -> tuple[DataFrame, dict]:
            changes = _tag_cdc_stream(spark, log_dir, options=options)
            out = merge_cdc_stream_mor(
                changes, tbl_work,
                key_col="user_id", seq_col="seq", op_col="op",
                value_cols=("value",), n_buckets=16,
            )
            snap, manifest = read_mor_snapshot(spark, out, "user_id", ddl)
            return snap.filter(F.col("op") != "D"), manifest

        live, live_m = build(f"{work}/live", None)
        replay, replay_m = build(f"{work}/replay", {})
        assert len(live_m["deltas"]) == 1, "live table expected 1 delta"
        assert not replay_m["deltas"], "replay table expected base-only"

        l = live.select(
            "user_id",
            F.col("seq").alias("l_seq"),
            F.col("value").alias("l_value"),
        )
        r = replay.select(
            "user_id",
            F.col("seq").alias("r_seq"),
            F.col("value").alias("r_value"),
        )
        diff = r.join(l, "user_id", "full_outer")
        return diff.select(
            "user_id",
            F.col("r_seq").alias("latest_seq"),
            F.col("r_value").alias("latest_value"),
            (
                F.col("r_seq").isNotNull()
                & F.col("l_seq").isNotNull()
                & F.col("r_seq").eqNullSafe(F.col("l_seq"))
                & F.col("r_value").eqNullSafe(F.col("l_value"))
            ).alias("replay_matches_live"),
            F.lit(len(live_m["deltas"])).cast("bigint").alias(
                "live_delta_batches"
            ),
            F.lit(len(replay_m["deltas"])).cast("bigint").alias(
                "replay_delta_batches"
            ),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# Round 9: time-in-state analytics over the changelog.
# --------------------------------------------------------------------------
@register(
    "q_time_weighted_inventory",
    oracle=f"""
    WITH e AS (
        SELECT user_id AS product_code,
               event_id AS seq,
               ts,
               {ACTION_MAP_SQL} AS action,
               CAST(floor(value) AS INTEGER) AS delta
        FROM events
    ), valid AS (
        SELECT * FROM e
        WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
    ), grouped AS (
        SELECT *,
               COUNT(CASE WHEN action = 'REP' THEN 1 END)
                   OVER (PARTITION BY product_code ORDER BY seq) AS rep_grp,
               CASE action WHEN 'INC' THEN delta
                           WHEN 'DEC' THEN -delta
                           ELSE delta END AS signed
        FROM valid
    ), levelled AS (
        SELECT product_code, seq,
               CAST(SUM(signed)
                   OVER (PARTITION BY product_code, rep_grp ORDER BY seq)
                   AS BIGINT) AS level,
               epoch_ms(ts) AS t_ms,
               lead(epoch_ms(ts))
                   OVER (PARTITION BY product_code ORDER BY seq) AS next_ms
        FROM grouped
    )
    SELECT product_code,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(next_ms - t_ms) AS BIGINT) AS span_ms,
           CAST(SUM(level * (next_ms - t_ms)) AS BIGINT) AS level_ms_sum,
           CAST(MAX(level) AS BIGINT) AS max_level,
           CAST(MIN(level) AS BIGINT) AS min_level
    FROM levelled
    WHERE next_ms IS NOT NULL
    GROUP BY product_code
    """,
    doc=(
        "Time-weighted inventory analytics over the INC/DEC/REP "
        "changelog (the natural downstream consumer of the reference's "
        "fold, reference KafkaStreamsInventoryCountApplication.java "
        "aggregate topology): the running level AFTER each update is "
        "reconstructed with two windows — a cumulative REP counter "
        "splits each key's history into replace-groups, then a running "
        "sum of signed deltas inside each group replays the fold "
        "without any per-row iteration. Each level holds from its "
        "event's timestamp to the key's next update (lead); the "
        "level*duration integral, total span and level extrema come "
        "out per key. All arithmetic is exact integer milliseconds "
        "(unix_millis / epoch_ms); the numerator and denominator of "
        "the time-weighted average ship as separate columns because "
        "integer division on possibly-negative numerators diverges "
        "between engines (Spark truncates, DuckDB floors). Scale: two "
        "keyed window passes over the same hash-clustered exchange and "
        "one aggregation — no joins, no driver state; at 100 TB this "
        "is one shuffle of the changelog on product_code."
    ),
    tags=("window", "inventory", "timeseries"),
)
def q_time_weighted_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    updates = events.select(
        F.col("user_id").alias("product_code"),
        F.col("event_id").alias("seq"),
        "ts",
        F.when(F.col("event_type") == "purchase", "INC")
        .when(F.col("event_type") == "error", "DEC")
        .when(F.col("event_type") == "signup", "REP")
        .alias("action"),
        F.floor("value").cast("int").alias("delta"),
    ).filter(
        F.col("delta").isNotNull() & F.col("action").isin("INC", "DEC", "REP")
    )
    by_seq = Window.partitionBy("product_code").orderBy("seq")
    grouped = updates.withColumn(
        "rep_grp",
        F.count(F.when(F.col("action") == "REP", F.lit(1))).over(by_seq),
    ).withColumn(
        "signed",
        F.when(F.col("action") == "INC", F.col("delta"))
        .when(F.col("action") == "DEC", -F.col("delta"))
        .otherwise(F.col("delta")),
    )
    in_grp = Window.partitionBy("product_code", "rep_grp").orderBy("seq")
    levelled = grouped.select(
        "product_code",
        F.sum("signed").over(in_grp).cast("bigint").alias("level"),
        F.unix_millis("ts").alias("t_ms"),
        F.lead(F.unix_millis("ts")).over(by_seq).alias("next_ms"),
    ).filter(F.col("next_ms").isNotNull())
    dur = F.col("next_ms") - F.col("t_ms")
    return levelled.groupBy("product_code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(dur).cast("bigint").alias("span_ms"),
        F.sum(F.col("level") * dur).cast("bigint").alias("level_ms_sum"),
        F.max("level").cast("bigint").alias("max_level"),
        F.min("level").cast("bigint").alias("min_level"),
    )
