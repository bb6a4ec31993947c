"""Hive-style partitioned parquet sink + partition pruning on re-read.

The write-side twin of predicate pushdown: a 100 TB table laid out as
`status=X/` directories lets any filter on the partition column skip
whole directories at planning time (PartitionFilters on the scan, no
data read), and `spark.sql.files.maxRecordsPerFile`-style knobs decide
file sizes. Pins both the layout and the pruned-scan plan property."""

from __future__ import annotations

import pathlib

import pytest

from kafka_streams_aggregate_spark.plans.inspect import formatted_plan
from kafka_streams_aggregate_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def partitioned_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("psink") / "orders_by_status")
    load_table(spark, "orders", SF).write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(out)
    return out


def test_layout_is_one_directory_per_status(spark, partitioned_dir):
    dirs = sorted(
        p.name
        for p in pathlib.Path(partitioned_dir).iterdir()
        if p.is_dir() and p.name.startswith("o_orderstatus=")
    )
    assert dirs == [
        "o_orderstatus=F",
        "o_orderstatus=O",
        "o_orderstatus=P",
    ]


def test_partition_filter_prunes_at_plan_time(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter("o_orderstatus = 'F'")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan, plan
    # The status predicate must appear as a partition filter (directory
    # skip), NOT as a pushed data filter (row-group skip).
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("o_orderstatus" in ln for ln in pf_lines), plan
    pd_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert not any("o_orderstatus" in ln for ln in pd_lines), plan


def test_partitioned_roundtrip_counts(spark, partitioned_dir):
    orig = load_table(spark, "orders", SF)
    back = spark.read.parquet(partitioned_dir)
    assert back.count() == orig.count()
    assert (
        back.filter("o_orderstatus = 'F'").count()
        == orig.filter("o_orderstatus = 'F'").count()
    )


def test_run_stream_committed_append_roundtrip(spark, tmp_path):
    # Default append path (r17): foreachBatch + distributed JVM json +
    # per-batch manifest. Only manifest-listed batch dirs count.
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )

    src = str(tmp_path / "src")
    spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, bucket string").parquet(src)
    out = run_stream_committed(
        stream, str(tmp_path / "w"), "append", "id bigint, bucket string"
    )
    rows = {r["id"]: r["bucket"] for r in out.collect()}
    assert len(rows) == 100 and rows[13] == "6"
    import glob
    import json

    outdir = str(tmp_path / "w" / "sinkout")
    manifests = glob.glob(f"{outdir}/manifest/*.json")
    assert manifests, "foreachBatch append path must publish manifests"
    for mf in manifests:
        meta = json.load(open(mf))
        assert "dir" in meta and "batch" in meta


def test_run_stream_committed_append_datasource_path(spark, tmp_path):
    # append_via='datasource' keeps the Python-DataSource sink surface
    # (q_sink_exactly_once's declared demo): per-task .jsonl files, a
    # per-batch manifest listing exactly the committed files, and
    # committed rows identical to the default path.
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )

    src = str(tmp_path / "src")
    spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    ).write.parquet(src)

    def drain(workdir, via):
        stream = spark.readStream.schema(
            "id long, bucket string"
        ).parquet(src)
        return run_stream_committed(
            stream, workdir, "append", "id bigint, bucket string",
            append_via=via,
        )

    out_ds = drain(str(tmp_path / "wds"), "datasource")
    out_fb = drain(str(tmp_path / "wfb"), "foreachbatch")
    rows_ds = sorted((r["id"], r["bucket"]) for r in out_ds.collect())
    rows_fb = sorted((r["id"], r["bucket"]) for r in out_fb.collect())
    assert rows_ds == rows_fb and len(rows_ds) == 100
    # Only manifest-listed files count: every data file must be listed.
    import glob
    import json

    outdir = str(tmp_path / "wds" / "sinkout")
    listed = set()
    for mf in glob.glob(f"{outdir}/manifest/*.json"):
        listed.update(e["file"] for e in json.load(open(mf))["files"])
    on_disk = {f.split("/")[-1] for f in glob.glob(f"{outdir}/data/*.jsonl")}
    assert on_disk == listed


def test_run_stream_committed_append_timestamp_micros(spark, tmp_path):
    # The JSON default truncates timestamps to millis on write; the
    # foreachBatch append path must roundtrip MICROsecond precision
    # (explicit timestampFormat on both sides).
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )

    src = str(tmp_path / "src")
    spark.sql(
        "SELECT timestamp_micros(1705363200123456) AS ts, 1 AS k"
    ).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, k int").parquet(src)
    out = run_stream_committed(
        stream, str(tmp_path / "w"), "append", "ts timestamp, k int"
    )
    [row] = out.collect()
    assert row["ts"].microsecond == 123456


def test_run_stream_committed_update_latest_wins(spark, tmp_path):
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )

    src = str(tmp_path / "src")
    spark.range(50).selectExpr("id % 5 AS k", "id AS v").write.parquet(src)
    stream = (
        spark.readStream.schema("k long, v long")
        .parquet(src)
        .groupBy("k")
        .agg({"v": "max"})
        .withColumnRenamed("max(v)", "v")
    )
    out = run_stream_committed(
        stream, str(tmp_path / "w"), "update", "k bigint, v bigint"
    )
    assert "_batch" in out.columns
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {0: 45, 1: 46, 2: 47, 3: 48, 4: 49}


def test_run_stream_committed_empty_stream(spark, tmp_path):
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )

    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id").filter("id < 0").write.parquet(src)
    stream = spark.readStream.schema("id long").parquet(src)
    out = run_stream_committed(stream, str(tmp_path / "w"), "append", "id bigint")
    assert out.count() == 0 and out.schema.simpleString() == "struct<id:bigint>"


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restart-with-checkpoint contract: a second availableNow run over
    the SAME checkpoint must resume from committed offsets — the rows
    of batch 0 appear exactly once in the combined manifests even
    though the first file is still in the source directory, and batch
    ids continue instead of restarting."""
    import glob
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    work = str(tmp_path / "w")
    src = f"{work}/src"
    os.makedirs(src)
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )

    def stage(n_lo, n_hi, name, mtime):
        spark.range(n_lo, n_hi).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("k"),
        ).coalesce(1).write.parquet(f"{work}/{name}_stage")
        [part] = glob.glob(f"{work}/{name}_stage/part-*.parquet")
        shutil.move(part, f"{src}/{name}.parquet")
        os.utime(f"{src}/{name}.parquet", (mtime, mtime))

    def run():
        stream = spark.readStream.schema("event_id bigint, k bigint").parquet(
            src
        )
        return run_stream_committed(
            stream.select("event_id", "k"), work, "append",
            "event_id bigint, k bigint",
        )

    stage(0, 100, "f1", 1_700_000_000)
    first = run()
    assert first.count() == 100

    stage(100, 150, "f2", 1_700_000_100)
    both = run()  # SAME work dir: same checkpoint, same sink manifests
    # Exactly once: 150 rows total, every event_id distinct, despite
    # f1.parquet still sitting in src on the second run.
    assert both.count() == 150
    assert both.select("event_id").distinct().count() == 150
    # Batch ids continued: two committed manifests, not a restart at 0.
    manifests = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{work}/sinkout/manifest/*.json")
    )
    assert len(manifests) == 2, manifests


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, tmp_path
):
    """INSERT OVERWRITE semantics per partition: with
    partitionOverwriteMode=dynamic, an overwrite write replaces ONLY
    the partitions present in the incoming data — static mode (the
    default) would wipe the whole table first. The lakehouse
    partial-refresh contract (backfill one day without touching the
    rest)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "events_by_type")
    full = load_table(spark, "events", SF).select("event_id", "event_type")
    full.write.partitionBy("event_type").parquet(out)
    before = spark.read.parquet(out).count()
    n_click = full.filter("event_type = 'click'").count()

    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "dynamic")
        # Rewrite ONLY the click partition, halved.
        (
            full.filter("event_type = 'click'")
            .filter(F.col("event_id") % 2 == 0)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out)
        )
        after = spark.read.parquet(out)
        n_click_even = full.filter(
            "event_type = 'click' AND event_id % 2 = 0"
        ).count()
        # Other partitions intact; click replaced with the half set.
        assert after.count() == before - n_click + n_click_even
        assert (
            after.filter("event_type = 'purchase'").count()
            == full.filter("event_type = 'purchase'").count()
        )
        assert after.filter("event_type = 'click'").count() == n_click_even
    finally:
        spark.conf.set(conf, prev)
