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
    # Only manifest-listed files count: every data file must be listed.
    import glob
    import json

    outdir = str(tmp_path / "w" / "sinkout")
    listed = set()
    for mf in glob.glob(f"{outdir}/manifest/*.json"):
        listed.update(e["file"] for e in json.load(open(mf))["files"])
    on_disk = {f.split("/")[-1] for f in glob.glob(f"{outdir}/data/*.jsonl")}
    assert on_disk == listed


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
