"""Streaming CDC MERGE (copy-on-write snapshot) unit tests."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators.cdc_merge import merge_cdc_stream

CHANGE_DDL = "k string, seq bigint, op string, v double"


def _write_batch(spark, path: str, rows, mtime: float) -> None:
    spark.createDataFrame(rows, CHANGE_DDL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    # FileStreamSource orders files by modification time: pin it so the
    # two files form two deterministic micro-batches.
    for f in glob.glob(f"{path}/*.parquet"):
        os.utime(f, (mtime, mtime))


def test_cdc_merge_upsert_delete_across_batches(spark):
    work = tempfile.mkdtemp(prefix="ksa_cdc_test_")
    src = f"{work}/src"
    try:
        os.makedirs(src)
        b1 = f"{work}/b1"
        b2 = f"{work}/b2"
        _write_batch(
            spark, b1,
            [("a", 1, "U", 1.0), ("b", 2, "U", 2.0), ("f", 3, "U", 3.0)],
            1_700_000_000,
        )
        _write_batch(
            spark, b2,
            [("a", 10, "D", 0.0), ("b", 11, "U", 22.0), ("d", 12, "U", 4.0)],
            1_700_000_100,
        )
        shutil.copy(glob.glob(f"{b1}/*.parquet")[0], f"{src}/01.parquet")
        shutil.copy(glob.glob(f"{b2}/*.parquet")[0], f"{src}/02.parquet")
        os.utime(f"{src}/01.parquet", (1_700_000_000,) * 2)
        os.utime(f"{src}/02.parquet", (1_700_000_100,) * 2)

        changes = (
            spark.readStream.schema(CHANGE_DDL)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        snap = merge_cdc_stream(
            changes, work, key_col="k", seq_col="seq", op_col="op",
            value_cols=("v",), n_buckets=4,
        )
        rows = {r["k"]: r for r in snap.collect()}
        # Tombstone for 'a' persists in the snapshot...
        assert rows["a"]["op"] == "D" and rows["a"]["seq"] == 10
        # ...and read-time filtering yields the live set.
        live = {
            r["k"]: (r["seq"], r["v"])
            for r in snap.filter(F.col("op") != "D").collect()
        }
        assert live == {"b": (11, 22.0), "f": (3, 3.0), "d": (12, 4.0)}

        # COW evidence: two manifest versions; the later one reuses the
        # earlier batch's data dir for buckets batch 2 did not touch
        # (key 'f' — bucket 0 under n_buckets=4 — appears only in batch 1,
        # while batch 2's keys a/b/d land in buckets 1 and 2), instead of rewriting them.
        manifests = sorted(glob.glob(f"{work}/cow/manifest/v*.json"))
        assert len(manifests) == 2
        v0 = json.load(open(manifests[0]))["buckets"]
        v1 = json.load(open(manifests[1]))["buckets"]
        carried = [b for b, d in v1.items() if v0.get(b) == d]
        rewritten = [b for b, d in v1.items() if v0.get(b) not in (None, d)]
        assert carried, "no bucket carried over by pointer — COW not COW"
        assert rewritten, "no bucket rewritten — merge never touched state"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cdc_merge_single_batch_and_empty(spark):
    work = tempfile.mkdtemp(prefix="ksa_cdc_test1_")
    src = f"{work}/src"
    try:
        os.makedirs(src)
        b1 = f"{work}/b1"
        _write_batch(
            spark, b1,
            [("x", 5, "U", 1.5), ("x", 7, "D", 0.0), ("y", 6, "U", 2.5)],
            1_700_000_000,
        )
        shutil.copy(glob.glob(f"{b1}/*.parquet")[0], f"{src}/01.parquet")
        changes = spark.readStream.schema(CHANGE_DDL).parquet(src)
        snap = merge_cdc_stream(
            changes, work, key_col="k", seq_col="seq", op_col="op",
            value_cols=("v",), n_buckets=4,
        )
        # In-batch conflation: x's latest record is the delete.
        live = {r["k"]: r["v"] for r in snap.filter(F.col("op") != "D").collect()}
        assert live == {"y": 2.5}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_vacuum_keep_two_retains_time_travel(spark, tmp_path):
    # keep=2 must leave BOTH manifests readable (time travel intact),
    # and a later keep=1 must then drop the older one.
    import os

    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        manifest_versions,
        merge_cdc_stream,
        read_snapshot_as_of,
        vacuum_snapshots,
    )

    work = str(tmp_path)
    src = f"{work}/src"
    os.makedirs(src)
    ddl = "user_id long, seq long, op string, value double"
    b1 = spark.createDataFrame(
        [(1, 1, "U", 1.0), (2, 2, "U", 2.0)], ddl
    )
    b2 = spark.createDataFrame([(1, 3, "U", 9.0)], ddl)
    for name, df in (("e1", b1), ("e2", b2)):
        tmp = f"{work}/{name}_dir"
        df.coalesce(1).write.parquet(tmp)
        import glob as _glob
        import shutil as _shutil

        [part] = _glob.glob(f"{tmp}/part-*.parquet")
        _shutil.move(part, f"{src}/{name}.parquet")
    now = os.path.getmtime(f"{src}/e1.parquet")
    os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
    os.utime(f"{src}/e2.parquet", (now + 100, now + 100))

    changes = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    merge_cdc_stream(
        changes, work, key_col="user_id", seq_col="seq", op_col="op",
        value_cols=("value",), n_buckets=4,
    )
    out = f"{work}/cow"
    assert len(manifest_versions(out)) == 2

    stats = vacuum_snapshots(out, keep=2)
    assert stats["versions_after"] == 2 and stats["dirs_removed"] == 0
    v0, v1 = manifest_versions(out)
    first = read_snapshot_as_of(spark, out, v0, ddl)
    assert {(r["user_id"], r["value"]) for r in first.collect()} == {
        (1, 1.0), (2, 2.0)
    }
    latest = read_snapshot_as_of(spark, out, v1, ddl)
    assert {(r["user_id"], r["value"]) for r in latest.collect()} == {
        (1, 9.0), (2, 2.0)
    }

    stats = vacuum_snapshots(out, keep=1)
    assert manifest_versions(out) == [v1]
    still = read_snapshot_as_of(spark, out, v1, ddl)
    assert still.count() == 2


def test_vacuum_rejects_keep_below_one(tmp_path):
    # keep=0 used to mean "retain nothing" and wiped the live table.
    import pytest as _pytest

    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        vacuum_snapshots,
    )

    with _pytest.raises(ValueError, match="keep"):
        vacuum_snapshots(str(tmp_path), keep=0)
    with _pytest.raises(ValueError, match="keep"):
        vacuum_snapshots(str(tmp_path), keep=-3)


def _stage_two_batch_src(spark, work: str) -> str:
    """Two deterministic micro-batches with overlapping keys: batch 2
    updates 'a' (tombstone) and 'b', adds 'd'; 'f' lives only in base."""
    src = f"{work}/src"
    os.makedirs(src)
    b1, b2 = f"{work}/b1", f"{work}/b2"
    _write_batch(
        spark, b1,
        [("a", 1, "U", 1.0), ("b", 2, "U", 2.0), ("f", 3, "U", 3.0)],
        1_700_000_000,
    )
    _write_batch(
        spark, b2,
        [("a", 10, "D", 0.0), ("b", 11, "U", 22.0), ("d", 12, "U", 4.0)],
        1_700_000_100,
    )
    shutil.copy(glob.glob(f"{b1}/*.parquet")[0], f"{src}/01.parquet")
    shutil.copy(glob.glob(f"{b2}/*.parquet")[0], f"{src}/02.parquet")
    os.utime(f"{src}/01.parquet", (1_700_000_000,) * 2)
    os.utime(f"{src}/02.parquet", (1_700_000_100,) * 2)
    return src


def test_mor_merge_appends_deltas_base_untouched(spark):
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merge_cdc_stream_mor,
        read_mor_snapshot,
    )
    from kafka_streams_aggregate_spark.plans.inspect import formatted_plan

    work = tempfile.mkdtemp(prefix="ksa_mor_test_")
    try:
        src = _stage_two_batch_src(spark, work)
        changes = (
            spark.readStream.schema(CHANGE_DDL)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = merge_cdc_stream_mor(
            changes, work, key_col="k", seq_col="seq", op_col="op",
            value_cols=("v",), n_buckets=4,
        )
        snap, manifest = read_mor_snapshot(spark, out, "k", CHANGE_DDL)
        # Resolution: layer-ordered latest wins; tombstone kept then
        # filtered at read, exactly like the COW path.
        rows = {r["k"]: r for r in snap.collect()}
        assert rows["a"]["op"] == "D" and rows["a"]["seq"] == 10
        live = {
            r["k"]: (r["seq"], r["v"])
            for r in snap.filter(F.col("op") != "D").collect()
        }
        assert live == {"b": (11, 22.0), "f": (3, 3.0), "d": (12, 4.0)}
        # MOR evidence: ONE delta layer appended, base fingerprint
        # verified intact at delta-commit time by the operator itself.
        assert len(manifest["deltas"]) == 1
        assert manifest["base_intact"] is True
        # The deletion vector holds exactly batch 2's key set.
        dv = {
            r["k"]
            for r in spark.read.parquet(manifest["deltas"][0]["dv"]).collect()
        }
        assert dv == {"a", "b", "d"}
        # Read plan: the DV mask applies as a broadcast ANTI join (the
        # base scan never shuffles for the merge).
        plan = formatted_plan(snap)
        assert "LeftAnti" in plan, plan[:2000]
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert "SortMergeJoin" not in plan, plan[:2000]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_mor_compaction_folds_deltas_and_preserves_result(spark):
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        _latest_mor_manifest,
        compact_mor,
        merge_cdc_stream_mor,
        read_mor_snapshot,
    )

    work = tempfile.mkdtemp(prefix="ksa_morc_test_")
    try:
        src = _stage_two_batch_src(spark, work)
        changes = (
            spark.readStream.schema(CHANGE_DDL)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = merge_cdc_stream_mor(
            changes, work, key_col="k", seq_col="seq", op_col="op",
            value_cols=("v",), n_buckets=4,
        )
        before, m_before = read_mor_snapshot(spark, out, "k", CHANGE_DDL)
        before_rows = sorted(map(tuple, before.collect()))
        assert m_before["deltas"], "precondition: at least one delta layer"
        stats = compact_mor(spark, out, "k", CHANGE_DDL, n_buckets=4)
        assert stats["deltas_folded"] == 1
        after, m_after = read_mor_snapshot(spark, out, "k", CHANGE_DDL)
        # Same logical table, zero delta layers, superseded files gone.
        assert sorted(map(tuple, after.collect())) == before_rows
        assert m_after["deltas"] == []
        assert not os.path.isdir(f"{out}/delta/d1") or not glob.glob(
            f"{out}/delta/d1/**/*.parquet", recursive=True
        )
        # Manifest version advanced; old base removed, new base present.
        v, _ = _latest_mor_manifest(f"{out}/manifest")
        assert v == m_before["version"] + 1
        assert os.path.isdir(m_after["base"])
        assert not os.path.isdir(m_before["base"])
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_mor_cdf_classifies_change_types(spark):
    from kafka_streams_aggregate_spark.operators.cdc_merge import (
        merge_cdc_stream_mor,
        read_mor_changes,
    )

    work = tempfile.mkdtemp(prefix="ksa_morcdf_test_")
    try:
        src = f"{work}/src"
        os.makedirs(src)
        b1, b2 = f"{work}/b1", f"{work}/b2"
        # base: a live, b live, c tombstoned
        _write_batch(
            spark, b1,
            [("a", 1, "U", 1.0), ("b", 2, "U", 2.0), ("c", 3, "D", 0.0)],
            1_700_000_000,
        )
        # delta: update a, delete b, insert d (new), insert c
        # (base-tombstoned key revived -> insert, not update)
        _write_batch(
            spark, b2,
            [("a", 10, "U", 11.0), ("b", 11, "D", 0.0),
             ("d", 12, "U", 4.0), ("c", 13, "U", 33.0)],
            1_700_000_100,
        )
        shutil.copy(glob.glob(f"{b1}/*.parquet")[0], f"{src}/01.parquet")
        shutil.copy(glob.glob(f"{b2}/*.parquet")[0], f"{src}/02.parquet")
        os.utime(f"{src}/01.parquet", (1_700_000_000,) * 2)
        os.utime(f"{src}/02.parquet", (1_700_000_100,) * 2)
        changes = (
            spark.readStream.schema(CHANGE_DDL)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = merge_cdc_stream_mor(
            changes, work, key_col="k", seq_col="seq", op_col="op",
            value_cols=("v",), n_buckets=4,
        )
        cdf = read_mor_changes(spark, out, "k", "op", CHANGE_DDL)
        got = {r["k"]: r["change_type"] for r in cdf.collect()}
        assert got == {
            "a": "update", "b": "delete", "d": "insert", "c": "insert",
        }, got
    finally:
        shutil.rmtree(work, ignore_errors=True)
