"""Streaming MERGE (CDC upsert/delete) into a partitioned parquet
snapshot — the copy-on-write table-format shape (Delta/Hudi-style)
built from primitives this engine already has: hash-bucket layout,
per-batch distributed writes, and an atomic versioned manifest.

Semantics (the reference's KTable materialization, generalized to a
persistent table): a stream of change records ``(key, seq, op, value)``
with ``op IN ('U','D')`` is folded into a snapshot holding, per key,
the record with the highest ``seq`` seen so far. Deletes are kept as
TOMBSTONE rows (op='D') and filtered at read time — exactly how a
compacted changelog topic represents them until the compaction horizon
— which makes the merged state independent of micro-batch boundaries:
latest-by-seq over the union of all batches, however they were split.

Scale shape (the whole point):
  - the snapshot lives as N hash buckets (``pmod(hash(key), N)``);
    a micro-batch rewrites ONLY the buckets its keys touch (COW per
    bucket), the rest carry over by manifest pointer — at 100 TB with
    a skewed update stream this is the difference between rewriting
    gigabytes and rewriting everything;
  - per batch the changelog is conflated latest-per-key FIRST (map-side
    shrink), then merged with the touched buckets' current rows in one
    distributed write — no row ever passes through the driver;
  - the driver handles only bucket ids (bounded by ``n_buckets``) and
    manifest file names; commit is a single atomic ``os.replace`` of a
    JSON manifest, readers always see a complete version.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F


def _latest_manifest(manifest_dir: str) -> tuple[int, dict[str, str]]:
    """(version, {bucket_id_str: data_dir}) of the highest committed
    version, or (-1, {}) before the first commit."""
    best_v, best = -1, {}
    if not os.path.isdir(manifest_dir):
        return best_v, best
    for name in os.listdir(manifest_dir):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            v = int(name[1:-5])
        except ValueError:
            continue
        if v > best_v:
            with open(os.path.join(manifest_dir, name)) as fh:
                best_v, best = v, json.load(fh)["buckets"]
    return best_v, best


def merge_cdc_stream(
    changes: DataFrame,
    work: str,
    key_col: str,
    seq_col: str,
    op_col: str,
    value_cols: tuple[str, ...],
    n_buckets: int = 16,
    timeout: int = 300,
) -> DataFrame:
    """Drain a bounded (availableNow) change stream through the COW
    merge and return the committed snapshot (tombstones included; the
    caller filters ``op != 'D'`` for live rows).

    The returned frame is eagerly checkpointed before the caller may
    delete ``work`` (lazy frames would re-read deleted files).
    """
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        _await_drained,
    )

    out = f"{work}/cow"
    os.makedirs(f"{out}/manifest", exist_ok=True)
    cols = [key_col, seq_col, op_col, *value_cols]
    ddl_types = dict(changes.dtypes)
    snapshot_ddl = ", ".join(f"{c} {ddl_types[c]}" for c in cols)

    def _merge_batch(batch_df, bid: int) -> None:
        spark = batch_df.sparkSession
        # 1. Conflate the batch latest-per-key (map-side shrink: at
        #    scale a busy key may have thousands of updates per batch).
        conflated = batch_df.groupBy(key_col).agg(
            F.max(seq_col).alias(seq_col),
            F.max_by(op_col, seq_col).alias(op_col),
            *[F.max_by(c, seq_col).alias(c) for c in value_cols],
        )
        bucketed = conflated.withColumn(
            "_bucket", F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets))
        ).localCheckpoint(eager=True)  # reused 3x below: bucket ids, merge, manifest
        # 2. Which buckets does this batch touch? Bounded by n_buckets —
        #    the ONLY data-dependent driver traffic in the operator.
        touched = sorted(
            r["_bucket"] for r in bucketed.select("_bucket").distinct().collect()
        )
        _version, buckets = _latest_manifest(f"{out}/manifest")
        # 3. Current rows of touched buckets (manifest pointers). The
        #    partitionBy write below strips `_bucket` from file content,
        #    so each bucket dir is read bare and re-labeled (≤ n_buckets
        #    unions of pruned single-dir scans).
        merged = bucketed
        for b in touched:
            if str(b) in buckets:
                prev = (
                    # recursiveFileLookup disables partition inference,
                    # which would otherwise try to parse the `_bucket=K`
                    # path segment against the explicit schema.
                    spark.read.schema(snapshot_ddl)
                    .option("recursiveFileLookup", "true")
                    .parquet(buckets[str(b)])
                    .withColumn("_bucket", F.lit(b))
                )
                merged = merged.unionByName(prev)
        # 4. Latest-by-seq per key across (batch ∪ previous), written
        #    once, partitioned by bucket — COW of touched buckets only.
        #    `_bucket` is a pure function of the key, so grouping by
        #    both keeps it without a second aggregate.
        final = merged.groupBy(key_col, "_bucket").agg(
            F.max(seq_col).alias(seq_col),
            F.max_by(op_col, seq_col).alias(op_col),
            *[F.max_by(c, seq_col).alias(c) for c in value_cols],
        )
        data_dir = f"{out}/data/b{bid}"
        final.write.mode("overwrite").partitionBy("_bucket").parquet(data_dir)
        # 5. Atomic manifest publish: touched buckets point at the new
        #    files, untouched carry over. Idempotent on batch retry
        #    (same bid overwrites its own data dir and manifest).
        new_buckets = dict(buckets)
        for b in touched:
            new_buckets[str(b)] = f"{data_dir}/_bucket={b}"
        tmp = f"{out}/manifest/.v{bid}.json.tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": bid, "buckets": new_buckets}, fh)
        os.replace(tmp, f"{out}/manifest/v{bid}.json")

    q = (
        changes.writeStream.foreachBatch(_merge_batch)
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout)
    spark = changes.sparkSession
    _version, buckets = _latest_manifest(f"{out}/manifest")
    if not buckets:
        return spark.createDataFrame([], snapshot_ddl)
    snap = (
        spark.read.schema(snapshot_ddl)
        .option("recursiveFileLookup", "true")
        .parquet(*sorted(buckets.values()))
    )
    return snap.localCheckpoint(eager=True)


def manifest_versions(out: str) -> list[int]:
    """Sorted committed snapshot versions (one per merge micro-batch)."""
    import os
    import re

    mdir = f"{out}/manifest"
    if not os.path.isdir(mdir):
        return []
    versions = []
    for name in os.listdir(mdir):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if m:
            versions.append(int(m.group(1)))
    return sorted(versions)


def read_snapshot_as_of(
    spark, out: str, version: int, snapshot_ddl: str
) -> "DataFrame":
    """Time-travel read: load the snapshot EXACTLY as manifest version
    ``version`` committed it. Copy-on-write means superseded bucket
    data dirs are never mutated, so any committed manifest stays
    readable until a vacuum — the property Delta/Iceberg time travel
    is built on. The result is eagerly checkpointed so it survives the
    caller cleaning up the table directory."""
    import json

    with open(f"{out}/manifest/v{version}.json") as fh:
        manifest = json.load(fh)
    buckets = manifest["buckets"]
    if not buckets:
        return spark.createDataFrame([], snapshot_ddl)
    snap = (
        spark.read.schema(snapshot_ddl)
        .option("recursiveFileLookup", "true")
        .parquet(*sorted(buckets.values()))
    )
    return snap.localCheckpoint(eager=True)


def vacuum_snapshots(out: str, keep: int = 1) -> dict:
    """VACUUM: delete bucket data dirs referenced by NO retained
    manifest, then drop the superseded manifests. The subtlety this
    operator must honor (and the reason its query is oracle-gated on a
    post-vacuum read): untouched buckets are SHARED between versions
    by manifest pointer, so a dir is deletable only when absent from
    every retained version — deleting anything the latest manifest
    still references corrupts the table. Returns audit counts."""
    import glob
    import json
    import shutil

    if keep < 1:
        # keep=0 would retain no manifest and delete every bucket dir —
        # wiping the live table on a caller typo. Refuse.
        raise ValueError(f"vacuum keep must be >= 1, got {keep}")
    versions = manifest_versions(out)
    retained = versions[len(versions) - keep :]
    referenced: set[str] = set()
    for v in retained:
        with open(f"{out}/manifest/v{v}.json") as fh:
            referenced |= set(json.load(fh)["buckets"].values())
    dirs_removed = 0
    for d in glob.glob(f"{out}/data/b*/_bucket=*"):
        if d not in referenced:
            shutil.rmtree(d, ignore_errors=True)
            dirs_removed += 1
    for v in versions:
        if v not in retained:
            os.remove(f"{out}/manifest/v{v}.json")
    return {
        "versions_before": len(versions),
        "versions_after": len(retained),
        "dirs_removed": dirs_removed,
    }


# ---------------------------------------------------------------------
# Merge-on-read (MOR) complement with deletion vectors
# ---------------------------------------------------------------------

def _dir_fingerprint(path: str) -> list[list]:
    """Sorted (relative-path, size) listing of every data file under
    ``path`` — the base layer's immutability witness. Recorded in the
    manifest at base commit and re-checked at every delta commit, so
    'delta batches never rewrite base buckets' is a verified property
    of each committed version, not a claim."""
    out = []
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.startswith(("_", ".")):
                continue
            full = os.path.join(root, name)
            out.append([os.path.relpath(full, path), os.path.getsize(full)])
    return sorted(out)


def _latest_mor_manifest(manifest_dir: str) -> tuple[int, dict]:
    """(version, manifest) of the highest committed MOR version, or
    (-1, {}) before the first commit."""
    best_v, best = -1, {}
    if not os.path.isdir(manifest_dir):
        return best_v, best
    for name in os.listdir(manifest_dir):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            v = int(name[1:-5])
        except ValueError:
            continue
        if v > best_v:
            with open(os.path.join(manifest_dir, name)) as fh:
                best_v, best = v, json.load(fh)
    return best_v, best


def _commit_mor_manifest(out: str, version: int, manifest: dict) -> None:
    tmp = f"{out}/manifest/.v{version}.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, f"{out}/manifest/v{version}.json")


def merge_cdc_stream_mor(
    changes: DataFrame,
    work: str,
    key_col: str,
    seq_col: str,
    op_col: str,
    value_cols: tuple[str, ...],
    n_buckets: int = 16,
    timeout: int = 300,
) -> str:
    """Merge-on-READ complement of :func:`merge_cdc_stream` (which is
    copy-on-write): the first micro-batch commits an immutable hash-
    bucketed BASE; every later batch appends only (a) a small delta
    file set (its conflated rows) and (b) a key-only DELETION VECTOR
    naming the keys the batch supersedes. Base buckets are NEVER
    rewritten — merging happens at read time (:func:`read_mor_snapshot`
    anti-joins each layer against the union of all LATER deletion
    vectors), and compaction (:func:`compact_mor`) folds deltas back
    into a new base lazily.

    Scale contract this shape buys at 100 TB: write amplification per
    batch is O(|batch|), not O(|touched buckets|) — a hot-key update
    stream against a petabyte base appends kilobytes instead of
    rewriting gigabytes; the read pays a broadcast anti-join against
    DVs that are tiny relative to base (and bounded by compaction
    cadence). Delta/Iceberg deletion vectors are the same trade.

    Returns the table root (``{work}/mor``); read it back with
    :func:`read_mor_snapshot` (correct-by-batch-order requires the
    staged source to deliver overlapping keys with increasing ``seq``
    across batches, which availableNow file order guarantees here).
    """
    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        _await_drained,
    )

    out = f"{work}/mor"
    os.makedirs(f"{out}/manifest", exist_ok=True)

    def _merge_batch(batch_df, bid: int) -> None:
        # Conflate latest-per-key within the batch (map-side shrink),
        # exactly like the COW path.
        conflated = (
            batch_df.groupBy(key_col)
            .agg(
                F.max(seq_col).alias(seq_col),
                F.max_by(op_col, seq_col).alias(op_col),
                *[F.max_by(c, seq_col).alias(c) for c in value_cols],
            )
            .withColumn(
                "_bucket", F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets))
            )
        )
        version, manifest = _latest_mor_manifest(f"{out}/manifest")
        if version < 0:
            # First batch: commit the immutable base + its fingerprint.
            base_dir = f"{out}/base/b{bid}"
            conflated.write.mode("overwrite").partitionBy("_bucket").parquet(
                base_dir
            )
            _commit_mor_manifest(
                out,
                bid,
                {
                    "version": bid,
                    "base": base_dir,
                    "base_fingerprint": _dir_fingerprint(base_dir),
                    "deltas": [],
                    "base_intact": True,
                },
            )
            return
        # Later batch: append-only. Delta rows + key-only deletion
        # vector; the base dir is not touched, and we PROVE it by
        # re-fingerprinting it into the committed manifest.
        delta_dir = f"{out}/delta/d{bid}"
        dv_dir = f"{out}/dv/d{bid}"
        conflated.write.mode("overwrite").partitionBy("_bucket").parquet(
            delta_dir
        )
        conflated.select(key_col).write.mode("overwrite").parquet(dv_dir)
        intact = (
            _dir_fingerprint(manifest["base"]) == manifest["base_fingerprint"]
        )
        _commit_mor_manifest(
            out,
            bid,
            {
                "version": bid,
                "base": manifest["base"],
                "base_fingerprint": manifest["base_fingerprint"],
                "deltas": manifest["deltas"] + [{"data": delta_dir, "dv": dv_dir}],
                "base_intact": bool(manifest.get("base_intact", True) and intact),
            },
        )

    q = (
        changes.writeStream.foreachBatch(_merge_batch)
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout)
    return out


def read_mor_snapshot(
    spark,
    out: str,
    key_col: str,
    snapshot_ddl: str,
) -> tuple["DataFrame", dict]:
    """Resolve the current MOR snapshot at READ time: layer j's rows
    survive iff their key appears in no later layer's deletion vector;
    survivors of all layers union to exactly latest-batch-wins (==
    latest-by-seq when batches arrive seq-ordered per key). The DV side
    is explicitly broadcast — deletion vectors are small relative to
    base by construction (and bounded by compaction cadence), so the
    base scan never shuffles. Tombstone rows (op='D') are kept; the
    caller filters, same as the COW read. Returns (frame, manifest) so
    callers can assert ``manifest['base_intact']``.

    The layered anti-join is O(layers²) tiny DV scans — real tables
    bound ``layers`` with :func:`compact_mor`, same as Delta/Hudi
    compaction cadence."""
    _version, manifest = _latest_mor_manifest(f"{out}/manifest")
    if not manifest:
        return spark.createDataFrame([], snapshot_ddl), {}

    def _layer(path: str) -> DataFrame:
        # partitionBy strips `_bucket` from file content; read bare and
        # drop the label (resolution is keyed, not bucketed).
        return (
            spark.read.schema(snapshot_ddl)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )

    layers = [_layer(manifest["base"])] + [
        _layer(d["data"]) for d in manifest["deltas"]
    ]
    dvs = [spark.read.parquet(d["dv"]) for d in manifest["deltas"]]
    resolved = None
    for j, layer in enumerate(layers):
        # layer j is masked by DVs of layers AFTER j; dvs[i] belongs to
        # layer i+1, so the mask set for layer j is dvs[j:].
        later = dvs[j:]
        surv = layer
        if later:
            mask = later[0]
            for d in later[1:]:
                mask = mask.unionByName(d)
            surv = layer.join(
                F.broadcast(mask.distinct()), on=key_col, how="left_anti"
            )
        resolved = surv if resolved is None else resolved.unionByName(surv)
    return resolved, manifest


def compact_mor(
    spark,
    out: str,
    key_col: str,
    snapshot_ddl: str,
    n_buckets: int = 16,
) -> dict:
    """Lazy compaction: fold the delta layers back into a fresh
    immutable base (one distributed resolve-and-write), commit a new
    manifest with an empty delta list, and drop the superseded delta /
    DV files. Read cost returns to a bare bucket scan. Returns audit
    counts (layers folded, rows in the new base)."""
    import shutil

    version, manifest = _latest_mor_manifest(f"{out}/manifest")
    resolved, _m = read_mor_snapshot(spark, out, key_col, snapshot_ddl)
    n_deltas = len(manifest.get("deltas", []))
    new_base = f"{out}/base/c{version + 1}"
    (
        resolved.withColumn(
            "_bucket", F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets))
        )
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(new_base)
    )
    _commit_mor_manifest(
        out,
        version + 1,
        {
            "version": version + 1,
            "base": new_base,
            "base_fingerprint": _dir_fingerprint(new_base),
            "deltas": [],
            "base_intact": True,
        },
    )
    for d in manifest.get("deltas", []):
        shutil.rmtree(d["data"], ignore_errors=True)
        shutil.rmtree(d["dv"], ignore_errors=True)
    if manifest.get("base") != new_base:
        shutil.rmtree(manifest["base"], ignore_errors=True)
    return {"deltas_folded": n_deltas, "new_base": new_base}


def read_mor_changes(
    spark,
    out: str,
    key_col: str,
    op_col: str,
    snapshot_ddl: str,
) -> "DataFrame":
    """Change-data-feed between the MOR base and its current delta
    layers (Delta Lake ``table_changes`` shape): every delta row is a
    change event, classified by joining against the base's LIVE key
    set — op='D' is a ``delete``, an upsert whose key is live in base
    is an ``update``, an upsert on a key absent (or tombstoned) in
    base is an ``insert``. A delete on a non-live key still emits
    (idempotent delete), mirrored by the oracle. The base live-key
    frame is broadcast — deltas are the small side's many-to-one
    lookups at scale, and no snapshot resolution is needed: CDF reads
    ONLY the delta + base-key layers, never rewrites anything."""
    _version, manifest = _latest_mor_manifest(f"{out}/manifest")
    if not manifest or not manifest.get("deltas"):
        return spark.createDataFrame([], snapshot_ddl + ", change_type string")

    def _layer(path: str) -> DataFrame:
        return (
            spark.read.schema(snapshot_ddl)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )

    base_live = (
        _layer(manifest["base"])
        .filter(F.col(op_col) != "D")
        .select(F.col(key_col).alias("_base_key"))
    )
    changes = _layer(manifest["deltas"][0]["data"])
    for d in manifest["deltas"][1:]:
        changes = changes.unionByName(_layer(d["data"]))
    return changes.join(
        F.broadcast(base_live),
        changes[key_col] == F.col("_base_key"),
        "left_outer",
    ).select(
        *[F.col(c) for c in changes.columns],
        F.when(F.col(op_col) == "D", F.lit("delete"))
        .when(F.col("_base_key").isNotNull(), F.lit("update"))
        .otherwise(F.lit("insert"))
        .alias("change_type"),
    )


def merkle_table_diff(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    fingerprint_col: str = "fp",
    n_buckets: int = 64,
) -> DataFrame:
    """Merkle-style table reconciliation: compare two huge tables by
    per-bucket digests FIRST, then row-diff only the buckets whose
    digests disagree — the cross-replica repair pattern (Cassandra
    repair, DynamoDB sync) that never full-outer-joins two 100 TB
    tables when they are 99.99% identical.

    Bucket = ``hash60('mk|' || key) % n_buckets``; bucket digest =
    (row count, SUM of two independent per-row 31-bit md5 residues) —
    ORDER-INDEPENDENT exact int64 triples (sums commute; 31-bit terms
    keep the int64 sum exact to ~4e9 rows per bucket, and ANSI mode
    never overflows). Two independent residues give ~62 digest bits
    per bucket alongside the count; forging an equal digest over
    different rows needs an md5 preimage — not a random-data concern.

    Scale shape: two scans -> two tiny (n_buckets rows) digest tables
    -> digest anti-compare -> the row-level diff runs behind a bucket
    IN-filter on both sides (with bucketed/partitioned storage this is
    partition pruning). Output: one row per differing key —
    (bucket, key, status in {'changed','only_left','only_right'}).
    """
    from kafka_streams_aggregate_spark.functions.hashing import hash60

    M31 = 1 << 31

    def _row_hash(salt):
        # Length-prefix the key so the (key, fp) encoding is injective:
        # without it, key 'a|b'/fp 'c' and key 'a'/fp 'b|c' concatenate
        # to the same string and a same-bucket pair of such rows would
        # produce equal digests for genuinely different rows.
        k = F.col(key_col).cast("string")
        return hash60(
            F.concat(
                F.lit(salt),
                F.length(k).cast("string"),
                F.lit(":"),
                k,
                F.lit("|"),
                F.col(fingerprint_col).cast("string"),
            )
        ) % M31

    def _prep(df):
        k = F.col(key_col).cast("string")
        return df.select(
            F.col(key_col).alias("key"),
            F.col(fingerprint_col).cast("string").alias("fp"),
            (hash60(F.concat(F.lit("mk|"), k)) % n_buckets).alias("bucket"),
            _row_hash("fpA|").alias("rh1"),
            _row_hash("fpB|").alias("rh2"),
        )

    la = _prep(left)
    rb = _prep(right)
    da = la.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.sum("rh1").alias("d1_l"),
        F.sum("rh2").alias("d2_l"),
    )
    db = rb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum("rh1").alias("d1_r"),
        F.sum("rh2").alias("d2_r"),
    )
    bad = (
        da.join(db, "bucket", "full_outer")
        .where(
            ~(
                (F.col("n_l") == F.col("n_r"))
                & (F.col("d1_l") == F.col("d1_r"))
                & (F.col("d2_l") == F.col("d2_r"))
            )
            | F.col("n_l").isNull()
            | F.col("n_r").isNull()
        )
        .select("bucket")
    )
    # row-level diff ONLY inside mismatched buckets (broadcast the tiny
    # bucket list as a semi-join filter = partition pruning at scale)
    lf = la.join(F.broadcast(bad), "bucket", "left_semi")
    rf = rb.join(F.broadcast(bad), "bucket", "left_semi")
    j = lf.select("bucket", "key", F.col("fp").alias("fp_l")).join(
        rf.select(F.col("key").alias("r_key"), F.col("fp").alias("fp_r")),
        F.col("key") == F.col("r_key"),
        "full_outer",
    )
    return j.select(
        F.coalesce(
            F.col("bucket"),
            hash60(
                F.concat(F.lit("mk|"), F.col("r_key").cast("string"))
            )
            % n_buckets,
        ).alias("bucket"),
        F.coalesce(F.col("key"), F.col("r_key")).alias("key"),
        F.when(F.col("key").isNull(), F.lit("only_right"))
        .when(F.col("r_key").isNull(), F.lit("only_left"))
        .when(F.col("fp_l") != F.col("fp_r"), F.lit("changed"))
        .alias("status"),
    ).where(F.col("status").isNotNull())


def occ_conflict_check(
    txn_a: DataFrame,
    txn_b: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Optimistic-concurrency commit check: two transactions branched
    from the same snapshot each bring a write set (upserts keyed by
    ``key_col``; a NULL ``value_col`` row is a delete) — classify
    every key either transaction touched:

      a_only / b_only   disjoint writes — both commits can land
      benign            both wrote the SAME outcome (idempotent
                        double-write, incl. both deleting) — safe
      conflict          both wrote, outcomes differ — the second
                        committer must retry or merge

    This is the key-level write-write check a lakehouse commit
    protocol runs before accepting the second of two concurrent
    commits (serializable OCC a la Delta/Iceberg; read-set validation
    is the caller's policy knob, documented rather than simulated).

    Scale shape: one full-outer equi-join of the two WRITE SETS — the
    small deltas, never the table — plus row-local classification.
    Exact semantics: NULL-safe comparison (``eqNullSafe``) makes
    delete-vs-delete benign and delete-vs-update a conflict.

    Output: (key, in_a, in_b, status) with status in
    {'a_only','b_only','benign','conflict'} — all exact.
    """
    a = txn_a.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("string").alias("_va"),
        F.lit(1).alias("_ia"),
    )
    b = txn_b.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("string").alias("_vb"),
        F.lit(1).alias("_ib"),
    )
    j = a.join(b, "key", "full_outer")
    return j.select(
        "key",
        F.coalesce("_ia", F.lit(0)).cast("bigint").alias("in_a"),
        F.coalesce("_ib", F.lit(0)).cast("bigint").alias("in_b"),
        F.when(F.col("_ib").isNull(), F.lit("a_only"))
        .when(F.col("_ia").isNull(), F.lit("b_only"))
        .when(F.col("_va").eqNullSafe(F.col("_vb")), F.lit("benign"))
        .otherwise(F.lit("conflict"))
        .alias("status"),
    )
