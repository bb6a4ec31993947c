"""Rendezvous (highest-random-weight) sharding — the assignment rule
behind consistent partitioning of keys to a changing shard fleet.

Round-11 staging for the round-12 registration queue (SURVEY §10).
HRW hashing (Thaler–Ravishankar 1998): a key lands on the shard s
maximizing hash(key, s). Its defining property — the reason it beats
``hash(key) % N`` at scale — is MINIMAL MOVEMENT: growing the fleet
from N to N+1 moves exactly the keys whose new shard N+1 wins, an
expected 1/(N+1) fraction; mod-N reshuffles almost everything. The
operator computes both assignments and the movement audit, all on the
cross-engine md5 hash family (``functions/hashing.py``), so a DuckDB
oracle reproduces every assignment bit-for-bit.

Reference scope note: the reference app (kafka-streams-aggregate)
delegates partitioning to Kafka's murmur2-on-key; this operator is
the engine-owned generalization (absent-category row per SURVEY
§2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.functions.hashing import hash60


def _w56(col):
    """56-bit md5 weight (14 hex digits) — 4 bits of headroom below
    the 60-bit family so the packed (weight, shard) ordinal stays
    inside a signed BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def _best_shard(key_col: str, n_shards: int):
    """argmax over shards of the 56-bit md5 weight, as greatest() over
    PACKED ordinals w*16 + shard (DuckDB's greatest rejects structs —
    the packing is the portable argmax; lexicographic (w, shard), so
    ties of probability ~2^-56 break toward the higher shard id).
    Contract: n_shards <= 16."""
    if not (1 <= n_shards <= 16):
        raise ValueError("rendezvous: n_shards must be in 1..16")
    packed = [
        _w56(F.concat(F.col(key_col).cast("string"), F.lit(f"#{s}")))
        * F.lit(16).cast("bigint")
        + F.lit(s).cast("bigint")
        for s in range(n_shards)
    ]
    best = F.greatest(*packed) if len(packed) > 1 else packed[0]
    return (best % F.lit(16).cast("bigint")).cast("bigint")


def rendezvous_assignment(
    df: DataFrame, key_col: str, n_shards: int, n_shards_after: int
) -> DataFrame:
    """Per-key HRW assignment under two fleet sizes plus the moved
    flag. Pure per-row codegen (n_shards md5 calls per row) — no
    shuffle, no UDF; at 100 TB this is a map-only stage and the
    shard count is a config constant."""
    return df.select(
        F.col(key_col).alias("key"),
        _best_shard(key_col, n_shards).alias("shard_before"),
        _best_shard(key_col, n_shards_after).alias("shard_after"),
    ).withColumn(
        "moved", (F.col("shard_before") != F.col("shard_after"))
    )


def rendezvous_movement_audit(
    df: DataFrame, key_col: str, n_shards: int, n_shards_after: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """The minimal-movement proof as a one-row audit: n_keys, n_moved,
    moved_ppm, and the mod-N STRAWMAN's movement for contrast (mod
    reshuffles ~(1 - 1/new) of keys when N changes; HRW moves
    ~1/new). Exact integers end to end."""
    a = rendezvous_assignment(df, key_col, n_shards, n_shards_after)
    modded = df.select(
        (hash60(F.col(key_col).cast("string")) % n_shards).alias("mb"),
        (hash60(F.col(key_col).cast("string")) % n_shards_after).alias("ma"),
    )
    hrw = a.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("moved").cast("int")).cast("bigint").alias("n_moved_hrw"),
    )
    mod = modded.agg(
        F.sum((F.col("mb") != F.col("ma")).cast("int"))
        .cast("bigint")
        .alias("n_moved_mod"),
    )
    return hrw.crossJoin(mod).select(
        "n_keys",
        "n_moved_hrw",
        "n_moved_mod",
        F.expr(f"CAST(({scale} * n_moved_hrw) div n_keys AS BIGINT)").alias(
            "hrw_moved_ppm"
        ),
        F.expr(f"CAST(({scale} * n_moved_mod) div n_keys AS BIGINT)").alias(
            "mod_moved_ppm"
        ),
    )
