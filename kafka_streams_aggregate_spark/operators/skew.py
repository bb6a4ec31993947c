"""Skew-handling operators.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
explicit salting is the declarative fallback when a *known* hot key
would otherwise serialize one reducer — e.g. grouping 100 TB of events
by a 5-value event_type column.

``salted_agg`` runs algebraic aggregates in two phases: phase 1 groups
on (key, salt) — spreading each hot key over ``buckets`` reducers —
and phase 2 re-combines the partials per key. Only algebraic aggregates
(sum/count/min/max) re-combine losslessly; that's enforced."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts re-combine by summing
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def replicated_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side's key into ``buckets``
    sub-keys and replicate every small-side row once per bucket, so a
    hot key's rows spread over ``buckets`` reducers instead of one.

    Use when one side is too large to broadcast AND the key histogram
    is too skewed for a plain sort-merge (AQE's skew split handles
    moderate skew; this handles the pathological single-hot-key case
    deterministically). Cost: small side is materialized ``buckets``
    times into the shuffle.

    Only ``inner`` and ``left`` are supported: the small side is
    replicated once per bucket, so right/full outer would emit each
    unmatched small-side row ``buckets`` times."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"replicated_salted_join supports how in ('inner', 'left'); got {how!r} "
            "(replicated small-side rows would duplicate unmatched outer rows)"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    )
    replicas = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    joined = salted_big.join(replicas, [on, "_salt"], how)
    return joined.drop("_salt")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: {output_name: (column, fn)} with fn in {sum, count, min, max}.
    The salt is a deterministic spread (pmod of a random-ish hash per
    row via monotonically_increasing_id is NOT used — it must be
    deterministic, so we hash all key + payload columns)."""
    for name, (_col, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r} cannot be salted")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            *[
                _PARTIAL[fn](F.col(col)).alias(f"_p_{name}")
                for name, (col, fn) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            _MERGE[fn](F.col(f"_p_{name}")).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    topk: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """The pre-join/pre-agg DIAGNOSTIC this module's cures
    (``replicated_salted_join``, ``salted_agg``) are prescribed from:
    how concentrated is the key distribution, and which keys carry the
    mass? At 1000 executors a single hot key serializes the whole
    stage — this report is what you read BEFORE choosing a salt
    factor.

    Output: top-k keys by count (total order: count DESC, key ASC),
    each row also carrying the distribution summary (all exact int64):
    n_rows, n_keys, max_cnt, p99_cnt (ceil-rank order statistic over
    per-key counts), and

        skew_ppm = (scale * max_cnt * n_keys) div n_rows

    — 1e6 means perfectly uniform; k×1e6 means the hottest key is k×
    the mean, i.e. the stage's straggler factor under hash
    partitioning (and the salt factor that would flatten it).

    Shape: one map-side-combinable key count, then window work over
    the KEY table (n_keys rows, not n_rows) — the heavy frame is
    touched once. NULL keys count as a key (they hash-partition
    together — exactly the classic skew source — so hiding them would
    defeat the point).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wall = Window.partitionBy()
    wrank = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    wcnt = Window.orderBy("cnt")
    enriched = (
        counts.withColumn("n_keys", F.count(F.lit(1)).over(wall))
        .withColumn("n_rows", F.sum("cnt").over(wall))
        .withColumn("max_cnt", F.max("cnt").over(wall))
        .withColumn("rn_asc", F.row_number().over(wcnt))
        .withColumn(
            "p99_cnt",
            F.min(
                F.when(
                    F.expr("rn_asc >= (99 * n_keys + 99) div 100"),
                    F.col("cnt"),
                )
            ).over(wall),
        )
        .withColumn("rank", F.row_number().over(wrank))
    )
    return (
        enriched.where(F.col("rank") <= topk)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            F.col("key").cast("string").alias("key"),
            "cnt",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.col("max_cnt").cast("bigint").alias("max_cnt"),
            F.col("p99_cnt").cast("bigint").alias("p99_cnt"),
            F.expr(
                f"CAST(({scale} * max_cnt * n_keys) div n_rows AS BIGINT)"
            ).alias("skew_ppm"),
        )
    )
