"""Deterministic bootstrap resampling — percentile CIs without RNG.

The missing piece between the point statistics (q_exact_moments,
q_winsorized_stats, q_mad_robust) and the sampling family
(q_sample_weighted's Horvitz-Thompson, q_aqp_sampled_mean's AQP
error bars): a *bootstrap* confidence interval for a group mean,
computed with the repo's md5 hash family instead of a random number
generator, so every draw is reproducible under any partitioning AND
cell-exactly mirrored by a DuckDB oracle (the seeded-constants /
md5-residue trick family — see `q_sample_weighted`,
`operators/dedup.py`).

Method (percentile bootstrap): for each group of n rows, draw B
resamples of m draws-with-replacement each; draw (b, slot) selects
row index ``hash60('bs|' || grp || '|' || b || '|' || slot) % n``.
Each resample's mean estimates the sampling distribution of the
group mean; the CI is [rank lo_rank, rank hi_rank] of the B resample
sums (ranked with the resample id as tiebreaker — every rank is a
total order, per the repo's LIMIT/top-k rule). All arithmetic stays
in exact integer cents: resample SUMS are ranked (equivalent to
ranking means, m is constant) and only floor-divided (``div`` /
``//``) at the end.

Scale shape: the fan-out is G x B x m rows — INDEPENDENT of n (100 TB
of rows per group costs the same as 100 MB; only the row-number
indexing pass scales with n, and that is one window over the group
exchange). The draw->value lookup is a plain equi-join on
(group, idx); per-group work is a constant B*m so there is no skew
amplification. No RNG state, no driver-side loop, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.functions.hashing import hash60

__all__ = ["bootstrap_mean_ci"]


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_cents_col: str,
    order_col: str,
    n_resamples: int = 64,
    draws_per_resample: int = 100,
    lo_rank: int = 2,
    hi_rank: int = 63,
) -> DataFrame:
    """Percentile-bootstrap CI for the per-group mean (exact cents).

    ``df`` needs an integer-cents value column and a unique
    ``order_col`` within each group (row indexing must be a total
    order). Defaults give a ~95% CI (ranks 2 and 63 of 64).

    Output per group: ``group_key``, ``n``, ``b_resamples``,
    ``point_mean_cents``, ``boot_mean_lo_cents``,
    ``boot_mean_hi_cents`` — all BIGINT.
    """
    grp, val, oc = group_col, value_cents_col, order_col
    vals = df.select(
        F.col(grp).cast("bigint").alias("grp"),
        F.col(val).cast("bigint").alias("v_cents"),
        (
            F.row_number().over(
                Window.partitionBy(grp).orderBy(oc)
            )
            - 1
        ).alias("rn"),
    )
    g = vals.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_cents").cast("bigint").alias("s"),
    )
    draws = (
        g.select(
            "grp",
            "n",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_resamples - 1))
            ).alias("b"),
        )
        .select(
            "grp",
            "n",
            "b",
            F.explode(
                F.sequence(F.lit(0), F.lit(draws_per_resample - 1))
            ).alias("slot"),
        )
        .select(
            # renamed: draws derives from vals, so same-name columns would
            # resolve ambiguously (trivially-true self-join predicate)
            F.col("grp").alias("d_grp"),
            "b",
            (
                hash60(
                    F.concat(
                        F.lit("bs|"),
                        F.col("grp").cast("string"),
                        F.lit("|"),
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("slot").cast("string"),
                    )
                )
                % F.col("n")
            ).alias("idx"),
        )
    )
    sums = (
        draws.join(
            vals,
            (F.col("d_grp") == F.col("grp")) & (F.col("idx") == F.col("rn")),
        )
        .groupBy(F.col("d_grp").alias("grp"), F.col("b"))
        .agg(F.sum("v_cents").cast("bigint").alias("rs"))
    )
    ranked = sums.withColumn(
        "rk", F.row_number().over(Window.partitionBy("grp").orderBy("rs", "b"))
    )
    ci = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("rk") == lo_rank, F.col("rs"))).alias("lo_s"),
        F.max(F.when(F.col("rk") == hi_rank, F.col("rs"))).alias("hi_s"),
    )
    return g.join(ci, "grp").select(
        F.col("grp").alias("group_key"),
        F.col("n"),
        F.lit(n_resamples).cast("bigint").alias("b_resamples"),
        F.expr("floor(s / n)").cast("bigint").alias("point_mean_cents"),
        F.expr(f"floor(lo_s / {draws_per_resample})")
        .cast("bigint")
        .alias("boot_mean_lo_cents"),
        F.expr(f"floor(hi_s / {draws_per_resample})")
        .cast("bigint")
        .alias("boot_mean_hi_cents"),
    )
