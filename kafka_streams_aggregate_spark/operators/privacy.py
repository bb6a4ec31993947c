"""Privacy-release audits beyond k-anonymity: l-diversity and
t-closeness.

Completes the family started by ``q_k_anonymity_audit``
(queries/extended.py): k-anonymity only bounds group SIZE — a group of
50 rows that all share one sensitive value still leaks it
(homogeneity attack; Machanavajjhala et al. 2007 motivate l-diversity),
and a group whose sensitive distribution skews far from the corpus
leaks probabilistically even when diverse (Li et al. 2007,
t-closeness). Both audits here are exact-integer:

  - l-diversity: distinct sensitive values per quasi-identifier group,
    flagged when < l. A plain two-level aggregate.
  - t-closeness over an ORDERED sensitive domain: the Earth-Mover
    Distance specializes to the sum of absolute prefix-mass
    differences, EMD = (1/(m-1)) * sum_i |cum_p_i - cum_q_i|. With
    integer counts the comparison needs no division at all:

        emd_scaled = sum_i |cum_gc_i * N - cum_c_i * gn|
        violation  <=>  t_den * emd_scaled > t_num * gn * N * (m-1)

    — exact int64 cross products (documented bound:
    group_size * corpus_size * m * t_den < 2^63).

Scale shape: two map-side-combinable aggregates (per (QI, s) then per
QI), the tiny ordered domain (m rows, with prefix masses precomputed)
broadcast onto the group table for the zero-count grid — a bounded
x m fan-out, the contribution-grid pattern — then one window per QI
group and one final aggregate. No row-level data crosses a second
shuffle; the audit runs on aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ldiv_tclose_audit"]


def ldiv_tclose_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l_min: int = 3,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """l-diversity + t-closeness audit per quasi-identifier group.

    ``sensitive_col`` must be integer-ordered (band a numeric first).
    Output per QI group: qi columns, ``group_size``,
    ``distinct_sensitive``, ``l_violation`` (0/1),
    ``emd_scaled``, ``emd_denom_scaled`` (= gn * N * (m-1)),
    ``t_violation`` (0/1) — all BIGINT.
    """
    s = sensitive_col
    base = df.select(*qi_cols, F.col(s).cast("bigint").alias("_s"))
    gcounts = base.groupBy(*qi_cols, "_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("_gc")
    )
    gtot = gcounts.groupBy(*qi_cols).agg(
        F.sum("_gc").cast("bigint").alias("group_size"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_sensitive"),
    )
    # ordered sensitive domain with global prefix masses — m rows, so
    # the single-partition window and the broadcast are both bounded
    dom = base.groupBy("_s").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    wd = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    dom = dom.select(
        "_s",
        "_c",
        F.sum("_c").over(wd).cast("bigint").alias("_cum_c"),
        F.sum("_c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("_n_total"),
        F.count(F.lit(1))
        .over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("_m"),
    )
    grid = (
        gtot.crossJoin(F.broadcast(dom))  # bounded x m fan-out
        .join(gcounts, [*qi_cols, "_s"], "left")
        .select(
            *qi_cols,
            "group_size",
            "distinct_sensitive",
            "_s",
            "_cum_c",
            "_n_total",
            "_m",
            F.coalesce("_gc", F.lit(0)).cast("bigint").alias("_gc0"),
        )
    )
    wg = Window.partitionBy(*qi_cols).orderBy("_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    terms = grid.select(
        *qi_cols,
        "group_size",
        "distinct_sensitive",
        "_n_total",
        "_m",
        F.abs(
            F.sum("_gc0").over(wg).cast("bigint") * F.col("_n_total")
            - F.col("_cum_c") * F.col("group_size")
        ).alias("_term"),
    )
    agg = terms.groupBy(
        *qi_cols, "group_size", "distinct_sensitive", "_n_total", "_m"
    ).agg(F.sum("_term").cast("bigint").alias("emd_scaled"))
    return agg.select(
        *qi_cols,
        "group_size",
        "distinct_sensitive",
        F.when(F.col("distinct_sensitive") < l_min, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("l_violation"),
        "emd_scaled",
        (F.col("group_size") * F.col("_n_total") * (F.col("_m") - 1))
        .cast("bigint")
        .alias("emd_denom_scaled"),
        F.when(
            F.lit(t_den) * F.col("emd_scaled")
            > F.lit(t_num)
            * F.col("group_size")
            * F.col("_n_total")
            * (F.col("_m") - 1),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("t_violation"),
    )
