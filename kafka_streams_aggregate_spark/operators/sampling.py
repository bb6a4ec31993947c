"""Training-mix construction: exact proportional allocation + the
deterministic per-stratum draw.

``q_mixture_weights`` reports what the mix IS; this module builds the
mix you ASKED for: given a total sample budget K and per-stratum
counts, allocate integer quotas proportionally with the
largest-remainder (Hamilton) method — the allocation rule that is
exactly proportional in expectation, always sums to K, and never
strands a fractional document — then draw each stratum's quota by md5
order (the repo's reproducible-sample family: the draw is a total
order, independent of partitioning, and identically computable by the
DuckDB oracle).

Everything is exact integer arithmetic: quota numerators K*n_i,
floor-division bases, remainder ranking with the stratum key as
tiebreaker. Bound: K * max(n_i) < 2^63.

Scale shape: stratum stats are one map-side-combinable groupBy; the
allocation table is strata-sized (broadcast); the draw is one window
per stratum (rank by md5) + filter — no collect, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.functions.hashing import hash60

__all__ = ["largest_remainder_allocation", "allocated_sample"]


def largest_remainder_allocation(
    df: DataFrame, stratum_col: str, budget: int
) -> DataFrame:
    """Hamilton-method integer quotas per stratum.

    Output: (stratum, n, quota_base, quota_rem, alloc) — BIGINT; the
    invariant sum(alloc) == min(budget, total rows) holds whenever
    budget <= total (each stratum's alloc <= its n is NOT enforced —
    Hamilton can over-allocate a stratum only if budget > total).
    """
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # strata-bounded frame: the full-frame windows run on one partition
    # of a handful of rows (same pattern as the privacy-domain grid)
    quotas = counts.select(
        "stratum",
        "n",
        F.sum("n").over(w_all).cast("bigint").alias("_total"),
    ).select(
        "stratum",
        "n",
        F.expr(f"(CAST({budget} AS BIGINT) * n) div _total").alias(
            "quota_base"
        ),
        F.expr(f"(CAST({budget} AS BIGINT) * n) % _total").alias(
            "quota_rem"
        ),
        F.col("_total"),
    )
    w_rank = Window.orderBy(
        F.col("quota_rem").desc(), F.col("stratum").asc()
    )
    w_sum = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return quotas.select(
        "stratum",
        "n",
        F.col("quota_base").cast("bigint").alias("quota_base"),
        F.col("quota_rem").cast("bigint").alias("quota_rem"),
        (
            F.col("quota_base")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(budget) - F.sum("quota_base").over(w_sum),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )


def allocated_sample(
    df: DataFrame, stratum_col: str, id_col: str, budget: int
) -> DataFrame:
    """Draw each stratum's Hamilton quota by md5 order: rank rows
    within the stratum by hash60('mix|' || id) (unique ids make it a
    total order) and keep rank <= alloc. Reproducible under any
    partitioning; the same expression ranks rows in the oracle."""
    alloc = largest_remainder_allocation(df, stratum_col, budget)
    ranked = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        F.row_number()
        .over(
            Window.partitionBy(stratum_col).orderBy(
                hash60(
                    F.concat(F.lit("mix|"), F.col(id_col).cast("string"))
                ),
                F.col(id_col),
            )
        )
        .cast("bigint")
        .alias("draw_rank"),
    )
    return ranked.join(F.broadcast(alloc), "stratum").where(
        F.col("draw_rank") <= F.col("alloc")
    ).select("stratum", "id", "draw_rank")


def stratified_kfold(
    df: DataFrame, stratum_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Stratified k-fold assignment: within each stratum, rows are
    ranked by the md5 order (reproducible shuffle, partitioning-
    independent) and dealt round-robin — so every stratum's fold sizes
    differ by at most one (the stratification guarantee a plain
    hash-mod split does NOT give on small strata). The CV-prep
    counterpart of hash_split/sample_stratified.

    Output: (stratum, id, fold) with fold in [0, k). One window per
    stratum; exact integers throughout.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash60(F.concat(F.lit("cv|"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        ((F.row_number().over(w) - 1) % k).cast("bigint").alias("fold"),
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weight-proportional sample without replacement —
    priority sampling (Duffield, Lund, Thorup 2007), the
    heavier-rows-more-likely draw a training pipeline uses to
    subsample a corpus by quality score or revenue weight without an
    RNG: each row gets priority w / u for a uniform u, and the top-k
    priorities form the sample (near-optimal variance for subset-sum
    estimation, per the paper).

    Determinism + parity: u is the md5-residue family — a 30-bit
    residue h = hash60('ps|' || key) % 2^30 + 1, so the priority
    SURROGATE ``pq = (w << 30) div h`` is exact int64 (bound:
    w < 8.5e9 keeps w*2^30 < 2^63) and identically computable by
    DuckDB; ranking by (pq DESC, key) is a total order, reproducible
    under any partitioning. Integer division collapses only
    astronomically-close priorities, identically in both engines.

    Scale shape: one TakeOrdered top-k (no global sort); weights stay
    where they are — nothing shuffles but the k winners.

    Output: (key, weight, h, pq, rank), rank 1..k.
    """
    h = (
        hash60(F.concat(F.lit("ps|"), F.col(key_col).cast("string")))
        % F.lit(1 << 30)
        + 1
    ).cast("bigint")
    scored = df.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("bigint").alias("weight"),
        h.alias("h"),
    ).withColumn(
        # integer `div`, never float `/`: w*2^30 exceeds 2^53, where a
        # double round-trip would corrupt low bits
        "pq",
        F.expr(f"(weight * {1 << 30}) div h").cast("bigint"),
    )
    w = Window.orderBy(F.col("pq").desc(), F.col("key").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def neyman_allocation(
    df: DataFrame, stratum_col: str, v_col: str, budget: int,
    vn_shift: int = 30,
) -> DataFrame:
    """Neyman (optimal) stratified-sample allocation — sample sizes
    proportional to N_h * sigma_h, the design that minimizes the
    estimator variance at fixed budget (proportional allocation
    over-samples homogeneous strata; Neyman is what survey and
    data-audit pipelines actually want).

    N_h * sigma_h = sqrt(N_h*Q_h - S_h^2) exactly (the population-
    variance numerator IS (N_h sigma_h)^2), so the weight needs ONE
    sqrt — kept parity-safe by the scaled-integer discipline:
    VN div 2^vn_shift is an exact integer in BOTH engines and below
    2^53 for cent-scale data through multi-TB strata, its
    int->double cast is exact, the IEEE sqrt is correctly rounded,
    and floor lands back in integer space:

        w_h = floor(sqrt(VN_h div 2^vn_shift))

    Hamilton largest-remainder then allocates ``budget`` exactly.
    Zero-variance strata get w = 0 (Neyman assigns them nothing
    beyond remainders — documented). Degenerate all-zero-variance
    input (total weight 0) emits NULL share_ppm/alloc per the repo's
    zero-denominator convention instead of throwing under ANSI.
    Output: (stratum, n, vn_scaled, w_neyman, share_ppm, alloc)."""
    d = "CAST({e} AS DECIMAL(38,0))"
    per = (
        df.select(
            F.col(stratum_col).alias("stratum"),
            F.col(v_col).cast("bigint").alias("v"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            F.sum(
                F.expr(d.format(e="v") + " * " + d.format(e="v"))
            ).alias("q"),
        )
        .select(
            "stratum",
            "n",
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * q"
                " - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"
                f" div {1 << vn_shift} AS BIGINT)"
            ).alias("vn_scaled"),
        )
        .select(
            "stratum",
            "n",
            "vn_scaled",
            F.expr(
                "CAST(floor(sqrt(CAST(vn_scaled AS DOUBLE))) AS BIGINT)"
            ).alias("w_neyman"),
        )
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per.select(
        "stratum",
        "n",
        "vn_scaled",
        "w_neyman",
        F.sum("w_neyman").over(w_all).cast("bigint").alias("_w"),
    ).select(
        "stratum",
        "n",
        "vn_scaled",
        "w_neyman",
        F.expr(
            "CASE WHEN _w > 0 THEN"
            " CAST((1000000 * w_neyman) div _w AS BIGINT) END"
        ).alias("share_ppm"),
        F.expr(
            "CASE WHEN _w > 0 THEN"
            f" (CAST({budget} AS BIGINT) * w_neyman) div _w END"
        ).alias("_base"),
        F.expr(
            "CASE WHEN _w > 0 THEN"
            f" (CAST({budget} AS BIGINT) * w_neyman) % _w END"
        ).alias("_rem"),
    )
    w_rank = Window.orderBy(F.col("_rem").desc(), F.col("stratum").asc())
    w_sum = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return staged.select(
        "stratum",
        "n",
        "vn_scaled",
        "w_neyman",
        "share_ppm",
        (
            F.col("_base")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(budget) - F.sum("_base").over(w_sum),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )


def horvitz_thompson(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    v_col: str,
    rate_col: str,
    mod_base: int = 64,
) -> DataFrame:
    """Horvitz-Thompson total estimator under deterministic
    unequal-probability sampling — the inverse-inclusion-weighted sum
    that stays unbiased when strata are sampled at DIFFERENT rates
    (the audit-sampling workhorse: sample big strata thin, small
    strata thick, still estimate the population total).

    Inclusion is the md5 hash family: a row enters the sample when
    conv(md5('ht|'||id)) mod ``mod_base`` < rate_s — reproducible
    cross-engine, no RNG. With a constant rate per stratum the HT
    estimate needs ONE floor per stratum:

        est_total_s = (sum_sampled v * mod_base) div rate_s

    and because the frame still holds the full stratum, the TRUE
    total rides along with the signed error:

        err_ppm = (1e6 * (est - true)) div true   (NULL when true=0)

    — the estimator audits itself. The constant-rate-per-stratum
    assumption is ENFORCED: when min(rate) != max(rate) inside a
    stratum, est_total and err_ppm are NULL (a biased estimate is
    never emitted silently). Output: (stratum, n_pop, n_sampled,
    rate, true_total, est_total, err_ppm)."""
    res = (
        f"CAST(conv(substr(md5(concat('ht|', CAST({id_col} AS STRING))),"
        f" 1, 15), 16, 10) AS BIGINT) % {mod_base}"
    )
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(v_col).cast("bigint").alias("v"),
        F.col(rate_col).cast("bigint").alias("rate"),
        (F.expr(res) < F.col(rate_col)).alias("_in"),
    )
    agg = base.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum(F.expr("CASE WHEN _in THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_sampled"),
        F.max("rate").cast("bigint").alias("rate"),
        F.min("rate").cast("bigint").alias("_rate_min"),
        F.sum("v").cast("bigint").alias("true_total"),
        F.sum(F.expr("CASE WHEN _in THEN v ELSE 0 END"))
        .cast("bigint")
        .alias("_sampled_sum"),
    )
    # The single-floor HT estimate assumes ONE inclusion rate per
    # stratum; a violating caller gets NULL estimates (loud in any
    # downstream arithmetic), never a silently biased total.
    return agg.select(
        "stratum",
        "n_pop",
        "n_sampled",
        "rate",
        "true_total",
        F.expr(
            "CASE WHEN rate = _rate_min AND rate > 0 THEN"
            f" CAST((_sampled_sum * {mod_base}) div rate AS BIGINT) END"
        ).alias("est_total"),
        F.expr(
            "CASE WHEN rate = _rate_min AND rate > 0"
            " AND true_total <> 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            f" * ((_sampled_sum * {mod_base}) div rate - true_total))"
            " div true_total AS BIGINT) END"
        ).alias("err_ppm"),
    )
