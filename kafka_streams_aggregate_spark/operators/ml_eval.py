"""Classifier / experiment evaluation operators — exact-integer cores.

Round-11 staging for the round-12 registration queue (SURVEY §10).
This family completes the ML-eval leg started by ``auc_roc_exact`` /
``cohens_kappa`` / ``isotonic_fit``: confusion-matrix metrics, a
threshold sweep, calibration bins, ordinal effect size (Cliff's
delta), parametric effect size (Cohen's d) and Welch's t, and the
paired-binary McNemar test.

Design rules (the repo's cross-engine parity discipline):
- every count/rank core is exact int64 (ppm reporting via integer
  division);
- the ONLY float ops are casts of exact integers, IEEE-exact sqrt,
  multiplies and divides spelled in the identical order on both
  engines (bit-equal by correct rounding — no transcendentals);
- sums of squares ride DECIMAL(38,0) where cents² would overflow
  int64 (the q_bootstrap_ci precedent);
- every selection has a total order.

Reference scope note: the reference app (kafka-streams-aggregate,
InventoryCountUpdateEventUpdater.java:26-46) has no analytics surface
— these are absent-category build-out rows per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def confusion_mcc(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Binary confusion matrix + exact-core quality metrics per group.

    Inputs are 0/1 ints. Emits (tp, fp, fn, tn) — one conditional-sum
    aggregate, no shuffle beyond the groupBy — plus:

    - ``accuracy_ppm``/``precision_ppm``/``recall_ppm``/``f1_ppm`` as
      exact integer divisions (f1 uses the division-free identity
      F1 = 2tp / (2tp + fp + fn), so no intermediate rounding);
    - ``mcc`` (Matthews correlation): numerator tp*tn - fp*fn exact
      int64; the denominator sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn)) would
      overflow int64 as a product (n^4), so it is computed as FOUR
      IEEE-exact sqrts multiplied left-associatively — a fixed
      sequence of correctly-rounded ops, spelled identically in the
      oracle, hence bit-equal. NULL when any marginal is zero (MCC
      undefined).
    """
    gc = "group_key"
    agg = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(label_col).cast("bigint").alias("y"),
            F.col(pred_col).cast("bigint").alias("p"),
        )
        .groupBy(gc)
        .agg(
            F.sum(F.expr("CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.expr("CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.expr("CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("fn"),
            F.sum(F.expr("CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("tn"),
        )
    )
    return agg.select(
        gc,
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            f"CAST(({scale} * (tp + tn)) div (tp + fp + fn + tn) AS BIGINT)"
        ).alias("accuracy_ppm"),
        F.expr(
            f"CASE WHEN tp + fp > 0 THEN CAST(({scale} * tp) div (tp + fp)"
            " AS BIGINT) END"
        ).alias("precision_ppm"),
        F.expr(
            f"CASE WHEN tp + fn > 0 THEN CAST(({scale} * tp) div (tp + fn)"
            " AS BIGINT) END"
        ).alias("recall_ppm"),
        F.expr(
            f"CASE WHEN 2 * tp + fp + fn > 0 THEN CAST(({scale} * 2 * tp)"
            " div (2 * tp + fp + fn) AS BIGINT) END"
        ).alias("f1_ppm"),
        F.expr(
            "CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0 AND (tn + fp) > 0"
            " AND (tn + fn) > 0 THEN"
            " CAST(tp * tn - fp * fn AS DOUBLE)"
            " / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))"
            "    * sqrt(CAST(tn + fp AS DOUBLE))"
            "    * sqrt(CAST(tn + fn AS DOUBLE))) END"
        ).alias("mcc"),
    )


def pr_threshold_sweep(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    thresholds: list[int],
    scale: int = 1_000_000,
) -> DataFrame:
    """Precision/recall/F1 at fixed integer score thresholds, per
    group — the operating-point table a deployment review reads next
    to the single-number AUC.

    Shape: ONE scan; every threshold's (tp, fp, fn) is a conditional
    sum in the same aggregate, then a k-row stack — no threshold-table
    join touches the data (the q_ecdf_probe shape). All counts exact
    int64; ppm metrics by integer division; F1 division-free
    (2tp / (2tp+fp+fn)). Prediction rule: ``score >= t``.
    """
    gc = "group_key"
    aggs = []
    for i, t in enumerate(thresholds):
        aggs += [
            F.sum(
                F.expr(f"CASE WHEN score >= {t} AND y = 1 THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias(f"tp_{i}"),
            F.sum(
                F.expr(f"CASE WHEN score >= {t} AND y = 0 THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias(f"fp_{i}"),
            F.sum(
                F.expr(f"CASE WHEN score < {t} AND y = 1 THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias(f"fn_{i}"),
        ]
    wide = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(score_col).cast("bigint").alias("score"),
            F.col(label_col).cast("bigint").alias("y"),
        )
        .groupBy(gc)
        .agg(*aggs)
    )
    stack = ", ".join(
        f"{t}L, tp_{i}, fp_{i}, fn_{i}" for i, t in enumerate(thresholds)
    )
    tall = wide.select(
        gc,
        F.expr(
            f"stack({len(thresholds)}, {stack}) AS (threshold, tp, fp, fn)"
        ),
    ).select(
        gc,
        F.col("threshold").cast("bigint").alias("threshold"),
        "tp",
        "fp",
        "fn",
    )
    return tall.select(
        gc,
        "threshold",
        "tp",
        "fp",
        "fn",
        F.expr(
            f"CASE WHEN tp + fp > 0 THEN CAST(({scale} * tp) div (tp + fp)"
            " AS BIGINT) END"
        ).alias("precision_ppm"),
        F.expr(
            f"CASE WHEN tp + fn > 0 THEN CAST(({scale} * tp) div (tp + fn)"
            " AS BIGINT) END"
        ).alias("recall_ppm"),
        F.expr(
            f"CASE WHEN 2 * tp + fp + fn > 0 THEN CAST(({scale} * 2 * tp)"
            " div (2 * tp + fp + fn) AS BIGINT) END"
        ).alias("f1_ppm"),
    )


def calibration_bins(
    df: DataFrame,
    group_col: str,
    score_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability-diagram bins per group: bucket predictions by score
    (ppm in [0, scale]), compare mean predicted ppm to observed
    positive rate ppm — the calibration audit that pairs with
    ``isotonic_fit`` (the fixer) and ``auc_roc_exact`` (the ranker).

    bin = min(score * n_bins div scale, n_bins - 1) so score = scale
    lands in the top bin. All exact integers: mean_score_ppm and
    pos_rate_ppm by integer division, gap signed. One aggregate."""
    gc = "group_key"
    return (
        df.select(
            F.col(group_col).alias(gc),
            F.col(score_ppm_col).cast("bigint").alias("s"),
            F.col(label_col).cast("bigint").alias("y"),
        )
        .select(
            gc,
            "s",
            "y",
            F.expr(
                f"least(CAST((s * {n_bins}) div {scale} AS BIGINT),"
                f" {n_bins - 1})"
            ).alias("bin"),
        )
        .groupBy(gc, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum("s").cast("bigint").alias("score_sum"),
        )
        .select(
            gc,
            "bin",
            "n",
            "n_pos",
            F.expr("CAST(score_sum div n AS BIGINT)").alias("mean_score_ppm"),
            F.expr(f"CAST(({scale} * n_pos) div n AS BIGINT)").alias(
                "pos_rate_ppm"
            ),
            F.expr(
                f"CAST(({scale} * n_pos) div n - score_sum div n AS BIGINT)"
            ).alias("gap_ppm"),
        )
    )


def cliffs_delta(
    df: DataFrame,
    group_col: str,
    sample_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cliff's delta (ordinal effect size) between two samples per
    group, LINEAR via the Mann-Whitney rank identity — never the
    quadratic pair enumeration:

        delta = (#(a>b) - #(a<b)) / (n_a * n_b) = (2*U1 - n_a*n_b)/(n_a*n_b)

    and 2*U1 is exact in the repo's DOUBLED-RANK integer space (a tie
    group of size c starting after cum_prev pooled items has
    2*avg_rank = 2*cum_prev + c + 1 — all integers; the
    q_mann_whitney_u machinery per group). ``sample_col`` is 0/1
    (sample a = 1). Emits exact (n_a, n_b, delta_num = 2U1 - n_a*n_b)
    and delta_ppm in [-1e6, 1e6]. Shape: one group-by-value rollup +
    one ordered window over distinct values per group — million-row
    samples never sort row-by-row."""
    gc = "group_key"
    by_val = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(sample_col).cast("bigint").alias("is_a"),
            F.col(value_col).cast("bigint").alias("v"),
        )
        .groupBy(gc, "v")
        .agg(
            F.sum("is_a").cast("bigint").alias("ca"),
            F.sum(F.expr("1 - is_a")).cast("bigint").alias("cb"),
        )
    )
    w = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = by_val.select(
        gc,
        "ca",
        "cb",
        (F.sum(F.col("ca") + F.col("cb")).over(w) - F.col("ca") - F.col("cb"))
        .cast("bigint")
        .alias("cum_prev"),
    )
    agg = ranked.groupBy(gc).agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(
            F.expr("ca * (2 * cum_prev + ca + cb + 1)")
        )
        .cast("bigint")
        .alias("r1_x2"),
    )
    return agg.select(
        gc,
        "n_a",
        "n_b",
        F.expr("CAST(r1_x2 - n_a * (n_a + 1) - n_a * n_b AS BIGINT)").alias(
            "delta_num"
        ),
        F.expr(
            "CASE WHEN n_a > 0 AND n_b > 0 THEN"
            f" CAST(({scale} * (r1_x2 - n_a * (n_a + 1) - n_a * n_b))"
            " div (n_a * n_b) AS BIGINT) END"
        ).alias("delta_ppm"),
    )


def _two_sample_moments(
    df: DataFrame, group_col: str, sample_col: str, value_col: str
) -> DataFrame:
    """Exact per-sample power sums: n, sum(v), sum(v²) with the
    squares on DECIMAL(38,0) (cents² overflows int64 past ~1e5 rows of
    1e7-cent values — the q_bootstrap_ci precedent)."""
    gc = "group_key"
    return (
        df.select(
            F.col(group_col).alias(gc),
            F.col(sample_col).cast("bigint").alias("is_a"),
            F.col(value_col).cast("bigint").alias("v"),
        )
        .groupBy(gc)
        .agg(
            F.sum("is_a").cast("bigint").alias("n1"),
            F.sum(F.expr("1 - is_a")).cast("bigint").alias("n2"),
            F.sum(F.expr("is_a * v")).cast("bigint").alias("s1"),
            F.sum(F.expr("(1 - is_a) * v")).cast("bigint").alias("s2"),
            F.sum(F.expr("CAST(is_a AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))"
                         " * CAST(v AS DECIMAL(38,0))"))
            .cast("decimal(38,0)")
            .alias("q1"),
            F.sum(F.expr("CAST(1 - is_a AS DECIMAL(38,0))"
                         " * CAST(v AS DECIMAL(38,0))"
                         " * CAST(v AS DECIMAL(38,0))"))
            .cast("decimal(38,0)")
            .alias("q2"),
        )
    )


def cohens_d(
    df: DataFrame,
    group_col: str,
    sample_col: str,
    value_col: str,
) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference) between two
    samples per group, plus Welch's t — the parametric effect-size /
    test pair next to the nonparametric Cliff's delta.

    Integer core: per-sample (n, sum, sum-of-squares) — squares on
    DECIMAL(38,0). Float tail, identical spelling on both engines
    (every operand an exact integer cast, then a fixed sequence of
    correctly-rounded IEEE ops — bit-equal):

        ss_i = (n_i*q_i - s_i*s_i) / n_i           (corrected SS)
        d    = (s1/n1 - s2/n2)
               / sqrt((ss1 + ss2) / (n1 + n2 - 2))
        t_welch = (s1/n1 - s2/n2)
               / sqrt(ss1/(n1*(n1-1)) + ss2/(n2*(n2-1)))

    NULL when either sample has < 2 rows. One aggregate, no join."""
    m = _two_sample_moments(df, group_col, sample_col, value_col)
    ss1 = (
        "(CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n1 AS DOUBLE)"
    )
    ss2 = (
        "(CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / CAST(n2 AS DOUBLE)"
    )
    mean_diff = (
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    )
    return m.select(
        "group_key",
        "n1",
        "n2",
        "s1",
        "s2",
        F.expr(
            "CASE WHEN n1 >= 2 AND n2 >= 2 THEN "
            f"{mean_diff} / sqrt(({ss1} + {ss2})"
            " / CAST(n1 + n2 - 2 AS DOUBLE)) END"
        ).alias("cohens_d"),
        F.expr(
            "CASE WHEN n1 >= 2 AND n2 >= 2 THEN "
            f"{mean_diff} / sqrt({ss1} / CAST(n1 * (n1 - 1) AS DOUBLE)"
            f" + {ss2} / CAST(n2 * (n2 - 1) AS DOUBLE)) END"
        ).alias("t_welch"),
    )


def mcnemar(
    df: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """McNemar's paired-binary test per group — did classifier B
    change the answers classifier A got, beyond symmetric noise?
    Only the DISCORDANT cells matter:

        b = #(a=1, b=0),  c = #(a=0, b=1)
        chi2 = (b - c)² / (b + c)

    reported as exact ``chi2_scaled = scale*(b-c)² div (b+c)`` (NULL
    when b + c = 0 — no disagreements, test undefined). One
    conditional-sum aggregate; the concordant counts are emitted for
    the audit trail."""
    gc = "group_key"
    agg = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(a_col).cast("bigint").alias("a"),
            F.col(b_col).cast("bigint").alias("b"),
        )
        .groupBy(gc)
        .agg(
            F.sum(F.expr("CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_both"),
            F.sum(F.expr("CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_neither"),
            F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_only_a"),
            F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_only_b"),
        )
    )
    return agg.select(
        gc,
        "n_both",
        "n_neither",
        "n_only_a",
        "n_only_b",
        F.expr(
            "CASE WHEN n_only_a + n_only_b > 0 THEN"
            f" CAST(({scale} * (n_only_a - n_only_b) * (n_only_a - n_only_b))"
            " div (n_only_a + n_only_b) AS BIGINT) END"
        ).alias("chi2_scaled"),
    )


def uplift_did(
    df: DataFrame,
    group_col: str,
    treat_col: str,
    post_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Difference-in-differences uplift per group — the experiment
    readout over a natural pre/post boundary: did the treated cohort
    move MORE than the control cohort moved on its own?

        DiD = (mean_treat_post - mean_treat_pre)
            - (mean_ctrl_post - mean_ctrl_pre)

    All four cell means are floored ppm-scaled integers
    (scale*sum div n — deterministic in both engines), so the DiD is
    exact integer arithmetic end to end; the four cell (n, sum)
    pairs are emitted for the audit trail. NULL when any cell is
    empty (the design is not identified). ONE conditional-sum
    aggregate — the data is scanned once."""
    gc = "group_key"
    agg = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(treat_col).cast("bigint").alias("t"),
            F.col(post_col).cast("bigint").alias("p"),
            F.col(value_col).cast("bigint").alias("v"),
        )
        .groupBy(gc)
        .agg(
            *[
                f
                for t in (1, 0)
                for p in (1, 0)
                for f in (
                    F.sum(
                        F.expr(f"CASE WHEN t = {t} AND p = {p} THEN 1 ELSE 0 END")
                    )
                    .cast("bigint")
                    .alias(f"n_{'t' if t else 'c'}{'post' if p else 'pre'}"),
                    F.sum(
                        F.expr(f"CASE WHEN t = {t} AND p = {p} THEN v ELSE 0 END")
                    )
                    .cast("bigint")
                    .alias(f"s_{'t' if t else 'c'}{'post' if p else 'pre'}"),
                )
            ]
        )
    )
    mean = lambda cell: f"({scale} * s_{cell}) div n_{cell}"  # noqa: E731
    return agg.select(
        gc,
        "n_tpre",
        "n_tpost",
        "n_cpre",
        "n_cpost",
        "s_tpre",
        "s_tpost",
        "s_cpre",
        "s_cpost",
        F.expr(
            "CASE WHEN n_tpre > 0 AND n_tpost > 0 AND n_cpre > 0"
            " AND n_cpost > 0 THEN CAST("
            f"({mean('tpost')} - {mean('tpre')})"
            f" - ({mean('cpost')} - {mean('cpre')}) AS BIGINT) END"
        ).alias("did_scaled"),
    )


def cuped_adjust(
    df: DataFrame,
    group_col: str,
    arm_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """CUPED variance reduction for an A/B metric (Deng et al. 2013)
    — the standard experimentation trick: regress the post-period
    metric Y on the pre-period covariate X (theta = cov(X,Y)/var(X),
    pooled) and compare arms on the adjusted metric, shrinking
    variance by the squared correlation.

    Integer core: per-group and per-arm exact moments (counts, sums;
    squares and cross products on DECIMAL(38,0) — the
    _two_sample_moments precedent). Float tail, identical spelling on
    both engines (every operand an exact-integer/decimal cast, fixed
    op sequence, divides/multiplies only — bit-equal):

        theta    = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        diff_raw = Sy1/n1 - Sy0/n0
        diff_adj = diff_raw - theta * (Sx1/n1 - Sx0/n0)
        rho_sq   = (n*Sxy - Sx*Sy)^2
                   / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    (rho_sq IS the variance-reduction fraction CUPED removes). NULL
    tail when either arm is empty or var(X) = 0. One aggregate, no
    join, no window."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(arm_col).cast("bigint").alias("t"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    d = "CAST({e} AS DECIMAL(38,0))"
    m = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("t")).cast("bigint").alias("n1"),
        F.sum(F.expr("1 - t")).cast("bigint").alias("n0"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("t * x")).cast("bigint").alias("sx1"),
        F.sum(F.expr("t * y")).cast("bigint").alias("sy1"),
        F.sum(F.expr("(1 - t) * x")).cast("bigint").alias("sx0"),
        F.sum(F.expr("(1 - t) * y")).cast("bigint").alias("sy0"),
        F.sum(F.expr(d.format(e="x") + " * " + d.format(e="x")))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.expr(d.format(e="y") + " * " + d.format(e="y")))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.expr(d.format(e="x") + " * " + d.format(e="y")))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    covn = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    varxn = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    varyn = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    theta = f"({covn} / {varxn})"
    guard = f"n1 > 0 AND n0 > 0 AND {varxn} > 0"
    dx = (
        "(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    )
    dy = (
        "(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    )
    return m.select(
        gc,
        "n",
        "n1",
        "n0",
        "sx",
        "sy",
        F.expr(f"CASE WHEN {guard} THEN {theta} END").alias("theta"),
        F.expr(f"CASE WHEN n1 > 0 AND n0 > 0 THEN {dy} END").alias(
            "diff_raw"
        ),
        F.expr(
            f"CASE WHEN {guard} THEN {dy} - {theta} * {dx} END"
        ).alias("diff_adj"),
        F.expr(
            f"CASE WHEN {varxn} > 0 AND {varyn} > 0 THEN"
            f" ({covn} * {covn}) / ({varxn} * {varyn}) END"
        ).alias("rho_sq"),
    )


def permutation_test(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    value_col: str,
    n_perms: int = 32,
    scale: int = 1_000_000,
) -> DataFrame:
    """Permutation test of an A/B difference in means per group —
    the assumption-free significance check next to the z/t tests: is
    the observed arm difference larger than what random relabelings
    of the SAME units produce?

    Fully deterministic and oracle-able: the observed assignment is
    md5(unit) % 2; permutation b (1..n_perms) relabels with
    md5(unit||'#'||b) % 2 — the md5 hash family, no RNG state. Every
    assignment's per-arm (n, sum) comes from ONE stacked
    conditional-sum aggregate over unit-level pre-totals (the
    explode factor is n_perms+1 over UNITS, not raw rows).

    Exactness: the two-sided comparison |diff_b| >= |diff_obs|
    cross-multiplies the rational means on DECIMAL(38,0) —
    |s1_b*n0_b - s0_b*n1_b| * (n1_o*n0_o) vs the mirrored product —
    no float anywhere; the p-value uses the add-one convention
    p = (1 + #extreme) / (n_perms + 1), ppm-scaled. Output:
    (group_key, n1, n0, diff_num_obs, n_extreme, p_ppm)."""
    gc = "group_key"
    units = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(unit_col).cast("string").alias("u"),
            F.col(value_col).cast("bigint").alias("v"),
        )
        .groupBy(gc, "u")
        .agg(F.sum("v").cast("bigint").alias("v"))
    )
    assigned = units.select(
        gc,
        "u",
        "v",
        F.explode(F.expr(f"sequence(0, {n_perms})")).alias("b"),
    ).select(
        gc,
        "v",
        F.col("b").cast("bigint").alias("b"),
        F.expr(
            "CAST(conv(substr(md5(CASE WHEN b = 0 THEN u"
            " ELSE concat(u, '#', CAST(b AS STRING)) END), 1, 2), 16, 10)"
            " AS BIGINT) % 2"
        ).alias("t"),
    )
    per_b = assigned.groupBy(gc, "b").agg(
        F.sum("t").cast("bigint").alias("n1"),
        F.sum(F.expr("1 - t")).cast("bigint").alias("n0"),
        F.sum(F.expr("t * v")).cast("bigint").alias("s1"),
        F.sum(F.expr("(1 - t) * v")).cast("bigint").alias("s0"),
    )
    obs = per_b.where(F.col("b") == 0).select(
        gc,
        F.col("n1").alias("n1_o"),
        F.col("n0").alias("n0_o"),
        F.col("s1").alias("s1_o"),
        F.col("s0").alias("s0_o"),
    )
    joined = per_b.where(F.col("b") > 0).join(obs, gc)
    dec = "CAST({e} AS DECIMAL(38,0))"
    extreme = joined.select(
        gc,
        "n1_o",
        "n0_o",
        "s1_o",
        "s0_o",
        F.expr(
            "CASE WHEN n1 > 0 AND n0 > 0 AND n1_o > 0 AND n0_o > 0 AND"
            " abs(" + dec.format(e="s1 * n0 - s0 * n1") + ")"
            " * " + dec.format(e="n1_o * n0_o") + " >= "
            "abs(" + dec.format(e="s1_o * n0_o - s0_o * n1_o") + ")"
            " * " + dec.format(e="n1 * n0") + " THEN 1 ELSE 0 END"
        )
        .cast("bigint")
        .alias("is_extreme"),
    )
    return (
        extreme.groupBy(gc)
        .agg(
            F.max("n1_o").alias("n1"),
            F.max("n0_o").alias("n0"),
            F.max(F.expr("s1_o * n0_o - s0_o * n1_o"))
            .cast("bigint")
            .alias("diff_num_obs"),
            F.sum("is_extreme").cast("bigint").alias("n_extreme"),
        )
        .select(
            gc,
            "n1",
            "n0",
            "diff_num_obs",
            "n_extreme",
            F.expr(
                f"CAST(({scale} * (1 + n_extreme)) div {n_perms + 1}"
                " AS BIGINT)"
            ).alias("p_ppm"),
        )
    )


def bh_fdr_cutoff(
    df: DataFrame,
    group_col: str,
    id_col: str,
    p_ppm_col: str,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Benjamini-Hochberg FDR control per experiment family — the
    multiple-testing step a metrics platform runs over a batch of
    ppm-scaled p-values: reject the k smallest p-values where k is
    the LARGEST rank with p_(k) <= alpha * k / m.

    Fully exact integer: the BH inequality cross-multiplies to
    ``p_ppm * m <= alpha_ppm * rank`` (no division), the cutoff is a
    conditional max over the ranked frame, and n_rejected = the
    cutoff rank (BH rejects ALL hypotheses ranked at or below k,
    including any above-threshold stragglers in between — the
    step-up rule, easy to get wrong as a simple filter). Ranks under
    the (p, id) total order. One window + one aggregate + one
    conditional count. Output: (group_key, m, k_cut, p_cut_ppm,
    n_rejected) with k_cut = 0 / NULL p_cut when nothing clears."""
    gc = "group_key"
    w = Window.partitionBy(group_col).orderBy(p_ppm_col, id_col)
    ranked = df.select(
        F.col(group_col).alias(gc),
        F.col(p_ppm_col).cast("bigint").alias("p_ppm"),
        F.row_number().over(w).cast("bigint").alias("rk"),
    )
    # the per-group m must be joined in before the BH compare (it is
    # not visible inside a single agg over the ranked frame)
    m_per = ranked.groupBy(gc).agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    scored = ranked.join(m_per, gc).select(
        gc,
        "p_ppm",
        "rk",
        "m",
        F.expr(f"CASE WHEN p_ppm * m <= {alpha_ppm} * rk THEN rk END").alias(
            "_ok_rk"
        ),
    )
    agg = scored.groupBy(gc).agg(
        F.max("m").alias("m"),
        F.coalesce(F.max("_ok_rk"), F.lit(0)).cast("bigint").alias("k_cut"),
    )
    cut = scored.join(
        agg.select(gc, F.col("k_cut").alias("_kc")), gc
    ).where(F.col("rk") == F.col("_kc")).select(
        gc, F.col("p_ppm").alias("p_cut_ppm")
    )
    return (
        agg.select(gc, "m", "k_cut")
        .join(cut, gc, "left")
        .select(
            gc,
            "m",
            "k_cut",
            F.col("p_cut_ppm").cast("bigint").alias("p_cut_ppm"),
            F.col("k_cut").alias("n_rejected"),
        )
    )


def cronbach_alpha(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    item_col: str,
    v_col: str,
) -> DataFrame:
    """Cronbach's alpha per group — the internal-consistency
    reliability coefficient (do the k items measure one construct?):

        alpha = k/(k-1) * (1 - sum_i Var(v_i) / Var(sum_i v_i))

    EXACT as one integer rational: population-variance NUMERATORS
    n*Q - S^2 (the 1/n^2 factors cancel in the ratio) computed and
    CANCELLED on DECIMAL(38,0) — never subtract post-cast doubles
    past 2^53 (the round-13 wide-int-cast rule) — then

        alpha_ppm = (1e6 * k * (VN_T - sum_i VN_i))
                    div ((k-1) * VN_T)

    floored once. Complete-unit gate (the Friedman rule): units
    missing any of the group's k items are DROPPED and reported —
    a group whose units are ALL incomplete still emits its row
    (NULL stats, non-NULL drop count): ``dropped`` is the superset
    of groups and drives a left join. NULL alpha when VN_T = 0 (no
    unit variance) or k < 2. Output: (group_key, n_units, k,
    alpha_ppm, n_units_dropped)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(unit_col).alias("u"),
        F.col(item_col).alias("item"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    k_per = base.groupBy(gc).agg(
        F.countDistinct("item").cast("bigint").alias("k")
    )
    gate = (
        base.groupBy(gc, "u")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.countDistinct("item").cast("bigint").alias("_ni"),
        )
        .join(k_per, gc)
        .select(
            gc,
            "u",
            ((F.col("_n") == F.col("k")) & (F.col("_ni") == F.col("k"))).alias(
                "_ok"
            ),
        )
    )
    gated = base.join(gate, [gc, "u"]).where(F.col("_ok"))
    d = "CAST({e} AS DECIMAL(38,0))"
    per_item = gated.groupBy(gc, "item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.expr(d.format(e="v") + " * " + d.format(e="v"))).alias("q"),
    )
    item_vn = per_item.groupBy(gc).agg(
        F.max("n").alias("n_units"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * q"
                " - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))"
            )
        ).alias("vn_items"),
    )
    totals = (
        gated.groupBy(gc, "u")
        .agg(F.sum("v").cast("bigint").alias("t"))
        .groupBy(gc)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("t").cast("bigint").alias("_st"),
            F.sum(F.expr(d.format(e="t") + " * " + d.format(e="t"))).alias(
                "_qt"
            ),
        )
        .select(
            gc,
            F.expr(
                "CAST(_n AS DECIMAL(38,0)) * _qt"
                " - CAST(_st AS DECIMAL(38,0)) * CAST(_st AS DECIMAL(38,0))"
            ).alias("vn_total"),
        )
    )
    dropped = gate.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN _ok THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n_units_dropped")
    )
    return (
        dropped.join(item_vn.join(totals, gc), gc, "left")
        .select(
            gc,
            F.col("n_units").cast("bigint").alias("n_units"),
            "k",
            F.expr(
                "CASE WHEN k >= 2 AND vn_total > 0 THEN"
                " CAST((CAST(1000000 AS DECIMAL(38,0)) * k"
                " * (vn_total - vn_items))"
                " div ((k - 1) * vn_total) AS BIGINT) END"
            ).alias("alpha_ppm"),
            "n_units_dropped",
        )
    )


def lin_ccc(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Lin's concordance correlation coefficient per group — the
    method-AGREEMENT statistic Pearson r cannot be (r is invariant
    to scale/shift; CCC penalizes them — two instruments that
    correlate perfectly but disagree by a constant bias get
    CCC < 1):

        CCC = 2*cov(x,y) / (var(x) + var(y) + (mean_x - mean_y)^2)

    Multiplying through by n^2 makes it ONE integer rational over
    raw moments:

        ccc_ppm = (1e6 * 2 * (n*Sxy - Sx*Sy))
                  div (n*Sxx - Sx^2 + n*Syy - Sy^2 + (Sx - Sy)^2)

    computed and cancelled entirely on DECIMAL(38,0) (the round-13
    wide-int-cast rule), floored once. NULL when the denominator is
    0 (both series constant and equal). Output: (group_key, n,
    ccc_ppm)."""
    gc = "group_key"
    d = "CAST({e} AS DECIMAL(38,0))"
    m = df.groupBy(F.col(group_col).alias(gc)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x_col).cast("bigint").alias("sx"),
        F.sum(y_col).cast("bigint").alias("sy"),
        F.sum(
            F.expr(d.format(e=x_col) + " * " + d.format(e=x_col))
        ).alias("sxx"),
        F.sum(
            F.expr(d.format(e=y_col) + " * " + d.format(e=y_col))
        ).alias("syy"),
        F.sum(
            F.expr(d.format(e=x_col) + " * " + d.format(e=y_col))
        ).alias("sxy"),
    )
    num = (
        "(CAST(n AS DECIMAL(38,0)) * sxy"
        " - CAST(sx AS DECIMAL(38,0)) * sy)"
    )
    den = (
        "(CAST(n AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx"
        " + CAST(n AS DECIMAL(38,0)) * syy"
        " - CAST(sy AS DECIMAL(38,0)) * sy"
        " + (CAST(sx AS DECIMAL(38,0)) - sy)"
        " * (CAST(sx AS DECIMAL(38,0)) - sy))"
    )
    return m.select(
        gc,
        "n",
        F.expr(
            f"CASE WHEN {den} > 0 THEN"
            f" CAST((CAST(1000000 AS DECIMAL(38,0)) * 2 * {num})"
            f" div {den} AS BIGINT) END"
        ).alias("ccc_ppm"),
    )


def decile_lift(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Decile lift and cumulative gains — the campaign-targeting
    report next to auc_roc_exact/pr_threshold_sweep: rank by model
    score (unique tiebreaker — every LIMIT/top-k needs a total
    order), cut into ``n_buckets`` exact ceil-rank buckets, and per
    bucket report

        lift_ppm     = (1e6 * n_pos * n) div (n_rows * total_pos)
        cum_gain_ppm = (1e6 * cum_pos) div total_pos

    (1e6 lift = random targeting; a good model front-loads). All
    exact integers; bucket = ((rank - 1) * n_buckets) div n + 1. NULL
    lift when total_pos = 0. Output: (bucket, n_rows, n_pos,
    lift_ppm, cum_gain_ppm).

    Scale note: the global row_number is a single-partition rank (the
    q_quantile_bucket_sampled caveat). At 100 TB, bucket boundaries
    come from the SCORE HISTOGRAM instead (bounded/discretized score
    domain -> one groupBy -> cumulative counts locate each bucket
    edge; only the edge-straddling score needs an exact intra-score
    split) — the report semantics are unchanged, this operator is the
    exact-reference formulation."""
    w = Window.orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(label_col).cast("bigint").alias("y"),
        F.row_number().over(w).cast("bigint").alias("_r"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).cast("bigint").alias("_n"),
    )
    buck = ranked.select(
        "y",
        "_n",
        F.expr(f"((_r - 1) * {n_buckets}) div _n + 1")
        .cast("bigint")
        .alias("bucket"),
    )
    agg = buck.groupBy("bucket").agg(
        F.max("_n").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(F.lit(1))
    out = agg.select(
        "bucket",
        "n_rows",
        "n_pos",
        "_n",
        F.sum("n_pos").over(w_cum).cast("bigint").alias("_cum"),
        F.sum("n_pos").over(w_all).cast("bigint").alias("_tot"),
    )
    return out.select(
        "bucket",
        "n_rows",
        "n_pos",
        F.expr(
            "CASE WHEN _tot > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * n_pos * _n)"
            " div (CAST(n_rows AS DECIMAL(38,0)) * _tot) AS BIGINT) END"
        ).alias("lift_ppm"),
        F.expr(
            "CASE WHEN _tot > 0 THEN"
            " CAST((1000000 * _cum) div _tot AS BIGINT) END"
        ).alias("cum_gain_ppm"),
    )


def brier_decomposition(
    df: DataFrame,
    group_col: str,
    score_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Murphy decomposition of the Brier score per group — the ONE-ROW
    summary that complements the per-bin reliability diagram
    (``calibration_bins``): Brier = REL - RES + UNC, binned like the
    diagram (bin = min(score*B div scale, B-1), forecast value = the
    bin's mean score). All terms exact scaled integers in ppb with
    DOCUMENTED per-bin floors (each engine computes the identical
    integer ops, so the floored identity drift is cell-exact too):

        brier_ppb = (1e9 * sum (s - scale*y)^2) div (scale^2 * N)
        rel_ppb   = (sum_k (1e9*(ssum_k - scale*pos_k)^2)
                            div (scale^2 * n_k)) div N
        res_ppb   = (sum_k (1e9*(N*pos_k - P*n_k)^2)
                            div (N*N*n_k)) div N
        unc_ppb   = (1e9 * P * (N - P)) div (N * N)

    Squares cleared in DECIMAL(38,0) (HUGEINT in the oracle). Output:
    (group_key, n, n_pos, n_bins_used, brier_ppb, rel_ppb, res_ppb,
    unc_ppb)."""
    gc = "group_key"
    binned = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(score_ppm_col).cast("bigint").alias("s"),
            F.col(label_col).cast("bigint").alias("y"),
        )
        .select(
            gc,
            "s",
            "y",
            F.expr(
                f"least(CAST((s * {n_bins}) div {scale} AS BIGINT),"
                f" {n_bins - 1})"
            ).alias("bin"),
        )
        .groupBy(gc, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nk"),
            F.sum("y").cast("bigint").alias("pos"),
            F.sum(F.expr("CAST(s AS DECIMAL(38,0))")).alias("ssum"),
            F.sum(
                F.expr(
                    f"CAST(s - {scale} * y AS DECIMAL(38,0))"
                    f" * (s - {scale} * y)"
                )
            ).alias("bsum"),
        )
    )
    tot = binned.select(
        gc,
        "bin",
        "nk",
        "pos",
        "ssum",
        "bsum",
        F.expr(f"sum(nk) OVER (PARTITION BY {gc})").cast("bigint").alias("n"),
        F.expr(f"sum(pos) OVER (PARTITION BY {gc})")
        .cast("bigint")
        .alias("p"),
    )
    agg = tot.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.max("p").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        F.sum("bsum").alias("_b"),
        F.sum(
            F.expr(
                "(CAST(1000000000 AS DECIMAL(38,0))"
                f" * (ssum - {scale} * pos) * (ssum - {scale} * pos))"
                f" div (CAST({scale} AS DECIMAL(38,0)) * {scale} * nk)"
            )
        ).alias("_rel"),
        F.sum(
            F.expr(
                "(CAST(1000000000 AS DECIMAL(38,0))"
                " * (n * pos - p * nk) * (n * pos - p * nk))"
                " div (CAST(n AS DECIMAL(38,0)) * n * nk)"
            )
        ).alias("_res"),
    )
    return agg.select(
        gc,
        "n",
        "n_pos",
        "n_bins_used",
        F.expr(
            "CAST((CAST(1000000000 AS DECIMAL(38,0)) * _b)"
            f" div (CAST({scale} AS DECIMAL(38,0)) * {scale} * n)"
            " AS BIGINT)"
        ).alias("brier_ppb"),
        F.expr("CAST(_rel div n AS BIGINT)").alias("rel_ppb"),
        F.expr("CAST(_res div n AS BIGINT)").alias("res_ppb"),
        F.expr(
            "CAST((CAST(1000000000 AS DECIMAL(38,0)) * n_pos * (n - n_pos))"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("unc_ppb"),
    )
