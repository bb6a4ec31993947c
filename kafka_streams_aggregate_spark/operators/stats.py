"""Rank statistics — Spearman correlation with an exact-integer core.

Completes the repo's nonparametric family (q_ks_two_sample,
q_mann_whitney_u, q_mad_robust): those compare DISTRIBUTIONS; Spearman
measures monotone ASSOCIATION between two metrics per group — for a
retail book, "do customers with higher account balances actually spend
more, per nation?".

Cross-engine exactness: ranks are dense permutations 1..n built with
``row_number() OVER (ORDER BY value, id)`` — the repo's
total-order rule (every rank needs a unique tiebreaker) doubles as the
tie policy, documented as *tie-broken Spearman* (deterministic
permutation ranks, not mid-ranks; on data whose values are essentially
unique — cent sums, balances — the two coincide except on a measure-
zero set of exact collisions, and the tiebreaker makes even those
reproducible). With permutation ranks the classic closed form is exact:

    rho = 1 - 6 * sum(d_i^2) / (n * (n^2 - 1)),  d_i = rank_x - rank_y

``sum(d^2)`` and ``n(n^2-1)`` are exact int64 (safe to n ~ 1.6e6 rows
per group: 6*sum(d^2) < 2n^3 <= 2^63); the only floating ops are ONE
correctly-rounded int64->double cast per operand, ONE IEEE divide and
ONE subtract, spelled identically in the DuckDB oracle — cell-exact,
no transcendentals (the repo's ln/exp ban does not bite: sqrt-free).

Scale shape: two windows over the SAME partitioning key (one exchange
— Catalyst reuses the hash partitioning for both sorts) then a plain
groupBy on that key. No join, no skew amplification; per-group state
in the aggregate is three int64 counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_rank_corr"]


def spearman_rank_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group tie-broken Spearman rank correlation.

    ``df`` needs numeric ``x_col``/``y_col`` and a unique ``id_col``
    within each group (the rank tiebreaker). Output per group:
    ``group_key``, ``n`` (BIGINT), ``sum_d2`` (BIGINT, exact) and
    ``spearman_rho`` (DOUBLE, the single-divide closed form). Groups
    with n < 2 are dropped (rho undefined).
    """
    grp, xc, yc, ic = group_col, x_col, y_col, id_col
    ranked = df.select(
        F.col(grp).alias("grp"),
        F.row_number()
        .over(Window.partitionBy(grp).orderBy(xc, ic))
        .cast("bigint")
        .alias("rx"),
        F.row_number()
        .over(Window.partitionBy(grp).orderBy(yc, ic))
        .cast("bigint")
        .alias("ry"),
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry")))
        .cast("bigint")
        .alias("sum_d2"),
    )
    return (
        agg.where(F.col("n") >= 2)
        .select(
            F.col("grp").alias("group_key"),
            "n",
            "sum_d2",
            # one int64->double cast per operand, one divide, one
            # subtract — identical op sequence in the DuckDB oracle
            (
                F.lit(1.0)
                - (F.col("sum_d2") * 6).cast("double")
                / (F.col("n") * (F.col("n") * F.col("n") - 1)).cast("double")
            ).alias("spearman_rho"),
        )
    )


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    order_col: str,
    y_col: str,
) -> DataFrame:
    """Isotonic (monotone nondecreasing) least-squares fit per group —
    the pool-adjacent-violators algorithm (PAVA; Barlow et al. 1972).
    The shape-constrained regression a training pipeline uses for
    probability calibration (reliability curves) and any monotone
    dose-response fit.

    ``y_col`` must be integer (use cents); ``order_col`` a unique total
    order within the group. One shuffle on the group key; per group the
    fold is the O(n) block-merge stack in an ``applyInPandas`` kernel,
    with block-mean comparisons done as EXACT integer cross products
    (``s_prev * c_new > s_new * c_prev`` — no float compares inside the
    algorithm; documented bound: |sum(y)| * group_size < 2^63). The
    fitted value is emitted as one int64/int64 IEEE division.

    Cross-engine exactness: the fitted value equals the classic minimax
    identity ``iso[i] = max_{j<=i} min_{k>=i} avg(y[j..k])``, and since
    IEEE rounding is MONOTONE (a <= b implies fl(a) <= fl(b)), a DuckDB
    oracle that takes min/max over the correctly-rounded interval
    averages reproduces fl(exact PAVA value) bit-for-bit. The oracle is
    O(n^3) per group — strictly a verification artifact; the operator
    itself is O(n log n) (sort) + O(n) (fold).

    Output: one row per input row — ``group_key``, ``rn`` (1-based
    order), ``y``, ``iso_fit`` (double).
    """
    grp, oc, yc = group_col, order_col, y_col
    out_schema = "group_key bigint, rn bigint, y bigint, iso_fit double"

    # Self-contained closure (pickled by value) — verify-skill rule.
    def _pava(pdf):
        import pandas as _pd

        pdf = pdf.sort_values(oc, kind="mergesort")
        ys = [int(v) for v in pdf[yc]]
        # blocks: (sum, count); merge while the previous block's mean
        # exceeds the new block's mean (exact integer cross-compare)
        blocks: list[tuple[int, int]] = []
        for v in ys:
            s, c = v, 1
            while blocks and blocks[-1][0] * c > s * blocks[-1][1]:
                ps, pc = blocks.pop()
                s += ps
                c += pc
            blocks.append((s, c))
        fits: list[float] = []
        for s, c in blocks:
            fits.extend([s / c] * c)
        return _pd.DataFrame(
            {
                "group_key": [int(pdf[grp].iloc[0])] * len(ys),
                "rn": list(range(1, len(ys) + 1)),
                "y": ys,
                "iso_fit": fits,
            }
        )

    return df.select(grp, oc, yc).groupBy(grp).applyInPandas(
        _pava, out_schema
    )


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    metric_cols: list[str],
) -> DataFrame:
    """Quantile normalization across metric columns (the
    Bolstad/Irizarry microarray method, standard in feature
    preprocessing): every metric's distribution is forced onto the
    SHARED distribution of per-rank means — sort each column, average
    values at the same rank across columns, hand each position its
    rank's average back.

    Expects integer metrics (cents). NULL cells are dropped before
    ranking (they would otherwise consume ranks that ``sum`` then
    skips), and each rank's mean divides by the count of metrics
    actually present at that rank — identical to dividing by the
    column count when the input is NULL-free. Exactness: ranks are
    dense permutations via ``row_number() OVER (ORDER BY value, id)``
    (total-order rule as tie policy), the per-rank cross-metric sum is
    an exact int64, and ``qn_mean`` is ONE int64/int64 IEEE divide —
    bit-equal cross-engine.

    Scale shape: melt is a per-row stack expression (no shuffle); one
    window exchange on metric (k partitions — for huge corpora swap in
    a range-partitioned sort per metric), one groupBy on rank with
    map-side combine, one equi-join back on (rank) — per_rank is
    corpus-sized (one row per rank), so it is NOT broadcast; AQE may
    still choose to when n is small. No driver collect.

    Output: (id_col, metric, rank, value, qn_sum, qn_mean) — one row
    per input cell.
    """
    melted = df.selectExpr(
        id_col,
        "stack({}, {}) as (metric, value)".format(
            len(metric_cols),
            ", ".join(f"'{m}', CAST({m} AS BIGINT)" for m in metric_cols),
        ),
    ).where(F.col("value").isNotNull())
    # NULL cells are dropped BEFORE ranking (row_number would rank
    # them while sum() skips them, misaligning per-metric ranks), and
    # qn_mean divides by the PER-RANK metric count, not the constant
    # column count — with no NULLs the two are identical; with NULLs
    # each rank averages over the metrics that actually reach it.
    ranked = melted.select(
        id_col,
        "metric",
        "value",
        F.row_number()
        .over(Window.partitionBy("metric").orderBy("value", id_col))
        .cast("bigint")
        .alias("rank"),
    )
    per_rank = ranked.groupBy("rank").agg(
        F.sum("value").cast("bigint").alias("qn_sum"),
        F.count(F.lit(1)).cast("bigint").alias("_qn_k"),
    )
    return ranked.join(per_rank, "rank").select(
        id_col,
        "metric",
        "rank",
        "value",
        "qn_sum",
        (F.col("qn_sum").cast("double") / F.col("_qn_k").cast("double"))
        .alias("qn_mean"),
    )


def fd_violation_audit(
    df: DataFrame, lhs_cols: list[str], rhs_col: str
) -> DataFrame:
    """Functional-dependency violation audit — the data-profiling
    primitive behind schema discovery and key inference (does
    ``lhs -> rhs`` hold?): for every LHS value bound to MORE than one
    distinct RHS, report the evidence — row count, distinct RHS count,
    the modal RHS (most frequent, ties to the smallest RHS: a total
    order) and how many rows dissent from it. ``n_violations`` is the
    minimum number of rows you would have to correct for the FD to
    hold on that LHS value.

    All exact integer counts. Shape: one groupBy on (lhs, rhs) with
    map-side combine, one window + aggregate on lhs — two exchanges
    total, both on keys the profile is naturally partitioned by.
    """
    pairs = df.groupBy(*lhs_cols, F.col(rhs_col).alias("_rhs")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    )
    w = Window.partitionBy(*lhs_cols).orderBy(
        F.col("_cnt").desc(), F.col("_rhs").asc()
    )
    ranked = pairs.withColumn("_rk", F.row_number().over(w))
    agg = ranked.groupBy(*lhs_cols).agg(
        F.sum("_cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_rhs"),
        F.max(F.when(F.col("_rk") == 1, F.col("_rhs"))).alias("modal_rhs"),
        F.max(F.when(F.col("_rk") == 1, F.col("_cnt")))
        .cast("bigint")
        .alias("modal_count"),
    )
    return agg.where(F.col("n_distinct_rhs") > 1).select(
        *lhs_cols,
        "n_rows",
        "n_distinct_rhs",
        "modal_rhs",
        "modal_count",
        (F.col("n_rows") - F.col("modal_count"))
        .cast("bigint")
        .alias("n_violations"),
    )


def mann_kendall(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    value_cents_col: str,
) -> DataFrame:
    """Mann-Kendall trend test per series — THE nonparametric
    monotone-trend detector (Mann 1945, Kendall 1975), completing the
    repo's time-series audit family (CUSUM detects level SHIFTS;
    Mann-Kendall scores sustained DRIFT without assuming linearity or
    normality).

        S = sum_{i<j} sign(v_j - v_i)

    computed per group in O(n log n) with a Fenwick-tree inversion
    count inside an ``applyInPandas`` fold (the O(n^2) pair join a SQL
    engine would run is the ORACLE, not the operator). S and the
    tie-corrected variance NUMERATOR

        var_num = n(n-1)(2n+5) - sum_ties t(t-1)(2t+5)

    are exact int64; the normal approximation z = (S -/+ 1) /
    sqrt(var_num / 18.0) is a three-op correctly-rounded chain
    (divide, sqrt, divide) spelled identically in the oracle —
    BIT-equal. Groups with n < 2 are dropped.

    Scale shape: one shuffle on the series key, O(n log n) per series,
    O(distinct values) memory. Output: (group_key, n, s_stat, var_num,
    z_score).
    """
    grp, tc, ic, vc = group_col, ts_col, id_col, value_cents_col
    out_schema = (
        "group_key bigint, n bigint, s_stat bigint, var_num bigint, "
        "z_score double"
    )

    # Partition kernel (mapInPandas over key-clustered (ts, id)-sorted
    # partitions) instead of one-group-per-call applyInPandas — the
    # per-group Arrow round trip dominates with thousands of small
    # series. The open series buffers its ordered values across Arrow
    # batch boundaries; the Fenwick computation runs at series flush.
    # Self-contained closure (pickled by value) — verify skill rule.
    def _fold_partition(batches):
        import math as _math

        import pandas as _pd

        def _mk(vals):
            n = len(vals)
            sv = sorted(set(vals))
            pos = {v: i + 1 for i, v in enumerate(sv)}
            tree = [0] * (len(sv) + 1)

            def _upd(i):
                while i <= len(sv):
                    tree[i] += 1
                    i += i & -i

            def _qry(i):
                acc = 0
                while i > 0:
                    acc += tree[i]
                    i -= i & -i
                return acc

            conc = disc = 0
            for seen, v in enumerate(vals):
                k = pos[v]
                le = _qry(k)
                lt = _qry(k - 1)
                conc += lt  # earlier values strictly below v
                disc += seen - le  # earlier values strictly above v
                _upd(k)
            s_stat = conc - disc
            ties: dict = {}
            for v in vals:
                ties[v] = ties.get(v, 0) + 1
            var_num = n * (n - 1) * (2 * n + 5) - sum(
                t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
            )
            if s_stat > 0:
                z = (s_stat - 1.0) / _math.sqrt(var_num / 18.0)
            elif s_stat < 0:
                z = (s_stat + 1.0) / _math.sqrt(var_num / 18.0)
            else:
                z = 0.0
            return s_stat, var_num, z

        key = None
        vals: list = []
        out = {
            "group_key": [], "n": [], "s_stat": [], "var_num": [],
            "z_score": [],
        }

        def _flush():
            if key is not None and len(vals) >= 2:
                s_stat, var_num, z = _mk(vals)
                out["group_key"].append(key)
                out["n"].append(len(vals))
                out["s_stat"].append(s_stat)
                out["var_num"].append(var_num)
                out["z_score"].append(z)

        for pdf in batches:
            for k, v in zip(pdf[grp], pdf[vc]):
                k = int(k)
                if key is None or key != k:
                    _flush()
                    key = k
                    vals = []
                vals.append(int(v))
        _flush()
        if out["group_key"]:
            yield _pd.DataFrame(out)

    return (
        df.select(grp, tc, ic, vc)
        .repartition(grp)
        .sortWithinPartitions(grp, tc, ic)
        .mapInPandas(_fold_partition, out_schema)
        .where(F.col("n") >= 2)
    )


def gini_lorenz(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Gini concentration coefficient per group from the rank-weighted
    closed form (the Lorenz-curve integral without any curve
    materialization):

        G = (2 * sum_i i * x_(i)  -  (n + 1) * sum_i x_i)
            / (n * sum_i x_i)

    with x_(i) the ascending-ordered values. Rank-weighting is
    tie-stable: equal values contribute identically under any tie
    order, and the (value, id) sort key makes the rank assignment a
    total order anyway. Numerator and denominator are EXACT int64
    (bound: n * sum(x) and sum(i*x) < 2^63 — holds to ~1e5 rows/group
    at 1e7-cent values; a bigger corpus promotes both to DECIMAL(38));
    the coefficient itself is ONE int64/int64 IEEE divide — bit-equal
    cross-engine.

    Requires non-negative values (Gini's domain); one window + one
    aggregate sharing a single exchange on the group key.

    Output: (group_key, n, total, gini_num, gini_den, gini).
    """
    w = Window.partitionBy("group_key").orderBy(
        F.col("v").asc(), F.col("_id").asc()
    )
    ranked = df.select(
        F.col(group_col).alias("group_key"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(id_col).alias("_id"),
    ).withColumn("i", F.row_number().over(w).cast("bigint"))
    agg = ranked.groupBy("group_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("total"),
        F.sum(F.col("i") * F.col("v")).cast("bigint").alias("_iwx"),
    )
    return agg.select(
        "group_key",
        "n",
        "total",
        (2 * F.col("_iwx") - (F.col("n") + 1) * F.col("total"))
        .cast("bigint")
        .alias("gini_num"),
        (F.col("n") * F.col("total")).cast("bigint").alias("gini_den"),
        (
            (2 * F.col("_iwx") - (F.col("n") + 1) * F.col("total")).cast(
                "double"
            )
            / (F.col("n") * F.col("total")).cast("double")
        ).alias("gini"),
    )


def run_length_islands(
    df: DataFrame,
    key_col: str,
    label_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Run-length encoding of a labeled event stream — maximal runs of
    consecutive equal labels per key (the gaps-and-islands classic):
    the sequence-compression view behind dwell-state analysis,
    repeated-action detection, and RLE storage estimates.

    The islands formula: with rn the per-key (ts, id) row number,
    ``rn - row_number() OVER (PARTITION BY key, label ORDER BY rn)``
    is constant exactly on maximal same-label runs — two window
    passes over ONE exchange on the key (Catalyst reuses the hash
    partitioning; the second window's (key, label) partitioning is a
    subset refinement). All exact int64.

    Output: (key, label, start_rn, run_len), one row per maximal run.
    """
    w_rn = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    w_isl = Window.partitionBy(key_col, label_col).orderBy("rn")
    runs = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(label_col).alias("label"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
        )
        .withColumn(
            "rn",
            F.row_number()
            .over(
                Window.partitionBy("key").orderBy("_ts", "_id")
            )
            .cast("bigint"),
        )
        .withColumn(
            "island",
            (
                F.col("rn")
                - F.row_number().over(
                    Window.partitionBy("key", "label").orderBy("rn")
                )
            ).cast("bigint"),
        )
    )
    return runs.groupBy("key", "label", "island").agg(
        F.min("rn").cast("bigint").alias("start_rn"),
        F.count(F.lit(1)).cast("bigint").alias("run_len"),
    ).select("key", "label", "start_rn", "run_len")


def kaplan_meier(
    df: DataFrame,
    group_col: str,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve per group (Kaplan & Meier 1958) —
    THE censoring-aware retention/survival estimator (naive
    "fraction still alive" curves are biased the moment any subject
    is censored):

        S(t) = prod over death times t_i <= t of (1 - d_i / n_i)

    with d_i deaths at t_i and n_i the at-risk count (subjects with
    time >= t_i, censored included — the standard deaths-before-
    censoring tie convention).

    Exactness: n_i and d_i are exact int64 (risk set via one
    cumulative window, no recursion); S is a SEQUENTIAL fold over
    death times where each step is exactly two correctly-rounded
    IEEE ops — one divide (n_i - d_i)/n_i, one multiply — executed
    in time order by an applyInPandas kernel, so a DuckDB recursive
    CTE doing the same two ops per level is BIT-equal. Recursion
    depth = distinct death times per group (the scoped class, not
    full-data recursion).

    Output: one row per (group, death time): (group_key, t, n_risk,
    d, survival).
    """
    gc, tc, ec = group_col, time_col, event_col
    per_t = (
        df.select(
            F.col(gc).alias("group_key"),
            F.col(tc).cast("bigint").alias("t"),
            F.col(ec).cast("bigint").alias("e"),
        )
        .groupBy("group_key", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_at_t"),
            F.sum("e").cast("bigint").alias("d"),
        )
    )
    w = (
        Window.partitionBy("group_key")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group_key")
    risk = per_t.withColumn(
        "n_risk",
        (
            F.sum("n_at_t").over(wg) - F.sum("n_at_t").over(w)
            + F.col("n_at_t")
        ).cast("bigint"),
    )
    out_schema = (
        "group_key bigint, t bigint, n_risk bigint, d bigint, "
        "survival double"
    )

    def _fold(pdf):
        import pandas as _pd

        pdf = pdf.sort_values("t", kind="mergesort")
        s = 1.0
        rows = []
        for r in pdf.itertuples():
            if r.d > 0:
                s = s * ((r.n_risk - r.d) / r.n_risk)
                rows.append(
                    (int(r.group_key), int(r.t), int(r.n_risk),
                     int(r.d), s)
                )
        return _pd.DataFrame(
            rows,
            columns=["group_key", "t", "n_risk", "d", "survival"],
        ).astype(
            {
                "group_key": "int64", "t": "int64",
                "n_risk": "int64", "d": "int64",
                "survival": "float64",
            }
        )

    return risk.groupBy("group_key").applyInPandas(_fold, out_schema)


def drift_tvd(
    df: DataFrame,
    split_col: str,
    bucket_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Distribution-drift audit between two cohorts via TOTAL
    VARIATION DISTANCE — the log-free drift detector (PSI and KL both
    need ln, the banned transcendental; TVD = 0.5 * sum_i |p_i - q_i|
    is pure rational arithmetic and is what PSI thresholds
    approximate anyway):

        tvd_scaled = (scale * sum_i |c1_i * N2 - c2_i * N1|)
                     div (2 * N1 * N2)

    — the common-denominator form keeps EVERYTHING exact int64 until
    one final integer division (bound: max bucket count * total <
    2^63 / scale; at scale 1e6 that is ~9e6 * N — promote to
    DECIMAL(38) past ~1e6-row cohorts per bucket).

    ``split_col`` must be 0/1 (the two cohorts); ``bucket_col`` the
    discretized feature. Output: one row — (n1, n2, n_buckets,
    tvd_num, tvd_scaled) where tvd_num = sum |cross products|.

    Shape: one (split, bucket) map-side aggregate, one tiny
    bucket-table pivot, one scalar aggregate. The per-bucket detail
    view is the same CTE without the final sum.
    """
    counts = (
        df.select(
            F.col(split_col).cast("bigint").alias("s"),
            F.col(bucket_col).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("c2"),
        )
    )
    totals = counts.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    joined = counts.crossJoin(F.broadcast(totals))
    agg = joined.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max("n_buckets").alias("n_buckets"),
        F.sum(
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        )
        .cast("bigint")
        .alias("tvd_num"),
    )
    return agg.select(
        "n1",
        "n2",
        "n_buckets",
        "tvd_num",
        F.expr(f"({scale} * tvd_num) div (2 * n1 * n2)")
        .cast("bigint")
        .alias("tvd_scaled"),
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Schema-profiling summary — one row per requested column with
    the ANALYZE-style basics a data-quality gate checks first:
    (column, n_rows, n_null, n_distinct, min_repr, max_repr).

    min/max are cast to string AFTER the typed aggregation, so
    ordering is the column's native order, not lexicographic.
    Exactness contract: supply integer / string / date-like columns
    (float columns must be pre-discretized by the caller — float
    to-string formatting is NOT identical across engines, the one
    surface where a correct value can still hash-mismatch).

    Shape: ONE scan and one aggregate computing every column's five
    statistics together (Spark plans the multi-distinct via Expand —
    k x rows through one exchange, same volume as k passes but a
    single scan), then a k-row stack to tidy form. n_distinct counts
    non-NULL distinct values (both engines' COUNT(DISTINCT col)).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"_n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _n_{c}, _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(column, n_rows, n_null, n_distinct, min_repr, max_repr)"
    )


def ecdf_probe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probes: list[int],
    scale: int = 1_000_000,
) -> DataFrame:
    """Empirical CDF evaluated at FIXED integer probe points, per
    group — the distribution summary that composes across partitions
    where a full sorted ECDF does not (probe counts are plain
    map-side-combinable conditional sums; a sorted ECDF needs a
    per-group global sort).

    ecdf(p) = |{v <= p}| / n, reported exactly as
    ``ecdf_ppm = (scale * hits) div n`` plus the raw (hits, n) pair so
    callers can re-derive any precision. All int64 (bound:
    n < 2^63/scale ~ 9e12 rows per group at ppm scale).

    Shape: ONE scan, one aggregate computing every probe's conditional
    sum together, then a k-row ``stack`` to tidy form — identical to
    the ``column_profile`` multi-statistic pattern; no join against a
    probe table, no per-probe pass. NULL values are excluded from both
    hits and n.

    Output: (group_key, probe, n, hits, ecdf_ppm), one row per
    (group, probe).
    """
    aggs = [
        F.sum(F.when(F.col(value_col).isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("_n")
    ]
    for i, p in enumerate(probes):
        aggs.append(
            F.sum(F.when(F.col(value_col) <= F.lit(p), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_h_{i}")
        )
    wide = df.groupBy(F.col(group_col).alias("group_key")).agg(*aggs)
    stacked = ", ".join(
        f"CAST({p} AS BIGINT), _h_{i}" for i, p in enumerate(probes)
    )
    return wide.selectExpr(
        "group_key",
        "_n AS n",
        f"stack({len(probes)}, {stacked}) AS (probe, hits)",
    ).selectExpr(
        "group_key",
        "probe",
        "n",
        "hits",
        f"CAST((CAST({scale} AS BIGINT) * hits) div n AS BIGINT) AS ecdf_ppm",
    )


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil–Sen slope estimator per group — the robust (29%%-
    breakdown) trend line that pairs with ``mann_kendall``'s trend
    TEST: Kendall's S says WHETHER a monotone trend exists, Theil–Sen
    says HOW STEEP. Slope = median over all point pairs i<j with
    x_i != x_j of (y_j - y_i)/(x_j - x_i).

    Median policy: the LOWER median (ceil-rank ``(m+1) div 2`` over
    ``m`` pair slopes) — an exact ORDER-STATISTIC SELECTION, not an
    average of two middles, so the result is always one
    correctly-rounded IEEE divide of two exact int64 deltas, identical
    cross-engine. The selection's total order is (slope, dy, dx):
    IEEE division is monotone in the exact rational value for fixed
    sign, and equal doubles from different rationals are ordered
    deterministically by the integer tiebreakers — both engines sort
    the SAME double multiset, so rank selection agrees bit-for-bit.

    Scale shape: the pairwise self-join is O(n_g^2) per group BY
    DESIGN (exact Theil–Sen is quadratic); the documented contract is
    bounded group sizes (time series per product/nation, n_g <= ~10^4
    -> 5e7 pairs, still one shuffle on the group key). For unbounded
    groups use the sampled-pairs variant (uniform pair sample via the
    md5 hash family) — same selection code path.

    Output: (group_key, n_pairs, slope) with n_pairs the count of
    valid (x-distinct) pairs; groups with zero valid pairs are absent.
    """
    gc = "group_key"
    a = df.select(
        F.col(group_col).alias(gc),
        F.col(x_col).cast("bigint").alias("x1"),
        F.col(y_col).cast("bigint").alias("y1"),
    )
    b = df.select(
        F.col(group_col).alias(gc),
        F.col(x_col).cast("bigint").alias("x2"),
        F.col(y_col).cast("bigint").alias("y2"),
    )
    pairs = (
        a.join(b, gc)
        .where(F.col("x1") < F.col("x2"))
        .select(
            gc,
            (F.col("y2") - F.col("y1")).alias("dy"),
            (F.col("x2") - F.col("x1")).alias("dx"),
        )
        .withColumn(
            "slope", F.col("dy").cast("double") / F.col("dx").cast("double")
        )
    )
    w = Window.partitionBy(gc).orderBy("slope", "dy", "dx")
    ranked = pairs.withColumn("rk", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy(gc))
    )
    return ranked.where(F.expr("rk = (m + 1) div 2")).selectExpr(
        "group_key",
        "CAST(m AS BIGINT) AS n_pairs",
        "slope",
    )


def concentration_indices(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Market-concentration / diversity indices per group, both
    LOG-FREE (Shannon needs ln, the banned transcendental; these are
    what antitrust and ecology actually threshold on):

        HHI      = sum_i (c_i / N)^2          (Herfindahl–Hirschman)
        Simpson  = sum_i c_i (c_i - 1) / (N (N - 1))   (repeat-draw
                   collision probability, the unbiased form)

    reported as exact scaled integers:
        hhi_ppm     = (scale * sum c_i^2)        div (N * N)
        simpson_ppm = (scale * sum c_i (c_i-1))  div (N * (N-1))

    Everything is int64; bound: scale * sum(c^2) <= scale * N^2 < 2^63
    -> N per group < ~3e6 at ppm scale (promote to DECIMAL(38) past
    that — same ladder as drift_tvd). Groups with N < 2 report
    simpson_ppm NULL (the unbiased form is undefined).

    Shape: one (group, cat) count aggregate, then one group aggregate
    — two map-side-combinable shuffles on progressively smaller data,
    no joins. Output: (group_key, n, n_cats, hhi_ppm, simpson_ppm).
    """
    counts = (
        df.groupBy(
            F.col(group_col).alias("group_key"), F.col(cat_col).alias("cat")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    g = counts.groupBy("group_key").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cats"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("_s2"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("_s11"),
    )
    return g.select(
        "group_key",
        "n",
        "n_cats",
        F.expr(f"CAST(({scale} * _s2) div (n * n) AS BIGINT)").alias(
            "hhi_ppm"
        ),
        F.when(
            F.col("n") >= 2,
            F.expr(f"CAST(({scale} * _s11) div (n * (n - 1)) AS BIGINT)"),
        ).alias("simpson_ppm"),
    )


def weighted_percentile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Weighted percentiles per group by EXACT cumulative-weight
    selection — the weighted twin of the latency-percentile family
    (there every row counts 1; here a row carries an integer weight,
    e.g. value = price band, weight = units sold):

        p-th percentile = min value whose cumulative weight
                          >= (p * W + 99) div 100

    — the repo's integer ceil-rank rule (never ``ceil(0.95 * W)``:
    epsilon-above-integer doubles round the rank off by one). The
    cumulative sum uses the DEFAULT window frame (RANGE UNBOUNDED
    PRECEDING .. CURRENT ROW) deliberately: RANGE makes equal values
    PEERS, so every duplicate value carries its block-inclusive
    cumulative weight — the selection needs no unique tiebreaker and
    is order-independent by construction. All int64.

    Shape: one window sort per group + one aggregate — the
    conditional-min trick folds every percentile into the SAME pass
    (no per-percentile join). Output: (group_key, w_total,
    p{P} per requested percentile).
    """
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    wspec = Window.partitionBy(gc).orderBy("v")
    cum = base.select(
        gc,
        "v",
        F.sum("w").over(wspec).cast("bigint").alias("cumw"),
        F.sum("w").over(Window.partitionBy(gc)).cast("bigint").alias("wt"),
    )
    aggs = [F.max("wt").cast("bigint").alias("w_total")]
    for p in percentiles:
        aggs.append(
            F.min(
                F.when(
                    F.expr(f"cumw >= ({p} * wt + 99) div 100"), F.col("v")
                )
            )
            .cast("bigint")
            .alias(f"p{p}")
        )
    return cum.groupBy(gc).agg(*aggs)


def cohens_kappa(
    df: DataFrame,
    group_col: str,
    rater_a_col: str,
    rater_b_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-rater agreement per
    group, in EXACT integer arithmetic (the common-denominator form;
    the textbook (p_o - p_e)/(1 - p_e) needs two divisions):

        kappa_ppm = scale * (N * A - E)  div  (N * N - E)

    with N total items, A = observed agreements, and
    E = sum over labels of rowmarginal * colmarginal. Everything is
    int64; bound: scale * N^2 < 2^63 -> N per group < ~3e6 at ppm
    scale (DECIMAL(38) ladder past that). Perfect chance agreement
    (N*N == E, a constant-label degenerate) reports NULL.

    The label space is the UNION of both raters' labels (standard
    kappa: a label one rater never used has a zero marginal and
    contributes nothing to E).

    Shape: three shrinking aggregates (cells -> two marginal tables)
    + one equi-join of the label-sized marginals — no full-data join,
    map-side combinable throughout. Output: (group_key, n, agree,
    chance_num, kappa_ppm).
    """
    gc = "group_key"
    cells = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(rater_a_col).cast("string").alias("a"),
            F.col(rater_b_col).cast("string").alias("b"),
        )
        .groupBy(gc, "a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    marg_a = cells.groupBy(gc, "a").agg(F.sum("c").cast("bigint").alias("ra"))
    marg_b = cells.groupBy(gc, "b").agg(F.sum("c").cast("bigint").alias("cb"))
    chance = (
        marg_a.join(
            marg_b,
            (marg_a[gc] == marg_b[gc]) & (marg_a["a"] == marg_b["b"]),
        )
        .select(marg_a[gc].alias(gc), (F.col("ra") * F.col("cb")).alias("e"))
        .groupBy(gc)
        .agg(F.sum("e").cast("bigint").alias("chance_num"))
    )
    totals = cells.groupBy(gc).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    return totals.join(chance, gc).select(
        gc,
        "n",
        "agree",
        "chance_num",
        F.when(
            F.expr("n * n <> chance_num"),
            F.expr(
                f"CAST(({scale} * (n * agree - chance_num))"
                " div (n * n - chance_num) AS BIGINT)"
            ),
        ).alias("kappa_ppm"),
    )


def cohens_kappa_weighted(
    df: DataFrame,
    group_col: str,
    rater_a_col: str,
    rater_b_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """LINEAR-weighted Cohen's kappa for ORDINAL integer labels —
    partial credit for near-misses (disagreement cost |i - j|), the
    standard form for severity grades / star ratings. Same exact
    common-denominator construction as ``cohens_kappa``:

        kappa_w_ppm = scale * (WE - N * WO)  div  WE

    with WO = sum |i-j| O_ij (observed weighted disagreement) and
    WE = sum |i-j| R_i C_j (its chance expectation, common-
    denominator form). Unweighted kappa is the 0/1-cost special case;
    with |i-j| the identity-diagonal contributes nothing, so only the
    disagreement mass matters. WE == 0 (all mass on one label for
    either rater) reports NULL. All int64; bound:
    scale * max|i-j| * N^2 < 2^63.

    Shape: cells + two label-sized marginal tables; the chance term
    is a label² cross of the marginals per group — model-sized (k²
    rows), NOT data-sized; no full-data join. Output: (group_key, n,
    wo_num, we_num, kappa_w_ppm).
    """
    gc = "group_key"
    cells = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(rater_a_col).cast("bigint").alias("a"),
            F.col(rater_b_col).cast("bigint").alias("b"),
        )
        .groupBy(gc, "a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    marg_a = cells.groupBy(gc, "a").agg(F.sum("c").cast("bigint").alias("ra"))
    marg_b = cells.groupBy(gc, "b").agg(F.sum("c").cast("bigint").alias("cb"))
    chance = (
        marg_a.join(marg_b, gc)
        .select(
            gc,
            (
                F.abs(F.col("a") - F.col("b")) * F.col("ra") * F.col("cb")
            ).alias("e"),
        )
        .groupBy(gc)
        .agg(F.sum("e").cast("bigint").alias("we_num"))
    )
    totals = cells.groupBy(gc).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.abs(F.col("a") - F.col("b")) * F.col("c"))
        .cast("bigint")
        .alias("wo_num"),
    )
    return totals.join(chance, gc).select(
        gc,
        "n",
        "wo_num",
        "we_num",
        F.when(
            F.col("we_num") != 0,
            F.expr(
                f"CAST(({scale} * (we_num - n * wo_num)) div we_num"
                " AS BIGINT)"
            ),
        ).alias("kappa_w_ppm"),
    )


def theil_sen_sampled(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    offsets: tuple[int, ...] = (1, 2, 3, 5, 8, 13, 21, 34),
) -> DataFrame:
    """The LINEAR-cost Theil–Sen variant for unbounded groups — the
    scale path ``theil_sen``'s contract points at. Instead of all
    O(n²) pairs, sample the DETERMINISTIC offset family: sort each
    group by (x, y), pair rank i with rank i + d for each lag d in
    ``offsets`` (Fibonacci-spaced lags cover short- and long-baseline
    slopes; k*n pairs total, no randomness, no md5 needed — the
    pairing is a function of the data's own order, so it is
    reproducible cross-engine by construction).

    Same selection semantics as the exact operator: lower-median by
    (slope, dy, dx) total order over the sampled pairs, x-tied pairs
    excluded. Cost: ONE window sort per group + k rank equi-joins of
    the ranked table with itself (all on the group key — one
    exchange, reused), each linear.

    Output: (group_key, n_pairs, slope).
    """
    gc = "group_key"
    ranked = df.select(
        F.col(group_col).alias(gc),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(gc).orderBy("x", "y")),
    )
    a = ranked.select(gc, "rn", F.col("x").alias("x1"), F.col("y").alias("y1"))
    offs = ", ".join(str(d) for d in offsets)
    b = ranked.select(
        gc,
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        F.col("rn").alias("_rn_hi"),
        F.explode(F.expr(f"array({offs})")).alias("_d"),
    ).select(
        gc,
        "x2",
        "y2",
        (F.col("_rn_hi") - F.col("_d")).alias("rn"),
    )
    pairs = (
        a.join(b, [gc, "rn"])
        .where(F.col("x1") != F.col("x2"))
        .select(
            gc,
            (F.col("y2") - F.col("y1")).alias("dy"),
            (F.col("x2") - F.col("x1")).alias("dx"),
        )
        .withColumn(
            "slope", F.col("dy").cast("double") / F.col("dx").cast("double")
        )
    )
    w = Window.partitionBy(gc).orderBy("slope", "dy", "dx")
    sel = pairs.withColumn("rk", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy(gc))
    )
    return sel.where(F.expr("rk = (m + 1) div 2")).selectExpr(
        "group_key",
        "CAST(m AS BIGINT) AS n_pairs",
        "slope",
    )


def auc_roc_exact(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact ROC AUC per group via the Mann–Whitney rank identity —
    the classifier-eval companion to the repo's rank family (same
    tie-broken permutation-rank policy as ``spearman_rank_corr``):

        AUC = (sum of positive ranks - P(P+1)/2) / (P * N)

    ranks 1..n by ``(score, id)`` ascending (the total-order rule as
    tie policy: ties break deterministically, documented as tie-broken
    AUC; on essentially-unique scores it equals the midrank AUC).
    Everything through the numerator is exact int64; reported as
    ``auc_ppm = (scale * num) div (P * N)`` plus the raw pieces.
    Bound: scale * P * N < 2^63 -> P*N < ~9e12 at ppm scale. Groups
    missing a class report NULL (AUC undefined).

    Shape: ONE window sort per group + one aggregate — no join; the
    label never re-shuffles.
    """
    gc = "group_key"
    ranked = df.select(
        F.col(group_col).alias(gc),
        F.col(label_col).cast("bigint").alias("label"),
        F.row_number()
        .over(Window.partitionBy(group_col).orderBy(score_col, id_col))
        .cast("bigint")
        .alias("rk"),
    )
    agg = ranked.groupBy(gc).agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("bigint").alias("n_neg"),
        F.sum(F.col("label") * F.col("rk")).cast("bigint").alias("rank_sum_pos"),
    )
    return agg.select(
        gc,
        "n_pos",
        "n_neg",
        "rank_sum_pos",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                f"CAST(({scale} * (rank_sum_pos - (n_pos * (n_pos + 1))"
                " div 2)) div (n_pos * n_neg) AS BIGINT)"
            ),
        ).alias("auc_ppm"),
    )


def nelson_aalen(
    df: DataFrame,
    group_col: str,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative hazard per group — Kaplan–Meier's
    additive twin (KM multiplies survival factors, NA sums hazard
    increments; NA is the lower-variance estimator of cumulative RISK
    and the standard input to proportional-hazards diagnostics):

        H(t) = sum over death times t_i <= t of d_i / n_i

    Same risk-set bookkeeping as ``kaplan_meier`` (exact int64 via one
    cumulative window; deaths-before-censoring tie convention;
    censored-only times emit no steps). The running sum is a
    SEQUENTIAL one-divide-one-add fold per death time, executed in
    time order by the same applyInPandas kernel shape — deliberately
    NOT a windowed SUM over doubles, whose accumulation ORDER inside
    an engine's window operator (segment trees, pairwise combines) is
    not the left fold and need not match across engines. The scoped
    recursive-CTE oracle doing the same two IEEE ops per level is
    bit-equal.

    Output: one row per (group, death time): (group_key, t, n_risk,
    d, hazard_cum).
    """
    gc, tc, ec = group_col, time_col, event_col
    per_t = (
        df.select(
            F.col(gc).alias("group_key"),
            F.col(tc).cast("bigint").alias("t"),
            F.col(ec).cast("bigint").alias("e"),
        )
        .groupBy("group_key", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_at_t"),
            F.sum("e").cast("bigint").alias("d"),
        )
    )
    w = (
        Window.partitionBy("group_key")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group_key")
    risk = per_t.withColumn(
        "n_risk",
        (
            F.sum("n_at_t").over(wg) - F.sum("n_at_t").over(w)
            + F.col("n_at_t")
        ).cast("bigint"),
    )
    out_schema = (
        "group_key bigint, t bigint, n_risk bigint, d bigint, "
        "hazard_cum double"
    )

    def _fold(pdf):
        import pandas as _pd

        pdf = pdf.sort_values("t", kind="mergesort")
        h = 0.0
        rows = []
        for r in pdf.itertuples():
            if r.d > 0:
                h = h + (r.d / r.n_risk)
                rows.append(
                    (int(r.group_key), int(r.t), int(r.n_risk),
                     int(r.d), h)
                )
        return _pd.DataFrame(
            rows,
            columns=["group_key", "t", "n_risk", "d", "hazard_cum"],
        ).astype(
            {
                "group_key": "int64", "t": "int64",
                "n_risk": "int64", "d": "int64",
                "hazard_cum": "float64",
            }
        )

    return risk.groupBy("group_key").applyInPandas(_fold, out_schema)


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    lo_pct: int = 1,
    hi_pct: int = 99,
) -> DataFrame:
    """Winsorization — clamp each group's tails at EXACT rank-selected
    percentile bounds (the standard robust-preprocessing step before
    moment statistics on heavy-tailed metrics; clipping-as-cleaning
    for a training pipeline).

    Bounds are order statistics by the repo's integer ceil-rank rule
    (``(p*n + 99) div 100`` over ``row_number() OVER (ORDER BY value,
    id)`` — the total-order rule as tie policy), so both bounds are
    VALUES FROM THE DATA, exact int64, no interpolation. Output one
    row per input row: (group_key, id, v, v_wins, clipped -1/0/+1).

    Shape: one window sort per group; the 2-value bound table per
    group comes from the SAME ranked frame (conditional min trick, no
    second sort) and joins back group-sized. At 100 TB the bound
    table is groups-sized — broadcast; the data never re-shuffles
    after its one window exchange.
    """
    gc = "group_key"
    ranked = df.select(
        F.col(group_col).alias(gc),
        F.col(id_col).alias("id"),
        F.col(value_col).cast("bigint").alias("v"),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(gc).orderBy("v", "id")),
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(gc)))
    bounds = ranked.groupBy(gc).agg(
        F.min(
            F.when(F.expr(f"rn >= ({lo_pct} * n + 99) div 100"), F.col("v"))
        )
        .cast("bigint")
        .alias("lo"),
        F.min(
            F.when(F.expr(f"rn >= ({hi_pct} * n + 99) div 100"), F.col("v"))
        )
        .cast("bigint")
        .alias("hi"),
    )
    return (
        ranked.join(F.broadcast(bounds), gc)
        .select(
            gc,
            "id",
            "v",
            F.expr("CAST(greatest(lo, least(hi, v)) AS BIGINT)").alias(
                "v_wins"
            ),
            F.expr(
                "CAST(CASE WHEN v < lo THEN -1 WHEN v > hi THEN 1"
                " ELSE 0 END AS BIGINT)"
            ).alias("clipped"),
        )
    )


def tukey_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Tukey-fence outlier audit per group — the boxplot rule
    (fences at Q1 - 1.5*IQR and Q3 + 1.5*IQR) kept ENTIRELY in exact
    integer space by doubling: a value is an outlier iff

        2*v < 2*q1 - 3*iqr   or   2*v > 2*q3 + 3*iqr

    (multiply the classic inequality by 2 — no 1.5 ever touches a
    float). Q1/Q3 are ceil-rank order statistics over ``(value, id)``
    (same convention as ``winsorize``), IQR = q3 - q1. Output per
    group: (group_key, n, q1, q3, n_low, n_high) — all exact int64.

    Shape: one window sort + one aggregate computing quartiles AND
    fence counts in the same pass is impossible (the fences need the
    quartiles first), so: ranked frame -> 2-value bound row per group
    -> broadcast join back -> count aggregate. Two passes over one
    exchange, no data re-shuffle.
    """
    gc = "group_key"
    ranked = df.select(
        F.col(group_col).alias(gc),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(id_col).alias("id"),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(gc).orderBy("v", "id")),
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(gc)))
    bounds = ranked.groupBy(gc).agg(
        F.min(F.when(F.expr("rn >= (25 * n + 99) div 100"), F.col("v")))
        .cast("bigint")
        .alias("q1"),
        F.min(F.when(F.expr("rn >= (75 * n + 99) div 100"), F.col("v")))
        .cast("bigint")
        .alias("q3"),
    )
    return (
        ranked.join(F.broadcast(bounds), gc)
        .groupBy(gc)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("q1").cast("bigint").alias("q1"),
            F.max("q3").cast("bigint").alias("q3"),
            F.sum(
                F.expr(
                    "CASE WHEN 2 * v < 2 * q1 - 3 * (q3 - q1)"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_low"),
            F.sum(
                F.expr(
                    "CASE WHEN 2 * v > 2 * q3 + 3 * (q3 - q1)"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_high"),
        )
    )


def runs_test(
    df: DataFrame,
    group_col: str,
    flag_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Wald–Wolfowitz runs test per group — is a binary sequence
    random, or does it clump? The sequence-level randomness check
    next to ``mann_kendall``'s monotone-trend check.

    Runs are counted with the islands formula (rn - rn_by_label, the
    ``run_length_islands`` machinery, one exchange); n1/n0 by one
    aggregate. Exact integer core (n1, n0, runs); the z-score against
    the exact null moments

        E[R] = 1 + 2*n1*n0/n
        Var  = 2*n1*n0*(2*n1*n0 - n) / (n^2 * (n-1))

    is a fixed sequence of correctly-rounded IEEE ops on integer
    casts, spelled identically in the oracle — bit-equal. NULL when
    either symbol is absent (test undefined)."""
    gc = "group_key"
    w_seq = Window.partitionBy(group_col).orderBy(*order_cols)
    w_lab = Window.partitionBy(group_col, flag_col).orderBy(*order_cols)
    islands = df.select(
        F.col(group_col).alias(gc),
        F.col(flag_col).cast("bigint").alias("b"),
        (
            F.row_number().over(w_seq) - F.row_number().over(w_lab)
        ).alias("island"),
    )
    per_run = islands.groupBy(gc, "b", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("_len")
    )
    agg = per_run.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("runs"),
        F.sum(F.expr("b * _len")).cast("bigint").alias("n1"),
        F.sum(F.expr("(1 - b) * _len")).cast("bigint").alias("n0"),
    )
    ez = (
        "1.0 + CAST(2 * n1 * n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)"
    )
    var = (
        "CAST(2 * n1 * n0 AS DOUBLE)"
        " * CAST(2 * n1 * n0 - (n1 + n0) AS DOUBLE)"
        " / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 AS DOUBLE)"
        "    * CAST(n1 + n0 - 1 AS DOUBLE))"
    )
    return agg.select(
        gc,
        "n1",
        "n0",
        "runs",
        F.expr(
            "CASE WHEN n1 > 0 AND n0 > 0 AND n1 + n0 >= 2 THEN"
            f" (CAST(runs AS DOUBLE) - ({ez})) / sqrt({var}) END"
        ).alias("z"),
    )


def friedman_chi2(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Friedman rank test over complete blocks — do k treatments
    differ when every block ranks them internally? (blocks = weeks,
    treatments = weekdays is the classic seasonal read.) Only blocks
    containing ALL k treatments EXACTLY ONCE participate — the gate
    requires count(*) == countDistinct(treatment) == k per block
    (round-12 fix: a countDistinct-only gate let duplicate
    (block, treatment) cells through, violating the
    one-observation-per-cell assumption of the chi2 formula), and
    the final rollup verifies every treatment saw the same number of
    blocks (NULL chi2 otherwise instead of a silent max()).

    Within-block midranks ride the repo's DOUBLED-RANK integer space
    (tie group of size c after cum_prev pooled rows: 2*midrank =
    2*cum_prev + c + 1 — exact int). With R2_j = sum over blocks of
    doubled midranks for treatment j:

        chi2 = 3 * (sum_j R2_j^2 - n^2 * k * (k+1)^2) / (n * k * (k+1))

    numerator/denominator exact int64, reported ppm-scaled. One
    within-block value rollup + one window + two aggregates."""
    b, t = "block", "treatment"
    base = df.select(
        F.col(block_col).alias(b),
        F.col(treatment_col).alias(t),
        F.col(value_col).cast("bigint").alias("v"),
    )
    k_total = base.select(t).distinct().count()
    complete = (
        base.groupBy(b)
        .agg(
            F.countDistinct(t).alias("_k"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where((F.col("_k") == k_total) & (F.col("_n") == k_total))
        .select(b)
    )
    scoped = base.join(complete, b)
    # doubled midranks within block via the by-value rollup
    by_val = scoped.groupBy(b, "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = (
        Window.partitionBy(b)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = by_val.select(
        b,
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).cast("bigint").alias("cum_prev"),
    )
    with_r2 = scoped.join(ranked, [b, "v"]).select(
        b, t, F.expr("2 * cum_prev + c + 1").cast("bigint").alias("r2")
    )
    per_treat = with_r2.groupBy(t).agg(
        F.sum("r2").cast("bigint").alias("r2_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    return per_treat.groupBy().agg(
        F.max("n_blocks").cast("bigint").alias("n_blocks"),
        F.min("n_blocks").cast("bigint").alias("_nb_min"),
        F.count(F.lit(1)).cast("bigint").alias("k_treatments"),
        F.sum(F.expr("r2_sum * r2_sum")).cast("bigint").alias("sum_r2_sq"),
    ).select(
        "n_blocks",
        "k_treatments",
        "sum_r2_sq",
        F.expr(
            "CASE WHEN _nb_min = n_blocks AND n_blocks > 0 THEN"
            f" CAST(({scale} * 3 * (sum_r2_sq - n_blocks * n_blocks"
            " * k_treatments * (k_treatments + 1) * (k_treatments + 1)))"
            " div (n_blocks * k_treatments * (k_treatments + 1)) AS BIGINT)"
            " END"
        ).alias("chi2_ppm"),
    )


def page_hinkley(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: list[str],
    delta: int,
    lam: int,
) -> DataFrame:
    """Page–Hinkley change detection per group, BATCH closed form —
    the upward-drift alarm next to the streaming CUSUM: with a fixed
    reference level ``delta`` (integer units, config),

        g_t  = sum_{i<=t} (x_i - delta)
        PH_t = g_t - min(0, min_{s<=t} g_s)
        alarm when PH_t > lam

    The max-deviation statistic max_t PH_t has the repo's round-9
    NON-recursive closed form (prefix sum + running min — the same
    identity that de-recursed CUSUM/drawdown), so the whole detector
    is two windows + one aggregate of exact int64, no fold, no
    Python. Emits the max statistic, whether it crossed ``lam``, and
    the FIRST position attaining the max (total-ordered argmax)."""
    gc = "group_key"
    w_seq = Window.partitionBy(group_col).orderBy(*order_cols)
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = df.select(
        F.col(group_col).alias(gc),
        F.col(value_col).cast("bigint").alias("x"),
        F.row_number().over(w_seq).cast("bigint").alias("rn"),
        F.sum(F.col(value_col).cast("bigint") - F.lit(delta))
        .over(w_cum)
        .cast("bigint")
        .alias("g"),
    )
    w_min = (
        Window.partitionBy(gc)
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ph = staged.select(
        gc,
        "rn",
        (
            F.col("g")
            - F.least(F.lit(0).cast("bigint"), F.min("g").over(w_min))
        )
        .cast("bigint")
        .alias("ph"),
    )
    w_arg = Window.partitionBy(gc).orderBy(
        F.col("ph").desc(), F.col("rn").asc()
    )
    top = ph.withColumn("_r", F.row_number().over(w_arg)).where(
        F.col("_r") == 1
    )
    return top.select(
        gc,
        F.col("ph").alias("ph_max"),
        F.col("rn").alias("at_rn"),
        (F.col("ph") > F.lit(lam)).alias("alarm"),
    )


def knee_detection(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Knee/elbow point of a per-group curve (the Kneedle idea in
    exact integer form) — the "pick k" heuristic for any
    diminishing-returns sweep (k vs inertia, threshold vs yield):
    the knee is the curve point with MAXIMUM perpendicular distance
    to the chord between the curve's endpoints. Distance ordering is
    preserved under scaling by the constant chord length, so the
    comparison key is the exact integer CROSS PRODUCT

        |(x_n - x_1)*(y_i - y_1) - (y_n - y_1)*(x_i - x_1)|

    — no sqrt, no division, total-ordered by (dist DESC, x ASC).
    Two window passes (endpoints + argmax) over one exchange."""
    gc = "group_key"
    w = Window.partitionBy(group_col)
    staged = df.select(
        F.col(group_col).alias(gc),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.min(F.struct(F.col(x_col).cast("bigint"), F.col(y_col).cast("bigint")))
        .over(w)
        .alias("p1"),
        F.max(F.struct(F.col(x_col).cast("bigint"), F.col(y_col).cast("bigint")))
        .over(w)
        .alias("pn"),
    )
    scored = staged.select(
        gc,
        "x",
        "y",
        F.expr(
            "abs((pn.col1 - p1.col1) * (y - p1.col2)"
            " - (pn.col2 - p1.col2) * (x - p1.col1))"
        )
        .cast("bigint")
        .alias("cross_dist"),
    )
    w_arg = Window.partitionBy(gc).orderBy(
        F.col("cross_dist").desc(), F.col("x").asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(w_arg))
        .where(F.col("_r") == 1)
        .select(
            gc,
            F.col("x").alias("knee_x"),
            F.col("y").alias("knee_y"),
            "cross_dist",
        )
    )


def cramer_von_mises(
    df: DataFrame,
    group_col: str,
    sample_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Cramér-von Mises statistic per group — the
    SUM-of-squared-ECDF-gaps companion to q_ks_two_sample's MAX gap
    (KS sees the single worst point; CvM integrates the whole
    mismatch). Fully exact integer: at each pooled support value,
    the ECDF gap is (n2*C1_i - n1*C2_i) over the common denominator
    n1*n2, so

        T_num = sum over pooled rows of (n2*C1_i - n1*C2_i)^2

    is accumulated on DECIMAL(38,0) (each row weighted by its tie
    multiplicity), and the normalized U = T_num / (n1*n2*(n1+n2)^2)
    * (n1+n2) form is reported ppm-scaled by one wide integer
    division. Same support-level shape as KS/MW: group by value, one
    cumulative window over distinct values — samples never sort
    row-by-row.

    Overflow discipline (round-12 fix of the documented-bound gap):
    |gap| <= n1*n2, each term <= (ca+cb)*(n1*n2)^2, and T_num <=
    (n1+n2)*(n1*n2)^2 — int64 only to n1+n2 ~ 3.9e3 equal-split rows
    per group, so BOTH the term products and the T_num sum ride
    DECIMAL(38,0) on Spark (DuckDB widens to HUGEINT natively) and
    the ppm division happens in decimal space — cvm_ppm is exact and
    cliff-free at any realistic group size. The raw t_num AUDIT
    column is re-narrowed to BIGINT for the cross-engine compare;
    past int64 both engines fail loudly at that cast (Spark ANSI /
    DuckDB conversion error) rather than silently diverging — drop
    the audit column for groups beyond ~4e3 rows. The per-row gap
    n2*c1 - n1*c2 stays int64 (safe to n1*n2 < 9e18)."""
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
    cum = by_val.select(
        gc,
        "ca",
        "cb",
        F.sum("ca").over(w).cast("bigint").alias("c1"),
        F.sum("cb").over(w).cast("bigint").alias("c2"),
    )
    # T_num needs n1/n2 (group totals) inside the per-row term, so
    # compute totals first and join back (group-count-sized join).
    totals = by_val.groupBy(gc).agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
    )
    terms = cum.join(totals, gc).select(
        gc,
        "n1",
        "n2",
        F.expr(
            "CAST(ca + cb AS DECIMAL(38,0))"
            " * CAST(n2 * c1 - n1 * c2 AS DECIMAL(38,0))"
            " * CAST(n2 * c1 - n1 * c2 AS DECIMAL(38,0))"
        )
        .cast("decimal(38,0)")
        .alias("term"),
    )
    return terms.groupBy(gc).agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum("term").cast("decimal(38,0)").alias("t_dec"),
    ).select(
        gc,
        "n1",
        "n2",
        F.col("t_dec").cast("bigint").alias("t_num"),
        F.expr(
            "CASE WHEN n1 > 0 AND n2 > 0 THEN CAST("
            f"(CAST({scale} AS DECIMAL(38,0)) * t_dec)"
            " div CAST(n1 * n2 * (n1 + n2) * (n1 + n2) AS DECIMAL(38,0))"
            " AS BIGINT) END"
        ).alias("cvm_ppm"),
    )


def energy_distance_1d(
    df: DataFrame,
    group_col: str,
    sample_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample ENERGY DISTANCE in one dimension, exact-integer —
    the metric two-sample test (Székely-Rizzo): E = 2*E|X-Y| -
    E|X-X'| - E|Y-Y'| >= 0 with equality iff the distributions match.
    Naively every term is an O(n²) pairwise sum; in 1-D each has the
    sorted-prefix closed form

        sum_{i<j} |v_j - v_i| = sum_i ((2i - n - 1) * v_i)   (v sorted)

    so ALL THREE terms come from one ranked pass, exact int64
    (pairwise sums of |cents| bounded by n²*max|v| — documented).
    Cross-engine: the prefix coefficient sum is invariant to tie
    order (coefficients over a tie block sum to a constant), so any
    deterministic rank works; the cross pair-sum never materializes —
    it falls out of pooled-minus-within: Sxy = Spool - Sxx - Syy.

    Overflow discipline: a single cross-multiplied numerator
    (2*n1*n2*Sxy - ...) overflows int64 at sf0.1 group sizes, so each
    mean term is ppm-scaled independently via the exact divmod
    identity floor(scale*s/d) = scale*(s div d) + (scale*(s mod d))
    div d — both factors stay under 2^63 for |v| cents up to ~1e6 and
    groups up to ~1e6 rows — and

        energy_ppm = 2*term(Sxy, n1*n2)
                     - 2*term(Sxx, n1*n1) - 2*term(Syy, n2*n2)

    with the THREE independent floors documented (the statistic can
    read up to 4 ppm below the exact value; identical in the oracle,
    so still cell-exact). Units: ppm of ONE value unit (cents) — the
    energy distance is a value-scale quantity, not a [0,1] score.
    """
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(sample_col).cast("bigint").alias("is_a"),
        F.col(value_col).cast("bigint").alias("v"),
    )

    def _pairsum(frame: DataFrame, part_cols: list[str]) -> DataFrame:
        w_rank = Window.partitionBy(*part_cols).orderBy("v", "is_a")
        w_n = Window.partitionBy(*part_cols)
        ranked = frame.select(
            *part_cols,
            "v",
            F.row_number().over(w_rank).cast("bigint").alias("i"),
            F.count(F.lit(1)).over(w_n).cast("bigint").alias("n"),
        )
        return ranked.groupBy(*part_cols).agg(
            F.max("n").alias("n"),
            F.sum(F.expr("(2 * i - n - 1) * v")).cast("bigint").alias("s"),
        )
    pool = _pairsum(base.withColumn("is_a", F.col("is_a")), [gc]).select(
        gc, F.col("s").alias("s_pool")
    )
    within = _pairsum(base, [gc, "is_a"])
    wide = (
        within.groupBy(gc)
        .agg(
            F.sum(F.expr("CASE WHEN is_a = 1 THEN n END"))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.expr("CASE WHEN is_a = 0 THEN n END"))
            .cast("bigint")
            .alias("n2"),
            F.sum(F.expr("CASE WHEN is_a = 1 THEN s END"))
            .cast("bigint")
            .alias("s_xx"),
            F.sum(F.expr("CASE WHEN is_a = 0 THEN s END"))
            .cast("bigint")
            .alias("s_yy"),
        )
        .join(pool, gc)
    )
    def _term(s: str, d: str) -> str:
        return (
            f"({scale} * (({s}) div ({d}))"
            f" + ({scale} * (({s}) % ({d}))) div ({d}))"
        )

    return wide.select(
        gc,
        "n1",
        "n2",
        F.expr("s_pool - s_xx - s_yy").cast("bigint").alias("s_xy"),
        "s_xx",
        "s_yy",
        F.expr(
            "CASE WHEN n1 > 0 AND n2 > 0 THEN CAST("
            f"2 * {_term('s_pool - s_xx - s_yy', 'n1 * n2')}"
            f" - 2 * {_term('s_xx', 'n1 * n1')}"
            f" - 2 * {_term('s_yy', 'n2 * n2')} AS BIGINT) END"
        ).alias("energy_ppm"),
    )


def markov_stationary(
    pairs: DataFrame,
    iterations: int = 6,
    scale: int = 1_000_000,
) -> DataFrame:
    """Stationary distribution of a first-order Markov chain by
    fixed-point power iteration — WHERE the user journey settles,
    completing q_markov_transitions (the matrix) with its long-run
    read. Input: (from_type, to_type, n) counts.

    Everything exact integer (the PageRank discipline): row-normalized
    transition mass p = (scale*n) div row_total; each iteration
    pi'(j) = sum_i (pi(i) * p(i,j)) div scale — products bounded by
    scale² = 1e12 and the per-state sum by k*1e12, int64-safe; floor
    leakage is identical cross-engine, so the result is cell-exact.
    States with no outgoing edges leak their mass (documented —
    event-stream types always recur as sources, and the leak is the
    honest fixed-point behavior, not hidden renormalization).

    The chain state space is the event-type vocabulary (model-sized),
    so every per-iteration join/aggregate touches k² rows at most —
    the heavy lifting happened upstream in the corpus-sized pair
    count. Output per state: pi_ppm after ``iterations`` rounds,
    pi_prev_ppm from the round before, and the signed delta — the
    data-computed convergence evidence (the k-truss rule: an
    under-iterated result self-reports)."""
    trans = pairs.select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        F.col("n").cast("bigint").alias("n"),
    )
    p = trans.select(
        "src",
        "dst",
        F.expr(f"CAST(({scale} * n) div sum(n) over (partition by src)"
               " AS BIGINT)").alias("p_fp"),
    ).localCheckpoint(eager=True)
    states = (
        p.select(F.col("src").alias("state"))
        .unionByName(p.select(F.col("dst").alias("state")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    k = states.count()
    pi = states.select(
        "state", F.lit(scale // k).cast("bigint").alias("pi_fp")
    )
    prev = pi
    # r16-opt (guide §5): the iterate is MODEL-sized (k states, ~rows
    # = distinct event types), so per-iteration eager localCheckpoints
    # bought nothing but 6 sequential driver round-trips — a lazy
    # 6-deep join chain over the checkpointed transition matrix plans
    # as ONE job. broadcast(p) keeps each tiny join shuffle-free.
    # Values unchanged (same joins/aggregates, exact integer math);
    # interleaved A/B warm best 1.72 -> 1.43s at sf0.1.
    for _ in range(iterations):
        prev = pi
        pi = (
            pi.join(F.broadcast(p), pi["state"] == p["src"])
            .groupBy(F.col("dst").alias("state"))
            .agg(
                F.expr(f"CAST(sum(pi_fp * p_fp) div {scale} AS BIGINT)")
                .alias("pi_fp")
            )
        )
    prev = prev.select(
        F.col("state"), F.col("pi_fp").alias("pi_prev_fp")
    )
    return (
        states.join(pi, "state", "left")
        .join(prev, "state", "left")
        .select(
            "state",
            F.coalesce(F.col("pi_fp"), F.lit(0)).cast("bigint").alias(
                "pi_ppm"
            ),
            F.coalesce(F.col("pi_prev_fp"), F.lit(0)).cast("bigint").alias(
                "pi_prev_ppm"
            ),
        )
        .withColumn(
            "delta_ppm",
            (F.col("pi_ppm") - F.col("pi_prev_ppm")).cast("bigint"),
        )
    )


def _anova_core(
    df: DataFrame,
    group_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """One-way ANOVA decomposition in the EXACT-INTEGER floor
    discipline (shared by ``anova_oneway`` and the Brown-Forsythe
    robust variance test).

    Float sums across a variable number of treatments are
    order-dependent (partial aggregation), so no float aggregate ever
    feeds a compared column. Instead each treatment's sum-of-squares
    contribution is FLOORED to an exact integer first and the floors
    are summed exactly:

        ssw = sum_j (n_j*Q_j - S_j^2) div n_j        (within)
        ssb = sum_j (S_j^2 div n_j)  -  S^2 div N    (between)

    with S_j/Q_j the per-treatment power sums (squares on
    DECIMAL(38,0), the q_bootstrap_ci precedent). Each floor loses
    < 1 squared-unit per treatment — identical on both engines, and
    negligible against SS magnitudes (~1e14 at sf0.1). The F ratio is
    one wide division:

        f_ppm = (scale * ssb * (N-k)) div (ssw * (k-1))

    computed on DECIMAL(38,0) (the product overflows int64), NULL
    when k < 2, N <= k, or ssw = 0. Two aggregates, no window."""
    gc = "group_key"
    per_t = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(treatment_col).alias("_t"),
            F.col(value_col).cast("bigint").alias("v"),
        )
        .groupBy(gc, "_t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_j"),
            F.sum("v").cast("bigint").alias("s_j"),
            F.sum(
                F.expr(
                    "CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))"
                )
            )
            .cast("decimal(38,0)")
            .alias("q_j"),
        )
    )
    g = per_t.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_treatments"),
        F.sum("n_j").cast("bigint").alias("n_total"),
        F.sum("s_j").cast("bigint").alias("s_total"),
        F.sum(
            F.expr(
                "CAST((n_j * q_j - CAST(s_j AS DECIMAL(38,0))"
                " * CAST(s_j AS DECIMAL(38,0))) div n_j AS DECIMAL(38,0))"
            )
        )
        .cast("decimal(38,0)")
        .alias("_ssw_dec"),
        F.sum(
            F.expr(
                "CAST((CAST(s_j AS DECIMAL(38,0))"
                " * CAST(s_j AS DECIMAL(38,0))) div n_j AS DECIMAL(38,0))"
            )
        )
        .cast("decimal(38,0)")
        .alias("_sqn_dec"),
    )
    return g.select(
        gc,
        "k_treatments",
        "n_total",
        F.col("_ssw_dec").cast("bigint").alias("ssw"),
        F.expr(
            "CAST(_sqn_dec - (CAST(s_total AS DECIMAL(38,0))"
            " * CAST(s_total AS DECIMAL(38,0))) div n_total AS BIGINT)"
        ).alias("ssb"),
        F.expr(
            "CASE WHEN k_treatments >= 2 AND n_total > k_treatments"
            " AND _ssw_dec > 0 THEN CAST("
            f"(CAST({scale} AS DECIMAL(38,0))"
            " * (_sqn_dec - (CAST(s_total AS DECIMAL(38,0))"
            " * CAST(s_total AS DECIMAL(38,0))) div n_total)"
            " * (n_total - k_treatments))"
            " div (_ssw_dec * (k_treatments - 1)) AS BIGINT) END"
        ).alias("f_ppm"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """One-way ANOVA F per group across treatments — do the treatment
    means differ relative to within-treatment spread? The classical
    parametric k-sample test completing the repo's two-sample family
    (Welch t / MW / KS / CvM / energy). Everything in the exact
    floored-integer discipline of ``_anova_core`` (no float
    aggregation, F as one wide integer division, ppm-scaled).
    Output: (group_key, k_treatments, n_total, ssb, ssw, f_ppm)."""
    return _anova_core(df, group_col, treatment_col, value_col, scale)


def levene_brown_forsythe(
    df: DataFrame,
    group_col: str,
    treatment_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Brown-Forsythe robust variance-equality test per group — the
    median-centered Levene variant (the recommended default: robust
    to non-normality): z_ij = |v_ij - median_j| and the statistic is
    one-way ANOVA's F over the z values.

    Exactness: medians ride the DOUBLED integer space (2*median =
    2*mid for odd n, lo+hi for even — no halving, no float), so the
    deviations are the exact integers |2*v - med2| and the ANOVA
    floor discipline applies verbatim (deviation unit = half-cents).
    Two windows (rank + count) for the median, then ``_anova_core``.
    Output: (group_key, k_treatments, n_total, ssb, ssw, f_ppm) over
    the doubled deviations."""
    gc, tc = "group_key", "_t"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(treatment_col).alias(tc),
        F.col(value_col).cast("bigint").alias("v"),
    )
    w_rank = Window.partitionBy(gc, tc).orderBy("v")
    w_all = Window.partitionBy(gc, tc)
    ranked = base.select(
        gc,
        tc,
        "v",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    med2 = (
        ranked.where(
            (F.col("_rn") * 2 == F.col("_n"))
            | (F.col("_rn") * 2 == F.col("_n") + 1)
            | (F.col("_rn") * 2 == F.col("_n") + 2)
        )
        .groupBy(gc, tc)
        .agg(
            F.when(
                F.max("_n") % 2 == 1, 2 * F.expr("max(CASE WHEN _rn * 2 = _n + 1 THEN v END)")
            )
            .otherwise(
                F.expr("max(CASE WHEN _rn * 2 = _n THEN v END)")
                + F.expr("max(CASE WHEN _rn * 2 = _n + 2 THEN v END)")
            )
            .cast("bigint")
            .alias("med2")
        )
    )
    dev = base.join(med2, [gc, tc]).select(
        gc, tc, F.expr("abs(2 * v - med2)").cast("bigint").alias("z2")
    )
    return _anova_core(dev, gc, tc, "z2", scale)


def wilcoxon_signed_rank(
    df: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Wilcoxon signed-rank test per group over paired observations —
    the nonparametric paired twin of the McNemar/paired-t corner:
    d = a - b, zeros dropped (the classical convention), |d| ranked
    with midranks, W+ = sum of ranks of positive differences.

    Doubled-rank integer space throughout (tie group of size c after
    cum_prev pooled rows: r2 = 2*cum_prev + c + 1), so W2P = 2*W+ is
    exact int64 via one support-level rollup on (group, |d|) with
    positive/negative counts. The normal approximation with the
    standard tie correction keeps exact integer moments:

        E[W2P]   = n*(n+1) / 2            (doubled)
        VAR12    = 2*n*(n+1)*(2n+1) - T   (T = sum over tie groups
                                           of c^3 - c; Var(W2P) =
                                           VAR12 / 12)

    and the z tail is a fixed sequence of exact-operand IEEE ops
    (hex-pinned bit-equal in tests): z = (W2P - n(n+1)/2) /
    sqrt(VAR12/12). NULL when n = 0 or VAR12 = 0 (all ties at one
    magnitude). Output: (group_key, n_pairs, w2_plus, t_ties, z)."""
    gc = "group_key"
    d = df.select(
        F.col(group_col).alias(gc),
        (F.col(a_col).cast("bigint") - F.col(b_col).cast("bigint")).alias(
            "d"
        ),
    ).where(F.col("d") != 0)
    by_mag = d.groupBy(gc, F.expr("abs(d)").alias("ad")).agg(
        F.sum(F.expr("CASE WHEN d > 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cp"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    w = (
        Window.partitionBy(gc)
        .orderBy("ad")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = by_mag.select(
        gc,
        "cp",
        "c",
        (F.sum("c").over(w) - F.col("c")).cast("bigint").alias("cum_prev"),
    )
    agg = ranked.groupBy(gc).agg(
        F.sum("c").cast("bigint").alias("n_pairs"),
        F.sum(F.expr("cp * (2 * cum_prev + c + 1)"))
        .cast("bigint")
        .alias("w2_plus"),
        F.sum(F.expr("c * c * c - c")).cast("bigint").alias("t_ties"),
    )
    return agg.select(
        gc,
        "n_pairs",
        "w2_plus",
        "t_ties",
        F.expr(
            "CASE WHEN n_pairs > 0 AND"
            " 2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - t_ties > 0"
            " THEN (CAST(2 * w2_plus - n_pairs * (n_pairs + 1) AS DOUBLE)"
            " / 2.0)"
            " / sqrt(CAST(2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1)"
            " - t_ties AS DOUBLE) / 12.0) END"
        ).alias("z"),
    )


def cochran_q(
    df: DataFrame,
    group_col: str,
    item_col: str,
    treatment_col: str,
    flag_col: str,
) -> DataFrame:
    """Cochran's Q per group — do k binary raters/treatments mark the
    same items at different rates? (The k-sample extension of
    McNemar.) Items must be COMPLETE blocks (every treatment rates
    every item exactly once — enforced with the round-12 Friedman
    gate: count(*) == countDistinct == k per item).

    Fully exact integer in one common-denominator form:

        Q = (k-1) * (k * sum_j G_j^2 - N^2) / (k*N - sum_i L_i^2)

    (G_j = per-treatment success totals, L_i = per-item success
    totals, N = total successes), reported as q_ppm = scale*num div
    den; NULL when the denominator is 0 (every item all-0 or all-1 —
    no discordance to test). Output: (group_key, k_treatments,
    n_items, n_success, q_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(item_col).alias("_i"),
        F.col(treatment_col).alias("_t"),
        F.col(flag_col).cast("bigint").alias("y"),
    )
    k_per_g = base.groupBy(gc).agg(
        F.countDistinct("_t").cast("bigint").alias("_k")
    )
    complete = (
        base.groupBy(gc, "_i")
        .agg(
            F.countDistinct("_t").cast("bigint").alias("_kd"),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
        )
        .join(k_per_g, gc)
        .where((F.col("_kd") == F.col("_k")) & (F.col("_n") == F.col("_k")))
        .select(gc, "_i")
    )
    scoped = base.join(complete, [gc, "_i"])
    rows = scoped.groupBy(gc, "_i").agg(
        F.sum("y").cast("bigint").alias("l_i")
    )
    row_agg = rows.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("l_i").cast("bigint").alias("n_success"),
        F.sum(F.expr("l_i * l_i")).cast("bigint").alias("_l2"),
    )
    cols = scoped.groupBy(gc, "_t").agg(
        F.sum("y").cast("bigint").alias("g_j")
    )
    col_agg = cols.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_treatments"),
        F.sum(F.expr("g_j * g_j")).cast("bigint").alias("_g2"),
    )
    return row_agg.join(col_agg, gc).select(
        gc,
        "k_treatments",
        "n_items",
        "n_success",
        F.expr(
            "CASE WHEN k_treatments * n_success - _l2 > 0 THEN CAST("
            "(1000000 * (k_treatments - 1)"
            " * (k_treatments * _g2 - n_success * n_success))"
            " div (k_treatments * n_success - _l2) AS BIGINT) END"
        ).alias("q_ppm"),
    )


def changepoint_binseg(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Best single change point per group (one step of binary
    segmentation, the workhorse of offline changepoint detection):
    the split t maximizing the fitted two-segment objective

        J(t) = S_l^2/n_l + S_r^2/n_r

    (equivalent to minimizing two-segment SSE; the squared terms
    cancel). Prefix sums are exact int64 via one cumulative window;
    J is a fixed sequence of exact-operand IEEE divides/adds —
    bit-equal cross-engine (no transcendentals) — and the argmax is
    total-ordered by (J DESC, t ASC). The reported gain_ppm compares
    against the no-split objective S^2/N in exact integer floor form:

        gain_ppm = scale * ((S_l^2 div n_l) + (S_r^2 div n_r)
                            - (S^2 div N))  div  (S^2 div N + 1)

    (+1 dodges zero). O(n) candidates per group — no quadratic scan.
    Output: (group_key, split_at, n_left, n_right, s_left, s_right,
    gain_ppm)."""
    gc = "group_key"
    w_seq = Window.partitionBy(group_col).orderBy(*order_cols)
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(group_col)
    staged = df.select(
        F.col(group_col).alias(gc),
        F.row_number().over(w_seq).cast("bigint").alias("rn"),
        F.sum(F.col(value_col).cast("bigint"))
        .over(w_cum)
        .cast("bigint")
        .alias("s_l"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("bigint"))
        .over(w_all)
        .cast("bigint")
        .alias("s"),
    ).where(F.col("rn") < F.col("n"))
    scored = staged.select(
        gc,
        "rn",
        "n",
        "s",
        "s_l",
        (F.col("s") - F.col("s_l")).alias("s_r"),
        F.expr(
            "CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE) / CAST(rn AS DOUBLE)"
            " + CAST(s - s_l AS DOUBLE) * CAST(s - s_l AS DOUBLE)"
            " / CAST(n - rn AS DOUBLE)"
        ).alias("j"),
    )
    w_arg = Window.partitionBy(gc).orderBy(F.col("j").desc(), F.col("rn"))
    top = scored.withColumn("_r", F.row_number().over(w_arg)).where(
        F.col("_r") == 1
    )
    return top.select(
        gc,
        F.col("rn").alias("split_at"),
        F.col("rn").alias("n_left"),
        (F.col("n") - F.col("rn")).alias("n_right"),
        F.col("s_l").alias("s_left"),
        F.col("s_r").alias("s_right"),
        F.expr(
            "CAST((1000000 * ((s_l * s_l) div rn"
            " + (s_r * s_r) div (n - rn) - (s * s) div n))"
            " div ((s * s) div n + 1) AS BIGINT)"
        ).alias("gain_ppm"),
    )


def seasonal_decompose_monthly(
    df: DataFrame,
    group_col: str,
    month_col: str,
    value_col: str,
    scale_unused: int = 0,
) -> DataFrame:
    """Classical additive seasonal decomposition of a monthly series
    per group, exact-integer throughout — the period-mean method:

      trend2x24 = centered 12-month MA in DOUBLED-x-24 space:
                  x_{t-6} + 2*sum(x_{t-5}..x_{t+5}) + x_{t+6}
                  (the half-weight endpoint convention for even
                  periods; NULL at the 6-row edges)
      detr24    = 24*x - trend2x24                 (exact)
      seas24    = per-month-of-year mean of detr24, FLOORED
                  (div, floor leak identical cross-engine)
      resid24   = detr24 - seas24

    Everything stays in the x24 integer space — no float ever; the
    caller divides by 24 for display. ``month_col`` is an absolute
    month index (year*12 + month). Two windows + one join; month-of-
    year = month_col % 12. Output: (group_key, month_idx, v,
    trend2x24, seas24, resid24) for rows where the trend window is
    complete AND contiguous: the 13-row frame must also span exactly
    12 month indices (max - min == 12 over the frame), so a series
    with missing months drops the affected rows instead of silently
    averaging non-adjacent months (round-12 advice fix — the row
    count alone cannot see gaps). Callers wanting those rows gap-fill
    first (the repo's calendar gap-fill composes)."""
    gc = "group_key"
    w_seq = Window.partitionBy(group_col).orderBy(month_col)
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(month_col).cast("bigint").alias("month_idx"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    trend = base.select(
        gc,
        "month_idx",
        "v",
        (
            F.lag("v", 6).over(
                Window.partitionBy(gc).orderBy("month_idx")
            )
            + 2
            * F.sum("v")
            .over(
                Window.partitionBy(gc)
                .orderBy("month_idx")
                .rowsBetween(-5, 5)
            )
            + F.lead("v", 6).over(
                Window.partitionBy(gc).orderBy("month_idx")
            )
        )
        .cast("bigint")
        .alias("trend2x24"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy(gc)
            .orderBy("month_idx")
            .rowsBetween(-6, 6)
        )
        .alias("_win_n"),
        (
            F.max("month_idx").over(
                Window.partitionBy(gc)
                .orderBy("month_idx")
                .rowsBetween(-6, 6)
            )
            - F.min("month_idx").over(
                Window.partitionBy(gc)
                .orderBy("month_idx")
                .rowsBetween(-6, 6)
            )
        ).alias("_win_span"),
    ).where(
        (F.col("_win_n") == 13)
        & (F.col("_win_span") == 12)
        & F.col("trend2x24").isNotNull()
    )
    detr = trend.select(
        gc,
        "month_idx",
        "v",
        "trend2x24",
        (24 * F.col("v") - F.col("trend2x24")).cast("bigint").alias(
            "detr24"
        ),
        (F.col("month_idx") % 12).alias("_moy"),
    )
    seas = detr.groupBy(gc, "_moy").agg(
        F.expr("CAST(sum(detr24) div count(1) AS BIGINT)").alias("seas24")
    )
    return (
        detr.join(seas, [gc, "_moy"])
        .select(
            gc,
            "month_idx",
            "v",
            "trend2x24",
            "seas24",
            (F.col("detr24") - F.col("seas24")).cast("bigint").alias(
                "resid24"
            ),
        )
    )


def kendall_tau_b(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Kendall's tau-b rank correlation per group, tie-corrected,
    EXACT — the concordance companion of spearman_rank_corr (tau's
    pairwise story is often the better fit for heavy-tie bucketed
    data, which is exactly the 100 TB regime this targets: bucket
    first, then correlate).

    Never the O(n^2) row-pair enumeration: rows collapse to the 2-D
    SUPPORT GRID (group by (x, y) with counts), and concordant /
    discordant pair mass comes from the CELL-pair join under the
    lexicographic (x, y) order — cost is cells^2 per group, with the
    cell count the caller's bucketing knob, not the row count. Tie
    terms need no pair join at all: n1 = sum tx(tx-1)/2 from the x
    marginal, n2 from the y marginal, n0 = n(n-1)/2.

        tau_b = (C - D) / (sqrt(n0 - n1) * sqrt(n0 - n2))

    C, D, n0, n1, n2 exact int64; the tail is a fixed IEEE op chain
    (two exact sqrts, one multiply, one divide — bit-equal). NULL
    when either sqrt argument is 0 (all x tied or all y tied).
    Output: (group_key, n, n_concordant, n_discordant, tau_b)."""
    gc = "group_key"
    cells = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(x_col).cast("bigint").alias("x"),
            F.col(y_col).cast("bigint").alias("y"),
        )
        .groupBy(gc, "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # feeds pair join (x2) + marginals
    )
    a = cells.select(
        gc,
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = cells.select(
        gc,
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("c").alias("cb"),
    )
    pair_mass = (
        a.join(b, gc)
        .where(
            (F.col("xa") < F.col("xb"))
            | ((F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb")))
        )
        .groupBy(gc)
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN (xb - xa) * (yb - ya) > 0"
                        " THEN ca * cb ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_concordant"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN (xb - xa) * (yb - ya) < 0"
                        " THEN ca * cb ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_discordant"),
        )
    )
    xm = (
        cells.groupBy(gc, "x")
        .agg(F.sum("c").cast("bigint").alias("tx"))
        .groupBy(gc)
        .agg(
            F.sum(F.expr("tx * (tx - 1) div 2")).cast("bigint").alias("n1t")
        )
    )
    ym = (
        cells.groupBy(gc, "y")
        .agg(F.sum("c").cast("bigint").alias("ty"))
        .groupBy(gc)
        .agg(
            F.sum(F.expr("ty * (ty - 1) div 2")).cast("bigint").alias("n2t")
        )
    )
    nrow = cells.groupBy(gc).agg(F.sum("c").cast("bigint").alias("n"))
    j = (
        nrow.join(pair_mass, gc, "left")
        .join(xm, gc)
        .join(ym, gc)
        .select(
            gc,
            "n",
            F.coalesce(F.col("n_concordant"), F.lit(0))
            .cast("bigint")
            .alias("n_concordant"),
            F.coalesce(F.col("n_discordant"), F.lit(0))
            .cast("bigint")
            .alias("n_discordant"),
            F.expr("n * (n - 1) div 2").cast("bigint").alias("_n0"),
            "n1t",
            "n2t",
        )
    )
    return j.select(
        gc,
        "n",
        "n_concordant",
        "n_discordant",
        F.expr(
            "CASE WHEN _n0 - n1t > 0 AND _n0 - n2t > 0 THEN"
            " CAST(n_concordant - n_discordant AS DOUBLE)"
            " / (sqrt(CAST(_n0 - n1t AS DOUBLE))"
            " * sqrt(CAST(_n0 - n2t AS DOUBLE))) END"
        ).alias("tau_b"),
    )


def mad_scaler(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    scale: int = 1_000_000,
    sample_mod: int = 1,
) -> DataFrame:
    """Robust median/MAD standardization per group — the outlier-
    immune alternative to z-scores (mean and SD are both hijacked by
    the tails winsorize/Tukey flag): center = median, spread = median
    absolute deviation, score = (x - med) / MAD.

    Entirely in the repo's DOUBLED integer spaces: med2 = doubled
    group median (2*mid odd / lo+hi even), deviations adev2 =
    |2v - med2| exact, mad4 = doubled median OF the deviations (so
    mad4 is in quarter-units), and the reported score is the exact
    integer ``robust_z_ppm = (scale * 2 * (2v - med2)) div mad4``
    (signed; the 2x aligns the dev's half-units with mad4's
    quarter-units — score units are plain MADs, unscaled by the
    1.4826 normal-consistency constant, which is a float; NULL when
    mad4 = 0). Output rows scoped by ``id % sample_mod = 0`` (the
    registration scale knob); med2/mad4 are computed over the FULL
    group either way. Four windows on two exchanges."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(value_col).cast("bigint").alias("v"),
    )

    def _med2_of(frame: DataFrame, col: str, out: str) -> DataFrame:
        w_rank = Window.partitionBy(gc).orderBy(col, "id")
        w_all = Window.partitionBy(gc)
        ranked = frame.select(
            gc,
            "id",
            F.col(col).alias("_v"),
            F.row_number().over(w_rank).alias("_rn"),
            F.count(F.lit(1)).over(w_all).alias("_n"),
        )
        return (
            ranked.where(
                (F.col("_rn") * 2 == F.col("_n"))
                | (F.col("_rn") * 2 == F.col("_n") + 1)
                | (F.col("_rn") * 2 == F.col("_n") + 2)
            )
            .groupBy(gc)
            .agg(
                F.when(
                    F.max("_n") % 2 == 1,
                    2 * F.expr("max(CASE WHEN _rn * 2 = _n + 1 THEN _v END)"),
                )
                .otherwise(
                    F.expr("max(CASE WHEN _rn * 2 = _n THEN _v END)")
                    + F.expr("max(CASE WHEN _rn * 2 = _n + 2 THEN _v END)")
                )
                .cast("bigint")
                .alias(out)
            )
        )

    med = _med2_of(base, "v", "med2")
    dev = base.join(med, gc).select(
        gc, "id", "v", "med2",
        F.expr("abs(2 * v - med2)").cast("bigint").alias("adev2"),
    )
    mad = _med2_of(dev, "adev2", "mad4")
    return (
        dev.join(mad, gc)
        .where(F.col("id") % sample_mod == 0)
        .select(
            gc,
            "id",
            "v",
            "med2",
            "mad4",
            F.expr(
                f"CASE WHEN mad4 > 0 THEN CAST(({scale} * 2 * (2 * v - med2))"
                " div mad4 AS BIGINT) END"
            ).alias("robust_z_ppm"),
        )
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    trim_pct: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Symmetric trimmed mean per group — the robust location
    estimate between the mean (outlier-hijacked) and the median
    (throws away 100% - epsilon of the data): DROP the lowest and
    highest ``trim_pct`` percent of rows, average the middle.

    Integer ceil-rank trimming (the repo's quantile rule — never
    ceil(0.1*n) in float): k = (n * trim_pct + 99) div 100 rows cut
    from EACH side under the (value, id) total order; NULL when
    nothing survives (n <= 2k). The reported mean is the exact
    ``trimmed_mean_scaled = (scale * sum_kept) div n_kept`` (signed
    div truncates identically cross-engine). One rank window + one
    conditional aggregate. Output: (group_key, n, n_kept, sum_kept,
    trimmed_mean_scaled)."""
    gc = "group_key"
    w_rank = Window.partitionBy(group_col).orderBy(value_col, id_col)
    w_all = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col).alias(gc),
        F.col(value_col).cast("bigint").alias("v"),
        F.row_number().over(w_rank).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    ).withColumn(
        "k", F.expr(f"(n * {trim_pct} + 99) div 100").cast("bigint")
    )
    agg = ranked.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.sum(F.expr("CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.expr("CASE WHEN rn > k AND rn <= n - k THEN v ELSE 0 END"))
        .cast("bigint")
        .alias("sum_kept"),
    )
    return agg.select(
        gc,
        "n",
        "n_kept",
        "sum_kept",
        F.expr(
            "CASE WHEN n_kept > 0 THEN"
            f" CAST(({scale} * sum_kept) div n_kept AS BIGINT) END"
        ).alias("trimmed_mean_scaled"),
    )


def top_paths3(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    step_col: str,
    topk: int = 50,
) -> DataFrame:
    """Top length-3 journey paths (A -> B -> C) across all per-group
    event sequences — the Sankey/flow table a product-analytics stack
    draws: two lead() windows under the per-group total order, one
    count, total-ordered top-k via sort+limit (TakeOrderedAndProject,
    never a global single-partition window over the path table).
    Paths shorter than 3 contribute nothing (leads NULL). Output:
    (step_1, step_2, step_3, n_paths, rank)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    paths = (
        df.select(
            F.col(step_col).alias("step_1"),
            F.lead(step_col, 1).over(w).alias("step_2"),
            F.lead(step_col, 2).over(w).alias("step_3"),
        )
        .where(F.col("step_2").isNotNull() & F.col("step_3").isNotNull())
        .groupBy("step_1", "step_2", "step_3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    top = paths.orderBy(
        F.col("n_paths").desc(), "step_1", "step_2", "step_3"
    ).limit(topk)
    w_rank = Window.orderBy(
        F.col("n_paths").desc(), "step_1", "step_2", "step_3"
    )
    return top.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))


def xcorr_leadlag(
    series_a: DataFrame,
    series_b: DataFrame,
    time_col: str = "t",
    value_col: str = "v",
    max_lag: int = 7,
) -> DataFrame:
    """Lead-lag cross-correlation table between two aligned integer
    series — WHICH series moves first, and by how much? For every lag
    L in [-max_lag, max_lag], Pearson r between a(t) and b(t+L) over
    the overlapping support (an equi-join on t = t'+L per lag, one
    stacked pass — never a per-lag query).

    Integer core: per-lag exact moments (n, sums; squares and cross
    products on DECIMAL(38,0)); r is the fixed-op float tail
    (n*Sab - Sa*Sb) / (sqrt(n*Saa - Sa^2) * sqrt(n*Sbb - Sb^2)) —
    bit-equal cross-engine. NULL when either side is constant on the
    overlap or the overlap has < 2 points. Output per lag:
    (lag, n, r) — argmax |r| over lags is the lead-lag read.
    Scale: both inputs are AGGREGATED series (days/months), so the
    lag explode is (2*max_lag+1) x series length — model-sized."""
    a = series_a.select(
        F.col(time_col).cast("bigint").alias("ta"),
        F.col(value_col).cast("bigint").alias("va"),
    )
    b = series_b.select(
        F.col(time_col).cast("bigint").alias("tb"),
        F.col(value_col).cast("bigint").alias("vb"),
    )
    lags = a.select(
        "ta",
        "va",
        F.explode(F.expr(f"sequence({-max_lag}, {max_lag})")).alias("lag"),
    )
    joined = lags.join(
        b, lags["ta"] + lags["lag"] == b["tb"]
    ).select("lag", "va", "vb")
    d = "CAST({e} AS DECIMAL(38,0))"
    m = joined.groupBy(F.col("lag").cast("bigint").alias("lag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("va").cast("bigint").alias("sa"),
        F.sum("vb").cast("bigint").alias("sb"),
        F.sum(F.expr(d.format(e="va") + " * " + d.format(e="va")))
        .cast("decimal(38,0)")
        .alias("saa"),
        F.sum(F.expr(d.format(e="vb") + " * " + d.format(e="vb")))
        .cast("decimal(38,0)")
        .alias("sbb"),
        F.sum(F.expr(d.format(e="va") + " * " + d.format(e="vb")))
        .cast("decimal(38,0)")
        .alias("sab"),
    )
    va = (
        "(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)"
        " - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
    )
    vb = (
        "(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)"
        " - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))"
    )
    cov = (
        "(CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)"
        " - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
    )
    return m.select(
        "lag",
        "n",
        F.expr(
            f"CASE WHEN n >= 2 AND {va} > 0 AND {vb} > 0 THEN"
            f" {cov} / (sqrt({va}) * sqrt({vb})) END"
        ).alias("r"),
    )


def logrank_test(
    df: DataFrame,
    group_col: str,
    dur_col: str,
    event_col: str,
    arm_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-arm log-rank test per group — the survival-curve
    comparison completing the Kaplan-Meier / Nelson-Aalen family:
    does arm 1 die faster than the pooled risk sets predict? At each
    pooled death time t: O1 accumulates arm-1 deaths, E1 accumulates
    d_t * n1_t / n_t, V the hypergeometric variance.

    Exact-integer floor discipline (the ANOVA precedent — no float
    sums over a variable number of times):

        e_fp_t = (scale * d_t * n1_t) div n_t
        v_fp_t = (scale * d_t * (n_t - d_t) * n1_t * (n_t - n1_t))
                 div (n_t^2 * (n_t - 1))        [DECIMAL(38,0) —
                                                 the numerator passes
                                                 int64 at ~3e4 at-risk]

    each floored then summed exactly; times with n_t <= 1 contribute
    nothing (variance undefined). The z tail is one fixed IEEE chain:
    z = (scale*O1 - sum e_fp) / sqrt(sum v_fp * scale). At-risk
    counts from one per-time rollup + one cumulative window (rows
    leave the risk set after their time, censored or not). Output:
    (group_key, o1, e_fp, v_fp, z); NULL z when v_fp = 0."""
    gc = "group_key"
    by_t = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(dur_col).cast("bigint").alias("t"),
            F.col(event_col).cast("bigint").alias("e"),
            F.col(arm_col).cast("bigint").alias("a"),
        )
        .groupBy(gc, "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_at"),
            F.sum("a").cast("bigint").alias("n1_at"),
            F.sum("e").cast("bigint").alias("d"),
            F.sum(F.expr("e * a")).cast("bigint").alias("d1"),
        )
    )
    w_all = Window.partitionBy(gc)
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = by_t.select(
        gc,
        "t",
        "d",
        "d1",
        (F.sum("n_at").over(w_all) - F.sum("n_at").over(w_cum) + F.col("n_at"))
        .cast("bigint")
        .alias("n_risk"),
        (
            F.sum("n1_at").over(w_all)
            - F.sum("n1_at").over(w_cum)
            + F.col("n1_at")
        )
        .cast("bigint")
        .alias("n1_risk"),
    ).where((F.col("d") > 0) & (F.col("n_risk") > 1))
    terms = risk.select(
        gc,
        "d1",
        F.expr(f"({scale} * d * n1_risk) div n_risk")
        .cast("bigint")
        .alias("e_fp_t"),
        F.expr(
            f"CAST((CAST({scale} AS DECIMAL(38,0)) * d * (n_risk - d)"
            " * n1_risk * (n_risk - n1_risk))"
            " div CAST(n_risk * n_risk * (n_risk - 1) AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("v_fp_t"),
    )
    agg = terms.groupBy(gc).agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e_fp_t").cast("bigint").alias("e_fp"),
        F.sum("v_fp_t").cast("bigint").alias("v_fp"),
    )
    return agg.select(
        gc,
        "o1",
        "e_fp",
        "v_fp",
        F.expr(
            f"CASE WHEN v_fp > 0 THEN CAST({scale} * o1 - e_fp AS DOUBLE)"
            f" / sqrt(CAST(v_fp AS DOUBLE) * CAST({scale} AS DOUBLE)) END"
        ).alias("z"),
    )


def seasonal_strength(
    decomp: DataFrame,
    group_col: str = "group_key",
) -> DataFrame:
    """Seasonal and trend STRENGTH of a decomposed series (Hyndman's
    F_s / F_t, the 'is this series worth a seasonal model?' gate) —
    computed over ``seasonal_decompose_monthly`` output, entirely
    from exact integer moments in the x24 space:

        F_s = max(0, 1 - Var(resid) / Var(seas + resid))
        F_t = max(0, 1 - Var(resid) / Var(trend + resid))

    Population variances as the n*Q - S^2 numerators, computed and
    SUBTRACTED entirely on DECIMAL(38,0) (the 1/n^2 factors cancel in
    the ratio), then the ratio itself as one exact ppm integer
    division — no float anywhere. The first cut cast the big Q
    moments to DOUBLE and subtracted there: past 2^53 the two
    engines' wide-int->double casts disagree by an ulp (DuckDB's
    HUGEINT->DOUBLE composes two fp ops) and the near-cancelling
    subtraction amplified that to ~300 ulps in F at sf0.01 — exact
    integer cancellation + ppm is the repo rule for a reason. NULL
    when the denominator variance is 0. Output: (group_key, n,
    f_seasonal_ppm, f_trend_ppm)."""
    gc = "group_key"
    d = "CAST({e} AS DECIMAL(38,0))"
    base = decomp.select(
        F.col(group_col).alias(gc),
        F.col("resid24").alias("r"),
        (F.col("seas24") + F.col("resid24")).cast("bigint").alias("sr"),
        (F.col("trend2x24") + F.col("resid24")).cast("bigint").alias("tr"),
    )
    m = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s_r"),
        F.sum("sr").cast("bigint").alias("s_sr"),
        F.sum("tr").cast("bigint").alias("s_tr"),
        F.sum(F.expr(d.format(e="r") + " * " + d.format(e="r")))
        .cast("decimal(38,0)")
        .alias("q_r"),
        F.sum(F.expr(d.format(e="sr") + " * " + d.format(e="sr")))
        .cast("decimal(38,0)")
        .alias("q_sr"),
        F.sum(F.expr(d.format(e="tr") + " * " + d.format(e="tr")))
        .cast("decimal(38,0)")
        .alias("q_tr"),
    )
    vr = (
        "(CAST(n AS DECIMAL(38,0)) * q_r"
        " - CAST(s_r AS DECIMAL(38,0)) * CAST(s_r AS DECIMAL(38,0)))"
    )
    vsr = (
        "(CAST(n AS DECIMAL(38,0)) * q_sr"
        " - CAST(s_sr AS DECIMAL(38,0)) * CAST(s_sr AS DECIMAL(38,0)))"
    )
    vtr = (
        "(CAST(n AS DECIMAL(38,0)) * q_tr"
        " - CAST(s_tr AS DECIMAL(38,0)) * CAST(s_tr AS DECIMAL(38,0)))"
    )
    return m.select(
        gc,
        "n",
        F.expr(
            f"CASE WHEN {vsr} > 0 THEN greatest(CAST(0 AS BIGINT),"
            f" CAST(1000000 - (1000000 * {vr}) div {vsr} AS BIGINT)) END"
        ).alias("f_seasonal_ppm"),
        F.expr(
            f"CASE WHEN {vtr} > 0 THEN greatest(CAST(0 AS BIGINT),"
            f" CAST(1000000 - (1000000 * {vr}) div {vtr} AS BIGINT)) END"
        ).alias("f_trend_ppm"),
    )


def hodges_lehmann(
    df: DataFrame,
    group_col: str,
    x_col: str,
) -> DataFrame:
    """Hodges-Lehmann location estimator per group — the median of
    all n(n+1)/2 pairwise (Walsh) averages (x_i + x_j)/2, i <= j: the
    robust location companion of the Wilcoxon signed-rank test,
    sitting between ``trimmed_mean`` and the plain median in the
    robust-location family. EXACT and never O(n^2)-by-rows (the
    kendall_tau_b support-grid discipline):

      - rows collapse to the value SUPPORT GRID (x, c) per group —
        the caller's bucketing knob bounds the grid;
      - Walsh mass from the cell-pair join: weight c_a*c_b for
        x_a < x_b, c*(c+1)/2 on the diagonal; the Walsh value is
        kept DOUBLED (w2 = x_a + x_b — exact int);
      - the weighted median of w2 via cumulative spans: w2[k] is the
        cell whose cumulative span covers rank k; med-of-w2 doubles
        again -> ``hl4`` is the estimator in QUADRUPLED units
        (hl = hl4 / 4), exact cross-engine.

    Output: (group_key, n, n_pairs, hl4)."""
    gc = "group_key"
    cells = df.groupBy(
        F.col(group_col).alias(gc), F.col(x_col).alias("x")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = cells.select(gc, F.col("x").alias("xa"), F.col("c").alias("ca"))
    b = cells.select(gc, F.col("x").alias("xb"), F.col("c").alias("cb"))
    walsh = (
        a.join(b, gc)
        .where(F.col("xa") <= F.col("xb"))
        .select(
            gc,
            (F.col("xa") + F.col("xb")).cast("bigint").alias("w2"),
            F.expr(
                "CAST(CASE WHEN xa = xb THEN ca * (ca + 1) div 2"
                " ELSE ca * cb END AS BIGINT)"
            ).alias("wt"),
        )
    )
    # collapse colliding Walsh values (1+4 == 2+3) BEFORE the
    # cumulative window: distinct (group, w2) rows make the running
    # sum independent of tie order inside the window
    walsh = walsh.groupBy(gc, "w2").agg(
        F.sum("wt").cast("bigint").alias("wt")
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("w2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(gc)
    staged = walsh.select(
        gc,
        "w2",
        (F.sum("wt").over(w_cum)).cast("bigint").alias("cum"),
        (F.sum("wt").over(w_cum) - F.col("wt")).cast("bigint").alias(
            "cum_prev"
        ),
        F.sum("wt").over(w_all).cast("bigint").alias("np"),
    )
    picked = staged.where(
        (F.col("cum_prev") * 2 < F.col("np") + 2)
        & (F.col("cum") * 2 >= F.col("np"))
    )
    agg = picked.groupBy(gc).agg(
        F.max("np").alias("n_pairs"),
        F.expr(
            "CAST(CASE WHEN MAX(np) % 2 = 1 THEN"
            " 2 * MAX(CASE WHEN cum_prev * 2 < np + 1"
            " AND np + 1 <= cum * 2 THEN w2 END)"
            " ELSE MAX(CASE WHEN cum_prev * 2 < np"
            " AND np <= cum * 2 THEN w2 END)"
            " + MAX(CASE WHEN cum_prev * 2 < np + 2"
            " AND np + 2 <= cum * 2 THEN w2 END) END AS BIGINT)"
        ).alias("hl4"),
    )
    nrow = df.groupBy(F.col(group_col).alias(gc)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return nrow.join(agg, gc).select(gc, "n", "n_pairs", "hl4")


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    ord_col: str,
    x_col: str,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test per group —
    'do values INCREASE across the ordered subgroups?' (years,
    doses, cohorts): the k-sample companion of Mann-Kendall, more
    powerful than Kruskal-Wallis when the alternative is ordered.

    J = sum over subgroup pairs o_a < o_b of #(x_a < x_b) + ties/2.
    Kept DOUBLED for exactness (the repo's doubled-units rule):
    j2 = sum(2*concordant + ties); under H0 E[J2] = sum n_a*n_b.
    EXACT via the per-(subgroup, value) SUPPORT GRID — the
    cell-pair join is (cells_a x cells_b), never rows^2; tie mass
    from equal-value cells. trend_ppm = (1e6*j2) div ej2 reads
    ~1e6 = no trend, 2e6 = perfectly increasing, 0 = decreasing.

    Output: (group_key, n, j2, ej2, trend_ppm)."""
    gc = "group_key"
    cells = df.groupBy(
        F.col(group_col).alias(gc),
        F.col(ord_col).alias("o"),
        F.col(x_col).alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = cells.select(
        gc, F.col("o").alias("oa"), F.col("x").alias("xa"),
        F.col("c").alias("ca"),
    )
    b = cells.select(
        gc, F.col("o").alias("ob"), F.col("x").alias("xb"),
        F.col("c").alias("cb"),
    )
    pairs = a.join(b, gc).where(F.col("oa") < F.col("ob"))
    j_agg = pairs.groupBy(gc).agg(
        F.sum(
            F.expr(
                "CASE WHEN xa < xb THEN 2 * ca * cb"
                " WHEN xa = xb THEN ca * cb ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("j2"),
        F.sum(F.expr("ca * cb")).cast("bigint").alias("ej2"),
    )
    nrow = df.groupBy(F.col(group_col).alias(gc)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return nrow.join(j_agg, gc).select(
        gc,
        "n",
        "j2",
        "ej2",
        F.expr(
            "CASE WHEN ej2 > 0 THEN"
            " CAST((1000000 * j2) div ej2 AS BIGINT) END"
        ).alias("trend_ppm"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    treat_col: str,
    v_col: str,
) -> DataFrame:
    """Kruskal-Wallis H test per group — the k-sample rank ANOVA
    (is ANY treatment's distribution shifted?), filling the gap
    between Mann-Whitney (k=2) and Friedman (blocked) in the
    nonparametric family.

    EXACT in the repo's floor discipline: doubled pooled midranks
    from the value support grid (r2(v) = 2*cum_prev + c + 1 — no
    halves), per-treatment rank sums R2_j exact, per-treatment term
    floor(3e6 * R2_j^2 / n_j) on DECIMAL(38,0) (R2_j^2 passes int64),
    then H_ppm = floor(sum / (N(N+1))) - 3e6*(N+1). Tie-corrected
    h_tie_ppm = (H_ppm * (N^3-N)) div (N^3-N - sum(c^3-c)) as one
    more exact integer division (NULL when every value ties).
    Output: (group_key, n, k, h_ppm, h_tie_ppm)."""
    gc = "group_key"
    cells = df.groupBy(
        F.col(group_col).alias(gc), F.col(v_col).alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.select(
        gc,
        "v",
        "c",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    per_tv = df.groupBy(
        F.col(group_col).alias(gc),
        F.col(treat_col).alias("t"),
        F.col(v_col).alias("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c_tv"))
    rj = (
        per_tv.join(ranked.select(gc, "v", "r2"), [gc, "v"])
        .groupBy(gc, "t")
        .agg(
            F.sum(F.expr("c_tv * r2")).cast("bigint").alias("r2_j"),
            F.sum("c_tv").cast("bigint").alias("n_j"),
        )
    )
    terms = rj.select(
        gc,
        "n_j",
        F.expr(
            "CAST((CAST(3000000 AS DECIMAL(38,0)) * r2_j * r2_j)"
            " div CAST(n_j AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        ).alias("t_fp"),
    )
    agg = terms.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.sum("t_fp").alias("s_fp"),
    )
    ties = ranked.groupBy(gc).agg(
        F.sum(F.expr("c * c * c - c")).cast("bigint").alias("tie3")
    )
    return (
        agg.join(ties, gc)
        .select(
            gc,
            "n",
            "k",
            F.expr(
                "CAST(s_fp div (CAST(n AS DECIMAL(38,0)) * (n + 1))"
                " AS BIGINT) - 3000000 * (n + 1)"
            ).alias("h_ppm"),
            "tie3",
        )
        .select(
            gc,
            "n",
            "k",
            F.col("h_ppm").cast("bigint").alias("h_ppm"),
            F.expr(
                "CASE WHEN n * n * n - n - tie3 > 0 THEN"
                " CAST((CAST(h_ppm AS DECIMAL(38,0))"
                " * (CAST(n AS DECIMAL(38,0)) * n * n - n))"
                " div (CAST(n AS DECIMAL(38,0)) * n * n - n - tie3)"
                " AS BIGINT) END"
            ).alias("h_tie_ppm"),
        )
    )


def siegel_slope(
    df: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Siegel repeated-median slope per group — the 50%-breakdown
    robust trend estimator one notch past Theil-Sen (29%): for each
    point i, take the median of its pairwise slopes to every other
    point; the estimate is the median of those per-point medians.

    Both medians are LOWER medians by exact order-statistic selection
    (the q_theil_sen precedent): each slope is ONE IEEE division of
    exact integers (bit-identical cross-engine), selection under the
    total orders (slope, t_j) then (med_i, t_i) — deterministic, no
    float summation anywhere. x-ties contribute no slope. O(n^2)
    slope rows per group — the caller scopes n by pre-aggregating
    the series (the theil_sen monthly-rollup precedent).
    Output: (group_key, n_points, siegel_slope)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    a = base.select(gc, F.col("t").alias("ti"), F.col("v").alias("vi"))
    b = base.select(gc, F.col("t").alias("tj"), F.col("v").alias("vj"))
    slopes = (
        a.join(b, gc)
        .where(F.col("tj") != F.col("ti"))
        .select(
            gc,
            "ti",
            "tj",
            (
                (F.col("vj") - F.col("vi")).cast("double")
                / (F.col("tj") - F.col("ti")).cast("double")
            ).alias("s"),
        )
    )
    w_pt = Window.partitionBy(gc, "ti").orderBy("s", "tj")
    w_pt_all = Window.partitionBy(gc, "ti")
    med_i = (
        slopes.select(
            gc,
            "ti",
            "s",
            F.row_number().over(w_pt).alias("_rn"),
            F.count(F.lit(1)).over(w_pt_all).alias("_m"),
        )
        .where(F.expr("_rn = (_m + 1) div 2"))
        .select(gc, "ti", F.col("s").alias("med_i"))
    )
    w_g = Window.partitionBy(gc).orderBy("med_i", "ti")
    w_g_all = Window.partitionBy(gc)
    picked = (
        med_i.select(
            gc,
            "med_i",
            F.row_number().over(w_g).alias("_rn"),
            F.count(F.lit(1)).over(w_g_all).alias("_m"),
        )
        .where(F.expr("_rn = (_m + 1) div 2"))
        .select(gc, F.col("med_i").alias("siegel_slope"))
    )
    nrow = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    return nrow.join(picked, gc).select(gc, "n_points", "siegel_slope")


def mood_median_test(
    df: DataFrame,
    group_col: str,
    treat_col: str,
    v_col: str,
    id_col: str,
) -> DataFrame:
    """Mood's median test per group — the quick-and-robust k-sample
    location screen: classify each observation strictly ABOVE or
    strictly BELOW the pooled doubled median (exact ties with the
    median are DROPPED — documented convention), then the 2xk
    chi-square of (above, below) per treatment.

    Everything exact: pooled med2 by the doubled rank trick under
    the (v, id) total order; expected counts cross-multiplied —
    per-cell term floor(1e6 * (o*N' - rowtot*coltot)^2 / (N'^2 *
    rowtot*coltot)) accumulated per the ANOVA floor discipline on
    DECIMAL(38,0). NULL chi2 when a margin is empty. Output:
    (group_key, k, n_above, n_below, chi2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(treat_col).alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
        F.col(id_col).alias("id"),
    )
    w_rank = Window.partitionBy(gc).orderBy("v", "id")
    w_all = Window.partitionBy(gc)
    staged = base.select(
        gc,
        "t",
        "v",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    med2 = (
        staged.where(F.expr("_rn * 2 IN (_n, _n + 1, _n + 2)"))
        .groupBy(gc)
        .agg(
            F.expr(
                "CAST(CASE WHEN MAX(_n) % 2 = 1"
                " THEN 2 * MAX(CASE WHEN _rn * 2 = _n + 1 THEN v END)"
                " ELSE MAX(CASE WHEN _rn * 2 = _n THEN v END)"
                " + MAX(CASE WHEN _rn * 2 = _n + 2 THEN v END) END"
                " AS BIGINT)"
            ).alias("med2")
        )
    )
    cls = base.join(med2, gc).select(
        gc,
        "t",
        F.expr("CASE WHEN 2 * v > med2 THEN 1 ELSE 0 END").alias("ab"),
        F.expr("CASE WHEN 2 * v < med2 THEN 1 ELSE 0 END").alias("be"),
    )
    per_t = cls.groupBy(gc, "t").agg(
        F.sum("ab").cast("bigint").alias("a_j"),
        F.sum("be").cast("bigint").alias("b_j"),
    )
    tot = per_t.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("a_j").cast("bigint").alias("n_above"),
        F.sum("b_j").cast("bigint").alias("n_below"),
    )
    # (o - E)^2 / E with E = rowtot*coltot/np cross-multiplies to
    # (o*np - rowtot*coltot)^2 / (np * rowtot * coltot) — ONE np in
    # the divisor (the E in the denominator cancels one of the np^2)
    cell = (
        "CAST((CAST(1000000 AS DECIMAL(38,0))"
        " * ({o} * np - rowtot * {ct}) * ({o} * np - rowtot * {ct}))"
        " div (CAST(np AS DECIMAL(38,0)) * rowtot * {ct})"
        " AS DECIMAL(38,0))"
    )
    joined = per_t.join(tot, gc).select(
        gc,
        "a_j",
        "b_j",
        (F.col("a_j") + F.col("b_j")).cast("bigint").alias("rowtot"),
        F.col("n_above").alias("ca"),
        F.col("n_below").alias("cb"),
        (F.col("n_above") + F.col("n_below")).cast("bigint").alias("np"),
    )
    chi = (
        joined.where((F.col("ca") > 0) & (F.col("cb") > 0) & (F.col("rowtot") > 0))
        .select(
            gc,
            (
                F.expr(cell.format(o="a_j", ct="ca"))
                + F.expr(cell.format(o="b_j", ct="cb"))
            ).alias("_term"),
        )
        .groupBy(gc)
        .agg(F.sum("_term").alias("_chi"))
    )
    return tot.join(chi, gc, "left").select(
        gc,
        "k",
        "n_above",
        "n_below",
        F.expr(
            "CASE WHEN n_above > 0 AND n_below > 0 THEN"
            " CAST(_chi AS BIGINT) END"
        ).alias("chi2_ppm"),
    )


def page_trend_test(
    df: DataFrame,
    group_col: str,
    block_col: str,
    treat_col: str,
    v_col: str,
) -> DataFrame:
    """Page's trend test per group — the ORDERED-alternative
    companion of the Friedman test (as Jonckheere is to
    Kruskal-Wallis, Page is to Friedman): across complete blocks
    that each rank the same k ordered treatments, is there a
    monotone trend?  L = sum_j ord_j * R_j over treatment rank sums.

    Exact in doubled space: within-block midranks r2 = 2*cum_prev +
    c + 1 over the block's value support (ties midranked, no
    halves), treatment order ord_j = dense_rank of the treatment
    value within the group (the caller's ordering column), l2 =
    sum ord_j * R2_j. Under H0 every treatment's expected doubled
    rank is (k+1), so el2 = b * (k+1) * sum(ord_j) exactly.
    trend_ppm = (1e6 * l2) div el2 reads > 1e6 increasing, < 1e6
    decreasing. Complete-block gate (the Friedman rule): blocks with
    count(*) != countDistinct(treatment) != k are DROPPED per group
    and reported (n_blocks_dropped) — a group whose blocks are ALL
    incomplete still emits its row (NULL stats, non-NULL drop
    count): ``dropped`` is the superset of groups and drives a left
    join. Output: (group_key, b, k, l2, el2, trend_ppm,
    n_blocks_dropped)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(block_col).alias("blk"),
        F.col(treat_col).alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    k_per = base.groupBy(gc).agg(
        F.countDistinct("t").cast("bigint").alias("k")
    )
    blk_gate = (
        base.groupBy(gc, "blk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.countDistinct("t").cast("bigint").alias("_nt"),
        )
        .join(k_per, gc)
        .select(
            gc,
            "blk",
            ((F.col("_n") == F.col("k")) & (F.col("_nt") == F.col("k"))).alias(
                "_ok"
            ),
        )
    )
    gated = base.join(blk_gate, [gc, "blk"]).where(F.col("_ok"))
    # within-block doubled midranks over the value support
    cells = gated.groupBy(gc, "blk", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy(gc, "blk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.select(
        gc,
        "blk",
        "v",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    ords = (
        gated.select(gc, "t")
        .distinct()
        .select(
            gc,
            "t",
            F.dense_rank()
            .over(Window.partitionBy(gc).orderBy("t"))
            .cast("bigint")
            .alias("ord"),
        )
    )
    scored = (
        gated.join(ranked, [gc, "blk", "v"])
        .join(ords, [gc, "t"])
        .groupBy(gc)
        .agg(
            F.countDistinct("blk").cast("bigint").alias("b"),
            F.max("ord").cast("bigint").alias("k"),
            F.sum(F.expr("ord * r2")).cast("bigint").alias("l2"),
            F.sum("ord").cast("bigint").alias("_sum_ord"),
        )
        .select(
            gc,
            "b",
            "k",
            "l2",
            F.expr("b * (k + 1) * (_sum_ord div b)").cast("bigint").alias(
                "el2"
            ),
        )
    )
    dropped = blk_gate.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN _ok THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n_blocks_dropped")
    )
    return dropped.join(scored, gc, "left").select(
        gc,
        "b",
        "k",
        "l2",
        "el2",
        F.expr(
            "CASE WHEN el2 > 0 THEN CAST((1000000 * l2) div el2 AS BIGINT)"
            " END"
        ).alias("trend_ppm"),
        "n_blocks_dropped",
    )


def ordinal_association(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Ordinal-association family per group — gamma, Somers' D, and
    Stuart's tau-c from ONE concordance core (the three standard
    contingency-table companions of Kendall's tau-b, each with a
    different tie policy):

        gamma        = (C - D) / (C + D)            (ties ignored)
        Somers' D y|x = (C - D) / (C + D + T_yonly)  (asymmetric —
                        pairs tied on y but NOT x stay in the
                        denominator: y is the DEPENDENT variable)
        tau-c        = 2m(C - D) / (n^2 (m-1))       (grid-size
                        correction, m = min(#x levels, #y levels))

    Same exact machinery as kendall_tau_b (stats.py:2450): rows
    collapse to the 2-D SUPPORT GRID, concordant/discordant mass from
    the cell-pair join under lexicographic order (cells^2 per group,
    cells the caller's bucketing knob), tie terms from the marginals
    with no pair join. All counts exact int64; each statistic is one
    exact integer rational floored to ppm. NULL on zero denominators
    (all pairs tied / single level). Output: (group_key, n,
    n_concordant, n_discordant, gamma_ppm, somers_d_yx_ppm,
    tau_c_ppm)."""
    gc = "group_key"
    cells = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(x_col).cast("bigint").alias("x"),
            F.col(y_col).cast("bigint").alias("y"),
        )
        .groupBy(gc, "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # feeds pair join (x2) + 3 marginals
    )
    a = cells.select(
        gc,
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.col("c").alias("ca"),
    )
    b = cells.select(
        gc,
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("c").alias("cb"),
    )
    pair_mass = (
        a.join(b, gc)
        .where(
            (F.col("xa") < F.col("xb"))
            | ((F.col("xa") == F.col("xb")) & (F.col("ya") < F.col("yb")))
        )
        .groupBy(gc)
        .agg(
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN (xb - xa) * (yb - ya) > 0"
                        " THEN ca * cb ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_concordant"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN (xb - xa) * (yb - ya) < 0"
                        " THEN ca * cb ELSE 0 END"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_discordant"),
        )
    )
    xm = (
        cells.groupBy(gc, "x")
        .agg(F.sum("c").cast("bigint").alias("tx"))
        .groupBy(gc)
        .agg(
            F.sum(F.expr("tx * (tx - 1) div 2")).cast("bigint").alias("txp"),
            F.count(F.lit(1)).cast("bigint").alias("mx"),
        )
    )
    ym = (
        cells.groupBy(gc, "y")
        .agg(F.sum("c").cast("bigint").alias("ty"))
        .groupBy(gc)
        .agg(
            F.sum(F.expr("ty * (ty - 1) div 2")).cast("bigint").alias("typ"),
            F.count(F.lit(1)).cast("bigint").alias("my"),
        )
    )
    both = cells.groupBy(gc).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias("txy"),
    )
    j = (
        both.join(pair_mass, gc, "left")
        .join(xm, gc)
        .join(ym, gc)
        .select(
            gc,
            "n",
            F.coalesce(F.col("n_concordant"), F.lit(0))
            .cast("bigint")
            .alias("n_concordant"),
            F.coalesce(F.col("n_discordant"), F.lit(0))
            .cast("bigint")
            .alias("n_discordant"),
            F.expr("typ - txy").cast("bigint").alias("_ty_only"),
            F.expr("CASE WHEN mx < my THEN mx ELSE my END")
            .cast("bigint")
            .alias("_m"),
        )
    )
    return j.select(
        gc,
        "n",
        "n_concordant",
        "n_discordant",
        F.expr(
            "CASE WHEN n_concordant + n_discordant > 0 THEN"
            " CAST((1000000 * (n_concordant - n_discordant))"
            " div (n_concordant + n_discordant) AS BIGINT) END"
        ).alias("gamma_ppm"),
        F.expr(
            "CASE WHEN n_concordant + n_discordant + _ty_only > 0 THEN"
            " CAST((1000000 * (n_concordant - n_discordant))"
            " div (n_concordant + n_discordant + _ty_only) AS BIGINT) END"
        ).alias("somers_d_yx_ppm"),
        F.expr(
            "CASE WHEN _m >= 2 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * 2 * _m"
            " * (n_concordant - n_discordant))"
            " div (CAST(n AS DECIMAL(38,0)) * n * (_m - 1)) AS BIGINT) END"
        ).alias("tau_c_ppm"),
    )


def quade_test(
    df: DataFrame,
    group_col: str,
    block_col: str,
    treat_col: str,
    v_col: str,
) -> DataFrame:
    """Quade test per group — the blocked k-treatment rank test that
    WEIGHTS blocks by how much signal they carry (Friedman treats a
    block whose values barely differ the same as one with a huge
    spread; Quade ranks blocks by their RANGE and multiplies):

        S_ij = Q_i * (r_ij - (k+1)/2),   Q_i = rank of block i's range
        T3   = (b-1) * B / (A - B),      A = sum S^2, B = (1/b) sum_j S_j^2

    Exact in doubled space: within-block doubled midranks r2 (=2r, so
    r2 - (k+1) is the doubled centered rank), doubled midranks q2 of
    the block ranges across blocks (ties midranked the same way), and
    s = q2 * (r2 - (k+1)) integer. Cross-multiplying kills the 1/b:

        quade_ppm = (1e6 * (b-1) * Bnum) div (b*A - Bnum),
        Bnum = sum_j (sum_i s_ij)^2,  A here = sum s^2 (x b implied)

    on DECIMAL(38,0) (squares of cent-scale products). NULL when
    b*A == Bnum (perfect consistency: T3 is infinite) or everything
    ties (A = 0). Complete-block gate with the left-join drop
    contract (fully-dropped groups emit NULL stats + drop count).
    Output: (group_key, b, k, a2, bnum2, quade_ppm,
    n_blocks_dropped)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(block_col).alias("blk"),
        F.col(treat_col).alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    k_per = base.groupBy(gc).agg(
        F.countDistinct("t").cast("bigint").alias("k")
    )
    blk_gate = (
        base.groupBy(gc, "blk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.countDistinct("t").cast("bigint").alias("_nt"),
        )
        .join(k_per, gc)
        .select(
            gc,
            "blk",
            ((F.col("_n") == F.col("k")) & (F.col("_nt") == F.col("k"))).alias(
                "_ok"
            ),
        )
    )
    gated = base.join(blk_gate, [gc, "blk"]).where(F.col("_ok"))
    # within-block doubled midranks of v over the block's value support
    cells = gated.groupBy(gc, "blk", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy(gc, "blk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.select(
        gc,
        "blk",
        "v",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    # doubled midranks of the block RANGES across blocks in the group
    ranges = gated.groupBy(gc, "blk").agg(
        (F.max("v") - F.min("v")).cast("bigint").alias("rng")
    )
    rng_cells = ranges.groupBy(gc, "rng").agg(
        F.count(F.lit(1)).cast("bigint").alias("rc")
    )
    w_rng = (
        Window.partitionBy(gc)
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rng_ranked = rng_cells.select(
        gc,
        "rng",
        (2 * (F.sum("rc").over(w_rng) - F.col("rc")) + F.col("rc") + 1)
        .cast("bigint")
        .alias("q2"),
    )
    blk_q = ranges.join(rng_ranked, [gc, "rng"]).select(gc, "blk", "q2")
    scored = (
        gated.join(ranked, [gc, "blk", "v"])
        .join(blk_q, [gc, "blk"])
        .join(k_per, gc)
        .select(
            gc,
            "blk",
            "t",
            F.expr("q2 * (r2 - (k + 1))").cast("bigint").alias("s"),
        )
    )
    per_treat = scored.groupBy(gc, "t").agg(
        F.sum("s").cast("bigint").alias("st")
    )
    agg = (
        scored.groupBy(gc)
        .agg(
            F.countDistinct("blk").cast("bigint").alias("b"),
            F.sum(
                F.expr("CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))")
            ).alias("a2"),
        )
        .join(
            per_treat.groupBy(gc).agg(
                F.sum(
                    F.expr(
                        "CAST(st AS DECIMAL(38,0))"
                        " * CAST(st AS DECIMAL(38,0))"
                    )
                ).alias("bnum2"),
                F.count(F.lit(1)).cast("bigint").alias("k"),
            ),
            gc,
        )
    )
    dropped = blk_gate.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN _ok THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n_blocks_dropped")
    )
    return dropped.join(agg, gc, "left").select(
        gc,
        "b",
        "k",
        # s is bounded by (2b)*(2k) so the squares fit comfortably in
        # int64; BIGINT output avoids the DECIMAL-vs-HUGEINT pandas
        # fetch mismatch
        F.col("a2").cast("bigint").alias("a2"),
        F.col("bnum2").cast("bigint").alias("bnum2"),
        F.expr(
            "CASE WHEN b * a2 - bnum2 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * (b - 1) * bnum2)"
            " div (b * a2 - bnum2) AS BIGINT) END"
        ).alias("quade_ppm"),
        "n_blocks_dropped",
    )


def cochran_armitage_trend(
    df: DataFrame,
    group_col: str,
    score_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran-Armitage trend test per group — is a success RATE
    monotone in an ordered category score (dose, year, bucket)? The
    2xk companion of Jonckheere (which handles general ordered
    responses; this is the proportions special case every funnel /
    defect-rate trend question reduces to).

    Fully exact integer chi-square (df=1):

        z2_ppm = (1e6 * N * (N*Ssa - A*Ssn)^2)
                 div (A * (N-A) * (N*Ss2n - Ssn^2))

    with per-score-level aggregates N_i (rows) and a_i (successes),
    Ssa = sum s_i a_i, Ssn = sum s_i N_i, Ss2n = sum s_i^2 N_i,
    A = sum a_i, N total — numerator and denominator computed AND
    cancelled on DECIMAL(38,0) (the round-13 wide-int-cast rule).
    NULL when the denominator is 0 (all success / none / single
    level). Perfect-separation hand pin: two levels 0/10 and 10/10
    give exactly z2 = N = 20e6 ppm. Output: (group_key, n, n_success,
    n_levels, z2_ppm)."""
    gc = "group_key"
    lev = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(score_col).cast("bigint").alias("s"),
            F.col(success_col).cast("boolean").alias("ok"),
        )
        .groupBy(gc, "s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ni"),
            F.sum(F.expr("CASE WHEN ok THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("ai"),
        )
    )
    agg = lev.groupBy(gc).agg(
        F.sum("ni").cast("bigint").alias("n"),
        F.sum("ai").cast("bigint").alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("n_levels"),
        F.sum(F.expr("s * ai")).cast("bigint").alias("ssa"),
        F.sum(F.expr("s * ni")).cast("bigint").alias("ssn"),
        F.sum(F.expr("s * s * ni")).cast("bigint").alias("ss2n"),
    )
    num = (
        "(CAST(n AS DECIMAL(38,0)) * ssa - CAST(a AS DECIMAL(38,0)) * ssn)"
    )
    den = (
        "(CAST(a AS DECIMAL(38,0)) * (n - a)"
        " * (CAST(n AS DECIMAL(38,0)) * ss2n"
        " - CAST(ssn AS DECIMAL(38,0)) * ssn))"
    )
    return agg.select(
        gc,
        "n",
        F.col("a").alias("n_success"),
        "n_levels",
        F.expr(
            f"CASE WHEN {den} > 0 THEN"
            f" CAST((CAST(1000000 AS DECIMAL(38,0)) * n * {num} * {num})"
            f" div {den} AS BIGINT) END"
        ).alias("z2_ppm"),
    )


def mantel_haenszel_or(
    df: DataFrame,
    group_col: str,
    stratum_col: str,
    exposed_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio per group — the stratified
    2x2 estimator that answers "what is the exposure-outcome odds
    ratio CONTROLLING for the stratum?" (years, sites, cohorts),
    immune to Simpson reversals that sink the crude OR.

        OR_MH = sum_strata(a_i d_i / n_i) / sum_strata(b_i c_i / n_i)

    The per-stratum terms are not integers, so this repo's layout
    scales each by 1e6 and floors ONCE per stratum (documented — the
    sketch-family own-layout rule): num = sum (1e6*a*d div n),
    den = sum (1e6*b*c div n), mh_or_ppm = (1e6 * num) div den.
    Everything else exact int64. Strata where n = 0 cannot occur
    (grouped from rows); zero cells contribute zero terms naturally.
    NULL when den = 0. Output: (group_key, n_strata, num_scaled,
    den_scaled, mh_or_ppm)."""
    gc = "group_key"
    cells = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(stratum_col).alias("stratum"),
            F.col(exposed_col).cast("boolean").alias("e"),
            F.col(outcome_col).cast("boolean").alias("o"),
        )
        .groupBy(gc, "stratum")
        .agg(
            F.sum(F.expr("CASE WHEN e AND o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("a"),
            F.sum(F.expr("CASE WHEN e AND NOT o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("b"),
            F.sum(F.expr("CASE WHEN NOT e AND o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("c"),
            F.sum(F.expr("CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("d"),
        )
    )
    agg = cells.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.expr("(1000000 * a * d) div (a + b + c + d)"))
        .cast("bigint")
        .alias("num_scaled"),
        F.sum(F.expr("(1000000 * b * c) div (a + b + c + d)"))
        .cast("bigint")
        .alias("den_scaled"),
    )
    return agg.select(
        gc,
        "n_strata",
        "num_scaled",
        "den_scaled",
        F.expr(
            "CASE WHEN den_scaled > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * num_scaled)"
            " div den_scaled AS BIGINT) END"
        ).alias("mh_or_ppm"),
    )


def assoc_2x2(
    df: DataFrame,
    group_col: str,
    exposed_col: str,
    outcome_col: str,
) -> DataFrame:
    """Crude 2x2 association measures per group — odds ratio,
    relative risk, and Yule's Q, each ONE exact integer rational in
    ppm (the un-stratified companion of mantel_haenszel_or; comparing
    the two per group is the standard Simpson's-paradox audit):

        or_ppm   = 1e6 * a*d div (b*c)
        rr_ppm   = 1e6 * a*(c+d) div (c*(a+b))
        yule_q_ppm = 1e6 * (a*d - b*c) div (a*d + b*c)   (in [-1e6, 1e6])

    NULL on zero denominators. Output: (group_key, a, b, c, d,
    or_ppm, rr_ppm, yule_q_ppm)."""
    gc = "group_key"
    agg = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(exposed_col).cast("boolean").alias("e"),
            F.col(outcome_col).cast("boolean").alias("o"),
        )
        .groupBy(gc)
        .agg(
            F.sum(F.expr("CASE WHEN e AND o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("a"),
            F.sum(F.expr("CASE WHEN e AND NOT o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("b"),
            F.sum(F.expr("CASE WHEN NOT e AND o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("c"),
            F.sum(F.expr("CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("d"),
        )
    )
    return agg.select(
        gc,
        "a",
        "b",
        "c",
        "d",
        F.expr(
            "CASE WHEN b * c > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * a * d)"
            " div (CAST(b AS DECIMAL(38,0)) * c) AS BIGINT) END"
        ).alias("or_ppm"),
        F.expr(
            "CASE WHEN c * (a + b) > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * a * (c + d))"
            " div (CAST(c AS DECIMAL(38,0)) * (a + b)) AS BIGINT) END"
        ).alias("rr_ppm"),
        F.expr(
            "CASE WHEN a * d + b * c > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * (a * d - b * c))"
            " div (CAST(a AS DECIMAL(38,0)) * d"
            " + CAST(b AS DECIMAL(38,0)) * c) AS BIGINT) END"
        ).alias("yule_q_ppm"),
    )


def pettitt_test(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
) -> DataFrame:
    """Pettitt change-point test per group — the nonparametric
    single-change-point locator (the rank cousin of CUSUM: where does
    the distribution of an ordered series shift?). The O(n^2) double
    sum collapses through midranks:

        U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
            = sum_{i<=t} (r_i doubled - (n+1))      [doubled space]

    because sum_j sgn(x_i - x_j) = 2L + c - n = r2_i - (n+1) with the
    repo's doubled midranks r2 = 2*cum_prev + c + 1, and pairs inside
    the prefix cancel. So U2_t (doubled U) is ONE prefix sum over the
    ordered series; K = max_{1<=t<n} |U2_t| with the argmax reported
    (earliest t on ties — the change point). Cost: one rank join +
    two windows per group, O(n log n). k2_ppm normalizes by the
    distinct-pair count n(n-1)/2 doubled: 1e6*K div (n*(n-1)). NULL
    stats for n < 2. Output: (group_key, n, t_at_max, u2_at_max, k2,
    k2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.select(
        gc,
        "v",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    nrow = base.groupBy(gc).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_pre = (
        Window.partitionBy(gc)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = (
        base.join(ranked, [gc, "v"])
        .join(nrow, gc)
        .select(
            gc,
            "t",
            "n",
            F.sum(F.expr("r2 - (n + 1)")).over(w_pre)
            .cast("bigint")
            .alias("u2"),
            F.row_number()
            .over(Window.partitionBy(gc).orderBy("t"))
            .cast("bigint")
            .alias("_pos"),
        )
        .where(F.col("_pos") < F.col("n"))  # t ranges 1..n-1
    )
    w_pick = Window.partitionBy(gc).orderBy(
        F.abs(F.col("u2")).desc(), F.col("t").asc()
    )
    best = (
        pref.select(
            gc,
            "n",
            "t",
            "u2",
            F.row_number().over(w_pick).alias("_rk"),
        )
        .where(F.col("_rk") == 1)
        .select(
            gc,
            "n",
            F.col("t").alias("t_at_max"),
            F.col("u2").alias("u2_at_max"),
            F.abs(F.col("u2")).cast("bigint").alias("k2"),
        )
    )
    return nrow.join(best.drop("n"), gc, "left").select(
        gc,
        "n",
        "t_at_max",
        "u2_at_max",
        "k2",
        F.expr(
            "CASE WHEN n >= 2 THEN"
            " CAST((1000000 * k2) div (n * (n - 1)) AS BIGINT) END"
        ).alias("k2_ppm"),
    )


def rsi_sma(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    period: int = 14,
) -> DataFrame:
    """Relative Strength Index per group, SMA variant — the classic
    momentum oscillator on its simple-moving-average definition
    (Wilder's smoothing is a recursive fold whose rational state
    grows without bound; the SMA variant is the standard
    equal-weight alternative and is ONE exact integer rational):

        rsi_ppm = 1e6 * sum(gains) div (sum(gains) + sum(losses))

    over the trailing ``period`` first differences. Windows are
    gap-guarded the round-13 seasonal way, strengthened: a row's own
    difference must step exactly one index (t - lag(t) = 1 — a diff
    computed across a missing month is wrong even when the WINDOW
    looks dense), and the trailing frame must hold exactly
    ``period`` diffs spanning exactly period-1 indices. Incomplete
    or gapped windows are not emitted. NULL rsi when the window is
    flat (gains = losses = 0). Output: (group_key, t, sum_gain,
    sum_loss, rsi_ppm) for every complete window."""
    gc = "group_key"
    w_ord = Window.partitionBy(gc).orderBy("t")
    d = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(order_col).cast("bigint").alias("t"),
            F.col(v_col).cast("bigint").alias("v"),
        )
        .select(
            gc,
            "t",
            (F.col("v") - F.lag("v").over(w_ord)).alias("diff"),
            (F.col("t") - F.lag("t").over(w_ord) == 1).alias("step_ok"),
        )
        .where(F.col("diff").isNotNull())
    )
    wp = (
        Window.partitionBy(gc)
        .orderBy("t")
        .rowsBetween(-(period - 1), Window.currentRow)
    )
    framed = d.select(
        gc,
        "t",
        F.sum(F.expr("CASE WHEN diff > 0 THEN diff ELSE 0 END"))
        .over(wp)
        .cast("bigint")
        .alias("sum_gain"),
        F.sum(F.expr("CASE WHEN diff < 0 THEN -diff ELSE 0 END"))
        .over(wp)
        .cast("bigint")
        .alias("sum_loss"),
        F.count(F.lit(1)).over(wp).alias("_cnt"),
        F.sum(F.expr("CASE WHEN step_ok THEN 0 ELSE 1 END"))
        .over(wp)
        .alias("_gaps"),
        (F.max("t").over(wp) - F.min("t").over(wp)).alias("_span"),
    )
    return framed.where(
        (F.col("_cnt") == period)
        & (F.col("_gaps") == 0)
        & (F.col("_span") == period - 1)
    ).select(
        gc,
        "t",
        "sum_gain",
        "sum_loss",
        F.expr(
            "CASE WHEN sum_gain + sum_loss > 0 THEN"
            " CAST((1000000 * sum_gain) div (sum_gain + sum_loss)"
            " AS BIGINT) END"
        ).alias("rsi_ppm"),
    )


def max_drawdown(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
) -> DataFrame:
    """Maximum drawdown per group — the peak-to-trough risk statistic
    (how far below its running high has the series fallen, at
    worst?), entirely in exact integer space:

        peak_t = max(v) over rows <= t      (running peak)
        dd_t   = peak_t - v_t               (>= 0 cents)
        max_dd = max_t dd_t, reported at its EARLIEST t with the
                 peak in force there; dd_ppm = 1e6 * max_dd div peak

    One ordered window per group + one argmax window — no fold, no
    recursion (the drawdown needs only the running max, the round-9
    closed-form lesson's easy sibling). dd_ppm NULL when the peak at
    the trough is <= 0 (ppm of a nonpositive base is meaningless).
    Output: (group_key, n, max_drawdown, t_at_max, peak_at_trough,
    dd_ppm)."""
    gc = "group_key"
    w_run = (
        Window.partitionBy(gc)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    dd = base.select(
        gc,
        "t",
        F.max("v").over(w_run).cast("bigint").alias("peak"),
        (F.max("v").over(w_run) - F.col("v")).cast("bigint").alias("dd"),
    )
    w_pick = Window.partitionBy(gc).orderBy(
        F.col("dd").desc(), F.col("t").asc()
    )
    best = (
        dd.select(
            gc,
            "t",
            "peak",
            "dd",
            F.row_number().over(w_pick).alias("_rk"),
        )
        .where(F.col("_rk") == 1)
        .select(
            gc,
            F.col("dd").alias("max_drawdown"),
            F.col("t").alias("t_at_max"),
            F.col("peak").alias("peak_at_trough"),
        )
    )
    nrow = base.groupBy(gc).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return nrow.join(best, gc).select(
        gc,
        "n",
        "max_drawdown",
        "t_at_max",
        "peak_at_trough",
        F.expr(
            "CASE WHEN peak_at_trough > 0 THEN"
            " CAST((1000000 * max_drawdown) div peak_at_trough AS BIGINT)"
            " END"
        ).alias("dd_ppm"),
    )


def ansari_bradley(
    df: DataFrame,
    group_col: str,
    sample_col: str,
    v_col: str,
) -> DataFrame:
    """Ansari-Bradley scale test per group — do two samples differ in
    DISPERSION around a common center? (The rank companion of
    Levene/Brown-Forsythe: ranks assigned from BOTH ends inward, so
    extreme values get SMALL scores and a low-scoring sample is the
    wider one.)

    Doubled-midrank exact: pooled r2 = 2*cum_prev + c + 1 over the
    value support, score2 = min(r2, 2(n+1) - r2) (symmetric fold),
    W2 = sum of sample X's scores. Because scores are exchangeable
    under H0, E[W2] = m * T2 / n with T2 the pooled score total — so
    the report is one exact rational:

        ab_ppm = (1e6 * n * w2) div (m * t2)     (1e6 = null value;
        below 1e6 = sample X holds the extreme ranks = wider)

    NULL when m = 0 or m = n (one-sample groups) or t2 = 0. Output:
    (group_key, n, m, w2, t2, ab_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(sample_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nrow = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("m"),
    )
    ranked = cells.select(
        gc,
        "v",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    scored = (
        base.join(ranked, [gc, "v"])
        .join(nrow, gc)
        .select(
            gc,
            "in_x",
            F.expr(
                "CASE WHEN r2 < 2 * (n + 1) - r2 THEN r2"
                " ELSE 2 * (n + 1) - r2 END"
            )
            .cast("bigint")
            .alias("score2"),
        )
    )
    agg = scored.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN in_x THEN score2 ELSE 0 END"))
        .cast("bigint")
        .alias("w2"),
        F.sum("score2").cast("bigint").alias("t2"),
    )
    return nrow.join(agg, gc).select(
        gc,
        "n",
        "m",
        "w2",
        "t2",
        F.expr(
            "CASE WHEN m > 0 AND m < n AND t2 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * n * w2)"
            " div (CAST(m AS DECIMAL(38,0)) * t2) AS BIGINT) END"
        ).alias("ab_ppm"),
    )


def ljung_box(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    max_lag: int = 12,
) -> DataFrame:
    """Ljung-Box portmanteau per group — is a series white noise, or
    does SOME autocorrelation up to ``max_lag`` survive? (The
    is-there-anything-left diagnostic run after every forecast fit.)

    This repo's floored-integer layout (transcendental-free, own
    layout documented like the sketch family): centered covariances
    are computed in the exact n^2-scaled integer space

        c_k = sum_t (n*x_t - S)(n*x_{t-k} - S)     [exact int64]

    per-lag autocorrelations floored ONCE at 1e4 resolution
    (r_k interacts quadratically — pp10k keeps the squares in
    int64), then

        q_ppm = sum_k (n*(n+2) * r_pp10k(k)^2) div ((n-k) * 100)

    — each lag's term floored once more. Against the exact-real
    statistic the double floor costs < 1e-3 relative; the layout is
    the statistic, bit-reproducible in both engines. Series must be
    gapless per the contiguity rule: groups whose order column is
    not dense 0..n-1-contiguous (max - min != n - 1) emit NULL.
    Output: (group_key, n, c0, q_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("x"),
    )
    tot = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        (F.max("t") - F.min("t")).cast("bigint").alias("span"),
    )
    w = Window.partitionBy(gc).orderBy("t")
    lagged = base.join(tot, gc).select(
        gc,
        "n",
        "s",
        "span",
        (F.col("n") * F.col("x") - F.col("s")).alias("d0"),
        *[
            (
                F.col("n") * F.lag("x", k).over(w) - F.col("s")
            ).alias(f"d{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    sums = lagged.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.max("span").alias("span"),
        F.sum(F.expr("d0 * d0")).cast("bigint").alias("c0"),
        *[
            F.sum(F.expr(f"d0 * d{k}")).cast("bigint").alias(f"c{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    r_cols = [
        F.expr(
            f"CASE WHEN c0 > 0 THEN (10000 * c{k}) div c0 ELSE 0 END"
        ).alias(f"r{k}")
        for k in range(1, max_lag + 1)
    ]
    scored = sums.select(gc, "n", "span", "c0", *r_cols)
    q_expr = " + ".join(
        f"(n * (n + 2) * r{k} * r{k}) div ((n - {k}) * 100)"
        for k in range(1, max_lag + 1)
    )
    return scored.select(
        gc,
        "n",
        "c0",
        F.expr(
            f"CASE WHEN n > {max_lag} AND span = n - 1 THEN"
            f" CAST({q_expr} AS BIGINT) END"
        ).alias("q_ppm"),
    )


def durbin_watson(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
) -> DataFrame:
    """Durbin-Watson statistic per group on EXACT integer-scaled OLS
    residuals — the first-order serial-correlation diagnostic of a
    per-group linear trend fit (DW near 2 = independent residuals,
    near 0 = positive autocorrelation, near 4 = negative):

        DW = sum_t (e_t - e_{t-1})^2 / sum_t e_t^2

    The OLS residual is rational; multiplying by the model
    denominator D = n*Stt - St^2 makes it integer:

        E_t = D*y_t - (D*ybar + beta_num*(t - tbar))*...    — spelled
        as E_t = n*(D*y_t) - n*A - B*(n*t - St)   with
        A = D*Sy div-free: E_t = D*(n*y_t - Sy) - B*(n*t - St),
        B = n*Sty - St*Sy    (the slope numerator)

    — every term exact on DECIMAL(38,0); DW is scale-invariant in
    the residuals so the D/n factors cancel:

        dw_ppm = (1e6 * sum (E_t - E_{t-1})^2) div (sum E_t^2)

    Gapless-series gate (span = n - 1, the contiguity rule). NULL
    when residuals are all zero (perfect fit) or n < 3. Output:
    (group_key, n, dw_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("y"),
    )
    mom = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("stt"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * y")).alias("sty"),
        (F.max("t") - F.min("t")).cast("bigint").alias("span"),
    )
    w = Window.partitionBy(gc).orderBy("t")
    resid = base.join(mom, gc).select(
        gc,
        "n",
        "span",
        "t",
        F.expr(
            "(CAST(n AS DECIMAL(38,0)) * stt"
            " - CAST(st AS DECIMAL(38,0)) * st)"
            " * (CAST(n AS DECIMAL(38,0)) * y - sy)"
            " - (CAST(n AS DECIMAL(38,0)) * sty"
            "    - CAST(st AS DECIMAL(38,0)) * sy)"
            " * (CAST(n AS DECIMAL(38,0)) * t - st)"
        ).alias("e"),
    )
    diffed = resid.select(
        gc,
        "n",
        "span",
        "e",
        (F.col("e") - F.lag("e").over(w)).alias("de"),
    )
    agg = diffed.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.max("span").alias("span"),
        F.sum(F.expr("e * e")).alias("see"),
        F.sum(F.expr("de * de")).alias("sdd"),
    )
    return agg.select(
        gc,
        "n",
        F.expr(
            "CASE WHEN n >= 3 AND span = n - 1 AND see > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * sdd)"
            " div see AS BIGINT) END"
        ).alias("dw_ppm"),
    )


def bartels_rank_test(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
) -> DataFrame:
    """Bartels rank von Neumann ratio per group — the rank-based
    randomness test (the nonparametric companion of Durbin-Watson:
    is a sequence exchangeable, or serially dependent?):

        RVN = sum_t (r_t - r_{t+1})^2 / sum_t (r_t - rbar)^2

    Entirely in doubled-midrank space: r2 = 2*cum_prev + c + 1 over
    the value support, rbar2 = n + 1 exactly (doubled mean rank even
    under ties), both sums exact int64; near 2e6 ppm = random, near
    0 = trending, near 4e6 = oscillating. Gapless gate (span =
    n - 1). NULL when the denominator is 0 (all values tied) or
    n < 3. Output: (group_key, n, num2, den2, rvn_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.select(
        gc,
        "v",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    nrow = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.max("t") - F.min("t")).cast("bigint").alias("span"),
    )
    w = Window.partitionBy(gc).orderBy("t")
    seq = (
        base.join(ranked, [gc, "v"])
        .join(nrow, gc)
        .select(
            gc,
            "n",
            "span",
            "t",
            "r2",
            (F.col("r2") - F.lead("r2").over(w)).alias("dr"),
        )
    )
    agg = seq.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.max("span").alias("span"),
        F.sum(F.expr("dr * dr")).cast("bigint").alias("num2"),
        F.sum(F.expr("(r2 - (n + 1)) * (r2 - (n + 1))"))
        .cast("bigint")
        .alias("den2"),
    )
    return agg.select(
        gc,
        "n",
        "num2",
        "den2",
        F.expr(
            "CASE WHEN n >= 3 AND span = n - 1 AND den2 > 0 THEN"
            " CAST((1000000 * num2) div den2 AS BIGINT) END"
        ).alias("rvn_ppm"),
    )


def seasonal_sen_slope(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """Seasonal Sen slope per group — the Theil-Sen trend estimator
    restricted to WITHIN-SEASON pairs (the seasonal-Kendall
    companion: January compares to other Januaries, never to July,
    so a strong seasonal cycle cannot masquerade as trend).

    slope = LOWER median over all within-season pairwise slopes
    (v_j - v_i)/(t_j - t_i), t_j > t_i, season = t mod ``period``.
    Each slope is ONE IEEE division of exact integers (bit-identical
    cross-engine); selection under the total order (slope, season,
    t_i, t_j) — deterministic, no float summation (the q_theil_sen /
    q_siegel_slope discipline). O(sum_s n_s^2) pair rows — with
    monthly data n_s is the YEAR count, so the blowup is years^2 x
    12, tiny at any SF. Output: (group_key, n_points, n_pairs,
    sen_slope)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
        (F.col(order_col).cast("bigint") % period).alias("season"),
    )
    a = base.select(
        gc, "season", F.col("t").alias("ti"), F.col("v").alias("vi")
    )
    b = base.select(
        gc, "season", F.col("t").alias("tj"), F.col("v").alias("vj")
    )
    slopes = (
        a.join(b, [gc, "season"])
        .where(F.col("tj") > F.col("ti"))
        .select(
            gc,
            "season",
            "ti",
            "tj",
            (
                (F.col("vj") - F.col("vi")).cast("double")
                / (F.col("tj") - F.col("ti")).cast("double")
            ).alias("s"),
        )
    )
    nrow = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    w = Window.partitionBy(gc).orderBy("s", "season", "ti", "tj")
    w_all = Window.partitionBy(gc)
    picked = (
        slopes.select(
            gc,
            "s",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(w_all).alias("_m"),
        )
        .where(F.expr("_rn = (_m + 1) div 2"))
        .select(
            gc,
            F.col("_m").cast("bigint").alias("n_pairs"),
            F.col("s").alias("sen_slope"),
        )
    )
    return nrow.join(picked, gc, "left").select(
        gc, "n_points", "n_pairs", "sen_slope"
    )


def forecast_wape_bias(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """WAPE and forecast bias of the seasonal-naive forecast per
    group — the two standard demand-forecast report numbers next to
    MASE (q_mase_eval): WAPE weights errors by actuals (immune to
    the per-point percentage blowups MAPE suffers on small
    denominators), bias keeps the SIGN (a forecast can have great
    WAPE while systematically over-shipping):

        wape_ppm = (1e6 * sum|y - yhat|) div (sum|y|)
        bias_ppm = (1e6 * sum(y - yhat)) div (sum|y|)   (signed)

    with yhat_t = y_{t-period} (the standard seasonal-naive
    baseline), evaluated only where the lag exists AND steps exactly
    ``period`` indices (the contiguity rule at the lag level). All
    exact int64. NULL when sum|y| = 0 or no evaluable points.
    Output: (group_key, n_eval, sum_abs_err, sum_abs_y, wape_ppm,
    bias_ppm)."""
    gc = "group_key"
    w = Window.partitionBy(gc).orderBy("t")
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("y"),
    )
    lagged = base.select(
        gc,
        "t",
        "y",
        F.lag("y", period).over(w).alias("yhat"),
        (F.col("t") - F.lag("t", period).over(w) == period).alias(
            "_step_ok"
        ),
    ).where(F.col("yhat").isNotNull() & F.col("_step_ok"))
    agg = lagged.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.expr("abs(y - yhat)")).cast("bigint").alias("sum_abs_err"),
        F.sum(F.expr("abs(y)")).cast("bigint").alias("sum_abs_y"),
        F.sum(F.expr("y - yhat")).cast("bigint").alias("_sum_err"),
    )
    return agg.select(
        gc,
        "n_eval",
        "sum_abs_err",
        "sum_abs_y",
        F.expr(
            "CASE WHEN sum_abs_y > 0 THEN"
            " CAST((1000000 * sum_abs_err) div sum_abs_y AS BIGINT) END"
        ).alias("wape_ppm"),
        F.expr(
            "CASE WHEN sum_abs_y > 0 THEN"
            " CAST((1000000 * _sum_err) div sum_abs_y AS BIGINT) END"
        ).alias("bias_ppm"),
    )


# ---------------------------------------------------------------------------
# Round 15 — randomness / trend / reliability / outlier diagnostics,
# all exact-integer parity (no transcendentals in compared columns).
# ---------------------------------------------------------------------------


def turning_points_test(
    df: DataFrame, group_col: str, order_col: str, v_col: str
) -> DataFrame:
    """Turning-points test of randomness per group — counts strict
    local maxima/minima in the ordered series; an i.i.d. sequence has
    E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90, so too few turns means
    trend/smoothness, too many means oscillation (the Bartels RVN
    companion that looks at SHAPE rather than rank distances).

    Exact-integer form: with d = 3T - 2(n-2) (3x the deviation from
    expectation), z^2 = (T-E)^2/V = 10*d^2/(16n-29), one floor:

        z2_ppm = (1e6 * 10 * d^2) div (16n - 29)

    Ties with a neighbor never count as a turn (strict inequalities);
    a gap in the index invalidates the series-shape premise, so stats
    are NULL unless the group is gapless (max t - min t = n - 1, the
    round-13 span rule) with n >= 3 — every group still emits a row
    (the drop-reporting convention). Output: (group_key, n, gapless,
    n_turning, expected_x3, z2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = Window.partitionBy(gc).orderBy("t")
    marked = base.select(
        gc,
        "t",
        "v",
        F.lag("v").over(w).alias("_pv"),
        F.lead("v").over(w).alias("_nv"),
    )
    agg = marked.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.max("t") - F.min("t")).cast("bigint").alias("_span"),
        F.sum(
            F.expr(
                "CASE WHEN _pv IS NOT NULL AND _nv IS NOT NULL"
                " AND ((v > _pv AND v > _nv) OR (v < _pv AND v < _nv))"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("_t"),
    )
    return agg.select(
        gc,
        "n",
        (F.col("_span") == F.col("n") - 1).alias("gapless"),
        F.expr(
            "CASE WHEN _span = n - 1 AND n >= 3 THEN _t END"
        ).alias("n_turning"),
        F.expr(
            "CASE WHEN _span = n - 1 AND n >= 3 THEN 2 * (n - 2) END"
        ).alias("expected_x3"),
        F.expr(
            "CASE WHEN _span = n - 1 AND n >= 3 THEN"
            " CAST((1000000 * 10 * (3 * _t - 2 * (n - 2))"
            " * (3 * _t - 2 * (n - 2))) div (16 * n - 29) AS BIGINT) END"
        ).alias("z2_ppm"),
    )


def cox_stuart_test(
    df: DataFrame, group_col: str, order_col: str, v_col: str
) -> DataFrame:
    """Cox-Stuart trend test per group — the sign test applied to
    (x_i, x_{i+ceil(n/2)}) pairs: a monotone trend makes one sign
    dominate, while any exchangeable series splits ~50/50. Rank-based
    pairing (row_number under the (t) total order), so index gaps
    only coarsen the half-split, never break determinism.

    All counting exact int64; the summary effect is one floor:

        margin_ppm = (1e6 * (n_pos - n_neg)) div (n_pos + n_neg)

    (NULL when every pair ties — zero information). n_pos counts
    later-half values ABOVE their first-half partner (positive =
    upward trend). Output: (group_key, n, n_pairs, n_pos, n_neg,
    n_tie, margin_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = Window.partitionBy(gc).orderBy("t")
    wn = Window.partitionBy(gc)
    rn = base.select(
        gc,
        "v",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    a = rn.where(
        F.col("rn") <= F.expr("n - CAST((n + 1) div 2 AS BIGINT)")
    ).select(
        gc,
        "n",
        (F.col("rn") + F.expr("CAST((n + 1) div 2 AS BIGINT)")).alias(
            "_rn2"
        ),
        F.col("v").alias("vi"),
    )
    b = rn.select(gc, F.col("rn").alias("_rn2"), F.col("v").alias("vj"))
    paired = a.join(b, [gc, "_rn2"])
    agg = paired.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN vj > vi THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.expr("CASE WHEN vj < vi THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.expr("CASE WHEN vj = vi THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_tie"),
    )
    return agg.select(
        gc,
        "n",
        "n_pairs",
        "n_pos",
        "n_neg",
        "n_tie",
        F.expr(
            "CASE WHEN n_pos + n_neg > 0 THEN"
            " CAST((1000000 * (n_pos - n_neg)) div (n_pos + n_neg)"
            " AS BIGINT) END"
        ).alias("margin_ppm"),
    )


def kendall_w(
    df: DataFrame,
    group_col: str,
    judge_col: str,
    item_col: str,
    v_col: str,
) -> DataFrame:
    """Kendall's coefficient of concordance W per group — do m judges
    agree on the ranking of n items? (The multi-rater generalization
    the repo's pairwise rank statistics can't give: W = 1 means every
    judge ranks the items identically, W = 0 means no agreement.)

    Exact-integer core via DOUBLED midranks (the Ansari-Bradley
    device): within each judge r2 = 2*rank is integer even under
    ties, each judge's r2 sums to n(n+1) exactly, so the item totals
    R2_i have exact integer mean m(n+1) and

        S2x = sum_i (R2_i - m(n+1))^2            (= 4*S, exact)
        W   = 3*S2x / (m^2(n^3 - n) - m*T),      T = sum(t^3 - t)

    with T the standard tie correction summed over tie groups of
    every judge — one floor to w_ppm, NULL when the denominator is
    <= 0 (all values tied). Judges missing any of the group's items
    are dropped COMPLETELY (the Friedman complete-block gate) and
    counted; every group emits a row. Output: (group_key, m_judges,
    k_items, n_judges_dropped, s2x, tie_t, w_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(judge_col).alias("judge"),
        F.col(item_col).alias("item"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    k_per = base.groupBy(gc).agg(
        F.countDistinct("item").cast("bigint").alias("k")
    )
    gate = (
        base.join(k_per, gc)
        .groupBy(gc, "judge")
        .agg(
            (
                (F.count(F.lit(1)) == F.max("k"))
                & (F.countDistinct("item") == F.max("k"))
            ).alias("ok")
        )
    )
    gated = base.join(gate, [gc, "judge"]).where(F.col("ok"))
    # doubled midranks within (group, judge) over value cells
    cells = gated.groupBy(gc, "judge", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy(gc, "judge")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cells.select(
        gc,
        "judge",
        "v",
        "c",
        (2 * (F.sum("c").over(w_cum) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    scored = gated.join(ranked, [gc, "judge", "v"]).select(
        gc, "judge", "item", "r2"
    )
    # per-judge tie correction on raw tie-group sizes
    ties = cells.groupBy(gc).agg(
        F.sum(F.expr("c * c * c - c")).cast("bigint").alias("tie_t")
    )
    totals = scored.groupBy(gc, "item").agg(
        F.sum("r2").cast("bigint").alias("r2i"),
        F.countDistinct("judge").cast("bigint").alias("m"),
    )
    dropped = gate.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN ok THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n_judges_dropped")
    )
    # S2x needs the item count first; two-step: join k back in
    s2x = (
        totals.join(
            totals.groupBy(gc).agg(
                F.count(F.lit(1)).cast("bigint").alias("k_items"),
                F.max("m").cast("bigint").alias("m_judges"),
            ),
            gc,
        )
        .select(
            gc,
            "k_items",
            "m_judges",
            F.expr(
                "(r2i - m_judges * (k_items + 1))"
                " * (r2i - m_judges * (k_items + 1))"
            ).alias("_d2"),
        )
        .groupBy(gc, "k_items", "m_judges")
        .agg(F.sum("_d2").cast("bigint").alias("s2x"))
    )
    return (
        dropped.join(s2x, gc, "left")
        .join(ties, gc, "left")
        .select(
            gc,
            "m_judges",
            "k_items",
            "n_judges_dropped",
            "s2x",
            F.coalesce(F.col("tie_t"), F.lit(0))
            .cast("bigint")
            .alias("tie_t"),
            F.expr(
                "CASE WHEN m_judges >= 2 AND k_items >= 2 AND"
                " m_judges * m_judges * (k_items * k_items * k_items"
                " - k_items) - m_judges * coalesce(tie_t, 0) > 0 THEN"
                " CAST((CAST(1000000 AS DECIMAL(38,0)) * 3 * s2x)"
                " div (m_judges * m_judges * (k_items * k_items * k_items"
                " - k_items) - m_judges * coalesce(tie_t, 0))"
                " AS BIGINT) END"
            ).alias("w_ppm"),
        )
    )


def icc_oneway(
    df: DataFrame, group_col: str, target_col: str, v_col: str
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1) per group
    — what fraction of total variance is BETWEEN targets? (The
    reliability companion to Cronbach's alpha when the raters are
    interchangeable rather than fixed items.)

    One exact integer rational: with n targets x k measurements,
    T_i = target sums, G = grand sum, A = sum T_i^2, B = sum v^2,

        P = n*A - G^2        (= nk * SSB, exact)
        Q = n*(k*B - A)      (= nk * SSW, exact)
        ICC = (n(k-1)P - (n-1)Q) / ((k-1)(nP + (n-1)Q))

    — numerator and denominator both DECIMAL(38,0), one floor to
    icc_ppm, NULL when the denominator is <= 0 or n < 2 / k < 2.
    Balance is ENFORCED: k = the group's maximum per-target count,
    targets with fewer measurements are dropped and counted (the
    complete-unit gate + drop-reporting convention). Feed n^2-scaled
    money in 1000-dollar units (the round-14 unit-scaling rule: this
    squares n-scaled sums). Output: (group_key, n_targets, k,
    n_targets_dropped, icc_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(target_col).alias("target"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    per_t = base.groupBy(gc, "target").agg(
        F.count(F.lit(1)).cast("bigint").alias("ki"),
        F.sum("v").cast("bigint").alias("ti"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("qi"),
    )
    kmax = per_t.groupBy(gc).agg(F.max("ki").cast("bigint").alias("k"))
    flagged = per_t.join(kmax, gc)
    agg = flagged.groupBy(gc).agg(
        F.max("k").cast("bigint").alias("k"),
        F.sum(F.expr("CASE WHEN ki = k THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_targets"),
        F.sum(F.expr("CASE WHEN ki = k THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n_targets_dropped"),
        F.sum(F.expr("CASE WHEN ki = k THEN ti ELSE 0 END"))
        .cast("bigint")
        .alias("_g"),
        F.sum(
            F.expr(
                "CASE WHEN ki = k THEN CAST(ti AS DECIMAL(38,0)) * ti"
                " ELSE 0 END"
            )
        ).alias("_a"),
        F.sum(F.expr("CASE WHEN ki = k THEN qi ELSE 0 END")).alias("_b"),
    )
    return agg.select(
        gc,
        "n_targets",
        "k",
        "n_targets_dropped",
        F.expr(
            "CASE WHEN n_targets >= 2 AND k >= 2 AND"
            " (k - 1) * (n_targets * (n_targets * _a"
            " - CAST(_g AS DECIMAL(38,0)) * _g)"
            " + (n_targets - 1) * (n_targets * (k * _b - _a))) > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (n_targets * (k - 1) * (n_targets * _a"
            " - CAST(_g AS DECIMAL(38,0)) * _g)"
            " - (n_targets - 1) * (n_targets * (k * _b - _a))))"
            " div ((k - 1) * (n_targets * (n_targets * _a"
            " - CAST(_g AS DECIMAL(38,0)) * _g)"
            " + (n_targets - 1) * (n_targets * (k * _b - _a))))"
            " AS BIGINT) END"
        ).alias("icc_ppm"),
    )


def theil_u2_sq(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """Squared Theil's U2 per group — does the seasonal-naive model
    beat the no-change forecast? U2 < 1 means the model adds value
    over simply predicting y_{t-1}; the repo reports U2^2 (the ratio
    of summed squared errors) because the square root adds nothing
    to the comparison against 1 and the ratio is one exact integer
    floor:

        u2sq_ppm = (1e6 * sum (y_t - y_{t-period})^2)
                   div (sum (y_t - y_{t-1})^2)

    evaluated only at points where BOTH lags step exactly right (the
    contiguity rule at the lag level) — same eval set for numerator
    and denominator, the fair comparison. Feed 1000-dollar units (the
    round-14 unit-scaling rule: squared diffs of cent-scale monthlies
    overflow int64 sums at sf10). Output: (group_key, n_eval, num_ss,
    den_ss, u2sq_ppm)."""
    gc = "group_key"
    w = Window.partitionBy(gc).orderBy("t")
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("y"),
    )
    lagged = base.select(
        gc,
        "t",
        "y",
        F.lag("y", period).over(w).alias("_ys"),
        F.lag("y", 1).over(w).alias("_y1"),
        (F.col("t") - F.lag("t", period).over(w) == period).alias("_oks"),
        (F.col("t") - F.lag("t", 1).over(w) == 1).alias("_ok1"),
    ).where(
        F.col("_ys").isNotNull()
        & F.col("_y1").isNotNull()
        & F.col("_oks")
        & F.col("_ok1")
    )
    agg = lagged.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.expr("(y - _ys) * (y - _ys)"))
        .cast("bigint")
        .alias("num_ss"),
        F.sum(F.expr("(y - _y1) * (y - _y1)"))
        .cast("bigint")
        .alias("den_ss"),
    )
    return agg.select(
        gc,
        "n_eval",
        "num_ss",
        "den_ss",
        F.expr(
            "CASE WHEN den_ss > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * num_ss)"
            " div den_ss AS BIGINT) END"
        ).alias("u2sq_ppm"),
    )


def tracking_signal(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """Forecast tracking signal per group — the demand-planning
    monitor that fires when a forecast drifts one-sided: signed error
    mass over absolute error mass, plus the PEAK of the running error
    cusum (a forecast can end balanced after a long biased excursion;
    the peak catches it).

        ts_ppm   = (1e6 * sum e) div (sum |e|)
        peak_ppm = (1e6 * max_t |cusum_t(e)|) div (sum |e|)

    with e_t = y_t - y_{t-period} (seasonal-naive, contiguity-gated
    at the lag level). The peak needs no fold: max |cusum| =
    greatest(max running-sum, -min running-sum) — two running-window
    extremes over exact int64 prefix sums (the round-9 closed-form
    discipline). NULL when sum|e| = 0. Output: (group_key, n_eval,
    sum_err, sum_abs_err, ts_ppm, peak_ppm)."""
    gc = "group_key"
    w = Window.partitionBy(gc).orderBy("t")
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("y"),
    )
    lagged = base.select(
        gc,
        "t",
        F.expr("y").alias("y"),
        F.lag("y", period).over(w).alias("_ys"),
        (F.col("t") - F.lag("t", period).over(w) == period).alias("_ok"),
    ).where(F.col("_ys").isNotNull() & F.col("_ok"))
    w_run = (
        Window.partitionBy(gc)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = lagged.select(
        gc,
        (F.col("y") - F.col("_ys")).cast("bigint").alias("e"),
        F.sum(F.col("y") - F.col("_ys")).over(w_run)
        .cast("bigint")
        .alias("_cus"),
    )
    agg = run.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum("e").cast("bigint").alias("sum_err"),
        F.sum(F.expr("abs(e)")).cast("bigint").alias("sum_abs_err"),
        F.max("_cus").cast("bigint").alias("_mx"),
        F.min("_cus").cast("bigint").alias("_mn"),
    )
    return agg.select(
        gc,
        "n_eval",
        "sum_err",
        "sum_abs_err",
        F.expr(
            "CASE WHEN sum_abs_err > 0 THEN"
            " CAST((1000000 * sum_err) div sum_abs_err AS BIGINT) END"
        ).alias("ts_ppm"),
        F.expr(
            "CASE WHEN sum_abs_err > 0 THEN"
            " CAST((1000000 * greatest(_mx, -_mn)) div sum_abs_err"
            " AS BIGINT) END"
        ).alias("peak_ppm"),
    )


def dixon_q(df: DataFrame, group_col: str, v_col: str) -> DataFrame:
    """Dixon's Q gap-ratio outlier screen per group — how big is the
    gap between the extreme value and its nearest neighbor, relative
    to the range? (The order-statistic outlier test that needs no
    variance at all: two ratios of exact integer differences.)

        q_low_ppm  = (1e6 * (x_(2) - x_(1))) div (x_(n) - x_(1))
        q_high_ppm = (1e6 * (x_(n) - x_(n-1))) div (x_(n) - x_(1))

    NULL when the range is 0 or n < 3. Order statistics by
    row_number under the (v, id implicit) total order — duplicates
    of the extreme value legitimately give a 0 gap. Output:
    (group_key, n, x_min, x_max, q_low_ppm, q_high_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc), F.col(v_col).cast("bigint").alias("v")
    )
    w_asc = Window.partitionBy(gc).orderBy(F.col("v").asc())
    w_dsc = Window.partitionBy(gc).orderBy(F.col("v").desc())
    ranked = base.select(
        gc,
        "v",
        F.row_number().over(w_asc).alias("_ra"),
        F.row_number().over(w_dsc).alias("_rd"),
    ).where((F.col("_ra") <= 2) | (F.col("_rd") <= 2))
    agg = ranked.groupBy(gc).agg(
        F.max(F.expr("CASE WHEN _ra = 1 THEN v END"))
        .cast("bigint")
        .alias("x_min"),
        F.max(F.expr("CASE WHEN _ra = 2 THEN v END"))
        .cast("bigint")
        .alias("_x2"),
        F.max(F.expr("CASE WHEN _rd = 2 THEN v END"))
        .cast("bigint")
        .alias("_xn1"),
        F.max(F.expr("CASE WHEN _rd = 1 THEN v END"))
        .cast("bigint")
        .alias("x_max"),
    )
    n_per = base.groupBy(gc).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return n_per.join(agg, gc).select(
        gc,
        "n",
        "x_min",
        "x_max",
        F.expr(
            "CASE WHEN n >= 3 AND x_max > x_min THEN"
            " CAST((1000000 * (_x2 - x_min)) div (x_max - x_min)"
            " AS BIGINT) END"
        ).alias("q_low_ppm"),
        F.expr(
            "CASE WHEN n >= 3 AND x_max > x_min THEN"
            " CAST((1000000 * (x_max - _xn1)) div (x_max - x_min)"
            " AS BIGINT) END"
        ).alias("q_high_ppm"),
    )


def ordinal_patterns(
    df: DataFrame, group_col: str, order_col: str, v_col: str
) -> DataFrame:
    """Order-3 ordinal-pattern census per group — the permutation-
    entropy building block without the entropy (logs are banned from
    compared columns): classify every contiguous triple by the
    permutation its values realize and report the six counts plus the
    dominant pattern's share. A random walk spreads mass across all
    six; a trending series piles onto 012/210; a mean-reverting one
    onto 021/120/102/201.

    Pattern label = ranks of (v_t, v_{t+1}, v_{t+2}), e.g. 012 =
    strictly increasing, 210 = strictly decreasing. Triples must step
    exactly 1 twice (contiguity at the triple level); triples with
    ANY tie are counted in n_tied and excluded (strict patterns
    only). max_share_ppm = (1e6 * max count) div n_triples, NULL when
    no valid triples. Output: (group_key, n_triples, n_tied, n_012,
    n_021, n_102, n_120, n_201, n_210, max_share_ppm)."""
    gc = "group_key"
    w = Window.partitionBy(gc).orderBy("t")
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    tri = base.select(
        gc,
        "t",
        F.col("v").alias("v0"),
        F.lead("v", 1).over(w).alias("v1"),
        F.lead("v", 2).over(w).alias("v2"),
        (F.lead("t", 1).over(w) - F.col("t") == 1).alias("_s1"),
        (F.lead("t", 2).over(w) - F.col("t") == 2).alias("_s2"),
    ).where(
        F.col("v1").isNotNull() & F.col("v2").isNotNull()
        & F.col("_s1") & F.col("_s2")
    )
    coded = tri.select(
        gc,
        F.expr(
            "CASE WHEN v0 = v1 OR v0 = v2 OR v1 = v2 THEN NULL ELSE"
            " concat(CAST(CASE WHEN v0 > v1 THEN 1 ELSE 0 END"
            "        + CASE WHEN v0 > v2 THEN 1 ELSE 0 END AS STRING),"
            "        CAST(CASE WHEN v1 > v0 THEN 1 ELSE 0 END"
            "        + CASE WHEN v1 > v2 THEN 1 ELSE 0 END AS STRING),"
            "        CAST(CASE WHEN v2 > v0 THEN 1 ELSE 0 END"
            "        + CASE WHEN v2 > v1 THEN 1 ELSE 0 END AS STRING))"
            " END"
        ).alias("pat"),
    )
    agg = coded.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN pat IS NOT NULL THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_triples"),
        F.sum(F.expr("CASE WHEN pat IS NULL THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_tied"),
        *[
            F.sum(F.expr(f"CASE WHEN pat = '{p}' THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias(f"n_{p}")
            for p in ("012", "021", "102", "120", "201", "210")
        ],
    )
    return agg.select(
        gc,
        "n_triples",
        "n_tied",
        "n_012",
        "n_021",
        "n_102",
        "n_120",
        "n_201",
        "n_210",
        F.expr(
            "CASE WHEN n_triples > 0 THEN"
            " CAST((1000000 * greatest(n_012, n_021, n_102, n_120,"
            " n_201, n_210)) div n_triples AS BIGINT) END"
        ).alias("max_share_ppm"),
    )


def grubbs_max(
    df: DataFrame, group_col: str, id_col: str, v_col: str
) -> DataFrame:
    """Grubbs-style maximum-deviation outlier score per group,
    squared and exact: G^2 = (max|x - xbar| / s)^2 as ONE integer
    rational — with d_i = n*x_i - S (the n-scaled centered value,
    exact int), VN = n*Q - S^2 (the population-variance numerator):

        G^2 = max(d^2) * (n-1) / (n * VN)
        g2_ppm = (1e6 * (n-1) * max d^2) div (n * VN)

    All products on DECIMAL(38,0) (this SQUARES n-scaled terms — feed
    1000-dollar units per the round-14 unit-scaling rule). The
    attaining row rides along via max_by under the (d^2, id) total
    order (oracle twin: row_number = 1, the round-9 argmax rule).
    NULL score when VN = 0 or n < 3. Output: (group_key, n, g2_ppm,
    outlier_id, outlier_v)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    wn = Window.partitionBy(gc)
    staged = base.select(
        gc,
        "id",
        "v",
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
        F.sum("v").over(wn).cast("bigint").alias("_s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).over(wn).alias("_q"),
    ).select(
        gc,
        "id",
        "v",
        "n",
        "_s",
        "_q",
        F.expr(
            "(CAST(n AS DECIMAL(38,0)) * v - _s)"
            " * (CAST(n AS DECIMAL(38,0)) * v - _s)"
        ).alias("_d2"),
    )
    w_pick = Window.partitionBy(gc).orderBy(
        F.col("_d2").desc(), F.col("id").asc()
    )
    return (
        staged.select(
            gc,
            "id",
            "v",
            "n",
            "_s",
            "_q",
            "_d2",
            F.row_number().over(w_pick).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .select(
            gc,
            "n",
            F.expr(
                "CASE WHEN n >= 3 AND"
                " CAST(n AS DECIMAL(38,0)) * _q"
                " - CAST(_s AS DECIMAL(38,0)) * _s > 0 THEN"
                " CAST((CAST(1000000 AS DECIMAL(38,0)) * (n - 1) * _d2)"
                " div (n * (CAST(n AS DECIMAL(38,0)) * _q"
                " - CAST(_s AS DECIMAL(38,0)) * _s)) AS BIGINT) END"
            ).alias("g2_ppm"),
            F.col("id").alias("outlier_id"),
            F.col("v").alias("outlier_v"),
        )
    )


def bowker_symmetry(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Bowker symmetry terms over a transition matrix — is the flow
    i -> j balanced by j -> i? (McNemar's test generalized beyond
    2x2, reported PER PAIR so the asymmetric cells are named instead
    of buried in one chi-square: the summary the dense matrix query
    q_markov_transitions can't give.)

    For every unordered pair a < b: d = n_ab - n_ba, s = n_ab + n_ba,
    and the pair's chi-square term d^2/s as one exact floor:

        term_ppm = (1e6 * d * d) div s        (NULL when s = 0)

    Input rows are single transitions (a_col -> b_col); pairs where
    BOTH directions are absent don't emit (no support). Output:
    (type_a, type_b, n_ab, n_ba, d, term_ppm) with type_a < type_b."""
    pairs = (
        df.select(
            F.col(a_col).alias("fa"), F.col(b_col).alias("fb")
        )
        .where(F.col("fa") != F.col("fb"))
        .groupBy("fa", "fb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    canon = pairs.select(
        F.least("fa", "fb").alias("type_a"),
        F.greatest("fa", "fb").alias("type_b"),
        F.expr("CASE WHEN fa < fb THEN n ELSE 0 END").alias("_ab"),
        F.expr("CASE WHEN fa > fb THEN n ELSE 0 END").alias("_ba"),
    )
    agg = canon.groupBy("type_a", "type_b").agg(
        F.sum("_ab").cast("bigint").alias("n_ab"),
        F.sum("_ba").cast("bigint").alias("n_ba"),
    )
    return agg.select(
        "type_a",
        "type_b",
        "n_ab",
        "n_ba",
        (F.col("n_ab") - F.col("n_ba")).cast("bigint").alias("d"),
        F.expr(
            "CASE WHEN n_ab + n_ba > 0 THEN"
            " CAST((1000000 * (n_ab - n_ba) * (n_ab - n_ba))"
            " div (n_ab + n_ba) AS BIGINT) END"
        ).alias("term_ppm"),
    )


def fligner_policello(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Fligner-Policello robust rank-order test per group — the
    placement-based Behrens-Fisher alternative to Mann-Whitney (valid
    under unequal variances AND unequal shapes; the modern two-sample
    location default). Squared and exact:

    With DOUBLED placements p2(x) = 2*#{y<x} + #{y=x} (integer even
    under ties, the Ansari-Bradley device), Sp = sum p2, Sq = sum q2,
    A = sum (m*p2_i - Sp)^2, B = sum (n*q2_j - Sq)^2:

        U^2 = (Sp-Sq)^2 * m^2 * n^2
              / (4 * (A*n^2 + B*m^2 + Sp*Sq*m*n))

    — one DECIMAL(38,0) floor to fp2_ppm, the direction in
    sign_u = sign(Sq - Sp) (positive = the in_x sample sits LOWER).
    Complete separation makes the denominator 0 (the statistic is
    infinite) -> NULL, documented. DECIMAL budget: (mn)^4 in the
    numerator caps per-group sample sizes at ~4.7k each — feed
    bounded groups (monthly series, cohorts), not raw event streams.
    Placements come from ONE merged value-cell frame + ONE cumulative
    window (never an X x Y join). Output: (group_key, m, n, sign_u,
    fp2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = cells.select(
        gc,
        "cx",
        "cy",
        (2 * (F.sum("cy").over(w_cum) - F.col("cy")) + F.col("cy"))
        .cast("bigint")
        .alias("p2"),
        (2 * (F.sum("cx").over(w_cum) - F.col("cx")) + F.col("cx"))
        .cast("bigint")
        .alias("q2"),
    )
    mom = placed.groupBy(gc).agg(
        F.sum("cx").cast("bigint").alias("m"),
        F.sum("cy").cast("bigint").alias("n"),
        F.sum(F.expr("cx * p2")).cast("bigint").alias("sp"),
        F.sum(F.expr("cy * q2")).cast("bigint").alias("sq"),
    )
    scored = placed.join(mom, gc).groupBy(gc).agg(
        F.max("m").cast("bigint").alias("m"),
        F.max("n").cast("bigint").alias("n"),
        F.max("sp").cast("bigint").alias("sp"),
        F.max("sq").cast("bigint").alias("sq"),
        F.sum(
            F.expr(
                "cx * (CAST(m AS DECIMAL(38,0)) * p2 - sp)"
                " * (CAST(m AS DECIMAL(38,0)) * p2 - sp)"
            )
        ).alias("_a"),
        F.sum(
            F.expr(
                "cy * (CAST(n AS DECIMAL(38,0)) * q2 - sq)"
                " * (CAST(n AS DECIMAL(38,0)) * q2 - sq)"
            )
        ).alias("_b"),
    )
    return scored.select(
        gc,
        "m",
        "n",
        F.expr("CAST(sign(sq - sp) AS BIGINT)").alias("sign_u"),
        F.expr(
            "CASE WHEN m >= 2 AND n >= 2 AND"
            " _a * n * n + _b * m * m"
            " + CAST(sp AS DECIMAL(38,0)) * sq * m * n > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (sp - sq) * (sp - sq) * m * m * n * n)"
            " div (4 * (_a * n * n + _b * m * m"
            " + CAST(sp AS DECIMAL(38,0)) * sq * m * n)) AS BIGINT) END"
        ).alias("fp2_ppm"),
    )


def cucconi_test(
    df: DataFrame,
    group_col: str,
    in_x_col: str,
    v_col: str,
    id_col: str,
) -> DataFrame:
    """Cucconi two-sample location-SCALE test per group — the joint
    alternative the repo's location tests (Mann-Whitney) and scale
    tests (Ansari-Bradley) check separately: C is large when the
    second sample differs in center OR spread (squared-rank U and
    contrary-squared-rank V combined with their exact negative
    correlation).

    Tie-broken permutation ranks (row_number under the (v, id) total
    order — the documented spearman discipline), so the classic
    no-tie moments are EXACT. With dU = 6U - n(N+1)(2N+1) (6x the
    centered squared-rank sum of the Y side), dV likewise on
    contrary ranks, D = (2N+1)(8N+11), r = 2(N^2-4) - D:

        C = 5 * ((dU^2 + dV^2)*D - 2*r*dU*dV)
            / (2 * (D^2 - r^2) * m * n * (N+1))

    — one DECIMAL(38,0) floor to c_ppm (budget: n^2 N^6 in the
    numerator caps N around 3k per group). NULL when m or n < 2.
    Output: (group_key, m, n, u2_sum, v2_sum, c_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
        F.col(id_col).cast("bigint").alias("id"),
    )
    w = Window.partitionBy(gc).orderBy("v", "id")
    ranked = base.select(
        gc,
        "in_x",
        F.row_number().over(w).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy(gc))
        .cast("bigint")
        .alias("nn"),
    )
    agg = ranked.groupBy(gc).agg(
        F.max("nn").cast("bigint").alias("nn"),
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("m"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE r * r END"))
        .cast("bigint")
        .alias("u2_sum"),
        F.sum(
            F.expr(
                "CASE WHEN in_x THEN 0"
                " ELSE (nn + 1 - r) * (nn + 1 - r) END"
            )
        )
        .cast("bigint")
        .alias("v2_sum"),
    )
    return agg.select(
        gc,
        "m",
        "n",
        "u2_sum",
        "v2_sum",
        F.expr(
            "CASE WHEN m >= 2 AND n >= 2 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * 5 * ("
            "   (CAST(6 AS DECIMAL(38,0)) * u2_sum"
            "      - n * (nn + 1) * (2 * nn + 1))"
            "   * (CAST(6 AS DECIMAL(38,0)) * u2_sum"
            "      - n * (nn + 1) * (2 * nn + 1))"
            "   * ((2 * nn + 1) * (8 * nn + 11))"
            " + (CAST(6 AS DECIMAL(38,0)) * v2_sum"
            "      - n * (nn + 1) * (2 * nn + 1))"
            "   * (CAST(6 AS DECIMAL(38,0)) * v2_sum"
            "      - n * (nn + 1) * (2 * nn + 1))"
            "   * ((2 * nn + 1) * (8 * nn + 11))"
            " - 2 * (2 * (CAST(nn AS DECIMAL(38,0)) * nn - 4)"
            "        - (2 * nn + 1) * (8 * nn + 11))"
            "   * (CAST(6 AS DECIMAL(38,0)) * u2_sum"
            "      - n * (nn + 1) * (2 * nn + 1))"
            "   * (CAST(6 AS DECIMAL(38,0)) * v2_sum"
            "      - n * (nn + 1) * (2 * nn + 1))"
            " ))"
            " div (2 * ("
            "   (CAST((2 * nn + 1) AS DECIMAL(38,0)) * (8 * nn + 11))"
            "   * ((2 * nn + 1) * (8 * nn + 11))"
            " - (2 * (CAST(nn AS DECIMAL(38,0)) * nn - 4)"
            "    - (2 * nn + 1) * (8 * nn + 11))"
            "   * (2 * (CAST(nn AS DECIMAL(38,0)) * nn - 4)"
            "      - (2 * nn + 1) * (8 * nn + 11))"
            " ) * m * n * (nn + 1)) AS BIGINT) END"
        ).alias("c_ppm"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    group_col: str,
    order_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test per group — the hypothesis-test
    companion to ``seasonal_sen_slope`` (that one estimates the slope;
    this one scores its significance): the MK statistic S restricted
    to WITHIN-SEASON pairs, summed across seasons, with the
    tie-corrected variance summed per season:

        S      = sum_s sum_{i<j in season s} sign(v_j - v_i)
        var18  = sum_s [ n_s(n_s-1)(2n_s+5)
                         - sum_ties t(t-1)(2t+5) ]      (= 18*Var[S])
        z2_ppm = (1e6 * 18 * (|S| - 1)^2) div var18     (continuity-
                  corrected; 0 when S = 0, NULL when var18 = 0)

    Pair enumeration is the seasonal_sen_slope join shape — years^2 x
    period rows per group, tiny at any SF (the O(n^2)-within-season
    blowup is the oracle-friendly shape precisely because seasons are
    short). All exact int64. Output: (group_key, n_points, s_stat,
    var18, z2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
        (F.col(order_col).cast("bigint") % period).alias("season"),
    )
    a = base.select(gc, "season", F.col("t").alias("ti"), F.col("v").alias("vi"))
    b = base.select(gc, "season", F.col("t").alias("tj"), F.col("v").alias("vj"))
    s_stat = (
        a.join(b, [gc, "season"])
        .where(F.col("tj") > F.col("ti"))
        .groupBy(gc)
        .agg(
            F.sum(F.expr("CAST(sign(vj - vi) AS BIGINT)"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n_per_season = base.groupBy(gc, "season").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns")
    )
    base_var = n_per_season.groupBy(gc).agg(
        F.sum("ns").cast("bigint").alias("n_points"),
        F.sum(F.expr("ns * (ns - 1) * (2 * ns + 5)"))
        .cast("bigint")
        .alias("_v0"),
    )
    ties = (
        base.groupBy(gc, "season", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy(gc)
        .agg(
            F.sum(F.expr("c * (c - 1) * (2 * c + 5)"))
            .cast("bigint")
            .alias("_tv")
        )
    )
    return (
        base_var.join(ties, gc, "left")
        .join(s_stat, gc, "left")
        .select(
            gc,
            "n_points",
            F.coalesce(F.col("s_stat"), F.lit(0))
            .cast("bigint")
            .alias("s_stat"),
            (F.col("_v0") - F.coalesce(F.col("_tv"), F.lit(0)))
            .cast("bigint")
            .alias("var18"),
            F.expr(
                "CASE WHEN _v0 - coalesce(_tv, 0) > 0 THEN"
                " CASE WHEN coalesce(s_stat, 0) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST((1000000 * 18"
                "   * (abs(coalesce(s_stat, 0)) - 1)"
                "   * (abs(coalesce(s_stat, 0)) - 1))"
                "   div (_v0 - coalesce(_tv, 0)) AS BIGINT) END END"
            ).alias("z2_ppm"),
        )
    )


def pacf2(
    df: DataFrame, group_col: str, order_col: str, v_col: str
) -> DataFrame:
    """Lag-1/lag-2 autocorrelation + lag-2 PARTIAL autocorrelation per
    group, exact — the AR-order diagnostic next to q_durbin_watson
    (DW asks "is there lag-1 structure?"; PACF(2) asks "is there
    lag-2 structure BEYOND what lag-1 explains?", the number that
    separates AR(1) from AR(2) demand):

        C_k = sum_t Z_t * Z_{t+k},   Z_t = n*v_t - S   (exact ints)
        ac1_ppm   = (1e6 * C_1) div C_0
        ac2_ppm   = (1e6 * C_2) div C_0
        pacf2_ppm = (1e6 * (C_2*C_0 - C_1^2)) div (C_0^2 - C_1^2)

    — the n^2 centering scale cancels in every ratio. Gapless gate
    (lag alignment is meaningless across holes; the round-13 span
    rule), drop-reporting convention (every group emits a row, NULL
    stats when gapped or degenerate). Products on DECIMAL(38,0) —
    feed 1000-dollar units (n-scaled squares, the round-14 rule).
    Output: (group_key, n, gapless, ac1_ppm, ac2_ppm, pacf2_ppm)."""
    gc = "group_key"
    w = Window.partitionBy(gc).orderBy("t")
    wn = Window.partitionBy(gc)
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(order_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    staged = base.select(
        gc,
        "t",
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
        (F.max("t").over(wn) - F.min("t").over(wn))
        .cast("bigint")
        .alias("_span"),
        F.expr(
            "CAST(count(1) over (partition by group_key) AS DECIMAL(38,0))"
            " * v - sum(v) over (partition by group_key)"
        ).alias("z"),
    )
    lagged = staged.select(
        gc,
        "n",
        "_span",
        "z",
        F.lead("z", 1).over(w).alias("_z1"),
        F.lead("z", 2).over(w).alias("_z2"),
    )
    agg = lagged.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("_span").cast("bigint").alias("_span"),
        F.sum(F.expr("z * z")).alias("_c0"),
        F.sum(F.expr("CASE WHEN _z1 IS NOT NULL THEN z * _z1 END")).alias(
            "_c1"
        ),
        F.sum(F.expr("CASE WHEN _z2 IS NOT NULL THEN z * _z2 END")).alias(
            "_c2"
        ),
    )
    ok = "(_span = n - 1 AND n >= 3)"
    return agg.select(
        gc,
        "n",
        (F.col("_span") == F.col("n") - 1).alias("gapless"),
        F.expr(
            f"CASE WHEN {ok} AND _c0 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * _c1) div _c0"
            " AS BIGINT) END"
        ).alias("ac1_ppm"),
        F.expr(
            f"CASE WHEN {ok} AND _c0 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * _c2) div _c0"
            " AS BIGINT) END"
        ).alias("ac2_ppm"),
        F.expr(
            f"CASE WHEN {ok} AND _c0 * _c0 - _c1 * _c1 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (_c2 * _c0 - _c1 * _c1))"
            " div (_c0 * _c0 - _c1 * _c1) AS BIGINT) END"
        ).alias("pacf2_ppm"),
    )


def process_capability(
    df: DataFrame,
    group_col: str,
    v_col: str,
    lsl: int,
    usl: int,
) -> DataFrame:
    """Process-capability indices Cp and Cpk per group, squared and
    exact — the SPC report numbers (is the process spread inside the
    spec band, and is it CENTERED?):

        Cp^2  = (USL-LSL)^2 * n(n-1) / (36 * VN)
        Cpk   = min(USL - mean, mean - LSL) / (3s)
        Cpk^2 = cpk_num^2 * (n-1) / (9 * n * VN),
                cpk_num = min(n*USL - S, S - n*LSL)   (sign kept)

    with VN = n*Q - S^2 (the exact variance numerator) and cpk_num
    the n-scaled one-sided margin — its SIGN rides along (negative =
    the mean is outside the spec band, where the squared index alone
    would lie). One floor each on DECIMAL(38,0); feed 1000-dollar
    units (n-scaled squares, the round-14 rule). NULL when VN = 0 or
    n < 2. Output: (group_key, n, mean_in_spec, cp2_ppm,
    cpk_sign, cpk2_ppm)."""
    gc = "group_key"
    agg = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(v_col).cast("bigint").alias("v"),
        )
        .groupBy(gc)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("_s"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("_q"),
        )
    )
    vn = (
        "(CAST(n AS DECIMAL(38,0)) * _q"
        " - CAST(_s AS DECIMAL(38,0)) * _s)"
    )
    cpk_num = (
        f"least(CAST(n AS DECIMAL(38,0)) * {usl} - _s,"
        f" CAST(_s AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0)) * {lsl})"
    )
    return agg.select(
        gc,
        "n",
        F.expr(f"_s >= n * {lsl} AND _s <= n * {usl}").alias(
            "mean_in_spec"
        ),
        F.expr(
            f"CASE WHEN n >= 2 AND {vn} > 0 THEN"
            f" CAST((CAST(1000000 AS DECIMAL(38,0))"
            f" * ({usl} - {lsl}) * ({usl} - {lsl}) * n * (n - 1))"
            f" div (36 * {vn}) AS BIGINT) END"
        ).alias("cp2_ppm"),
        F.expr(f"CAST(sign({cpk_num}) AS BIGINT)").alias("cpk_sign"),
        F.expr(
            f"CASE WHEN n >= 2 AND {vn} > 0 THEN"
            f" CAST((CAST(1000000 AS DECIMAL(38,0))"
            f" * {cpk_num} * {cpk_num} * (n - 1))"
            f" div (9 * n * {vn}) AS BIGINT) END"
        ).alias("cpk2_ppm"),
    )


def kuiper_two_sample(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Kuiper two-sample test per group — the cyclic-sensitive KS
    sibling: V = D+ + D- weighs BOTH tails equally (KS's D = max of
    the two misses a shift-up in one tail cancelling a shift-down in
    the other; V catches symmetric divergences KS halves).

    Cross-multiplied exact integers on the merged value cells (the
    q_ks_two_sample discipline): with i = cumulative X count and
    j = cumulative Y count at each distinct value,

        dplus_num  = max(n*i - m*j)          (>= 0 by v -> -inf)
        dminus_num = max(m*j - n*i)
        v_ppm      = (1e6 * (dplus_num + dminus_num)) div (m*n)

    One groupBy to cells, one cumulative window, one aggregate. NULL
    when either side is empty. Output: (group_key, m, n, dplus_num,
    dminus_num, v_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(gc)
    cum = cells.select(
        gc,
        F.sum("cx").over(w_cum).cast("bigint").alias("i"),
        F.sum("cy").over(w_cum).cast("bigint").alias("j"),
        F.sum("cx").over(wn).cast("bigint").alias("m"),
        F.sum("cy").over(wn).cast("bigint").alias("n"),
    )
    agg = cum.groupBy(gc).agg(
        F.max("m").cast("bigint").alias("m"),
        F.max("n").cast("bigint").alias("n"),
        F.max(F.expr("n * i - m * j")).cast("bigint").alias("_dp"),
        F.max(F.expr("m * j - n * i")).cast("bigint").alias("_dm"),
    )
    return agg.select(
        gc,
        "m",
        "n",
        F.greatest(F.col("_dp"), F.lit(0)).cast("bigint").alias("dplus_num"),
        F.greatest(F.col("_dm"), F.lit(0)).cast("bigint").alias("dminus_num"),
        F.expr(
            "CASE WHEN m > 0 AND n > 0 THEN"
            " CAST((1000000 * (greatest(_dp, 0) + greatest(_dm, 0)))"
            " div (m * n) AS BIGINT) END"
        ).alias("v_ppm"),
    )


def wasserstein_1d(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance per group —
    THE distribution-shift magnitude the repo's ks/kuiper/TVD tests
    can't give: V and D say "the distributions differ", W1 says "by
    HOW MUCH, in the value's own units" (the metric modern data-drift
    monitors report).

    W1 = integral |F1 - F2| dv over the merged support. Cross-
    multiplying both ECDFs makes it exact:

        w1_scaled = sum_gaps (v_next - v) * |n*i - m*j|  (= W1 * m*n)
        w1_milli  = (1000 * w1_scaled) div (m*n)          (value units
                                                           x 1e-3)

    One groupBy to merged value cells, one cumulative window, one
    lead, one aggregate — O(distinct values) per group. NULL when a
    side is empty; w1_scaled is emitted as int64 (budget: value-range
    * m * n < 2^63 — bounded groups like monthly series/cohorts, the
    fligner_policello sizing note). Output: (group_key, m, n,
    w1_scaled, w1_milli)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ord = Window.partitionBy(gc).orderBy("v")
    wn = Window.partitionBy(gc)
    cum = cells.select(
        gc,
        "v",
        F.sum("cx").over(w_cum).cast("bigint").alias("i"),
        F.sum("cy").over(w_cum).cast("bigint").alias("j"),
        F.lead("v").over(w_ord).alias("_vn"),
        F.sum("cx").over(wn).cast("bigint").alias("m"),
        F.sum("cy").over(wn).cast("bigint").alias("n"),
    )
    agg = cum.groupBy(gc).agg(
        F.max("m").cast("bigint").alias("m"),
        F.max("n").cast("bigint").alias("n"),
        F.sum(
            F.expr(
                "CASE WHEN _vn IS NOT NULL THEN"
                " (_vn - v) * CAST(abs(n * i - m * j) AS DECIMAL(38,0))"
                " ELSE 0 END"
            )
        ).alias("_w1"),
    )
    return agg.select(
        gc,
        "m",
        "n",
        F.col("_w1").cast("bigint").alias("w1_scaled"),
        F.expr(
            "CASE WHEN m > 0 AND n > 0 THEN"
            " CAST((1000 * _w1) div (CAST(m AS DECIMAL(38,0)) * n)"
            " AS BIGINT) END"
        ).alias("w1_milli"),
    )


def blomqvist_beta(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Blomqvist's beta (medial correlation) per group — the quadrant
    sign test of association: split the plane at the two LOWER MEDIANS
    (exact order statistic, rank (n+1) div 2 under the (value, x, y)
    total order never mattering because selection is on the sorted
    VALUE), drop points sitting ON either median line, and compare
    diagonal vs off-diagonal quadrant mass:

        beta = (n11 + n22 - n12 - n21) / (n11 + n22 + n12 + n21)

    All counts exact; beta_ppm one signed integer division. NULL when
    every point lies on a median line. Output: (group_key, n, n_on,
    n_diag, n_off, beta_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    wn = Window.partitionBy(gc)
    wx = Window.partitionBy(gc).orderBy("x")
    wy = Window.partitionBy(gc).orderBy("y")
    ranked = base.select(
        gc,
        "x",
        "y",
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
        F.row_number().over(wx).cast("bigint").alias("_rx"),
        F.row_number().over(wy).cast("bigint").alias("_ry"),
    )
    med = ranked.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.expr("CASE WHEN _rx = (n + 1) div 2 THEN x END"))
        .cast("bigint")
        .alias("_mx"),
        F.max(F.expr("CASE WHEN _ry = (n + 1) div 2 THEN y END"))
        .cast("bigint")
        .alias("_my"),
    )
    tagged = base.join(med.select(gc, "n", "_mx", "_my"), gc)
    agg = tagged.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN x = _mx OR y = _my THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_on"),
        F.sum(
            F.expr(
                "CASE WHEN (x > _mx AND y > _my)"
                " OR (x < _mx AND y < _my) THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_diag"),
        F.sum(
            F.expr(
                "CASE WHEN (x > _mx AND y < _my)"
                " OR (x < _mx AND y > _my) THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_off"),
    )
    return agg.select(
        gc,
        "n",
        "n_on",
        "n_diag",
        "n_off",
        F.expr(
            "CASE WHEN n_diag + n_off > 0 THEN"
            " CAST((1000000 * (n_diag - n_off)) div (n_diag + n_off)"
            " AS BIGINT) END"
        ).alias("beta_ppm"),
    )


def hoover_index(df: DataFrame, group_col: str, v_col: str) -> DataFrame:
    """Hoover (Pietra / Robin Hood) inequality index per group — the
    share of total mass that would have to move to equalize the
    distribution; the one-number inequality companion of gini_lorenz
    that needs NO sort, only the mean:

        H = sum |v_i - mean| / (2 * sum v)
          -> hoover_ppm = (1e6 * sum|n*v_i - S|) div (2 * n * S)

    n-scaled centering keeps everything exact (DECIMAL(38,0) through
    sf10); defined for positive-total groups (NULL otherwise — the
    never-throw convention). Output: (group_key, n, total, hoover_ppm).
    """
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc), F.col(v_col).cast("bigint").alias("v")
    )
    mom = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("total"),
    )
    z = base.join(mom, gc).groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("total").cast("bigint").alias("total"),
        F.sum(F.expr("abs(CAST(n AS DECIMAL(38,0)) * v - total)")).alias(
            "_sad"
        ),
    )
    return z.select(
        gc,
        "n",
        "total",
        F.expr(
            "CASE WHEN total > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * _sad)"
            " div (2 * CAST(n AS DECIMAL(38,0)) * total) AS BIGINT) END"
        ).alias("hoover_ppm"),
    )


def quantile_shape(df: DataFrame, group_col: str, v_col: str) -> DataFrame:
    """Quantile-based distribution shape per group — Bowley skewness,
    Moors kurtosis and the quartile coefficient of dispersion, all
    from exact ceil-rank order statistics (the integer-rank rule:
    k = (p*n + 99) div 100 — never ceil(0.95*n)), so NO moment powers
    and NO overflow budget at any unit scale (the moment-based
    skew/kurt rationals blow DECIMAL(38,0) past tiny inputs —
    quantile shape is the 100 TB-safe formulation):

        bowley_ppm = 1e6 * (Q3 + Q1 - 2*Q2)  div (Q3 - Q1)
        moors_ppm  = 1e6 * ((E7-E5)+(E3-E1)) div (E6 - E2)
        qcd_ppm    = 1e6 * (Q3 - Q1)         div (Q3 + Q1)

    (E_k = octiles, k/8.) Each NULL on a zero denominator. Output:
    (group_key, n, q1, q2, q3, bowley_ppm, moors_ppm, qcd_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc), F.col(v_col).cast("bigint").alias("v")
    )
    wv = Window.partitionBy(gc).orderBy("v")
    wn = Window.partitionBy(gc)
    ranked = base.select(
        gc,
        "v",
        F.row_number().over(wv).cast("bigint").alias("_r"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )

    def pick(num: int, den: int, name: str):
        # ceil-rank order statistic at p = num/den
        return (
            F.max(
                F.expr(f"CASE WHEN _r = ({num} * n + {den - 1}) div {den}"
                       " THEN v END")
            )
            .cast("bigint")
            .alias(name)
        )

    agg = ranked.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        pick(1, 4, "q1"),
        pick(2, 4, "q2"),
        pick(3, 4, "q3"),
        pick(1, 8, "_e1"),
        pick(3, 8, "_e3"),
        pick(5, 8, "_e5"),
        pick(6, 8, "_e6"),
        pick(2, 8, "_e2"),
        pick(7, 8, "_e7"),
    )
    return agg.select(
        gc,
        "n",
        "q1",
        "q2",
        "q3",
        F.expr(
            "CASE WHEN q3 - q1 > 0 THEN"
            " CAST((1000000 * (q3 + q1 - 2 * q2)) div (q3 - q1)"
            " AS BIGINT) END"
        ).alias("bowley_ppm"),
        F.expr(
            "CASE WHEN _e6 - _e2 > 0 THEN"
            " CAST((1000000 * ((_e7 - _e5) + (_e3 - _e1)))"
            " div (_e6 - _e2) AS BIGINT) END"
        ).alias("moors_ppm"),
        F.expr(
            "CASE WHEN q3 + q1 > 0 THEN"
            " CAST((1000000 * (q3 - q1)) div (q3 + q1) AS BIGINT) END"
        ).alias("qcd_ppm"),
    )


def variance_ratio(
    df: DataFrame, group_col: str, t_col: str, v_col: str
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (q = 2) per group — the
    random-walk diagnostic: if increments are uncorrelated the
    variance of 2-period differences is exactly twice the 1-period
    variance, so

        VR(2) = Var(v_t - v_{t-2}) / (2 * Var(v_t - v_{t-1}))

    with VR > 1 = momentum (positive serial correlation), < 1 = mean
    reversion. Both variances as exact n-scaled integer moments
    (n*Q - S^2); the ratio is ONE exact DECIMAL floor:

        vr_ppm = (1e6 * (n2*Q2 - S2^2) * n1^2)
                 div (2 * (n1*Q1 - S1^2) * n2^2)

    Lag contiguity is enforced AT THE LAG LEVEL (the forecast_wape
    rule): a 1-period diff needs t - lag(t) = 1, a 2-period diff
    t - lag2(t) = 2 — gapped months drop out of their own moment
    only. NULL when either diff count < 2 or Var1 = 0. Output:
    (group_key, n_points, n1, n2, vr_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    diffs = base.select(
        gc,
        F.expr("CASE WHEN t - lag(t, 1) OVER"
               " (PARTITION BY group_key ORDER BY t) = 1"
               " THEN v - lag(v, 1) OVER"
               " (PARTITION BY group_key ORDER BY t) END").alias("r1"),
        F.expr("CASE WHEN t - lag(t, 2) OVER"
               " (PARTITION BY group_key ORDER BY t) = 2"
               " THEN v - lag(v, 2) OVER"
               " (PARTITION BY group_key ORDER BY t) END").alias("r2"),
        F.count(F.lit(1)).over(Window.partitionBy(gc)).cast("bigint").alias(
            "n_points"
        ),
    )
    agg = diffs.groupBy(gc).agg(
        F.max("n_points").cast("bigint").alias("n_points"),
        F.count("r1").cast("bigint").alias("n1"),
        F.count("r2").cast("bigint").alias("n2"),
        F.sum(F.expr("CAST(r1 AS DECIMAL(38,0))")).alias("_s1"),
        F.sum(F.expr("CAST(r1 AS DECIMAL(38,0)) * r1")).alias("_q1"),
        F.sum(F.expr("CAST(r2 AS DECIMAL(38,0))")).alias("_s2"),
        F.sum(F.expr("CAST(r2 AS DECIMAL(38,0)) * r2")).alias("_q2"),
    )
    return agg.select(
        gc,
        "n_points",
        "n1",
        "n2",
        F.expr(
            "CASE WHEN n1 >= 2 AND n2 >= 2"
            " AND n1 * _q1 - _s1 * _s1 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (n2 * _q2 - _s2 * _s2) * n1 * n1)"
            " div (2 * (n1 * _q1 - _s1 * _s1) * n2 * n2) AS BIGINT) END"
        ).alias("vr_ppm"),
    )


def foster_stuart(
    df: DataFrame, group_col: str, t_col: str, v_col: str
) -> DataFrame:
    """Foster-Stuart records test per group — trend detection by
    RECORD counting (a fresh observation strictly above every prior
    one is an upper record; strictly below, a lower record): under a
    stationary exchangeable series upper and lower records arrive at
    the same slow harmonic rate, so

        d_stat = #upper - #lower   (trend: >> 0 rising, << 0 falling)
        s_stat = #upper + #lower   (record activity / dispersion test)

    Pure integer window arithmetic — running strict max/min over the
    PRECEDING frame, first observation excluded (no prior to beat).
    Output: (group_key, n, n_up_records, n_low_records, d_stat,
    s_stat)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    flagged = base.select(
        gc,
        F.expr("CASE WHEN max(v) OVER (PARTITION BY group_key ORDER BY t"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
               " < v THEN 1 ELSE 0 END").alias("_up"),
        F.expr("CASE WHEN min(v) OVER (PARTITION BY group_key ORDER BY t"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
               " > v THEN 1 ELSE 0 END").alias("_lo"),
    )
    return flagged.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_up").cast("bigint").alias("n_up_records"),
        F.sum("_lo").cast("bigint").alias("n_low_records"),
        (F.sum("_up") - F.sum("_lo")).cast("bigint").alias("d_stat"),
        (F.sum("_up") + F.sum("_lo")).cast("bigint").alias("s_stat"),
    )


def robust_scale_pairs(
    df: DataFrame, group_col: str, v_col: str
) -> DataFrame:
    """Rousseeuw-Croux robust scale cores Sn and Qn per group — the
    modern replacements for MAD (50% breakdown like MAD but ~2-4x the
    Gaussian efficiency, and no symmetry assumption). Emitted as RAW
    exact order statistics in the value's own units (the published
    consistency constants 1.1926 / 2.2219 are irrational — consumers
    multiply; the repo never puts transcendentals in compared
    columns):

        qn_raw = k-th smallest of {|v_i - v_j| : i < j},
                 k = C(h, 2), h = n div 2 + 1
        sn_raw = lomed_i ( himed_{j != i} |v_i - v_j| )
                 (himed = (n div 2 + 1)-th of the n-1 values,
                  lomed = ((n+1) div 2)-th of the n per-i medians)

    Shape: one per-group pair join (i != j) + two ranked windows —
    O(n^2) per group, the BOUNDED-group budget (monthly series,
    cohorts; the fligner_policello sizing note). Ties broken by the
    (diff, i, j) total order; selection is on the sorted VALUE so the
    statistics are tie-stable. Output: (group_key, n, k_qn, sn_raw,
    qn_raw)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc), F.col(v_col).cast("bigint").alias("v")
    ).withColumn(
        "_i",
        F.row_number().over(
            Window.partitionBy(gc).orderBy("v")
        ),
    )
    a = base.select(gc, F.col("_i").alias("ia"), F.col("v").alias("va"))
    b = base.select(gc, F.col("_i").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(b, gc).where(F.col("ia") != F.col("ib")).select(
        gc,
        "ia",
        "ib",
        F.expr("abs(va - vb)").cast("bigint").alias("d"),
    )
    wn = Window.partitionBy(gc)
    # himed per anchor i: rank n0 div 2 + 1 over its n0 - 1 diffs
    # (with _ni = n0 - 1 the rank is (_ni + 1) div 2 + 1 exactly)
    w_i = Window.partitionBy(gc, "ia").orderBy("d", "ib")
    himed = (
        pairs.withColumn("_r", F.row_number().over(w_i))
        .withColumn(
            "_ni", F.count(F.lit(1)).over(Window.partitionBy(gc, "ia"))
        )
        .where(F.col("_r") == F.expr("(_ni + 1) div 2 + 1"))
        .select(
            gc, "ia", F.col("d").alias("dh"),
            (F.col("_ni") + 1).alias("_n0"),
        )
    )
    w_med = Window.partitionBy(gc).orderBy("dh", "ia")
    sn = (
        himed.withColumn("_r2", F.row_number().over(w_med))
        .where(F.col("_r2") == F.expr("(_n0 + 1) div 2"))
        .select(gc, F.col("dh").alias("sn_raw"))
    )
    # Qn: k-th smallest over ordered pairs (ia < ib)
    w_all = Window.partitionBy(gc).orderBy("d", "ia", "ib")
    qn = (
        pairs.where(F.col("ia") < F.col("ib"))
        .withColumn("_r", F.row_number().over(w_all))
        .withColumn("_np", F.count(F.lit(1)).over(wn))
        .withColumn(
            "_n0",
            F.expr(
                "CAST((1 + sqrt(CAST(1 + 8 * _np AS DOUBLE))) / 2 AS"
                " BIGINT)"
            ),
        )
        .withColumn("_h", F.expr("_n0 div 2 + 1"))
        .withColumn("_k", F.expr("(_h * (_h - 1)) div 2"))
        .where(F.col("_r") == F.col("_k"))
        .select(
            gc,
            F.col("_n0").cast("bigint").alias("n"),
            F.col("_k").cast("bigint").alias("k_qn"),
            F.col("d").alias("qn_raw"),
        )
    )
    return qn.join(sn, gc, "left").select(
        gc, "n", "k_qn", "sn_raw", "qn_raw"
    )


def xbar_r_chart(
    df: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    subgroup: int = 3,
    a2_milli: int = 1023,
) -> DataFrame:
    """X-bar/R control chart per group — the Shewhart SPC workhorse
    next to q_process_capability (that one scores capability against
    SPEC limits; this one detects loss of CONTROL against the
    process's own variation): consecutive ``subgroup``-sized windows
    of the series (complete + gapless only — the seasonal-gap rule at
    subgroup granularity), subgroup means vs X-dbar +- A2 * R-bar.

    A2 is the published rational-milli constant for the subgroup size
    (1023/1000 for n=3 — a LITERAL in both engines, never computed
    from the irrational d2). The out-of-control test is cleared of
    divisions entirely:

        mean_k - Xdbar > A2 * Rbar
        <=> 1000 * (m * sum_k - T) > a2_milli * SR * s

    (m subgroups, s = subgroup size, T = total, SR = sum of ranges)
    — exact int64/DECIMAL both sides. Output: (group_key,
    n_subgroups, rbar_milli, ooc_high, ooc_low)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    # One subgroup rollup feeds the gate, the totals, the OOC join AND
    # the drop-reporting group superset — localCheckpoint the tiny
    # (groups x subgroups) frame so the base scan runs ONCE, not once
    # per consumer (the N>=3-consumers rule; measured 6.8 -> ~1s warm
    # at sf0.1).
    subs_all = base.groupBy(
        gc, F.expr(f"t div {subgroup}").alias("sub")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
        (F.max("t") - F.min("t")).cast("bigint").alias("_span"),
        F.sum("v").cast("bigint").alias("sum_k"),
        (F.max("v") - F.min("v")).cast("bigint").alias("r_k"),
    ).localCheckpoint(eager=True)
    subs = subs_all.where(
        (F.col("_cnt") == subgroup) & (F.col("_span") == subgroup - 1)
    )
    tot = subs.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("sum_k").cast("bigint").alias("tt"),
        F.sum("r_k").cast("bigint").alias("sr"),
    )
    tagged = subs.join(tot, gc)
    agg = tagged.groupBy(gc).agg(
        F.max("m").cast("bigint").alias("n_subgroups"),
        F.max(F.expr("CASE WHEN m > 0 THEN (1000 * sr) div m END"))
        .cast("bigint")
        .alias("rbar_milli"),
        F.sum(
            F.expr(
                "CASE WHEN CAST(1000 AS DECIMAL(38,0))"
                " * (m * sum_k - tt)"
                f" > CAST({a2_milli} AS DECIMAL(38,0)) * sr * {subgroup}"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("ooc_high"),
        F.sum(
            F.expr(
                "CASE WHEN CAST(1000 AS DECIMAL(38,0))"
                " * (m * sum_k - tt)"
                f" < -(CAST({a2_milli} AS DECIMAL(38,0)) * sr"
                f" * {subgroup}) THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("ooc_low"),
    )
    # Drop-reporting (the round-14 convention): a group with NO
    # complete gapless subgroup still emits a row — NULL stats,
    # n_subgroups = 0 — so fully-gated groups are visible, not absent.
    # The superset comes from the UNGATED subgroup frame: no extra
    # base scan.
    groups = subs_all.select(gc).distinct()
    return groups.join(agg, gc, "left").select(
        gc,
        F.coalesce(F.col("n_subgroups"), F.lit(0))
        .cast("bigint")
        .alias("n_subgroups"),
        "rbar_milli",
        "ooc_high",
        "ooc_low",
    )


def anderson_darling_2s(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Anderson-Darling-weighted two-sample distance per group — the
    TAIL-sensitive member of the distribution-shift family (KS/Kuiper
    weight the middle; AD's 1/(F(1-F)) weighting makes tail
    divergence count): the cell-floor variant of the Scholz-Stephens
    statistic, defined on the merged distinct-value cells,

        term_j = (1e6 * (M_j*N - m*B_j)^2) div (B_j * (N - B_j))
        ad_scaled = sum over cells with B_j < N of term_j
        ad_ppm    = ad_scaled div (m * n)

    (M_j = cumulative X count, B_j = cumulative total count.) Each
    term is one exact integer floor — the sum is order-independent,
    so the statistic is partitioning-stable and cell-exact
    cross-engine (an exact common-denominator AD needs an lcm over
    all B_j(N-B_j) — astronomically wide; the per-term floor loses
    < 1 ppm per cell and is documented as THE statistic here). NULL
    when either side is empty. Output: (group_key, m, n, ad_scaled,
    ad_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.lit(1)).cast("bigint").alias("ct"),
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(gc)
    cum = cells.select(
        gc,
        F.sum("cx").over(w_cum).cast("bigint").alias("mj"),
        F.sum("ct").over(w_cum).cast("bigint").alias("bj"),
        F.sum("cx").over(wn).cast("bigint").alias("m"),
        F.sum("ct").over(wn).cast("bigint").alias("nn"),
    )
    agg = cum.groupBy(gc).agg(
        F.max("m").cast("bigint").alias("m"),
        F.max(F.expr("nn - m")).cast("bigint").alias("n"),
        F.sum(
            F.expr(
                "CASE WHEN bj < nn THEN"
                " (1000000 * (mj * nn - m * bj) * (mj * nn - m * bj))"
                " div (bj * (nn - bj)) ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("ad_scaled"),
    )
    return agg.select(
        gc,
        "m",
        "n",
        "ad_scaled",
        F.expr(
            "CASE WHEN m > 0 AND n > 0 THEN"
            " CAST(ad_scaled div (m * n) AS BIGINT) END"
        ).alias("ad_ppm"),
    )


def event_gap_profile(
    df: DataFrame, group_col: str, ms_col: str, id_col: str
) -> DataFrame:
    """Inter-arrival gap profile per group — the event-cadence health
    check (SLA monitors, feed-liveness audits): exact epoch-ms gaps
    between consecutive events under the (ms, id) total order, with
    median / p90 / max by exact ceil-rank order statistics (the
    integer-rank rule — no interpolation, no doubles):

        p50_gap_ms = gap at rank (50*n_gaps + 99) div 100
        p90_gap_ms = gap at rank (90*n_gaps + 99) div 100

    Output: (group_key, n_events, n_gaps, p50_gap_ms, p90_gap_ms,
    max_gap_ms). Groups with < 2 events emit NULL gaps (the
    drop-reporting convention — present, not absent)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(ms_col).cast("bigint").alias("ms"),
        F.col(id_col).cast("bigint").alias("_id"),
    )
    w = Window.partitionBy(gc).orderBy("ms", "_id")
    gaps = base.select(
        gc,
        (F.col("ms") - F.lag("ms").over(w)).cast("bigint").alias("gap"),
    )
    wg = Window.partitionBy(gc).orderBy("gap")
    wn = Window.partitionBy(gc)
    ranked = gaps.where(F.col("gap").isNotNull()).select(
        gc,
        "gap",
        F.row_number().over(wg).cast("bigint").alias("_r"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("_ng"),
    )
    agg = ranked.groupBy(gc).agg(
        F.max("_ng").cast("bigint").alias("n_gaps"),
        F.max(F.expr("CASE WHEN _r = (50 * _ng + 99) div 100 THEN gap END"))
        .cast("bigint")
        .alias("p50_gap_ms"),
        F.max(F.expr("CASE WHEN _r = (90 * _ng + 99) div 100 THEN gap END"))
        .cast("bigint")
        .alias("p90_gap_ms"),
        F.max("gap").cast("bigint").alias("max_gap_ms"),
    )
    groups = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    return groups.join(agg, gc, "left").select(
        gc,
        "n_events",
        F.coalesce(F.col("n_gaps"), F.lit(0)).cast("bigint").alias(
            "n_gaps"
        ),
        "p50_gap_ms",
        "p90_gap_ms",
        "max_gap_ms",
    )


def mann_whitney_u(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with tie-corrected z² per
    group — the PLAIN two-sample location test completing the family
    around its Behrens-Fisher (fligner_policello) and location-scale
    (cucconi) variants. All exact integers from the merged value
    cells (the cliffs_delta counts):

        2U       = 2*n_gt + n_ties          (doubled: no half-ties)
        z2_ppm   = (1e6 * 3 * (2U - mn)^2 * N * (N-1))
                   div (m * n * (N^3 - N - T))
        T        = sum over cells of (t^3 - t), t = cell total

    — the continuity-uncorrected z² with the standard tie-corrected
    variance Var(U) = mn[N(N-1)(N+1) - T]/(12 N(N-1)) cleared into
    one DECIMAL(38,0) floor. NULL when every value is tied (T =
    N^3 - N) or a side is empty. DECIMAL budget: (2U-mn)^2 * N^2 *
    1e6 — safe through m, n ~ 1e5-row groups. Output: (group_key, m,
    n, u2, tie_term, z2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(gc)
    cum = cells.select(
        gc,
        "cx",
        "cy",
        F.sum("cy").over(w_cum).cast("bigint").alias("cum_y"),
        F.sum("cx").over(wn).cast("bigint").alias("m"),
        F.sum("cy").over(wn).cast("bigint").alias("n"),
    )
    agg = cum.groupBy(gc).agg(
        F.max("m").cast("bigint").alias("m"),
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.expr("2 * cx * (cum_y - cy) + cx * cy"))
        .cast("bigint")
        .alias("u2"),
        F.sum(
            F.expr(
                "(cx + cy) * (cx + cy) * (cx + cy) - (cx + cy)"
            )
        )
        .cast("bigint")
        .alias("tie_term"),
    )
    return agg.select(
        gc,
        "m",
        "n",
        "u2",
        "tie_term",
        F.expr(
            "CASE WHEN m > 0 AND n > 0 AND"
            " (m + n) * (m + n) * (m + n) - (m + n) - tie_term > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * 3"
            " * (u2 - m * n) * (u2 - m * n) * (m + n) * (m + n - 1))"
            " div (CAST(m AS DECIMAL(38,0)) * n"
            " * ((m + n) * (m + n) * (m + n) - (m + n) - tie_term))"
            " AS BIGINT) END"
        ).alias("z2_ppm"),
    )


def brunner_munzel(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Brunner-Munzel W² per group — the Behrens-Fisher rank test
    keeping BOTH sample variances (fligner_policello pools them):
    doubled placements from one cumulative window over the merged
    value cells (never an X x Y join), then

        NUM = mn(n - m) + m*B - n*A      (A/B = doubled placement
                                          sums of X in Y / Y in X;
                                          A + B = 2mn exactly)
        V1  = sum (m*D_i - A)^2, V2 = sum (n*D_j - B)^2
        w2_ppm = (1e6 * NUM^2 * (m-1)(n-1))
                 div (N * (V1*(n-1) + V2*(m-1)))

    — the published W² cleared into one exact DECIMAL(38,0) rational
    (derivation in the docstring tests). NULL on zero placement
    variance BOTH sides (complete separation or all-tied — the FP
    convention; NUM keeps the direction). Output: (group_key, m, n,
    num, w2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(gc)
    # doubled placements per CELL: every x in a cell has
    # D = 2*(y strictly below) + (y at the cell); same for y.
    placed = cells.select(
        gc,
        "cx",
        "cy",
        (
            2 * (F.sum("cy").over(w_cum) - F.col("cy")) + F.col("cy")
        )
        .cast("bigint")
        .alias("dx"),
        (
            2 * (F.sum("cx").over(w_cum) - F.col("cx")) + F.col("cx")
        )
        .cast("bigint")
        .alias("dy"),
        F.sum("cx").over(wn).cast("bigint").alias("m"),
        F.sum("cy").over(wn).cast("bigint").alias("n"),
    )
    agg = placed.groupBy(gc).agg(
        F.max("m").cast("bigint").alias("m"),
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.expr("cx * dx")).cast("bigint").alias("_a"),
        F.sum(F.expr("cy * dy")).cast("bigint").alias("_b"),
    )
    # V1 = sum over x of (m*D - A)^2 needs A first — second pass over
    # the cell frame with A/B joined back (cell counts are tiny).
    sums = agg.select(gc, "m", "n", "_a", "_b")
    v12 = (
        placed.join(sums.select(gc, F.col("_a").alias("a"),
                                F.col("_b").alias("b")), gc)
        .groupBy(gc)
        .agg(
            F.sum(
                F.expr(
                    "cx * (CAST(m AS DECIMAL(38,0)) * dx - a)"
                    " * (CAST(m AS DECIMAL(38,0)) * dx - a)"
                )
            ).alias("_v1"),
            F.sum(
                F.expr(
                    "cy * (CAST(n AS DECIMAL(38,0)) * dy - b)"
                    " * (CAST(n AS DECIMAL(38,0)) * dy - b)"
                )
            ).alias("_v2"),
        )
    )
    out = sums.join(v12, gc)
    return out.select(
        gc,
        "m",
        "n",
        F.expr(
            "CAST(m * n * (n - m) + m * _b - n * _a AS BIGINT)"
        ).alias("num"),
        F.expr(
            "CASE WHEN m >= 2 AND n >= 2"
            " AND _v1 * (n - 1) + _v2 * (m - 1) > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (m * n * (n - m) + m * _b - n * _a)"
            " * (m * n * (n - m) + m * _b - n * _a)"
            " * (m - 1) * (n - 1))"
            " div (CAST(m + n AS DECIMAL(38,0))"
            " * (_v1 * (n - 1) + _v2 * (m - 1))) AS BIGINT) END"
        ).alias("w2_ppm"),
    )


def _rank_score_scale_core(cells: DataFrame) -> DataFrame:
    """Shared finite-population core for the rank-score scale tests
    (Mood, Conover): given per-(group, value) cells (cx, cy), assign
    doubled pooled midranks R2 = 2*cum_prev + c + 1, let the caller's
    score column ``s`` (computed from R2/N downstream) drive

        z2_ppm = (1e6 * (N*T - m*S1)^2 * (N-1))
                 div (m * n * (N*S2 - S1^2))

    — the EXACT simple-random-sample moments of a sum of m scores
    drawn from the N pooled scores: E[T] = m*S1/N and Var(T) =
    mn(N*S2 - S1^2)/(N^2 (N-1)). Tie-aware by construction (tied
    cells share a midrank, so the score POPULATION already reflects
    ties — no separate correction term). Expects columns (group_key,
    s, cx, cy); returns (group_key, m, n, t_stat, z2_ppm)."""
    gc = "group_key"
    agg = cells.groupBy(gc).agg(
        F.sum("cx").cast("bigint").alias("m"),
        F.sum("cy").cast("bigint").alias("n"),
        F.sum(F.expr("cx * CAST(s AS DECIMAL(38,0))")).alias("_t"),
        F.sum(F.expr("(cx + cy) * CAST(s AS DECIMAL(38,0))")).alias(
            "_s1"
        ),
        F.sum(
            F.expr("(cx + cy) * CAST(s AS DECIMAL(38,0)) * s")
        ).alias("_s2"),
    )
    return agg.select(
        gc,
        "m",
        "n",
        F.col("_t").cast("bigint").alias("t_stat"),
        F.expr(
            "CASE WHEN m > 0 AND n > 0"
            " AND (m + n) * _s2 - _s1 * _s1 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * ((m + n) * _t - m * _s1) * ((m + n) * _t - m * _s1)"
            " * (m + n - 1))"
            " div (CAST(m AS DECIMAL(38,0)) * n"
            " * ((m + n) * _s2 - _s1 * _s1)) AS BIGINT) END"
        ).alias("z2_ppm"),
    )


def _doubled_midrank_cells(
    df: DataFrame, gc: str = "group_key"
) -> DataFrame:
    """(group, v, cx, cy) cells -> add doubled pooled midrank r2 and
    pooled size nn (2*cum_prev + c + 1 — the ansari_bradley rank
    space: integers under any tie pattern)."""
    w_cum = (
        Window.partitionBy(gc)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(gc)
    return df.select(
        gc,
        "cx",
        "cy",
        (
            2 * (F.sum(F.expr("cx + cy")).over(w_cum)
                 - F.col("cx") - F.col("cy"))
            + F.col("cx") + F.col("cy") + 1
        )
        .cast("bigint")
        .alias("r2"),
        F.sum(F.expr("cx + cy")).over(wn).cast("bigint").alias("nn"),
    )


def mood_scale_test(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Mood two-sample scale test per group — M = sum over X of
    (R - (N+1)/2)^2: extreme pooled ranks score high, so a sample
    holding the tails is the wider one. Doubled midranks make every
    score exact ((R2 - (N+1))^2 = 4*(R - (N+1)/2)^2, integer under
    ties), and the z² comes from the EXACT finite-population SRS
    moments of the score sum (no no-tie approximation — see
    _rank_score_scale_core). NULL when all scores tie. Output:
    (group_key, m, n, t_stat, z2_ppm); t_stat is 4M in doubled
    space."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    ranked = _doubled_midrank_cells(cells, gc)
    scored = ranked.select(
        gc,
        "cx",
        "cy",
        F.expr("(r2 - (nn + 1)) * (r2 - (nn + 1))")
        .cast("bigint")
        .alias("s"),
    )
    return _rank_score_scale_core(scored)


def conover_squared_ranks(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Conover squared-ranks scale test per group — ranks of the
    ABSOLUTE DEVIATIONS from each sample's own mean, squared: the
    scale test that stays valid when the two locations differ
    (ansari/mood rank the raw values, so a location shift masquerades
    as spread). Deviations are made exact integers on a COMMON scale:

        X side: D = n * |m*x - S_x|      (= mn*|x - mean_x|)
        Y side: D = m * |n*y - S_y|

    then doubled pooled midranks of D, scores s = R2², and the exact
    finite-population z² (see _rank_score_scale_core — tie-aware, no
    correction terms). NULL when all deviations tie (both samples
    constant). Output: (group_key, m, n, t_stat, z2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    moms = base.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("_m"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("_n"),
        F.sum(F.expr("CASE WHEN in_x THEN v ELSE 0 END"))
        .cast("bigint")
        .alias("_sx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE v END"))
        .cast("bigint")
        .alias("_sy"),
    )
    dev = base.join(moms, gc).select(
        gc,
        "in_x",
        F.expr(
            "CASE WHEN in_x THEN _n * abs(_m * v - _sx)"
            " ELSE _m * abs(_n * v - _sy) END"
        )
        .cast("bigint")
        .alias("v"),
    )
    cells = dev.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    ranked = _doubled_midrank_cells(cells, gc)
    scored = ranked.select(
        gc, "cx", "cy", F.expr("r2 * r2").cast("bigint").alias("s")
    )
    return _rank_score_scale_core(scored)


def chi2_contingency(
    df: DataFrame, group_col: str, r_col: str, c_col: str
) -> DataFrame:
    """Pearson chi-square + Cramér's V² for an RxC contingency table
    per group — the GENERAL categorical-association test next to
    assoc_2x2 (2x2 only) and cochran_armitage (ordered): observed
    cell counts vs independence expectations r*c/N, cleared into
    per-cell exact integer floors (the anderson_darling cell-floor
    discipline — an exact common denominator over all cells needs an
    lcm of every r*c):

        T1 = sum over OBSERVED cells of
             (1000 * (o*N - r*c)^2) div (r*c)
        T2 = sum over observed cells of 1000 * r*c

    and — because unobserved grid cells still contribute their full
    expectation mass (o=0 gives (rc/N)²/(rc/N) = rc/N, and the grid
    total of rc is exactly N²) —

        chi2_milli = (T1 - T2 + 1000*N*N) div N
        v2_ppm     = (1000 * (T1 - T2 + 1000*N*N))
                     div (N * N * (k-1)),  k = min(levels)

    V² in [0, 1e6]: 0 = independent, 1e6 = perfectly associated
    (a diagonal 2x2 gives chi2 = N and v2_ppm = 1e6 exactly). NULL
    when k < 2. Shape: one groupBy to cells, two marginal windows, one
    rollup — no joins, and the empty-cell mass is ALGEBRAIC (never
    materialize the o=0 grid). Output: (group_key, n, r_levels,
    c_levels, chi2_milli, v2_ppm)."""
    gc = "group_key"
    cells = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(r_col).cast("string").alias("r"),
            F.col(c_col).cast("string").alias("c"),
        )
        .groupBy(gc, "r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    wr = Window.partitionBy(gc, "r")
    wc = Window.partitionBy(gc, "c")
    wn = Window.partitionBy(gc)
    marg = cells.select(
        gc,
        "o",
        F.sum("o").over(wr).cast("bigint").alias("rm"),
        F.sum("o").over(wc).cast("bigint").alias("cm"),
        F.sum("o").over(wn).cast("bigint").alias("n"),
        F.size(F.collect_set("r").over(wn)).cast("bigint").alias("_rl"),
        F.size(F.collect_set("c").over(wn)).cast("bigint").alias("_cl"),
    )
    agg = marg.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("_rl").cast("bigint").alias("r_levels"),
        F.max("_cl").cast("bigint").alias("c_levels"),
        F.sum(
            F.expr(
                "(CAST(1000 AS DECIMAL(38,0))"
                " * (o * n - rm * cm) * (o * n - rm * cm))"
                " div (CAST(rm AS DECIMAL(38,0)) * cm)"
            )
        ).alias("_t1"),
        F.sum(
            F.expr("CAST(1000 AS DECIMAL(38,0)) * rm * cm")
        ).alias("_t2"),
    )
    return agg.select(
        gc,
        "n",
        "r_levels",
        "c_levels",
        F.expr(
            "CAST((_t1 - _t2 + CAST(1000 AS DECIMAL(38,0)) * n * n)"
            " div n AS BIGINT)"
        ).alias("chi2_milli"),
        F.expr(
            "CASE WHEN least(r_levels, c_levels) >= 2 THEN"
            " CAST((1000 * (_t1 - _t2"
            " + CAST(1000 AS DECIMAL(38,0)) * n * n))"
            " div (CAST(n AS DECIMAL(38,0)) * n"
            " * (least(r_levels, c_levels) - 1)) AS BIGINT) END"
        ).alias("v2_ppm"),
    )


def pinball_loss_eval(
    df: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    period: int = 12,
    q_milli: int = 900,
) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecast per
    group — the eval number for QUANTILE forecasts (service-level
    planning reads the 90th percentile, not the mean; WAPE/MASE can't
    score that): with yhat = y_{t-period} and e = y - yhat,

        1000 * pinball_q = q_milli * max(e, 0)
                           + (1000 - q_milli) * max(-e, 0)

    summed exactly (loss1000_total), with the per-point mean floored
    once: mean_loss_milli = loss1000_total div n_eval. Contiguity
    gated at the lag level (t - lag_period(t) = period — the
    forecast_wape rule). High q penalizes UNDER-forecasting q/(1-q)
    times harder. Output: (group_key, n_eval, loss1000_total,
    mean_loss_milli)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    lag_sql = (
        f"lag(v, {period}) OVER (PARTITION BY group_key ORDER BY t)"
    )
    lag_t_sql = (
        f"lag(t, {period}) OVER (PARTITION BY group_key ORDER BY t)"
    )
    ev = base.select(
        gc,
        F.expr(
            f"CASE WHEN t - {lag_t_sql} = {period}"
            f" THEN v - {lag_sql} END"
        ).alias("e"),
    ).where(F.col("e").isNotNull())
    return ev.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(
            F.expr(
                f"{q_milli} * greatest(e, 0)"
                f" + {1000 - q_milli} * greatest(-e, 0)"
            )
        )
        .cast("bigint")
        .alias("loss1000_total"),
    ).select(
        gc,
        "n_eval",
        "loss1000_total",
        F.expr(
            "CAST(loss1000_total div n_eval AS BIGINT)"
        ).alias("mean_loss_milli"),
    )


def smape_eval(
    df: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """Symmetric MAPE of the seasonal-naive forecast per group — the
    per-point-normalized sibling of q_forecast_wape (WAPE normalizes
    by TOTAL volume, so big months dominate; sMAPE gives every month
    one vote): per eval point, 2|e|/(y + yhat) floored to milli so
    the sum is exact and order-independent,

        point_milli = (2000 * |y - yhat|) div (y + yhat)
        smape_milli = (sum point_milli) div n_eval

    Points with y + yhat = 0 are DROPPED and counted (the
    drop-reporting convention — sMAPE is undefined there). Contiguity
    gated at the lag level. Output: (group_key, n_eval, n_dropped,
    smape_milli)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    lag_sql = (
        f"lag(v, {period}) OVER (PARTITION BY group_key ORDER BY t)"
    )
    lag_t_sql = (
        f"lag(t, {period}) OVER (PARTITION BY group_key ORDER BY t)"
    )
    ev = base.select(
        gc,
        F.expr(
            f"CASE WHEN t - {lag_t_sql} = {period} THEN v END"
        ).alias("y"),
        F.expr(
            f"CASE WHEN t - {lag_t_sql} = {period}"
            f" THEN {lag_sql} END"
        ).alias("yh"),
    ).where(F.col("y").isNotNull())
    agg = ev.groupBy(gc).agg(
        F.sum(
            F.expr("CASE WHEN y + yh <> 0 THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("n_eval"),
        F.sum(F.expr("CASE WHEN y + yh = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_dropped"),
        F.sum(
            F.expr(
                "CASE WHEN y + yh <> 0 THEN"
                " (2000 * abs(y - yh)) div (y + yh) ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("_pm"),
    )
    return agg.select(
        gc,
        "n_eval",
        "n_dropped",
        F.expr(
            "CASE WHEN n_eval > 0 THEN"
            " CAST(_pm div n_eval AS BIGINT) END"
        ).alias("smape_milli"),
    )


def lepage_test(
    df: DataFrame, group_col: str, in_x_col: str, v_col: str
) -> DataFrame:
    """Lepage joint location-scale test per group — the classic
    omnibus: the sum of the squared standardized Wilcoxon rank-sum
    (location) and Ansari-Bradley (scale) components, each
    standardized with its EXACT finite-population SRS moments on
    doubled pooled midranks (the _rank_score_scale_core discipline —
    tie-aware, no correction terms):

        score_W  = R2                    (rank-sum)
        score_AB = min(R2, 2(N+1) - R2)  (symmetric fold-in)
        lepage_milli = (z2w_ppm + z2ab_ppm) div 1000

    Both components ride along. A pure location shift drives z2w with
    z2ab ~ 0; a pure scale change the reverse (cucconi is the
    quadratic-rank alternative; Lepage is the standard two-component
    form reviewers expect). NULL components when the respective score
    population is constant. Output: (group_key, m, n, z2w_ppm,
    z2ab_ppm, lepage_milli)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    cells = base.groupBy(gc, "v").agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("cx"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("cy"),
    )
    ranked = _doubled_midrank_cells(cells, gc)
    scored = ranked.select(
        gc,
        "cx",
        "cy",
        F.col("r2").alias("sw"),
        F.least(F.col("r2"), 2 * (F.col("nn") + 1) - F.col("r2"))
        .cast("bigint")
        .alias("sa"),
    )

    def _z2(scol: str, alias: str):
        return F.expr(
            "CASE WHEN m > 0 AND n > 0"
            f" AND (m + n) * _s2{scol} - _s1{scol} * _s1{scol} > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            f" * ((m + n) * _t{scol} - m * _s1{scol})"
            f" * ((m + n) * _t{scol} - m * _s1{scol})"
            " * (m + n - 1))"
            " div (CAST(m AS DECIMAL(38,0)) * n"
            f" * ((m + n) * _s2{scol} - _s1{scol} * _s1{scol}))"
            " AS BIGINT) END"
        ).alias(alias)

    agg = scored.groupBy(gc).agg(
        F.sum("cx").cast("bigint").alias("m"),
        F.sum("cy").cast("bigint").alias("n"),
        F.sum(F.expr("cx * CAST(sw AS DECIMAL(38,0))")).alias("_tw"),
        F.sum(F.expr("(cx + cy) * CAST(sw AS DECIMAL(38,0))")).alias(
            "_s1w"
        ),
        F.sum(
            F.expr("(cx + cy) * CAST(sw AS DECIMAL(38,0)) * sw")
        ).alias("_s2w"),
        F.sum(F.expr("cx * CAST(sa AS DECIMAL(38,0))")).alias("_ta"),
        F.sum(F.expr("(cx + cy) * CAST(sa AS DECIMAL(38,0))")).alias(
            "_s1a"
        ),
        F.sum(
            F.expr("(cx + cy) * CAST(sa AS DECIMAL(38,0)) * sa")
        ).alias("_s2a"),
    )
    out = agg.select(gc, "m", "n", _z2("w", "z2w_ppm"), _z2("a", "z2ab_ppm"))
    return out.select(
        gc,
        "m",
        "n",
        "z2w_ppm",
        "z2ab_ppm",
        F.expr(
            "CASE WHEN z2w_ppm IS NOT NULL AND z2ab_ppm IS NOT NULL THEN"
            " CAST((z2w_ppm + z2ab_ppm) div 1000 AS BIGINT) END"
        ).alias("lepage_milli"),
    )


def diebold_mariano(
    df: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    period: int = 12,
) -> DataFrame:
    """Diebold-Mariano forecast-comparison test per group between the
    naive (lag-1) and seasonal-naive (lag-``period``) forecasters on
    the same series, absolute-error loss, lag-0 variance (h = 1):

        d_t     = |y_t - y_{t-1}| - |y_t - y_{t-period}|
        DM^2    = dbar^2 / (var(d)/n) = S^2 (n-1) / (n Q - S^2)
        dm2_ppm = (1e6 * S^2 * (n-1)) div (n Q - S^2)

    with S = sum d, Q = sum d^2 in exact DECIMAL(38,0) (the
    cancellation happens in integer space per the round-13 wide-int
    rule). d_sum carries the sign: positive means the seasonal-naive
    forecaster wins (smaller loss). Eval points need BOTH lags
    contiguity-gated (t-1 and t-period present); all-equal losses ->
    NULL. DECIMAL budget: |d| <= max monthly value ~1e10 cents at
    sf1 -> 1e6*S^2*n ~ 1e34 < 1e38 through sf10.
    Output: (group_key, n_eval, d_sum, dm2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = f"OVER (PARTITION BY {gc} ORDER BY t)"
    ev = base.select(
        gc,
        F.expr(
            f"CASE WHEN t - lag(t, 1) {w} = 1"
            f" AND t - lag(t, {period}) {w} = {period}"
            f" THEN abs(v - lag(v, 1) {w})"
            f" - abs(v - lag(v, {period}) {w}) END"
        ).alias("d"),
    ).where(F.col("d").isNotNull())
    agg = ev.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0))")).alias("_s"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("_q"),
    )
    return agg.select(
        gc,
        "n_eval",
        F.expr("CAST(_s AS BIGINT)").alias("d_sum"),
        F.expr(
            "CASE WHEN n_eval >= 2"
            " AND n_eval * _q - _s * _s > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * _s * _s"
            " * (n_eval - 1))"
            " div (n_eval * _q - _s * _s) AS BIGINT) END"
        ).alias("dm2_ppm"),
    )


def variance_homogeneity(df: DataFrame, group_col: str, v_col: str) -> DataFrame:
    """Cochran's C and Hartley's F_max variance-homogeneity screens
    across groups — both assume a BALANCED design, so only groups
    whose n equals the global maximum participate (excluded groups
    are counted, the drop-reporting convention). With equal n the
    sample variances share one denominator and the ratios reduce to
    exact integer ratios of var_num = n*Q - S^2:

        c_ppm      = (1e6 * max var_num) div (sum var_num)
        fmax_milli = (1000 * max var_num) div (min var_num)

    C flags one dominating variance (NULL when all var_num = 0);
    F_max is the spread ratio (NULL when the min is 0). Feed
    1000-dollar units at registration (the round-14 unit rule: the
    squares must clear DECIMAL(38,0) at scale). ONE row out:
    (n_groups, n_balanced, n_obs, c_ppm, fmax_milli)."""
    gc = "group_key"
    per = (
        df.select(
            F.col(group_col).alias(gc),
            F.col(v_col).cast("bigint").alias("v"),
        )
        .groupBy(gc)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0))")).alias("_s"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("_q"),
        )
        .select(
            gc,
            "n",
            F.expr("n * _q - _s * _s").alias("var_num"),
        )
    )
    nmax = per.select(F.max("n").alias("n_obs"))
    j = per.crossJoin(F.broadcast(nmax))
    return j.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.expr("CASE WHEN n = n_obs THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_balanced"),
        F.max("n_obs").cast("bigint").alias("n_obs"),
        F.max(F.expr("CASE WHEN n = n_obs THEN var_num END")).alias("_vmax"),
        F.min(F.expr("CASE WHEN n = n_obs THEN var_num END")).alias("_vmin"),
        F.sum(F.expr("CASE WHEN n = n_obs THEN var_num ELSE 0 END")).alias(
            "_vsum"
        ),
    ).select(
        "n_groups",
        "n_balanced",
        "n_obs",
        F.expr(
            "CASE WHEN _vsum > 0 THEN"
            " CAST((1000000 * _vmax) div _vsum AS BIGINT) END"
        ).alias("c_ppm"),
        F.expr(
            "CASE WHEN _vmin > 0 THEN"
            " CAST((1000 * _vmax) div _vmin AS BIGINT) END"
        ).alias("fmax_milli"),
    )


def ewma_weights(span: int) -> list[int]:
    """Exact integer EWMA weights for lambda = 1/4 over a ``span``-long
    window initialized at the first observation: 4^(span-1) * z_last
    = sum_j w_j x_j with w_0 = 3^(span-1) and w_j = 4^(j-1) *
    3^(span-1-j). sum(w) = 4^(span-1) exactly, so the smoother is a
    true weighted mean. Shared by the operator and the registered
    oracle (the seeded-constants trick: exact ints embedded as SQL
    literals)."""
    t = span - 1
    return [3**t] + [4 ** (j - 1) * 3 ** (t - j) for j in range(1, span)]


def ewma_chart(
    df: DataFrame,
    group_col: str,
    t_col: str,
    v_col: str,
    span: int = 13,
) -> DataFrame:
    """EWMA control chart (lambda = 1/4, L = 3) per group over the
    LAST ``span`` contiguous periods — completes the control-chart
    trio next to xbar_r_chart (Shewhart) and cusum (tabular): the
    EWMA catches small sustained shifts the Shewhart chart misses.
    All-exact-integer evaluation via the scaled recursion
    Z = 4^(span-1) * z_last = sum_j w_j x_j (ewma_weights):

        ewma_milli = (1000 * Z) div 4^(span-1)
        mu_milli   = (1000 * S) div span        (window mean)
        sigma-hat  = MR-bar / d2,  d2 = 1128/1000 (n = 2)
        ooc        <=> (z - mu)^2 > 9 * sigma_ewma^2, cleared to
        (span*Z - D*S)^2 * (span-1)^2 * 1128^2 * 7
          > 9e6 * MR^2 * (D^2 - G^2) * span^2
        with D = 4^(span-1), G = 3^(span-1) (sigma_ewma^2 =
        sigma^2 * (1/7) * (1 - (3/4)^(2(span-1)))).

    Groups whose last-span window is not fully populated emit NULL
    stats with n_win reported (the drop-reporting convention).
    Feed 1000-dollar units (round-14 unit rule): the cleared
    inequality peaks ~1e35 at sf1. Output: (group_key, n_win,
    mu_milli, ewma_milli, mr_sum, ooc)."""
    ws = ewma_weights(span)
    denom = 4 ** (span - 1)
    g3 = 3 ** (span - 1)
    w_case = (
        "CASE j "
        + " ".join(f"WHEN {j} THEN {w}" for j, w in enumerate(ws))
        + " END"
    )
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    wspec = f"OVER (PARTITION BY {gc} ORDER BY t)"
    win = base.select(
        gc,
        "v",
        F.expr(f"t - (max(t) OVER (PARTITION BY {gc}) - {span - 1})").alias(
            "j"
        ),
        F.expr(
            f"CASE WHEN t - lag(t, 1) {wspec} = 1"
            f" THEN abs(v - lag(v, 1) {wspec}) ELSE 0 END"
        ).alias("mr"),
    ).where(F.col("j") >= 0)
    agg = win.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_win"),
        F.sum(F.expr(f"CAST({w_case} AS DECIMAL(38,0)) * v")).alias("_z"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0))")).alias("_s"),
        F.sum(
            F.expr(f"CASE WHEN j >= 1 THEN CAST(mr AS DECIMAL(38,0))"
                   " ELSE 0 END")
        ).alias("_mr"),
    )
    lhs = (
        f"(({span} * _z - {denom} * _s) * ({span} * _z - {denom} * _s))"
        f" * {(span - 1) ** 2} * {1128 ** 2} * 7"
    )
    rhs = f"9000000 * (_mr * _mr) * {denom**2 - g3**2} * {span**2}"
    ok = f"n_win = {span}"
    return agg.select(
        gc,
        "n_win",
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST((1000 * _s) div {span} AS BIGINT) END"
        ).alias("mu_milli"),
        F.expr(
            f"CASE WHEN {ok} THEN"
            f" CAST((1000 * _z) div {denom} AS BIGINT) END"
        ).alias("ewma_milli"),
        F.expr(
            f"CASE WHEN {ok} THEN CAST(_mr AS BIGINT) END"
        ).alias("mr_sum"),
        F.expr(f"CASE WHEN {ok} THEN {lhs} > {rhs} END").alias("ooc"),
    )


def snht_test(
    df: DataFrame, group_col: str, t_col: str, v_col: str
) -> DataFrame:
    """Alexandersson's standard normal homogeneity test (SNHT) per
    group — the parametric change-point twin of pettitt_test (that one
    ranks, this one standardizes): T = max_k [k zbar1^2 + (n-k)
    zbar2^2]. Because sum z = 0 the two means collapse and the whole
    statistic clears into exact integers via D_k = n P_k - k S
    (P_k = prefix sum):

        T_k_ppm = (1e6 * D_k^2 * (n-1)) div (k (n-k) (n Q - S^2))

    maximized over k in [1, n-1]; the argmax k (ties -> smallest k,
    identical floors on both engines) is the estimated break point.
    Constant series -> NULL. Feed 1000-dollar units (round-14 rule).
    Output: (group_key, n, t_max_ppm, k_at_max)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = f"OVER (PARTITION BY {gc} ORDER BY t)"
    ww = f"OVER (PARTITION BY {gc})"
    pre = base.select(
        gc,
        F.expr(f"row_number() {w}").cast("bigint").alias("k"),
        F.expr(f"sum(v) {w}").cast("bigint").alias("pk"),
        F.expr(f"count(*) {ww}").cast("bigint").alias("n"),
        F.expr(f"sum(CAST(v AS DECIMAL(38,0))) {ww}").alias("s"),
        F.expr(f"sum(CAST(v AS DECIMAL(38,0)) * v) {ww}").alias("q"),
    ).where(F.expr("k < n"))
    tk = pre.select(
        gc,
        "k",
        "n",
        F.expr(
            "CASE WHEN n * q - s * s > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (n * pk - k * s) * (n * pk - k * s) * (n - 1))"
            " div (k * (n - k) * (n * q - s * s)) AS BIGINT) END"
        ).alias("t_ppm"),
    )
    return (
        tk.groupBy(gc)
        .agg(
            F.max("n").alias("n"),
            F.max("t_ppm").alias("t_max_ppm"),
            F.min(
                F.expr(
                    "CASE WHEN t_ppm IS NOT NULL THEN"
                    " struct(-t_ppm AS neg, k) END"
                )
            ).alias("_am"),
        )
        .select(
            gc,
            "n",
            "t_max_ppm",
            F.expr("_am.k").alias("k_at_max"),
        )
    )


def buishand_range(
    df: DataFrame, group_col: str, t_col: str, v_col: str
) -> DataFrame:
    """Buishand range test per group — the cumulative-deviation
    homogeneity screen that complements snht_test (SNHT peaks at a
    single break; the Buishand range sees drifts too): with
    D_k = n P_k - k S (k in [0, n], D_0 = D_n = 0 so the extremes
    are clamped through 0), R = (max D - min D)/n rescaled by the
    sample sd clears to

        rb2_ppm = (1e6 * (maxD - minD)^2 * (n-1))
                      div (n * (n Q - S^2))

    — exactly ((R/s))^2 in ppm. Constant series -> NULL. Feed
    1000-dollar units. Output: (group_key, n, rb2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(t_col).cast("bigint").alias("t"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = f"OVER (PARTITION BY {gc} ORDER BY t)"
    ww = f"OVER (PARTITION BY {gc})"
    pre = base.select(
        gc,
        F.expr(f"row_number() {w}").cast("bigint").alias("k"),
        F.expr(f"sum(v) {w}").cast("bigint").alias("pk"),
        F.expr(f"count(*) {ww}").cast("bigint").alias("n"),
        F.expr(f"sum(CAST(v AS DECIMAL(38,0))) {ww}").alias("s"),
        F.expr(f"sum(CAST(v AS DECIMAL(38,0)) * v) {ww}").alias("q"),
    )
    agg = pre.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.max(F.expr("greatest(n * pk - k * s, 0)")).alias("_dmax"),
        F.min(F.expr("least(n * pk - k * s, 0)")).alias("_dmin"),
        F.max(F.expr("n * q - s * s")).alias("_vn"),
    )
    return agg.select(
        gc,
        "n",
        F.expr(
            "CASE WHEN _vn > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (_dmax - _dmin) * (_dmax - _dmin) * (n - 1))"
            " div (n * _vn) AS BIGINT) END"
        ).alias("rb2_ppm"),
    )


def hotelling_t2_two_sample(
    df: DataFrame,
    group_col: str,
    in_x_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Two-sample bivariate Hotelling T^2 per group — the multivariate
    generalization of the two-sample t test (does the JOINT (a, b)
    mean differ between samples, accounting for their correlation —
    two marginal t tests miss a correlated shift). The 2x2 pooled
    covariance inverts in closed form through its adjugate, so the
    whole statistic clears into ONE exact integer rational:

        N*  = m*Q - S^2 (per sample, per entry; cross: m*Sab - Sa*Sb)
        C   = n*NX + m*NY          (2x2, = mn(m+n-2) S_pooled)
        e   = (n*SaX - m*SaY, n*SbX - m*SbY)   (= mn * mean diff)
        t2_ppm = (1e6 * (m+n-2) * e'adj(C)e) div ((m+n) * det(C))

    NULL when det(C) <= 0 (a degenerate/collinear pooled covariance —
    the test is undefined). T^2 is PER-VARIABLE scale-invariant
    (e'adj(C)e and det(C) both scale by c_a^2 c_b^2), so choose units
    to fit the DECIMAL(38,0) budget: 1000-dollar revenue at our SFs
    peaks ~1e35 at sf1; move to 10k$ past that. Output: (group_key,
    m, n, t2_ppm)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(in_x_col).cast("boolean").alias("in_x"),
        F.col(a_col).cast("bigint").alias("a"),
        F.col(b_col).cast("bigint").alias("b"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    agg = base.groupBy(gc).agg(
        F.sum(F.expr("CASE WHEN in_x THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("m"),
        F.sum(F.expr("CASE WHEN in_x THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n"),
        *[
            F.sum(
                F.expr(
                    f"CASE WHEN in_x {'=' if x else '<>'} true THEN"
                    f" {expr} ELSE 0 END"
                )
            ).alias(f"_{name}{'x' if x else 'y'}")
            for x in (True, False)
            for name, expr in (
                ("sa", d.format("a")),
                ("sb", d.format("b")),
                ("qa", d.format("a") + " * a"),
                ("qb", d.format("b") + " * b"),
                ("qab", d.format("a") + " * b"),
            )
        ],
    )
    mat = agg.select(
        gc,
        "m",
        "n",
        F.expr("n * (m * _qax - _sax * _sax)"
               " + m * (n * _qay - _say * _say)").alias("_caa"),
        F.expr("n * (m * _qbx - _sbx * _sbx)"
               " + m * (n * _qby - _sby * _sby)").alias("_cbb"),
        F.expr("n * (m * _qabx - _sax * _sbx)"
               " + m * (n * _qaby - _say * _sby)").alias("_cab"),
        F.expr("n * _sax - m * _say").alias("_ea"),
        F.expr("n * _sbx - m * _sby").alias("_eb"),
    )
    return mat.select(
        gc,
        "m",
        "n",
        F.expr(
            "CASE WHEN m >= 2 AND n >= 2"
            " AND _caa * _cbb - _cab * _cab > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * (m + n - 2)"
            " * (_ea * _ea * _cbb - 2 * _ea * _eb * _cab"
            "    + _eb * _eb * _caa))"
            " div ((m + n) * (_caa * _cbb - _cab * _cab))"
            " AS BIGINT) END"
        ).alias("t2_ppm"),
    )


def partial_corr_first_order(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    z_col: str,
) -> DataFrame:
    """First-order partial correlation r_xy.z per group, squared, with
    the sign carried — "is x related to y once z is controlled for"
    (the confounder screen that pairs with hotelling_t2_two_sample on
    the same bivariate frames). With cleared integer co-moments
    cab = n*Sab - Sa*Sb the published form collapses to

        N  = cxy*czz - cxz*cyz
        Dx = cxx*czz - cxz^2,   Dy = cyy*czz - cyz^2
        r_xy.z^2 = N^2 / (Dx * Dy)

    evaluated with PER-FACTOR floors to keep every intermediate
    inside DECIMAL(38,0) at any scale (Dx*Dy overflows first
    otherwise; N^2 <= Dx*Dy by Cauchy-Schwarz bounds each step):

        pc2_ppm = (1e6 * ((N*N) div Dx)) div Dy     [documented floors]

    Pass the LARGER-variance variable as x (its Dx divides first).
    sign_n = sign(N) carries direction. NULL when Dx <= 0 or Dy <= 0
    (z explains x or y exactly — the partial is undefined). Output:
    (group_key, n, sign_n, pc2_ppm)."""
    gc = "group_key"
    d = "CAST({} AS DECIMAL(38,0))"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.col(z_col).cast("bigint").alias("z"),
    )
    agg = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.expr(e)).alias(a)
            for a, e in (
                ("_sx", d.format("x")),
                ("_sy", d.format("y")),
                ("_sz", d.format("z")),
                ("_qxx", d.format("x") + " * x"),
                ("_qyy", d.format("y") + " * y"),
                ("_qzz", d.format("z") + " * z"),
                ("_qxy", d.format("x") + " * y"),
                ("_qxz", d.format("x") + " * z"),
                ("_qyz", d.format("y") + " * z"),
            )
        ],
    )
    com = agg.select(
        gc,
        "n",
        F.expr("n * _qxy - _sx * _sy").alias("cxy"),
        F.expr("n * _qxx - _sx * _sx").alias("cxx"),
        F.expr("n * _qyy - _sy * _sy").alias("cyy"),
        F.expr("n * _qzz - _sz * _sz").alias("czz"),
        F.expr("n * _qxz - _sx * _sz").alias("cxz"),
        F.expr("n * _qyz - _sy * _sz").alias("cyz"),
    ).select(
        gc,
        "n",
        F.expr("cxy * czz - cxz * cyz").alias("_nn"),
        F.expr("cxx * czz - cxz * cxz").alias("_dx"),
        F.expr("cyy * czz - cyz * cyz").alias("_dy"),
    )
    return com.select(
        gc,
        "n",
        F.expr(
            "CASE WHEN _dx > 0 AND _dy > 0 THEN"
            " CAST(sign(_nn) AS BIGINT) END"
        ).alias("sign_n"),
        F.expr(
            "CASE WHEN _dx > 0 AND _dy > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * ((_nn * _nn) div _dx)) div _dy AS BIGINT) END"
        ).alias("pc2_ppm"),
    )


def brown_forsythe_balanced(
    df: DataFrame, group_col: str, v_col: str
) -> DataFrame:
    """Brown-Forsythe test (Levene with group MEDIANS) across groups,
    BALANCED design — the robust variance-homogeneity F completing
    the screen family around variance_homogeneity (Cochran C /
    Hartley F_max flag ratios; Brown-Forsythe is the distribution-
    robust significance test): z_ij = |2 v_ij - (lo_g + hi_g)| (the
    doubled-median trick keeps z integer for even n), then the
    balanced one-way ANOVA F on z clears exactly:

        F = (k*sum T_g^2 - T^2) * (n-1)
              / ((k-1) * (n*Q - sum T_g^2))
        f_milli = 1000-scaled floor of that ratio

    Only groups with the global-max n participate (excluded groups
    counted — the drop-reporting convention shared with
    variance_homogeneity). NULL when k < 2 or the within-group sum
    is 0. ONE row out: (n_groups, n_balanced, n_obs, f_milli)."""
    gc = "group_key"
    base = df.select(
        F.col(group_col).alias(gc),
        F.col(v_col).cast("bigint").alias("v"),
    )
    w = f"OVER (PARTITION BY {gc})"
    ranked = base.select(
        gc,
        "v",
        F.expr(f"row_number() {w.replace(')', ' ORDER BY v)')}")
        .cast("bigint")
        .alias("rn"),
        F.expr(f"count(*) {w}").cast("bigint").alias("n"),
    )
    med = ranked.where(
        F.expr("rn = (n + 1) div 2 OR rn = (n + 2) div 2")
    ).groupBy(gc).agg(
        F.min("n").cast("bigint").alias("n"),
        F.expr(
            "CAST(CASE WHEN count(*) = 1 THEN 2 * min(v)"
            " ELSE min(v) + max(v) END AS BIGINT)"
        ).alias("med2"),
    )
    z = base.join(med, gc).select(
        gc, "n", F.expr("abs(2 * v - med2)").alias("z")
    )
    per = z.groupBy(gc).agg(
        F.max("n").alias("n"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0))")).alias("_t"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z")).alias("_q"),
    )
    nmax = per.select(F.max("n").alias("n_obs"))
    j = per.crossJoin(F.broadcast(nmax))
    glob = j.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.expr("CASE WHEN n = n_obs THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_balanced"),
        F.max("n_obs").cast("bigint").alias("n_obs"),
        F.sum(F.expr("CASE WHEN n = n_obs THEN _t ELSE 0 END")).alias(
            "_tt"
        ),
        F.sum(
            F.expr("CASE WHEN n = n_obs THEN _t * _t ELSE 0 END")
        ).alias("_t2"),
        F.sum(F.expr("CASE WHEN n = n_obs THEN _q ELSE 0 END")).alias(
            "_qq"
        ),
    )
    return glob.select(
        "n_groups",
        "n_balanced",
        "n_obs",
        F.expr(
            "CASE WHEN n_balanced >= 2"
            " AND n_obs * _qq - _t2 > 0 THEN"
            " CAST((CAST(1000 AS DECIMAL(38,0))"
            " * (n_balanced * _t2 - _tt * _tt) * (n_obs - 1))"
            " div ((n_balanced - 1) * (n_obs * _qq - _t2))"
            " AS BIGINT) END"
        ).alias("f_milli"),
    )
