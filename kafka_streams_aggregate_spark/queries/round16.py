"""Round-16 registrations: the staged batch-2 queue (Kuiper
two-sample, exact 1-D Wasserstein) graduating to driver-verified
queries, plus this round's fresh registrations as they land.

Every query wraps an operator that staged with unit tests and a
pre-validated cross-engine oracle text (tests/test_r16_stage2.py and
the fresh tests/test_r16_*.py files); oracle SQL is single-sourced
here (view-based — the parity tests import these constants and CREATE
the driver's view names over the sf0.001 parquet, the r15 pattern).

Reference scope note: the reference app (dturanski/
kafka-streams-aggregate, KafkaStreamsInventoryCountApplication.java:
69-85) has no batch-analytics surface — all rows here are
absent-category build-out per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table

# Shared per-nation monthly-revenue epoch split (cents) — the
# q_fligner_policello / q_cucconi input: X = even-numbered years,
# Y = odd. Cents are fine for both staged statistics: Kuiper is
# count-only and Wasserstein is LINEAR in the value (no n-scaled
# squares — the round-14 unit rule does not bite; w1 budget
# documented in operators/stats.py:wasserstein_1d).
_MONTHLY_X_SQL = """
    base AS (
        SELECT g, t, v, (t // 12) % 2 = 0 AS in_x FROM (
            SELECT CAST(c.c_nationkey AS BIGINT) AS g,
                   CAST((year(o.o_orderdate) - 1992) * 12
                        + month(o.o_orderdate) - 1 AS BIGINT) AS t,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c
              ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
    ),
    cells AS (
        SELECT g, v,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS cx,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS cy
        FROM base GROUP BY g, v
    )
"""


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )


def _monthly_epoch_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _monthly_revenue(spark, sf_dir).select(
        "g", "t", "v", F.expr("(t div 12) % 2 = 0").alias("in_x")
    )


# --------------------------------------------------------------------------
# Staged batch 2: distribution-shift pair (operators/stats.py;
# tests/test_r16_stage2.py — hand pins + sf0.001 parity pre-validated)
# --------------------------------------------------------------------------

KUIPER_ORACLE = (
    "    WITH "
    + _MONTHLY_X_SQL
    + """,
    cum AS (
        SELECT g,
               CAST(SUM(cx) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS i,
               CAST(SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS j,
               CAST(SUM(cx) OVER (PARTITION BY g) AS BIGINT) AS m,
               CAST(SUM(cy) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM cells
    ),
    agg AS (
        SELECT g, CAST(MAX(m) AS BIGINT) AS m,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(n * i - m * j) AS BIGINT) AS dp,
               CAST(MAX(m * j - n * i) AS BIGINT) AS dm
        FROM cum GROUP BY g
    )
    SELECT g AS group_key, m, n,
           CAST(greatest(dp, 0) AS BIGINT) AS dplus_num,
           CAST(greatest(dm, 0) AS BIGINT) AS dminus_num,
           CASE WHEN m > 0 AND n > 0 THEN
                CAST((1000000 * (greatest(dp, 0) + greatest(dm, 0)))
                     // (m * n) AS BIGINT) END AS v_ppm
    FROM agg
"""
)


@register(
    "q_kuiper",
    oracle=KUIPER_ORACLE,
    doc=(
        "Kuiper two-sample test per nation on the even/odd-year "
        "monthly-revenue split: V = D+ + D- on cross-multiplied "
        "merged-cell ECDFs — catches the symmetric tail swap KS "
        "halves (X={1,4}/Y={2,3} has KS D = 1/2 but V = 1 exactly). "
        "One groupBy to cells, one cumulative window, one aggregate; "
        "all exact integers. tests/test_r16_stage2.py (staged r16 "
        "batch 2, graduated same-round per the r14 precedent)."
    ),
    tags=("stats", "nonparametric", "distribution-shift", "exact-integer"),
)
def q_kuiper(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        kuiper_two_sample,
    )

    return kuiper_two_sample(
        _monthly_epoch_split(spark, sf_dir), "g", "in_x", "v"
    )


WASSERSTEIN_ORACLE = (
    "    WITH "
    + _MONTHLY_X_SQL
    + """,
    cum AS (
        SELECT g, v,
               CAST(SUM(cx) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS i,
               CAST(SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS j,
               lead(v) OVER (PARTITION BY g ORDER BY v) AS vn,
               CAST(SUM(cx) OVER (PARTITION BY g) AS BIGINT) AS m,
               CAST(SUM(cy) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM cells
    ),
    agg AS (
        SELECT g, CAST(MAX(m) AS BIGINT) AS m,
               CAST(MAX(n) AS BIGINT) AS n,
               SUM(CASE WHEN vn IS NOT NULL THEN
                   (vn - v) * CAST(abs(n * i - m * j) AS HUGEINT)
                   ELSE 0 END) AS w1
        FROM cum GROUP BY g
    )
    SELECT g AS group_key, m, n,
           CAST(w1 AS BIGINT) AS w1_scaled,
           CASE WHEN m > 0 AND n > 0 THEN
                CAST((1000 * w1) // (CAST(m AS HUGEINT) * n) AS BIGINT)
           END AS w1_milli
    FROM agg
"""
)


@register(
    "q_wasserstein_drift",
    oracle=WASSERSTEIN_ORACLE,
    doc=(
        "Exact 1-D Wasserstein-1 distance per nation on the same "
        "epoch split — the drift MAGNITUDE in cents the ks/kuiper/TVD "
        "tests can't give: w1_scaled = sum over support gaps of "
        "(v_next - v)*|n*i - m*j| = W1*m*n, exact integers under the "
        "bounded-group budget (a pure shift by 5 gives W1 = 5 "
        "exactly). tests/test_r16_stage2.py (staged r16 batch 2, "
        "graduated same-round)."
    ),
    tags=("stats", "distribution-shift", "drift", "exact-integer"),
)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import wasserstein_1d

    return wasserstein_1d(
        _monthly_epoch_split(spark, sf_dir), "g", "in_x", "v"
    )


# --------------------------------------------------------------------------
# Wave 2: the three r15-verdict LLM-data directions — semantic dedup
# (SemDeDup-style, embedding side), cross-source NEAR-dup (minhash over
# the source-pair rollup), 13-gram decontamination (published practice).
# tests/test_r16_fresh_llm.py.
# --------------------------------------------------------------------------


def _semantic_dedup_oracle(
    n_planes: int = 4, dim: int = 64, seed: int = 42, threshold: float = 0.3
) -> str:
    """DuckDB twin of ``semantic_dedup``: seeded hyperplanes embedded
    as literals (exact repr round-trip), the same sign-code bucket
    assignment, the same single-sqrt sequential-fold cosine, the same
    keep-lowest-id drop rule — cell-exact end to end (the
    _ann_lsh_oracle trick pointed at a rollup)."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        _hyperplanes,
    )

    planes = _hyperplanes(n_planes, dim, seed)
    code = " + ".join(
        "(CASE WHEN list_inner_product(v, ["
        + ", ".join(repr(x) for x in p)
        + f"]::DOUBLE[]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH base AS (
        SELECT CAST(vec_id AS BIGINT) AS id, label,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    coded AS (SELECT id, label, v, {code} AS code FROM base),
    dropped AS (
        SELECT DISTINCT b.id
        FROM coded a JOIN coded b ON a.code = b.code AND a.id < b.id
        WHERE list_inner_product(a.v, b.v)
              / sqrt(list_inner_product(a.v, a.v)
                     * list_inner_product(b.v, b.v)) >= {threshold!r}
    ),
    agg AS (
        SELECT c.label, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped
        FROM coded c LEFT JOIN dropped d ON d.id = c.id
        GROUP BY c.label
    )
    SELECT label, n_docs, n_dropped,
           CAST(n_docs - n_dropped AS BIGINT) AS n_kept,
           CAST((1000000 * n_dropped) // n_docs AS BIGINT) AS drop_ppm
    FROM agg
    """


@register(
    "q_dedup_semantic",
    oracle=_semantic_dedup_oracle(),
    doc=(
        "SemDeDup-style semantic dedup rollup over the embeddings "
        "table (the r15 verdict's embedding-side direction): seeded-"
        "hyperplane LSH cells (the published recipe's k-means cells, "
        "re-expressed as the repo's codegen'd sign codes), bit-exact "
        "sequential-fold cosine within cells, keep-lowest-id one-shot "
        "pruning, per-label drop counts. Sublinear: pair volume is "
        "sum(cell^2), n_planes the knob. tests/test_r16_fresh_llm.py."
    ),
    tags=("llm-data", "dedup", "embedding", "semantic"),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.similarity import (
        semantic_dedup,
    )

    return semantic_dedup(load_table(spark, "embeddings", sf_dir))


def _xsrc_neardup_oracle() -> str:
    """Wrap the proven minhash-md5 pair oracle in a source-pair
    rollup: the nested-WITH subquery reuses the registration-proven
    q_dedup_minhash_lsh_md5 text verbatim, so the pair semantics
    cannot drift between the two queries."""
    from kafka_streams_aggregate_spark.queries.llm_data import (
        _minhash_md5_oracle,
    )

    return f"""
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN p.jaccard >= 1.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_pairs,
           MAX(p.jaccard) AS max_jaccard
    FROM ({_minhash_md5_oracle()}) p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    WHERE da.source <> db.source
    GROUP BY 1, 2
    """


@register(
    "q_cross_source_neardup",
    oracle=_xsrc_neardup_oracle(),
    doc=(
        "Cross-source NEAR-duplicate matrix (the r15 verdict's "
        "direction beyond the lead-8 fingerprint): q_cross_source_dups "
        "finds syndicated ledes only; this runs the full MinHash+LSH "
        "pipeline (md5 hash family — cell-exact oracle, the "
        "q_dedup_minhash_lsh_md5 twin trick) and rolls verified pairs "
        "up per unordered source pair with exact-dup counts and the "
        "parity-safe max jaccard. Pair volume stays duplicate-cluster-"
        "sized (band equi-join). tests/test_r16_fresh_llm.py."
    ),
    tags=("llm-data", "dedup", "minhash", "cross-source", "md5-family"),
)
def q_cross_source_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.dedup import (
        cross_source_neardup_matrix,
    )

    return cross_source_neardup_matrix(
        load_table(spark, "documents", sf_dir),
        "doc_id",
        "text",
        "source",
        n=3,
        k=32,
        bands=8,
        threshold=0.02,
        hash_family="md5",
    )


def _eval_decontam_13g_oracle() -> str:
    from kafka_streams_aggregate_spark.queries.round15 import (
        _eval_prep_oracle,
    )

    return _eval_prep_oracle(contam_n=13)


@register(
    "q_eval_decontam_13g",
    oracle=_eval_decontam_13g_oracle(),
    doc=(
        "13-gram variant of the eval-prep capstone — the published-"
        "practice n-gram length (GPT-3's decontamination used "
        "13-grams): the identical pool -> quality -> decontam -> "
        "stratified funnel with membership digests, differing from "
        "q_eval_prep_pipeline ONLY in the shingle length, so the two "
        "rows bracket the saturation argument documented in "
        "operators/llm_prep.py (3-grams saturate, 8-grams isolate "
        "planted near-dups, 13-grams match published practice). "
        "tests/test_r16_fresh_llm.py."
    ),
    tags=("llm-data", "capstone", "eval", "decontamination", "md5-family"),
)
def q_eval_decontam_13g(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        eval_prep_pipeline,
    )

    return eval_prep_pipeline(
        load_table(spark, "documents", sf_dir), contam_n=13
    )
