"""Declared-query registry.

Every operator the engine claims is registered here as a pair:
  - ``spark``: Callable[(SparkSession, sf_dir) -> DataFrame] — the
    Spark-first implementation,
  - ``oracle``: equivalent ANSI SQL for the DuckDB oracle (or None for
    genuinely non-SQL-expressible ops, which get a rows-only check).

``__spark_entry__.py`` exposes this registry to the driver. Column
names are aliased identically on both sides (the driver's compare sorts
columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""
    bench: bool = True  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = True,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    def _wrap(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(
            name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags,
        )
        return fn

    return _wrap


def load_all() -> dict[str, QueryDef]:
    """Import every query-bearing module (side effect: registration)."""
    import kafka_streams_aggregate_spark.queries.inventory  # noqa: F401
    import kafka_streams_aggregate_spark.queries.relational  # noqa: F401
    import kafka_streams_aggregate_spark.queries.llm_data  # noqa: F401

    return QUERIES


# The external driver's correctness snapshot records at most ~50 queries
# per round (round 1 recorded exactly the first 50 of 65, in iteration
# order). With more declared queries than snapshot slots, iteration order
# decides which get driver-verified each round, so ``ordered()`` front-
# loads: (tier 1) queries that have never had a driver correctness row,
# (tier 2) queries whose implementation or oracle changed this round,
# (tier 3) the core reference-parity set (re-verified every round),
# (tier 4) everything else in registration order — already green in a
# prior round's snapshot and unchanged since.
_TIER_1_NEVER_VERIFIED = (
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_dedup_clusters",
    "q_sim_cosine_topk",
    "q_sim_cosine_topk_gemm",
    "q_sim_ann_lsh",
    "q_text_token_stats",
    "q_text_subtoken_counts",
    "q_text_lang_id",
    "q_text_quality",
    "q_text_fingerprint",
    "q_text_quality_by_lang",
    "q_multimodal_features",
    "q_multimodal_frame_sample",
    # round 2 additions — never driver-verified yet
    "q_text_dup_ngram_ratio",
    "q_text_ngram_topk",
    "q_split_hash",
    "q_pack_sequences",
    "q_stream_static_join",
    "q_sim_ann_ivf",
    "q_text_tfidf",
    "q_text_contamination",
    "q_text_redact",
    "q_embed_quantize",
    "q_sample_stratified",
    "q_stream_stream_join",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q_exact_moments",
    "q_scd2_order_status",
    "q_pagerank_parts",
    "q_lateral_topn_orders",
    "q_stream_dedup_window",
    "q_timeseries_locf",
    "q_hof_word_stats",
    "q_custom_source_inventory",
    "q_event_funnel",
    "q_retention_cohorts",
    "q_cdc_merge_snapshot",
    "q_dup_rate_by_source",
    "q_mixture_weights",
    "q_shuffle_deterministic",
    "q_dedup_canonical",
    "q_approx_distinct_kmv",
    "q_zorder_layout",
    # errored in r01 (array-hash bug, since fixed) — no green row yet
    "q_approx_aggregates",
    "q_text_oov_rate",
    "q19_brand_size_revenue",
)
_TIER_2_CHANGED_THIS_ROUND = (
    "q_range_frame_window",
    "q_session_window_native",
    "q5_local_supplier_volume",
    "q_broadcast_star_agg",
    "q_dedup_ngram_jaccard",
)
_TIER_3_CORE_PARITY = (
    "q_agg_inventory",
    "q_upsert_latest",
    "q_agg_inventory_stream",
    "q_tumbling_window_stream",
    "q_agg_inventory_nullsafe",
)


def ordered() -> dict[str, QueryDef]:
    """All queries, iteration order = driver-verification priority."""
    all_q = load_all()
    tiers = {
        name: t
        for t, names in enumerate(
            (_TIER_1_NEVER_VERIFIED, _TIER_2_CHANGED_THIS_ROUND, _TIER_3_CORE_PARITY)
        )
        for name in names
    }
    missing = set(tiers) - set(all_q)
    if missing:
        raise ValueError(f"priority tiers name unknown queries: {sorted(missing)}")
    reg_pos = {name: i for i, name in enumerate(all_q)}
    return dict(
        sorted(all_q.items(), key=lambda kv: (tiers.get(kv[0], 9), reg_pos[kv[0]]))
    )
