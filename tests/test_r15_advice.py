"""Round-15 ADVICE fixes (the five r14 low-severity items): seed
forwarding in dedup_cluster_profile, the katz iters>=2 guard, and the
zero-denominator / rate-constancy NULL conventions in
neyman_allocation, mixture_temperature, horvitz_thompson.
"""

from __future__ import annotations

import inspect

import pytest


def test_cluster_profile_seed_default_and_forwarding(spark):
    """seed now forwards to minhash_lsh_pairs; the default (42) equals
    minhash_lsh_pairs' own default so the registered md5 oracle's
    embedded seed-42 constants stay valid for default callers."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        dedup_cluster_profile,
        minhash_lsh_pairs,
    )

    sig = inspect.signature(dedup_cluster_profile)
    assert sig.parameters["seed"].default == 42
    assert inspect.signature(minhash_lsh_pairs).parameters["seed"].default == 42

    # a non-default seed must run end-to-end (previously silently 42)
    rows = [(1, "a b c d e f"), (2, "a b c d e f"), (3, "zz yy xx ww vv")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_cluster_profile(
        df, hash_family="md5", threshold=0.02, seed=7
    ).collect()
    # docs 1 and 2 are identical -> one 2-doc cluster under any seed
    assert len(out) == 1
    assert (out[0]["n_clusters"], out[0]["dup_excess"]) == (1, 1)


def test_katz_iters_guard(spark):
    from kafka_streams_aggregate_spark.operators.graph import katz_centrality

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="iters >= 2"):
        katz_centrality(edges, iters=1)


def test_neyman_all_zero_variance_nulls(spark):
    """Every stratum constant-valued -> total Neyman weight 0: the
    shares/alloc are NULL (the repo's zero-denominator convention),
    not an ANSI DIVIDE_BY_ZERO throw."""
    from kafka_streams_aggregate_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = [("a", 5), ("a", 5), ("b", 9), ("b", 9), ("b", 9)]
    df = spark.createDataFrame(rows, "stratum string, v long")
    out = {r["stratum"]: r for r in neyman_allocation(
        df, "stratum", "v", budget=100).collect()}
    assert set(out) == {"a", "b"}
    for r in out.values():
        assert r["w_neyman"] == 0
        assert r["share_ppm"] is None and r["alloc"] is None


def test_mixture_temperature_all_empty_nulls(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        mixture_temperature,
    )

    rows = [(1, "s1", ""), (2, "s2", "  ")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_temperature(df, token_budget=100).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_tokens"] == 0 and r["w_temp"] == 0
        assert r["nat_share_ppm"] is None
        assert r["temp_share_ppm"] is None
        assert r["alloc_tokens"] is None


def test_horvitz_thompson_varying_rate_nulls(spark):
    """Rates varying within a stratum violate the single-floor HT
    assumption -> est_total/err_ppm NULL (loud), never a silently
    biased total; a constant-rate stratum in the same frame still
    estimates."""
    from kafka_streams_aggregate_spark.operators.sampling import (
        horvitz_thompson,
    )

    rows = (
        [("vary", i, 100, 8 if i % 2 == 0 else 16) for i in range(10)]
        + [("const", 100 + i, 100, 64) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "stratum string, id long, v long, rate long")
    out = {r["stratum"]: r for r in horvitz_thompson(
        df, "stratum", "id", "v", "rate").collect()}
    assert out["vary"]["est_total"] is None
    assert out["vary"]["err_ppm"] is None
    # rate 64 of 64 -> everything sampled, estimate exact
    assert out["const"]["est_total"] == out["const"]["true_total"] == 400
    assert out["const"]["err_ppm"] == 0
