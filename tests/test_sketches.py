"""Property tests for the sketch operators (operators/sketches.py).

The cell-exact oracle parity run (test_oracle_parity.py picks up the
q_* registrations automatically) proves cross-engine equality; these
tests pin the SEMANTIC guarantees each sketch must keep:

- HLL: registers merge by MAX across arbitrary splits (the property
  that makes one-pass 100 TB sketching and cross-day unioning sound),
  and the estimate lands within the theoretical error band.
- CMS: never undercounts (est >= exact for every candidate).
- Bloom: never a false negative, and the word table stays bounded.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators import sketches as sk
from kafka_streams_aggregate_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hll_registers_merge_by_max(spark):
    orders = load_table(spark, "orders", SF)
    key, grp = F.col("o_custkey"), F.lit("all")
    full = sk.hll_registers(orders, key=key, group=grp)
    # Split on an arbitrary predicate, sketch each half independently,
    # merge with MAX — must equal the single-pass sketch exactly.
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = (
        sk.hll_registers(lo, key=key, group=grp)
        .unionAll(sk.hll_registers(hi, key=key, group=grp))
        .groupBy("grp", "idx")
        .agg(F.max("r").alias("r"))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_estimate_within_error_band(spark):
    orders = load_table(spark, "orders", SF)
    out = sk.hll_summarize(
        sk.hll_registers(
            orders, key=F.col("o_custkey"), group=F.lit("all")
        )
    ).collect()[0]
    exact = orders.select("o_custkey").distinct().count()
    # Standard error for m=64 is 1.04/sqrt(64) = 13%; allow 4 sigma.
    rel_err = abs(out["est_distinct"] - exact) / exact
    assert rel_err < 4 * 1.04 / math.sqrt(sk.HLL_M), (
        f"HLL est {out['est_distinct']:.1f} vs exact {exact}"
    )


def test_cms_never_undercounts(spark):
    orders = load_table(spark, "orders", SF)
    counters = sk.cms_counters(orders, key=F.col("o_custkey"))
    exact = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    cells = exact.select(
        "o_custkey",
        "exact_cnt",
        F.posexplode(sk.cms_cols(F.col("o_custkey"))).alias("j", "col"),
    )
    est = (
        cells.join(F.broadcast(counters), ["j", "col"])
        .groupBy("o_custkey", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    bad = est.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    assert bad == 0


def test_cms_counter_grid_is_bounded(spark):
    orders = load_table(spark, "orders", SF)
    n = sk.cms_counters(orders, key=F.col("o_custkey")).count()
    assert n <= sk.CMS_D * sk.CMS_W


def test_bloom_no_false_negatives_and_bounded(spark):
    orders = load_table(spark, "orders", SF)
    keys = orders.select(F.col("o_custkey").alias("bkey")).distinct()
    words = sk.bloom_build(keys, "bkey")
    assert words.count() <= sk.BLOOM_WORDS
    # every member must pass its own filter
    probed = sk.bloom_probe(keys.withColumnRenamed("bkey", "k"), "k", words)
    assert probed.filter(~F.col("bloom_pass")).count() == 0


def test_bloom_rejects_most_non_members(spark):
    orders = load_table(spark, "orders", SF)
    keys = orders.select(F.col("o_custkey").alias("bkey")).distinct()
    words = sk.bloom_build(keys, "bkey")
    # probe a disjoint key range: custkey+10_000_000 is never a member
    ghosts = keys.select((F.col("bkey") + 10_000_000).alias("k"))
    n = ghosts.count()
    fp = sk.bloom_probe(ghosts, "k", words).filter("bloom_pass").count()
    # sf0.001 load factor gives fp-rate well under 1%; 10% is a loose lid
    assert fp <= max(2, n // 10), f"{fp}/{n} ghost keys passed"


def test_bloom_probe_preserves_duplicate_rows(spark):
    # Regression: grouping the K per-row lookups by probe COLUMNS both
    # collapsed duplicate rows and made n_hits = K*multiplicity != K,
    # reporting true members as false negatives.
    probe = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k long, tag string"
    )
    members = spark.createDataFrame([(1,), (2,), (3,)], "bkey long")
    words = sk.bloom_build(members, "bkey")
    out = sk.bloom_probe(probe, "k", words).collect()
    assert len(out) == 3, out
    assert all(r["bloom_pass"] for r in out), out


def test_bloom_empty_build_rejects_everything(spark):
    empty = spark.createDataFrame([], "bkey long")
    words = sk.bloom_build(empty, "bkey")
    probe = spark.createDataFrame([(1,), (2,)], "k long")
    out = sk.bloom_probe(probe, "k", words).collect()
    assert len(out) == 2 and not any(r["bloom_pass"] for r in out)


def test_hll_empty_input_yields_no_groups(spark):
    import pyspark.sql.functions as F

    empty = spark.createDataFrame([], "k long, g string")
    regs = sk.hll_registers(empty, key=F.col("k"), group=F.col("g"))
    assert sk.hll_summarize(regs).count() == 0


def test_bloom_probe_null_key_fails_closed(spark):
    # A NULL probe key makes md5(NULL) -> NULL positions; a plain
    # explode would silently DROP that row. explode_outer keeps it
    # with bloom_pass=false (fail-closed, row-preserving).
    members = spark.createDataFrame([(1,), (2,)], "bkey long")
    words = sk.bloom_build(members, "bkey")
    probe = spark.createDataFrame(
        [(1, "a"), (None, "b")], "k long, tag string"
    )
    out = {r["tag"]: r["bloom_pass"] for r in
           sk.bloom_probe(probe, "k", words).collect()}
    assert out == {"a": True, "b": False}, out


def test_hist_quantile_sketch_error_bound_and_merge(spark):
    # (a) every estimate is >= the exact percentile and within one bin
    #     width above it (upper-edge answer + ceil-rank);
    # (b) mergeability: binning two disjoint halves and vector-adding
    #     the counts yields the same sketch as one pass over the union.
    import pyspark.sql.functions as F

    from kafka_streams_aggregate_spark.operators.sketches import (
        hist_quantile_sketch,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", "/root/testdata/sf0.01")
    got = {
        r["o_orderpriority"]: r
        for r in hist_quantile_sketch(
            orders, "o_orderpriority", "o_totalprice", width=500, nbins=1024
        ).collect()
    }
    rows = orders.select("o_orderpriority", "o_totalprice").collect()
    from collections import defaultdict

    vals = defaultdict(list)
    for r in rows:
        vals[r["o_orderpriority"]].append(r["o_totalprice"])
    for grp, vs in vals.items():
        vs.sort()
        n = len(vs)
        for p in (50, 90, 99):
            exact = vs[(p * n + 99) // 100 - 1]
            est = got[grp][f"p{p}_est"]
            assert exact <= est <= exact + 500, (grp, p, exact, est)

    half_a = orders.filter(F.col("o_orderkey") % 2 == 0)
    half_b = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = {
        r["o_orderpriority"]: r
        for r in hist_quantile_sketch(
            half_a.unionAll(half_b),
            "o_orderpriority", "o_totalprice", width=500, nbins=1024,
        ).collect()
    }
    for grp in got:
        for col in ("n_rows", "p50_est", "p90_est", "p99_est"):
            assert merged[grp][col] == got[grp][col], (grp, col)
