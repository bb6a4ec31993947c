"""Round-16 ADVICE fixes (the three r15 low-severity items): the
horvitz_thompson zero-rate guard, the url_normalize_dedup utm_
LIKE-wildcard escape, and the schemeless-URL pass-through.
"""

from __future__ import annotations


def test_horvitz_thompson_zero_rate_nulls(spark):
    """An all-zero-rate stratum (rate = _rate_min = 0) must emit NULL
    est_total/err_ppm, not throw ANSI DIVIDE_BY_ZERO — the round-14
    never-throw-on-degenerate-input convention."""
    from kafka_streams_aggregate_spark.operators.sampling import (
        horvitz_thompson,
    )

    rows = (
        [("zero", i, 100, 0) for i in range(6)]
        + [("const", 100 + i, 100, 64) for i in range(4)]
    )
    df = spark.createDataFrame(
        rows, "stratum string, id long, v long, rate long"
    )
    out = {r["stratum"]: r for r in horvitz_thompson(
        df, "stratum", "id", "v", "rate").collect()}
    assert out["zero"]["est_total"] is None
    assert out["zero"]["err_ppm"] is None
    assert out["zero"]["n_sampled"] == 0
    # the healthy stratum in the same frame still estimates
    assert out["const"]["est_total"] == out["const"]["true_total"] == 400
    assert out["const"]["err_ppm"] == 0


def test_url_dedup_utm_prefix_not_wildcard(spark):
    """`utm_%` LIKE patterns treat `_` as a single-char wildcard, so
    `utmost=1` used to be stripped; the substr comparison keeps it."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        url_normalize_dedup,
    )

    rows = [
        (1, "s", "https://a.example.com/p?utmost=1"),
        (2, "s", "https://a.example.com/p"),
        (3, "s", "https://a.example.com/q?utm_source=x"),
        (4, "s", "https://a.example.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, url string")
    [r] = url_normalize_dedup(df).collect()
    # utmost=1 survives normalization (rows 1/2 distinct); utm_source
    # is stripped (rows 3/4 collapse) -> exactly one dup.
    assert r["n_raw_urls"] == 4
    assert r["n_norm_urls"] == 3
    assert r["dup_excess"] == 1


def test_url_dedup_schemeless_passthrough(spark):
    """URLs the scheme/host regexp can't parse pass through as their
    raw selves instead of all collapsing onto the '://' key."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        url_normalize_dedup,
    )

    rows = [
        (1, "s", "not-a-url-one"),
        (2, "s", "also not a url"),
        (3, "s", "/relative/path?x=1"),
        (4, "s", "HTTPS://Host.example.com/p/"),
        (5, "s", "https://host.example.com/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, url string")
    [r] = url_normalize_dedup(df).collect()
    # three unparseable URLs stay distinct; the two parseable ones
    # collapse (case + trailing slash) -> 5 raw, 4 normalized.
    assert r["n_raw_urls"] == 5
    assert r["n_norm_urls"] == 4
    assert r["dup_excess"] == 1
