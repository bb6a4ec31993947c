"""Round-17 staging, batch 5 — chunk-granular exact-duplicate profile
(the scalable Lee-et-al exact-substring approximation) and the MOSS
winnowing fingerprint profile (operators/dedup.py). Both GRADUATED
same-round as q_chunk_dup_profile / q_winnowing (wave 15); oracles
single-sourced in queries/round16.py and imported here.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    CHUNK_DUP_ORACLE,
    WINNOW_ORACLE,
)

def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT *"
            f" FROM read_parquet('{SF}/documents.parquet')"
        )
        return con.sql(sql).df()
    finally:
        con.close()


def test_chunk_dup_hand(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        chunk_dup_profile,
    )

    # W=2: d1 "a b a b a b" -> 3x "a b"; d2 "a b c d" -> "a b","c d";
    # d3 "x" -> no full chunk. "a b" cnt=4 across 2 docs.
    rows = [("g", 1, "a b a b a b"), ("g", 2, "a b c d"), ("g", 3, "x")]
    df = spark.createDataFrame(rows, "src string, doc_id long, text string")
    [r] = chunk_dup_profile(df, "doc_id", "text", "src",
                            chunk_tokens=2).collect()
    assert (r["n_docs"], r["n_short_docs"]) == (3, 1)
    assert (r["total_chunks"], r["dup_chunks"]) == (5, 4)
    assert r["crossdoc_dup_chunks"] == 4
    assert (r["n_dup_clusters"], r["max_cluster"]) == (1, 4)
    assert r["dup_ppm"] == 800_000

    # all-unique chunks -> zero dup
    rows = [("u", 1, "a b c d")]
    df = spark.createDataFrame(rows, "src string, doc_id long, text string")
    [r] = chunk_dup_profile(df, "doc_id", "text", "src",
                            chunk_tokens=2).collect()
    assert r["dup_chunks"] == 0 and r["dup_ppm"] == 0


def test_chunk_dup_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        chunk_dup_profile,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = chunk_dup_profile(
        docs, "doc_id", "text", "source", chunk_tokens=20
    ).toPandas()
    _cmp(got, _duck(CHUNK_DUP_ORACLE), ["group_key"])


def _winnow_ref(toks, k=3, w=4):
    p_total = len(toks) - k + 1
    if p_total < 1:
        return set(), 0, 0
    hs = []
    for p in range(p_total):
        gram = " ".join(toks[p : p + k])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % (1 << 31)
        hs.append(h)
    anchors = set()
    for s in range(max(p_total - w + 1, 0)):
        best = min(range(s, s + w), key=lambda q: (hs[q], -q))
        anchors.add(best)
    return anchors, p_total, max(p_total - w + 1, 0)


def test_winnowing_matches_reference(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        winnowing_profile,
    )

    rng = random.Random(2025)
    docs = []
    for d in range(25):
        n = rng.randint(1, 40)
        toks = [rng.choice("abc") for _ in range(n)]  # heavy ties
        docs.append((f"g{d % 3}", d, toks))
    df = spark.createDataFrame(
        [(g, i, " ".join(t)) for g, i, t in docs],
        "src string, doc_id long, text string",
    )
    got = {
        r["group_key"]: r
        for r in winnowing_profile(
            df, "doc_id", "text", "src", k=3, w=4
        ).collect()
    }
    for g in {g for g, *_ in docs}:
        anchors = grams = wins = short = 0
        for gg, _, toks in docs:
            if gg != g:
                continue
            a, p, nw = _winnow_ref(toks)
            anchors += len(a)
            grams += p
            wins += nw
            short += 1 if p < 4 else 0
        r = got[g]
        assert r["total_anchors"] == anchors
        assert r["total_grams"] == grams
        assert r["total_windows"] == wins
        assert r["n_short_docs"] == short
        if grams:
            assert r["density_ppm"] == 10**6 * anchors // grams


def test_winnowing_guarantee():
    # the winnowing property the selection scheme is FOR: any two
    # docs sharing a run of >= w+k-1 tokens share an anchor HASH
    rng = random.Random(7)
    shared = [rng.choice("pqrstuv") for _ in range(6)]  # w+k-1 = 6
    a = [rng.choice("abc") for _ in range(10)] + shared
    b = shared + [rng.choice("xyz") for _ in range(10)]
    aa, *_ = _winnow_ref(a)
    bb, *_ = _winnow_ref(b)

    def hashes(toks, sel):
        return {
            int(
                hashlib.md5(" ".join(toks[p : p + 3]).encode()).hexdigest()[
                    :8
                ],
                16,
            )
            % (1 << 31)
            for p in sel
        }

    assert hashes(a, aa) & hashes(b, bb)


def test_winnowing_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        winnowing_profile,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = winnowing_profile(
        docs, "doc_id", "text", "source", k=3, w=4
    ).toPandas()
    _cmp(got, _duck(WINNOW_ORACLE), ["group_key"])
