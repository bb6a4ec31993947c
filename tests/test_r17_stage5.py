"""Round-17 staging, batch 5 — chunk-granular exact-duplicate profile
(the scalable Lee-et-al exact-substring approximation) and the MOSS
winnowing fingerprint profile (operators/dedup.py). Registration-ready
view-based oracle texts in CHUNK_DUP_ORACLE / WINNOW_ORACLE; planned
input is the documents table per source. NOT registered this round.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

CHUNK_DUP_ORACLE = """
    WITH base AS (
        SELECT source AS g, doc_id,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) // 20 AS nc
        FROM documents
    ),
    ex AS (
        SELECT g, doc_id,
               md5(array_to_string(list_slice(toks,
                   CAST((i - 1) * 20 + 1 AS INT),
                   CAST(i * 20 AS INT)), ' ')) AS h
        FROM (SELECT g, doc_id, toks, unnest(range(1, nc + 1)) AS i
              FROM base)
    ),
    per_hash AS (
        SELECT g, h, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
        FROM ex GROUP BY g, h
    ),
    prof AS (
        SELECT g, CAST(SUM(cnt) AS BIGINT) AS total_chunks,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                    AS BIGINT) AS dup_chunks,
               CAST(SUM(CASE WHEN nd > 1 THEN cnt ELSE 0 END)
                    AS BIGINT) AS crossdoc_dup_chunks,
               CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_clusters,
               CAST(MAX(cnt) AS BIGINT) AS max_cluster
        FROM per_hash GROUP BY g
    ),
    docs AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN nc = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_short_docs
        FROM base GROUP BY g
    )
    SELECT d.g AS group_key, d.n_docs, d.n_short_docs,
           coalesce(p.total_chunks, 0) AS total_chunks,
           coalesce(p.dup_chunks, 0) AS dup_chunks,
           coalesce(p.crossdoc_dup_chunks, 0) AS crossdoc_dup_chunks,
           coalesce(p.n_dup_clusters, 0) AS n_dup_clusters,
           coalesce(p.max_cluster, 0) AS max_cluster,
           CASE WHEN coalesce(p.total_chunks, 0) > 0 THEN
                CAST((1000000 * p.dup_chunks) // p.total_chunks
                     AS BIGINT) END AS dup_ppm
    FROM docs d LEFT JOIN prof p ON p.g = d.g
"""

WINNOW_ORACLE = """
    WITH tk AS (
        SELECT source AS g, doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS l
        FROM documents
    ),
    gr AS (
        SELECT g, doc_id, l - 2 AS p_total,
               unnest(list_transform(range(1, l - 2 + 1),
                   p -> struct_pack(pos := p - 1,
                        gram := array_to_string(list_slice(toks,
                            CAST(p AS INT), CAST(p + 2 AS INT)), ' '))))
                   AS pg
        FROM tk WHERE l >= 3
    ),
    keys AS (
        SELECT g, doc_id, p_total, pg.pos AS pos,
               (('0x' || substr(md5(pg.gram), 1, 8))::BIGINT
                 % 2147483648) * 2147483648
                 + (2147483647 - pg.pos) AS key
        FROM gr
    ),
    wins AS (
        SELECT g, doc_id, pos, p_total,
               MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
        FROM keys
    ),
    anch AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS total_anchors FROM (
            SELECT DISTINCT g, doc_id,
                   2147483647 - (mk % 2147483648) AS apos
            FROM wins WHERE pos <= p_total - 4
        ) GROUP BY g
    ),
    docs AS (
        SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN greatest(
                        len(string_split(text, ' ')) - 2, 0) < 4
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
               CAST(SUM(greatest(len(string_split(text, ' ')) - 2, 0))
                    AS BIGINT) AS total_grams,
               CAST(SUM(CASE WHEN len(string_split(text, ' ')) - 2 >= 4
                        THEN len(string_split(text, ' ')) - 2 - 3
                        ELSE 0 END) AS BIGINT) AS total_windows
        FROM documents GROUP BY source
    )
    SELECT d.g AS group_key, d.n_docs, d.n_short_docs, d.total_grams,
           d.total_windows,
           coalesce(a.total_anchors, 0) AS total_anchors,
           CASE WHEN d.total_grams > 0 THEN
                CAST((1000000 * coalesce(a.total_anchors, 0))
                     // d.total_grams AS BIGINT) END AS density_ppm
    FROM docs d LEFT JOIN anch a ON a.g = d.g
"""


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
