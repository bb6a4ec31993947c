"""Round-17 staging, batch 6 — two-sample bivariate Hotelling T^2
(operators/stats.py, the repo's first multivariate test) and winnowing
candidate pairs (operators/dedup.py, the match stage over q_winnowing's
anchors). Registration-ready view-based oracle texts in
HOTELLING_ORACLE / WINNOW_PAIRS_ORACLE. NOT registered this round.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

HOTELLING_ORACLE = """
    WITH base AS (
        SELECT g, t, a, b, (t // 12) % 2 = 0 AS in_x FROM (
            SELECT CAST(c.c_nationkey AS BIGINT) AS g,
                   CAST((year(o.o_orderdate) - 1992) * 12
                        + month(o.o_orderdate) - 1 AS BIGINT) AS t,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        // 100000 AS BIGINT) AS a,
                   CAST(COUNT(*) AS BIGINT) AS b
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
    ),
    agg AS (
        SELECT g,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS m,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS n,
               SUM(CASE WHEN in_x THEN CAST(a AS HUGEINT)
                   ELSE 0 END) AS sax,
               SUM(CASE WHEN in_x THEN CAST(b AS HUGEINT)
                   ELSE 0 END) AS sbx,
               SUM(CASE WHEN in_x THEN CAST(a AS HUGEINT) * a
                   ELSE 0 END) AS qax,
               SUM(CASE WHEN in_x THEN CAST(b AS HUGEINT) * b
                   ELSE 0 END) AS qbx,
               SUM(CASE WHEN in_x THEN CAST(a AS HUGEINT) * b
                   ELSE 0 END) AS qabx,
               SUM(CASE WHEN in_x THEN 0
                   ELSE CAST(a AS HUGEINT) END) AS say,
               SUM(CASE WHEN in_x THEN 0
                   ELSE CAST(b AS HUGEINT) END) AS sby,
               SUM(CASE WHEN in_x THEN 0
                   ELSE CAST(a AS HUGEINT) * a END) AS qay,
               SUM(CASE WHEN in_x THEN 0
                   ELSE CAST(b AS HUGEINT) * b END) AS qby,
               SUM(CASE WHEN in_x THEN 0
                   ELSE CAST(a AS HUGEINT) * b END) AS qaby
        FROM base GROUP BY g
    ),
    mat AS (
        SELECT g, m, n,
               n * (m * qax - sax * sax)
                 + m * (n * qay - say * say) AS caa,
               n * (m * qbx - sbx * sbx)
                 + m * (n * qby - sby * sby) AS cbb,
               n * (m * qabx - sax * sbx)
                 + m * (n * qaby - say * sby) AS cab,
               n * sax - m * say AS ea,
               n * sbx - m * sby AS eb
        FROM agg
    )
    SELECT g AS group_key, m, n,
           CASE WHEN m >= 2 AND n >= 2
                AND caa * cbb - cab * cab > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * (m + n - 2)
                      * (ea * ea * cbb - 2 * ea * eb * cab
                         + eb * eb * caa))
                     // ((m + n) * (caa * cbb - cab * cab))
                     AS BIGINT) END AS t2_ppm
    FROM mat
"""

_WINNOW_ANCHORS = """
    tk AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS l
        FROM documents
    ),
    gr AS (
        SELECT doc_id, l - 2 AS p_total,
               unnest(list_transform(range(1, l - 2 + 1),
                   p -> struct_pack(pos := p - 1,
                        gram := array_to_string(list_slice(toks,
                            CAST(p AS INT), CAST(p + 2 AS INT)), ' '))))
                   AS pg
        FROM tk WHERE l >= 3
    ),
    keys AS (
        SELECT doc_id, p_total, pg.pos AS pos,
               (('0x' || substr(md5(pg.gram), 1, 8))::BIGINT
                 % 2147483648) * 2147483648
                 + (2147483647 - pg.pos) AS key
        FROM gr
    ),
    wins AS (
        SELECT doc_id, pos, p_total,
               MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk
        FROM keys
    ),
    anchors AS (
        SELECT DISTINCT doc_id AS id, mk // 2147483648 AS h
        FROM wins WHERE pos <= p_total - 4
    )
"""

WINNOW_PAIRS_ORACLE = (
    "    WITH "
    + _WINNOW_ANCHORS
    + """,
    sizes AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM anchors GROUP BY id
    ),
    capped AS (
        SELECT * FROM anchors WHERE h IN (
            SELECT h FROM anchors GROUP BY h HAVING COUNT(*) <= 50
        )
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM capped a JOIN capped b
          ON a.h = b.h AND a.id < b.id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.id_a, p.id_b, p.n_shared,
           CAST((1000 * p.n_shared) // least(sa.sz, sb.sz) AS BIGINT)
               AS overlap_milli
    FROM pairs p
    JOIN sizes sa ON sa.id = p.id_a
    JOIN sizes sb ON sb.id = p.id_b
"""
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql, tables=("orders", "customer")):
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def test_hotelling_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        hotelling_t2_two_sample,
    )

    # X = {(0,0),(2,0)}, Y = {(1,1),(1,3)}: S_pooled = I,
    # d = (0,-2) -> T^2 = (mn/(m+n)) d'd = 4
    rows = [
        ("g", True, 0, 0), ("g", True, 2, 0),
        ("g", False, 1, 1), ("g", False, 1, 3),
    ]
    df = spark.createDataFrame(rows, "g string, in_x boolean, a long, b long")
    [r] = hotelling_t2_two_sample(df, "g", "in_x", "a", "b").collect()
    assert (r["m"], r["n"]) == (2, 2)
    assert r["t2_ppm"] == 4_000_000

    # collinear pooled covariance (b = a everywhere) -> det 0 -> NULL
    rows = [
        ("c", True, 0, 0), ("c", True, 2, 2),
        ("c", False, 1, 1), ("c", False, 3, 3),
    ]
    df = spark.createDataFrame(rows, "g string, in_x boolean, a long, b long")
    [r] = hotelling_t2_two_sample(df, "g", "in_x", "a", "b").collect()
    assert r["t2_ppm"] is None


def test_hotelling_scale_invariance(spark):
    # per-variable scaling leaves T^2 exactly invariant (e'adj(C)e and
    # det(C) both scale by ca^2 * cb^2) — including the ppm floor
    from kafka_streams_aggregate_spark.operators.stats import (
        hotelling_t2_two_sample,
    )

    rng = random.Random(8)
    rows = [
        (f"g{i % 4}", i % 2 == 0, rng.randint(0, 50), rng.randint(0, 9))
        for i in range(80)
    ]
    scaled = [(g, x, a * 7, b * 13) for g, x, a, b in rows]

    def run(rs):
        df = spark.createDataFrame(
            rs, "g string, in_x boolean, a long, b long"
        )
        return sorted(
            tuple(r)
            for r in hotelling_t2_two_sample(
                df, "g", "in_x", "a", "b"
            ).collect()
        )

    assert run(rows) == run(scaled)


def test_hotelling_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        hotelling_t2_two_sample,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))"
                " div 100000 AS BIGINT)"
            ).alias("a"),
            F.count(F.lit(1)).cast("bigint").alias("b"),
        )
        .select("g", "a", "b", F.expr("(t div 12) % 2 = 0").alias("in_x"))
    )
    got = hotelling_t2_two_sample(base, "g", "in_x", "a", "b").toPandas()
    _cmp(got, _duck(HOTELLING_ORACLE), ["group_key"])


def _winnow_ref_hashes(toks, k=3, w=4):
    p_total = len(toks) - k + 1
    if p_total < 1:
        return set()
    hs = []
    for p in range(p_total):
        gram = " ".join(toks[p : p + k])
        hs.append(
            int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % (1 << 31)
        )
    sel = set()
    for s in range(max(p_total - w + 1, 0)):
        sel.add(min(range(s, s + w), key=lambda q: (hs[q], -q)))
    return {hs[p] for p in sel}


def test_winnowing_pairs_matches_bruteforce(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        winnowing_pairs,
    )

    rng = random.Random(77)
    shared = [rng.choice("pqrs") for _ in range(12)]
    docs = []
    for d in range(20):
        n = rng.randint(6, 25)
        toks = [rng.choice("abcde") for _ in range(n)]
        if d % 4 == 0:  # plant a shared run -> guaranteed anchors
            toks = toks[:3] + shared + toks[3:]
        docs.append((d, toks))
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["overlap_milli"])
        for r in winnowing_pairs(
            df, "doc_id", "text", min_shared=2, max_doc_freq=50
        ).collect()
    }
    fps = {i: _winnow_ref_hashes(t) for i, t in docs}
    dfreq = {}
    for s in fps.values():
        for h in s:
            dfreq[h] = dfreq.get(h, 0) + 1
    capped = {
        i: {h for h in s if dfreq[h] <= 50} for i, s in fps.items()
    }
    exp = {}
    ids = sorted(fps)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            ns = len(capped[ia] & capped[ib])
            if ns >= 2:
                exp[(ia, ib)] = (
                    ns,
                    1000 * ns // min(len(fps[ia]), len(fps[ib])),
                )
    assert got == exp
    assert len(exp) >= 6  # the planted family actually pairs up


def test_winnowing_pairs_parity(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        winnowing_pairs,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = winnowing_pairs(
        docs, "doc_id", "text", min_shared=2, max_doc_freq=50
    ).toPandas()
    _cmp(got, _duck(WINNOW_PAIRS_ORACLE, tables=("documents",)),
         ["id_a", "id_b"])
