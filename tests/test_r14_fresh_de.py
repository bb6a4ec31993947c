"""Round-14 fresh queue, batches 4-5 — int8 Lloyd step, Neyman
allocation, Horvitz-Thompson (operators/similarity.py, sampling.py)
and Katz centrality + bipartite rich club (operators/graph.py).
Registration-ready oracle texts in the *_ORACLE constants.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

KMEANS_ORACLE = """
    WITH sc AS (
        SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS e,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                    x -> abs(x))) AS s
        FROM read_parquet('{sf}/embeddings.parquet')
    ),
    nrm AS (
        SELECT vid,
               list_transform(e, x -> CAST(floor(127 * x / s) AS BIGINT))
                   AS c8,
               CAST(list_sum(list_transform(
                    list_transform(e, x -> CAST(floor(127 * x / s)
                        AS BIGINT)), x -> x * x)) AS BIGINT) AS n8
        FROM sc WHERE s > 0
    ),
    cent AS (
        SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR)),
                    vid) - 1 AS BIGINT) AS centroid_id,
               vid AS seed_vid, c8 AS cc8, n8 AS cn8
        FROM nrm
        QUALIFY row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR)),
                vid) <= 8
    ),
    pairs AS (
        SELECT v.vid, c.centroid_id, c.seed_vid,
               CAST(v.n8 + c.cn8
                    - 2 * list_dot_product(v.c8, c.cc8) AS BIGINT)
                   AS dist,
               v.c8[1] AS d0
        FROM nrm v CROSS JOIN cent c
    ),
    assigned AS (
        SELECT * FROM pairs
        QUALIFY row_number() OVER (PARTITION BY vid
                ORDER BY dist ASC, centroid_id ASC) = 1
    )
    SELECT centroid_id, seed_vid, CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(SUM(dist) AS BIGINT) AS sse,
           CAST(SUM(d0) AS BIGINT) AS sum_d0
    FROM assigned GROUP BY centroid_id, seed_vid
"""

NEYMAN_ORACLE = """
    WITH per AS (
        SELECT c_mktsegment AS stratum, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               SUM(CAST(CAST(floor(c_acctbal * 100) AS BIGINT) AS HUGEINT)
                   * CAST(floor(c_acctbal * 100) AS BIGINT)) AS q
        FROM read_parquet('{sf}/customer.parquet') GROUP BY 1
    ),
    sc AS (
        SELECT stratum, n,
               CAST((CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                    // 1073741824 AS BIGINT) AS vn_scaled
        FROM per
    ),
    wn AS (
        SELECT stratum, n, vn_scaled,
               CAST(floor(sqrt(CAST(vn_scaled AS DOUBLE))) AS BIGINT)
                   AS w_neyman
        FROM sc
    ),
    tot AS (SELECT CAST(SUM(w_neyman) AS BIGINT) AS w FROM wn),
    staged AS (
        SELECT stratum, n, vn_scaled, w_neyman,
               CAST((1000000 * w_neyman) // w AS BIGINT) AS share_ppm,
               CAST((10000 * w_neyman) // w AS BIGINT) AS base,
               CAST((10000 * w_neyman) % w AS BIGINT) AS rem
        FROM wn, tot
    )
    SELECT stratum, n, vn_scaled, w_neyman, share_ppm,
           CAST(base + CASE WHEN row_number() OVER
                    (ORDER BY rem DESC, stratum)
                <= 10000 - SUM(base) OVER () THEN 1 ELSE 0 END AS BIGINT)
               AS alloc
    FROM staged
"""

HT_ORACLE = """
    WITH base AS (
        SELECT o_orderpriority AS stratum,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
               CAST(8 * ((length(o_orderpriority) % 4) + 1) AS BIGINT)
                   AS rate,
               ('0x' || substr(md5('ht|' || CAST(o_orderkey AS VARCHAR)),
                    1, 15))::BIGINT % 64 AS res
        FROM read_parquet('{sf}/orders.parquet')
    ),
    agg AS (
        SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_pop,
               CAST(SUM(CASE WHEN res < rate THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled,
               CAST(MAX(rate) AS BIGINT) AS rate,
               CAST(SUM(v) AS BIGINT) AS true_total,
               CAST(SUM(CASE WHEN res < rate THEN v ELSE 0 END) AS BIGINT)
                   AS ss
        FROM base GROUP BY stratum
    )
    SELECT stratum, n_pop, n_sampled, rate, true_total,
           CAST((ss * 64) // rate AS BIGINT) AS est_total,
           CASE WHEN true_total <> 0 THEN
                CAST((CAST(1000000 AS HUGEINT)
                      * ((ss * 64) // rate - true_total))
                     // true_total AS BIGINT) END AS err_ppm
    FROM agg
"""

_EDGES_SYM = """
    e AS MATERIALIZED (
        SELECT DISTINCT CAST(2 * l_suppkey + 1 AS BIGINT) AS src,
               CAST(2 * l_partkey AS BIGINT) AS dst
        FROM read_parquet('{sf}/lineitem.parquet')
        UNION
        SELECT DISTINCT CAST(2 * l_partkey AS BIGINT),
               CAST(2 * l_suppkey + 1 AS BIGINT)
        FROM read_parquet('{sf}/lineitem.parquet')
    )
"""

KATZ_ORACLE = (
    "    WITH "
    + _EDGES_SYM
    + """,
    x1 AS MATERIALIZED (
        SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS v
        FROM e GROUP BY dst
    ),
    x2 AS MATERIALIZED (
        SELECT e.dst AS node, CAST(SUM(x1.v) AS BIGINT) AS v
        FROM e JOIN x1 ON x1.node = e.src GROUP BY e.dst
    ),
    x3 AS MATERIALIZED (
        SELECT e.dst AS node, CAST(SUM(x2.v) AS BIGINT) AS v
        FROM e JOIN x2 ON x2.node = e.src GROUP BY e.dst
    ),
    x4 AS MATERIALIZED (
        SELECT e.dst AS node, CAST(SUM(x3.v) AS BIGINT) AS v
        FROM e JOIN x3 ON x3.node = e.src GROUP BY e.dst
    ),
    katz AS (
        SELECT x1.node,
               CAST(64 * x1.v + 16 * COALESCE(x2.v, 0)
                    + 4 * COALESCE(x3.v, 0) + COALESCE(x4.v, 0)
                    AS BIGINT) AS katz_scaled,
               x1.v AS x1, CAST(COALESCE(x2.v, 0) AS BIGINT) AS x2
        FROM x1
        LEFT JOIN x2 ON x2.node = x1.node
        LEFT JOIN x3 ON x3.node = x1.node
        LEFT JOIN x4 ON x4.node = x1.node
    )
    SELECT node, katz_scaled, x1, x2,
           CAST(row_number() OVER (ORDER BY katz_scaled DESC, node)
                AS BIGINT) AS rank
    FROM katz
    QUALIFY row_number() OVER (ORDER BY katz_scaled DESC, node) <= 20
"""
)

RICHCLUB_ORACLE = """
    WITH e AS (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
               CAST(l_partkey AS BIGINT) AS dst
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    sdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS sdeg
             FROM e GROUP BY src),
    ddeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS ddeg
             FROM e GROUP BY dst),
    tagged AS (
        SELECT e.src, e.dst, sdeg, ddeg
        FROM e JOIN sdeg USING (src) JOIN ddeg USING (dst)
    ),
    ks AS (SELECT unnest([4, 8, 16]) AS k),
    per AS (
        SELECT CAST(k AS BIGINT) AS k_threshold,
               CAST(COUNT(DISTINCT CASE WHEN sdeg > k THEN src END)
                    AS BIGINT) AS n_src_club,
               CAST(COUNT(DISTINCT CASE WHEN ddeg > k THEN dst END)
                    AS BIGINT) AS n_dst_club,
               CAST(SUM(CASE WHEN sdeg > k AND ddeg > k THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_club_edges
        FROM tagged, ks GROUP BY k
    )
    SELECT k_threshold, n_src_club, n_dst_club, n_club_edges,
           CASE WHEN n_src_club * n_dst_club > 0 THEN
                CAST((1000000 * n_club_edges)
                     // (n_src_club * n_dst_club) AS BIGINT) END
               AS density_ppm
    FROM per
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
        return con.sql(sql.format(sf=SF)).df()
    finally:
        con.close()


def test_kmeans_int8_parity(spark):
    from kafka_streams_aggregate_spark.operators.similarity import (
        kmeans_int8_step,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF)
    got = kmeans_int8_step(emb, k=8).toPandas()
    assert got["n_assigned"].sum() == 500  # every vector assigned once
    _cmp(got, _duck(KMEANS_ORACLE), ["centroid_id"])


def test_kmeans_int8_hand_values(spark):
    """Two far clusters, k=2: members assign to their own seed and
    the identical-point member has distance 0."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        kmeans_int8_step,
    )

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 1.0]),
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_int8_step(df, k=2).collect()
    assert sum(r["n_assigned"] for r in out) == 4
    assert all(r["sse"] == 0 for r in out)  # exact duplicates only


def test_neyman_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.sampling import (
        neyman_allocation,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF).select(
        F.col("c_mktsegment").alias("stratum"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )
    got = neyman_allocation(cust, "stratum", "v", budget=10_000).toPandas()
    _cmp(got, _duck(NEYMAN_ORACLE), ["stratum"])
    assert got["alloc"].sum() == 10_000


def test_neyman_hand_values(spark):
    """A zero-variance stratum gets weight 0; a high-variance one
    takes (almost) the whole budget — the allocation favors spread,
    not size (the point of Neyman over proportional)."""
    from kafka_streams_aggregate_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = [("flat", v) for v in [5, 5, 5, 5]] + [
        ("wild", v) for v in [0, 1 << 20, 0, 1 << 20]
    ]
    df = spark.createDataFrame(rows, "stratum string, v long")
    out = {r["stratum"]: r
           for r in neyman_allocation(df, "stratum", "v", 100,
                                      vn_shift=0).collect()}
    assert out["flat"]["w_neyman"] == 0
    assert out["wild"]["alloc"] == 100


def test_horvitz_thompson_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.sampling import (
        horvitz_thompson,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF).select(
        F.col("o_orderpriority").alias("stratum"),
        F.col("o_orderkey").alias("id"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("v"),
        F.expr(
            "CAST(8 * ((length(o_orderpriority) % 4) + 1) AS BIGINT)"
        ).alias("rate"),
    )
    got = horvitz_thompson(orders, "stratum", "id", "v", "rate").toPandas()
    _cmp(got, _duck(HT_ORACLE), ["stratum"])
    # sanity: estimates land within 25% of truth at these rates
    err = (got["est_total"] - got["true_total"]).abs() / got["true_total"]
    assert (err < 0.25).all()


def test_horvitz_thompson_hand_values(spark):
    """rate = mod_base: everything sampled, estimate == truth,
    err_ppm == 0 exactly."""
    from kafka_streams_aggregate_spark.operators.sampling import (
        horvitz_thompson,
    )

    rows = [("g", i, 100, 64) for i in range(10)]
    df = spark.createDataFrame(rows, "stratum string, id long, v long,"
                                     " rate long")
    [r] = horvitz_thompson(df, "stratum", "id", "v", "rate").collect()
    assert r["n_sampled"] == 10
    assert r["est_total"] == r["true_total"] == 1000
    assert r["err_ppm"] == 0


def test_katz_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import katz_centrality
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    fwd = li.select(
        F.expr("CAST(2 * l_suppkey + 1 AS BIGINT)").alias("src"),
        F.expr("CAST(2 * l_partkey AS BIGINT)").alias("dst"),
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    got = katz_centrality(edges, iters=4, alpha_inv=4, top_n=20).toPandas()
    _cmp(got, _duck(KATZ_ORACLE), ["rank"])


def test_katz_hand_values(spark):
    """Star graph a->c, b->c (symmetrized): c collects 2 length-1
    walks, a/b collect 1 each plus the length-2 walks back through
    c. Exact scaled sums with alpha_inv=2, iters=2: katz(c) =
    2*2 + (x2 at c = 2) = 6; katz(a) = 2*1 + 2 = 4."""
    from kafka_streams_aggregate_spark.operators.graph import katz_centrality

    rows = [(1, 3), (2, 3), (3, 1), (3, 2)]
    df = spark.createDataFrame(rows, "src long, dst long")
    out = {r["node"]: r
           for r in katz_centrality(df, iters=2, alpha_inv=2,
                                    top_n=10).collect()}
    assert out[3]["katz_scaled"] == 6 and out[3]["rank"] == 1
    assert out[1]["katz_scaled"] == 4
    assert out[2]["katz_scaled"] == 4


def test_rich_club_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import (
        rich_club_bipartite,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    edges = li.select(
        F.col("l_suppkey").cast("bigint").alias("src"),
        F.col("l_partkey").cast("bigint").alias("dst"),
    )
    got = rich_club_bipartite(edges, thresholds=(4, 8, 16)).toPandas()
    _cmp(got, _duck(RICHCLUB_ORACLE), ["k_threshold"])


def test_rich_club_hand_values(spark):
    """One hub pair (deg 3 each, connected) among leaves: at k=2 the
    club is exactly the hub pair with its single edge -> density
    1e6. At k=3 the club is empty -> NULL."""
    from kafka_streams_aggregate_spark.operators.graph import (
        rich_club_bipartite,
    )

    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10), (4, 13)]
    df = spark.createDataFrame(rows, "src long, dst long")
    out = {r["k_threshold"]: r
           for r in rich_club_bipartite(df, thresholds=(2, 3)).collect()}
    assert out[2]["n_src_club"] == 1 and out[2]["n_dst_club"] == 1
    assert out[2]["n_club_edges"] == 1
    assert out[2]["density_ppm"] == 1_000_000
    assert out[3]["density_ppm"] is None
