"""Graph round-12 staging — Jaccard link prediction, local clustering
coefficient, personalized PageRank (operators/graph.py).

Registration-ready oracle texts in JACCARD_LP_ORACLE / CC_ORACLE /
ppr_oracle() (the last a generated chained-CTE unroll, the repo's
bounded-iteration oracle trick).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# support>=2 co-purchase part graph — same derivation as the RA query
_EDGES_SQL = """
    ik AS (SELECT DISTINCT l_orderkey, l_partkey
           FROM read_parquet('{sf}/lineitem.parquet')),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM ik a JOIN ik b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION ALL SELECT dst, src FROM edges
    )
"""

JACCARD_LP_ORACLE = (
    "WITH " + _EDGES_SQL + """,
    deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ),
    common AS (
        SELECT za.dst AS node_a, zb.dst AS node_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM sym za JOIN sym zb
          ON zb.src = za.src AND za.dst < zb.dst
        GROUP BY 1, 2
    ),
    nonedges AS (
        SELECT c.* FROM common c
        LEFT JOIN edges e ON e.src = c.node_a AND e.dst = c.node_b
        WHERE e.src IS NULL
    ),
    scored AS (
        SELECT node_a, node_b, n_common,
               da.deg AS deg_a, db.deg AS deg_b,
               CAST((1000000 * n_common)
                    // (da.deg + db.deg - n_common) AS BIGINT)
                   AS jaccard_ppm
        FROM nonedges
        JOIN deg da ON da.node = node_a
        JOIN deg db ON db.node = node_b
    )
    SELECT node_a, node_b, n_common, deg_a, deg_b, jaccard_ppm,
           CAST(row_number() OVER (
               ORDER BY jaccard_ppm DESC, node_a, node_b) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 100
"""
)

CC_ORACLE = (
    "WITH " + _EDGES_SQL + """,
    tris AS (
        SELECT x.src AS a, x.dst AS b, y.dst AS c
        FROM edges x JOIN edges y ON x.dst = y.src
        JOIN edges z ON z.src = x.src AND z.dst = y.dst
    ),
    tcounts AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT a AS node FROM tris
              UNION ALL SELECT b FROM tris
              UNION ALL SELECT c FROM tris)
        GROUP BY node
    ),
    deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ),
    scored AS (
        SELECT d.node, d.deg, COALESCE(t.n_triangles, 0) AS n_triangles,
               CASE WHEN d.deg >= 2
                    THEN CAST((1000000 * 2 * COALESCE(t.n_triangles, 0))
                              // (d.deg * (d.deg - 1)) AS BIGINT) END
                   AS cc_ppm
        FROM deg d LEFT JOIN tcounts t ON t.node = d.node
    )
    SELECT node, deg, n_triangles, cc_ppm,
           CAST(row_number() OVER (
               ORDER BY cc_ppm DESC, deg DESC, node) AS BIGINT) AS rank
    FROM scored WHERE cc_ppm IS NOT NULL QUALIFY rank <= 100
"""
)


def ppr_oracle(sf: str, iterations: int, seed_mod: int) -> str:
    """Unrolled chained-CTE PPR: one contrib/rank stage per iteration
    (AS MATERIALIZED per the bounded-iteration oracle rule)."""
    parts = [
        "WITH "
        + _EDGES_SQL.format(sf=sf)
        + f""",
    dege AS MATERIALIZED (
        SELECT src, dst,
               COUNT(*) OVER (PARTITION BY src) AS deg
        FROM sym
    ),
    seeds AS MATERIALIZED (
        SELECT DISTINCT src AS nid FROM sym WHERE src % {seed_mod} = 0
    ),
    ns AS (SELECT COUNT(*) AS n FROM seeds),
    r0 AS MATERIALIZED (
        SELECT nid, CAST(1000000000000 // ns.n AS BIGINT) AS rank_fp
        FROM seeds CROSS JOIN ns
    )"""
    ]
    cur = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS (
        SELECT e.dst AS nid,
               CAST(SUM((85 * r.rank_fp) // (100 * e.deg)) AS BIGINT)
                   AS incoming
        FROM {cur} r JOIN dege e ON e.src = r.nid
        GROUP BY e.dst
    ),
    r{i} AS MATERIALIZED (
        SELECT * FROM (
            SELECT COALESCE(c.nid, s.nid) AS nid,
                   CAST(CASE WHEN s.nid IS NOT NULL
                        THEN (15 * (1000000000000 // ns.n)) // 100 ELSE 0 END
                        + COALESCE(c.incoming, 0) AS BIGINT) AS rank_fp
            FROM c{i} c FULL JOIN seeds s ON s.nid = c.nid
            CROSS JOIN ns
        ) WHERE rank_fp > 0
    )"""
        )
        cur = f"r{i}"
    parts.append(f"sel AS (SELECT nid AS node, rank_fp FROM {cur})")
    return ",\n    ".join(parts) + "\n    SELECT node, rank_fp FROM sel"


def _edges(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    ik = li.select("l_orderkey", "l_partkey").distinct()
    a = ik.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("src"))
    b = ik.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "_ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_support"))
        .where(F.col("_support") >= 2)
        .select("src", "dst")
    )


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def test_jaccard_lp_parity(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        link_prediction_jaccard,
    )

    got = link_prediction_jaccard(_edges(spark), topk=100).toPandas()
    con = duckdb.connect()
    exp = con.sql(JACCARD_LP_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["rank"])


def test_jaccard_lp_hand_graph(spark):
    """Path 1-2-3 plus 2-4: each non-edge pair shares hub 2 only;
    J = 1 / (1 + 1 - ... ): deg(1)=deg(3)=deg(4)=1, common=1 ->
    union = 1+1-1 = 1 -> J = 1.0 for all three pairs."""
    from kafka_streams_aggregate_spark.operators.graph import (
        link_prediction_jaccard,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {
        (r["node_a"], r["node_b"]): r["jaccard_ppm"]
        for r in link_prediction_jaccard(edges, topk=10).collect()
    }
    assert got == {(1, 3): 1_000_000, (1, 4): 1_000_000, (3, 4): 1_000_000}


def test_clustering_coefficient_parity(spark):
    from kafka_streams_aggregate_spark.operators.graph import (
        clustering_coefficient,
    )

    got = clustering_coefficient(_edges(spark), topk=100).toPandas()
    con = duckdb.connect()
    exp = con.sql(CC_ORACLE.format(sf=SF)).df()
    con.close()
    _cmp(got, exp, ["rank"])


def test_clustering_coefficient_hand_values(spark):
    """Triangle abc + pendant d on c: cc(a) = cc(b) = 1 (deg 2, one
    triangle); cc(c) = 2*1/(3*2) = 1/3; d has deg 1 -> excluded."""
    from kafka_streams_aggregate_spark.operators.graph import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
        "src string, dst string",
    )
    rows = {
        r["node"]: (r["deg"], r["n_triangles"], r["cc_ppm"])
        for r in clustering_coefficient(edges, topk=10).collect()
    }
    assert rows["a"] == (2, 1, 1_000_000)
    assert rows["b"] == (2, 1, 1_000_000)
    assert rows["c"] == (3, 1, 333_333)
    assert "d" not in rows


def test_ppr_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import ppr_seeds

    edges = _edges(spark)
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        sym.where(F.col("src") % 10 == 0)
        .select(F.col("src").alias("seed"))
        .dropDuplicates()
    )
    got = (
        ppr_seeds(sym, seeds, iterations=3)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ppr_oracle(SF, 3, 10))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_ppr_hand_values(spark):
    """Directed 2-cycle a<->b with seed {a}, 1 iteration:
    rank0(a) = SCALE; contrib to b = 85%*SCALE (deg 1);
    rank1(a) = teleport = 15%*SCALE, rank1(b) = 85%*SCALE."""
    from kafka_streams_aggregate_spark.operators.graph import ppr_seeds

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "seed string")
    rows = {
        r["node"]: r["rank_fp"]
        for r in ppr_seeds(edges, seeds, iterations=1).collect()
    }
    scale = 1_000_000_000_000
    assert rows == {"a": (15 * scale) // 100, "b": (85 * scale) // 100}


def test_ppr_duplicate_seed_rows_ignored(spark):
    """A seed listed twice must not double its teleport mass: the
    denominator counts DISTINCT seeds (round-12 advice fix)."""
    from kafka_streams_aggregate_spark.operators.graph import ppr_seeds

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("a",)], "seed string")
    rows = {
        r["node"]: r["rank_fp"]
        for r in ppr_seeds(edges, seeds, iterations=1).collect()
    }
    scale = 1_000_000_000_000
    assert rows == {"a": (15 * scale) // 100, "b": (85 * scale) // 100}


def test_ppr_mass_conserved_upper_bound(spark):
    """Total fixed-point mass never exceeds SCALE (floors only leak
    downward) and stays positive."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.graph import ppr_seeds

    edges = _edges(spark)
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        sym.where(F.col("src") % 10 == 0)
        .select(F.col("src").alias("seed"))
        .dropDuplicates()
    )
    total = (
        ppr_seeds(sym, seeds, iterations=2)
        .agg(F.sum("rank_fp").alias("t"))
        .collect()[0]["t"]
    )
    assert 0 < total <= 1_000_000_000_000
