"""Round-11 registrations: the staged-operator queue graduating to
driver-verified queries.

Every query here wraps an operator that landed (with unit tests and a
pre-validated cross-engine oracle text) in round 10; the oracle SQL is
the test file's registration-ready text with the ``read_parquet``
table refs swapped for the driver's pre-registered view names. The
Spark derivations mirror the parity tests verbatim, so the driver's
hash check re-verifies exactly what the tests pinned at sf0.001.

Reference: the queue and per-operator rationale live in SURVEY.md §9;
the reference repo's own surface (S1-S7, the Kafka Streams inventory
fold at KafkaStreamsInventoryCountApplication.java:69-85) was fully
covered by round 3 — these are the absent-category build-out rows.

Registration scopings (measured at sf0.1, recorded in §9): theil_sen
``o_orderkey % 100 = 0``, ktruss ``l_orderkey % 10 = 0``, closeness
seeds ``l_suppkey % 50 = 0`` hops=3, grid join r=64 — the
recursive-CTE-breadth scoping rule applied to quadratic/iterative
operators whose unscoped cost is the documented scale trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Dedup / text
# --------------------------------------------------------------------------


@register(
    "q_editdist_verify",
    oracle="""
    WITH raw_idx AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id, unnest(list_transform(range(1,
                  greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                  i -> array_to_string(list_slice(string_split(text, ' '),
                  CAST(i AS INT), CAST(i + 2 AS INT)), ' '))) AS shingle
              FROM documents)
    ),
    idx AS (
        SELECT doc_id, shingle FROM raw_idx
        WHERE shingle IN (
            SELECT shingle FROM raw_idx GROUP BY shingle
            HAVING COUNT(*) <= 50
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM idx a JOIN idx b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    cands AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE)
              >= 0.02
    ),
    docs AS (SELECT doc_id, text FROM documents),
    m AS (
        SELECT cands.id_a, cands.id_b,
               CAST(strlen(ta.text) AS BIGINT) AS len_a,
               CAST(strlen(tb.text) AS BIGINT) AS len_b,
               CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist
        FROM cands
        JOIN docs ta ON ta.doc_id = cands.id_a
        JOIN docs tb ON tb.doc_id = cands.id_b
    )
    SELECT id_a, id_b, len_a, len_b, edit_dist,
           (1000 * (greatest(len_a, len_b) - edit_dist))
               // greatest(len_a, len_b) AS sim_permille
    FROM m
    """,
    doc=(
        "Edit-distance verification of dedup candidates — exact "
        "Levenshtein over the df-capped shingle-index candidate pairs "
        "(never all pairs; the candidates-then-verify shape). Both "
        "engines ship a NATIVE exact Levenshtein (Spark codegen "
        "builtin, DuckDB levenshtein()), so the metric itself needs no "
        "reimplementation; sim_permille = 1000*(maxlen-dist) div "
        "maxlen stays exact int64. Candidate generation reuses the "
        "q_dedup_ngram_jaccard index (bucket equi-join on rare "
        "shingles). tests/test_editdist.py incl. the canonical "
        "kitten/sitting pin."
    ),
    tags=("dedup", "llm-data", "edit-distance", "candidates-verify"),
)
def q_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.dedup import (
        edit_distance_verify,
    )

    docs = load_table(spark, "documents", sf_dir)
    return edit_distance_verify(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# Rank / distribution statistics
# --------------------------------------------------------------------------


def _customer_spend_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend cents per nation (LEFT join keeps zero-order
    customers with spend 0) — shared by the inequality statistics."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("v")
        )
    )


_SPEND_VIEW_SQL = """
        SELECT c.c_nationkey, c.c_custkey,
               CAST(COALESCE(
                   SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)),
                   0) AS BIGINT) AS v
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
"""


@register(
    "q_gini_coefficient",
    oracle=f"""
    WITH spend AS (
        SELECT c_nationkey AS grp, c_custkey AS id, v
        FROM ({_SPEND_VIEW_SQL})
    ),
    ranked AS (
        SELECT grp, v,
               CAST(row_number() OVER (
                   PARTITION BY grp ORDER BY v, id) AS BIGINT) AS i
        FROM spend
    ),
    agg AS (
        SELECT grp AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS total,
               CAST(SUM(i * v) AS BIGINT) AS iwx
        FROM ranked GROUP BY grp
    )
    SELECT group_key, n, total,
           CAST(2 * iwx - (n + 1) * total AS BIGINT) AS gini_num,
           CAST(n * total AS BIGINT) AS gini_den,
           CAST(2 * iwx - (n + 1) * total AS DOUBLE)
               / CAST(n * total AS DOUBLE) AS gini
    FROM agg
    """,
    doc=(
        "Gini concentration coefficient over per-customer spend cents "
        "per nation — rank-weighted closed form G = (2*sum(i*x_i) - "
        "(n+1)*sum x) / (n*sum x); numerator/denominator exact int64, "
        "the coefficient ONE int64/int64 IEEE divide (hex-pinned "
        "bit-equal in tests/test_gini_lorenz.py). Tie-stable via the "
        "(v, id) rank order. One window + one aggregate on a single "
        "exchange."
    ),
    tags=("stats", "inequality", "window"),
)
def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import gini_lorenz

    spend = _customer_spend_cents(spark, sf_dir)
    return gini_lorenz(spend, "c_nationkey", "v", "c_custkey")


@register(
    "q_run_length_islands",
    oracle="""
    WITH ordered AS (
        SELECT user_id AS key, event_type AS label,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS BIGINT) AS rn
        FROM events
    ),
    isl AS (
        SELECT key, label, rn,
               rn - row_number() OVER (
                   PARTITION BY key, label ORDER BY rn) AS island
        FROM ordered
    )
    SELECT key, label,
           CAST(MIN(rn) AS BIGINT) AS start_rn,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM isl GROUP BY key, label, island
    """,
    doc=(
        "Run-length islands (gaps-and-islands RLE) — maximal same-label "
        "runs per user event stream under the (ts, event_id) total "
        "order, via the rn - row_number islands formula: two windows "
        "on ONE exchange (both partition-prefixed by user_id), exact "
        "int64 throughout. Maximality hand-pinned "
        "(tests/test_run_length.py)."
    ),
    tags=("stats", "sequence", "window"),
)
def q_run_length_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        run_length_islands,
    )

    ev = load_table(spark, "events", sf_dir)
    return run_length_islands(ev, "user_id", "event_type", "ts", "event_id")


_TVD_CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC


@register(
    "q_drift_tvd",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE WHEN epoch_us(ts) < {_TVD_CUT_US} THEN 0 ELSE 1 END
                   AS s,
               CAST(floor(value / 10) AS BIGINT) AS b
        FROM events
    ),
    counts AS (
        SELECT b,
               CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
               CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c2
        FROM tagged GROUP BY b
    ),
    totals AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM counts
    )
    SELECT t.n1, t.n2, t.n_buckets,
           CAST(SUM(ABS(c.c1 * t.n2 - c.c2 * t.n1)) AS BIGINT)
               AS tvd_num,
           (1000000 * CAST(SUM(ABS(c.c1 * t.n2 - c.c2 * t.n1))
                           AS BIGINT))
               // (2 * t.n1 * t.n2) AS tvd_scaled
    FROM counts c CROSS JOIN totals t
    GROUP BY t.n1, t.n2, t.n_buckets
    """,
    doc=(
        "TVD drift audit — total variation distance between the first- "
        "and second-half event value distributions (10-unit buckets): "
        "the LOG-FREE drift detector (PSI/KL need the banned ln). The "
        "common-denominator form sum|c1*N2 - c2*N1| keeps everything "
        "exact int64 until one final integer division. Two map-side "
        "aggregates; the totals side is a 1-row broadcast "
        "(tests/test_drift_tvd.py incl. identical/disjoint/half-overlap "
        "hand pins)."
    ),
    tags=("stats", "drift", "ml-eval"),
)
def q_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import drift_tvd

    ev = load_table(spark, "events", sf_dir).select(
        F.when(F.expr("unix_micros(ts)") < _TVD_CUT_US, 0)
        .otherwise(1)
        .alias("half"),
        F.floor(F.col("value") / 10).cast("bigint").alias("bucket"),
    )
    return drift_tvd(ev, "half", "bucket")


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


@register(
    "q_column_profile_stack",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS "column",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_repr,
           CAST(MAX({c}) AS VARCHAR) AS max_repr
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
    doc=(
        "ANALYZE-style column profiler, stack-shaped — per-column "
        "(n, n_null, n_distinct, min, max) over orders in ONE scan "
        "(multi-distinct compiles to a single Expand), then a k-row "
        "stack; min/max cast to string AFTER typed aggregation so the "
        "int columns keep native order (max_repr of o_orderkey is "
        "'60000', not lexicographic). Distinct from the wide-column "
        "q_column_profile (r6): this is the uniform-schema stacked "
        "form a profiling UI consumes, with float columns excluded by "
        "contract (to-string formatting is the one cross-engine "
        "mismatch surface) — tests/test_column_profile.py."
    ),
    tags=("stats", "profiling", "metadata"),
)
def q_column_profile_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import column_profile

    orders = load_table(spark, "orders", sf_dir)
    return column_profile(orders, _PROFILE_COLS)


@register(
    "q_ecdf_probe",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS g,
               CAST(floor(l_quantity) AS BIGINT) AS q
        FROM lineitem
    ),
    probes AS (SELECT * FROM (VALUES (10), (25), (40)) t(p))
    SELECT v.g AS group_key,
           CAST(p.p AS BIGINT) AS probe,
           CAST(COUNT(v.q) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v.q <= p.p THEN 1 ELSE 0 END) AS BIGINT)
               AS hits,
           CAST((1000000 * SUM(CASE WHEN v.q <= p.p THEN 1 ELSE 0 END))
                    // COUNT(v.q) AS BIGINT) AS ecdf_ppm
    FROM v CROSS JOIN probes p
    GROUP BY v.g, p.p
    """,
    doc=(
        "ECDF probe table — per-group ECDF evaluated at fixed integer "
        "probes as exact (hits, n, ppm): ONE scan, every probe's "
        "conditional sum folded into one aggregate + a stack, no "
        "probe-table join on the data side. Complementary to "
        "q_latency_percentiles (percentiles INVERT the ECDF at fixed "
        "ranks; probes EVALUATE it at fixed values). "
        "tests/test_ecdf_probe.py incl. NULL-exclusion pin."
    ),
    tags=("stats", "distribution",),
)
def q_ecdf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import ecdf_probe

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("q"),
    )
    return ecdf_probe(li, "g", "q", [10, 25, 40])


@register(
    "q_concentration_hhi",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment AS g, c_nationkey AS cat,
               COUNT(*) AS c
        FROM customer
        GROUP BY 1, 2
    ),
    g AS (
        SELECT g, SUM(c) AS n, COUNT(*) AS n_cats,
               SUM(c * c) AS s2, SUM(c * (c - 1)) AS s11
        FROM c GROUP BY g
    )
    SELECT g AS group_key,
           CAST(n AS BIGINT) AS n,
           CAST(n_cats AS BIGINT) AS n_cats,
           CAST((1000000 * s2) // (n * n) AS BIGINT) AS hhi_ppm,
           CASE WHEN n >= 2
                THEN CAST((1000000 * s11) // (n * (n - 1)) AS BIGINT)
           END AS simpson_ppm
    FROM g
    """,
    doc=(
        "Concentration indices (HHI + unbiased Simpson) — the log-free "
        "concentration/diversity pair in exact scaled ppm (sum c², "
        "sum c(c-1) over category counts; Shannon needs the banned "
        "ln). Two shrinking map-side aggregates, no joins; monopoly "
        "and single-row degenerate cases hand-pinned "
        "(tests/test_concentration.py)."
    ),
    tags=("stats", "diversity",),
)
def q_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        concentration_indices,
    )

    cust = load_table(spark, "customer", sf_dir)
    return concentration_indices(cust, "c_mktsegment", "c_nationkey")


# --------------------------------------------------------------------------
# Graph analytics
# --------------------------------------------------------------------------


@register(
    "q_link_prediction_ra",
    oracle="""
    WITH ik AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM ik a JOIN ik b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (
        SELECT src AS z, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ),
    wedges AS (
        SELECT za.dst AS node_a, zb.dst AS node_b, d.deg
        FROM sym za
        JOIN sym zb ON zb.src = za.src AND za.dst < zb.dst
        JOIN deg d ON d.z = za.src
    ),
    scored AS (
        SELECT node_a, node_b,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(1000000000 // deg) AS BIGINT) AS ra_scaled
        FROM wedges GROUP BY node_a, node_b
    ),
    nonedges AS (
        SELECT s.* FROM scored s
        LEFT JOIN edges e
          ON e.src = s.node_a AND e.dst = s.node_b
        WHERE e.src IS NULL
    )
    SELECT node_a, node_b, n_common, ra_scaled,
           CAST(row_number() OVER (
               ORDER BY ra_scaled DESC, node_a, node_b) AS BIGINT) AS rank
    FROM nonedges QUALIFY rank <= 100
    """,
    doc=(
        "Resource-allocation link prediction on the support>=2 "
        "co-purchase graph — RA = sum over common neighbors z of "
        "scale div deg(z), the LOG-FREE common-neighbor scorer "
        "(Adamic-Adar's ln(deg) is the banned transcendental), so the "
        "score is exact int64 cross-engine. Wedge join bounded by "
        "sum deg^2; anti-join drops existing edges; top-k total-ordered "
        "by (score, node_a, node_b). tests/test_link_prediction.py "
        "incl. the hand hub graph."
    ),
    tags=("graph", "link-prediction", "topk"),
)
def q_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import (
        link_prediction_ra,
    )

    li = load_table(spark, "lineitem", sf_dir)
    ik = li.select("l_orderkey", "l_partkey").distinct()
    a = ik.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("src")
    )
    b = ik.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("dst")
    )
    edges = (
        a.join(b, "_ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_support"))
        .where(F.col("_support") >= 2)
        .select("src", "dst")
    )
    return link_prediction_ra(edges, topk=100)


@register(
    "q_bipartite_projection",
    oracle="""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (
        SELECT cust, CAST(COUNT(*) AS BIGINT) AS d FROM cp GROUP BY cust
    ),
    ncap AS (
        SELECT CAST(SUM(CASE WHEN d > 80 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_capped
        FROM deg
    ),
    kept AS (
        SELECT cp.* FROM cp JOIN deg USING (cust) WHERE d <= 80
    ),
    sizes AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY part
    ),
    co AS (
        SELECT a.part AS item_a, b.part AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM kept a JOIN kept b
          ON b.cust = a.cust AND a.part < b.part
        GROUP BY a.part, b.part
        HAVING COUNT(*) >= 2
    ),
    weighted AS (
        SELECT co.item_a, co.item_b, co.n_common,
               sa.n AS n_a, sb.n AS n_b,
               CAST(co.n_common AS DOUBLE)
                   / sqrt(CAST(sa.n * sb.n AS DOUBLE)) AS weight
        FROM co
        JOIN sizes sa ON sa.part = co.item_a
        JOIN sizes sb ON sb.part = co.item_b
    )
    SELECT item_a, item_b, n_common, n_a, n_b, weight,
           CAST(row_number() OVER (
               ORDER BY weight DESC, item_a, item_b) AS BIGINT) AS rank,
           ncap.n_capped
    FROM weighted CROSS JOIN ncap QUALIFY rank <= 100
    """,
    doc=(
        "Bipartite projection (bought-X-also-bought-Y) — the customer x "
        "part purchase relation projected onto parts with cosine "
        "weights n_ab / sqrt(n_a * n_b): counts exact int64, weight one "
        "multiply + IEEE-exact sqrt + one divide (hex-pinned bit-equal "
        "in tests/test_bipartite.py). min_support=2 prunes BEFORE "
        "weighting; top-k total-ordered. Round-12 (r11 verdict hot-key "
        "fix): customers above max_degree=80 distinct parts are "
        "dropped BEFORE the deg^2 self-join (the shingle df-cap "
        "pattern — one 10^4-part power customer would emit 10^8 pairs "
        "from a single key at 100x scale) and self-reported via the "
        "constant n_capped audit column; the oracle applies the "
        "identical cap. 80 > the p99 degree at sf0.1 (77), so the cap "
        "bites lightly at test scales while bounding the worst key."
    ),
    tags=("graph", "recommendation", "topk"),
)
def q_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import (
        bipartite_projection,
    )

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # r17-opt: repartition(cust) + dropDuplicates instead of distinct()
    # (the round-10 hash-subset rule) — the dedupe AND the operator's
    # degree-cap window both cluster on cust, so the whole pre-
    # checkpoint chain runs on ONE exchange.
    cp = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .repartition("cust")
        .dropDuplicates(["cust", "part"])
    )
    return bipartite_projection(cp, "cust", "part", max_degree=80)


@register(
    "q_dyad_census",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    arcs AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
        WHERE ('0x' || substr(md5(CAST(a.p AS VARCHAR) || '-'
                    || CAST(b.p AS VARCHAR)), 1, 2))::BIGINT % 4 <> 0
    ),
    pairs AS (
        SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
               CAST(src < dst AS INT) AS fwd
        FROM arcs
    ),
    per_pair AS (
        SELECT lo, hi, COUNT(DISTINCT fwd) AS n_dirs
        FROM pairs GROUP BY lo, hi
    ),
    nodes AS (
        SELECT COUNT(*) AS n FROM (
            SELECT src AS node FROM arcs
            UNION SELECT dst FROM arcs)
    ),
    agg AS (
        SELECT COUNT(*) AS interacting,
               COALESCE(SUM(CASE WHEN n_dirs = 2 THEN 1 ELSE 0 END), 0)
                   AS n_mutual
        FROM per_pair
    )
    SELECT CAST(nodes.n AS BIGINT) AS n_nodes,
           CAST(interacting + n_mutual AS BIGINT) AS n_arcs,
           CAST(n_mutual AS BIGINT) AS n_mutual,
           CAST(interacting - n_mutual AS BIGINT) AS n_asymmetric,
           CAST(nodes.n * (nodes.n - 1) // 2 - interacting AS BIGINT)
               AS n_null,
           CASE WHEN interacting + n_mutual > 0
                THEN CAST((1000000 * 2 * n_mutual)
                          // (interacting + n_mutual) AS BIGINT)
           END AS reciprocity_ppm
    FROM agg CROSS JOIN nodes
    """,
    doc=(
        "Dyad census / reciprocity (Holland-Leinhardt) — "
        "mutual/asymmetric/null dyad counts WITHOUT a self-join: "
        "canonical (lo, hi) pair + direction bit, one groupBy counting "
        "distinct directions; the null class is the closed-form "
        "remainder n(n-1)/2 - interacting (enumerating "
        "never-interacting pairs at 100 TB is the quadratic trap the "
        "construction avoids). Directed arcs synthesized from co-order "
        "pairs with an md5 keep predicate per direction (hash-family "
        "parity trick) so all dyad classes occur. "
        "tests/test_dyad_census.py."
    ),
    tags=("graph", "census",),
)
def q_dyad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import dyad_census

    li = (
        load_table(spark, "lineitem", sf_dir)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .dropDuplicates()
    )
    b = li.select("o", F.col("p").alias("p2"))
    arcs = (
        li.join(b, "o")
        .where(F.col("p") != F.col("p2"))
        .where(
            F.expr(
                "CAST(conv(substr(md5(CAST(p AS STRING) || '-'"
                " || CAST(p2 AS STRING)), 1, 2), 16, 10) AS BIGINT)"
                " % 4 <> 0"
            )
        )
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .dropDuplicates()
    )
    return dyad_census(arcs)


@register(
    "q_degree_assortativity",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
    ),
    e AS (
        SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
               'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM li
    ),
    sym AS (
        SELECT src, dst FROM e
        UNION ALL
        SELECT dst, src FROM e
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
    paired AS (
        SELECT a.deg AS dx, b.deg AS dy
        FROM sym JOIN deg a ON sym.src = a.node
                 JOIN deg b ON sym.dst = b.node
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(dx) AS BIGINT) AS sum_x,
               CAST(SUM(dy) AS BIGINT) AS sum_y,
               CAST(SUM(dx * dy) AS BIGINT) AS sum_xy,
               CAST(SUM(dx * dx) AS BIGINT) AS sum_x2,
               CAST(SUM(dy * dy) AS BIGINT) AS sum_y2
        FROM paired
    )
    SELECT m, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
           CASE WHEN m * sum_x2 - sum_x * sum_x > 0
                 AND m * sum_y2 - sum_y * sum_y > 0
                THEN CAST(m * sum_xy - sum_x * sum_y AS DOUBLE)
                     / (sqrt(CAST(m * sum_x2 - sum_x * sum_x AS DOUBLE))
                        * sqrt(CAST(m * sum_y2 - sum_y * sum_y AS DOUBLE)))
           END AS assortativity
    FROM agg
    """,
    doc=(
        "Degree assortativity (Newman's topology fingerprint) over the "
        "symmetrized supplier-part bipartite graph — exact integer "
        "Pearson core (m, sums of dx/dy/dxdy/dx2/dy2 over edge "
        "endpoint degrees); float tail = cast -> sqrt x2 -> multiply "
        "-> divide (sqrt IEEE-exact), so the coefficient is bit-equal "
        "cross-engine (hex-pinned). NULL on regular graphs (zero "
        "degree variance). One degree aggregate + two degree joins + "
        "scalar aggregate. tests/test_assortativity.py."
    ),
    tags=("graph", "stats",),
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import (
        degree_assortativity,
    )

    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_suppkey", "l_partkey")
        .dropDuplicates()
    )
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return degree_assortativity(edges)


@register(
    "q_closeness_sampled",
    oracle="""
    WITH RECURSIVE
    li AS (
        SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
               'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM li
        UNION ALL
        SELECT 'p' || CAST(l_partkey AS VARCHAR),
               's' || CAST(l_suppkey AS VARCHAR)
        FROM li
    ),
    seeds AS (
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS seed
        FROM li WHERE l_suppkey % 50 = 0
    ),
    walk(seed, node, dist) AS (
        SELECT seed, seed, CAST(0 AS BIGINT) FROM seeds
        UNION
        SELECT w.seed, e.dst, w.dist + 1
        FROM walk w JOIN edges e ON w.node = e.src
        WHERE w.dist < 2
    ),
    md AS (
        SELECT seed, node, MIN(dist) AS dist
        FROM walk GROUP BY seed, node
    )
    SELECT seed,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS dist_sum,
           CAST((1000000 * COUNT(*)) // SUM(dist) AS BIGINT)
               AS closeness_ppm
    FROM md WHERE dist > 0 GROUP BY seed
    """,
    doc=(
        "Sampled-seed closeness centrality (Eppstein-Wang estimator "
        "shape) — bounded-hop multi-source BFS over the bipartite "
        "supplier-part graph carrying (seed, node, dist): one src-join "
        "+ min groupBy per round with lineage cuts; exact (n_reached, "
        "dist_sum, inverse-average-distance ppm). REGISTRATION "
        "SCOPING (measured sf0.1, round 11): seeds l_suppkey % 50 = 0 "
        "(~20 seeds) with hops=2 — the HOP RADIUS is the dominant "
        "cost knob on this dense bipartite graph (hop-3 frontier = "
        "frontier-suppliers x avg-degree ~580 = ~11M expansion rows: "
        "measured 18.1s at hops=3 vs 2.4s at hops=2; halving seeds "
        "only halves it). The 2-ball still spans part- and co-"
        "supplier-distance. Oracle = hop-scoped recursive CTE "
        "(tests/test_closeness.py pins the machinery at %5/hops=3 at "
        "sf0.001)."
    ),
    tags=("graph", "centrality", "iterative"),
)
def q_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import (
        closeness_sampled,
    )

    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_suppkey", "l_partkey")
        .dropDuplicates()
    )
    fwd = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        li.where(F.col("l_suppkey") % 50 == 0)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "seed"
            )
        )
        .dropDuplicates()
    )
    return closeness_sampled(edges, seeds, hops=2)


def _ktruss_oracle_sql(k: int, rounds: int) -> str:
    """Bounded peeling unrolled into generated chained CTEs — one
    tri/sup/peel stage per round, each ``AS MATERIALIZED`` (without it
    DuckDB re-expands each stage ~5x per level and exhausts file
    handles on the parquet scan; the round-10 bounded-iteration
    oracle trick). Scoped to l_orderkey % 10 = 0 per SURVEY §9."""
    thresh = k - 2
    parts = [
        """WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_orderkey % 10 = 0
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    )"""
    ]
    cur = "e0"
    for i in range(1, rounds + 1):
        parts.append(
            f"""tri{i} AS MATERIALIZED (
        SELECT x.src AS a, x.dst AS b, y.dst AS c
        FROM {cur} x JOIN {cur} y ON x.dst = y.src
        JOIN {cur} z ON z.src = x.src AND z.dst = y.dst
    ),
    sup{i} AS (
        SELECT side.src, side.dst, CAST(COUNT(*) AS BIGINT) AS support
        FROM (SELECT a AS src, b AS dst FROM tri{i}
              UNION ALL SELECT b, c FROM tri{i}
              UNION ALL SELECT a, c FROM tri{i}) side
        GROUP BY 1, 2
    ),
    e{i} AS MATERIALIZED (
        SELECT e.src, e.dst FROM {cur} e
        JOIN sup{i} s ON e.src = s.src AND e.dst = s.dst
        WHERE s.support >= {thresh}
    )"""
        )
        cur = f"e{i}"
    parts.append(
        f"""trif AS (
        SELECT x.src AS a, x.dst AS b, y.dst AS c
        FROM {cur} x JOIN {cur} y ON x.dst = y.src
        JOIN {cur} z ON z.src = x.src AND z.dst = y.dst
    ),
    supf AS (
        SELECT side.src, side.dst, CAST(COUNT(*) AS BIGINT) AS support
        FROM (SELECT a AS src, b AS dst FROM trif
              UNION ALL SELECT b, c FROM trif
              UNION ALL SELECT a, c FROM trif) side
        GROUP BY 1, 2
    ),
    fin AS (
        SELECT e.src, e.dst, COALESCE(s.support, 0) AS support
        FROM {cur} e LEFT JOIN supf s
          ON e.src = s.src AND e.dst = s.dst
    ),
    ms AS (SELECT COALESCE(MIN(support), {thresh}) AS ms FROM fin)
    SELECT fin.src, fin.dst, CAST(fin.support AS BIGINT) AS support,
           (ms.ms >= {thresh}) AS converged
    FROM fin CROSS JOIN ms"""
    )
    return ",\n    ".join(parts)


@register(
    "q_ktruss",
    oracle=_ktruss_oracle_sql(4, 2),
    doc=(
        "Bounded-round k-truss (k=4) on the co-order part graph — "
        "edge-centric cohesion one notch past k-core (a hub with "
        "leaves is high-core but zero-truss): per round one "
        "compact-forward wedge join + per-edge support count + peel, "
        "lineage cut per round; ``converged`` is DATA-COMPUTED on the "
        "survivor set so under-peeling self-reports. REGISTRATION "
        "SCOPING (measured sf0.1): the FULL co-order graph (1.9M "
        "edges, avg degree ~190) OOMs the wedge join (~1.8e8 wedges); "
        "l_orderkey % 10 = 0 gives 121k edges, ~5s, k=4 rounds=2. The "
        "scale lever past scoping is degree-ordered orientation "
        "(O(m^1.5) compact-forward bound) — noted in SURVEY §9 for a "
        "future unscoped need. Oracle: bounded iteration unrolled "
        "into generated chained MATERIALIZED CTEs "
        "(tests/test_ktruss.py)."
    ),
    tags=("graph", "cohesion", "iterative"),
)
def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import ktruss

    li = (
        load_table(spark, "lineitem", sf_dir)
        .where(F.col("l_orderkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .dropDuplicates()
    )
    b = li.select(F.col("o"), F.col("p").alias("p2"))
    edges = (
        li.join(b, "o")
        .where(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .dropDuplicates()
    )
    return ktruss(edges, k=4, rounds=2)


# --------------------------------------------------------------------------
# Time series / forecasting / survival
# --------------------------------------------------------------------------

_HW_S_OLD = (
    "CASE (o.rn - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 "
    "WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 "
    "WHEN 5 THEN r.s5 ELSE r.s6 END"
)
_HW_NL = f"0.5 * (o.v - {_HW_S_OLD}) + 0.5 * (r.level + r.trend)"
_HW_S_UPDATES = ", ".join(
    f"CASE WHEN (o.rn - 1) % 7 = {i} "
    f"THEN 0.5 * (o.v - ({_HW_NL})) + 0.5 * r.s{i} "
    f"ELSE r.s{i} END"
    for i in range(7)
)


@register(
    "q_holt_winters",
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS BIGINT) AS rn
        FROM events
    ),
    nn AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered GROUP BY user_id
    ),
    piv AS (
        SELECT user_id,
               {", ".join(f"MAX(CASE WHEN rn = {k} THEN v END) AS x{k}"
                          for k in range(1, 15))}
        FROM ordered WHERE rn <= 14 GROUP BY user_id
    ),
    init AS (
        SELECT p.user_id,
               (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0 AS level,
               ((x8 + x9 + x10 + x11 + x12 + x13 + x14) / 7.0
                - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0) / 7.0
                   AS trend,
               {", ".join(
                   f"x{i + 1} - (x1 + x2 + x3 + x4 + x5 + x6 + x7) / 7.0"
                   f" AS s{i}" for i in range(7))}
        FROM piv p JOIN nn ON nn.user_id = p.user_id
        WHERE nn.n >= 14
    ),
    r AS (
        SELECT user_id, CAST(7 AS BIGINT) AS rn,
               level, trend, s0, s1, s2, s3, s4, s5, s6
        FROM init
        UNION ALL
        SELECT o.user_id, o.rn,
               {_HW_NL},
               0.5 * (({_HW_NL}) - r.level) + 0.5 * r.trend,
               {_HW_S_UPDATES}
        FROM r JOIN ordered o
          ON o.user_id = r.user_id AND o.rn = r.rn + 1
    ),
    last AS (
        SELECT user_id,
               max_by(level, rn) AS level, max_by(trend, rn) AS trend,
               {", ".join(f"max_by(s{i}, rn) AS s{i}" for i in range(7))}
        FROM r GROUP BY user_id
    )
    SELECT nn.user_id AS key, nn.n AS n_obs,
           l.level, l.trend, l.s0, l.s1, l.s2, l.s3, l.s4, l.s5, l.s6,
           l.level + l.trend
           + CASE nn.n % 7 WHEN 0 THEN l.s0 WHEN 1 THEN l.s1
                  WHEN 2 THEN l.s2 WHEN 3 THEN l.s3 WHEN 4 THEN l.s4
                  WHEN 5 THEN l.s5 ELSE l.s6 END AS forecast_1
    FROM last l JOIN nn ON nn.user_id = l.user_id
    """,
    doc=(
        "Holt-Winters additive seasonal smoothing (period 7) over each "
        "user's event-value series — level + trend + 7-slot additive "
        "seasonal profile, all smoothing constants 1/2 (the bit-exact "
        "fold family); classic first-two-periods init with SEQUENTIAL "
        "left-assoc means. Partition-kernel fold (repartition + "
        "sortWithinPartitions + mapInPandas carrying open-group state "
        "across Arrow batches, the round-10 rule). The oracle's "
        "recursive CTE carries (level, trend, s0..s6) and repeats the "
        "update expressions textually — ALL ten float outputs "
        "hex-pinned BIT-equal (tests/test_holt_winters.py)."
    ),
    tags=("timeseries", "forecast", "stateful-fold"),
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        holt_winters_additive,
    )

    events = load_table(spark, "events", sf_dir)
    return holt_winters_additive(events, "user_id", "value", "ts", "event_id")


@register(
    "q_attribution_linear",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    c AS (
        SELECT user_id AS "user", event_id AS click_id, ts_us AS click_ts
        FROM ev WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id AS "user", event_id AS purchase_id,
               ts_us AS purchase_ts, cents
        FROM ev WHERE event_type = 'purchase'
    ),
    fanned AS (
        SELECT c.*, p.purchase_id, p.cents
        FROM c JOIN p ON p."user" = c."user"
                     AND c.click_ts <= p.purchase_ts
    ),
    alloc AS (
        SELECT click_id, "user",
               cents // CAST(COUNT(*) OVER (PARTITION BY purchase_id)
                            AS BIGINT)
               + CASE WHEN row_number() OVER (
                          PARTITION BY purchase_id
                          ORDER BY click_ts, click_id) = 1
                      THEN cents % CAST(COUNT(*) OVER (
                               PARTITION BY purchase_id) AS BIGINT)
                      ELSE 0 END AS share
        FROM fanned
    )
    SELECT click_id, "user",
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(share) AS BIGINT) AS attributed_cents
    FROM alloc GROUP BY click_id, "user"
    """,
    doc=(
        "Linear (equal-split) attribution in exact cents — every "
        "purchase splits across the user's preceding clicks with the "
        "Hamilton remainder to the earliest click, so allocations sum "
        "EXACTLY to the purchase amount (float splits leak cents); "
        "first/last-touch are the rank-1/rank-k degenerate cases of "
        "the same fan-out. Per-user equi-join + two windows on the "
        "purchase key; conservation hand-pinned "
        "(tests/test_attribution.py)."
    ),
    tags=("attribution", "marketing", "window"),
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.joins import (
        linear_attribution,
    )

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    return linear_attribution(clicks, purchases)


_LIFE_SQL = """
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(datediff('day',
                    MIN(CAST(o.o_orderdate AS DATE)),
                    MAX(CAST(o.o_orderdate AS DATE))) AS BIGINT) AS t,
               CAST(c.c_custkey % 2 AS BIGINT) AS e
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
"""

_RISK_SQL = """
    per_t AS (
        SELECT g, t, CAST(COUNT(*) AS BIGINT) AS n_at_t,
               CAST(SUM(e) AS BIGINT) AS d
        FROM life GROUP BY g, t
    ),
    risk AS (
        SELECT g, t, d,
               CAST(SUM(n_at_t) OVER (PARTITION BY g)
                    - SUM(n_at_t) OVER (
                        PARTITION BY g ORDER BY t
                        ROWS UNBOUNDED PRECEDING)
                    + n_at_t AS BIGINT) AS n_risk
        FROM per_t
    ),
    deaths AS (
        SELECT g, t, d, n_risk,
               CAST(row_number() OVER (
                   PARTITION BY g ORDER BY t) AS BIGINT) AS rn
        FROM risk WHERE d > 0
    )
"""


def _life_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetimes: days between first and last order per
    nation; censoring = odd custkey (deterministic synthetic event
    flag that exercises the at-risk bookkeeping)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("bigint")
            .alias("t")
        )
        .select(
            F.col("c_nationkey").cast("bigint").alias("g"),
            "t",
            (F.col("c_custkey") % 2).cast("bigint").alias("e"),
        )
    )


@register(
    "q_kaplan_meier",
    oracle=f"""
    WITH RECURSIVE life AS ({_LIFE_SQL}),
    {_RISK_SQL},
    r AS (
        SELECT g, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS t,
               CAST(0 AS BIGINT) AS n_risk, CAST(0 AS BIGINT) AS d,
               CAST(1.0 AS DOUBLE) AS s
        FROM (SELECT DISTINCT g FROM deaths)
        UNION ALL
        SELECT dd.g, dd.rn, dd.t, dd.n_risk, dd.d,
               r.s * (CAST(dd.n_risk - dd.d AS DOUBLE)
                      / CAST(dd.n_risk AS DOUBLE))
        FROM r JOIN deaths dd ON dd.g = r.g AND dd.rn = r.rn + 1
    )
    SELECT g AS group_key, t, n_risk, d, s AS survival
    FROM r WHERE rn >= 1
    """,
    doc=(
        "Kaplan-Meier survival curve over customer lifetimes per "
        "nation (censoring = odd custkey, deterministic) — "
        "censoring-aware S(t) as a SEQUENTIAL two-IEEE-op fold "
        "(divide + multiply) over death times; risk sets via one "
        "cumulative window; censored-only times emit NO steps. "
        "Survival hex-pinned BIT-equal vs the recursive-CTE oracle "
        "(recursion depth = distinct death times per group — few, so "
        "the oracle is scoped-depth by construction). "
        "tests/test_kaplan_meier.py."
    ),
    tags=("stats", "survival", "stateful-fold"),
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import kaplan_meier

    return kaplan_meier(_life_frame(spark, sf_dir), "g", "t", "e")


@register(
    "q_nelson_aalen",
    oracle=f"""
    WITH RECURSIVE life AS ({_LIFE_SQL}),
    {_RISK_SQL},
    r AS (
        SELECT g, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS t,
               CAST(0 AS BIGINT) AS n_risk, CAST(0 AS BIGINT) AS d,
               CAST(0.0 AS DOUBLE) AS h
        FROM (SELECT DISTINCT g FROM deaths)
        UNION ALL
        SELECT dd.g, dd.rn, dd.t, dd.n_risk, dd.d,
               r.h + (CAST(dd.d AS DOUBLE) / CAST(dd.n_risk AS DOUBLE))
        FROM r JOIN deaths dd ON dd.g = r.g AND dd.rn = r.rn + 1
    )
    SELECT g AS group_key, t, n_risk, d, h AS hazard_cum
    FROM r WHERE rn >= 1
    """,
    doc=(
        "Nelson-Aalen cumulative hazard — Kaplan-Meier's additive twin "
        "on the same risk-set bookkeeping; the running hazard is a "
        "sequential one-divide-one-add fold in the partition kernel — "
        "deliberately NOT a windowed double SUM (engine window "
        "operators' accumulation order is not the left fold), so the "
        "scoped recursive-CTE oracle is bit-equal "
        "(tests/test_nelson_aalen.py)."
    ),
    tags=("stats", "survival", "stateful-fold"),
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import nelson_aalen

    return nelson_aalen(_life_frame(spark, sf_dir), "g", "t", "e")


# --------------------------------------------------------------------------
# Inventory / demand planning (completing the costing family)
# --------------------------------------------------------------------------

_DEMAND_GRID_SQL = """
    dem AS (
        SELECT l_partkey AS product,
               CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE)
                   AS period,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS q
        FROM lineitem
        GROUP BY 1, 2
    ),
    months AS (SELECT DISTINCT period FROM dem),
    prods AS (SELECT DISTINCT product FROM dem),
    grid AS (
        SELECT p.product, m.period, COALESCE(d.q, 0) AS q
        FROM prods p CROSS JOIN months m
        LEFT JOIN dem d
          ON d.product = p.product AND d.period = m.period
    )
"""


def _month_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense product x month demand grid, zero-filled (the caller's
    contract for the intermittency/forecast family; the repo's
    calendar gap-fill composes).

    The ``dem`` aggregate feeds THREE consumers (months, prods, the
    left join) — nominally the N>=3-consumers rule, but the round-12
    interleaved A/B (3 alternating fresh-JVM runs/side at sf0.1)
    measured localCheckpoint(eager=True) here at best 7.54s vs 6.58s
    plain — the subtree is cheap codegen, recompute wins (the same
    exception the round-7 minhash shingle-index A/B pinned). Left
    un-checkpointed deliberately; q_demand_intermittency bypasses
    the grid entirely via demand_intermittency_sparse."""
    dem = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.date_trunc("month", F.col("l_shipdate").cast("date"))
            .cast("date")
            .alias("period"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    months = dem.select("period").distinct()
    prods = dem.select("product").distinct()
    return (
        prods.crossJoin(months)
        .join(dem, ["product", "period"], "left")
        .select(
            "product", "period", F.coalesce(F.col("q"), F.lit(0)).alias("q")
        )
    )


@register(
    "q_demand_intermittency",
    oracle="WITH " + _DEMAND_GRID_SQL + """,
    g AS (
        SELECT product,
               CAST(COUNT(*) AS BIGINT) AS n_periods,
               CAST(SUM(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonzero,
               CAST(SUM(CASE WHEN q > 0 THEN q ELSE 0 END) AS BIGINT) AS s,
               CAST(SUM(CASE WHEN q > 0 THEN q * q ELSE 0 END) AS BIGINT)
                   AS qq
        FROM grid GROUP BY product
    )
    SELECT product, n_periods, n_nonzero,
           CAST((1000000 * n_periods) // n_nonzero AS BIGINT) AS adi_ppm,
           CAST((1000000 * (n_nonzero * qq - s * s)) // (s * s) AS BIGINT)
               AS cv2_ppm,
           CASE WHEN 100 * n_periods >= 132 * n_nonzero
                 AND 100 * (n_nonzero * qq - s * s) >= 49 * (s * s)
                THEN 'lumpy'
                WHEN 100 * n_periods >= 132 * n_nonzero
                THEN 'intermittent'
                WHEN 100 * (n_nonzero * qq - s * s) >= 49 * (s * s)
                THEN 'erratic'
                ELSE 'smooth' END AS pattern
    FROM g WHERE n_nonzero > 0
    """,
    doc=(
        "Demand-intermittency classification — the Syntetos-Boylan "
        "ADI/CV² quadrant (smooth/erratic/intermittent/lumpy), the "
        "gate a forecasting pipeline runs BEFORE choosing smoothing "
        "vs Croston; both ratios exact common-denominator ppm and the "
        "published 1.32 / 0.49 cutoffs applied as integer "
        "cross-products (132/100, 49/100 — no float anywhere). "
        "Round-12 rewrite per the r11 verdict: the dense zero-filled "
        "grid is bypassed via the GRID-FREE closed form "
        "(demand_intermittency_sparse — zero cells contribute nothing "
        "to the stats; n_periods is the global month count, a 1-row "
        "broadcast), provably equal to the dense-grid path and "
        "asserted row-for-row against it in "
        "tests/test_demand_patterns.py. The r11 verdict's "
        "localCheckpoint hypothesis was A/B-refuted first (see "
        "_month_grid)."
    ),
    tags=("inventory", "forecast", "classification"),
)
def q_demand_intermittency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.costing import (
        demand_intermittency_sparse,
    )

    dem = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.date_trunc("month", F.col("l_shipdate").cast("date"))
            .cast("date")
            .alias("period"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    return demand_intermittency_sparse(dem, "product", "period", "q")


@register(
    "q_croston_forecast",
    oracle="""
    WITH RECURSIVE dem AS (
        SELECT l_partkey AS product,
               CAST(year(CAST(l_shipdate AS DATE)) * 12
                    + month(CAST(l_shipdate AS DATE)) AS BIGINT) AS t,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem
        GROUP BY 1, 2
    ),
    months AS (SELECT DISTINCT t FROM dem),
    prods AS (SELECT DISTINCT product FROM dem),
    grid AS (
        SELECT p.product, m.t, COALESCE(d.q, 0) AS q
        FROM prods p CROSS JOIN months m
        LEFT JOIN dem d ON d.product = p.product AND d.t = m.t
    ),
    with_start AS (
        SELECT product, t, q,
               MIN(t) OVER (PARTITION BY product) AS t0
        FROM grid
    ),
    ev AS (
        SELECT product, t, q,
               CASE WHEN lag(t) OVER w IS NULL THEN t - t0 + 1
                    ELSE t - lag(t) OVER w END AS interval,
               row_number() OVER w AS rn
        FROM with_start WHERE q > 0
        WINDOW w AS (PARTITION BY product ORDER BY t)
    ),
    r AS (
        SELECT product, rn, CAST(q AS DOUBLE) AS z,
               CAST(interval AS DOUBLE) AS p
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.product, e.rn,
               0.5 * e.q + 0.5 * r.z,
               0.5 * e.interval + 0.5 * r.p
        FROM r JOIN ev e ON e.product = r.product AND e.rn = r.rn + 1
    ),
    last AS (
        SELECT product, rn, z, p,
               row_number() OVER (PARTITION BY product
                                  ORDER BY rn DESC) AS rev
        FROM r
    )
    SELECT product,
           CAST(rn AS BIGINT) AS n_events,
           z AS z_size,
           p AS p_interval,
           z / p AS croston_per_period
    FROM last WHERE rev = 1
    """,
    doc=(
        "Croston's intermittent-demand forecast — two alpha=1/2 EWMA "
        "states (event sizes, inter-demand intervals) folded over "
        "demand EVENTS only, so state scales with events, not periods "
        "(the 100 TB point); series-start interval convention "
        "i_1 = t_1 - min_period + 1 pinned. Partition-kernel fold per "
        "the round-10 rule — measured sf0.1/20k series: per-group "
        "applyInPandas 74.6s -> kernel 8.6s cold. z/p/forecast "
        "hex-pinned BIT-equal vs the scoped recursive-CTE oracle "
        "(tests/test_croston.py). The forecaster "
        "q_demand_intermittency routes high-ADI series to."
    ),
    tags=("inventory", "forecast", "stateful-fold"),
)
def q_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.costing import (
        croston_forecast,
    )

    dem = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.expr(
                "CAST(year(CAST(l_shipdate AS DATE)) * 12"
                " + month(CAST(l_shipdate AS DATE)) AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    months = dem.select("t").distinct()
    prods = dem.select("product").distinct()
    grid = (
        prods.crossJoin(months)
        .join(dem, ["product", "t"], "left")
        .select("product", "t", F.coalesce(F.col("q"), F.lit(0)).alias("q"))
    )
    return croston_forecast(grid, "product", "t", "q")


@register(
    "q_mase_eval",
    oracle="WITH " + _DEMAND_GRID_SQL + """,
    lagged AS (
        SELECT product, period, q,
               COALESCE(lag(q, 1) OVER (
                   PARTITION BY product ORDER BY period), 0) AS f,
               lag(q, 12) OVER (
                   PARTITION BY product ORDER BY period) AS q_lag
        FROM grid
    ),
    a AS (
        SELECT product,
               CAST(COUNT(*) AS BIGINT) AS n_f,
               CAST(SUM(abs(q - f)) AS BIGINT) AS sae_f,
               CAST(SUM(CASE WHEN q_lag IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_naive,
               CAST(SUM(CASE WHEN q_lag IS NOT NULL
                             THEN abs(q - q_lag) ELSE 0 END) AS BIGINT)
                   AS sae_naive
        FROM lagged GROUP BY product
    )
    SELECT product, n_f, sae_f, n_naive, sae_naive,
           CASE WHEN sae_naive > 0 AND n_naive > 0
                THEN CAST((1000000 * sae_f * n_naive)
                          // (sae_naive * n_f) AS BIGINT)
           END AS mase_ppm
    FROM a
    """,
    doc=(
        "MASE forecast evaluation (Hyndman-Koehler mean absolute "
        "SCALED error) of a naive-1 forecast against the seasonal-"
        "naive (season=12) denominator, in the exact cross-multiplied "
        "ppm form — MAPE zero-divides on intermittent demand; MASE is "
        "the scale-free standard. One lag window + one aggregate on "
        "the same exchange; NULL when the seasonal-naive denominator "
        "is zero (tests/test_demand_patterns.py)."
    ),
    tags=("forecast", "ml-eval", "window"),
)
def q_mase_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kafka_streams_aggregate_spark.operators.costing import mase_eval

    w = Window.partitionBy("product").orderBy("period")
    actuals = _month_grid(spark, sf_dir).withColumn(
        "forecast", F.coalesce(F.lag("q", 1).over(w), F.lit(0))
    )
    return mase_eval(actuals, "product", "period", "q", "forecast", season=12)


@register(
    "q_eoq_policy",
    oracle="""
    WITH d AS (
        SELECT l_partkey AS product,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d_total
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT product, d_total,
           sqrt(CAST(2 * d_total * 5000 AS DOUBLE) / 200.0) AS eoq,
           CAST(d_total AS DOUBLE)
               / sqrt(CAST(2 * d_total * 5000 AS DOUBLE) / 200.0)
               AS orders_per_cycle
    FROM d
    """,
    doc=(
        "EOQ policy — economic order quantity sqrt(2*D*S/H) with "
        "integer-cents parameters (S=5000 order cost, H=200 holding "
        "cost): one cast + divide + sqrt chain, hex-pinned bit-equal "
        "(sqrt is IEEE-exact; the repo's no-transcendentals rule "
        "allows it). Completes the WHEN (q_safety_stock) / HOW MUCH "
        "(EOQ) / WHAT IF (q_ss_policy_sim) planning triad. One "
        "map-side aggregate (tests/test_eoq.py)."
    ),
    tags=("inventory", "policy",),
)
def q_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.costing import eoq_policy

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_partkey").alias("product"),
        F.col("l_quantity").alias("qty"),
    )
    return eoq_policy(li, "product", "qty")


# --------------------------------------------------------------------------
# Robust statistics / rater agreement / classifier eval
# --------------------------------------------------------------------------


@register(
    "q_theil_sen",
    oracle="""
    WITH pts AS (
        SELECT o_orderpriority AS g,
               CAST(o_orderkey AS BIGINT) AS x,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS y
        FROM orders WHERE o_orderkey % 100 = 0
    ),
    pairs AS (
        SELECT a.g,
               b.y - a.y AS dy,
               b.x - a.x AS dx,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                   AS slope
        FROM pts a JOIN pts b ON a.g = b.g AND a.x < b.x
    ),
    ranked AS (
        SELECT g, slope, dy, dx,
               row_number() OVER (PARTITION BY g ORDER BY slope, dy, dx)
                   AS rk,
               COUNT(*) OVER (PARTITION BY g) AS m
        FROM pairs
    )
    SELECT g AS group_key, CAST(m AS BIGINT) AS n_pairs, slope
    FROM ranked WHERE rk = (m + 1) // 2
    """,
    doc=(
        "Theil-Sen slope — robust median pair slope per priority "
        "group, the HOW-STEEP companion to q_mann_kendall's WHETHER; "
        "LOWER-median = exact order-statistic selection of one IEEE "
        "divide under the total order (slope, dy, dx), hex-pinned "
        "bit-equal (tests/test_theil_sen.py; x-ties contribute no "
        "slope). REGISTRATION SCOPING (measured sf0.1): full orders "
        "would be 30k rows/group -> 4.5e8 pairs/group; o_orderkey % "
        "100 = 0 keeps ~45k pairs/group — the recursive-CTE-breadth "
        "scoping rule applied to a quadratic exact estimator; "
        "q_theil_sen_sampled is the registered linear-scale path."
    ),
    tags=("stats", "regression", "robust"),
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import theil_sen

    pts = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderpriority").alias("g"),
            F.col("o_orderkey").alias("x"),
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("y"),
        )
    )
    return theil_sen(pts, "g", "x", "y")


@register(
    "q_theil_sen_sampled",
    oracle="""
    WITH pts AS (
        SELECT o_orderpriority AS g,
               CAST(o_orderkey AS BIGINT) AS x,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    ranked AS (
        SELECT g, x, y,
               row_number() OVER (PARTITION BY g ORDER BY x, y) AS rn
        FROM pts
    ),
    pairs AS (
        SELECT a.g,
               b.y - a.y AS dy,
               b.x - a.x AS dx,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                   AS slope
        FROM ranked a
        JOIN ranked b
          ON a.g = b.g AND b.rn - a.rn IN (1, 2, 3, 5, 8, 13, 21, 34)
        WHERE a.x <> b.x
    ),
    sel AS (
        SELECT g, slope, dy, dx,
               row_number() OVER (PARTITION BY g ORDER BY slope, dy, dx)
                   AS rk,
               COUNT(*) OVER (PARTITION BY g) AS m
        FROM pairs
    )
    SELECT g AS group_key, CAST(m AS BIGINT) AS n_pairs, slope
    FROM sel WHERE rk = (m + 1) // 2
    """,
    doc=(
        "Sampled-pairs Theil-Sen — the LINEAR scale path for "
        "unbounded groups: deterministic Fibonacci-lag offset pairing "
        "(1,2,3,5,8,13,21,34) over the group's own (x, y) rank order "
        "— no RNG, no hash, reproducible cross-engine by construction "
        "— k rank equi-joins on one reused exchange, same lower-"
        "median selection as the exact estimator (agrees bit-for-bit "
        "on linear data, tested). Runs UNSCOPED on full orders: O(k*n) "
        "pairs. tests/test_theil_sen_sampled.py."
    ),
    tags=("stats", "regression", "robust", "sampled"),
)
def q_theil_sen_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        theil_sen_sampled,
    )

    pts = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderkey").alias("x"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("y"),
    )
    return theil_sen_sampled(pts, "g", "x", "y")


@register(
    "q_skew_report",
    oracle="""
    WITH counts AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY 1
    ),
    enriched AS (
        SELECT key, CAST(cnt AS BIGINT) AS cnt,
               COUNT(*) OVER () AS n_keys,
               SUM(cnt) OVER () AS n_rows,
               MAX(cnt) OVER () AS max_cnt,
               row_number() OVER (ORDER BY cnt) AS rn_asc,
               row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
        FROM counts
    ),
    p99 AS (
        SELECT MIN(CASE WHEN rn_asc >= (99 * n_keys + 99) // 100
                        THEN cnt END) AS p99_cnt
        FROM enriched
    )
    SELECT CAST(rank AS BIGINT) AS rank, key, cnt,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(max_cnt AS BIGINT) AS max_cnt,
           CAST(p99.p99_cnt AS BIGINT) AS p99_cnt,
           CAST((1000000 * max_cnt * n_keys) // n_rows AS BIGINT)
               AS skew_ppm
    FROM enriched CROSS JOIN p99
    WHERE rank <= 10
    """,
    doc=(
        "Key-skew diagnostic — the report the skew module's salting "
        "cures are prescribed from: top-k hot keys plus exact "
        "distribution summary (max, ceil-rank p99, and the straggler "
        "factor (1e6 * max_cnt * n_keys) div n_rows = the salt factor "
        "that would flatten the stage). Window work runs over the KEY "
        "table (one count per key), the heavy frame is touched once; "
        "NULL keys count — they hash together, the classic skew "
        "source (tests/test_skew_report.py)."
    ),
    tags=("scale", "skew", "diagnostics"),
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.skew import skew_report

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_suppkey").cast("string").alias("k")
    )
    return skew_report(li, "k")


@register(
    "q_weighted_percentile",
    oracle="""
    WITH b AS (
        SELECT l_returnflag AS g,
               CAST(floor(l_extendedprice) AS BIGINT) AS v,
               CAST(floor(l_quantity) AS BIGINT) AS w
        FROM lineitem
    ),
    c AS (
        SELECT g, v,
               SUM(w) OVER (PARTITION BY g ORDER BY v) AS cumw,
               SUM(w) OVER (PARTITION BY g) AS wt
        FROM b
    )
    SELECT g AS group_key,
           CAST(MAX(wt) AS BIGINT) AS w_total,
           CAST(MIN(CASE WHEN cumw >= (50 * wt + 99) // 100 THEN v END)
                AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cumw >= (90 * wt + 99) // 100 THEN v END)
                AS BIGINT) AS p90,
           CAST(MIN(CASE WHEN cumw >= (99 * wt + 99) // 100 THEN v END)
                AS BIGINT) AS p99
    FROM c GROUP BY g
    """,
    doc=(
        "Weighted percentiles (quantity-weighted price percentiles "
        "per return flag) — exact cumulative-weight ceil-rank "
        "selection; the cumulative window's default RANGE frame makes "
        "duplicate values peers whose weights pool BEFORE the "
        "threshold test, so selection is tie-order-independent by "
        "construction. Every percentile folds into ONE window pass "
        "via conditional min (tests/test_weighted_percentile.py)."
    ),
    tags=("stats", "percentile", "window"),
)
def q_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        weighted_percentile,
    )

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(floor(l_extendedprice) AS BIGINT)").alias("v"),
        F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("w"),
    )
    return weighted_percentile(li, "g", "v", "w")


def _rater_frame(spark: SparkSession, sf_dir: str, as_string: bool):
    """Two synthetic raters from the md5 hash family (75% agreement
    by construction: rater b flips one ordinal step when the second
    md5 byte lands in the top quarter)."""
    docs = load_table(spark, "documents", sf_dir).select(
        F.col("source").alias("g"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10)"
            " AS BIGINT) % 3"
        ).alias("a0"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 3, 2), 16, 10)"
            " AS BIGINT) % 4"
        ).alias("flip"),
    )
    if as_string:
        return docs.selectExpr(
            "g",
            "CAST(a0 AS STRING) AS a",
            "CAST(CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END"
            " AS STRING) AS b",
        )
    return docs.selectExpr(
        "g", "a0 AS a", "CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END AS b"
    )


_RATER_SQL = """
        SELECT source AS g,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
                   % 3 AS a0,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2))::BIGINT
                   % 4 AS flip
        FROM documents
"""


@register(
    "q_cohens_kappa",
    oracle=f"""
    WITH r AS ({_RATER_SQL}),
    lab AS (
        SELECT g, CAST(a0 AS VARCHAR) AS a,
               CAST(CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END
                    AS VARCHAR) AS b
        FROM r
    ),
    cells AS (SELECT g, a, b, COUNT(*) AS c FROM lab GROUP BY 1, 2, 3),
    ma AS (SELECT g, a, SUM(c) AS ra FROM cells GROUP BY 1, 2),
    mb AS (SELECT g, b, SUM(c) AS cb FROM cells GROUP BY 1, 2),
    ch AS (
        SELECT ma.g, SUM(ra * cb) AS chance_num
        FROM ma JOIN mb ON ma.g = mb.g AND ma.a = mb.b GROUP BY ma.g
    ),
    tot AS (
        SELECT g, SUM(c) AS n,
               SUM(CASE WHEN a = b THEN c ELSE 0 END) AS agree
        FROM cells GROUP BY g
    )
    SELECT tot.g AS group_key,
           CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS agree,
           CAST(chance_num AS BIGINT) AS chance_num,
           CASE WHEN n * n <> chance_num
                THEN CAST((1000000 * (n * agree - chance_num))
                          // (n * n - chance_num) AS BIGINT)
           END AS kappa_ppm
    FROM tot JOIN ch ON tot.g = ch.g
    """,
    doc=(
        "Cohen's kappa — chance-corrected inter-rater agreement in "
        "the exact common-denominator integer form scale*(N*A - E) "
        "div (N² - E): three shrinking aggregates + one label-sized "
        "marginal join (never data-sized); degenerate chance==1 "
        "reports NULL. Raters synthesized from the md5 hash family "
        "(75% agreement by construction) so both engines label "
        "identically (tests/test_cohens_kappa.py)."
    ),
    tags=("stats", "ml-eval", "agreement"),
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import cohens_kappa

    lab = _rater_frame(spark, sf_dir, as_string=True)
    return cohens_kappa(lab, "g", "a", "b")


@register(
    "q_kappa_weighted",
    oracle=f"""
    WITH r AS ({_RATER_SQL}),
    lab AS (
        SELECT g, a0 AS a,
               CASE WHEN flip < 3 THEN a0 ELSE (a0 + 1) % 3 END AS b
        FROM r
    ),
    cells AS (SELECT g, a, b, COUNT(*) AS c FROM lab GROUP BY 1, 2, 3),
    ma AS (SELECT g, a, SUM(c) AS ra FROM cells GROUP BY 1, 2),
    mb AS (SELECT g, b, SUM(c) AS cb FROM cells GROUP BY 1, 2),
    ch AS (
        SELECT ma.g, SUM(abs(ma.a - mb.b) * ra * cb) AS we_num
        FROM ma JOIN mb ON ma.g = mb.g GROUP BY ma.g
    ),
    tot AS (
        SELECT g, SUM(c) AS n, SUM(abs(a - b) * c) AS wo_num
        FROM cells GROUP BY g
    )
    SELECT tot.g AS group_key,
           CAST(n AS BIGINT) AS n,
           CAST(wo_num AS BIGINT) AS wo_num,
           CAST(we_num AS BIGINT) AS we_num,
           CASE WHEN we_num <> 0
                THEN CAST((1000000 * (we_num - n * wo_num)) // we_num
                          AS BIGINT)
           END AS kappa_w_ppm
    FROM tot JOIN ch ON tot.g = ch.g
    """,
    doc=(
        "Linear-weighted Cohen's kappa (ordinal) — partial-credit "
        "agreement with |i-j| disagreement cost, exact common-"
        "denominator form scale*(WE - N*WO) div WE; the chance term "
        "is a label²-sized marginal cross per group, never data-"
        "sized; one-label degenerate (WE=0) reports NULL "
        "(tests/test_kappa_weighted.py)."
    ),
    tags=("stats", "ml-eval", "agreement"),
)
def q_kappa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        cohens_kappa_weighted,
    )

    lab = _rater_frame(spark, sf_dir, as_string=False)
    return cohens_kappa_weighted(lab, "g", "a", "b")


def _acctbal_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.col("c_custkey").cast("bigint").alias("id"),
        F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias("v"),
    )


_ACCTBAL_RANKED_SQL = """
    v AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(c_custkey AS BIGINT) AS id,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ),
    ranked AS (
        SELECT g, id, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM v
    )
"""


@register(
    "q_winsorize",
    oracle="WITH " + _ACCTBAL_RANKED_SQL + """,
    bounds AS (
        SELECT g,
               CAST(MIN(CASE WHEN rn >= (10 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS lo,
               CAST(MIN(CASE WHEN rn >= (90 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS hi
        FROM ranked GROUP BY g
    )
    SELECT r.g AS group_key, r.id, r.v,
           CAST(greatest(b.lo, least(b.hi, r.v)) AS BIGINT) AS v_wins,
           CAST(CASE WHEN r.v < b.lo THEN -1 WHEN r.v > b.hi THEN 1
                     ELSE 0 END AS BIGINT) AS clipped
    FROM ranked r JOIN bounds b ON r.g = b.g
    """,
    doc=(
        "Winsorization at (10, 90) of account-balance cents per "
        "nation — robust clipping entirely in exact integer space: "
        "rank-selected bounds by the integer ceil-rank rule "
        "(conditional-min from ONE ranked frame), bounds broadcast "
        "back to the data (group-sized join side), the data never "
        "re-shuffles. tests/test_robust_clipping.py."
    ),
    tags=("stats", "robust", "cleaning"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import winsorize

    return winsorize(
        _acctbal_cents(spark, sf_dir), "g", "v", "id", lo_pct=10, hi_pct=90
    )


@register(
    "q_tukey_outliers",
    oracle="WITH " + _ACCTBAL_RANKED_SQL + """,
    bounds AS (
        SELECT g,
               CAST(MIN(CASE WHEN rn >= (25 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS q1,
               CAST(MIN(CASE WHEN rn >= (75 * n + 99) // 100 THEN v END)
                    AS BIGINT) AS q3
        FROM ranked GROUP BY g
    )
    SELECT r.g AS group_key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(b.q1) AS BIGINT) AS q1,
           CAST(MAX(b.q3) AS BIGINT) AS q3,
           CAST(SUM(CASE WHEN 2 * r.v < 2 * b.q1 - 3 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * r.v > 2 * b.q3 + 3 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM ranked r JOIN bounds b ON r.g = b.g
    GROUP BY r.g
    """,
    doc=(
        "Tukey-fence outlier audit — the 1.5*IQR fences with every "
        "term DOUBLED (2v vs 2q ± 3iqr) so the half-integer 1.5 "
        "factor never materializes as a float; quartiles by the same "
        "integer ceil-rank rule as q_winsorize, from ONE ranked "
        "frame. tests/test_robust_clipping.py."
    ),
    tags=("stats", "robust", "quality"),
)
def q_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import tukey_outliers

    return tukey_outliers(_acctbal_cents(spark, sf_dir), "g", "v", "id")


@register(
    "q_auc_roc",
    oracle="""
    WITH s AS (
        SELECT source AS g, doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   AS score,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 2))
                             ::BIGINT < 64
                    THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    r AS (
        SELECT g, label,
               row_number() OVER (PARTITION BY g ORDER BY score, doc_id)
                   AS rk
        FROM s
    ),
    a AS (
        SELECT g, SUM(label) AS n_pos,
               COUNT(*) - SUM(label) AS n_neg,
               SUM(label * rk) AS rank_sum_pos
        FROM r GROUP BY g
    )
    SELECT g AS group_key,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(rank_sum_pos AS BIGINT) AS rank_sum_pos,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST((1000000 * (rank_sum_pos
                           - (n_pos * (n_pos + 1)) // 2))
                          // (n_pos * n_neg) AS BIGINT)
           END AS auc_ppm
    FROM a
    """,
    doc=(
        "Exact ROC AUC — the Mann-Whitney rank identity AUC = (R_pos "
        "- n_pos(n_pos+1)/2) / (n_pos*n_neg) with the tie-broken "
        "permutation-rank policy (row_number over (score, doc_id)); "
        "integer core to the numerator, one window + one aggregate, "
        "no join; NULL when a class is absent. Scores/labels from the "
        "md5 hash family so both engines see identical data "
        "(tests/test_auc_roc.py). The classifier-eval leg of the rank "
        "family (pairs with q_isotonic_fit calibration)."
    ),
    tags=("stats", "ml-eval", "window"),
)
def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import auc_roc_exact

    docs = load_table(spark, "documents", sf_dir).select(
        F.col("source").alias("g"),
        F.col("doc_id"),
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("score"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 5, 2),"
            " 16, 10) AS BIGINT) < 64 THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    return auc_roc_exact(docs, "g", "score", "label", "doc_id")


# --------------------------------------------------------------------------
# Spatial / data layout
# --------------------------------------------------------------------------

from kafka_streams_aggregate_spark.operators.spatial import morton_expr_sql


def _md5_points_spark(
    spark: SparkSession, sf_dir: str, with_id: bool
) -> DataFrame:
    """Uniform 16-bit synthetic coordinates from the md5 hash family
    (the round-8 rule: prime-multiplier lattices produce no spatial
    structure; md5 gives uniform, cross-engine-identical points)."""
    cols = (
        [F.col("o_orderkey").alias("id")] if with_id else []
    ) + [
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("x"),
        F.expr(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 5, 4), 16, 10)"
            " AS BIGINT)"
        ).alias("y"),
    ]
    return load_table(spark, "orders", sf_dir).select(*cols)


_MD5_POINTS_SQL = """
        SELECT CAST(o_orderkey AS BIGINT) AS id,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                   ::BIGINT AS x,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 5, 4))
                   ::BIGINT AS y
        FROM orders
"""


@register(
    "q_zorder_buckets",
    oracle=f"""
    WITH pts AS ({_MD5_POINTS_SQL}),
    coded AS (
        SELECT x, y, {morton_expr_sql("x", "y", 16, idiv="//")} AS morton
        FROM pts
    )
    SELECT CAST(morton // 67108864 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(x) AS BIGINT) AS x_min,
           CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min,
           CAST(MAX(y) AS BIGINT) AS y_max
    FROM coded GROUP BY 1
    """,
    doc=(
        "Z-order (Morton) spatial bucketing — the Delta/Iceberg "
        "data-layout story: 16-bit x 16-bit interleave as pure div/mod "
        "int64 arithmetic from ONE SQL-text generator serving BOTH "
        "engines (only the integer-division token differs; no "
        "`<<`/`>>`, the shift-overflow parity trap), plus the "
        "per-bucket bbox rollup that PROVES locality — every "
        "bucket_bits=6 bucket's bbox sits inside one aligned 2^13 "
        "quadtree tile (asserted in tests/test_zorder.py). "
        "Coordinates md5-derived."
    ),
    tags=("spatial", "layout", "zorder"),
)
def q_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder_bucket_stats,
    )

    pts = _md5_points_spark(spark, sf_dir, with_id=False)
    return zorder_bucket_stats(pts, "x", "y", bits=16, bucket_bits=6)


@register(
    "q_grid_neighbor_join",
    oracle=f"""
    WITH pts AS ({_MD5_POINTS_SQL})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= 64 * 64
    """,
    doc=(
        "Grid-file spatial self-join — all pairs within Euclidean "
        "radius r=64 via radius-sized cells + 3x3 neighborhood explode "
        "+ exact squared-distance verify (int64, no sqrt): the LSH "
        "candidates-then-verify shape with the grid as band index; "
        "pair-once by home/probe roles + id ordering; salting "
        "composes for hot cells. REGISTRATION SCOPING (measured "
        "sf0.1): pair density scales with r² — r=256 yields 537k "
        "pairs, r=64 ~34k, a bounded driver-snapshot result. The "
        "ORACLE is the direct quadratic join (fine at driver scale; "
        "the operator never materializes it). tests/test_grid_join.py."
    ),
    tags=("spatial", "join", "candidates-verify"),
)
def q_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.spatial import (
        grid_neighbor_join,
    )

    pts = _md5_points_spark(spark, sf_dir, with_id=True)
    return grid_neighbor_join(pts, "id", "x", "y", 64)


_PRUNE_BOX = dict(x_lo=10_000, x_hi=12_000, y_lo=30_000, y_hi=34_000)
_PRUNE_BITS, _PRUNE_BUCKET_BITS = 16, 10


@register(
    "q_zorder_prune_compare",
    oracle=f"""
    WITH pts AS ({_MD5_POINTS_SQL}),
    coded AS (
        SELECT x, y,
               ({morton_expr_sql("x", "y", _PRUNE_BITS, idiv="//")})
                   // {1 << (2 * _PRUNE_BITS - _PRUNE_BUCKET_BITS)} AS zb,
               x // {(1 << _PRUNE_BITS) // (1 << _PRUNE_BUCKET_BITS)} AS xb
        FROM pts
    ),
    totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN x BETWEEN {_PRUNE_BOX["x_lo"]}
                                        AND {_PRUNE_BOX["x_hi"]}
                              AND y BETWEEN {_PRUNE_BOX["y_lo"]}
                                        AND {_PRUNE_BOX["y_hi"]}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        FROM coded
    ),
    layouts AS (
        SELECT 'zorder' AS layout, zb AS b, COUNT(*) AS n,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(y) AS y_min, MAX(y) AS y_max
        FROM coded GROUP BY zb
        UNION ALL
        SELECT 'xsort', xb, COUNT(*), MIN(x), MAX(x), MIN(y), MAX(y)
        FROM coded GROUP BY xb
    ),
    agg AS (
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(CASE WHEN NOT (x_max < {_PRUNE_BOX["x_lo"]}
                                   OR x_min > {_PRUNE_BOX["x_hi"]}
                                   OR y_max < {_PRUNE_BOX["y_lo"]}
                                   OR y_min > {_PRUNE_BOX["y_hi"]})
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS buckets_scanned,
               CAST(SUM(CASE WHEN NOT (x_max < {_PRUNE_BOX["x_lo"]}
                                   OR x_min > {_PRUNE_BOX["x_hi"]}
                                   OR y_max < {_PRUNE_BOX["y_lo"]}
                                   OR y_min > {_PRUNE_BOX["y_hi"]})
                             THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
        FROM layouts GROUP BY layout
    )
    SELECT layout, n_total, n_match, n_buckets, buckets_scanned,
           rows_scanned,
           CAST((1000000 * rows_scanned) // n_total AS BIGINT) AS scan_ppm
    FROM agg CROSS JOIN totals
    """,
    doc=(
        "Z-order pruning win, quantified — same data, same bucket "
        "count (2^10), two layouts (Morton quadtree tiles vs "
        "x-stripes); scanned rows = buckets whose REAL bbox intersects "
        "the query box (parquet row-group-stats semantics), all exact "
        "int64. The zorder layout scans strictly fewer rows on a 2-D "
        "box (asserted in tests/test_zorder_prune.py) — the measured "
        "justification for the layout family."
    ),
    tags=("spatial", "layout", "pruning"),
)
def q_zorder_prune_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.spatial import (
        zorder_prune_compare,
    )

    pts = _md5_points_spark(spark, sf_dir, with_id=False)
    return zorder_prune_compare(
        pts, "x", "y",
        _PRUNE_BOX["x_lo"], _PRUNE_BOX["x_hi"],
        _PRUNE_BOX["y_lo"], _PRUNE_BOX["y_hi"],
        bits=_PRUNE_BITS, bucket_bits=_PRUNE_BUCKET_BITS,
    )


# --------------------------------------------------------------------------
# Multimodal perceptual hashing
# --------------------------------------------------------------------------


@register(
    "q_image_dhash",
    oracle="""
    WITH imgs AS (
        SELECT doc_id AS id,
               1 + doc_id % 32 AS w,
               1 + (7 * doc_id) % 24 AS h,
               (1 + doc_id % 32) * (1 + (7 * doc_id) % 24) AS n
        FROM documents
        WHERE doc_id % 2 = 0
    ),
    samples AS (
        SELECT id, w, h, n, t.j,
               (t.j * (n - 1)) // 62 AS idx
        FROM imgs CROSS JOIN range(0, 63) t(j)
    ),
    g AS (
        SELECT id, w, h, n, j,
               (  (id + 3 * (idx % w)     + (h - 1 - idx // w)) % 256
                + (id + 3 * (idx % w) + 1 + (h - 1 - idx // w)) % 256
                + (id + 3 * (idx % w) + 2 + (h - 1 - idx // w)) % 256
               ) // 3 AS gray
        FROM samples
    ),
    bits AS (
        SELECT a.id, a.w, a.h, a.n, a.j,
               CASE WHEN b.gray > a.gray
                    THEN CAST(1 AS BIGINT) << a.j ELSE 0 END AS term
        FROM g a JOIN g b ON b.id = a.id AND b.j = a.j + 1
        WHERE a.j < 62
    )
    SELECT id AS asset_id,
           CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(MAX(n) AS BIGINT) AS n_pix,
           CAST(SUM(term) AS BIGINT) AS dhash
    FROM bits GROUP BY id
    """,
    doc=(
        "Perceptual image dHash — the near-duplicate-IMAGE leg of the "
        "dedup family: 62-bit difference hash over REALLY decoded BMP "
        "pixels (header walk, bottom-up unflip, stride unpad) in a "
        "mapInPandas kernel, defined for any image size via index "
        "resampling (j*(n-1) div 62), bit-62 shift cap respected. The "
        "oracle computes the identical hash analytically from the "
        "synthesis pixel formula, pinning the decode path byte-for-"
        "byte; equal-hash bucketing downstream = the candidates-then-"
        "verify shape (tests/test_image_dhash.py)."
    ),
    tags=("multimodal", "dedup", "perceptual-hash"),
)
def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.multimodal import (
        image_dhash,
        synthesize_media_assets,
    )

    docs = load_table(spark, "documents", sf_dir)
    assets = synthesize_media_assets(docs).where(F.col("asset_id") % 2 == 0)
    return image_dhash(assets)


@register(
    "q_audio_fingerprint",
    oracle="""
    WITH wavs AS (
        SELECT doc_id AS id,
               (1 + (doc_id // 2) % 2) * (50 + doc_id % 200) AS n
        FROM documents
        WHERE doc_id % 2 = 1
    ),
    samp AS (
        SELECT id, n, t.k,
               ((id * 31 + 2 * t.k) % 256)
               + 256 * ((id * 31 + 2 * t.k + 1) % 256) AS s
        FROM wavs CROSS JOIN range(0, 500) t(k)
        WHERE t.k < n
    ),
    v AS (
        SELECT id, n, k,
               CASE WHEN s >= 32768 THEN s - 65536 ELSE s END AS v
        FROM samp
    ),
    nonempty AS (
        SELECT id, n, (k * 63) // n AS j, SUM(v * v) AS energy
        FROM v GROUP BY 1, 2, 3
    ),
    frames AS (
        SELECT w.id, w.n, t.j, COALESCE(ne.energy, 0) AS energy
        FROM wavs w CROSS JOIN range(0, 63) t(j)
        LEFT JOIN nonempty ne ON ne.id = w.id AND ne.j = t.j
    ),
    bits AS (
        SELECT a.id, a.n, a.j,
               CASE WHEN b.energy > a.energy
                    THEN CAST(1 AS BIGINT) << a.j ELSE 0 END AS term
        FROM frames a JOIN frames b ON b.id = a.id AND b.j = a.j + 1
        WHERE a.j < 62
    )
    SELECT id AS asset_id,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM(term) AS BIGINT) AS fingerprint
    FROM bits GROUP BY id
    """,
    doc=(
        "Perceptual audio fingerprint — the WAV twin of q_image_dhash "
        "completing the multimodal near-dup pair: 62-bit frame-energy "
        "gradient over REALLY decoded PCM (RIFF chunk walk, signed "
        "16-bit LE) in a mapInPandas kernel; short clips leave "
        "trailing frames empty (energy 0), which the oracle "
        "materializes via a 63-frame left join — exercised by the "
        "n=51 clips in the corpus. Analytic oracle from the synthesis "
        "byte formula pins the decode path "
        "(tests/test_audio_fingerprint.py)."
    ),
    tags=("multimodal", "dedup", "perceptual-hash"),
)
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.multimodal import (
        audio_fingerprint,
        synthesize_media_assets,
    )

    docs = load_table(spark, "documents", sf_dir)
    assets = synthesize_media_assets(docs).where(F.col("asset_id") % 2 == 1)
    return audio_fingerprint(assets)


# --------------------------------------------------------------------------
# Text quality gates
# --------------------------------------------------------------------------

_PII_AUG_SQL = (
    "text || ' contact u' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)"
    " || '@mail.example.com ref ' || CAST(doc_id * 7919 + 1000 AS VARCHAR)"
    " || ' tok ' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)"
)


@register(
    "q_pii_scrub",
    oracle="""
    WITH aug AS (
        SELECT doc_id AS id, {aug} AS t
        FROM documents
    )
    SELECT id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+', '<EMAIL>', 'g'),
               '[0-9][0-9][0-9][0-9]+', '<NUM>', 'g'),
             '\\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\\b', '<HEX>', 'g')
               AS scrubbed,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(t, '[0-9][0-9][0-9][0-9]+'))
               AS BIGINT) AS n_digit_run,
           CAST(len(regexp_extract_all(t,
               '\\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\\b'))
               AS BIGINT) AS n_hex_token,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+'))
             + len(regexp_extract_all(t, '[0-9][0-9][0-9][0-9]+'))
             + len(regexp_extract_all(t,
               '\\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\\b'))
               AS BIGINT) AS n_redactions
    FROM aug
    """.replace("{aug}", _PII_AUG_SQL),
    doc=(
        "PII scrub + audit — one-pass redaction (chained global "
        "regexp_replace: email -> digit-run -> hex-token) plus "
        "per-pattern counts on the ORIGINAL text, the reviewable "
        "audit trail redaction needs. Patterns are config in the "
        "Java-regex ∩ RE2 common subset, passed as Python strings "
        "(never embedded in an F.expr SQL literal — Spark SQL eats "
        "backslashes); all JVM codegen, no UDF, no shuffle. The "
        "synthetic corpus has no natural PII, so the query PLANTS it "
        "deterministically from the md5 hash family — every pattern "
        "provably fires (tests/test_pii_scrub.py)."
    ),
    tags=("text", "privacy", "llm-data"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.text import pii_scrub_audit

    aug = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.expr(
            "text || ' contact u' || substr(md5(CAST(doc_id AS STRING)), 1, 6)"
            " || '@mail.example.com ref '"
            " || CAST(doc_id * 7919 + 1000 AS STRING)"
            " || ' tok ' || substr(md5(CAST(doc_id AS STRING)), 9, 8)"
        ).alias("t"),
    )
    return pii_scrub_audit(aug, "doc_id", "t")


_RULE_TABLE = [
    ("too_short", "length(text) < 200", "length(text) < 200"),
    ("too_long", "length(text) > 1500", "length(text) > 1500"),
    (
        "digit_heavy",
        "(length(text) - length(regexp_replace(text, '[0-9]', ''))) * 10"
        " > length(text)",
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 10"
        " > length(text)",
    ),
    (
        "caps_heavy",
        "(length(text) - length(regexp_replace(text, '[A-Z]', ''))) * 5"
        " > length(text)",
        "(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 5"
        " > length(text)",
    ),
]


@register(
    "q_rule_audit",
    oracle="""
    SELECT doc_id AS id,
           CAST({mask} AS BIGINT) AS fail_mask,
           CAST({nf} AS BIGINT) AS n_fails
    FROM documents
    """.replace(
        "{mask}",
        " + ".join(
            f"(CASE WHEN ({expr}) THEN {1 << i} ELSE 0 END)"
            for i, (_, _, expr) in enumerate(_RULE_TABLE)
        ),
    ).replace(
        "{nf}",
        " + ".join(
            f"(CASE WHEN ({expr}) THEN 1 ELSE 0 END)"
            for _, _, expr in _RULE_TABLE
        ),
    ),
    doc=(
        "Rule-table quality gate — C4/Gopher-style corpus filters as "
        "a CONFIG TABLE of named violation predicates (length bounds, "
        "digit/caps density): one no-shuffle pass emits a per-doc "
        "failure BITMASK (sum 2^i, <=62 rules per the shift cap); the "
        "rule_fail_counts rollup recovers per-rule counts from the "
        "mask via div/mod bit extraction, so the gate scans the "
        "corpus ONCE however many rules are configured "
        "(tests/test_rule_audit.py; only dialect split is "
        "regexp_replace's 'g' flag)."
    ),
    tags=("text", "quality", "llm-data"),
)
def q_rule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.text import rule_fail_audit

    docs = load_table(spark, "documents", sf_dir)
    return rule_fail_audit(docs, "doc_id", [(n, e) for n, e, _ in _RULE_TABLE])


# --------------------------------------------------------------------------
# Engine feature graduated to a query-backed row (r10 verdict item 6)
# --------------------------------------------------------------------------


@register(
    "q_bloom_filter_join",
    oracle="""
    SELECT l.l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty,
           TRUE AS bloom_planned
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    doc=(
        "Runtime bloom-filter join pruning (InjectRuntimeFilter), "
        "query-backed — when a shuffle join's build side is selective "
        "the optimizer plants a bloom_filter_agg subquery on it and "
        "rewrites the probe side with might_contain() BELOW the "
        "exchange, so at 100 TB most fact rows drop at the scan stage "
        "instead of shuffling. The thresholds exist for real "
        "clusters; local parquet is tiny, so the query pins the "
        "MECHANISM by lowering them (same confs as "
        "tests/test_scale_features.py), inspects the executed plan "
        "for bloom_filter_agg + might_contain, and emits that as the "
        "bloom_planned column — the oracle expects TRUE, so if Spark "
        "ever stops planting the filter the driver row goes red. "
        "Materialized via localCheckpoint while the confs are set "
        "(they're restored before returning), so the driver executes "
        "the bloom-planned result, not a re-planned one."
    ),
    tags=("scale", "join", "engine-surface", "runtime-filter"),
)
def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = (
            lineitem.join(sel, lineitem["l_orderkey"] == sel["o_orderkey"])
            .groupBy(F.col("l_returnflag").alias("flag"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
                .cast("bigint")
                .alias("sum_qty"),
            )
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        planned = "bloom_filter_agg" in plan and "might_contain" in plan
        return j.withColumn("bloom_planned", F.lit(planned)).localCheckpoint(
            eager=True
        )
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))
