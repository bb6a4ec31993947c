"""Round-4 coverage build-out: the remaining expressible TPC-H shapes
(adapted to the driver's reduced schemas — no partsupp/comment/shipmode
columns), graph analytics beyond PageRank, time-series interpolation,
asymmetric text containment, bit-reproducible embedding centroids, and
a streaming top-k.

All monetary aggregates follow the exact-decimal contract
(functions/money.py); all date-like result columns are TIMESTAMP on
both sides; every LIMIT carries a unique tiebreaker. Reference scope
note: the reference app itself (kafka-streams-aggregate) has a single
fold topology — this module is part of the mandated absent-category
build-out (SURVEY.md §2.3), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.functions.money import (
    dec,
    money_sum,
    money_sum_sql,
)
from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table

# Exact-decimal revenue term shared by the TPC-H shapes.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))"
)


def _rev_col() -> F.Column:
    return dec("l_extendedprice") * dec(1 - F.col("l_discount"), 8, 4)


def dec_lit(expr: F.Column, precision: int, scale: int) -> F.Column:
    return expr.cast(f"decimal({precision},{scale})")


# --- TPC-H Q4 (adapted: EXISTS via late shipment, no commitdate) ---------


@register(
    "q4_priority_late",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape (priority checking): EXISTS-style left-semi "
        "join with a non-equi residual (shipped >30 days after order "
        "date), counted per priority. The semi join shuffles both "
        "sides on l_orderkey once; the residual predicate evaluates "
        "inside the join, never materializing matched multiplicity."
    ),
    tags=("join", "semi", "aggregation", "tpch"),
)
def q4_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("late_orders"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q6 (forecast revenue change) ----------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {money_sum_sql("CAST(l_extendedprice AS DECIMAL(12,2))"
                          " * CAST(l_discount AS DECIMAL(8,4))")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 (forecast revenue): single-table scan-aggregate whose "
        "entire predicate set (date range, discount band, quantity cap) "
        "pushes into the parquet scan — the canonical pushdown/pruning "
        "showcase; zero shuffles beyond the final 1-row combine."
    ),
    tags=("scan", "aggregation", "pushdown", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(dec("l_extendedprice") * dec_lit(F.col("l_discount"), 8, 4))
            .alias("revenue")
        )
    )


# --- TPC-H Q8 (adapted: national market share within a region) -----------


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CASE WHEN ns.n_name = 'NATION_7'
                    THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
           / CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    GROUP BY 1
    ORDER BY 1
    """,
    doc=(
        "TPC-H Q8 shape (national market share): NATION_7's share of "
        "revenue delivered into ASIA-region customers, per order year. "
        "Conditional decimal sums -> exact doubles -> one ratio. "
        "Nation/region broadcast (fixed-size); customer and supplier "
        "join strategy left to AQE — they grow with scale factor."
    ),
    tags=("join", "aggregation", "ratio", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)

    nc = F.broadcast(
        nat.join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            nat["n_regionkey"] == reg["r_regionkey"],
        ).select(F.col("n_nationkey").alias("_c_natkey"))
    )
    ns = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("_s_natkey"), F.col("n_name").alias("_s_nation")
        )
    )
    rev = _rev_col()
    zero = dec_lit(F.lit(0), 12, 2)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nc, cust["c_nationkey"] == F.col("_c_natkey"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(ns, supp["s_nationkey"] == F.col("_s_natkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.round(
                    F.sum(F.when(F.col("_s_nation") == "NATION_7", rev).otherwise(zero)),
                    2,
                ).cast("double")
                / F.round(F.sum(rev), 2).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- TPC-H Q10 (returned-item reporting) ----------------------------------


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {money_sum_sql(_REV_SQL)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 (returned items): quarter + returnflag predicates "
        "push to the scans, three-way join, exact-decimal revenue, "
        "top-20 with a unique tiebreaker (custkey) so the LIMIT is a "
        "total order — planned as TakeOrderedAndProject, no global sort."
    ),
    tags=("join", "aggregation", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    nat = F.broadcast(load_table(spark, "nation", sf_dir))
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(_rev_col()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q13 (customer order-count distribution) ------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13 (customer distribution): left outer join with a "
        "filtered probe side (priority <> 5-LOW stands in for the "
        "comment NOT LIKE of the spec — our orders table has no "
        "comment column), COUNT of a nullable key, then a second "
        "aggregation over the first's output."
    ),
    tags=("join", "outer", "aggregation", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- TPC-H Q15 (top supplier by quarterly revenue) -------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, {money_sum_sql(_REV_SQL)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc=(
        "TPC-H Q15 (top supplier): quarterly per-supplier revenue, then "
        "an equality filter against the scalar max — computed once and "
        "broadcast, not recomputed per row. Exact-decimal rounding "
        "before the double comparison makes the equality deterministic."
    ),
    tags=("join", "aggregation", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(money_sum(_rev_col()).alias("total_revenue"))
    top = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = load_table(spark, "supplier", sf_dir)
    return (
        rev.join(F.broadcast(top), rev["total_revenue"] == F.col("_mx"))
        .join(supp, supp["s_suppkey"] == rev["l_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Pareto / cumulative-share analytics -----------------------------------


@register(
    "q_pareto_customers",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS revenue,
               ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS rev_dec
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, revenue,
           CAST(SUM(rev_dec) OVER (ORDER BY rev_dec DESC, o_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST((SELECT SUM(rev_dec) FROM per_cust) AS DOUBLE) AS cum_share
    FROM per_cust
    ORDER BY revenue DESC, o_custkey
    LIMIT 25
    """,
    doc=(
        "Pareto (cumulative revenue share): per-customer decimal revenue, "
        "a running decimal sum over the revenue-descending order, divided "
        "by the grand total — both sums exact (order-independent), so the "
        "cumulative shares are bit-stable under any partitioning. Top-25 "
        "with custkey tiebreaker."
    ),
    tags=("window", "aggregation", "analytics"),
)
def q_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum(dec("o_totalprice")), 2).alias("_rev_dec")
    )
    w = (
        Window.orderBy(F.col("_rev_dec").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = per_cust.agg(F.sum("_rev_dec").alias("_total"))
    return (
        per_cust.withColumn("_cum", F.sum("_rev_dec").over(w))
        .join(F.broadcast(total))
        .select(
            "o_custkey",
            F.col("_rev_dec").cast("double").alias("revenue"),
            (F.col("_cum").cast("double") / F.col("_total").cast("double")).alias(
                "cum_share"
            ),
        )
        .orderBy(F.col("revenue").desc(), "o_custkey")
        .limit(25)
    )


# --- Graph: triangle counting ----------------------------------------------


@register(
    "q_triangle_count",
    oracle="""
    WITH ik AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM ik a JOIN ik b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.pa = e1.pb
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    nodes AS (
        SELECT COUNT(DISTINCT p) AS n_nodes
        FROM (SELECT pa AS p FROM edges UNION ALL SELECT pb FROM edges)
    ),
    ne AS (SELECT COUNT(*) AS n_edges FROM edges)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM nodes, ne, tri
    """,
    doc=(
        "Triangle counting on the part co-purchase graph (edges = part "
        "pairs co-occurring in >= 2 orders; the support cut keeps the "
        "edge set near-linear in parts). Canonical ordered-wedge "
        "algorithm: edges kept as a < b only, wedges built by one "
        "self-join, closed by a second — never enumerating per-node "
        "neighbor cross products. Edge list is localCheckpointed once "
        "and reused by all three references."
    ),
    tags=("graph", "join", "aggregation"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    ik = li.select("l_orderkey", "l_partkey").distinct()
    a = ik.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pa"))
    b = ik.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "_ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("pa", "pb")
        .localCheckpoint(eager=False)
    )
    e1 = edges
    e2 = edges.select(F.col("pa").alias("_2a"), F.col("pb").alias("_2b"))
    e3 = edges.select(F.col("pa").alias("_3a"), F.col("pb").alias("_3b"))
    tri = (
        e1.join(e2, F.col("_2a") == e1["pb"])
        .join(e3, (F.col("_3a") == e1["pa"]) & (F.col("_3b") == F.col("_2b")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("pa").alias("p"))
        .unionAll(edges.select(F.col("pb").alias("p")))
        .agg(F.countDistinct("p").cast("bigint").alias("n_nodes"))
    )
    ne = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return nodes.crossJoin(ne).crossJoin(tri)


# --- Time series: linear interpolation --------------------------------------


@register(
    "q_interp_linear",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM events
    ),
    daily AS (
        SELECT user_id, day,
               CAST(SUM(q) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS v
        FROM ev GROUP BY 1, 2
    ),
    grid AS (
        SELECT u.user_id,
               CAST(unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM (SELECT DISTINCT user_id FROM ev) u
        CROSS JOIN (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev) b
    ),
    joined AS (
        SELECT g.user_id, g.day, d.v FROM grid g
        LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    ),
    ctx AS (
        SELECT user_id, day, v,
            LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
            FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM joined
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                    pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                      / CAST(date_diff('day', pd, nd) AS DOUBLE))
                ELSE NULL END AS value,
           CAST(v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL AS INTEGER)
               AS interpolated
    FROM ctx
    """,
    doc=(
        "Time-series linear interpolation (gap fill): per-user daily "
        "means on a dense day grid, missing days filled by the straight "
        "line between bracketing observations. Daily means use quantized "
        "integer sums (order-independent, so partial aggregation is "
        "exact); the interpolation itself is one fused expression shape "
        "on both sides. Leading/trailing gaps stay NULL. Two window "
        "passes per direction over data partitioned once by user."
    ),
    tags=("timeseries", "window", "analytics"),
)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 1000000.0 + 0.5).cast("long").alias("_q"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        (
            F.sum("_q").cast("double") / F.lit(1000000.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("v")
    )
    bounds = ev.agg(F.min("day").alias("_mn"), F.max("day").alias("_mx"))
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id", F.explode(F.sequence("_mn", "_mx")).alias("day")
        )
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff("day", "pd").cast("double")
        / F.datediff("nd", "pd").cast("double")
    )
    return ctx.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("value"),
        (
            F.col("v").isNull()
            & F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
        )
        .cast("int")
        .alias("interpolated"),
    )


# --- Text: asymmetric n-gram containment ------------------------------------


@register(
    "q_text_containment_pairs",
    oracle="""
    WITH raw_idx AS (
        SELECT DISTINCT doc_id, shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(
                         range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                         i -> array_to_string(list_slice(string_split(text, ' '),
                              CAST(i AS INT), CAST(i + 2 AS INT)), ' '))) AS shingle
              FROM documents)
    ),
    idx AS (
        SELECT doc_id, shingle FROM raw_idx
        WHERE shingle IN (
            SELECT shingle FROM raw_idx GROUP BY shingle HAVING COUNT(*) <= 50
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM idx a JOIN idx b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(c AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment
    FROM common JOIN sizes sa ON sa.doc_id = id_a
    WHERE CAST(c AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= 0.5
    """,
    doc=(
        "Directed n-gram containment c(a->b) = |A∩B|/|A|: the "
        "asymmetric near-dup metric that catches a short document "
        "embedded in a long one (benchmark contamination, quote "
        "expansion) where Jaccard stays tiny. Same frequency-capped "
        "inverted-index join as the Jaccard operator — linear at scale."
    ),
    tags=("llm", "dedup", "text"),
)
def q_text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    return ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=50
    )


# --- Embeddings: bit-reproducible per-label centroids ------------------------


@register(
    "q_embed_centroid_by_label",
    oracle="""
    SELECT label, CAST(t.i AS INTEGER) AS dim,
           CAST(SUM(CAST(floor(CAST(embedding[t.i + 1] AS DOUBLE) * 1048576.0
                               + 0.5) AS BIGINT)) AS BIGINT) AS qsum,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(CAST(embedding[t.i + 1] AS DOUBLE) * 1048576.0
                               + 0.5) AS BIGINT)) AS DOUBLE)
               / 1048576.0 / CAST(COUNT(*) AS DOUBLE) AS centroid
    FROM embeddings, range(0, 64) t(i)
    GROUP BY 1, 2
    """,
    doc=(
        "Per-label embedding centroids with quantized integer "
        "accumulation (floor(x*2^20 + 0.5) as BIGINT): integer sums are "
        "order-independent, so the centroid is bit-identical under any "
        "partitioning or partial-aggregation schedule — the same trick "
        "the IVF trainer uses. posexplode -> one hash aggregate on "
        "(label, dim); at 100 TB this is the map-side-combinable way to "
        "build class centroids for semantic dedup or clustering init."
    ),
    tags=("llm", "similarity", "aggregation"),
)
def q_embed_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label",
        F.col("pos").alias("dim"),
        F.floor(F.col("col") * 1048576.0 + 0.5).cast("long").alias("_q"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.sum("_q").cast("bigint").alias("qsum"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("_q").cast("double") / F.lit(1048576.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("centroid"),
    )


# --- Streaming: windowed top-k trending --------------------------------------


@register(
    "q_stream_topk_trending",
    oracle="""
    WITH agg AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT))
                   AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2
    ),
    closed AS (
        SELECT * FROM agg
        WHERE window_start + INTERVAL 1 DAY <= (SELECT max(ts) FROM events)
    )
    SELECT window_start, event_type, n,
           CAST(rk AS INTEGER) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                    ORDER BY n DESC, event_type) AS rk
        FROM closed
    )
    WHERE rk <= 3
    """,
    doc=(
        "Streaming trending top-k: tumbling 1-day counts per event type "
        "computed as a REAL stream (readStream + watermark + append "
        "mode, same harness as q_tumbling_window_stream), then the "
        "top-3 per closed window ranked on the collected micro-batch "
        "output — the classic stream-aggregate-then-finish pattern. "
        "Oracle reproduces exactly the watermark-closed windows."
    ),
    tags=("streaming", "streaming-window", "topk"),
)
def q_stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.tables import stream_events

    work = tempfile.mkdtemp(prefix="ksa_trending_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        shutil.os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = stream_events(spark, src, ("ts", "event_type"))
        agg = (
            raw.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                F.col("window.start").alias("window_start"), "event_type", "n"
            )
        )
        from kafka_streams_aggregate_spark.sources.eventlog_source import (
            run_stream_committed,
        )

        out = run_stream_committed(
            agg, work, "append",
            "window_start timestamp, event_type string, n bigint",
        )
        w = Window.partitionBy("window_start").orderBy(
            F.col("n").desc(), "event_type"
        )
        return (
            out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


# --- TPC-H Q2/Q9/Q11/Q12/Q16/Q20 (adapted: no partsupp table in the ----
# --- testdata, so a supply relation is derived from lineitem; no    ----
# --- shipmode column, so l_returnflag stands in as the ship class)  ----

# Derived supply relation: one row per (part, supplier) that ever
# shipped together; cost = cheapest observed unit price (floored to an
# exact integer), availqty = total floored quantity. All-integer
# columns keep every downstream aggregate bit-exact vs the oracle.
_PS_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(floor(l_extendedprice / l_quantity) AS BIGINT))
                   AS ps_supplycost,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS ps_availqty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
"""

_TPCH_VIEWS = ("lineitem", "orders", "customer", "supplier", "part", "nation", "region")


def _sql_query(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    for t in _TPCH_VIEWS:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(sql)


_Q2_SQL = f"""
    WITH ps AS ({_PS_SQL})
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost
    FROM part p
    JOIN ps ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_SQL,
    doc=(
        "TPC-H Q2 shape (minimum-cost supplier): the one decorrelation "
        "pattern not covered elsewhere — a correlated scalar MIN over a "
        "multi-table JOIN (cheapest European supply for each part). "
        "Catalyst decorrelates it into a grouped-min aggregate joined "
        "back on ps_partkey — one join tree, no per-row subquery "
        "(pinned in tests/test_plans.py). Ordered + unique-tiebroken "
        "LIMIT 100."
    ),
    tags=("subquery", "join", "sql", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _Q2_SQL)


_Q9_SQL = f"""
    WITH ps AS ({_PS_SQL})
    SELECT ns.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l.l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
           - CAST(SUM(ps.ps_supplycost * CAST(floor(l.l_quantity) AS BIGINT))
                  AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY ns.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year
"""


@register(
    "q9_product_profit",
    oracle=_Q9_SQL,
    doc=(
        "TPC-H Q9 shape (product-type profit): per nation x order-year "
        "profit on red parts — revenue (exact decimal sum -> round -> "
        "double) minus supply cost (pure bigint sum -> double), both "
        "order-independent so the result is bit-stable under any "
        "partitioning. Six-table join: part/supplier/nation broadcast, "
        "lineitem-orders and lineitem-ps shuffle on their keys."
    ),
    tags=("join", "aggregation", "sql", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _Q9_SQL)


_Q11_SQL = f"""
    WITH ps AS ({_PS_SQL}),
    val AS (
        SELECT n.n_name AS nation,
               CAST(SUM(ps.ps_supplycost * ps.ps_availqty) AS BIGINT)
                   AS stock_value
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
    )
    SELECT nation, stock_value
    FROM val
    WHERE CAST(stock_value AS DOUBLE) > (
        SELECT CAST(SUM(stock_value) AS BIGINT) / 25.0 FROM val
    )
    ORDER BY stock_value DESC, nation
"""


@register(
    "q11_important_stock",
    oracle=_Q11_SQL,
    doc=(
        "TPC-H Q11 shape (important stock): per-nation supply value "
        "filtered by an uncorrelated scalar subquery over the same CTE "
        "(above-average-share nations). All-integer value sums (exact "
        "at any row count); the scalar becomes a broadcast single-row "
        "join."
    ),
    tags=("subquery", "aggregation", "sql", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _Q11_SQL)


_Q12_SQL = """
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    ORDER BY ship_class
"""


@register(
    "q12_priority_shipping",
    oracle=_Q12_SQL,
    doc=(
        "TPC-H Q12 shape (shipping-mode priority): conditional counts "
        "of high/low-priority orders per ship class (l_returnflag "
        "stands in for the absent l_shipmode) over late-shipped lines "
        "in one year. The date predicates push to the lineitem scan; "
        "the theta residual (shipdate > orderdate + 45d) rides the "
        "orderkey equi-join."
    ),
    tags=("join", "aggregation", "sql", "tpch"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _Q12_SQL)


_Q16_SQL = f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.ps_suppkey NOT IN (
          SELECT s.s_suppkey FROM supplier s WHERE s.s_name LIKE '%7%'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register(
    "q16_supplier_part_count",
    oracle=_Q16_SQL,
    doc=(
        "TPC-H Q16 shape (parts/supplier relationship): distinct "
        "supplier counts per (brand, type, size) with a NOT IN "
        "subquery excluding flagged suppliers — planned as a "
        "null-aware anti join (keys non-nullable, so it degenerates to "
        "a plain broadcast anti join). Brand/type/size filters prune "
        "the part scan."
    ),
    tags=("subquery", "aggregation", "sql", "tpch"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _Q16_SQL)


_Q20_SQL = f"""
    WITH ps AS ({_PS_SQL})
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 1
      AND s.s_suppkey IN (
          SELECT ps.ps_suppkey FROM ps
          WHERE ps.ps_partkey IN (
              SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'small%'
          )
          AND ps.ps_availqty > (
              SELECT 0.5 * SUM(floor(l.l_quantity))
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate < TIMESTAMP '1998-01-01'
          )
      )
    ORDER BY s.s_name
"""


@register(
    "q20_excess_suppliers",
    oracle=_Q20_SQL,
    doc=(
        "TPC-H Q20 shape (potential part promotion): IN-subquery whose "
        "body itself contains a correlated scalar SUM over lineitem "
        "(suppliers holding more of the small parts than half of what "
        "they shipped in the window) — the nested-decorrelation "
        "pattern: inner scalar becomes a grouped sum joined on "
        "(partkey, suppkey), outer IN becomes a left-semi join. Both "
        "sums stay on exact integer values inside doubles."
    ),
    tags=("subquery", "join", "sql", "tpch"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_query(spark, sf_dir, _Q20_SQL)


# --- Point-in-time (temporal) join against an SCD2 dimension -------------

_TEMPORAL_SCD2_SQL = """
    WITH dim AS (
        SELECT o_custkey, o_orderstatus,
               o_orderdate AS valid_from,
               COALESCE(lead(o_orderdate) OVER (
                            PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey),
                        TIMESTAMP '2199-12-31 00:00:00') AS valid_to
        FROM orders
    ),
    f AS (
        SELECT o.o_custkey, l.l_shipdate,
               CAST(l.l_extendedprice AS DECIMAL(12,2)) AS price
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT d.o_orderstatus AS status_at_ship,
           CAST(year(f.l_shipdate) AS INTEGER) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(f.price), 2) AS DOUBLE) AS revenue
    FROM f
    JOIN dim d ON d.o_custkey = f.o_custkey
              AND f.l_shipdate >= d.valid_from
              AND f.l_shipdate < d.valid_to
    GROUP BY d.o_orderstatus, year(f.l_shipdate)
    ORDER BY status_at_ship, ship_year
"""


@register(
    "q_temporal_scd2_join",
    oracle=_TEMPORAL_SCD2_SQL,
    doc=(
        "Point-in-time join against an SCD2 dimension: each shipped "
        "line picks the order-status version that was in effect for its "
        "customer AT SHIP TIME (equi-join on the customer key + interval "
        "residual valid_from <= ts < valid_to — the warehouse temporal "
        "join pattern). The SCD2 intervals partition each customer's "
        "timeline, so exactly one version matches per line. Scale shape: "
        "one shuffle on custkey for fact and dimension; the interval "
        "check rides the equi-join as a residual predicate (never a "
        "cross product); exact decimal revenue."
    ),
    tags=("join", "scd2", "temporal", "window"),
)
def q_temporal_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = orders.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("2199-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    fact = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    ).select("o_custkey", "l_shipdate", dec("l_extendedprice").alias("price"))
    joined = fact.join(
        dim,
        (fact["o_custkey"] == dim["o_custkey"])
        & (fact["l_shipdate"] >= dim["valid_from"])
        & (fact["l_shipdate"] < dim["valid_to"]),
    )
    return (
        joined.groupBy(
            F.col("o_orderstatus").alias("status_at_ship"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            money_sum(F.col("price")).alias("revenue"),
        )
        .orderBy("status_at_ship", "ship_year")
    )


# --- Bounded-depth BFS reachability (distance semantics) -----------------

_BFS_SQL = """
    WITH RECURSIVE
    edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey <> b.l_partkey
    ),
    walk(node, dist) AS (
        SELECT p_partkey, 0 FROM part WHERE p_partkey < 10
        UNION
        SELECT e.dst, w.dist + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.dist < 3
    )
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
    FROM walk GROUP BY node
"""


@register(
    "q_bfs_reachability",
    oracle=_BFS_SQL,
    doc=(
        "Bounded-depth BFS (3 hops) from seed parts over the "
        "co-purchase graph, reporting minimum hop distance — the graph "
        "traversal shape connected components can't express (distance, "
        "not membership). Spark runs it as 3 frontier join+min-agg "
        "rounds with localCheckpoint lineage truncation (the standard "
        "Pregel-style expansion: each round is one equi-join on src + "
        "one groupBy min — linear in edges per round at any scale); the "
        "oracle is DuckDB's recursive CTE with UNION-dedup on "
        "(node, dist)."
    ),
    tags=("graph", "iterative", "join"),
)
def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    li = lineitem.select("l_orderkey", "l_partkey")
    # Same one-shuffle co-purchase edge build as q_pagerank_parts:
    # per-order distinct part sets (orders are bounded at <= 7 items, so
    # the pair expansion is O(1) per order), exploded to directed pairs,
    # deduped on a src-clustered exchange that also serves the BFS
    # rounds' join partitioning.
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        sets.select(F.explode("ps").alias("src"), F.col("ps"))
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    reached = part.filter(F.col("p_partkey") < 10).select(
        F.col("p_partkey").alias("node"), F.lit(0).alias("dist")
    )
    for _ in range(3):
        # Broadcast the reached set explicitly: localCheckpoint erases
        # catalyst size stats, so the auto-strategy would sort-merge the
        # 2M-edge side every round. The reached set is bounded by the
        # seeds' 3-hop neighborhood (and by |V| << |E| generally), which
        # is the side a Pregel engine replicates too; for unbounded
        # frontiers drop the hint and let the edges' src partitioning
        # carry a shuffle join.
        nxt = F.broadcast(reached).join(
            edges, reached["node"] == edges["src"]
        ).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        reached = (
            reached.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return reached.select("node", F.col("dist").cast("int").alias("dist"))


# --- Entity resolution: blocked fuzzy matching ---------------------------

_FUZZY_SQL = """
    WITH blocked AS (
        SELECT c_custkey, c_name,
               substr(c_name, 1, length(c_name) - 2) AS blk
        FROM customer
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
    FROM blocked a
    JOIN blocked b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


@register(
    "q_fuzzy_name_pairs",
    oracle=_FUZZY_SQL,
    doc=(
        "Entity-resolution blocked fuzzy join: candidate customer-name "
        "pairs within an edit distance of 1, generated per blocking key "
        "(name prefix) so the quadratic levenshtein stage is bounded per "
        "block — the standard record-linkage shape. At 100 TB the block "
        "join is a shuffle equi-join on the blocking key; edit distance "
        "runs as a codegen'd residual only inside blocks, never "
        "all-pairs."
    ),
    tags=("llm", "dedup", "fuzzy", "join"),
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    blocked = cust.select(
        "c_custkey",
        "c_name",
        F.expr("substr(c_name, 1, length(c_name) - 2)").alias("blk"),
    )
    a = blocked.select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("_na"), "blk"
    )
    b = blocked.select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("_nb"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("_na", "_nb").cast("int"))
        .filter(F.col("edit_dist") <= 1)
        .select("id_a", "id_b", "edit_dist")
    )


# --- Histogram binning ---------------------------------------------------

_HISTOGRAM_SQL = """
    SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
           CAST(floor(l_extendedprice / 5000) AS BIGINT) * 5000 AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY bucket
"""


@register(
    "q_price_histogram",
    oracle=_HISTOGRAM_SQL,
    doc=(
        "Equi-width histogram of extended price (5000-unit bins): "
        "explicit floor-division binning (identical IEEE division + "
        "floor in both engines — width_bucket built-ins differ across "
        "engines) in one hash aggregate; the profiling primitive behind "
        "range partitioning and skew diagnosis."
    ),
    tags=("aggregation", "statistics", "histogram"),
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    bucket = F.floor(F.col("l_extendedprice") / F.lit(5000)).cast("bigint")
    return (
        lineitem.groupBy(
            bucket.alias("bucket"), (bucket * 5000).alias("bucket_lo")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("bucket")
    )


# --- Order-independent table checksums -----------------------------------

def _checksum_sql(table: str, cols: list[str]) -> str:
    concat = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"""
        SELECT '{table}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5({concat}), 1, 15))::BIGINT
                        AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)
                   AS checksum
        FROM {table}
    """


_CHECKSUM_TABLES = {
    "lineitem": ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_mktsegment"],
}

_CHECKSUM_ORACLE = "\nUNION ALL\n".join(
    _checksum_sql(t, cs) for t, cs in _CHECKSUM_TABLES.items()
)


@register(
    "q_table_checksum",
    oracle=_CHECKSUM_ORACLE,
    doc=(
        "Order-independent table checksums — the migration/replication "
        "audit primitive: per row a 60-bit md5 fingerprint of the key "
        "and status columns (ints/strings only: float and timestamp "
        "formatting is engine-specific), summed exactly in DECIMAL(38,0) "
        "and folded mod 2^62. Addition commutes, so the checksum is "
        "identical under ANY partitioning/row order — a pure map-side- "
        "combinable aggregate that audits 100 TB with one scan and a "
        "3-row result."
    ),
    tags=("aggregation", "integrity", "checksum"),
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, cols in _CHECKSUM_TABLES.items():
        df = load_table(spark, table, sf_dir)
        concat = None
        for c in cols:
            piece = F.col(c).cast("string")
            concat = piece if concat is None else F.concat(concat, F.lit("|"), piece)
        h = F.conv(F.substring(F.md5(concat), 1, 15), 16, 10).cast("long")
        agg = df.agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.pmod(
                F.sum(h.cast("decimal(38,0)")), F.lit(1 << 62).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("checksum"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# --- Ratio-to-report / share-of-total ------------------------------------

_RATIO_SQL = """
    WITH rev AS (
        SELECT n.n_name AS nation,
               SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev_dec
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    )
    SELECT nation,
           CAST(ROUND(rev_dec, 2) AS DOUBLE) AS revenue,
           CAST(ROUND(rev_dec, 2) AS DOUBLE)
             / CAST(ROUND(SUM(rev_dec) OVER (), 2) AS DOUBLE) AS share
    FROM rev ORDER BY nation
"""


@register(
    "q_ratio_to_report",
    oracle=_RATIO_SQL,
    doc=(
        "Ratio-to-report: each nation's share of total order revenue "
        "via an unpartitioned window sum — computed over EXACT decimals "
        "(a double window sum would be summation-order-dependent and "
        "flunk cross-engine parity), rounded once, one double division. "
        "The global window runs over the 25-row aggregate, not the "
        "fact table — fine at any scale."
    ),
    tags=("window", "aggregation", "ratio"),
)
def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = Window.partitionBy()
    revenue = F.round(F.col("rev_dec"), 2).cast("double")
    total = F.round(F.sum("rev_dec").over(w), 2).cast("double")
    return rev.select(
        "nation", revenue.alias("revenue"), (revenue / total).alias("share")
    ).orderBy("nation")


# --- Gaps and islands (consecutive-day activity streaks) ------------------

_ISLANDS_SQL = """
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events
    ),
    numbered AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS island
        FROM days
    ),
    islands AS (
        SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        FROM numbered GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM islands GROUP BY user_id ORDER BY user_id
"""


@register(
    "q_activity_islands",
    oracle=_ISLANDS_SQL,
    doc=(
        "Gaps-and-islands: per user, the number of consecutive-day "
        "activity streaks and the longest streak, via the classic "
        "day - row_number() island key (consecutive days share a key). "
        "One shuffle on user_id serves the distinct, the window, and "
        "both aggregates."
    ),
    tags=("window", "analytic", "sessionize"),
)
def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    day = F.floor(F.unix_timestamp(F.col("ts")) / 86400).cast("bigint")
    days = events.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    numbered = days.withColumn(
        "island", F.col("day") - F.row_number().over(w)
    )
    islands = numbered.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# --- Cumulative distinct users (running total of first-seen) --------------

_CUMULATIVE_SQL = """
    WITH first_seen AS (
        SELECT user_id,
               MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
                ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_users
    FROM daily ORDER BY day
"""


@register(
    "q_cumulative_distinct_users",
    oracle=_CUMULATIVE_SQL,
    doc=(
        "Running distinct-user count per day WITHOUT a quadratic "
        "distinct-over-window: min-first-seen per user collapses the "
        "problem to a per-day new-user count plus an exact bigint "
        "running sum — the incremental-analytics rewrite that scales "
        "(a naive COUNT(DISTINCT) OVER cumulative window re-scans "
        "history per day)."
    ),
    tags=("window", "aggregation", "analytic"),
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    day = F.floor(F.unix_timestamp(F.col("ts")) / 86400).cast("bigint")
    first_seen = events.groupBy("user_id").agg(F.min(day).alias("first_day"))
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Contiguous event-sequence pattern matching (MATCH_RECOGNIZE-lite CEP).
# --------------------------------------------------------------------------

# 24h: the synthetic stream averages ~30 min between a user's events, so a
# 1-hour bound matches ~nothing at sf<=0.01 and the oracle comparison would
# be vacuously empty-vs-empty; 24h yields matches at every verification SF
# (5 @ sf0.001, 54 @ sf0.01, 514 @ sf0.1).
_CEP_WINDOW_US = 86_400_000_000


@register(
    "q_cep_pattern_match",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    matches AS (
        SELECT user_id, ts, ts2 FROM ordered
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND epoch_us(ts2) - epoch_us(ts) <= {_CEP_WINDOW_US}
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           MIN(ts) AS first_match_start,
           MAX(ts2) AS last_match_end
    FROM matches GROUP BY user_id
    """,
    doc=(
        "Complex-event-processing pattern match (the MATCH_RECOGNIZE / "
        "Flink-CEP shape): per user, find CONTIGUOUS view->click->"
        "purchase runs in the (ts, event_id)-ordered stream that "
        "complete within 24 hours. Because the three pattern symbols "
        "are distinct event types, contiguous matches cannot overlap, "
        "so counting match starts equals AFTER MATCH SKIP PAST LAST "
        "ROW semantics — no sequential scan needed, just two lead() "
        "columns over one per-user sort. Contrast with q_event_funnel, "
        "which matches NON-contiguous ordered steps. Time bound uses "
        "integer epoch microseconds on both engines (unix_micros vs "
        "epoch_us) — never tz-dependent second casts. Scale shape: "
        "one window exchange partitioned by user_id; the lead() frame "
        "is row-based so whole-stage codegen keeps it in one pass — "
        "this is the standard distributed CEP reduction for fixed "
        "finite patterns (true regex-with-quantifiers CEP needs the "
        "per-key ordered fold, i.e. applyInPandasWithState on this "
        "same partitioning)."
    ),
    tags=("cep", "window", "analytics"),
)
def q_cep_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    matches = ordered.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (
            F.unix_micros(F.col("ts2")) - F.unix_micros(F.col("ts"))
            <= _CEP_WINDOW_US
        )
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("ts").alias("first_match_start"),
        F.max("ts2").alias("last_match_end"),
    )


# --------------------------------------------------------------------------
# OHLC time-bucket downsampling (telemetry resample).
# --------------------------------------------------------------------------

_OHLC_BUCKET_US = 86_400_000_000  # 1-day buckets


@register(
    "q_ohlc_downsample",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               epoch_us(ts) // {_OHLC_BUCKET_US} AS day,
               value,
               row_number() OVER w AS rn,
               COUNT(*) OVER (
                   PARTITION BY event_type,
                                epoch_us(ts) // {_OHLC_BUCKET_US}) AS n
        FROM events
        WINDOW w AS (
            PARTITION BY event_type, epoch_us(ts) // {_OHLC_BUCKET_US}
            ORDER BY ts, event_id)
    )
    SELECT event_type, day,
           CAST(MAX(n) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn = n THEN value END) AS close
    FROM b GROUP BY event_type, day
    """,
    doc=(
        "OHLC (open/high/low/close) downsampling of the event stream "
        "into per-type daily candles — the telemetry/market resample "
        "every time-series store offers. open/close pick RAW stored "
        "doubles by (ts, event_id) order (no float arithmetic, so "
        "cell-exact); the last-row marker is derived as rn = count "
        "over the same partition rather than a second descending "
        "sort, so Spark plans ONE exchange + one sort per bucket "
        "partition. Bucketing uses integer epoch-microsecond division "
        "(tz-proof on both engines). Scale shape: partitioned by "
        "(series, bucket), embarrassingly parallel; at 100 TB this is "
        "a single window stage whose output is |series|×|buckets| "
        "rows — the canonical raw->rollup compaction that feeds "
        "dashboards without rescanning raw history."
    ),
    tags=("timeseries", "window", "resample"),
)
def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    day = F.expr(f"unix_micros(ts) div {_OHLC_BUCKET_US}")
    base = events.select(
        "event_type", day.alias("day"), "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wn = Window.partitionBy("event_type", "day")
    b = base.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return b.groupBy("event_type", "day").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias(
            "close"
        ),
    )


# --------------------------------------------------------------------------
# Exact per-group percentiles (observability p50/p95/p99).
# --------------------------------------------------------------------------


@register(
    "q_latency_percentiles",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS p50,
           MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS p95,
           MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
    FROM ranked GROUP BY event_type
    """,
    doc=(
        "Exact per-group percentiles (the SLO dashboard shape): value "
        "at rank ceil(p*n) in (value, event_id) order per event type. "
        "The rank is computed in INTEGER arithmetic — (95*n + 99) DIV "
        "100 — because ceil(0.95 * n) in doubles is off-by-one "
        "whenever 0.95*n lands epsilon above an integer (0.95 has no "
        "exact binary representation), and percentile built-ins "
        "(percentile_disc/quantile) interpolate differently across "
        "engines. Emitted percentiles are RAW stored doubles (picked, "
        "not computed), so cell-exact. Scale shape: one exchange on "
        "the group key + one sort per group — exact percentiles "
        "fundamentally need that sort; when a single group spans the "
        "cluster, swap in two-pass histogram refinement "
        "(q_price_histogram is the building block) or accept the "
        "sketch estimate. Spark's percentile_approx is the built-in "
        "alternative but is approximate and engine-specific, hence "
        "unverifiable cell-exactly."
    ),
    tags=("window", "percentile", "analytics"),
)
def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = events.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(pct: int) -> F.Column:
        rank = F.expr(f"({pct} * n + 99) div 100")
        return F.max(F.when(F.col("rn") == rank, F.col("value")))

    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        at(50).alias("p50"),
        at(95).alias("p95"),
        at(99).alias("p99"),
    )


@register(
    "q_cep_pattern_match_stream",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    matches AS (
        SELECT user_id, ts, ts2 FROM ordered
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND epoch_us(ts2) - epoch_us(ts) <= {_CEP_WINDOW_US}
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           MIN(epoch_us(ts)) AS first_match_start_us,
           MAX(epoch_us(ts2)) AS last_match_end_us
    FROM matches GROUP BY user_id
    """,
    doc=(
        "STREAMING twin of q_cep_pattern_match — the general stateful "
        "CEP its docstring points at: events arrive in two time-split "
        "micro-batches and the contiguous view->click->purchase "
        "matcher carries each user's LAST TWO events as "
        "applyInPandasWithState state, so runs that straddle the "
        "batch boundary still complete (for a fixed length-3 pattern "
        "the partial-match NFA state is exactly those two events — "
        "O(1) per key forever). Matches emit append-mode in the batch "
        "their final event arrives in, summing to the SAME totals as "
        "the batch lead() reduction — which is the oracle, so "
        "cross-batch state carry, per-key ordering, and the time "
        "bound are all hash-verified. Scale shape: one hash exchange "
        "per micro-batch on the key, Arrow-batched state functions, "
        "and the manifest sink's distributed append commit."
    ),
    tags=("cep", "streaming", "stateful"),
)
def q_cep_pattern_match_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )
    from kafka_streams_aggregate_spark.streaming.cep_stream import (
        CEP_OUT_SCHEMA,
        streaming_cep_matches,
    )

    work = tempfile.mkdtemp(prefix="ksa_cepstream_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        os.makedirs(src)
        # Two time-split files (maxFilesPerTrigger=1, mtime order) give
        # per-user event-time order ACROSS batches — the ingest property
        # the cross-batch state carry depends on.
        base = load_table(spark, "events", sf_dir).select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC in micros
        for name, pred in (
            ("e1", F.col("ts_us") < cutoff_us),
            ("e2", F.col("ts_us") >= cutoff_us),
        ):
            tmp = f"{work}/{name}_dir"
            base.filter(pred).coalesce(1).write.parquet(tmp)
            [part] = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{src}/{name}.parquet")
        now = os.path.getmtime(f"{src}/e1.parquet")
        os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
        os.utime(f"{src}/e2.parquet", (now + 100, now + 100))

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts_us long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        matches = streaming_cep_matches(raw, _CEP_WINDOW_US)
        committed = run_stream_committed(
            matches, work, "append", CEP_OUT_SCHEMA
        )
        return (
            committed.groupBy("user_id")
            .agg(
                F.sum("n_matches").cast("bigint").alias("n_matches"),
                F.min("batch_first_start_us").alias("first_match_start_us"),
                F.max("batch_last_end_us").alias("last_match_end_us"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# Conversion attribution (first-touch / last-touch within a window).
# --------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86_400_000_000  # 7-day attribution window


@register(
    "q_conversion_attribution",
    oracle=f"""
    WITH stream AS (
        SELECT user_id, event_id, event_type,
               epoch_us(ts) AS ts_us,
               max(CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_us,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(ts) END) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                         AND CURRENT ROW) AS first_view_us
        FROM events
    )
    SELECT event_id AS purchase_event_id,
           user_id,
           ts_us AS purchase_ts_us,
           CASE WHEN last_click_us >= ts_us - {_ATTR_WINDOW_US}
                THEN last_click_us END AS last_touch_click_us,
           first_view_us AS first_touch_view_us
    FROM stream WHERE event_type = 'purchase'
    """,
    doc=(
        "Marketing conversion attribution: for every purchase, the "
        "last-touch click (most recent strictly-preceding click, "
        "NULL'd when outside the 7-day window) and the first-touch "
        "view (earliest view within the trailing 7 days, via a RANGE "
        "frame over integer epoch-µs — range frames need a single "
        "numeric sort key, which is why ts_us and not (ts, id) orders "
        "that spec). Both touches are carried as conditional "
        "min/max-over-window, so attribution is a PER-ROW column and "
        "purchases just filter — no self-join against the event "
        "history, which is the naive quadratic formulation. Scale "
        "shape: one exchange on user_id serving two window specs "
        "(one rows-frame, one range-frame — two sorts, same "
        "partitioning); all compared columns integer epoch-µs."
    ),
    tags=("analytics", "window", "attribution"),
)
def q_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("ts_us"),
    )
    w_click = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_view = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ATTR_WINDOW_US, Window.currentRow)
    )
    stream = base.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts_us"))
        )
        .over(w_click)
        .alias("last_click_us"),
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_us"))
        )
        .over(w_view)
        .alias("first_view_us"),
    )
    return stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.when(
            F.col("last_click_us") >= F.col("ts_us") - _ATTR_WINDOW_US,
            F.col("last_click_us"),
        ).alias("last_touch_click_us"),
        F.col("first_view_us").alias("first_touch_view_us"),
    )


# --------------------------------------------------------------------------
# Quantified CEP: A B+ C (view, one-or-more clicks, purchase) — the
# regex-quantifier generalization the fixed-length lead() reduction
# cannot express (round-6 documented next step).
# --------------------------------------------------------------------------


@register(
    "q_cep_quantified",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_type, rn,
               max(CASE WHEN event_type <> 'click' THEN rn END) OVER pre
                   AS b_rn,
               last_value(CASE WHEN event_type <> 'click'
                               THEN event_type END IGNORE NULLS) OVER pre
                   AS b_type,
               last_value(CASE WHEN event_type <> 'click'
                               THEN ts END IGNORE NULLS) OVER pre
                   AS b_ts
        FROM ordered
        WINDOW pre AS (
            PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    matches AS (
        SELECT user_id, b_ts AS start_ts, ts AS end_ts,
               rn - b_rn - 1 AS b_len
        FROM marked
        WHERE event_type = 'purchase'
          AND b_rn IS NOT NULL
          AND rn - b_rn >= 2
          AND b_type = 'view'
          AND epoch_us(ts) - epoch_us(b_ts) <= {_CEP_WINDOW_US}
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(SUM(b_len) AS BIGINT) AS total_b_len,
           CAST(MAX(b_len) AS BIGINT) AS max_b_len,
           MIN(start_ts) AS first_match_start,
           MAX(end_ts) AS last_match_end
    FROM matches GROUP BY user_id
    """,
    doc=(
        "Quantified CEP pattern match: view click+ purchase (A B+ C) "
        "under STRICT contiguity with AFTER MATCH SKIP PAST LAST ROW. "
        "The distributed reduction: because B+ is bounded by non-B "
        "symbols on both sides, a greedy quantified match is "
        "equivalent to 'the last non-click row b before a purchase p "
        "is a view, with at least one row between' — every row in "
        "(b, p) is a click BY CONSTRUCTION of the running max. The "
        "attributes AT row b (its type and timestamp) ride along as "
        "last_value(... IGNORE NULLS) over the same frame, so the "
        "whole NFA collapses to ONE window pass — no self-join, no "
        "sequential per-key fold; b_len = rn - b_rn - 1 recovers the "
        "quantifier length exactly. Matches cannot overlap (a second "
        "purchase after the same click run sees the first purchase as "
        "its last non-click), which is precisely skip-past-last-row. "
        "The 24h bound uses integer epoch micros on both engines. "
        "Scale shape: one exchange on user_id shared by the windows "
        "AND the final per-user aggregate (plan-pinned). Generalizes "
        "to any A B+ C with distinct symbols; A B* C follows by "
        "relaxing >= 2 to >= 1."
    ),
    tags=("cep", "window", "analytics"),
)
def q_cep_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id",
        "ts",
        "event_type",
        F.row_number().over(wo).alias("rn"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_click = F.col("event_type") != "click"
    marked = ordered.select(
        "user_id",
        "ts",
        "event_type",
        "rn",
        F.max(F.when(non_click, F.col("rn"))).over(wb).alias("b_rn"),
        F.last(F.when(non_click, F.col("event_type")), ignorenulls=True)
        .over(wb)
        .alias("b_type"),
        F.last(F.when(non_click, F.col("ts")), ignorenulls=True)
        .over(wb)
        .alias("b_ts"),
    )
    matches = marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("b_rn").isNotNull()
        & (F.col("rn") - F.col("b_rn") >= 2)
        & (F.col("b_type") == "view")
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
            <= _CEP_WINDOW_US
        )
    ).select(
        "user_id",
        F.col("b_ts").alias("start_ts"),
        F.col("ts").alias("end_ts"),
        (F.col("rn") - F.col("b_rn") - 1).alias("b_len"),
    )
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.sum("b_len").cast("bigint").alias("total_b_len"),
        F.max("b_len").cast("bigint").alias("max_b_len"),
        F.min("start_ts").alias("first_match_start"),
        F.max("end_ts").alias("last_match_end"),
    )


@register(
    "q_cep_quantified_stream",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_type, rn,
               max(CASE WHEN event_type <> 'click' THEN rn END) OVER pre
                   AS b_rn,
               last_value(CASE WHEN event_type <> 'click'
                               THEN event_type END IGNORE NULLS) OVER pre
                   AS b_type,
               last_value(CASE WHEN event_type <> 'click'
                               THEN ts END IGNORE NULLS) OVER pre
                   AS b_ts
        FROM ordered
        WINDOW pre AS (
            PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    matches AS (
        SELECT user_id, b_ts AS start_ts, ts AS end_ts,
               rn - b_rn - 1 AS b_len
        FROM marked
        WHERE event_type = 'purchase'
          AND b_rn IS NOT NULL
          AND rn - b_rn >= 2
          AND b_type = 'view'
          AND epoch_us(ts) - epoch_us(b_ts) <= {_CEP_WINDOW_US}
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(SUM(b_len) AS BIGINT) AS total_b_len,
           CAST(MAX(b_len) AS BIGINT) AS max_b_len,
           MIN(epoch_us(start_ts)) AS first_match_start_us,
           MAX(epoch_us(end_ts)) AS last_match_end_us
    FROM matches GROUP BY user_id
    """,
    doc=(
        "STREAMING twin of q_cep_quantified: the A B+ C matcher over "
        "two time-split micro-batches with applyInPandasWithState. "
        "The quantified pattern's whole NFA state per key is THREE "
        "scalars — last non-click (type, ts) plus clicks-since — so a "
        "click run of ANY length survives ANY number of micro-batch "
        "boundaries in O(1) state (contrast the fixed-length matcher, "
        "which carries the last two events). The oracle is the batch "
        "window reduction over the same events, so cross-batch "
        "quantifier carry, per-key ordering, the >= 1 click guard, "
        "and the 24h bound are all hash-verified. Scale shape: one "
        "hash exchange per micro-batch, Arrow-batched state function, "
        "manifest-sink distributed append commit."
    ),
    tags=("cep", "streaming", "stateful"),
)
def q_cep_quantified_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )
    from kafka_streams_aggregate_spark.streaming.cep_stream import (
        CEPQ_OUT_SCHEMA,
        streaming_cep_quantified,
    )

    work = tempfile.mkdtemp(prefix="ksa_cepqstream_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        os.makedirs(src)
        base = load_table(spark, "events", sf_dir).select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC in micros
        for name, pred in (
            ("e1", F.col("ts_us") < cutoff_us),
            ("e2", F.col("ts_us") >= cutoff_us),
        ):
            tmp = f"{work}/{name}_dir"
            base.filter(pred).coalesce(1).write.parquet(tmp)
            [part] = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{src}/{name}.parquet")
        now = os.path.getmtime(f"{src}/e1.parquet")
        os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
        os.utime(f"{src}/e2.parquet", (now + 100, now + 100))

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts_us long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        matches = streaming_cep_quantified(raw, _CEP_WINDOW_US)
        committed = run_stream_committed(
            matches, work, "append", CEPQ_OUT_SCHEMA
        )
        return (
            committed.groupBy("user_id")
            .agg(
                F.sum("n_matches").cast("bigint").alias("n_matches"),
                F.sum("total_b_len").cast("bigint").alias("total_b_len"),
                F.max("max_b_len").cast("bigint").alias("max_b_len"),
                F.min("batch_first_start_us").alias("first_match_start_us"),
                F.max("batch_last_end_us").alias("last_match_end_us"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_sessionize_stream",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT user_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS sev
        FROM islands GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(sev) AS BIGINT) AS n_events,
           CAST(MAX(sev) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
    doc=(
        "STREAMING sessionization (30-min gap) with cross-batch "
        "session carry: per-user running totals — sessions so far, "
        "events so far, largest session — emitted as an UPDATE "
        "changelog from an applyInPandasWithState fold whose state is "
        "the open session's bookkeeping. A session spanning any "
        "number of micro-batch boundaries stays ONE session (only the "
        "gap test closes it, never a batch boundary), which the "
        "oracle — the batch gaps-and-islands SQL over the same "
        "events — hash-verifies, open sessions included. This is the "
        "running-changelog complement to the windowed "
        "session_window aggregates: the KTable-style 'current totals "
        "per user' a dashboard reads. Scale shape: one hash exchange "
        "per micro-batch, O(1) state per key, manifest-sink commit, "
        "latest-batch-wins read-back."
    ),
    tags=("sessionize", "streaming", "stateful"),
)
def q_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )
    from kafka_streams_aggregate_spark.streaming.session_stream import (
        SESSION_OUT_SCHEMA,
        streaming_sessionize,
    )

    work = tempfile.mkdtemp(prefix="ksa_sessstream_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        os.makedirs(src)
        base = load_table(spark, "events", sf_dir).select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC in micros
        for name, pred in (
            ("e1", F.col("ts_us") < cutoff_us),
            ("e2", F.col("ts_us") >= cutoff_us),
        ):
            tmp = f"{work}/{name}_dir"
            base.filter(pred).coalesce(1).write.parquet(tmp)
            [part] = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{src}/{name}.parquet")
        now = os.path.getmtime(f"{src}/e1.parquet")
        os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
        os.utime(f"{src}/e2.parquet", (now + 100, now + 100))

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, ts_us long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        committed = run_stream_committed(
            streaming_sessionize(raw, 1800), work, "update",
            SESSION_OUT_SCHEMA,
        )
        w = Window.partitionBy("user_id").orderBy(F.col("_batch").desc())
        return (
            committed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "user_id", "n_sessions", "n_events", "max_session_events"
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


# --------------------------------------------------------------------------
# Exact WEIGHTED percentiles (round 7): quantity-weighted price points.
# --------------------------------------------------------------------------


@register(
    "q_weighted_percentiles",
    oracle="""
    WITH w AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(floor(l_quantity) AS BIGINT) AS wt
        FROM lineitem
    ),
    cum AS (
        SELECT flag, v, wt,
               SUM(wt) OVER (PARTITION BY flag ORDER BY v) AS cumw,
               SUM(wt) OVER (PARTITION BY flag) AS tot
        FROM w
    )
    SELECT flag,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 100 * cumw >= 50 * tot THEN v END) AS p50_weighted,
           MIN(CASE WHEN 100 * cumw >= 90 * tot THEN v END) AS p90_weighted,
           MIN(CASE WHEN 100 * cumw >= 99 * tot THEN v END) AS p99_weighted
    FROM cum GROUP BY flag
    """,
    doc=(
        "Exact WEIGHTED percentiles: the quantity-weighted p50/p90/p99 "
        "of extended price per return flag — 'half the shipped UNITS "
        "cost at most X', which unweighted percentiles cannot answer. "
        "Distributed shape: one sort-window per group computing the "
        "cumulative weight (RANGE default frame lumps tied prices, so "
        "tie order cannot affect the answer), selection by the integer "
        "ceil-rank form 100*cumw >= p*tot — no float ranks, no "
        "interpolation; the reported value is an input datum selected, "
        "never computed, so cross-engine float identity is trivial. "
        "Weights floor to BIGINT on both engines (floor-cast parity "
        "rule). One exchange on the group key shared by both windows "
        "and the final aggregate."
    ),
    tags=("window", "percentile", "analytics"),
)
def q_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.floor("l_quantity").cast("bigint").alias("wt"),
    )
    wcum = Window.partitionBy("flag").orderBy("v")
    wall = Window.partitionBy("flag")
    cum = w.select(
        "flag",
        "v",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(wall).alias("tot"),
    )
    agg = [F.max("tot").cast("bigint").alias("total_weight")]
    for p in (50, 90, 99):
        agg.append(
            F.min(
                F.when(F.col("cumw") * 100 >= F.col("tot") * p, F.col("v"))
            ).alias(f"p{p}_weighted")
        )
    return cum.groupBy("flag").agg(*agg)


# --------------------------------------------------------------------------
# Out-of-order ingest audit (round 7): watermark-sizing observability.
# --------------------------------------------------------------------------


@register(
    "q_out_of_order_audit",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch_us(ts) AS ts_us,
               max(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS high_water_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN high_water_us > ts_us THEN 1 ELSE 0 END)
                AS BIGINT) AS n_out_of_order,
           (CAST(SUM(CASE WHEN high_water_us > ts_us THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000)
               // CAST(COUNT(*) AS BIGINT) AS out_of_order_ppm,
           CAST(COALESCE(MAX(CASE WHEN high_water_us > ts_us
                             THEN high_water_us - ts_us END), 0) AS BIGINT)
               AS max_regression_us
    FROM seq GROUP BY event_type
    """,
    doc=(
        "Out-of-order ingest audit — the measurement that SIZES a "
        "stream's watermark: per event_type (standing in for a "
        "source partition), walk events in arrival order (event_id), "
        "carry the event-time high-water mark as a running max over "
        "the preceding frame, and report how many events arrived "
        "behind it, their exact integer-ppm rate, and the worst "
        "regression in microseconds — withWatermark(max_regression) "
        "is precisely the bound that would have admitted every late "
        "event. One window exchange shared with the final aggregate; "
        "integer epoch-us arithmetic end to end (ppm via integer "
        "div). The streaming dedup/window queries consume exactly "
        "this bound; here it is measured instead of guessed."
    ),
    tags=("streaming", "window", "profiling"),
)
def q_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = events.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.max(F.unix_micros("ts")).over(w).alias("high_water_us"),
    )
    late = F.when(F.col("high_water_us") > F.col("ts_us"), 1).otherwise(0)
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(late).cast("bigint").alias("n_out_of_order"),
        F.expr(
            "(SUM(CASE WHEN high_water_us > ts_us THEN 1 ELSE 0 END)"
            " * 1000000) div COUNT(*)"
        ).alias("out_of_order_ppm"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("high_water_us") > F.col("ts_us"),
                    F.col("high_water_us") - F.col("ts_us"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("max_regression_us"),
    )


# --------------------------------------------------------------------------
# Weighted single-source shortest paths, bounded hops (round 7).
# --------------------------------------------------------------------------

_SSSP_SQL = """
    WITH RECURSIVE
    edges AS (
        SELECT src, dst, 1 + (src + dst) % 5 AS w FROM (
            SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a
            JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey
        )
    ),
    walk(node, dist, hops) AS (
        SELECT p_partkey, 0, 0 FROM part WHERE p_partkey < 5
        UNION
        SELECT e.dst, wk.dist + e.w, wk.hops + 1
        FROM walk wk JOIN edges e ON e.src = wk.node
        WHERE wk.hops < 4
    )
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walk GROUP BY node
"""


@register(
    "q_sssp_weighted",
    oracle=_SSSP_SQL,
    doc=(
        "Weighted single-source shortest paths (Bellman-Ford relaxation, "
        "4 rounds) from seed parts over the co-purchase graph — the "
        "min-PLUS generalization of q_bfs_reachability (min-hop). Edge "
        "weights are a deterministic integer function of the endpoint "
        "keys (1 + (src+dst) % 5), symmetric and engine-portable, so "
        "the oracle (a hop-capped recursive CTE taking MIN over path "
        "costs) is cell-exact. Spark shape: the one-shuffle co-purchase "
        "edge build shared with BFS/PageRank, then 4 relaxation rounds, "
        "each ONE equi-join on src plus ONE min-aggregate with the "
        "frontier UNION'd into the running label table and "
        "localCheckpoint lineage truncation per round — at scale each "
        "round is linear in edges and the label table is bounded by "
        "|V|; distances are monotone non-increasing, so relaxation "
        "converges regardless of partitioning (pinned by the "
        "partition-independence suite). Bounded-hop semantics (<= 4 "
        "edges) are exact, matching time-budgeted Pregel supersteps."
    ),
    tags=("graph", "iterative", "join"),
)
def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    li = lineitem.select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        sets.select(F.explode("ps").alias("src"), F.col("ps"))
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "w", (F.lit(1) + (F.col("src") + F.col("dst")) % 5).cast("bigint")
        )
        .localCheckpoint(eager=True)
    )
    labels = part.filter(F.col("p_partkey") < 5).select(
        F.col("p_partkey").alias("node"), F.lit(0).cast("bigint").alias("dist")
    )
    # Broadcasting the running label table is justified HERE because the
    # frontier is seeded from 5 nodes and bounded hops keep the labeled
    # set a small neighborhood — but it GROWS toward |V| with rounds. At
    # true 100x (or unbounded hops) the safe default is the delta-frontier
    # shuffle join on the edges' src partitioning (edges are already
    # repartition("src")-clustered), exactly as q_bfs_reachability
    # documents for its unbounded-frontier fallback.
    for _ in range(4):
        relaxed = (
            F.broadcast(labels)
            .join(edges, labels["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        labels = (
            labels.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return labels


# --------------------------------------------------------------------------
# Bill-of-materials cost rollup (round 7): multiplicative recursion.
# --------------------------------------------------------------------------

_BOM_SQL = """
    WITH RECURSIVE
    nodes AS (
        SELECT p_partkey AS pk,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cost_cents
        FROM part
    ),
    -- every (ancestor, node, multiplied-quantity) pair, walking DOWN
    -- the arithmetic assembly tree parent(p) = (p-1)//4, qty = 1+p%3
    paths(anc, node, mult) AS (
        SELECT pk, pk, CAST(1 AS BIGINT) FROM nodes
        UNION ALL
        SELECT p.anc, n.pk, p.mult * (1 + n.pk % 3)
        FROM paths p
        JOIN nodes n ON n.pk >= 1 AND (n.pk - 1) // 4 = p.node
    )
    SELECT p.anc AS p_partkey,
           CAST(SUM(p.mult * n.cost_cents) AS BIGINT)
               AS rolled_cost_cents,
           CAST(COUNT(*) AS BIGINT) AS subtree_parts
    FROM paths p JOIN nodes n ON n.pk = p.node
    GROUP BY p.anc
"""


@register(
    "q_bom_cost_rollup",
    oracle=_BOM_SQL,
    doc=(
        "Bill-of-materials cost rollup — the MULTIPLICATIVE recursive "
        "aggregation the min-hop (BFS) and min-plus (SSSP) walks "
        "cannot express: every part's fully-burdened cost is its own "
        "cost plus quantity-weighted rolled costs of its components, "
        "quantities MULTIPLYING along assembly paths. The assembly "
        "tree is arithmetic on part keys (parent = (p-1) div 4, "
        "qty = 1 + p mod 3; ~6 levels over 2000 parts), so the "
        "hierarchy is deterministic and engine-portable; costs are "
        "exact integer cents. Spark runs the bottom-up fixpoint "
        "T_k(p) = cost(p) + sum_children qty(c) * T_{k-1}(c): six "
        "rounds of one parent-key join + one sum-aggregate with "
        "localCheckpoint truncation — each round touches each edge "
        "once, the classic distributed BOM shape (SSB/ERP rollups at "
        "warehouse scale). Oracle is a recursive CTE enumerating "
        "(ancestor, node, multiplied-qty) paths and summing "
        "mult * cost; both sides BIGINT end to end, hash-exact."
    ),
    tags=("graph", "iterative", "aggregation"),
)
def q_bom_cost_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    nodes = part.select(
        F.col("p_partkey").alias("pk"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cost_cents"),
    ).localCheckpoint(eager=True)
    edges = nodes.filter(F.col("pk") >= 1).select(
        F.expr("(pk - 1) div 4").alias("parent"),
        F.col("pk").alias("child"),
        (F.lit(1) + F.col("pk") % 3).cast("bigint").alias("qty"),
    )
    total = nodes.select(
        "pk",
        F.col("cost_cents").alias("rolled_cost_cents"),
        F.lit(1).cast("bigint").alias("subtree_parts"),
    )
    # Round count DERIVED from the data (advice round 7): the tree depth
    # grows with part count (6 at 20k parts, 7 at ~80k, 8 at 200k), and a
    # fixed count would silently under-roll deep subtrees at larger SF.
    # depth(p) under parent = (p-1) div 4 is monotone in p, so the max
    # key's depth bounds every node's; one scalar to the driver.
    max_pk = int(part.agg(F.max("p_partkey")).collect()[0][0] or 0)
    rounds, p = 0, max_pk
    while p > 0:
        p = (p - 1) // 4
        rounds += 1
    for _ in range(rounds):
        child_contrib = (
            total.join(edges, total["pk"] == edges["child"])
            .groupBy("parent")
            .agg(
                F.sum(
                    F.col("qty") * F.col("rolled_cost_cents")
                ).alias("_child_cost"),
                F.sum("subtree_parts").alias("_child_parts"),
            )
        )
        total = (
            nodes.join(
                child_contrib, nodes["pk"] == child_contrib["parent"], "left"
            )
            .select(
                "pk",
                (
                    F.col("cost_cents")
                    + F.coalesce(F.col("_child_cost"), F.lit(0))
                ).alias("rolled_cost_cents"),
                (
                    F.lit(1) + F.coalesce(F.col("_child_parts"), F.lit(0))
                )
                .cast("bigint")
                .alias("subtree_parts"),
            )
            .localCheckpoint(eager=True)
        )
    return total.select(
        F.col("pk").alias("p_partkey"), "rolled_cost_cents", "subtree_parts"
    )


# --------------------------------------------------------------------------
# Chi-square independence test over a contingency table (round 7).
# --------------------------------------------------------------------------


@register(
    "q_chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT event_type AS r, user_id % 3 AS c,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, user_id % 3
    ),
    tot AS (
        SELECT r, c, o,
               CAST(SUM(o) OVER (PARTITION BY r) AS BIGINT) AS rt,
               CAST(SUM(o) OVER (PARTITION BY c) AS BIGINT) AS ct,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1)
                AS BIGINT) AS dof,
           CAST(SUM(CAST(floor(
               (CAST(n * o - rt * ct AS DOUBLE)
                * CAST(n * o - rt * ct AS DOUBLE))
               / CAST(n * rt * ct AS DOUBLE) * 1000000.0
           ) AS BIGINT)) AS BIGINT) AS chi2_scaled_e6
    FROM tot
    """,
    doc=(
        "Chi-square test of independence (event type vs user cohort): "
        "the contingency table builds as one exact count aggregate, "
        "margins ride three window sums over the tiny cell table, and "
        "the statistic sums per-cell (N*O - R*C)^2 / (N*R*C) terms — "
        "each FLOORED at 1e-6 resolution into BIGINT before summing, "
        "so the compared value is pure integer (the floor-parity "
        "rule; a raw double sum would be partial-agg-order dependent "
        "and round() on doubles has half-edge hazards). Yates-free "
        "Pearson form with dof alongside; consumers divide by 1e6 "
        "and consult the chi-square CDF offline (ln/exp stay out of "
        "compared columns by design). Scale shape: the only heavy "
        "exchange is the count groupBy with map-side combine; "
        "everything after touches r*c rows."
    ),
    tags=("statistics", "aggregation", "analytics"),
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    cells = (
        events.select(
            F.col("event_type").alias("r"),
            (F.col("user_id") % 3).alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    tot = cells.select(
        "r",
        "c",
        "o",
        F.sum("o").over(Window.partitionBy("r")).cast("bigint").alias("rt"),
        F.sum("o").over(Window.partitionBy("c")).cast("bigint").alias("ct"),
        F.sum("o").over(
            Window.partitionBy()
        ).cast("bigint").alias("n"),
    )
    d = (F.col("n") * F.col("o") - F.col("rt") * F.col("ct")).cast("double")
    denom = (F.col("n") * F.col("rt") * F.col("ct")).cast("double")
    term = F.floor(d * d / denom * F.lit(1000000.0)).cast("bigint")
    return tot.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("n").cast("bigint").alias("n_rows"),
        (
            (F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)
        ).cast("bigint").alias("dof"),
        F.sum(term).cast("bigint").alias("chi2_scaled_e6"),
    )


# --------------------------------------------------------------------------
# Sessionization with TTL state eviction (round 8).
# --------------------------------------------------------------------------


@register(
    "q_sessionize_ttl_stream",
    oracle="""
    WITH wm AS (
        SELECT MAX(epoch_us(ts)) // 1000 AS wm_ms FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        SELECT user_id, ts_us,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    sess AS (
        SELECT user_id, session_id,
               MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(session_id) OVER (PARTITION BY user_id) AS last_sid
        FROM islands GROUP BY user_id, session_id
    ),
    closed AS (
        SELECT s.user_id, s.start_us, s.end_us, s.n_events
        FROM sess s, wm
        WHERE s.session_id < s.last_sid
           OR (s.end_us // 1000) + 1800000 < wm.wm_ms
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_closed_sessions,
           CAST(SUM(n_events) AS BIGINT) AS closed_events,
           CAST(MAX(n_events) AS BIGINT) AS max_closed_session_events,
           MIN(start_us) AS first_start_us,
           MAX(end_us) AS last_end_us
    FROM closed GROUP BY user_id
    """,
    doc=(
        "STREAMING sessionization with TTL STATE EVICTION — the "
        "missing complement to q_sessionize_stream's accumulate- "
        "forever changelog: state is only the OPEN session, every key "
        "registers an EventTimeTimeout at last_event + 30min, and when "
        "the watermark passes it the timeout callback emits the closed "
        "session and REMOVES the key from the store (idle keys cost "
        "nothing after one gap — the property an unbounded-cardinality "
        "100 TB stream requires). Closed sessions stream out in APPEND "
        "mode ('gap' when a later in-stream event closes them, "
        "'timeout' when the watermark does); still-open sessions are "
        "never emitted. availableNow's final no-data micro-batch fires "
        "pending timeouts against the final watermark (= global max "
        "event time, ms-truncated, 0s delay — verified empirically), "
        "so the result is EXACTLY batch sessionization minus each "
        "user's final session when last_ms + 1800000 >= wm_ms, which "
        "is what the oracle computes. State-shrink is asserted by a "
        "unit test on the store metrics (numRowsRemoved > 0). Scale "
        "shape: one exchange per micro-batch, O(1) state per OPEN key, "
        "zero per expired key, manifest-sink commit."
    ),
    bench=True,
    tags=("sessionize", "streaming", "stateful", "ttl"),
)
def q_sessionize_ttl_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )
    from kafka_streams_aggregate_spark.streaming.session_stream import (
        SESSION_TTL_OUT_SCHEMA,
        streaming_sessionize_ttl,
    )

    work = tempfile.mkdtemp(prefix="ksa_sessttl_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        os.makedirs(src)
        base = load_table(spark, "events", sf_dir).select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC in micros
        for name, pred in (
            ("e1", F.col("ts_us") < cutoff_us),
            ("e2", F.col("ts_us") >= cutoff_us),
        ):
            tmp = f"{work}/{name}_dir"
            base.filter(pred).coalesce(1).write.parquet(tmp)
            [part] = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{src}/{name}.parquet")
        now = os.path.getmtime(f"{src}/e1.parquet")
        os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
        os.utime(f"{src}/e2.parquet", (now + 100, now + 100))

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, ts_us long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .withWatermark("ts", "0 seconds")
        )
        committed = run_stream_committed(
            streaming_sessionize_ttl(raw, 1800), work, "append",
            SESSION_TTL_OUT_SCHEMA,
        )
        return (
            committed.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_closed_sessions"),
                F.sum("n_events").cast("bigint").alias("closed_events"),
                F.max("n_events")
                .cast("bigint")
                .alias("max_closed_session_events"),
                F.min("start_us").alias("first_start_us"),
                F.max("end_us").alias("last_end_us"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_interval_overlap_join",
    oracle="""
    WITH act AS (
        SELECT o_orderkey,
               datediff('day', DATE '1970-01-01', o_orderdate) AS s,
               datediff('day', DATE '1970-01-01', o_orderdate)
                   + CAST(o_orderkey % 14 + 1 AS INTEGER) AS e
        FROM orders
    ),
    promo AS (
        SELECT o_orderkey AS promo_id,
               datediff('day', DATE '1970-01-01', o_orderdate) - 7 AS s,
               datediff('day', DATE '1970-01-01', o_orderdate) + 7 AS e
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    pairs AS (
        SELECT p.promo_id, a.o_orderkey,
               least(p.e, a.e) - greatest(p.s, a.s) + 1 AS overlap_days
        FROM promo p JOIN act a
          ON a.s <= p.e AND p.s <= a.e
    )
    SELECT promo_id,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(overlap_days) AS BIGINT) AS sum_overlap_days,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
    FROM pairs GROUP BY promo_id
    """,
    doc=(
        "Interval-overlap join (round 8) — ranges x ranges, the shape "
        "a naive theta join turns into a cartesian product: order "
        "activity windows [orderdate, +1..14d] overlapped against "
        "promo windows [orderdate-7d, +7d]. Scale path: every "
        "interval explodes to the 16-day grid cells it covers "
        "(sequence + explode — bounded cells per interval because "
        "spans are bounded), candidates come from a plain shuffle "
        "EQUI-join on the cell, and each qualifying pair is emitted "
        "exactly once WITHOUT a distinct: the join keeps only the "
        "canonical cell, cell == greatest(floor(s_l/16), "
        "floor(s_r/16)) — the first cell both intervals share — so "
        "no dedup shuffle exists. All arithmetic in epoch-day "
        "integers (no date-type round trips). Oracle: the direct "
        "inequality join. At 100 TB the grid join shuffles "
        "|rows|x(span/16) cell tuples instead of building a "
        "quadratic range product; plan-linted non-cartesian like "
        "every registered query."
    ),
    tags=("join", "interval", "temporal", "scale"),
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    act = orders.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), epoch).alias("s"),
        (
            F.datediff(F.col("o_orderdate"), epoch)
            + (F.col("o_orderkey") % 14 + 1).cast("int")
        ).alias("e"),
    )
    promo = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        (F.datediff(F.col("o_orderdate"), epoch) - 7).alias("s"),
        (F.datediff(F.col("o_orderdate"), epoch) + 7).alias("e"),
    )

    def grid(df: DataFrame, keys: list[str]) -> DataFrame:
        return df.select(
            *keys, "s", "e",
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / 16).cast("bigint"),
                    F.floor(F.col("e") / 16).cast("bigint"),
                )
            ).alias("cell"),
        )

    a = grid(act, ["o_orderkey"]).withColumnsRenamed(
        {"s": "a_s", "e": "a_e"}
    )
    p = grid(promo, ["promo_id"]).withColumnsRenamed(
        {"s": "p_s", "e": "p_e"}
    )
    pairs = (
        p.join(a, "cell")
        .where(
            (F.col("a_s") <= F.col("p_e"))
            & (F.col("p_s") <= F.col("a_e"))
            # canonical-cell dedup: emit only in the first shared cell
            & (
                F.col("cell")
                == F.greatest(
                    F.floor(F.col("a_s") / 16).cast("bigint"),
                    F.floor(F.col("p_s") / 16).cast("bigint"),
                )
            )
        )
        .select(
            "promo_id",
            "o_orderkey",
            (
                F.least(F.col("p_e"), F.col("a_e"))
                - F.greatest(F.col("p_s"), F.col("a_s"))
                + 1
            ).alias("overlap_days"),
        )
    )
    return pairs.groupBy("promo_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("overlap_days").cast("bigint").alias("sum_overlap_days"),
        F.max("o_orderkey").cast("bigint").alias("max_orderkey"),
    )


@register(
    "q_assoc_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    n_baskets AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM items
    ),
    ante AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ante_cnt
        FROM items GROUP BY event_type
    ),
    co AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               CAST(COUNT(*) AS BIGINT) AS support_cnt
        FROM items a JOIN items b
          ON a.user_id = b.user_id AND a.event_type <> b.event_type
        GROUP BY 1, 2
    )
    SELECT co.antecedent, co.consequent, co.support_cnt,
           x.ante_cnt,
           (1000000 * co.support_cnt) // x.ante_cnt AS conf_ppm,
           (1000000 * co.support_cnt * nb.n)
               // (x.ante_cnt * y.ante_cnt) AS lift_ppm
    FROM co
    JOIN ante x ON x.event_type = co.antecedent
    JOIN ante y ON y.event_type = co.consequent
    CROSS JOIN n_baskets nb
    """,
    doc=(
        "Association-rule mining (round 8) — market-basket analysis "
        "over user event baskets: for every ordered pair of event "
        "types, support count (co-occurring baskets), antecedent "
        "count, confidence and lift — both emitted in exact integer "
        "ppm via pure integer division ((1e6*s) div a; a double "
        "quotient+floor can be off by one when the true ratio sits "
        "an ulp under an integer). Scale shape: the basket-item "
        "table is |users|x|types|; the pair join is keyed on "
        "user_id (co-located candidates, never a cross product) and "
        "collapses map-side to at most |types|^2 rule rows — the "
        "a-priori property that rule tables are model-sized no "
        "matter the input. Lift's n-baskets scalar rides a 1-row "
        "broadcast cross join."
    ),
    tags=("mining", "assoc-rules", "analytics"),
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    items = events.select("user_id", "event_type").distinct()
    n_baskets = items.select(
        F.countDistinct("user_id").cast("bigint").alias("n")
    )
    ante = items.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("ante_cnt")
    )
    a = items.alias("a")
    b = items.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support_cnt"))
    )
    x = ante.select(
        F.col("event_type").alias("antecedent"),
        F.col("ante_cnt"),
    )
    y = ante.select(
        F.col("event_type").alias("consequent"),
        F.col("ante_cnt").alias("cons_cnt"),
    )
    return (
        co.join(F.broadcast(x), "antecedent")
        .join(F.broadcast(y), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support_cnt",
            "ante_cnt",
            F.expr("(1000000 * support_cnt) div ante_cnt").alias(
                "conf_ppm"
            ),
            F.expr(
                "(1000000 * support_cnt * n) div (ante_cnt * cons_cnt)"
            ).alias("lift_ppm"),
        )
    )


@register(
    "q_ewma_smoothing",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    r AS (
        SELECT user_id, rn, v AS s FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn, 0.5 * o.v + 0.5 * r.s
        FROM r JOIN ordered o
          ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(MAX(rn) AS BIGINT) AS n_events,
           max_by(s, rn) AS ewma_last
    FROM r GROUP BY user_id
    """,
    doc=(
        "Exponentially-weighted moving average (round 8) — the "
        "sequential per-series fold no window frame can express "
        "(each output depends on the previous OUTPUT, not previous "
        "inputs): s_t = 0.5*v_t + 0.5*s_(t-1) per user in (ts, "
        "event_id) order, via the round-10 partition kernel "
        "(repartition + sortWithinPartitions + mapInPandas carrying "
        "the open series across Arrow batches; r16-opt — the "
        "per-group Arrow round trip dominated at 1500 small series, "
        "interleaved A/B 3.63 -> 0.46s, outputs hex-identical). "
        "alpha = 1/2 is the "
        "cross-engine trick: both multiplies are exact power-of-two "
        "scalings, so each step is ONE correctly-rounded IEEE "
        "addition — Python float64 and DuckDB's recursive-CTE "
        "evaluation execute the identical op sequence and the "
        "smoothed values are BIT-equal (a generic alpha would drift "
        "in the last ulp). Oracle: recursive CTE walking rn -> rn+1. "
        "Scale shape: state is one scalar per series; series "
        "process independently (embarrassingly parallel after the "
        "one shuffle); the same fold runs incrementally under "
        "applyInPandasWithState for streams."
    ),
    tags=("timeseries", "pandas-udf", "stateful-fold"),
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)

    # Self-contained closure (verify skill notes); per-series float op
    # sequence identical to the prior per-group fold, so the bit-equal
    # contract with the recursive-CTE oracle survives verbatim.
    def fold_partition(batches):
        import pandas as pd

        cur = None  # (key, n, s)
        out = {"user_id": [], "n_events": [], "ewma_last": []}

        def flush():
            if cur is not None:
                out["user_id"].append(cur[0])
                out["n_events"].append(cur[1])
                out["ewma_last"].append(cur[2])

        for pdf in batches:
            for k, v in zip(pdf["user_id"], pdf["value"].astype("float64")):
                k = int(k)
                if cur is None or cur[0] != k:
                    flush()
                    cur = (k, 1, v)
                else:
                    cur = (k, cur[1] + 1, 0.5 * v + 0.5 * cur[2])
        flush()
        if out["user_id"]:
            yield pd.DataFrame(out)

    return (
        events.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            fold_partition,
            "user_id bigint, n_events bigint, ewma_last double",
        )
    )


@register(
    "q_spatial_grid_join",
    oracle="""
    WITH pts AS (
        SELECT c_custkey AS id,
               CAST(CONCAT('0x', substr(md5(CONCAT('x', c_custkey)), 1, 15))
                    AS BIGINT) % 10000 AS x,
               CAST(CONCAT('0x', substr(md5(CONCAT('y', c_custkey)), 1, 15))
                    AS BIGINT) % 10000 AS y
        FROM customer
    )
    SELECT a.id AS a_id, b.id AS b_id,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4096
    """,
    doc=(
        "Spatial distance self-join (round 8) — points within L2 "
        "radius 64 on a 10000x10000 integer plane (coordinates from "
        "the cross-engine md5 hash family - functions/hashing.py - "
        "so both engines place every point identically; a prime-"
        "multiplier lattice was rejected: it provably never "
        "produces close pairs). Scale path: each point homes in ONE "
        "64x64 grid cell; the probe side explodes to its 3x3 "
        "neighbor cells and candidates come from a plain shuffle "
        "EQUI-join on (cell_x, cell_y) — cell size >= radius "
        "guarantees every qualifying pair is found, and because the "
        "build side keeps its single home cell each pair is found "
        "exactly ONCE (no distinct). Exact integer dist^2 verify, "
        "a_id < b_id canonicalization. The oracle is the direct "
        "quadratic predicate join. At 100 TB: candidates ~ density "
        "x 9 cells per point instead of n^2/2 — the same "
        "bucket-then-verify contract as the MinHash/LSH and "
        "interval-grid operators; geohash indexing is this exact "
        "shape with interleaved-bit cell ids."
    ),
    tags=("join", "spatial", "scale"),
)
def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.functions.hashing import hash60

    customer = load_table(spark, "customer", sf_dir)
    pts = customer.select(
        F.col("c_custkey").alias("id"),
        (hash60(F.concat(F.lit("x"), F.col("c_custkey"))) % 10000).alias("x"),
        (hash60(F.concat(F.lit("y"), F.col("c_custkey"))) % 10000).alias("y"),
    )
    build = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / 64).alias("cell_x"),
        F.floor(F.col("y") / 64).alias("cell_y"),
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probe = (
        pts.select(
            F.col("id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.explode(offsets).alias("dx"),
        )
        .select(
            "a_id", "ax", "ay",
            (F.floor(F.col("ax") / 64) + F.col("dx")).alias("cell_x"),
            F.explode(offsets).alias("dy"),
        )
        .select(
            "a_id", "ax", "ay", "cell_x",
            (F.floor(F.col("ay") / 64) + F.col("dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(build, ["cell_x", "cell_y"])
        .where((F.col("a_id") < F.col("b_id")) & (d2 <= 4096))
        .select("a_id", "b_id", d2.cast("bigint").alias("dist_sq"))
    )


@register(
    "q_winsorized_stats",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    ranked AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    cuts AS (
        SELECT event_type,
               max(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END)
                   AS lo,
               max(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END)
                   AS hi,
               max(n) AS n
        FROM ranked GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(cuts.n AS BIGINT) AS n_rows,
           CAST(cuts.lo AS BIGINT) AS lo_cents,
           CAST(cuts.hi AS BIGINT) AS hi_cents,
           CAST(SUM(least(greatest(v.cents, cuts.lo), cuts.hi))
                AS BIGINT) AS winsorized_sum_cents,
           CAST(SUM(CASE WHEN v.cents >= cuts.lo AND v.cents <= cuts.hi
                         THEN v.cents END) AS BIGINT)
               AS trimmed_sum_cents,
           CAST(COUNT(CASE WHEN v.cents >= cuts.lo AND v.cents <= cuts.hi
                           THEN 1 END) AS BIGINT) AS trimmed_n
    FROM v JOIN cuts ON v.event_type = cuts.event_type
    GROUP BY v.event_type, cuts.n, cuts.lo, cuts.hi
    """,
    doc=(
        "Winsorized and trimmed statistics (round 8) — the robust-"
        "mean toolkit composed from the exact-percentile machinery: "
        "per event type, the p5/p95 cut points are the values at "
        "integer ceil-rank ((p*n+99) div 100 — never ceil(0.05*n) "
        "in doubles), then each value is CLAMPED to [p5, p95] for "
        "the winsorized sum and FILTERED to it for the trimmed sum. "
        "All arithmetic in floor-cents BIGINTs, so sums are order-"
        "independent and cell-exact; means are recoverable as the "
        "emitted exact rational pairs (sum, n). One exchange for "
        "the rank window, reused by the final aggregate via the "
        "join on the same key. The standard defense against heavy-"
        "tail contamination in metric pipelines — at 100 TB the cut "
        "points come from the same single-sort-per-group pass the "
        "percentile queries use."
    ),
    tags=("statistics", "robust", "percentiles"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    v = events.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    ranked = v.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(5 * n + 99) div 100"), F.col("cents"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("cents"))
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    joined = v.join(F.broadcast(cuts), "event_type")
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    in_band = (F.col("cents") >= F.col("lo")) & (F.col("cents") <= F.col("hi"))
    return joined.groupBy("event_type", "n", "lo", "hi").agg(
        F.sum(clamped).cast("bigint").alias("winsorized_sum_cents"),
        F.sum(F.when(in_band, F.col("cents"))).cast("bigint").alias(
            "trimmed_sum_cents"
        ),
        F.count(F.when(in_band, 1)).cast("bigint").alias("trimmed_n"),
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("lo").cast("bigint").alias("lo_cents"),
        F.col("hi").cast("bigint").alias("hi_cents"),
        "winsorized_sum_cents",
        "trimmed_sum_cents",
        "trimmed_n",
    )


@register(
    "q_ewma_stream",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    r AS (
        SELECT user_id, rn, v AS s FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn, 0.5 * o.v + 0.5 * r.s
        FROM r JOIN ordered o
          ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(MAX(rn) AS BIGINT) AS n_events,
           max_by(s, rn) AS ewma_last
    FROM r GROUP BY user_id
    """,
    doc=(
        "STREAMING EWMA (round 8) — the cross-batch incremental twin "
        "of q_ewma_smoothing, making that query's 'runs "
        "incrementally under applyInPandasWithState' claim real: "
        "state per series is ONE float (the running smoothed value) "
        "carried across micro-batches; the staged two-batch source "
        "splits the log at a time cutoff so per-key event-time "
        "order holds across the boundary, and because alpha=1/2 "
        "makes each step a single correctly-rounded IEEE add, the "
        "streamed result is BIT-equal to the batch fold and the "
        "recursive-CTE oracle — the state carry itself is what the "
        "hash verifies. Update-mode changelog through the committed "
        "manifest sink, latest batch wins per user. O(1) state per "
        "series, one exchange per micro-batch."
    ),
    tags=("streaming", "timeseries", "stateful-fold"),
)
def q_ewma_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from kafka_streams_aggregate_spark.sources.eventlog_source import (
        run_stream_committed,
    )
    from kafka_streams_aggregate_spark.streaming.ewma_stream import (
        EWMA_OUT_SCHEMA,
        streaming_ewma,
    )

    work = tempfile.mkdtemp(prefix="ksa_ewmastream_")
    src = f"{work}/src"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        os.makedirs(src)
        base = load_table(spark, "events", sf_dir).select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts)").alias("ts_us"),
            "value",
        )
        cutoff_us = 1705363200000000  # 2024-01-16 00:00:00 UTC in micros
        for name, pred in (
            ("e1", F.col("ts_us") < cutoff_us),
            ("e2", F.col("ts_us") >= cutoff_us),
        ):
            tmp = f"{work}/{name}_dir"
            base.filter(pred).coalesce(1).write.parquet(tmp)
            [part] = glob.glob(f"{tmp}/part-*.parquet")
            shutil.move(part, f"{src}/{name}.parquet")
        now = os.path.getmtime(f"{src}/e1.parquet")
        os.utime(f"{src}/e1.parquet", (now - 100, now - 100))
        os.utime(f"{src}/e2.parquet", (now + 100, now + 100))

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, ts_us long, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        committed = run_stream_committed(
            streaming_ewma(raw), work, "update", EWMA_OUT_SCHEMA
        )
        w = Window.partitionBy("user_id").orderBy(F.col("_batch").desc())
        return (
            committed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "n_events", "ewma_last")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "q_dau_wau_trailing",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', ts) AS d
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
    ),
    wau AS (
        SELECT days.d,
               CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau_7d
        FROM days JOIN ud
          ON ud.d BETWEEN days.d - 6 AND days.d
        GROUP BY days.d
    )
    SELECT dau.d AS day_num, dau.dau, wau.wau_7d
    FROM dau JOIN wau ON dau.d = wau.d
    """,
    doc=(
        "DAU / trailing-7-day WAU (round 8) — the product-metrics "
        "staple whose naive form (a distinct-count per day over a "
        "sliding range join) is quadratic in days x events: instead, "
        "each distinct (user, day) pair EXPLODES to the <=7 target "
        "days it contributes to (sequence + explode, the same "
        "contribution-grid pattern as the interval join), and one "
        "count-distinct per target day finishes it — |pairs| x 7 "
        "intermediate rows, two shuffles, no range join. Target "
        "days are inner-joined back to observed days so both "
        "engines emit the same day set. All day arithmetic in "
        "epoch-day integers (tz-proof). At 100 TB the same shape "
        "computes MAU with x30 fan-out or switches the distinct to "
        "the HLL sketch for constant-state merges."
    ),
    tags=("analytics", "retention", "window"),
)
def q_dau_wau_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    ud = events.select(
        "user_id", F.datediff(F.col("ts"), epoch).alias("d")
    ).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.col("d") + F.lit(6))
        ).alias("target_d"),
    )
    wau = (
        contrib.join(
            days.withColumnRenamed("d", "target_d"), "target_d"
        )
        .groupBy("target_d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau_7d"))
    )
    return (
        dau.join(wau, dau["d"] == wau["target_d"])
        .select(
            F.col("d").cast("bigint").alias("day_num"), "dau", "wau_7d"
        )
    )


@register(
    "q_rfm_segmentation",
    oracle="""
    WITH anchor AS (
        SELECT max(o_orderdate) AS mx FROM orders
    ),
    base AS (
        SELECT o_custkey,
               datediff('day', max(o_orderdate), (SELECT mx FROM anchor))
                   AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_cents,
               ntile(5) OVER (ORDER BY recency_days ASC, o_custkey)
                   AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                   AS f_score,
               ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
                   AS m_score
        FROM base
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(MIN(o_custkey) AS BIGINT) AS min_custkey
    FROM scored
    GROUP BY 1, 2, 3
    """,
    doc=(
        "RFM customer segmentation (round 8) — the marketing-"
        "analytics staple: per customer, Recency (days since last "
        "order vs the dataset anchor), Frequency (order count), and "
        "Monetary (exact floor-cents revenue), each scored into "
        "quintiles by ntile with the custkey tiebreaker the total-"
        "order rule requires (ntile over a non-total order is "
        "nondeterministic at partition boundaries), then customers "
        "rolled up per (R,F,M) cell. Recency in integer days from a "
        "data-derived anchor (no wall clock — determinism rule). "
        "Scale: one aggregate + three window passes over the "
        "customer-grain frame (small relative to orders), rollup "
        "output bounded at 125 cells."
    ),
    tags=("analytics", "segmentation", "rfm"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    base = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).cast("bigint").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey"))
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    w_m = Window.orderBy(F.col("monetary_cents").desc(), F.col("o_custkey"))
    scored = base.select(
        "o_custkey",
        "monetary_cents",
        F.ntile(5).over(w_r).cast("bigint").alias("r_score"),
        F.ntile(5).over(w_f).cast("bigint").alias("f_score"),
        F.ntile(5).over(w_m).cast("bigint").alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
        F.min("o_custkey").cast("bigint").alias("min_custkey"),
    )


@register(
    "q_activity_heatmap",
    oracle="""
    -- DuckDB dayofweek (dow) is 0=Sunday; normalize to ISO 1=Monday..
    -- 7=Sunday on BOTH sides (Spark's dayofweek is 1=Sunday — the
    -- repo-documented cross-engine trap, handled here head-on).
    SELECT CAST(CASE WHEN dayofweek(ts) = 0 THEN 7
                     ELSE dayofweek(ts) END AS BIGINT) AS iso_dow,
           CAST(hour(ts) AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Day-of-week x hour activity heatmap (round 8) — the BI "
        "calendar grid, built on the repo's documented dayofweek "
        "trap handled explicitly: Spark's dayofweek is 1=Sunday, "
        "DuckDB's dow is 0=Sunday, so BOTH sides normalize to ISO "
        "(1=Monday..7=Sunday) before comparing — the Spark side via "
        "((dayofweek + 5) % 7) + 1, the oracle via the 0->7 CASE. "
        "Hour extraction agrees because the events loader pins the "
        "session to UTC and DuckDB's view is UTC-naive (same "
        "parity rule every timestamp query relies on). One scan, "
        "one aggregate; the distinct-user count per cell rides the "
        "same exchange."
    ),
    tags=("analytics", "calendar", "heatmap"),
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("bigint")
    return (
        events.select(
            iso_dow.alias("iso_dow"),
            F.hour("ts").cast("bigint").alias("hour_of_day"),
            "user_id",
        )
        .groupBy("iso_dow", "hour_of_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@register(
    "q_day_over_day_change",
    oracle="""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', ts) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    seq AS (
        SELECT d, n, lag(n) OVER (ORDER BY d) AS prev_n,
               lag(d) OVER (ORDER BY d) AS prev_d
        FROM daily
    )
    SELECT CAST(d AS BIGINT) AS day_num, n AS n_events,
           CAST(prev_n AS BIGINT) AS prev_events,
           CAST(n - prev_n AS BIGINT) AS delta,
           CAST(CASE WHEN prev_d = d - 1
                THEN (10000 * (n - prev_n)) // prev_n END AS BIGINT)
               AS change_bps,
           CAST(abs(10000 * (n - prev_n)) // prev_n >= 2000
                AND prev_d = d - 1 AS BOOLEAN) AS anomaly_flag
    FROM seq WHERE prev_n IS NOT NULL
    """,
    doc=(
        "Day-over-day change report with anomaly flags (round 8) — "
        "the monitoring staple: daily event counts, absolute delta, "
        "percent change in exact integer BASIS POINTS ((10000*d) "
        "div prev — a double quotient+floor is off-by-one when the "
        "true ratio sits an ulp under an integer), and a >=20% "
        "swing flag. Non-adjacent days (a gap in the calendar) get "
        "NULL change and no flag — comparing across a gap is a "
        "different question than day-over-day, and silently doing "
        "it anyway is how dashboards lie. One aggregate, one lag "
        "window over the DAY table (hundreds of rows), trivial at "
        "any scale."
    ),
    tags=("analytics", "monitoring", "timeseries"),
)
def q_day_over_day_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = events.groupBy(
        F.datediff(F.col("ts"), epoch).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy("d")
    seq = daily.withColumn("prev_n", F.lag("n").over(w)).withColumn(
        "prev_d", F.lag("d").over(w)
    )
    adjacent = F.col("prev_d") == F.col("d") - 1
    change_bps = F.expr("(10000 * (n - prev_n)) div prev_n")
    return seq.filter(F.col("prev_n").isNotNull()).select(
        F.col("d").cast("bigint").alias("day_num"),
        F.col("n").alias("n_events"),
        F.col("prev_n").cast("bigint").alias("prev_events"),
        (F.col("n") - F.col("prev_n")).cast("bigint").alias("delta"),
        F.when(adjacent, change_bps).cast("bigint").alias("change_bps"),
        (
            adjacent
            & (F.expr("abs(10000 * (n - prev_n)) div prev_n") >= 2000)
        ).alias("anomaly_flag"),
    )


# --------------------------------------------------------------------------
# Round-9 analytics batch: bitmap retention, stockout detection from the
# inventory changelog, and two exact-integer nonparametric tests.
# --------------------------------------------------------------------------


@register(
    "q_bitmap_retention",
    oracle="""
    WITH days AS (
        SELECT DISTINCT datediff('day', DATE '1970-01-01', ts) AS d,
               user_id
        FROM events
    ),
    words AS (
        SELECT d, user_id // 62 AS word_idx,
               bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS w
        FROM days GROUP BY d, user_id // 62
    ),
    paired AS (
        SELECT a.d, a.word_idx, a.w AS wa, b.w AS wb
        FROM words a JOIN words b
          ON a.word_idx = b.word_idx AND b.d = a.d + 1
    ),
    act AS (
        SELECT d, CAST(SUM(bit_count(w)) AS BIGINT) AS n_active
        FROM words GROUP BY d
    )
    SELECT p.d AS day_num,
           CAST(p.d + 1 AS BIGINT) AS next_day,
           act.n_active,
           n2.n_active AS n_active_next,
           CAST(SUM(bit_count(wa & wb)) AS BIGINT) AS n_retained,
           (10000 * CAST(SUM(bit_count(wa & wb)) AS BIGINT))
               // act.n_active AS retained_pct_x100
    FROM paired p
    JOIN act ON act.d = p.d
    JOIN act n2 ON n2.d = p.d + 1
    GROUP BY p.d, act.n_active, n2.n_active
    """,
    doc=(
        "Bitmap-index day-over-day retention (round 9) — the roaring-"
        "bitmap pattern OLAP engines use for audience/retention math: "
        "each day's active-user set compresses to 62-bit words "
        "(word_idx = user div 62, bit = user mod 62; shifts capped at "
        "61 per the repo's DuckDB 1<<63 rule), and retention between "
        "adjacent days is popcount(AND) of aligned words — set "
        "intersection at memory-bandwidth speed, no row-level join of "
        "the raw activity. Scale: per-day bitmap size is |user space| "
        "/ 62 words regardless of event volume (dense ids; sparse ids "
        "take the same shape over a dictionary), bitmaps persist and "
        "any day-pair/window recomposes via word-aligned equi-joins — "
        "the same persist-then-merge story as the HLL register family "
        "but EXACT. All integer arithmetic: bit_or/bit_count agree "
        "cross-engine, retained pct is integer-scaled."
    ),
    tags=("bitmap", "retention", "analytics", "scale"),
)
def q_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    days = events.select(
        F.datediff(F.col("ts"), epoch).cast("bigint").alias("d"),
        "user_id",
    ).distinct()
    words = days.groupBy(
        "d", F.expr("user_id div 62").alias("word_idx")
    ).agg(
        # F.shiftleft takes only a literal shift; the SQL form accepts
        # a column (bit = user mod 62, so shifts stay <= 61).
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), "
            "CAST(user_id % 62 AS INT)))"
        ).alias("w")
        # 4 consumers below (both join sides + both activity rollups):
        # per the N>=3-consumers rule, checkpoint once or the distinct+
        # bit_or subtree recomputes 4x (measured 20 exchanges -> 8).
    ).localCheckpoint(eager=True)
    act = words.groupBy("d").agg(
        F.sum(F.bit_count("w")).cast("bigint").alias("n_active")
    )
    a = words.select("d", "word_idx", F.col("w").alias("wa"))
    b = words.select(
        (F.col("d") - 1).alias("d"), "word_idx", F.col("w").alias("wb")
    )
    paired = a.join(b, ["d", "word_idx"])
    ret = paired.groupBy("d").agg(
        F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb"))))
        .cast("bigint")
        .alias("n_retained")
    )
    n2 = act.select((F.col("d") - 1).alias("d"), F.col("n_active").alias("n_active_next"))
    return (
        ret.join(act, "d")
        .join(n2, "d")
        .select(
            F.col("d").alias("day_num"),
            (F.col("d") + 1).cast("bigint").alias("next_day"),
            "n_active",
            "n_active_next",
            "n_retained",
            F.expr("(10000 * n_retained) div n_active").alias(
                "retained_pct_x100"
            ),
        )
    )


@register(
    "q_stockout_detection",
    oracle=f"""
    WITH e AS (
        SELECT user_id AS product_code, event_id AS seq,
               {{ACTION_MAP}} AS action,
               CAST(floor(value) AS INTEGER) AS delta
        FROM events
    ),
    valid AS (
        SELECT * FROM e
        WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
    ),
    seg AS (
        SELECT *,
               SUM(CASE WHEN action = 'REP' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY product_code ORDER BY seq
                         ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM valid
    ),
    bal AS (
        SELECT product_code, seq,
               CAST(COALESCE(MAX(CASE WHEN action = 'REP' THEN delta END)
                   OVER (PARTITION BY product_code, seg_id), 0) AS BIGINT)
               + CAST(SUM(CASE action WHEN 'INC' THEN delta
                                      WHEN 'DEC' THEN -delta
                                      ELSE 0 END)
                   OVER (PARTITION BY product_code, seg_id ORDER BY seq
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS balance
        FROM seg
    )
    SELECT product_code,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN balance < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oversold_events,
           CAST(MIN(balance) AS BIGINT) AS min_balance,
           MIN(CASE WHEN balance < 0 THEN seq END) AS first_oversold_seq,
           CAST(MAX_BY(balance, seq) AS BIGINT) AS final_balance
    FROM bal GROUP BY product_code
    """.replace("{ACTION_MAP}", """
    CASE event_type
        WHEN 'purchase' THEN 'INC'
        WHEN 'error' THEN 'DEC'
        WHEN 'signup' THEN 'REP'
    END
"""),
    doc=(
        "Stockout / oversell detection over the reference's INC/DEC/"
        "REP inventory changelog (round 9) — the operational audit the "
        "final-count fold (S4, q_agg_inventory) cannot answer: the "
        "RUNNING balance at every event, found by segmenting each "
        "key's history at REP events (segment id = count of REPs so "
        "far) so the balance is segment-base (the REP delta, 0 for "
        "the first segment) plus an ordered prefix sum of signed "
        "deltas WITHIN the segment — the same closed form as the "
        "fold, extended from its final value to its whole trajectory, "
        "still two windows + one aggregate on ONE key exchange, no "
        "iteration. Emits per product: oversold-event count, minimum "
        "balance, first oversold seq, and a final balance that "
        "must equal the S4 fold's count (they share the closed "
        "form). All exact integers."
    ),
    tags=("inventory", "reference-adjacent", "audit", "windows"),
)
def q_stockout_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    valid = events.select(
        F.col("user_id").alias("product_code"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", "INC")
        .when(F.col("event_type") == "error", "DEC")
        .when(F.col("event_type") == "signup", "REP")
        .alias("action"),
        F.floor("value").cast("int").alias("delta"),
    ).filter(F.col("delta").isNotNull() & F.col("action").isNotNull())
    w_ord = (
        Window.partitionBy("product_code")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = valid.withColumn(
        "seg_id",
        F.sum(F.when(F.col("action") == "REP", 1).otherwise(0)).over(w_ord),
    )
    w_seg = Window.partitionBy("product_code", "seg_id")
    w_seg_ord = w_seg.orderBy("seq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    signed = (
        F.when(F.col("action") == "INC", F.col("delta"))
        .when(F.col("action") == "DEC", -F.col("delta"))
        .otherwise(F.lit(0))
    )
    bal = seg.withColumn(
        "balance",
        F.coalesce(
            F.max(F.when(F.col("action") == "REP", F.col("delta"))).over(
                w_seg
            ),
            F.lit(0),
        ).cast("bigint")
        + F.sum(signed).over(w_seg_ord).cast("bigint"),
    )
    return bal.groupBy("product_code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("balance") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_oversold_events"),
        F.min("balance").cast("bigint").alias("min_balance"),
        F.min(F.when(F.col("balance") < 0, F.col("seq"))).alias(
            "first_oversold_seq"
        ),
        F.max_by("balance", "seq").cast("bigint").alias("final_balance"),
    )


# Shared two-sample split for the nonparametric tests: order totalprice
# cents of URGENT vs LOW priority orders.
_TWO_SAMPLE_SQL = """
    samples AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    by_val AS (
        SELECT cents,
               CAST(SUM(is_a) AS BIGINT) AS ca,
               CAST(SUM(1 - is_a) AS BIGINT) AS cb
        FROM samples GROUP BY cents
    ),
    tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
        FROM by_val
    )
"""


@register(
    "q_ks_two_sample",
    oracle=f"""
    WITH {_TWO_SAMPLE_SQL},
    cum AS (
        SELECT cents,
               SUM(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   AS cum_a,
               SUM(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   AS cum_b
        FROM by_val
    )
    SELECT tot.n_a, tot.n_b,
           CAST(MAX(abs(cum_a * tot.n_b - cum_b * tot.n_a)) AS BIGINT)
               AS d_num,
           CAST(MAX(abs(cum_a * tot.n_b - cum_b * tot.n_a)) AS BIGINT)
               / CAST(tot.n_a * tot.n_b AS DOUBLE) AS ks_d
    FROM cum, tot
    GROUP BY tot.n_a, tot.n_b
    """,
    doc=(
        "Two-sample Kolmogorov-Smirnov statistic as EXACT RATIONAL "
        "arithmetic (round 9): D = max |F_a(x) - F_b(x)| over the "
        "pooled support, computed as max |cum_a * n_b - cum_b * n_a| "
        "(one integer per distinct value) over the common denominator "
        "n_a * n_b — no floating-point CDFs, so the statistic is "
        "cell-exact cross-engine (the final ks_d is one int/int "
        "division). Shape: group once by value (the pooled support is "
        "far smaller than the rows), ONE ordered cumulative window "
        "over distinct values, one max — at 100 TB the support-level "
        "window is the whole trick; the raw samples are never "
        "globally sorted. Distribution-drift testing for pipeline "
        "monitoring (price distributions of URGENT vs LOW orders)."
    ),
    tags=("statistics", "nonparametric", "analytics"),
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    samples = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    by_val = samples.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = by_val.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = by_val.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            )
            .cast("bigint")
            .alias("d_num")
        )
        .select(
            "n_a",
            "n_b",
            "d_num",
            (
                F.col("d_num")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("ks_d"),
        )
    )


@register(
    "q_mann_whitney_u",
    oracle=f"""
    WITH {_TWO_SAMPLE_SQL},
    ranked AS (
        SELECT cents, ca, cb,
               SUM(ca + cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   - (ca + cb) AS cum_prev
        FROM by_val
    )
    SELECT tot.n_a, tot.n_b,
           CAST(SUM(ca * (2 * cum_prev + ca + cb + 1)) AS BIGINT) AS r1_x2,
           CAST(SUM(ca * (2 * cum_prev + ca + cb + 1))
                - tot.n_a * (tot.n_a + 1) AS BIGINT) AS u1_x2,
           CAST(2 * tot.n_a * tot.n_b
                - (SUM(ca * (2 * cum_prev + ca + cb + 1))
                   - tot.n_a * (tot.n_a + 1)) AS BIGINT) AS u2_x2
    FROM ranked, tot
    GROUP BY tot.n_a, tot.n_b
    """,
    doc=(
        "Mann-Whitney U (rank-sum) test statistic in EXACT DOUBLED-"
        "INTEGER space (round 9): tied values take the average rank, "
        "which is a half-integer, so every rank is carried x2 — for a "
        "tie group of size c starting after cum_prev pooled items, "
        "2*avg_rank = 2*cum_prev + c + 1, all integers. R1_x2 sums "
        "per-value (no per-row ranking), U1_x2 = 2R1 - n_a(n_a+1), "
        "and U1+U2 = 2*n_a*n_b is emitted as the self-check identity. "
        "Same support-level shape as the KS statistic: one group-by "
        "value, one ordered window over distinct values — the million-"
        "row samples never sort globally. Cell-exact cross-engine "
        "(pure integers)."
    ),
    tags=("statistics", "nonparametric", "analytics"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    samples = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    by_val = samples.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = by_val.withColumn(
        "cum_prev",
        F.sum(F.col("ca") + F.col("cb")).over(w) - (F.col("ca") + F.col("cb")),
    )
    tot = by_val.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    r1x2 = F.sum(
        F.col("ca")
        * (2 * F.col("cum_prev") + F.col("ca") + F.col("cb") + 1)
    ).cast("bigint")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(r1x2.alias("r1_x2"))
        .select(
            "n_a",
            "n_b",
            "r1_x2",
            (F.col("r1_x2") - F.col("n_a") * (F.col("n_a") + 1))
            .cast("bigint")
            .alias("u1_x2"),
            (
                2 * F.col("n_a") * F.col("n_b")
                - (F.col("r1_x2") - F.col("n_a") * (F.col("n_a") + 1))
            )
            .cast("bigint")
            .alias("u2_x2"),
        )
    )


# --------------------------------------------------------------------------
# Round-9 commerce analytics: VWAP, ABC classification, Gini impurity
# profile, and bounded k-core decomposition.
# --------------------------------------------------------------------------


@register(
    "q_vwap_monthly",
    oracle=f"""
    SELECT p.p_brand,
           CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate) AS BIGINT)
               AS yyyymm,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty,
           {money_sum_sql("CAST(l.l_extendedprice AS DECIMAL(12,2))")}
               AS revenue,
           {money_sum_sql("CAST(l.l_extendedprice AS DECIMAL(12,2))")}
               / CAST(SUM(l.l_quantity) AS DOUBLE) AS vwap
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand, year(l.l_shipdate) * 100 + month(l.l_shipdate)
    """,
    doc=(
        "Volume-weighted average price per brand-month (round 9) — "
        "the standard commerce/market rollup: VWAP = exact-decimal "
        "revenue over summed volume, grouped by (brand, yyyymm). "
        "Shape: broadcast the part dimension into the lineitem scan "
        "(no shuffle on the fact side until the final grouped "
        "aggregate, which is partial+final combinable). The division "
        "is one double op over two order-independent exact aggregates "
        "— cell-exact under any partitioning, per the money rules."
    ),
    tags=("commerce", "analytics", "aggregation"),
)
def q_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return (
        j.groupBy(
            "p_brand",
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("yyyymm"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            money_sum(dec("l_extendedprice")).alias("revenue"),
        )
        .withColumn("vwap", F.col("revenue") / F.col("sum_qty"))
    )


@register(
    "q_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
                    * 100 AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                                ROWS UNBOUNDED PRECEDING) AS cum_cents,
               SUM(cents) OVER () AS total_cents
        FROM rev
    ),
    classed AS (
        SELECT *,
               CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                    WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(SUM(cents) AS DECIMAL(18,0)) / 100.0 AS DOUBLE)
               AS class_revenue,
           (10000 * CAST(SUM(cents) AS BIGINT)) // CAST(MAX(total_cents)
               AS BIGINT) AS share_x10000
    FROM classed GROUP BY abc_class
    """,
    doc=(
        "ABC inventory classification (round 9) — the Pareto cut "
        "every supply-chain system ships: parts ranked by exact-cents "
        "revenue, class A = first 80% of cumulative revenue, B to "
        "95%, C the tail, with the boundary test in integer cross-"
        "multiplication (cum*100 <= total*80 — no percentage floats). "
        "The ranking needs a total order (rev DESC, partkey ASC "
        "tiebreak per the repo's LIMIT rule). Scale note: the global "
        "ordered window runs over the PART-LEVEL rollup (|parts| << "
        "|lineitems|), the same two-phase shape as q_pareto_customers "
        "— the fact scan never globally sorts."
    ),
    tags=("commerce", "analytics", "pareto", "windows"),
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        (F.round(F.sum(dec("l_extendedprice")), 2) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("l_partkey").asc())
    ranked = rev.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum_cents"),
        F.sum("cents").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_cents"),
    )
    classed = ranked.withColumn(
        "abc_class",
        F.when(F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (F.sum("cents").cast("decimal(18,0)") / 100.0)
        .cast("double")
        .alias("class_revenue"),
        F.expr("(10000 * CAST(SUM(cents) AS BIGINT)) div MAX(total_cents)")
        .alias("share_x10000"),
    )


@register(
    "q_gini_impurity_profile",
    oracle="""
    SELECT * FROM (
        SELECT 'events.event_type' AS column_name,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c) * SUM(c) - SUM(c * c) AS BIGINT) AS gini_num,
               CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
                   / CAST(SUM(c) * SUM(c) AS DOUBLE) AS gini
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events
              GROUP BY event_type)
        UNION ALL
        SELECT 'orders.o_orderpriority',
               CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(SUM(c) * SUM(c) - SUM(c * c) AS BIGINT),
               CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
                   / CAST(SUM(c) * SUM(c) AS DOUBLE)
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders
              GROUP BY o_orderpriority)
        UNION ALL
        SELECT 'customer.c_mktsegment',
               CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(SUM(c) * SUM(c) - SUM(c * c) AS BIGINT),
               CAST(SUM(c) * SUM(c) - SUM(c * c) AS DOUBLE)
                   / CAST(SUM(c) * SUM(c) AS DOUBLE)
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM customer
              GROUP BY c_mktsegment)
    )
    """,
    doc=(
        "Categorical-balance (Gini impurity) profiling (round 9) — "
        "the data-quality monitor for label/category skew: gini = "
        "1 - sum(p_i^2) computed as the RATIONAL (n^2 - sum cnt^2) / "
        "n^2, so the impurity is exact integer arithmetic plus one "
        "double division (entropy needs ln — banned by the parity "
        "rules; Gini is the standard transcendental-free impurity). "
        "Two-level aggregation per column (value counts, then moment "
        "rollup) — same shape at any scale; the three profiled "
        "columns union into one report frame."
    ),
    tags=("data-quality", "profiling", "statistics"),
)
def q_gini_impurity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        counts = df.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        return counts.agg(
            F.lit(label).alias("column_name"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            (F.sum("c") * F.sum("c") - F.sum(F.col("c") * F.col("c")))
            .cast("bigint")
            .alias("gini_num"),
            (
                (F.sum("c") * F.sum("c") - F.sum(F.col("c") * F.col("c")))
                .cast("double")
                / (F.sum("c") * F.sum("c")).cast("double")
            ).alias("gini"),
        )
    events = load_table(spark, "events", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    return (
        profile(events, "event_type", "events.event_type")
        .unionByName(
            profile(orders, "o_orderpriority", "orders.o_orderpriority")
        )
        .unionByName(
            profile(customer, "c_mktsegment", "customer.c_mktsegment")
        )
    )


def _kcore_oracle_sql(k: int, rounds: int, quota_mod: int) -> str:
    """Bounded k-core peel as mechanically generated nested CTEs —
    DuckDB disallows aggregates in a recursive term, so each peel
    round is its own CTE pair (alive set -> degree filter). The graph
    is md5-DERIVED (CLAUDE.md synthetic-fixture rule): each part gets
    1 + h('kq'||key) % quota_mod out-neighbors h('kn'||key||'_'||j)
    mod |parts|, symmetrized — measured peel dynamics: 200->183
    (converges round 2) at sf0.001, 2000->1810 (round 5) at sf0.01.
    The raw co-purchase graph is unusable as a fixture here: min
    degree 42 at sf0.01 (nothing peels at any sane k), and a
    2-co-occurrence threshold leaves k=3 unconverged after 8 rounds.
    """
    h = lambda e: f"CAST(CONCAT('0x', substr(md5({e}), 1, 15)) AS BIGINT)"
    parts = [f"""
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part),
    raw AS (
        SELECT p_partkey AS src,
               {h("CONCAT('kn', p_partkey, '_', g.j)")} % nn.n AS dst
        FROM part, range(0, {quota_mod}) g(j), nn
        WHERE g.j < 1 + {h("CONCAT('kq', p_partkey)")} % {quota_mod}
    ),
    edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM raw WHERE src <> dst
            UNION ALL
            SELECT dst, src FROM raw WHERE src <> dst
        )
    ),
    alive0 AS (SELECT DISTINCT src AS node FROM edges)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""
    deg{r} AS (
        SELECT e.src AS node, COUNT(*) AS deg
        FROM edges e
        JOIN alive{r - 1} s ON s.node = e.src
        JOIN alive{r - 1} d ON d.node = e.dst
        GROUP BY e.src
    ),
    alive{r} AS (SELECT node FROM deg{r} WHERE deg >= {k})""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT g.node, CAST(g.deg AS BIGINT) AS core_degree,
           (SELECT COUNT(*) FROM alive{rounds - 1})
               = (SELECT COUNT(*) FROM alive{rounds}) AS converged
    FROM deg{rounds} g
    JOIN alive{rounds} a ON a.node = g.node
    """
    )


@register(
    "q_kcore_decomposition",
    oracle=_kcore_oracle_sql(4, 6, 6),
    doc=(
        "Bounded k-core decomposition (round 9) — the graph-"
        "densification filter (community cores, spam/bot rings, "
        "recommendation neighborhoods): iteratively peel nodes of "
        "degree < 4, 6 rounds, report the surviving core with its "
        "in-core degree. The graph is md5-derived over the part key "
        "space (the co-purchase graph is too dense to peel — min "
        "degree 42 at sf0.01 — and its thresholded variant does not "
        "converge; the synthetic-fixture derivation is the repo's "
        "established pattern from the spatial queries). Bounded-"
        "round semantics like the BFS/SSSP supersteps, but NOT "
        "silent: a data-computed `converged` column compares the "
        "last two alive-set sizes, so an under-peeled run at a "
        "bigger scale factor reports itself (measured: converged by "
        "round 2 at sf0.001, round 5 at sf0.01). Spark shape: "
        "one-shuffle md5 edge build, then per round two joins "
        "against the alive set + one degree aggregate with "
        "localCheckpoint lineage truncation. The alive set is "
        "broadcast because it is bounded by the part dimension and "
        "shrinks monotonically; at true 100x the safe default is "
        "the shuffle join on the edges src clustering, exactly as "
        "q_bfs_reachability documents."
    ),
    tags=("graph", "iterative", "kcore"),
)
def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).select("p_partkey")
    n_parts = part.count()  # one tiny driver scalar, like the BOM depth
    from kafka_streams_aggregate_spark.functions.hashing import hash60

    quota = 1 + hash60(
        F.concat(F.lit("kq"), F.col("p_partkey"))
    ) % 6
    raw = (
        part.select(
            F.col("p_partkey").alias("src"),
            F.explode(F.sequence(F.lit(0), (quota - 1).cast("int"))).alias(
                "j"
            ),
        )
        .select(
            "src",
            (
                hash60(
                    F.concat(
                        F.lit("kn"), F.col("src"), F.lit("_"), F.col("j")
                    )
                )
                % F.lit(n_parts)
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    edges = (
        raw.select("src", "dst")
        .unionByName(
            raw.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    alive = edges.select(F.col("src").alias("node")).distinct()
    deg = None
    n_prev = -1
    n_alive = -2
    for _ in range(6):
        deg = (
            edges.join(F.broadcast(alive), edges["src"] == alive["node"])
            .drop("node")
            .join(
                F.broadcast(alive.withColumnRenamed("node", "dnode")),
                F.col("dst") == F.col("dnode"),
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = (
            deg.filter(F.col("deg") >= 4)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=True)
        )
        n_prev, n_alive = n_alive, alive.count()
    return deg.join(alive, deg["src"] == alive["node"]).select(
        F.col("node"),
        F.col("deg").cast("bigint").alias("core_degree"),
        F.lit(bool(n_prev == n_alive)).alias("converged"),
    )


# --------------------------------------------------------------------------
# Round-9 time-series & robust-stats batch: skyline, CUSUM change point,
# TWAP, MAD, rolling z-score outliers, day-of-week seasonal index,
# cohort LTV. All exact-integer or money-rule arithmetic.
# --------------------------------------------------------------------------


@register(
    "q_skyline_pareto_2d",
    oracle="""
    WITH pts AS (
        SELECT l_partkey,
               CAST(floor(MIN(l_extendedprice / l_quantity) * 100)
                    AS BIGINT) AS unit_cents,
               CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey
    ),
    flagged AS (
        SELECT *,
               MAX(total_qty) OVER (ORDER BY unit_cents
                                    RANGE BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS best_qty_cheaper,
               MAX(total_qty) OVER (PARTITION BY unit_cents)
                   AS best_qty_same_price
        FROM pts
    )
    SELECT l_partkey, unit_cents, total_qty
    FROM flagged
    WHERE (best_qty_cheaper IS NULL OR best_qty_cheaper < total_qty)
      AND best_qty_same_price <= total_qty
    """,
    doc=(
        "2-D skyline (Pareto-frontier) operator (round 9) — the "
        "multi-criteria shortlist query (cheapest unit price vs "
        "highest availability): a part survives iff NO other part is "
        "cheaper-or-equal AND higher-or-equal with one strict. Two "
        "windows replace the naive quadratic dominance join: a "
        "RANGE-frame cumulative max over strictly-cheaper prices "
        "(value-offset frame, so price ties are excluded exactly) "
        "plus a same-price partition max — O(n log n) sort vs O(n^2) "
        "pairs, and the sort runs over the PART-LEVEL rollup, not "
        "the fact table. Exact floor-cents/quantity integers."
    ),
    tags=("skyline", "analytics", "windows"),
)
def q_skyline_pareto_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    pts = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey")
        .agg(
            F.floor(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100
            )
            .cast("bigint")
            .alias("unit_cents"),
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
        )
    )
    w_cheaper = (
        Window.orderBy("unit_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("unit_cents")
    flagged = pts.select(
        "l_partkey",
        "unit_cents",
        "total_qty",
        F.max("total_qty").over(w_cheaper).alias("best_qty_cheaper"),
        F.max("total_qty").over(w_same).alias("best_qty_same_price"),
    )
    return flagged.filter(
        (
            F.col("best_qty_cheaper").isNull()
            | (F.col("best_qty_cheaper") < F.col("total_qty"))
        )
        & (F.col("best_qty_same_price") <= F.col("total_qty"))
    ).select("l_partkey", "unit_cents", "total_qty")


@register(
    "q_change_point_cusum",
    oracle="""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', ts) AS d,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY d
    ),
    ordered AS (
        SELECT d, cents,
               row_number() OVER (ORDER BY d) AS i,
               SUM(cents) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                   AS cum
        FROM daily
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS total
        FROM daily
    ),
    scored AS (
        SELECT d, i, cum, tot.n, tot.total,
               CAST(n * cum - i * total AS BIGINT) AS s_scaled
        FROM ordered, tot
    ),
    best AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (ORDER BY abs(s_scaled) DESC,
                                         d ASC) AS rnk
            FROM scored
        ) WHERE rnk = 1
    )
    SELECT n AS n_days, total AS total_cents,
           CAST(d AS BIGINT) AS change_day,
           CAST(i AS BIGINT) AS split_i,
           CAST(abs(s_scaled) AS BIGINT) AS max_abs_s,
           CAST(cum AS DOUBLE) / CAST(i AS DOUBLE) AS mean_before,
           CAST(total - cum AS DOUBLE) / CAST(n - i AS DOUBLE)
               AS mean_after
    FROM best
    """,
    doc=(
        "CUSUM change-point detection on the daily-revenue series "
        "(round 9) — pipeline drift monitoring in EXACT INTEGER "
        "space: the cumulative-sum statistic S_i = n*cum_i - "
        "i*total (the n-scaled deviation of the prefix from the "
        "global mean) needs no float means, and the change point is "
        "argmax |S_i| with earliest-day tiebreak, expressed as "
        "MIN_BY over the (-|S|, day) tuple in both engines. Before/"
        "after means come out as two int/int divisions. One day-"
        "level aggregate + one ordered window over days — the raw "
        "events aggregate map-side first, the window never sees "
        "them. The last day's S is 0 by construction (i=n), so "
        "a constant series reports day 1 only if all else ties — "
        "degenerate inputs stay deterministic."
    ),
    tags=("time-series", "change-point", "statistics"),
)
def q_change_point_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = events.groupBy(
        F.datediff(F.col("ts"), epoch).cast("bigint").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d")
    ordered = daily.select(
        "d",
        "cents",
        F.row_number().over(w).alias("i"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    scored = ordered.crossJoin(F.broadcast(tot)).withColumn(
        "s_scaled",
        (F.col("n") * F.col("cum") - F.col("i") * F.col("total"))
        .cast("bigint"),
    )
    wr = Window.orderBy(F.abs(F.col("s_scaled")).desc(), F.col("d").asc())
    best = scored.withColumn("rnk", F.row_number().over(wr)).filter(
        F.col("rnk") == 1
    )
    return best.select(
        F.col("n").alias("n_days"),
        F.col("total").alias("total_cents"),
        F.col("d").cast("bigint").alias("change_day"),
        F.col("i").cast("bigint").alias("split_i"),
        F.abs(F.col("s_scaled")).cast("bigint").alias("max_abs_s"),
        (F.col("cum").cast("double") / F.col("i").cast("double")).alias(
            "mean_before"
        ),
        (
            (F.col("total") - F.col("cum")).cast("double")
            / (F.col("n") - F.col("i")).cast("double")
        ).alias("mean_after"),
    )


@register(
    "q_twap_irregular",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(floor(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS us,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_us
        FROM events
    ),
    iv AS (
        SELECT user_id, cents,
               (next_us - us) // 1000000 AS dur_s
        FROM seq WHERE next_us IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_seconds,
           CAST(SUM(cents * dur_s) AS BIGINT) AS weighted_sum,
           CAST(SUM(cents * dur_s) AS DOUBLE)
               / CAST(SUM(dur_s) AS DOUBLE) AS twap_cents
    FROM iv GROUP BY user_id
    """,
    doc=(
        "Time-weighted average price over IRREGULAR event times "
        "(round 9) — the finance/IoT aggregate where naive row "
        "averages are wrong: each observation holds until the next "
        "one (LOCF semantics), so its weight is the interval "
        "duration. One lead() window per user (ts + event_id "
        "tiebreak per the total-order rule), durations floored to "
        "whole seconds so weights and the weighted sum stay exact "
        "int64 (micros x cents would overflow at month-long gaps), "
        "final TWAP one int/int division. Scale: the window "
        "partitions by user — embarrassingly parallel after one "
        "key exchange."
    ),
    tags=("time-series", "finance", "windows"),
)
def q_twap_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    iv = seq.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        "cents",
        F.expr("(next_us - us) div 1000000").alias("dur_s"),
    )
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dur_s").cast("bigint").alias("total_seconds"),
        F.sum(F.col("cents") * F.col("dur_s"))
        .cast("bigint")
        .alias("weighted_sum"),
        (
            F.sum(F.col("cents") * F.col("dur_s")).cast("double")
            / F.sum("dur_s").cast("double")
        ).alias("twap_cents"),
    )


@register(
    "q_mad_robust",
    oracle="""
    WITH v AS (
        SELECT o_orderpriority AS grp,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    med AS (
        SELECT grp, cents AS med_cents FROM (
            SELECT grp, cents,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY cents, grp) AS rn,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM v
        ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
        SELECT v.grp, abs(v.cents - m.med_cents) AS adev, m.med_cents
        FROM v JOIN med m ON v.grp = m.grp
    )
    SELECT grp AS o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(med_cents) AS BIGINT) AS median_cents,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS BIGINT)
               AS mad_cents
    FROM (
        SELECT grp, adev, med_cents,
               row_number() OVER (PARTITION BY grp ORDER BY adev) AS rn,
               COUNT(*) OVER (PARTITION BY grp) AS n
        FROM dev
    ) GROUP BY grp
    """,
    doc=(
        "Median absolute deviation (round 9) — the robust spread "
        "statistic outlier pipelines prefer over stddev (one wild "
        "row cannot move it): lower-median (integer rank (n+1) div "
        "2, no interpolation — exact at even n too) of |x - "
        "lower-median(x)| per priority group, all in floor-cents "
        "integers. Two ranked passes (median, then deviation "
        "median), each one partitioned sort per group — the "
        "classic exact-MAD dataflow; at 100 TB the same shape runs "
        "per-group parallel, and the sampled-boundary machinery of "
        "q_two_pass_median is the approximation lever if a global "
        "sort per group ever binds."
    ),
    tags=("statistics", "robust", "windows"),
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    v = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("grp").orderBy("cents", "grp")
    wc = Window.partitionBy("grp")
    med = (
        v.select(
            "grp",
            "cents",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("grp", F.col("cents").alias("med_cents"))
    )
    dev = v.join(med, "grp").select(
        "grp",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    wd = Window.partitionBy("grp").orderBy("adev")
    ranked = dev.select(
        "grp",
        "med_cents",
        "adev",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return ranked.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.max("med_cents").cast("bigint").alias("median_cents"),
        F.max(
            F.when(F.expr("rn = (n + 1) div 2"), F.col("adev"))
        )
        .cast("bigint")
        .alias("mad_cents"),
    ).withColumnRenamed("grp", "o_orderpriority")


@register(
    "q_rolling_zscore_outliers",
    oracle="""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', ts) AS d,
               CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY d
    ),
    win AS (
        SELECT d, x,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx,
               SUM(x * x) OVER w AS sx2
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT d AS day_num, x AS day_total, CAST(n AS BIGINT) AS n_window,
           CASE WHEN n >= 4
                THEN (n * x - sx) * (n * x - sx)
                     > 9 * (n * sx2 - sx * sx)
                ELSE FALSE END AS is_outlier
    FROM win
    """,
    doc=(
        "Rolling z-score outlier flags in EXACT INTEGER space (round "
        "9): a day is anomalous when |x - mean| > 3*sigma over the "
        "trailing 7-day window (current day EXCLUDED, so the outlier "
        "cannot poison its own baseline). The float-free test "
        "multiplies through by n^2: (n*x - Sx)^2 > 9*(n*Sx2 - Sx^2) "
        "— population variance, all int64 (whole-unit day totals "
        "keep the squares well inside range; the unit scale is the "
        "overflow knob at larger SFs). Windows shorter than 4 days "
        "report false (cold start). One day-level rollup + one "
        "ordered window — same scale shape as the CUSUM query."
    ),
    tags=("time-series", "anomaly", "windows"),
)
def q_rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = events.groupBy(
        F.datediff(F.col("ts"), epoch).cast("bigint").alias("d")
    ).agg(
        F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("x")
    )
    w = Window.orderBy("d").rowsBetween(-7, -1)
    win = daily.select(
        "d",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sx2"),
    )
    dev = F.col("n") * F.col("x") - F.col("sx")
    var_n2 = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    return win.select(
        F.col("d").alias("day_num"),
        F.col("x").alias("day_total"),
        F.col("n").cast("bigint").alias("n_window"),
        F.when(F.col("n") >= 4, dev * dev > 9 * var_n2)
        .otherwise(F.lit(False))
        .alias("is_outlier"),
    )


@register(
    "q_seasonal_dow_index",
    oracle="""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', ts) AS d,
               CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY d
    ),
    ma AS (
        SELECT d, x,
               COUNT(*) OVER w AS wn,
               SUM(x) OVER w AS trend7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT CAST((d + 4) % 7 AS BIGINT) AS dow,
               7 * x - trend7 AS detr7
        FROM ma WHERE wn = 7
    )
    SELECT dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(detr7) AS BIGINT) AS sum_detrended_x7,
           CAST(SUM(detr7) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_detrended_x7
    FROM det GROUP BY dow
    """,
    doc=(
        "Day-of-week seasonal index by moving-average decomposition "
        "(round 9) — the classical additive trend/seasonal split "
        "kept float-free: trend is the CENTERED 7-day sum (x7, so "
        "no division), detrended value is 7*x - trend7, and the "
        "per-weekday seasonal index averages those exact integers "
        "(edge days without a full window are excluded, as the "
        "classical method requires). Weekday derives from the epoch "
        "day number ((d+4)%7 — day 0 = Thursday), NOT from engine "
        "dayofweek functions, sidestepping the Spark-1=Sunday vs "
        "DuckDB-0=Sunday trap in CLAUDE.md. A positive index = "
        "that weekday runs above trend."
    ),
    tags=("time-series", "seasonal", "windows"),
)
def q_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = events.groupBy(
        F.datediff(F.col("ts"), epoch).cast("bigint").alias("d")
    ).agg(
        F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("x")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "x",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum("x").over(w).alias("trend7"),
    )
    det = ma.filter(F.col("wn") == 7).select(
        ((F.col("d") + 4) % 7).cast("bigint").alias("dow"),
        (7 * F.col("x") - F.col("trend7")).alias("detr7"),
    )
    return det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("detr7").cast("bigint").alias("sum_detrended_x7"),
        (F.sum("detr7").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("mean_detrended_x7"),
    )


@register(
    "q_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(year(o_orderdate) * 12 + (month(o_orderdate) - 1))
                   AS cohort_m
        FROM orders GROUP BY o_custkey
    ),
    tagged AS (
        SELECT f.cohort_m,
               (year(o.o_orderdate) * 12 + (month(o.o_orderdate) - 1))
                   - f.cohort_m AS k,
               CAST(o.o_totalprice AS DECIMAL(12,2)) AS price_d
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    cohort_sizes AS (
        SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM firsts GROUP BY cohort_m
    ),
    per_k AS (
        SELECT cohort_m, CAST(k AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(price_d), 2) * 100 AS BIGINT) AS rev_cents
        FROM tagged GROUP BY cohort_m, k
    )
    SELECT CAST(p.cohort_m AS BIGINT) AS cohort_m, p.k,
           s.n_customers, p.n_orders,
           CAST(CAST(p.rev_cents AS DECIMAL(18,0)) / 100.0 AS DOUBLE)
               AS revenue,
           CAST(CAST(SUM(p.rev_cents) OVER (PARTITION BY p.cohort_m
                                            ORDER BY p.k
                                            ROWS UNBOUNDED PRECEDING)
                     AS DECIMAL(18,0)) / 100.0 AS DOUBLE)
               AS cum_ltv,
           (100 * CAST(SUM(p.rev_cents) OVER (PARTITION BY p.cohort_m
                                              ORDER BY p.k
                                              ROWS UNBOUNDED PRECEDING)
                       AS BIGINT))
               // s.n_customers AS ltv_per_customer_cents
    FROM per_k p JOIN cohort_sizes s ON s.cohort_m = p.cohort_m
    """,
    doc=(
        "Cohort lifetime-value curves (round 9) — the revenue "
        "companion of q_retention_cohorts: customers cohort by "
        "first-order month (linearized year*12+month-1 integers, no "
        "date diffs), each later order lands at month offset k, and "
        "the cumulative LTV per cohort is an ordered window over "
        "exact revenue cents with per-customer LTV as an integer "
        "division. Money rule throughout (DECIMAL sum -> cents "
        "BIGINT -> /100 at the edge). Shape: one self-joinable "
        "firsts aggregate (broadcastable — one row per customer "
        "cohort), one fact aggregate to (cohort, k) granularity, "
        "the window only over that small grid."
    ),
    tags=("analytics", "cohort", "commerce"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    lin_m = (F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1))
    firsts = orders.groupBy("o_custkey").agg(
        F.min(lin_m).alias("cohort_m")
    )
    tagged = orders.join(firsts, "o_custkey").select(
        "cohort_m",
        (lin_m - F.col("cohort_m")).cast("bigint").alias("k"),
        dec("o_totalprice").alias("price_d"),
    )
    sizes = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    per_k = tagged.groupBy("cohort_m", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.round(F.sum("price_d"), 2) * 100)
        .cast("bigint")
        .alias("rev_cents"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = per_k.join(F.broadcast(sizes), "cohort_m").select(
        F.col("cohort_m").cast("bigint").alias("cohort_m"),
        "k",
        "n_customers",
        "n_orders",
        (F.col("rev_cents").cast("decimal(18,0)") / 100.0)
        .cast("double")
        .alias("revenue"),
        (F.sum("rev_cents").over(w).cast("decimal(18,0)") / 100.0)
        .cast("double")
        .alias("cum_ltv"),
        F.expr(
            "(100 * SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY k "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
            "div n_customers"
        ).alias("ltv_per_customer_cents"),
    )
    return out


@register(
    "q_autocorr_lag",
    oracle="""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', ts) AS d,
               CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY d
    ),
    lags AS (SELECT unnest([1, 7]) AS lag),
    pairs AS (
        SELECT l.lag, a.x AS x, b.x AS y
        FROM daily a JOIN lags l ON TRUE
        JOIN daily b ON b.d = a.d + l.lag
    ),
    comp AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sx2,
               CAST(SUM(y * y) AS BIGINT) AS sy2
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, m, sx, sy, sxy, sx2, sy2,
           CASE WHEN m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0
                THEN CAST(m * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(m * sx2 - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * sy2 - sy * sy AS DOUBLE)))
                END AS autocorr
    FROM comp
    """,
    doc=(
        "Lag-k autocorrelation of the daily series (round 9, lags 1 "
        "and 7) — the seasonality detector feeding the DOW-index "
        "decomposition: Pearson r between the series and its k-day "
        "shift, with ALL sums accumulated as exact int64 (whole-unit "
        "day totals) and the only float ops the final sqrt(+div) — "
        "sqrt is IEEE-exact per the parity rules, so r is cell-exact "
        "cross-engine. Lag pairs come from a day-arithmetic self-"
        "join (gap-safe, unlike lead()-over-rows which would pair "
        "across missing days). Degenerate (constant) windows yield "
        "NULL via the positive-denominator guard, not NaN."
    ),
    tags=("time-series", "statistics", "autocorrelation"),
)
def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = events.groupBy(
        F.datediff(F.col("ts"), epoch).cast("bigint").alias("d")
    ).agg(
        F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("x")
    )
    lags = spark.range(2).select(
        F.when(F.col("id") == 0, 1).otherwise(7).alias("lag")
    )
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("y"))
    pairs = a.join(b, F.col("bd") == F.col("d") + F.col("lag"))
    comp = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sy2"),
    )
    return comp.selectExpr(
        "CAST(lag AS BIGINT) AS lag",
        "m", "sx", "sy", "sxy", "sx2", "sy2",
        """CASE WHEN m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0
                THEN CAST(m * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(m * sx2 - sx * sx AS DOUBLE))
                        * sqrt(CAST(m * sy2 - sy * sy AS DOUBLE)))
           END AS autocorr""",
    )


@register(
    "q_corr_components",
    oracle="""
    WITH base AS (
        SELECT p.p_brand,
               CAST(l.l_quantity AS BIGINT) AS x,
               CAST(floor(l.l_extendedprice) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    comp AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sx2,
               CAST(SUM(y * y) AS BIGINT) AS sy2
        FROM base GROUP BY p_brand
    )
    SELECT p_brand, n, sx, sy, sxy, sx2, sy2,
           CASE WHEN CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx > 0
                 AND CAST(n AS HUGEINT) * sy2 - CAST(sy AS HUGEINT) * sy > 0
                THEN CAST(CAST(n AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / (sqrt(CAST(CAST(n AS HUGEINT) * sx2
                                  - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                        * sqrt(CAST(CAST(n AS HUGEINT) * sy2
                                    - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
                END AS pearson_r
    FROM comp
    """,
    doc=(
        "Pearson correlation with EXACT WIDE-INTEGER components "
        "(round 9): quantity-vs-price correlation per brand, where "
        "the raw moment sums stay int64 but their combinations "
        "(n*S2 - S^2) exceed 64 bits — Spark carries them in "
        "DECIMAL(38,0), DuckDB in HUGEINT, both exact at these "
        "magnitudes, and the cast-to-double of the same exact "
        "integer is bit-identical, so r survives the cell-exact "
        "compare (corr() built-ins use running float updates whose "
        "order differs across engines — unusable under the parity "
        "rules). Whole-dollar price units keep the raw sums in "
        "int64 through sf1. Degenerate groups guard to NULL."
    ),
    tags=("statistics", "correlation", "analytics"),
)
def q_corr_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    base = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor("l_extendedprice").cast("bigint").alias("y"),
    )
    comp = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sy2"),
    )
    d38 = "DECIMAL(38,0)"
    return comp.selectExpr(
        "p_brand", "n", "sx", "sy", "sxy", "sx2", "sy2",
        f"""CASE WHEN CAST(n AS {d38}) * sx2 - CAST(sx AS {d38}) * sx > 0
                  AND CAST(n AS {d38}) * sy2 - CAST(sy AS {d38}) * sy > 0
                 THEN CAST(CAST(n AS {d38}) * sxy
                           - CAST(sx AS {d38}) * sy AS DOUBLE)
                      / (sqrt(CAST(CAST(n AS {d38}) * sx2
                                   - CAST(sx AS {d38}) * sx AS DOUBLE))
                         * sqrt(CAST(CAST(n AS {d38}) * sy2
                                     - CAST(sy AS {d38}) * sy AS DOUBLE)))
            END AS pearson_r""",
    )


@register(
    "q_readability_scores",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
               AS n_vowel_groups,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
           (100 * CAST(len(regexp_extract_all(text, '[aeiou]+'))
                       AS BIGINT))
               // CAST(len(string_split(text, ' ')) AS BIGINT)
               AS syllables_per_word_x100,
           (100 * CAST(length(replace(text, ' ', '')) AS BIGINT))
               // CAST(len(string_split(text, ' ')) AS BIGINT)
               AS chars_per_word_x100
    FROM documents
    """,
    doc=(
        "Readability surrogate scoring (round 9) — the text-quality "
        "stage between lang-id and quality filtering: vowel-group "
        "count approximates syllables (the standard heuristic when "
        "no dictionary ships), and syllables-per-word + chars-per-"
        "word are the two drivers of Flesch-family indices, emitted "
        "as integer-scaled ratios (the Flesch formula's float "
        "constants add nothing the downstream threshold can't "
        "apply). regexp_count/regexp_extract_all agree on this "
        "anchored character class cross-engine (verified). Pure "
        "per-row map — embarrassingly parallel."
    ),
    tags=("text", "quality", "llm"),
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        F.regexp_count(F.col("text"), F.lit("[aeiou]+"))
        .cast("bigint")
        .alias("n_vowel_groups"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("bigint")
        .alias("n_letters"),
    ).selectExpr(
        "doc_id",
        "n_words",
        "n_vowel_groups",
        "n_letters",
        "(100 * n_vowel_groups) div n_words AS syllables_per_word_x100",
        "(100 * n_letters) div n_words AS chars_per_word_x100",
    )


# --------------------------------------------------------------------------
# Round 9 (session 2): interval coverage, conversion-delay percentiles,
# session path mining, calendar gap-fill, k-anonymity audit.
# --------------------------------------------------------------------------
@register(
    "q_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT o_custkey,
               datediff('day', DATE '1970-01-01', o_orderdate)
                   * CAST(86400000 AS BIGINT) AS s_ms,
               datediff('day', DATE '1970-01-01', o_orderdate)
                   * CAST(86400000 AS BIGINT)
                   + ((o_orderkey % 30) + 1) * 86400000 AS e_ms,
               o_orderkey
        FROM orders
    ), flagged AS (
        SELECT *,
               CASE WHEN max(e_ms) OVER (
                        PARTITION BY o_custkey
                        ORDER BY s_ms, e_ms, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) >= s_ms THEN 0 ELSE 1 END AS new_island
        FROM iv
    ), islands AS (
        SELECT *,
               SUM(new_island) OVER (
                   PARTITION BY o_custkey
                   ORDER BY s_ms, e_ms, o_orderkey
               ) AS island_id
        FROM flagged
    ), per_island AS (
        SELECT o_custkey, island_id,
               MAX(e_ms) - MIN(s_ms) AS covered_ms,
               CAST(SUM(e_ms - s_ms) AS BIGINT) AS raw_ms,
               COUNT(*) AS n_iv
        FROM islands GROUP BY o_custkey, island_id
    )
    SELECT o_custkey,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(covered_ms) AS BIGINT) AS covered_ms,
           CAST(SUM(raw_ms) - SUM(covered_ms) AS BIGINT) AS overlap_ms
    FROM per_island
    GROUP BY o_custkey
    """,
    doc=(
        "Interval-union coverage (sweep-line as windows): per customer, "
        "half-open order-activity intervals [orderdate, orderdate + "
        "1..30 days) are merged into maximal overlapping islands with "
        "the classic running-max-of-ends flag — an interval starts a "
        "new island iff it begins strictly after every earlier "
        "interval's end — then covered time is summed per island. "
        "Returns total covered vs double-counted (overlap) "
        "milliseconds, the primitive behind uptime/SLA accounting and "
        "device-activity dedup. Everything is exact integer epoch-ms; "
        "the window order carries (start, end, orderkey) so the "
        "running max is a total order. Scale: one hash exchange on "
        "custkey feeds both windows and both aggregations — no "
        "self-join, linear in intervals, the standard alternative to "
        "the O(n^2) overlap join."
    ),
    tags=("window", "interval", "analytics"),
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    # o_orderdate is TIMESTAMP_NTZ: epoch-ms comes from exact integer
    # epoch-days * 86400000 (datediff — no tz-sensitive unix_millis).
    day_ms = F.datediff(
        F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
    ).cast("bigint") * F.lit(86400000)
    iv = orders.select(
        "o_custkey",
        day_ms.alias("s_ms"),
        (day_ms + ((F.col("o_orderkey") % 30) + 1) * F.lit(86400000)).alias(
            "e_ms"
        ),
        "o_orderkey",
    )
    order_cols = [F.col("s_ms"), F.col("e_ms"), F.col("o_orderkey")]
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.partitionBy("o_custkey").orderBy(*order_cols)
    islands = iv.withColumn(
        "new_island",
        F.when(F.max("e_ms").over(w_prev) >= F.col("s_ms"), 0).otherwise(1),
    ).withColumn("island_id", F.sum("new_island").over(w_cum))
    per_island = islands.groupBy("o_custkey", "island_id").agg(
        (F.max("e_ms") - F.min("s_ms")).alias("covered_ms"),
        F.sum(F.col("e_ms") - F.col("s_ms")).cast("bigint").alias("raw_ms"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return per_island.groupBy("o_custkey").agg(
        F.sum("n_iv").cast("bigint").alias("n_intervals"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("covered_ms").cast("bigint").alias("covered_ms"),
        (F.sum("raw_ms") - F.sum("covered_ms")).cast("bigint").alias("overlap_ms"),
    )


@register(
    "q_funnel_time_to_convert",
    oracle="""
    WITH first_view AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), conv AS (
        SELECT e.user_id,
               epoch_ms(min(e.ts)) - epoch_ms(v.t_view) AS delay_ms
        FROM events e JOIN first_view v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id, v.t_view
    ), ranked AS (
        SELECT delay_ms,
               row_number() OVER (ORDER BY delay_ms, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM conv
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100
                         THEN delay_ms END) AS BIGINT) AS p50_delay_ms,
           CAST(MAX(CASE WHEN rn = (90 * n + 99) // 100
                         THEN delay_ms END) AS BIGINT) AS p90_delay_ms,
           CAST(MIN(delay_ms) AS BIGINT) AS min_delay_ms,
           CAST(MAX(delay_ms) AS BIGINT) AS max_delay_ms
    FROM ranked
    """,
    doc=(
        "Funnel latency: time from each user's FIRST view to their "
        "first purchase strictly after it, summarized as exact p50/p90 "
        "over converting users (companion to q_event_funnel's step "
        "counts). Percentiles use the integer ceil-rank (p*n+99) div "
        "100 — never ceil(0.95*n) (float-epsilon off-by-one, CLAUDE.md) "
        "— with user_id as the row_number tiebreaker so rank k is a "
        "total order. Delays are exact integer milliseconds. Scale: "
        "the per-user reduction shrinks events to one row per "
        "converting user before the single-partition ranking window "
        "— the only global step sees |users| rows, not |events|."
    ),
    tags=("analytics", "funnel", "percentile"),
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    conv = (
        purchases.join(first_view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(
            (F.unix_millis(F.min("ts")) - F.unix_millis("t_view")).alias(
                "delay_ms"
            )
        )
    )
    ranked = conv.select(
        "delay_ms",
        F.row_number()
        .over(Window.orderBy("delay_ms", "user_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    k50 = F.expr("(50 * n + 99) div 100")
    k90 = F.expr("(90 * n + 99) div 100")
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.max(F.when(F.col("rn") == k50, F.col("delay_ms")))
        .cast("bigint")
        .alias("p50_delay_ms"),
        F.max(F.when(F.col("rn") == k90, F.col("delay_ms")))
        .cast("bigint")
        .alias("p90_delay_ms"),
        F.min("delay_ms").cast("bigint").alias("min_delay_ms"),
        F.max("delay_ms").cast("bigint").alias("max_delay_ms"),
    )


@register(
    "q_session_paths_topk",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT *, SUM(new_session) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                  ) AS session_id
        FROM flagged
    ), numbered AS (
        SELECT *, row_number() OVER (
                      PARTITION BY user_id, session_id ORDER BY ts, event_id
                  ) AS rn
        FROM sess
    ), paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM numbered WHERE rn <= 5
        GROUP BY user_id, session_id
    )
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
    doc=(
        "Session path mining: 30-min-gap sessions (same sessionize "
        "contract as q_sessionize_30min, event_id tiebreaker), each "
        "truncated to its first 5 events, serialized to an ordered "
        "'view>click>purchase' path string, then the top-20 most common "
        "paths with session and user counts — the navigation-analysis "
        "staple. Spark's path string comes from array_sort over "
        "(ts, event_id, event_type) structs + transform (collect_list "
        "alone is partition-order-nondeterministic); DuckDB uses "
        "ORDER BY inside string_agg. Truncation bounds path length, so "
        "the path-count aggregation state is O(distinct 5-grams). "
        "Scale: one exchange on user_id for sessionizing + windows, "
        "one on (user, session), one on path; the top-20 is "
        "TakeOrderedAndProject over the aggregated path table."
    ),
    tags=("analytics", "sessionize", "path"),
)
def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.windows import sessionize

    events = load_table(spark, "events", sf_dir)
    sess = sessionize(
        events,
        key_col="user_id",
        ts_col="ts",
        gap_seconds=1800,
        order_tiebreak="event_id",
    )
    rn_w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    head5 = sess.withColumn("rn", F.row_number().over(rn_w)).filter(
        F.col("rn") <= 5
    )
    paths = head5.groupBy("user_id", "session_id").agg(
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(struct(ts, event_id, event_type))), "
            "s -> s.event_type), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@register(
    "q_gapfill_calendar",
    oracle="""
    WITH daily AS (
        SELECT user_id, epoch_ms(ts) // 86400000 AS day
        FROM events GROUP BY user_id, epoch_ms(ts) // 86400000
    ), bounds AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1,
               COUNT(*) AS active_days
        FROM daily GROUP BY user_id
    ), grid AS (
        -- bounded constant range + WHERE: DuckDB range() takes no
        -- lateral column args (CLAUDE.md); events span 30 days, the
        -- 4000-day (11-year) ceiling leaves ample headroom.
        SELECT b.user_id, b.d0 + g.i AS day, b.d0, b.d1, b.active_days
        FROM bounds b, range(0, 4000) g(i)
        WHERE b.d0 + g.i <= b.d1
    ), joined AS (
        SELECT g.user_id, g.day, g.d0, g.d1, g.active_days,
               CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
    ), gap_runs AS (
        SELECT user_id,
               day - row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS grp,
               COUNT(*) OVER (PARTITION BY user_id) AS zero_days
        FROM joined WHERE is_gap = 1
    ), gap_stats AS (
        SELECT user_id, MAX(zero_days) AS zero_days,
               MAX(run_len) AS max_gap_run
        FROM (SELECT user_id, zero_days, COUNT(*) AS run_len
              FROM gap_runs GROUP BY user_id, grp, zero_days)
        GROUP BY user_id
    )
    SELECT b.user_id,
           CAST(b.d1 - b.d0 + 1 AS BIGINT) AS span_days,
           CAST(b.active_days AS BIGINT) AS active_days,
           CAST(COALESCE(s.zero_days, 0) AS BIGINT) AS gap_days,
           CAST(COALESCE(s.max_gap_run, 0) AS BIGINT) AS max_gap_run
    FROM bounds b LEFT JOIN gap_stats s ON b.user_id = s.user_id
    """,
    doc=(
        "Calendar densification + gap-run analysis: each user's "
        "activity-day set is expanded to a dense [first_day, last_day] "
        "grid with sequence()/explode (generating rows the source "
        "lacks — the other half of gap handling from q_timeseries_locf, "
        "which only fills columns on EXISTING rows), missing days are "
        "flagged by an outer join back to actual activity, and "
        "consecutive-gap runs are measured with the day-minus- "
        "row_number islands trick. Day arithmetic is exact integer "
        "epoch-days (positive, so Spark div == DuckDB //). Scale: the "
        "grid fan-out is bounded by each key's span (predictable "
        "amplification, no cross join); one exchange on user_id "
        "serves grid build, join and windows."
    ),
    tags=("timeseries", "gapfill", "window"),
)
def q_gapfill_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    # hash(user_id) up front satisfies every downstream clustering
    # (both groupBys, the grid join, the gap-run window), and the
    # events subtree has THREE effective consumers (bounds->grid,
    # bounds->final join, daily->left join) — the N>=3 recompute rule:
    # localCheckpoint the tiny (user, day) frame once; LogicalRDD
    # keeps its partitioning, so no further exchange on user_id exists
    # in the plan (3 events scans -> 1).
    daily = (
        events.repartition("user_id")
        .select(
            "user_id",
            F.expr("unix_millis(ts) div 86400000").alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
        .localCheckpoint(eager=True)
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.count(F.lit(1)).alias("active_days"),
    )
    grid = bounds.select(
        "user_id",
        "d0",
        "d1",
        "active_days",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    joined = grid.join(
        daily.withColumn("is_active", F.lit(1)), ["user_id", "day"], "left"
    )
    gaps = joined.filter(F.col("is_active").isNull()).select("user_id", "day")
    run_w = Window.partitionBy("user_id").orderBy("day")
    gap_runs = gaps.withColumn(
        "grp", F.col("day") - F.row_number().over(run_w)
    )
    gap_stats = (
        gap_runs.groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("user_id")
        .agg(
            F.sum("run_len").alias("zero_days"),
            F.max("run_len").alias("max_gap_run"),
        )
    )
    return bounds.join(gap_stats, "user_id", "left").select(
        "user_id",
        (F.col("d1") - F.col("d0") + 1).cast("bigint").alias("span_days"),
        F.col("active_days").cast("bigint").alias("active_days"),
        F.coalesce(F.col("zero_days"), F.lit(0)).cast("bigint").alias("gap_days"),
        F.coalesce(F.col("max_gap_run"), F.lit(0))
        .cast("bigint")
        .alias("max_gap_run"),
    )


@register(
    "q_k_anonymity_audit",
    oracle="""
    WITH qi AS (
        SELECT c_mktsegment,
               c_nationkey,
               CAST(floor(c_acctbal / 1000) AS INTEGER) AS acctbal_band,
               c_custkey
        FROM customer
    ), grps AS (
        SELECT c_mktsegment, c_nationkey, acctbal_band,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM qi GROUP BY c_mktsegment, c_nationkey, acctbal_band
    )
    SELECT c_mktsegment, c_nationkey, acctbal_band, group_size
    FROM grps WHERE group_size < 5
    """,
    doc=(
        "k-anonymity audit (privacy hygiene for training-data "
        "release): customers are projected onto the quasi-identifier "
        "triple (market segment, nation, $1000 account-balance band) "
        "and every equivalence class smaller than k=5 is reported — "
        "these are the rows an attacker can re-identify by joining on "
        "public attributes, i.e. the rows to suppress or generalize "
        "before export. Banding uses floor() (identical in both "
        "engines, including on negative balances — CAST would "
        "truncate-vs-round diverge). Scale: a single map-side- "
        "combinable groupBy on the QI columns; the violation filter "
        "sees only the aggregated class table."
    ),
    tags=("privacy", "audit", "aggregation"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, "customer", sf_dir)
    qi = customer.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("acctbal_band"),
    )
    grps = qi.groupBy("c_mktsegment", "c_nationkey", "acctbal_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size")
    )
    return grps.filter(F.col("group_size") < 5)
