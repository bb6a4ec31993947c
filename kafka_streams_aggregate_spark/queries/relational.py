"""Relational query corpus (SURVEY.md §2.3 / build-plan Phase 2).

Every operator category the reference lacks, expressed Spark-first over
the driver test tables, each with a DuckDB oracle. Determinism rules
used throughout (see also functions/money.py):

  - monetary aggregates: exact decimal sums -> rounded double
    (order-independent, so partial aggregation can't perturb results);
  - every LIMIT/top-k query orders by a total order (explicit unique
    tiebreakers);
  - int-derived aggregates cast to BIGINT on both sides (DuckDB's
    sum(INTEGER) is HUGEINT otherwise);
  - double->int conversions via explicit floor() (Spark casts truncate,
    DuckDB casts round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.functions.money import dec, money_sum, money_sum_sql
from kafka_streams_aggregate_spark.operators.joins import asof_join, range_join_buckets
from kafka_streams_aggregate_spark.operators.windows import sessionize
from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, n, sf_dir) for n in names]


# --------------------------------------------------------------------------
# Aggregation pipeline (TPC-H Q1 shape): wide scan -> hash agg.
# Catalyst plans partial+final aggregation; only the 2 group columns and
# the referenced measures are read from parquet (column pruning), and the
# shipdate predicate is pushed to the scan.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           {money_sum_sql("CAST(l_extendedprice AS DECIMAL(12,2))")} AS sum_base_price,
           {money_sum_sql("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))")} AS sum_disc_price,
           {money_sum_sql("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))")} AS sum_charge,
           CAST(SUM(l_quantity) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           {money_sum_sql("CAST(l_extendedprice AS DECIMAL(12,2))")} / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan -> pushed filter -> hash aggregate.",
    tags=("aggregation",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    tax_f = (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    n = F.count(F.lit(1))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            money_sum(price).alias("sum_base_price"),
            money_sum(price * disc_f).alias("sum_disc_price"),
            money_sum(price * disc_f * tax_f).alias("sum_charge"),
            (F.sum("l_quantity").cast("double") / n.cast("double")).alias("avg_qty"),
            (money_sum(price) / n.cast("double")).alias("avg_price"),
            n.cast("bigint").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-join + agg + top-k (TPC-H Q3 shape).
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderdate,
           {money_sum_sql("CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4))")} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter -> join -> agg -> deterministic top-10.",
    tags=("join", "aggregation", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    rev = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # The filtered BUILDING customer key set is small: broadcast it so
        # the big fact join needs no extra shuffle of lineitem x orders.
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money_sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Snowflake join across 6 tables (TPC-H Q5 shape).
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {money_sum_sql("CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4))")} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5: 6-table snowflake join; small dims broadcast, facts shuffle once.",
    tags=("join", "aggregation"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, supplier, orders, lineitem = _t(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    rev = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # customer/supplier grow with scale factor: no unconditional hint —
        # Catalyst's size-based auto-broadcast handles the small-SF case and
        # AQE picks sort-merge when they outgrow the broadcast threshold.
        # region/nation are fixed-cardinality: always safe to broadcast.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(money_sum(rev).alias("revenue"))
    )


@register(
    "q_broadcast_star_agg",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {money_sum_sql("CAST(o.o_totalprice AS DECIMAL(12,2))")} AS total_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Star-schema rollup: every dim broadcast, fact never shuffles pre-agg.",
    tags=("join", "broadcast", "aggregation"),
)
def q_broadcast_star_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, orders = _t(
        spark, sf_dir, "region", "nation", "customer", "orders"
    )
    return (
        # customer scales with SF: let size stats / AQE choose its join;
        # nation/region are fixed-size dims, hinted unconditionally.
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            money_sum(dec("o_totalprice")).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins.
# --------------------------------------------------------------------------
@register(
    "q_semi_join_nations",
    oracle="""
    SELECT n.n_name
    FROM nation n
    WHERE EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000
    )
    """,
    doc="Left-semi join (EXISTS): nations having a customer with acctbal > 9000.",
    tags=("join", "semi"),
)
def q_semi_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, customer = _t(spark, sf_dir, "nation", "customer")
    rich = customer.filter(F.col("c_acctbal") > 9000)
    return nation.join(
        rich, nation.n_nationkey == rich.c_nationkey, "left_semi"
    ).select("n_name")


@register(
    "q_anti_join_customers",
    oracle="""
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    GROUP BY c.c_mktsegment
    """,
    doc="Left-anti join (NOT EXISTS): customers with no pending order, by segment.",
    tags=("join", "anti"),
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return (
        customer.join(
            pending, customer.c_custkey == pending.o_custkey, "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Window functions.
# --------------------------------------------------------------------------
@register(
    "q_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
    doc="Top-3 orders per customer by price (rank window, total order).",
    tags=("window", "topk"),
)
def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q_window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(floor(value) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_value,
           lag(event_id) OVER (
               PARTITION BY user_id ORDER BY event_id
           ) AS prev_event_id
    FROM events
    """,
    doc="Analytic windows: per-user running sum + lag over the event stream.",
    tags=("window",),
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "event_id",
        "user_id",
        F.sum(F.floor("value").cast("bigint"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("running_value"),
        F.lag("event_id").over(w).alias("prev_event_id"),
    )


# --------------------------------------------------------------------------
# Ranking/distribution window functions: ntile, percent_rank, nth_value.
# --------------------------------------------------------------------------
@register(
    "q_ntile_percent_rank",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(10) OVER w AS INTEGER) AS decile,
           percent_rank() OVER w AS pct_rank,
           nth_value(c_custkey, 2) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS segment_runner_up
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    doc=(
        "Distribution windows: per-segment balance deciles (ntile), "
        "percent_rank (exact int-ratio double), and the segment's "
        "runner-up via nth_value over the full frame."
    ),
    tags=("window", "ranking"),
)
def q_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return customer.select(
        "c_custkey",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.nth_value("c_custkey", 2).over(w_full).alias("segment_runner_up"),
    )


# --------------------------------------------------------------------------
# RANGE window frame (value-based, not row-based).
# --------------------------------------------------------------------------
@register(
    "q_range_frame_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS events_last_hour
    FROM events
    """,
    doc=(
        "RANGE window frame: per event, how many of the user's events "
        "fall in the trailing hour — value-based frame bounds, unlike "
        "the row-based frames elsewhere in the corpus."
    ),
    tags=("window", "frame"),
)
def q_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("events_last_hour"),
    )


# --------------------------------------------------------------------------
# Map scalar functions.
# --------------------------------------------------------------------------
@register(
    "q_map_functions",
    oracle="""
    SELECT n_nationkey, n_name,
           CASE WHEN n_regionkey = 0 THEN 'AF' WHEN n_regionkey = 1 THEN 'AM'
                WHEN n_regionkey = 2 THEN 'AS' WHEN n_regionkey = 3 THEN 'EU'
                WHEN n_regionkey = 4 THEN 'ME' ELSE 'XX' END AS region_code,
           CAST(5 AS INTEGER) AS map_size
    FROM nation
    """,
    doc=(
        "Map scalar functions: literal map lookup (create_map + "
        "element_at + size + coalesce default) — the Spark side routes "
        "through MapType; the oracle computes the same values directly."
    ),
    tags=("scalar", "map"),
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = _t(spark, sf_dir, "nation")
    codes = F.create_map(
        F.lit(0), F.lit("AF"), F.lit(1), F.lit("AM"), F.lit(2), F.lit("AS"),
        F.lit(3), F.lit("EU"), F.lit(4), F.lit("ME"),
    )
    return nation.select(
        "n_nationkey",
        "n_name",
        F.coalesce(F.element_at(codes, F.col("n_regionkey")), F.lit("XX")).alias(
            "region_code"
        ),
        F.size(codes).cast("int").alias("map_size"),
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube.
# --------------------------------------------------------------------------
@register(
    "q_rollup_region_nation",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           CAST(GROUPING(r.r_name) AS INTEGER) AS g_region,
           CAST(GROUPING(n.n_name) AS INTEGER) AS g_nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {money_sum_sql("CAST(o.o_totalprice AS DECIMAL(12,2))")} AS total_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="ROLLUP over the region>nation hierarchy with GROUPING markers.",
    tags=("aggregation", "rollup"),
)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, orders = _t(
        spark, sf_dir, "region", "nation", "customer", "orders"
    )
    joined = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        money_sum(dec("o_totalprice")).alias("total_value"),
    )


@register(
    "q_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {money_sum_sql("CAST(o_totalprice AS DECIMAL(12,2))")} AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over order status x priority with GROUPING markers.",
    tags=("aggregation", "cube"),
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        money_sum(dec("o_totalprice")).alias("total_value"),
    )


@register(
    "q_grouping_sets_customer",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {money_sum_sql("CAST(c_acctbal AS DECIMAL(12,2))")} AS total_acctbal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    doc="GROUPING SETS: segment totals, nation totals, grand total in one pass.",
    tags=("aggregation", "grouping-sets"),
)
def q_grouping_sets_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, "customer", sf_dir)
    customer.createOrReplaceTempView("ksa_customer_gs")
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               {money_sum_sql("CAST(c_acctbal AS DECIMAL(12,2))")} AS total_acctbal
        FROM ksa_customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@register(
    "q_set_ops_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="UNION/INTERSECT/EXCEPT composition over customer key sets.",
    tags=("setops",),
)
def q_set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    negative = customer.filter(F.col("c_acctbal") < 0).select("c_custkey")
    big_orders = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    pending = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # SQL set-op precedence: INTERSECT binds tighter, so the oracle parses
    # as (A UNION (B INTERSECT C)) EXCEPT D — mirror that explicitly.
    # union() is UNION ALL; subtract() is EXCEPT DISTINCT, which also
    # dedups the left side, matching SQL set semantics.
    return building.union(negative.intersect(big_orders)).subtract(pending)


# --------------------------------------------------------------------------
# Scalar functions: JSON, string, date.
# --------------------------------------------------------------------------
@register(
    "q_json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction over events.props (get_json_object).",
    tags=("scalar", "json"),
)
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
    )


@register(
    "q_string_date_funcs",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           upper(substring(o_orderpriority, 1, 1)) AS priority_initial,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Date part extraction + string functions + distinct aggregate.",
    tags=("scalar", "date", "string"),
)
def q_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.upper(F.substring("o_orderpriority", 1, 1)).alias("priority_initial"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        )
    )


@register(
    "q_distinct_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multiple distinct aggregates + min/max in one pass.",
    tags=("aggregation", "distinct"),
)
def q_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# Pattern matching: LIKE / regexp filters.
# --------------------------------------------------------------------------
@register(
    "q_pattern_filters",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_brass,
           CAST(SUM(CASE WHEN regexp_matches(p_name, '^[ab]') THEN 1 ELSE 0 END) AS BIGINT) AS n_ab_names
    FROM part
    WHERE p_brand LIKE 'Brand#%'
    GROUP BY p_brand
    """,
    doc="LIKE and regexp predicates over part attributes.",
    tags=("scalar", "string", "filter"),
)
def q_pattern_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_brand").like("Brand#%"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(F.col("p_type").like("%BRASS%").cast("int"))
            .cast("bigint")
            .alias("n_brass"),
            F.sum(F.col("p_name").rlike("^[ab]").cast("int"))
            .cast("bigint")
            .alias("n_ab_names"),
        )
    )


# --------------------------------------------------------------------------
# Pagination: ORDER BY ... LIMIT ... OFFSET.
# --------------------------------------------------------------------------
@register(
    "q_paginate_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
    doc="Keyset-free pagination: deterministic total order + limit/offset.",
    tags=("sort", "limit", "offset"),
)
def q_paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(40)
        .limit(20)
    )


# --------------------------------------------------------------------------
# Sorts / limits.
# --------------------------------------------------------------------------
@register(
    "q_top20_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
    doc="Global top-20 by price (TakeOrderedAndProject, no full sort).",
    tags=("sort", "limit"),
)
def q_top20_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# Range join (non-equi) against a broadcast dimension.
# --------------------------------------------------------------------------
_PRICE_BANDS = [(i, 800.0 + 100.0 * i, 900.0 + 100.0 * i) for i in range(14)]
_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)


@register(
    "q_range_join_price_bands",
    oracle=f"""
    SELECT band_id,
           CAST(COUNT(p.p_partkey) AS BIGINT) AS n_parts,
           CAST(MIN(p.p_size) AS INTEGER) AS min_size,
           CAST(MAX(p.p_size) AS INTEGER) AS max_size
    FROM (VALUES {_BANDS_SQL}) AS bands(band_id, lo, hi)
    JOIN part p ON p.p_retailprice >= bands.lo AND p.p_retailprice < bands.hi
    GROUP BY band_id
    """,
    doc="Range (interval) join: parts bucketed into broadcast price bands.",
    tags=("join", "range"),
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        _PRICE_BANDS, "band_id int, lo double, hi double"
    )
    joined = range_join_buckets(part, bands, "p_retailprice", "lo", "hi")
    return joined.groupBy("band_id").agg(
        F.count("p_partkey").cast("bigint").alias("n_parts"),
        F.min("p_size").cast("int").alias("min_size"),
        F.max("p_size").cast("int").alias("max_size"),
    )


# --------------------------------------------------------------------------
# Theta join: equi prefix + inequality band on two fact sides.
# --------------------------------------------------------------------------
@register(
    "q_theta_followup_orders",
    oracle="""
    SELECT o1.o_orderkey AS first_order,
           o2.o_orderkey AS followup_order,
           CAST(date_diff('day', o1.o_orderdate, o2.o_orderdate) AS INTEGER) AS gap_days
    FROM orders o1
    JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o2.o_orderdate > o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
     AND o1.o_orderkey <> o2.o_orderkey
    """,
    doc=(
        "Theta join: repeat orders by the same customer within 30 days — "
        "equi prefix (custkey) carries the shuffle, the date band is a "
        "post-join predicate, so the plan stays a hash/sort-merge join "
        "rather than a nested loop."
    ),
    tags=("join", "theta"),
)
def q_theta_followup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    o1 = orders.select(
        F.col("o_orderkey").alias("first_order"),
        F.col("o_custkey").alias("c1"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = orders.select(
        F.col("o_orderkey").alias("followup_order"),
        F.col("o_custkey").alias("c2"),
        F.col("o_orderdate").alias("d2"),
    )
    return (
        o1.join(
            o2,
            (F.col("c1") == F.col("c2"))
            & (F.col("d2") > F.col("d1"))
            & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 30 DAYS"))
            & (F.col("first_order") != F.col("followup_order")),
        )
        .select(
            "first_order",
            "followup_order",
            F.datediff(F.col("d2"), F.col("d1")).cast("int").alias("gap_days"),
        )
    )


# --------------------------------------------------------------------------
# Exact median / quantiles (integral-valued measure -> exact doubles).
# --------------------------------------------------------------------------
@register(
    "q_exact_median",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           quantile_cont(l_quantity, 0.25) AS q25_qty,
           quantile_cont(l_quantity, 0.75) AS q75_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Exact median/quartiles over the integral quantity column "
        "(interpolation lands on exact halves, so doubles are "
        "deterministic across engines)."
    ),
    tags=("aggregation", "percentile"),
)
def q_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q25_qty"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75_qty"),
    )


# --------------------------------------------------------------------------
# As-of join.
# --------------------------------------------------------------------------
@register(
    "q_asof_signup_before_purchase",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT max(s.event_id) FROM events s
            WHERE s.user_id = e.user_id
              AND s.event_type = 'signup'
              AND s.event_id < e.event_id) AS signup_id
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
    doc=(
        "As-of join: each purchase matched to the latest strictly-prior "
        "signup of the same user (union + ordered window, no pandas)."
    ),
    tags=("join", "asof"),
)
def q_asof_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("event_id").alias("signup_event_id")
    )
    out = asof_join(
        purchases,
        signups,
        on="user_id",
        left_order="event_id",
        right_order="signup_event_id",
        right_value_cols=["signup_event_id"],
        strict=True,
        suffix="",
    )
    return out.select(
        "event_id", "user_id", F.col("signup_event_id").alias("signup_id")
    )


# --------------------------------------------------------------------------
# Pivot.
# --------------------------------------------------------------------------
_EVENT_TYPES = ["click", "purchase", "error", "signup", "view"]


@register(
    "q_pivot_event_counts",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
    doc="Pivot: per-user event-type count matrix (explicit value list).",
    tags=("pivot",),
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)).cast("bigint"))
    )
    return pivoted.na.fill(0, _EVENT_TYPES)


# --------------------------------------------------------------------------
# Sessionization.
# --------------------------------------------------------------------------
@register(
    "q_sessionize_30min",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    doc="Sessionization (30 min gap): lag + conditional cumsum, batch analog of session_window.",
    tags=("window", "sessionize"),
)
def q_sessionize_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    with_sessions = sessionize(
        events, key_col="user_id", ts_col="ts", gap_seconds=1800, order_tiebreak="event_id"
    )
    return with_sessions.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Set operations, bag (ALL) semantics.
# --------------------------------------------------------------------------
@register(
    "q_set_ops_all_semantics",
    oracle="""
    SELECT c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    )
    EXCEPT ALL
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc=(
        "Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity "
        "preserved, unlike the distinct variants in q_set_ops_custkeys."
    ),
    tags=("setops",),
)
def q_set_ops_all_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    big_cust = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    urgent_cust = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return open_cust.intersectAll(big_cust).exceptAll(urgent_cust)


# --------------------------------------------------------------------------
# Array aggregation + array scalar functions.
# --------------------------------------------------------------------------
@register(
    "q_array_agg_events",
    oracle="""
    SELECT user_id,
           array_to_string(list(event_id ORDER BY event_id), '-') AS event_ids,
           CAST(len(list(event_id ORDER BY event_id)) AS INTEGER) AS n,
           list(event_id ORDER BY event_id)[1] AS first_id,
           list_contains(list(event_id ORDER BY event_id), 1) AS has_id_1
    FROM (SELECT user_id, event_id FROM events WHERE event_type = 'purchase')
    GROUP BY user_id
    """,
    doc=(
        "Array aggregation: per-user sorted id list + array scalar "
        "functions (size/element_at/contains). Sorted so the array value "
        "is deterministic under any partitioning; shipped joined as a "
        "string because array-typed result columns are hostile to "
        "generic result hashers."
    ),
    tags=("aggregation", "array"),
)
def q_array_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    ids = F.sort_array(F.collect_list("event_id"))
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.concat_ws("-", ids.cast("array<string>")).alias("event_ids"),
            F.size(ids).cast("int").alias("n"),
            F.element_at(ids, 1).alias("first_id"),
            F.array_contains(ids, F.lit(1)).alias("has_id_1"),
        )
    )


# --------------------------------------------------------------------------
# Date arithmetic.
# --------------------------------------------------------------------------
@register(
    "q_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_epoch_start,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
           CAST(EXTRACT(DOW FROM o_orderdate) AS INTEGER) AS order_dow
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    """,
    doc="Date/interval arithmetic: datediff, interval add, quarter/dow parts.",
    tags=("scalar", "date"),
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        )
        .cast("int")
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB DOW: 0=Sunday..6.
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
    )


# --------------------------------------------------------------------------
# Tumbling event-time window (the batch form of the streaming window agg;
# tests/test_streaming.py drives the same expression as a stream).
# --------------------------------------------------------------------------
@register(
    "q_tumbling_window_events",
    oracle="""
    SELECT date_trunc('day', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Tumbling 1-day event-time window aggregation via F.window — "
        "identical expression works under readStream + watermark."
    ),
    tags=("window", "streaming-window", "aggregation"),
)
def q_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("sum_v"),
        )
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n", "sum_v"
        )
    )


# --------------------------------------------------------------------------
# Dual-alias dimension join (TPC-H Q7 shape): the same dim table joined
# twice under different roles, with an OR'd pair condition.
# --------------------------------------------------------------------------
@register(
    "q7_nation_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
           {money_sum_sql("CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4))")} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3')
        OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q7 shape: nation joined twice (supplier side + customer "
        "side) with a symmetric OR pair filter, grouped by year."
    ),
    tags=("join", "aggregation"),
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, supplier, orders, lineitem = _t(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_9")
                & (F.col("cust_nation") == "NATION_3")
            )
            | (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_9")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(money_sum(rev).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Conditional-sum ratio (TPC-H Q14 shape): promo revenue share.
# --------------------------------------------------------------------------
@register(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(ROUND(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l.l_discount AS DECIMAL(8,4))
                     ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l.l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
           * 100.0 AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14 shape: conditional decimal sums -> exact doubles -> "
        "one deterministic ratio (single global aggregate row)."
    ),
    tags=("join", "aggregation", "ratio"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                money_sum(promo_rev) / money_sum(rev) * F.lit(100.0)
            ).alias("promo_pct")
        )
    )


# --------------------------------------------------------------------------
# Outer joins + null semantics.
# --------------------------------------------------------------------------
@register(
    "q_left_outer_order_counts",
    oracle=f"""
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_pending,
           {money_sum_sql("CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(12,2))")} AS pending_value
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc=(
        "Left outer join preserving unmatched customers (n_pending = 0) "
        "with COALESCE null handling in the aggregate."
    ),
    tags=("join", "outer"),
)
def q_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return (
        customer.join(
            pending, pending.o_custkey == customer.c_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").cast("bigint").alias("n_pending"),
            money_sum(
                F.coalesce(F.col("o_totalprice"), F.lit(0)).cast("decimal(12,2)")
            ).alias("pending_value"),
        )
    )


@register(
    "q_full_outer_reconcile",
    oracle="""
    WITH buyers AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    erring AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT COALESCE(b.user_id, e.user_id) AS user_id,
           COALESCE(b.n_purchases, 0) AS n_purchases,
           COALESCE(e.n_errors, 0) AS n_errors,
           (b.user_id IS NULL OR e.user_id IS NULL) AS one_sided
    FROM buyers b FULL OUTER JOIN erring e ON b.user_id = e.user_id
    """,
    doc="Full outer join reconciling two aggregate sides with COALESCE.",
    tags=("join", "outer"),
)
def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    buyers = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("b_uid"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    )
    erring = (
        events.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("e_uid"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_errors"))
    )
    return buyers.join(
        erring, buyers.b_uid == erring.e_uid, "full_outer"
    ).select(
        F.coalesce(F.col("b_uid"), F.col("e_uid")).alias("user_id"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).cast("bigint").alias("n_purchases"),
        F.coalesce(F.col("n_errors"), F.lit(0)).cast("bigint").alias("n_errors"),
        (F.col("b_uid").isNull() | F.col("e_uid").isNull()).alias("one_sided"),
    )


# --------------------------------------------------------------------------
# HAVING (post-aggregation filter) + top-k, TPC-H Q18 shape.
# --------------------------------------------------------------------------
@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING SUM(l.l_quantity) > 180
    ORDER BY total_qty DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: join -> agg -> HAVING -> deterministic top-20.",
    tags=("join", "aggregation", "having", "topk"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Skew handling: salted two-phase aggregation over a hot grouping key.
# --------------------------------------------------------------------------
@register(
    "q_salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v,
           MIN(value) AS min_v,
           MAX(value) AS max_v
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Skew-safe aggregation over a 5-value hot key: salt spreads each "
        "key across 16 partial reducers, then partials re-combine — "
        "results identical to the plain GROUP BY (the oracle)."
    ),
    tags=("aggregation", "skew"),
)
def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.skew import salted_agg

    (events,) = _t(spark, sf_dir, "events")
    return salted_agg(
        events.select(
            "event_type", F.col("value"), F.floor("value").cast("bigint").alias("_fv")
        ),
        key_cols=["event_type"],
        aggs={
            "n": ("event_type", "count"),
            "sum_v": ("_fv", "sum"),
            "min_v": ("value", "min"),
            "max_v": ("value", "max"),
        },
        buckets=16,
    )


# --------------------------------------------------------------------------
# Sliding event-time window: each event lands in size/slide windows.
# --------------------------------------------------------------------------
@register(
    "q_sliding_window_events",
    oracle="""
    WITH shifted AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(floor((epoch(ts) - 0) / 3600) * 3600 + 0 AS BIGINT)) AS window_start,
               value FROM events
        UNION ALL
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + to_seconds(CAST(floor((epoch(ts) - 1800) / 3600) * 3600 + 1800 AS BIGINT)) AS window_start,
               value FROM events
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v
    FROM shifted
    GROUP BY window_start
    """,
    doc=(
        "Sliding window (1h size, 30m slide): every event belongs to 2 "
        "overlapping windows; oracle models the slide as 2 shifted "
        "tumbling bucketings."
    ),
    tags=("window", "streaming-window", "aggregation"),
)
def q_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.floor("value").cast("bigint")).cast("bigint").alias("sum_v"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "sum_v")
    )


# --------------------------------------------------------------------------
# Native session windows (the built-in twin of operators/windows.py's
# lag+cumsum sessionize; both are checked against the same gap logic).
# --------------------------------------------------------------------------
@register(
    "q_session_window_native",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               -- >= (not >): session_window is end-exclusive, so an event
               -- exactly at the previous session's end starts a new one.
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
    doc=(
        "Built-in session_window (30 min gap) per user; oracle derives "
        "the same sessions from the lag+cumsum closed form."
    ),
    tags=("window", "sessionize", "streaming-window"),
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Unpivot (wide -> long).
# --------------------------------------------------------------------------
@register(
    "q_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    """,
    doc="Unpivot wide part metrics into (metric, value) long form.",
    tags=("unpivot",),
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# Approximate aggregates (sketches). Estimates are implementation-
# specific, hence rows-only — the exact twins are oracled in
# q_distinct_aggregates.
# --------------------------------------------------------------------------
@register(
    "q_approx_aggregates",
    oracle=None,
    doc=(
        "Sketch aggregates: HLL++ approx_count_distinct + approximate "
        "percentiles per return flag (the at-scale substitutes for "
        "exact distinct counts and exact medians)."
    ),
    tags=("aggregation", "approx"),
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # Scalar quantile columns, not one array column: array-typed result
    # cells break the driver's pandas-based hasher (CLAUDE.md parity rule).
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        q.getItem(0).alias("price_p50"),
        q.getItem(1).alias("price_p95"),
        q.getItem(2).alias("price_p99"),
    )


@register(
    "q_approx_aggregates_bounds",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
           TRUE AS hll_parts_ok, TRUE AS hll_suppliers_ok,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Oracled invariant companion of q_approx_aggregates: per return "
        "flag, the EXACT distinct counts (hash-matched against SQL) plus "
        "boolean certificates that each sketch estimate sits inside its "
        "published error bound — HLL++ within 15% relative error (3x the "
        "default rsd=0.05), percentile_approx within rank error n/10000 "
        "(its accuracy parameter) + 1. The oracle emits TRUE literals: a "
        "sketch regression flips a boolean and the hash goes red."
    ),
    bench=False,  # correctness companion; perf is measured on the parent
    tags=("aggregation", "approx", "companion"),
)
def q_approx_aggregates_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    est = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_parts_est"),
        F.approx_count_distinct("l_suppkey").alias("_supp_est"),
        q.alias("_q"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.count(F.lit(1)).alias("_n"),
    )
    # Rank positions of each percentile estimate: one more pass over
    # lineitem joined to the (5-row, broadcast) estimates.
    cnts = (
        lineitem.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(est.select("l_returnflag", "_q")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.sum(
                    F.when(F.col("l_extendedprice") < F.col("_q")[i], 1).otherwise(0)
                ).alias(f"_lt{i}")
                for i in range(3)
            ],
            *[
                F.sum(
                    F.when(F.col("l_extendedprice") <= F.col("_q")[i], 1).otherwise(0)
                ).alias(f"_le{i}")
                for i in range(3)
            ],
        )
    )

    def _pct_ok(i: int, frac: float):
        # percentile_approx(accuracy=A) guarantees rank error <= n/A;
        # the estimate's true rank interval [count(<v), count(<=v)]
        # must overlap [n*q - n/A, n*q + n/A] (+1 for boundary ties).
        eps = F.col("_n").cast("double") / F.lit(10000.0) + F.lit(1.0)
        target = F.col("_n").cast("double") * F.lit(frac)
        return (F.col(f"_lt{i}").cast("double") <= target + eps) & (
            F.col(f"_le{i}").cast("double") >= target - eps
        )

    def _rel_ok(est_col: str, exact_col: str):
        return (
            F.abs(F.col(est_col).cast("double") - F.col(exact_col).cast("double"))
            <= F.lit(0.15) * F.col(exact_col).cast("double")
        )

    return est.join(cnts, "l_returnflag").select(
        "l_returnflag",
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        F.col("exact_suppliers").cast("bigint").alias("exact_suppliers"),
        _rel_ok("_parts_est", "exact_parts").alias("hll_parts_ok"),
        _rel_ok("_supp_est", "exact_suppliers").alias("hll_suppliers_ok"),
        _pct_ok(0, 0.5).alias("p50_ok"),
        _pct_ok(1, 0.95).alias("p95_ok"),
        _pct_ok(2, 0.99).alias("p99_ok"),
    )


# --------------------------------------------------------------------------
# Grouped-map pandas UDF (the batch escape hatch, oracle-checked).
# --------------------------------------------------------------------------
@register(
    "q_grouped_pandas_zscore",
    oracle="""
    WITH g AS (
        SELECT user_id,
               quantile_cont(floor(value), 0.5) AS med,
               quantile_cont(floor(value), 0.75) - quantile_cont(floor(value), 0.25) AS iqr
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           CAST(floor(e.value) AS BIGINT) AS v_int,
           (floor(e.value) - g.med) / (1.0 + g.iqr) AS robust_z
    FROM events e JOIN g ON e.user_id = g.user_id
    """,
    doc=(
        "Grouped-map applyInPandas: per-user robust z-score on the "
        "floored value (exact-half quantiles keep the Python-UDF result "
        "bit-comparable to SQL quantile_cont)."
    ),
    tags=("udf", "pandas", "window"),
)
def q_grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        grouped_robust_zscore,
    )

    (events,) = _t(spark, sf_dir, "events")
    return grouped_robust_zscore(
        events, key_col="user_id", value_col="value", id_col="event_id"
    )


# --------------------------------------------------------------------------
# Correlated-subquery shape: value above per-group average.
# --------------------------------------------------------------------------
@register(
    "q_above_nation_avg_balance",
    oracle="""
    WITH nation_avg AS (
        SELECT c_nationkey,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_bal
        FROM customer
        GROUP BY c_nationkey
    )
    SELECT c.c_custkey
    FROM customer c
    JOIN nation_avg a ON c.c_nationkey = a.c_nationkey
    WHERE c.c_acctbal > a.avg_bal
    """,
    doc=(
        "Correlated-subquery pattern decorrelated to agg + broadcast join: "
        "customers above their nation's average balance."
    ),
    tags=("join", "subquery", "aggregation"),
)
def q_above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, "customer", sf_dir)
    nation_avg = customer.groupBy("c_nationkey").agg(
        (money_sum(dec("c_acctbal")) / F.count(F.lit(1)).cast("double")).alias(
            "avg_bal"
        )
    )
    return (
        customer.alias("c")
        .join(
            F.broadcast(nation_avg.alias("a")),
            F.col("c.c_nationkey") == F.col("a.c_nationkey"),
        )
        .filter(F.col("c.c_acctbal") > F.col("a.avg_bal"))
        .select(F.col("c.c_custkey").alias("c_custkey"))
    )


# --------------------------------------------------------------------------
# Correlated-subquery decorrelation shapes (TPC-H Q17 / Q21 / Q22).
# --------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH b AS (
        SELECT l.l_extendedprice,
               CAST(floor(l.l_quantity) AS BIGINT) AS qty,
               CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT))
                    OVER (PARTITION BY l.l_partkey) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) OVER (PARTITION BY l.l_partkey) AS BIGINT) AS cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13'
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM b
    WHERE 5 * qty * cnt < sum_qty
    """,
    doc=(
        "TPC-H Q17 shape: revenue from small-quantity orders — lines "
        "whose quantity is below 20% of the per-part average. The "
        "correlated scalar subquery (avg per part) is decorrelated into "
        "a window aggregate over the brand-filtered lines: one shuffle "
        "on l_partkey, no self-join back. The 0.2*avg comparison is "
        "cross-multiplied to exact integers (5*qty*cnt < sum_qty) so no "
        "double division enters the predicate. Part (after the brand "
        "filter, ~4% of a fixed-cardinality dim) is broadcast."
    ),
    tags=("subquery", "window", "join", "aggregation"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    brand_parts = part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    w = Window.partitionBy("l_partkey")
    b = (
        lineitem.join(
            F.broadcast(brand_parts),
            lineitem["l_partkey"] == brand_parts["p_partkey"],
        )
        .select(
            "l_extendedprice",
            F.floor("l_quantity").cast("bigint").alias("qty"),
            "l_partkey",
        )
        .withColumn("sum_qty", F.sum("qty").over(w).cast("bigint"))
        .withColumn("cnt", F.count(F.lit(1)).over(w).cast("bigint"))
    )
    return b.filter(
        F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    ).agg(
        (money_sum(dec("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


_Q21_SQL = """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1
          FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@register(
    "q21_waiting_supplier",
    oracle=_Q21_SQL,
    doc=(
        "TPC-H Q21 shape (suppliers who kept finished orders waiting): "
        "correlated EXISTS (another supplier contributed to the order) "
        "plus correlated NOT EXISTS (no other supplier shipped late), "
        "late meaning shipped >60 days after the order date — the "
        "reference's lineitem has no commit/receipt dates, so lateness "
        "is derived from orderdate. Written as literal SQL with the "
        "subqueries left correlated: Catalyst decorrelates them into a "
        "left-semi and a left-anti join on l_orderkey (equality-only "
        "correlation, so both rewrite cleanly). Unique s_name breaks "
        "the top-20 tie."
    ),
    tags=("subquery", "join", "sql", "topk"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(ROUND(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))), 2)
                        AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
            FROM customer c2
            WHERE c2.c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 300000.0
          )
    GROUP BY c.c_mktsegment
"""


@register(
    "q22_global_sales_opportunity",
    oracle=_Q22_SQL,
    doc=(
        "TPC-H Q22 shape: rich customers who never placed a HIGH-VALUE "
        "order (>300k), grouped by market segment. Combines an "
        "uncorrelated scalar subquery (the positive-balance average, "
        "computed exactly: decimal sum -> round -> one double division) "
        "with a correlated NOT EXISTS anti-join on filtered orders. "
        "Catalyst turns the scalar subquery into a broadcast single-row "
        "join and the NOT EXISTS into a left-anti shuffle join on "
        "o_custkey. The literal no-orders-at-all predicate of TPC-H is "
        "vacuous on this testdata (every customer has orders at "
        "sf<=0.01), which made the round-5 hash green an empty-vs-empty "
        "no-op — caught by tests/test_nonvacuous.py in round 7; the "
        "price bound keeps the anti-join discriminating at every SF "
        "(1/14/132 rows at sf 0.001/0.01/0.1)."
    ),
    tags=("subquery", "join", "sql", "aggregation"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(_Q22_SQL)


# --------------------------------------------------------------------------
# Exact statistical moments: variance / stddev / covariance / correlation
# from integer power sums — no Welford drift, no partial-agg order
# dependence.
# --------------------------------------------------------------------------
@register(
    "q_exact_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)
                        * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT))
                    AS BIGINT) AS sy,
               CAST(SUM(CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT)
                        * CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT))
                    AS BIGINT) AS syy,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)
                        * CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT))
                    AS BIGINT) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_qty,
           sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std_qty,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_qty_disc,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_disc
    FROM s
    """,
    doc=(
        "Population variance / stddev / covariance / correlation per "
        "return flag, computed from exact integer power sums (quantity "
        "as units, discount as DECIMAL-exact basis points): the power "
        "sums are bigint-exact and order-independent, and the final "
        "moments are derived in one identical rational expression per "
        "engine — every double op (+,-,*,/,sqrt) is IEEE "
        "correctly-rounded, so results are bit-equal regardless of "
        "partitioning. Built-in var_pop/corr would NOT survive this "
        "comparison: their streaming (Welford) update order differs "
        "between engines and across partition counts. One hash "
        "aggregate, fully codegen'd, no shuffle beyond the groupBy."
    ),
    tags=("aggregation", "statistics"),
)
def q_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    qty = F.floor("l_quantity").cast("bigint")
    bps = (dec("l_discount", 8, 4) * 10000).cast("bigint")
    s = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(qty).cast("bigint").alias("sx"),
        F.sum(qty * qty).cast("bigint").alias("sxx"),
        F.sum(bps).cast("bigint").alias("sy"),
        F.sum(bps * bps).cast("bigint").alias("syy"),
        F.sum(qty * bps).cast("bigint").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_qty = (n * sxx - sx * sx) / (n * n)
    return s.select(
        "l_returnflag",
        "n",
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("std_qty"),
        ((n * sxy - sx * sy) / (n * n)).alias("covar_qty_disc"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_qty_disc"),
    )


# --------------------------------------------------------------------------
# SCD2 effective-dating: lead/first_value/last_value analytic windows.
# --------------------------------------------------------------------------
@register(
    "q_scd2_order_status",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderstatus,
           o_orderdate AS valid_from,
           COALESCE(lead(o_orderdate) OVER w,
                    TIMESTAMP '2199-12-31 00:00:00') AS valid_to,
           CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL
                THEN 1 ELSE 0 END AS INTEGER) AS is_current,
           first_value(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_order_date,
           last_value(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc=(
        "SCD2 (slowly-changing-dimension type 2) effective-dating over "
        "the order history: each order's status is valid from its order "
        "date until the customer's next order (lead), the open-ended "
        "row is flagged current and closed with the conventional "
        "high-date sentinel (2199-12-31; NULL timestamps in result "
        "columns are avoided engine-wide because NaT representations "
        "differ across Arrow/pandas datetime units), and "
        "first_value/last_value with an "
        "explicit unbounded ROWS frame give the partition extremes "
        "(default frames for last_value stop at CURRENT ROW — the "
        "explicit frame is load-bearing in both engines). All windows "
        "share one (o_custkey, o_orderdate, o_orderkey) sort, so the "
        "plan is a single shuffle + single Window node; (o_orderdate, "
        "o_orderkey) is a total order within customer."
    ),
    tags=("window", "scd2", "analytic"),
)
def q_scd2_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("2199-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
        F.when(F.lead("o_orderdate").over(w).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
        F.first("o_orderdate").over(wfull).alias("first_order_date"),
        F.last("o_orderdate").over(wfull).alias("last_order_date"),
    )


# --------------------------------------------------------------------------
# Deterministic PageRank over the part co-purchase graph.
# --------------------------------------------------------------------------
def _pagerank_oracle(iterations: int = 5) -> str:
    head = """
    WITH edges AS (
        SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
        FROM lineitem l1
        JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey <> l2.l_partkey
    ), deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
    ), nodes AS (
        SELECT p_partkey AS nid FROM part
    ), params AS (
        SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS init,
               CAST((15 * (1000000000000 // COUNT(*))) // 100 AS BIGINT) AS tp
        FROM nodes
    ), r0 AS (
        SELECT nid, (SELECT init FROM params) AS rank_fp FROM nodes
    )"""
    step = """, r{i} AS (
        SELECT n.nid,
               CAST((SELECT tp FROM params)
                    + COALESCE(s.incoming, 0) AS BIGINT) AS rank_fp
        FROM nodes n
        LEFT JOIN (
            SELECT e.dst AS nid,
                   CAST(SUM((85 * r.rank_fp) // (100 * d.deg)) AS BIGINT)
                       AS incoming
            FROM r{p} r
            JOIN edges e ON r.nid = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ) s ON n.nid = s.nid
    )"""
    body = "".join(step.format(i=i + 1, p=i) for i in range(iterations))
    return (
        head
        + body
        + f"\n    SELECT nid AS p_partkey, rank_fp FROM r{iterations}"
    )


@register(
    "q_pagerank_parts",
    oracle=_pagerank_oracle(5),
    doc=(
        "Deterministic fixed-point PageRank (5 rounds, damping 0.85) "
        "over the part co-purchase graph: directed-both-ways distinct "
        "edges between parts sharing an order. Ranks are BIGINTs at "
        "scale 1e12 and each edge contribution is an exact integer "
        "division, so iteration results are bit-reproducible under any "
        "partitioning and the oracle is the same recurrence unrolled "
        "into five CTEs. Per round: one equi-join on src + one groupBy "
        "on dst (the canonical large-graph PageRank shape); lineage is "
        "localCheckpoint-truncated per round. Isolated parts keep the "
        "teleport share; dangling mass is dropped identically in both "
        "engines. See operators/graph.py."
    ),
    tags=("graph", "iterative", "join", "aggregation"),
)
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.graph import (
        pagerank_fixed_point,
    )

    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    li = lineitem.select("l_orderkey", "l_partkey")
    # Co-purchase pairs via collect_set + double explode: one shuffle of
    # lineitem instead of a self-join's two, then the cross-order
    # distinct. Safe because order size is bounded (TPC-H: <= 7 items),
    # so the per-group set and its pair expansion are O(1) per order —
    # no skew at any scale factor. Measured ~2x faster than the
    # equivalent self-join at sf0.1 with the identical edge set.
    #
    # One exchange serves dedupe AND degree: hash(src) satisfies the
    # (src, dst) dedupe clustering (partitioning on a subset of the
    # grouping keys still co-locates groups), and it is exactly the
    # partitioning pagerank's per-iteration window/join want — so the
    # repartition replaces distinct's (src, dst) exchange plus the
    # degree window's src exchange with a single shuffle. Measured
    # ~2.5x faster than distinct-then-window at sf0.1, identical edges.
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        sets.select(F.explode("ps").alias("src"), F.col("ps"))
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition(F.col("src"))
        .dropDuplicates(["src", "dst"])
    )
    nodes = part.select(F.col("p_partkey").alias("id"))
    ranks = pagerank_fixed_point(edges, nodes, iterations=5)
    return ranks.select(F.col("id").alias("p_partkey"), "rank_fp")


# --------------------------------------------------------------------------
# LATERAL correlated subquery (per-row dependent top-N).
# --------------------------------------------------------------------------
_LATERAL_SQL = """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l
"""


@register(
    "q_lateral_topn_orders",
    oracle=_LATERAL_SQL,
    doc=(
        "LATERAL correlated subquery: each customer's two largest "
        "orders, expressed as a per-row dependent subquery with ORDER "
        "BY + LIMIT (the SQL:2016 lateral-join surface, Spark >= 3.2). "
        "Catalyst decorrelates the correlated LIMIT into a "
        "WindowGroupLimit (partial before the shuffle, final after) + "
        "row_number filter + broadcast join — the same physical shape "
        "as the hand-written q_topk_orders_per_customer, derived "
        "automatically. o_orderkey breaks price ties for a total order."
    ),
    tags=("subquery", "sql", "lateral", "topk"),
)
def q_lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------------
# Time-series gap fill + last-observation-carried-forward.
# --------------------------------------------------------------------------
@register(
    "q_timeseries_locf",
    oracle="""
    WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ), daily AS (
        SELECT user_id, day, value FROM obs WHERE rn = 1
    ), bounds AS (
        SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM events
    ), grid AS (
        SELECT u.user_id, CAST(g.day AS DATE) AS day
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM bounds
        ) g
    )
    SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
           last_value(d.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           CAST(CASE WHEN d.value IS NULL THEN 0 ELSE 1 END AS INTEGER)
               AS is_observed
    FROM grid g
    LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    """,
    doc=(
        "Time-series regularization: build the dense (user x day) grid "
        "with sequence()+explode, left-join each user's last "
        "observation per day (row_number over (ts, event_id) desc — a "
        "total order), then gap-fill by last-observation-carried-"
        "forward via last(value, ignorenulls) over a running frame. "
        "The observed value is carried verbatim (no arithmetic), so "
        "parity is exact. The grid is |users| x |days| — generated, "
        "never shuffled wider than the one window sort; the LOCF "
        "window shares the join's (user_id) partitioning."
    ),
    tags=("window", "timeseries", "array", "join"),
)
def q_timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    daily = (
        events.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "value",
            F.row_number()
            .over(
                Window.partitionBy("user_id", F.to_date("ts")).orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    bounds = events.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    grid = (
        events.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.last("value", ignorenulls=True).over(w).alias("filled_value"),
            F.when(F.col("value").isNull(), 0)
            .otherwise(1)
            .cast("int")
            .alias("is_observed"),
        )
    )


# --------------------------------------------------------------------------
# Product-analytics shapes: funnel, retention cohorts, CDC merge.
# --------------------------------------------------------------------------
@register(
    "q_event_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_signup) AS BIGINT) AS step_signup,
           CAST(COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS BIGINT)
               AS step_click,
           CAST(COUNT(CASE WHEN t_purchase > t_click
                            AND t_click > t_signup THEN 1 END) AS BIGINT)
               AS step_purchase
    FROM per_user
    """,
    doc=(
        "Ordered event funnel (signup -> first click after signup -> "
        "first purchase after that click): one conditional-min hash "
        "aggregate per user, then one global rollup — two shuffles "
        "total, no self-joins, the standard large-scale funnel shape. "
        "Strict event-time ordering between steps; all outputs exact "
        "counts."
    ),
    tags=("aggregation", "analytics", "funnel"),
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t_signup").cast("bigint").alias("step_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1))
        .cast("bigint")
        .alias("step_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        )
        .cast("bigint")
        .alias("step_purchase"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
        FROM events
        GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_week,
               CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS active_week
        FROM events e
        JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week,
           CAST(active_week - cohort_week AS BIGINT) AS weeks_since,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY cohort_week, active_week
    """,
    doc=(
        "Retention cohort matrix: users bucketed by first-seen epoch "
        "week, counted once per (cohort, active week). Epoch-week "
        "bucketing (floor(epoch/604800)) is timezone-free and integer-"
        "exact in both engines. Shape: per-user min agg, broadcast-"
        "joinable first-seen dim back onto events, DISTINCT collapse, "
        "count — each stage shuffles on user_id or the final "
        "(cohort, week) pair only."
    ),
    tags=("aggregation", "analytics", "cohort", "join"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("bigint")  # noqa: E731
    first_seen = events.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            week(F.col("ts")).alias("active_week"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "active_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users")
    ).select(
        "cohort_week",
        (F.col("active_week") - F.col("cohort_week"))
        .cast("bigint")
        .alias("weeks_since"),
        "active_users",
    )


@register(
    "q_cdc_merge_snapshot",
    oracle="""
    WITH base AS (
        SELECT user_id, value AS latest_value, event_id AS latest_seq
        FROM (
            SELECT user_id, value, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY event_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS cnt
            FROM events
        ) WHERE rn = cnt - 5
    ), updates AS (
        SELECT user_id, value AS latest_value, event_id AS latest_seq
        FROM (
            SELECT user_id, value, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn <= 5
    )
    SELECT COALESCE(u.user_id, b.user_id) AS user_id,
           CASE WHEN u.user_id IS NULL OR (b.user_id IS NOT NULL
                     AND b.latest_seq > u.max_seq)
                THEN b.latest_value ELSE u.latest_value END AS latest_value,
           CASE WHEN u.user_id IS NULL OR (b.user_id IS NOT NULL
                     AND b.latest_seq > u.max_seq)
                THEN b.latest_seq ELSE u.max_seq END AS latest_seq
    FROM base b
    FULL OUTER JOIN (
        SELECT user_id,
               max(latest_seq) AS max_seq,
               max_by(latest_value, latest_seq) AS latest_value
        FROM updates GROUP BY user_id
    ) u ON b.user_id = u.user_id
    """,
    doc=(
        "CDC merge (MERGE INTO semantics on plain DataFrames): a base "
        "snapshot (state as of each user's 6th-last event) merged with "
        "a changelog batch (each user's last 5 events, conflated to "
        "latest-per-key first — the upsert rule), via full-outer join + "
        "newest-sequence-wins resolution. This is how an engine without "
        "a table format applies a Kafka-compacted-topic backlog onto a "
        "warehouse snapshot; at scale both sides shuffle once on the "
        "merge key and the changelog conflation collapses map-side."
    ),
    tags=("join", "cdc", "upsert", "window"),
)
def q_cdc_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w_asc = Window.partitionBy("user_id").orderBy("event_id")
    w_desc = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    numbered = events.select(
        "user_id",
        F.col("value"),
        "event_id",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.row_number().over(w_desc).alias("rn_desc"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("cnt"),
    )
    base = numbered.filter(
        (F.col("rn_asc") == F.col("cnt") - 5)
    ).select(
        "user_id",
        F.col("value").alias("b_value"),
        F.col("event_id").alias("b_seq"),
    )
    updates = (
        numbered.filter(F.col("rn_desc") <= 5)
        .groupBy("user_id")
        .agg(
            F.max("event_id").alias("u_seq"),
            F.max_by("value", "event_id").alias("u_value"),
        )
    )
    merged = base.alias("b").join(
        updates.alias("u"),
        F.col("b.user_id") == F.col("u.user_id"),
        "full_outer",
    )
    newer_base = F.col("u.user_id").isNull() | (
        F.col("b.user_id").isNotNull() & (F.col("b_seq") > F.col("u_seq"))
    )
    return merged.select(
        F.coalesce(F.col("u.user_id"), F.col("b.user_id")).alias("user_id"),
        F.when(newer_base, F.col("b_value"))
        .otherwise(F.col("u_value"))
        .alias("latest_value"),
        F.when(newer_base, F.col("b_seq"))
        .otherwise(F.col("u_seq"))
        .alias("latest_seq"),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — exactly oracle-able.
# --------------------------------------------------------------------------
_KMV_K = 256
_KMV_SPACE = float(1 << 60)  # hash space: 15 hex digits = 60 bits


@register(
    "q_approx_distinct_kmv",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT
               CAST(CONCAT('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM orders
    ),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K})
    SELECT CAST(COUNT(*) AS INTEGER) AS k_used,
           MAX(hv) AS kth_min_hash,
           CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE (CAST(COUNT(*) AS DOUBLE) - 1.0) * {_KMV_SPACE!r}
                     / CAST(MAX(hv) AS DOUBLE)
           END AS est_distinct,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM h) AS exact_distinct
    FROM k
    """,
    doc=(
        "Distinct-count sketch with a CELL-EXACT oracle: unlike HLL "
        "(whose register layout is engine-specific, forcing rows-only "
        "checks), the KMV estimator ((k-1) * space / k-th smallest "
        "hash) is pure arithmetic over an md5-derived 60-bit hash both "
        "engines compute identically. Scale shape: the distinct shuffles "
        "8-byte hashes with map-side combine, then ORDER BY + LIMIT k "
        "plans as TakeOrderedAndProject — a per-partition k-heap merged "
        "on the driver, never a global sort. exact_distinct is included "
        "for the error check; a production run would drop it. int64-to-"
        "double conversion and the one multiply/divide are IEEE-exact "
        "or identically rounded in both engines."
    ),
    tags=("sketch", "approx", "topk"),
)
def q_approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    h = orders.select(hv.alias("hv")).distinct()
    kmin = h.orderBy("hv").limit(_KMV_K)
    exact = h.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    est = (
        F.when(
            F.col("k_used") < _KMV_K, F.col("k_used").cast("double")
        ).otherwise(
            (F.col("k_used").cast("double") - F.lit(1.0))
            * F.lit(_KMV_SPACE)
            / F.col("kth_min_hash").cast("double")
        )
    )
    return (
        kmin.agg(
            F.count(F.lit(1)).cast("int").alias("k_used"),
            F.max("hv").alias("kth_min_hash"),
        )
        .withColumn("est_distinct", est)
        .crossJoin(F.broadcast(exact))
    )


# --------------------------------------------------------------------------
# Z-order (Morton) clustering: the write layout for multi-dim skipping.
# --------------------------------------------------------------------------
def _morton_terms_sql(x: str, y: str, bits: int, div: str) -> str:
    """Bit interleave via pure integer div/mod arithmetic — the same
    formula text works in any engine given its integer-division token."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_ZORDER_X = "CAST(o_custkey % 256 AS BIGINT)"
_ZORDER_Y = "CAST(floor(o_totalprice / 2000.0) % 256 AS BIGINT)"


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH d AS (
        SELECT {_ZORDER_X} AS zx, {_ZORDER_Y} AS zy FROM orders
    ),
    z AS (SELECT zx, zy, {_morton_terms_sql('zx', 'zy', 8, '//')} AS zval FROM d)
    SELECT CAST(zval // 1024 AS INTEGER) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zx) AS INTEGER) AS x_min,
           CAST(MAX(zx) AS INTEGER) AS x_max,
           CAST(MIN(zy) AS INTEGER) AS y_min,
           CAST(MAX(zy) AS INTEGER) AS y_max
    FROM z GROUP BY zval // 1024
    """,
    doc=(
        "Z-order (Morton-curve) clustering audit: interleave the low 8 "
        "bits of two dimensions (customer bucket x price band) into a "
        "16-bit z-value and group rows into 64 'files' of 1024 z-cells "
        "each, reporting every file's per-dimension min/max — exactly "
        "the zone-map footprint a scan planner prunes against. Because "
        "the curve keeps both dimensions local, every file bounds BOTH "
        "columns tightly (32x32 of the 256x256 space), where a sort by "
        "one column leaves the other's bounds at full range: this is "
        "the write-side layout that turns 2-predicate scans into "
        "partition skips at 100 TB. The interleave is integer div/mod "
        "arithmetic (engine-portable, codegen-friendly); the whole "
        "query is one scan + one 64-group aggregate."
    ),
    tags=("layout", "zorder", "scale"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    d = orders.select(
        F.expr(_ZORDER_X).alias("zx"), F.expr(_ZORDER_Y).alias("zy")
    )
    z = d.select(
        "zx", "zy", F.expr(_morton_terms_sql("zx", "zy", 8, "div")).alias("zval")
    )
    return (
        z.groupBy(F.expr("zval div 1024").cast("int").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("zx").cast("int").alias("x_min"),
            F.max("zx").cast("int").alias("x_max"),
            F.min("zy").cast("int").alias("y_min"),
            F.max("zy").cast("int").alias("y_max"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 analog: disjunctive (OR-of-ANDs) join predicate.
# --------------------------------------------------------------------------
_Q19_BRANCHES = (
    ("Brand#12", 1, 15, 1, 15),
    ("Brand#23", 10, 30, 10, 30),
    ("Brand#4", 20, 50, 25, 50),
)


def _q19_part_side_sql() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi})"
        for b, s_lo, s_hi, _, _ in _Q19_BRANCHES
    )


def _q19_full_sql() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l_quantity BETWEEN {q_lo} AND {q_hi})"
        for b, s_lo, s_hi, q_lo, q_hi in _Q19_BRANCHES
    )


@register(
    "q19_brand_size_revenue",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE {_q19_full_sql()}
    GROUP BY p_brand
    """,
    doc=(
        "TPC-H Q19's shape (reference has no such query — absent-"
        "category build-out): an OR-of-ANDs predicate that mixes "
        "columns from both join sides, the classic case engines "
        "historically ran as a post-join filter. The part-side "
        "implicate of the disjunction ((brand,size) branches OR'd) is "
        "factored out and applied BEFORE the join — sound because "
        "every disjunct implies it — and Catalyst additionally "
        "derives the lineitem-side quantity-range implicate on its "
        "own: the physical plan shows BOTH scans with the pushed "
        "OR-union of their side's bounds in PushedFilters (pinned in "
        "tests/test_plans.py), so each parquet scan prunes early "
        "instead of shipping unfiltered rows through the join. The "
        "exact three-branch predicate still runs post-join. Revenue "
        "follows the exact-decimal money contract (functions/money.py)."
    ),
    tags=("join", "aggregation", "filter", "sql"),
)
def q19_brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    part_side = F.expr(_q19_part_side_sql())
    full_pred = F.expr(_q19_full_sql())
    price = dec("l_extendedprice")
    disc_f = F.lit(1) - dec("l_discount", 8, 4)
    return (
        lineitem.join(part.filter(part_side), F.col("p_partkey") == F.col("l_partkey"))
        .filter(full_pred)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            money_sum(price * disc_f).alias("revenue"),
        )
    )


@register(
    "q_skew_salted_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           {money_sum_sql(
               "CAST(l_extendedprice AS DECIMAL(12,2))"
               " * CAST(1 - l_discount AS DECIMAL(8,4))"
           )} AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Skew-mitigated two-phase aggregation (manual salting): "
        "l_returnflag has only 3 values, so a naive groupBy lands ~1/3 "
        "of a 100 TB table on THREE reduce tasks. Phase 1 aggregates on "
        "(key, salt) — pmod(hash(l_orderkey), 64), data-derived and "
        "deterministic — spreading each hot key over 64 partials; "
        "phase 2 merges the 3*64 partial rows. All aggregates are "
        "decomposable and exact (bigint counts, decimal money sums), so "
        "the result is bit-identical to the one-phase oracle and "
        "independent of partitioning. This is the manual form of what "
        "AQE skew handling cannot do for aggregations (AQE splits "
        "skewed JOIN partitions, not skewed aggregation keys)."
    ),
    tags=("aggregation", "skew", "salting", "scale"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, "lineitem", sf_dir)
    price = dec("l_extendedprice")
    disc_f = F.lit(1) - dec("l_discount", 8, 4)
    partial = (
        lineitem.withColumn("_salt", F.pmod(F.hash("l_orderkey"), F.lit(64)))
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum(F.floor("l_quantity").cast("bigint")).alias("_qty"),
            # keep the EXACT decimal partial; round only after the final
            # merge (rounding partials would break associativity)
            F.sum(price * disc_f).alias("_rev"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_n").cast("bigint").alias("n_items"),
        F.sum("_qty").cast("bigint").alias("sum_qty"),
        F.round(F.sum("_rev"), 2).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Malformed-record ingest audit (round 7): PERMISSIVE parse accounting.
# --------------------------------------------------------------------------


@register(
    "q_json_bad_records_audit",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id % 7 <> 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_parsed,
           CAST(SUM(CASE WHEN event_id % 7 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           (CAST(SUM(CASE WHEN event_id % 7 = 3 THEN 1 ELSE 0 END)
                 AS BIGINT) * 1000000)
               // CAST(COUNT(*) AS BIGINT) AS corrupt_ppm,
           CAST(SUM(CASE WHEN event_id % 7 <> 3
                    THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
                    ELSE 0 END) AS BIGINT) AS sum_k_parsed
    FROM events GROUP BY event_type
    """,
    doc=(
        "Malformed-record ingest audit: the PERMISSIVE-mode parse "
        "accounting every production ingest needs — bad rows must be "
        "COUNTED AND QUARANTINED, never dropped silently and never a "
        "task failure. A deterministic subset of the JSON payloads "
        "(event_id % 7 == 3) is truncated mid-object before parsing; "
        "from_json with a _corrupt_record column then yields NULL "
        "fields plus the raw line for exactly those rows. The audit "
        "reports per type: rows, parsed, corrupt, exact integer-ppm "
        "corrupt rate, and the parsed-only aggregate (proving bad "
        "rows contribute no partial garbage). The oracle mirrors the "
        "corruption rule analytically, so the hash verifies the "
        "parser's good/bad split row-for-row. Scale shape: parse and "
        "corrupt-split run in the scan stage (no exchange before the "
        "per-type aggregate); at 100 TB the _corrupt_record column "
        "is what lands in the quarantine sink."
    ),
    tags=("json", "ingest", "quality"),
)
def q_json_bad_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    wire = events.select(
        "event_type",
        F.when(
            F.col("event_id") % 7 == 3,
            F.expr("substring(props, 1, length(props) - 1)"),
        )
        .otherwise(F.col("props"))
        .alias("line"),
    )
    parsed = wire.select(
        "event_type",
        F.from_json(
            F.col("line"),
            "k int, _corrupt_record string",
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec"),
    )
    is_corrupt = F.col("rec._corrupt_record").isNotNull()
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(~is_corrupt, 1).otherwise(0))
        .cast("bigint")
        .alias("n_parsed"),
        F.sum(F.when(is_corrupt, 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.expr(
            "(SUM(CASE WHEN rec._corrupt_record IS NOT NULL THEN 1 ELSE 0"
            " END) * 1000000) div COUNT(*)"
        ).alias("corrupt_ppm"),
        F.sum(F.when(~is_corrupt, F.col("rec.k")).otherwise(0))
        .cast("bigint")
        .alias("sum_k_parsed"),
    )


@register(
    "q_analytic_function_suite",
    oracle="""
    WITH w AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               nth_value(o_totalprice, 2) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS second_highest,
               nth_value(o_totalprice, 3) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice ASC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS third_lowest,
               cume_dist() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS cd,
               CAST(o_totalprice AS DECIMAL(12,2))
                 - CAST(lag(o_totalprice, 1, 0.0) OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_orderdate, o_orderkey)
                   AS DECIMAL(12,2)) AS delta,
               min(o_orderkey) OVER (
                   PARTITION BY o_orderpriority) AS first_key
        FROM orders
    )
    SELECT o_orderpriority,
           MAX(second_highest) AS second_highest,
           MAX(third_lowest) AS third_lowest,
           MAX(CASE WHEN o_orderkey = first_key THEN cd END)
               AS first_key_cume_dist,
           CAST(ROUND(SUM(abs(delta)), 2) AS DOUBLE) AS sum_abs_delta
    FROM w GROUP BY o_orderpriority
    """,
    doc=(
        "Analytic-function completeness: nth_value over full frames "
        "(2nd-highest / 3rd-lowest price per priority), cume_dist "
        "(the earliest order's position in its group's price "
        "distribution — an int/int ratio, IEEE-exact), and "
        "lag-with-default feeding an order-over-time delta chain "
        "whose absolute deltas sum in exact DECIMAL before the one "
        "rounded double conversion (the money rule — a raw double "
        "sum would be partial-agg-order dependent). All five window "
        "specs share the hash(o_orderpriority) exchange; the final "
        "per-group fold reuses it — one exchange end to end, "
        "plan-pinned. Ties broken by o_orderkey everywhere (total "
        "order rule)."
    ),
    tags=("window", "analytic"),
)
def q_analytic_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w_desc = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_asc = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_cume = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_time = Window.partitionBy("o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_grp = Window.partitionBy("o_orderpriority")
    w = orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w_desc).alias("second_highest"),
        F.nth_value("o_totalprice", 3).over(w_asc).alias("third_lowest"),
        F.cume_dist().over(w_cume).alias("cd"),
        (
            F.col("o_totalprice").cast("decimal(12,2)")
            - F.lag("o_totalprice", 1, 0.0)
            .over(w_time)
            .cast("decimal(12,2)")
        ).alias("delta"),
        F.min("o_orderkey").over(w_grp).alias("first_key"),
    )
    return w.groupBy("o_orderpriority").agg(
        F.max("second_highest").alias("second_highest"),
        F.max("third_lowest").alias("third_lowest"),
        F.max(
            F.when(F.col("o_orderkey") == F.col("first_key"), F.col("cd"))
        ).alias("first_key_cume_dist"),
        F.round(F.sum(F.abs(F.col("delta"))), 2)
        .cast("double")
        .alias("sum_abs_delta"),
    )


@register(
    "q_variant_semistructured",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid,
           CAST(ROUND(SUM(CAST(value * 2 AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS sum_val2,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS max_k
    FROM events GROUP BY event_type
    """,
    doc=(
        "Spark 4 VARIANT (open semi-structured type): each event row "
        "serializes to a nested JSON document (object + array + "
        "numeric leaves), parses into a VARIANT via parse_json, and "
        "the aggregate reads typed paths back out with variant_get "
        "('$.meta.uid' as long, '$.vals[1]' as double, '$.k' as "
        "int). The oracle computes the same aggregates DIRECTLY from "
        "the source columns, so any shredding/extraction defect — "
        "path resolution, type coercion, double round-trip — breaks "
        "the hash (to_json/parse_json double round-trips are "
        "shortest-repr exact). The extracted double sums through the "
        "exact-decimal money path. VARIANT is the engine's "
        "schema-on-read answer for mixed-shape event lakes: the "
        "binary encoding shreds once at ingest and typed paths read "
        "without re-parsing text per query."
    ),
    tags=("json", "variant", "scalar"),
)
def q_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.struct(
                F.col("event_type").alias("type"),
                F.col("user_id").alias("uid"),
            ).alias("meta"),
            F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )
    v = events.select(
        "event_type", F.parse_json(doc).alias("var")
    ).select(
        "event_type",
        F.expr("variant_get(var, '$.meta.uid', 'long')").alias("uid"),
        F.expr("variant_get(var, '$.vals[1]', 'double')").alias("val2"),
        F.expr("variant_get(var, '$.k', 'int')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("uid").cast("bigint").alias("sum_uid"),
        F.round(F.sum(F.col("val2").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("sum_val2"),
        F.max("k").cast("int").alias("max_k"),
    )


@register(
    "q_try_arithmetic_safety",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN (user_id % 10) <> 0
                         THEN (event_id * 100) // (user_id % 10) END)
                AS BIGINT) AS safe_div_sum,
           CAST(SUM(CASE WHEN (user_id % 10) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_div_by_zero,
           CAST(SUM(CASE WHEN length(CAST(event_id AS VARCHAR)) <= 2
                         THEN TRY_CAST(CAST(event_id AS VARCHAR)
                                       AS TINYINT) END)
                AS BIGINT) AS tiny_cast_sum,
           CAST(SUM(CASE WHEN length(CAST(event_id AS VARCHAR)) > 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_overflow
    FROM events GROUP BY event_type
    """,
    doc=(
        "ANSI error-safe arithmetic surface: try_divide turns "
        "division-by-zero into NULL instead of a query-killing error "
        "(a tenth of the synthetic divisors are zero), and try_cast "
        "turns numeric overflow into NULL (event ids above TINYINT "
        "range) — the fault-tolerant ingest arithmetic a pipeline "
        "needs under ANSI mode, where plain operators would abort "
        "the job on the first bad row. NULL-producing rows are "
        "counted alongside so the audit proves failures were "
        "CONTAINED, not skipped. The oracle mirrors the semantics "
        "with guard predicates (DuckDB integer division errors on "
        "zero rather than returning NULL, and its TRY_CAST of "
        "out-of-range values truncates differently across versions — "
        "guarded CASE keeps both engines on the defined path). "
        "Integer div keeps every compared column exact."
    ),
    tags=("scalar", "ansi", "quality"),
)
def q_try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    divisor = F.col("user_id") % 10
    digits = F.length(F.col("event_id").cast("string"))
    e = events.select(
        "event_type",
        F.try_divide((F.col("event_id") * 100), divisor).alias("q"),
        divisor.alias("d"),
        F.when(
            digits <= 2,
            F.expr("try_cast(CAST(event_id AS STRING) AS TINYINT)"),
        ).alias("tiny"),
        digits.alias("digits"),
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("q"))).cast("bigint").alias("safe_div_sum"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_div_by_zero"),
        F.sum("tiny").cast("bigint").alias("tiny_cast_sum"),
        F.sum(F.when(F.col("digits") > 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cast_overflow"),
    )


@register(
    "q_null_safe_join",
    oracle="""
    WITH keyed AS (
        SELECT NULLIF(user_id % 5, 4) AS k, event_id, value
        FROM events
    ),
    a AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS na,
                 CAST(SUM(event_id) AS BIGINT) AS sa
          FROM keyed GROUP BY k),
    b AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS nb
          FROM keyed WHERE event_id % 2 = 0 GROUP BY k)
    SELECT a.k, a.na, a.sa, b.nb
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc=(
        "Null-safe equality join (<=> / IS NOT DISTINCT FROM): a "
        "fifth of the derived keys are NULL, and the null bucket must "
        "JOIN (null <=> null is true) instead of silently dropping — "
        "the semantics gap between plain equi-joins and changelog/"
        "dimension keys that legitimately carry NULL. Both sides "
        "aggregate before joining, so the null-safe join runs over "
        "tiny frames; Spark plans <=> as a hash join on a "
        "null-tolerant key (no fallback to nested-loop), pinned by "
        "the suite-wide plan lint. Column math all integer."
    ),
    tags=("join", "null-semantics"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    keyed = events.select(
        F.nullif(F.col("user_id") % 5, F.lit(4)).alias("k"),
        "event_id",
        "value",
    )
    a = keyed.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("na"),
        F.sum("event_id").cast("bigint").alias("sa"),
    )
    b = (
        keyed.filter(F.col("event_id") % 2 == 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"], "na", "sa", "nb"
    )


@register(
    "q_pandas_udaf_dot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM((o_orderkey % 1000) * (o_custkey % 1000)) AS BIGINT)
               AS dot_surrogate
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Pandas GROUPED_AGG UDAF (round 8) — the last UDF-family "
        "member the engine didn't demonstrate (scalar pandas UDF, "
        "grouped map, mapInPandas, stateful map, and Arrow UDTF are "
        "covered elsewhere): a vectorized aggregate over Arrow "
        "batches computing a per-group dot product of integer "
        "surrogates ((orderkey%1000)*(custkey%1000) summed in "
        "int64 — exact, order-independent, so directly oracled). "
        "Plans as AggregateInPandas (Arrow transfer), not "
        "BatchEvalPython — the suite lint stays intact. The UDAF is "
        "defined inside the query (pickled by value; module-level "
        "refs break under the driver harness CWD). Scale note: "
        "grouped-agg pandas UDFs do NOT partial-aggregate — every "
        "group's rows ship to one executor, so built-ins win "
        "whenever they can express the math; this query exists to "
        "pin the surface for aggregates that genuinely need "
        "numpy/scipy kernels."
    ),
    tags=("pandas-udf", "udaf", "engine-surface"),
)
def q_pandas_udaf_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # Explicit functionType: the module's `from __future__ import
    # annotations` turns hints into strings, which defeats pandas_udf's
    # signature inference for locally-imported names.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def dot_surrogate(x, y):
        # int64 arithmetic throughout: products < 1e6, sums < 2^53.
        return int(((x % 1000) * (y % 1000)).sum())

    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is
    # a pandas UDAF too.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(x):
        return int(len(x))

    orders = _t(spark, sf_dir, "orders")[0]
    return orders.groupBy("o_orderpriority").agg(
        n_rows("o_orderkey").alias("n_orders"),
        dot_surrogate("o_orderkey", "o_custkey").alias("dot_surrogate"),
    )


@register(
    "q_pandas_udaf_window",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(o_orderkey % 1000) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_surrogate_sum
    FROM orders
    WHERE o_orderkey % 37 = 0
    """,
    doc=(
        "Pandas UDAF over a WINDOW frame (round 8) — the windowed "
        "variant of the grouped-agg surface: the same Arrow-batched "
        "vectorized aggregate evaluated per bounded rolling frame "
        "(7-row trailing sum per priority, ordered by orderkey). "
        "Spark ships each frame's slice to the Python worker as a "
        "pandas Series; int64 surrogate arithmetic keeps it exactly "
        "oracle-able against the plain SQL window sum. The filter "
        "keeps the frame count small — windowed pandas UDAFs "
        "re-evaluate per row, the documented cost reason built-in "
        "window aggregates win when expressible (this query exists "
        "to pin the surface for rolling numpy/scipy kernels). One "
        "exchange: the window's hash partitioning."
    ),
    tags=("pandas-udf", "udaf", "window", "engine-surface"),
)
def q_pandas_udaf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def surrogate_sum(x):
        return int((x % 1000).sum())

    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        orders.filter(F.col("o_orderkey") % 37 == 0)
        .select(
            "o_orderkey",
            surrogate_sum("o_orderkey").over(w).alias(
                "rolling_surrogate_sum"
            ),
        )
    )


@register(
    "q_sql_scripting_iterative",
    oracle="""
    WITH ks AS (SELECT unnest(generate_series(0, 40)) AS k),
    cnt AS (
        SELECT k, (1::BIGINT << k) AS threshold,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_totalprice > (1::BIGINT << k)) AS n_above
        FROM ks
    )
    SELECT CAST(k AS BIGINT) AS k, threshold, n_above
    FROM cnt WHERE n_above < 1000
    ORDER BY k LIMIT 1
    """,
    doc=(
        "Spark 4 SQL SCRIPTING (round 8) — procedural control flow "
        "executed BY the engine (BEGIN/DECLARE/WHILE/SET, "
        "spark.sql.scripting.enabled): a doubling search for the "
        "smallest power-of-two price threshold with fewer than 1000 "
        "orders above it; each loop iteration runs a real aggregate "
        "query against the table, exactly the driver-coordinated "
        "iterative shape BFS/SSSP use but expressed in pure SQL. "
        "k recovered transcendental-free as length(bin(t))-1 (the "
        "round-6 msb trick). Oracle: DuckDB evaluates all candidate "
        "thresholds at once ((1::BIGINT << k), shifts <= 62) and "
        "picks the first qualifying k — a totally different "
        "evaluation strategy reaching the same fixpoint, so the "
        "loop logic itself is what's verified. Scale note: the "
        "per-iteration aggregate is a full distributed query; the "
        "script only carries two scalars between iterations."
    ),
    tags=("sql-scripting", "engine-surface", "iterative"),
)
def q_sql_scripting_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")[0]
    orders.createOrReplaceTempView("sqlscript_orders_v")
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    try:
        spark.conf.set("spark.sql.scripting.enabled", "true")
        return spark.sql(
            """
            BEGIN
              DECLARE t BIGINT DEFAULT 1;
              WHILE (SELECT COUNT(*) FROM sqlscript_orders_v
                     WHERE o_totalprice > t) >= 1000 DO
                SET t = t * 2;
              END WHILE;
              SELECT CAST(length(bin(t)) - 1 AS BIGINT) AS k,
                     t AS threshold,
                     (SELECT CAST(COUNT(*) AS BIGINT)
                      FROM sqlscript_orders_v
                      WHERE o_totalprice > t) AS n_above;
            END
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


@register(
    "q_udtf_table_arg_rle",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events WHERE user_id % 4 = 0
    ),
    flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN prev IS NULL OR prev <> event_type
                    THEN 1 ELSE 0 END AS is_start
        FROM ordered
    ),
    runs AS (
        SELECT user_id, event_type,
               SUM(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS run_idx
        FROM flagged
    )
    SELECT user_id, CAST(run_idx AS BIGINT) AS run_idx,
           event_type, CAST(COUNT(*) AS BIGINT) AS run_len
    FROM runs GROUP BY user_id, run_idx, event_type
    """,
    doc=(
        "Partition-aware Python UDTF with a TABLE argument (round 8) "
        "— the Spark-4 polymorphic-TVF surface the LATERAL UDTF "
        "can't reach: perkey(TABLE(v) PARTITION BY user_id ORDER BY "
        "ts, event_id) hands the UDTF each user's rows as an ORDERED "
        "partition, and the class carries state across eval() calls "
        "to run-length-encode the event-type sequence (runs emitted "
        "from terminate()). This is the engine-managed version of "
        "applyInPandas sequence folds: Spark does the shuffle and "
        "the sort, the UDTF sees a clean per-key iterator. Arrow-"
        "batched (useArrow=True, same finding as q_udtf_expand). "
        "Oracle: the lag + running-sum islands reduction — a "
        "completely different formulation whose agreement verifies "
        "the partition/order contract itself. Class defined inside "
        "the query (pickled by value, driver-harness CWD rule). "
        "REGISTRATION SCOPING (round 11): per-row Python eval() is "
        "inherent to the TVF surface this deliberately demonstrates, "
        "and at 12.1s it was the slowest bench query for a result "
        "the islands SQL computes in <1s — the registered input is "
        "user_id % 4 = 0 (the recursive-CTE-breadth scoping rule); "
        "the API demonstration and its contract oracle lose nothing "
        "on a subset."
    ),
    tags=("udtf", "table-argument", "engine-surface", "sequence"),
)
def q_udtf_table_arg_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id bigint, run_idx bigint, event_type string, "
            "run_len bigint"
        ),
        useArrow=True,
    )
    class RunLength:
        def __init__(self):
            self.user = None
            self.cur = None
            self.run_idx = 0
            self.run_len = 0
            self.out = []

        def eval(self, row):
            self.user = row["user_id"]
            et = row["event_type"]
            if et == self.cur:
                self.run_len += 1
            else:
                if self.cur is not None:
                    self.out.append(
                        (self.user, self.run_idx, self.cur, self.run_len)
                    )
                self.run_idx += 1
                self.cur = et
                self.run_len = 1

        def terminate(self):
            if self.cur is not None:
                self.out.append(
                    (self.user, self.run_idx, self.cur, self.run_len)
                )
            yield from self.out

    (events,) = _t(spark, sf_dir, "events")
    events.where(F.col("user_id") % 4 == 0).select(
        "user_id", "event_type", "ts", "event_id"
    ).createOrReplaceTempView("udtf_rle_events_v")
    spark.udtf.register("ksa_rle", RunLength)
    return spark.sql(
        """
        SELECT * FROM ksa_rle(
            TABLE(udtf_rle_events_v)
            PARTITION BY user_id ORDER BY (ts, event_id)
        )
        """
    )


@register(
    "q_sql_udf_functions",
    oracle="""
    SELECT CASE WHEN value < 100 THEN 'low'
                WHEN value < 300 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events
    GROUP BY 1
    """,
    doc=(
        "SQL-defined scalar functions (round 8) — Spark 4's CREATE "
        "FUNCTION ... RETURN <expr>, the declarative UDF lane that "
        "needs NO Python worker: the function body inlines into the "
        "plan at analysis time, so it stays inside whole-stage "
        "codegen and costs exactly what the written-out expression "
        "costs (verified by the oracle being the written-out "
        "expression). Two temp functions — an exact-cents "
        "conversion and a CASE band classifier — used in one "
        "aggregate. This is the right tool for shared business "
        "logic at 100 TB: catalog-managed semantics with zero "
        "serialization cost, vs the Python UDF family which exists "
        "for logic SQL can't express. Session-scoped temp "
        "functions; names prefixed to avoid collisions."
    ),
    tags=("sql-udf", "engine-surface", "functions"),
)
def q_sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    events.createOrReplaceTempView("sqludf_events_v")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ksa_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(x * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ksa_band(x DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN x < 100 THEN 'low' "
        "WHEN x < 300 THEN 'mid' ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT ksa_band(value) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(ksa_cents(value)) AS BIGINT) AS cents_sum
        FROM sqludf_events_v
        GROUP BY 1
        """
    )


# --------------------------------------------------------------------------
# Round-9 SQL-language surfaces: pipe syntax, recursive CTE, parameterized
# SQL, collated grouping. Each is the same logical query a user writes
# today in classic SQL — the point is first-class support for the NEW
# surface, verified cell-exact against a classic-SQL DuckDB oracle.
# --------------------------------------------------------------------------

_PIPE_AGG = f"""
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       {money_sum_sql("CAST(l_extendedprice AS DECIMAL(12,2))")}
           AS sum_base_price"""


@register(
    "q_sql_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,{_PIPE_AGG}
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "SQL pipe syntax (round 9) — Spark 4's |> operator chain "
        "(FROM ... |> WHERE ... |> AGGREGATE ... GROUP BY), the "
        "linear-dataflow notation for the classic pricing-summary "
        "aggregation. Same plan as the nested form (Catalyst "
        "normalizes before optimization — pushdown/pruning "
        "unaffected); the DuckDB oracle is the classic-SQL spelling "
        "with the identical exact-decimal money fragments, so the "
        "surface demo is held to the same cell-exact bar as every "
        "other query."
    ),
    tags=("sql", "pipe-syntax", "surface"),
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem")[0].createOrReplaceTempView("pipe_li_v")
    return spark.sql(
        f"""
        FROM pipe_li_v
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE{_PIPE_AGG}
           GROUP BY l_returnflag, l_linestatus
        """
    )


def _rcte_compound_sql(table: str) -> str:
    """Shared WITH RECURSIVE text (dialect-identical in Spark and
    DuckDB): walk each order's lineitems in l_linenumber order (1..n,
    consecutive by TPC-H construction) multiplying (1 - discount) —
    a sequential running PRODUCT, the computation recursion exists
    for (no window frame expresses it without ln/exp, which the
    parity rules ban). Multiplication order is pinned by the
    recursion itself, so the doubles agree bit-for-bit. The walk
    runs over a row_number() sequence, NOT l_linenumber — the
    synthetic lineitem has duplicate (orderkey, linenumber) pairs,
    so the chain needs the total order (linenumber, partkey,
    suppkey) (verified unique at sf0.01 and sf0.1) to stay
    deterministic.

    Scope: 1/16 of orders, walk capped at the first 8 items. Spark's
    UnionLoop re-executes the full recursive-term subtree (seq's
    scan + window included) EVERY level and schedules each level as
    its own stage set — measured at sf0.1: depth-17 full-table
    recursion 24-30s, seq pre-materialized 18s, this scoping ~5s
    with identical statement text on both engines (the point of the
    demo). Unbounded running products over full data belong to the
    fold/window family (q_ewma_smoothing's closed form); bounded
    frontier iteration at scale is q_bfs_reachability's
    shuffle-join shape."""
    return f"""
    WITH RECURSIVE seq AS (
        SELECT * FROM (
            SELECT l_orderkey,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn,
                   l_discount
            FROM {table} WHERE l_orderkey % 16 = 0
        ) WHERE rn <= 8
    ),
    chain AS (
        SELECT l_orderkey, rn, (1.0 - l_discount) AS compound
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.l_orderkey, s.rn, c.compound * (1.0 - s.l_discount)
        FROM seq s JOIN chain c
          ON s.l_orderkey = c.l_orderkey AND s.rn = c.rn + 1
    )
    SELECT l_orderkey,
           CAST(MAX(rn) AS BIGINT) AS n_items,
           MAX_BY(compound, rn) AS compound_factor
    FROM chain GROUP BY l_orderkey
    """


@register(
    "q_recursive_cte_compound",
    oracle=_rcte_compound_sql("lineitem"),
    doc=(
        "Native WITH RECURSIVE (round 9) — Spark 4's recursive CTE "
        "surface, demonstrated on a per-order sequential running "
        "product (compound discount factor across lineitems in "
        "linenumber order), scoped to 1/16 of orders and the first 8 "
        "items: UnionLoop re-executes the recursive term's whole "
        "subtree per level, so bench cost tracks depth x subtree, not "
        "the surface being demoed (numbers in _rcte_compound_sql's "
        "docstring). Each level is ONE equi-join on (orderkey, rn) — "
        "the iterative-join shape q_bfs_reachability hand-builds, "
        "expressed declaratively and planned by the engine. The "
        "DuckDB oracle runs the IDENTICAL statement text (only the "
        "table name differs), making this the rare query where both "
        "engines execute the same recursive SQL — float products "
        "agree because the recursion pins multiplication order."
    ),
    tags=("sql", "recursive-cte", "iterative", "surface"),
)
def q_recursive_cte_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem")[0].createOrReplaceTempView("rcte_li_v")
    return spark.sql(_rcte_compound_sql("rcte_li_v"))


@register(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                AS DOUBLE) AS sum_total
    FROM orders
    WHERE o_totalprice >= 150000.0
      AND o_orderdate < DATE '1997-01-01'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
    doc=(
        "Parameterized SQL (round 9) — spark.sql(query, args=...) "
        "named-parameter binding (:min_total scalar, :cutoff typed "
        "date, :prios array consumed via array_contains), the "
        "injection-safe surface for templated production queries. "
        "Parameters bind as typed literals BEFORE analysis, so "
        "constant folding and parquet predicate pushdown see the "
        "values exactly as if inlined — the oracle is the inlined "
        "classic form, cell-exact with the repo's money rules."
    ),
    tags=("sql", "parameterized", "surface"),
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    _t(spark, sf_dir, "orders")[0].createOrReplaceTempView("param_orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS sum_total
        FROM param_orders_v
        WHERE o_totalprice >= :min_total
          AND o_orderdate < :cutoff
          AND array_contains(:prios, o_orderpriority)
        GROUP BY o_orderpriority
        """,
        args={
            "min_total": 150000.0,
            "cutoff": datetime.date(1997, 1, 1),
            "prios": ["1-URGENT", "2-HIGH"],
        },
    )


@register(
    "q_collated_grouping",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg_mixed,
               c_acctbal
        FROM customer
    )
    SELECT lower(min(seg_mixed)) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2)
                AS DOUBLE) AS sum_acctbal
    FROM mixed
    GROUP BY lower(seg_mixed)
    """,
    doc=(
        "Collation-aware grouping (round 9) — Spark 4's COLLATE "
        "UTF8_LCASE groups case-insensitively at the ENGINE level "
        "(hash/compare use the collation, no lower() rewrite of the "
        "data): a deterministically case-mangled segment column "
        "(even custkeys lowered) groups back to 5 segments. The "
        "comparable output key is lower(min(seg)) — min under BINARY "
        "collation picks the uppercase variant in both engines "
        "(ASCII order), so the oracle's lower()-rewrite twin is "
        "cell-exact. Money-rule account-balance sums prove rows "
        "landed in the right collated groups, not just the counts."
    ),
    tags=("sql", "collation", "surface"),
)
def q_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")[0]
    mixed = cust.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower(F.col("c_mktsegment"))
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_mixed"),
        "c_acctbal",
    )
    return (
        mixed.groupBy(F.expr("seg_mixed COLLATE UTF8_LCASE").alias("_g"))
        .agg(
            F.lower(F.min("seg_mixed")).alias("segment"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("sum_acctbal"),
        )
        .drop("_g")
    )
