"""Round-14 fresh queue, batch 1 — the ordinal-association family
(gamma / Somers' D / tau-c), Quade test, Cochran-Armitage trend,
Mantel-Haenszel pooled OR, crude 2x2 association, and the Pettitt
change-point test (operators/stats.py). Registration-ready oracle
texts in *_ORACLE constants.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# group = returnflag, x = quantity (1..50), y = discount cents (0..10):
# the ordinal association between order size and discount per flag.
ORDASSOC_ORACLE = """
    WITH xy AS (
        SELECT l_returnflag AS g,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
        FROM read_parquet('{sf}/lineitem.parquet')
    ),
    cells AS (
        SELECT g, x, y, CAST(COUNT(*) AS BIGINT) AS c
        FROM xy GROUP BY g, x, y
    ),
    pair_mass AS (
        SELECT a.g,
               CAST(COALESCE(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT)
                   AS n_concordant,
               CAST(COALESCE(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT)
                   AS n_discordant
        FROM cells a JOIN cells b
          ON a.g = b.g AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
        GROUP BY a.g
    ),
    xm AS (
        SELECT g, CAST(SUM(tx * (tx - 1) // 2) AS BIGINT) AS txp,
               CAST(COUNT(*) AS BIGINT) AS mx
        FROM (SELECT g, x, CAST(SUM(c) AS BIGINT) AS tx
              FROM cells GROUP BY g, x)
        GROUP BY g
    ),
    ym AS (
        SELECT g, CAST(SUM(ty * (ty - 1) // 2) AS BIGINT) AS typ,
               CAST(COUNT(*) AS BIGINT) AS my
        FROM (SELECT g, y, CAST(SUM(c) AS BIGINT) AS ty
              FROM cells GROUP BY g, y)
        GROUP BY g
    ),
    tot AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS txy
        FROM cells GROUP BY g
    )
    SELECT tot.g AS group_key, n,
           COALESCE(n_concordant, 0) AS n_concordant,
           COALESCE(n_discordant, 0) AS n_discordant,
           CASE WHEN COALESCE(n_concordant, 0)
                     + COALESCE(n_discordant, 0) > 0 THEN
                CAST((1000000 * (COALESCE(n_concordant, 0)
                      - COALESCE(n_discordant, 0)))
                     // (COALESCE(n_concordant, 0)
                         + COALESCE(n_discordant, 0)) AS BIGINT) END
               AS gamma_ppm,
           CASE WHEN COALESCE(n_concordant, 0) + COALESCE(n_discordant, 0)
                     + (typ - txy) > 0 THEN
                CAST((1000000 * (COALESCE(n_concordant, 0)
                      - COALESCE(n_discordant, 0)))
                     // (COALESCE(n_concordant, 0)
                         + COALESCE(n_discordant, 0)
                         + (typ - txy)) AS BIGINT) END
               AS somers_d_yx_ppm,
           CASE WHEN LEAST(mx, my) >= 2 THEN
                CAST((CAST(1000000 AS HUGEINT) * 2 * LEAST(mx, my)
                      * (COALESCE(n_concordant, 0)
                         - COALESCE(n_discordant, 0)))
                     // (CAST(n AS HUGEINT) * n * (LEAST(mx, my) - 1))
                     AS BIGINT) END
               AS tau_c_ppm
    FROM tot
    LEFT JOIN pair_mass ON pair_mass.g = tot.g
    JOIN xm ON xm.g = tot.g
    JOIN ym ON ym.g = tot.g
"""

# Quade: same blocked shape as Page (region groups, nation blocks,
# year treatments, revenue cents) but range-weighted.
QUADE_ORACLE = """
    WITH base AS (
        SELECT CAST(n.n_regionkey AS BIGINT) AS g,
               CAST(c.c_nationkey AS BIGINT) AS blk,
               CAST(year(o.o_orderdate) AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{sf}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3
    ),
    k_per AS (SELECT g, CAST(COUNT(DISTINCT t) AS BIGINT) AS k
              FROM base GROUP BY g),
    blk_gate AS (
        SELECT b.g, b.blk,
               COUNT(*) = MAX(k) AND COUNT(DISTINCT t) = MAX(k) AS ok
        FROM base b JOIN k_per ON k_per.g = b.g
        GROUP BY b.g, b.blk
    ),
    gated AS (
        SELECT base.* FROM base
        JOIN blk_gate ON blk_gate.g = base.g AND blk_gate.blk = base.blk
        WHERE blk_gate.ok
    ),
    cells AS (
        SELECT g, blk, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM gated GROUP BY g, blk, v
    ),
    ranked AS (
        SELECT g, blk, v,
               CAST(2 * (SUM(c) OVER (PARTITION BY g, blk ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT) AS r2
        FROM cells
    ),
    ranges AS (
        SELECT g, blk, CAST(MAX(v) - MIN(v) AS BIGINT) AS rng
        FROM gated GROUP BY g, blk
    ),
    rng_cells AS (
        SELECT g, rng, CAST(COUNT(*) AS BIGINT) AS rc
        FROM ranges GROUP BY g, rng
    ),
    rng_ranked AS (
        SELECT g, rng,
               CAST(2 * (SUM(rc) OVER (PARTITION BY g ORDER BY rng
                    ROWS UNBOUNDED PRECEDING) - rc) + rc + 1 AS BIGINT)
                   AS q2
        FROM rng_cells
    ),
    blk_q AS (
        SELECT r.g, r.blk, q2
        FROM ranges r JOIN rng_ranked rr
          ON rr.g = r.g AND rr.rng = r.rng
    ),
    scored AS (
        SELECT x.g, x.blk, x.t,
               CAST(q.q2 * (r.r2 - (k.k + 1)) AS BIGINT) AS s
        FROM gated x
        JOIN ranked r ON r.g = x.g AND r.blk = x.blk AND r.v = x.v
        JOIN blk_q q ON q.g = x.g AND q.blk = x.blk
        JOIN k_per k ON k.g = x.g
    ),
    per_treat AS (
        SELECT g, t, CAST(SUM(s) AS BIGINT) AS st
        FROM scored GROUP BY g, t
    ),
    agg AS (
        SELECT s.g, b, a2, bnum2, k
        FROM (SELECT g, CAST(COUNT(DISTINCT blk) AS BIGINT) AS b,
                     CAST(SUM(CAST(s AS HUGEINT) * s) AS BIGINT) AS a2
              FROM scored GROUP BY g) s
        JOIN (SELECT g,
                     CAST(SUM(CAST(st AS HUGEINT) * st) AS BIGINT)
                         AS bnum2,
                     CAST(COUNT(*) AS BIGINT) AS k
              FROM per_treat GROUP BY g) p
          ON p.g = s.g
    ),
    dropped AS (
        SELECT g, CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_blocks_dropped
        FROM blk_gate GROUP BY g
    )
    SELECT d.g AS group_key, b, k, a2, bnum2,
           CASE WHEN b * a2 - bnum2 > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * (b - 1) * bnum2)
                     // (b * a2 - bnum2) AS BIGINT) END AS quade_ppm,
           n_blocks_dropped
    FROM dropped d LEFT JOIN agg ON agg.g = d.g
"""

# Cochran-Armitage: is the fulfilled-status rate monotone in order
# year, per priority class?
CATREND_ORACLE = """
    WITH base AS (
        SELECT o_orderpriority AS g,
               CAST(year(o_orderdate) - 1992 AS BIGINT) AS s,
               o_orderstatus = 'F' AS ok
        FROM read_parquet('{sf}/orders.parquet')
    ),
    lev AS (
        SELECT g, s, CAST(COUNT(*) AS BIGINT) AS ni,
               CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS ai
        FROM base GROUP BY g, s
    ),
    agg AS (
        SELECT g, CAST(SUM(ni) AS BIGINT) AS n,
               CAST(SUM(ai) AS BIGINT) AS a,
               CAST(COUNT(*) AS BIGINT) AS n_levels,
               CAST(SUM(s * ai) AS BIGINT) AS ssa,
               CAST(SUM(s * ni) AS BIGINT) AS ssn,
               CAST(SUM(s * s * ni) AS BIGINT) AS ss2n
        FROM lev GROUP BY g
    )
    SELECT g AS group_key, n, a AS n_success, n_levels,
           CASE WHEN CAST(a AS HUGEINT) * (n - a)
                     * (CAST(n AS HUGEINT) * ss2n
                        - CAST(ssn AS HUGEINT) * ssn) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * n
                      * (CAST(n AS HUGEINT) * ssa
                         - CAST(a AS HUGEINT) * ssn)
                      * (CAST(n AS HUGEINT) * ssa
                         - CAST(a AS HUGEINT) * ssn))
                     // (CAST(a AS HUGEINT) * (n - a)
                         * (CAST(n AS HUGEINT) * ss2n
                            - CAST(ssn AS HUGEINT) * ssn))
                     AS BIGINT) END AS z2_ppm
    FROM agg
"""

# MH pooled OR: exposure = high priority, outcome = fulfilled,
# stratified by order year, grouped by customer region.
MH_ORACLE = """
    WITH rows_ AS (
        SELECT CAST(n.n_regionkey AS BIGINT) AS g,
               CAST(year(o.o_orderdate) AS BIGINT) AS stratum,
               o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS e,
               o.o_orderstatus = 'F' AS o
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        JOIN read_parquet('{sf}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey
    ),
    cells AS (
        SELECT g, stratum,
               CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT)
                   AS a,
               CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM rows_ GROUP BY g, stratum
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_strata,
               CAST(SUM((1000000 * a * d) // (a + b + c + d)) AS BIGINT)
                   AS num_scaled,
               CAST(SUM((1000000 * b * c) // (a + b + c + d)) AS BIGINT)
                   AS den_scaled
        FROM cells GROUP BY g
    )
    SELECT g AS group_key, n_strata, num_scaled, den_scaled,
           CASE WHEN den_scaled > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * num_scaled)
                     // den_scaled AS BIGINT) END AS mh_or_ppm
    FROM agg
"""

# Crude 2x2 per customer nation: exposure = high priority, outcome =
# order value above a fixed 150k threshold.
ASSOC2X2_ORACLE = """
    WITH rows_ AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS e,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) > 15000000 AS o
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
    ),
    agg AS (
        SELECT g,
               CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT)
                   AS a,
               CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM rows_ GROUP BY g
    )
    SELECT g AS group_key, a, b, c, d,
           CASE WHEN b * c > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * a * d)
                     // (CAST(b AS HUGEINT) * c) AS BIGINT) END AS or_ppm,
           CASE WHEN c * (a + b) > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * a * (c + d))
                     // (CAST(c AS HUGEINT) * (a + b)) AS BIGINT) END
               AS rr_ppm,
           CASE WHEN a * d + b * c > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * (a * d - b * c))
                     // (CAST(a AS HUGEINT) * d + CAST(b AS HUGEINT) * c)
                     AS BIGINT) END AS yule_q_ppm
    FROM agg
"""

# Pettitt: change point of the monthly revenue series per customer
# nation (month index from the epoch-free year*12+month arithmetic).
PETTITT_ORACLE = """
    WITH base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    cells AS (
        SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY g, v
    ),
    ranked AS (
        SELECT g, v,
               CAST(2 * (SUM(c) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT) AS r2
        FROM cells
    ),
    nrow AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY g),
    pref AS (
        SELECT b.g, b.t, n.n,
               CAST(SUM(r.r2 - (n.n + 1)) OVER (PARTITION BY b.g
                    ORDER BY b.t ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS u2,
               CAST(row_number() OVER (PARTITION BY b.g ORDER BY b.t)
                    AS BIGINT) AS pos
        FROM base b
        JOIN ranked r ON r.g = b.g AND r.v = b.v
        JOIN nrow n ON n.g = b.g
    ),
    best AS (
        SELECT g, t AS t_at_max, u2 AS u2_at_max,
               CAST(abs(u2) AS BIGINT) AS k2,
               row_number() OVER (PARTITION BY g
                   ORDER BY abs(u2) DESC, t ASC) AS rk
        FROM pref WHERE pos < n
    )
    SELECT nrow.g AS group_key, nrow.n, t_at_max, u2_at_max, k2,
           CASE WHEN nrow.n >= 2 THEN
                CAST((1000000 * k2) // (nrow.n * (nrow.n - 1)) AS BIGINT)
           END AS k2_ppm
    FROM nrow LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
      ON b.g = nrow.g
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    return got, exp


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.sql(sql.format(sf=SF)).df()
    finally:
        con.close()


def test_ordinal_assoc_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        ordinal_association,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    xy = load_table(spark, "lineitem", SF).select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").alias("y"),
    )
    got = ordinal_association(xy, "g", "x", "y").toPandas()
    _cmp(got, _duck(ORDASSOC_ORACLE), ["group_key"])


def test_ordinal_assoc_hand_values(spark):
    """Perfect concordance: gamma = somers = tau_c = 1e6 exactly.
    Independence on the 2x2 grid: all three are 0."""
    from kafka_streams_aggregate_spark.operators.stats import (
        ordinal_association,
    )

    perf = [("g", 1, 1), ("g", 2, 2)]
    df = spark.createDataFrame(perf, "g string, x long, y long")
    [r] = ordinal_association(df, "g", "x", "y").collect()
    assert (r["gamma_ppm"], r["somers_d_yx_ppm"], r["tau_c_ppm"]) == (
        1_000_000,
        1_000_000,
        1_000_000,
    )

    indep = [("g", 1, 1), ("g", 1, 2), ("g", 2, 1), ("g", 2, 2)]
    df2 = spark.createDataFrame(indep, "g string, x long, y long")
    [r] = ordinal_association(df2, "g", "x", "y").collect()
    assert (r["gamma_ppm"], r["somers_d_yx_ppm"], r["tau_c_ppm"]) == (0, 0, 0)


def test_quade_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import quade_test
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    base = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .groupBy(
            F.col("n_regionkey").cast("bigint").alias("g"),
            F.col("c_nationkey").cast("bigint").alias("blk"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = quade_test(base, "g", "blk", "t", "v").toPandas()
    _cmp(got, _duck(QUADE_ORACLE), ["group_key"])


def test_quade_hand_values(spark):
    """b=2 blocks, k=2 treatments, both increasing, block 2 with the
    larger range: s = {-2,+2,-4,+4}, A = 40, Bnum = 72, quade_ppm =
    1e6*1*72 div (2*40 - 72) = 9e6 (T3 = 9). A group whose blocks are
    all incomplete emits NULL stats + the drop count."""
    from kafka_streams_aggregate_spark.operators.stats import quade_test

    rows = [
        ("g", "b1", 1, 1),
        ("g", "b1", 2, 2),
        ("g", "b2", 1, 10),
        ("g", "b2", 2, 12),
    ]
    df = spark.createDataFrame(rows, "g string, blk string, t long, v long")
    [r] = quade_test(df, "g", "blk", "t", "v").collect()
    assert (r["b"], r["k"], r["a2"], r["bnum2"]) == (2, 2, 40, 72)
    assert r["quade_ppm"] == 9_000_000

    allinc = [("h", "b1", 1, 5), ("h", "b2", 2, 7)]
    df2 = spark.createDataFrame(
        allinc, "g string, blk string, t long, v long"
    )
    [r] = quade_test(df2, "g", "blk", "t", "v").collect()
    assert r["b"] is None and r["quade_ppm"] is None
    assert r["n_blocks_dropped"] == 2


def test_cochran_armitage_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        cochran_armitage_trend,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    base = load_table(spark, "orders", SF).select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(year(o_orderdate) - 1992 AS BIGINT)").alias("s"),
        F.expr("o_orderstatus = 'F'").alias("ok"),
    )
    got = cochran_armitage_trend(base, "g", "s", "ok").toPandas()
    _cmp(got, _duck(CATREND_ORACLE), ["group_key"])


def test_cochran_armitage_hand_values(spark):
    """Perfect separation across two levels (0/10 then 10/10):
    z2 = N exactly -> 20e6 ppm. All-success group: NULL."""
    from kafka_streams_aggregate_spark.operators.stats import (
        cochran_armitage_trend,
    )

    rows = [("g", 0, False)] * 10 + [("g", 1, True)] * 10
    df = spark.createDataFrame(rows, "g string, s long, ok boolean")
    [r] = cochran_armitage_trend(df, "g", "s", "ok").collect()
    assert (r["n"], r["n_success"], r["n_levels"]) == (20, 10, 2)
    assert r["z2_ppm"] == 20_000_000

    allok = [("h", 0, True), ("h", 1, True)]
    df2 = spark.createDataFrame(allok, "g string, s long, ok boolean")
    [r] = cochran_armitage_trend(df2, "g", "s", "ok").collect()
    assert r["z2_ppm"] is None


def test_mantel_haenszel_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        mantel_haenszel_or,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    nation = load_table(spark, "nation", SF)
    rows = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .select(
            F.col("n_regionkey").cast("bigint").alias("g"),
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("stratum"),
            F.expr(
                "o_orderpriority IN ('1-URGENT', '2-HIGH')"
            ).alias("e"),
            F.expr("o_orderstatus = 'F'").alias("o"),
        )
    )
    got = mantel_haenszel_or(rows, "g", "stratum", "e", "o").toPandas()
    _cmp(got, _duck(MH_ORACLE), ["group_key"])


def test_mantel_haenszel_hand_values(spark):
    """Single stratum (a,b,c,d) = (2,1,1,2): the scaled-integer
    layout gives num = 666666, den = 166666, and the pooled OR ppm is
    the exact integer ratio (true OR = 4)."""
    from kafka_streams_aggregate_spark.operators.stats import (
        mantel_haenszel_or,
    )

    rows = (
        [("g", 1, True, True)] * 2
        + [("g", 1, True, False)]
        + [("g", 1, False, True)]
        + [("g", 1, False, False)] * 2
    )
    df = spark.createDataFrame(
        rows, "g string, stratum long, e boolean, o boolean"
    )
    [r] = mantel_haenszel_or(df, "g", "stratum", "e", "o").collect()
    num = (1_000_000 * 2 * 2) // 6
    den = (1_000_000 * 1 * 1) // 6
    assert (r["num_scaled"], r["den_scaled"]) == (num, den)
    assert r["mh_or_ppm"] == (1_000_000 * num) // den


def test_assoc_2x2_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import assoc_2x2
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    rows = orders.join(cust, cust.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("bigint").alias("g"),
        F.expr("o_orderpriority IN ('1-URGENT', '2-HIGH')").alias("e"),
        F.expr(
            "CAST(floor(o_totalprice * 100) AS BIGINT) > 15000000"
        ).alias("o"),
    )
    got = assoc_2x2(rows, "g", "e", "o").toPandas()
    _cmp(got, _duck(ASSOC2X2_ORACLE), ["group_key"])


def test_assoc_2x2_hand_values(spark):
    """(a,b,c,d) = (2,1,1,2): OR = 4e6, RR = 2e6, Yule's Q =
    (4-1)/(4+1) = 600000 ppm exactly."""
    from kafka_streams_aggregate_spark.operators.stats import assoc_2x2

    rows = (
        [("g", True, True)] * 2
        + [("g", True, False)]
        + [("g", False, True)]
        + [("g", False, False)] * 2
    )
    df = spark.createDataFrame(rows, "g string, e boolean, o boolean")
    [r] = assoc_2x2(df, "g", "e", "o").collect()
    assert (r["a"], r["b"], r["c"], r["d"]) == (2, 1, 1, 2)
    assert r["or_ppm"] == 4_000_000
    assert r["rr_ppm"] == 2_000_000
    assert r["yule_q_ppm"] == 600_000


def test_pettitt_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import pettitt_test
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
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )
    got = pettitt_test(base, "g", "t", "v").toPandas()
    _cmp(got, _duck(PETTITT_ORACLE), ["group_key"])


def test_pettitt_hand_values(spark):
    """Level shift after t=3 (1,2,3 then 101,102,103): doubled
    prefix U2 = -5,-8,-9,-8,-5 over t=1..5, so K2 = 9 at t = 3 and
    k2_ppm = 1e6*9 div 30 = 300000. Single-point group: NULL stats."""
    from kafka_streams_aggregate_spark.operators.stats import pettitt_test

    rows = [("g", t, v) for t, v in
            [(1, 1), (2, 2), (3, 3), (4, 101), (5, 102), (6, 103)]]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = pettitt_test(df, "g", "t", "v").collect()
    assert (r["n"], r["t_at_max"], r["u2_at_max"], r["k2"]) == (6, 3, -9, 9)
    assert r["k2_ppm"] == 300_000

    one = [("h", 1, 42)]
    df2 = spark.createDataFrame(one, "g string, t long, v long")
    [r] = pettitt_test(df2, "g", "t", "v").collect()
    assert r["n"] == 1 and r["t_at_max"] is None and r["k2_ppm"] is None
