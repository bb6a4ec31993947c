"""Mann-Kendall trend test — pre-validation for the round-10
registration queue (operators/stats.py:mann_kendall).

The operator runs the O(n log n) Fenwick inversion count; the oracle
is the O(n^2) pair self-join a SQL engine can express — identical
exact-integer S, tie-corrected var_num, and a bit-equal z chain.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

MK_ORACLE = """
    WITH ordered AS (
        SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM read_parquet('{sf}/events.parquet')
    ),
    s AS (
        SELECT a.user_id,
               CAST(SUM(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM ordered a JOIN ordered b
          ON b.user_id = a.user_id AND b.rn > a.rn
        GROUP BY a.user_id
    ),
    nn AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM ordered
        GROUP BY user_id
    ),
    tie AS (
        SELECT user_id,
               CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                    AS BIGINT) AS tie_term
        FROM (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS t
            FROM ordered GROUP BY user_id, v
        ) GROUP BY user_id
    ),
    agg AS (
        SELECT nn.user_id, nn.n, s.s_stat,
               nn.n * (nn.n - 1) * (2 * nn.n + 5) - tie.tie_term
                   AS var_num
        FROM nn JOIN s ON s.user_id = nn.user_id
        JOIN tie ON tie.user_id = nn.user_id
    )
    SELECT user_id AS group_key, n, s_stat,
           CAST(var_num AS BIGINT) AS var_num,
           CASE WHEN s_stat > 0
                THEN (s_stat - 1.0) / sqrt(var_num / 18.0)
                WHEN s_stat < 0
                THEN (s_stat + 1.0) / sqrt(var_num / 18.0)
                ELSE 0.0 END AS z_score
    FROM agg WHERE n >= 2
"""


def test_mann_kendall_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import mann_kendall
    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", SF).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )
    got = (
        mann_kendall(events, "user_id", "ts", "event_id", "v_cents")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(MK_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert [v.hex() for v in got["z_score"]] == [
        v.hex() for v in exp["z_score"]
    ]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-20, 20), min_size=2, max_size=80))
def test_fenwick_s_matches_bruteforce(vals):
    """The BIT inversion count (restated) == brute-force pair signs,
    including heavy-tie inputs."""
    sv = sorted(set(vals))
    pos = {v: i + 1 for i, v in enumerate(sv)}
    tree = [0] * (len(sv) + 1)

    def upd(i):
        while i <= len(sv):
            tree[i] += 1
            i += i & -i

    def qry(i):
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & -i
        return s

    conc = disc = 0
    for seen, v in enumerate(vals):
        k = pos[v]
        le = qry(k)
        conc += qry(k - 1)
        disc += seen - le
        upd(k)
    fast = conc - disc
    brute = sum(
        (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
    )
    assert fast == brute


def test_mann_kendall_known_trends(spark):
    """Strictly increasing -> S = n(n-1)/2 and z > 0; constant ->
    S = 0, var_num = 0, z = 0."""
    from kafka_streams_aggregate_spark.operators.stats import mann_kendall

    rows = [(1, i, i, 10 * i) for i in range(1, 11)] + [
        (2, i, i, 7) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "g long, t long, i long, v long")
    got = {
        r["group_key"]: (r["s_stat"], r["var_num"], r["z_score"])
        for r in mann_kendall(df, "g", "t", "i", "v").collect()
    }
    assert got[1][0] == 45 and got[1][2] > 0
    assert got[2] == (0, 0, 0.0)
