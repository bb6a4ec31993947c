"""Largest-remainder mixture allocation + md5-order draw —
pre-validation for the round-10 registration queue
(operators/sampling.py). Oracle text registration-ready.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
K = 97

ALLOC_ORACLE = """
    WITH counts AS (
        SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n
        FROM read_parquet('{sf}/documents.parquet') GROUP BY lang
    ),
    quotas AS (
        SELECT stratum, n,
               (CAST({k} AS BIGINT) * n) // SUM(n) OVER () AS quota_base,
               (CAST({k} AS BIGINT) * n) % SUM(n) OVER () AS quota_rem
        FROM counts
    )
    SELECT stratum, n,
           CAST(quota_base AS BIGINT) AS quota_base,
           CAST(quota_rem AS BIGINT) AS quota_rem,
           CAST(quota_base
                + CASE WHEN row_number() OVER (
                           ORDER BY quota_rem DESC, stratum ASC)
                        <= {k} - SUM(quota_base) OVER ()
                       THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM quotas
"""

DRAW_ORACLE = """
    WITH counts AS (
        SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n
        FROM read_parquet('{sf}/documents.parquet') GROUP BY lang
    ),
    quotas AS (
        SELECT stratum, n,
               (CAST({k} AS BIGINT) * n) // SUM(n) OVER () AS quota_base,
               (CAST({k} AS BIGINT) * n) % SUM(n) OVER () AS quota_rem
        FROM counts
    ),
    alloc AS (
        SELECT stratum,
               quota_base
               + CASE WHEN row_number() OVER (
                          ORDER BY quota_rem DESC, stratum ASC)
                       <= {k} - SUM(quota_base) OVER ()
                      THEN 1 ELSE 0 END AS alloc
        FROM quotas
    ),
    ranked AS (
        SELECT lang AS stratum, doc_id AS id,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(CONCAT('0x', substr(md5(
                       'mix|' || CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT), doc_id) AS BIGINT) AS draw_rank
        FROM read_parquet('{sf}/documents.parquet')
    )
    SELECT r.stratum, r.id, r.draw_rank
    FROM ranked r JOIN alloc a ON a.stratum = r.stratum
    WHERE r.draw_rank <= a.alloc
"""


def test_allocation_parity_and_invariant(spark):
    from kafka_streams_aggregate_spark.operators.sampling import (
        largest_remainder_allocation,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        largest_remainder_allocation(docs, "lang", K)
        .toPandas()
        .sort_values("stratum")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ALLOC_ORACLE.format(sf=SF, k=K))
        .df()
        .sort_values("stratum")
        .reset_index(drop=True)
    )
    con.close()
    assert got["alloc"].sum() == K  # the defining Hamilton invariant
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_draw_parity_and_partitioning(spark):
    from kafka_streams_aggregate_spark.operators.sampling import (
        allocated_sample,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF)
    got = (
        allocated_sample(docs, "lang", "doc_id", K)
        .toPandas()
        .sort_values(["stratum", "draw_rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(DRAW_ORACLE.format(sf=SF, k=K))
        .df()
        .sort_values(["stratum", "draw_rank"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == K
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    again = (
        allocated_sample(docs.repartition(13), "lang", "doc_id", K)
        .toPandas()
        .sort_values(["stratum", "draw_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_allocation_hand_values(spark):
    """K=10 over counts 5/3/2 with quota 10*n/10 = n: exact, no
    remainders; K=7 over 5/3/2: bases 3/2/1 (floor 3.5/2.1/1.4),
    remainders 5/1/4 -> the 7th seat goes to the largest remainder."""
    from kafka_streams_aggregate_spark.operators.sampling import (
        largest_remainder_allocation,
    )

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "s string")
    got = {
        r["stratum"]: r["alloc"]
        for r in largest_remainder_allocation(df, "s", 7).collect()
    }
    assert got == {"a": 4, "b": 2, "c": 1}
    got10 = {
        r["stratum"]: r["alloc"]
        for r in largest_remainder_allocation(df, "s", 10).collect()
    }
    assert got10 == {"a": 5, "b": 3, "c": 2}


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=12),
    st.integers(0, 300),
)
def test_hamilton_properties(counts, budget):
    """Pure-Python restatement of the operator's quota logic: the
    Hamilton invariants — sum(alloc) == budget (when budget <= total)
    and every stratum within 1 of its exact proportional quota
    ("satisfies quota")."""
    total = sum(counts)
    strata = list(range(len(counts)))
    base = {i: (budget * n) // total for i, n in zip(strata, counts)}
    rem = {i: (budget * n) % total for i, n in zip(strata, counts)}
    extra = budget - sum(base.values())
    order = sorted(strata, key=lambda i: (-rem[i], i))
    alloc = {
        i: base[i] + (1 if rank < extra else 0)
        for rank, i in [(order.index(i), i) for i in strata]
    }
    if budget <= total:
        assert sum(alloc.values()) == budget
    for i, n in zip(strata, counts):
        exact = budget * n / total
        assert exact - 1 < alloc[i] < exact + 1, (
            f"stratum {i} violates quota: {alloc[i]} vs {exact}"
        )
