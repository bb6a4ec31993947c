"""Wave-2 round-10 operators: triangle counting, priority sampling.

Hand-graph pins for the wedge-join triangle enumeration (exactly-once
per triangle under canonical src<dst ordering) and determinism /
weight-monotonicity pins for priority sampling. Cross-engine parity is
covered registry-wide by tests/test_oracle_parity.py.
"""

from __future__ import annotations


def test_triangle_counts_k4(spark):
    """K4 has 4 triangles; every node sits in exactly 3 of them."""
    from kafka_streams_aggregate_spark.operators.graph import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_with_tail(spark):
    """Triangle 1-2-3 plus tail edge 3-4: the tail node joins no
    triangle and must not appear; corners counted once each."""
    from kafka_streams_aggregate_spark.operators.graph import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["n_triangles"], r["rank"])
        for r in triangle_counts(edges).collect()
    }
    assert got == {1: (1, 1), 2: (1, 2), 3: (1, 3)}


def test_priority_sample_determinism_and_weight_bias(spark):
    """Same input under different partitioning -> identical sample;
    and a row with overwhelming weight always wins rank 1."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(i, 100 + (i * 37) % 50) for i in range(1, 401)]
    rows.append((999, 10**9))  # whale weight: pq >= 2^30 * 1e9 / 2^30
    df = spark.createDataFrame(rows, "k long, w long")
    a = sorted(
        tuple(r) for r in priority_sample(df, "k", "w", 25).collect()
    )
    b = sorted(
        tuple(r)
        for r in priority_sample(df.repartition(13), "k", "w", 25).collect()
    )
    assert a == b and len(a) == 25
    top = priority_sample(df, "k", "w", 1).collect()[0]
    assert top["key"] == 999 and top["rank"] == 1
