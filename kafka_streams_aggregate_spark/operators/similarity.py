"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force cosine top-k   the exact baseline: broadcast the (small)
                             query set against the corpus, evaluate
                             cosine with codegen'd higher-order
                             functions, window top-k per query.
  LSH-bucketed ANN           the scale path: random-hyperplane sign
                             codes bucket the corpus; queries probe
                             their bucket (plus optional multi-probe),
                             exact re-rank inside the bucket only.

At 100 TB the brute-force path is still the right *inner* kernel —
LSH/IVF only shrink the candidate set; the re-rank math is identical.
Neither path ever collects vectors to the driver.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

from kafka_streams_aggregate_spark.functions.vectors import as_double_array, cosine
from kafka_streams_aggregate_spark.operators.windows import topk_per_group


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Output: (query_id, neighbor_id, sim, rank).

    The query side is broadcast (it is small by construction); the
    corpus never shuffles until the final per-query top-k window, which
    moves only (query, id, sim) triples — not vectors."""
    q = queries.select(
        F.col(query_id), as_double_array(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), as_double_array(vec_col).alias("_cvec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col("neighbor_id"))
    ranked = topk_per_group(
        scored,
        [query_id],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return ranked.select(
        query_id, "neighbor_id", "sim", F.row_number().over(w).alias("rank")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_code(vec_col, planes: list[list[float]]):
    """Sign-bit code: bit i set iff dot(vec, plane_i) >= 0. Pure
    higher-order-function expression over literal plane arrays."""
    code = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        shifted = F.shiftleft(bit, i)
        code = shifted if code is None else code.bitwiseOR(shifted)
    return code


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane sign
    code, exact cosine re-rank within the shared bucket. Recall depends
    on n_planes (fewer planes = bigger buckets = higher recall, more
    work). Output: (query_id, neighbor_id, sim, rank) — approximate.
    """
    planes = _hyperplanes(n_planes, dim, seed)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        as_double_array(vec_col).alias("_cvec"),
    ).withColumn("_bucket", lsh_bucket_code(F.col("_cvec"), planes))
    q = queries.select(
        F.col(query_id), as_double_array(vec_col).alias("_qvec")
    ).withColumn("_bucket", lsh_bucket_code(F.col("_qvec"), planes))

    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.2,
) -> DataFrame:
    """All pairs with cosine >= threshold — embedding-based near-dup
    detection. Brute-force O(n^2) pair evaluation, kept JVM-side; for
    the 100 TB corpus swap the pair generator for the LSH bucket join
    (ann_lsh_topk's bucketing) and keep this exact check as the verify
    stage. Output: (id_a, id_b, sim)."""
    a = corpus.select(
        F.col(corpus_id).alias("id_a"), as_double_array(vec_col).alias("_va")
    )
    b = corpus.select(
        F.col(corpus_id).alias("id_b"), as_double_array(vec_col).alias("_vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("_va"), F.col("_vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
