"""Z-order (Morton) spatial bucketing — the data-LAYOUT operator for
multidimensional locality at 100 TB.

A Morton code interleaves the bits of two bounded integer coordinates
so that points close in 2-D space land close on the 1-D code line;
sorting / range-partitioning / file-clustering by the code (what Delta
Lake's ``ZORDER BY`` and Iceberg's z-ordering do) turns 2-D bbox
predicates into narrow code ranges, so min/max file statistics prune
scans that a single-column sort could not. This module provides the
code itself plus the bucket-statistics rollup that DEMONSTRATES the
locality (each bucket's bounding box is a tight quadrant tile —
exactly the file-level min/max a writer would embed).

Cross-engine exactness: the interleave is spelled as pure div/mod
arithmetic — ``((x div 2^i) % 2) * 2^(2i)`` summed over bit positions
— identical int64 math in Spark and DuckDB (NO ``<<``/``>>``
operators: the engines disagree on shift overflow semantics past bit
62, and DuckDB errors where the JVM wraps — the repo's bloom-mask
rule). With ``bits <= 16`` every constant is < 2^32 and the full code
< 2^32: far inside int64.

Scale shape: the code is ONE embarrassingly-parallel projection (a
32-term codegen sum, no shuffle); the bucket rollup is one map-side-
combinable aggregate on the derived bucket key. Re-clustering a table
by code = ``repartitionByRange(morton)`` — one range shuffle, the
write-side cost that buys every later scan's pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "morton_expr_sql",
    "morton_key",
    "zorder_bucket_stats",
    "grid_neighbor_join",
    "zorder_prune_compare",
]


def morton_expr_sql(
    x_col: str, y_col: str, bits: int = 16, idiv: str = "div"
) -> str:
    """The Morton-interleave expression as SQL text — the SAME
    generator serves both engines so the arithmetic cannot drift; the
    single dialect difference is the integer-division token
    (``idiv="div"`` for Spark, ``idiv="//"`` for DuckDB — ``%`` and
    ``*``/``+`` agree). x occupies even output bits, y odd.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(({x_col} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y_col} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def morton_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "morton",
) -> DataFrame:
    """Append the Morton code of two bounded integer coordinates.

    Contract: 0 <= x, y < 2^bits (caller scales/clips; out-of-range
    inputs produce codes that still sort but no longer tile). The
    projection is one whole-stage-codegen sum — no shuffle, no Python.
    """
    return df.withColumn(out_col, F.expr(morton_expr_sql(x_col, y_col, bits)))


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Bucket points by their top ``bucket_bits`` Morton bits and roll
    up per-bucket extent statistics — the file-level min/max profile a
    z-ordered writer would produce, and the direct evidence of
    locality: each bucket's (x, y) bbox is one aligned quadtree tile
    of side 2^(bits - ceil(bucket_bits/2)) instead of a full-width
    stripe.

    Output (all exact int64): (bucket, n, x_min, x_max, y_min, y_max),
    one row per non-empty bucket, bucket = morton div 2^(2*bits -
    bucket_bits).
    """
    shift = 1 << (2 * bits - bucket_bits)
    coded = morton_key(df, x_col, y_col, bits)
    return (
        coded.groupBy(
            F.expr(f"CAST(morton div {shift} AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(x_col).cast("bigint").alias("x_min"),
            F.max(x_col).cast("bigint").alias("x_max"),
            F.min(y_col).cast("bigint").alias("y_min"),
            F.max(y_col).cast("bigint").alias("y_max"),
        )
    )


def grid_neighbor_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """Spatial self-join: all point pairs within EUCLIDEAN distance
    ``radius`` (squared-distance form — exact int64, no sqrt), via the
    grid-file candidate pattern that keeps a 100 TB self-join linear:
    bucket points into radius-sized cells, generate candidates only
    from each point's 3x3 cell neighborhood, then verify exactly.
    Work is sum over cells of |cell| * |neighborhood| instead of n²
    — the same candidates-then-verify shape as the LSH dedup family,
    with the grid playing the band index.

    Pair-once construction: each point joins as HOME (its own cell)
    and as PROBE (exploded to the 9 neighbor cells); equi-join on the
    cell key finds every near pair exactly twice (once per direction),
    and the ``home.id < probe.id`` filter keeps one. The equi-join
    shuffles on the cell key — no crossJoin anywhere.

    Contract: integer coordinates, 0 <= x,y (cells via integer div);
    radius >= 1. Output: (id_a, id_b, dist_sq), id_a < id_b, exact.

    Skew note: at scale a hot cell (urban cluster) concentrates work;
    the standard fix composes here unchanged — salt the HOME side's
    cell key and replicate the PROBE side per salt.
    """
    cell = radius
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.expr(f"CAST({x_col} div {cell} AS BIGINT)").alias("cx"),
        F.expr(f"CAST({y_col} div {cell} AS BIGINT)").alias("cy"),
    )
    home = base.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cx",
        "cy",
    )
    probe = base.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.explode(
            F.expr("array(-1, 0, 1)")
        ).alias("ox"),
        "cx",
        "cy",
    ).select(
        "id_b",
        "xb",
        "yb",
        (F.col("cx") + F.col("ox")).alias("cx"),
        F.explode(F.expr("array(cy - 1, cy, cy + 1)")).alias("cy"),
    )
    return (
        home.join(probe, ["cx", "cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist_sq",
            (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).cast("bigint"),
        )
        .where(F.col("dist_sq") <= F.lit(radius * radius))
        .select("id_a", "id_b", "dist_sq")
    )


def zorder_prune_compare(
    points: DataFrame,
    x_col: str,
    y_col: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Quantify the Z-order layout win: for one 2-D bbox predicate,
    how many rows must be SCANNED (file-statistics pruning on
    per-bucket (x, y) min/max — exactly what a parquet reader does
    with row-group stats) under two layouts of the SAME data into the
    SAME number of buckets:

      * ``zorder``: buckets = top ``bucket_bits`` Morton bits
        (aligned quadtree tiles -> both dimensions prune);
      * ``xsort``:  buckets = equal-width x ranges (a single-column
        sort layout -> y stats are full-range stripes and prune
        nothing on uniform data).

    Both layouts get identical treatment: real per-bucket bboxes from
    the data, a bucket is scanned iff its bbox intersects the query
    box. All counts exact int64; ``scan_ppm`` = (1e6 * rows_scanned)
    div n_total. The matching-row count is the same under any layout
    and is reported for reference.

    Shape: one projection + two bucket rollups (each map-side
    combinable, bucket-table sized) + scalar aggregates — no joins.
    Output: 2 rows (layout, n_total, n_match, n_buckets,
    buckets_scanned, rows_scanned, scan_ppm).
    """
    n_buckets = 1 << bucket_bits
    zshift = 1 << (2 * bits - bucket_bits)
    xwidth = (1 << bits) // n_buckets
    coded = morton_key(points, x_col, y_col, bits).select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.expr(f"CAST(morton div {zshift} AS BIGINT)").alias("zb"),
        F.expr(f"CAST({x_col} div {xwidth} AS BIGINT)").alias("xb"),
    )
    in_box = (
        (F.col("x") >= x_lo)
        & (F.col("x") <= x_hi)
        & (F.col("y") >= y_lo)
        & (F.col("y") <= y_hi)
    )
    totals = coded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(in_box.cast("bigint")).cast("bigint").alias("n_match"),
    )

    def _layout(bucket_col: str, name: str) -> DataFrame:
        stats = coded.groupBy(bucket_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        hit = ~(
            (F.col("x_max") < x_lo)
            | (F.col("x_min") > x_hi)
            | (F.col("y_max") < y_lo)
            | (F.col("y_min") > y_hi)
        )
        return stats.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(hit.cast("bigint")).cast("bigint").alias("buckets_scanned"),
            F.sum(F.when(hit, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )

    layouts = _layout("zb", "zorder").unionByName(_layout("xb", "xsort"))
    return layouts.crossJoin(F.broadcast(totals)).select(
        "layout",
        "n_total",
        "n_match",
        "n_buckets",
        "buckets_scanned",
        "rows_scanned",
        F.expr("CAST((1000000 * rows_scanned) div n_total AS BIGINT)").alias(
            "scan_ppm"
        ),
    )


def morton3_expr_sql(
    x_col: str, y_col: str, z_col: str, bits: int = 16, idiv: str = "div"
) -> str:
    """Three-way Morton interleave as SQL text — the 3-D
    generalization SURVEY §9 earmarked (same single-generator
    discipline as ``morton_expr_sql``: both engines run the same
    div/mod arithmetic, only the integer-division token differs).
    x gets output bits 0, 3, 6, ...; y bits 1, 4, 7, ...; z bits
    2, 5, 8, .... 3*bits <= 62 (the shift cap) -> bits <= 20."""
    if 3 * bits > 62:
        raise ValueError("morton3: 3*bits must stay under the 62-bit cap")
    terms = []
    for i in range(bits):
        terms.append(f"(({x_col} {idiv} {1 << i}) % 2) * {1 << (3 * i)}")
        terms.append(f"(({y_col} {idiv} {1 << i}) % 2) * {1 << (3 * i + 1)}")
        terms.append(f"(({z_col} {idiv} {1 << i}) % 2) * {1 << (3 * i + 2)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder3d_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Per-bucket extent rollup for the 3-D Morton layout — the
    (x, y, time) spatio-temporal data-layout story: bucket by the top
    ``bucket_bits`` Morton bits; with bucket_bits divisible by 3
    every bucket's bbox is one aligned OCTREE cell of side
    2^(bits - bucket_bits/3) on each axis, so row-group stats prune
    3-D box predicates. All exact int64; one aggregate."""
    shift = 1 << (3 * bits - bucket_bits)
    coded = df.withColumn(
        "morton3", F.expr(morton3_expr_sql(x_col, y_col, z_col, bits))
    )
    return (
        coded.groupBy(
            F.expr(f"CAST(morton3 div {shift} AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(x_col).cast("bigint").alias("x_min"),
            F.max(x_col).cast("bigint").alias("x_max"),
            F.min(y_col).cast("bigint").alias("y_min"),
            F.max(y_col).cast("bigint").alias("y_max"),
            F.min(z_col).cast("bigint").alias("z_min"),
            F.max(z_col).cast("bigint").alias("z_max"),
        )
    )


def knn_grid(
    points: DataFrame,
    queries: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    k: int,
) -> DataFrame:
    """Bounded-radius k-nearest-neighbors via the grid-file candidate
    pattern — for every query point, the k nearest data points within
    EUCLIDEAN distance ``radius`` (the documented contract: the 3x3
    neighborhood of radius-sized cells makes the within-radius
    candidate set COMPLETE, so truncating at k is exact for the
    bounded-radius problem; unbounded exact kNN would need ring
    expansion). The similarity-search shape on coordinates instead of
    embeddings — candidates from the grid, exact integer
    squared-distance verify, per-query top-k with the total order
    (dist_sq, id_b).

    ``queries`` is an id-frame (subset of ``points`` ids — the probe
    scoping knob); self-matches are excluded. Output: (id_a, id_b,
    dist_sq, rank), rank 1..k per id_a."""
    cell = radius
    base = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        F.expr(f"CAST({x_col} div {cell} AS BIGINT)").alias("cx"),
        F.expr(f"CAST({y_col} div {cell} AS BIGINT)").alias("cy"),
    )
    home = (
        base.join(
            queries.select(F.col(id_col).alias("id")).dropDuplicates(), "id"
        )
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            "cx",
            "cy",
        )
    )
    probe = base.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.explode(F.expr("array(-1, 0, 1)")).alias("ox"),
        "cx",
        "cy",
    ).select(
        "id_b",
        "xb",
        "yb",
        (F.col("cx") + F.col("ox")).alias("cx"),
        F.explode(F.expr("array(cy - 1, cy, cy + 1)")).alias("cy"),
    )
    cands = (
        home.join(probe, ["cx", "cy"])
        .where(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "dist_sq",
            (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).cast("bigint"),
        )
        .where(F.col("dist_sq") <= F.lit(radius * radius))
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("dist_sq").asc(), F.col("id_b").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("id_a", "id_b", "dist_sq", "rank")
    )


def spatial_autocorr(
    points: DataFrame,
    x_col: str = "gx",
    y_col: str = "gy",
    v_col: str = "v",
) -> DataFrame:
    """Moran's I and Geary's C over a cell grid — the two classic
    spatial-autocorrelation statistics (clustered / random / dispersed
    values), exact-integer end to end under rook (4-neighbor) binary
    weights.

    Input is one row per occupied cell (gx, gy, v). With Z_i =
    n*v_i - S (the n-scaled centered value, exact), the n^2 scale
    factors cancel in both ratios:

        I = (n * sum_w Z_i Z_j) / (W * sum Z_i^2)
            -> moran_ppm = (1e6 * n * 2*CP) div (W * SZ2)
        C = ((n-1) * sum_w (Z_i - Z_j)^2) / (2W * sum Z_i^2)
            -> geary_ppm = (1e6 * (n-1) * DP) div (W * SZ2)

    where CP / DP are the cross-product and squared-difference sums
    over UNORDERED adjacent pairs and W = 2 * #pairs (directed count).
    Adjacency is two equi-joins (right neighbor + down neighbor) and
    a union — never an OR-join that would plan a nested loop. All
    products on DECIMAL(38,0); signed numerators are parity-safe (the
    round-12 rule). Expectation under no autocorrelation: I ~ -1/(n-1)
    (emitted as expected_i_ppm), C ~ 1e6. Positive autocorrelation:
    I > E[I], C < 1e6. NULL stats when W = 0 or SZ2 = 0. Output one
    row: (n_cells, w_edges, expected_i_ppm, moran_ppm, geary_ppm)."""
    cells = points.select(
        F.col(x_col).cast("bigint").alias("gx"),
        F.col(y_col).cast("bigint").alias("gy"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    mom = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    z = cells.crossJoin(F.broadcast(mom)).select(
        "gx",
        "gy",
        "n",
        F.expr("CAST(n AS DECIMAL(38,0)) * v - s").alias("z"),
    )
    a = z.select("gx", "gy", F.col("z").alias("za"))
    right = a.join(
        z.select(
            (F.col("gx") - 1).alias("gx"),
            F.col("gy").alias("gy"),
            F.col("z").alias("zb"),
        ),
        ["gx", "gy"],
    )
    down = a.join(
        z.select(
            F.col("gx").alias("gx"),
            (F.col("gy") - 1).alias("gy"),
            F.col("z").alias("zb"),
        ),
        ["gx", "gy"],
    )
    pairs = right.unionByName(down)
    pagg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("za * zb")).alias("cp"),
        F.sum(F.expr("(za - zb) * (za - zb)")).alias("dp"),
    )
    sz2 = z.agg(
        F.max("n").cast("bigint").alias("n_cells"),
        F.sum(F.expr("z * z")).alias("sz2"),
    )
    return (
        sz2.crossJoin(F.broadcast(pagg))
        .select(
            "n_cells",
            (F.col("n_pairs") * 2).cast("bigint").alias("w_edges"),
            F.expr(
                "CASE WHEN n_cells > 1 THEN"
                " CAST(-1000000 div (n_cells - 1) AS BIGINT) END"
            ).alias("expected_i_ppm"),
            F.expr(
                "CASE WHEN n_pairs > 0 AND sz2 > 0 THEN"
                " CAST((CAST(1000000 AS DECIMAL(38,0)) * n_cells"
                " * 2 * cp) div ((2 * n_pairs) * sz2) AS BIGINT) END"
            ).alias("moran_ppm"),
            F.expr(
                "CASE WHEN n_pairs > 0 AND sz2 > 0 THEN"
                " CAST((CAST(1000000 AS DECIMAL(38,0)) * (n_cells - 1)"
                " * dp) div ((2 * n_pairs) * sz2) AS BIGINT) END"
            ).alias("geary_ppm"),
        )
    )


def getis_ord_g(
    points: DataFrame,
    x_col: str = "gx",
    y_col: str = "gy",
    v_col: str = "v",
) -> DataFrame:
    """Global Getis-Ord G over a cell grid — the HOT-SPOT statistic
    completing the spatial_autocorr pair: Moran's I asks "do similar
    values cluster" (deviations, sign-free), G asks "do HIGH values
    cluster" (raw positive mass):

        G = sum_w v_i v_j / sum_{i!=j} v_i v_j
          -> g_ppm = (1e6 * 2 * sum_pairs v_a v_b) div (S^2 - sum v^2)

    under rook binary weights (the same two-equi-join adjacency as
    spatial_autocorr — never an OR nested loop). Defined for
    non-negative v. Expectation under spatial randomness is
    W / (n(n-1)) (emitted as expected_g_ppm); G > E[G] = high values
    cluster. All exact DECIMAL(38,0); NULL when the denominator or
    edge set is empty. Output: (n_cells, w_edges, g_ppm,
    expected_g_ppm)."""
    cells = points.select(
        F.col(x_col).cast("bigint").alias("gx"),
        F.col(y_col).cast("bigint").alias("gy"),
        F.col(v_col).cast("bigint").alias("v"),
    )
    a = cells.select("gx", "gy", F.col("v").alias("va"))
    right = a.join(
        cells.select(
            (F.col("gx") - 1).alias("gx"), "gy", F.col("v").alias("vb")
        ),
        ["gx", "gy"],
    )
    down = a.join(
        cells.select(
            "gx", (F.col("gy") - 1).alias("gy"), F.col("v").alias("vb")
        ),
        ["gx", "gy"],
    )
    pagg = right.unionByName(down).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("CAST(va AS DECIMAL(38,0)) * vb")).alias("_wp"),
    )
    tot = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0))")).alias("_s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("_q"),
    )
    return tot.crossJoin(F.broadcast(pagg)).select(
        "n_cells",
        (F.col("n_pairs") * 2).cast("bigint").alias("w_edges"),
        F.expr(
            "CASE WHEN n_pairs > 0 AND _s * _s - _q > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * 2 * _wp)"
            " div (_s * _s - _q) AS BIGINT) END"
        ).alias("g_ppm"),
        F.expr(
            "CASE WHEN n_cells > 1 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * 2 * n_pairs)"
            " div (CAST(n_cells AS DECIMAL(38,0)) * (n_cells - 1))"
            " AS BIGINT) END"
        ).alias("expected_g_ppm"),
    )


def join_counts(
    points: DataFrame,
    x_col: str = "gx",
    y_col: str = "gy",
    flag_col: str = "is_b",
) -> DataFrame:
    """Join-count statistics over a cell grid — spatial autocorrelation
    for CATEGORICAL (binary B/W) data, where Moran/Geary/G don't
    apply: count rook edges joining B-B, W-W and B-W cells and compare
    the mixed count to its expectation under nonfree sampling,

        E[BW] = 2 * J * nB * nW / (n * (n-1))      (J = #edges)

    emitted exactly as e_bw_milli = (1000 * 2 * J * nB * nW) div
    (n * (n-1)) plus the observed/expected ratio in ppm: BW below
    expectation = like-with-like clustering (positive spatial
    association), above = checkerboard dispersion. All exact integer
    counts and floors. Output: (n_cells, n_b, n_w, n_edges, bb, ww,
    bw, e_bw_milli, bw_ratio_ppm)."""
    cells = points.select(
        F.col(x_col).cast("bigint").alias("gx"),
        F.col(y_col).cast("bigint").alias("gy"),
        F.col(flag_col).cast("boolean").alias("b"),
    )
    a = cells.select("gx", "gy", F.col("b").alias("ba"))
    right = a.join(
        cells.select(
            (F.col("gx") - 1).alias("gx"), "gy", F.col("b").alias("bb_")
        ),
        ["gx", "gy"],
    )
    down = a.join(
        cells.select(
            "gx", (F.col("gy") - 1).alias("gy"), F.col("b").alias("bb_")
        ),
        ["gx", "gy"],
    )
    pagg = right.unionByName(down).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(F.expr("CASE WHEN ba AND bb_ THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("bb"),
        F.sum(F.expr("CASE WHEN NOT ba AND NOT bb_ THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("ww"),
        F.sum(F.expr("CASE WHEN ba <> bb_ THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("bw"),
    )
    tot = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.expr("CASE WHEN b THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.expr("CASE WHEN b THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("n_w"),
    )
    return tot.crossJoin(F.broadcast(pagg)).select(
        "n_cells",
        "n_b",
        "n_w",
        "n_edges",
        "bb",
        "ww",
        "bw",
        F.expr(
            "CASE WHEN n_cells > 1 THEN"
            " CAST((CAST(1000 AS DECIMAL(38,0)) * 2 * n_edges * n_b * n_w)"
            " div (CAST(n_cells AS DECIMAL(38,0)) * (n_cells - 1))"
            " AS BIGINT) END"
        ).alias("e_bw_milli"),
        F.expr(
            "CASE WHEN n_edges > 0 AND n_b > 0 AND n_w > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * bw"
            " * CAST(n_cells AS DECIMAL(38,0)) * (n_cells - 1))"
            " div (CAST(2 AS DECIMAL(38,0)) * n_edges * n_b * n_w)"
            " AS BIGINT) END"
        ).alias("bw_ratio_ppm"),
    )
