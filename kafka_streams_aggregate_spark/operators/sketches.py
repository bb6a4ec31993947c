"""Mergeable summary sketches with CELL-EXACT cross-engine semantics.

Three classic streaming/OLAP sketches — HyperLogLog, count-min, Bloom —
re-derived so every register/counter/bit is a pure integer function of
an md5-based hash both Spark and DuckDB compute bit-identically (the
round-5 hash-family trick: ``conv(substr(md5(x),1,15),16,10)`` ==
``('0x'||substr(md5(x),1,15))::BIGINT``). The usual reason sketch
outputs are unverifiable — engine-specific register layouts and float
harmonic means — is removed by:

- fixing OUR layout (md5 low bits pick the register, high bits the
  rho), and
- keeping the register aggregation in scaled INTEGER space
  (``2^(30-rho)`` summed as BIGINT), so the only float op is one final
  literal-constant division, which IEEE rounds identically everywhere.

Scale shape (the reason these exist at 100 TB): each sketch is a
bounded-size, mergeable aggregate — HLL is m registers per group, CMS
is a fixed d×w counter grid, Bloom is a fixed word array. All three
build with ONE map-side-combinable shuffle regardless of input size,
and the built summary broadcasts to later stages (the Bloom build is
exactly Spark's runtime-filter/InSubqueryExec pattern, made explicit
and auditable).

Reference parity note: the reference app (kafka-streams-aggregate) has
no sketches — this module is part of the mandated beyond-reference
build-out (SURVEY.md §2.3, training-data-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Shared md5-derived 60-bit hash pair — owned by functions/hashing.py
# (re-exported here for the sketch call sites).
from kafka_streams_aggregate_spark.functions.hashing import (  # noqa: E402
    hash60,
    hash60_sql,
)


# --------------------------------------------------------------------------
# HyperLogLog with integer-exact registers.
# --------------------------------------------------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W_BITS = 60 - HLL_P  # 54-bit rho window
HLL_RHO_CAP = 30  # keeps 2^(cap - rho) an exact BIGINT term
# alpha_64 * m^2 * 2^cap — folded to one Python float literal so both
# engines divide the SAME double by the integer register sum.
HLL_ALPHA_64 = 0.709
HLL_EST_NUM = HLL_ALPHA_64 * float(HLL_M * HLL_M) * float(1 << HLL_RHO_CAP)


def hll_registers(df: DataFrame, key: Column, group: Column) -> DataFrame:
    """Per-group HLL register table: (group, idx, r) with r = max rho.

    rho is ``1 + leading-zeros`` of the 54-bit suffix, computed as
    ``55 - length(bin(w))`` — both engines' ``bin()`` strips leading
    zeros, so the expression is engine-portable integer arithmetic
    (no log2 / floating transcendentals, which differ in the last ulp
    across libm implementations).
    """
    return (
        hll_row_terms(df, key, group)
        .groupBy("grp", "idx")
        .agg(F.max("r").alias("r"))
    )


def hll_row_terms(df: DataFrame, key: Column, group: Column) -> DataFrame:
    """Per-ROW register contribution (grp, idx, r) — the pre-aggregate
    projection of :func:`hll_registers`, exposed separately so a
    STREAMING aggregation can take the max(r) per (grp, idx) with
    Spark's built-in stateful max (HLL registers are max-merge
    monoids, which is exactly what makes the sketch
    streaming/partition/order agnostic)."""
    hv = hash60(key.cast("string"))
    base = df.select(group.alias("grp"), hv.alias("hv"))
    w = F.expr(f"hv div {HLL_M}")
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        base.withColumn("idx", (F.col("hv") % HLL_M).cast("int"))
        .withColumn("r", F.least(rho, F.lit(HLL_RHO_CAP)).cast("int"))
        .select("grp", "idx", "r")
    )


def hll_summarize(regs: DataFrame) -> DataFrame:
    """Fold a register table to per-group estimate columns.

    The harmonic mean stays in scaled-integer space: each register
    contributes ``2^(30-r)`` (empty registers contribute ``2^30``),
    summed as BIGINT — so ``scaled_sum`` is exactly comparable across
    engines, and the estimate is one deterministic double division.
    """
    empty_term = 1 << HLL_RHO_CAP
    # pyspark's F.shiftleft needs a literal int shift; the SQL function
    # takes an expression shift, so drop to expr here.
    return (
        regs.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_registers_hit"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - r)"))
            .cast("bigint")
            .alias("hit_sum"),
            F.sum((F.col("idx") + 1).cast("bigint") * F.col("r"))
            .cast("bigint")
            .alias("register_checksum"),
        )
        .withColumn(
            "scaled_sum",
            F.col("hit_sum")
            + (F.lit(HLL_M) - F.col("n_registers_hit")) * F.lit(empty_term),
        )
        .withColumn(
            "est_distinct",
            F.lit(HLL_EST_NUM) / F.col("scaled_sum").cast("double"),
        )
        .drop("hit_sum")
    )


def hll_oracle_cte(key_sql: str, group_sql: str, table: str) -> str:
    """DuckDB twin of hll_registers + hll_summarize (shared CTE text)."""
    return f"""
    h AS (
        SELECT {group_sql} AS grp,
               {hash60_sql(f'CAST({key_sql} AS VARCHAR)')} AS hv
        FROM {table}
    ),
    regs AS (
        SELECT grp,
               CAST(hv % {HLL_M} AS INTEGER) AS idx,
               CAST(LEAST(
                   CASE WHEN hv // {HLL_M} = 0 THEN {HLL_W_BITS + 1}
                        ELSE {HLL_W_BITS + 1} - length(bin(hv // {HLL_M}))
                   END, {HLL_RHO_CAP}) AS INTEGER) AS r
        FROM h
    ),
    reg_max AS (
        SELECT grp, idx, MAX(r) AS r FROM regs GROUP BY grp, idx
    ),
    hll AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n_registers_hit,
               CAST(SUM(1::BIGINT << ({HLL_RHO_CAP} - r)) AS BIGINT)
                   AS hit_sum,
               CAST(SUM(CAST(idx + 1 AS BIGINT) * r) AS BIGINT)
                   AS register_checksum
        FROM reg_max GROUP BY grp
    ),
    hll_est AS (
        SELECT grp, n_registers_hit, register_checksum,
               hit_sum + ({HLL_M} - n_registers_hit)
                         * {1 << HLL_RHO_CAP}::BIGINT AS scaled_sum,
               {HLL_EST_NUM!r}
                   / CAST(hit_sum + ({HLL_M} - n_registers_hit)
                          * {1 << HLL_RHO_CAP}::BIGINT AS DOUBLE)
                   AS est_distinct
        FROM hll
    )"""


# --------------------------------------------------------------------------
# Count-min sketch.
# --------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 256  # counters per row


def cms_cols(key: Column) -> Column:
    """Array of the CMS_D column indices for a key (salted md5)."""
    return F.array(
        *[
            hash60(F.concat(F.lit(f"cms{j}:"), key.cast("string"))) % CMS_W
            for j in range(CMS_D)
        ]
    )


def cms_counters(df: DataFrame, key: Column) -> DataFrame:
    """The d×w counter grid: (j, col, cnt). At most d*w rows out.

    One shuffle; partial aggregation collapses the exploded rows
    map-side, so the exchange carries ≤ d*w rows per input partition
    no matter the input size.
    """
    return (
        df.select(F.posexplode(cms_cols(key)).alias("j", "col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_cols_sql_rows(key_sql: str, table: str, extra_cols: str = "") -> str:
    """UNION ALL text producing (j, col[, extra]) rows — DuckDB twin."""
    parts = []
    sel_extra = f"{extra_cols}, " if extra_cols else ""
    for j in range(CMS_D):
        h = hash60_sql(f"CONCAT('cms{j}:', CAST({key_sql} AS VARCHAR))")
        parts.append(
            f"SELECT {sel_extra}{j} AS j, {h} % {CMS_W} AS col FROM {table}"
        )
    return " UNION ALL ".join(parts)


# --------------------------------------------------------------------------
# Bloom filter (runtime-filter shape).
# --------------------------------------------------------------------------

BLOOM_K = 3  # hash functions
BLOOM_WORDS = 512  # BIGINT words
BLOOM_BITS_PER_WORD = 63  # bits 0..62: 1<<63 overflows signed int64
BLOOM_BITS = BLOOM_WORDS * BLOOM_BITS_PER_WORD


def bloom_positions(key: Column) -> Column:
    """Array of BLOOM_K bit positions in [0, BLOOM_BITS)."""
    return F.array(
        *[
            hash60(F.concat(F.lit(f"bloom{j}:"), key.cast("string")))
            % BLOOM_BITS
            for j in range(BLOOM_K)
        ]
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Word table (word, bloom_word) — ≤ BLOOM_WORDS rows, broadcastable.

    ``bit_or`` partial-aggregates map-side, so the exchange carries at
    most BLOOM_WORDS rows per input partition; the result is the
    explicit, auditable version of Spark's injected runtime filter.
    """
    pos = F.explode(bloom_positions(F.col(key_col))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr(f"pos div {BLOOM_BITS_PER_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bloom_word"))
    )


def bloom_probe(probe: DataFrame, key_col: str, words: DataFrame) -> DataFrame:
    """Adds boolean ``bloom_pass`` to ``probe`` (all K bits set).

    The word table is broadcast; each probe row explodes to K
    (word, mask) lookups, so the probe is a broadcast-hash-join scan —
    no shuffle of the probe side. Row multiplicity is preserved: the
    K per-row lookups regroup on a per-ROW id, not on the probe's
    column values — grouping on columns would both collapse duplicate
    probe rows and miscount their hits (K × multiplicity ≠ K, turning
    genuine members into false negatives).
    """
    probe_cols = probe.columns
    with_id = probe.withColumn("__probe_rid", F.monotonically_increasing_id())
    # explode_outer, not explode: md5(NULL) makes the positions array
    # NULL, and a plain explode would DROP that row entirely instead of
    # reporting bloom_pass=false — the outer variant keeps it as a
    # single NULL-pos row whose lookup misses, preserving the
    # row-preserving contract for nullable-key callers.
    exploded = with_id.select(
        "__probe_rid",
        *probe_cols,
        F.explode_outer(bloom_positions(F.col(key_col))).alias("pos"),
    ).select(
        "__probe_rid",
        *probe_cols,
        F.expr(f"pos div {BLOOM_BITS_PER_WORD}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
        ).alias("mask"),
    )
    joined = exploded.join(F.broadcast(words), "word", "left")
    hit = (
        F.col("bloom_word").isNotNull()
        & (F.col("bloom_word").bitwiseAND(F.col("mask")) == F.col("mask"))
    ).cast("int")
    return (
        joined.groupBy("__probe_rid", *probe_cols)
        .agg(F.sum(hit).alias("n_hits"))
        .withColumn("bloom_pass", F.col("n_hits") == BLOOM_K)
        .drop("n_hits", "__probe_rid")
    )


def bloom_positions_sql_rows(key_sql: str, table: str, extra_cols: str = "") -> str:
    """UNION ALL text producing (word, mask[, extra]) rows — DuckDB twin."""
    parts = []
    sel_extra = f"{extra_cols}, " if extra_cols else ""
    for j in range(BLOOM_K):
        h = hash60_sql(f"CONCAT('bloom{j}:', CAST({key_sql} AS VARCHAR))")
        parts.append(
            f"SELECT {sel_extra}({h} % {BLOOM_BITS}) // {BLOOM_BITS_PER_WORD}"
            f" AS word, 1::BIGINT << CAST(({h} % {BLOOM_BITS})"
            f" % {BLOOM_BITS_PER_WORD} AS INTEGER) AS mask FROM {table}"
        )
    return " UNION ALL ".join(parts)


# --------------------------------------------------------------------------
# Mergeable fixed-bin quantile sketch (HDR-histogram family, round 7).
#
# Approximate per-group percentiles in bounded memory: values bucket
# into NBINS fixed-width bins over a declared [lo, hi) range, the
# sketch is the per-group vector of bin counts (mergeable by vector
# add — exactly what the map-side partial aggregate does), and a
# percentile query answers with the upper edge of the first bin whose
# cumulative count reaches the integer ceil-rank. Error is bounded by
# one bin width by construction. Contrast with the EXACT per-group
# percentiles of q_latency_percentiles (full sort): the sketch is the
# 100 TB shape — state per group is O(NBINS) regardless of row count,
# the heavy exchange carries at most groups*NBINS rows after partial
# aggregation, and sketches from different partitions/days/streams
# merge losslessly.
#
# Cell-exact oracle-ability: bin = floor(v / width) uses the
# documented floor-division parity rule, ranks use the integer
# ceil-rank form (100*cum >= p*n, never ceil(p/100*n)), and the
# reported estimate (bin+1)*width is a BIGINT — no floats anywhere
# past the one IEEE-exact division.
# --------------------------------------------------------------------------


def hist_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    width: int,
    nbins: int,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-group approximate percentiles from a fixed-bin histogram.

    Returns one row per group: n_rows, p<NN>_est (upper bin edge, a
    BIGINT multiple of ``width``) per requested percentile, and
    err_bound = width.
    """
    binned = hist_bin_counts(df, group_col, value_col, width, nbins)
    return hist_quantile_recover(binned, group_col, width, percentiles)


def hist_bin_counts(
    df: DataFrame, group_col: str, value_col: str, width: int, nbins: int
) -> DataFrame:
    """The sketch itself: per-group bin-count vector rows (group, bin,
    c). Counts form a SUM-merge monoid — vector-adding two tables
    built over disjoint inputs equals one build over their union,
    which is what makes the sketch partition/stream/day mergeable."""
    bin_col = F.least(
        F.floor(F.col(value_col) / F.lit(float(width))).cast("bigint"),
        F.lit(nbins - 1),
    )
    return (
        df.select(F.col(group_col), F.greatest(bin_col, F.lit(0)).alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def hist_quantile_recover(
    binned: DataFrame,
    group_col: str,
    width: int,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Percentile recovery over a (group, bin, c) sketch table."""
    wcum = Window.partitionBy(group_col).orderBy("bin")
    wall = Window.partitionBy(group_col)
    cum = binned.select(
        group_col,
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    aggs = [F.max("n").alias("n_rows")]
    for p in percentiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("n") * p,
                    (F.col("bin") + 1) * width,
                )
            ).alias(f"p{p}_est")
        )
    return (
        cum.groupBy(group_col)
        .agg(*aggs)
        .withColumn("err_bound", F.lit(width).cast("bigint"))
    )


def hist_quantile_oracle(
    value_sql: str,
    group_sql: str,
    table: str,
    width: int,
    nbins: int,
    percentiles: tuple[int, ...] = (50, 90, 99),
    group_alias: str = "grp",
) -> str:
    """DuckDB twin of :func:`hist_quantile_sketch`."""
    est_cols = ",\n           ".join(
        f"CAST(MIN(CASE WHEN 100 * cum >= {p} * n"
        f" THEN (bin + 1) * {width} END) AS BIGINT) AS p{p}_est"
        for p in percentiles
    )
    return f"""
    WITH binned AS (
        SELECT {group_sql} AS {group_alias},
               greatest(least(CAST(floor(({value_sql}) / {width}.0) AS BIGINT),
                              {nbins - 1}), 0) AS bin,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM {table} GROUP BY 1, 2
    ),
    cum AS (
        SELECT {group_alias}, bin, c,
               SUM(c) OVER (PARTITION BY {group_alias} ORDER BY bin) AS cum,
               SUM(c) OVER (PARTITION BY {group_alias}) AS n
        FROM binned
    )
    SELECT {group_alias},
           CAST(MAX(n) AS BIGINT) AS n_rows,
           {est_cols},
           CAST({width} AS BIGINT) AS err_bound
    FROM cum GROUP BY {group_alias}
    """
