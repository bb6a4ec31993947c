"""LLM training-data preparation operators: context-window packing,
negative sampling, and train/val/test split-leakage auditing.

These are the steps between a deduplicated corpus and a training run:
pack documents into fixed token budgets (the concat-and-chunk layout
every LLM data pipeline ships), draw deterministic negatives for
contrastive objectives, and audit that near-duplicate documents do
not straddle split boundaries (the classic eval-contamination bug).

Everything rides the repo's exactness discipline: token counts and
chunk arithmetic are exact int64 window math; sampling and split
assignment use the md5 hash family (cross-engine bit-identical, the
round-5 parity trick), so every operator has a cell-exact DuckDB
oracle.

Reference scope note: the reference app (dturanski/
kafka-streams-aggregate, KafkaStreamsInventoryCountApplication.java)
has no data-prep surface — these are absent-category build-out rows
per SURVEY §2.3's LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_packing(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """Concat-and-chunk context-window packing layout, per source
    shard — the standard LLM pretraining data layout: documents are
    concatenated in (shard, doc_id) order into one token stream and
    cut into fixed ``budget``-token chunks; a document occupies
    stream offsets [prev_cum, cum) and therefore spans chunks
    ``prev_cum div B .. (cum-1) div B``. (Greedy no-split bin packing
    needs a reset-on-overflow fold with no closed form; concat-and-
    chunk IS the production choice — it wastes zero tokens and
    splits documents at chunk boundaries instead.)

    Whitespace token counts (empty tokens dropped — double spaces
    don't count), exact int64 cumulative window per shard; zero-token
    documents occupy no stream space (first = last = prev div B,
    never split). Output per document: (source, doc_id, n_tokens,
    start_off, first_chunk, last_chunk, n_chunks_spanned, is_split).
    One window per shard — packing is embarrassingly parallel across
    shards, the 100 TB shape."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"CAST(size(filter(split({text_col}, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
    )
    staged = toks.select(
        "source",
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .cast("bigint")
        .alias("start_off"),
    )
    return staged.select(
        "source",
        "doc_id",
        "n_tokens",
        "start_off",
        F.expr(f"CAST(start_off div {budget} AS BIGINT)").alias(
            "first_chunk"
        ),
        F.expr(
            "CAST(CASE WHEN n_tokens = 0 THEN start_off"
            f" ELSE start_off + n_tokens - 1 END div {budget} AS BIGINT)"
        ).alias("last_chunk"),
    ).select(
        "source",
        "doc_id",
        "n_tokens",
        "start_off",
        "first_chunk",
        "last_chunk",
        (F.col("last_chunk") - F.col("first_chunk") + 1)
        .cast("bigint")
        .alias("n_chunks_spanned"),
        (F.col("last_chunk") > F.col("first_chunk")).alias("is_split"),
    )


def negative_sampling(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    vocab_top: int = 256,
    doc_mod: int = 10,
) -> DataFrame:
    """Deterministic negative sampling for contrastive objectives
    (the word2vec/SGNS data-prep shape): for every positive
    (document, vocabulary-token) co-occurrence, draw ``k``
    pseudo-random negative tokens from the top-``vocab_top``
    vocabulary via the md5 hash family — bit-identical cross-engine,
    so the whole sample is oracle-able (no RNG state, no resampling
    loop: an "accidental hit" — a negative that actually occurs in
    the document — is FLAGGED, the standard high-throughput
    treatment, rather than redrawn).

    Vocabulary index = rank-1 by (count DESC, token) — a total order.
    Negative j for (doc, token) = vocab[ md5(doc||'#'||token||'#'||j)
    mod vocab_top ]. Positives scoped to ``doc_id % doc_mod = 0``
    (the registration scale knob). Output: (doc_id, token, j,
    neg_token, accidental). Plans as vocabulary-sized broadcast joins
    around one corpus token scan."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(f"filter(split({text_col}, ' '), x -> x != '')"))
        .alias("token"),
    )
    # top-vocab_top FIRST via sort+limit (TakeOrderedAndProject — the
    # repo's top-k discipline), THEN rank only those rows: the
    # unpartitioned row_number window sees vocab_top rows, never the
    # full vocabulary (round-12 advice fix).
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(vocab_top)
        .select(
            "token",
            (
                F.row_number().over(
                    Window.orderBy(F.col("cnt").desc(), F.col("token"))
                )
                - 1
            )
            .cast("bigint")
            .alias("vidx"),
        )
        .localCheckpoint(eager=True)  # feeds 3 consumers below
    )
    pos = (
        toks.where(F.col("doc_id") % doc_mod == 0)
        .join(F.broadcast(vocab.select("token")), "token")
        .select("doc_id", "token")
        .dropDuplicates()
        .localCheckpoint(eager=True)  # feeds the draw + the anti flag
    )
    draws = pos.select(
        "doc_id",
        "token",
        F.explode(F.expr(f"sequence(0, {k - 1})")).alias("j"),
    ).select(
        "doc_id",
        "token",
        F.col("j").cast("bigint").alias("j"),
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '#',"
            " token, '#', CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            f" % {vocab_top}"
        ).alias("vidx"),
    )
    named = draws.join(
        F.broadcast(vocab.select(F.col("vidx"), F.col("token").alias("neg_token"))),
        "vidx",
    )
    flagged = named.join(
        pos.select("doc_id", F.col("token").alias("neg_token"))
        .withColumn("_hit", F.lit(1)),
        ["doc_id", "neg_token"],
        "left",
    )
    return flagged.select(
        "doc_id",
        "token",
        "j",
        "neg_token",
        F.coalesce(F.col("_hit") == 1, F.lit(False)).alias("accidental"),
    )


def split_leakage_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    seed: int = 42,
    hash_family: str = "md5",
) -> DataFrame:
    """Train/val/test split-leakage audit — the eval-contamination
    check every LLM pipeline needs: assign documents to splits by a
    deterministic hash (md5(doc_id) mod 10 -> 0-7 train, 8 val, 9
    test), find near-duplicate pairs with the production MinHash-LSH
    machinery (banding -> candidates -> exact-Jaccard verify at
    ``threshold``), and report every pair that STRADDLES a split
    boundary — a test document with a train-side near-twin means the
    eval number is contaminated.

    Output: one row per unordered split-category pair (split_lo,
    split_hi, n_pairs) — diagonal rows are safe, off-diagonal rows
    are leaks — plus constant totals (n_pairs_total, n_leaked,
    leak_ppm) broadcast onto every row. md5 hash family end-to-end
    makes the audit fully DuckDB-reproducible."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        docs,
        id_col,
        text_col,
        threshold=threshold,
        seed=seed,
        hash_family=hash_family,
    ).select("id_a", "id_b")
    split_expr = (
        "CASE CAST(conv(substr(md5(CAST({c} AS STRING)), 1, 2), 16, 10)"
        " AS BIGINT) % 10"
        " WHEN 8 THEN 'val' WHEN 9 THEN 'test' ELSE 'train' END"
    )
    tagged = pairs.select(
        F.expr(split_expr.format(c="id_a")).alias("sa"),
        F.expr(split_expr.format(c="id_b")).alias("sb"),
    ).select(
        F.least("sa", "sb").alias("split_lo"),
        F.greatest("sa", "sb").alias("split_hi"),
    )
    per_cat = tagged.groupBy("split_lo", "split_hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    totals = per_cat.agg(
        F.sum("n_pairs").cast("bigint").alias("n_pairs_total"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("split_lo") != F.col("split_hi"), F.col("n_pairs")
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_leaked"),
    ).select(
        "n_pairs_total",
        "n_leaked",
        F.expr(
            "CASE WHEN n_pairs_total > 0 THEN"
            " CAST((1000000 * n_leaked) div n_pairs_total AS BIGINT) END"
        ).alias("leak_ppm"),
    )
    return per_cat.crossJoin(F.broadcast(totals))


def mixture_sample(
    docs: DataFrame,
    weights: DataFrame,
    total_n: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mixture construction — allocate a ``total_n``-document
    budget across sources by configured weights and draw each
    source's quota deterministically: the step that turns a curated
    corpus pool into an actual pretraining MIX (2 parts web, 1 part
    code, ...).

    Allocation is EXACT largest-remainder (Hamilton) apportionment:
    base_h = (total_n * w_h) div W, the leftover seats go to the
    largest remainders (ties by source name) — integer-only, sums to
    exactly total_n, no float shares. Selection within a source is
    the md5-rank order (md5(id), id) — deterministic, uniform-ish,
    and reproducible cross-engine; a source smaller than its quota
    reports the SHORTFALL as an audit column instead of silently
    redistributing (redistribution is a policy decision the caller
    makes explicitly). Sampled membership is summarized per source
    with exact checksums: id_sum and the ANSI-safe 31-bit md5
    residue sum (the round-9 additive-digest rule). One pop rollup +
    one source-sized window + one per-source rank window.

    ``weights``: (source, weight) with positive integer weights.
    Output: (source, n_pop, weight, n_alloc, n_sampled, shortfall,
    id_sum, digest31)."""
    sc = source_col
    pop = (
        docs.groupBy(F.col(sc).alias("source"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pop"))
        .join(
            weights.select(
                F.col(sc).alias("source"),
                F.col("weight").cast("bigint").alias("weight"),
            ),
            "source",
        )
    )
    w_tot = pop.agg(F.sum("weight").cast("bigint").alias("w"))
    staged = pop.crossJoin(F.broadcast(w_tot)).select(
        "source",
        "n_pop",
        "weight",
        F.expr(f"({total_n} * weight) div w").cast("bigint").alias("base"),
        F.expr(f"({total_n} * weight) % w").cast("bigint").alias("rem"),
    )
    w_left = Window.orderBy(F.col("rem").desc(), F.col("source"))
    w_all = Window.partitionBy()
    alloc = staged.select(
        "source",
        "n_pop",
        "weight",
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_left)
                <= F.lit(total_n) - F.sum("base").over(w_all),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    ).localCheckpoint(eager=True)  # source-sized; feeds the rank join
    ranked = docs.select(
        F.col(sc).alias("source"),
        F.col(id_col).cast("bigint").alias("id"),
        F.row_number()
        .over(
            Window.partitionBy(sc).orderBy(
                F.md5(F.col(id_col).cast("string")), F.col(id_col)
            )
        )
        .cast("bigint")
        .alias("rn"),
    )
    sampled = ranked.join(F.broadcast(alloc), "source").where(
        F.col("rn") <= F.col("n_alloc")
    )
    per_src = sampled.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("id").cast("bigint").alias("id_sum"),
        F.sum(
            F.expr(
                "CAST(conv(substr(md5(concat('dig#', CAST(id AS STRING))),"
                " 1, 7), 16, 10) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("digest31"),
    )
    return (
        alloc.join(per_src, "source", "left")
        .select(
            "source",
            "n_pop",
            "weight",
            "n_alloc",
            F.coalesce(F.col("n_sampled"), F.lit(0))
            .cast("bigint")
            .alias("n_sampled"),
            (
                F.col("n_alloc")
                - F.coalesce(F.col("n_sampled"), F.lit(0))
            )
            .cast("bigint")
            .alias("shortfall"),
            F.coalesce(F.col("id_sum"), F.lit(0)).cast("bigint").alias(
                "id_sum"
            ),
            F.coalesce(F.col("digest31"), F.lit(0))
            .cast("bigint")
            .alias("digest31"),
        )
    )


def corpus_prep_pipeline(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 16,
    threshold: float = 0.5,
    total_n: int = 1000,
    budget: int = 256,
    seed: int = 42,
) -> DataFrame:
    """End-to-end pretraining-corpus preparation pipeline — the
    integration capstone chaining the stages that exist as standalone
    operators, in the order a production pipeline runs them:

      0 raw          the corpus pool
      1 train_split  md5 80/10/10 split; val/test are FIXED from here
                     (dedup never deletes eval rows — the standard
                     contract; all later stages act on train only)
      2 quality      n_tokens >= min_tokens (deliberately simple,
                     exactly-oracled stand-in for the rule-table
                     gate; see text.py:quality_rule_gate for the
                     production surface)
      3 exact_dedup  keep min-id per md5(text) within the gated pool
      4 near_dedup   MinHash-LSH pairs at ``threshold`` (md5 family)
                     over train-survivors UNION eval; train-train
                     pairs drop the larger id
      5 decontam     surviving train docs near-dupping ANY val/test
                     doc are dropped (the split-leakage audit's
                     ACTION: a train twin of an eval doc contaminates
                     the eval number)
      6 sampled      exact Hamilton mixture over sources (weights
                     (idx%4)+1), md5-rank selection, budget total_n
      7 packed       concat-and-chunk packing stats of the sample

    Output: one row per stage — (stage, stage_name, n_docs, n_tokens,
    digest31, n_chunks, n_split_docs) — where digest31 pins the
    surviving MEMBERSHIP (31-bit md5 residue sum, the round-9
    additive-digest rule), not just counts: a stage that drops the
    right number of wrong rows fails the check. Stage 7 repeats stage
    6's membership columns (packing must preserve the set) and adds
    the chunk stats. Everything md5-family -> one staged-CTE DuckDB
    oracle verifies the whole integration.

    Scale shape: per-stage work is the component operators' (hash
    aggs, banded LSH joins, per-source windows); the funnel rows are
    eight 1-row aggregates. Small frames are localCheckpoint'd at the
    fan-out points (each stage feeds the next stage + its funnel row
    + anti-joins)."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    sc, ic, tc = source_col, id_col, text_col
    split_expr = (
        f"CASE CAST(conv(substr(md5(CAST({ic} AS STRING)), 1, 2), 16, 10)"
        " AS BIGINT) % 10"
        " WHEN 8 THEN 'val' WHEN 9 THEN 'test' ELSE 'train' END"
    )
    base = docs.select(
        F.col(sc).alias("source"),
        F.col(ic).alias("doc_id"),
        F.col(tc).alias("text"),
        F.expr(
            f"CAST(size(filter(split({tc}, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(split_expr).alias("split"),
    )
    # base is NOT checkpointed: it is a pure scan projection (cheap
    # codegen recompute, the r12 demand-intermittency lesson) and
    # materializing the raw corpus defeats the pipeline at scale.
    # Checkpoints below sit at shuffle-bearing fan-out points only.

    dig = (
        "CAST(conv(substr(md5(concat('dig#', CAST(doc_id AS STRING))),"
        " 1, 7), 16, 10) AS BIGINT)"
    )

    # r16-opt (guide §1.2/§2.4): stages 0/1/2 are cumulative filters
    # over base, so their three funnel rows collapse into ONE
    # conditional-aggregation pass (count/sum/digest guarded by the
    # stage predicate) instead of three scan+tokenize jobs — the sums
    # are over exactly the same row sets, so the eight output rows are
    # bit-identical (asserted row-for-row against the unfused form at
    # sf0.1 before landing; oracle unchanged).
    flags = base.select(
        "n_tokens",
        F.expr(dig).alias("_dig"),
        (F.col("split") == "train").alias("_t"),
        (
            (F.col("split") == "train")
            & (F.col("n_tokens") >= min_tokens)
        ).alias("_q"),
    )
    f3 = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("c0"),
        F.sum("n_tokens").cast("bigint").alias("t0"),
        F.sum("_dig").cast("bigint").alias("g0"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("_t"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("t1"),
        F.sum(F.when(F.col("_t"), F.expr("_dig")).otherwise(0))
        .cast("bigint")
        .alias("g1"),
        F.sum(F.when(F.col("_q"), 1).otherwise(0)).cast("bigint").alias("c2"),
        F.sum(F.when(F.col("_q"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("t2"),
        F.sum(F.when(F.col("_q"), F.expr("_dig")).otherwise(0))
        .cast("bigint")
        .alias("g2"),
    )
    funnel012 = f3.selectExpr(
        "stack(3,"
        " CAST(0 AS BIGINT), 'raw', c0,"
        "   coalesce(t0, CAST(0 AS BIGINT)),"
        "   coalesce(g0, CAST(0 AS BIGINT)),"
        " CAST(1 AS BIGINT), 'train_split',"
        "   coalesce(c1, CAST(0 AS BIGINT)),"
        "   coalesce(t1, CAST(0 AS BIGINT)),"
        "   coalesce(g1, CAST(0 AS BIGINT)),"
        " CAST(2 AS BIGINT), 'quality',"
        "   coalesce(c2, CAST(0 AS BIGINT)),"
        "   coalesce(t2, CAST(0 AS BIGINT)),"
        "   coalesce(g2, CAST(0 AS BIGINT))"
        ") AS (stage, stage_name, n_docs, n_tokens, digest31)"
    ).select(
        "stage",
        "stage_name",
        "n_docs",
        "n_tokens",
        "digest31",
        F.lit(None).cast("bigint").alias("n_chunks"),
        F.lit(None).cast("bigint").alias("n_split_docs"),
    )

    d1 = base.where(F.col("split") == "train")
    d2 = d1.where(F.col("n_tokens") >= min_tokens)
    # r16-opt (guide §2.4): exact dedup as ONE window over md5(text)
    # (keep doc_id == min id per content hash) instead of groupBy +
    # left-semi join back — one pass over d2 instead of two (each of
    # which re-tokenized the corpus) and one exchange instead of the
    # aggregate's plus the join's. Window-min == groupBy-min: rows kept
    # are identical.
    w_h = Window.partitionBy(F.md5("text"))
    d3 = (
        d2.withColumn("_min_id", F.min("doc_id").over(w_h))
        .where(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
        .localCheckpoint(eager=True)
    )  # feeds LSH + funnel + next stage

    eval_docs = base.where(F.col("split") != "train")
    lsh_in = d3.select("doc_id", "text").unionAll(
        eval_docs.select("doc_id", "text")
    )
    pairs = minhash_lsh_pairs(
        lsh_in,
        "doc_id",
        "text",
        threshold=threshold,
        seed=seed,
        hash_family="md5",
    ).localCheckpoint(eager=True)  # expensive subtree, 3 consumers

    train_a = d3.select(F.col("doc_id").alias("id_a"))
    train_b = d3.select(F.col("doc_id").alias("id_b"))
    tt_drop = (
        pairs.join(train_a, "id_a", "left_semi")
        .join(train_b, "id_b", "left_semi")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    d4 = d3.join(tt_drop, "doc_id", "left_anti").localCheckpoint(eager=True)

    eval_a = eval_docs.select(F.col("doc_id").alias("id_a"))
    eval_b = eval_docs.select(F.col("doc_id").alias("id_b"))
    d4_a = d4.select(F.col("doc_id").alias("id_a"))
    d4_b = d4.select(F.col("doc_id").alias("id_b"))
    contam = (
        pairs.join(d4_a, "id_a", "left_semi")
        .join(eval_b, "id_b", "left_semi")
        .select(F.col("id_a").alias("doc_id"))
        .unionAll(
            pairs.join(d4_b, "id_b", "left_semi")
            .join(eval_a, "id_a", "left_semi")
            .select(F.col("id_b").alias("doc_id"))
        )
        .distinct()
    )
    d5 = d4.join(contam, "doc_id", "left_anti").localCheckpoint(eager=True)

    # Hamilton mixture over the decontaminated pool (inline twin of
    # mixture_sample — the sampled MEMBERSHIP is needed downstream,
    # not just the per-source summary).
    # Weight derives from the 'srcN' naming convention; try_cast (not
    # CAST — Spark runs ANSI mode) so a non-conforming source name
    # degrades to the fallback weight 1 instead of failing the whole
    # pipeline query (r13-advice fix; testdata sources all conform, so
    # the oracle's plain cast agrees).
    pop = d5.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop")
    ).select(
        "source",
        "n_pop",
        F.expr(
            "CAST((coalesce(try_cast(substr(source, 4) AS INT), 0) % 4)"
            " + 1 AS BIGINT)"
        ).alias("weight"),
    )
    w_tot = pop.agg(F.sum("weight").cast("bigint").alias("w"))
    staged = pop.crossJoin(F.broadcast(w_tot)).select(
        "source",
        F.expr(f"({total_n} * weight) div w").cast("bigint").alias("base"),
        F.expr(f"({total_n} * weight) % w").cast("bigint").alias("rem"),
    )
    w_left = Window.orderBy(F.col("rem").desc(), F.col("source"))
    w_all = Window.partitionBy()
    alloc = staged.select(
        "source",
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_left)
                <= F.lit(total_n) - F.sum("base").over(w_all),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    ).localCheckpoint(eager=True)  # source-sized
    ranked = d5.select(
        "source",
        "doc_id",
        "n_tokens",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("_rn"),
    )
    d6 = (
        ranked.join(F.broadcast(alloc), "source")
        .where(F.col("_rn") <= F.col("n_alloc"))
        .select("source", "doc_id", "n_tokens")
        .localCheckpoint(eager=True)
    )

    # Packing stats of the sample (concat-and-chunk, per source).
    w_off = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d6.select(
        "source",
        "n_tokens",
        (F.sum("n_tokens").over(w_off) - F.col("n_tokens"))
        .cast("bigint")
        .alias("_off"),
    ).select(
        "source",
        "n_tokens",
        F.expr(f"CAST(_off div {budget} AS BIGINT)").alias("_fc"),
        F.expr(
            "CAST(CASE WHEN n_tokens = 0 THEN _off"
            f" ELSE _off + n_tokens - 1 END div {budget} AS BIGINT)"
        ).alias("_lc"),
    )
    pack_1row = packed.agg(
        F.sum(
            F.expr("CASE WHEN _lc > _fc THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("n_split_docs"),
    ).crossJoin(
        d6.groupBy("source")
        .agg(F.sum("n_tokens").cast("bigint").alias("_st"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN _st = 0 THEN CAST(0 AS BIGINT)"
                    f" ELSE CAST((_st + {budget} - 1) div {budget}"
                    " AS BIGINT) END"
                )
            )
            .cast("bigint")
            .alias("n_chunks")
        )
    )

    def _stage_row(df: DataFrame, stage: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            F.coalesce(F.sum(F.expr(dig)), F.lit(0))
            .cast("bigint")
            .alias("digest31"),
        ).select(
            F.lit(stage).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_docs",
            "n_tokens",
            "digest31",
            F.lit(None).cast("bigint").alias("n_chunks"),
            F.lit(None).cast("bigint").alias("n_split_docs"),
        )

    funnel = (
        funnel012
        .unionAll(_stage_row(d3, 3, "exact_dedup"))
        .unionAll(_stage_row(d4, 4, "near_dedup"))
        .unionAll(_stage_row(d5, 5, "decontam"))
        .unionAll(_stage_row(d6, 6, "sampled"))
        .unionAll(
            _stage_row(d6, 7, "packed")
            .drop("n_chunks", "n_split_docs")
            .crossJoin(F.broadcast(pack_1row))
            .select(
                "stage",
                "stage_name",
                "n_docs",
                "n_tokens",
                "digest31",
                "n_chunks",
                "n_split_docs",
            )
        )
    )
    return funnel


def chunk_mixing_audit(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """Packed-chunk document-mixing audit — what concat-and-chunk
    packing actually does to attention windows: a chunk that spans
    multiple documents mixes their tokens in one context window, and
    a chunk mixing documents from DIFFERENT md5 splits leaks eval
    text into a train window (the packing-level companion of the
    split-leakage audit).

    Derives each document's chunk range from the token_packing
    layout (same cumulative-offset window), explodes the per-doc
    chunk span (bounded by n_tokens/budget + 1 rows per doc), and
    rolls up per source: n_chunks, n_multi_doc_chunks (>= 2 docs),
    n_mixed_split_chunks (>= 2 distinct splits), mixed_ppm. Exact
    integers + md5 splits end-to-end. Output: one row per source."""
    # Offsets window over the RENAMED columns — it is applied to
    # ``toks`` after the select, so caller column names must not leak
    # into it (the source_token_tvd/boilerplate_spans rename rule).
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    split_expr = (
        f"CASE CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 2),"
        " 16, 10) AS BIGINT) % 10"
        " WHEN 8 THEN 'val' WHEN 9 THEN 'test' ELSE 'train' END"
    )
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"CAST(size(filter(split({text_col}, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(split_expr).alias("split"),
    )
    staged = toks.select(
        "source",
        "doc_id",
        "n_tokens",
        "split",
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .cast("bigint")
        .alias("_off"),
    ).where(F.col("n_tokens") > 0)
    spans = staged.select(
        "source",
        "doc_id",
        "split",
        F.explode(
            F.expr(
                f"sequence(_off div {budget},"
                f" (_off + n_tokens - 1) div {budget})"
            )
        ).alias("chunk"),
    )
    per_chunk = spans.groupBy("source", "chunk").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.countDistinct("split").cast("bigint").alias("n_splits"),
    )
    return per_chunk.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(F.expr("CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_multi_doc_chunks"),
        F.sum(F.expr("CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_mixed_split_chunks"),
    ).select(
        "source",
        "n_chunks",
        "n_multi_doc_chunks",
        "n_mixed_split_chunks",
        F.expr(
            "CAST((1000000 * n_mixed_split_chunks) div n_chunks AS BIGINT)"
        ).alias("mixed_ppm"),
    )


def token_budget_epochs(
    docs: DataFrame,
    weights: DataFrame,
    token_budget: int,
    max_epochs_ppm: int = 4_000_000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-constrained token-budget planner — the "how many epochs
    of each source" table (the data-constrained-scaling recipe:
    repeating a source beyond ~4 epochs stops helping, so a mixing
    plan must CAP repetition and surface the shortfall rather than
    silently over-repeat):

      desired_s  = (token_budget * w_s) div W      (exact Hamilton-
                   style integer share of the budget, no floats)
      epochs_ppm = (1e6 * desired_s) div tokens_s  (how many passes
                   over source s the share implies)
      effective  = min(desired_s, tokens_s * max_epochs_ppm / 1e6)
                   (the repetition cap, exact integer)
      shortfall  = desired_s - effective           (self-reported —
                   redistribution is a caller policy, the
                   mixture_sample convention)

    One token-count rollup + one broadcast weight join; source-sized
    frames after that. Output per source: (source, n_tokens,
    weight, desired_tokens, epochs_ppm, effective_tokens,
    shortfall_tokens)."""
    toks = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(
            F.expr(
                f"CAST(size(filter(split({text_col}, ' '),"
                " x -> x != '')) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("n_tokens")
    )
    pop = toks.join(
        weights.select(
            F.col(source_col).alias("source"),
            F.col("weight").cast("bigint").alias("weight"),
        ),
        "source",
    )
    w_tot = pop.agg(F.sum("weight").cast("bigint").alias("w"))
    return (
        pop.crossJoin(F.broadcast(w_tot))
        .select(
            "source",
            "n_tokens",
            "weight",
            F.expr(f"({token_budget} * weight) div w")
            .cast("bigint")
            .alias("desired_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "weight",
            "desired_tokens",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN"
                " CAST((1000000 * desired_tokens) div n_tokens AS BIGINT)"
                " END"
            ).alias("epochs_ppm"),
            F.expr(
                "CAST(least(desired_tokens,"
                f" (n_tokens * {max_epochs_ppm}) div 1000000) AS BIGINT)"
            ).alias("effective_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "weight",
            "desired_tokens",
            "epochs_ppm",
            "effective_tokens",
            (F.col("desired_tokens") - F.col("effective_tokens"))
            .cast("bigint")
            .alias("shortfall_tokens"),
        )
    )


def mixture_temperature(
    docs: DataFrame,
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture shares at T = 2 — the standard
    multilingual/multi-source flattening (weights proportional to
    share^(1/T); T=2 is the sqrt schedule most multilingual-pretrain
    recipes publish): big sources are damped, small sources boosted,
    without the float-pow the general-T formula would need.

    The sqrt stays parity-safe by landing IMMEDIATELY back in
    integer space: w_s = CAST(floor(sqrt(n_tokens_s)) AS BIGINT) is
    the same correctly-rounded IEEE sqrt + floor in both engines
    (the repo's sqrt-is-exact rule; this is floor-of-sqrt, not
    mathematically isqrt, and both engines compute the identical
    value). From there everything is the exact Hamilton
    largest-remainder allocation of ``token_budget`` used by
    mixture_sample:

        alloc_s = (budget*w_s div W) + (1 if rem-rank <= leftover)

    plus the natural (T=1) and temperature share ppms so the
    flattening is self-documenting. One token rollup + a broadcast
    1-row total + source-sized windows. An all-empty-text corpus
    (nt = 0 / w = 0) emits NULL shares/alloc per the repo's
    zero-denominator convention instead of throwing under ANSI.
    Output: (source, n_tokens, w_temp, nat_share_ppm,
    temp_share_ppm, alloc_tokens)."""
    toks = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(
            F.expr(
                f"CAST(size(filter(split({text_col}, ' '),"
                " x -> x != '')) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("n_tokens")
    )
    pop = toks.select(
        "source",
        "n_tokens",
        F.expr(
            "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"
        ).alias("w_temp"),
    )
    tot = pop.agg(
        F.sum("n_tokens").cast("bigint").alias("nt"),
        F.sum("w_temp").cast("bigint").alias("w"),
    )
    staged = pop.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "w_temp",
        F.expr(
            "CASE WHEN nt > 0 THEN"
            " CAST((1000000 * n_tokens) div nt AS BIGINT) END"
        ).alias("nat_share_ppm"),
        F.expr(
            "CASE WHEN w > 0 THEN"
            " CAST((1000000 * w_temp) div w AS BIGINT) END"
        ).alias("temp_share_ppm"),
        F.expr(
            f"CASE WHEN w > 0 THEN ({token_budget} * w_temp) div w END"
        )
        .cast("bigint")
        .alias("base"),
        F.expr(
            f"CASE WHEN w > 0 THEN ({token_budget} * w_temp) % w END"
        )
        .cast("bigint")
        .alias("rem"),
    )
    w_left = Window.orderBy(F.col("rem").desc(), F.col("source"))
    w_all = Window.partitionBy()
    return staged.select(
        "source",
        "n_tokens",
        "w_temp",
        "nat_share_ppm",
        "temp_share_ppm",
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_left)
                <= F.lit(token_budget) - F.sum("base").over(w_all),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )


def dedup_aware_packing(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.02,
    hash_family: str = "md5",
) -> DataFrame:
    """Near-dup-aware packing report — the composition the r14 verdict
    asked for: LSH near-dup clusters -> keep-one canonicalization ->
    concat-and-chunk packing, reported as context-window chunks saved
    per source. The number a pretraining-data owner actually budgets
    by: "dedup buys us X% fewer training chunks".

    Clusters come from the production ``minhash_lsh_pairs`` +
    ``connected_components`` machinery (banding -> equi-join -> exact
    verify; min-label propagation, O(diameter)); the canonical doc is
    the component's minimum id (id == component under min-label),
    singletons keep themselves. Chunk math is the ``token_packing``
    closed form at the source level: chunks = ceil(tokens / budget) =
    (tokens + budget - 1) div budget — exact integers throughout.
    Output per source: (source, n_docs, n_kept, tokens_total,
    tokens_kept, chunks_before, chunks_after, chunks_saved)."""
    from kafka_streams_aggregate_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, n=n, k=k, bands=bands,
        threshold=threshold, hash_family=hash_family,
    )
    ids = docs.select(F.col(id_col).alias("id"))
    comp = connected_components(pairs, ids, id_col="id")
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).cast("bigint").alias("id"),
        F.expr(
            f"CAST(size(filter(split({text_col}, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
    )
    tagged = toks.join(
        comp.select(
            F.col("id").cast("bigint").alias("id"),
            F.col("component").cast("bigint").alias("component"),
        ),
        "id",
    )
    agg = tagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr("CASE WHEN id = component THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.sum(F.expr("CASE WHEN id = component THEN n_tokens ELSE 0 END"))
        .cast("bigint")
        .alias("tokens_kept"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_kept",
        "tokens_total",
        "tokens_kept",
        F.expr(f"(tokens_total + {budget} - 1) div {budget}")
        .cast("bigint")
        .alias("chunks_before"),
        F.expr(f"(tokens_kept + {budget} - 1) div {budget}")
        .cast("bigint")
        .alias("chunks_after"),
        F.expr(
            f"(tokens_total + {budget} - 1) div {budget}"
            f" - (tokens_kept + {budget} - 1) div {budget}"
        )
        .cast("bigint")
        .alias("chunks_saved"),
    )


def quality_mixture_reweight(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    token_budget: int = 100_000,
) -> DataFrame:
    """Quality-weighted mixture allocation — the composition of
    ``lm_quality_proxy`` (source level) with the Hamilton budget
    step: each source's weight is tokens x unigram quality, so a
    source full of gibberish (tokens the corpus LM finds improbable)
    is down-weighted exactly the way quality-filtered pretraining
    mixtures do it.

        quality_ppb = (1e9 * sum_t cnt(t)) div (n_tokens_s * N)
        w_q         = (n_tokens_s * quality_ppb) div 1000
        alloc       = Hamilton(token_budget, w_q)

    — corpus counts are one map-side-combinable aggregate, N is a
    broadcast 1-row total, the per-source rollup joins occurrences to
    counts on the token equi-key (the lm_quality_proxy scale shape);
    numerators on DECIMAL(38,0). Zero denominators emit NULL per the
    repo convention. Output: (source, n_tokens, sum_cnt, quality_ppb,
    w_q, share_ppm, alloc_tokens)."""
    occ = docs.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
        ).alias("tok"),
    )
    counts = occ.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    per_src = (
        occ.join(counts, "tok")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("sum_cnt"),
        )
    )
    tot = per_src.agg(F.sum("n_tokens").cast("bigint").alias("nn"))
    scored = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "sum_cnt",
        F.expr(
            "CASE WHEN n_tokens > 0 AND nn > 0 THEN"
            " CAST((CAST(1000000000 AS DECIMAL(38,0)) * sum_cnt)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * nn) AS BIGINT) END"
        ).alias("quality_ppb"),
    )
    weighted = scored.select(
        "source",
        "n_tokens",
        "sum_cnt",
        "quality_ppb",
        F.expr(
            "CAST(coalesce((n_tokens * quality_ppb) div 1000, 0)"
            " AS BIGINT)"
        ).alias("w_q"),
    )
    w_tot = Window.partitionBy()
    staged = weighted.select(
        "source",
        "n_tokens",
        "sum_cnt",
        "quality_ppb",
        "w_q",
        F.sum("w_q").over(w_tot).cast("bigint").alias("_w"),
    ).select(
        "source",
        "n_tokens",
        "sum_cnt",
        "quality_ppb",
        "w_q",
        F.expr(
            "CASE WHEN _w > 0 THEN"
            " CAST((1000000 * w_q) div _w AS BIGINT) END"
        ).alias("share_ppm"),
        F.expr(
            f"CASE WHEN _w > 0 THEN ({token_budget} * w_q) div _w END"
        )
        .cast("bigint")
        .alias("_base"),
        F.expr(
            f"CASE WHEN _w > 0 THEN ({token_budget} * w_q) % _w END"
        )
        .cast("bigint")
        .alias("_rem"),
    )
    w_rank = Window.orderBy(F.col("_rem").desc(), F.col("source"))
    return staged.select(
        "source",
        "n_tokens",
        "sum_cnt",
        "quality_ppb",
        "w_q",
        "share_ppm",
        (
            F.col("_base")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(token_budget) - F.sum("_base").over(w_tot),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )


def eval_prep_pipeline(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 16,
    contam_n: int = 8,
    contam_max_ppm: int = 500_000,
    per_stratum: int = 8,
) -> DataFrame:
    """End-to-end EVAL-set preparation pipeline — the eval-side
    sibling of ``corpus_prep_pipeline`` (that one curates what the
    model TRAINS on; this one curates what it is JUDGED on, and the
    failure modes differ: an eval doc leaked from train inflates the
    score, an unstratified eval over-weights the dominant source):

      0 eval_pool   the md5 val/test split (the corpus pipeline's
                    split expression — the two pipelines must agree
                    on who owns each doc)
      1 quality     n_tokens >= min_tokens
      2 decontam    drop eval docs MEMORIZED from train: distinct
                    ``contam_n``-gram shingles hit the train corpus's
                    distinct shingle set at > ``contam_max_ppm``
                    (exact integer ratio gate, the contamination_ngram
                    machinery pointed the OTHER way — the corpus
                    pipeline drops train twins, this drops leaked
                    eval docs). contam_n defaults to 8: benchmark
                    decontamination uses LONG n-grams (GPT-3 published
                    13-grams) because short ones saturate — measured
                    here, 3-gram hit ratios reach median 1e6 at sf0.1
                    while 8-grams isolate exactly the planted
                    split-straddling near-dups at every SF
      3 stratified  per (source, token-MSB length bucket) stratum
                    keep ``per_stratum`` docs by md5 rank (the
                    priority-sample discipline; length(bin(n)) is
                    the round-6 cross-engine floor-log2 trick)

    Output: one funnel row per stage — (stage, stage_name, n_docs,
    n_tokens, digest31, n_strata) — digest31 pinning MEMBERSHIP (sum
    of 31-bit md5 residues, the round-9 additive-digest rule: a stage
    dropping the right number of WRONG rows goes red), n_strata
    counting occupied (source, bucket) cells so a stratification bug
    is visible as a stratum-count shift, not just a row delta.

    Scale shape: the train side reduces to its DISTINCT shingle set
    (one groupBy on the shingle key); the eval side left-joins it on
    the same key; per-stratum ranking windows run over stratum-sized
    frames. Stage frames are localCheckpoint'd at fan-out points
    (funnel row + next stage)."""
    from kafka_streams_aggregate_spark.operators.dedup import shingle_index

    sc, ic, tc = source_col, id_col, text_col
    split_expr = (
        f"CASE CAST(conv(substr(md5(CAST({ic} AS STRING)), 1, 2), 16, 10)"
        " AS BIGINT) % 10"
        " WHEN 8 THEN 'val' WHEN 9 THEN 'test' ELSE 'train' END"
    )
    base = docs.select(
        F.col(sc).alias("source"),
        F.col(ic).alias("doc_id"),
        F.col(tc).alias("text"),
        F.expr(
            f"CAST(size(filter(split({tc}, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(split_expr).alias("split"),
    )
    ev0 = base.where(F.col("split") != "train").localCheckpoint(eager=True)
    ev1 = ev0.where(F.col("n_tokens") >= min_tokens).localCheckpoint(
        eager=True
    )
    train_set = (
        shingle_index(
            base.where(F.col("split") == "train").select("doc_id", "text"),
            "doc_id",
            "text",
            n=contam_n,
        )
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev_sh = shingle_index(
        ev1.select("doc_id", "text"), "doc_id", "text", n=contam_n
    )
    ratio = (
        ev_sh.join(train_set, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_ns"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("_nc"),
        )
        .where(
            F.expr(f"(1000000 * _nc) div _ns <= {contam_max_ppm}")
        )
        .select("doc_id")
    )
    ev2 = ev1.join(ratio, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    w_rank = Window.partitionBy(
        "source", F.expr("length(bin(n_tokens))")
    ).orderBy(
        F.expr(
            "CAST(conv(substr(md5(concat('evalsel|',"
            " CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ),
        F.col("doc_id"),
    )
    ev3 = (
        ev2.withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= per_stratum)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )

    def funnel(df: DataFrame, stage: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(stage).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.expr(
                        "CAST(conv(substr(md5(concat('dg|',"
                        " CAST(doc_id AS STRING))), 1, 8), 16, 10)"
                        " AS BIGINT) % 2147483648"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("digest31"),
            F.countDistinct(
                "source", F.expr("length(bin(n_tokens))")
            )
            .cast("bigint")
            .alias("n_strata"),
        )

    return (
        funnel(ev0, 0, "eval_pool")
        .unionByName(funnel(ev1, 1, "quality"))
        .unionByName(funnel(ev2, 2, "decontam"))
        .unionByName(funnel(ev3, 3, "stratified"))
    )


def dup_weighted_mixture(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lead_k: int = 8,
    token_budget: int = 100_000,
) -> DataFrame:
    """Repetition-discounted mixture allocation — the sampling-side
    answer to duplication when you DON'T want to delete (deletion
    loses provenance; discounting keeps every doc but makes a
    10-copy boilerplate cluster count once): each doc's tokens are
    down-weighted by its duplicate-cluster size, and the per-source
    EFFECTIVE token mass drives the Hamilton budget split.

    Clusters are lead-``lead_k``-token fingerprint groups (the
    cross_source_dup_matrix key — syndication keeps the lede). The
    per-doc discount is floored once in ppm-scaled integer space:

        eff_milli_s = sum_docs (1000 * n_tokens) div cluster_size

    (floored PER DOC — deterministic and identical cross-engine; the
    sum of exact rationals has no single-floor form). Output:
    (source, n_docs, n_tokens, eff_milli, share_ppm, alloc_tokens) —
    NULL shares on a zero total per the repo convention."""
    key = (
        f"md5(array_join(slice(filter(split({text_col}, ' '),"
        f" x -> x != ''), 1, {lead_k}), ' '))"
    )
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.expr(key).alias("_h"),
        F.expr(
            f"CAST(size(filter(split({text_col}, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("n_tokens"),
    )
    w_h = Window.partitionBy("_h")
    scored = base.select(
        "source",
        "n_tokens",
        F.count(F.lit(1)).over(w_h).cast("bigint").alias("_csize"),
    )
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum(F.expr("(1000 * n_tokens) div _csize"))
        .cast("bigint")
        .alias("eff_milli"),
    )
    w_all = Window.partitionBy()
    staged = per.select(
        "source",
        "n_docs",
        "n_tokens",
        "eff_milli",
        F.sum("eff_milli").over(w_all).cast("bigint").alias("_w"),
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        "eff_milli",
        F.expr(
            "CASE WHEN _w > 0 THEN"
            " CAST((1000000 * eff_milli) div _w AS BIGINT) END"
        ).alias("share_ppm"),
        F.expr(
            f"CASE WHEN _w > 0 THEN ({token_budget} * eff_milli)"
            " div _w END"
        )
        .cast("bigint")
        .alias("_base"),
        F.expr(
            f"CASE WHEN _w > 0 THEN ({token_budget} * eff_milli)"
            " % _w END"
        )
        .cast("bigint")
        .alias("_rem"),
    )
    w_rank = Window.orderBy(F.col("_rem").desc(), F.col("source"))
    return staged.select(
        "source",
        "n_docs",
        "n_tokens",
        "eff_milli",
        "share_ppm",
        (
            F.col("_base")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(token_budget) - F.sum("_base").over(w_all),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )
