"""Text-analysis operators for training-data pipelines: tokenization
stats, quality scoring, language ID, fingerprinting.

Everything is built-in string/array expressions — per-row, embarrassingly
parallel, no shuffle, no UDFs — which is exactly what you want when the
documents table is 100 TB: the whole stage is a single codegen'd scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language detector. Deliberately small and explicit: language ID here
# demonstrates the *mechanics* (vectorized scoring + argmax) — swap in
# real profiles (e.g. trigram tables) for production corpora.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "y", "de"),
}
_PROFILE_ORDER = tuple(sorted(LANG_PROFILES))  # deterministic tie-break order


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: whitespace token count, char
    count, average token length, distinct-token ratio."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars"),
        (sum_tok_len.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (
            F.size(F.array_distinct(toks)).cast("double") / n_tokens.cast("double")
        ).alias("distinct_ratio"),
    )


def lang_scores(text_col: str) -> list[Column]:
    """One stopword-hit-count column per language profile."""
    toks = tokens(text_col)
    cols = []
    for lang in _PROFILE_ORDER:
        words = LANG_PROFILES[lang]
        cols.append(
            F.size(F.filter(toks, lambda t: t.isin(*words)))
            .cast("int")
            .alias(f"score_{lang}")
        )
    return cols


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: stopword-profile scoring + deterministic
    argmax (ties break by language-code order; all-zero -> 'und')."""
    scored = df.select(F.col(id_col), *lang_scores(text_col))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _PROFILE_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _PROFILE_ORDER:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col,
        *[f"score_{lang}" for lang in _PROFILE_ORDER],
        pred.alias("pred_lang"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality signals + a composite score in [0,1]:
    length band, mean token length band, uppercase ratio, digit ratio.
    Integer-ratio arithmetic only, so the doubles are deterministic."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    n_upper = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "[A-Z]", ""))
    ).cast("double")
    n_digit = (
        F.length(text_col)
        - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    ).cast("double")
    avg_tok = n_chars / n_tokens
    len_ok = (F.length(text_col) >= 80) & (F.length(text_col) <= 2000)
    tok_ok = (avg_tok >= 3.0) & (avg_tok <= 12.0)
    upper_ratio = n_upper / n_chars
    digit_ratio = n_digit / n_chars
    score = (
        len_ok.cast("int") * 0.4
        + tok_ok.cast("int") * 0.3
        + (upper_ratio <= 0.3).cast("int") * 0.15
        + (digit_ratio <= 0.2).cast("int") * 0.15
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("int").alias("n_chars"),
        upper_ratio.alias("upper_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality"),
    )


def bigrams(text_col: Column | str) -> Column:
    """Adjacent word pairs as an array<string>. Built from two shifted
    slices zipped together — stays a codegen'd array expression, no
    explode until the caller decides to."""
    toks = tokens(text_col)
    m = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, m - 1),
        F.slice(toks, 2, m - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def dup_ngram_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signal: per document, the fraction of
    bigram positions covered by bigrams that occur more than once in
    that document.

    Shape for 100 TB: explode -> two map-side-combinable aggregations
    keyed by (doc, gram) then (doc). Linear in corpus size; no windows,
    no per-doc quadratic array scans. Documents with fewer than two
    tokens produce no bigrams and are absent from the output (matching
    the oracle's unnest-of-empty-list semantics).
    """
    exploded = df.select(F.col(id_col), F.explode(bigrams(text_col)).alias("gram"))
    per_gram = exploded.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_dup_positions"),
        )
        .withColumn(
            "dup_ratio",
            F.col("n_dup_positions").cast("double")
            / F.col("n_bigrams").cast("double"),
        )
    )


def ngram_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 50
) -> DataFrame:
    """Corpus-wide top-k bigrams (vocabulary building): total occurrence
    count and document frequency, ordered by count with the gram string
    as the unique tiebreaker. The global sort runs on the *aggregated*
    gram table (vocabulary-sized, not corpus-sized), and Spark compiles
    orderBy+limit to TakeOrderedAndProject — no full sort at scale."""
    exploded = df.select(F.col(id_col), F.explode(bigrams(text_col)).alias("gram"))
    agg = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.countDistinct(id_col).cast("bigint").alias("doc_freq"),
    )
    return agg.orderBy(F.col("cnt").desc(), F.col("gram").asc()).limit(k)


def oov_rate(
    df: DataFrame, id_col: str, text_col: str, vocab_k: int = 400
) -> DataFrame:
    """Out-of-vocabulary audit under a capped n-gram vocabulary: build
    the top-``vocab_k`` bigram vocabulary (count desc, gram asc — a
    total order, so the cut at rank k is deterministic), then report
    per document how many of its bigram occurrences fall outside it.
    The tokenizer-design feedback loop: pick k, measure the UNK rate it
    would induce, adjust.

    Shape for 100 TB: the vocabulary is the corpus-wide gram aggregate
    (map-side combinable) cut to k rows via TakeOrderedAndProject — a
    bounded table regardless of corpus size — broadcast back against
    the exploded grams; the per-doc rollup is one map-side-combinable
    aggregation. Nothing driver-side but the k-row vocab."""
    exploded = df.select(F.col(id_col), F.explode(bigrams(text_col)).alias("gram"))
    vocab = (
        exploded.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("gram").asc())
        .limit(vocab_k)
        .select("gram", F.lit(1).alias("_in_vocab"))
    )
    return (
        exploded.join(F.broadcast(vocab), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_ratio",
            F.col("n_oov").cast("double") / F.col("n_ngrams").cast("double"),
        )
    )


def hash_split(id_col: str) -> Column:
    """Deterministic train/val/test assignment from the md5 of the id:
    first two hex digits compared as strings (dialect-portable — no
    hex->int parsing), giving ~5.1% val ('00'..'0c'), ~5.1% test
    ('0d'..'19'), rest train. Pure per-row expression; the split is
    stable under any repartitioning or engine."""
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return (
        F.when(prefix < "0d", F.lit("val"))
        .when(prefix < "1a", F.lit("test"))
        .otherwise(F.lit("train"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    token_budget: int = 512,
) -> DataFrame:
    """Greedy sequence packing for training batches: within each shard,
    walk documents in id order and assign each to the bin of its
    *exclusive* running token total div the budget (so a bin holds
    ~token_budget tokens, and a doc longer than the budget gets bins to
    itself without splitting).

    Scale note: the running sum is a window partitioned by the shard
    column — shards are the unit of parallelism, exactly how a 100 TB
    corpus is already laid out (pack each input shard independently;
    never a single global ordering). Returns one row per (shard, bin).
    """
    from pyspark.sql import Window

    n_tokens = F.size(tokens(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    with_bins = (
        df.select(F.col(id_col), F.col(shard_col), n_tokens.alias("n_tokens"))
        .withColumn(
            "bin_id",
            F.floor(cum_before / F.lit(float(token_budget))).cast("bigint"),
        )
    )
    return with_bins.groupBy(shard_col, "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, n_buckets: int = 1024) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized lowercase
    text, plus a stable small bucket id (first 8 hex digits -> int ->
    mod buckets) for grouping/partitioning near-identical content."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    fp = F.md5(normalized)
    bucket = (F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint") % n_buckets).cast(
        "int"
    )
    return df.select(
        F.col(id_col), fp.alias("fingerprint"), bucket.alias("bucket")
    )


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k distinctive terms per document by tf-idf with a *rational*
    idf (tf * N/df instead of tf * ln(N/df)): ln() differs between
    JVM Math.log and libm in the last ulp on ~8% of inputs (measured),
    so a cell-exact cross-engine contract rules it out; N/df preserves
    the idf ordering for ranking and the tf/df columns carry the exact
    integers for any downstream re-weighting.

    Shape for 100 TB: explode -> (doc, term) count -> term doc-freq
    count (both map-side combinable), broadcast-sized single-row corpus
    count crossed in, per-doc top-k window (WindowGroupLimit pushes the
    rank filter below the sort). Three shuffles, all on aggregated
    data."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("_n").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def contamination_ngram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_filter,
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination signal: for every non-benchmark
    document, how many of its distinct word n-grams also occur in the
    benchmark set (``benchmark_filter``: Column predicate selecting the
    held-out docs). Standard training-data hygiene — drop or flag docs
    whose eval-set overlap is high.

    Shape for 100 TB: one shared distinct shingle index; the benchmark
    side reduces to its distinct shingle set (tiny vs corpus) and the
    overlap is a shuffle equi-join on shingle followed by a per-doc
    count — no pairwise document comparison anywhere."""
    from kafka_streams_aggregate_spark.operators.dedup import shingle_index

    # Materialize the index once: both branches below re-derive the
    # scan→explode→distinct pipeline otherwise (exchange reuse only
    # partially applies across the filter split).
    idx = shingle_index(df, id_col, text_col, n).localCheckpoint(eager=True)
    bench = (
        idx.filter(benchmark_filter)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = idx.filter(~benchmark_filter)
    return (
        train.join(bench, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias(
                "n_contaminated"
            ),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("contamination_ratio"),
        )
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009): each
    whitespace token maps to a bucket in [0, n_buckets) via the
    cross-engine md5 family (CLAUDE.md hash-family parity trick) with
    a signed contribution (+1/-1 from an independent md5 nibble, the
    collision-bias cancellation from the paper), summed per (doc,
    bucket) into a sparse feature vector — the fixed-width,
    vocabulary-free encoding a 100 TB text pipeline feeds to linear
    models. Pure JVM expressions end to end (split -> explode ->
    md5 -> conv -> groupBy); one corpus-sized shuffle on
    (doc, bucket). DuckDB twin of the bucket/sign expressions:
    ('0x' || substr(md5(tok), 1, 15))::BIGINT % n_buckets and
    (('0x' || substr(md5(tok), 16, 1))::BIGINT) % 2 * 2 - 1.
    Returns (id_col, bucket, weight) sparse rows.
    """
    toks = df.select(
        id_col, F.explode(tokens(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    sign = (
        F.conv(F.substring(F.md5("tok"), 16, 1), 16, 10).cast("long") % 2
    ) * 2 - 1
    return (
        toks.select(
            id_col,
            (h % n_buckets).alias("bucket"),
            sign.alias("sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("bigint").alias("weight"))
    )


def positional_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional inverted index: one (doc, pos, token) row per
    whitespace token, pos 0-based. The build is a single codegen'd
    scan (split + posexplode, no shuffle); consumers decide their own
    partitioning. This is the artifact a search engine persists
    bucketed by token; here it feeds phrase_search."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )


def phrase_search(
    df: DataFrame, id_col: str, text_col: str, phrase: str
) -> DataFrame:
    """Exact phrase search over a positional inverted index.

    The classic positional-index algorithm: candidate docs come from
    the FIRST (most selective position anchor) term's posting list;
    each subsequent term of the k-word phrase is verified by an
    equi-join on (doc, pos + i) — k-1 hash joins on integer pairs, no
    regex over bodies, no quadratic stage. At 100 TB the index is the
    thing you'd persist (bucketed by token) and each join is a
    token-pruned posting-list intersection: the scan reads only the k
    phrase terms' postings (predicate pushdown on `tok`), so cost
    scales with posting-list sizes, not corpus size.

    Output: one row per matching document — ``doc`` (id), ``n_hits``
    (occurrence count, overlaps allowed), ``first_pos`` (earliest
    match position, 0-based). All exact integers; deterministic
    without any LIMIT.
    """
    words = phrase.split(" ")
    idx = positional_index(df, id_col, text_col)
    base = idx.where(F.col("tok") == words[0]).select("doc", "pos")
    for i, w in enumerate(words[1:], start=1):
        nxt = idx.where(F.col("tok") == w).select(
            F.col("doc").alias("d2"), (F.col("pos") - i).alias("p2")
        )
        base = base.join(
            nxt,
            (F.col("doc") == F.col("d2")) & (F.col("pos") == F.col("p2")),
        ).select("doc", "pos")
    return base.groupBy("doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: tuple[str, ...] = ("the", "a"),
    topk: int = 50,
    scale: int = 10**9,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are the maximal stopword-free token runs; each word scores
    degree/frequency (degree = total length of phrases it appears in,
    frequency = its occurrence count), and a phrase scores the sum of
    its words' scores. The standard cheap keyword extractor a corpus
    pipeline runs before anything model-based.

    Exact-integer scoring (cross-engine rule): word score becomes
    ``(scale * deg) div freq`` — int64 floor division, identical in
    DuckDB — so phrase scores are exact int64 sums. Bound: scale *
    max_degree < 2^63 (with scale 1e9, degrees to ~9e9 are safe;
    shrink scale for larger corpora).

    Shape: tokenize scan (no shuffle), phrase islands via the repo's
    pos - row_number run formula (one window on doc), word stats via
    one groupBy on token, score join back on token, phrase aggregate
    on (doc, run), distinct-phrase aggregate on text, final top-k with
    total-order tiebreak (score desc, phrase asc).

    Output: (phrase, n_occurrences, score_scaled, rank), rank <= topk.
    """
    if not stopwords:
        raise ValueError("rake_keywords: stopwords must be non-empty")
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    nonstop = toks.filter(~F.col("tok").isin(*stopwords))
    w_doc = Window.partitionBy("doc").orderBy("pos")
    runs = nonstop.withColumn(
        "run", F.col("pos") - F.row_number().over(w_doc)
    )
    w_run = Window.partitionBy("doc", "run")
    words = runs.withColumn(
        "plen", F.count(F.lit(1)).over(w_run).cast("bigint")
    )
    stats = words.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = words.join(stats, "tok").withColumn(
        "wscore", F.expr(f"(CAST({scale} AS BIGINT) * deg) div freq")
    )
    phrases = scored.groupBy("doc", "run").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.sum("wscore").cast("bigint").alias("score_scaled"),
    )
    dedup = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("score_scaled").cast("bigint").alias("score_scaled"),
    )
    w_rank = Window.orderBy(
        F.col("score_scaled").desc(), F.col("phrase").asc()
    )
    return (
        dedup.withColumn(
            "rank", F.row_number().over(w_rank).cast("bigint")
        )
        .filter(F.col("rank") <= topk)
    )


def rule_fail_audit(
    df: DataFrame,
    id_col: str,
    rules: list[tuple[str, str]],
) -> DataFrame:
    """Config-driven quality-gate audit — the rule-TABLE form of
    ``quality_score``'s fixed composite, matching how production
    corpus filters (C4 / Gopher / FineWeb style) are actually
    specified: a list of named violation predicates, evaluated in one
    pass, with a per-document FAILURE BITMASK so downstream stages can
    both hard-filter (mask = 0) and analyze per-rule damage without
    re-running the gate.

        fail_mask = sum_i 2^i * [rule_i violated]      (exact int64)

    ``rules``: ordered (name, sql_bool_expr) pairs; expr TRUE means
    VIOLATED; bit i = rule i. At most 62 rules (the repo's shift cap:
    bit 63 overflows int64 in ANSI mode where DuckDB errors). Exprs
    must be engine-portable SQL over integer/string functions (the
    caller owns that contract; length/substr/CASE are identical).

    One embarrassingly-parallel projection — no shuffle, no UDF; the
    per-rule rollup (``rule_fail_counts``) recovers counts FROM the
    mask, so the gate runs once.

    Output: (id, fail_mask, n_fails) one row per input row.
    """
    if len(rules) > 62:
        raise ValueError("at most 62 rules (int64 bitmask, shift cap 62)")
    mask = " + ".join(
        f"(CASE WHEN ({expr}) THEN {1 << i} ELSE 0 END)"
        for i, (_, expr) in enumerate(rules)
    )
    nf = " + ".join(
        f"(CASE WHEN ({expr}) THEN 1 ELSE 0 END)"
        for _, expr in rules
    )
    return df.selectExpr(
        f"{id_col} AS id",
        f"CAST({mask} AS BIGINT) AS fail_mask",
        f"CAST({nf} AS BIGINT) AS n_fails",
    )


def rule_fail_counts(
    audited: DataFrame, rules: list[tuple[str, str]]
) -> DataFrame:
    """Per-rule damage rollup from ``rule_fail_audit`` masks: ONE
    aggregate over the mask column (bit i extracted as
    ``(mask div 2^i) % 2`` — div/mod, not shifts, per the cross-engine
    rule), then a stack to tidy (rule_idx, rule_name, n_fail, n_docs,
    fail_ppm) form. The gate itself is never re-evaluated.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i in range(len(rules)):
        aggs.append(
            F.expr(f"CAST(SUM((fail_mask div {1 << i}) % 2) AS BIGINT)")
            .alias(f"_f_{i}")
        )
    wide = audited.agg(*aggs)
    stacked = ", ".join(
        f"CAST({i} AS BIGINT), '{name}', _f_{i}"
        for i, (name, _) in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {stacked}) AS (rule_idx, rule_name, n_fail)",
        "_n AS n_docs",
    ).selectExpr(
        "rule_idx",
        "rule_name",
        "n_fail",
        "n_docs",
        "CAST((1000000 * n_fail) div n_docs AS BIGINT) AS fail_ppm",
    )


PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — patterns restricted to the RE
    # subset with identical semantics in Java regex (Spark) and RE2
    # (DuckDB): character classes, +, alternation; no lookaround, no
    # backrefs.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+", "<EMAIL>"),
    ("digit_run", r"[0-9][0-9][0-9][0-9]+", "<NUM>"),
    ("hex_token", r"\b[0-9a-f][0-9a-f][0-9a-f][0-9a-f][0-9a-f]+\b", "<HEX>"),
]


def pii_scrub_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """PII scrub + audit in ONE pass — the redaction stage a
    training-data pipeline runs before anything else ships: replace
    each configured pattern with its placeholder and report how many
    of each fired per document (the audit trail that makes redaction
    reviewable without re-scanning the corpus).

    Counts are taken on the ORIGINAL text (so overlapping patterns
    report what they themselves matched), then replacements apply
    SEQUENTIALLY in list order — both choices pinned because they are
    observable: a digit run inside an email is counted by both
    patterns but scrubbed by whichever runs first. All work is JVM
    codegen (`regexp_count` + chained `regexp_replace`) — no UDF, no
    shuffle; the pattern list is config, not code (same philosophy as
    ``rule_fail_audit``).

    Cross-engine contract: patterns must stay in the Java-regex ∩ RE2
    common subset (see ``PII_PATTERNS``); the oracle uses
    ``length(regexp_extract_all(..))`` for counts and
    ``regexp_replace(.., 'g')`` for the global replace.

    Output: (id, scrubbed, n_<name> per pattern, n_redactions).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    scrubbed = F.col(text_col)
    for _, pat, repl in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    cols = [F.col(id_col).alias("id"), scrubbed.alias("scrubbed")]
    total = None
    for name, pat, _ in pats:
        # F.regexp_count with a lit() pattern — NEVER a pattern inside
        # an F.expr SQL string: Spark SQL string literals treat
        # backslashes as escapes, silently corrupting \b and \. .
        term = F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint")
        cols.append(term.alias(f"n_{name}"))
        total = term if total is None else total + term
    cols.append(total.cast("bigint").alias("n_redactions"))
    return df.select(*cols)


def zipf_rank_freq(
    df: DataFrame,
    text_col: str,
    topk: int = 100,
    scale: int = 1_000_000,
) -> DataFrame:
    """Zipf rank-frequency head of the corpus vocabulary — the
    LOG-FREE Zipf audit (the classic check plots log-rank vs log-freq;
    the repo's transcendental ban keeps the raw table and the
    ``rank * freq`` product instead, which Zipf's law predicts to be
    roughly constant over the head): top-k tokens by (count DESC,
    token ASC) with exact counts, corpus-share ppm, and the product.
    Companion to q_heaps_vocab_growth (types-vs-tokens): Heaps watches
    vocabulary GROW, Zipf watches how usage CONCENTRATES.

    Shape: one explode + one count aggregate (map-side combined), the
    window ranks the k-bounded VOCAB table, never the token stream."""
    toks = df.select(F.explode(tokens(text_col)).alias("token")).where(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("total"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    ranked = (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "token",
        "cnt",
        F.expr("CAST(rank * cnt AS BIGINT)").alias("zipf_product"),
        F.expr(f"CAST(({scale} * cnt) div total AS BIGINT)").alias(
            "share_ppm"
        ),
        "total",
    )


def base64_roundtrip_audit(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Base64 encode/decode round-trip audit — the binary-transport
    parity row of the format family (TAR/ZIP members, XML round-trip):
    both engines ship RFC-4648 base64 natively, so the encoded string,
    its length, its md5, and the round-trip flag are all cell-exact
    cross-engine with zero reimplementation. All JVM codegen.

    Normalization note: Spark's ``base64`` emits MIME-CHUNKED output
    (76-char lines joined by CRLF — the commons-codec legacy) while
    DuckDB emits the plain RFC-4648 single line, so the operator
    strips CR/LF before measuring/hashing; ``unbase64`` accepts both
    forms, so the round-trip check is chunking-agnostic."""
    c = F.col(text_col)
    b64 = F.regexp_replace(F.base64(c.cast("binary")), "[\r\n]", "")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(c).cast("bigint").alias("n_chars"),
        F.length(b64).cast("bigint").alias("n_b64"),
        F.md5(b64.cast("binary")).alias("b64_md5"),
        (F.col(text_col) == F.unbase64(b64).cast("string")).alias(
            "roundtrip_ok"
        ),
    )


def variant_shred_audit(
    df: DataFrame, id_col: str, json_col: str
) -> DataFrame:
    """Semi-structured VARIANT shredding (Spark 4 engine surface) —
    parse a JSON string column ONCE into the binary VARIANT encoding
    (``parse_json``), then extract typed fields with path expressions
    (``variant_get``): the open-schema ingestion lane a lakehouse uses
    before columns are promoted to the schema. Extracted here: a
    bigint, a string, one array element, the array length, and the
    canonical re-serialization (``to_json(variant)`` — minified, with
    object keys SORTED: the VARIANT binary encoding canonicalizes key
    order, so round-tripping is exact only for key-sorted input).

    Contract: the JSON is machine-generated (no whitespace variance,
    keys pre-sorted), so the round-trip string is deterministic; a
    DuckDB oracle reads
    the SAME fields with native JSON path functions — the parity is
    on the VALUES, which is exactly what shredding must preserve.
    All JVM-side, no UDF, no shuffle."""
    v = F.parse_json(F.col(json_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"CAST(variant_get(parse_json({json_col}), '$.score',"
               " 'bigint') AS BIGINT)").alias("score"),
        F.expr(f"variant_get(parse_json({json_col}), '$.meta.src',"
               " 'string')").alias("src"),
        F.expr(f"variant_get(parse_json({json_col}), '$.tags[0]',"
               " 'string')").alias("first_tag"),
        F.expr(f"CAST(array_size(variant_get(parse_json({json_col}),"
               " '$.tags', 'array<string>')) AS BIGINT)").alias("n_tags"),
        F.to_json(v).alias("canonical"),
    )


def unicode_nfc_audit(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unicode NFC normalization audit — the canonicalization step
    exact dedup silently depends on: 'café' spelled with a combining
    acute (e + U+0301) md5-differs from its precomposed twin (U+00E9)
    even though every renderer shows the same glyphs, so un-normalized
    corpora leak duplicate documents straight past ``exact_dedup``.

    Spark ships no NFC builtin, so normalization runs in an
    Arrow-batched ``mapInPandas`` kernel over stdlib ``unicodedata``
    (self-contained closure, pickled by value per the repo's
    harness-CWD rule); the audit emits per-doc char counts before and
    after, a changed flag, and md5 of the NFC form — which DuckDB
    reproduces natively via ``nfc_normalize`` + ``md5``, so the
    kernel's entire output is hash-verifiable. Per-row map, no
    shuffle. NULL text propagates as NULL in every output column
    (round-12 advice fix: a bare astype(str) turned NULL into the
    literal 'None', emitting counts and md5('None') where the DuckDB
    twin's nfc_normalize + md5 return NULL)."""
    id_name, text_name = id_col, text_col

    def _batches(it):
        import hashlib as _hashlib
        import unicodedata as _ud

        import pandas as _pd

        for pdf in it:
            n_raw, n_nfc, changed, md5s = [], [], [], []
            for v in pdf[text_name]:
                if v is None or (isinstance(v, float) and v != v):
                    n_raw.append(None)
                    n_nfc.append(None)
                    changed.append(None)
                    md5s.append(None)
                    continue
                t = str(v)
                n = _ud.normalize("NFC", t)
                n_raw.append(len(t))
                n_nfc.append(len(n))
                changed.append(t != n)
                md5s.append(_hashlib.md5(n.encode("utf-8")).hexdigest())
            yield _pd.DataFrame(
                {
                    "id": pdf[id_name].astype("int64"),
                    "n_chars_raw": _pd.array(n_raw, dtype="Int64"),
                    "n_chars_nfc": _pd.array(n_nfc, dtype="Int64"),
                    "changed": _pd.array(changed, dtype="boolean"),
                    "nfc_md5": md5s,
                }
            )

    schema = (
        "id bigint, n_chars_raw bigint, n_chars_nfc bigint, "
        "changed boolean, nfc_md5 string"
    )
    return df.select(id_col, text_col).mapInPandas(_batches, schema=schema)


def boilerplate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Cross-document duplicated-span (boilerplate) audit — the
    C4/RefinedWeb line-dedup step re-expressed for a corpus without
    line structure: each document is segmented into fixed
    ``span_tokens``-token non-overlapping spans (deterministic — the
    last span may be short), and a span occurring in >= ``min_df``
    DISTINCT documents is boilerplate (headers, footers, license
    blurbs — the spans that poison pretraining if left duplicated).

    Output per document with at least one span: (doc_id, n_spans,
    n_boiler_spans, boiler_ppm). Exact integers end-to-end; the
    span doc-frequency is one hash aggregate over the exploded span
    table and the flag join is span-keyed — the same bucketed shape
    as the shingle index, linear in corpus token count at any
    scale."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias("_t"),
    ).where(F.size("_t") > 0)
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(_t) /"
                f" CAST({span_tokens} AS DOUBLE)) AS INT) - 1),"
                f" i -> array_join(slice(_t, i * {span_tokens} + 1,"
                f" {span_tokens}), ' '))"
            )
        ).alias("span"),
    )
    spans = spans.localCheckpoint(eager=True)  # feeds df agg + per-doc
    df_per_span = (
        spans.select("doc_id", "span")
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    )
    boiler = df_per_span.where(F.col("_df") >= min_df).select(
        "span", F.lit(1).alias("_b")
    )
    flagged = spans.join(boiler, "span", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_boiler_spans",
            F.expr(
                "CAST((1000000 * n_boiler_spans) div n_spans AS BIGINT)"
            ).alias("boiler_ppm"),
        )
    )


def source_token_tvd(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source unigram total-variation distance from the corpus
    distribution — the mixture diagnostic next to the mixture
    sampler: which sources are lexically OFF-DISTRIBUTION (and would
    shift the training mix)?

    TVD(p_s, p) = 1/2 * sum_t |c_st/N_s - c_t/N| over ALL corpus
    tokens (absent tokens contribute c_t/N — skipping them
    understates the distance), cross-multiplied onto the common
    denominator N_s*N and accumulated on DECIMAL(38,0) (c_t*N_s
    passes int64 at corpus scale):

        tvd_ppm = (1e6 * sum_t |c_st*N - c_t*N_s|) div (2*N_s*N)

    exact integer, floor leak identical cross-engine. Plan shape:
    one token-count aggregate, then a (sources x vocab) frame built
    from two SMALL rollups (per-source totals x per-token totals,
    both broadcastable) left-joined with the per-source-token counts
    — linear in vocab * n_sources, never in corpus size. Output:
    (source, n_tokens_source, tvd_ppm)."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
        ).alias("token"),
    )
    cst = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    ).localCheckpoint(eager=True)  # feeds 3 rollups below
    ct = cst.groupBy("token").agg(
        F.sum("c_st").cast("bigint").alias("c_t")
    )
    ns = cst.groupBy("source").agg(
        F.sum("c_st").cast("bigint").alias("n_s")
    )
    n_1row = ct.agg(F.sum("c_t").cast("bigint").alias("n"))
    grid = ns.crossJoin(F.broadcast(ct)).join(
        cst, ["source", "token"], "left"
    ).crossJoin(F.broadcast(n_1row))
    return (
        grid.select(
            "source",
            "n_s",
            "n",
            F.expr(
                "abs(CAST(COALESCE(c_st, 0) AS DECIMAL(38,0)) * n"
                " - CAST(c_t AS DECIMAL(38,0)) * n_s)"
            ).alias("_term"),
        )
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens_source"),
            F.max("n").alias("_n"),
            F.sum("_term").alias("_sum"),
        )
        .select(
            "source",
            F.col("n_tokens_source").cast("bigint").alias(
                "n_tokens_source"
            ),
            F.expr(
                "CAST((1000000 * _sum) div (2 * CAST(n_tokens_source"
                " AS DECIMAL(38,0)) * _n) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


def lm_quality_proxy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 1000,
    sample_mod: int = 1,
) -> DataFrame:
    """Unigram language-model quality proxy per document — the
    transcendental-free stand-in for perplexity filtering (true
    perplexity is a geometric mean of probabilities = logs, which the
    repo's ln/exp ban rightly keeps out of compared columns): rank
    documents by the ARITHMETIC mean of their tokens' corpus unigram
    probabilities, plus coverage of the top-``top_k`` vocabulary.
    Both order documents the same way perplexity does for the
    gibberish/boilerplate tails the filter exists to catch, and both
    are exact integer rationals:

        mean_prob_ppb    = (1e9 * sum_t cnt(t)) div (n_tokens * N)
        top_coverage_ppm = (1e6 * occurrences in top-k vocab)
                           div n_tokens

    Scale shape: corpus counts are one map-side-combinable aggregate;
    the top-k vocabulary is a bounded TakeOrdered broadcast (count
    desc, token asc — total order); N is a broadcast 1-row total; the
    per-doc rollup joins occurrences to counts on the token equi-key.
    ``sample_mod`` bounds the emitted rows (md5-free residue on the
    numeric id — the audit is per-doc, the sample is the output
    knob). Numerator on DECIMAL(38,0) (cnt*1e9 passes int64 only
    below ~9e9-token corpora). Output: (doc_id, n_tokens, sum_cnt,
    mean_prob_ppb, top_coverage_ppm)."""
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(text_col, " "), lambda t: t != "")
        ).alias("token"),
    )
    counts = occ.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("n_corpus"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_k)
        .select("token", F.lit(1).alias("_in_top"))
    )
    per_doc = (
        occ.where(F.col("doc_id") % sample_mod == 0)
        .join(counts, "token")
        .join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("sum_cnt"),
            F.sum(F.expr("CASE WHEN _in_top IS NULL THEN 0 ELSE 1 END"))
            .cast("bigint")
            .alias("_in_top_occ"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "sum_cnt",
        F.expr(
            "CAST((CAST(1000000000 AS DECIMAL(38,0)) * sum_cnt)"
            " div (CAST(n_tokens AS DECIMAL(38,0)) * n_corpus)"
            " AS BIGINT)"
        ).alias("mean_prob_ppb"),
        F.expr(
            "CAST((1000000 * _in_top_occ) div n_tokens AS BIGINT)"
        ).alias("top_coverage_ppm"),
    )


def bigram_coherence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    sample_mod: int = 1,
) -> DataFrame:
    """Bigram-coherence quality proxy per document — the fluency
    companion of lm_quality_proxy: what fraction of a document's
    adjacent token pairs are bigrams the CORPUS actually repeats
    (count >= ``min_count``)? Shuffled or templated text scores low
    even when its unigrams are common — exactly the failure mode
    unigram filters miss.

        coherence_ppm = (1e6 * n_hits) div n_bigrams

    Bigrams come from the repo's codegen'd slice-zip array expression
    (``bigrams()`` — no window, no explode until here); corpus
    bigram counts are one map-side-combinable aggregate joined back
    on the bigram equi-key. ``sample_mod`` bounds the emitted rows.
    Documents with fewer than 2 tokens emit no row (no bigrams
    exist). Output: (doc_id, n_bigrams, n_hits, coherence_ppm)."""
    bg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bigrams(text_col)).alias("bigram"),
    )
    counts = bg.groupBy("bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return (
        bg.where(F.col("doc_id") % sample_mod == 0)
        .join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.expr(f"CASE WHEN cnt >= {int(min_count)} THEN 1"
                         " ELSE 0 END"))
            .cast("bigint")
            .alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_hits",
            F.expr(
                "CAST((1000000 * n_hits) div n_bigrams AS BIGINT)"
            ).alias("coherence_ppm"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Tokenizer fertility by (source, detected language) — the
    multilingual-tokenizer audit: subtokens per whitespace word (a
    tokenizer that fragments one language 2x more than another
    silently halves that language's effective context window; the
    standard fairness number in multilingual-vocab papers).

    words = non-empty whitespace tokens; subtokens = the BPE-ish
    pre-tokenizer split (letter runs / digit runs / single symbols,
    identical in Java regex and DuckDB RE2); language = the repo's
    stopword-profile lang_id. All-integer rollup:

        fertility_ppm  = (1e6 * sum subtokens) div (sum words)
        chars_per_subtoken_ppm = (1e6 * sum chars) div (sum subtokens)

    One per-doc projection + one groupBy — no joins, no windows.
    Groups whose documents have no words emit NULL ppm. Output:
    (source, pred_lang, n_docs, n_words, n_subtokens,
    fertility_ppm, chars_per_subtoken_ppm)."""
    toks = F.filter(F.split(text_col, " "), lambda t: t != "")
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _PROFILE_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _PROFILE_ORDER:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.size(toks).cast("bigint").alias("w"),
        F.size(
            F.expr(
                f"regexp_extract_all({text_col},"
                " '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"
            )
        )
        .cast("bigint")
        .alias("st"),
        F.length(text_col).cast("bigint").alias("ch"),
        *lang_scores(text_col),
    ).select("source", "w", "st", "ch", pred.alias("pred_lang"))
    return (
        per_doc.groupBy("source", "pred_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("st").cast("bigint").alias("n_subtokens"),
            F.sum("ch").cast("bigint").alias("_chars"),
        )
        .select(
            "source",
            "pred_lang",
            "n_docs",
            "n_words",
            "n_subtokens",
            F.expr(
                "CASE WHEN n_words > 0 THEN"
                " CAST((1000000 * n_subtokens) div n_words AS BIGINT) END"
            ).alias("fertility_ppm"),
            F.expr(
                "CASE WHEN n_subtokens > 0 THEN"
                " CAST((1000000 * _chars) div n_subtokens AS BIGINT) END"
            ).alias("chars_per_subtoken_ppm"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (10, 100, 1000),
) -> DataFrame:
    """Head-vocabulary coverage curve — how much of the corpus do the
    top-k tokens cover? The Zipf companion a tokenizer/vocab designer
    actually reads: Zipf gives the slope, this gives the budget
    ("1000 types cover 87% of tokens").

    Token counts are one map-side-combinable aggregate; ranking by
    (count DESC, token) — a total order — runs over the VOCABULARY-
    sized frame (documented bound: types, not tokens; the single-
    partition rank window never sees the corpus). Exact integers:
    coverage_ppm = (1e6 * covered) div total. Output one row per k:
    (k, n_vocab, total_tokens, covered_tokens, coverage_ppm)."""
    toks = docs.select(
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("tok"))
    ranked = counts.select(
        "cnt", F.row_number().over(w_rank).cast("bigint").alias("rnk")
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
    )
    ks_df = docs.sparkSession.createDataFrame(
        [(int(k),) for k in ks], "k long"
    )
    covered = (
        ks_df.join(ranked, ranked.rnk <= ks_df.k)
        .groupBy("k")
        .agg(F.sum("cnt").cast("bigint").alias("covered_tokens"))
    )
    return (
        ks_df.join(covered, "k", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_vocab",
            "total_tokens",
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.expr(
                "CASE WHEN total_tokens > 0 THEN"
                " CAST((1000000 * coalesce(covered_tokens, 0))"
                " div total_tokens AS BIGINT) END"
            ).alias("coverage_ppm"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    train_mod: int = 64,
    train_cut: int = 48,
) -> DataFrame:
    """Held-out n-gram novelty per source — the generalization /
    memorization probe: split the corpus by the md5 hash family
    (md5('nov|'||id) mod ``train_mod`` < ``train_cut`` -> train, else
    held-out), then measure what fraction of held-out n-gram
    INSTANCES never occur in any training document. Low novelty =
    the held-out text is recombinations of training text (a dedup /
    contamination smell); high novelty = genuinely fresh text.

    Scale shape: the train side reduces to a DISTINCT shingle set
    (one groupBy on the shingle key); the held-out instances LEFT
    JOIN it on the same key — both sides hash-partitioned by
    shingle, no index materialized twice. novelty_ppm = (1e6 *
    unseen) div total (NULL when a source has no held-out
    instances). Output: (source, n_heldout_docs, n_instances,
    n_unseen, novelty_ppm)."""
    from kafka_streams_aggregate_spark.operators.dedup import token_shingles

    res = (
        f"CAST(conv(substr(md5(concat('nov|', CAST({id_col} AS STRING))),"
        f" 1, 15), 16, 10) AS BIGINT) % {train_mod}"
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.explode(token_shingles(text_col, n)).alias("shingle"),
        (F.expr(res) < train_cut).alias("_train"),
    )
    train_set = (
        base.where(F.col("_train")).select("shingle").distinct()
        .withColumn("_seen", F.lit(1))
    )
    held = base.where(~F.col("_train"))
    flagged = held.join(train_set, "shingle", "left")
    agg = flagged.groupBy("source").agg(
        F.countDistinct("id").cast("bigint").alias("n_heldout_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_instances"),
        F.sum(F.expr("CASE WHEN _seen IS NULL THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_unseen"),
    )
    return agg.select(
        "source",
        "n_heldout_docs",
        "n_instances",
        "n_unseen",
        F.expr(
            "CASE WHEN n_instances > 0 THEN"
            " CAST((1000000 * n_unseen) div n_instances AS BIGINT) END"
        ).alias("novelty_ppm"),
    )


def hapax_ratio(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Hapax-legomena profile per source — the share of a source's
    vocabulary seen exactly once (and twice: dis legomena). High hapax
    share = productive/noisy vocabulary (OCR junk, code, UGC typos);
    abnormally LOW = templated/boilerplate text — the one-number
    vocabulary-health check next to zipf_rank_freq's slope and
    heaps' growth. All exact integer counts:

        hapax_ppm = (1e6 * #{tokens with count 1}) div vocab_size

    Output: (source, tokens_total, vocab_size, n_hapax, n_dis,
    hapax_ppm). One explode + two groupBys — the word-count shape,
    linear at any scale."""
    occ = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    counts = occ.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    agg = counts.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("tokens_total"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.expr("CASE WHEN cnt = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.expr("CASE WHEN cnt = 2 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_dis"),
    )
    return agg.select(
        "source",
        "tokens_total",
        "vocab_size",
        "n_hapax",
        "n_dis",
        F.expr(
            "CASE WHEN vocab_size > 0 THEN"
            " CAST((1000000 * n_hapax) div vocab_size AS BIGINT) END"
        ).alias("hapax_ppm"),
    )


def vocab_overlap_matrix(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Pairwise vocabulary overlap between sources — WHICH corpora
    speak the same language? Exact Jaccard of the distinct-token sets
    per unordered source pair: the corpus-comparison number mixture
    designers read before merging sources (near-disjoint vocabularies
    = complementary data; near-identical = redundancy the dedup tier
    should explain). All exact integers:

        jaccard_ppm = (1e6 * n_common) div (n_a + n_b - n_common)

    Shape: distinct (source, token) index, self-joined on the token
    equi-key with source_a < source_b — intersection counts
    materialize only for shared tokens (vocabulary-sized, not
    corpus-sized). Output: (source_a, source_b, n_a, n_b, n_common,
    jaccard_ppm)."""
    occ = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("tok"),
    ).distinct()
    sizes = occ.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("_sz")
    )
    a = occ.select(F.col("source").alias("source_a"), "tok")
    b = occ.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("_sz").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("_sz").alias("n_b")
    )
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) div (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def token_burstiness(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token burstiness per source — Church & Gale's observation that
    content words CLUMP (a document that uses a word once tends to
    use it again) while function words spread evenly: per type,
    burstiness = cf/df (collection frequency over document
    frequency, >= 1), floored per type to milli so the per-source
    sum is exact and order-independent:

        avg_burst_milli = (sum over types of (1000*cf) div df)
                          div n_types

    High average burstiness = topical/contentful text; ~1000 =
    function-word-dominated or templated. One groupBy to the
    (source, token) profile (cf = count, df = distinct docs), one
    rollup. Output: (source, n_types, n_tokens, n_bursty_types,
    avg_burst_milli) — n_bursty_types counts cf > df."""
    occ = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_doc"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    prof = occ.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cf"),
        F.countDistinct("_doc").cast("bigint").alias("df"),
    )
    return (
        prof.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("cf").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("CASE WHEN cf > df THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_bursty_types"),
            F.sum(F.expr("(1000 * cf) div df")).cast("bigint").alias(
                "_bm"
            ),
        )
        .select(
            "source",
            "n_types",
            "n_tokens",
            "n_bursty_types",
            F.expr(
                "CASE WHEN n_types > 0 THEN"
                " CAST(_bm div n_types AS BIGINT) END"
            ).alias("avg_burst_milli"),
        )
    )


def mattr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    window: int = 25,
) -> DataFrame:
    """Moving-average type-token ratio (MATTR, Covington & McFall) per
    group — the standard lexical-diversity score that, unlike plain
    TTR, does not shrink with document length: the mean distinct-token
    count over every length-``window`` sliding window, all windows of
    all docs in the group pooled. Computed CLOSED-FORM — no per-window
    loop: token position i (0-based) with previous same-token
    occurrence p (-1 if none) is distinct-in-window for starts s in
    [max(0, i-W+1, p+1), min(i, L-W)], so its contribution is that
    interval's length and one lag window + one sum replaces the
    W-times-L scan. Docs shorter than the window are dropped AND
    counted (the drop-reporting convention).

        mattr_ppm = (1e6 * sum contrib) div (sum (L-W+1) * W)

    Output: (group_key, n_docs, n_short, n_windows, mattr_ppm)."""
    from kafka_streams_aggregate_spark.sources.tables import (
        with_scan_parallelism,
    )

    gc = "group_key"
    toks = tokens(text_col)
    # tokenize + posexplode is the CPU-heavy stage; single-file local
    # parquet scans it in ONE task without the round-robin widen
    ex = with_scan_parallelism(df).select(
        F.col(group_col).alias(gc),
        F.col(id_col).alias("_id"),
        F.size(toks).alias("l"),
        F.posexplode(toks).alias("pos", "tok"),
    ).where(F.col("l") >= window)
    contrib = (
        ex.select(
            gc,
            "_id",
            "l",
            "pos",
            F.expr(
                "lag(pos) OVER (PARTITION BY _id, tok ORDER BY pos)"
            ).alias("prev"),
        )
        .select(
            gc,
            F.expr(
                f"greatest(0, least(pos, l - {window})"
                f" - greatest(0, pos - {window} + 1,"
                " coalesce(prev, -1) + 1) + 1)"
            ).alias("c"),
        )
        .groupBy(gc)
        .agg(F.sum("c").cast("bigint").alias("_total"))
    )
    docs = (
        df.select(
            F.col(group_col).alias(gc),
            F.size(toks).alias("l"),
        )
        .groupBy(gc)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr(f"CASE WHEN l < {window} THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_short"),
            F.sum(
                F.expr(
                    f"CASE WHEN l >= {window} THEN l - {window} + 1"
                    " ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_windows"),
        )
    )
    return docs.join(contrib, gc, "left").select(
        gc,
        "n_docs",
        "n_short",
        "n_windows",
        F.expr(
            "CASE WHEN n_windows > 0 THEN"
            " CAST((1000000 * coalesce(_total, 0))"
            f" div (n_windows * {window}) AS BIGINT) END"
        ).alias("mattr_ppm"),
    )
