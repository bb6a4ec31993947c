"""Round-14 fresh queue, batch 3 — LLM-data quality and mixture
operators: unigram LM quality proxy, bigram coherence, tokenizer
fertility (operators/text.py) and the T=2 temperature mixture
(operators/llm_prep.py). Registration-ready oracle texts in the
*_ORACLE constants.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

LMQ_ORACLE = """
    WITH occ AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS token
        FROM read_parquet('{sf}/documents.parquet')
    ),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM occ GROUP BY token
    ),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_corpus FROM counts),
    vocab AS (
        SELECT token FROM counts
        QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 1000
    ),
    per_doc AS (
        SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(c.cnt) AS BIGINT) AS sum_cnt,
               CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS in_top
        FROM occ o
        JOIN counts c ON c.token = o.token
        LEFT JOIN vocab v ON v.token = o.token
        WHERE o.doc_id % 10 = 0
        GROUP BY o.doc_id
    )
    SELECT doc_id, n_tokens, sum_cnt,
           CAST((CAST(1000000000 AS HUGEINT) * sum_cnt)
                // (CAST(n_tokens AS HUGEINT) * n_corpus) AS BIGINT)
               AS mean_prob_ppb,
           CAST((1000000 * in_top) // n_tokens AS BIGINT)
               AS top_coverage_ppm
    FROM per_doc, total
"""

_BIGRAMS = (
    "list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 0)"
    " + 1), i -> array_to_string(list_slice(string_split(text, ' '), "
    "CAST(i AS INT), CAST(i + 1 AS INT)), ' '))"
)

BGC_ORACLE = f"""
    WITH bg AS (
        SELECT doc_id, unnest({_BIGRAMS}) AS bigram
        FROM read_parquet('{{sf}}/documents.parquet')
    ),
    counts AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM bg GROUP BY bigram
    )
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN c.cnt >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           CAST((1000000 * SUM(CASE WHEN c.cnt >= 3 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS coherence_ppm
    FROM bg b JOIN counts c ON c.bigram = b.bigram
    WHERE b.doc_id % 10 = 0
    GROUP BY b.doc_id
"""

MIXTEMP_ORACLE = """
    WITH toks AS (
        SELECT source,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                    x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM read_parquet('{sf}/documents.parquet') GROUP BY source
    ),
    pop AS (
        SELECT source, n_tokens,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                   AS w_temp
        FROM toks
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS nt,
               CAST(SUM(w_temp) AS BIGINT) AS w
        FROM pop
    ),
    staged AS (
        SELECT source, n_tokens, w_temp,
               CAST((1000000 * n_tokens) // nt AS BIGINT)
                   AS nat_share_ppm,
               CAST((1000000 * w_temp) // w AS BIGINT) AS temp_share_ppm,
               CAST((100000 * w_temp) // w AS BIGINT) AS base,
               CAST((100000 * w_temp) % w AS BIGINT) AS rem
        FROM pop, tot
    )
    SELECT source, n_tokens, w_temp, nat_share_ppm, temp_share_ppm,
           CAST(base + CASE WHEN row_number() OVER
                    (ORDER BY rem DESC, source)
                <= 100000 - SUM(base) OVER () THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM staged
"""

FERTILITY_ORACLE = """
    WITH per_doc AS (
        SELECT source,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x <> '')) AS BIGINT) AS w,
               CAST(len(regexp_extract_all(text,
                    '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS st,
               CAST(length(text) AS BIGINT) AS ch,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('der','die','das','und','ist')))
                    AS INTEGER) AS score_de,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','and','of','to')))
                    AS INTEGER) AS score_en,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('el','la','los','y','de')))
                    AS INTEGER) AS score_es,
               CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('le','la','et','les','des')))
                    AS INTEGER) AS score_fr
        FROM read_parquet('{sf}/documents.parquet')
    ),
    tagged AS (
        SELECT source, w, st, ch,
               CASE WHEN greatest(score_de, score_en, score_es, score_fr)
                         = 0 THEN 'und'
                    WHEN score_de = greatest(score_de, score_en,
                         score_es, score_fr) THEN 'de'
                    WHEN score_en = greatest(score_de, score_en,
                         score_es, score_fr) THEN 'en'
                    WHEN score_es = greatest(score_de, score_en,
                         score_es, score_fr) THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM per_doc
    )
    SELECT source, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_words,
           CAST(SUM(st) AS BIGINT) AS n_subtokens,
           CASE WHEN SUM(w) > 0 THEN
                CAST((1000000 * SUM(st)) // SUM(w) AS BIGINT) END
               AS fertility_ppm,
           CASE WHEN SUM(st) > 0 THEN
                CAST((1000000 * SUM(ch)) // SUM(st) AS BIGINT) END
               AS chars_per_subtoken_ppm
    FROM tagged GROUP BY source, pred_lang
"""


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.sql(sql.format(sf=SF)).df()
    finally:
        con.close()


def _docs(spark):
    from kafka_streams_aggregate_spark.sources.tables import load_table

    return load_table(spark, "documents", SF)


def test_lm_quality_proxy_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import lm_quality_proxy

    got = lm_quality_proxy(
        _docs(spark), top_k=1000, sample_mod=10
    ).toPandas()
    _cmp(got, _duck(LMQ_ORACLE), ["doc_id"])


def test_lm_quality_proxy_hand_values(spark):
    """Corpus 'a a b' + 'a c': token counts a=3, b=1, c=1, N=5.
    Doc 0 sum_cnt = 3+3+1 = 7 over 3 tokens: ppb = 7e9 div 15 =
    466666666. top_k=1 keeps only 'a': doc 0 coverage = 2/3."""
    from kafka_streams_aggregate_spark.operators.text import lm_quality_proxy

    rows = [(0, "a a b"), (1, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm_quality_proxy(df, top_k=1, sample_mod=1).collect()}
    assert out[0]["sum_cnt"] == 7 and out[0]["n_tokens"] == 3
    assert out[0]["mean_prob_ppb"] == (10**9 * 7) // 15
    assert out[0]["top_coverage_ppm"] == (10**6 * 2) // 3
    assert out[1]["sum_cnt"] == 4
    assert out[1]["top_coverage_ppm"] == 500_000


def test_bigram_coherence_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import bigram_coherence

    got = bigram_coherence(
        _docs(spark), min_count=3, sample_mod=10
    ).toPandas()
    _cmp(got, _duck(BGC_ORACLE), ["doc_id"])


def test_bigram_coherence_hand_values(spark):
    """Three docs repeating 'x y' (count 3) plus one shuffled doc:
    the repeated bigram hits at min_count=3, the shuffled doc's
    bigrams don't. One-token docs emit no row."""
    from kafka_streams_aggregate_spark.operators.text import bigram_coherence

    rows = [(0, "x y"), (1, "x y"), (2, "x y"), (3, "y x"), (4, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           bigram_coherence(df, min_count=3, sample_mod=1).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["coherence_ppm"] == 1_000_000
    assert out[3]["coherence_ppm"] == 0


def test_mixture_temperature_parity(spark):
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        mixture_temperature,
    )

    got = mixture_temperature(_docs(spark), token_budget=100_000).toPandas()
    _cmp(got, _duck(MIXTEMP_ORACLE), ["source"])
    # Hamilton invariant: the allocation sums exactly to the budget
    assert got["alloc_tokens"].sum() == 100_000


def test_mixture_temperature_hand_values(spark):
    """Sources with 100 vs 400 tokens: natural shares 20%/80%;
    sqrt temperature gives w = 10/20, flattening to 33%/66% — the
    whole point of T=2. Allocation = exact Hamilton of the budget."""
    from kafka_streams_aggregate_spark.operators.llm_prep import (
        mixture_temperature,
    )

    rows = [("s1", " ".join(["a"] * 100)), ("s2", " ".join(["b"] * 400))]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in
           mixture_temperature(df, token_budget=90).collect()}
    assert out["s1"]["w_temp"] == 10 and out["s2"]["w_temp"] == 20
    assert out["s1"]["nat_share_ppm"] == 200_000
    assert out["s1"]["temp_share_ppm"] == 333_333
    assert out["s1"]["alloc_tokens"] + out["s2"]["alloc_tokens"] == 90
    assert out["s1"]["alloc_tokens"] == 30  # exact thirds


def test_tokenizer_fertility_parity(spark):
    from kafka_streams_aggregate_spark.operators.text import (
        tokenizer_fertility,
    )

    got = tokenizer_fertility(_docs(spark)).toPandas()
    _cmp(got, _duck(FERTILITY_ORACLE), ["source", "pred_lang"])


def test_tokenizer_fertility_hand_values(spark):
    """'the cat99 sat' -> 3 words, 5 subtokens (the, cat, 99, sat
    ... wait: 'the','cat','99','sat' = 4) -> check exact integers:
    fertility = 1e6*4 div 3."""
    from kafka_streams_aggregate_spark.operators.text import (
        tokenizer_fertility,
    )

    rows = [(0, "the cat99 sat", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    [r] = tokenizer_fertility(df).collect()
    assert r["pred_lang"] == "en"
    assert (r["n_words"], r["n_subtokens"]) == (3, 4)
    assert r["fertility_ppm"] == (10**6 * 4) // 3
