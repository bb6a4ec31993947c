"""Source-format coverage: CSV and JSON scans produce the same rows as
the parquet source (SURVEY.md §2.3 'File-format scans'), with explicit
schemas (no inference in the engine path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _nation_sorted(df):
    return [tuple(r) for r in df.orderBy("n_nationkey").collect()]


def test_csv_roundtrip_matches_parquet(spark, tmp_path):
    nation = load_table(spark, "nation", SF)
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    back = spark.read.schema(nation.schema).option("header", True).csv(path)
    assert _nation_sorted(back) == _nation_sorted(nation)


def test_json_roundtrip_matches_parquet(spark, tmp_path):
    nation = load_table(spark, "nation", SF)
    path = str(tmp_path / "nation_json")
    nation.write.json(path)
    back = spark.read.schema(nation.schema).json(path)
    assert _nation_sorted(back) == _nation_sorted(nation)


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    nation = load_table(spark, "nation", SF)
    path = str(tmp_path / "nation_orc")
    nation.write.orc(path)
    back = spark.read.schema(nation.schema).orc(path)
    assert _nation_sorted(back) == _nation_sorted(nation)


def test_kafka_source_absent_fails_cleanly(spark):
    """The kafka connector jar is not bundled in this environment; the
    source factory must surface Spark's standard missing-data-source
    error (not an obscure crash) so deployments know to add the
    spark-sql-kafka package."""
    import pytest as _pytest

    from kafka_streams_aggregate_spark.streaming.pipeline import (
        kafka_update_source,
    )

    with _pytest.raises(Exception, match="[Kk]afka"):
        kafka_update_source(spark, "localhost:9092")


def test_vectorized_neardup_bit_identical_to_hof(spark):
    """The dim-ordered numpy accumulation must equal the sequential
    HOF fold bit-for-bit — same pairs, same sim doubles."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        _neardup_pairs_bruteforce_oracle,
        embedding_neardup_pairs_vectorized,
    )

    emb = load_table(spark, "embeddings", SF)
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in _neardup_pairs_bruteforce_oracle(emb, threshold=0.3).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in embedding_neardup_pairs_vectorized(emb, threshold=0.3).collect()
    }
    assert exact == fast  # exact float equality, not approx


def test_blocked_neardup_invariant_to_block_count(spark):
    """Block-grid size is a physical knob: any n_blocks must emit the
    identical pair set with bit-identical sims (normalization is
    per-row, the dot per-pair — blocking can't change either)."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        embedding_neardup_pairs_vectorized,
    )

    emb = load_table(spark, "embeddings", SF)
    by_blocks = [
        {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in embedding_neardup_pairs_vectorized(
                emb, threshold=0.3, n_blocks=b
            ).collect()
        }
        for b in (1, 3, 8)
    ]
    assert by_blocks[0] == by_blocks[1] == by_blocks[2]
    assert len(by_blocks[0]) > 0


def test_gemm_topk_agrees_with_exact_topk(spark):
    """The BLAS path must produce the same (query, neighbor, rank)
    triples as the bit-reproducible exact path — only the sim doubles
    may differ in low-order bits."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_gemm,
    )

    emb = load_table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    gemm = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_gemm(emb, queries, k=10).collect()
    }
    assert exact == gemm


def test_scan_parallelism_floor(spark):
    """The floor repartitions degenerate (single-split) scans up to the
    session's core count, leaves well-split inputs untouched, and never
    changes row contents."""
    from kafka_streams_aggregate_spark.sources.tables import with_scan_parallelism

    docs = load_table(spark, "documents", SF)
    assert docs.rdd.getNumPartitions() == 1  # single-file, single row group
    floored = with_scan_parallelism(docs)
    par = spark.sparkContext.defaultParallelism
    assert floored.rdd.getNumPartitions() == par
    assert floored.count() == docs.count()

    wide = spark.range(0, 1000, 1, par * 2)
    assert with_scan_parallelism(wide.toDF("id")) .rdd.getNumPartitions() == par * 2


def test_xml_source_roundtrip_and_corrupt_records(spark, tmp_path):
    """Native XML source (Spark 4): distributed write with rowTag,
    read-back under an EXPLICIT schema (no inference in the engine
    path, same rule as CSV/JSON here), cell-equal to the parquet rows;
    malformed row elements surface through PERMISSIVE
    _corrupt_record instead of failing the scan."""
    ev = load_table(spark, "events", SF).select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "events_xml")
    ev.write.format("xml").option("rowTag", "event").save(path)
    back = (
        spark.read.format("xml")
        .schema(ev.schema)
        .option("rowTag", "event")
        .load(path)
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(back) == key(ev)

    # corrupt-record audit: one bad row element among good ones
    bad = str(tmp_path / "bad.xml")
    with open(bad, "w") as f:
        f.write(
            "<rows>"
            "<event><event_id>1</event_id><user_id>2</user_id>"
            "<event_type>view</event_type></event>"
            "<event><event_id>NOT_A_NUMBER</event_id><user_id>3</user_id>"
            "<event_type>click</event_type></event>"
            "</rows>"
        )
    audited = (
        spark.read.format("xml")
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, _corrupt_record STRING")
        .option("rowTag", "event")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .load(bad)
    )
    rows = audited.collect()
    good = [r for r in rows if r._corrupt_record is None]
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 1 and good[0].event_id == 1
    assert len(corrupt) == 1 and "NOT_A_NUMBER" in corrupt[0]._corrupt_record


def test_from_xml_to_xml_column_functions(spark):
    """from_xml/to_xml as column expressions: XML payloads embedded in
    a table column parse to typed structs in-flight (the Kafka-value
    pattern with an XML wire format) and serialize back."""
    ev = load_table(spark, "events", SF).limit(50).select("event_id", "user_id")
    xml = ev.select(
        "event_id",
        F.concat(
            F.lit("<r><uid>"), F.col("user_id"), F.lit("</uid></r>")
        ).alias("payload"),
    )
    parsed = xml.select(
        "event_id", F.from_xml("payload", "uid BIGINT").alias("p")
    ).select("event_id", F.col("p.uid").alias("uid"))
    assert sorted(tuple(r) for r in parsed.collect()) == sorted(
        tuple(r) for r in ev.collect()
    )
    back = parsed.select(
        F.to_xml(F.struct(F.col("uid"))).alias("x")
    ).limit(1).collect()[0].x
    assert "<uid>" in back
