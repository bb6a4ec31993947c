"""PySpark-native analytics engine with the capabilities of
dturanski/kafka-streams-aggregate, re-expressed Spark-first.

The reference (see /root/reference) is a Spring Cloud Stream / Kafka
Streams app whose entire query surface is one keyed stateful fold
(INC/DEC/REP inventory counting,
``KafkaStreamsInventoryCountApplication.java:69-85``). This package
re-expresses that fold — and the wider relational + LLM-data-pipeline
surface the engine is extended to — as declarative PySpark plans that
Catalyst/Tungsten optimize, with Structured Streaming carrying the
stateful streaming mode.

Layout:
    session      SparkSession factory tuned for the target scale
    schemas      Declared StructTypes (the reference's implicit Jackson
                 schemas, made explicit)
    sources/     Parquet table loaders, Kafka source/sink config,
                 streaming test sources
    operators/   The inventory fold (batch closed form), upsert/latest,
                 joins (as-of/range), top-k, dedup family, similarity
                 search, text analysis, multimodal plumbing
    functions/   Scalar expression helpers (JSON, hashing, vectors)
    plans/       Plan inspection helpers (pushdown/broadcast assertions)
    streaming/   The stateful streaming fold + pipeline builders
    registry     The declared-query registry (Spark callable + DuckDB
                 oracle SQL per query) consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
