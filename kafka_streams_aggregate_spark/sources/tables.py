"""Parquet table loaders for the driver test tables.

The reference's only source is a Kafka topic
(``application.yml:3-5``); the engine's batch surface reads columnar
parquet — scans get predicate pushdown + column pruning from Catalyst
for free, which is the 100 TB-scale requirement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns written as parquet TIMESTAMP(NANOS), which Spark reads only as
# long (spark.sql.legacy.parquet.nanosAsLong). Converted to microsecond
# timestamps here with integer `div 1000` truncation — exactly DuckDB's
# ns->us behavior, so oracle comparisons agree.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one driver table. Plain `spark.read.parquet` — scans stay
    declarative so filter pushdown / column pruning apply."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    try:
        # Runtime-settable; needed when the caller (e.g. the driver
        # harness) built the session without our factory. UTC keeps
        # timestamp values identical to the (UTC-naive) DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns:
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def with_scan_parallelism(df: DataFrame, floor: int | None = None) -> DataFrame:
    """Round-robin repartition a scan up to the session's core count —
    a no-op when the plan already has at least that many partitions.

    CPU-heavy per-row operators (shingling, 64-hash MinHash signatures,
    Arrow-batched vector kernels) run in the scan stage, so they inherit
    the file-split count. A small single-file table (the local test
    corpus) yields ONE split — serializing the expensive stage on one
    core of 32. At production scale the scan has thousands of splits and
    this returns the input unchanged; the repartition only fires on
    degenerate-split inputs, where the shuffled bytes are by definition
    small. Round-robin keeps batches size-balanced for Arrow kernels,
    and every caller's downstream aggregate is order-independent, so
    results are partitioning-invariant (pinned by
    tests/test_partitioning_independence.py)."""
    floor = floor or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= floor:
        return df
    return df.repartition(floor)


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every driver table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
