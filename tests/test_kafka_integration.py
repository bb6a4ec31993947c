"""Gated live-Kafka integration test for the S1/S7 literal transport.

The reference's actual I/O is a Kafka broker (application.yml:3-7);
this sandbox ships neither a broker nor the spark-sql-kafka jar, so
the suite normally exercises the oracle-verified DataSource twin
(sources/eventlog_source.py) instead. This test closes the remaining
gap WHERE POSSIBLE: when ``KAFKA_BOOTSTRAP_SERVERS`` points at a
reachable broker and the Kafka connector class resolves, it drives the
real topology end-to-end — seed the input topic via Spark's own batch
Kafka writer, run ``start_kafka_pipeline``, batch-read the output
topic, and check latest-per-key counts against the batch closed-form
fold (the same latest-wins read the reference's own test uses,
KafkaStreamsInventoryCountTests.java:175-189). Skips cleanly
otherwise, with the reason recorded.
"""

from __future__ import annotations

import json
import os
import socket
import tempfile
import time

import pytest

from kafka_streams_aggregate_spark.streaming.pipeline import (
    INPUT_TOPIC,
    OUTPUT_TOPIC,
    start_kafka_pipeline,
)


def _broker_reachable(servers: str, timeout: float = 2.0) -> bool:
    # servers may be "host:port[,host:port...]" — probe the first.
    first = servers.split(",")[0]
    host, _, port = first.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout):
            return True
    except OSError:
        return False


def _kafka_connector_available(spark) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kafka", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


@pytest.mark.kafka
def test_kafka_pipeline_end_to_end(spark):
    servers = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")
    if not servers:
        pytest.skip("KAFKA_BOOTSTRAP_SERVERS not set (no live broker)")
    if not _broker_reachable(servers):
        pytest.skip(f"broker {servers} not reachable")
    if not _kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")

    # Seed the input topic through Spark's batch Kafka writer: the same
    # (key, value) JSON shapes the reference producer emits.
    records = [
        ("p1", 1, "INC", 5),
        ("p1", 2, "INC", 3),
        ("p2", 3, "REP", 10),
        ("p1", 4, "DEC", 2),
        ("p2", 5, "INC", 1),
    ]
    rows = [
        (
            json.dumps({"productCode": code}),
            json.dumps({"action": action, "delta": delta}),
        )
        for code, _seq, action, delta in records
    ]
    spark.createDataFrame(rows, "key string, value string").write.format(
        "kafka"
    ).option("kafka.bootstrap.servers", servers).option("topic", INPUT_TOPIC).save()

    with tempfile.TemporaryDirectory(prefix="ksa_kafka_ckpt_") as ckpt:
        q = start_kafka_pipeline(spark, servers, ckpt)
        try:
            expected = {"p1": 6, "p2": 11}  # INC/DEC fold, REP replaces
            deadline = time.time() + 60
            got: dict[str, int] = {}
            while time.time() < deadline:
                out = (
                    spark.read.format("kafka")
                    .option("kafka.bootstrap.servers", servers)
                    .option("subscribe", OUTPUT_TOPIC)
                    .option("startingOffsets", "earliest")
                    .load()
                    .selectExpr("CAST(key AS STRING) k", "CAST(value AS STRING) v")
                    .collect()
                )
                got = {}
                for r in out:  # offset order: latest-per-key wins
                    code = json.loads(r["k"])["productCode"]
                    got[code] = json.loads(r["v"])["count"]
                if got == expected:
                    break
                time.sleep(2)
            assert got == expected, f"converged state {got} != {expected}"
        finally:
            q.stop()
