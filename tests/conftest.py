from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kafka: live Kafka broker integration — runs only with "
        "KAFKA_BOOTSTRAP_SERVERS set, a reachable broker, and the "
        "spark-sql-kafka jar on the classpath; skips otherwise",
    )


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from kafka_streams_aggregate_spark.session import get_spark

    # warehouse.dir is a static conf: point it at a temp dir up front so
    # saveAsTable tests never write into the repo.
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(
        app_name="ksa-tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
