"""Driver-gate rehearsal: every registered query with an oracle must
match DuckDB exactly at sf0.001 (fast) — the same check the driver runs
at sf0.01. Queries without an oracle get a rows-run smoke check.

Round 13: the net rotates by QUARTERS (registry.oracle_rotation) —
never-green and tier-2/3 names always run (the landing gate is
full-strength), prior-green names re-audit at least every 4 rounds.
At 403 registered queries the never-rotated net pushed the suite to
19:46, past the 15-min guard; the driver's own sf0.01 snapshot still
re-checks the priority window every round regardless."""

from __future__ import annotations

import pytest

from kafka_streams_aggregate_spark.oracle import check_query, duck_con_for
from kafka_streams_aggregate_spark.registry import load_all, oracle_rotation

SF_DIR = "/root/testdata/sf0.001"

QUERY_NAMES = oracle_rotation(sorted(load_all().keys()))


@pytest.fixture(scope="module")
def con():
    c = duck_con_for(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    res = check_query(spark, name, SF_DIR, con)
    assert res.ok, f"{name}: {res.detail}"
