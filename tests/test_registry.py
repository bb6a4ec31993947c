"""Registry invariants: every declared query is well-formed and the
driver-facing iteration order spends the correctness snapshot's
bounded slots (~50) on the highest-information checks."""

from __future__ import annotations

import json
import pathlib

from kafka_streams_aggregate_spark.registry import load_all, ordered

SNAPSHOT_SLOTS = 50
R01 = pathlib.Path("/root/repo/CORRECTNESS_r01.json")


def test_ordered_is_a_permutation_of_load_all():
    assert sorted(ordered()) == sorted(load_all())


def test_never_verified_queries_lead_the_order():
    """Queries with no row in any prior correctness snapshot must sit
    inside the snapshot window; queries pushed past the window must all
    have a green row from a prior round."""
    if not R01.exists():
        return
    prior = {
        name
        for name, row in json.loads(R01.read_text()).items()
        if row.get("rows_match") or row.get("err") is None
    }
    names = list(ordered())
    window, beyond = names[:SNAPSHOT_SLOTS], names[SNAPSHOT_SLOTS:]
    never_verified = [n for n in names if n not in prior]
    assert all(n in window for n in never_verified), (
        "never-verified query outside the snapshot window: "
        f"{[n for n in never_verified if n not in window]}"
    )
    assert all(n in prior for n in beyond), (
        f"unverified query beyond the window: {[n for n in beyond if n not in prior]}"
    )


def test_oracle_sql_names_only_registered_queries():
    qs = load_all()
    for name, qd in qs.items():
        assert qd.spark is not None, name
        if qd.oracle is not None:
            assert qd.oracle.strip(), f"{name}: empty oracle SQL"
