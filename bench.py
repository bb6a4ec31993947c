#!/usr/bin/env python
"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop write (full execution, no
driver collect). A short warmup query amortizes JVM/codegen startup so
timings measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_aggregate_spark.registry import load_all  # noqa: E402
from kafka_streams_aggregate_spark.session import get_spark  # noqa: E402
from kafka_streams_aggregate_spark.sources.tables import load_table  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ksa-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Warmup: touch every table + exercise codegen once. Failures fall
    # through to the per-query loop, which reports them as errors.
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            load_table(spark, name, sf_dir).count()
        except Exception:
            break

    queries = load_all()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        qd = queries[name]
        if not qd.bench:
            continue
        t0 = time.perf_counter()
        try:
            _force(qd.spark(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # one broken query must not kill the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
