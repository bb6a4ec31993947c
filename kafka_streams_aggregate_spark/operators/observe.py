"""Observation operator — the Spark twin of the reference's ``.peek``
(S6, ``KafkaStreamsInventoryCountApplication.java:84``): a
side-effecting, non-semantic observer on a flowing dataset.

The reference logs every (productCode, count) record passing the
changelog stream. Row-by-row logging is an anti-pattern at scale, so
the idiomatic mapping is ``Dataset.observe``: named aggregate metrics
collected during execution with zero extra passes and zero effect on
the plan. For literal per-record debug output (the reference's actual
behavior) use ``peek_rows`` in a foreachBatch sink — also provided,
clearly marked debug-only.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Observation

logger = logging.getLogger(__name__)


def observe(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named observation metrics to a DataFrame. Metrics are
    computed during the next action on the returned frame (no extra
    job) and read from the returned Observation afterwards."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def peek_rows(df: DataFrame, max_rows: int = 20, level: int = logging.DEBUG) -> None:
    """Debug-only per-record log of a micro-batch/batch, mirroring the
    reference's ``.peek`` logger. Bounded by max_rows; never use on the
    hot path of a production pipeline."""
    for row in df.limit(max_rows).collect():
        logger.log(level, "peek: %s", row.asDict())
