"""Streaming sessionization: cross-batch 30-minute-gap sessions with
``applyInPandasWithState``.

Native ``session_window`` aggregates exist (and are registered for the
batch/windowed shapes), but the per-key running TOTALS a product
dashboard wants — how many sessions has this user had, ever, including
the one currently open — are a changelog, not a windowed append. The
general engine answer is the per-key ordered fold: state is the open
session's bookkeeping (last event time, events in the current session)
plus the running totals; each micro-batch advances the fold and emits
the key's updated totals in UPDATE mode (latest batch wins downstream,
exactly the KTable contract the reference app's changelog uses).

A session that spans ANY number of micro-batch boundaries is one
session: only the gap test ever closes it, never a batch boundary —
that is the property the cross-batch state exists to provide, and what
the batch-oracle hash check verifies.

Ingest contract (same as cep_stream): per-key event-time order across
batches; within a batch rows sort by (ts_us, event_id). Scale shape:
one hash exchange per micro-batch, O(1) state per key forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_STATE_SCHEMA = (
    "last_ts long, cur_events long, max_events long, "
    "n_sessions long, n_events long"
)
SESSION_OUT_SCHEMA = (
    "user_id long, n_sessions long, n_events long, max_session_events long"
)


def streaming_sessionize(events: DataFrame, gap_seconds: int) -> DataFrame:
    """Per-user running session totals over a stream of
    ``(user_id, event_id, ts_us)``: one UPDATE row per (user, batch)
    with sessions-so-far, events-so-far, and the largest session's
    event count (open session included)."""

    gap_us = gap_seconds * 1_000_000

    def _fold_group(key, pdf_iter, state):
        import pandas as pd

        last_ts, cur, mx, ns, ne = None, 0, 0, 0, 0
        if state.exists:
            last_ts, cur, mx, ns, ne = (
                v if v is None else int(v) for v in state.get
            )
        rows = [pdf for pdf in pdf_iter]
        batch = pd.concat(rows) if len(rows) > 1 else rows[0]
        batch = batch.sort_values(["ts_us", "event_id"])
        for ts in batch["ts_us"]:
            ts = int(ts)
            if last_ts is None or ts - last_ts > gap_us:
                ns += 1
                cur = 0
            cur += 1
            ne += 1
            mx = max(mx, cur)
            last_ts = ts
        state.update((last_ts, cur, mx, ns, ne))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_sessions": [ns],
                "n_events": [ne],
                "max_session_events": [mx],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _fold_group,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
