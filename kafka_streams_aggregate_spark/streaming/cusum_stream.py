"""Streaming CUSUM change detection: the cross-batch incremental twin
of ``q_change_point_cusum``'s batch audit.

The one-sided CUSUM recurrence S_i = max(0, S_{i-1} + (v_i - k))
(Page 1954) is the canonical streaming drift detector: O(1) state per
series, an alarm whenever S crosses the decision threshold h. Here the
whole fold is EXACT INT64 — values enter as floor(value*100) cents and
k, h are integer cents — so the streamed result is cell-exact against
a NON-RECURSIVE closed-form oracle, via the reflection identity

    S_i = P_i - min(0, min_{j<=i} P_j),   P = prefix sums of (v - k)

(the same identity that turns a max(0, ...) fold into a running-min
window; provable by induction — both sides are 0 exactly when the
prefix minimum is attained at or after i).

State per key: (cusum, n, n_alarms, cusum_max) — four int64s, carried
across micro-batches by applyInPandasWithState; each batch sorts its
slice by (ts_us, event_id), which the staged time-split source keeps
globally ordered per key.

Scale shape: one hash exchange per micro-batch; O(1) state per series
forever; Arrow-batched transfer; no Python in any non-fold stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

CUSUM_STATE_SCHEMA = "s long, n long, n_alarms long, s_max long"
CUSUM_OUT_SCHEMA = (
    "user_id long, n_events long, cusum_last long, cusum_max long, "
    "n_alarms long"
)


def streaming_cusum(
    events: DataFrame, k_cents: int = 5000, h_cents: int = 50000
) -> DataFrame:
    """Per-user one-sided CUSUM over ``(user_id, event_id, ts_us,
    value)``: one UPDATE row per (user, batch) with the running
    statistic, its max, and the alarm count so far."""

    def _fold_group(key, pdf_iter, state):
        import math

        import pandas as pd

        s, n, n_alarms, s_max = 0, 0, 0, 0
        if state.exists:
            s, n, n_alarms, s_max = (int(x) for x in state.get)
        chunks = [pdf for pdf in pdf_iter]
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        for v in batch["value"].astype("float64"):
            d = int(math.floor(v * 100.0)) - k_cents
            s = s + d
            if s < 0:
                s = 0
            n += 1
            if s > s_max:
                s_max = s
            if s > h_cents:
                n_alarms += 1
        state.update((s, n, n_alarms, s_max))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "cusum_last": [s],
                "cusum_max": [s_max],
                "n_alarms": [n_alarms],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _fold_group,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
