"""Pandas-UDF surface: grouped-map (applyInPandas) and Python UDTF.

The engine's design rule is built-ins first (every hot-path operator
elsewhere is pure Catalyst expressions); these operators exist for the
cases that genuinely need per-group imperative logic, and they define
the house style for that escape hatch: Arrow-batched, self-contained
closures (no package imports inside UDFs), deterministic math.

Reference parity note: the reference's fold function is effectively a
Java UDAF (``InventoryCountUpdateEventUpdater.java:22`` implements
BiFunction); its streaming twin here is applyInPandasWithState
(streaming/inventory_stream.py). This module is the *batch* grouped-map
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_robust_zscore(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group robust z-score via applyInPandas (grouped map).

    robust_z = (v - median(group)) / (1 + IQR(group)), computed on the
    floored integral value so medians/quartiles land on exact halves —
    numpy's linear interpolation then matches SQL quantile_cont bit for
    bit, keeping the operator oracle-checkable despite being a Python
    UDF. Output: (id, key, v_int, robust_z).
    """
    out_schema = (
        f"{id_col} long, {key_col} long, v_int long, robust_z double"
    )
    kc, vc, ic = key_col, value_col, id_col

    # Self-contained closure (pickled by value) — see verify skill notes.
    def _per_group(pdf):
        import numpy as _np

        v = _np.floor(pdf[vc].to_numpy(dtype="float64"))
        med = _np.quantile(v, 0.5)
        iqr = _np.quantile(v, 0.75) - _np.quantile(v, 0.25)
        return pdf.assign(
            v_int=v.astype("int64"), robust_z=(v - med) / (1.0 + iqr)
        )[[ic, kc, "v_int", "robust_z"]]

    return df.select(ic, kc, vc).groupBy(kc).applyInPandas(_per_group, out_schema)


def make_sentence_split_udtf():
    """Python UDTF (Spark 3.5+): split a text into numbered sentence
    rows — the table-function surface (one input row -> many output
    rows with derived columns), lazily created so importing this module
    never requires the UDTF machinery."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            for i, raw in enumerate(text.split(".")):
                s = raw.strip()
                if s:
                    yield i, s, len(s.split(" "))

    return SentenceSplit


def brown_double_smoothing(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Brown's double exponential smoothing (level + trend) per series.

    Extends the ``q_ewma_smoothing`` fold (queries/extended.py) from a
    plain level estimate to a trend-aware one: two chained EWMA passes
    with alpha = 1/2 — ``s1_t = 0.5*v_t + 0.5*s1_(t-1)`` and
    ``s2_t = 0.5*s1_t + 0.5*s2_(t-1)`` (both seeded with the first
    value) — then the standard Brown identities ``level = 2*s1 - s2``,
    ``trend = (alpha/(1-alpha))*(s1 - s2) = s1 - s2`` and the
    one-step-ahead forecast ``level + trend``.

    Cross-engine exactness (the same argument as the EWMA fold, now
    through TWO coupled states): alpha = 1/2 makes every multiply an
    exact power-of-two scaling, so each step is two correctly-rounded
    IEEE additions in a fixed order; the derived columns are three more
    exact/correctly-rounded ops spelled identically in the DuckDB
    recursive-CTE oracle (``2*s1 - s2``, ``s1 - s2``,
    ``(2*s1 - s2) + (s1 - s2)``) — all outputs BIT-equal
    (tests/test_timeseries_ops.py pins this via float.hex()).

    Scale shape: one shuffle on the series key, O(1) state (two
    float64s) per series, embarrassingly parallel fold — identical to
    the reference's own stateful-fold execution profile; streams get
    the same recurrence under applyInPandasWithState.

    Output: (key, n_events, s1_last, s2_last, level, trend,
    forecast_1).
    """
    kc, vc, tc, ic = key_col, value_col, ts_col, id_col
    out_schema = (
        f"{kc} bigint, n_events bigint, s1_last double, s2_last double, "
        "level double, trend double, forecast_1 double"
    )

    # Self-contained closure (pickled by value) — see verify skill notes.
    def _fold(pdf):
        import pandas as _pd

        pdf = pdf.sort_values([tc, ic], kind="mergesort")
        s1 = None
        s2 = None
        for v in pdf[vc].astype("float64"):
            if s1 is None:
                s1 = v
                s2 = v
            else:
                s1 = 0.5 * v + 0.5 * s1
                s2 = 0.5 * s1 + 0.5 * s2
        level = 2.0 * s1 - s2
        trend = s1 - s2
        return _pd.DataFrame(
            {
                kc: [pdf[kc].iloc[0]],
                "n_events": [len(pdf)],
                "s1_last": [s1],
                "s2_last": [s2],
                "level": [level],
                "trend": [trend],
                "forecast_1": [level + trend],
            }
        )

    return (
        df.select(kc, tc, ic, vc).groupBy(kc).applyInPandas(_fold, out_schema)
    )


def brown_backtest(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """One-step-ahead BACKTEST of Brown double smoothing: walk each
    series in event order, and at every step i >= 2 score the forecast
    the model would have issued BEFORE seeing v_i (level + trend from
    the first i-1 points) against the actual — the walk-forward
    evaluation loop that turns a smoother into a forecasting claim.

    Exactness: the state updates and the forecast expression are the
    bit-equal op sequence of ``brown_double_smoothing``; the error
    v_i - forecast_i is one more correctly-rounded subtraction, and the
    reported aggregates floor(|err|) BEFORE summing, so they are exact
    int64 on both engines (a float sum of |err| would be
    order-dependent; the floor-then-sum is not).

    Output per series: (key, n_forecasts, sum_abs_err_floor,
    max_abs_err_floor) — BIGINT (err floored in the value column's
    units). Series with fewer than 2 events are dropped (no forecast
    to score).
    """
    kc, vc, tc, ic = key_col, value_col, ts_col, id_col
    out_schema = (
        f"{kc} bigint, n_forecasts bigint, sum_abs_err_floor bigint, "
        "max_abs_err_floor bigint"
    )

    # Self-contained closure (pickled by value) — verify skill notes.
    def _fold(pdf):
        import math as _math

        import pandas as _pd

        pdf = pdf.sort_values([tc, ic], kind="mergesort")
        s1 = None
        s2 = None
        n_fc = 0
        total = 0
        mx = 0
        for v in pdf[vc].astype("float64"):
            if s1 is None:
                s1 = v
                s2 = v
                continue
            level = 2.0 * s1 - s2
            trend = s1 - s2
            forecast = level + trend
            af = int(_math.floor(abs(v - forecast)))
            n_fc += 1
            total += af
            if af > mx:
                mx = af
            s1 = 0.5 * v + 0.5 * s1
            s2 = 0.5 * s1 + 0.5 * s2
        if n_fc == 0:
            return _pd.DataFrame(
                {
                    kc: _pd.Series([], dtype="int64"),
                    "n_forecasts": _pd.Series([], dtype="int64"),
                    "sum_abs_err_floor": _pd.Series([], dtype="int64"),
                    "max_abs_err_floor": _pd.Series([], dtype="int64"),
                }
            )
        return _pd.DataFrame(
            {
                kc: [int(pdf[kc].iloc[0])],
                "n_forecasts": [n_fc],
                "sum_abs_err_floor": [total],
                "max_abs_err_floor": [mx],
            }
        )

    return (
        df.select(kc, tc, ic, vc).groupBy(kc).applyInPandas(_fold, out_schema)
    )
