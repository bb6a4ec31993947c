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
