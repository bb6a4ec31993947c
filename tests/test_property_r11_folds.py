"""Property-based validation of the round-11 staged fold algebra.

Same scheme as test_fold_property.py / test_property_new_ops.py:
Hypothesis drives the SQL recurrence/formula (DuckDB — no Spark
session, hundreds of examples for milliseconds) against an
independent pure-Python reference. The Spark kernels execute the
identical op sequences and are pinned bit-equal by their own parity
tests (test_croston.py, test_nelson_aalen.py, etc.)."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# -- Croston two-state EWMA recurrence ----------------------------------

CROSTON_SQL = """
    WITH RECURSIVE with_start AS (
        SELECT t, q, MIN(t) OVER () AS t0 FROM grid
    ),
    ev AS (
        SELECT t, q,
               CASE WHEN lag(t) OVER w IS NULL THEN t - t0 + 1
                    ELSE t - lag(t) OVER w END AS interval,
               row_number() OVER w AS rn
        FROM with_start WHERE q > 0
        WINDOW w AS (ORDER BY t)
    ),
    r AS (
        SELECT rn, CAST(q AS DOUBLE) AS z, CAST(interval AS DOUBLE) AS p
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.rn, 0.5 * e.q + 0.5 * r.z, 0.5 * e.interval + 0.5 * r.p
        FROM r JOIN ev e ON e.rn = r.rn + 1
    )
    SELECT rn, z, p FROM r ORDER BY rn DESC LIMIT 1
"""


def _py_croston(qs: list[int]):
    """Independent fold over a dense series (period = index + 1)."""
    z = p = None
    n = 0
    prev_t = None
    for idx, q in enumerate(qs):
        t = idx + 1
        if q <= 0:
            continue
        interval = t if prev_t is None else t - prev_t
        if z is None:
            z, p = float(q), float(interval)
        else:
            z = 0.5 * q + 0.5 * z
            p = 0.5 * interval + 0.5 * p
        prev_t = t
        n += 1
    return n, z, p


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40))
def test_croston_recurrence_matches_python(qs):
    n, z, p = _py_croston(qs)
    con = duckdb.connect()
    con.register(
        "grid",
        pd.DataFrame({"t": range(1, len(qs) + 1), "q": qs}),
    )
    rows = con.execute(CROSTON_SQL).fetchall()
    con.close()
    if n == 0:
        assert rows == []
    else:
        [(rn, zz, pp)] = rows
        assert rn == n
        assert zz.hex() == z.hex() and pp.hex() == p.hex()


# -- Nelson-Aalen additive hazard recurrence ----------------------------

NA_SQL = """
    WITH RECURSIVE per_t AS (
        SELECT t, COUNT(*) AS n_at_t, SUM(e) AS d FROM subj GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               SUM(n_at_t) OVER ()
               - SUM(n_at_t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               + n_at_t AS n_risk
        FROM per_t
    ),
    deaths AS (
        SELECT t, d, n_risk, row_number() OVER (ORDER BY t) AS rn
        FROM risk WHERE d > 0
    ),
    r AS (
        SELECT CAST(0 AS BIGINT) AS rn, CAST(0.0 AS DOUBLE) AS h
        UNION ALL
        SELECT dd.rn, r.h + (CAST(dd.d AS DOUBLE) / CAST(dd.n_risk AS DOUBLE))
        FROM r JOIN deaths dd ON dd.rn = r.rn + 1
    )
    SELECT d.t, d.n_risk, d.d, r.h
    FROM r JOIN deaths d ON d.rn = r.rn
    ORDER BY d.t
"""


def _py_nelson_aalen(subjects: list[tuple[int, int]]):
    """(time, event) pairs -> [(t, n_risk, d, H)] at death times."""
    times = sorted({t for t, _ in subjects})
    h = 0.0
    out = []
    for t in times:
        n_risk = sum(1 for tt, _ in subjects if tt >= t)
        d = sum(e for tt, e in subjects if tt == t)
        if d > 0:
            h = h + (d / n_risk)
            out.append((t, n_risk, d, h))
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_nelson_aalen_recurrence_matches_python(subjects):
    ref = _py_nelson_aalen(subjects)
    con = duckdb.connect()
    con.register(
        "subj",
        pd.DataFrame(
            {"t": [t for t, _ in subjects], "e": [e for _, e in subjects]}
        ),
    )
    rows = con.execute(NA_SQL).fetchall()
    con.close()
    assert len(rows) == len(ref)
    for (t, nr, d, h), (rt, rnr, rd, rh) in zip(rows, ref):
        assert (t, nr, d) == (rt, rnr, rd)
        assert h.hex() == rh.hex()


# -- ceil-rank order-statistic selection (winsorize / weighted pct) -----


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=100),
)
def test_ceil_rank_selection_matches_sorted_index(vals, pct):
    """min value whose rank >= (p*n+99) div 100 == the ceil(p*n/100)-th
    smallest (1-based) — the rule every percentile op in the repo uses."""
    n = len(vals)
    target = (pct * n + 99) // 100
    expect = sorted(vals)[target - 1]
    con = duckdb.connect()
    con.register("v", pd.DataFrame({"x": vals, "i": range(n)}))
    [(got,)] = con.execute(
        f"""
        WITH ranked AS (
            SELECT x, row_number() OVER (ORDER BY x, i) AS rn FROM v
        )
        SELECT MIN(CASE WHEN rn >= ({pct} * {n} + 99) // 100 THEN x END)
        FROM ranked
        """
    ).fetchall()
    con.close()
    assert got == expect


# -- TVD common-denominator identity ------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=12,
    ).filter(lambda b: sum(x for x, _ in b) > 0 and sum(y for _, y in b) > 0)
)
def test_tvd_common_denominator_is_exact(buckets):
    """(scale * sum|c1*N2 - c2*N1|) div (2*N1*N2) == floor(scale *
    true TVD) computed with exact rationals."""
    n1 = sum(x for x, _ in buckets)
    n2 = sum(y for _, y in buckets)
    scale = 10**6
    num = sum(abs(c1 * n2 - c2 * n1) for c1, c2 in buckets)
    got = (scale * num) // (2 * n1 * n2)
    true_tvd = Fraction(1, 2) * sum(
        abs(Fraction(c1, n1) - Fraction(c2, n2)) for c1, c2 in buckets
    )
    assert got == (scale * true_tvd.numerator) // true_tvd.denominator
