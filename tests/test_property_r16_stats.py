"""Property-based validation of the round-16 statistic algebra.

Same scheme as test_property_new_ops.py: Hypothesis drives the SQL
formula cores (DuckDB — no Spark session, so hundreds of examples are
cheap) against INDEPENDENT pure-Python references — independent
meaning a different derivation, not a re-typing of the formula:

  - Wasserstein: the cross-multiplied ECDF-integral cells formula vs
    the classic equal-size SORTED-MATCHING identity
    W1 = (1/n) sum |x_(i) - y_(i)|.
  - Mann-Whitney tie-corrected variance: the closed form
    mn[N(N-1)(N+1) - T]/(12 N(N-1)) vs the EXACT enumeration of
    Var(U) over all C(N, m) sample assignments.
  - Mood/Conover SRS core: E[T], Var(T) closed forms vs exact
    enumeration over all assignments of which scores are X's.
  - Brunner-Munzel: the cleared integer rational vs a float
    implementation of the published rank formulation.

The Spark plans compute the identical expressions and are covered by
the oracle-parity suite on the real tables."""

from __future__ import annotations

import itertools
import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

vals = st.integers(min_value=-50, max_value=50)


# ------------------------------------------------------- wasserstein


def _w1_cells(xs, ys):
    """The operator/oracle formula: sum over support gaps of
    (v_next - v) * |n*i - m*j| (= W1 * m * n)."""
    m, n = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    cx, cy = Counter(xs), Counter(ys)
    i = j = 0
    total = 0
    for v, vn in zip(support, support[1:]):
        i += cx[v]
        j += cy[v]
        total += (vn - v) * abs(n * i - m * j)
    return total


@settings(max_examples=200, deadline=None)
@given(st.lists(vals, min_size=1, max_size=12), st.data())
def test_wasserstein_equals_sorted_matching(xs, data):
    # equal sizes: W1 = (1/n) sum |x_(i) - y_(i)| exactly, so
    # w1_scaled = n * sum |x_(i) - y_(i)|
    ys = data.draw(st.lists(vals, min_size=len(xs), max_size=len(xs)))
    n = len(xs)
    matched = sum(abs(a - b) for a, b in zip(sorted(xs), sorted(ys)))
    assert _w1_cells(xs, ys) == n * matched


# ----------------------------------------------- mann-whitney variance


def _u_stat(flags_vals, picks):
    """2U for the subset `picks` (indices forming sample X)."""
    xs = [v for i, v in enumerate(flags_vals) if i in picks]
    ys = [v for i, v in enumerate(flags_vals) if i not in picks]
    u2 = 0
    for x in xs:
        for y in ys:
            if x > y:
                u2 += 2
            elif x == y:
                u2 += 1
    return u2


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=2, max_size=8),
    st.data(),
)
def test_mwu_tie_corrected_variance_exact(pool, data):
    """Var(2U) over ALL C(N, m) assignments equals
    4 * mn[N(N-1)(N+1) - T] / (12 N(N-1)) with T = sum(t^3 - t)."""
    N = len(pool)
    m = data.draw(st.integers(min_value=1, max_value=N - 1))
    n = N - m
    us = [
        _u_stat(pool, set(picks))
        for picks in itertools.combinations(range(N), m)
    ]
    k = len(us)
    mean = sum(us) / k
    var = sum((u - mean) ** 2 for u in us) / k
    T = sum(t**3 - t for t in Counter(pool).values())
    expected = 4 * m * n * (N * (N - 1) * (N + 1) - T) / (12 * N * (N - 1))
    assert math.isclose(var, expected, rel_tol=1e-9, abs_tol=1e-9)
    # and the mean: E[2U] = mn
    assert math.isclose(mean, m * n, rel_tol=1e-12, abs_tol=1e-9)


# ------------------------------------------------ SRS score-sum core


def _srs_moments_exact(scores, m):
    """Exact E and Var of the sum of an m-subset over all C(N, m)."""
    N = len(scores)
    sums = [
        sum(scores[i] for i in picks)
        for picks in itertools.combinations(range(N), m)
    ]
    k = len(sums)
    mean = sum(sums) / k
    var = sum((s - mean) ** 2 for s in sums) / k
    return mean, var


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=2, max_size=8),
    st.data(),
)
def test_srs_core_moments_exact(scores, data):
    """The _rank_score_scale_core closed forms: E[T] = m*S1/N and
    Var(T) = mn(N*S2 - S1^2)/(N^2 (N-1)) — vs exact enumeration.
    (Mood and Conover differ only in the score definition.)"""
    N = len(scores)
    m = data.draw(st.integers(min_value=1, max_value=N - 1))
    n = N - m
    S1 = sum(scores)
    S2 = sum(s * s for s in scores)
    mean, var = _srs_moments_exact(scores, m)
    assert math.isclose(mean, m * S1 / N, rel_tol=1e-12, abs_tol=1e-9)
    assert math.isclose(
        var,
        m * n * (N * S2 - S1 * S1) / (N * N * (N - 1)),
        rel_tol=1e-9,
        abs_tol=1e-9,
    )


# -------------------------------------------------- brunner-munzel


def _bm_float(xs, ys):
    """The published rank formulation, in floats: W = (Rbar2 - Rbar1)
    / sqrt(N * (S1^2/n^2 + S2^2/m^2)); returns W^2 or None."""
    m, n = len(xs), len(ys)
    pooled = sorted(xs + ys)

    def midrank(v):
        lo = sum(1 for p in pooled if p < v)
        eq = sum(1 for p in pooled if p == v)
        return lo + (eq + 1) / 2

    def midrank_within(v, sample):
        lo = sum(1 for p in sample if p < v)
        eq = sum(1 for p in sample if p == v)
        return lo + (eq + 1) / 2

    r1 = [midrank(x) for x in xs]
    r2 = [midrank(y) for y in ys]
    rb1, rb2 = sum(r1) / m, sum(r2) / n
    # placements = pooled midrank - within-sample midrank
    p1 = [midrank(x) - midrank_within(x, xs) for x in xs]
    p2 = [midrank(y) - midrank_within(y, ys) for y in ys]
    pb1, pb2 = sum(p1) / m, sum(p2) / n
    if m < 2 or n < 2:
        return None
    s1 = sum((p - pb1) ** 2 for p in p1) / (m - 1)
    s2 = sum((p - pb2) ** 2 for p in p2) / (n - 1)
    den = (m + n) * (s1 / (n * n) + s2 / (m * m))
    if den <= 0:
        return None
    return (rb2 - rb1) ** 2 / den


def _bm_integer(xs, ys):
    """The operator's cleared integer rational (w2_ppm / 1e6)."""
    m, n = len(xs), len(ys)
    dx = [2 * sum(1 for y in ys if y < x) + sum(1 for y in ys if y == x)
          for x in xs]
    dy = [2 * sum(1 for x in xs if x < y) + sum(1 for x in xs if x == y)
          for y in ys]
    A, B = sum(dx), sum(dy)
    num = m * n * (n - m) + m * B - n * A
    v1 = sum((m * d - A) ** 2 for d in dx)
    v2 = sum((n * d - B) ** 2 for d in dy)
    den = (m + n) * (v1 * (n - 1) + v2 * (m - 1))
    if m < 2 or n < 2 or den <= 0:
        return None
    return (10**6 * num * num * (m - 1) * (n - 1)) // den


@settings(max_examples=200, deadline=None)
@given(
    st.lists(vals, min_size=2, max_size=10),
    st.lists(vals, min_size=2, max_size=10),
)
def test_bm_integer_matches_published_form(xs, ys):
    ref = _bm_float(xs, ys)
    got = _bm_integer(xs, ys)
    if ref is None:
        assert got is None
    else:
        assert got is not None
        # got = floor(1e6 * W^2): within one ulp-ish of the float form
        assert abs(got - 10**6 * ref) <= 2


# ----------------------------------------------- formula invariances


def _records(vs):
    ups = lows = 0
    for i, v in enumerate(vs):
        if i == 0:
            continue
        if v > max(vs[:i]):
            ups += 1
        if v < min(vs[:i]):
            lows += 1
    return ups, lows


@settings(max_examples=200, deadline=None)
@given(st.lists(vals, min_size=2, max_size=20))
def test_foster_stuart_negation_duality(vs):
    """Negating the series swaps upper and lower records exactly, so
    d_stat(-v) = -d_stat(v) and s_stat is invariant."""
    u, l = _records(vs)
    nu, nl = _records([-v for v in vs])
    assert (nu, nl) == (l, u)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1,
             max_size=15),
    st.integers(min_value=1, max_value=1000),
)
def test_hoover_scale_invariance(vs, k):
    """hoover_ppm is exactly invariant under v -> k*v: numerator and
    denominator scale by the same k, and floor of equal rationals is
    equal."""
    n, S = len(vs), sum(vs)
    if S <= 0:
        return

    def hoover_ppm(xs):
        nn, ss = len(xs), sum(xs)
        sad = sum(abs(nn * x - ss) for x in xs)
        return (10**6 * sad) // (2 * nn * ss)

    assert hoover_ppm(vs) == hoover_ppm([k * v for v in vs])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=100), min_size=2,
             max_size=20),
    st.integers(min_value=1, max_value=1000),
)
def test_quantile_shape_scale_invariance(vs, k):
    """bowley/moors/qcd ppm are exactly invariant under v -> k*v: the
    selected order statistics scale by k and every ratio's floor is
    unchanged."""

    def shape(xs):
        s = sorted(xs)
        n = len(s)

        def pick(num, den):
            return s[(num * n + den - 1) // den - 1]

        q1, q2, q3 = pick(1, 4), pick(2, 4), pick(3, 4)
        e = {i: pick(i, 8) for i in (1, 2, 3, 5, 6, 7)}
        bow = ((10**6 * (q3 + q1 - 2 * q2)) // (q3 - q1)
               if q3 - q1 > 0 else None)
        moo = ((10**6 * ((e[7] - e[5]) + (e[3] - e[1]))) // (e[6] - e[2])
               if e[6] - e[2] > 0 else None)
        qcd = ((10**6 * (q3 - q1)) // (q3 + q1)
               if q3 + q1 > 0 else None)
        return bow, moo, qcd

    assert shape(vs) == shape([k * v for v in vs])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(vals, min_size=1, max_size=12),
    st.lists(vals, min_size=1, max_size=12),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=-100, max_value=100),
)
def test_kuiper_monotone_invariance(xs, ys, a, b):
    """Kuiper's V (and D+/D- numerators) depend only on the cell
    ORDER, so any strictly increasing affine map v -> a*v + b leaves
    the statistic exactly unchanged."""

    def kuiper(x, y):
        m, n = len(x), len(y)
        support = sorted(set(x) | set(y))
        cx, cy = Counter(x), Counter(y)
        i = j = dp = dm = 0
        for v in support:
            i += cx[v]
            j += cy[v]
            dp = max(dp, n * i - m * j)
            dm = max(dm, m * j - n * i)
        return dp, dm

    mapped = kuiper([a * v + b for v in xs], [a * v + b for v in ys])
    assert kuiper(xs, ys) == mapped


@settings(max_examples=200, deadline=None)
@given(
    st.lists(vals, min_size=1, max_size=12),
    st.lists(vals, min_size=1, max_size=12),
    st.integers(min_value=-100, max_value=100),
)
def test_wasserstein_translation_invariance(xs, ys, c):
    """Translating BOTH samples by c leaves w1_scaled unchanged (the
    support gaps and cumulative imbalances are translation-free)."""
    assert _w1_cells(xs, ys) == _w1_cells(
        [v + c for v in xs], [v + c for v in ys]
    )
