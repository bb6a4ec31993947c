"""Property tests for the wave-14 + r17-staged operators: brute-force
equivalence for the closed forms (MATTR's interval decomposition,
pair-overlap's C(df,2) decomposition), Fraction-exact replication of
the floored statistics, and the EXACT integer invariances (location /
scale) that the algebra promises. Seeded random inputs, many groups in
ONE DataFrame per operator so each property costs one Spark job.
"""

from __future__ import annotations

import random
from fractions import Fraction


def _mattr_brute(toks, w):
    if len(toks) < w:
        return 0, 0
    total = sum(
        len(set(toks[s : s + w])) for s in range(len(toks) - w + 1)
    )
    return total, len(toks) - w + 1


def test_mattr_matches_bruteforce(spark):
    from kafka_streams_aggregate_spark.operators.text import mattr

    rng = random.Random(1416)
    docs = []
    for d in range(40):
        n = rng.randint(1, 60)
        toks = [rng.choice("abcdefg") for _ in range(n)]
        docs.append((f"g{d % 5}", d, " ".join(toks), toks))
    w = 7
    df = spark.createDataFrame(
        [(g, i, t) for g, i, t, _ in docs],
        "src string, doc_id long, text string",
    )
    got = {
        r["group_key"]: r
        for r in mattr(df, "doc_id", "text", "src", window=w).collect()
    }
    for g in {g for g, *_ in docs}:
        tot = wins = short = 0
        for gg, _, _, toks in docs:
            if gg != g:
                continue
            t, nw = _mattr_brute(toks, w)
            tot += t
            wins += nw
            short += 1 if len(toks) < w else 0
        r = got[g]
        assert r["n_short"] == short
        assert r["n_windows"] == wins
        if wins:
            assert r["mattr_ppm"] == 10**6 * tot // (wins * w)


def test_pair_overlap_matches_bruteforce(spark):
    from kafka_streams_aggregate_spark.operators.dedup import (
        pair_overlap_density,
    )

    rng = random.Random(907)
    docs = []
    for d in range(30):
        n = rng.randint(1, 12)
        toks = [rng.choice("xyzw") for _ in range(n)]
        docs.append((f"g{d % 3}", d, " ".join(toks)))
    df = spark.createDataFrame(
        docs, "src string, doc_id long, text string"
    )
    got = {
        r["group_key"]: r
        for r in pair_overlap_density(
            df, "doc_id", "text", "src", n=3
        ).collect()
    }

    def shingles(toks):
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    for g in {g for g, *_ in docs}:
        sets = [
            shingles(t.split(" ")) for gg, _, t in docs if gg == g
        ]
        brute = sum(
            len(sets[i] & sets[j])
            for i in range(len(sets))
            for j in range(i + 1, len(sets))
        )
        assert got[g]["pair_overlap_sum"] == brute
        n = len(sets)
        assert got[g]["density_milli"] == 2000 * brute // (n * (n - 1))


def test_brier_identity_unfloored():
    # Murphy identity REL - RES + UNC = Brier holds EXACTLY on
    # rationals when each bin's forecasts are constant (heterogeneous
    # within-bin scores add the Stephenson within-bin variance and
    # covariance terms — which is why the registered statistic uses
    # the bin-mean forecast and documents the floors instead of
    # claiming the 3-term identity).
    rng = random.Random(33)
    for _ in range(20):
        pts = [
            (rng.randrange(10) * 10**5 + 50_000, rng.randint(0, 1))
            for _ in range(50)
        ]
        bins = {}
        for s, y in pts:
            b = min(s * 10 // 10**6, 9)
            bins.setdefault(b, []).append((s, y))
        n = len(pts)
        scale = Fraction(10**6)
        brier = (
            sum((Fraction(s) / scale - y) ** 2 for s, y in pts)
            / n
        )
        obar = Fraction(sum(y for _, y in pts), n)
        rel = res = Fraction(0)
        for b, grp in bins.items():
            nk = len(grp)
            pbar = sum(Fraction(s) / scale for s, _ in grp) / nk
            ok = Fraction(sum(y for _, y in grp), nk)
            rel += nk * (pbar - ok) ** 2
            res += nk * (ok - obar) ** 2
        assert rel / n - res / n + obar * (1 - obar) == brier


def test_brier_floored_replication(spark):
    from kafka_streams_aggregate_spark.operators.ml_eval import (
        brier_decomposition,
    )

    rng = random.Random(44)
    rows = [
        (f"g{i % 4}", rng.randint(0, 10**6 - 1), rng.randint(0, 1))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, sp long, y long")
    got = {
        r["group_key"]: r
        for r in brier_decomposition(
            df, "g", "sp", "y", n_bins=10
        ).collect()
    }
    sc = 10**6
    for g in {g for g, *_ in rows}:
        pts = [(s, y) for gg, s, y in rows if gg == g]
        bins = {}
        for s, y in pts:
            bins.setdefault(min(s * 10 // sc, 9), []).append((s, y))
        n, p = len(pts), sum(y for _, y in pts)
        rel = sum(
            10**9
            * (sum(s for s, _ in grp) - sc * sum(y for _, y in grp)) ** 2
            // (sc * sc * len(grp))
            for grp in bins.values()
        )
        res = sum(
            10**9
            * (n * sum(y for _, y in grp) - p * len(grp)) ** 2
            // (n * n * len(grp))
            for grp in bins.values()
        )
        b = sum((s - sc * y) ** 2 for s, y in pts)
        r = got[g]
        assert r["brier_ppb"] == 10**9 * b // (sc * sc * n)
        assert r["rel_ppb"] == rel // n
        assert r["res_ppb"] == res // n
        assert r["unc_ppb"] == 10**9 * p * (n - p) // (n * n)


def test_diebold_mariano_matches_python(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        diebold_mariano,
    )

    rng = random.Random(71)
    rows = []
    series = {}
    for g in range(8):
        vs = [rng.randint(0, 1000) for _ in range(30)]
        series[f"g{g}"] = vs
        rows += [(f"g{g}", t, v) for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {
        r["group_key"]: r
        for r in diebold_mariano(df, "g", "t", "v", period=4).collect()
    }
    for g, vs in series.items():
        d = [
            abs(vs[t] - vs[t - 1]) - abs(vs[t] - vs[t - 4])
            for t in range(4, len(vs))
        ]
        s, q, n = sum(d), sum(x * x for x in d), len(d)
        assert got[g]["n_eval"] == n and got[g]["d_sum"] == s
        if n >= 2 and n * q - s * s > 0:
            exp = 10**6 * s * s * (n - 1) // (n * q - s * s)
            assert got[g]["dm2_ppm"] == exp
        else:
            assert got[g]["dm2_ppm"] is None


def test_ewma_matches_fraction_recursion(spark):
    from kafka_streams_aggregate_spark.operators.stats import ewma_chart

    rng = random.Random(5)
    rows = []
    series = {}
    for g in range(6):
        vs = [rng.randint(0, 10**5) for _ in range(13)]
        series[f"g{g}"] = vs
        rows += [(f"g{g}", t, v) for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = {
        r["group_key"]: r
        for r in ewma_chart(df, "g", "t", "v", span=13).collect()
    }
    for g, vs in series.items():
        z = Fraction(vs[0])
        for x in vs[1:]:
            z = (Fraction(x) + 3 * z) / 4
        # Z = 4^12 z is integral; ewma_milli = (1000 Z) div 4^12
        zz = z * 4**12
        assert zz.denominator == 1
        assert got[g]["ewma_milli"] == 1000 * zz.numerator // 4**12
        assert got[g]["mu_milli"] == 1000 * sum(vs) // 13
        assert got[g]["mr_sum"] == sum(
            abs(vs[i] - vs[i - 1]) for i in range(1, len(vs))
        )


def test_snht_buishand_exact_invariances(spark):
    # D_k = n P_k - k S is EXACTLY invariant under v -> v + c, and
    # both statistics' num/den scale by m^2 under v -> m*v, so the
    # floored outputs are bit-identical — not approximately.
    from kafka_streams_aggregate_spark.operators.stats import (
        buishand_range,
        snht_test,
    )

    rng = random.Random(99)
    rows = [
        (f"g{g}", t, rng.randint(0, 500))
        for g in range(5)
        for t in range(20)
    ]

    def run(op, rs):
        df = spark.createDataFrame(rs, "g string, t long, v long")
        return sorted(
            (tuple(r) for r in op(df, "g", "t", "v").collect())
        )

    shifted = [(g, t, v + 7777) for g, t, v in rows]
    scaled = [(g, t, v * 13) for g, t, v in rows]
    for op in (snht_test, buishand_range):
        base = run(op, rows)
        assert run(op, shifted) == base
        assert run(op, scaled) == base


def test_snht_python_replication(spark):
    from kafka_streams_aggregate_spark.operators.stats import snht_test

    rng = random.Random(1234)
    vs = [rng.randint(0, 100) for _ in range(25)]
    rows = [("g", t, v) for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = snht_test(df, "g", "t", "v").collect()
    n, s = len(vs), sum(vs)
    q = sum(v * v for v in vs)
    best = None
    pk = 0
    for k in range(1, n):
        pk += vs[k - 1]
        d = n * pk - k * s
        t_ppm = 10**6 * d * d * (n - 1) // (k * (n - k) * (n * q - s * s))
        if best is None or t_ppm > best[0]:
            best = (t_ppm, k)
    assert (r["t_max_ppm"], r["k_at_max"]) == best
