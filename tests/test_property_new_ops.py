"""Property-based validation of the round-2 operator algebra.

Same scheme as test_fold_property.py: Hypothesis drives the *SQL
recurrence/formula* (DuckDB — no Spark session, so hundreds of
examples are cheap) against an independent pure-Python reference. The
Spark plans compute the identical expressions and are covered by the
oracle-parity suite on the real tables."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

SCALE = 10**12


# -- deterministic fixed-point PageRank ---------------------------------
def _py_pagerank(nodes, edges, iters):
    n = len(nodes)
    init = SCALE // n
    tp = (15 * (SCALE // n)) // 100
    deg = Counter(s for s, _ in edges)
    rank = {v: init for v in nodes}
    for _ in range(iters):
        inc: dict[int, int] = defaultdict(int)
        for s, d in edges:
            inc[d] += (85 * rank[s]) // (100 * deg[s])
        rank = {v: tp + inc.get(v, 0) for v in nodes}
    return rank


_PR_STEP = """
    SELECT n.nid,
           CAST((SELECT tp FROM params)
                + COALESCE(s.incoming, 0) AS BIGINT) AS rank_fp
    FROM nodes n
    LEFT JOIN (
        SELECT e.dst AS nid,
               CAST(SUM((85 * r.rank_fp) // (100 * d.deg)) AS BIGINT)
                   AS incoming
        FROM {prev} r
        JOIN edges e ON r.nid = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) s ON n.nid = s.nid
"""


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=8),
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        max_size=30,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_pagerank_recurrence_equals_python(n_nodes, raw_edges, iters):
    nodes = list(range(n_nodes))
    edges = [(s, d) for s, d in raw_edges if s != d and s < n_nodes and d < n_nodes]
    con = duckdb.connect()
    con.register("nodes_df", pd.DataFrame({"nid": nodes}))
    if edges:
        con.register(
            "edges_df",
            pd.DataFrame(edges, columns=["src", "dst"]),
        )
    else:
        con.execute(
            "CREATE VIEW edges_df AS "
            "SELECT 0::BIGINT AS src, 0::BIGINT AS dst WHERE false"
        )
    ctes = [
        "WITH nodes AS (SELECT nid FROM nodes_df)",
        "edges AS (SELECT src, dst FROM edges_df)",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM edges GROUP BY src)",
        f"params AS (SELECT CAST({SCALE} // COUNT(*) AS BIGINT) AS init,"
        f" CAST((15 * ({SCALE} // COUNT(*))) // 100 AS BIGINT) AS tp"
        " FROM nodes)",
        "r0 AS (SELECT nid, (SELECT init FROM params) AS rank_fp FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(f"r{i + 1} AS ({_PR_STEP.format(prev=f'r{i}')})")
    sql = ", ".join(ctes) + f" SELECT nid, rank_fp FROM r{iters}"
    got = dict(con.execute(sql).fetchall())
    want = _py_pagerank(nodes, edges, iters)
    assert got == want
    # Rank mass never exceeds the scale (truncation only leaks down),
    # and every node keeps at least the teleport share.
    tp = (15 * (SCALE // n_nodes)) // 100
    assert sum(got.values()) <= SCALE
    assert all(v >= tp for v in got.values())


# -- exact moments from integer power sums ------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=10000),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_moments_formula_is_bit_stable(pairs):
    con = duckdb.connect()
    con.register("t", pd.DataFrame(pairs, columns=["x", "y"]))
    row = con.execute(
        """
        WITH s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM t
        )
        SELECT (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_x,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_xy
        FROM s
        """
    ).fetchone()
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    # The exact IEEE expression the engines share, replayed in Python:
    var_x = (float(n) * float(sxx) - float(sx) * float(sx)) / (
        float(n) * float(n)
    )
    covar = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        float(n) * float(n)
    )
    assert row[0] == var_x  # bit-exact, not approx
    assert row[1] == covar
    assert row[0] >= 0.0


# -- LOCF gap fill ------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
        min_size=1,
        max_size=40,
    )
)
def test_locf_equals_pandas_ffill(series):
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame({"i": range(len(series)), "v": series})
    )
    got = [
        r[0]
        for r in con.execute(
            """
            SELECT last_value(v IGNORE NULLS) OVER (
                ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) FROM t ORDER BY i
            """
        ).fetchall()
    ]
    want = pd.Series(series, dtype="float64").ffill().tolist()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g is None and pd.isna(w)) or g == w


# -- Morton (Z-order) bit interleave ------------------------------------
def _py_morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
def test_morton_interleave_formula_equals_python(x, y):
    from kafka_streams_aggregate_spark.queries.relational import (
        _morton_terms_sql,
    )

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_morton_terms_sql(str(x), str(y), 8, '//')}"
    ).fetchone()[0]
    assert got == _py_morton(x, y, 8)


# -- KMV distinct-count estimator ---------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=600),
    st.integers(min_value=2, max_value=64),
)
def test_kmv_estimator_equals_python(values, k):
    import hashlib

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": values}))
    row = con.execute(
        f"""
        WITH h AS (
            SELECT DISTINCT
                   CAST(CONCAT('0x', substr(md5(CAST(v AS VARCHAR)), 1, 15))
                        AS BIGINT) AS hv
            FROM t
        ),
        kk AS (SELECT hv FROM h ORDER BY hv LIMIT {k})
        SELECT COUNT(*), MAX(hv),
               CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE (CAST(COUNT(*) AS DOUBLE) - 1.0) * {float(1 << 60)!r}
                         / CAST(MAX(hv) AS DOUBLE)
               END
        FROM kk
        """
    ).fetchone()
    hashes = sorted(
        {int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) for v in values}
    )
    kmin = hashes[:k]
    want_est = (
        float(len(kmin))
        if len(kmin) < k
        else (len(kmin) - 1.0) * float(1 << 60) / float(kmin[-1])
    )
    assert row[0] == len(kmin)
    assert row[1] == kmin[-1]
    assert row[2] == want_est


# -- capped-vocabulary OOV rate -----------------------------------------
@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=2, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=10),
)
def test_oov_rate_formula_equals_python(texts, vocab_k):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    bigram_sql = (
        "list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 0)"
        " + 1), i -> array_to_string(list_slice(string_split(text, ' '), "
        "CAST(i AS INT), CAST(i + 1 AS INT)), ' '))"
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            WITH g AS (SELECT doc_id, unnest({bigram_sql}) AS gram FROM documents),
            counts AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram),
            vocab AS (SELECT gram FROM counts ORDER BY cnt DESC, gram ASC
                      LIMIT {vocab_k})
            SELECT g.doc_id, COUNT(*),
                   SUM(CASE WHEN v.gram IS NULL THEN 1 ELSE 0 END)
            FROM g LEFT JOIN vocab v ON g.gram = v.gram
            GROUP BY g.doc_id
            """
        ).fetchall()
    }
    all_grams: list[str] = []
    per_doc: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        per_doc[i] = grams
        all_grams.extend(grams)
    counts = Counter(all_grams)
    vocab = {
        g for g, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    }
    for i, grams in per_doc.items():
        if not grams:
            assert i not in got
            continue
        n_oov = sum(1 for g in grams if g not in vocab)
        assert got[i] == (len(grams), n_oov), (i, got.get(i), len(grams), n_oov)


# -- HLL register layout (operators/sketches.py) ------------------------
def _py_hll(keys):
    """Independent md5-based simulation of hll_registers+hll_summarize."""
    import hashlib

    M, WBITS, CAP = 64, 54, 30
    regs: dict[int, int] = {}
    for k in keys:
        hv = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        idx, w = hv % M, hv // M
        rho = (WBITS + 1) if w == 0 else (WBITS + 1 - w.bit_length())
        r = min(rho, CAP)
        regs[idx] = max(regs.get(idx, 0), r)
    scaled = sum(1 << (CAP - r) for r in regs.values())
    scaled += (M - len(regs)) * (1 << CAP)
    checksum = sum((i + 1) * r for i, r in regs.items())
    return len(regs), scaled, checksum


_HLL_SQL = """
WITH h AS (
    SELECT CAST(CONCAT('0x', substr(md5(CAST(k AS VARCHAR)), 1, 15))
                AS BIGINT) AS hv
    FROM keys
),
regs AS (
    SELECT CAST(hv % 64 AS INTEGER) AS idx,
           CAST(LEAST(CASE WHEN hv // 64 = 0 THEN 55
                           ELSE 55 - length(bin(hv // 64)) END, 30)
                AS INTEGER) AS r
    FROM h
),
reg_max AS (SELECT idx, MAX(r) AS r FROM regs GROUP BY idx)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hit,
       CAST(SUM(1::BIGINT << (30 - r)) AS BIGINT)
           + (64 - CAST(COUNT(*) AS BIGINT)) * 1073741824::BIGINT
           AS scaled_sum,
       CAST(SUM(CAST(idx + 1 AS BIGINT) * r) AS BIGINT) AS checksum
FROM reg_max
"""


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=200,
    )
)
def test_hll_registers_equal_python_md5_simulation(keys):
    # The SQL text mirrors hll_oracle_cte (oracle-parity covers the
    # Spark side); here Hypothesis hammers the register math itself —
    # bin()-based rho, the w=0 edge, the rho cap, scaled-integer sum.
    con = duckdb.connect()
    con.register("keys", pd.DataFrame({"k": keys}))
    n_hit, scaled, checksum = con.sql(_HLL_SQL).fetchone()
    assert (n_hit, scaled, checksum) == _py_hll(keys)
    con.close()


# -- prefix-filter pigeonhole (queries/llm_data.py:q_setsim_prefix_join)
@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.frozensets(st.integers(min_value=0, max_value=30), min_size=1),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=5, max_value=9),
)
def test_prefix_filter_never_misses_a_threshold_pair(sets, t_num):
    # Candidates = pairs sharing >= 1 token among each set's first
    # len - ceil(t*len) + 1 tokens in global rare-first order. The
    # pigeonhole claim: every pair with Jaccard >= t is a candidate.
    from collections import Counter

    df = Counter(tok for s in sets for tok in s)
    order = {tok: (df[tok], tok) for tok in df}

    def prefix(s):
        k = len(s) - (t_num * len(s) + 9) // 10 + 1
        return set(sorted(s, key=lambda x: order[x])[:k])

    prefixes = [prefix(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if 10 * inter >= t_num * union and inter > 0:
                assert prefixes[i] & prefixes[j], (
                    f"threshold pair ({i},{j}) missed: {sets[i]} {sets[j]}"
                )


# -- compaction next-fit invariant (queries/scale_ops.py) ---------------
@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=7000), min_size=1, max_size=60),
    st.integers(min_value=1000, max_value=8000),
)
def test_compaction_next_fit_bins_are_bounded_and_contiguous(sizes, cap):
    # bin = exclusive-prefix-cumsum DIV cap. Invariants: bin ids are
    # non-decreasing over the manifest order, every bin except possibly
    # the last holds >= cap total only by its LAST file's overhang
    # (total - last_size < cap), and totals sum to the input.
    prefix = 0
    bins: dict[int, list[int]] = {}
    order: list[int] = []
    for sz in sizes:
        b = prefix // cap
        bins.setdefault(b, []).append(sz)
        order.append(b)
        prefix += sz
    assert order == sorted(order)
    assert sum(sum(v) for v in bins.values()) == sum(sizes)
    for b, members in bins.items():
        assert sum(members) - members[-1] < cap, (b, members, cap)


# -- interval-union coverage (round 9) ----------------------------------
def _py_interval_coverage(intervals):
    """Classic merge over (start, end, id)-sorted CLOSED-START
    half-open [s, e) intervals: returns (n_islands, covered, raw)."""
    ivs = sorted(intervals, key=lambda t: (t[0], t[1], t[2]))
    islands = []
    for s, e, _ in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    covered = sum(e - s for s, e in islands)
    raw = sum(e - s for s, e, _ in ivs)
    return len(islands), covered, raw


_COVERAGE_SQL = """
WITH flagged AS (
    SELECT *,
           CASE WHEN max(e) OVER (
                    ORDER BY s, e, iid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) >= s THEN 0 ELSE 1 END AS new_island
    FROM iv
), islands AS (
    SELECT *, SUM(new_island) OVER (ORDER BY s, e, iid) AS island_id
    FROM flagged
), per_island AS (
    SELECT island_id, MAX(e) - MIN(s) AS covered,
           CAST(SUM(e - s) AS BIGINT) AS raw
    FROM islands GROUP BY island_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(covered) AS BIGINT) AS covered,
       CAST(SUM(raw) AS BIGINT) AS raw
FROM per_island
"""


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # start
            st.integers(min_value=1, max_value=25),   # length
        ),
        min_size=1,
        max_size=12,
    )
)
def test_interval_coverage_islands_match_python_sweep(raw_ivs):
    # Adversarial shapes Hypothesis finds that TPC-H-derived data
    # cannot: duplicate starts, identical intervals, containment,
    # exact-touch [a,b)+[b,c) chains (merged; coverage unchanged).
    intervals = [
        (s, s + ln, i) for i, (s, ln) in enumerate(raw_ivs)
    ]
    want = _py_interval_coverage(intervals)
    con = duckdb.connect()
    con.register(
        "iv",
        pd.DataFrame(intervals, columns=["s", "e", "iid"]),
    )
    got = con.execute(_COVERAGE_SQL).fetchone()
    con.close()
    assert tuple(got) == want


# -- calendar gap-run measurement (round 9) -----------------------------
def _py_gap_runs(days):
    """Given a user's ACTIVE day set, compute (gap_days, max_gap_run)
    over the dense [min, max] span."""
    days = sorted(set(days))
    d0, d1 = days[0], days[-1]
    gaps = sorted(set(range(d0, d1 + 1)) - set(days))
    if not gaps:
        return 0, 0
    runs, cur = [], 1
    for a, b in zip(gaps, gaps[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    return len(gaps), max(runs)


_GAPRUN_SQL = """
WITH bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM active),
grid AS (
    SELECT b.d0 + g.i AS day FROM bounds b, range(0, 200) g(i)
    WHERE b.d0 + g.i <= b.d1
),
gaps AS (
    SELECT g.day FROM grid g LEFT JOIN active a ON a.day = g.day
    WHERE a.day IS NULL
),
runs AS (
    SELECT day - row_number() OVER (ORDER BY day) AS grp FROM gaps
)
SELECT CAST(COALESCE(SUM(run_len), 0) AS BIGINT) AS gap_days,
       CAST(COALESCE(MAX(run_len), 0) AS BIGINT) AS max_gap_run
FROM (SELECT grp, COUNT(*) AS run_len FROM runs GROUP BY grp)
"""


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=60),
        min_size=1,
        max_size=15,
    )
)
def test_gap_run_islands_match_python_reference(days):
    want = _py_gap_runs(days)
    con = duckdb.connect()
    con.register(
        "active", pd.DataFrame({"day": sorted(set(days))})
    )
    got = con.execute(_GAPRUN_SQL).fetchone()
    con.close()
    assert tuple(got) == want


# -- time-weighted inventory level reconstruction (round 9) -------------
def _py_level_integral(seq):
    """Replay INC/DEC/REP imperatively; integrate level*duration with
    each level held from its event time to the next event."""
    level, rows = 0, []
    for t, action, delta in seq:
        if action == "REP":
            level = delta
        elif action == "INC":
            level += delta
        else:
            level -= delta
        rows.append((t, level))
    n, span, integral = 0, 0, 0
    for (t0, lv), (t1, _) in zip(rows, rows[1:]):
        n += 1
        span += t1 - t0
        integral += lv * (t1 - t0)
    levels = [lv for _, lv in rows[:-1]] or [None]
    return n, span, integral


_LEVEL_SQL = """
WITH grouped AS (
    SELECT *,
           COUNT(CASE WHEN action = 'REP' THEN 1 END)
               OVER (ORDER BY seq) AS rep_grp,
           CASE action WHEN 'INC' THEN delta
                       WHEN 'DEC' THEN -delta
                       ELSE delta END AS signed
    FROM updates
), levelled AS (
    SELECT seq,
           CAST(SUM(signed) OVER (PARTITION BY rep_grp ORDER BY seq)
                AS BIGINT) AS level,
           t, lead(t) OVER (ORDER BY seq) AS next_t
    FROM grouped
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(next_t - t) AS BIGINT) AS span,
       CAST(SUM(level * (next_t - t)) AS BIGINT) AS integral
FROM levelled WHERE next_t IS NOT NULL
"""


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),       # dt to next
            st.sampled_from(["INC", "DEC", "REP"]),
            st.integers(min_value=-20, max_value=20),     # delta
        ),
        min_size=1,
        max_size=15,
    )
)
def test_level_reconstruction_matches_imperative_fold(steps):
    # Adversarial histories: REP-first, REP-absent, consecutive REPs,
    # negative deltas driving negative levels — the two-window replay
    # (REP-group counter + in-group running sum) must equal the
    # imperative fold exactly.
    t, seq = 0, []
    for dt, action, delta in steps:
        seq.append((t, action, delta))
        t += dt
    want = _py_level_integral(seq)
    con = duckdb.connect()
    con.register(
        "updates",
        pd.DataFrame(
            [(i, a, d, tt) for i, (tt, a, d) in enumerate(seq)],
            columns=["seq", "action", "delta", "t"],
        ),
    )
    got = con.execute(_LEVEL_SQL).fetchone()
    con.close()
    if want[0] == 0:
        assert got[0] == 0
    else:
        assert tuple(got) == want
