"""Unit tests for composed operators: as-of join, range join, top-k,
sessionization — hand-written minimal cases with known answers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators.joins import asof_join, range_join_buckets
from kafka_streams_aggregate_spark.operators.windows import sessionize, topk_per_group


def test_asof_join_strict_prior(spark):
    left = spark.createDataFrame(
        [("u1", 10), ("u1", 20), ("u2", 5)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 15, "b"), ("u2", 6, "c")], "k string, rt long, v string"
    )
    out = asof_join(
        left, right, on="k", left_order="t", right_order="rt",
        right_value_cols=["v"], strict=True,
    )
    got = {(r["k"], r["t"]): r["v_asof"] for r in out.collect()}
    # strict: right row at rt=10 does NOT match left t=10
    assert got == {("u1", 10): None, ("u1", 20): "b", ("u2", 5): None}


def test_asof_join_non_strict(spark):
    left = spark.createDataFrame([("u1", 10)], "k string, t long")
    right = spark.createDataFrame([("u1", 10, "a")], "k string, rt long, v string")
    out = asof_join(
        left, right, on="k", left_order="t", right_order="rt",
        right_value_cols=["v"], strict=False,
    )
    assert out.collect()[0]["v_asof"] == "a"


def test_asof_join_picks_latest_prior(spark):
    left = spark.createDataFrame([("u1", 100)], "k string, t long")
    right = spark.createDataFrame(
        [("u1", 1, "old"), ("u1", 50, "mid"), ("u1", 99, "new"), ("u1", 101, "future")],
        "k string, rt long, v string",
    )
    out = asof_join(
        left, right, on="k", left_order="t", right_order="rt",
        right_value_cols=["v"], strict=True,
    )
    assert out.collect()[0]["v_asof"] == "new"


def test_range_join_half_open(spark):
    facts = spark.createDataFrame([(1, 99.9), (2, 100.0), (3, 200.0)], "id int, v double")
    ranges = spark.createDataFrame([(0, 0.0, 100.0), (1, 100.0, 200.0)], "b int, lo double, hi double")
    out = range_join_buckets(facts, ranges, "v", "lo", "hi")
    got = {r["id"]: r["b"] for r in out.collect()}
    assert got == {1: 0, 2: 1}  # hi is exclusive; 200.0 unmatched


def test_topk_per_group_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 5, 3), ("g", 4, 4)], "grp string, score int, id int"
    )
    out = topk_per_group(df, ["grp"], [F.col("score").desc(), F.col("id").asc()], 2)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_sessionize_gap(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u", t0, 1),
        ("u", t0 + dt.timedelta(minutes=10), 2),   # same session
        ("u", t0 + dt.timedelta(minutes=50), 3),   # gap 40min > 30 -> new
        ("u", t0 + dt.timedelta(minutes=60), 4),   # same session
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    out = sessionize(df, "k", "ts", gap_seconds=1800, order_tiebreak="id")
    got = {r["id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}


def test_sessionize_exact_gap_not_new(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0, 1), ("u", t0 + dt.timedelta(seconds=1800), 2)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    out = sessionize(df, "k", "ts", gap_seconds=1800, order_tiebreak="id")
    got = {r["id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0}  # gap == threshold stays in-session


def test_cep_quantified_matches_independent_nfa(spark):
    # Semantics pin for q_cep_quantified: an independent sequential
    # NFA scan (view click+ purchase, strict contiguity, skip past
    # last row) over the same ordered events must produce identical
    # per-user aggregates.
    from collections import defaultdict

    from kafka_streams_aggregate_spark.registry import load_all
    from kafka_streams_aggregate_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, "events", sf)
        .select("user_id", "ts", "event_type", "event_id")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    bound_us = 86_400_000_000
    expected = {}
    for uid, evs in per_user.items():
        evs.sort()
        matches = []
        i = 0
        while i < len(evs):
            if evs[i][2] == "view":
                j = i + 1
                while j < len(evs) and evs[j][2] == "click":
                    j += 1
                if j < len(evs) and j > i + 1 and evs[j][2] == "purchase":
                    start, end = evs[i][0], evs[j][0]
                    us = int(
                        (end - start).total_seconds() * 1_000_000
                    )
                    if us <= bound_us:
                        matches.append((start, end, j - i - 1))
                        i = j + 1  # skip past last row
                        continue
            i += 1
        if matches:
            expected[uid] = (
                len(matches),
                sum(m[2] for m in matches),
                max(m[2] for m in matches),
                min(m[0] for m in matches),
                max(m[1] for m in matches),
            )
    got = {
        r["user_id"]: (
            r["n_matches"], r["total_b_len"], r["max_b_len"],
            r["first_match_start"], r["last_match_end"],
        )
        for r in load_all()["q_cep_quantified"].spark(spark, sf).collect()
    }
    assert got == expected, (
        f"only-in-spark: {set(got) - set(expected)}, "
        f"only-in-nfa: {set(expected) - set(got)}"
    )


def test_weighted_percentile_hand_computed(spark):
    # Hand-checkable weighted median incl. tied values: weights
    # (v=10,wt=3), (v=20,wt=1), (v=20,wt=1), (v=30,wt=5); total 10,
    # ceil-rank(50%)=5 -> cumw over v: 10->3, 20->5 (ties lump), so
    # p50 = 20; ceil-rank(90%)=9 -> 30.
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g", 10.0, 3), ("g", 20.0, 1), ("g", 20.0, 1), ("g", 30.0, 5)],
        "flag string, v double, wt long",
    )
    wcum = Window.partitionBy("flag").orderBy("v")
    wall = Window.partitionBy("flag")
    cum = df.select(
        "flag", "v",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(wall).alias("tot"),
    )
    [r] = (
        cum.groupBy("flag")
        .agg(
            F.min(F.when(F.col("cumw") * 100 >= F.col("tot") * 50, F.col("v")))
            .alias("p50"),
            F.min(F.when(F.col("cumw") * 100 >= F.col("tot") * 90, F.col("v")))
            .alias("p90"),
        )
        .collect()
    )
    assert (r["p50"], r["p90"]) == (20.0, 30.0), r


# --------------------------------------------------------------------------
# Round-9 cross-operator identities (promised by the query docstrings).
# --------------------------------------------------------------------------

SF_R9 = "/root/testdata/sf0.001"


def test_kcore_peel_converged_at_test_scale(spark):
    """q_kcore_decomposition's 6-round bound must not truncate the peel
    at test scale (the `converged` column is the in-band witness)."""
    from kafka_streams_aggregate_spark.registry import load_all

    rows = load_all()["q_kcore_decomposition"].spark(spark, SF_R9).collect()
    assert rows, "core unexpectedly empty"
    assert all(r.converged for r in rows)


def test_stockout_final_balance_equals_s4_fold(spark):
    """The stockout trajectory's final balance and the S4 fold's count
    share a closed form — they must agree key-for-key."""
    from kafka_streams_aggregate_spark.registry import load_all

    fold = {
        r.product_code: r["count"]
        for r in load_all()["q_agg_inventory"].spark(spark, SF_R9).collect()
    }
    traj = {
        r.product_code: r.final_balance
        for r in load_all()["q_stockout_detection"]
        .spark(spark, SF_R9)
        .collect()
    }
    assert fold == traj


def test_bpe_roundtrip_all_exact(spark):
    """Greedy pieces must concatenate back to every distinct word."""
    from kafka_streams_aggregate_spark.registry import load_all

    rows = load_all()["q_bpe_roundtrip"].spark(spark, SF_R9).collect()
    assert rows
    assert all(r.roundtrip_ok == 1 for r in rows)
    assert any(r.n_pieces > 1 for r in rows), "tokenizer never split"


def test_cdc_replay_diff_empty(spark):
    """Kappa replay must converge to the live table (flag true on
    every key, no NULL-padded diff rows)."""
    from kafka_streams_aggregate_spark.registry import load_all

    rows = (
        load_all()["q_cdc_replay_backfill"].spark(spark, SF_R9).collect()
    )
    assert rows
    assert all(r.replay_matches_live for r in rows)


def test_label_propagation_matches_python_reference(spark):
    """Deterministic LPA: fixed rounds, synchronous updates, min-label
    tie-break — the Spark fixed point must equal an independent Python
    fold on the same edge list (two triangles joined by one bridge
    edge collapse to two communities; the bridge does not merge them
    in two rounds)."""
    from collections import Counter

    from kafka_streams_aggregate_spark.operators.graph import (
        label_propagation,
    )

    raw = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    sym = raw + [(b, a) for a, b in raw]
    edges = spark.createDataFrame(sym, "src BIGINT, dst BIGINT")

    got = {
        r.node: r.label
        for r in label_propagation(edges, rounds=2).collect()
    }

    # independent reference: same contract, plain Python
    adj = {}
    for a, b in sym:
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(2):
        nxt = {}
        for n, neigh in adj.items():
            cnt = Counter(labels[m] for m in neigh)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    assert got == labels

    # and on a bridgeless graph the two triangles collapse to exactly
    # their own min labels
    raw2 = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    sym2 = raw2 + [(b, a) for a, b in raw2]
    edges2 = spark.createDataFrame(sym2, "src BIGINT, dst BIGINT")
    got2 = {
        r.node: r.label
        for r in label_propagation(edges2, rounds=2).collect()
    }
    assert {got2[n] for n in (1, 2, 3)} == {1}
    assert {got2[n] for n in (4, 5, 6)} == {4}
