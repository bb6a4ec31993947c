"""Deduplication operators for training-data pipelines.

Four tiers, each Spark-first and shuffle-conscious:

  exact        md5-keyed groupBy (one shuffle on the hash key)
  ngram        exact n-gram-Jaccard pairs via shingle inverted index
               (the verification primitive; quadratic only within
               shingle buckets, frequency-capped)
  minhash+LSH  signature banding -> candidate buckets -> exact verify
               (the 100 TB path: candidate generation is linear)
  simhash      64-bit sign-hash + banded hamming candidates

All candidate generation uses joins on bucket keys — never a driver
collect, never a full cross join. Hash functions are Spark built-ins
(xxhash64) with literal affine parameters, so results are deterministic
across runs and partitionings.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F, types as T

from kafka_streams_aggregate_spark.operators.text import tokens


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups keyed by md5 of the raw text. Returns one
    row per distinct content: (keep_id = min id, n_copies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def token_shingles(text_col: str, n: int = 3) -> F.Column:
    """n-token shingles ('w-shingling'): join each run of n consecutive
    whitespace tokens. Short docs yield their full token string."""
    toks = tokens(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, max_doc_freq: int | None = None
) -> DataFrame:
    """Distinct (id, shingle) inverted index, optionally dropping
    shingles that occur in more than ``max_doc_freq`` documents —
    the standard stop-shingle cap that keeps the self-join from
    exploding on boilerplate at scale."""
    from kafka_streams_aggregate_spark.sources.tables import with_scan_parallelism

    df = with_scan_parallelism(df)
    idx = (
        df.select(F.col(id_col), F.explode(token_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )
    if max_doc_freq is not None:
        # Window count over shingle, not groupBy+semi-join: one shuffle
        # instead of two, and it leaves the index hash-partitioned by
        # shingle — exactly the partitioning the downstream self-join
        # needs, so Catalyst plans no further exchange for it.
        from pyspark.sql import Window

        w = Window.partitionBy("shingle")
        idx = (
            idx.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs: inverted shingle index,
    self-join per shingle (id_a < id_b), common-shingle count, then
    jaccard = common / (|A| + |B| - common). The division is
    int/int in double — deterministic. Output: (id_a, id_b, jaccard)."""
    idx = shingle_index(df, id_col, text_col, n, max_doc_freq)
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("_size"))

    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_size").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_size").alias("_sb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_common").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Directed n-gram containment pairs: c(a->b) = |A ∩ B| / |A|.

    Asymmetric twin of Jaccard — the standard benchmark-contamination /
    subset-duplicate metric: a short document fully contained in a long
    one scores ~1.0 even when Jaccard is tiny. Same inverted-index
    self-join as `ngram_jaccard_pairs` (frequency-capped, bucketed by
    shingle — linear at scale). |A ∩ B| is symmetric, so the join and
    pair aggregate — the dominant stages — run over ORDERED pairs only
    (id_a < id_b, half the rows); both directed rows are emitted from
    each undirected row after the cheap size joins, normalized by the
    respective source document's shingle count.
    Output: (id_a, id_b, containment) with id_a != id_b."""
    idx = shingle_index(df, id_col, text_col, n, max_doc_freq)
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("_size"))

    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_size").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_size").alias("_sb"))
    und = common.join(sa, "id_a").join(sb, "id_b")
    c = F.col("_common").cast("double")
    return (
        und.select(
            "id_a", "id_b", (c / F.col("_sa").cast("double")).alias("containment")
        )
        .unionByName(
            und.select(
                F.col("id_b").alias("id_a"),
                F.col("id_a").alias("id_b"),
                (c / F.col("_sb").cast("double")).alias("containment"),
            )
        )
        .filter(F.col("containment") >= threshold)
    )


def _affine_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    # a, b < 2^31 and base hash < 2^31, so a*h + b < 2^63: no int64
    # overflow inside the JVM expression.
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31)) for _ in range(k)
    ]


_MERSENNE61 = (1 << 61) - 1


def _base_hash31(hash_family: str) -> F.Column:
    """31-bit base hash of the shingle column.

    ``xxhash64`` is the production family (fastest JVM path).
    ``md5`` exists so the identical MinHash/LSH machinery can be
    oracle-verified: md5 is bit-identical across Spark and DuckDB
    (Spark ``conv(substr(md5(x),1,8),16,10)`` == DuckDB
    ``('0x'||substr(md5(x),1,8))::BIGINT``), which xxhash64 is not.
    """
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64("shingle"), F.lit(1 << 31))
    if hash_family == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long"),
            F.lit(1 << 31),
        )
    raise ValueError(f"unknown hash_family: {hash_family}")


def _signatures_from_index(
    idx: DataFrame, id_col: str, k: int, seed: int, hash_family: str = "xxhash64"
) -> DataFrame:
    params = _affine_params(k, seed)
    h = _base_hash31(hash_family)
    mins = [
        F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE61))).alias(f"_h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = idx.groupBy(id_col).agg(*mins)
    return sigs.select(
        F.col(id_col), F.array(*[f"_h{i}" for i in range(k)]).alias("sig")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """k-permutation MinHash signatures over token shingles.

    Base hash: xxhash64(shingle) folded to 31 bits, then k affine maps
    (a*h + b) mod (2^61-1) — all int64-safe, all built-in expressions,
    one hash aggregate per document. Output: (id, sig: array<bigint>)."""
    return _signatures_from_index(
        shingle_index(df, id_col, text_col, n), id_col, k, seed, hash_family
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH near-dup pairs, exact-verified.

    Pipeline: signatures -> band keys (hash of each band slice) ->
    equi-join on (band, key) for candidates -> exact n-gram-Jaccard
    verification of candidates only. At scale the band join touches
    ~|near-dups| pairs instead of |docs|^2; verification joins the
    shingle index only for candidate ids. Output: (id_a, id_b, jaccard).

    ``hash_family='md5'`` runs the identical pipeline on a
    DuckDB-reproducible hash family (see ``_base_hash31``) so the full
    LSH machinery — signatures, banding, candidate join, exact verify —
    is hash-verifiable against an oracle; production uses xxhash64.
    """
    from kafka_streams_aggregate_spark.sources.tables import with_scan_parallelism

    df = with_scan_parallelism(df)
    rows_per_band = k // bands
    # Signatures don't need the distinct index: min over a multiset
    # equals min over its set, so the raw exploded shingles feed the
    # signature aggregate directly — one less shuffle. The exact-verify
    # stage below still uses the distinct index (Jaccard needs sets).
    # Neither is persisted: measured locally, recomputing through the
    # codegen'd pipeline beats caching 2.5x (6.7s vs 17.4s at sf0.1).
    raw_shingles = df.select(
        F.col(id_col), F.explode(token_shingles(text_col, n)).alias("shingle")
    )
    sigs = _signatures_from_index(raw_shingles, id_col, k, seed, hash_family)

    def _band_key(bi: int) -> F.Column:
        joined = F.concat_ws(
            ",",
            *[
                F.col("sig")[bi * rows_per_band + ri].cast("string")
                for ri in range(rows_per_band)
            ],
        )
        # md5 family keeps the key as a hex prefix string: identical in
        # DuckDB, and a band key only needs equality semantics.
        if hash_family == "md5":
            return F.substring(F.md5(joined), 1, 16)
        return F.xxhash64(joined)

    idx = shingle_index(df, id_col, text_col, n)
    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), _band_key(bi).alias("bkey"))
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bkey")

    ca = band_rows.select(F.col(id_col).alias("id_a"), "band", "bkey")
    cb = band_rows.select(F.col(id_col).alias("id_b"), "band", "bkey")
    candidates = (
        ca.join(cb, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Exact verify: jaccard over the shingle index restricted to
    # candidates. Join ORDER matters: expanding candidates by id_a's
    # shingles first keeps every intermediate linear in |candidates| *
    # shingles/doc. Writing `a JOIN b ON shingle` first would
    # materialize the full inverted-index self-join (quadratic in
    # doc-frequency of common shingles — the exact blow-up the LSH
    # stage exists to avoid) because Catalyst does not reorder inner
    # joins without CBO stats.
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("_size"))
    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_size").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_size").alias("_sb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_common").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 50,
    fixed_iterations: bool = False,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    clustering step that turns pairwise matches into "keep one document
    per duplicate cluster".

    Iterative min-label propagation: every node starts labeled with its
    own id; each round, a node adopts the smallest label among itself
    and its neighbors; stop at fixpoint. Converges in O(diameter)
    rounds (near-dup clusters are shallow — typically 2-4). All
    join/groupBy — the standard large-graph formulation; the driver
    only sees a converged/not-converged flag, never edge data.

    Output: (id, component) where component = min id in the cluster.
    """
    # The sum-based convergence check below requires numeric labels: with
    # a non-numeric id column the decimal cast yields NULL, the sum is
    # NULL every round, and None == None would exit after 2 iterations
    # with unconverged components. Fail loudly — and BEFORE the eager
    # edges checkpoint below, so misuse doesn't pay for the expensive
    # pair-generator pipeline first.
    if not isinstance(
        ids.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    ):
        raise TypeError(
            f"connected_components requires an integral id column; "
            f"got {id_col}: {ids.schema[id_col].dataType.simpleString()}. "
            "Map string ids to dense/hashed bigints first."
        )
    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .union(
            pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
        )
        .distinct()
        # Materialize once: the pair generator upstream (e.g. the blocked
        # cosine kernel) is the expensive stage and must not re-run every
        # propagation round.
        .localCheckpoint(eager=True)
    )
    labels = ids.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))

    prev_sum = None
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("n_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left_outer")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
                ).alias("component"),
            )
        )
        # Materialize FIRST (localCheckpoint truncates the lineage so it
        # can't grow exponentially across rounds), then run the cheap
        # convergence check against the materialized frame — otherwise
        # every round computes the propagation twice.
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
        if fixed_iterations:
            # Bench mode: run exactly max_iterations propagation rounds
            # with no convergence aggregate — deterministic round count
            # for round-over-round cost tracking.
            continue
        # Labels only ever decrease, so the label sum strictly decreases
        # until fixpoint: equal consecutive sums <=> converged. One tiny
        # aggregate per round instead of a two-frame join; DECIMAL(38,0)
        # keeps the sum exact at any row count.
        cur_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def simhash(
    df: DataFrame, id_col: str, text_col: str, hash_family: str = "xxhash64"
) -> DataFrame:
    """SimHash over whitespace tokens: per bit, sum +1/-1 across token
    hashes; sign -> bit. One explode + one hash aggregate with one
    conditional sum per bit — no UDF. Output: (id, simhash: bigint).

    xxhash64 (production) gives 64 bits; the DuckDB-reproducible md5
    family gives 60 bits (15 hex chars — the widest that still fits a
    signed BIGINT on both engines; see ``_base_hash31``)."""
    from kafka_streams_aggregate_spark.sources.tables import with_scan_parallelism

    df = with_scan_parallelism(df)
    if hash_family == "xxhash64":
        h, nbits = F.xxhash64("tok"), 64
    elif hash_family == "md5":
        from kafka_streams_aggregate_spark.functions.hashing import hash60

        h = hash60(F.col("tok"))
        nbits = 60
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"_b{b}")
        for b in range(nbits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    # Assemble the sign bits into one signed 64-bit value.
    sim = None
    for b in range(nbits):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        shifted = F.shiftleft(bit, b)
        sim = shifted if sim is None else sim.bitwiseOR(shifted)
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the hash into 4 keys (any pair
    within hamming<=3 shares at least one exact band), join per band,
    verify with bit_count(xor). Output: (id_a, id_b, hamming).
    """
    sh = simhash(df, id_col, text_col, hash_family)
    band_bits = 16 if hash_family == "xxhash64" else 15
    mask = (1 << band_bits) - 1
    bands = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.bkey")
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sha"), "band", "bkey"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_shb"), "band", "bkey"
    )
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb"))).cast("int").alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_minhash_pairs(
    base: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Incremental MinHash+LSH maintenance: when ``delta`` documents
    arrive over an already-deduped ``base`` corpus, the NEW near-dup
    pairs are exactly the pairs touching a delta doc — so the band
    join only needs ``delta_bands x all_bands``, never base x base.
    At 100 TB this is the difference between re-banding 100 TB daily
    and banding the day's arrivals: base signatures/bands are computed
    once and PERSISTED (here recomputed from ``base`` — swap in the
    stored band table in production; the signature derivation is
    deterministic so the two are identical), and the candidate volume
    scales with |delta| x band-collision rate.

    Exactness contract (what the test pins): the output equals the
    full-corpus ``minhash_lsh_pairs`` over base UNION delta restricted
    to pairs with at least one delta id — same signatures, same band
    keys, same exact-Jaccard verification.

    The ~20 banding lines are deliberately duplicated from
    ``minhash_lsh_pairs`` rather than refactored: that function backs
    two driver-verified registered queries this round, and sharing a
    helper would churn a proven path for zero behavior change.
    """
    from kafka_streams_aggregate_spark.sources.tables import (
        with_scan_parallelism,
    )

    rows_per_band = k // bands
    all_docs = with_scan_parallelism(base.unionByName(delta))
    delta_p = with_scan_parallelism(delta)

    def _band_rows(docs: DataFrame) -> DataFrame:
        raw = docs.select(
            F.col(id_col),
            F.explode(token_shingles(text_col, n)).alias("shingle"),
        )
        sigs = _signatures_from_index(raw, id_col, k, seed, hash_family)

        def _band_key(bi: int) -> F.Column:
            joined = F.concat_ws(
                ",",
                *[
                    F.col("sig")[bi * rows_per_band + ri].cast("string")
                    for ri in range(rows_per_band)
                ],
            )
            if hash_family == "md5":
                return F.substring(F.md5(joined), 1, 16)
            return F.xxhash64(joined)

        return sigs.select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            _band_key(bi).alias("bkey"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(id_col, "bk.band", "bk.bkey")

    # delta side FIRST in the join (selective side — CLAUDE.md inner-
    # join order rule); every candidate includes >= 1 delta id by
    # construction, so base x base pairs are never generated.
    ca = _band_rows(delta_p).select(
        F.col(id_col).alias("d_id"), "band", "bkey"
    )
    cb = _band_rows(all_docs).select(
        F.col(id_col).alias("o_id"), "band", "bkey"
    )
    candidates = (
        ca.join(cb, ["band", "bkey"])
        .filter(F.col("d_id") != F.col("o_id"))
        .select(
            F.least("d_id", "o_id").alias("id_a"),
            F.greatest("d_id", "o_id").alias("id_b"),
        )
        .distinct()
    )

    idx = shingle_index(all_docs, id_col, text_col, n)
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("_size"))
    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_size").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_size").alias("_sb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_common").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def edit_distance_verify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.02,
    max_doc_freq: int | None = 50,
) -> DataFrame:
    """Exact Levenshtein verification of the shingle-index candidate
    pairs — the character-level confirmation step a dedup pipeline
    runs AFTER token-level candidate generation: token Jaccard finds
    reordered/near-identical docs, edit distance quantifies how close
    they are character-by-character (the metric fuzzy-match joins and
    OCR/scrape-noise dedup actually threshold on).

    Scale shape: the O(len_a * len_b) dynamic program runs ONLY on
    candidate pairs from the df-capped inverted index (never all
    pairs), and ``levenshtein`` is a JVM codegen builtin in Spark and
    a native function in DuckDB — the SAME exact integer metric in
    both engines, so the oracle needs no reimplementation.

    Output: (id_a, id_b, len_a, len_b, edit_dist, sim_permille) with
    sim_permille = 1000*(maxlen - dist) div maxlen — an exact-integer
    normalized similarity.
    """
    cands = ngram_jaccard_pairs(
        df, id_col, text_col, n, jaccard_threshold, max_doc_freq
    ).select("id_a", "id_b")
    ta = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_text_a")
    )
    tb = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_text_b")
    )
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.length("_text_a").cast("bigint").alias("len_a"),
            F.length("_text_b").cast("bigint").alias("len_b"),
            F.levenshtein("_text_a", "_text_b")
            .cast("bigint")
            .alias("edit_dist"),
        )
        .withColumn(
            "sim_permille",
            F.expr(
                "(1000 * (greatest(len_a, len_b) - edit_dist))"
                " div greatest(len_a, len_b)"
            ).cast("bigint"),
        )
    )


def lsh_recall_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    hash_family: str = "xxhash64",
    sample_mod: int | None = None,
) -> DataFrame:
    """Quantified recall of the MinHash-LSH banding against EXACT
    ground truth — the dedup twin of the ANN family's recall audits
    (q_ann_recall_audit / q_ann_recall_pq): how many true near-dup
    pairs does the sublinear candidate generator actually surface?

    Ground truth = the UNCAPPED inverted-index exact Jaccard pairs at
    ``threshold`` (complete: a pair with jaccard > 0 shares a
    shingle). The LSH side is the production pipeline
    (``minhash_lsh_pairs`` — banding, candidate equi-join, exact
    verify at the SAME threshold), so lsh ⊆ truth and the recall is
    exactly the banding's miss rate; ``n_hit`` is computed by
    semi-join rather than assumed, as a self-check. One-row result:
    (n_truth, n_lsh, n_hit, recall_ppm). ``hash_family='md5'`` makes
    the whole audit DuckDB-reproducible (the repo's hash-family
    parity trick).

    ``sample_mod``: scope the WHOLE audit (both sides) to the
    deterministic md5-residue document sample ``md5(id) % mod == 0``
    — the round-12 verdict's scale fix. The uncapped truth join is
    O(sum df^2) over shingle doc-frequencies: one stop-shingle shared
    by 1e5 docs emits 1e10 candidate pairs from a single key, so the
    full-corpus audit cannot ship at 100 TB. Recall measured on a
    hash sample of DOCUMENTS is an unbiased estimate of banding
    recall (both sides see the same sample, lsh ⊆ truth still holds;
    the ``closeness_sampled`` seed-scoping precedent), and the join
    cost falls by mod^2. None = full corpus (the oracle-parity test's
    small-scale setting)."""
    if sample_mod is not None:
        df = df.where(
            F.expr(
                f"CAST(conv(substr(md5(CAST({id_col} AS STRING)), 1, 2),"
                f" 16, 10) AS BIGINT) % {sample_mod} = 0"
            )
        )
    truth = ngram_jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, max_doc_freq=None
    ).select("id_a", "id_b")
    lsh = minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        n=n,
        k=k,
        bands=bands,
        threshold=threshold,
        seed=seed,
        hash_family=hash_family,
    ).select("id_a", "id_b")
    truth = truth.localCheckpoint(eager=True)  # feeds two consumers
    # lsh also feeds two consumers (semi-join + count) and its subtree
    # is the EXPENSIVE one (32-hash signature codegen, the documented
    # JIT-warmup class) — unlike the cheap shingle index, materializing
    # it wins: interleaved A/B at sf0.1 measured first-run 10.6 -> 5.7s
    # and second-run 5.2 -> 4.4s (steady-state equal).
    lsh = lsh.localCheckpoint(eager=True)
    hits = lsh.join(truth, ["id_a", "id_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    nl = lsh.agg(F.count(F.lit(1)).cast("bigint").alias("n_lsh"))
    nh = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    return (
        nt.crossJoin(nl)
        .crossJoin(nh)
        .select(
            "n_truth",
            "n_lsh",
            "n_hit",
            F.expr(
                "CASE WHEN n_truth > 0 THEN"
                " CAST((1000000 * n_hit) div n_truth AS BIGINT) END"
            ).alias("recall_ppm"),
        )
    )


def dedup_cluster_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.02,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate CLUSTER profile — the dedup report the pairwise
    queries can't give: after LSH pairs collapse into connected
    components, how is duplication distributed? A corpus where 1% of
    docs sit in two-doc clusters needs a different pipeline than one
    with a single 10k-doc boilerplate cluster, and the cluster-size
    histogram is the number that tells them apart.

    Components come from the production minhash_lsh_pairs +
    connected_components machinery (min-label propagation, converges
    in O(diameter) — near-dup clusters are shallow); non-singleton
    clusters bucket by size MSB via length(bin(size)) (the round-6
    cross-engine floor-log2 trick). dup_excess = docs the cluster
    bucket would DELETE under keep-one canonicalization. Output per
    bucket: (size_bucket, n_clusters, n_docs_in_clusters,
    dup_excess).

    ``seed`` forwards to ``minhash_lsh_pairs`` (default 42 = that
    function's default; the registered md5 oracle embeds the seed-42
    constants, so q_dedup_cluster_profile keeps the default)."""
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, n=n, k=k, bands=bands,
        threshold=threshold, seed=seed, hash_family=hash_family,
    )
    ids = docs.select(F.col(id_col).alias("id"))
    comp = connected_components(pairs, ids, id_col="id")
    sizes = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .where(F.col("size") >= 2)
    )
    return (
        sizes.groupBy(
            F.expr("CAST(length(bin(size)) AS BIGINT)").alias("size_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("size").cast("bigint").alias("n_docs_in_clusters"),
        )
        .select(
            "size_bucket",
            "n_clusters",
            "n_docs_in_clusters",
            (F.col("n_docs_in_clusters") - F.col("n_clusters"))
            .cast("bigint")
            .alias("dup_excess"),
        )
    )


def url_normalize_dedup(
    df: DataFrame,
    url_col: str = "url",
    group_col: str = "source",
) -> DataFrame:
    """URL/metadata-level exact dedup — the cheapest dedup tier every
    crawl pipeline runs BEFORE touching content: canonicalize the URL
    (case-insensitive scheme+host, tracking params out, fragment out,
    trailing slash off) and count how many raw URLs collapse.

    Normalization, all JVM-codegen string ops with literal DuckDB
    twins:
      - scheme and host lowercased (path/query stay case-sensitive),
      - ``utm_*`` query params removed; an emptied query drops its
        ``?``,
      - the ``#fragment`` removed,
      - a trailing ``/`` on a non-root path removed.

    Output per group: (group_key, n_docs, n_raw_urls, n_norm_urls,
    dup_excess = n_raw_urls - n_norm_urls, dup_ppm = (1e6 *
    dup_excess) div n_raw_urls). Two distinct-aggregates over one
    normalized projection — the 100 TB shape is a hash groupBy on the
    normalized key."""
    parts = df.select(
        F.col(group_col).alias("group_key"),
        F.col(url_col).alias("_u"),
    ).select(
        "group_key",
        "_u",
        F.expr("regexp_extract(_u, '^([a-zA-Z]+)://', 1)").alias("_scheme"),
        F.expr("regexp_extract(_u, '^[a-zA-Z]+://([^/?#]*)', 1)").alias(
            "_host"
        ),
        F.expr(
            "regexp_extract(_u, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1)"
        ).alias("_path"),
        F.expr("regexp_extract(_u, '\\\\?([^#]*)', 1)").alias("_qs"),
    )
    # utm-param test: substr comparison, NOT `LIKE 'utm_%'` — `_` is a
    # single-char LIKE wildcard, which would also strip e.g. utmost=1.
    # Schemeless/unparseable URLs (scheme or host regexp miss) pass
    # through as their raw selves rather than all collapsing onto the
    # '://' key and inflating dup_excess.
    norm = parts.select(
        "group_key",
        "_u",
        F.expr(
            "CASE WHEN _scheme = '' OR _host = '' THEN _u ELSE concat("
            " lower(_scheme), '://', lower(_host),"
            " CASE WHEN _path <> '/' AND _path LIKE '%/' THEN"
            "      substr(_path, 1, length(_path) - 1)"
            "      ELSE _path END,"
            " CASE WHEN size(filter(split(_qs, '&'),"
            "           x -> x <> '' AND substr(x, 1, 4) <> 'utm_'))"
            "           > 0 THEN"
            "      concat('?', array_join(filter(split(_qs, '&'),"
            "           x -> x <> '' AND substr(x, 1, 4) <> 'utm_'),"
            "           '&'))"
            "      ELSE '' END) END"
        ).alias("norm_url"),
    )
    agg = norm.groupBy("group_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("_u").cast("bigint").alias("n_raw_urls"),
        F.countDistinct("norm_url").cast("bigint").alias("n_norm_urls"),
    )
    return agg.select(
        "group_key",
        "n_docs",
        "n_raw_urls",
        "n_norm_urls",
        (F.col("n_raw_urls") - F.col("n_norm_urls"))
        .cast("bigint")
        .alias("dup_excess"),
        F.expr(
            "CASE WHEN n_raw_urls > 0 THEN"
            " CAST((1000000 * (n_raw_urls - n_norm_urls)) div n_raw_urls"
            " AS BIGINT) END"
        ).alias("dup_ppm"),
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lead_k: int | None = None,
) -> DataFrame:
    """Cross-source duplicate matrix — WHERE does duplication come
    from? Content-hash clusters that span two sources indicate
    mirrored/syndicated content; the per-pair counts tell a corpus
    owner which source pairs to reconcile before near-dup spend.

    Key: md5 of the full text (``lead_k=None``, the q_dedup_exact
    key) or md5 of the first ``lead_k`` whitespace tokens — the
    lead-paragraph fingerprint syndication detection uses (wire copy
    keeps the lede and edits the tail, so exact hashing misses it).

    Shape: per-(hash, source) rollup (one groupBy), then a self-join
    on the hash key restricted to source_a < source_b — candidate
    pairs only materialize for hashes that actually span sources
    (duplicate-cluster-sized, not corpus-sized). Output per ordered
    source pair: (source_a, source_b, n_shared_hashes, n_docs_a,
    n_docs_b)."""
    if lead_k is None:
        key = f"md5({text_col})"
    else:
        key = (
            f"md5(array_join(slice(filter(split({text_col}, ' '),"
            f" x -> x != ''), 1, {lead_k}), ' '))"
        )
    per = (
        docs.select(
            F.col(source_col).alias("source"),
            F.expr(key).alias("h"),
        )
        .groupBy("h", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    a = per.select(
        "h", F.col("source").alias("source_a"), F.col("cnt").alias("ca")
    )
    b = per.select(
        "h", F.col("source").alias("source_b"), F.col("cnt").alias("cb")
    )
    joined = a.join(b, "h").where(F.col("source_a") < F.col("source_b"))
    return joined.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared_hashes"),
        F.sum("ca").cast("bigint").alias("n_docs_a"),
        F.sum("cb").cast("bigint").alias("n_docs_b"),
    )


def cross_source_neardup_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.02,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Cross-source NEAR-duplicate matrix — the minhash companion of
    ``cross_source_dup_matrix`` (the r15 verdict's direction): the
    lead-k fingerprint rollup catches syndicated LEDES only (wire copy
    that keeps the opening verbatim); paraphrased syndication — same
    body, edited lead — needs the full near-dup machinery. Runs
    ``minhash_lsh_pairs`` (signatures -> bands -> candidate equi-join
    -> exact-Jaccard verify), keeps only pairs whose docs come from
    DIFFERENT sources, and rolls up per unordered source pair.

    Output: (source_a, source_b, n_pairs, n_exact_pairs, max_jaccard)
    with source_a < source_b; n_exact_pairs counts jaccard = 1 (the
    exact-dup overlap with cross_source_dup_matrix's hash key);
    max_jaccard is parity-safe (max over bit-identical IEEE ratios).

    100 TB shape: pair volume is duplicate-cluster-sized (band join),
    and the id->source map joins on the id equi-key — candidates
    first per the Catalyst join-order note, never a corpus x corpus
    product."""
    pairs = minhash_lsh_pairs(
        docs,
        id_col,
        text_col,
        n=n,
        k=k,
        bands=bands,
        threshold=threshold,
        seed=seed,
        hash_family=hash_family,
    )
    src_a = docs.select(
        F.col(id_col).alias("id_a"), F.col(source_col).alias("_src_a")
    )
    src_b = docs.select(
        F.col(id_col).alias("id_b"), F.col(source_col).alias("_src_b")
    )
    tagged = (
        pairs.join(src_a, "id_a")
        .join(src_b, "id_b")
        .where(F.col("_src_a") != F.col("_src_b"))
    )
    return (
        tagged.select(
            F.least("_src_a", "_src_b").alias("source_a"),
            F.greatest("_src_a", "_src_b").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(F.col("jaccard") >= F.lit(1.0), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_exact_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def minhash_calibration(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.02,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash estimator calibration audit — HOW GOOD is the signature
    as a Jaccard estimator on this corpus? For every LSH-verified pair
    the signature-agreement estimate (agree/k — the textbook unbiased
    MinHash estimator) rides next to the exact Jaccard the verify
    stage already computed, bucketed by estimated decile:

        est_ppm   = (1e6 * #{i : sig_a[i] = sig_b[i]}) div k
        exact_ppm = floor(1e6 * jaccard)   (exact int/int ratio times
                                            a power of ten — floor is
                                            deterministic cross-engine)
        bucket    = (10 * agree) div k

    Output per bucket: (bucket, n_pairs, sum_est_ppm, sum_exact_ppm,
    sum_abs_err_ppm). A healthy signature shows sum_est ~ sum_exact
    per bucket; systematic bias here means the dedup threshold is
    mis-calibrated BEFORE anyone tunes it at 100 TB (k is the
    variance knob: sd ~ 1/sqrt(k)). Pair volume = the verified-pair
    set (duplicate-cluster-sized); the signature join is two id
    equi-joins."""
    pairs = minhash_lsh_pairs(
        docs,
        id_col,
        text_col,
        n=n,
        k=k,
        bands=bands,
        threshold=threshold,
        seed=seed,
        hash_family=hash_family,
    )
    sigs = _signatures_from_index(
        shingle_index(docs, id_col, text_col, n),
        id_col,
        k,
        seed,
        hash_family,
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb"))
    scored = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.expr(
                "aggregate(zip_with(_sa, _sb,"
                " (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("_agree"),
            F.expr("CAST(floor(1000000 * jaccard) AS BIGINT)").alias(
                "_exact_ppm"
            ),
        )
        .select(
            F.expr(f"CAST((10 * _agree) div {k} AS BIGINT)").alias(
                "bucket"
            ),
            F.expr(f"CAST((1000000 * _agree) div {k} AS BIGINT)").alias(
                "_est_ppm"
            ),
            "_exact_ppm",
        )
    )
    return scored.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("_est_ppm").cast("bigint").alias("sum_est_ppm"),
        F.sum("_exact_ppm").cast("bigint").alias("sum_exact_ppm"),
        F.sum(F.expr("abs(_est_ppm - _exact_ppm)"))
        .cast("bigint")
        .alias("sum_abs_err_ppm"),
    )


def pair_overlap_density(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int = 3,
) -> DataFrame:
    """Corpus pair-overlap density per group — the expected number of
    shared n-token shingles for a RANDOM pair of documents, computed
    WITHOUT any pairwise join: each shingle with document frequency
    df co-occurs in exactly C(df,2) doc pairs, so

        sum_pairs     = sum over shingles of df*(df-1)/2
        density_milli = (1000 * sum_pairs) div C(n_docs, 2)

    — the corpus-level self-similarity number that tells you whether
    near-dup dedup is worth running before the O(candidates) LSH pass
    (its decomposition is the same trick that makes the statistic
    linear at 100 TB: one distinct + one groupBy over the shingle
    index, never documents x documents). Output: (group_key, n_docs,
    n_shingle_types, pair_overlap_sum, density_milli)."""
    from kafka_streams_aggregate_spark.sources.tables import (
        with_scan_parallelism,
    )

    gc = "group_key"
    base = with_scan_parallelism(df)
    # One hash exchange serves BOTH the (g,id,shingle) dedupe and the
    # per-shingle df groupBy: partitioning on (g, shingle) — a subset
    # of the dedupe keys and exactly the grouping keys — lets Catalyst
    # run the dedupe partition-local and elide the second exchange
    # (the round-10 hash-subset clustering rule). The round-robin scan
    # repartition stays FIRST so the CPU-heavy shingling runs wide,
    # not in the single-file scan task.
    idx = (
        base.select(
            F.col(group_col).alias(gc),
            F.col(id_col).alias("_id"),
            F.explode(token_shingles(text_col, n)).alias("shingle"),
        )
        .repartition(F.col(gc), F.col("shingle"))
        .dropDuplicates([gc, "_id", "shingle"])
    )
    per_shingle = idx.groupBy(gc, "shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    overlap = per_shingle.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingle_types"),
        F.sum(
            F.expr("(CAST(df AS DECIMAL(38,0)) * (df - 1)) div 2")
        ).alias("_pairs"),
    )
    docs = (
        df.select(F.col(group_col).alias(gc))
        .groupBy(gc)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return docs.join(overlap, gc, "left").select(
        gc,
        "n_docs",
        F.expr("coalesce(n_shingle_types, 0)").alias("n_shingle_types"),
        F.expr("CAST(coalesce(_pairs, 0) AS BIGINT)").alias(
            "pair_overlap_sum"
        ),
        F.expr(
            "CASE WHEN n_docs >= 2 THEN"
            " CAST((2000 * coalesce(_pairs, 0))"
            " div (CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1))"
            " AS BIGINT) END"
        ).alias("density_milli"),
    )


def chunk_dup_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    chunk_tokens: int = 20,
) -> DataFrame:
    """Chunk-granular EXACT duplicate profile per group — the scalable
    form of exact-substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", use suffix arrays for 50-token
    substrings; non-overlapping fixed chunks + hash groupBy gives the
    linear-at-100TB approximation every production pipeline actually
    runs first): each doc's full ``chunk_tokens``-token chunks are
    md5'd and counted across the corpus.

        dup_ppm = (1e6 * dup_chunks) div total_chunks

    dup_chunks counts every occurrence of a chunk seen more than once
    (within OR across docs); crossdoc_dup_chunks restricts to chunks
    spanning >= 2 docs (the signal exact_dedup at doc granularity
    misses). Tail tokens short of a full chunk are dropped by
    construction; docs yielding zero chunks are counted. Output:
    (group_key, n_docs, n_short_docs, total_chunks, dup_chunks,
    crossdoc_dup_chunks, n_dup_clusters, max_cluster, dup_ppm)."""
    from kafka_streams_aggregate_spark.sources.tables import (
        with_scan_parallelism,
    )

    w = chunk_tokens
    gc = "group_key"
    base = with_scan_parallelism(df).select(
        F.col(group_col).alias(gc),
        F.col(id_col).alias("_id"),
        F.expr(
            f"CASE WHEN size(split({text_col}, ' ')) >= {w} THEN"
            f" transform(sequence(0, CAST(size(split({text_col}, ' '))"
            f" / {w} AS INT) - 1),"
            f" i -> array_join(slice(split({text_col}, ' '),"
            f" i * {w} + 1, {w}), ' '))"
            " ELSE array() END"
        ).alias("_chunks"),
    )
    ex = base.select(gc, "_id", F.explode("_chunks").alias("chunk")).select(
        gc, "_id", F.md5("chunk").alias("h")
    )
    per_hash = ex.groupBy(gc, "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.countDistinct("_id").cast("bigint").alias("nd"),
    )
    prof = per_hash.groupBy(gc).agg(
        F.sum("cnt").cast("bigint").alias("total_chunks"),
        F.sum(F.expr("CASE WHEN cnt > 1 THEN cnt ELSE 0 END"))
        .cast("bigint")
        .alias("dup_chunks"),
        F.sum(F.expr("CASE WHEN nd > 1 THEN cnt ELSE 0 END"))
        .cast("bigint")
        .alias("crossdoc_dup_chunks"),
        F.sum(F.expr("CASE WHEN cnt > 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_dup_clusters"),
        F.max("cnt").cast("bigint").alias("max_cluster"),
    )
    docs = base.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr("CASE WHEN size(_chunks) = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_short_docs"),
    )
    return docs.join(prof, gc, "left").select(
        gc,
        "n_docs",
        "n_short_docs",
        F.expr("coalesce(total_chunks, 0)").alias("total_chunks"),
        F.expr("coalesce(dup_chunks, 0)").alias("dup_chunks"),
        F.expr("coalesce(crossdoc_dup_chunks, 0)").alias(
            "crossdoc_dup_chunks"
        ),
        F.expr("coalesce(n_dup_clusters, 0)").alias("n_dup_clusters"),
        F.expr("coalesce(max_cluster, 0)").alias("max_cluster"),
        F.expr(
            "CASE WHEN coalesce(total_chunks, 0) > 0 THEN"
            " CAST((1000000 * dup_chunks) div total_chunks AS BIGINT)"
            " END"
        ).alias("dup_ppm"),
    )


def _winnow_wins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int,
    w: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared winnowing core: (base with _grams, valid windows with
    the packed rightmost-min key _mk). See winnowing_profile for the
    construction; winnowing_pairs reuses the same anchors."""
    from kafka_streams_aggregate_spark.sources.tables import (
        with_scan_parallelism,
    )

    gc = "group_key"
    m31 = (1 << 31) - 1
    base = with_scan_parallelism(df).select(
        F.col(group_col).alias(gc),
        F.col(id_col).alias("_id"),
        F.expr(
            f"CASE WHEN size(split({text_col}, ' ')) >= {k} THEN"
            f" transform(sequence(1, size(split({text_col}, ' '))"
            f" - {k} + 1),"
            f" p -> array_join(slice(split({text_col}, ' '), p, {k}),"
            " ' ')) ELSE array() END"
        ).alias("_grams"),
    )
    grams = base.select(
        gc,
        "_id",
        F.expr("size(_grams)").cast("bigint").alias("p_total"),
        F.posexplode("_grams").alias("pos", "gram"),
    ).select(
        gc,
        "_id",
        "p_total",
        "pos",
        F.expr(
            "pmod(CAST(conv(substr(md5(gram), 1, 8), 16, 10) AS BIGINT),"
            f" {1 << 31}) * {1 << 31} + ({m31} - pos)"
        ).alias("key"),
    )
    wins = grams.select(
        gc,
        "_id",
        "pos",
        "p_total",
        F.expr(
            "min(key) OVER (PARTITION BY _id ORDER BY pos"
            f" ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)"
        ).alias("_mk"),
    ).where(F.expr(f"pos <= p_total - {w}"))
    return base, wins


def winnowing_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """MOSS winnowing fingerprint profile per group (Schleimer,
    Wilkerson & Aiken) — the document-fingerprint SELECTION scheme
    that guarantees every match of length >= w+k-1 tokens shares an
    anchor (minhash gives no such window guarantee): every window of
    ``w`` consecutive k-gram hashes selects its RIGHTMOST minimal
    hash; the distinct selected positions are the fingerprint.

    The rightmost-min argmin is computed TIE-SAFELY with one BIGINT
    window min by packing hash and position into one key:

        key = h * 2^31 + (2^31 - 1 - pos)      (h < 2^31, 62 bits)

    so equal hashes resolve to the larger pos, deterministically on
    both engines — no arg_min with unspecified ties. The md5-family
    31-bit hash keeps the whole fingerprint cross-engine verifiable
    (the round-5 hash-family trick). Expected density is 2/(w+1);
    the measured density_ppm audits it. Docs with fewer than w
    k-grams are dropped AND counted. Output: (group_key, n_docs,
    n_short_docs, total_grams, total_windows, total_anchors,
    density_ppm)."""
    gc = "group_key"
    m31 = (1 << 31) - 1
    base, wins = _winnow_wins(df, id_col, text_col, group_col, k, w)
    anchors = (
        wins.select(
            gc, "_id", F.expr(f"{m31} - (_mk % {1 << 31})").alias("apos")
        )
        .distinct()
        .groupBy(gc)
        .agg(F.count(F.lit(1)).cast("bigint").alias("total_anchors"))
    )
    # r16-opt (guide §1.2): the per-doc stats consumer only needs
    # size(_grams), and size(_grams) == greatest(n_tok - k + 1, 0)
    # with n_tok = size(split(text)) — so this second pass over the
    # corpus skips the gram-string build (transform + slice +
    # array_join per position) entirely and aggregates over an integer
    # derived from the token count. Identical values by the size
    # identity (asserted row-for-row against the _grams form at sf0.1
    # before landing). Interleaved A/B warm best 4.53 -> 3.81s.
    from kafka_streams_aggregate_spark.sources.tables import (
        with_scan_parallelism,
    )

    meta = with_scan_parallelism(df).select(
        F.col(group_col).alias(gc),
        F.expr(
            f"CASE WHEN size(split({text_col}, ' ')) >= {k}"
            f" THEN size(split({text_col}, ' ')) - {k} + 1"
            " ELSE 0 END"
        ).alias("_ng"),
    )
    docs = meta.groupBy(gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr(f"CASE WHEN _ng < {w} THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_short_docs"),
        F.sum("_ng").cast("bigint").alias("total_grams"),
        F.sum(
            F.expr(f"CASE WHEN _ng >= {w} THEN _ng - {w} + 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("total_windows"),
    )
    return docs.join(anchors, gc, "left").select(
        gc,
        "n_docs",
        "n_short_docs",
        "total_grams",
        "total_windows",
        F.expr("coalesce(total_anchors, 0)").alias("total_anchors"),
        F.expr(
            "CASE WHEN total_grams > 0 THEN"
            " CAST((1000000 * coalesce(total_anchors, 0))"
            " div total_grams AS BIGINT) END"
        ).alias("density_ppm"),
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int | None = 50,
) -> DataFrame:
    """Winnowing candidate pairs — the MATCH stage the fingerprint
    profile sets up: docs sharing >= ``min_shared`` distinct anchor
    HASHES are near-dup candidates, with the MOSS guarantee that any
    common run of >= w+k-1 tokens contributes at least one shared
    anchor (so recall on long overlaps is 1.0 by construction, unlike
    minhash banding's probabilistic recall). Anchors with document
    frequency above ``max_doc_freq`` are dropped before the self-join
    (the stop-shingle cap: boilerplate anchors would square). The
    join is an equi-join on the anchor hash, candidate side first
    (the Catalyst join-order rule). Output: (id_a, id_b, n_shared,
    overlap_milli = 1000*n_shared div min(|A|,|B|)) with id_a < id_b,
    where |A| is the doc's distinct-anchor-hash count BEFORE the df
    cap (so the ratio is meaningful per doc)."""
    m31 = (1 << 31) - 1
    _, wins = _winnow_wins(df, id_col, text_col, id_col, k, w)
    anchors = (
        wins.select("_id", F.expr(f"_mk div {1 << 31}").alias("h"))
        .distinct()
    )
    sizes = anchors.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("_sz")
    )
    if max_doc_freq is not None:
        hot = anchors.groupBy("h").agg(
            F.count(F.lit(1)).alias("_df")
        ).where(F.col("_df") > max_doc_freq).select("h")
        anchors = anchors.join(F.broadcast(hot), "h", "left_anti")
    a = anchors.select(F.col("_id").alias("id_a"), "h")
    b = anchors.select(F.col("_id").alias("id_b"), "h")
    pairs = (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.expr(
                "CAST((1000 * n_shared) div least(_sa, _sb) AS BIGINT)"
            ).alias("overlap_milli"),
        )
    )
