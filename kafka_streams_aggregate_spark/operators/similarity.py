"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force cosine top-k   the exact baseline: broadcast the (small)
                             query set against the corpus, evaluate
                             cosine with codegen'd higher-order
                             functions, window top-k per query.
  LSH-bucketed ANN           the scale path: random-hyperplane sign
                             codes bucket the corpus; queries probe
                             their bucket (plus optional multi-probe),
                             exact re-rank inside the bucket only.

At 100 TB the brute-force path is still the right *inner* kernel —
LSH/IVF only shrink the candidate set; the re-rank math is identical.
Neither path ever collects vectors to the driver.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

from kafka_streams_aggregate_spark.functions.vectors import as_double_array, cosine, dot
from kafka_streams_aggregate_spark.operators.windows import topk_per_group


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Output: (query_id, neighbor_id, sim, rank).

    The query side is broadcast (it is small by construction); the
    corpus never shuffles until the final per-query top-k window, which
    moves only (query, id, sim) triples — not vectors."""
    q = queries.select(
        F.col(query_id), as_double_array(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), as_double_array(vec_col).alias("_cvec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col("neighbor_id"))
    ranked = topk_per_group(
        scored,
        [query_id],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return ranked.select(
        query_id, "neighbor_id", "sim", F.row_number().over(w).alias("rank")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_code(vec_col, planes: list[list[float]]):
    """Sign-bit code: bit i set iff dot(vec, plane_i) >= 0. Pure
    higher-order-function expression over literal plane arrays."""
    code = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        shifted = F.shiftleft(bit, i)
        code = shifted if code is None else code.bitwiseOR(shifted)
    return code


def _dim_checked(vec, dim: int):
    """Guard an embedding column against a hyperplane-dimension
    mismatch. Without this, ``zip_with`` pads the shorter side with
    nulls, the fold dot product goes null, every sign bit resolves to
    0, and ALL vectors silently land in bucket 0 — wrong answers, no
    error. ``assert_true`` returns NULL on success, so the ``when``
    wrapper passes the vector through typed unchanged; on mismatch the
    first evaluated row fails the job loudly. Costs one size() compare
    per row — no extra driver job."""
    ok = F.assert_true(
        F.size(vec) == dim,
        F.concat(
            F.lit("ann_lsh: embedding dimension "),
            F.size(vec).cast("string"),
            F.lit(f" != configured hyperplane dim={dim}"),
        ),
    )
    return F.when(ok.isNull(), vec)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane sign
    code, exact cosine re-rank within the shared bucket. Recall depends
    on n_planes (fewer planes = bigger buckets = higher recall, more
    work). Output: (query_id, neighbor_id, sim, rank) — approximate.
    """
    planes = _hyperplanes(n_planes, dim, seed)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        _dim_checked(as_double_array(vec_col), dim).alias("_cvec"),
    ).withColumn("_bucket", lsh_bucket_code(F.col("_cvec"), planes))
    q = queries.select(
        F.col(query_id), _dim_checked(as_double_array(vec_col), dim).alias("_qvec")
    ).withColumn("_bucket", lsh_bucket_code(F.col("_qvec"), planes))

    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own sign-code
    bucket PLUS every bucket at hamming distance 1 (one flipped
    hyperplane bit) — the standard recall lever that trades n_planes+1
    bucket lookups for a much smaller miss rate without growing the
    index. Probe codes differ, so a corpus vector is seen at most once
    per query; the exact cosine re-rank is unchanged.

    Scale shape: corpus is coded once (no extra copies); only the
    (tiny, broadcast) query side explodes by the probe count, and the
    join stays a bucket equi-join. Output: (query_id, neighbor_id,
    sim, rank) — approximate, deterministic.
    """
    planes = _hyperplanes(n_planes, dim, seed)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        _dim_checked(as_double_array(vec_col), dim).alias("_cvec"),
    ).withColumn("_bucket", lsh_bucket_code(F.col("_cvec"), planes))
    base = lsh_bucket_code(_dim_checked(as_double_array(vec_col), dim), planes)
    q = queries.select(
        F.col(query_id),
        _dim_checked(as_double_array(vec_col), dim).alias("_qvec"),
        F.explode(
            F.array(base, *[base.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)])
        ).alias("_bucket"),
    )
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id,
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Vectorized (BLAS) brute-force cosine top-k — the high-throughput
    twin of cosine_topk.

    The query set is collected once (it is small and bounded by
    construction — the same budget as a broadcast) into a normalized
    numpy matrix shipped via a broadcast variable; each corpus Arrow
    batch computes a single `C @ Q.T` GEMM and emits only its local
    top-k candidates per query, so the final window re-rank touches
    ~k * n_batches rows. This is the 100 TB inner kernel: per-executor
    matrix multiply, nothing but (id, sim) triples on the wire.

    Float caveat: BLAS summation order differs from a sequential fold,
    so sims can differ from the exact-fold path in the last ~2 ulps —
    this operator is for throughput (rows-only check), cosine_topk is
    the bit-reproducible baseline.
    """
    import numpy as np

    spark = corpus.sparkSession
    q_rows = queries.select(query_id, vec_col).collect()
    qids = np.array([r[0] for r in q_rows])
    qmat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qmat.T.copy()))

    id_field = corpus.schema[corpus_id].dataType.simpleString()
    qid_field = queries.schema[query_id].dataType.simpleString()
    out_schema = f"{query_id} {qid_field}, neighbor_id {id_field}, sim double"
    kk = k

    def _batches(it):
        import numpy as _np
        import pandas as _pd

        _qids, _qt = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            c = _np.array([list(v) for v in pdf[vec_col]], dtype=_np.float64)
            c /= _np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ _qt  # (batch, n_queries)
            ids = pdf[corpus_id].to_numpy()
            take = min(kk + 1, len(pdf))  # +1 headroom for self-match
            top = _np.argpartition(-sims, take - 1, axis=0)[:take]
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                rows = top[:, j]
                out_q.extend([_qids[j]] * len(rows))
                out_n.extend(ids[rows])
                out_s.extend(sims[rows, j])
            yield _pd.DataFrame(
                {query_id: out_q, "neighbor_id": out_n, "sim": out_s}
            )

    candidates = corpus.select(corpus_id, vec_col).mapInPandas(
        _batches, schema=out_schema
    )
    if exclude_self:
        candidates = candidates.filter(F.col(query_id) != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def normalized(vec: "F.Column") -> "F.Column":
    """vec / sqrt(|vec|^2), element-wise — computed ONCE per row so the
    O(n^2) pair stage below only needs a single dot product per pair
    (3x fewer flops than dot/sqrt(na*nb) per pair). The oracle mirrors
    the same normalize-then-dot evaluation order for bit parity."""
    from kafka_streams_aggregate_spark.functions.vectors import norm_sq

    n = F.sqrt(norm_sq(vec))
    return F.transform(vec, lambda x: x / n)


def embedding_neardup_pairs_vectorized(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.2,
    n_blocks: int | None = None,
    rows_per_block: int = 65536,
) -> DataFrame:
    """Vectorized all-pairs cosine near-dup with BIT-EXACT sequential
    semantics, distributed as a pair-of-blocks join (nothing ever
    collects to the driver).

    Plan shape: each row is hashed into one of ``n_blocks`` blocks;
    a tiny (block_a, block_b) pair table (block_a <= block_b, so each
    unordered row pair lands in exactly one group) is broadcast-joined
    against the corpus, and ``groupBy(pair).applyInPandas`` brings the
    two blocks of each pair together for a numpy kernel. Shuffle volume
    is ~n_blocks x corpus; FLOPs are N^2/2 (each unordered pair scored
    once). At 100 TB, size ``n_blocks`` so one block (~N/n_blocks rows
    of vectors) fits an executor's Arrow group budget.

    Bit-exactness: a dim-ordered accumulation loop (``for i: acc +=
    A[:, i] * B[:, i]``) keeps every pair's scalar accumulator chain in
    exactly the order of a sequential fold — vectorizing across pairs
    does not change per-element addition order — so results are
    bit-identical to the HOF/`list_inner_product` path while running as
    numpy array ops instead of interpreted lambdas (measured ~10x).
    Block assignment cannot change any pair's value: normalization is
    per-row and the dot is per-pair.
    Output: (id_a, id_b, sim) with id_a < id_b and sim >= threshold.
    """
    spark = corpus.sparkSession
    id_field = corpus.schema[corpus_id].dataType.simpleString()
    if n_blocks is None:
        # One cheap count job sizes the grid. Two constraints: memory
        # (each block's vectors fit one Arrow group: <= rows_per_block)
        # and parallelism (>= 8 blocks -> 36 group-pairs once the corpus
        # is big enough to amortize per-group overhead).
        n = corpus.count()
        by_mem = max(1, -(-n // int(rows_per_block)))
        by_par = min(8, max(1, -(-n // 512)))
        n_blocks = max(by_mem, by_par)
    b = int(n_blocks)
    pair_rows = [(i * b + j, i, j) for i in range(b) for j in range(i, b)]
    pairs = spark.createDataFrame(pair_rows, "_pair int, _blk_a int, _blk_b int")

    blocks = corpus.select(
        F.col(corpus_id).alias("_id"), F.col(vec_col).alias("_vec")
    ).withColumn("_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(b)).cast("int"))
    # A side joins every pair whose left block matches; B side only the
    # off-diagonal pairs (the diagonal group pairs a block with itself).
    a_side = blocks.join(F.broadcast(pairs), F.col("_blk") == F.col("_blk_a")).select(
        "_pair", F.lit(0).alias("_side"), "_id", "_vec"
    )
    b_side = blocks.join(
        F.broadcast(pairs.filter(F.col("_blk_a") != F.col("_blk_b"))),
        F.col("_blk") == F.col("_blk_b"),
    ).select("_pair", F.lit(1).alias("_side"), "_id", "_vec")
    rep = a_side.unionByName(b_side)

    thr = threshold

    def _block_pair_kernel(pdf):
        # Self-contained (pickled by value): no module-level references.
        import numpy as np
        import pandas as pd

        def prep(part):
            m = np.array([list(v) for v in part["_vec"]], dtype=np.float64)
            acc = np.zeros(m.shape[0])
            for i in range(m.shape[1]):
                acc += m[:, i] * m[:, i]
            return m / np.sqrt(acc)[:, None], part["_id"].to_numpy()

        a = pdf[pdf["_side"] == 0]
        bp = pdf[pdf["_side"] == 1]
        if len(a) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        ma, ida = prep(a)
        diagonal = len(bp) == 0
        if diagonal:
            mb, idb = ma, ida
        else:
            mb, idb = prep(bp)
        dim = ma.shape[1]
        frames = []
        for lo in range(0, len(ida), 512):  # bound the accumulator
            ra, ri = ma[lo : lo + 512], ida[lo : lo + 512]
            acc = np.zeros((ra.shape[0], mb.shape[0]))
            for i in range(dim):
                acc += ra[:, i][:, None] * mb[:, i][None, :]
            mask = acc >= thr
            if diagonal:
                # within-block: strict order avoids self + double-count
                mask &= ri[:, None] < idb[None, :]
            ai, bi = np.nonzero(mask)
            if len(ai):
                xa, xb = ri[ai], idb[bi]
                # off-diagonal pairs are unordered: orient by id
                lo_id = np.minimum(xa, xb)
                hi_id = np.maximum(xa, xb)
                frames.append(
                    pd.DataFrame({"id_a": lo_id, "id_b": hi_id, "sim": acc[ai, bi]})
                )
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        return pd.concat(frames, ignore_index=True)

    return rep.groupBy("_pair").applyInPandas(
        _block_pair_kernel, schema=f"id_a {id_field}, id_b {id_field}, sim double"
    )


def _ivf_assign_batches(nv_col: str, cmat: list[list[float]], carry: bool):
    """Arrow-batched centroid assignment kernel (mapInPandas body).

    Dots use the dim-ordered accumulation loop (`acc[:, c] += M[:, i] *
    C[c, i]` for i in dim order), so every (row, centroid) accumulator
    follows exactly the sequential-fold op sequence of the HOF/
    `list_inner_product` path — bit-identical scores, ~100x faster than
    interpreted HOF lambdas. `np.argmax` takes the first maximum, i.e.
    ties go to the smallest centroid id — the oracle's (dot DESC, cid
    ASC) rule. Self-contained closure: pickled by value."""

    def _batches(it):
        import numpy as np
        import pandas as pd

        C = np.array(cmat, dtype=np.float64)  # (k, dim)
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.array([list(v) for v in pdf[nv_col]], dtype=np.float64)
            acc = np.zeros((M.shape[0], C.shape[0]))
            for i in range(C.shape[1]):
                acc += M[:, i][:, None] * C[:, i][None, :]
            out = pdf.copy() if carry else pd.DataFrame(index=pdf.index)
            out["_cid"] = np.argmax(acc, axis=1).astype(np.int32)
            yield out

    return _batches


def ivf_train_centroids(
    normed: DataFrame,
    id_col: str,
    nv_col: str,
    n_centroids: int,
    n_iters: int,
    dim: int,
    quant_scale: float = 1048576.0,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means coarse quantizer, trained with Lloyd iterations
    whose centroid updates are *bit-reproducible*: each member vector's
    elements are quantized to integers (floor(x*scale + 0.5) as BIGINT)
    and summed — integer addition is order-independent, so the per-dim
    sums are exact no matter how Spark partitions or batches the data —
    then the mean + renormalization run on the driver with the exact
    IEEE op sequence the DuckDB oracle uses. Only k centroids (k*dim
    doubles) ever live on the driver — the standard k-means driver
    state, same as Spark MLlib's KMeans.

    Each iteration is one scan: the Arrow kernel emits per-batch
    partial sums (k rows x (dim+1) longs), and a tiny groupBy merges
    them (map-side combine shape; sums stay < 2^63 up to ~10^12 rows).
    Init: the n_centroids rows with the smallest ids (deterministic).
    At 100 TB, train on a sample (df.sample) — assignment quality, not
    training exactness, is what matters at scale; here the full pass
    keeps the oracle exact."""
    import math

    first = normed.orderBy(F.col(id_col)).limit(n_centroids).collect()
    centroids = [(i, [float(x) for x in row[nv_col]]) for i, row in enumerate(first)]

    part_schema = "_cid int, _cnt long, " + ", ".join(
        f"_s{i} long" for i in range(dim)
    )
    for _ in range(n_iters):
        cmat = [vec for _, vec in centroids]
        nvc, scale = nv_col, quant_scale

        def _partials(it):
            import numpy as np
            import pandas as pd

            C = np.array(cmat, dtype=np.float64)
            for pdf in it:
                if len(pdf) == 0:
                    continue
                M = np.array([list(v) for v in pdf[nvc]], dtype=np.float64)
                acc = np.zeros((M.shape[0], C.shape[0]))
                for i in range(C.shape[1]):
                    acc += M[:, i][:, None] * C[:, i][None, :]
                cid = np.argmax(acc, axis=1)
                Q = np.floor(M * scale + 0.5).astype(np.int64)
                rows = []
                for c in np.unique(cid):
                    sel = Q[cid == c]
                    row = {"_cid": int(c), "_cnt": int(sel.shape[0])}
                    s = sel.sum(axis=0)
                    for i in range(s.shape[0]):
                        row[f"_s{i}"] = int(s[i])
                    rows.append(row)
                yield pd.DataFrame(rows)

        agg = (
            normed.select(nv_col)
            .mapInPandas(_partials, schema=part_schema)
            .groupBy("_cid")
            .agg(
                F.sum("_cnt").alias("_cnt"),
                *[F.sum(f"_s{i}").alias(f"_s{i}") for i in range(dim)],
            )
        )
        by_cid = {row["_cid"]: row for row in agg.collect()}
        nxt = []
        for cid, old in centroids:
            row = by_cid.get(cid)
            if row is None:  # empty cluster: keep previous centroid
                nxt.append((cid, old))
                continue
            cnt = float(row["_cnt"])
            mean = [float(row[f"_s{i}"]) / quant_scale / cnt for i in range(dim)]
            n2 = 0.0
            for m in mean:  # sequential fold == list_inner_product
                n2 += m * m
            r = math.sqrt(n2)
            nxt.append((cid, [m / r for m in mean]))
        centroids = nxt
    return centroids


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 8,
    n_iters: int = 2,
    n_probe: int = 2,
    dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: a spherical k-means coarse quantizer
    partitions the corpus into n_centroids inverted lists; each query
    probes its n_probe nearest centroids and exact-cosine re-ranks only
    those lists. The LSH twin (`ann_lsh_topk`) buckets by random
    hyperplanes; IVF buckets by *learned* cell structure — better
    recall per candidate at the cost of a training pass.

    Every stage is deterministic (quantized integer centroid sums,
    explicit tie-breaks), so unlike most ANN indexes this one is fully
    oracle-checkable: the DuckDB twin unrolls the same Lloyd iterations
    in SQL and must match cell-exactly.

    Scale shape: training aggregates k*(dim+1) longs per partition
    (map-side combine, tiny shuffle); final assignment is one scan; the
    candidate join shuffles corpus rows by cell id only after the probe
    side (queries x n_probe rows) is broadcast. Output:
    (query_id, neighbor_id, sim, rank)."""
    spark = corpus.sparkSession
    from pyspark.sql import Window

    # Materialized once: init, every Lloyd iteration, and the final
    # assignment all scan the normalized corpus — without this the
    # cast+normalize pipeline re-executes per pass. At 100 TB the same
    # role is played by writing the normalized vectors once (or
    # training on a sample, as the trainer docstring notes).
    normed = corpus.select(
        F.col(corpus_id).alias("_id"),
        normalized(as_double_array(vec_col)).alias("_nv"),
    ).localCheckpoint(eager=False)
    centroids = ivf_train_centroids(normed, "_id", "_nv", n_centroids, n_iters, dim)

    id_field = normed.schema["_id"].dataType.simpleString()
    assigned = normed.mapInPandas(
        _ivf_assign_batches("_nv", [vec for _, vec in centroids], carry=True),
        schema=f"_id {id_field}, _nv array<double>, _cid int",
    )

    cent_df = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids], "_cid int, _cvec array<double>"
    )
    qn = queries.select(
        F.col(query_id), normalized(as_double_array(vec_col)).alias("_qnv")
    )
    wp = Window.partitionBy(query_id).orderBy(
        F.col("_pd").desc(), F.col("_cid").asc()
    )
    probes = (
        qn.crossJoin(F.broadcast(cent_df))
        .withColumn("_pd", dot(F.col("_qnv"), F.col("_cvec")))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= n_probe)
        .select(query_id, "_qnv", "_cid")
    )

    scored = assigned.join(F.broadcast(probes), "_cid").select(
        query_id,
        F.col("_id").alias("neighbor_id"),
        dot(F.col("_qnv"), F.col("_nv")).alias("sim"),
    )
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_int8_stats(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector affine int8 quantization audit — the storage-
    compression step a 100 TB embedding store runs before indexing
    (4x smaller than float32, 8x smaller than float64).

    Per vector: scale = (max-min)/255, code_i = floor((x_i-min)/scale
    + 0.5) in 0..255, reconstruction x'_i = min + code_i*scale. Emits
    the quantizer params plus two exactness-friendly fidelity metrics:
    code_sum (integer — order-independent) and max_abs_err (max over
    bit-identical per-element doubles — order-independent), so the
    whole audit is cell-exact under any partitioning. Pure codegen
    scan: no shuffle, no Python.

    Staged projections on purpose: naming _v/qmin/qscale/_codes as
    columns (each non-cheap and referenced more than once, so
    CollapseProject keeps them) stops Catalyst from re-expanding the
    array subtrees at every use site — the inlined form compiles a
    codegen method an order of magnitude larger for identical
    results."""
    staged = corpus.select(
        F.col(corpus_id), as_double_array(vec_col).alias("_v")
    ).select(
        corpus_id,
        "_v",
        F.array_min("_v").alias("qmin"),
        F.array_max("_v").alias("qmax"),
    )
    staged = staged.withColumn(
        "qscale",
        F.when(F.col("qmax") == F.col("qmin"), F.lit(1.0)).otherwise(
            (F.col("qmax") - F.col("qmin")) / F.lit(255.0)
        ),
    ).withColumn(
        "_codes",
        F.transform(
            "_v",
            lambda x: F.floor((x - F.col("qmin")) / F.col("qscale") + 0.5),
        ),
    )
    errs = F.zip_with(
        F.col("_codes"),
        F.col("_v"),
        lambda c, x: F.abs(
            F.col("qmin") + c.cast("double") * F.col("qscale") - x
        ),
    )
    return staged.select(
        F.col(corpus_id),
        "qmin",
        "qmax",
        "qscale",
        F.aggregate(F.col("_codes"), F.lit(0).cast("bigint"), lambda acc, c: acc + c)
        .alias("code_sum"),
        F.array_max(errs).alias("max_abs_err"),
    )


def _neardup_pairs_bruteforce_oracle(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.2,
) -> DataFrame:
    """TEST ORACLE ONLY — O(n^2) crossJoin; registered to no query and
    never to be used in a pipeline. Exists solely so the test suite can
    check `embedding_neardup_pairs_vectorized` (the blocked kernel that
    IS the production path) and `ann_lsh_topk` against an independent
    exact computation on tiny inputs. Output: (id_a, id_b, sim)."""
    normed = corpus.select(
        F.col(corpus_id).alias("_id"),
        normalized(as_double_array(vec_col)).alias("_nv"),
    )
    a = normed.select(F.col("_id").alias("id_a"), F.col("_nv").alias("_va"))
    b = normed.select(F.col("_id").alias("id_b"), F.col("_nv").alias("_vb"))
    from kafka_streams_aggregate_spark.functions.vectors import dot

    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dot(F.col("_va"), F.col("_vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


# --------------------------------------------------------------------------
# Product quantization (round 9): the ANN index family a 100 TB embedding
# store actually fits in memory with — each vector compresses to M
# subspace codes (8 codes x 16 centroids = 8 bytes/vector vs 256 bytes
# of float32), and query scoring is an asymmetric-distance (ADC) table
# lookup, never touching raw corpus floats after the one-time encode.
#
# Codebooks are DATA-SAMPLED (k-means++-style init without Lloyd
# rounds): the 16 centroids of every subspace are the subvectors of 16
# fixed-id corpus vectors (vec_id = 7 + 30k), so the codebook tracks
# the embedding distribution at any scale factor — seeded N(0,1)
# literals were measured to collapse code diversity to 2-3 distinct
# codes per subspace on [-0.5, 0.5]-ranged data.
#
# Parity design: both engines derive the identical codebook from the
# data, every per-subspace squared distance is the same left-
# associative 8-term chain, argmin ties break (d, k)-lexicographically
# via row_number, and ADC sums are explicit element_at chains in
# subspace order (never a SUM() over rows, whose float order is
# engine-dependent). Completes the LSH / IVF / PQ triad.
# --------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_K = 16         # centroids per subspace
PQ_DIM = 64       # full embedding dimension (8 dims per subspace)
PQ_TRAIN_STEP = 30
PQ_TRAIN_BASE = 7  # training vec_ids: 7, 37, ..., 457 (exist at all SFs)


def pq_subdist_expr(m: int, idx_v, idx_t) -> str:
    """Squared L2 between subvector m of columns ``v`` and ``t`` as a
    left-associative term chain; ``idx_v``/``idx_t`` render 1-based
    element access for the target engine."""
    sub = PQ_DIM // PQ_M
    terms = []
    for i in range(sub):
        j = m * sub + i + 1
        e = f"({idx_v(j)} - {idx_t(j)})"
        terms.append(f"({e} * {e})")
    return "(" + " + ".join(terms) + ")"


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """PQ-ANN top-k. Output: (query_id, neighbor_id, dist2, rank).

    Pipeline: (1) broadcast the 16 training vectors against the corpus
    and compute all M x K subspace distances per vector in one
    codegen'd scan; (2) per (vector, subspace) argmin -> code (the
    persisted index at 100 TB — 8 small ints per vector); (3) queries
    build an M x K ADC table each (same pair scan, collected to
    k-ordered arrays); (4) scoring = M array lookups + adds per
    candidate. Approximate by construction, fully deterministic."""
    from pyspark.sql import Window

    idx_v = lambda j: f"element_at(v, {j})"  # noqa: E731
    idx_t = lambda j: f"element_at(t, {j})"  # noqa: E731
    d_cols = [
        f"{pq_subdist_expr(m, idx_v, idx_t)} AS d_{m}" for m in range(PQ_M)
    ]
    pick_d = (
        "CASE m "
        + " ".join(f"WHEN {m} THEN d_{m}" for m in range(PQ_M))
        + " END AS d"
    )

    train = corpus.filter(
        (F.col(corpus_id) % PQ_TRAIN_STEP == PQ_TRAIN_BASE)
        & (F.col(corpus_id) < PQ_TRAIN_BASE + PQ_TRAIN_STEP * PQ_K)
    ).select(
        ((F.col(corpus_id) - PQ_TRAIN_BASE) / PQ_TRAIN_STEP)
        .cast("int")
        .alias("cb_k"),
        _dim_checked(as_double_array(vec_col), PQ_DIM).alias("t"),
    )

    def pair_dists(side: DataFrame, id_alias: str) -> DataFrame:
        """(id, cb_k, m, d) for every vector x centroid x subspace."""
        pairs = side.crossJoin(F.broadcast(train)).selectExpr(
            id_alias, "cb_k", *d_cols
        )
        return pairs.select(
            id_alias,
            "cb_k",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
            *[F.col(f"d_{m}") for m in range(PQ_M)],
        ).selectExpr(id_alias, "cb_k", "m", pick_d)

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        _dim_checked(as_double_array(vec_col), PQ_DIM).alias("v"),
    )
    cd = pair_dists(c, "neighbor_id")
    w_code = Window.partitionBy("neighbor_id", "m").orderBy(
        F.col("d").asc(), F.col("cb_k").asc()
    )
    codes_long = (
        cd.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "m", F.col("cb_k").alias("code"))
    )
    codes = codes_long.groupBy("neighbor_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("code")))
            .cast("int")
            .alias(f"code_{m}")
            for m in range(PQ_M)
        ]
    )

    q = queries.select(
        F.col(query_id),
        _dim_checked(as_double_array(vec_col), PQ_DIM).alias("v"),
    )
    qd = pair_dists(q, query_id)
    qadc = (
        qd.groupBy(query_id)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("m", "cb_k", "d"))
            ).alias("s")
        )
        .selectExpr(
            query_id,
            *[
                f"transform(filter(s, x -> x.m = {m}), x -> x.d) AS a_{m}"
                for m in range(PQ_M)
            ],
        )
    )

    adc_sum = " + ".join(
        f"element_at(a_{m}, code_{m} + 1)" for m in range(PQ_M)
    )
    scored = (
        codes.crossJoin(F.broadcast(qadc))
        .filter(F.col("neighbor_id") != F.col(query_id))
        .selectExpr(query_id, "neighbor_id", f"({adc_sum}) AS dist2")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "dist2", "rank")
    )


def rrf_fuse(
    rankings: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 60,
    scale: int = 10**12,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    (Cormack/Clarke/Buettcher 2009): fused(d) = sum over input lists of
    1 / (k + rank_of_d). Feed it the union of any rankers' (query, doc,
    rank) triples — LSH and exact cosine, BM25 and embeddings — and it
    returns a consensus ranking without score calibration, since only
    RANKS enter the formula.

    Exact-integer surrogate (cross-engine rule: no transcendentals and
    no float accumulation in compared columns): each term is
    ``scale div (k + rank)`` — int64 floor division, identical in
    DuckDB as ``scale // (k + rank)`` — so the fused score is an exact
    integer and the fused ranking is reproducible cell-for-cell. With
    the default scale=1e12 the floor loses nothing until ~1e5 input
    lists collide on one (k+rank) value.

    Scale shape: one shuffle on (query, doc) for the combine, one
    window on query for the final rank — both on the keys a retrieval
    fan-out is already partitioned by; per-group state is one int64.

    Output: (query_col, doc_col, rrf_scaled, n_lists, fused_rank),
    fused_rank <= topk, ties broken by doc id (total order).
    """
    from pyspark.sql import Window

    # div, not /: double division would round where the oracle floors
    term = F.expr(f"CAST({scale} AS BIGINT) div ({k} + {rank_col})")
    fused = rankings.groupBy(query_col, doc_col).agg(
        F.sum(term).cast("bigint").alias("rrf_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_scaled").desc(), F.col(doc_col).asc()
    )
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("fused_rank") <= topk)
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the k most-similar corpus vectors whose LABEL differs —
    the negatives that actually move an embedding model, as opposed to
    random negatives a hash draw would give. Composition of the exact
    cosine kernel with a label anti-predicate; same scale shape as
    cosine_topk (broadcast query side, per-batch local top-k, vectors
    never shuffle) — with an ANN index in front, swap the scored
    candidate source and keep the window.

    Output: (query_id, query_label, neighbor_id, neighbor_label, sim,
    rank), rank <= k, ties broken by neighbor id.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col("query_id"),
        F.col(label_col).alias("query_label"),
        as_double_array("embedding").alias("_qv"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        as_double_array("embedding").alias("_cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("_qv"), F.col("_cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def gram_matrix_int(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    quant_scale: int = 1000,
) -> DataFrame:
    """Exact integer Gram matrix (X^T X) of the quantized embedding
    corpus — the sufficient statistic behind PCA/whitening/covariance,
    computed with the ONLY shape that survives 100 TB: each partition
    accumulates its own dim x dim int64 partial with one numpy GEMM
    over the Arrow batches, and the shuffle moves just dim*(dim+1)/2
    rows per partition (matrix partial aggregation — never row-level
    outer products through an exchange).

    Exactness: vectors quantize as floor(x * quant_scale) in int64
    (float32 -> float64 is exact; one multiply + floor, identical in
    SQL), so every Gram cell is an exact integer sum — independent of
    partitioning and batch order. Bound: n_vectors * (quant_scale *
    max|x|)^2 < 2^63.

    Output: (i, j, gram, n_vectors) for 0 <= i <= j < dim (the upper
    triangle; the matrix is symmetric).
    """

    def _partials(it):
        import numpy as _np
        import pandas as _pd

        g = _np.zeros((dim, dim), dtype=_np.int64)
        n = 0
        for pdf in it:
            if not len(pdf):
                continue
            m = _np.stack(
                [_np.asarray(v, dtype=_np.float64) for v in pdf[vec_col]]
            )
            if m.shape[1] != dim:
                raise ValueError(
                    f"gram_matrix_int: dim {m.shape[1]} != {dim}"
                )
            codes = _np.floor(m * float(quant_scale)).astype(_np.int64)
            g += codes.T @ codes
            n += len(pdf)
        iu, ju = _np.triu_indices(dim)
        yield _pd.DataFrame(
            {
                "i": iu.astype("int64"),
                "j": ju.astype("int64"),
                "partial": g[iu, ju],
                "n_part": _np.full(len(iu), n, dtype="int64"),
            }
        )

    partials = corpus.select(vec_col).mapInPandas(
        _partials, "i long, j long, partial long, n_part long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("partial").cast("bigint").alias("gram"),
        F.sum("n_part").cast("bigint").alias("n_vectors"),
    )


def diversified_topk(
    scored: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    group_col: str = "src",
    score_col: str = "score",
    per_group: int = 2,
    topk: int = 10,
) -> DataFrame:
    """Diversified top-k — the retrieval post-processor that stops one
    duplicate-heavy source from filling a result page: per query, keep
    at most ``per_group`` results from any one group (source, domain,
    dup-cluster), then take the overall top ``topk`` of the survivors.
    Composes with rrf_fuse / cosine_topk outputs; the group key is
    whatever diversity axis the caller joins on (the dedup family's
    cluster ids are the natural one).

    Two windows, both on the query key with total-order tiebreaks
    (score desc, doc asc), so the result is deterministic and
    cell-exact cross-engine. WindowGroupLimit pushes both rank filters
    into the sorts — no full materialization of per-query candidate
    lists at scale.

    Output: (query, group, doc, score, src_rank, final_rank).
    """
    from pyspark.sql import Window

    w_src = Window.partitionBy(query_col, group_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    capped = (
        scored.withColumn(
            "src_rank", F.row_number().over(w_src).cast("bigint")
        )
        .where(F.col("src_rank") <= per_group)
    )
    w_fin = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    return (
        capped.withColumn(
            "final_rank", F.row_number().over(w_fin).cast("bigint")
        )
        .where(F.col("final_rank") <= topk)
        .select(
            query_col, group_col, doc_col, score_col,
            "src_rank", "final_rank",
        )
    )


def int8_quant_recall(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    probe_mod: int = 50,
    ref_bits: int = 20,
) -> DataFrame:
    """INT8 embedding-quantization recall audit — the
    quantize-or-not decision gate for a vector store: per-vector
    symmetric int8 codes (code_i = floor(127 * x_i / max_abs)), and
    top-k cosine neighbors under the int8 ranking compared against
    the same ranking at ``ref_bits`` fixed-point precision (2^20 by
    default — quantization error ~1e-6 relative, i.e. float32-class;
    the reference surrogate keeps the WHOLE audit in exact integer /
    exactly-representable-double space, the repo's no-float-sum
    rule).

    Exactness chain: max_abs and the division are correctly-rounded
    IEEE ops, floor() lands identically cross-engine, so the codes
    are bit-identical; integer dot products and norms stay below 2^53
    (64 dims x 127^2 / x 2^40-per-term bound), so every cosine is
    computed from EXACTLY representable integers with one fixed
    float tail — orderings match DuckDB bit-for-bit, ties broken by
    vec_id.

    Probes = ``id % probe_mod = 0`` against the full corpus
    (brute-force audit shape — the production serving path is the
    IVF/PQ/LSH family; this operator decides the code width those
    indexes store). Output per probe: (probe_id, k, n_hit,
    recall_ppm)."""
    dims_guard = F.expr(
        f"array_max(transform(CAST({vec_col} AS array<double>),"
        " x -> abs(x)))"
    )
    coded = (
        emb.select(
            F.col(id_col).alias("vid"),
            F.expr(f"CAST({vec_col} AS array<double>)").alias("e"),
            dims_guard.alias("s"),
        )
        .where(F.col("s") > 0)
        .select(
            "vid",
            F.expr(
                "transform(e, x -> CAST(floor(127 * x / s) AS BIGINT))"
            ).alias("c8"),
            F.expr(
                f"transform(e, x -> CAST(floor({1 << ref_bits} * x / s)"
                " AS BIGINT))"
            ).alias("cr"),
        )
        .select(
            "vid",
            "c8",
            "cr",
            F.expr(
                "aggregate(transform(c8, x -> x * x), 0L, (a, v) -> a + v)"
            ).alias("n8"),
            F.expr(
                "aggregate(transform(cr, x -> x * x), 0L, (a, v) -> a + v)"
            ).alias("nr"),
        )
        .localCheckpoint(eager=True)  # probe + candidate legs
    )
    probes = coded.where(F.col("vid") % probe_mod == 0).select(
        F.col("vid").alias("pid"),
        F.col("c8").alias("pc8"),
        F.col("cr").alias("pcr"),
        F.col("n8").alias("pn8"),
        F.col("nr").alias("pnr"),
    )
    pairs = probes.join(
        coded, F.col("vid") != F.col("pid")
    ).select(
        "pid",
        "vid",
        F.expr(
            "CAST(aggregate(zip_with(pc8, c8, (x, y) -> x * y), 0L,"
            " (a, v) -> a + v) AS DOUBLE)"
            " / (sqrt(CAST(pn8 AS DOUBLE)) * sqrt(CAST(n8 AS DOUBLE)))"
        ).alias("cos8"),
        F.expr(
            "CAST(aggregate(zip_with(pcr, cr, (x, y) -> x * y), 0L,"
            " (a, v) -> a + v) AS DOUBLE)"
            " / (sqrt(CAST(pnr AS DOUBLE)) * sqrt(CAST(nr AS DOUBLE)))"
        ).alias("cosr"),
    ).localCheckpoint(eager=True)  # feeds both rankings
    w8 = Window.partitionBy("pid").orderBy(
        F.col("cos8").desc(), F.col("vid")
    )
    wr = Window.partitionBy("pid").orderBy(
        F.col("cosr").desc(), F.col("vid")
    )
    top8 = (
        pairs.withColumn("_r", F.row_number().over(w8))
        .where(F.col("_r") <= k)
        .select("pid", "vid")
    )
    topr = (
        pairs.withColumn("_r", F.row_number().over(wr))
        .where(F.col("_r") <= k)
        .select("pid", "vid")
    )
    hits = top8.join(topr, ["pid", "vid"], "left_semi")
    return (
        topr.groupBy(F.col("pid").alias("probe_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nk"))
        .join(
            hits.groupBy(F.col("pid").alias("probe_id")).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_hit")
            ),
            "probe_id",
            "left",
        )
        .select(
            "probe_id",
            F.col("_nk").alias("k"),
            F.coalesce(F.col("n_hit"), F.lit(0))
            .cast("bigint")
            .alias("n_hit"),
            F.expr(
                "CAST((1000000 * COALESCE(n_hit, 0)) div _nk AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


def kmeans_int8_step(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """One exact Lloyd (k-means) iteration in int8 code space — the
    clustering primitive behind IVF cell training, made fully
    oracle-able: float k-means is seed- and order-dependent, but ONE
    assignment+update step over deterministic seeds is pure integer
    arithmetic end to end.

    Codes are the int8_quant_recall quantization (floor(127*x/max_abs)
    — bit-identical IEEE ops). Seeds = the ``k`` vectors ranked first
    by (md5(vid), vid) — data-independent, reproducible. Assignment
    uses the norm identity keeping everything integer:

        ||x - c||^2 = n8_x + n8_c - 2 * dot(x, c)

    ties broken by smallest centroid_id. The emitted row per centroid
    carries the Lloyd UPDATE evidence: member count, exact integer
    SSE, and the dim-0 update numerator (sum of members' first code —
    the new centroid mean is sum/count, a rational; the numerator is
    the exact witness). Scale shape: k is a broadcast (the classic
    k-means join); codes stream once. Output: (centroid_id, seed_vid,
    n_assigned, sse, sum_d0)."""
    coded = (
        emb.select(
            F.col(id_col).alias("vid"),
            F.expr(f"CAST({vec_col} AS array<double>)").alias("e"),
            F.expr(
                f"array_max(transform(CAST({vec_col} AS array<double>),"
                " x -> abs(x)))"
            ).alias("s"),
        )
        .where(F.col("s") > 0)
        .select(
            "vid",
            F.expr(
                "transform(e, x -> CAST(floor(127 * x / s) AS BIGINT))"
            ).alias("c8"),
        )
        .select(
            "vid",
            "c8",
            F.expr(
                "aggregate(transform(c8, x -> x * x), 0L, (a, v) -> a + v)"
            ).alias("n8"),
        )
        .localCheckpoint(eager=True)  # feeds seeds + assignment
    )
    cent = (
        coded.orderBy(
            F.md5(F.col("vid").cast("string")), F.col("vid")
        )
        .limit(k)
        .select(
            (
                F.row_number().over(
                    Window.orderBy(
                        F.md5(F.col("vid").cast("string")), F.col("vid")
                    )
                )
                - 1
            )
            .cast("bigint")
            .alias("centroid_id"),
            F.col("vid").alias("seed_vid"),
            F.col("c8").alias("cc8"),
            F.col("n8").alias("cn8"),
        )
    )
    pairs = coded.crossJoin(F.broadcast(cent)).select(
        "vid",
        "c8",
        "centroid_id",
        "seed_vid",
        F.expr(
            "n8 + cn8 - 2 * aggregate(zip_with(c8, cc8, (x, y) -> x * y),"
            " 0L, (a, v) -> a + v)"
        )
        .cast("bigint")
        .alias("dist"),
    )
    w_pick = Window.partitionBy("vid").orderBy(
        F.col("dist").asc(), F.col("centroid_id").asc()
    )
    assigned = pairs.withColumn(
        "_r", F.row_number().over(w_pick)
    ).where(F.col("_r") == 1)
    return (
        assigned.groupBy("centroid_id", "seed_vid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
            F.sum("dist").cast("bigint").alias("sse"),
            F.sum(F.expr("element_at(c8, 1)")).cast("bigint").alias(
                "sum_d0"
            ),
        )
        .select("centroid_id", "seed_vid", "n_assigned", "sse", "sum_d0")
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    threshold: float = 0.3,
) -> DataFrame:
    """SemDeDup-style semantic deduplication rollup — the
    EMBEDDING-side sibling of ``dedup_aware_packing``'s keep-one:
    cluster the corpus cheaply, compare only within clusters, drop all
    but one of each semantically-near group (Abbas et al.'s published
    SemDeDup recipe uses k-means cells; the scale path here is the
    repo's seeded-hyperplane LSH code — same sublinear
    candidates-within-cells shape, and the cell assignment is one
    codegen'd sign-code expression instead of a trained model).

    Semantics: a vector is DROPPED iff some SAME-BUCKET vector with a
    smaller id has cosine >= ``threshold`` (keep-lowest-id, the
    dedup_cluster_profile convention — deterministic under any
    partitioning, no iterative union-find: SemDeDup itself uses
    one-shot within-cluster pruning, not transitive closure).

    All comparisons are the bit-exact sequential-fold cosine
    (functions/vectors.py) on DOUBLE-cast arrays; buckets come from
    seeded Python hyperplanes embedded as literals, so the whole
    operator is cell-exact oracle-able (the _ann_lsh_oracle trick).

    Output per label: (label, n_docs, n_dropped, n_kept,
    drop_ppm = (1e6 * n_dropped) div n_docs).

    100 TB shape: the bucket self-join touches ~sum(bucket^2) pairs,
    not corpus^2 — n_planes is the knob (each plane halves expected
    bucket size); the id<id ordering keeps every unordered pair
    scored once. Candidate side first in the join per the Catalyst
    join-order note."""
    planes = _hyperplanes(n_planes, dim, seed)
    base = emb.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(label_col).alias("label"),
        as_double_array(F.col(vec_col)).alias("_v"),
    )
    # Norms are computed ONCE PER ROW before the pair join: HOF folds
    # are interpreted (not whole-stage codegen), so the in-pair cosine
    # pays one dot fold per pair instead of three (measured ~3x on the
    # bucket join at sf0.1). Same single-sqrt formula, same values.
    coded = base.withColumn(
        "_code", lsh_bucket_code(_dim_checked(F.col("_v"), dim), planes)
    ).withColumn("_n2", dot(F.col("_v"), F.col("_v")))
    a = coded.select(
        F.col("_code").alias("_ca"),
        F.col("_id").alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_n2").alias("_na"),
    )
    b = coded.select(
        F.col("_code").alias("_cb"),
        F.col("_id").alias("_idb"),
        F.col("_v").alias("_vb"),
        F.col("_n2").alias("_nb"),
    )
    dropped = (
        a.join(b, (F.col("_ca") == F.col("_cb")) & (F.col("_ida") < F.col("_idb")))
        .where(
            dot(F.col("_va"), F.col("_vb"))
            / F.sqrt(F.col("_na") * F.col("_nb"))
            >= F.lit(float(threshold))
        )
        .select(F.col("_idb").alias("_id"))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return (
        base.join(dropped, "_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("_d"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .select(
            "label",
            "n_docs",
            "n_dropped",
            (F.col("n_docs") - F.col("n_dropped"))
            .cast("bigint")
            .alias("n_kept"),
            F.expr(
                "CAST((1000000 * n_dropped) div n_docs AS BIGINT)"
            ).alias("drop_ppm"),
        )
    )
