"""Unit tests for the LLM-data operators on tiny hand-built corpora:
known duplicate structures, known neighbors, stubbed multimodal decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from kafka_streams_aggregate_spark.operators.multimodal import (
    documents_as_assets,
    extract_features,
)
from kafka_streams_aggregate_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    _neardup_pairs_bruteforce_oracle,
)
from kafka_streams_aggregate_spark.operators.text import (
    dup_ngram_ratio,
    hash_split,
    lang_id,
    ngram_topk,
    pack_sequences,
    token_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(df, "doc_id", "text").collect()}
    assert out == {1: 2, 3: 1}


def test_ngram_jaccard_identical_docs(spark):
    df = _docs(spark, [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5"), (3, "q r s t u")])
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_ngram_jaccard_partial_overlap(spark):
    # doc1 shingles: {a b c, b c d}; doc2: {a b c, b c x} -> jaccard 1/3
    df = _docs(spark, [(1, "a b c d"), (2, "a b c x")])
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.1).collect()
    assert len(pairs) == 1
    assert pairs[0]["jaccard"] == pytest.approx(1 / 3)


def test_minhash_lsh_finds_identical_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(spark, [(1, base), (2, base), (3, "one two three four five six")])
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.9).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_simhash_identical_docs_zero_hamming(spark):
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    pairs = simhash_pairs(df, "doc_id", "text", max_hamming=0).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_connected_components_vs_union_find(spark):
    """Label propagation must agree with a plain-Python union-find on a
    graph with chains, a cycle, and singletons."""
    from kafka_streams_aggregate_spark.operators.dedup import connected_components

    edge_list = [(1, 2), (2, 3), (5, 6), (7, 8), (8, 9), (9, 7), (3, 4)]
    all_ids = list(range(1, 12))  # 10, 11 are singletons
    pairs = spark.createDataFrame(edge_list, "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in all_ids], "id long")

    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        parent[find(a)] = find(b)
    expected = {}
    for i in all_ids:
        root = find(i)
        expected.setdefault(root, []).append(i)
    expected_components = {min(v): sorted(v) for v in expected.values()}

    got = {}
    for r in connected_components(pairs, ids).collect():
        got.setdefault(r["component"], []).append(r["id"])
    got = {k: sorted(v) for k, v in got.items()}
    assert got == expected_components


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_orders_by_similarity(spark):
    corpus = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.1]),   # closest to query 0
            (2, [0.0, 1.0]),   # orthogonal
            (3, [-1.0, 0.0]),  # opposite
        ],
    )
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(corpus, queries, k=3).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["sim"] == pytest.approx(1 / (1.01) ** 0.5, rel=1e-9)


def test_embedding_neardup_threshold(spark):
    corpus = _vecs(spark, [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])])
    pairs = _neardup_pairs_bruteforce_oracle(corpus, threshold=0.9).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]


def test_ann_lsh_self_bucket_recall(spark):
    # Identical vectors always share every hyperplane bucket.
    corpus = _vecs(spark, [(0, [1.0] * 64), (1, [1.0] * 64), (2, [-1.0] * 64)])
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_lsh_topk(corpus, queries, k=5, n_planes=8).collect()
    assert [r["neighbor_id"] for r in out] == [1]  # 2 lands in the opposite bucket


def test_ann_lsh_dim_mismatch_fails_loudly(spark):
    """A corpus whose embedding dimension differs from the configured
    hyperplane dim must raise, not silently hash every vector into
    bucket 0 (zip_with null-pads, the dot goes null, sign bit -> 0)."""
    import pytest

    from kafka_streams_aggregate_spark.operators.similarity import (
        ann_lsh_multiprobe_topk,
    )

    corpus = _vecs(spark, [(0, [1.0] * 16), (1, [1.0] * 16)])
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(Exception, match="hyperplane dim"):
        ann_lsh_topk(corpus, queries, k=5, n_planes=8, dim=64).collect()
    with pytest.raises(Exception, match="hyperplane dim"):
        ann_lsh_multiprobe_topk(corpus, queries, k=5, n_planes=8, dim=64).collect()
    # And the matched dim still works.
    ok = ann_lsh_topk(corpus, queries, k=5, n_planes=8, dim=16).collect()
    assert [r["neighbor_id"] for r in ok] == [1]


def test_ann_results_subset_of_exact_with_same_sims(spark):
    """Every ANN hit must exist in the exact brute-force scoring with a
    bit-identical sim (same formula, same fold order) — ANN only
    *restricts* the candidate set, it never changes the math."""
    from kafka_streams_aggregate_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_topk,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact_sims = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk(emb, queries, k=500).collect()
    }
    ann = ann_lsh_topk(emb, queries, k=10, n_planes=8).collect()
    assert ann, "ANN returned nothing"
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact_sims
        assert exact_sims[key] == r["sim"]  # exact float equality


def test_dup_ngram_ratio_counts(spark):
    # "a b a b a" bigrams: [a b, b a, a b, b a] -> all 4 duplicated.
    # "x y z" bigrams: [x y, y z] -> none duplicated.
    # "solo" -> no bigrams -> absent from output.
    df = _docs(spark, [(1, "a b a b a"), (2, "x y z"), (3, "solo")])
    out = {r["doc_id"]: r for r in dup_ngram_ratio(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 4 and out[1]["n_dup_positions"] == 4
    assert out[1]["dup_ratio"] == 1.0
    assert out[2]["n_bigrams"] == 2 and out[2]["dup_ratio"] == 0.0


def test_ngram_topk_order_and_tiebreak(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a b c d")])
    rows = ngram_topk(df, "doc_id", "text", k=3).collect()
    # "a b" occurs 3x across 2 docs; then ties at 1 broken by gram asc.
    assert (rows[0]["gram"], rows[0]["cnt"], rows[0]["doc_freq"]) == ("a b", 3, 2)
    assert [r["gram"] for r in rows[1:]] == sorted(r["gram"] for r in rows[1:])


def test_hash_split_deterministic_and_total(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = df.select(hash_split("doc_id").alias("split"))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # ~5.1% expected per held-out split; loose bounds against md5 variance
    assert 40 <= counts.get("val", 0) <= 170
    assert 40 <= counts.get("test", 0) <= 170
    # determinism: same ids -> same assignment
    again = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_pack_sequences_respects_budget_walk(spark):
    rows = [(i, "w " * 99 + "w", "s0") for i in range(10)]  # 100 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["bin_id"]: r for r in pack_sequences(df, "doc_id", "text", "source", token_budget=250).collect()}
    # exclusive cumsum: docs 0,1,2 -> bin 0 (cum 0,100,200); 3,4 -> bin 1 (300,400); ...
    assert out[0]["n_docs"] == 3 and out[0]["first_doc"] == 0 and out[0]["last_doc"] == 2
    assert out[1]["n_docs"] == 2 and out[1]["total_tokens"] == 200
    # every bin's exclusive start is below budget multiples: total docs conserved
    assert sum(r["n_docs"] for r in out.values()) == 10


def test_token_stats_values(spark):
    df = _docs(spark, [(1, "aa bb aa")])
    r = token_stats(df, "doc_id", "text").collect()[0]
    assert (r["n_tokens"], r["n_chars"]) == (3, 8)
    assert r["avg_token_len"] == pytest.approx(2.0)
    assert r["distinct_ratio"] == pytest.approx(2 / 3)


def test_lang_id_argmax_and_und(spark):
    df = _docs(spark, [(1, "the cat and the dog"), (2, "zzz qqq www")])
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "und"}


def test_sentence_split_udtf(spark):
    """Python UDTF surface: one row in, many numbered rows out."""
    from pyspark.sql.functions import lit

    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        make_sentence_split_udtf,
    )

    SentenceSplit = make_sentence_split_udtf()
    rows = SentenceSplit(lit("one two. three.  . four five six")).collect()
    got = [(r["sent_idx"], r["sentence"], r["n_words"]) for r in rows]
    assert got == [(0, "one two", 2), (1, "three", 1), (3, "four five six", 3)]


def test_multimodal_feature_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "src", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    feats = extract_features(documents_as_assets(docs)).collect()
    assert len(feats) == 1
    r = feats[0]
    assert r["n_bytes"] == 11
    import hashlib

    digest = hashlib.md5(b"hello world").hexdigest()
    assert r["digest"] == digest
    assert r["width"] == 64 + int(digest[:4], 16) % 1856
    assert r["height"] == 64 + int(digest[4:8], 16) % 1016


def test_multimodal_resize_dimensions(spark):
    from kafka_streams_aggregate_spark.operators.multimodal import resize_images

    feats = spark.createDataFrame(
        [(1, 640, 480), (2, 100, 50), (3, 512, 1024)],
        "asset_id long, width int, height int",
    )
    out = {
        r["asset_id"]: (r["resized_width"], r["resized_height"])
        for r in resize_images(feats, max_side=256).collect()
    }
    assert out[1] == (256, 192)      # scaled by 640->256
    assert out[2] == (100, 50)       # under cap: untouched
    assert out[3] == (128, 256)      # scaled by 1024->256


def test_multimodal_frame_sampling_deterministic(spark):
    import hashlib

    from kafka_streams_aggregate_spark.operators.multimodal import (
        documents_as_assets,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(7, "some video-ish payload", "en", "s", 22)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    frames = sample_frames(documents_as_assets(docs), max_frames=5).collect()
    payload = b"some video-ish payload"
    digest = hashlib.md5(payload).hexdigest()
    expected_n = 1 + int(digest[:2], 16) % 5
    assert len(frames) == expected_n
    assert [f["frame_idx"] for f in sorted(frames, key=lambda f: f["frame_idx"])] == list(
        range(expected_n)
    )
    assert frames[0]["frame_digest"] == hashlib.md5(payload + b":0").hexdigest()


def test_multimodal_real_decoder_is_stubbed(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(NotImplementedError):
        extract_features(documents_as_assets(docs), use_real_decoder=True)


def test_real_bmp_wav_decode_foreign_files(spark):
    """The BMP/WAV decoder must parse files it did NOT synthesize —
    hand-crafted here byte-by-byte from the public format specs,
    including a top-down BMP (negative height), a WAV with the chunk
    order reversed plus an extra LIST chunk and odd-size padding, and
    a non-media payload (NULL features, not a crash)."""
    import struct

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_media_features,
    )

    # 3x2 top-down 32bpp BMP (height stored negative)
    stride = 3 * 4
    pixels = b"\xaa" * (stride * 2)
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 32, 0, len(pixels), 0, 0, 0, 0)
        + pixels
    )
    # WAV with LIST chunk first, odd-sized data chunk (pad byte), fmt last
    data = b"\x01\x02\x03"  # 3 bytes -> odd, 1 sample of 16-bit stereo? no:
    # use mono 16-bit: block_align 2 -> 1 full sample (3//2)
    fmt = struct.pack("<HHIIHH", 1, 1, 22050, 44100, 2, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sI", b"LIST", 4) + b"INFO"
        + struct.pack("<4sI", b"data", len(data)) + data + b"\x00"  # pad
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
    )
    assets = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav)), (3, bytearray(b"not media"))],
        "asset_id long, payload binary",
    )
    rows = {r["asset_id"]: r for r in decode_media_features(assets).collect()}
    assert rows[1]["media_type"] == "image/bmp"
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (3, 2, 4)
    assert rows[2]["media_type"] == "audio/wav"
    assert rows[2]["sample_rate"] == 22050
    assert rows[2]["channels"] == 1
    assert rows[2]["n_samples"] == 1
    assert rows[2]["duration_ms"] == 0
    assert rows[3]["media_type"] == "unknown"
    assert rows[3]["width"] is None and rows[3]["sample_rate"] is None
    assert rows[3]["n_bytes"] == 9


def test_synthesized_media_roundtrip_matches_params(spark):
    """synthesize -> decode round-trip recovers exactly the arithmetic
    parameters (the same contract the DuckDB oracle checks at sf0.01)."""
    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_media_features,
        synthesize_media_assets,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {
        r["asset_id"]: r
        for r in decode_media_features(synthesize_media_assets(docs)).collect()
    }
    for i in range(20):
        r = rows[i]
        if i % 2 == 0:
            assert r["media_type"] == "image/bmp"
            assert r["width"] == 1 + i % 32
            assert r["height"] == 1 + (7 * i) % 24
            assert r["channels"] == 3
            assert r["sample_rate"] is None
        else:
            assert r["media_type"] == "audio/wav"
            assert r["channels"] == 1 + (i // 2) % 2
            assert r["sample_rate"] == (8000, 16000, 44100)[i % 3]
            assert r["n_samples"] == 50 + i % 200
            assert r["duration_ms"] == (50 + i % 200) * 1000 // r["sample_rate"]


def test_md5_base_hash_bit_identical_to_duckdb(spark):
    # The md5 hash-family parity contract behind every *_md5 companion:
    # Spark conv(substr(md5,1,K),16,10) == DuckDB ('0x'||substr)::BIGINT.
    import duckdb

    from kafka_streams_aggregate_spark.operators.dedup import _base_hash31

    words = ["hello world", "a", "", "Zur Beispiel 42", "ßpark"]
    got = {
        r["shingle"]: r["h"]
        for r in spark.createDataFrame([(w,) for w in words], "shingle string")
        .select("shingle", _base_hash31("md5").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for w in words:
        (exp,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT % 2147483648", [w]
        ).fetchone()
        assert got[w] == exp, (w, got[w], exp)


def test_multiprobe_lsh_recall_dominates_single_probe(spark):
    # Deterministic on the fixed testdata: probing the hamming-1 buckets
    # can only ADD candidates, so multiprobe recall vs the exact top-10
    # must be >= single-probe recall for every query.
    from kafka_streams_aggregate_spark.registry import load_all

    sf = "/root/testdata/sf0.01"
    qs = load_all()

    def topk_ids(name):
        out = {}
        for r in qs[name].spark(spark, sf).collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_ids("q_sim_cosine_topk")
    single = topk_ids("q_sim_ann_lsh")
    multi = topk_ids("q_sim_ann_lsh_multiprobe")
    for qid, truth in exact.items():
        r1 = len(single.get(qid, set()) & truth)
        r2 = len(multi.get(qid, set()) & truth)
        assert r2 >= r1, (qid, r1, r2)


def test_prefix_join_finds_every_pair_brute_force_finds(spark):
    # Prefix filtering must be EXACT at the threshold: every pair the
    # uncapped brute-force Jaccard join reports at t>=0.7 must appear.
    from kafka_streams_aggregate_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from kafka_streams_aggregate_spark.registry import load_all
    from kafka_streams_aggregate_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", sf)
    brute = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.7, max_doc_freq=None
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"])
        for r in load_all()["q_setsim_prefix_join"].spark(spark, sf).collect()
    }
    assert brute == pref, (
        f"missed: {sorted(brute - pref)[:5]} extra: {sorted(pref - brute)[:5]}"
    )


def test_png_decode_rejects_corrupt_crc(spark):
    # Flip one pixel byte inside IDAT without fixing the chunk CRC: a
    # real decoder must refuse (media_type stays 'unknown') — proving
    # the CRC verification is live, not decorative.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_png_jpeg_features,
        synthesize_png_jpeg_assets,
    )

    docs = spark.createDataFrame([(2,), (4,)], "doc_id long")
    assets = synthesize_png_jpeg_assets(docs)

    @F.udf("binary")
    def corrupt(p):
        b = bytearray(p)
        b[60] ^= 0xFF  # somewhere inside IDAT
        return bytes(b)

    bad = assets.withColumn("payload", corrupt("payload"))
    rows = decode_png_jpeg_features(bad).collect()
    assert all(r["media_type"] == "unknown" for r in rows), rows
    # and the pristine payloads decode fully
    good = decode_png_jpeg_features(assets).collect()
    assert all(
        r["media_type"] == "image/png" and r["px_checksum"] is not None
        for r in good
    ), good


def test_decoders_survive_truncated_length_fields(spark):
    # A corrupt chunk-length field used to drive struct.unpack_from past
    # the buffer and kill the Spark task; decoders must yield an
    # 'unknown' row instead, for every container family.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_avi_features,
        decode_media_features,
        decode_png_jpeg_features,
        resize_png_thumbnails,
        synthesize_avi_assets,
        synthesize_media_assets,
        synthesize_png_jpeg_assets,
    )

    docs = spark.createDataFrame([(2,), (3,)], "doc_id long")

    @F.udf("binary")
    def smash_len(p):
        b = bytearray(p)
        # overwrite 4 bytes mid-header with a huge big/little-endian
        # length so any unguarded unpack_from overruns the buffer
        b[16:20] = b"\x0f\xff\xff\xff"
        return bytes(b)

    for synth, decode in (
        (synthesize_png_jpeg_assets, decode_png_jpeg_features),
        (synthesize_png_jpeg_assets, resize_png_thumbnails),
        (synthesize_media_assets, decode_media_features),
        (synthesize_avi_assets, decode_avi_features),
    ):
        bad = synth(docs).withColumn("payload", smash_len("payload"))
        rows = decode(bad).collect()  # must not raise
        assert len(rows) == 2


def test_jpeg_marker_walk_skips_standalone_markers(spark):
    # TEM (0x01) and RST0-7 (0xD0-0xD7) carry NO length segment; the
    # walk used to read their next two bytes as a length and misparse
    # any real-world JPEG containing them before SOF.
    import struct

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_png_jpeg_features,
    )

    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 9, 8, 16, 24, 3) \
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    payload = (
        b"\xff\xd8"          # SOI
        + b"\xff\x01"        # TEM: standalone, no length
        + b"\xff\xd0"        # RST0: standalone, no length
        + sof
        + b"\xff\xd9"        # EOI
    )
    assets = spark.createDataFrame(
        [(1, payload)], "asset_id long, payload binary"
    )
    [row] = decode_png_jpeg_features(assets).collect()
    assert row["media_type"] == "image/jpeg", row
    assert (row["width"], row["height"]) == (24, 16), row


def _jpeg_expected(doc_id):
    # independent fold of the synthesis parameter map (kept deliberately
    # separate from the operator code)
    wb, hb = 1 + doc_id % 5, 1 + (3 * doc_id) % 4
    ncomp = 1 + 2 * (doc_id % 2)
    ps = pw = pw_dc_only = 0
    for k in range(ncomp):
        for by in range(hb):
            for bx in range(wb):
                d = (doc_id + 3 * bx + 5 * by + 7 * k) % 64 - 32
                a = (2 * doc_id + bx + by + k) % 9 - 4
                b = (doc_id + 2 * bx + by + 2 * k) % 9 - 4
                c = (doc_id + bx + 2 * by + 3 * k) % 7 - 3
                ps += 64 * (128 + d)
                pw += (128 + d) * 21904 + (a + b) * 1184 + c * 64
                pw_dc_only += (128 + d) * 21904
    return ps, pw, pw_dc_only


def test_jpeg_entropy_decode_roundtrip_exact(spark):
    # Full Huffman entropy round-trip: synthesized baseline JPEGs must
    # decode to the EXACT analytic checksums — and the weighted sum
    # must differ from a DC-only reconstruction for some doc, proving
    # the check is sensitive to the AC coefficients.
    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_baseline_jpeg_assets,
    )

    ids = [0, 1, 2, 3, 4, 5, 6, 7, 97, 254]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {
        r["asset_id"]: r
        for r in decode_jpeg_pixels(
            synthesize_baseline_jpeg_assets(docs)
        ).collect()
    }
    ac_matters = False
    for i in ids:
        ps, pw, pw_dc = _jpeg_expected(i)
        r = rows[i]
        assert r["media_type"] == "image/jpeg", r
        assert (r["px_sum"], r["px_wsum"]) == (ps, pw), (i, r, ps, pw)
        if pw != pw_dc:
            ac_matters = True
    assert ac_matters, "all test ids have zero AC — checksum is DC-blind"


def test_jpeg_entropy_decode_detects_scan_corruption(spark):
    # Flip one byte inside the entropy-coded scan: the decode must NOT
    # reproduce the pristine checksums (either a decode error ->
    # 'unknown', or different reconstructed samples) — proving the
    # checksum covers the entropy data, not just the headers.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_baseline_jpeg_assets,
    )

    docs = spark.createDataFrame([(9,), (12,)], "doc_id long")
    assets = synthesize_baseline_jpeg_assets(docs)
    pristine = {
        r["asset_id"]: r["px_wsum"]
        for r in decode_jpeg_pixels(assets).collect()
    }

    @F.udf("binary")
    def corrupt(p):
        b = bytearray(p)
        b[-4] ^= 0x10  # inside the scan, just before the EOI marker
        return bytes(b)

    bad = assets.withColumn("payload", corrupt("payload"))
    for r in decode_jpeg_pixels(bad).collect():
        assert (
            r["media_type"] == "unknown"
            or r["px_wsum"] != pristine[r["asset_id"]]
        ), r


def test_jpeg_decoder_rejects_progressive(spark):
    # SOF2 (progressive) is documented out of scope: the decoder must
    # yield an 'unknown' row, not a wrong decode or a task failure.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synthesize_baseline_jpeg_assets,
    )

    docs = spark.createDataFrame([(3,)], "doc_id long")
    assets = synthesize_baseline_jpeg_assets(docs)

    @F.udf("binary")
    def to_progressive(p):
        return bytes(p).replace(b"\xff\xc0", b"\xff\xc2", 1)

    bad = assets.withColumn("payload", to_progressive("payload"))
    [row] = decode_jpeg_pixels(bad).collect()
    assert row["media_type"] == "unknown", row


def test_avi_frame_decode_unflips_rows_and_orders_frames(spark):
    # The weighted checksum must distinguish (a) raw-storage-order
    # summing from the top-down reconstruction and (b) frame order.
    # Swapping the two movi frame payloads of a 2-frame AVI keeps
    # px_sum identical but MUST change px_wsum.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_avi_frames,
        synthesize_avi_video_assets,
    )

    docs = spark.createDataFrame([(5,)], "doc_id long")  # frames = 2
    assets = synthesize_avi_video_assets(docs)
    [base] = decode_avi_frames(assets).collect()
    assert base["media_type"] == "video/avi" and base["n_frames"] == 2

    # independent expectation from the synthesis parameter map
    w, h, frames = 8 * (1 + 5 % 3), 8 * (1 + (5 // 3) % 3), 2 + 5 % 5
    exp_sum = exp_w = 0
    for f in range(frames):
        for y in range(h):
            for x in range(3 * w):
                v = (5 + x + y + 7 * f) % 256
                exp_sum += v
                exp_w += v * (y + 1) * (f + 1)
    assert (base["px_sum"], base["px_wsum"]) == (exp_sum, exp_w), base

    @F.udf("binary")
    def swap_frames(p):
        import struct

        b = bytes(p)
        pos, spans = 12, []
        stack = [(12, len(b))]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                cid, csize = struct.unpack_from("<4sI", b, pos)
                body = pos + 8
                if cid == b"LIST":
                    stack.append((body + 4, body + csize))
                elif cid == b"00db":
                    spans.append((body, body + csize))
                pos = body + csize + (csize & 1)
        (a0, a1), (b0, b1) = sorted(spans)
        assert a1 - a0 == b1 - b0
        return b[:a0] + b[b0:b1] + b[a1:b0] + b[a0:a1] + b[b1:]

    [swapped] = decode_avi_frames(
        assets.withColumn("payload", swap_frames("payload"))
    ).collect()
    assert swapped["px_sum"] == base["px_sum"], swapped
    assert swapped["px_wsum"] != base["px_wsum"], swapped


def test_avi_frame_decode_rejects_truncated_frame(spark):
    # A frame chunk whose size disagrees with stride*h must fail
    # closed as 'unknown', not produce a partial checksum.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_avi_frames,
        synthesize_avi_video_assets,
    )

    docs = spark.createDataFrame([(3,)], "doc_id long")
    assets = synthesize_avi_video_assets(docs)

    @F.udf("binary")
    def truncate_frame(p):
        import struct

        b = bytearray(p)
        pos = b.find(b"00db")
        (size,) = struct.unpack_from("<I", b, pos + 4)
        struct.pack_into("<I", b, pos + 4, size - 3)  # lie about length
        return bytes(b)

    [row] = decode_avi_frames(
        assets.withColumn("payload", truncate_frame("payload"))
    ).collect()
    assert row["media_type"] == "unknown", row


def test_mjpeg_frame_decode_weights_frames_and_fails_closed(spark):
    # Swapping the two JPEG movi frames of a 2-frame MJPEG AVI keeps
    # px_sum identical (same per-frame sums, reordered) but MUST change
    # px_wsum (frame-index weight); corrupting one frame's entropy
    # stream must fail the WHOLE asset closed as 'unknown'.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_mjpeg_frames,
        synthesize_mjpeg_avi_assets,
    )

    docs = spark.createDataFrame([(3,)], "doc_id long")  # frames = 2
    assets = synthesize_mjpeg_avi_assets(docs)
    [base] = decode_mjpeg_frames(assets).collect()
    assert base["media_type"] == "video/mjpeg", base
    assert base["n_frames"] == 2 and base["n_components"] == 3, base
    # doc 3: wb=1, hb=2 -> 2 blocks x 3 comps x 2 frames
    assert base["n_blocks"] == 12, base

    def _spans(b):
        import struct

        spans, stack = [], [(12, len(b))]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                cid, csize = struct.unpack_from("<4sI", b, pos)
                body = pos + 8
                if cid == b"LIST":
                    stack.append((body + 4, body + csize))
                elif cid == b"00dc":
                    spans.append((pos, body + csize))
                pos = body + csize + (csize & 1)
        return sorted(spans)

    @F.udf("binary")
    def swap_frames(p):
        import struct

        b = bytes(p)
        spans, stack = [], [(12, len(b))]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                cid, csize = struct.unpack_from("<4sI", b, pos)
                body = pos + 8
                if cid == b"LIST":
                    stack.append((body + 4, body + csize))
                elif cid == b"00dc":
                    spans.append((pos, body + csize + (csize & 1)))
                pos = body + csize + (csize & 1)
        (a0, a1), (b0, b1) = sorted(spans)
        return b[:a0] + b[b0:b1] + b[a1:b0] + b[a0:a1] + b[b1:]

    [swapped] = decode_mjpeg_frames(
        assets.withColumn("payload", swap_frames("payload"))
    ).collect()
    assert swapped["media_type"] == "video/mjpeg", swapped
    assert swapped["px_sum"] == base["px_sum"], swapped
    assert swapped["px_wsum"] != base["px_wsum"], swapped

    @F.udf("binary")
    def corrupt_frame(p):
        b = bytearray(p)
        pos = b.find(b"00dc")
        # truncate the embedded JPEG: chop its EOI marker by lying
        # about nothing — just flip a scan byte to break the Huffman
        # stream's chunk size agreement instead: shrink chunk by 4.
        import struct

        (size,) = struct.unpack_from("<I", b, pos + 4)
        struct.pack_into("<I", b, pos + 4, size - 4)
        return bytes(b)

    [bad] = decode_mjpeg_frames(
        assets.withColumn("payload", corrupt_frame("payload"))
    ).collect()
    assert bad["media_type"] == "unknown", bad


def test_mjpeg_heights_and_frames_vary_across_ids(spark):
    # Coverage guard (advice round 7 class of bug): the parameter maps
    # must actually vary — multiple distinct heights, widths, frame
    # counts, and component counts across a small id range.
    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_mjpeg_frames,
        synthesize_mjpeg_avi_assets,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = decode_mjpeg_frames(synthesize_mjpeg_avi_assets(docs)).collect()
    assert all(r["media_type"] == "video/mjpeg" for r in rows)
    assert len({r["width"] for r in rows}) == 3
    assert len({r["height"] for r in rows}) == 3
    assert len({r["n_frames"] for r in rows}) == 3
    assert {r["n_components"] for r in rows} == {1, 3}


def test_tiff_decoder_survives_corrupt_payloads(spark):
    # Same rule as every other container family: bad magic, truncated
    # IFD entry tables, and corrupt out-of-line RATIONAL offsets must
    # yield NULL-feature rows, never kill the task; pristine payloads
    # decode fully in BOTH byte orders.
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.multimodal import (
        decode_tiff_features,
        synthesize_tiff_assets,
    )

    docs = spark.createDataFrame([(6,), (7,)], "doc_id long")  # II and MM
    assets = synthesize_tiff_assets(docs)

    @F.udf("binary")
    def smash_ifd_count(p):
        b = bytearray(p)
        b[8] = 0xFF  # entry count field -> way past the buffer
        b[9] = 0xFF
        return bytes(b)

    @F.udf("binary")
    def truncate(p):
        return bytes(p[:10])

    @F.udf("binary")
    def bad_magic(p):
        return b"XX" + bytes(p[2:])

    for mutate in (smash_ifd_count, truncate, bad_magic):
        rows = decode_tiff_features(
            assets.withColumn("payload", mutate("payload"))
        ).collect()
        assert all(
            r["width"] is None and r["px_checksum"] is None for r in rows
        ), (mutate.__name__, rows)

    good = decode_tiff_features(assets).collect()
    assert {r["byte_order"] for r in good} == {"II", "MM"}
    assert all(
        r["width"] is not None and r["px_checksum"] is not None for r in good
    ), good


def test_feature_hash_matches_duckdb_and_is_bounded(spark, duck):
    # Hashing-trick featurization: md5-family bucket + sign expressions
    # are cell-exact against DuckDB (the same parity scheme the round-5
    # minhash-md5 twin uses), buckets stay in range, and the encoding
    # is vocabulary-free (fixed width regardless of corpus).
    from kafka_streams_aggregate_spark.operators.text import feature_hash
    from kafka_streams_aggregate_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    got = feature_hash(docs, "doc_id", "text", n_buckets=64)
    rows = sorted(tuple(r) for r in got.collect())
    assert rows and all(0 <= b < 64 for _, b, _ in rows)

    oracle = duck.execute("""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        )
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket,
               CAST(SUM((('0x' || substr(md5(tok), 16, 1))::BIGINT) % 2 * 2 - 1)
                    AS BIGINT) AS weight
        FROM toks GROUP BY doc_id, bucket
    """).fetchall()
    assert rows == sorted(tuple(r) for r in oracle)
