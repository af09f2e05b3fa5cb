"""Training-data-pipeline operator tests: dedup, similarity, textstats, multimodal."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from graphene_spark.tdp import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near a river bank"),  # near dup of 0
        (3, "completely different content about spark dataframes and shuffles"),
        (4, "Der schnelle braune Fuchs und der faule Hund und die Katze ist da"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_exact_duplicates(spark, docs):
    got = {r["doc_id"]: (r["dup_group"], r["is_canonical"]) for r in dedup.exact_duplicates(docs).collect()}
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2][0] == 2  # near dup is NOT an exact dup
    assert got[3] == (3, True)


def test_minhash_duplicates(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_duplicates(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs  # exact dup certainly collides
    assert (0, 2) in pairs  # near dup above threshold
    assert all(3 not in p for p in pairs)


def test_simhash_duplicates(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_duplicates(docs, max_hamming=10).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.6).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs


def test_embedding_near_duplicates(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(8).astype("float32")
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 1.001]),  # same direction -> cosine ~1
        (2, [float(x) for x in rng.randn(8)]),
    ]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.embedding_near_duplicates(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_brute_force_topk_vs_numpy(spark):
    rng = np.random.RandomState(1)
    corpus = [(i, [float(x) for x in rng.randn(16)]) for i in range(50)]
    queries = [(100, [float(x) for x in rng.randn(16)])]
    cdf = spark.createDataFrame(corpus, schema="vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, schema="query_id long, embedding array<float>")
    got = similarity.brute_force_topk(cdf, qdf, k=5).orderBy("rank").collect()
    # numpy reference
    cm = np.array([c[1] for c in corpus])
    qv = np.array(queries[0][1])
    cos = cm @ qv / (np.linalg.norm(cm, axis=1) * np.linalg.norm(qv))
    expect = list(np.argsort(-cos)[:5])
    assert [r["vec_id"] for r in got] == expect
    assert abs(got[0]["cosine"] - cos[expect[0]]) < 1e-6


def test_lsh_topk_recall(spark):
    """LSH ANN must recover most of the true top-k on clustered data."""
    rng = np.random.RandomState(2)
    centers = rng.randn(4, 16) * 5
    corpus = []
    for i in range(80):
        c = centers[i % 4]
        corpus.append((i, [float(x) for x in c + rng.randn(16) * 0.1]))
    queries = [(0, [float(x) for x in centers[0] + rng.randn(16) * 0.05])]
    cdf = spark.createDataFrame(corpus, schema="vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, schema="query_id long, embedding array<float>")
    exact = {r["vec_id"] for r in similarity.brute_force_topk(cdf, qdf, k=10).collect()}
    approx = {r["vec_id"] for r in similarity.lsh_topk(cdf, qdf, k=10, n_tables=6, n_planes=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_ivf_topk_recall(spark):
    """IVF ANN recovers the true top-k on clustered data (same fixture shape
    as the LSH test)."""
    rng = np.random.RandomState(3)
    centers = rng.randn(4, 16) * 5
    corpus = []
    for i in range(80):
        c = centers[i % 4]
        corpus.append((i, [float(x) for x in c + rng.randn(16) * 0.1]))
    queries = [(0, [float(x) for x in centers[1] + rng.randn(16) * 0.05])]
    cdf = spark.createDataFrame(corpus, schema="vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, schema="query_id long, embedding array<float>")
    exact = {r["vec_id"] for r in similarity.brute_force_topk(cdf, qdf, k=10).collect()}
    approx = {r["vec_id"] for r in similarity.ivf_topk(cdf, qdf, k=10, n_lists=6, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_textstats(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of a house is it for on to in"),
            (1, "der die und das ist hier"),
            (2, ""),
        ],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.analyze_documents(df).collect()}
    assert got[0]["lang_pred"] == "en"
    assert got[1]["lang_pred"] == "de"
    assert got[2]["n_tokens_ws"] == 0
    assert got[0]["n_tokens_ws"] == 14
    assert got[0]["q"]["n_tokens"] == 14
    assert 0 <= got[0]["q"]["quality"] <= 1
    # fingerprint is deterministic
    got2 = {r["doc_id"]: r for r in textstats.analyze_documents(df).collect()}
    assert got[0]["fingerprint"] == got2[0]["fingerprint"]


def test_curate_corpus_end_to_end(spark):
    from graphene_spark.tdp import curate

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup
        (2, "the quick brown fox jumps over the lazy dog near a river bank today"),  # near dup
        (3, "for it is a long and entirely different passage about the spark engine and its shuffles"),
        (4, "x"),  # fails min_tokens
        (5, ""),  # empty
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = curate.curate_corpus(docs, min_quality=0.2, min_tokens=5, near_dup_threshold=0.5)
    ids = {r["doc_id"] for r in out["corpus"].select("doc_id").collect()}
    assert ids == {0, 3}  # 1 exact-dup'd away, 2 near-dup'd away, 4/5 gated
    c = out["counters"]
    assert c["input"] == 6
    assert c["after_quality_gate"] == 4
    assert c["after_exact_dedup"] == 3
    assert c["after_near_dedup"] == 2
    dropped = {r["doc_id"] for r in out["dropped"].select("doc_id").collect()}
    assert dropped == {1, 2, 4, 5}


def test_multimodal_plumbing(spark):
    media = multimodal.make_media_df(spark, n=30)
    feats = multimodal.extract_image_features(media)
    rows = feats.collect()
    img_meta = {r["media_id"]: r["meta"] for r in media.collect() if r["kind"] == "image"}
    assert len(rows) == len(img_meta)
    assert all(0 < r["mean_luma"] < 1 for r in rows)
    # decoded dimensions must equal the generator's metadata (real header parse)
    for r in rows:
        assert (r["width"], r["height"]) == (
            img_meta[r["media_id"]]["width"], img_meta[r["media_id"]]["height"]
        )
    # deterministic across runs
    rows2 = feats.collect()
    assert {r["media_id"]: r["phash"] for r in rows} == {r["media_id"]: r["phash"] for r in rows2}
    # frame sampling plan from metadata only
    plan = multimodal.frame_sample_plan(media, every_n=10)
    vids = media.filter("kind = 'video'").count()
    assert plan.count() == vids * 3  # 30 frames / every 10 -> idx 0,10,20
    # stats prune payload: check it runs and aggregates
    stats = {r["kind"]: r["n"] for r in multimodal.media_stats(media).collect()}
    assert stats["image"] == 10


def test_multimodal_image_decode_real():
    """Codec round-trip on known pixels: BMP and PPM of the SAME raster must
    decode to identical pixels, luma, and phash (format-independent
    features), and mean_luma must equal the hand-computed Rec.601 value."""
    import numpy as np

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0); px[0, 1] = (0, 255, 0)
    px[1, 0] = (0, 0, 255); px[1, 1] = (255, 255, 255)
    for enc in (multimodal.encode_bmp, multimodal.encode_ppm):
        f = multimodal.decode_image(enc(px))
        assert (f["width"], f["height"]) == (2, 2)
        expected = (0.299 + 0.587 + 0.114 + 1.0) / 4  # one pure R, G, B, W pixel
        assert abs(f["mean_luma"] - expected) < 1e-9
    assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(px)), px)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(px)), px)
    # odd width exercises BMP 4-byte row padding
    px3 = multimodal._gradient(5, 3, phase=9)
    assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(px3)), px3)
    f_bmp = multimodal.decode_image(multimodal.encode_bmp(px3))
    f_ppm = multimodal.decode_image(multimodal.encode_ppm(px3))
    assert f_bmp == f_ppm
    with pytest.raises(ValueError):
        multimodal.decode_image(b"JUNK....")


def test_multimodal_audio_decode_real(spark):
    """WAV decode on a known signal: a full-scale square wave has RMS = peak
    = amplitude/32768; media-table audio rows decode with real rate/length."""
    import numpy as np

    amp = 16000
    sq = np.tile(np.array([amp, -amp], dtype=np.int16), 800)
    f = multimodal.decode_audio(multimodal.encode_wav(sq, 8000))
    assert f["sample_rate"] == 8000 and f["n_samples"] == 1600
    assert abs(f["rms"] - amp / 32768.0) < 1e-9
    assert abs(f["peak"] - amp / 32768.0) < 1e-9
    media = multimodal.make_media_df(spark, n=12)
    rows = multimodal.extract_audio_features(media).collect()
    assert len(rows) == 4  # kinds cycle image/audio/video
    for r in rows:
        assert r["sample_rate"] == 16000 and r["n_samples"] == 1600
        # sine RMS = amplitude/sqrt(2); generator amplitude is 12000
        assert abs(r["rms"] - (12000 / 32768.0) / (2**0.5)) < 0.01


def test_multimodal_video_decode_real(spark):
    """Sampled-frame decode walks the concatenated-P6 stream: output rows
    match the metadata-only plan exactly, and per-frame luma comes from the
    right frame (seek parity with decode_video_frame)."""
    import numpy as np

    media = multimodal.make_media_df(spark, n=9)
    plan = {(r["media_id"], r["frame_idx"])
            for r in multimodal.frame_sample_plan(media, every_n=10).collect()}
    got = multimodal.extract_video_frame_features(media, every_n=10).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in got} == plan
    payloads = {r["media_id"]: bytes(r["payload"])
                for r in media.collect() if r["kind"] == "video"}
    for r in got:
        frame = multimodal.decode_video_frame(payloads[r["media_id"]], r["frame_idx"])
        assert abs(r["mean_luma"] - float(multimodal._luma(frame).mean())) < 1e-12
    # frames differ, so sampled lumas should not all collapse to one value
    lumas = {round(r["mean_luma"], 6) for r in got}
    assert len(lumas) > 1
    with pytest.raises(IndexError):
        multimodal.decode_video_frame(next(iter(payloads.values())), 999)


def test_multimodal_truncated_ppm_rejected_on_both_paths():
    """A truncated final video frame must surface at header-parse time on
    BOTH the decode path and the header-walk skip path — without the length
    check the skip path silently under-counted frames (round-4 ADVICE)."""
    import numpy as np

    frames = [multimodal._gradient(4, 4, phase=p) for p in range(3)]
    payload = multimodal.encode_video_ppm(frames)
    truncated = payload[:-5]  # last frame loses its final pixel bytes
    with pytest.raises(ValueError, match="truncated PPM payload"):
        list(multimodal.iter_video_frames(truncated))  # decode path
    with pytest.raises(ValueError, match="truncated PPM payload"):
        # seek PAST the damaged frame = pure header-walk skip path (the old
        # behavior skipped over it and raised IndexError, miscounting frames)
        multimodal.decode_video_frame(truncated, 5)
    # intact payloads are unaffected
    assert len(list(multimodal.iter_video_frames(payload))) == 3


# ---------------------------------------------------------------------------
# round-3: identical-content clusters larger than the bucket cap must not
# lose their pairs (round-2 ADVICE: identical texts share every band_sig, so
# a >max_bucket cluster flooded ALL its buckets and was pruned everywhere)
# ---------------------------------------------------------------------------

def _jaccard_words(a: str, b: str, n: int = 3) -> float:
    def sh(s):
        ws = s.lower().split()
        if len(ws) <= n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_identical_cluster_beyond_cap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu"
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda nu"
    k = 70  # > max_bucket=64: pre-fix, every band bucket was pruned
    rows = [(i, base) for i in range(k)]
    rows.append((1000, near))
    rows.append((2000, "entirely unrelated words about spark adaptive execution"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.minhash_duplicates(docs, threshold=0.7, max_bucket=64).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    # all C(70,2) intra pairs at jaccard exactly 1.0
    intra = [(a, b) for a in range(k) for b in range(a + 1, k)]
    assert len(got) == len(intra) + k
    for p in intra:
        assert got[p] == 1.0
    # every cluster member also pairs with the near-dup outsider
    jn = _jaccard_words(base, near)
    assert jn >= 0.7
    for i in range(k):
        assert abs(got[(i, 1000)] - jn) < 1e-12


def test_simhash_identical_cluster_beyond_cap(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    k = 70
    rows = [(i, base) for i in range(k)]
    rows.append((5000, "unrelated corpus text with nothing shared at all here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.simhash_duplicates(docs, max_hamming=3, max_bucket=64).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    intra = {(a, b) for a in range(k) for b in range(a + 1, k)}
    assert set(got) == intra
    assert all(h == 0 for h in got.values())


def test_embedding_identical_cluster_beyond_cap(spark):
    k = 300  # > max_bucket=256
    rows = [(i, [1.0, 2.0, -1.0, 0.5]) for i in range(k)]
    rows.append((9000, [2.0, 4.0, -2.0, 1.0]))  # same direction, different bytes
    rows.append((9001, [-1.0, 1.0, 2.0, 0.0]))
    rows.append((9100, [0.0, 0.0, 0.0, 0.0]))   # zero vector: never pairs
    rows.append((9101, [0.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dedup.embedding_near_duplicates(emb, threshold=0.95, max_bucket=256).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out}
    intra = {(a, b) for a in range(k) for b in range(a + 1, k)}
    cross = {(i, 9000) for i in range(k)}
    assert set(got) == intra | cross
    assert all(abs(c - 1.0) < 1e-12 for c in got.values())


def test_minhash_null_text_never_pairs(spark):
    """Round-3 review: NULL-text docs must pair with NOTHING (jaccard
    defines the null case as 0.0) — the identical-content collapse must not
    group them together or with empty docs and assert jaccard 1.0."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "real text here with words")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_duplicates(docs, threshold=0.7).collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 1 not in ids_in_pairs and 2 not in ids_in_pairs, pairs


def test_setkey_not_delimiter_injectable(spark):
    """Round-3 review: tokens containing the \\x1f join delimiter must not
    collapse distinct shingle sets onto one content key (which would assert
    jaccard exactly 1.0 without verification)."""
    docs = spark.createDataFrame(
        [(1, "x\x1fy z"), (2, "x y z")], "doc_id long, text string"
    )
    pairs = dedup.minhash_duplicates(docs, ngram_words=1, threshold=0.7).collect()
    assert not any(r["jaccard"] == 1.0 for r in pairs), pairs


def test_fingerprint_md5_arrow_matches_jvm_on_unicode_whitespace(spark):
    """Round-3 review: Python \\s is Unicode-aware, Java/DuckDB \\s is not —
    the Arrow md5 fingerprint must tokenize with re.ASCII so NBSP-bearing
    documents fingerprint identically to the JVM expression."""
    import pyspark.sql.functions as F

    from graphene_spark.tdp import textstats

    docs = spark.createDataFrame(
        [(1, "foo bar baz qux quux corge"), (2, "plain old ascii words here")],
        "doc_id long, text string",
    )
    ws = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.when(F.size(ws) < 4, F.array(F.concat_ws(" ", ws))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 4),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, 4)),
        )
    )
    out = docs.select(
        "doc_id",
        textstats.fingerprint_md5_arrow(F.col("text")).alias("got"),
        F.array_min(F.transform(grams, lambda g: F.md5(g))).alias("want"),
    ).collect()
    for r in out:
        assert r["got"] == r["want"], r


def test_ivf_topk_corpus_smaller_than_n_lists(spark):
    """A corpus with fewer rows than n_lists must clamp the centroid count,
    not IndexError on the driver."""
    rows = [(i, [float(i + 1), 1.0, 0.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.limit(1).selectExpr("vec_id as query_id", "embedding")
    out = similarity.ivf_topk(emb, q, k=3, n_lists=8, n_probe=8)
    assert out.count() == 3


# ---------------------------------------------------------------------------
# round-4: ANN recall beyond the frozen 15-row fixture — a seeded 100k-vector
# property test against the exact brute-force baseline (VERDICT item 7)
# ---------------------------------------------------------------------------

def _clustered_vectors(spark, n, dim, n_clusters, seed, noise=0.15,
                       id_col="vec_id"):
    """Deterministic clustered vectors, generated DISTRIBUTED: unit cluster
    centers from a per-cluster Philox stream, per-vector Philox noise — the
    same (seed, id) always yields the same vector on any worker."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                c = int(i) % n_clusters
                crng = np.random.Generator(np.random.Philox(key=[seed, 10**9 + c]))
                center = crng.normal(size=dim)
                center /= np.linalg.norm(center)
                vrng = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
                vecs.append((center + noise * vrng.normal(size=dim)).tolist())
            yield pd.DataFrame({id_col: ids, "embedding": vecs})

    return spark.range(n).repartition(8).mapInPandas(
        gen, f"{id_col} long, embedding array<double>"
    )


@pytest.mark.slow
def test_ann_recall_at_10_on_100k_vectors(spark):
    """lsh_topk and ivf_topk must reach recall@10 >= 0.9 vs the exact
    brute-force baseline on a 100k-vector / 50-cluster corpus (dim 16,
    20 queries).  The frozen 15-row fixture proves exactness on a
    hand-checkable instance; this proves the bucketed variants actually
    FIND neighbors at a scale where candidate pruning is real (~3%
    of the corpus scanned per query).  Measured recalls are recorded in
    BENCH/NOTES.md (round-4 section)."""
    corpus = _clustered_vectors(spark, 100_000, 16, 50, seed=7).persist()
    corpus.count()
    queries = _clustered_vectors(
        spark, 20, 16, 50, seed=99, id_col="query_id"
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    truth = topk_sets(
        similarity.brute_force_topk(corpus, queries, k=10)
    )
    recalls = {}
    # round-6 configs (numpy sweep in BENCH/NOTES.md): query-directed
    # multi-probing buys FINER planes at the same scanned fraction —
    # 6 planes x 8 tables x 4 probes = recall 1.00 at ~0.42 candidate
    # fraction, where the round-4 4x8x1 config scored 0.965 at 0.41.
    # (8 planes x 4 tables x 1 probe measured only 0.43: buckets too fine
    # without probing; the probe count is what makes fine planes usable.)
    got = topk_sets(
        similarity.lsh_topk(
            corpus, queries, k=10, n_planes=6, n_tables=8, seed=42, n_probes=4
        )
    )
    recalls["lsh"] = sum(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)
    # IVF: the same finer-cells principle — 64 lists x 16 probes scans the
    # same ~25% as 32x8 but quantizes the boundary neighborhoods twice as
    # finely, and 3 Lloyd steps settle the cell boundaries (numpy sweep:
    # 32x8 plateaus at ~0.95-0.98 regardless of init quality; 64x16 with
    # 2-3 Lloyd steps reads 0.99-1.00 across seeds)
    got = topk_sets(
        similarity.ivf_topk(
            corpus, queries, k=10, n_lists=64, n_probe=16, lloyd_iters=3
        )
    )
    recalls["ivf"] = sum(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)
    corpus.unpersist()
    print(f"ANN recall@10 on 100k vectors: {recalls}")
    assert recalls["lsh"] >= 0.98, recalls
    assert recalls["ivf"] >= 0.98, recalls


def test_scan_partitions_matches_public_api(spark):
    """The JVM-side partition probe must read the same count the public
    df.rdd property reports, for both a file scan and an explicit
    repartition (it gates the _ensure_parallelism/_fan_out guards)."""
    from graphene_spark.tdp.dedup import _scan_partitions

    df = spark.range(1000)
    assert _scan_partitions(df) == df.rdd.getNumPartitions()
    rp = spark.range(1000).repartition(7)
    assert _scan_partitions(rp) == 7 == rp.rdd.getNumPartitions()
