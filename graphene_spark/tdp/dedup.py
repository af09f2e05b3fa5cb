"""Document deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: every variant keeps the heavy side un-collected and
shuffles once on a compact key (hash / band signature / bucket id).  The
quadratic verify step only ever runs within blocks.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..blocking import band_table, jaccard, shingle


def _norm_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small inputs often arrive as one parquet split; the shingle/hash work
    is CPU-heavy per row, so fan out to the cluster's parallelism before it
    (at real scale inputs have enough splits and this is a no-op)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: returns (doc_id, dup_group, is_canonical).

    dup_group = min doc_id sharing the normalized-text hash; one shuffle on a
    64-bit key (never on the text itself)."""
    h = docs.select(
        F.col(id_col),
        F.xxhash64(_norm_text(F.col(text_col))).alias("text_hash"),
    )
    w = Window.partitionBy("text_hash")
    return (
        h.withColumn("dup_group", F.min(id_col).over(w))
        .withColumn("is_canonical", F.col(id_col) == F.col("dup_group"))
        .select(id_col, "dup_group", "is_canonical")
    )


def word_shingles(col, n: int = 3):
    """Word n-gram shingles (for document-level MinHash)."""
    words = F.split(_norm_text(col), " ")
    return F.array_distinct(
        F.when(F.size(words) <= n, F.array(F.concat_ws(" ", words))).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        )
    )


def shingle_hashes(shingles_col):
    """31-bit hash per shingle, JVM-side (one xxhash64 per element).

    Hashing the strings in the JVM means the Arrow transfer to the minhash
    UDF carries a compact int array instead of the shingle text, and the
    Python side never touches a string — the earlier per-shingle
    ``str.encode`` + ``crc32`` loop was the dominant cost of the signature
    stage (~5M Python-level calls at sf0.1)."""
    return F.transform(
        shingles_col, lambda s: F.xxhash64(s).bitwiseAND(F.lit((1 << 31) - 1))
    )


def _minhash_udf(num_hashes: int):
    """Arrow-batched numpy MinHash over pre-hashed shingles: K signatures via
    universal hashing h_k(x) = (a_k*x + b_k) mod p with per-index constants
    (p = 2^31-1; products stay under 2^62 in int64).

    Per-index constants are load-bearing: the earlier shared-(a, b) linear
    form a + k*b let one shingle with the smallest a AND b win every index,
    perfectly correlating the K minhashes and collapsing LSH recall (see
    blocking.minhash_signature).  The pure-JVM variant of the K-way min
    evaluates interpreted nested higher-order functions — measured ~20ms/doc
    at K=32 vs microseconds for the numpy broadcast here."""
    import numpy as np

    from ..blocking import MERSENNE31, cw_constants

    a_s, b_s = cw_constants(num_hashes)
    a_v = np.array(a_s, dtype=np.int64)
    b_v = np.array(b_s, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def compute(hashes: pd.Series) -> pd.Series:
        out = []
        for xs in hashes:
            if xs is None or len(xs) == 0:
                out.append([0] * num_hashes)
                continue
            x = np.asarray(xs, dtype=np.int64)
            out.append(
                ((x[:, None] * a_v[None, :] + b_v[None, :]) % MERSENNE31)
                .min(axis=0)
                .tolist()
            )
        return pd.Series(out)

    return compute


def minhash_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram_words: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: (id_a, id_b, jaccard) with id_a < id_b.

    shingle -> minhash -> band -> capped bucket self-join on ids only ->
    signature-agreement estimate filter -> exact-Jaccard verify via shingle
    re-join on the surviving pairs.

    Scale shape (the round-1 version carried full shingle arrays through the
    band explode and self-join — ~bands x the corpus text through the
    shuffle):

    * the band shuffle carries (_id, band keys, _sig) — the 32-long signature
      is ~256 B/row regardless of document size, so shuffle volume is
      O(bands x ids), not O(bands x text);
    * band buckets above ``max_bucket`` rows are dropped before the
      self-join: a degenerate band value (boilerplate or near-empty docs all
      sharing a signature slice) would otherwise go quadratic.  True
      near-dup clusters larger than the cap still pair up through their
      other, non-degenerate bands;
    * candidate pairs are pre-filtered by the unbiased signature-agreement
      Jaccard estimate at ``threshold - 0.2`` (generous margin: with K=32
      hashes the estimate's std dev is <= 0.09), so the exact verify touches
      only plausible pairs;
    * the exact verify re-joins shingles BY ID on the surviving pair set —
      at scale that pair set is tiny relative to the corpus, so the join is
      a broadcast/AQE-small join against a narrow recomputed shingle
      projection instead of a corpus-wide shuffle.
    """
    rows = num_hashes // bands
    docs = _ensure_parallelism(docs)
    shingles = docs.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), ngram_words).alias("_sh"),
    )
    sig = shingles.select(
        "_id", _minhash_udf(num_hashes)(shingle_hashes(F.col("_sh"))).alias("_sig")
    )
    banded = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(F.slice("_sig", b * rows + 1, rows).cast("string")).alias("band_sig"),
                ),
            )
        ).alias("_b"),
    ).select("_id", "_sig", "_b.band_idx", "_b.band_sig")
    # hot-bucket cap: one window count on the band key, then prune
    bucket_n = F.count("*").over(Window.partitionBy("band_idx", "band_sig"))
    banded = banded.withColumn("_n", bucket_n).filter(F.col("_n") <= max_bucket).drop("_n")
    l = banded.withColumnsRenamed({"_id": "id_a", "_sig": "sig_a"})
    r = banded.withColumnsRenamed({"_id": "id_b", "_sig": "sig_b"})
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ) / F.lit(num_hashes)
    pairs = (
        l.join(r, ["band_idx", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(est >= threshold - 0.2)
        .select("id_a", "id_b")
    )
    sh_a = shingles.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"})
    sh_b = shingles.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"})
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_SIMHASH_SQL = (
    "aggregate(sequence(0, 63), 0L, (acc, b) -> acc | "
    "IF(aggregate({hs}, 0L, (a, h) -> a + IF((h & shiftleft(1L, b)) != 0, 1L, -1L)) > 0, "
    "shiftleft(1L, b), 0L))"
)


def simhash(col, num_bits: int = 64):
    """64-bit SimHash over word 2-gram shingles, fully JVM-side.

    bit b of the hash = sign of the sum over shingle hashes of (+1/-1 for
    shingle-hash bit b) — majority vote per bit.  Expressed in SQL because the
    SQL shiftleft accepts a column shift amount (the Python API does not)."""
    hashes = F.transform(word_shingles(col, 2), lambda s: F.xxhash64(s))
    # route the computed array through the SQL expression via a lateral alias
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(num_bits - 1)).alias("_bits"),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(
            _bit_vote(hashes, b)
        ),
    )


def _bit_vote(hashes, b):
    """IF(majority of shingle hashes have bit b set, 1<<b, 0) with a column b:
    use SQL pow-of-two via shiftleft inside expr-free arithmetic."""
    mask = _shiftleft_col(F.lit(1).cast("long"), b)
    vote = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda a, h: a + F.when(h.bitwiseAND(mask) != 0, F.lit(1).cast("long")).otherwise(F.lit(-1).cast("long")),
    )
    return F.when(vote > 0, mask).otherwise(F.lit(0).cast("long"))


def _shiftleft_col(val, bits):
    """shiftleft with a Column shift amount via the SQL function call API."""
    return F.call_function("shiftleft", val, bits.cast("int"))


def hamming_distance(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def _simhash_udf():
    """Arrow-batched numpy SimHash: 64-bit shingle hash from two crc32s
    (plain + reversed, see _minhash_udf for why), per-bit majority vote via
    numpy broadcasting.  Replaces the interpreted SQL aggregate (simhash())
    in the hot path — same perf rationale as _minhash_udf."""
    import numpy as np
    from zlib import crc32

    bit_idx = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("long")
    def compute(shingles: pd.Series) -> pd.Series:
        out = []
        for sh in shingles:
            if sh is None or len(sh) == 0:
                out.append(0)
                continue
            a = np.fromiter((crc32(s.encode()) for s in sh), dtype=np.uint64, count=len(sh))
            b = np.fromiter((crc32(s[::-1].encode()) for s in sh), dtype=np.uint64, count=len(sh))
            h = (a << np.uint64(32)) | b
            bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = ((votes > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64)
            out.append(int(sig.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return compute


def simhash_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit bands (pigeonhole: any pair
    within hamming distance 3 shares at least one of 4 exact bands), verify
    with full hamming distance."""
    n_bands = 64 // band_bits
    docs = _ensure_parallelism(docs)
    sigs = docs.select(
        F.col(id_col).alias("_id"),
        _simhash_udf()(word_shingles(F.col(text_col), 2)).alias("_sim"),
    )
    banded = sigs.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned(F.col("_sim"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1).cast("long"))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sim", "_b.band_idx", "_b.band_val")
    l = banded.withColumnsRenamed({"_id": "id_a", "_sim": "sim_a"})
    r = banded.withColumnsRenamed({"_id": "id_b", "_sim": "sim_b"})
    return (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming_distance(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram_chars: int = 4,
    threshold: float = 0.6,
    block_prefix: int = 8,
) -> DataFrame:
    """Direct n-gram Jaccard near-dup with cheap prefix blocking (compare only
    docs sharing the normalized text prefix block) — the brute-force baseline
    the LSH variants are measured against at small scale."""
    docs = _ensure_parallelism(docs)
    base = docs.select(
        F.col(id_col).alias("_id"),
        shingle(F.col(text_col), ngram_chars).alias("_sh"),
        F.substring(_norm_text(F.col(text_col)), 1, block_prefix).alias("_blk"),
    )
    l = base.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"})
    r = base.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"})
    return (
        l.join(r, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH bucketing.

    Bucket = sign bits of dot(v, random plane) for n_planes seeded planes
    (deterministic Philox-seeded planes); verify cosine within buckets.
    Both the bucket signature and the verify cosine run as Arrow-batched
    numpy kernels (the round-1 interpreted-HOF plane dots were ~1000x slower
    per vector — tdp/similarity.py docstring).  Scale path: near-identical
    vectors share all sign bits with high probability, so the self-join is
    bucket-local."""
    from .similarity import bucket_sig_arrow, cosine_arrow

    embeddings = _ensure_parallelism(embeddings)
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        bucket_sig_arrow(F.col(vec_col), n_planes, seed).alias("_bucket"),
    )
    l = base.withColumnsRenamed({"_id": "id_a", "_v": "v_a"})
    r = base.withColumnsRenamed({"_id": "id_b", "_v": "v_b"})
    return (
        l.join(r, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_arrow(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
