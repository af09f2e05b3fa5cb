"""Similarity search over embedding columns: brute-force cosine top-k baseline
plus an LSH-bucketed approximate variant (the scale path).

All vector math is JVM-side higher-order functions (zip_with/aggregate) — no
Python in the hot path.  At 100 TB the brute-force variant is only for small
query batches (broadcast queries x corpus scan, one pass); the bucketed
variant prunes the corpus per query to matching LSH buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries, scan corpus once, window
    rank.  Returns (query_id, vec_id, cosine, rank<=k)."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cv"))
    scored = q.crossJoin(c).select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _bucket_sig(vec_col, n_planes: int, seed: int):
    dim = F.size(vec_col)

    def plane_dot(j):
        return F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), dim - 1),
                lambda v, kk: v
                * ((F.xxhash64(F.lit(seed), F.lit(j), kk) % 1000).cast("double") / 1000.0 - 0.5),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.concat_ws("", *[F.when(plane_dot(j) >= 0, "1").otherwise("0") for j in range(n_planes)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Each of ``n_tables`` hash tables assigns a sign-bit bucket; candidates =
    corpus rows sharing a bucket with the query in ANY table; then exact
    cosine + window top-k over candidates only.  Recall grows with n_tables;
    cost per query drops from |corpus| to the bucket sizes."""
    c_tables = corpus.select(
        F.col(corpus_id).alias("_cid"),
        F.col(corpus_vec).alias("_cv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_idx"),
                        _bucket_sig(F.col(corpus_vec), n_planes, seed + t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("_t"),
    ).select("_cid", "_cv", "_t.table_idx", "_t.bucket")
    q_tables = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(query_vec).alias("_qv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_idx"),
                        _bucket_sig(F.col(query_vec), n_planes, seed + t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("_t"),
    ).select("_qid", "_qv", "_t.table_idx", "_t.bucket")
    cands = (
        c_tables.join(F.broadcast(q_tables), ["table_idx", "bucket"])
        .select("_qid", "_qv", "_cid", "_cv")
        .dropDuplicates(["_qid", "_cid"])
    )
    scored = cands.select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
