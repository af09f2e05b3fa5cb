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


def _centroids(corpus: DataFrame, corpus_id: str, corpus_vec: str, k: int, refine: bool = True):
    """Deterministic IVF centroids: k hash-sampled seed vectors, optionally
    refined by one Lloyd step (element-wise mean per cluster, computed with
    posexplode + groupBy — fully distributed).  Returns a python list of
    (centroid_id, vector) collected to the driver (k x dim floats — tiny)."""
    seeds = (
        corpus.orderBy(F.xxhash64(F.col(corpus_id)))
        .limit(k)
        .select(F.col(corpus_vec).alias("v"))
        .collect()
    )
    cents = [list(r["v"]) for r in seeds]
    if refine:
        assigned = corpus.select(
            F.col(corpus_vec).alias("v"),
            _nearest_centroid_expr(F.col(corpus_vec), cents).alias("c"),
        )
        means = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("c")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .select("c", F.transform("ms", lambda s: s["m"]).alias("mean"))
            .collect()
        )
        by_c = {r["c"]: list(r["mean"]) for r in means}
        cents = [by_c.get(i, cents[i]) for i in range(k)]
    return cents


def _nearest_centroid_expr(vec_col, cents: list[list[float]]):
    """argmax-cosine centroid id as a single JVM expression."""
    sims = F.array(
        *[
            cosine(vec_col, F.array(*[F.lit(float(x)) for x in c]))
            for c in cents
        ]
    )
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def _probe_centroids_expr(vec_col, cents: list[list[float]], n_probe: int):
    """ids of the n_probe nearest centroids, as an array column."""
    pairs = F.array(
        *[
            F.struct(
                cosine(vec_col, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(cents)
        ]
    )
    return F.slice(
        F.transform(F.reverse(F.array_sort(pairs)), lambda p: p["i"]), 1, n_probe
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_lists`` Voronoi cells around deterministic centroids, probe the
    ``n_probe`` nearest cells per query, exact cosine within them.

    At 100 TB the corpus assignment is one narrow pass (the centroid table is
    driver-collected and inlined — k x dim floats), the probe join is an
    equi-join on the small cell id, and per-cell candidate lists shrink the
    scan by ~n_lists/n_probe."""
    cents = _centroids(corpus, corpus_id, corpus_vec, n_lists)
    c_assigned = corpus.select(
        F.col(corpus_id).alias("_cid"),
        F.col(corpus_vec).alias("_cv"),
        _nearest_centroid_expr(F.col(corpus_vec), cents).alias("cell"),
    )
    q_probes = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(query_vec).alias("_qv"),
        F.explode(_probe_centroids_expr(F.col(query_vec), cents, n_probe)).alias("cell"),
    )
    scored = (
        c_assigned.join(F.broadcast(q_probes), "cell")
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
        .dropDuplicates([query_id, corpus_id])
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
