"""Node/edge construction: dedup, label union, prop merge, adjacency chains.

Re-expresses the reference's NodeCache/relationship machinery as set
operations:

* A1 get-or-create dedup (Importer.groovy:97-103)  -> groupBy(label, name)
* A2 prop-merge, last-writer-wins (Importer.groovy:105-123)
                                                    -> ordered map fold
* A3 label-set union (Importer.groovy:125-139)      -> collect_set/array_union
* A7 MERGE edge dedup (post-import-cypher.txt)      -> dropDuplicates(src,rel,dst)
* W1 adjacency chains (GeneLoader.groovy:53-69)     -> window + lead/row_number
* J2 deferred edges (Loader.groovy:21,34-51)        -> left join after all
  nodes exist; unmatched rows become a metric, not a failure.

Node ids are deterministic: xxhash64(primary_label, name).  Deterministic ids
are what make the whole pipeline idempotent/resumable — re-running a partition
regenerates identical ids, so MERGE-style dedup on rewrite is exact (the
reference instead relies on 'Reactome DB_IDs used verbatim', Loader.groovy:57).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def node_id(label_col, name_col):
    """Deterministic 64-bit node id from (primary_label, name)."""
    return F.xxhash64(label_col, name_col)


def build_nodes(candidates: DataFrame) -> DataFrame:
    """candidates(label string, name string, props map<string,string>, seq bigint)
    -> nodes(node_id, name, labels array<string>, props map<string,string>).

    Dedup by (primary label = min label, name) with:
      * labels   = sorted set union across occurrences (A3)
      * props    = last-writer-wins by ``seq`` (A2 augmentOrCreate order —
        the reference's arrival order; callers pass a stable ordinal)
    Uniqueness of name within primary label mirrors the reference's unique
    constraint (Importer.groovy:61-66).
    """
    # canonical rendering of the props map: the secondary sort key below.
    # Candidates sharing (name, seq) but carrying DIFFERENT props would
    # otherwise merge in collect_list order — partition-dependent, breaking
    # the determinism the deterministic node ids promise for resumable
    # re-runs.  Ties on (seq, _pkey) have identical props, so their order
    # is irrelevant.
    pkey = F.concat_ws(
        "\x1e",
        F.array_sort(
            F.transform(
                F.map_entries(F.col("props")),
                lambda e: F.concat_ws("\x1f", e["key"], e["value"]),
            )
        ),
    )
    per_name = candidates.withColumn("_pkey", pkey).groupBy("name").agg(
        F.array_sort(F.collect_set("label")).alias("labels"),
        # fold props in (seq, _pkey) order; map_concat-with-override = last
        # writer wins
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seq", "_pkey", "props")),
                    # explicit comparator: the struct contains a map, which
                    # is not naturally orderable
                    lambda l, r: F.when(l["seq"] < r["seq"], -1)
                    .when(l["seq"] > r["seq"], 1)
                    .when(l["_pkey"] < r["_pkey"], -1)
                    .when(l["_pkey"] > r["_pkey"], 1)
                    .otherwise(0),
                ),
                lambda s: s["props"],
            ),
            F.create_map().cast("map<string,string>"),
            lambda acc, m: F.map_concat(
                F.map_filter(acc, lambda k, _: ~F.array_contains(F.map_keys(m), k)),
                m,
            ),
        ).alias("props"),
    )
    return per_name.select(
        node_id(F.element_at("labels", 1), F.col("name")).alias("node_id"),
        "name",
        "labels",
        "props",
    )


def build_edges(
    edge_candidates: DataFrame,
    nodes: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """edge_candidates(src_name, dst_name, rel_type, props) -> (edges, dangling).

    Resolution happens *after* all nodes exist, so the reference's deferred-
    relationship queue (Loader.groovy:21,81-88) reduces to two left joins;
    rows whose endpoints are missing are returned as ``dangling`` for the
    metrics table (Loader.groovy:45-47 logs-and-drops).
    Edges dedup on (src, rel_type, dst) — MERGE semantics (A7)."""
    # no broadcast hint: the node id map scales with the DATA (every node),
    # not with a dimension table — at 100 TB this resolution is a shuffle
    # join on name (or a bucketed co-located join); AQE still converts to
    # broadcast when the node set happens to be small.
    ids = nodes.select(F.col("name").alias("_n"), F.col("node_id").alias("_id"))
    src = ids.withColumnsRenamed({"_n": "_sn", "_id": "src"})
    dst = ids.withColumnsRenamed({"_n": "_dn", "_id": "dst"})
    joined = (
        edge_candidates.join(src, edge_candidates.src_name == F.col("_sn"), "left")
        .join(dst, edge_candidates.dst_name == F.col("_dn"), "left")
    )
    dangling = joined.filter(F.col("src").isNull() | F.col("dst").isNull()).select(
        *edge_candidates.columns
    )
    edges = (
        joined.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select("src", "dst", "rel_type", "props")
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    return edges, dangling


def adjacency_edges(
    df: DataFrame,
    part_col: str,
    order_col: str,
    id_col: str,
) -> DataFrame:
    """FIRST/NEXT/LAST chain edges per partition (W1, GeneLoader.groovy:53-69).

    For each partition key: FIRST_GENE(part -> first item), NEXT(item_i ->
    item_{i+1}), LAST_GENE(part -> last item) — generalized to any
    (partition, order, id) triple; over transcripts it is
    (conv_id, turn_idx, turn node).  One window, no self-join.
    """
    w = Window.partitionBy("part").orderBy("ord")
    base = df.select(
        F.col(part_col).alias("part"),
        F.col(order_col).alias("ord"),
        F.col(id_col).alias("item"),
    ).withColumns(
        {
            "nxt": F.lead("item").over(w),
            "rn": F.row_number().over(w),
            "cnt": F.count("*").over(Window.partitionBy("part")),
        }
    )
    next_edges = base.filter(F.col("nxt").isNotNull()).select(
        F.col("item").alias("src_name"),
        F.col("nxt").alias("dst_name"),
        F.lit("NEXT").alias("rel_type"),
    )
    first_edges = base.filter(F.col("rn") == 1).select(
        F.col("part").cast("string").alias("src_name"),
        F.col("item").alias("dst_name"),
        F.lit("FIRST").alias("rel_type"),
    )
    last_edges = base.filter(F.col("rn") == F.col("cnt")).select(
        F.col("part").cast("string").alias("src_name"),
        F.col("item").alias("dst_name"),
        F.lit("LAST").alias("rel_type"),
    )
    return next_edges.unionByName(first_edges).unionByName(last_edges)
