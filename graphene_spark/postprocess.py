"""Post-import graph rewrites — the Cypher phase re-expressed as DataFrame ops.

The reference shells out to neo4j-shell with post-import-cypher.txt after the
bulk load (LoadGrameneGraphDb.groovy:56-69).  Each statement there is a graph
rewrite ending in ``return count(...)`` — a regression counter.  Here each
rewrite is a pure DataFrame transform over the materialized ``nodes``/``edges``
tables returning (result_df, count) so callers can record the same counters in
the metrics table.

Edges schema throughout: src bigint, dst bigint, rel_type string
(props optional).  All rewrites are MERGE-semantics: output deduplicated on
(src, rel_type, dst) (A7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _dedup(edges: DataFrame) -> DataFrame:
    return edges.dropDuplicates(["src", "rel_type", "dst"])


def flip_edges(edges: DataFrame, rel_type: str) -> DataFrame:
    """Direction normalization (post-import-cypher.txt:4):
    ``match (a)<-[r:INPUT]-(b) merge (a)-[:INPUT]->(b) delete r`` — i.e. all
    edges of ``rel_type`` flipped, union'd with the already-forward ones,
    deduped.  In set semantics: reverse the matching subset and dedup."""
    flipped = edges.filter(F.col("rel_type") == rel_type).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "rel_type"
    )
    keep = edges.filter(F.col("rel_type") != rel_type).select("src", "dst", "rel_type")
    return _dedup(keep.unionByName(flipped))


def flag_common(nodes: DataFrame, name_patterns: list[str], exclude_patterns: list[str] | None = None,
                exclude_literals: list[str] | None = None) -> DataFrame:
    """Hot-key flagging (P11, post-import-cypher.txt:6-8): nodes whose name
    matches any of ``name_patterns`` (regex OR) minus excludes get
    common=true; everyone else common=false (the 'where not has' defaulting).

    This is the semantic twin of linking.hot_keys: the reference flags known
    promiscuous entities by name; we ALSO detect them by frequency.  Both
    feed the same exclusion/salting decisions."""
    pat = "|".join(f"(?:{p})" for p in name_patterns)
    common = F.col("name").rlike(pat)
    for ex in exclude_patterns or []:
        common = common & ~F.col("name").rlike(ex)
    for lit in exclude_literals or []:
        common = common & (F.col("name") != lit)
    return nodes.withColumn("common", F.coalesce(common, F.lit(False)))


def two_hop_edges(
    edges: DataFrame,
    first_rel: str,
    second_rel: str,
    out_rel: str,
    excluded_mid: DataFrame | None = None,
    excluded_ends: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """J7 (post-import-cypher.txt:10-12): (s)-[:A]->(m)-[:B]->(p) =>
    merge (s)-[:OUT]->(p).

    ``excluded_mid`` / ``excluded_ends``: node_id DataFrames to exclude as the
    middle / both endpoints (the ``common = false`` guard that prevents the
    O(hot^2) edge blowup from promiscuous entities — H2O/ATP in the
    reference; Zipf-head entities here).  The exclusion happens BEFORE the
    self-join, which is the whole point at scale: filter first, then join.
    """
    a = edges.filter(F.col("rel_type") == first_rel).select(
        F.col("src").alias("s"), F.col("dst").alias("m")
    )
    b = edges.filter(F.col("rel_type") == second_rel).select(
        F.col("src").alias("m"), F.col("dst").alias("p")
    )
    if excluded_ends is not None:
        ex = excluded_ends.select(F.col("node_id").alias("_x"))
        a = a.join(F.broadcast(ex), a.s == F.col("_x"), "left_anti")
        b = b.join(F.broadcast(ex), b.p == F.col("_x"), "left_anti")
    if excluded_mid is not None:
        exm = excluded_mid.select(F.col("node_id").alias("_x"))
        a = a.join(F.broadcast(exm), a.m == F.col("_x"), "left_anti")
        b = b.join(F.broadcast(exm), b.m == F.col("_x"), "left_anti")
    out = (
        a.join(b, "m")
        .select(F.col("s").alias("src"), F.col("p").alias("dst"))
        .withColumn("rel_type", F.lit(out_rel))
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    return out, out.count()


def metabolite_link(
    edges: DataFrame,
    reaction_ids: DataFrame,
    event_ids: DataFrame | None = None,
    common_ids: DataFrame | None = None,
    first_rel: str = "INPUT",
    second_rel: str = "OUTPUT",
    out_rel: str = "METABOLITE_LINK",
) -> tuple[DataFrame, int]:
    """METABOLITE_LINK diamond rewrite (post-import-cypher.txt:19):
    ``match (i{common:false})-[:INPUT]->(r:Reaction)-[:OUTPUT]->(o{common:false}),
    (i)-[:INPUT]->(r2:Event)-[:OUTPUT]->(o) merge (r)-[:METABOLITE_LINK]->(r2)``
    — two events that consume the same non-common input AND produce the same
    non-common output get linked, directed Reaction -> Event.

    ``reaction_ids`` / ``event_ids``: node_id frames for the :Reaction and
    :Event label sets (in the reference Reaction is a sub-label of Event, so
    reaction_ids is normally a subset; ``event_ids=None`` means any node).
    ``common_ids``: node_id frame of common=true entities excluded as i/o —
    the reference's own skew mitigation: without it every ATP/H2O diamond
    joins the full set of reactions touching it, and the (i, o) self-join
    goes quadratic on exactly those hot keys.  Filter-before-join, same as
    two_hop_edges.

    r != r2 mirrors Cypher relationship-uniqueness: with set-semantics edges
    (deduped on (src, rel_type, dst)) the two INPUT matches can only be the
    same relationship when r = r2.  Returns (link_edges, count)."""
    inp = edges.filter(F.col("rel_type") == first_rel).select(
        F.col("src").alias("i"), F.col("dst").alias("r")
    )
    outp = edges.filter(F.col("rel_type") == second_rel).select(
        F.col("src").alias("r"), F.col("dst").alias("o")
    )
    if common_ids is not None:
        ex = common_ids.select(F.col("node_id").alias("_x"))
        inp = inp.join(F.broadcast(ex), inp.i == F.col("_x"), "left_anti")
        outp = outp.join(F.broadcast(ex), outp.o == F.col("_x"), "left_anti")
    diamonds = inp.join(outp, "r")
    # label filters are semi-joins on the small label-id sets — before the
    # (i, o) self-join, so the join sides are already label-pruned
    dia_r = diamonds.join(
        reaction_ids.select(F.col("node_id").alias("r")).distinct(), "r", "left_semi"
    )
    dia_e = diamonds
    if event_ids is not None:
        dia_e = diamonds.join(
            event_ids.select(F.col("node_id").alias("r")).distinct(), "r", "left_semi"
        )
    out = (
        dia_r.join(dia_e.withColumnsRenamed({"r": "r2"}), ["i", "o"])
        .filter(F.col("r") != F.col("r2"))
        .select(F.col("r").alias("src"), F.col("r2").alias("dst"))
        .withColumn("rel_type", F.lit(out_rel))
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    return out, out.count()


def reify_pairs(
    to_edges: DataFrame,
    edges: DataFrame,
    first_rel: str = "INPUT",
    second_rel: str = "OUTPUT",
    species_rel: str = "SPECIES",
) -> tuple[DataFrame, DataFrame]:
    """J8 (post-import-cypher.txt:14): for (a)-[:TO]->(b) backed by
    (a)-[:INPUT]->(r)-[:OUTPUT]->(b) with (r)-[:SPECIES]->(s), create a
    reified To node keyed on (a, b) plus 4 edges VIA/VIA/RXN/SPECIES.

    Returns (to_nodes, to_edges_out).  The reified node id is deterministic
    (xxhash64 over endpoints) — the Cypher's ``To{between:id(a), and:id(b)}``
    keyed-merge semantics."""
    inp = edges.filter(F.col("rel_type") == first_rel).select(
        F.col("src").alias("a"), F.col("dst").alias("r")
    )
    outp = edges.filter(F.col("rel_type") == second_rel).select(
        F.col("src").alias("r"), F.col("dst").alias("b")
    )
    spec = edges.filter(F.col("rel_type") == species_rel).select(
        F.col("src").alias("r"), F.col("dst").alias("s")
    )
    pairs = to_edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    backed = (
        pairs.join(inp, "a")
        .join(outp, ["r", "b"])
        .join(spec, "r")
        .select("a", "b", "r", "s")
        .distinct()
        .withColumn("to_id", F.xxhash64(F.lit("To"), F.col("a"), F.col("b")))
    )
    to_nodes = backed.select(
        F.col("to_id").alias("node_id"),
        F.concat_ws("_", F.lit("To"), F.col("a"), F.col("b")).alias("name"),
        F.array(F.lit("To")).alias("labels"),
        F.map_from_arrays(
            F.array(F.lit("between"), F.lit("and")),
            F.array(F.col("a").cast("string"), F.col("b").cast("string")),
        ).alias("props"),
    ).dropDuplicates(["node_id"])
    e1 = backed.select(F.col("a").alias("src"), F.col("to_id").alias("dst"), F.lit("VIA").alias("rel_type"))
    e2 = backed.select(F.col("to_id").alias("src"), F.col("b").alias("dst"), F.lit("VIA").alias("rel_type"))
    e3 = backed.select(F.col("to_id").alias("src"), F.col("r").alias("dst"), F.lit("RXN").alias("rel_type"))
    e4 = backed.select(F.col("to_id").alias("src"), F.col("s").alias("dst"), F.lit("SPECIES").alias("rel_type"))
    return to_nodes, _dedup(e1.unionByName(e2).unionByName(e3).unionByName(e4))


def bounded_path_edges(
    edges: DataFrame,
    rel_types: list[str],
    max_hops: int,
    out_rel: str,
    start: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """J9 (post-import-cypher.txt:16-17): variable-length path join
    ``-[:R1|R2|R3*..k]->`` as an iterative frontier expansion (edge-list BFS),
    union of all 1..k-hop reachable pairs, deduped.

    ``start``: optional node_id frame restricting sources.  Each round is one
    join + dedup; k is small (<=3 in the reference) so the loop unrolls to a
    fixed DAG — no driver-side data movement."""
    step = (
        edges.filter(F.col("rel_type").isin(rel_types))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )
    if start is not None:
        frontier = (
            start.select(F.col("node_id").alias("a"))
            .join(step, "a")
            .select("a", "b")
        )
    else:
        frontier = step
    reached = frontier
    for _ in range(max_hops - 1):
        frontier = (
            frontier.select(F.col("b").alias("a0"), F.col("a"))
            .join(step.withColumnsRenamed({"a": "a0"}), "a0")
            .select("a", "b")
            .distinct()
        )
        reached = reached.unionByName(frontier).distinct()
    out = (
        reached.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .withColumn("rel_type", F.lit(out_rel))
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    return out, out.count()


def absorb_node_as_prop(
    nodes: DataFrame,
    edges: DataFrame,
    rel_type: str,
    prop_name: str,
) -> tuple[DataFrame, DataFrame, int]:
    """Property-absorb rewrite (import-cypher.txt:26, Taxon_2_crossReference):
    ``(n)-[:REL]->(m) set n.<prop> = m.name delete m`` — the target node is
    absorbed into a property on its source, then deleted along with the edge.

    When several m exist for one n the Cypher's repeated ``set`` is
    last-write-nondeterministic; here the minimum name wins (deterministic,
    order-free).  Any OTHER edges touching a deleted m are dropped too (the
    set-semantics reading of ``delete m``); their count is the caller's
    dangling metric.  Returns (nodes', edges', n_absorbed)."""
    rel = edges.filter(F.col("rel_type") == rel_type)
    names = nodes.select(F.col("node_id").alias("dst"), F.col("name").alias("_mname"))
    absorbed = (
        rel.join(names, "dst")
        .groupBy("src")
        .agg(F.min("_mname").alias("_val"))
        .select(F.col("src").alias("node_id"), "_val")
    )
    deleted = rel.select(F.col("dst").alias("node_id")).distinct()
    # NO broadcast hints here: `deleted`/`absorbed` scale with the edge
    # count (one row per absorbed node), not with a dimension table — at
    # 100 TB a forced broadcast would OOM the driver.  AQE picks broadcast
    # when they happen to be small.
    new_nodes = (
        nodes.join(deleted, "node_id", "left_anti")
        .join(absorbed, "node_id", "left")
        .withColumn(
            "props",
            F.when(
                F.col("_val").isNotNull(),
                F.map_concat(
                    F.map_filter(F.col("props"), lambda k, _: k != prop_name),
                    F.map_from_arrays(F.array(F.lit(prop_name)), F.array(F.col("_val"))),
                ),
            ).otherwise(F.col("props")),
        )
        .drop("_val")
    )
    del_ids = deleted.select(F.col("node_id").alias("_d"))
    new_edges = (
        edges.filter(F.col("rel_type") != rel_type)
        .join(del_ids, F.col("src") == F.col("_d"), "left_anti")
        .join(del_ids, F.col("dst") == F.col("_d"), "left_anti")
    )
    return new_nodes, new_edges, absorbed.count()


def collapse_node_to_edge(
    nodes: DataFrame,
    edges: DataFrame,
    sub_rel: str,
    obj_rel: str,
    out_rel: str,
    prop_name: str = "regulationType",
) -> tuple[DataFrame, DataFrame, int]:
    """De-reification (import-cypher.txt:24, Regulation): a mid node with
    ``(mid)-[:SUB]->(sub)`` and ``(mid)-[:OBJ]->(obj)`` collapses into one
    ``(sub)-[:OUT {prop: labels(mid)[0]}]->(obj)`` edge; mid (and its two
    edges) are deleted.  ``create unique`` = dedup on (sub, out_rel, obj).

    Returns (nodes', edges', n_collapsed)."""
    subs = edges.filter(F.col("rel_type") == sub_rel).select(
        F.col("src").alias("mid"), F.col("dst").alias("sub")
    )
    objs = edges.filter(F.col("rel_type") == obj_rel).select(
        F.col("src").alias("mid"), F.col("dst").alias("obj")
    )
    mid_label = nodes.select(
        F.col("node_id").alias("mid"),
        F.try_element_at("labels", F.lit(1)).alias("_lbl"),
    )
    collapsed = (
        subs.join(objs, "mid")
        .join(mid_label, "mid")  # same size class as the mid set — no hint
        .select("sub", "obj", "_lbl", "mid")
    )
    new_edges_rows = (
        collapsed.select(
            F.col("sub").alias("src"),
            F.col("obj").alias("dst"),
            F.lit(out_rel).alias("rel_type"),
            F.map_from_arrays(
                F.array(F.lit(prop_name)), F.array(F.coalesce("_lbl", F.lit("")))
            ).alias("props"),
        )
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    # mids scale with the Regulation row count — no broadcast hint (AQE
    # decides); see absorb_node_as_prop.
    mids = collapsed.select(F.col("mid").alias("node_id")).distinct()
    new_nodes = nodes.join(mids, "node_id", "left_anti")
    mid_ids = mids.select(F.col("node_id").alias("_d"))
    # delete ONLY edges incident to COLLAPSED mids (the Cypher match deletes
    # the matched mid and its two edges) — the previous global
    # rel_type-based filter also dropped sub_rel/obj_rel edges of mids that
    # never collapsed (only one of the two edges present), silently losing
    # relationships the rewrite should preserve
    keep_edges = (
        edges
        .join(mid_ids, F.col("src") == F.col("_d"), "left_anti")
        .join(mid_ids, F.col("dst") == F.col("_d"), "left_anti")
    )
    if "props" not in keep_edges.columns:
        keep_edges = keep_edges.withColumn(
            "props", F.create_map().cast("map<string,string>")
        )
    new_edges = keep_edges.select("src", "dst", "rel_type", "props").unionByName(
        new_edges_rows.select("src", "dst", "rel_type", "props")
    )
    return new_nodes, new_edges, new_edges_rows.count()


def bridge_by_name(
    nodes_a: DataFrame,
    nodes_b: DataFrame,
    out_rel: str = "DATABASE_BRIDGE",
) -> tuple[DataFrame, int]:
    """J10 (post-import-cypher.txt:21-23): value-equality bridge between two
    node families — ``i.name = str(t._id)`` / ``i.name = e.name`` — an
    equi-join on (cast) name producing bridge edges."""
    a = nodes_a.select(F.col("node_id").alias("src"), F.col("name").cast("string").alias("_k"))
    b = nodes_b.select(F.col("node_id").alias("dst"), F.col("name").cast("string").alias("_k"))
    out = (
        a.join(b, "_k")
        .select("src", "dst")
        .withColumn("rel_type", F.lit(out_rel))
        .dropDuplicates(["src", "rel_type", "dst"])
    )
    return out, out.count()
