"""Canonicalization: connected components over the alias graph.

The reference canonicalizes by mutating one shared NodeCache (first writer
creates, later writers merge — Importer.groovy:97-123).  At scale that is a
connected-components problem: entities joined by shared aliases / SYNONYM
triples form components; the canonical id is the component minimum.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) expressed as DataFrame
self-joins, iterated to fixpoint with localCheckpoint each round to truncate
lineage (SURVEY.md §4 'custom piece (2)').  Converges in O(log^2 n) rounds;
each round is two shuffles on the edge list.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import rules


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """Large-star round: connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u})."""
    mins = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round over edges oriented large->small: connect each small
    neighbor (and u itself) to the minimum of the small neighborhood."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    mins = oriented.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    nbr_edges = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        nbr_edges.unionByName(self_edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components_with_stats(
    edges: DataFrame, max_iter: int = 30
) -> tuple[DataFrame, int]:
    """``connected_components`` plus the number of star rounds executed.

    The round count is the scale-critical quantity: each round costs two
    shuffles over the edge list, so a graph that needs R rounds costs ~2R
    edge shuffles end to end.  Theory bound is O(log^2 n) (Kiveris et al.,
    SOCC'14 Thm 2); in practice alternating rounds track ~log2(n) even on
    path graphs — pinned at 10M-edge scale by
    tests/test_graph.py::test_cc_rounds_bounded_at_scale and measured in
    BENCH/NOTES.md (scripts/bench_cc.py).
    """
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    cur = _symmetrize(e).localCheckpoint()
    prev_sig = None
    rounds = 0
    for _ in range(max_iter):
        # large-star consumes a symmetric adjacency list; small-star orients
        # internally (greatest/least), so no symmetrize between them
        cur = _small_star(_large_star(_symmetrize(cur))).localCheckpoint()
        rounds += 1
        # fixpoint signature: star edges are (node -> center); stable when the
        # multiset of edges stops changing
        sig = cur.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),  # overflow-safe set hash
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # final star edges map member -> center (component min)
    members = cur.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    result = (
        vertices.join(members, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return result, rounds


def connected_components(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """edges(src bigint, dst bigint) -> (id bigint, component bigint).

    Alternating large-star / small-star (Kiveris et al., SOCC'14): converges
    in O(log^2 n) rounds to a star graph whose centers are component minima.
    component = min node id reachable.  Undirected; self-loops ignored.
    localCheckpoint each round truncates lineage so the plan stays bounded.
    """
    result, _ = connected_components_with_stats(edges, max_iter=max_iter)
    return result


def canonical_entities(dictionary: DataFrame, synonym_pairs: DataFrame | None = None) -> DataFrame:
    """Assign a canonical_id to every entity: entities sharing a normalized
    alias (or linked by SYNONYM evidence) collapse to one component.

    dictionary: entity_id, canonical_name, aliases array<string>
    synonym_pairs: optional (entity_a bigint, entity_b bigint) extra evidence
    returns: entity_id, canonical_id
    """
    am = (
        dictionary.select("entity_id", F.explode("aliases").alias("alias"))
        .withColumn(
            "alias_norm",
            F.trim(F.regexp_replace(F.lower(F.col("alias")), rules.GAP_CLASS, " ")),
        )
        # aliases that normalize to '' ('-', '_', whitespace) carry no
        # identity: without this filter every entity holding one would merge
        # into a single component (rules.build_gazetteer_regex applies the
        # same guard to the matcher side)
        .filter(F.col("alias_norm") != "")
    )
    # entities sharing an alias -> edge between entity ids via min-entity per alias
    per_alias = am.groupBy("alias_norm").agg(F.min("entity_id").alias("rep"))
    edges = (
        am.join(per_alias, "alias_norm")
        .select(F.col("entity_id").alias("src"), F.col("rep").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if synonym_pairs is not None:
        edges = edges.unionByName(
            synonym_pairs.select(
                F.col("entity_a").cast("long").alias("src"),
                F.col("entity_b").cast("long").alias("dst"),
            )
        )
    cc = connected_components(edges)
    all_ids = dictionary.select(F.col("entity_id").cast("long").alias("id")).distinct()
    return (
        all_ids.join(cc, "id", "left")
        .select(
            F.col("id").alias("entity_id"),
            F.coalesce("component", "id").alias("canonical_id"),
        )
    )
