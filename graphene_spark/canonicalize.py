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


def _freeze_converged(cur: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Split ``cur`` into (still-active edges, newly-frozen edges, n_frozen).

    A dst-group {(v_1..v_m) -> c} is a CLOSED STAR when none of its nodes
    touches any other edge (each member has exactly one outgoing edge and no
    incoming; the center has no outgoing) and the center is the group minimum.
    A closed star is exactly the per-component fixpoint of the alternating
    large-/small-star round (both rounds map it to itself, and star rounds
    never move edges across components — every join/groupBy stays inside the
    component), so its edges are final member->component rows and can be
    dropped from all later rounds.  This is what cuts the long tail on
    high-diameter graphs: the low-diameter bulk converges in a few rounds and
    stops paying for the O(log n) rounds the worst component still needs
    (measured in BENCH/NOTES.md, scripts/bench_cc.py --freeze A/B).
    """
    ends = cur.select(
        F.col("src").alias("id"), F.lit(1).alias("s"), F.lit(0).alias("d")
    ).unionByName(
        cur.select(F.col("dst").alias("id"), F.lit(0).alias("s"), F.lit(1).alias("d"))
    )
    stats = ends.groupBy("id").agg(
        F.sum("s").alias("n_src"), F.sum("d").alias("n_dst")
    )
    tagged = cur.join(
        stats.withColumnRenamed("id", "src"), "src"
    ).join(
        stats.select(F.col("id").alias("dst"), F.col("n_src").alias("c_out")),
        "dst",
    )
    frozen_centers = (
        tagged.groupBy("dst")
        .agg(
            F.min(
                F.when((F.col("n_src") == 1) & (F.col("n_dst") == 0), 1).otherwise(0)
            ).alias("members_ok"),
            F.max("c_out").alias("c_out"),  # constant per dst group
            F.min("src").alias("min_src"),
        )
        .filter(
            (F.col("members_ok") == 1)
            & (F.col("c_out") == 0)
            & (F.col("min_src") > F.col("dst"))
        )
        .select("dst", F.lit(1).alias("_frozen"))
    )
    marked = cur.join(frozen_centers, "dst", "left").localCheckpoint()
    newly = marked.filter(F.col("_frozen") == 1).drop("_frozen")
    active = marked.filter(F.col("_frozen").isNull()).drop("_frozen")
    return active, newly, newly.count()


def connected_components_with_stats(
    edges: DataFrame, max_iter: int = 30, freeze_every: int = 2
) -> tuple[DataFrame, int]:
    """``connected_components`` plus the number of star rounds executed.

    The round count is the scale-critical quantity: each round costs two
    shuffles over the edge list, so a graph that needs R rounds costs ~2R
    edge shuffles end to end.  Theory bound is O(log^2 n) (Kiveris et al.,
    SOCC'14 Thm 2); in practice alternating rounds track ~log2(n) even on
    path graphs — pinned at 10M-edge scale by
    tests/test_graph.py::test_cc_rounds_bounded_at_scale and measured in
    BENCH/NOTES.md (scripts/bench_cc.py).

    ``freeze_every``: every K rounds, closed-star components (already at
    their per-component fixpoint, see ``_freeze_converged``) are moved out of
    the active edge set, so late rounds shuffle only the components still in
    flight — the round COUNT is set by the worst component either way, but
    the per-round volume collapses once the low-diameter bulk converges.
    0 disables (the pre-round-6 behavior).  Output is identical either way.
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
    frozen: list[DataFrame] = []
    prev_sig = None
    rounds = 0
    for _ in range(max_iter):
        # large-star consumes a symmetric adjacency list; small-star orients
        # internally (greatest/least), so no symmetrize between them
        cur = _small_star(_large_star(_symmetrize(cur))).localCheckpoint()
        rounds += 1
        if freeze_every and rounds % freeze_every == 0:
            cur, newly, n_new = _freeze_converged(cur)
            if n_new:
                frozen.append(newly)
                prev_sig = None  # active set changed shape; resync signature
        # fixpoint signature: star edges are (node -> center); stable when the
        # multiset of edges stops changing
        sig = cur.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),  # overflow-safe set hash
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig or sig[0] == 0:
            break
        prev_sig = sig
    # final star edges map member -> center (component min)
    all_edges = cur
    for fr in frozen:
        all_edges = all_edges.unionByName(fr)
    members = all_edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    result = (
        vertices.join(members, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    return result, rounds


def connected_components(
    edges: DataFrame, max_iter: int = 30, freeze_every: int = 2
) -> DataFrame:
    """edges(src bigint, dst bigint) -> (id bigint, component bigint).

    Alternating large-star / small-star (Kiveris et al., SOCC'14): converges
    in O(log^2 n) rounds to a star graph whose centers are component minima.
    component = min node id reachable.  Undirected; self-loops ignored.
    localCheckpoint each round truncates lineage so the plan stays bounded.
    Converged (closed-star) components leave the active set every
    ``freeze_every`` rounds — output-invariant, see ``_freeze_converged``.
    """
    result, _ = connected_components_with_stats(
        edges, max_iter=max_iter, freeze_every=freeze_every
    )
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
