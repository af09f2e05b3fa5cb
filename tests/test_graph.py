"""Node/edge build + adjacency window + connected components."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graphene_spark import canonicalize, graph


def test_build_nodes_label_union_and_prop_merge(spark):
    """A2 last-writer-wins prop merge + A3 label union."""
    cand = spark.createDataFrame(
        [
            ("Gene", "g1", {"a": "1", "b": "old"}, 0),
            ("Protein", "g1", {"b": "new", "c": "3"}, 1),
            ("Gene", "g2", {"x": "9"}, 0),
        ],
        schema="label string, name string, props map<string,string>, seq long",
    )
    nodes = {r["name"]: r for r in graph.build_nodes(cand).collect()}
    assert nodes["g1"]["labels"] == ["Gene", "Protein"]
    assert nodes["g1"]["props"] == {"a": "1", "b": "new", "c": "3"}
    assert nodes["g2"]["props"] == {"x": "9"}
    assert nodes["g1"]["node_id"] != nodes["g2"]["node_id"]


def test_build_edges_dangling_dropped(spark):
    cand = spark.createDataFrame(
        [("g1", "g2", "REL", None), ("g1", "missing", "REL", None)],
        schema="src_name string, dst_name string, rel_type string, props map<string,string>",
    )
    nodes = graph.build_nodes(
        spark.createDataFrame(
            [("L", "g1", None, 0), ("L", "g2", None, 0)],
            schema="label string, name string, props map<string,string>, seq long",
        )
    )
    edges, dangling = graph.build_edges(cand, nodes)
    assert edges.count() == 1
    assert dangling.count() == 1  # logged-and-dropped, Loader.groovy:45-47


def test_adjacency_first_next_last(spark):
    """GeneLoader.groovy:53-69 chain semantics on a known ordered fixture."""
    df = spark.createDataFrame(
        [("r1", 10, "a"), ("r1", 20, "b"), ("r1", 30, "c"), ("r2", 5, "x")],
        schema="region string, start int, gene string",
    )
    edges = {
        (r["src_name"], r["rel_type"], r["dst_name"])
        for r in graph.adjacency_edges(df, "region", "start", "gene").collect()
    }
    assert edges == {
        ("r1", "FIRST", "a"),
        ("a", "NEXT", "b"),
        ("b", "NEXT", "c"),
        ("r1", "LAST", "c"),
        ("r2", "FIRST", "x"),
        ("r2", "LAST", "x"),
    }


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7)], schema="src long, dst long"
    )
    cc = {r["id"]: r["component"] for r in canonicalize.connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[5] == cc[6] == 5
    assert 7 not in cc  # self-loop only -> no edges -> caller coalesces to self


def test_connected_components_chain(spark):
    # long chain exercises multiple propagation rounds
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], schema="src long, dst long"
    )
    cc = {r["id"]: r["component"] for r in canonicalize.connected_components(edges).collect()}
    assert all(c == 0 for c in cc.values())
    assert len(cc) == n + 1


def test_canonical_entities_shared_alias(spark):
    d = spark.createDataFrame(
        [
            (10, "A", ["A", "shared x"]),
            (20, "B", ["B", "SHARED_X"]),  # normalizes onto the same alias
            (30, "C", ["C"]),
        ],
        schema="entity_id long, canonical_name string, aliases array<string>",
    )
    got = {r["entity_id"]: r["canonical_id"] for r in canonicalize.canonical_entities(d).collect()}
    assert got[10] == got[20] == 10
    assert got[30] == 30


def test_canonicalize_ignores_identity_free_aliases(spark):
    """Aliases normalizing to '' ('-', '_', whitespace) must not merge
    unrelated entities into one component."""
    from graphene_spark import canonicalize

    dic = spark.createDataFrame(
        [(1, "Aspirin", ["aspirin", "-"], "Drug", False),
         (2, "Zinc", ["zinc", "_"], "Element", False),
         (3, "Iron", ["iron", "  "], "Element", False)],
        "entity_id long, canonical_name string, aliases array<string>, "
        "entity_type string, is_hot boolean",
    )
    out = {r["entity_id"]: r["canonical_id"]
           for r in canonicalize.canonical_entities(dic).collect()}
    assert out == {1: 1, 2: 2, 3: 3}


@pytest.mark.slow
def test_cc_rounds_bounded_at_scale(spark):
    """Star-contraction depth pin at scale (round-4 VERDICT task #4): on a
    skewed component mix — one giant PATH component (the depth worst case)
    plus stars/triangles/pairs — rounds-to-fixpoint must stay within
    ceil(log2(n_nodes)) + 2, and the full component-size multiset must match
    the construction exactly.  A regression to propagation-style CC (rounds
    ~ diameter) fails this immediately: the giant path's diameter is ~6000x
    the bound.  Full 10.4M-edge evidence: scripts/bench_cc.py + BENCH/NOTES.md
    (same harness, scale 1.0)."""
    import importlib.util
    import math
    import os

    import pyspark.sql.functions as F

    from graphene_spark import canonicalize

    spec = importlib.util.spec_from_file_location(
        "bench_cc",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "bench_cc.py"),
    )
    bench_cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_cc)

    scale = float(os.environ.get("TEST_CC_SCALE", "0.05"))  # ~520k edges
    edges, expected = bench_cc.build_skewed_edges(spark, scale)
    cc, rounds = canonicalize.connected_components_with_stats(
        edges.repartition(32), max_iter=40
    )
    sizes = {
        r["sz"]: r["n_comp"]
        for r in cc.groupBy("component").agg(F.count("*").alias("sz"))
        .groupBy("sz").agg(F.count("*").alias("n_comp")).collect()
    }
    n_nodes = sum(sz * n for sz, n in expected.items())
    assert sizes == expected
    assert rounds <= math.ceil(math.log2(n_nodes)) + 2, (
        f"{rounds} rounds at {n_nodes} nodes exceeds the log2(n)+2 envelope"
    )


def test_cc_freeze_converged_equivalence(spark):
    """Early-termination (round-6): freezing closed-star components out of
    later rounds must be output-invariant.  A closed star is a per-component
    fixpoint of the alternating star round, so removing it early can change
    WHEN work happens but never the final membership.  Property-checked on
    seeded random graphs (where freeze opportunities appear at staggered
    rounds) plus a worst-case mix of one long path (freezes last) and many
    small components (freeze in round ~2)."""
    import random

    rng = random.Random(63)
    cases = []
    for _ in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
        cases.append(edges)
    # staggered-convergence mix: path of 60 + 20 pairs + 10 triangles
    mix = [(1000 + i, 1000 + i + 1) for i in range(59)]
    mix += [(2000 + 2 * i, 2000 + 2 * i + 1) for i in range(20)]
    for t in range(10):
        b = 3000 + 3 * t
        mix += [(b, b + 1), (b + 1, b + 2), (b + 2, b)]
    cases.append(mix)

    for edges in cases:
        df = spark.createDataFrame(edges, schema="src long, dst long")
        baseline, r0 = canonicalize.connected_components_with_stats(
            df, freeze_every=0
        )
        base = {r["id"]: r["component"] for r in baseline.collect()}
        for k in (1, 2, 3):
            got_df, rk = canonicalize.connected_components_with_stats(
                df, freeze_every=k
            )
            got = {r["id"]: r["component"] for r in got_df.collect()}
            assert got == base, f"freeze_every={k} changed components"
            assert rk <= r0 + 1, (rk, r0)  # all-frozen empty-set exit may differ by <=1
