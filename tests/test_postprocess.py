"""Post-import rewrite tests (the Cypher-phase analogs, SURVEY.md §2.8)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graphene_spark import postprocess as pp


@pytest.fixture(scope="module")
def small_graph(spark):
    # s1-INPUT->r1-OUTPUT->p1 ; common-INPUT->r1 ; r1-SPECIES->sp
    nodes = spark.createDataFrame(
        [
            (1, "s1", ["PhysicalEntity"]),
            (2, "r1", ["Event"]),
            (3, "p1", ["PhysicalEntity"]),
            (4, "H2O something", ["PhysicalEntity"]),
            (5, "sp", ["Species"]),
        ],
        schema="node_id long, name string, labels array<string>",
    )
    edges = spark.createDataFrame(
        [
            (1, 2, "INPUT"),
            (4, 2, "INPUT"),
            (2, 3, "OUTPUT"),
            (2, 4, "OUTPUT"),
            (2, 5, "SPECIES"),
        ],
        schema="src long, dst long, rel_type string",
    )
    return nodes, edges


def test_flag_common(spark, small_graph):
    nodes, _ = small_graph
    flagged = pp.flag_common(
        nodes,
        ["H2O.*", "ATP.*"],
        exclude_patterns=[".*ase.*"],
    )
    got = {r["name"]: r["common"] for r in flagged.collect()}
    assert got["H2O something"] is True
    assert got["s1"] is False  # defaulting: everyone else false


def test_two_hop_excludes_common(spark, small_graph):
    nodes, edges = small_graph
    common = pp.flag_common(nodes, ["H2O.*"]).filter("common").select("node_id")
    out, n = pp.two_hop_edges(
        edges, "INPUT", "OUTPUT", "TO", excluded_ends=common
    )
    got = {(r["src"], r["dst"]) for r in out.collect()}
    # s1->p1 kept; anything touching node 4 (common) excluded
    assert got == {(1, 3)}
    assert n == 1


def test_flip_edges(spark):
    edges = spark.createDataFrame(
        [(2, 1, "INPUT"), (1, 2, "INPUT"), (1, 3, "OTHER")],
        schema="src long, dst long, rel_type string",
    )
    flipped = pp.flip_edges(edges, "INPUT")
    got = {(r["src"], r["dst"], r["rel_type"]) for r in flipped.collect()}
    assert got == {(1, 2, "INPUT"), (2, 1, "INPUT"), (1, 3, "OTHER")}


def test_reify_pairs(spark, small_graph):
    nodes, edges = small_graph
    to_edges = spark.createDataFrame(
        [(1, 3, "TO")], schema="src long, dst long, rel_type string"
    )
    to_nodes, out_edges = pp.reify_pairs(to_edges, edges)
    assert to_nodes.count() == 1
    rels = {r["rel_type"] for r in out_edges.collect()}
    assert rels == {"VIA", "RXN", "SPECIES"}
    assert out_edges.count() == 4  # a->to, to->b, to->r, to->s
    props = to_nodes.collect()[0]["props"]
    assert props == {"between": "1", "and": "3"}


def test_bounded_path_edges(spark):
    # chain a->b->c->d->e via mixed rel types; *..3 reaches a->d but not a->e
    edges = spark.createDataFrame(
        [(1, 2, "HAS_MEMBER"), (2, 3, "HAS_COMPONENT"), (3, 4, "REFERENCE_ENTITY"), (4, 5, "HAS_MEMBER")],
        schema="src long, dst long, rel_type string",
    )
    start = spark.createDataFrame([(1,)], schema="node_id long")
    out, n = pp.bounded_path_edges(
        edges, ["HAS_MEMBER", "HAS_COMPONENT", "REFERENCE_ENTITY"], 3, "ENCODED_BY", start=start
    )
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {(1, 2), (1, 3), (1, 4)}


def test_bridge_by_name(spark):
    a = spark.createDataFrame([(1, "42"), (2, "x")], schema="node_id long, name string")
    b = spark.createDataFrame([(10, "42"), (11, "y")], schema="node_id long, name string")
    out, n = pp.bridge_by_name(a, b)
    assert n == 1
    r = out.collect()[0]
    assert (r["src"], r["dst"], r["rel_type"]) == (1, 10, "DATABASE_BRIDGE")


def test_absorb_node_as_prop(spark):
    """import-cypher.txt:26 Taxon_2_crossReference: set n.xref = m.name,
    delete m and the edge; other edges to m are dropped as dangling."""
    nodes = spark.createDataFrame(
        [(1, "TaxA", ["Taxon"], {}), (2, "TaxB", ["Taxon"], {"k": "v"}),
         (10, "UniProt:P1", ["XRef"], {}), (11, "UniProt:P2", ["XRef"], {})],
        "node_id long, name string, labels array<string>, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, 10, "XREF"), (2, 11, "XREF"), (1, 2, "SUPER_TAXON"), (2, 10, "OTHER")],
        "src long, dst long, rel_type string",
    )
    n2, e2, cnt = pp.absorb_node_as_prop(nodes, edges, "XREF", "xref")
    assert cnt == 2
    got = {r["node_id"]: r for r in n2.collect()}
    assert set(got) == {1, 2}  # xref value nodes deleted
    assert got[1]["props"]["xref"] == "UniProt:P1"
    assert got[2]["props"] == {"k": "v", "xref": "UniProt:P2"}
    rem = {(r["src"], r["dst"], r["rel_type"]) for r in e2.collect()}
    # the XREF edges are gone AND the stray OTHER edge to deleted node 10 drops
    assert rem == {(1, 2, "SUPER_TAXON")}


def test_collapse_node_to_edge(spark):
    """import-cypher.txt:24 Regulation: mid node becomes a REGULATES edge
    carrying the mid's first label; duplicates create-unique dedup."""
    nodes = spark.createDataFrame(
        [(1, "sub", ["Entity"], {}), (2, "obj", ["Entity"], {}),
         (100, "reg1", ["PositiveRegulation", "Regulation"], {}),
         (101, "reg2", ["PositiveRegulation"], {})],
        "node_id long, name string, labels array<string>, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(100, 1, "REGULATOR"), (100, 2, "REGULATED"),
         (101, 1, "REGULATOR"), (101, 2, "REGULATED"),
         (1, 2, "XREF")],
        "src long, dst long, rel_type string",
    )
    n2, e2, cnt = pp.collapse_node_to_edge(
        nodes, edges, "REGULATOR", "REGULATED", "REGULATES"
    )
    assert cnt == 1  # create unique: both mids collapse onto one edge
    assert {r["node_id"] for r in n2.collect()} == {1, 2}
    rows = {(r["src"], r["dst"], r["rel_type"]): r for r in e2.collect()}
    assert set(rows) == {(1, 2, "XREF"), (1, 2, "REGULATES")}
    assert rows[(1, 2, "REGULATES")]["props"]["regulationType"] == "PositiveRegulation"


def test_metabolite_link(spark):
    """post-import-cypher.txt:19 — diamond (i)-[:INPUT]->(r:Reaction)
    -[:OUTPUT]->(o) with (i)-[:INPUT]->(r2:Event)-[:OUTPUT]->(o)."""
    # i=1 feeds r=10 (Reaction) and r2=20 (plain Event); both output o=100
    # i=2 feeds r=11 and r3=12 (both Reactions, both Events); both output 101
    # i=3 is common: its diamond with (r=13, r2=21) must be excluded
    # i=4 feeds r=14 and e=22, but they output DIFFERENT o — no link
    edges = spark.createDataFrame(
        [(1, 10, "INPUT"), (10, 100, "OUTPUT"),
         (1, 20, "INPUT"), (20, 100, "OUTPUT"),
         (2, 11, "INPUT"), (11, 101, "OUTPUT"),
         (2, 12, "INPUT"), (12, 101, "OUTPUT"),
         (3, 13, "INPUT"), (13, 102, "OUTPUT"),
         (3, 21, "INPUT"), (21, 102, "OUTPUT"),
         (4, 14, "INPUT"), (14, 103, "OUTPUT"),
         (4, 22, "INPUT"), (22, 104, "OUTPUT")],
        "src long, dst long, rel_type string",
    )
    reactions = spark.createDataFrame([(10,), (11,), (12,), (13,), (14,)], "node_id long")
    events = spark.createDataFrame(
        [(10,), (11,), (12,), (13,), (14,), (20,), (21,), (22,)], "node_id long"
    )
    common = spark.createDataFrame([(3,)], "node_id long")
    out, cnt = pp.metabolite_link(edges, reactions, events, common)
    got = {(r["src"], r["dst"]) for r in out.collect()}
    # r=10 links to event 20; reactions 11<->12 link BOTH ways (each is also
    # an Event); nothing from the common i=3 or the mismatched-output i=4
    assert got == {(10, 20), (11, 12), (12, 11)}
    assert cnt == 3
    # without the common exclusion the i=3 diamond appears
    out2, cnt2 = pp.metabolite_link(edges, reactions, events, None)
    assert cnt2 == 4
    got2 = {(r["src"], r["dst"]) for r in out2.collect()}
    assert (13, 21) in got2


def test_collapse_preserves_uncollapsed_mid_edges(spark):
    """A mid node with only ONE of the two pattern edges must keep its node
    AND its edge — the rewrite deletes only matched mids (Cypher match
    semantics), not every sub_rel/obj_rel edge globally."""
    nodes = spark.createDataFrame(
        [(10, "regA", ["Positive", "Regulation"], {}),
         (11, "regB", ["Negative", "Regulation"], {})],
        "node_id long, name string, labels array<string>, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(10, 1, "REGULATOR"), (10, 2, "REGULATED"),   # full diamond: collapses
         (11, 3, "REGULATOR")],                        # half pattern: must survive
        "src long, dst long, rel_type string",
    )
    nodes2, edges2, n = pp.collapse_node_to_edge(
        nodes, edges, "REGULATOR", "REGULATED", "REGULATES"
    )
    assert n == 1
    kept = {(r["src"], r["dst"], r["rel_type"]) for r in edges2.collect()}
    assert (11, 3, "REGULATOR") in kept
    assert {r["node_id"] for r in nodes2.collect()} == {11}


def test_hub_exclusion_bounds_pairs_at_10x_skew(spark):
    """The common-flag exclusion's scale property, pinned in CI: scaling a
    hub's degree 10x must leave the GUARDED two_hop/metabolite outputs
    exactly flat, while the unguarded hub term grows quadratically (the
    full-size evidence lives in BENCH/SKEW.md via scripts/bench_skew.py)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import bench_skew

    hub = spark.createDataFrame([("name_hub",)], "node_id string")
    common = spark.createDataFrame([("ATP",), ("H2O",)], "node_id string")
    counts = {}
    for label, d in (("base", 5), ("10x", 50)):
        edges = bench_skew._two_hop_fixture(spark, n_entities=200, n_names=50, hot_degree=d)
        _, counts[f"th_{label}_g"] = pp.two_hop_edges(
            edges, "SYNONYM", "SYNONYM_OF", "SAME_AS", excluded_mid=hub
        )
        _, counts[f"th_{label}_u"] = pp.two_hop_edges(
            edges, "SYNONYM", "SYNONYM_OF", "SAME_AS"
        )
        medges, reactions = bench_skew._metabolite_fixture(
            spark, n_reactions=200, n_metabolites=20, hot_degree=d
        )
        _, counts[f"mb_{label}_g"] = pp.metabolite_link(
            medges, reactions, common_ids=common
        )
        _, counts[f"mb_{label}_u"] = pp.metabolite_link(medges, reactions)
    # guarded: exactly flat under 10x hub degree
    assert counts["th_10x_g"] == counts["th_base_g"]
    assert counts["mb_10x_g"] == counts["mb_base_g"]
    # unguarded: the hub term is quadratic (50^2 vs 5^2 dominates regular
    # pairs).  two_hop is exact (hub entities are disjoint from regular
    # ones); metabolite hub pairs partially coincide with mixed
    # hub-input/regular-output pairs after the (src, rel, dst) dedup, so
    # assert the quadratic-scale lower bound instead of exact arithmetic.
    assert counts["th_10x_u"] - counts["th_base_u"] == 50 * 50 - 5 * 5
    assert counts["mb_10x_u"] - counts["mb_base_u"] >= (50 * 50 - 50) * 0.8
