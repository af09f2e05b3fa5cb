"""Generate frozen VALUES oracles for the kg_* driver-contract queries.

The kg_* queries in ``__spark_entry__.py`` run on deterministic synthetic
fixtures (seed 42), so their answers are constants.  This script computes
those answers INDEPENDENTLY of the Spark implementation — the frozen
single-process oracle walker (graphene_spark/oracle.py), a plain union-find,
and brute-force character-3-gram Jaccard — and freezes them into
``graphene_spark/kg_expected.py``.  ``oracle_sql()`` renders them as DuckDB
``VALUES`` oracles, which turns the previously rows-only kg queries into
fully hash-checked CORRECTNESS rows (VERDICT.md round-1 item #1).

Run: python scripts/gen_kg_oracles.py   (re-run whenever the frozen grammar
or the fixtures change; tests/test_entry.py fails loudly on drift).

No Spark is imported here — that is the point: the expected rows must come
from an implementation that shares nothing with the DataFrame pipeline
except the frozen rules module (the same split the P/R oracle uses).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from graphene_spark import datagen, oracle, rules  # noqa: E402

OUT_PATH = os.path.join(ROOT, "graphene_spark", "kg_expected.py")

# ---------------------------------------------------------------------------
# fixtures — MUST mirror the q_kg_* query fixtures in __spark_entry__.py
# ---------------------------------------------------------------------------

DIC = datagen.make_entity_dictionary(n_entities=100, n_hot=5, seed=42)
TX = datagen.make_transcripts(
    n_convs=40, turns_per_conv=20, n_entities=100, n_hot=5, seed=42
)
ORC = oracle.run_oracle(TX, DIC)


def kg_triples_rows() -> list[tuple]:
    """The frozen walker's triple set, first-provenance-wins (walk order)."""
    return [
        (r.subj, r.pred, r.obj, r.conv_id, int(r.turn_idx))
        for r in ORC.triples.itertuples(index=False)
    ]


def _obj_label(pred: str, obj: str) -> str:
    """Object-node label rule (pipeline.py obj_nodes spec): XREF -> key,
    HAS_RANK -> Rank, SYNONYM -> Name, else namespace prefix."""
    if pred == "XREF":
        return obj.split(":", 1)[0]
    if pred == "HAS_RANK":
        return "Rank"
    if pred == "SYNONYM":
        return "Name"
    return obj.split(":", 1)[0]


def kg_nodes_rows() -> list[tuple]:
    """(name, labels ';'-joined sorted set) — entity nodes from linked
    mentions plus object nodes from triples, exact-name grouped."""
    etype = {int(r.entity_id): r.entity_type for r in DIC.itertuples()}
    canon = {int(r.entity_id): r.canonical_name for r in DIC.itertuples()}
    labels: dict[str, set[str]] = defaultdict(set)
    for r in ORC.mentions.itertuples(index=False):
        if r.entity_id >= 0:
            labels[canon[int(r.entity_id)]].add(etype[int(r.entity_id)])
    for r in ORC.triples.itertuples(index=False):
        labels[r.obj].add(_obj_label(r.pred, r.obj))
    return sorted((name, ";".join(sorted(ls))) for name, ls in labels.items())


def kg_edges_rows() -> list[tuple]:
    """(src_name, rel_type, dst_name) distinct — every triple endpoint has a
    node by construction (subject = linked mention's canonical name, object
    creates its own node), so nothing dangles on this fixture."""
    return sorted({(r.subj, r.pred, r.obj) for r in ORC.triples.itertuples(index=False)})


# ---------------------------------------------------------------------------
# connected components — alias-sharing fixture (union-find ground truth)
# ---------------------------------------------------------------------------

CC_N = 30  # mirrors q_kg_connected_components: entity i shares alias with i//3 group


def cc_fixture_aliases(i: int) -> list[str]:
    return [f"e{i:03d}", f"shared {i // 3:02d}"]


def kg_cc_rows() -> list[tuple]:
    parent = list(range(CC_N))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_alias: dict[str, list[int]] = defaultdict(list)
    for i in range(CC_N):
        for a in cc_fixture_aliases(i):
            by_alias[rules.normalize_alias(a)].append(i)
    for members in by_alias.values():
        for m in members[1:]:
            union(members[0], m)
    return [(i, find(i)) for i in range(CC_N)]


# ---------------------------------------------------------------------------
# fuzzy link — brute-force 3-gram Jaccard ground truth
# ---------------------------------------------------------------------------


def _shingles(s: str, n: int = 3) -> frozenset[str]:
    s = s.lower()
    if len(s) <= n:
        return frozenset([s])
    return frozenset(s[i : i + n] for i in range(len(s) - n + 1))


def _jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


FUZZY_N_ENTITIES = 50
FUZZY_THRESHOLD = 0.4
FUZZY_N_MENTIONS = 20


def kg_fuzzy_rows() -> list[tuple]:
    """Ground truth for q_kg_fuzzy_link: for each corrupted mention, the
    best (max-jaccard, min-entity-id) dictionary alias with j >= threshold,
    over ALL aliases — no blocking.  The LSH query must equal this exactly
    (i.e. its blocking must have perfect recall on this fixture, which
    tests/test_entry.py re-verifies on every run)."""
    fdic = datagen.make_entity_dictionary(n_entities=FUZZY_N_ENTITIES, n_hot=3, seed=42)
    alias_sh = [
        (int(r.entity_id), r.canonical_name, _shingles(a))
        for r in fdic.itertuples()
        for a in r.aliases
    ]
    out = []
    for i in range(FUZZY_N_MENTIONS):
        norm = f"entity {i:05d}zz"
        msh = _shingles(norm)
        best = None  # (jaccard, -entity_id) max
        for eid, cname, ash in alias_sh:
            j = _jaccard(msh, ash)
            if j >= FUZZY_THRESHOLD and (
                best is None or (j, -eid) > (best[0], -best[1])
            ):
                best = (j, eid, cname)
        if best is not None:
            out.append((f"c{i}", i, best[1], best[2]))
    return out


# ---------------------------------------------------------------------------
# SimHash dedup — pure-Python ground truth over an inline doc fixture
# ---------------------------------------------------------------------------

# Mirrors the q_tdp_simhash_dedup fixture in __spark_entry__.py exactly.
SIMHASH_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend today"),
    (3, "a completely different sentence about spark dataframes and shuffles"),
    (4, "a completely different sentence about spark dataframes and shuffles"),
    (5, "unrelated text mentioning minhash lsh bands and jaccard verification"),
    (6, "the quick brown fox leaps over the lazy dog near the river bank today"),
    (7, "short text"),
    (8, "short text"),
]
SIMHASH_MAX_HAMMING = 3


def _norm_words(text: str) -> list[str]:
    import re as _re

    return _re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _word_shingles_py(text: str, n: int) -> list[str]:
    """Mirror of tdp.dedup.word_shingles: <=n words -> whole text, else
    distinct n-gram joins (order-preserving distinct like array_distinct)."""
    w = _norm_words(text)
    if len(w) <= n:
        grams = [" ".join(w)]
    else:
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    return list(dict.fromkeys(grams))


def _simhash_py(text: str) -> int:
    """Pure-Python mirror of the 64-bit SimHash spec (crc32 pair per 2-gram
    shingle, per-bit majority vote) — independent of the Spark/numpy code."""
    from zlib import crc32

    sh = _word_shingles_py(text, 2)
    votes = [0] * 64
    for s in sh:
        h = (crc32(s.encode()) << 32) | crc32(s[::-1].encode())
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    # interpret as signed int64 (Spark long)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def tdp_simhash_rows() -> list[tuple]:
    """All pairs within hamming <= 3.  The 4x16-bit band blocking is lossless
    for this filter (pigeonhole: hamming <= 3 over 4 bands forces an exact
    band match), so LSH output == this exhaustive ground truth."""
    sigs = {i: _simhash_py(t) for i, t in SIMHASH_DOCS}
    out = []
    for i, a in sorted(sigs.items()):
        for j, b in sorted(sigs.items()):
            if i < j:
                ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                if ham <= SIMHASH_MAX_HAMMING:
                    out.append((i, j, ham))
    return out


# ---------------------------------------------------------------------------
# star-schema + ontology micro-fixtures — hand-derivable constants
# ---------------------------------------------------------------------------

# q_kg_star_graph fixture: DatabaseObject rows 1..4; rows 1,2 have
# created=3 (pass-2 CREATED edges); Event_2_input row (2 -> 4, rank 0)
# (pass-5 INPUT edge).  Name-based edge list:
KG_STAR_ROWS = [
    ("Pathway One", "CREATED", "Edit"),
    ("Reaction A", "CREATED", "Edit"),
    ("Reaction A", "INPUT", "Entity X"),
]

# q_kg_ontology_load fixture: doc 1 (GO:1) has synonym 'growing', xref
# 'UniProt:P1', relationship 'part_of GO:0000002 ! dev' (zeros stripped);
# doc 2 has no side-emits.
KG_ONTOLOGY_ROWS = [
    ("GO:1", "SYNONYM", "growing"),
    ("GO:1", "XREF", "UniProt:P1"),
    ("GO:1", "PART_OF", "GO:2"),
]


def main() -> None:
    sections = {
        "KG_TRIPLES": (
            ["subj", "pred", "obj", "conv_id", "turn_idx"],
            ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "INTEGER"],
            kg_triples_rows(),
        ),
        "KG_NODES": (["name", "labels"], ["VARCHAR", "VARCHAR"], kg_nodes_rows()),
        "KG_EDGES": (
            ["src_name", "rel_type", "dst_name"],
            ["VARCHAR", "VARCHAR", "VARCHAR"],
            kg_edges_rows(),
        ),
        "KG_CC": (
            ["entity_id", "canonical_id"],
            ["BIGINT", "BIGINT"],
            kg_cc_rows(),
        ),
        "KG_FUZZY": (
            ["conv_id", "turn_idx", "entity_id", "canonical_name"],
            ["VARCHAR", "INTEGER", "BIGINT", "VARCHAR"],
            kg_fuzzy_rows(),
        ),
        "KG_STAR": (
            ["src_name", "rel_type", "dst_name"],
            ["VARCHAR", "VARCHAR", "VARCHAR"],
            KG_STAR_ROWS,
        ),
        "KG_ONTOLOGY": (
            ["src_name", "rel_type", "dst_name"],
            ["VARCHAR", "VARCHAR", "VARCHAR"],
            KG_ONTOLOGY_ROWS,
        ),
        "TDP_SIMHASH": (
            ["id_a", "id_b", "hamming"],
            ["BIGINT", "BIGINT", "INTEGER"],
            tdp_simhash_rows(),
        ),
    }
    sections["TDP_SIMHASH_DOCS"] = (
        ["doc_id", "text"],
        ["BIGINT", "VARCHAR"],
        SIMHASH_DOCS,
    )
    lines = [
        '"""Frozen expected answers for the kg_* driver-contract queries.',
        "",
        "GENERATED by scripts/gen_kg_oracles.py — do not edit by hand.",
        "Each entry is (columns, duckdb_types, rows); __spark_entry__.py renders",
        "them as DuckDB VALUES oracles.  Provenance: computed by the frozen",
        "single-process oracle walker + pure-Python union-find / brute-force",
        "Jaccard — independent of all Spark code (see generator docstring).",
        '"""',
        "",
        "# fmt: off",
    ]
    for name, (cols, types, rows) in sections.items():
        lines.append(f"{name}_COLUMNS = {cols!r}")
        lines.append(f"{name}_TYPES = {types!r}")
        lines.append(f"{name}_ROWS = [")
        for r in rows:
            lines.append(f"    {tuple(r)!r},")
        lines.append("]")
        lines.append("")
    lines.append("# fmt: on")
    with open(OUT_PATH, "w") as f:
        f.write("\n".join(lines) + "\n")
    for name, (_c, _t, rows) in sections.items():
        print(f"{name}: {len(rows)} rows")
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
