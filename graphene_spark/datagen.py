"""Deterministic synthetic transcripts + entity dictionary (FIXTURES.md §1-2).

Seeded numpy generators only — no wall clock, no external data.  Rows are
emitted in a shuffled physical order so the stable-ordering window
(Window.partitionBy(conv_id).orderBy(turn_idx)) is actually exercised
(FIXTURES.md §4 shuffled-input fixture).

Scale knobs: n_convs, turns_per_conv, n_entities, hot_entity_skew.  Hot
entities reproduce the 'common metabolite' problem (H2O/ATP promiscuity,
post-import-cypher.txt:6): a Zipf head of entities appears in a large
fraction of turns, which is what makes salting observable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import rules

BASE_TS = pd.Timestamp("2025-01-01T00:00:00")

ENTITY_TYPES = ["Gene", "Pathway", "Reaction", "Taxon", "Ontology"]
ONTO_NAMESPACES = ["GO", "PO", "TO", "EO", "SO", "GRO"]
REL_WORDS = ["part_of", "regulates", "is_a", "has_part", "located_in", "participates_in"]
XREF_KEYS = ["UniProt", "Reactome", "GC_ID", "EC", "loinc", "TAIR"]
RANKS = ["species", "genus", "family", "order"]
NOISE_WORDS = (
    "the agent ran a tool and observed the result then planned the next step "
    "please summarize the findings for the user in a short reply thanks"
).split()


def make_entity_dictionary(n_entities: int = 200, n_hot: int = 5, seed: int = 42) -> pd.DataFrame:
    """Canonical entity dictionary (FIXTURES.md §2).

    Aliases include case/underscore/dash variants (which normalize onto the
    canonical key, GrameneMongoLoader.groovy:76-78 analog) and one *fuzzy*
    alias per entity ("entity NNNNN" vs "ent NNNNN") that does NOT normalize
    onto the canonical key — the LSH-blocking test target.
    """
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_entities):
        canonical = f"Ent {i:05d}"
        aliases = [canonical, f"ent_{i:05d}", f"ENT-{i:05d}", f"entity {i:05d}"]
        rows.append(
            {
                "entity_id": int(i),
                "canonical_name": canonical,
                "aliases": aliases,
                "entity_type": ENTITY_TYPES[i % len(ENTITY_TYPES)],
                "is_hot": bool(i < n_hot),
            }
        )
    rng.shuffle(rows)
    return pd.DataFrame(rows)


def _zipf_entity_ids(rng: np.random.RandomState, n: int, n_entities: int, n_hot: int, skew: float) -> np.ndarray:
    """Pick entity ids with a Zipf head over the hot entities."""
    hot = rng.rand(n) < skew
    ids = rng.randint(0, n_entities, size=n)
    hot_ids = rng.randint(0, max(n_hot, 1), size=n)
    return np.where(hot, hot_ids, ids)


def _alias_for(rng: np.random.RandomState, eid: int) -> str:
    variant = rng.randint(0, 3)
    if variant == 0:
        return f"Ent {eid:05d}"
    if variant == 1:
        return f"ent_{eid:05d}"
    return f"ENT-{eid:05d}"


def make_transcripts(
    n_convs: int = 50,
    turns_per_conv: int = 20,
    n_entities: int = 200,
    n_hot: int = 5,
    hot_entity_skew: float = 0.3,
    malformed_frac: float = 0.05,
    dangling_frac: float = 0.03,
    seed: int = 42,
) -> pd.DataFrame:
    """Transcripts table (conv_id, turn_idx, role, text, tool, ts) — BASELINE.json:15.

    Text embeds the frozen grammar of rules.py.  A seeded fraction of turns is
    malformed (empty/garbled -> skipped with an error metric,
    GrameneMongoLoader.groovy:34-38) or dangling (relation pattern with no
    subject mention -> dropped edge metric, Loader.groovy:45-47).
    """
    rng = np.random.RandomState(seed)
    roles = ["user", "assistant", "tool"]
    tools = ["search", "python", "browser", None]
    rows = []
    for c in range(n_convs):
        conv_id = f"conv-{c:08d}"
        for t in range(turns_per_conv):
            r = rng.rand()
            eid = int(_zipf_entity_ids(rng, 1, n_entities, n_hot, hot_entity_skew)[0])
            alias = _alias_for(rng, eid)
            if r < malformed_frac:
                text = "" if rng.rand() < 0.5 else "\x00\x01 ???"
            elif r < malformed_frac + dangling_frac:
                # relation pattern with no mention -> dangling triple
                ns = ONTO_NAMESPACES[rng.randint(len(ONTO_NAMESPACES))]
                text = f"note: {REL_WORDS[rng.randint(len(REL_WORDS))]} {ns}:{rng.randint(1, 99999):07d} ! stray label"
            elif r < 0.35:
                ns = ONTO_NAMESPACES[rng.randint(len(ONTO_NAMESPACES))]
                rel = REL_WORDS[rng.randint(len(REL_WORDS))]
                text = (
                    f"We looked at {alias} today. "
                    f"{rel} {ns}:{rng.randint(1, 99999):07d} ! label {rng.randint(0, 1000)}"
                )
            elif r < 0.5:
                key = XREF_KEYS[rng.randint(len(XREF_KEYS))]
                val = f"X{rng.randint(0, 10**6):06d}"
                if key in rules.XREF_SPLIT_VALUE_KEYS and rng.rand() < 0.5:
                    text = f"{alias} has xref {key}:{val} (some description text)."
                else:
                    text = f"{alias} has xref {key}:{val}."
            elif r < 0.57:
                text = f"{alias} annotated has_rank NCBITaxon:{RANKS[rng.randint(len(RANKS))]} today"
            elif r < 0.64:
                other = int(_zipf_entity_ids(rng, 1, n_entities, n_hot, hot_entity_skew)[0])
                text = f"{alias} is also known as synonym: {_alias_for(rng, other)}."
            elif r < 0.8:
                text = f"The user asked about {alias} and we replied."
            else:
                k = rng.randint(5, 15)
                text = " ".join(NOISE_WORDS[rng.randint(len(NOISE_WORDS))] for _ in range(k))
            role = roles[t % 3]
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": np.int32(t),
                    "role": role,
                    "text": text,
                    "tool": tools[rng.randint(4)] if role == "tool" else None,
                    "ts": BASE_TS + pd.Timedelta(seconds=int(c) * 100000 + int(t) * 60),
                }
            )
    df = pd.DataFrame(rows)
    # deterministic shuffle of physical row order (ordering-window fixture)
    perm = np.random.RandomState(seed + 1).permutation(len(df))
    return df.iloc[perm].reset_index(drop=True)


def write_parquet(df: pd.DataFrame, path: str) -> None:
    df.to_parquet(path, index=False)
