"""Frozen single-process reference walker — the P/R oracle.

Mirrors the reference's execution model exactly: an ordered cursor walk over
records, one at a time, with per-record try/except that logs-and-skips
(GrameneMongoLoader.groovy:30-43), dangling references dropped with a count
(Loader.groovy:45-47), and edges deduplicated on (src, type, dst)
(post-import-cypher.txt MERGE semantics).

This module is the *answer key*: BASELINE.json:14 requires the distributed
pipeline's emitted triple set to match this walker at P/R >= 0.95.  It shares
the frozen grammar in rules.py, but its control flow is the straightforward
single-process walk, independent of any Spark code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from . import rules


@dataclass
class OracleResult:
    triples: pd.DataFrame  # subj, pred, obj, conv_id, turn_idx  (linked, deduped)
    mentions: pd.DataFrame  # conv_id, turn_idx, surface, norm, entity_id (or -1)
    n_error_turns: int = 0
    n_dangling_triples: int = 0
    n_unlinked_mentions: int = 0
    counters: dict = field(default_factory=dict)


def _alias_index(dictionary: pd.DataFrame) -> dict[str, int]:
    """normalized alias -> entity_id (the externalIdToNeoId analog, Loader.groovy:22)."""
    idx: dict[str, int] = {}
    for _, row in dictionary.iterrows():
        for a in row["aliases"]:
            idx.setdefault(rules.normalize_alias(a), int(row["entity_id"]))
    return idx


def run_oracle(transcripts: pd.DataFrame, dictionary: pd.DataFrame) -> OracleResult:
    """Walk turns in stable (conv_id, turn_idx) order, extract, link, dedup."""
    alias_idx = _alias_index(dictionary)
    canon = {int(r.entity_id): r.canonical_name for r in dictionary.itertuples()}
    gaz = rules.build_gazetteer_regex([a for al in dictionary["aliases"] for a in al])

    ordered = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    triples: list[tuple] = []
    mentions_out: list[tuple] = []
    n_err = n_dangling = n_unlinked = 0
    seen: set[tuple] = set()

    for row in ordered.itertuples():
        try:
            text = row.text
            if text is None or text == "" or "\x00" in text:
                n_err += 1
                continue
            mentions, turn_triples = rules.extract_turn(text, gaz)
            for surface in mentions:
                norm = rules.normalize_alias(surface)
                eid = alias_idx.get(norm, -1)
                if eid < 0:
                    n_unlinked += 1
                mentions_out.append((row.conv_id, int(row.turn_idx), surface, norm, eid))
            for t in turn_triples:
                if t.subj is None:
                    n_dangling += 1
                    continue
                eid = alias_idx.get(t.subj, -1)
                if eid < 0:
                    n_dangling += 1
                    continue
                key = (canon[eid], t.pred, t.obj)
                if key in seen:  # MERGE = insert-if-absent
                    continue
                seen.add(key)
                triples.append((*key, row.conv_id, int(row.turn_idx)))
        except Exception:  # noqa: BLE001 — reference logs & skips bad rows
            n_err += 1

    tdf = pd.DataFrame(triples, columns=["subj", "pred", "obj", "conv_id", "turn_idx"])
    mdf = pd.DataFrame(mentions_out, columns=["conv_id", "turn_idx", "surface", "norm", "entity_id"])
    return OracleResult(
        triples=tdf,
        mentions=mdf,
        n_error_turns=n_err,
        n_dangling_triples=n_dangling,
        n_unlinked_mentions=n_unlinked,
        counters={"n_triples": len(tdf), "n_mentions": len(mdf)},
    )


def precision_recall(emitted: pd.DataFrame, expected: pd.DataFrame) -> tuple[float, float]:
    """P/R on the (subj, pred, obj) triple set (BASELINE.json:14 comparison unit)."""
    e = {tuple(x) for x in emitted[["subj", "pred", "obj"]].itertuples(index=False)}
    x = {tuple(x) for x in expected[["subj", "pred", "obj"]].itertuples(index=False)}
    if not e:
        return (0.0, 0.0 if x else 1.0)
    inter = len(e & x)
    return inter / len(e), inter / len(x) if x else 1.0
