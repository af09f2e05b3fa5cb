"""Property-based tests for the frozen extraction grammar (hypothesis)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from graphene_spark import rules

ALIASES = ["Ent 00001", "ent_00002", "ENT-00003", "Alpha Beta"]
GAZ = rules.build_gazetteer_regex(ALIASES)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=300,
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_extract_turn_never_raises_and_is_deterministic(text):
    """Arbitrary text must never crash the extractor, and extraction is a
    pure function (same input -> same output)."""
    a = rules.extract_turn(text, GAZ)
    b = rules.extract_turn(text, GAZ)
    assert a == b


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_normalize_alias_idempotent(s):
    once = rules.normalize_alias(s)
    assert rules.normalize_alias(once) == once
    assert "  " not in once and "_" not in once and "-" not in once


@given(st.sampled_from(ALIASES), st.sampled_from([" ", "_", "-", "  "]))
@settings(max_examples=50, deadline=None)
def test_alias_variants_collide(alias, sep):
    """Case/separator variants of an alias normalize onto one key
    (GrameneMongoLoader.groovy:76-78 invariant)."""
    variant = alias.upper().replace(" ", sep).replace("_", sep).replace("-", sep)
    assert rules.normalize_alias(variant) == rules.normalize_alias(alias)


@given(
    st.sampled_from(["part_of", "is_a", "regulates"]),
    st.sampled_from(["GO", "PO", "SO"]),
    st.integers(min_value=1, max_value=9999999),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=100, deadline=None)
def test_ontology_pattern_strips_leading_zeros(pred, ns, num, pad):
    """Any zero-padding of the object id yields the same canonical triple
    (Long.valueOf semantics, OntologyLoader.groovy:102)."""
    text = f"Ent 00001 noted. {pred} {ns}:{'0' * pad}{num} ! some label"
    _, triples = rules.extract_turn(text, GAZ)
    assert rules.Triple("ent 00001", pred.upper(), f"{ns}:{num}") in triples


@given(st.text(alphabet="abcdefghij _-", min_size=0, max_size=40))
@settings(max_examples=100, deadline=None)
def test_mentions_only_from_gazetteer(noise):
    """Text without any alias tokens yields no mentions (no false fires)."""
    if any(rules.normalize_alias(a) in rules.normalize_alias(noise) for a in ALIASES):
        return
    mentions, _ = rules.extract_turn(noise, GAZ)
    assert mentions == []


def _flat_gazetteer(aliases):
    """The original longest-first flat alternation — kept here as the
    specification the trie-compressed builder must be equivalent to."""
    import re

    norms = sorted(
        {rules.normalize_alias(a) for a in aliases if a and a.strip()},
        key=len, reverse=True,
    )
    parts = [r"[\s_\-]+".join(re.escape(t) for t in n.split(" ")) for n in norms]
    if not parts:
        parts = [r"(?!x)x"]
    return re.compile(
        r"(?<![A-Za-z0-9])(" + "|".join(parts) + r")(?![A-Za-z0-9])", re.IGNORECASE
    )


GAZ_ALIASES = ["Ent 00001", "ent_00002", "entity 00002", "ENT-00003",
               "Alpha Beta", "Alpha", "Alpha Beta Gamma", "beta"]
FLAT = _flat_gazetteer(GAZ_ALIASES)
TRIE = rules.build_gazetteer_regex(GAZ_ALIASES)


@given(text_strategy)
@settings(max_examples=300, deadline=None)
def test_trie_gazetteer_equivalent_to_flat_alternation(text):
    """The trie-compressed gazetteer must produce EXACTLY the flat
    longest-first alternation's matches on arbitrary text (same spans, same
    surfaces, same order) — including nested/overlapping aliases."""
    a = [(m.start(), m.group(1)) for m in FLAT.finditer(text)]
    b = [(m.start(), m.group(1)) for m in TRIE.finditer(text)]
    assert a == b


@given(st.sampled_from(GAZ_ALIASES), st.sampled_from([" ", "_", "-", "  "]))
@settings(max_examples=50, deadline=None)
def test_trie_gazetteer_matches_alias_variants(alias, sep):
    variant = alias.upper().replace(" ", sep).replace("_", sep).replace("-", sep)
    hits = [m.group(1) for m in TRIE.finditer(f"we saw {variant} today")]
    assert hits == [variant]


def test_xref_value_stops_at_description_and_keywords():
    """Round-2 ADVICE: the xref value must not swallow a ' (description)'
    suffix or a following keyword clause; free text up to the closing
    punctuation is kept by design (reference keeps the field remainder)."""
    def vals(text):
        return [(m.group(1), m.group(2)) for m in rules.XREF_PATTERN.finditer(text)]

    assert vals("has xref TAIR:X1 (some description).") == [("TAIR", "X1")]
    assert vals("has xref A:v1 xref B:v2.") == [("A", "v1"), ("B", "v2")]
    assert vals("has xref A:v1 has_rank NCBITaxon:genus.") == [("A", "v1")]
    assert vals("xref A:v1 synonym: foo.") == [("A", "v1")]
    # punctuation-terminated free text still runs to the punctuation
    assert vals("has xref TAIR:X1 and more words.") == [("TAIR", "X1 and more words")]
