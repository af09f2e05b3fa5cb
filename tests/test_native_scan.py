"""Parity + behavior pins for the C gazetteer scanner (native_scan.py).

The contract: for every pure-ASCII row, the scanner's mention list is
byte-identical to ``rules.build_gazetteer_regex(...).finditer`` output; any
row with a non-ASCII byte is flagged for the regex fallback (None).  The
three-way extractor fuzz test in test_extract.py additionally pins the full
pipeline output (the arrow/pandas extractors now run the scanner when
available) against the frozen regex-only oracle.
"""

from __future__ import annotations

import random
import string

import pytest

from graphene_spark import native_scan, rules

ALIASES = [
    "Ethanol", "ethyl alcohol", "E. coli", "gene_tree", "abc", "ab",
    "abc def", "NAD", "NADH", "alpha-ketoglutarate", "x1", "i",
    "ſtation",        # long-s: folds to ASCII 'station'
    "µ-opioid",       # mu: no ASCII fold — must be dropped, never mismatch
    "İstanbul",       # dotted capital I: full-lowering expands, unrepresentable
]


@pytest.fixture(scope="module")
def scanner():
    sc = native_scan.scanner_for(tuple(sorted(set(ALIASES))))
    if sc is None:
        pytest.skip("no C toolchain / native scan disabled")
    return sc


@pytest.fixture(scope="module")
def gaz():
    return rules.build_gazetteer_regex(ALIASES)


def _expect(gaz, t):
    return [m.group(1) for m in gaz.finditer(t)]


def test_hand_cases(scanner, gaz):
    cases = [
        "Ethanol and NADH react; NAD too.",
        "ETHYL-ALCOHOL vs ethyl  alcohol vs ethyl_alcohol!",
        "abcd abc def ab abc",            # longest-first + boundary fallback
        "the gene_tree of e. coli",
        "x1x x1 x1.",
        "I i I. ix",
        "", "abc", "ab", "abcab", "ababc",
        "word-abc", "word abc", "9abc abc9 _abc abc_",
        "the station was big",            # ASCII text matching the ſ alias
        "STATION",
        "istanbul",                       # must NOT match (combining dot)
        "abc\tdef", "abc\ndef", "abc\x0b\x0c\rdef",
        "abc def ab", "ab abc def",
    ]
    got = scanner.scan_texts(cases)
    for t, g in zip(cases, got):
        assert g == _expect(gaz, t), repr(t)


def test_non_ascii_rows_fall_back(scanner):
    res = scanner.scan_texts(["café abc", "ſtation", "KELVIN", "abc"])
    assert res[0] is None and res[1] is None and res[2] is None
    assert res[3] == ["abc"]


def test_null_and_empty_rows(scanner):
    assert scanner.scan_texts([None, "", "abc"]) in (
        [None, [], ["abc"]],
        [[], [], ["abc"]],
    )


def test_fuzz_parity_ascii(scanner, gaz):
    rng = random.Random(20260817)
    alpha = string.ascii_letters + string.digits + " _-.,;!\t\n"
    frags = [a[: rng.randint(1, len(a))] for a in ALIASES if a.isascii() for _ in range(3)]
    texts = []
    for _ in range(2500):
        texts.append("".join(rng.choice(alpha) for _ in range(rng.randint(0, 80))))
    for _ in range(2500):
        texts.append(
            "".join(rng.choice(frags + [" ", "_", "-", "q", "1"]) for _ in range(rng.randint(1, 12)))
        )
    got = scanner.scan_texts(texts)
    for t, g in zip(texts, got):
        assert g == _expect(gaz, t), repr(t)


def test_arrow_sliced_array(scanner, gaz):
    """Offsets handling must survive a non-zero arr.offset (sliced batch)."""
    pa = pytest.importorskip("pyarrow")
    texts = ["abc and NAD", "nothing here", "ethyl alcohol!", "ab", "abcd"]
    arr = pa.array(texts + texts, pa.string()).slice(3, 5)
    sl = texts[3:] + texts[:3]
    got = scanner.scan_arrow(arr, arr.to_pylist())
    for t, g in zip(sl, got):
        assert g == _expect(gaz, t), repr(t)


def test_large_string_arrays(scanner, gaz):
    pa = pytest.importorskip("pyarrow")
    texts = ["abc NAD", None, "", "ethyl-alcohol"]
    arr = pa.array(texts, pa.large_string())
    got = scanner.scan_arrow(arr, arr.to_pylist())
    assert got[0] == _expect(gaz, texts[0])
    assert got[3] == _expect(gaz, texts[3])


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("GRAPHENE_SPARK_NO_NATIVE_SCAN", "1")
    assert native_scan.scanner_for(("abc",)) is None


def test_extract_batch_uses_pre_mentions(scanner):
    """The _extract_batch seam: precomputed mentions must produce the same
    rows as the regex path, including on fallback (None) entries."""
    from graphene_spark import extract

    gaz = extract._gaz_for(tuple(sorted(set(ALIASES))))
    conv = ["c1", "c1", "c2", "c2"]
    turn = [0, 1, 0, 1]
    text = ["abc and NAD", "café abc", None, "part_of GO:0001 ! x abc"]
    pre = scanner.scan_texts(text)
    with_pre = extract._extract_batch(conv, turn, text, gaz, None, mentions_pre=pre)
    without = extract._extract_batch(conv, turn, text, gaz, None)
    assert with_pre == without
