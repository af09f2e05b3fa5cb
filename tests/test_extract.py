"""Extraction + ordering tests: parity with the frozen oracle walker."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from graphene_spark import datagen, extract, oracle, rules
from graphene_spark.pipeline import all_aliases


def test_rules_ontology_pattern():
    gaz = rules.build_gazetteer_regex(["Ent 00001"])
    mentions, triples = rules.extract_turn(
        "We looked at ent_00001 today. part_of GO:0001234 ! growth", gaz
    )
    assert mentions == ["ent_00001"]
    assert rules.Triple("ent 00001", "PART_OF", "GO:1234") in triples


def test_rules_xref_semantics():
    gaz = rules.build_gazetteer_regex(["Ent 00002"])
    # GC_ID dropped (GrameneMongoLoader.groovy:97)
    _, t1 = rules.extract_turn("ENT-00002 has xref GC_ID:123.", gaz)
    assert t1 == []
    # split-value keys keep only the name part (GrameneMongoLoader.groovy:100-106)
    _, t2 = rules.extract_turn("ENT-00002 has xref Reactome:R123 (a description).", gaz)
    assert t2 == [rules.Triple("ent 00002", "XREF", "Reactome:R123")]
    _, t3 = rules.extract_turn("ENT-00002 has xref UniProt:P12345.", gaz)
    assert t3 == [rules.Triple("ent 00002", "XREF", "UniProt:P12345")]
    # split-value keys with a plain space-separated description also keep
    # only the name (the val.split(' ',1)[0] branch, GrameneMongoLoader.groovy:102-106)
    _, t4 = rules.extract_turn("ENT-00002 has xref loinc:L77 some trailing words.", gaz)
    assert t4 == [rules.Triple("ent 00002", "XREF", "loinc:L77")]
    # non-split keys keep the WHOLE value verbatim, spaces included
    _, t5 = rules.extract_turn("ENT-00002 has xref TAIR:AT1 G1000.", gaz)
    assert t5 == [rules.Triple("ent 00002", "XREF", "TAIR:AT1 G1000")]


def test_rules_rank_and_synonym():
    gaz = rules.build_gazetteer_regex(["Ent 00003"])
    _, t = rules.extract_turn("Ent 00003 annotated has_rank NCBITaxon:species today", gaz)
    assert t == [rules.Triple("ent 00003", "HAS_RANK", "Species")]
    _, t2 = rules.extract_turn("Ent 00003 is also known as synonym: ENT-00009.", gaz)
    assert t2 == [rules.Triple("ent 00003", "SYNONYM", "ent 00009")]


def test_dangling_triple_has_null_subject():
    gaz = rules.build_gazetteer_regex(["Ent 00001"])
    _, t = rules.extract_turn("note: part_of GO:0000077 ! stray label", gaz)
    assert t == [rules.Triple(None, "PART_OF", "GO:77")]


def test_stable_order_invariant(spark, transcripts_df, transcripts_pdf):
    """Per-turn text equality under the stable ordering window (input_hint):
    three different physical row orders -> identical ordered text."""
    ordered = (
        extract.with_stable_order(transcripts_df)
        .select("conv_id", "turn_seq", "text")
        .orderBy("conv_id", "turn_seq")
        .toPandas()
    )
    for seed in (7, 8):
        shuffled = transcripts_pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        df2 = spark.createDataFrame(shuffled)
        ordered2 = (
            extract.with_stable_order(df2)
            .select("conv_id", "turn_seq", "text")
            .orderBy("conv_id", "turn_seq")
            .toPandas()
        )
        pd.testing.assert_frame_equal(ordered, ordered2)
    # reference order: the oracle's mergesort over (conv_id, turn_idx)
    ref = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    assert list(ordered["text"]) == list(ref["text"])


def test_spark_extraction_matches_oracle_walker(
    spark, transcripts_df, transcripts_pdf, dictionary_pdf
):
    """The distributed pandas-UDF extractor and the frozen single-process
    walker agree on the raw triple multiset (exact, not just P/R>=0.95)."""
    aliases = all_aliases(dictionary_pdf)
    spark_raw = (
        extract.extract_triples(transcripts_df, aliases)
        .select("conv_id", "turn_idx", "subj", "pred", "obj")
        .toPandas()
    )
    gaz = rules.build_gazetteer_regex(aliases)
    expected = []
    for row in transcripts_pdf.itertuples():
        if not row.text or "\x00" in row.text:
            continue
        _, triples = rules.extract_turn(row.text, gaz)
        for t in triples:
            expected.append((row.conv_id, int(row.turn_idx), t.subj, t.pred, t.obj))
    exp = pd.DataFrame(expected, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    got_sorted = spark_raw.sort_values(key, kind="mergesort").reset_index(drop=True)
    exp_sorted = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_sorted[key].astype(str), exp_sorted[key].astype(str)
    )


def test_native_extraction_parity(spark, transcripts_df, dictionary_pdf):
    """The JVM-native extractor and the pandas-UDF extractor agree exactly on
    triples, mentions, and error counts (same frozen grammar, two engines)."""
    aliases = all_aliases(dictionary_pdf)
    py_rows = extract.extract_rows(transcripts_df, aliases)
    nv_rows = extract.extract_rows_native(transcripts_df, aliases)

    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    pt = extract.triples_from_rows(py_rows).toPandas().sort_values(key, kind="mergesort")
    nt = extract.triples_from_rows(nv_rows).toPandas().sort_values(key, kind="mergesort")
    pd.testing.assert_frame_equal(
        pt.reset_index(drop=True).astype(str), nt.reset_index(drop=True).astype(str)
    )

    mkey = ["conv_id", "turn_idx", "surface", "norm"]
    pm = extract.mentions_from_rows(py_rows).toPandas().sort_values(mkey, kind="mergesort")
    nm = extract.mentions_from_rows(nv_rows).toPandas().sort_values(mkey, kind="mergesort")
    pd.testing.assert_frame_equal(
        pm.reset_index(drop=True).astype(str), nm.reset_index(drop=True).astype(str)
    )

    pe = extract.metrics_from_rows(py_rows).agg(F.sum("n_error_turns")).collect()[0][0]
    ne = extract.metrics_from_rows(nv_rows).agg(F.sum("n_error_turns")).collect()[0][0]
    assert pe == ne


def test_error_turns_counted_not_fatal(spark, transcripts_df, transcripts_pdf, dictionary_pdf):
    aliases = all_aliases(dictionary_pdf)
    m = extract.extraction_metrics(transcripts_df, aliases).agg(
        F.sum("n_error_turns").alias("e"), F.sum("n_turns").alias("t")
    ).collect()[0]
    n_bad = sum(1 for t in transcripts_pdf["text"] if not t or "\x00" in t)
    assert m["e"] == n_bad
    assert m["t"] == len(transcripts_pdf)


def test_arrow_extraction_parity(spark, transcripts_pdf, dictionary_pdf):
    """mapInArrow variant must produce row-for-row identical output to the
    pandas path (hash + count over every column)."""
    tdf = spark.createDataFrame(transcripts_pdf)
    aliases = all_aliases(dictionary_pdf)
    cols = "conv_id, turn_idx, kind, subj, pred, obj, surface, n_mentions, n_triples, is_error"
    sig = lambda df: df.selectExpr(  # noqa: E731
        f"bit_xor(xxhash64({cols})) AS h", "count(*) AS n"
    ).collect()[0]
    a = sig(extract.extract_rows_arrow(tdf, aliases))
    b = sig(extract.extract_rows(tdf, aliases))
    assert (a["h"], a["n"]) == (b["h"], b["n"])


def test_null_turn_idx_is_metric_not_crash(spark, dictionary_pdf):
    """A NULL turn_idx must become an error-metric row (contract: bad rows
    are skipped with a metric, never a job failure) — int(NaN/None) raised
    before the try block in both extraction paths."""
    from graphene_spark import pipeline

    tdf = spark.createDataFrame(
        [("c1", 1, "user", "Ent 00001 is_a GO:0000001 ! thing", None, None),
         ("c1", None, "user", "Ent 00002 here", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    aliases = pipeline.all_aliases(dictionary_pdf)
    for fn in (extract.extract_rows, extract.extract_rows_arrow):
        rows = fn(tdf, aliases)
        errs = rows.filter("kind = 'turn' and is_error = 1").collect()
        assert len(errs) == 1 and errs[0]["turn_idx"] == -1
        assert rows.filter("kind = 'triple'").count() == 1


def test_native_word_boundary_parity():
    """Word-prefixed keywords must NOT match: the native Java patterns carry
    the same \\b anchors as the frozen rules patterns."""
    import re

    # direct pattern checks (Java and Python dialects agree on \b here)
    assert re.search(extract._NATIVE_ONTO, "word is_a GO:0001 ! y")
    assert not re.search(extract._NATIVE_ONTO, "Xis_a GO:0001 ! y")
    assert re.search(extract._NATIVE_XREF, "has xref GO:12.")
    assert not re.search(extract._NATIVE_XREF, "Pxref GO:12.")
    assert re.search(extract._NATIVE_RANK, "so has_rank NCBITaxon:species here")
    assert not re.search(extract._NATIVE_RANK, "Xhas_rank NCBITaxon:species")
    assert re.search(extract._NATIVE_SYN, "a synonym: foo.")
    assert not re.search(extract._NATIVE_SYN, "Xsynonym: foo.")


def test_whitespace_class_aligned_across_dialects(spark):
    """The grammar's explicit whitespace class (rules.GAP_CLASS) must mean
    the SAME set in Python re and Spark's Java regex — including the
    historical divergence class U+001C..U+001F (FS/GS/RS/US: Python \\s
    matches them, Java (?U)\\s does not), which is why the grammar stopped
    using \\s shorthand (round-4 VERDICT task #5).  Every probe character
    must normalize identically on both sides: whitespace characters collapse
    to the separator, non-whitespace (now including FS/GS/RS/US and ZWSP)
    stay in the key.
    """
    import pyspark.sql.functions as F

    from graphene_spark import rules

    probe = {
        "space": " ", "tab": "\t", "nl": "\n", "cr": "\r",
        "vt": "\x0b", "ff": "\x0c",
        "nel": "\x85", "nbsp": "\xa0",
        "ogham": "\u1680", "emsp": "\u2003", "line_sep": "\u2028",
        "ideo": "\u3000",
        "zwsp": "\u200b",                     # not whitespace in either
        "fs": "\x1c", "gs": "\x1d", "rs": "\x1e", "us": "\x1f",  # not WS now
    }
    non_ws = {"zwsp", "fs", "gs", "rs", "us"}
    rows = [(k, f"ent{c}name") for k, c in probe.items()]
    df = spark.createDataFrame(rows, "name string, s string")
    sql_norm = {
        r["name"]: r["n"]
        for r in df.select(
            "name",
            F.trim(F.regexp_replace(F.lower("s"), rules.GAP_CLASS, " ")).alias("n"),
        ).collect()
    }
    for k, c in probe.items():
        py = rules.normalize_alias(f"ent{c}name")
        expected = f"ent{c}name" if k in non_ws else "ent name"
        assert py == expected, f"{k!r}: python={py!r}"
        assert sql_norm[k] == expected, f"{k!r}: sql={sql_norm[k]!r}"


def test_kind_pushdown_equals_post_filter(spark, dictionary_pdf, transcripts_df):
    """kinds=(k,) inside the Python/JVM stage must equal filtering the full
    frame on kind — for every kind, across all three extractors."""
    from graphene_spark import pipeline

    aliases = pipeline.all_aliases(dictionary_pdf)

    def sig(df):
        cols = ", ".join(df.columns)
        r = df.selectExpr(f"bit_xor(xxhash64({cols})) AS h", "count(*) AS n").collect()[0]
        return (r["h"], r["n"])

    for fn in (extract.extract_rows, extract.extract_rows_arrow, extract.extract_rows_native):
        full = fn(transcripts_df, aliases)
        for kind in ("turn", "mention", "triple"):
            pushed = fn(transcripts_df, aliases, kinds=(kind,))
            assert sig(pushed) == sig(full.filter(F.col("kind") == kind)), (fn.__name__, kind)


def test_kinds_validation_fails_fast(spark, dictionary_pdf, transcripts_df):
    """A misspelled or empty kinds tuple must raise on ALL three extractors
    (previously: silent empty output on pandas/arrow, IndexError on native)."""
    import pytest

    from graphene_spark import pipeline

    aliases = pipeline.all_aliases(dictionary_pdf)
    for fn in (extract.extract_rows, extract.extract_rows_arrow, extract.extract_rows_native):
        with pytest.raises(ValueError, match="non-empty subset"):
            fn(transcripts_df, aliases, kinds=("triples",))  # plural typo
        with pytest.raises(ValueError, match="non-empty subset"):
            fn(transcripts_df, aliases, kinds=())


def test_fuzzed_three_way_extractor_parity(spark, dictionary_pdf):
    """Seeded random-text property fuzz (round-4 VERDICT task #5): the
    pandas, arrow, and JVM-native extractors and the frozen single-process
    oracle walker must produce IDENTICAL triple/mention multisets on hostile
    text — the historical divergence class U+001C-1F, NBSP/NEL and exotic
    Unicode whitespace, non-ASCII words butted against grammar keywords
    (\\b/\\w/\\d dialect traps), embedded single/double quotes and
    backslashes, null/empty/NUL-bearing turns, and alias surfaces with
    every separator variant.  10k turns; any dialect drift in rules.py's
    shared pattern strings fails here with the offending class visible.

    Deliberately excluded: characters whose UNICODE case-folding maps into
    ASCII (Kelvin sign, long s) — the gazetteer's case-insensitivity is
    ASCII-scoped by construction (aliases are ASCII; Python IGNORECASE is
    Unicode-aware, Java (?i) is ASCII-only), documented in rules.py.
    """
    import random

    rng = random.Random(0x5EED5)
    aliases = all_aliases(dictionary_pdf)
    norms = sorted({rules.normalize_alias(a) for a in aliases if a and a.strip()})

    ws_pool = [" ", "\t", "\n", "\xa0", "\x85", " ", "　", "\x0b"]
    gap_pool = [" ", "_", "-", "\t", "\xa0", "  "]
    control_pool = ["\x1c", "\x1d", "\x1e", "\x1f"]
    junk = ["lorem", "ipsum", "quark", "naïve", "тест", "δοκιμή", 'say "hi"',
            "it's", "back\\slash", "(parens)", "semi;colon", "dot.stop"]

    def alias_variant():
        toks = rng.choice(norms).split(" ")
        sep = rng.choice(gap_pool + (control_pool if rng.random() < 0.25 else []))
        s = sep.join(toks)
        return "".join(c.upper() if rng.random() < 0.3 else c for c in s)

    def onto_clause():
        rel = rng.choice(["is_a", "part_of", "regulates"])
        ns = rng.choice(["GO", "NCBIT", "PO2"])
        num = rng.randint(0, 999_999_999)
        zeros = "0" * rng.randint(0, 3)
        label = rng.choice(junk + ["some label ( with parens", 'quo"ted'])
        return f"{rel} {ns}:{zeros}{num} ! {label}"

    def xref_clause():
        key = rng.choice(["Reactome", "VZ", "GC_ID", "UniProt", "http", "loinc"])
        val = rng.choice(["R-HSA-123 extra words", "plain", 'va"l', "it's",
                          "x\x1cy", "a (desc) b", "päth/to thing"])
        return f"xref {key}:{val}"

    def rank_clause():
        word = rng.choice(["species", "genus", "sub_species", "formaé"])
        return f"has_rank NCBITaxon:{word}"

    def syn_clause():
        return "synonym: " + rng.choice(junk + [alias_variant()])

    def turn_text():
        r = rng.random()
        if r < 0.02:
            return None
        if r < 0.04:
            return ""
        if r < 0.06:
            return "bad\x00turn"
        n = rng.randint(1, 5)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(
                [alias_variant, onto_clause, xref_clause, rank_clause,
                 syn_clause, lambda: rng.choice(junk)]
            )())
        glue = rng.choice(ws_pool)
        prefix = rng.choice(["", rng.choice(junk) + rng.choice(ws_pool),
                             rng.choice(["тест", "naïve"])])  # keyword-adjacent non-ASCII
        return prefix + glue.join(parts) + rng.choice(["", ".", " ;", " tail"])

    rows = [(f"c{i % 400}", i // 400, turn_text()) for i in range(10_000)]
    tdf = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string").persist()

    # 1. three-way engine parity: full-row signature over every output row
    cols = "conv_id, turn_idx, kind, subj, pred, obj, surface, n_mentions, n_triples, is_error"
    sig = lambda df: df.selectExpr(  # noqa: E731
        f"bit_xor(xxhash64({cols})) AS h", "count(*) AS n"
    ).collect()[0]
    s_pd = sig(extract.extract_rows(tdf, aliases))
    s_ar = sig(extract.extract_rows_arrow(tdf, aliases))
    s_nv = sig(extract.extract_rows_native(tdf, aliases))
    assert (s_pd["h"], s_pd["n"]) == (s_ar["h"], s_ar["n"]), "pandas vs arrow drift"
    assert (s_pd["h"], s_pd["n"]) == (s_nv["h"], s_nv["n"]), "pandas vs native drift"

    # 2. oracle parity: triple AND mention multisets vs the frozen walker
    from collections import Counter

    gaz = rules.build_gazetteer_regex(aliases)
    exp_triples, exp_mentions = Counter(), Counter()
    for conv_id, turn_idx, text in rows:
        if not text or "\x00" in text:
            continue
        mentions, triples = rules.extract_turn(text, gaz)
        for t in triples:
            exp_triples[(conv_id, turn_idx, t.subj, t.pred, t.obj)] += 1
        for m in mentions:
            exp_mentions[(conv_id, turn_idx, m, rules.normalize_alias(m))] += 1

    py_rows = extract.extract_rows(tdf, aliases)
    got_triples = Counter(
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
        for r in extract.triples_from_rows(py_rows).collect()
    )
    got_mentions = Counter(
        (r["conv_id"], r["turn_idx"], r["surface"], r["norm"])
        for r in extract.mentions_from_rows(py_rows).collect()
    )
    tdf.unpersist()
    assert got_triples == exp_triples, (
        f"triple drift: only-spark={list((got_triples - exp_triples).items())[:3]} "
        f"only-oracle={list((exp_triples - got_triples).items())[:3]}"
    )
    assert got_mentions == exp_mentions, (
        f"mention drift: only-spark={list((got_mentions - exp_mentions).items())[:3]} "
        f"only-oracle={list((exp_mentions - got_mentions).items())[:3]}"
    )
