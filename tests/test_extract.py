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


def test_whitespace_divergence_class_pinned(spark):
    """Pin the documented Python-\\s vs Java-(?U)\\s divergence class.

    Both normalizers collapse [case/space/_/-] variants; the known edge
    class is the C0 separator controls U+001C..U+001F (FS/GS/RS/US):
    Python's re \\s matches them, java.lang.Character.isWhitespace (the
    (?U)\\s used in every SQL-side norm) does NOT.  Everything else in the
    probe set must AGREE between the two dialects — if Spark or CPython
    ever shifts this behavior, this test flags it before it can silently
    break pandas<->SQL normalization parity.
    """
    import pyspark.sql.functions as F

    from graphene_spark import rules

    probe = {
        "space": " ", "tab": "\t", "nl": "\n", "cr": "\r",
        "vt": "\x0b", "ff": "\x0c",          # \v and \f agree in BOTH
        "nel": "\x85", "nbsp": "\xa0",       # Unicode WS: agree under (?U)
        "ogham": " ", "emsp": " ", "line_sep": " ",
        "ideo": "　",
        "zwsp": "​",                    # not whitespace in either
        "fs": "\x1c", "gs": "\x1d", "rs": "\x1e", "us": "\x1f",  # DIVERGE
    }
    diverging = {"fs", "gs", "rs", "us"}
    rows = [(k, f"ent{c}name") for k, c in probe.items()]
    df = spark.createDataFrame(rows, "name string, s string")
    sql_norm = {
        r["name"]: r["n"]
        for r in df.select(
            "name",
            F.trim(F.regexp_replace(F.lower("s"), r"(?U)[\s_\-]+", " ")).alias("n"),
        ).collect()
    }
    for k, c in probe.items():
        py = rules.normalize_alias(f"ent{c}name")
        if k in diverging:
            assert py == "ent name", k
            assert sql_norm[k] == f"ent{c}name", k  # Java leaves it in place
        else:
            assert py == sql_norm[k], (
                f"{k!r}: python={py!r} sql={sql_norm[k]!r} — a NEW divergence "
                "outside the documented FS/GS/RS/US class"
            )


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
