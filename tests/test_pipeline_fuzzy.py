"""Integrated fuzzy linking + dictionary canonicalization in run_pipeline."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from graphene_spark import datagen, pipeline


def _mini_transcripts(spark, texts):
    rows = [
        ("conv-0", i, "user", t, None, (pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i)).to_pydatetime())
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_fuzzy_recovers_corrupted_subjects(spark, dictionary_df, dictionary_pdf):
    """A subject mention the gazetteer catches but the exact alias map misses
    (corrupted token) is recovered by the LSH second chance."""
    aliases = pipeline.all_aliases(dictionary_pdf) + ["entity 00012x"]
    tx = _mini_transcripts(
        spark,
        [
            "entity 00012x has xref UniProt:P99999.",  # corrupted alias, fuzzy-linkable
            "Ent 00003 has xref EC:E1.",  # clean control
        ],
    )
    base = pipeline.run_pipeline(spark, tx, dictionary_df, aliases)
    assert base["triples"].filter("subj = 'Ent 00012'").count() == 0
    assert base["dangling"].count() == 1

    fz = pipeline.run_pipeline(spark, tx, dictionary_df, aliases, fuzzy_threshold=0.4)
    got = {tuple(r) for r in fz["triples"].select("subj", "pred", "obj").collect()}
    assert ("Ent 00012", "XREF", "UniProt:P99999") in got
    assert ("Ent 00003", "XREF", "EC:E1") in got
    assert fz["dangling"].count() == 0
    # the recovered mention also reaches linked_mentions and entity nodes
    assert fz["linked_mentions"].filter("canonical_name = 'Ent 00012'").count() >= 1


def test_canonicalize_collapses_duplicate_dictionary_entries(spark):
    """Two dictionary entries sharing a normalized alias collapse onto the
    min entity id; triples emit under the canonical name (A1/A2 at scale)."""
    pdf = pd.DataFrame(
        {
            "entity_id": [10, 20],
            "canonical_name": ["Alpha", "AlphaDup"],
            "aliases": [["Alpha", "shared_x"], ["AlphaDup", "SHARED-X"]],
            "entity_type": ["Gene", "Gene"],
            "is_hot": [False, False],
        }
    )
    ddf = pipeline.dictionary_to_spark(spark, pdf)
    tx = _mini_transcripts(spark, ["AlphaDup has xref EC:E7."])
    res = pipeline.run_pipeline(
        spark, tx, ddf, ["Alpha", "AlphaDup", "shared_x"], canonicalize_dictionary=True
    )
    got = {tuple(r) for r in res["triples"].select("subj", "pred", "obj").collect()}
    # AlphaDup resolves through the collapsed entity -> canonical name Alpha
    assert got == {("Alpha", "XREF", "EC:E7")}
