"""Incremental streaming ingest: drain, top-up, restart idempotence."""

from __future__ import annotations

import os

import pytest

from graphene_spark import datagen, pipeline, streaming


@pytest.fixture()
def dirs(tmp_path):
    inp = tmp_path / "incoming"
    out = tmp_path / "kg"
    inp.mkdir()
    return str(inp), str(out)


def _write_batch(pdf, path):
    # nanosecond timestamps -> micros so the stream's fixed schema matches
    pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)


def test_streaming_incremental_ingest(spark, dictionary_df, dictionary_pdf, dirs):
    inp, out = dirs
    aliases = pipeline.all_aliases(dictionary_pdf)

    batch1 = datagen.make_transcripts(n_convs=6, turns_per_conv=10, n_entities=60, seed=1)
    _write_batch(batch1, os.path.join(inp, "batch1.parquet"))

    q = streaming.stream_transcripts(spark, inp, out, dictionary_df, aliases)
    q.awaitTermination(120)
    n1 = spark.read.parquet(os.path.join(out, "triples")).count()
    assert n1 > 0

    # drop a second file; a fresh availableNow stream ingests ONLY the new one
    batch2 = datagen.make_transcripts(n_convs=6, turns_per_conv=10, n_entities=60, seed=2)
    _write_batch(batch2, os.path.join(inp, "batch2.parquet"))
    q2 = streaming.stream_transcripts(spark, inp, out, dictionary_df, aliases)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(os.path.join(out, "triples")).count()
    assert n2 > n1

    # restart with nothing new: no growth (keyed merge + stream checkpoint)
    q3 = streaming.stream_transcripts(spark, inp, out, dictionary_df, aliases)
    q3.awaitTermination(120)
    n3 = spark.read.parquet(os.path.join(out, "triples")).count()
    assert n3 == n2

    # lineage recorded per micro-batch
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    assert lin.filter("status = 'done'").count() >= 2


def test_dedup_batch_incremental(spark, tmp_path):
    """Incremental dedup-at-ingest: batch 2 docs that near-duplicate batch 1
    acceptances are rejected via the persisted band index; replays are
    idempotent; in-batch dups resolved first."""
    out = str(tmp_path / "dedup")
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    b1 = spark.createDataFrame(
        [(1, base, "s1"),
         (2, base, "s1"),                                   # in-batch exact dup of 1
         (3, "completely different text about spark partitions and shuffles", "s1")],
        streaming.DOCUMENTS_SCHEMA,
    )
    c1 = streaming.dedup_batch(spark, b1, out, threshold=0.7)
    assert c1 == {"arrived": 3, "in_batch_dups": 1, "index_dups": 0,
                  "already_present": 0, "accepted": 2}

    b2 = spark.createDataFrame(
        [(10, base + " extra", "s2"),                       # near-dup of accepted 1
         (11, "novel content that matches nothing else in the corpus at all", "s2")],
        streaming.DOCUMENTS_SCHEMA,
    )
    c2 = streaming.dedup_batch(spark, b2, out, threshold=0.7)
    assert c2 == {"arrived": 2, "in_batch_dups": 0, "index_dups": 1,
                  "already_present": 0, "accepted": 1}
    accepted = {r["doc_id"] for r in
                spark.read.parquet(out + "/accepted").collect()}
    assert accepted == {1, 3, 11}

    # replay of batch 2 (crash-recovery path): same decisions, no growth —
    # its own rows already in the index must NOT be counted as duplicates
    c2r = streaming.dedup_batch(spark, b2, out, threshold=0.7)
    assert c2r["index_dups"] == 1 and c2r["accepted"] == 0
    assert c2r["already_present"] == 1  # doc 11 already in the corpus
    assert spark.read.parquet(out + "/accepted").count() == 3


def test_stream_dedup_documents_end_to_end(spark, tmp_path):
    """readStream -> foreachBatch(dedup_batch) drains available files and
    records lineage."""
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "state")
    os.makedirs(inp)
    import pandas as pd

    base = "many moons ago a very repetitive corpus was crawled twice by mistake"
    pd.DataFrame(
        {"doc_id": [1, 2],
         "text": [base, "unique first text with its own words"],
         "source": ["s1", "s1"]}
    ).to_parquet(os.path.join(inp, "f1.parquet"))
    q = streaming.stream_dedup_documents(spark, inp, out)
    q.awaitTermination(120)
    assert spark.read.parquet(out + "/accepted").count() == 2

    pd.DataFrame(
        {"doc_id": [20, 21],
         "text": [base + " again", "another genuinely novel document body"],
         "source": ["s2", "s2"]}
    ).to_parquet(os.path.join(inp, "f2.parquet"))
    q2 = streaming.stream_dedup_documents(spark, inp, out)
    q2.awaitTermination(120)
    accepted = {r["doc_id"] for r in spark.read.parquet(out + "/accepted").collect()}
    assert accepted == {1, 2, 21}  # 20 rejected as near-dup of 1
    lin = spark.read.parquet(out + "/lineage")
    assert lin.filter("status = 'done'").count() >= 2


def test_dedup_batch_rejects_param_mismatch(spark, tmp_path):
    """LSH parameters are frozen with the persisted index: bands built with
    different parameters hash different signature slices and would silently
    match nothing, so a mismatch must raise."""
    out = str(tmp_path / "dedup")
    b1 = spark.createDataFrame(
        [(1, "some text goes right here for the first batch", "s1")],
        streaming.DOCUMENTS_SCHEMA,
    )
    streaming.dedup_batch(spark, b1, out)
    b2 = spark.createDataFrame(
        [(2, "and a second batch arrives with different settings", "s2")],
        streaming.DOCUMENTS_SCHEMA,
    )
    with pytest.raises(ValueError, match="do not match the persisted index"):
        streaming.dedup_batch(spark, b2, out, bands=16)
