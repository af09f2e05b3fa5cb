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
