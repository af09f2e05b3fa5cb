"""End-to-end job driver: run, resume, idempotence (FIXTURES.md §4)."""

from __future__ import annotations

import os

import pytest

from graphene_spark import datagen, materialize, pipeline


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "kg_out")


def _run(spark, transcripts_df, dictionary_df, aliases, out_dir, n_buckets=3):
    def process_bucket(bucket_df):
        res = pipeline.run_pipeline(spark, bucket_df, dictionary_df, aliases)
        return {
            "triples": res["triples"],
            "nodes": res["nodes"],
            "edges": res["edges"],
            "counters": {"n_turns": bucket_df.count()},
        }

    return materialize.run_with_lineage(
        spark, transcripts_df, out_dir, process_bucket, n_buckets=n_buckets
    )


def test_run_resume_idempotent(spark, transcripts_df, dictionary_df, dictionary_pdf, out_dir):
    aliases = pipeline.all_aliases(dictionary_pdf)
    t1 = _run(spark, transcripts_df, dictionary_df, aliases, out_dir)
    assert t1 == {"buckets_run": 3, "buckets_skipped": 0}
    triples_1 = spark.read.parquet(os.path.join(out_dir, "triples"))
    n1 = triples_1.count()
    set1 = {tuple(r) for r in triples_1.select("subj", "pred", "obj").collect()}

    # full re-run: all buckets skipped, outputs byte-identical in content
    t2 = _run(spark, transcripts_df, dictionary_df, aliases, out_dir)
    assert t2 == {"buckets_run": 0, "buckets_skipped": 3}
    triples_2 = spark.read.parquet(os.path.join(out_dir, "triples"))
    assert triples_2.count() == n1
    set2 = {tuple(r) for r in triples_2.select("subj", "pred", "obj").collect()}
    assert set1 == set2

    # partial resume: delete one bucket's lineage rows -> exactly that bucket re-runs,
    # and the insert-if-absent merge adds nothing new (idempotence)
    lin_path = os.path.join(out_dir, "lineage")
    lin = spark.read.parquet(lin_path)
    kept = lin.filter("bucket <> 1")
    kept_pdf = kept.toPandas()
    materialize.reset_output(lin_path)
    spark.createDataFrame(kept_pdf, schema=lin.schema).write.parquet(lin_path)
    t3 = _run(spark, transcripts_df, dictionary_df, aliases, out_dir)
    assert t3 == {"buckets_run": 1, "buckets_skipped": 2}
    triples_3 = spark.read.parquet(os.path.join(out_dir, "triples"))
    assert triples_3.count() == n1

    # lineage records counters per bucket
    lin = spark.read.parquet(lin_path)
    assert lin.filter("status = 'done'").count() >= 3
    assert lin.filter("n_turns > 0").count() >= 3


def test_job_cli_main(spark, tmp_path):
    """Drive the spark-submit entrypoint end to end via its argv interface."""
    from graphene_spark import job

    out = str(tmp_path / "cli_out")
    job.main(
        [
            "--transcripts", "synthetic:400",
            "--dictionary", "synthetic",
            "--out", out,
            "--buckets", "2",
            "--master", "local[4]",
        ]
    )
    assert os.path.exists(os.path.join(out, "triples"))
    assert os.path.exists(os.path.join(out, "lineage"))
    n = spark.read.parquet(os.path.join(out, "triples")).count()
    assert n > 0
    # resume run adds nothing
    job.main(
        [
            "--transcripts", "synthetic:400",
            "--dictionary", "synthetic",
            "--out", out,
            "--buckets", "2",
            "--resume",
            "--master", "local[4]",
        ]
    )
    assert spark.read.parquet(os.path.join(out, "triples")).count() == n


def test_collect_aliases_guard(spark, dictionary_df):
    """The broadcast-gazetteer collect is bounded by an explicit cap with a
    design-point error message (the driver-side alias collect is safe only
    because it scales with the DICTIONARY, not the corpus)."""
    import pytest

    from graphene_spark.job import collect_aliases

    aliases = collect_aliases(dictionary_df)
    assert len(aliases) > 0
    with pytest.raises(ValueError, match="broadcast-gazetteer design point"):
        collect_aliases(dictionary_df, max_aliases=3)
