"""Distributed datagen: determinism across parallelism + grammar correctness."""

from __future__ import annotations

import pyspark.sql.functions as F

from graphene_spark import datagen, datagen_spark, oracle, pipeline


def test_deterministic_across_parallelism(spark):
    a = datagen_spark.make_transcripts_df(spark, n_convs=10, turns_per_conv=10, partitions=2)
    b = datagen_spark.make_transcripts_df(spark, n_convs=10, turns_per_conv=10, partitions=7)
    pa = a.orderBy("conv_id", "turn_idx").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").toPandas()
    assert pa.equals(pb)


def test_schema_matches_contract(spark):
    df = datagen_spark.make_transcripts_df(spark, n_convs=2, turns_per_conv=3)
    assert [f.name for f in df.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_pipeline_on_spark_datagen_matches_oracle(spark):
    """The distributed generator emits the frozen grammar: pipeline output on
    it must still match the oracle walker exactly."""
    small = datagen_spark.make_transcripts_df(
        spark, n_convs=25, turns_per_conv=12, n_entities=50, n_hot=4
    )
    pdf = small.toPandas()
    dic = datagen.make_entity_dictionary(n_entities=50, n_hot=4, seed=42)
    res = pipeline.run_pipeline(
        spark, small, pipeline.dictionary_to_spark(spark, dic), pipeline.all_aliases(dic)
    )
    orc = oracle.run_oracle(pdf, dic)
    p, r = oracle.precision_recall(
        res["triples"].select("subj", "pred", "obj").toPandas(), orc.triples
    )
    assert (p, r) == (1.0, 1.0)


def test_hot_entity_skew_present(spark):
    """The Zipf head must actually dominate (the salting fixture requirement:
    synthetic data must CREATE the hot-entity problem, SURVEY.md §7)."""
    df = datagen_spark.make_transcripts_df(
        spark, n_convs=200, turns_per_conv=10, n_entities=500, n_hot=5, hot_entity_skew=0.3
    )
    ment = df.select(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"ent[ _\-](\d{5})"), F.lit(1)).alias("ids")
    ).select(F.explode("ids").alias("eid"))
    counts = ment.groupBy("eid").count().orderBy(F.desc("count")).toPandas()
    hot_share = counts.head(5)["count"].sum() / counts["count"].sum()
    assert hot_share > 0.25, f"hot share {hot_share}"
