"""MinHash/LSH blocking + fuzzy linking tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from graphene_spark import blocking


def test_shingle_jvm(spark):
    df = spark.createDataFrame([("abcde",), ("ab",)], schema="s string")
    got = df.select(blocking.shingle(F.col("s"), 3).alias("sh")).collect()
    assert got[0]["sh"] == ["abc", "bcd", "cde"]
    assert got[1]["sh"] == ["ab"]


def test_candidate_pairs_finds_near_duplicates(spark):
    left = spark.createDataFrame(
        [("entity 00042",), ("totally different string",)], schema="norm string"
    )
    right = spark.createDataFrame(
        [(42, "ent 00042"), (7, "unrelated alias")], schema="entity_id long, alias string"
    )
    pairs = blocking.candidate_pairs(
        left, right, "norm", "alias", "norm", "entity_id", threshold=0.3
    ).collect()
    matches = {(r["norm"], r["entity_id"]) for r in pairs}
    assert ("entity 00042", 42) in matches
    assert all(n != "totally different string" for n, _ in matches)


def test_fuzzy_link_unmatched(spark, dictionary_df):
    # 'entity 00007' is the fuzzy alias pattern; a corrupted variant of it
    # should still link to entity 7 via LSH+jaccard
    unl = spark.createDataFrame(
        [("c1", 0, "entity 00007x", "entity 00007x")],
        schema="conv_id string, turn_idx int, surface string, norm string",
    )
    got = blocking.fuzzy_link_unmatched(unl, dictionary_df, threshold=0.4).collect()
    assert len(got) == 1
    assert got[0]["entity_id"] == 7


def test_band_join_prunes_comparisons(spark):
    """The LSH join must compare far fewer pairs than the cross product."""
    n = 60
    left = spark.createDataFrame([(f"string number {i} padding",) for i in range(n)], schema="norm string")
    right = spark.createDataFrame(
        [(i, f"completely unrelated {i*997} text") for i in range(n)],
        schema="entity_id long, alias string",
    )
    pairs = blocking.candidate_pairs(
        left, right, "norm", "alias", "norm", "entity_id", threshold=0.5
    )
    # unrelated strings shouldn't survive verification
    assert pairs.count() == 0
