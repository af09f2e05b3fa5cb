"""Stable turn ordering (W1) + vectorized triple extraction (P4/P5/P6 analogs).

Ordering: the reference relies on cursor order (GrameneMongoLoader.groovy:30);
we make ordering explicit and stable with a window over (conv_id, turn_idx)
(SURVEY.md §2.5 W1; GeneLoader.groovy:53-69 is the same pattern over
(region, start)).  The per-turn text-equality invariant (input_hint) is tested
against the oracle's sorted walk.

Extraction: one Arrow-batched pandas UDF per turn batch (input_hint mandates
vectorized pandas/Arrow UDFs — never row-at-a-time Python UDFs).  The UDF
calls the same frozen ``rules.extract_turn`` the oracle uses, so parity is by
construction; the Spark plan stays a single narrow stage: scan -> pandas UDF
-> explode (no shuffle until linking).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import rules

# --- executor-side gazetteer cache ------------------------------------------
# The alias list is shipped once per task via closure capture (Spark broadcasts
# task binaries); the compiled automaton is cached per executor process.
_GAZ_CACHE: dict[int, object] = {}


def _gaz_for(aliases: tuple[str, ...]):
    key = hash(aliases)
    gaz = _GAZ_CACHE.get(key)
    if gaz is None:
        gaz = rules.build_gazetteer_regex(list(aliases))
        _GAZ_CACHE[key] = gaz
    return gaz


TRIPLE_STRUCT = StructType(
    [
        StructField("subj", StringType()),  # null = dangling (no subject mention)
        StructField("pred", StringType()),
        StructField("obj", StringType()),
    ]
)
EXTRACT_SCHEMA = StructType(
    [
        StructField("mentions", ArrayType(StringType())),
        StructField("triples", ArrayType(TRIPLE_STRUCT)),
        StructField("is_error", IntegerType()),
    ]
)


def with_stable_order(transcripts: DataFrame) -> DataFrame:
    """Attach a stable per-conversation ordinal (W1).

    ``turn_seq`` is row_number over (conv_id, turn_idx) — identical to
    turn_idx when input is dense, but robust to gaps/duplicates, which is the
    invariant the reference gets for free from its ordered cursor.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return transcripts.withColumn("turn_seq", F.row_number().over(w))


def make_extract_udf(aliases: list[str]):
    """Build the Arrow-batched extraction UDF over a frozen alias list."""
    alias_tuple = tuple(sorted(set(aliases)))

    @F.pandas_udf(EXTRACT_SCHEMA)
    def extract_udf(text: pd.Series) -> pd.DataFrame:
        gaz = _gaz_for(alias_tuple)
        mentions_col, triples_col, err_col = [], [], []
        for t in text:
            # per-record try/except: bad rows are skipped with a metric,
            # never a job failure (GrameneMongoLoader.groovy:34-38)
            try:
                if t is None or t == "" or "\x00" in t:
                    mentions_col.append([])
                    triples_col.append([])
                    err_col.append(1)
                    continue
                mentions, triples = rules.extract_turn(t, gaz)
                mentions_col.append(mentions)
                triples_col.append([(tr.subj, tr.pred, tr.obj) for tr in triples])
                err_col.append(0)
            except Exception:  # noqa: BLE001
                mentions_col.append([])
                triples_col.append([])
                err_col.append(1)
        return pd.DataFrame(
            {"mentions": mentions_col, "triples": triples_col, "is_error": err_col}
        )

    return extract_udf


def extract_triples(transcripts: DataFrame, aliases: list[str]) -> DataFrame:
    """transcripts -> one row per extracted raw triple (+ provenance).

    Returns columns: conv_id, turn_idx, subj (nullable surface-norm), pred,
    obj, plus ``mentions`` retained upstream.  Narrow until here — the first
    shuffle in the pipeline is the linking join.
    """
    udf = make_extract_udf(aliases)
    ex = transcripts.withColumn("_ex", udf(F.col("text")))
    return (
        ex.select(
            "conv_id",
            "turn_idx",
            F.col("_ex.mentions").alias("mentions"),
            F.explode(F.col("_ex.triples")).alias("t"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "mentions",
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
        )
    )


def extract_mentions(transcripts: DataFrame, aliases: list[str]) -> DataFrame:
    """transcripts -> one row per mention: conv_id, turn_idx, surface, norm."""
    udf = make_extract_udf(aliases)
    ex = transcripts.withColumn("_ex", udf(F.col("text")))
    return (
        ex.select("conv_id", "turn_idx", F.explode(F.col("_ex.mentions")).alias("surface"))
        .withColumn(
            "norm",
            F.trim(F.regexp_replace(F.lower(F.col("surface")), r"[\s_\-]+", " ")),
        )
    )


def extraction_metrics(transcripts: DataFrame, aliases: list[str]) -> DataFrame:
    """Per-conversation error/extract counters (Importer.groovy:40-43 analog)."""
    udf = make_extract_udf(aliases)
    ex = transcripts.withColumn("_ex", udf(F.col("text")))
    return ex.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("_ex.is_error").alias("n_error_turns"),
        F.sum(F.size("_ex.triples")).alias("n_raw_triples"),
        F.sum(F.size("_ex.mentions")).alias("n_mentions"),
    )
