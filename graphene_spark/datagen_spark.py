"""Distributed deterministic transcript generator — the bench-scale input.

``datagen.make_transcripts`` (pandas, row-at-a-time) is the FROZEN fixture
generator for correctness tests.  This module generates the same schema and
grammar fully inside Spark (spark.range -> JVM expressions, xxhash64-derived
pseudo-randomness), so bench inputs scale to millions/billions of turns with
no driver bottleneck — the shape a 10^12-turn run actually needs
(BASELINE.json north_rule).

Determinism: every random draw is ``xxhash64(conv, turn, salt)`` — same rows
for the same (n_convs, turns_per_conv, seed) at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .datagen import ENTITY_TYPES, ONTO_NAMESPACES, RANKS, REL_WORDS


def _h(salt: int, *cols):
    """Deterministic uniform int64 >= 0 from (salt, cols...)."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def _u(salt: int, *cols):
    """Deterministic uniform double in [0, 1)."""
    return (_h(salt, *cols) % 1_000_000).cast("double") / 1_000_000.0


def make_transcripts_df(
    spark: SparkSession,
    n_convs: int,
    turns_per_conv: int = 20,
    n_entities: int = 500,
    n_hot: int = 10,
    hot_entity_skew: float = 0.3,
    malformed_frac: float = 0.05,
    dangling_frac: float = 0.03,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) at any scale.

    Same grammar as datagen.make_transcripts (rules.py patterns), generated
    by JVM expressions over spark.range — one narrow stage, splittable."""
    n = n_convs * turns_per_conv
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = (F.col("id") % turns_per_conv).cast("int")

    df = base.select(
        F.format_string("conv-%08d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        conv.alias("_c"),
        turn.alias("_t"),
    )
    c, t = F.col("_c"), F.col("_t")
    sd = seed

    r = _u(sd + 1, c, t)
    is_hot = _u(sd + 2, c, t) < hot_entity_skew
    eid = F.when(is_hot, _h(sd + 3, c, t) % n_hot).otherwise(_h(sd + 4, c, t) % n_entities)
    variant = _h(sd + 5, c, t) % 3
    alias = F.when(variant == 0, F.format_string("Ent %05d", eid)).when(
        variant == 1, F.format_string("ent_%05d", eid)
    ).otherwise(F.format_string("ENT-%05d", eid))

    ns = F.element_at(
        F.array(*[F.lit(x) for x in ONTO_NAMESPACES]),
        (_h(sd + 6, c, t) % len(ONTO_NAMESPACES) + 1).cast("int"),
    )
    rel = F.element_at(
        F.array(*[F.lit(x) for x in REL_WORDS]),
        (_h(sd + 7, c, t) % len(REL_WORDS) + 1).cast("int"),
    )
    rank = F.element_at(
        F.array(*[F.lit(x) for x in RANKS]),
        (_h(sd + 8, c, t) % len(RANKS) + 1).cast("int"),
    )
    onum = _h(sd + 9, c, t) % 99999 + 1
    xval = F.format_string("X%06d", _h(sd + 10, c, t) % 1000000)
    xkey = F.element_at(
        F.array(F.lit("UniProt"), F.lit("Reactome"), F.lit("GC_ID"), F.lit("EC"), F.lit("loinc"), F.lit("TAIR")),
        (_h(sd + 11, c, t) % 6 + 1).cast("int"),
    )
    other_eid = _h(sd + 12, c, t) % n_entities
    other_alias = F.format_string("ent_%05d", other_eid)

    m1 = malformed_frac
    m2 = malformed_frac + dangling_frac
    text = (
        F.when(r < m1, F.when(_u(sd + 13, c, t) < 0.5, F.lit("")).otherwise(F.lit("\x00\x01 ???")))
        .when(
            r < m2,
            F.format_string("note: %s %s:%07d ! stray label", rel, ns, onum),
        )
        .when(
            r < 0.35,
            F.format_string(
                "We looked at %s today. %s %s:%07d ! label %d",
                alias, rel, ns, onum, _h(sd + 14, c, t) % 1000,
            ),
        )
        .when(r < 0.5, F.format_string("%s has xref %s:%s.", alias, xkey, xval))
        .when(r < 0.57, F.format_string("%s annotated has_rank NCBITaxon:%s today", alias, rank))
        .when(r < 0.64, F.format_string("%s is also known as synonym: %s.", alias, other_alias))
        .when(r < 0.8, F.format_string("The user asked about %s and we replied.", alias))
        .otherwise(
            F.format_string("the agent ran tool %d and observed result %d then planned",
                            _h(sd + 15, c, t) % 100, _h(sd + 16, c, t) % 100)
        )
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")), (t % 3 + 1).cast("int")
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("python"), F.lit("browser")),
            (_h(sd + 17, c, t) % 3 + 1).cast("int"),
        ),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp(F.lit("2025-01-01 00:00:00")))
        + c * 100000
        + t * 60
    )
    return df.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
