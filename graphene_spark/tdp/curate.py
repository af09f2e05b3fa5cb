"""End-to-end training-corpus curation: the TDP ops composed into one job.

    documents -> text analysis (lang/quality/tokens)
              -> quality + language gates
              -> exact dedup (content hash, keep canonical)
              -> near-dup removal: MinHash-LSH pairs -> connected components
                 over the duplicate graph -> keep the minimum doc per group
              -> curated corpus + per-stage counters

The near-dup grouping reuses the SAME connected-components operator the KG
canonicalization uses (canonicalize.connected_components) — duplicate
clusters are exactly alias clusters.  Every stage returns counters in the
post-import-cypher ``return count(*)`` style so curation runs are auditable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..canonicalize import connected_components
from . import dedup, textstats


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    languages: list[str] | None = None,
    near_dup_threshold: float = 0.7,
) -> dict:
    """Returns {"corpus": curated df, "counters": {...}, "dropped": df}."""
    counters: dict[str, int] = {"input": docs.count()}

    annotated = textstats.analyze_documents(docs, text_col=text_col)
    gated = annotated.filter(
        (F.col("q.quality") >= min_quality) & (F.col("n_tokens_ws") >= min_tokens)
    )
    if languages:
        gated = gated.filter(F.col("lang_pred").isin(languages))
    counters["after_quality_gate"] = gated.count()

    exact = dedup.exact_duplicates(gated, id_col=id_col, text_col=text_col)
    gated = gated.join(
        exact.filter("is_canonical").select(id_col), id_col, "left_semi"
    )
    counters["after_exact_dedup"] = gated.count()

    pairs = dedup.minhash_duplicates(
        gated, id_col=id_col, text_col=text_col, threshold=near_dup_threshold
    )
    groups = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    # survivors: docs that are their group's minimum (or in no dup group)
    losers = groups.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    curated = gated.join(losers, id_col, "left_anti")
    counters["after_near_dedup"] = curated.count()
    counters["near_dup_groups"] = groups.select("component").distinct().count()

    dropped = docs.join(curated.select(id_col), id_col, "left_anti")
    return {"corpus": curated, "counters": counters, "dropped": dropped}
