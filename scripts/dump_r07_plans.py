"""Dump .explain("formatted") for every bench-headline query into
plans/r07/<name>_<tag>.txt (tag = before/after).  The judge checks plan-shape
claims in OPTIMIZATION_r07.md against these files.

Usage: python scripts/dump_r07_plans.py before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from graphene_spark.session import get_spark

    spark = get_spark("plan-dump-r07", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    headline = [
        "j1_broadcast_equi", "j7_two_hop", "a4_a6_key_stats",
        "a8_sorted_set_name", "w1_w2_chain_rank", "s2_split_explode",
        "tdp_exact_dedup", "tdp_cosine_topk", "tdp_textstats",
    ]
    for name in headline:
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(fmt(queries[name](spark, sf_dir)))

    # the two library-path headline rows
    from graphene_spark.tdp import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with open(os.path.join(out_dir, f"tdp_minhash_dedup_{tag}.txt"), "w") as f:
        f.write(fmt(dedup.minhash_duplicates(docs, threshold=0.7)))

    from graphene_spark import datagen, pipeline

    dic = datagen.make_entity_dictionary(n_entities=500, n_hot=10, seed=42)
    tx = datagen.make_transcripts(n_convs=40, turns_per_conv=20,
                                  n_entities=500, n_hot=10, seed=42)
    tdf = spark.createDataFrame(tx)
    res = pipeline.run_pipeline(
        spark, tdf, pipeline.dictionary_to_spark(spark, dic),
        pipeline.all_aliases(dic),
    )
    with open(os.path.join(out_dir, f"kg_extract_link_{tag}.txt"), "w") as f:
        f.write(fmt(res["triples"]))
    print(f"wrote {tag} plans to {out_dir}")


if __name__ == "__main__":
    main()
