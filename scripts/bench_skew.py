"""Skew experiments: (1) salted vs unsalted shuffle join on a Zipf-skewed
mention stream; (2) the graph rewrites' common-flag exclusion under a
10x-hot-key stress (round-3 VERDICT item 5).

The pipeline's default linking is a broadcast join (skew-immune).  The
LINKING experiment forces the shuffle-join regime (dictionary 'too big to
broadcast': autoBroadcastJoinThreshold=-1, AQE skew handling toggled) and
measures plain vs salted joins on mentions whose keys are heavily Zipf-
skewed — evidence that the explicit salting path does its job when
broadcast is off the table.

The REWRITES experiment stresses two_hop_edges and metabolite_link
(postprocess.py), which rely on the reference's own common=false guard
(post-import-cypher.txt:6-12,19) for skew safety: a hub node of degree D
contributes O(D^2) output pairs unless excluded BEFORE the self-join.  We
run each op with and without the exclusion at baseline and 10x hub degree
and record wall time + pair counts: with the exclusion both must stay flat
while the unguarded variant blows up quadratically.

Results are merged into BENCH/skew_results.json across invocations and
BENCH/SKEW.md is re-rendered from the merged state, so the two experiments
can be (re)run independently:

    python scripts/bench_skew.py                     # both experiments
    python scripts/bench_skew.py --skip-linking      # rewrites only
    python scripts/bench_skew.py --skip-rewrites     # linking only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS_PATH = os.path.join(ROOT, "BENCH", "skew_results.json")
MD_PATH = os.path.join(ROOT, "BENCH", "SKEW.md")


def run_linking(spark, args) -> dict:
    from graphene_spark import datagen, linking, pipeline

    dic = datagen.make_entity_dictionary(n_entities=args.entities, n_hot=args.hot, seed=42)
    ddf = pipeline.dictionary_to_spark(spark, dic)

    # Zipf-skewed mention stream: hot-share of all rows hit `hot` keys
    n = args.mentions
    mentions = (
        spark.range(0, n, 1, 32)
        .select(
            F.concat(F.lit("c"), (F.col("id") / 1000).cast("long").cast("string")).alias("conv_id"),
            (F.col("id") % 1000).cast("int").alias("turn_idx"),
            F.when(
                (F.abs(F.xxhash64("id")) % 100) < int(args.hot_share * 100),
                F.format_string("ent %05d", F.abs(F.xxhash64(F.lit(1), "id")) % args.hot),
            )
            .otherwise(
                F.format_string("ent %05d", F.abs(F.xxhash64(F.lit(2), "id")) % args.entities)
            )
            .alias("norm"),
        )
        .withColumn("surface", F.col("norm"))
    )
    mentions.persist().count()

    def run(strategy: str, skew_join: bool) -> float:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        if strategy == "plain-shuffle":
            # baseline: un-hinted shuffle join straight on the skewed key
            amap = linking.alias_map(ddf)
            joined = mentions.join(amap, mentions.norm == amap.alias_norm, "left")
            linked = joined.filter(F.col("entity_id").isNotNull())
        else:
            linked, _ = linking.link_mentions(mentions, ddf, strategy=strategy, salt=16)
        linked.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            linked.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    out = {
        "plain_shuffle_noAQEskew_sec": round(run("plain-shuffle", skew_join=False), 2),
        "plain_shuffle_AQEskew_sec": round(run("plain-shuffle", skew_join=True), 2),
        "salted_noAQEskew_sec": round(run("salted", skew_join=False), 2),
        "mentions": n,
        "hot_share": args.hot_share,
        "hot_keys": args.hot,
        "entities": args.entities,
    }
    mentions.unpersist()
    return out


# ---------------------------------------------------------------------------
# graph-rewrite skew stress (two_hop_edges / metabolite_link)
# ---------------------------------------------------------------------------

def _two_hop_fixture(spark, n_entities: int, n_names: int, hot_degree: int):
    """SYNONYM star graph: entity e -> name (e % n_names), plus ``hot_degree``
    entities ALL pointing at one hub name node; SYNONYM_OF is the flip."""
    base = spark.range(n_entities).select(
        F.format_string("e%07d", F.col("id")).alias("src"),
        F.format_string("n%05d", F.col("id") % n_names).alias("dst"),
        F.lit("SYNONYM").alias("rel_type"),
    )
    hot = spark.range(hot_degree).select(
        F.format_string("h%07d", F.col("id")).alias("src"),
        F.lit("name_hub").alias("dst"),
        F.lit("SYNONYM").alias("rel_type"),
    )
    edges = base.unionByName(hot)
    flipped = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit("SYNONYM_OF").alias("rel_type"),
    )
    return edges.unionByName(flipped)


def _metabolite_fixture(spark, n_reactions: int, n_metabolites: int, hot_degree: int):
    """Each reaction consumes/produces 3 regular metabolites; ``hot_degree``
    reactions ALSO consume ATP and produce H2O (the classic diamond hub)."""
    r = spark.range(n_reactions)
    inp = r.select(
        F.explode(
            F.array(*[
                F.format_string("m%06d", (F.col("id") * 3 + j) % n_metabolites)
                for j in range(3)
            ])
        ).alias("src"),
        F.format_string("r%07d", F.col("id")).alias("dst"),
        F.lit("INPUT").alias("rel_type"),
    )
    outp = r.select(
        F.format_string("r%07d", F.col("id")).alias("src"),
        F.explode(
            F.array(*[
                F.format_string("m%06d", (F.col("id") * 7 + 1 + j) % n_metabolites)
                for j in range(3)
            ])
        ).alias("dst"),
        F.lit("OUTPUT").alias("rel_type"),
    )
    hot_in = spark.range(hot_degree).select(
        F.lit("ATP").alias("src"),
        F.format_string("r%07d", F.col("id")).alias("dst"),
        F.lit("INPUT").alias("rel_type"),
    )
    hot_out = spark.range(hot_degree).select(
        F.format_string("r%07d", F.col("id")).alias("src"),
        F.lit("H2O").alias("dst"),
        F.lit("OUTPUT").alias("rel_type"),
    )
    edges = inp.unionByName(hot_in).unionByName(outp).unionByName(hot_out)
    reactions = r.select(F.format_string("r%07d", F.col("id")).alias("node_id"))
    return edges, reactions


def run_rewrites(spark, args) -> dict:
    from graphene_spark import postprocess as pp

    res: dict = {
        "two_hop": {}, "metabolite": {},
        "n_entities": args.rw_entities, "n_reactions": args.rw_reactions,
        "base_hot_degree": args.rw_hot_degree,
    }
    for label, factor in (("base", 1), ("10x", 10)):
        d = args.rw_hot_degree * factor
        # 4 entities per regular name: the regular pair volume stays ~16x
        # name count, so the hub term dominates growth by construction
        edges = _two_hop_fixture(spark, args.rw_entities, args.rw_entities // 4, d)
        edges.persist().count()
        hub = spark.createDataFrame([("name_hub",)], "node_id string")
        for guarded in (True, False):
            t0 = time.perf_counter()
            out, n = pp.two_hop_edges(
                edges, "SYNONYM", "SYNONYM_OF", "SAME_AS",
                excluded_mid=hub if guarded else None,
            )
            sec = time.perf_counter() - t0
            key = f"{label}_{'guarded' if guarded else 'unguarded'}"
            res["two_hop"][key] = {"pairs": n, "sec": round(sec, 2), "hot_degree": d}
        edges.unpersist()

        medges, reactions = _metabolite_fixture(
            spark, args.rw_reactions, args.rw_reactions // 10, d
        )
        medges.persist().count()
        common = spark.createDataFrame([("ATP",), ("H2O",)], "node_id string")
        for guarded in (True, False):
            t0 = time.perf_counter()
            out, n = pp.metabolite_link(
                medges, reactions, common_ids=common if guarded else None
            )
            sec = time.perf_counter() - t0
            key = f"{label}_{'guarded' if guarded else 'unguarded'}"
            res["metabolite"][key] = {"pairs": n, "sec": round(sec, 2), "hot_degree": d}
        medges.unpersist()
    return res


# ---------------------------------------------------------------------------
# rendering
# ---------------------------------------------------------------------------

def render_md(state: dict) -> str:
    parts = ["# BENCH/SKEW — skew-safety evidence\n"]
    lk = state.get("linking")
    if lk:
        parts.append(
            f"\n## Linking: salted join vs skewed shuffle join\n\n"
            f"{lk['mentions']:,} mentions, {lk['hot_share']:.0%} of them hitting "
            f"{lk['hot_keys']} hot keys\n({lk['entities']}-entity dictionary), "
            "broadcast disabled to force the\nshuffle-join regime (the "
            "'dictionary too big to broadcast' case).\n\n"
            "| variant | steady sec |\n|---|---|\n"
            f"| plain shuffle join, AQE skew OFF | {lk['plain_shuffle_noAQEskew_sec']} |\n"
            f"| plain shuffle join, AQE skew ON | {lk['plain_shuffle_AQEskew_sec']} |\n"
            f"| salted join (salt=16), AQE skew OFF | {lk['salted_noAQEskew_sec']} |\n\n"
            "The pipeline's DEFAULT is a broadcast join (skew-immune, no shuffle\n"
            "of the mention stream); this experiment covers the fallback regime\n"
            "and shows explicit salting recovers the skew penalty without AQE.\n"
        )
    rw = state.get("rewrites")
    if rw:
        def table(name, data):
            rows = "".join(
                f"| {k.replace('_', ' ')} | {v['hot_degree']:,} | {v['pairs']:,} | {v['sec']} |\n"
                for k, v in sorted(data.items())
            )
            return (
                f"\n### {name}\n\n| variant | hub degree | output pairs | sec |\n"
                "|---|---|---|---|\n" + rows
            )

        th = rw["two_hop"]; mb = rw["metabolite"]
        blow_pairs = th["10x_unguarded"]["pairs"] / max(th["base_unguarded"]["pairs"], 1)
        guard_pairs = th["10x_guarded"]["pairs"] / max(th["base_guarded"]["pairs"], 1)
        mb_blow = mb["10x_unguarded"]["pairs"] / max(mb["base_unguarded"]["pairs"], 1)
        mb_guard = mb["10x_guarded"]["pairs"] / max(mb["base_guarded"]["pairs"], 1)
        parts.append(
            "\n## Graph rewrites: common-flag exclusion under 10x hub skew\n\n"
            "two_hop_edges and metabolite_link implement the reference's own\n"
            "common=false guard (post-import-cypher.txt:6-12,19) as a\n"
            "filter-BEFORE-the-self-join.  A hub of degree D contributes\n"
            "O(D^2) pairs unguarded, so at 10x hub degree the hub term grows\n"
            "100x (the totals below include the skew-free regular pairs) while\n"
            "the guarded variant must stay exactly flat.\n"
            f"Fixture: {rw['n_entities']:,} entities / {rw['n_reactions']:,} "
            f"reactions, hub degree {rw['base_hot_degree']:,} -> "
            f"{rw['base_hot_degree'] * 10:,}.\n"
            + table("two_hop_edges (SAME_AS through a shared synonym hub)", th)
            + table("metabolite_link (ATP->r->H2O diamonds)", mb)
            + f"\nPair growth at 10x hub degree: two_hop unguarded **{blow_pairs:.0f}x** vs "
            f"guarded **{guard_pairs:.2f}x**; metabolite unguarded **{mb_blow:.0f}x** vs "
            f"guarded **{mb_guard:.2f}x** — the exclusion bounds the output and the\n"
            "runtime regardless of hub degree, which is what survives a 100 TB\n"
            "corpus where Zipf-head entities grow with the data.\n"
        )
    return "".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mentions", type=int, default=4_000_000)
    ap.add_argument("--hot-share", type=float, default=0.5)
    ap.add_argument("--entities", type=int, default=2000)
    ap.add_argument("--hot", type=int, default=4)
    ap.add_argument("--rw-entities", type=int, default=200_000)
    ap.add_argument("--rw-reactions", type=int, default=200_000)
    # base hub degree 500: the 10x unguarded runs produce ~25M pairs (5000^2)
    # — big enough to show the quadratic, small enough to count in seconds
    ap.add_argument("--rw-hot-degree", type=int, default=500)
    ap.add_argument("--skip-linking", action="store_true")
    ap.add_argument("--skip-rewrites", action="store_true")
    args = ap.parse_args()

    from graphene_spark.session import get_spark

    spark = get_spark(
        "skew-bench",
        master="local[16]",
        shuffle_partitions=32,
        extra_conf={
            # force the shuffle-join regime: no auto-broadcast EXCEPT the
            # explicit broadcast() hints the ops under test apply themselves
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    state = {}
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            state = json.load(f)
    if not args.skip_linking:
        state["linking"] = run_linking(spark, args)
    if not args.skip_rewrites:
        state["rewrites"] = run_rewrites(spark, args)

    os.makedirs(os.path.dirname(RESULTS_PATH), exist_ok=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    with open(MD_PATH, "w") as f:
        f.write(render_md(state))
    print(json.dumps(state))
    spark.stop()


if __name__ == "__main__":
    main()
