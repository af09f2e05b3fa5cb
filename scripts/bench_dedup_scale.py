"""Dedup wall-time scaling in corpus size (VERDICT r4 task #8).

Runs ``minhash_duplicates`` on the sf0.1 documents table at 1x and at Kx
(default 10x), where the Kx corpus is K disjoint replicas: replica k maps
every word w -> 'w' + 'r<k>'.  The transform preserves every within-replica
shingle relation EXACTLY (same words map the same way), so replica k
contains precisely the base corpus's near-dup pairs, while replicas share
ZERO shingles with each other (every token differs) — so the Kx corpus has
K * pairs(1x) true pairs and the same per-doc duplicate structure.  That
makes the run self-checking: pairs(Kx) == K * pairs(1x) exactly, and the
linear-scaling claim is measured on a corpus whose answer is known.

Per-stage attribution: the signature stage (shingle+minhash UDF) is timed
separately from the full pipeline at both scales.

Output: one JSON line; paste into BENCH/NOTES.md.
Run (quiet window): python scripts/bench_dedup_scale.py [--k 10] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402


def replicate(docs, k: int):
    """K disjoint replicas of the corpus (see module docstring)."""
    reps = []
    for i in range(k):
        reps.append(
            docs.select(
                (F.col("doc_id") * k + i).alias("doc_id"),
                F.array_join(
                    F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"r{i}"))),
                    " ",
                ).alias("text"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10",
                    help="comma-separated replica counts; wall ratio compares "
                         "the LAST TWO (at sf0.1 the 1x corpus is fixed-cost-"
                         "dominated — use 10,100 for the data-dominated regime)")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from graphene_spark.session import get_spark
    from graphene_spark.tdp import dedup as dd

    spark = get_spark("bench-dedup-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=2 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # pool warm-up (fork + pandas import) so neither scale pays it
    spark.range(args.cpus * 4).repartition(args.cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    scales = [int(s) for s in args.scales.split(",")]
    results = {}
    for k in scales:
        label = f"{k}x"
        corpus = replicate(base, k).persist()
        n_docs = corpus.count()

        t0 = time.monotonic()
        sig = dd.signature_frame(corpus, "doc_id", "text")
        # hash the WHOLE signature array: a bare count() lets Catalyst prune
        # the signature expressions away and times an empty scan
        sig.agg(F.expr("bit_xor(xxhash64(_sig))")).collect()
        sig_sec = time.monotonic() - t0

        t0 = time.monotonic()
        pairs = dd.minhash_duplicates(corpus, id_col="doc_id", text_col="text",
                                      threshold=0.7)
        n_pairs = pairs.count()
        full_sec = time.monotonic() - t0
        corpus.unpersist()
        results[label] = {
            "n_docs": n_docs, "n_pairs": n_pairs,
            "sig_sec": round(sig_sec, 2), "full_sec": round(full_sec, 2),
            "docs_per_sec": int(n_docs / full_sec),
        }

    # a single-scale invocation still reports its measurements (ratio 1.0)
    # instead of crashing after the expensive runs completed
    lo, hi = (scales[-2], scales[-1]) if len(scales) >= 2 else (scales[-1], scales[-1])
    r_lo, r_hi = results[f"{lo}x"], results[f"{hi}x"]
    # recall vs the known answer: the exact verify never admits a false
    # positive, so n_pairs <= k * base_pairs and the deficit is purely LSH
    # candidate misses (per-pair miss probability ~1e-5 at the corpus's
    # j >= 0.93 — see tdp_minhash_dedup oracle argument).  Require >= 0.999.
    base_pairs = results[f"{scales[0]}x"]["n_pairs"] / scales[0]
    recalls = {f"{k}x": results[f"{k}x"]["n_pairs"] / (k * base_pairs) for k in scales}
    ok = all(r >= 0.999 for r in recalls.values())
    print(json.dumps({
        **{f"{k}.{f}": v for k, vals in results.items() for f, v in vals.items()},
        "scales": scales,
        "pair_recall_vs_linear": {k: round(v, 5) for k, v in recalls.items()},
        "data_ratio": round(hi / lo, 2),
        "wall_ratio_full": round(r_hi["full_sec"] / r_lo["full_sec"], 2),
        "wall_ratio_sig": round(r_hi["sig_sec"] / r_lo["sig_sec"], 2),
    }))
    if not ok:
        print(f"RECALL BELOW 0.999: {recalls}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
