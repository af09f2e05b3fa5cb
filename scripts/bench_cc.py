"""Scale evidence for connected_components (VERDICT r4 task #4).

Builds a deterministic skewed graph DISTRIBUTED-style (spark.range
arithmetic, no driver-side edge lists): one giant path component — the
worst case for star-contraction depth — plus a Zipf-ish tail of stars,
runs ``connected_components_with_stats``, and verifies the full component
structure against the construction (exact component count and the exact
size multiset), so the run is correctness evidence at scale, not just a
timing.

Default scale: ~10.4M edges / ~12.2M nodes on local[32].  Output: one JSON
line {n_edges, n_nodes, rounds, wall_sec, bound, ok}; paste into
BENCH/NOTES.md.

Run: python scripts/bench_cc.py [--edges-scale 1.0] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402


def build_skewed_edges(spark, scale: float = 1.0):
    """Deterministic skewed component mix, all via spark.range (distributed):

    * giant path: P nodes in a single chain (depth stress — star contraction
      must fold a diameter-P component);
    * 10 large stars of S nodes (hub stress: one center, S-1 spokes);
    * T triangle components (3 nodes, 3 edges: cyclic redundancy);
    * M pair components (2 nodes, 1 edge: the modal alias-dup case).

    Returns (edges_df, expected: dict size -> count of components).
    """
    P = int(4_000_000 * scale)
    S = int(200_000 * scale)
    T = int(1_000_000 * scale)
    M = int(2_000_000 * scale)
    base = 0
    # giant path: i -> i+1
    path = (
        spark.range(base, base + P - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    base += P
    # 10 stars: center c_k = base + k*S, spokes c_k + j (j in 1..S-1)
    stars = (
        spark.range(10 * (S - 1))
        .select(
            (F.lit(base) + F.expr(f"id div {S - 1}") * S).alias("src"),
            (
                F.lit(base)
                + F.expr(f"id div {S - 1}") * S
                + F.col("id") % (S - 1)
                + 1
            ).alias("dst"),
        )
    )
    base += 10 * S
    # triangles: nodes (b, b+1, b+2), edges (b,b+1),(b+1,b+2),(b+2,b)
    tri_base = base
    tri = (
        spark.range(3 * T)
        .select(
            (F.lit(tri_base) + F.expr("id div 3") * 3 + F.col("id") % 3).alias("src"),
            (
                F.lit(tri_base)
                + F.expr("id div 3") * 3
                + (F.col("id") + 1) % 3
            ).alias("dst"),
        )
    )
    base += 3 * T
    # pairs: (b, b+1)
    pairs = (
        spark.range(M)
        .select(
            (F.lit(base) + F.col("id") * 2).alias("src"),
            (F.lit(base) + F.col("id") * 2 + 1).alias("dst"),
        )
    )
    edges = path.unionByName(stars).unionByName(tri).unionByName(pairs)
    expected = {P: 1, S: 10, 3: T, 2: M}
    return edges, expected


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges-scale", type=float, default=1.0)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument(
        "--freeze-every", type=int, default=2,
        help="freeze closed-star components every K rounds (0 = r5 behavior) "
        "— run with 0 and 2 for the early-termination A/B",
    )
    args = ap.parse_args()

    from graphene_spark.canonicalize import connected_components_with_stats
    from graphene_spark.session import get_spark

    spark = get_spark("bench-cc", master=f"local[{args.cpus}]",
                      shuffle_partitions=2 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    edges, expected = build_skewed_edges(spark, args.edges_scale)
    edges = edges.repartition(2 * args.cpus).persist()
    n_edges = edges.count()  # materialize outside the timed region

    t0 = time.monotonic()
    cc, rounds = connected_components_with_stats(
        edges, max_iter=40, freeze_every=args.freeze_every
    )
    # size multiset check forces full evaluation — the timed region includes
    # every shuffle of every round AND the final membership join
    sizes = {
        r["sz"]: r["n_comp"]
        for r in cc.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").alias("n_comp"))
        .collect()
    }
    wall = time.monotonic() - t0

    n_nodes = sum(sz * n for sz, n in expected.items())
    bound = math.ceil(math.log2(n_nodes)) + 2
    ok = sizes == expected and rounds <= bound
    print(json.dumps({
        "n_edges": n_edges,
        "freeze_every": args.freeze_every,
        "n_nodes": n_nodes,
        "rounds": rounds,
        "rounds_bound_log2n_plus2": bound,
        "wall_sec": round(wall, 2),
        "edges_per_sec": int(n_edges / wall),
        "sizes_ok": sizes == expected,
        "ok": ok,
    }))
    if not ok:
        print(f"MISMATCH: got sizes {sizes} vs expected {expected}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
