"""N -> 4N scaling-efficiency protocol (BASELINE.json north_rule).

Runs the identical extraction+linking job at two parallelism levels
(local[8] and local[32] by default) in SEPARATE JVMs, on the same input,
and reports throughput at both plus efficiency = T_4N / (4 x T_N)-normalized
throughput ratio.  Writes BENCH/BASELINE.md.

Usage:  python bench_scaling.py [--turns 60000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from graphene_spark.session import get_spark
from graphene_spark import datagen, pipeline

cores = int(sys.argv[1]); n_convs = int(sys.argv[2])
spark = get_spark("scale-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
dic = datagen.make_entity_dictionary(n_entities=500, n_hot=10, seed=42)
tx = datagen.make_transcripts(n_convs=n_convs, turns_per_conv=20,
                              n_entities=500, n_hot=10, seed=42)
tdf = spark.createDataFrame(tx).repartition(cores * 2)
tdf.persist().count()
ddf = pipeline.dictionary_to_spark(spark, dic)
aliases = pipeline.all_aliases(dic)
t0 = time.perf_counter()
res = pipeline.run_pipeline(spark, tdf, ddf, aliases)
res["triples"].write.format("noop").mode("overwrite").save()
sec = time.perf_counter() - t0
print("RESULT " + json.dumps({"cores": cores, "turns": len(tx), "sec": sec,
                              "tps": len(tx) / sec}))
spark.stop()
"""


def run_at(cores: int, n_convs: int) -> dict:
    code = WORKER.format(root=ROOT)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_convs)],
        capture_output=True, text=True, timeout=1800, check=False,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker({cores}) failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=60000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism N")
    ap.add_argument("--n4", type=int, default=32, help="large parallelism 4N")
    args = ap.parse_args()
    n_convs = max(args.turns // 20, 10)

    small = run_at(args.n, n_convs)
    large = run_at(args.n4, n_convs)
    ratio = large["tps"] / small["tps"]
    efficiency = ratio / (args.n4 / args.n)

    result = {
        "turns": small["turns"],
        f"tps_local[{args.n}]": round(small["tps"], 1),
        f"tps_local[{args.n4}]": round(large["tps"], 1),
        "speedup": round(ratio, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — scaling protocol results\n\n"
            "Identical extraction+linking job (pandas-UDF extraction, broadcast\n"
            "dictionary link, triple dedup) run in separate JVMs on the same\n"
            f"{small['turns']}-turn synthetic input (seed 42).\n\n"
            "| config | turns/sec |\n|---|---|\n"
            f"| local[{args.n}] (N) | {small['tps']:.1f} |\n"
            f"| local[{args.n4}] (4N) | {large['tps']:.1f} |\n\n"
            f"**Speedup N->4N:** {ratio:.2f}x  \n"
            f"**Scaling efficiency:** {efficiency:.3f} (target >= 0.8)\n\n"
            "Confs: AQE on (coalesce + skew join), Arrow pandas UDFs,\n"
            "shuffle.partitions = 2x cores, input repartitioned to 2x cores,\n"
            "broadcast dictionary join (no shuffle on the mention stream).\n"
        )


if __name__ == "__main__":
    main()
