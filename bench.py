"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "kg_turns_per_sec": ...}

The KG stage (extraction+linking over synthetic transcripts, the
BASELINE.json headline) is timed separately and reported as turns/sec; the
N-vs-4N scaling protocol lives in bench_scaling.py (writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Materialize fully (noop sink avoids count()-only column pruning)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _weather_probe() -> dict | None:
    """Box-weather reading (scripts/bench_weather.py), ~15s, no Spark.

    Recorded before and after the timed region so every bench artifact
    carries its own contention evidence: the BENCH_r05 retrospective showed
    the shared DRAM bus can drop 116 -> 4.7 GB/s at idle load average,
    inflating the total 13% with zero code change (BENCH/NOTES.md).  A
    reading >= ~100 GB/s on ``memcpy_gbps_8t`` both sides marks the run
    quiet-window comparable; a depressed reading marks it weather-suspect."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        import bench_weather as bw

        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        return {
            "cpu_spin_ms": round(bw.cpu_spin_ms(), 1),
            "memcpy_gbps_1t": round(bw.memcpy_1t(), 2),
            "memcpy_gbps_8t": round(bw.memcpy_mt(), 2),
            "load1": load1,
            "ts": int(time.time()),
        }
    except Exception:
        return None  # a bench must never fail on its weather telemetry


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_from_dir(sf_dir)
    weather_before = _weather_probe()

    from graphene_spark.session import get_spark

    spark = get_spark("graphene-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 64)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    headline = [
        "j1_broadcast_equi",
        "j7_two_hop",
        "a4_a6_key_stats",
        "a8_sorted_set_name",
        "w1_w2_chain_rank",
        "s2_split_explode",
        "tdp_exact_dedup",
        "tdp_cosine_topk",
        "tdp_textstats",
    ]
    # JVM warmup (codegen, parquet footer cache, committer init) so the first
    # timed query doesn't absorb session start-up costs
    _force(queries["a4_a6_key_stats"](spark, sf_dir))
    # Python worker-pool warmup (fork + pandas/pyarrow import, one task per
    # core) — a one-time session cost a long-running job amortizes; without
    # this the FIRST pandas-UDF query absorbs ~2-10s of pool spin-up and the
    # per-query rows are not attributable round-over-round (warm-up
    # accounting documented in BENCH/NOTES.md)
    n_cores = int(cpus) if cpus.isdigit() else 32
    warm = spark.range(n_cores * 4).repartition(n_cores)
    warm.mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        _force(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # near-dup detection over the real documents table.  First run compiles
    # ~10 stages of generated code (shape-keyed Janino cache) — a one-time
    # session cost a long-running job amortizes, exactly like the python
    # worker-pool spin-up above — so the comparable line is the steady-state
    # run; the cold run is reported alongside as its own field (warm-up
    # accounting documented in BENCH/NOTES.md)
    from graphene_spark.tdp import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    _force(dedup.minhash_duplicates(docs, threshold=0.7))
    minhash_cold = round(time.perf_counter() - t0, 3)
    # steady state = best of two warm runs (same convention as
    # bench_scaling.py: host contention on the shared box only ever SLOWS a
    # run — observed 4x swings between adjacent identical runs — so the min
    # is the least-biased steady estimate)
    steady = []
    for _ in range(2):
        t0 = time.perf_counter()
        _force(dedup.minhash_duplicates(docs, threshold=0.7))
        steady.append(round(time.perf_counter() - t0, 3))
    timings["tdp_minhash_dedup"] = min(steady)

    # KG stage: extraction + linking throughput (turns/sec) on synthetic
    # transcripts scaled with sf (sf0.1 -> 600k turns), generated DISTRIBUTED
    # so the measured region is engine throughput, not driver-side pandas
    from graphene_spark import datagen, datagen_spark, pipeline

    n_convs = max(int(300_000 * sf), 50) if sf > 0 else 300
    turns_per_conv = 20
    dic = datagen.make_entity_dictionary(n_entities=500, n_hot=10, seed=42)
    tdf = datagen_spark.make_transcripts_df(
        spark, n_convs=n_convs, turns_per_conv=turns_per_conv,
        n_entities=500, n_hot=10, seed=42, partitions=n_cores * 2,
    )
    n_turns = tdf.persist().count()  # input staged; generation excluded from timing
    ddf = pipeline.dictionary_to_spark(spark, dic)
    aliases = pipeline.all_aliases(dic)

    def kg_run() -> float:
        t0 = time.perf_counter()
        res = pipeline.run_pipeline(spark, tdf, ddf, aliases)
        _force(res["triples"])
        return time.perf_counter() - t0

    # first timed run: warm Python pool (warmed above) but cold codegen /
    # broadcast for THIS plan — the round-over-round comparable row
    kg_sec = kg_run()
    timings["kg_extract_link"] = round(kg_sec, 3)
    # steady state: everything warm — the quantity that scales on a cluster
    # (kept OUT of timings/value so totals stay comparable across rounds)
    kg_sec_warm = kg_run()

    total = round(sum(timings.values()), 3)
    spark.stop()
    weather_after = _weather_probe()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "tdp_minhash_dedup_cold": minhash_cold,
                "kg_turns": n_turns,
                "kg_turns_per_sec": round(n_turns / kg_sec, 1),
                "kg_sec_warm": round(kg_sec_warm, 3),
                "kg_turns_per_sec_warm": round(n_turns / kg_sec_warm, 1),
                "cpus": cpus,
                "weather_before": weather_before,
                "weather_after": weather_after,
            }
        )
    )


if __name__ == "__main__":
    main()
