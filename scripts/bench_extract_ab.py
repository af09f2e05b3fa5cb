"""Fair single-core A/B of the extraction loop: C gazetteer scanner vs regex.

Round-5 profile (BENCH/NOTES.md): extract_mentions = 26% of extraction-stage
CPU — the largest line item.  This measures the whole `_extract_batch` loop
(the unit mapInArrow executes) on datagen transcripts, best-of-N per side,
alternating sides per repetition so slow drift in box weather hits both
equally.  No Spark — pure worker-loop time.

Usage: python scripts/bench_extract_ab.py [--turns 200000] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphene_spark import datagen, extract, native_scan  # noqa: E402


def make_batch(n_turns: int):
    from graphene_spark import pipeline

    dic = datagen.make_entity_dictionary(n_entities=500, n_hot=10, seed=42)
    n_convs = max(n_turns // 20, 1)
    tx = datagen.make_transcripts(n_convs=n_convs, turns_per_conv=20,
                                  n_entities=500, n_hot=10, seed=42)
    conv_in = list(tx["conv_id"])
    turn_in = list(tx["turn_idx"])
    text_in = list(tx["text"])
    aliases = tuple(sorted(set(pipeline.all_aliases(dic))))
    return conv_in, turn_in, text_in, aliases


def run_side(conv_in, turn_in, text_in, text_arr, aliases, mode: str) -> float:
    """One timed pass of what mapInArrow executes per batch: the scan (from
    the RecordBatch's existing Arrow buffer — production never builds one)
    plus the shared emit loop.  mode: 'regex' | 'native' (mentions-only C
    scan, regex grammar) | 'full' (mentions + relation grammar in C)."""
    gaz = extract._gaz_for(aliases)
    scanner = native_scan.scanner_for(aliases) if mode != "regex" else None
    t0 = time.perf_counter()
    pre = cl = None
    if scanner is not None:
        if mode == "full":
            pre, cl = scanner.scan_full_arrow(text_arr, text_in)  # cl=(spans, cols)
        else:
            pre = scanner.scan_arrow(text_arr, text_in)
    extract._extract_batch(conv_in, turn_in, text_in, gaz, None,
                           mentions_pre=pre, clauses_pre=cl)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import pyarrow as pa

    conv_in, turn_in, text_in, aliases = make_batch(args.turns)
    text_arr = pa.array(text_in, pa.string())
    n = len(text_in)
    if native_scan.scanner_for(aliases) is None:
        print(json.dumps({"error": "native scanner unavailable"}))
        return
    # warmup all sides (compile automaton, fill normalize cache, JIT nothing)
    for mode in ("full", "native", "regex"):
        run_side(conv_in, turn_in, text_in, text_arr, aliases, mode)
    times: dict[str, list[float]] = {"full": [], "native": [], "regex": []}
    for _ in range(args.reps):
        for mode in ("full", "native", "regex"):
            times[mode].append(
                run_side(conv_in, turn_in, text_in, text_arr, aliases, mode)
            )
    best = {m: min(v) for m, v in times.items()}
    print(json.dumps({
        "turns": n,
        "regex_best_sec": round(best["regex"], 3),
        "native_best_sec": round(best["native"], 3),
        "full_best_sec": round(best["full"], 3),
        "regex_tps": round(n / best["regex"]),
        "native_tps": round(n / best["native"]),
        "full_tps": round(n / best["full"]),
        "speedup_native_vs_regex": round(best["regex"] / best["native"], 3),
        "speedup_full_vs_native": round(best["native"] / best["full"], 3),
        "speedup_full_vs_regex": round(best["regex"] / best["full"], 3),
        "regex_all": [round(x, 3) for x in times["regex"]],
        "native_all": [round(x, 3) for x in times["native"]],
        "full_all": [round(x, 3) for x in times["full"]],
    }))


if __name__ == "__main__":
    main()
