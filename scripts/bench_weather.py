"""Box-weather probe: is the machine actually quiet, or just idle-looking?

The scaling protocol (bench_scaling.py) runs on a shared box where
co-tenant activity sometimes depresses EVERY per-side throughput 10-30%
while the load average reads idle (BENCH/BASELINE.md weather note).  The
load average cannot see disk- or DRAM-level contention from a co-tenant
VM; this probe can, because the extraction pipeline's large-N residual is
DRAM-bandwidth-bound (BENCH/BASELINE.md analysis), so the same contention
that moves the bench moves a plain memory-copy benchmark.

Measures in ~10 s, no Spark:

* ``cpu_spin_ms``    — fixed pure-Python loop (single-core scalar speed;
                       also catches CPU steal on a shared VM)
* ``memcpy_gbps_1t`` — single-thread numpy copy bandwidth of a 1 GiB
                       buffer (uncontended DRAM path)
* ``memcpy_gbps_8t`` — the same copy from 8 concurrent threads (numpy
                       releases the GIL), aggregate GB/s — the co-tenant-
                       sensitive number: it saturates the memory bus the
                       way the 16-core extraction stage does

Protocol: run the probe immediately BEFORE a bench_scaling sample and
record both.  Two samples are comparable when their probe readings agree
to ~10%; a bench delta without a probe delta is a code change, a bench
delta WITH a probe delta is weather.  Prints one JSON line.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

BUF_MB = 1024
THREADS = 8
REPS = 3


def cpu_spin_ms() -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i ^ (i >> 3)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _copy_gbps(src: np.ndarray, dst: np.ndarray) -> float:
    t0 = time.perf_counter()
    np.copyto(dst, src)
    dt = time.perf_counter() - t0
    # a copy moves the buffer twice (read + write)
    return 2 * src.nbytes / dt / 1e9


def memcpy_1t() -> float:
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    return max(_copy_gbps(src, dst) for _ in range(REPS))


def memcpy_mt() -> float:
    # per-thread private buffers: measures aggregate bus bandwidth, not
    # cache sharing.  Sized so the set (2 bufs x 8 threads x 256 MiB = 4 GiB)
    # cannot fit in any cache level.
    per = BUF_MB // 4
    bufs = [
        (np.ones(per * 1024 * 1024 // 8, dtype=np.float64),
         np.empty(per * 1024 * 1024 // 8, dtype=np.float64))
        for _ in range(THREADS)
    ]
    best = 0.0
    with ThreadPoolExecutor(max_workers=THREADS) as ex:
        for _ in range(REPS):
            t0 = time.perf_counter()
            list(ex.map(lambda sd: np.copyto(sd[1], sd[0]), bufs))
            dt = time.perf_counter() - t0
            total = sum(2 * s.nbytes for s, _ in bufs)
            best = max(best, total / dt / 1e9)
    return best


def main() -> None:
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    out = {
        "cpu_spin_ms": round(cpu_spin_ms(), 1),
        "memcpy_gbps_1t": round(memcpy_1t(), 2),
        "memcpy_gbps_8t": round(memcpy_mt(), 2),
        "load1": load1,
        "ts": int(time.time()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
