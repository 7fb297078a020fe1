"""Scaling-floor microbench: WHICH hardware resource caps 2->8 scaling?

The north rule asks >=0.8 throughput scaling efficiency from N to 4N
executors. In this sandbox both levels are emulated on ONE machine, so
per-core resources that a real scale-out holds constant (DRAM queue
slots, LLC, clock budget) are instead divided. This probe measures
each candidate resource with ZERO Spark and ZERO pipeline logic, P
pinned processes per level:

* ``stream``: sequential block copy of a 256 MiB buffer per process —
  prefetch-friendly DRAM **bandwidth** (what a columnar scan or a
  sort's merge pass does).  Measured on this box: scales ~1.0 at 2->8,
  so raw bandwidth is NOT the limiter.
* ``gather``: vectorized random gather from a 256 MiB array — DRAM
  **latency/queueing** under concurrency (what hash probes, dictionary
  encode, and GC pointer-walks do). This is the resource a JVM row
  pipeline actually leans on.
* ``cache``: sum over a 48 KiB L1/L2-resident array — no DRAM traffic;
  isolates scheduler / frequency effects.
* ``spin``: pure-Python integer loop — registers + interpreter only;
  the control that should always scale ~1.0.

Efficiency(P_lo -> P_hi) = (thr_hi / thr_lo) / (P_hi / P_lo).

Interpretation: the pipeline's measured task-CPU-time inflation at
2->8 (stage metrics: executorCpuTime per row grows ~1.1-1.2x) is a
floor if and only if ``gather``/``cache`` show the same per-core
slowdown while ``spin`` stays ~1.0. A real N -> 4N executor scale-out
adds whole hosts, keeping per-core DRAM queueing constant — this box
cannot, so the single-box efficiency under-reads the design.

Usage: python tools/scaling_floor.py [--secs 6] [--trials 3]
Prints one JSON line; run it on an otherwise idle box.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _pin(core: int) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass


def _stream_worker(core: int, secs: float, out) -> None:
    import numpy as np

    _pin(core)
    src = np.random.default_rng(core).random(32 * 1024 * 1024)  # 256 MiB
    dst = np.empty_like(src)
    # warm the pages before timing
    np.copyto(dst, src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        np.copyto(dst, src)  # 256 MiB read + 256 MiB write per iter
        n += 1
    dt = time.perf_counter() - t0
    out.put(n * 2 * src.nbytes / dt)  # bytes moved / sec


def _cache_worker(core: int, secs: float, out) -> None:
    import numpy as np

    _pin(core)
    a = np.random.default_rng(core).random(6 * 1024)  # 48 KiB, L1/L2
    acc = 0.0
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        for _ in range(200):
            acc += float(a.sum())
        n += 200
    dt = time.perf_counter() - t0
    out.put(n * a.nbytes / dt)  # cache-resident "bytes"/sec (a rate)


def _gather_worker(core: int, secs: float, out) -> None:
    import numpy as np

    _pin(core)
    rng = np.random.default_rng(core)
    a = rng.random(32 * 1024 * 1024)  # 256 MiB, far beyond LLC share
    idx = rng.integers(0, a.size, size=1 << 20)  # 1M random indices
    a[idx].sum()  # warm pages
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        a[idx].sum()  # 1M random 8B loads: latency/queue-bound
        n += idx.size
    dt = time.perf_counter() - t0
    out.put(n * 8 / dt)  # random bytes touched / sec


def _spin_worker(core: int, secs: float, out) -> None:
    _pin(core)
    n = 0
    x = 1
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100_000
    dt = time.perf_counter() - t0
    out.put(n / dt)  # interpreter int-ops / sec (registers + L1 only)


_WORKERS = {
    "stream": _stream_worker,
    "gather": _gather_worker,
    "cache": _cache_worker,
    "spin": _spin_worker,
}


def _run(kind: str, procs: int, secs: float) -> float:
    """Aggregate throughput of `procs` pinned workers, bytes/sec."""
    worker = _WORKERS[kind]
    q: mp.Queue = mp.Queue()
    # pin to the TOP of the cpu space, like bench.py's small levels
    ncpu = os.cpu_count() or procs
    ps = [
        mp.Process(target=worker, args=(ncpu - 1 - i, secs, q))
        for i in range(procs)
    ]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8))
    args = ap.parse_args()
    lo, hi = args.levels

    out: dict = {"levels": [lo, hi], "secs": args.secs, "trials": args.trials}
    for kind in ("stream", "gather", "cache", "spin"):
        effs = []
        thr_lo_all, thr_hi_all = [], []
        for _ in range(args.trials):
            # interleaved: both levels sampled seconds apart, same as
            # bench.py's protocol (host drift cancels in the ratio)
            thr_lo = _run(kind, lo, args.secs)
            thr_hi = _run(kind, hi, args.secs)
            thr_lo_all.append(thr_lo)
            thr_hi_all.append(thr_hi)
            effs.append((thr_hi / thr_lo) / (hi / lo))
        effs.sort()
        # stream/gather/cache rates are bytes/s -> GiB/s; spin is
        # interpreter int-ops/s -> Gi-ops/s (same 2**30 scale)
        unit = "gibps" if kind != "spin" else "giops"
        out[f"{kind}_{unit}_local{lo}"] = round(
            max(thr_lo_all) / 2**30, 2
        )
        out[f"{kind}_{unit}_local{hi}"] = round(
            max(thr_hi_all) / 2**30, 2
        )
        out[f"{kind}_efficiency_{lo}_to_{hi}"] = round(
            effs[len(effs) // 2], 3
        )
        out[f"{kind}_efficiency_trials"] = [round(e, 3) for e in effs]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
