#!/usr/bin/env python
"""Host scaling-ceiling probe (no Spark): measures what THIS machine can
scale from 1 to 4 processes for (a) register-only CPU work and (b)
memory-bandwidth-bound work (64 MB buffer copies).

A shuffle-heavy data engine moves hundreds of bytes per row through
memory (scan → flatten → hash shuffle → aggregate → write), so its
parallel ceiling on one box is the MEMORY subsystem's, not the core
count. On this sandbox VM (hypervisor guest) the measured 1→4 memory
bandwidth efficiency is ~0.6 (noisy, 0.23-0.70 across reps) while
register-only CPU is ~1.0 — i.e. the 0.8 end-to-end gate is not
reachable here for ANY bandwidth-bound workload, independent of the
software. On a real cluster each executor brings its own memory
channels, so this ceiling does not exist (the reason the north rule's
N→4N criterion is about executors, not threads).

Usage: python bench/host_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import statistics
import time


def burn_cpu(q, secs: float) -> None:
    t_end = time.time() + secs
    n = 0
    x = 1.0
    while time.time() < t_end:
        for _ in range(100_000):
            x = x * 1.0000001 + 1e-9
        n += 1
    q.put(n)


def burn_membw(q, secs: float) -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, size=64 * 1024 * 1024, dtype=np.uint8)
    t_end = time.time() + secs
    n = 0
    while time.time() < t_end:
        dst = src.copy()  # bandwidth-bound: 128 MB moved per iteration
        src[:: 4096] = dst[:: 4096] + 1
        n += 1
    q.put(n)


def run(fn, nproc: int, secs: float = 6.0) -> int:
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, secs)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def probe(fn, reps: int = 3) -> dict:
    effs = []
    for _ in range(reps):
        a = run(fn, 1)
        b = run(fn, 4)
        effs.append(round((b / a) / 4, 3))
    return {"per_rep_eff_1_to_4": effs, "median_eff": statistics.median(effs)}


if __name__ == "__main__":
    out = {
        "cpu_register_only": probe(burn_cpu),
        "memory_bandwidth_64mb_copy": probe(burn_membw),
    }
    print(json.dumps(out))
