#!/usr/bin/env python3
"""Deterministic CPU microprobe recorded alongside bench captures.

Bench totals on this box swing ±25% with host state that /proc/cpuinfo
does not expose (fixed 2100 MHz readout). This probe gives each capture a
box-speed anchor so a future round can adjudicate "uniform slowdown vs
real regression" with a measured ratio instead of a median-of-ratios
argument.

Two numbers, both min-of-5 trials:
  st_mops  — single-thread integer/hash loop (sha256 over a fixed 1 MiB
             buffer, 64 rounds), in MiB hashed per second.
  mt_mops  — the same work fanned across all cores via multiprocessing.

Usage: boxprobe.py [OUT.json]   (prints one JSON line; also writes OUT)
"""
import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

BUF = bytes(range(256)) * 4096  # 1 MiB deterministic buffer
ROUNDS = 64


def hash_work(_=None):
    h = hashlib.sha256()
    for _ in range(ROUNDS):
        h.update(BUF)
    return h.hexdigest()


def best_of(f, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    mib = ROUNDS  # MiB hashed per single call
    st = best_of(hash_work)
    ncpu = os.cpu_count()
    with mp.Pool(ncpu) as pool:
        mt = best_of(lambda: pool.map(hash_work, range(ncpu)))
    doc = {
        "st_mibps": round(mib / st, 1),
        "mt_mibps": round(mib * ncpu / mt, 1),
        "ncpu": ncpu,
        "load1": round(os.getloadavg()[0], 2),
        "ts": int(time.time()),
    }
    line = json.dumps(doc)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
