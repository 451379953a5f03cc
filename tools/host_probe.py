"""Host capability probe: aggregate memory bandwidth and raw compute
scaling across thread counts. The north rule's N->4N scaling criterion
can only be evidenced up to what the host itself scales — this probe
measures that ceiling so BENCH/BASELINE scaling numbers can be read
against it (BASELINE.md §scaling).

Usage: python tools/host_probe.py
"""

from __future__ import annotations

import threading
import time

import numpy as np


def membw(nthreads: int, mb: int = 256, iters: int = 8) -> float:
    """GB/s of aggregate memcpy across nthreads (numpy copyto releases
    the GIL)."""
    bufs = [(np.random.rand(mb * 1024 * 1024 // 8),
             np.empty(mb * 1024 * 1024 // 8)) for _ in range(nthreads)]

    def work(i):
        a, b = bufs[i]
        for _ in range(iters):
            np.copyto(b, a)

    t0 = time.monotonic()
    ths = [threading.Thread(target=work, args=(i,))
           for i in range(nthreads)]
    [t.start() for t in ths]
    [t.join() for t in ths]
    dt = time.monotonic() - t0
    return nthreads * iters * mb * 2 / 1024 / dt


def compute(nthreads: int, n: int = 2_000_000, iters: int = 20) -> float:
    """Million sin-evals/s across nthreads (FPU-bound with streaming
    reads)."""
    bufs = [np.random.rand(n) for _ in range(nthreads)]
    out = [0.0] * nthreads

    def work(i):
        s = 0.0
        for _ in range(iters):
            s += float(np.sin(bufs[i]).sum())
        out[i] = s

    t0 = time.monotonic()
    ths = [threading.Thread(target=work, args=(i,))
           for i in range(nthreads)]
    [t.start() for t in ths]
    [t.join() for t in ths]
    dt = time.monotonic() - t0
    return nthreads * iters * n / dt / 1e6


if __name__ == "__main__":
    for nt in (1, 4, 8, 16, 32):
        print(f"{nt:3d} threads: memcpy {membw(nt):6.1f} GB/s   "
              f"compute {compute(nt):7.0f} Msin/s", flush=True)
