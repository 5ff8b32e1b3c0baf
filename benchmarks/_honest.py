"""Honest wall-clock timing for remote-tunnel (axon/IFRT-proxy) devices.

Why this exists: `jax.block_until_ready` on the axon IFRT proxy acks
*readiness* before remote *execution* finishes, so the classic
"dispatch N, block once" timing loop measures dispatch throughput, not
device throughput (bench.py's r2 headline over-reported ~6x; a chip
cannot run 700 TFLOP/s — see benchmarks/step_time_diag.py). A real
device->host VALUE transfer cannot complete before every computation it
depends on has executed, so every timed window here ends with one
scalar fetch. The fetch itself costs ~1 tunnel RTT; `time_per_call`
cancels that fixed overhead by differencing two window sizes:

    t(K) = fetch_overhead + K * per_call
    per_call = (t(K2) - t(K1)) / (K2 - K1)

Best-of-reps per window size rides out tunnel interference (±10% on
long windows, up to 2x on short ones).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fetch_scalar(tree) -> float:
    """Pull ONE element of `tree` to the host as a python float.

    This is the honesty barrier: the value read cannot return before the
    computation producing it has actually executed on the device.
    """
    leaf = next(l for l in jax.tree.leaves(tree) if hasattr(l, "size"))
    return float(np.asarray(jax.device_get(leaf)).ravel()[0])


def time_window(fn, k: int, reps: int = 3) -> float:
    """Best-of-`reps` wall time of k chained fn() calls + one fetch.

    fn(prev) -> pytree; receives the previous call's output (None on the
    first call of each window) so callers can chain data dependencies
    when the computation would otherwise be elidable.
    """
    best = float("inf")
    for _ in range(reps):
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(out)
        fetch_scalar(out)
        best = min(best, time.perf_counter() - t0)
    return best


def time_per_call(fn, k1: int = 5, k2: int = 25, reps: int = 3):
    """K-differenced per-call seconds (and the fixed fetch overhead).

    Returns (per_call_s, overhead_s, t1, t2). Falls back to the
    conservative undifferenced t2/k2 if an interference draw makes the
    difference non-positive.
    """
    t1 = time_window(fn, k1, reps)
    t2 = time_window(fn, k2, reps)
    per_call = (t2 - t1) / (k2 - k1)
    if per_call <= 0:
        per_call = t2 / k2
    overhead = max(t1 - k1 * per_call, 0.0)
    return per_call, overhead, t1, t2
