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


def _window_once(fn, k: int) -> float:
    """Wall time of one window: k chained fn() calls + one value fetch.

    fn(prev) -> pytree; receives the previous call's output (None on the
    first call of each window) so callers can chain data dependencies.
    Chaining matters twice over: (a) elision — an unused result can be
    DCE'd; (b) ordering — the closing fetch only syncs the LAST call's
    output, so without a dependency chain honesty would rest on the
    axon proxy executing programs strictly in dispatch order, the very
    runtime property this module exists to distrust (ADVICE r3 low #2).
    Callers that cannot naturally consume `prev` should fold a
    zero-scaled scalar of it into one input.
    """
    out = None
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(out)
    fetch_scalar(out)
    return time.perf_counter() - t0


def time_window(fn, k: int, reps: int = 3) -> float:
    """Best-of-`reps` wall time of k chained fn() calls + one fetch."""
    return min(_window_once(fn, k) for _ in range(reps))


def time_per_call(fn, k1: int = 5, k2: int = 25, reps: int = 3):
    """K-differenced per-call seconds (and the fixed fetch overhead).

    Windows are PAIRED: each rep measures t1 then t2 back-to-back and
    the per-call slope is the min over reps of the paired difference —
    interference hits both windows of a pair roughly alike, unlike
    differencing two independent minima (ADVICE r3 medium #1).

    Returns (per_call_s, overhead_s, t1, t2, fallback). `fallback=True`
    means every paired difference was non-positive (pathological
    interference) and the conservative undifferenced t2/k2 was used —
    in that case `overhead_s` re-includes ~1 window of fetch RTT and is
    NOT a meaningful readback figure.
    """
    pairs = [(_window_once(fn, k1), _window_once(fn, k2))
             for _ in range(reps)]
    diffs = [(b - a) / (k2 - k1) for a, b in pairs]
    t1 = min(a for a, _ in pairs)
    t2 = min(b for _, b in pairs)
    pos = [d for d in diffs if d > 0]
    if pos:
        per_call, fallback = min(pos), False
    else:
        per_call, fallback = t2 / k2, True
    overhead = max(t1 - k1 * per_call, 0.0)
    return per_call, overhead, t1, t2, fallback
