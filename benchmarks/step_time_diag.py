"""Disentangle train-step wall time: compute vs dispatch vs readback.

Motivation: bench.py's honest windows (chained steps ending in a real
device->host scalar fetch) measured 5.1k audio-sec/s where the r2
pre-fix figure (block_until_ready only) said 99k. One of those is
wrong: 99k implies ~700 TFLOP/s on a 197-TFLOP/s chip (impossible —
the axon IFRT proxy acks readiness before remote execution finishes),
while the 5.1k figure may over-penalize: a single scalar readback over
the tunnel costs ~1 s of RTT/queue, amortized over only 10 steps.

Method: time windows of K chained steps (donated state, so step i+1
depends on step i) each ending with ONE float(loss) fetch, for several
K. The line time(K) = fetch_overhead + K * per_step gives both numbers
by differencing: per_step = (t(K2)-t(K1))/(K2-K1). Also times the bare
scalar fetch on an idle device for a direct read of the readback cost.

Run alone on the real chip (PYTHONPATH=/root/repo:/root/.axon_site).
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from bench import build_step


def timed_window(e2e_step, state, args, rng, k):
    t0 = time.perf_counter()
    for _ in range(k):
        rng, kk = jax.random.split(rng)
        state, metrics = e2e_step(state, *args, kk)
    loss = float(np.asarray(metrics["loss"]))
    return time.perf_counter() - t0, state, rng, loss


def main():
    e2e_step, state, args = build_step()
    rng = jax.random.PRNGKey(0)

    # compile + settle
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, metrics = e2e_step(state, *args, k)
    _ = float(np.asarray(metrics["loss"]))

    # bare scalar readback on an idle device (device already synced)
    fetches = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(np.asarray(metrics["loss"]))
        fetches.append(time.perf_counter() - t0)

    results = {}
    for k in (1, 5, 10, 25, 50):
        best = float("inf")
        for _ in range(3):
            dt, state, rng, _ = timed_window(e2e_step, state, args, rng, k)
            best = min(best, dt)
        results[k] = best
        print(f"K={k:3d}: best window {best*1e3:9.1f} ms "
              f"({best/k*1e3:7.1f} ms/step)", flush=True)

    ks = sorted(results)
    # least-squares line t = a + b*K
    A = np.stack([np.ones(len(ks)), np.array(ks, float)], axis=1)
    coef, *_ = np.linalg.lstsq(A, np.array([results[k] for k in ks]),
                               rcond=None)
    overhead_s, per_step_s = float(coef[0]), float(coef[1])
    print(json.dumps({
        "bare_fetch_ms": round(min(fetches) * 1e3, 1),
        "fixed_overhead_ms": round(overhead_s * 1e3, 1),
        "per_step_ms": round(per_step_s * 1e3, 2),
        "windows": {str(k): round(v, 4) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
