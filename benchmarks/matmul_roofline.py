"""Measure achievable bf16 matmul TFLOP/s on the attached chip.

A chain of dependent 4096x4096 bf16 matmuls (each iteration feeds the
next, so nothing can be elided or overlapped) approximates the MXU
speed-of-light through whatever runtime sits between host and chip.
If this lands near peak (~197 TFLOP/s on v5e) while the train step
sits at 15% MFU, the train-step program itself is the problem; if this
also lands far below peak, the chip/runtime is the ceiling.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
ITERS = 64  # matmuls per jit call


@jax.jit
def chain(a, b):
    def body(x, _):
        x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        # keep values bounded so the chain can't overflow to inf
        x = x * jnp.bfloat16(1.0 / N)
        return x, ()
    out, _ = jax.lax.scan(body, a, (), length=ITERS)
    return out


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    out = chain(a, b)
    _ = np.asarray(out[0, 0])  # compile + settle

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = chain(a, b)
        _ = float(np.asarray(out[0, 0]))  # forces the whole chain
        best = min(best, time.perf_counter() - t0)

    flops = 2 * N**3 * ITERS
    print(json.dumps({
        "n": N, "iters": ITERS,
        "best_s": round(best, 4),
        "tflops_per_s": round(flops / best / 1e12, 1),
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
