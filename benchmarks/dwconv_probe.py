"""Pallas depthwise-conv kernel: correctness vs XLA + timing on chip.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/dwconv_probe.py
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openeat_tpu.ops.depthwise_conv import (_pallas_dwconv, _xla_dwconv,
                                            depthwise_conv1d,
                                            depthwise_conv1d_ref)

B, T, C, K = 256, 78, 256, 15
TP = T + K - 1


def timeit(jfn, x):
    out = jfn(x)
    float(np.asarray(out.reshape(-1)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(10):
            y = jfn(y)
        float(np.asarray(y.reshape(-1)[0]))
        best = min(best, time.perf_counter() - t0)
    return round(best / 10 * 1e3, 3)


def main():
    results = {}
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, TP, C), jnp.bfloat16)
    w = (jax.random.normal(key, (K, C), jnp.float32) * 0.1)

    ref = depthwise_conv1d_ref(np.asarray(x, np.float64),
                               np.asarray(w, np.float64))
    a = np.asarray(jax.jit(_pallas_dwconv)(x, w), np.float32)
    b = np.asarray(jax.jit(_xla_dwconv)(x, w.astype(jnp.bfloat16)),
                   np.float32)
    results["pallas_vs_ref"] = float(np.abs(a - ref).max())
    results["xla_vs_ref"] = float(np.abs(b - ref).max())
    print("fwd diffs", results, flush=True)

    # grads vs XLA autodiff
    def loss_pallas(x, w):
        return jnp.sum(depthwise_conv1d(x, w).astype(jnp.float32) ** 2)

    def loss_xla(x, w):
        return jnp.sum(_xla_dwconv(x, w.astype(x.dtype)
                                   ).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(x, w)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(x, w)
    results["dx_diff"] = float(np.abs(np.asarray(gp[0], np.float32)
                                      - np.asarray(gx[0], np.float32)).max())
    results["dw_rel_diff"] = float(
        (np.abs(np.asarray(gp[1]) - np.asarray(gx[1]))
         / (np.abs(np.asarray(gx[1])) + 1.0)).max())
    print("grad diffs", results, flush=True)

    # timing: 24 chained reps INSIDE one jit (a per-call dispatch through
    # the axon tunnel costs ~ms and would swamp the kernel itself)
    def chain(f):
        def g(y):
            for _ in range(24):
                out = f(y[:, :TP], w)
                y = jnp.pad(out, ((0, 0), (0, K - 1), (0, 0)))
            return y
        return jax.jit(g)

    results["t_pallas_ms_x24"] = timeit(chain(_pallas_dwconv), x)
    results["t_xla_ms_x24"] = timeit(
        chain(lambda y, w: _xla_dwconv(y, w.astype(y.dtype))), x)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
