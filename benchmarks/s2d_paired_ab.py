"""Paired back-to-back A/B: lax stride-2 conv pair vs space-to-depth.

The r5 tunnel sessions swing 4-30x between minutes
(benchmarks/results/r5_probes/README.md), so per-variant windows
minutes apart cannot decide a ~30% question. Here the two GRAD
programs (value_and_grad of the full embed pair — forward included,
i.e. the integration-relevant cost) alternate within the same seconds,
for ROUNDS rounds; each round reports the pair measured side by side.
Decision rule: the MEDIAN of per-round ratios.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/s2d_paired_ab.py
"""

from __future__ import annotations

import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from benchmarks._honest import time_per_call
from benchmarks.micro_probe_r5 import (B, D, F, T, conv, s2d, s2d_kernel)

ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))


def main():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, T, F), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, 1, D), jnp.bfloat16) * 0.1
    b1 = jnp.zeros((D,), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, D, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.bfloat16)
    params = (w1, b1, w2, b2)

    def embed(params, xin, *, s2d_form):
        w1, b1, w2, b2 = params
        h = jax.nn.relu(conv(xin[..., None], w1, b1, 2))
        if s2d_form:
            h = jax.nn.relu(conv(s2d(h), s2d_kernel(w2), b2, 1))
        else:
            h = jax.nn.relu(conv(h, w2, b2, 2))
        return h

    def grad_fn(s2d_form):
        def loss(params, xin):
            return jnp.mean(jnp.square(
                embed(params, xin, s2d_form=s2d_form).astype(jnp.float32)))
        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        def chain(prev):
            eps = (jnp.zeros((), jnp.bfloat16) if prev is None
                   else prev[0].astype(jnp.bfloat16) * 1e-12)
            return g(params, x + eps)
        return chain

    lax_chain = grad_fn(False)
    s2d_chain = grad_fn(True)
    # compile both before any timed window
    lax_chain(None)
    s2d_chain(None)

    pairs = []
    for r in range(ROUNDS):
        a, *_ = time_per_call(lax_chain, 3, 12, reps=1)
        b, *_ = time_per_call(s2d_chain, 3, 12, reps=1)
        a2, *_ = time_per_call(lax_chain, 3, 12, reps=1)
        b2, *_ = time_per_call(s2d_chain, 3, 12, reps=1)
        lax_ms = round(min(a, a2) * 1e3, 2)
        s2d_ms = round(min(b, b2) * 1e3, 2)
        pairs.append({"lax_ms": lax_ms, "s2d_ms": s2d_ms,
                      "ratio": round(s2d_ms / lax_ms, 3)})
        print(f"round {r}: lax {lax_ms} s2d {s2d_ms} "
              f"ratio {pairs[-1]['ratio']}", flush=True)
    ratios = sorted(p["ratio"] for p in pairs)
    med = ratios[len(ratios) // 2]
    print(json.dumps({"pairs": pairs, "median_ratio": med,
                      "verdict": "s2d_wins" if med < 0.95 else
                      ("lax_wins" if med > 1.05 else "tie")}))


if __name__ == "__main__":
    main()
