"""Decompose the full_step - grad = 66 ms gap (r4 step_ablation).

step_ablation.py measured grad (value_and_grad of the joint loss,
deterministic — its loss_fn passed no dropout rngs) at 78 ms but the
full train step at 144 ms. Adam + clip on 30 MB of params is ~1 ms of
HBM traffic, so the difference must be dropout RNG generation
(~60 dropout sites x 5M activations of threefry bits per step), the
optax CTC swap interacting, or something pathological in the update.

Probes (all honest paired-K windows, benchmarks/_honest.py):
  native_base      full step, ctc_impl=native, dropout 0.1  (~144 ms)
  optax_ctc        full step, ctc_impl=optax,  dropout 0.1
  optax_nodrop     full step, ctc_impl=optax,  dropout 0.0
  optax_rbg        full step, ctc_impl=optax,  dropout 0.1, rbg PRNG keys
  update_only      clip + Adam + non-finite mask on fixed grads

Run alone on the real chip (PYTHONPATH=/root/repo:/root/.axon_site).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_batch, _flagship_model
from _honest import time_per_call
from openeat_tpu.parallel.train_step import build_train_step, init_state
from openeat_tpu.utils.optim import build_optimizer

B, T = 256, 312


def time_full_step(model, batch, key_impl=None):
    tx, _ = build_optimizer(1e-3, 25000)
    state = init_state(model, tx, batch)
    step = jax.jit(build_train_step(model, tx), donate_argnums=(0,))

    def make_key(i):
        if key_impl is None:
            return jax.random.PRNGKey(i)
        return jax.random.key(i, impl=key_impl)

    state, m = step(state, batch, make_key(0))
    _ = float(np.asarray(m["loss"]))  # settle

    i = [0]

    def one(_prev):
        nonlocal state
        i[0] += 1
        state, m = step(state, batch, make_key(i[0]))
        return m["loss"]

    per, _, _, _, fb = time_per_call(one, k1=5, k2=20, reps=3)
    return per * 1e3, fb


def time_update_only(model, batch):
    """clip + Adam + non-finite masking on FIXED grads (the tail of
    build_train_step without the grad computation)."""
    import optax
    tx, _ = build_optimizer(1e-3, 25000)
    state = init_state(model, tx, batch)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, state.params)

    @jax.jit
    def upd(state, grads, eps):
        grads = jax.tree.map(lambda g: g + eps.astype(g.dtype), grads)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        scale = jnp.where(finite,
                          jnp.minimum(1.0, 5.0 / jnp.maximum(gnorm, 1e-12)),
                          0.0)
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_opt = jax.tree.map(
            lambda n, o: (jnp.where(finite, n, o)
                          if hasattr(n, "shape") else n),
            new_opt, state.opt_state)
        return state._replace(params=new_params, opt_state=new_opt), gnorm

    state, g = upd(state, grads, jnp.float32(0))
    _ = float(np.asarray(g))

    def one(prev):
        nonlocal state
        eps = (jnp.float32(0) if prev is None
               else prev.astype(jnp.float32) * 1e-30)
        state, g = upd(state, grads, eps)
        return g

    per, _, _, _, fb = time_per_call(one, k1=5, k2=20, reps=3)
    return per * 1e3, fb


def main():
    batch = _example_batch(b=B, t=T, f=80, l=24)
    batch["features_length"] = jnp.full((B,), T, jnp.int32)
    out = {}

    for name, kw, impl in (
            ("native_base", dict(), None),
            ("optax_ctc", dict(ctc_impl="optax"), None),
            ("optax_nodrop", dict(ctc_impl="optax", dropout_rate=0.0), None),
            ("optax_rbg", dict(ctc_impl="optax"), "rbg"),
    ):
        try:
            ms, fb = time_full_step(_flagship_model(**kw), batch, impl)
            out[name] = round(ms, 1) if not fb else f"{ms:.1f} (fallback)"
        except Exception as e:
            out[name] = f"error: {e}"[:160]
        print(name, out[name], flush=True)

    try:
        ms, fb = time_update_only(_flagship_model(ctc_impl="optax"), batch)
        out["update_only"] = round(ms, 1) if not fb else f"{ms:.1f} (fb)"
    except Exception as e:
        out["update_only"] = f"error: {e}"[:160]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
