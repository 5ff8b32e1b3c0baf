"""Ablate the flagship train step to locate the ~155 ms/step hot spots.

Times each sub-program independently with the chained-window method
(each iteration's input is perturbed by a scalar read from the previous
iteration's output, so steps are data-dependent and cannot be elided;
one scalar readback per window — see step_time_diag.py):

  frontend     raw wav -> fbank+SpecAugment features
  encoder_fwd  encoder apply only (deterministic)
  ctc_fwd      CTC loss on a fixed encoder output (native Pallas path)
  ctc_scan     same loss on the pure-JAX lax.scan path (use_pallas=False)
  att_fwd      decoder fwd+reverse + label smoothing on fixed enc out
  loss_fwd     full joint loss forward
  grad         value_and_grad of the joint loss
  full_step    grad + clip + Adam update (= bench.py step sans frontend)

Run alone on the real chip: PYTHONPATH=/root/repo:/root/.axon_site.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_batch, _flagship_model
from openeat_tpu.ops.frontend import FrontendConfig, compute_features

B, T = 256, 312
K = 10


def timeit(fn):
    """fn(eps: scalar) -> array pytree. Best of 3 windows of K chained
    calls; returns ms/call."""
    out = fn(jnp.float32(0))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        eps = jnp.float32(0)
        for _ in range(K):
            out = fn(eps)
            eps = jax.tree.leaves(out)[0].reshape(-1)[0].astype(
                jnp.float32) * 1e-12
        float(np.asarray(eps))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    model = _flagship_model()
    batch = _example_batch(b=B, t=T, f=80, l=24)
    batch["features_length"] = jnp.full((B,), T, jnp.int32)
    n_samples = T * 160 + 240
    rng_np = np.random.default_rng(0)
    wav = jnp.asarray((rng_np.standard_normal((B, n_samples)) * 3000
                       ).astype(np.float32))
    wav_lens = jnp.full((B,), n_samples, jnp.int32)
    fcfg = FrontendConfig(num_mel_bins=80, spec_aug=True,
                          spec_aug_num_t=3, spec_aug_max_t=50,
                          spec_aug_num_f=2, spec_aug_max_f=10)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["features"], batch["features_length"],
        batch["targets"], batch["targets_length"])
    params = jax.block_until_ready(params)

    results = {}

    results["frontend"] = timeit(jax.jit(
        lambda eps: compute_features(wav + eps, wav_lens,
                                     jax.random.PRNGKey(0), fcfg, True)[0]))

    results["encoder_fwd"] = timeit(jax.jit(
        lambda eps: model.apply(params, batch["features"] + eps,
                                batch["features_length"],
                                method=model.encode)[0]))

    enc_out, out_lens = jax.jit(
        lambda: model.apply(params, batch["features"],
                            batch["features_length"], method=model.encode))()
    enc_out = jax.block_until_ready(enc_out)

    def ctc_only(m, eo, ol, t, tl):
        return m.ctc.loss(eo, ol, t, tl)

    def att_only(m, eo, ol, t, tl):
        return m._calc_att_loss(eo, ol, t, tl)[0]

    # same params, optax CTC instead of the Pallas kernel
    model_optax = _flagship_model(ctc_impl="optax")
    for name, mdl, meth in (("ctc_fwd", model, ctc_only),
                            ("ctc_optax", model_optax, ctc_only),
                            ("att_fwd", model, att_only)):
        try:
            results[name] = timeit(jax.jit(
                lambda eps, mdl=mdl, meth=meth: mdl.apply(
                    params, enc_out + eps, out_lens, batch["targets"],
                    batch["targets_length"], method=meth)))
        except Exception as e:  # keep the rest of the ablation alive
            results[name] = f"error: {e}"[:120]

    results["loss_fwd"] = timeit(jax.jit(
        lambda eps: model.apply(params, batch["features"] + eps,
                                batch["features_length"], batch["targets"],
                                batch["targets_length"])["loss"]))

    # grad timings: fold a grad leaf into the output so DCE can't drop
    # the backward pass (x*0 would be algebraically simplified away by
    # XLA, severing the dependency — use a tiny nonzero scale instead)
    def with_grad(loss_apply):
        def f(eps):
            v, g = jax.value_and_grad(loss_apply)(params, eps)
            return v + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-30
        return jax.jit(f)

    for name, mdl, meth in (("ctc_grad", model, ctc_only),
                            ("ctc_grad_optax", model_optax, ctc_only),
                            ("att_grad", model, att_only)):
        results[name] = timeit(with_grad(
            lambda p, eps, mdl=mdl, meth=meth: mdl.apply(
                p, enc_out + eps, out_lens, batch["targets"],
                batch["targets_length"], method=meth)))

    def loss_fn(p, eps):
        return model.apply(p, batch["features"] + eps,
                           batch["features_length"], batch["targets"],
                           batch["targets_length"])["loss"]

    results["grad"] = timeit(with_grad(loss_fn))

    from openeat_tpu.parallel.train_step import build_train_step, init_state
    from openeat_tpu.utils.optim import build_optimizer
    tx, _ = build_optimizer(1e-3, 25000)
    state = init_state(model, tx, batch)
    step_jit = jax.jit(build_train_step(model, tx), donate_argnums=(0,))
    state, m = step_jit(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step_jit(state, batch, jax.random.PRNGKey(0))
        float(np.asarray(m["loss"]))
        best = min(best, time.perf_counter() - t0)
    results["full_step"] = best / K * 1e3

    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
