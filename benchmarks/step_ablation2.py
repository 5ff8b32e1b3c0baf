"""Decompose the r4 79 ms flagship step into buckets WITH per-bucket
achieved TFLOP/s (compiled-cost-analysis flops / honest chained-window
time), plus shape-roofline probes at the model's ACTUAL matmul shapes.

The 4096^3 roofline (125 TF/s through the tunnel) is unreachable for a
d=256 Conformer; this script measures what IS reachable at flagship
shapes, so the MFU target can be judged against a shape-limited ceiling
instead of the marketing peak.

Buckets (all with current defaults: optax CTC, rbg PRNG, flat Adam):
  frontend       wav -> fbank + SpecAugment
  embed_fwd      conv2d subsampling only
  encoder_fwd    encoder apply (deterministic)
  loss_fwd       full joint loss forward (train mode, dropout on)
  grad           value_and_grad of the joint loss (no update)
  grad_nodrop    same, deterministic (dropout/specaug cost in bwd)
  step_feat      train_step on precomputed features (grad + clip + Adam)
  e2e            bench.py program (frontend + step)
Derived: update ~= step_feat - grad; frontend_in_step ~= e2e - step_feat.

Shape probes (chained, 24-deep, achieved TF/s at flagship shapes):
  p_ffn     [B*T',256]@[256,1024]->silu->[1024,256]  (macaron FFN)
  p_proj    [B*T',256]@[256,256]                     (attn projections)
  p_scores  [B,h,T',dk]x[B,h,T',dk] score+PV einsums  (attention core)
  p_dwconv  depthwise conv k=15 over [B,T',256]       (conv module)

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
from openeat_tpu.utils.common import train_prng

B, T = 256, 312
K = 10
TP = 78  # T' after x4 subsampling


def flops_of(jfn, *args) -> float | None:
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = (ca or {}).get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def timeit(jfn, eps0=None):
    """jfn(eps)->pytree, chained windows, best of 3, ms/call."""
    eps0 = jnp.float32(0) if eps0 is None else eps0
    out = jfn(eps0)
    float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        eps = eps0
        for _ in range(K):
            out = jfn(eps)
            eps = jax.tree.leaves(out)[0].reshape(-1)[0].astype(
                jnp.float32) * 1e-12
        float(np.asarray(eps))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def report(results, name, jfn, *flop_args, eps0=None):
    ms = timeit(jfn, eps0)
    fl = flops_of(jfn, *(flop_args if flop_args else (jnp.float32(0),)))
    tf = round(fl / (ms / 1e3) / 1e12, 1) if fl else None
    results[name] = {"ms": round(ms, 1), "tflops_per_s": tf,
                     "gflop": round(fl / 1e9, 1) if fl else None}
    print(name, results[name], flush=True)


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
    root = train_prng(0)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["features"], batch["features_length"],
        batch["targets"], batch["targets_length"])
    params = jax.block_until_ready(params)
    results = {}

    report(results, "frontend", jax.jit(
        lambda eps: compute_features(wav + eps, wav_lens, root, fcfg,
                                     True)[0]))

    report(results, "embed_fwd", jax.jit(
        lambda eps: model.apply(
            params, batch["features"] + eps, batch["features_length"],
            method=lambda m, x, xl: m.encoder.embed(
                x.astype(m.compute_dtype), xl))[0]))

    report(results, "encoder_fwd", jax.jit(
        lambda eps: model.apply(params, batch["features"] + eps,
                                batch["features_length"],
                                method=model.encode)[0]))

    def loss_train(p, eps, rng):
        return model.apply(p, batch["features"] + eps,
                           batch["features_length"], batch["targets"],
                           batch["targets_length"], deterministic=False,
                           rngs={"dropout": rng})["loss"]

    def loss_det(p, eps):
        return model.apply(p, batch["features"] + eps,
                           batch["features_length"], batch["targets"],
                           batch["targets_length"])["loss"]

    report(results, "loss_fwd",
           jax.jit(lambda eps: loss_train(params, eps, root)))

    def with_grad(loss):
        def f(eps):
            v, g = jax.value_and_grad(loss)(params, eps)
            return v + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-30
        return jax.jit(f)

    report(results, "grad",
           with_grad(lambda p, eps: loss_train(p, eps, root)))
    report(results, "grad_nodrop", with_grad(loss_det))

    # --- step on precomputed features (grad + clip + flat Adam) ---
    from openeat_tpu.parallel.train_step import build_train_step, init_state
    from openeat_tpu.utils.optim import build_optimizer
    tx, _ = build_optimizer(1e-3, 25000)
    state = init_state(model, tx, batch)
    step_jit = jax.jit(build_train_step(model, tx), donate_argnums=(0,))

    def window(stepper, state, k):
        rng = root
        t0 = time.perf_counter()
        for _ in range(k):
            rng, kk = jax.random.split(rng)
            state, m = stepper(state, kk)
        float(np.asarray(m["loss"]))
        return time.perf_counter() - t0, state

    def bench_step(name, stepper, state):
        _, state = window(stepper, state, 2)  # warm
        best = float("inf")
        for _ in range(3):
            dt1, state = window(stepper, state, 5)
            dt2, state = window(stepper, state, 25)
            if dt2 > dt1:
                best = min(best, (dt2 - dt1) / 20)
        results[name] = {"ms": round(best * 1e3, 1)}
        print(name, results[name], flush=True)
        return state

    state = bench_step("step_feat",
                       lambda s, k: step_jit(s, batch, k), state)

    # --- full e2e (bench.py program) ---
    from functools import partial

    train_step = build_train_step(model, tx)

    @partial(jax.jit, donate_argnums=(0,))
    def e2e(state, rng):
        k1, k2 = jax.random.split(rng)
        feats, flens = compute_features(wav, wav_lens, k1, fcfg, True)
        b = {"features": feats, "features_length": flens,
             "targets": batch["targets"],
             "targets_length": batch["targets_length"]}
        return train_step(state, b, k2)

    state2 = init_state(model, tx, batch)
    bench_step("e2e", e2e, state2)

    # --- shape probes ---
    d, h, dk, ffn = 256, 4, 64, 1024
    n = B * TP
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (n, d), jnp.bfloat16)
    w1 = jax.random.normal(key, (d, ffn), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (ffn, d), jnp.bfloat16) * 0.02
    wp = jax.random.normal(key, (d, d), jnp.bfloat16) * 0.02

    def chain(f, reps=24):
        def g(eps):
            y = x + eps.astype(jnp.bfloat16)
            for _ in range(reps):
                y = f(y)
            return y
        return jax.jit(g)

    report(results, "p_ffn", chain(lambda y: jax.nn.silu(y @ w1) @ w2))
    report(results, "p_proj", chain(lambda y: y @ wp))

    q = jax.random.normal(key, (B, h, TP, dk), jnp.bfloat16)

    def attn_core(y):
        s = jnp.einsum("bhtd,bhsd->bhts", y, y)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(y.dtype)
        return jnp.einsum("bhts,bhsd->bhtd", p, y)

    def chain_q(f, reps=24):
        def g(eps):
            y = q + eps.astype(jnp.bfloat16)
            for _ in range(reps):
                y = f(y)
            return y
        return jax.jit(g)

    report(results, "p_scores", chain_q(attn_core))

    xc = jax.random.normal(key, (B, TP, d), jnp.bfloat16)
    wd = jax.random.normal(key, (15, 1, d), jnp.bfloat16) * 0.1

    def dwconv(y):
        return jax.lax.conv_general_dilated(
            y, wd, (1,), "SAME", feature_group_count=d,
            dimension_numbers=("NWC", "WIO", "NWC"))

    def chain_c(f, reps=24):
        def g(eps):
            y = xc + eps.astype(jnp.bfloat16)
            for _ in range(reps):
                y = f(y)
            return y
        return jax.jit(g)

    report(results, "p_dwconv", chain_c(dwconv))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
