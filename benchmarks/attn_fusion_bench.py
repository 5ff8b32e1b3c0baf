"""Rel-pos score fusion A/B at the production bench shape (real TPU).

Measures the full e2e train step (waveform -> frontend -> fwd/bwd ->
Adam) on the flagship model at the 80k-frame bench batch with
FUSED_RELPOS_SCORES on and off (VERDICT r1 item 10 / TODO attention
fusion). Prints one JSON line per variant; the winner stays the default
in openeat_tpu.modules.attention.

Run alone (tunnel interference skews timings):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attn_fusion_bench.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openeat_tpu.modules import attention as attn_mod


def build_and_time(fused: bool, b=256, t=312):
    from __graft_entry__ import _example_batch, _flagship_model
    from openeat_tpu.ops.frontend import FrontendConfig, compute_features
    from openeat_tpu.parallel.train_step import build_train_step, init_state
    from openeat_tpu.utils.optim import build_optimizer

    attn_mod.FUSED_RELPOS_SCORES = fused
    n_samples = t * 160 + 240
    model = _flagship_model()
    rng_np = np.random.default_rng(0)
    wav = jnp.asarray((rng_np.standard_normal((b, n_samples)) * 3000
                       ).astype(np.float32))
    wav_lens = jnp.full((b,), n_samples, jnp.int32)
    fcfg = FrontendConfig(num_mel_bins=80, spec_aug=True)
    proto = _example_batch(b=b, t=t, f=80, l=24)
    proto["features_length"] = jnp.full((b,), t, jnp.int32)
    tx, _ = build_optimizer(1e-3, 25000)
    state = init_state(model, tx, proto)
    train_step = build_train_step(model, tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def e2e_step(state, wav, wav_lens, targets, target_lens, rng):
        k1, k2 = jax.random.split(rng)
        feats, flens = compute_features(wav, wav_lens, k1, fcfg, True)
        batch = {"features": feats, "features_length": flens,
                 "targets": targets, "targets_length": target_lens}
        return train_step(state, batch, k2)

    rng = jax.random.PRNGKey(0)
    tgt, tlen = proto["targets"], proto["targets_length"]
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, m = e2e_step(state, wav, wav_lens, tgt, tlen, k)
    from _honest import fetch_scalar, time_per_call
    fetch_scalar(m["loss"])

    # steps chain through the donated `state`; the window's closing
    # VALUE fetch + K-differencing make this honest on the axon proxy
    # (block_until_ready acks before remote execution — _honest.py)
    def one_step(_):
        nonlocal state, rng
        rng, k = jax.random.split(rng)
        state, m = e2e_step(state, wav, wav_lens, tgt, tlen, k)
        return m["loss"]

    per_step, _, _, _, _ = time_per_call(one_step, k1=5, k2=20, reps=3)
    return per_step * 1000.0  # ms/step


def main():
    results = {}
    for fused in (False, True):
        ms = build_and_time(fused)
        results["fused" if fused else "two_einsum"] = ms
        print(json.dumps({"metric": "e2e_step_ms",
                          "variant": "fused" if fused else "two_einsum",
                          "value": round(ms, 3)}), flush=True)
    speedup = results["two_einsum"] / results["fused"]
    print(json.dumps({"metric": "fusion_speedup", "value": round(speedup, 4),
                      "keep_fused": speedup > 1.0}))


if __name__ == "__main__":
    main()
