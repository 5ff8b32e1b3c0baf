"""A/B probes for the r4 step-optimization round 2 (run on real chip):

  fe_new      compute_features with strided-slice framing (vs 10.4 ms
              gather baseline, r4_step_diag/step_ablation2.log)
  dw_conv     depthwise conv, lax.conv feature_group_count path
  dw_shift    same op as shift-and-add over 15 taps
  drop_f32    flax-style f32-uniform dropout mask on [20k,1024] bf16
  drop_u8     byte-mask dropout (modules/dropout.py)

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_probe_r4b.py
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openeat_tpu.ops.frontend import FrontendConfig, compute_features
from openeat_tpu.utils.common import train_prng

B, T = 256, 312
K = 10


def timeit(jfn):
    out = jfn(jnp.float32(0))
    float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        eps = jnp.float32(0)
        for _ in range(K):
            out = jfn(eps)
            eps = jax.tree.leaves(out)[0].reshape(-1)[0].astype(
                jnp.float32) * 1e-12
        float(np.asarray(eps))
        best = min(best, time.perf_counter() - t0)
    return round(best / K * 1e3, 2)


def main():
    results = {}
    root = train_prng(0)
    n_samples = T * 160 + 240
    rng_np = np.random.default_rng(0)
    wav = jnp.asarray((rng_np.standard_normal((B, n_samples)) * 3000
                       ).astype(np.float32))
    wav_lens = jnp.full((B,), n_samples, jnp.int32)
    fcfg = FrontendConfig(num_mel_bins=80, spec_aug=True,
                          spec_aug_num_t=3, spec_aug_max_t=50,
                          spec_aug_num_f=2, spec_aug_max_f=10)
    results["fe_new"] = timeit(jax.jit(
        lambda eps: compute_features(wav + eps, wav_lens, root, fcfg,
                                     True)[0]))
    print("fe_new", results["fe_new"], flush=True)

    # depthwise conv variants, flagship conv-module shape
    TP, C, KS = 78, 256, 15
    key = jax.random.PRNGKey(1)
    xc = jax.random.normal(key, (B, TP, C), jnp.bfloat16)
    wd = jax.random.normal(key, (KS, 1, C), jnp.bfloat16) * 0.1

    def dw_conv(y):
        return jax.lax.conv_general_dilated(
            y, wd, (1,), [(KS // 2, KS // 2)], feature_group_count=C,
            dimension_numbers=("NWC", "WIO", "NWC"))

    w2 = wd[:, 0, :]

    def dw_shift(y):
        yp = jnp.pad(y, ((0, 0), (KS // 2, KS // 2), (0, 0)))
        out = yp[:, 0:TP, :] * w2[0]
        for j in range(1, KS):
            out = out + yp[:, j:j + TP, :] * w2[j]
        return out

    def chain(f):
        def g(eps):
            y = xc + eps.astype(jnp.bfloat16)
            for _ in range(24):
                y = f(y)
            return y
        return jax.jit(g)

    for nm, f in (("dw_conv", dw_conv), ("dw_shift", dw_shift)):
        results[nm] = timeit(chain(f))
        print(nm, results[nm], flush=True)
    # numerics agreement
    a = np.asarray(jax.jit(dw_conv)(xc), np.float32)
    b = np.asarray(jax.jit(dw_shift)(xc), np.float32)
    results["dw_max_abs_diff"] = float(np.abs(a - b).max())

    # dropout variants on the FFN-hidden shape
    xh = jax.random.normal(key, (B * TP, 1024), jnp.bfloat16)

    def drop_f32(y, k):
        keep = jax.random.uniform(k, y.shape) >= 0.1
        return jnp.where(keep, y / 0.9, 0)

    def drop_u8(y, k):
        keep = jax.random.bits(k, y.shape, jnp.uint8) < jnp.uint8(230)
        return jnp.where(keep, y * jnp.asarray(256 / 230, y.dtype), 0)

    for nm, f in (("drop_f32", drop_f32), ("drop_u8", drop_u8)):
        def g(eps, f=f):
            y = xh + eps.astype(jnp.bfloat16)
            k = jax.random.fold_in(root, 0)
            for i in range(24):
                k = jax.random.fold_in(k, i)
                y = f(y, k)
            return y
        results[nm] = timeit(jax.jit(g))
        print(nm, results[nm], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
