"""Probe round 3: subsampling-conv formulations + frontend impl A/B.

  fe_conv / fe_matmul  compute_features with each fbank fft_impl forced
  sub_lax              current Conv2dSubsampling4 conv pair (lax.conv)
  sub_c1mm             conv1 (C_in=1, degenerate) as 9-slice patches
                       matmul, conv2 via lax.conv
  sub_c2shift          conv1 via lax.conv, conv2 as 9 shifted matmuls
  sub_bothmm           both convs reformulated

All on flagship shapes [256, 312, 80] bf16. Chained windows, ms/call.
PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_probe_r4c.py
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openeat_tpu.ops.frontend import FrontendConfig
from openeat_tpu.ops import fbank as fbank_mod
from openeat_tpu.ops.frontend import augment_features
from openeat_tpu.utils.common import train_prng

B, T, F, D = 256, 312, 80, 256
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

    def fe(impl):
        def f(eps):
            feats, flens = fbank_mod.fbank(wav + eps, wav_lens,
                                           fft_impl=impl)
            return augment_features(feats, flens, root, fcfg, True)
        return jax.jit(f)

    for impl in ("conv", "matmul"):
        results[f"fe_{impl}"] = timeit(fe(impl))
        print(f"fe_{impl}", results[f"fe_{impl}"], flush=True)

    # ---- subsampling formulations ----
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, T, F), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, 1, D), jnp.bfloat16) * 0.1
    b1 = jnp.zeros((D,), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, D, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.bfloat16)

    def conv(h, w, b):
        return jax.lax.conv_general_dilated(
            h, w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def conv1_mm(h):
        # h: [B, T, F, 1] -> patches [B, T', F', 9] @ [9, D]
        t_out = (T - 3) // 2 + 1
        f_out = (F - 3) // 2 + 1
        cols = []
        for di in range(3):
            for dj in range(3):
                cols.append(jax.lax.slice(
                    h[..., 0], (0, di, dj),
                    (B, di + 2 * t_out - 1, dj + 2 * f_out - 1),
                    (1, 2, 2)))
        patches = jnp.stack(cols, axis=-1)          # [B, T', F', 9]
        return patches @ w1.reshape(9, D) + b1

    def conv2_shift(h):
        # h: [B, Th, Fh, D]; 9 shifted strided slices @ [D, D] each
        th, fh = h.shape[1], h.shape[2]
        t_out = (th - 3) // 2 + 1
        f_out = (fh - 3) // 2 + 1
        out = None
        for di in range(3):
            for dj in range(3):
                sl = jax.lax.slice(
                    h, (0, di, dj, 0),
                    (B, di + 2 * t_out - 1, dj + 2 * f_out - 1, D),
                    (1, 2, 2, 1))
                term = jnp.einsum("btfc,cd->btfd", sl, w2[di, dj],
                                  preferred_element_type=jnp.float32)
                out = term if out is None else out + term
        return out.astype(h.dtype) + b2

    def sub(first, second):
        def f(eps):
            h = (x + eps.astype(jnp.bfloat16))[..., None]
            h = jax.nn.relu(first(h) if first is conv1_mm
                            else conv(h, w1, b1))
            h = jax.nn.relu(second(h) if second is conv2_shift
                            else conv(h, w2, b2))
            return h
        return jax.jit(f)

    variants = {
        "sub_lax": sub(None, None),
        "sub_c1mm": sub(conv1_mm, None),
        "sub_c2shift": sub(None, conv2_shift),
        "sub_bothmm": sub(conv1_mm, conv2_shift),
    }
    base = None
    for nm, f in variants.items():
        results[nm] = timeit(f)
        print(nm, results[nm], flush=True)
        val = np.asarray(f(jnp.float32(0)), np.float32)
        if base is None:
            base = val
        else:
            results[nm + "_maxdiff"] = float(np.abs(val - base).max())

    print(json.dumps(results))


if __name__ == "__main__":
    main()
