"""Round-5 probes (VERDICT r4 next #2 and #5a).

Subsampling embed (the ROOFLINE.md 28-ms / 27%-of-peak bucket;
reference surface openeat/modules/subsampling.py:65-116):

  sub_lax        current Conv2dSubsampling4 pair (lax.conv, stride 2)
  sub_s2d        conv2 space-to-depth: input [B,Th,Fh,D] regrouped into
                 2x2 blocks -> [B,Th/2,Fh/2,4D]; the 3x3 stride-2 conv
                 becomes a 2x2 STRIDE-1 conv with a 4096-wide
                 contraction (9/16 of the relayout kernel is the
                 original weights, the rest zeros -> 16/9 more MACs but
                 at dense-matmul rates instead of strided-conv rates)
  sub_s2dmm      same relayout, patches materialized + ONE matmul
                 [B*77*19, 16D] @ [16D, D]
  sub_c2patch    no relayout: 9 strided slices of conv1's output
                 concatenated -> [B,77,19,9D] @ [9D, D] (exact MACs,
                 big patch tensor; the variant r4c never tried — r4c's
                 c2shift did 9 separate einsums instead)

Each variant is timed fwd AND value_and_grad (the bucket's ~28 ms is
fwd+bwd; stride-2 conv TRANSPOSES in the backward are the suspected
worst offenders). maxdiff vs sub_lax checked on the fwd value.

CTC tail (#5a): optax.ctc_loss grad time vs padded label width
L in {24, 12, 6} on flagship logits [256, 77, 4233] — if the scan cost
is T-bound (latency), shrinking L does nothing and label-length
bucketing is a recorded rejection.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_probe_r5.py
"""

from __future__ import annotations

import functools
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from benchmarks._honest import time_per_call

B, T, F, D = 256, 312, 80, 256
V = 4233
# tunable honest-window sizes + reps (interference riding: the r5
# first runs under k=3/12, reps=3 were 4-250x off known anchors)
K1 = int(os.environ.get("PROBE_K1", "3"))
K2 = int(os.environ.get("PROBE_K2", "12"))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def anchor_tflops() -> float:
    """4096^3 bf16 matmul chain — the known 125 TF/s tunnel anchor
    (benchmarks/matmul_roofline.py). Rates far below that mean the
    window was interference-polluted; every probe row reports its own
    anchor so a bad session is self-evident in the log."""
    n = 4096
    a = jax.random.normal(jax.random.PRNGKey(2), (n, n), jnp.bfloat16)

    def f(prev):
        x = a if prev is None else prev
        return (x @ a) * jnp.bfloat16(1e-3)

    per, *_ = time_per_call(f, K1, K2, REPS)
    return round(2 * n**3 / per / 1e12, 1)


def conv(h, w, b, stride):
    return jax.lax.conv_general_dilated(
        h, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def s2d(h):
    """[B,Th,Fh,D] -> 2x2 blocks as channels [B,ceil(Th/2),ceil(Fh/2),4D]."""
    b, th, fh, d = h.shape
    tb, fb = -(-th // 2), -(-fh // 2)
    hp = jnp.pad(h, ((0, 0), (0, 2 * tb - th), (0, 2 * fb - fh), (0, 0)))
    s = hp.reshape(b, tb, 2, fb, 2, d).transpose(0, 1, 3, 2, 4, 5)
    return s.reshape(b, tb, fb, 4 * d)


def s2d_kernel(w2):
    """[3,3,D,Do] stride-2 kernel -> [2,2,4D,Do] stride-1 over blocks.

    Output (i,j) of the stride-2 conv reads input rows 2i..2i+2 =
    sub-positions (p in {0,1}) of block rows i..i+1 — a 2x2 window of
    blocks. Entries with tap index 3 (the unused corner of each 2x2
    block pair) are zero.
    """
    d, do = w2.shape[2], w2.shape[3]
    wp = jnp.pad(w2, ((0, 1), (0, 1), (0, 0), (0, 0)))      # [4,4,D,Do]
    wk = wp.reshape(2, 2, 2, 2, d, do)                       # [bi,p,bj,q,..]
    wk = wk.transpose(0, 2, 1, 3, 4, 5)                      # [bi,bj,p,q,..]
    return wk.reshape(2, 2, 4 * d, do)


def main():
    results = {}
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, T, F), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, 1, D), jnp.bfloat16) * 0.1
    b1 = jnp.zeros((D,), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, D, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.bfloat16)
    params = (w1, b1, w2, b2)

    t1 = (T - 3) // 2 + 1                                    # 155
    f1 = (F - 3) // 2 + 1                                    # 39
    t2 = (t1 - 3) // 2 + 1                                   # 77
    f2 = (f1 - 3) // 2 + 1                                   # 19

    def conv2_lax(h, w2, b2):
        return conv(h, w2, b2, 2)

    def conv2_s2d(h, w2, b2):
        return conv(s2d(h), s2d_kernel(w2), b2, 1)

    def conv2_s2dmm(h, w2, b2):
        s = s2d(h)
        patches = jnp.concatenate(
            [s[:, :-1, :-1], s[:, :-1, 1:], s[:, 1:, :-1], s[:, 1:, 1:]],
            axis=-1)                                         # [B,77,19,16D]
        return patches @ s2d_kernel(w2).reshape(16 * D, D) + b2

    def conv2_patch(h, w2, b2):
        cols = [jax.lax.slice(h, (0, di, dj, 0),
                              (B, di + 2 * t2 - 1, dj + 2 * f2 - 1, D),
                              (1, 2, 2, 1))
                for di in range(3) for dj in range(3)]
        patches = jnp.concatenate(cols, axis=-1)             # [B,77,19,9D]
        return patches @ w2.reshape(9 * D, D) + b2

    variants = {"sub_lax": conv2_lax, "sub_s2d": conv2_s2d,
                "sub_s2dmm": conv2_s2dmm, "sub_c2patch": conv2_patch}

    def embed(conv2_fn, params, xin):
        w1, b1, w2, b2 = params
        h = jax.nn.relu(conv(xin[..., None], w1, b1, 2))
        return jax.nn.relu(conv2_fn(h, w2, b2))

    base = None
    for nm, c2 in variants.items():
        fwd = jax.jit(functools.partial(embed, c2))

        def fwd_chain(prev, fwd=fwd):
            eps = (jnp.zeros((), jnp.bfloat16) if prev is None
                   else prev.reshape(-1)[0] * 1e-12)
            return fwd(params, x + eps)

        per, *_ = time_per_call(fwd_chain, K1, K2, REPS)
        results[nm] = round(per * 1e3, 2)

        val = np.asarray(fwd_chain(None), np.float32)
        if base is None:
            base = val
        else:
            results[nm + "_maxdiff"] = float(np.abs(val - base).max())

        def loss(params, xin, c2=c2):
            return jnp.mean(jnp.square(embed(c2, params, xin)
                                       .astype(jnp.float32)))

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

        def g_chain(prev, g=g):
            eps = (jnp.zeros((), jnp.bfloat16) if prev is None
                   else prev[0].astype(jnp.bfloat16) * 1e-12)
            return g(params, x + eps)

        per, *_ = time_per_call(g_chain, K1, K2, REPS)
        results[nm + "_grad"] = round(per * 1e3, 2)
        results[nm + "_anchor_tflops"] = anchor_tflops()
        print(nm, results[nm], "grad", results[nm + "_grad"],
              "maxdiff", results.get(nm + "_maxdiff"),
              "anchor_tflops", results[nm + "_anchor_tflops"], flush=True)

    # ---- CTC label-width sensitivity (#5a) ----
    logits = jax.random.normal(key, (B, t2, V), jnp.float32)
    hlens = jnp.full((B,), t2, jnp.int32)
    for L in (24, 12, 6):
        labels = jax.random.randint(key, (B, L), 1, V - 1)
        llens = jnp.full((B,), L, jnp.int32)
        lpad = jnp.zeros((B, L), jnp.float32)
        tpad = jnp.zeros((B, t2), jnp.float32)

        def ctc_grad(lg):
            return jax.grad(lambda z: jnp.sum(optax.ctc_loss(
                z, tpad, labels, lpad, blank_id=0)))(lg)

        cg = jax.jit(ctc_grad)

        def c_chain(prev, cg=cg):
            eps = (jnp.zeros(()) if prev is None
                   else prev.reshape(-1)[0] * 1e-12)
            return cg(logits + eps)

        per, *_ = time_per_call(c_chain, K1, K2, REPS)
        results[f"ctc_grad_L{L}"] = round(per * 1e3, 2)
        print(f"ctc_grad_L{L}", results[f"ctc_grad_L{L}"], flush=True)

    # parallel-in-time CTC (ops/ctc_parallel.py) vs optax, L=24
    from openeat_tpu.ops.ctc_parallel import ctc_loss_parallel
    labels = jax.random.randint(key, (B, 24), 1, V - 1)
    lpad = jnp.zeros((B, 24), jnp.float32)
    tpad = jnp.zeros((B, t2), jnp.float32)
    for nm, fn in (("ctcpar", ctc_loss_parallel), ("ctcopt",
                                                   optax.ctc_loss)):
        pg = jax.jit(jax.grad(lambda z, fn=fn: jnp.sum(
            fn(z, tpad, labels, lpad, blank_id=0))))

        def p_chain(prev, pg=pg):
            eps = (jnp.zeros(()) if prev is None
                   else prev.reshape(-1)[0] * 1e-12)
            return pg(logits + eps)

        per, *_ = time_per_call(p_chain, K1, K2, REPS)
        results[f"{nm}_grad"] = round(per * 1e3, 2)
        results[f"{nm}_anchor_tflops"] = anchor_tflops()
        print(f"{nm}_grad", results[f"{nm}_grad"],
              "anchor", results[f"{nm}_anchor_tflops"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
