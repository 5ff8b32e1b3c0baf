"""Round-5 probe (VERDICT r4 next #5b): fused fwd+reverse decoder.

The train step's decoder tail runs the left (3-block) and right
(3-block reverse) decoders as two sequential applies over the same
memory (models/asr_model.py _calc_att_loss; reference
openeat/modules/decoder.py:234-309). Both stacks have IDENTICAL shapes,
so they can run as ONE vmapped apply over params stacked on a leading
[2] axis — every matmul becomes a single batched matmul (half the
dispatches; same FLOPs). If the tail bucket is launch/latency-bound
(ROOFLINE.md: small-M matmuls at 20-50 TF/s), this wins; if it's
HBM/flop-bound it won't.

Times fwd and value_and_grad of both forms on flagship train shapes
(B=256, T'=77, L=25, d=256, 3+3 blocks, V=4233), plus max|diff|.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_probe_r5b.py
"""

from __future__ import annotations

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from benchmarks._honest import time_per_call
from openeat_tpu.modules.decoder import TransformerDecoder
from openeat_tpu.utils.mask import make_attn_mask, make_non_pad_mask

B, T, L, D, V = 256, 77, 25, 256, 4233


def main():
    results = {}
    dec = TransformerDecoder(vocab_size=V, d_model=D, attention_heads=4,
                             linear_units=1024, num_blocks=3,
                             dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    memory = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    memory_mask = make_non_pad_mask(jnp.full((B,), T, jnp.int32),
                                    T)[:, None, :]
    ys = jax.random.randint(key, (B, L), 1, V - 1)
    r_ys = ys[:, ::-1]
    tgt_mask = make_attn_mask(jnp.full((B,), L, jnp.int32), L, causal=True)

    p_left = dec.init(key, ys, tgt_mask, memory, memory_mask)["params"]
    p_right = dec.init(jax.random.PRNGKey(1), r_ys, tgt_mask, memory,
                       memory_mask)["params"]
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p_left, p_right)
    ys2 = jnp.stack([ys, r_ys])  # [2, B, L]

    def seq(p_l, p_r, mem):
        l, _ = dec.apply({"params": p_l}, ys, tgt_mask, mem, memory_mask)
        r, _ = dec.apply({"params": p_r}, r_ys, tgt_mask, mem, memory_mask)
        return l, r

    def fused(ps, mem):
        def one(p, t):
            out, _ = dec.apply({"params": p}, t, tgt_mask, mem,
                               memory_mask)
            return out
        lr = jax.vmap(one, in_axes=(0, 0))(ps, ys2)  # [2, B, L, V]
        return lr[0], lr[1]

    f_seq = jax.jit(lambda eps: seq(p_left, p_right, memory + eps))
    f_fused = jax.jit(lambda eps: fused(stacked, memory + eps))

    def chain(f):
        def g(prev):
            eps = (jnp.zeros((), jnp.bfloat16) if prev is None
                   else prev[0].reshape(-1)[0].astype(jnp.bfloat16) * 1e-12)
            return f(eps)
        return g

    for nm, f in (("dec_seq", f_seq), ("dec_fused", f_fused)):
        per, *_ = time_per_call(chain(f), 3, 12)
        results[nm] = round(per * 1e3, 2)
        print(nm, results[nm], flush=True)

    a = f_seq(jnp.zeros((), jnp.bfloat16))
    b = f_fused(jnp.zeros((), jnp.bfloat16))
    results["maxdiff"] = float(max(
        np.abs(np.asarray(a[0], np.float32) - np.asarray(b[0], np.float32)).max(),
        np.abs(np.asarray(a[1], np.float32) - np.asarray(b[1], np.float32)).max()))
    print("maxdiff", results["maxdiff"], flush=True)

    # grads (the tail bucket is fwd+bwd)
    def loss_seq(p_l, p_r, mem):
        l, r = seq(p_l, p_r, mem)
        return (jnp.mean(jnp.square(l.astype(jnp.float32)))
                + jnp.mean(jnp.square(r.astype(jnp.float32))))

    def loss_fused(ps, mem):
        l, r = fused(ps, mem)
        return (jnp.mean(jnp.square(l.astype(jnp.float32)))
                + jnp.mean(jnp.square(r.astype(jnp.float32))))

    g_seq = jax.jit(jax.value_and_grad(loss_seq, argnums=2))
    g_fused = jax.jit(jax.value_and_grad(loss_fused, argnums=1))

    def chain_g(g, *args):
        def h(prev):
            eps = (jnp.zeros((), jnp.bfloat16) if prev is None
                   else prev[0].astype(jnp.bfloat16) * 1e-12)
            return g(*args, memory + eps)
        return h

    per, *_ = time_per_call(chain_g(g_seq, p_left, p_right), 3, 12)
    results["dec_seq_grad"] = round(per * 1e3, 2)
    print("dec_seq_grad", results["dec_seq_grad"], flush=True)
    per, *_ = time_per_call(chain_g(g_fused, stacked), 3, 12)
    results["dec_fused_grad"] = round(per * 1e3, 2)
    print("dec_fused_grad", results["dec_fused_grad"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
