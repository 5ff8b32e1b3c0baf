"""Locate the attention-beam decode cost (r4: RTF 0.051 > 0.05 target).

The cached beam loop's per-iteration compute is tiny on paper (one
single-position decoder eval for M=B*beam rows + two top_k calls), yet
the honest r4 measurement implies ~64 ms per while_loop iteration at
B=8, T=1000, beam 10. This probe:

1. times the cached search at max_steps in {8, 16, 32, 64} — linear
   scaling pins the cost inside the loop body; flat scaling pins it in
   setup (cross-cache projection, memory repeat, select);
2. times the raw components outside the loop (init_cache, one
   decoder_step call chain) for comparison;
3. optionally dumps a perfetto trace (--trace DIR) for op-level
   attribution.

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

from _honest import time_per_call
from __graft_entry__ import _example_batch, _flagship_model
from openeat_tpu.decode.attention_beam import attention_beam_search_cached
from openeat_tpu.models.asr_model import ASRModel


def main():
    b, t = 8, 1000
    model = _flagship_model()
    batch = _example_batch(b=b, t=t, f=80, l=24)
    batch["features_length"] = jnp.full((b,), t, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch["features"],
                        batch["features_length"], batch["targets"],
                        batch["targets_length"])
    params = jax.device_put(params)
    encode = jax.jit(lambda p, f, l: model.apply(
        p, f, l, method=ASRModel.encode))
    enc, lens = encode(params, batch["features"], batch["features_length"])
    enc = jax.block_until_ready(enc)

    out = {}

    def eps_of(prev):
        if prev is None:
            return jnp.float32(0)
        leaf = jax.tree.leaves(prev)[0]
        return leaf.reshape(-1)[0].astype(jnp.float32) * 0

    for steps in (8, 16, 32, 64):
        fn = jax.jit(lambda e, s=steps: attention_beam_search_cached(
            model, params, e, lens, beam_size=10, max_steps=s))
        _ = jax.tree.map(np.asarray, fn(enc))  # compile + settle

        def run(prev, fn=fn):
            return fn(enc + eps_of(prev))

        per, _, _, _, fb = time_per_call(run, k1=2, k2=6, reps=3)
        out[f"steps{steps}_ms"] = round(per * 1e3, 1)
        out[f"steps{steps}_fb"] = fb
        print(f"max_steps={steps}: {per*1e3:.1f} ms (fb={fb})",
              flush=True)

    # setup-only: cross-cache projection + memory repeat
    def setup_only(prev):
        memory = jnp.repeat(enc + eps_of(prev), 10, axis=0)
        return model.apply(params, memory, memory.shape[0], 65,
                           method=ASRModel.decoder_init_cache)

    setup_jit = jax.jit(setup_only)
    _ = jax.tree.map(np.asarray, jax.tree.leaves(setup_jit(None))[0])
    per, _, _, _, fb = time_per_call(setup_jit, k1=4, k2=16, reps=3)
    out["setup_only_ms"] = round(per * 1e3, 1)
    out["setup_fb"] = fb

    if "--trace" in sys.argv:
        d = sys.argv[sys.argv.index("--trace") + 1]
        fn = jax.jit(lambda e: attention_beam_search_cached(
            model, params, e, lens, beam_size=10, max_steps=64))
        jax.tree.map(np.asarray, fn(enc))
        with jax.profiler.trace(d):
            for _ in range(2):
                r = fn(enc)
            jax.tree.map(np.asarray, r)
        out["trace_dir"] = d

    print(json.dumps(out))


if __name__ == "__main__":
    main()
