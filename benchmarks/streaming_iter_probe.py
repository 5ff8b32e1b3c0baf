"""Honest per-iteration breakdown of the batched streaming lockstep.

The r4 sweep (decode_rtf.py) measured S=16 -> 92 audio-sec/sec, i.e.
~110 ms per lockstep iteration (each iteration advances S streams by
one 0.64 s chunk). This probe splits that cost with readback-anchored
paired windows (benchmarks/_honest.py):

  step_only   the jitted chunk step alone, device-resident inputs,
              state chained through donation -> pure device time
  full_iter   the run_ready inner-loop body: numpy window assembly +
              3 jnp.asarray h2d transfers + step dispatch + host offset
              mirror (token readback pipelining excluded, as in the
              real loop) -> what the sweep actually pays per iteration

full_iter - step_only ~= host assembly + h2d + dispatch overhead. If
that difference dominates, the runtime is transfer/RTT-bound (pack or
pipeline the uploads); if step_only dominates, the chunk program itself
(encoder chunk + CTC prefix-beam scan) needs kernel work.

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
from openeat_tpu.decode.streaming_batch import StreamingBatch
from openeat_tpu.models.asr_model import ASRModel


def build(slots):
    model = ASRModel(
        input_size=80, vocab_size=4233, encoder_num_blocks=12,
        decoder_num_blocks=3, r_decoder_num_blocks=3, reverse_weight=0.3,
        d_model=256, attention_heads=4, linear_units=2048,
        input_layer="conv2d", cnn_module_kernel=15, causal=True,
        static_chunk_size=16, num_left_chunks=4, ctc_weight=0.3,
        dropout_rate=0.1, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 64, 80)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 4000, (1, 8)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, jnp.array([64]),
                        tgt, jnp.array([8]))
    return StreamingBatch(model, params, slots=slots, chunk_size=16,
                          num_left_chunks=4, beam_size=10,
                          max_hyp_len=64, enc_capacity=256,
                          transfer_dtype="float16")


def main():
    out = {}
    rng = np.random.default_rng(1)
    for s in (16, 64):
        batch = build(s)
        wnp = (rng.standard_normal(
            (s, batch.win_frames, batch.mel)) * 2).astype(np.float32)
        valid = np.full((s,), batch.chunk, np.int32)
        active = np.ones((s,), bool)
        pk = np.zeros((s, batch.win_frames + 1, batch.mel), np.float16)
        pk[:, :-1] = wnp
        pk[:, -1, 0] = valid
        pk[:, -1, 1] = active
        dpk = jnp.asarray(pk)

        # warm compile
        batch.state, toks = batch._step(batch.params, batch.state, dpk)
        _ = float(np.asarray(toks).ravel()[0])

        def step_only(_prev):
            batch.state, toks = batch._step(batch.params, batch.state,
                                            dpk)
            return toks

        per, _, _, _, fb = time_per_call(step_only, k1=4, k2=16, reps=3)
        out[f"S{s}_step_only_ms"] = round(per * 1e3, 1)
        out[f"S{s}_step_fb"] = fb

        def full_iter(_prev):
            w = np.zeros((s, batch.win_frames + 1, batch.mel),
                         np.float16)
            w[:, : wnp.shape[1]] = wnp  # host window assembly
            w[:, -1, 0] = valid
            w[:, -1, 1] = active
            batch.state, toks = batch._step(batch.params, batch.state,
                                            jnp.asarray(w))
            batch._offset_host[active] += 0  # scheduling mirror
            return toks

        per, _, _, _, fb = time_per_call(full_iter, k1=4, k2=16, reps=3)
        out[f"S{s}_full_iter_ms"] = round(per * 1e3, 1)
        out[f"S{s}_full_fb"] = fb
        print(json.dumps({k: v for k, v in out.items()
                          if k.startswith(f"S{s}")}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
