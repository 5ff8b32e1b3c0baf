"""One-off breakdown probe for StreamingBatch chunk-loop latency.

Times each phase of a single-stream 10 s decode (host frontend, window
assembly, h2d, chunk-step dispatch, d2h token sync, finalize) to find
where the streaming_throughput wall time goes. (Phase timings here use
per-phase block_until_ready, which the axon proxy acks early — treat
them as lower bounds and ratios, not absolutes; the honest end-to-end
number is decode_rtf.py's streaming_throughput series.)
Run on the real chip, nothing else on the TPU.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.decode.streaming_batch import StreamingBatch


def main():
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
    wav = (rng.standard_normal(160000) * 3000).astype(np.float32)

    batch = StreamingBatch(model, params, slots=1, chunk_size=16,
                           num_left_chunks=4, beam_size=10,
                           max_hyp_len=64, enc_capacity=256)

    # warmup full lifecycle
    h = batch.open()
    batch.accept(h, wav)
    batch.run_ready()
    batch.finish(h, rescore=False)
    batch.close(h)

    # instrumented second pass
    h = batch.open()
    t0 = time.perf_counter()
    batch.accept(h, wav)
    t_fe = time.perf_counter() - t0

    i = h.slot
    n_steps = 0
    t_win = t_h2d = t_step = t_d2h = 0.0
    while batch._ready(i):
        sl = batch._slots[i]
        f0 = batch._consumed(i)
        t0 = time.perf_counter()
        w = sl.fe.window(f0, batch.win_frames)
        packed = np.zeros((1, batch.win_frames + 1, batch.mel),
                          np.float16)
        packed[0, : w.shape[0]] = w
        packed[0, -1, 0] = batch.chunk
        packed[0, -1, 1] = 1.0
        t1 = time.perf_counter()
        dw = jnp.asarray(packed)
        jax.block_until_ready(dw)
        t2 = time.perf_counter()
        batch.state, toks = batch._step(batch.params, batch.state, dw)
        jax.block_until_ready(toks)
        t3 = time.perf_counter()
        np.asarray(toks)
        t4 = time.perf_counter()
        batch._offset_host[i] += batch.chunk
        t_win += t1 - t0
        t_h2d += t2 - t1
        t_step += t3 - t2
        t_d2h += t4 - t3
        n_steps += 1

    t0 = time.perf_counter()
    batch.finish(h, rescore=False)
    t_fin = time.perf_counter() - t0

    print(f"steps={n_steps}")
    print(f"fe.accept (host fbank 10s): {t_fe*1000:8.1f} ms")
    print(f"window+assemble  total: {t_win*1000:8.1f} ms "
          f"({t_win/n_steps*1000:6.2f} ms/step)")
    print(f"h2d              total: {t_h2d*1000:8.1f} ms "
          f"({t_h2d/n_steps*1000:6.2f} ms/step)")
    print(f"chunk step       total: {t_step*1000:8.1f} ms "
          f"({t_step/n_steps*1000:6.2f} ms/step)")
    print(f"d2h toks         total: {t_d2h*1000:8.1f} ms "
          f"({t_d2h/n_steps*1000:6.2f} ms/step)")
    print(f"finish/finalize:        {t_fin*1000:8.1f} ms")


if __name__ == "__main__":
    main()
