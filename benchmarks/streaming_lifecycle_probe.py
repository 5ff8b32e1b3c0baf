"""Phase-decomposed streaming lifecycle probe (VERDICT r4 next #3).

The r4 sweep saturates at ~340 audio-sec/sec past S=16 while the chunk
step itself costs 17.7 ms at S=64 (naive step-bound capacity ~1.8k):
~80% of wall time is NOT the device step. This probe times every phase
of the decode_rtf drive lifecycle separately, per S:

  open       S x open() (reset marking, no device work for fresh slots)
  accept     feeding the full 10 s utterance into every slot — host
             fbank extraction (HostFrontend groups)
  run_ready  the lockstep backlog catch-up (device chunk steps +
             packed-buffer assembly + token drains)
  finish     finish_many(rescore=False): tail flush + final short chunk
  finish_rs  a separate drive with rescore=True to isolate the batched
             finalize (prefix-beam sort + fwd/rev decoder rescoring)

Each phase is wall-clock over the whole drive; run_ready is also split
into window-assembly (fe.window + packing) vs dispatch+drain via a
counter monkey-patch-free second pass that pre-builds windows.

PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/streaming_lifecycle_probe.py [S ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.decode.streaming_batch import StreamingBatch

DUR_S = 10.0


def build():
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
    wav = (rng.standard_normal(int(DUR_S * 16000)) * 3000
           ).astype(np.float32)
    return model, params, wav


def drive_phases(batch: StreamingBatch, wav, s_count: int,
                 rescore: bool) -> dict:
    ph = {}
    t0 = time.perf_counter()
    handles = [batch.open() for _ in range(s_count)]
    ph["open"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    for h in handles:
        batch.accept(h, wav)
    ph["accept"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch.run_ready()
    ph["run_ready"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch.finish_many(handles, rescore=rescore, ctc_weight=0.5,
                      reverse_weight=0.3)
    ph["finish"] = time.perf_counter() - t0

    decoded = sum(4 * int(batch._offset_host[h.slot]) * 0.01
                  for h in handles)
    for h in handles:
        batch.close(h)
    ph["audio_s"] = decoded
    return ph


def main():
    s_list = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    model, params, wav = build()
    out = {}
    for s_count in s_list:
        batch = StreamingBatch(model, params, slots=s_count,
                               chunk_size=16, num_left_chunks=4,
                               beam_size=10, max_hyp_len=64,
                               enc_capacity=256,
                               transfer_dtype="float16")
        for tag, rescore in (("", False), ("_rs", True)):
            drive_phases(batch, wav, s_count, rescore)  # warmup/compile
            best = None
            for _ in range(2):
                ph = drive_phases(batch, wav, s_count, rescore)
                tot = sum(v for k, v in ph.items() if k != "audio_s")
                if best is None or tot < best[0]:
                    best = (tot, ph)
            tot, ph = best
            rec = {k: round(v * 1e3, 1) for k, v in ph.items()
                   if k != "audio_s"}
            rec["total_ms"] = round(tot * 1e3, 1)
            rec["audio_per_s"] = round(ph["audio_s"] / tot, 1)
            rec["per_stream_budget"] = round(
                ph["audio_s"] / tot / (20.0 * s_count), 2)
            out[f"S{s_count}{tag}"] = rec
            print(f"S{s_count}{tag}", json.dumps(rec), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
