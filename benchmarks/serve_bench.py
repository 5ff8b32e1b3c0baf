"""Serving-runtime benchmark: concurrent sessions against AsrServer.

Measures the production-serving path end-to-end on one chip — framed
TCP in, continuous batching over StreamingBatch, greedy partials,
prefix-beam + rescoring finals — with N concurrent clients each
offering a 10 s utterance as fast as the server admits it. Prints one
JSON line per client count:

    {"metric": "serve_throughput_C16", "value": ..., "unit":
     "audio-sec/sec", "vs_baseline": ..., "final_p50_ms": ...,
     "final_p99_ms": ...}

vs_baseline is against 20 audio-sec/sec per concurrent stream (the
0.05-RTF budget from BASELINE.md applied per session).

Run on the real chip (single TPU client rule — never concurrently with
another TPU process):  python benchmarks/serve_bench.py [--quantize int8]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.models.asr_model import ASRModel


def flagship_streaming_model():
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
    return model, params


def drive(host, port, wav, piece, lat_out, idx):
    from openeat_tpu.runtime.client import AsrClient

    c = AsrClient(host, port)
    try:
        for i in range(0, len(wav), piece):
            c.send_audio(wav[i: i + piece])
            c.poll()
        t0 = time.perf_counter()
        c.finish()
        lat_out[idx] = time.perf_counter() - t0
    finally:
        c.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default="none", choices=["none", "int8"])
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--dur_s", type=float, default=10.0)
    ap.add_argument("--clients", type=int, nargs="+", default=[4, 16, 32])
    opts = ap.parse_args()
    suffix = "_int8" if opts.quantize == "int8" else ""

    from openeat_tpu.runtime.server import AsrServer

    model, params = flagship_streaming_model()
    if suffix:
        from openeat_tpu.utils.quantize import quantize_params
        params = quantize_params(params)
    char_dict = {f"t{i}": i for i in range(4233)}
    rng = np.random.default_rng(1)
    wav = np.round(rng.standard_normal(int(opts.dur_s * 16000)) * 3000
                   ).astype(np.float32)
    piece = 16000  # clients offer audio in 1 s pieces, faster than RT

    server = AsrServer(model, params, char_dict, port=0,
                       slots=opts.slots, chunk_size=16, num_left_chunks=4,
                       enc_capacity=256, ctc_weight=0.5,
                       reverse_weight=0.3,
                       final_mode="attention_rescoring")
    host, port = server.start()
    try:
        # warmup: compile the chunk step + rescoring programs once
        lat = {}
        drive(host, port, wav[: 4 * 16000], piece, lat, 0)

        for n in opts.clients:
            lat = {}
            threads = [threading.Thread(target=drive,
                                        args=(host, port, wav, piece,
                                              lat, i))
                       for i in range(n)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            total_audio = n * opts.dur_s
            finals = sorted(lat.values())
            rate = total_audio / dt
            print(json.dumps({
                "metric": f"serve_throughput_C{n}{suffix}",
                "value": round(rate, 1), "unit": "audio-sec/sec",
                "vs_baseline": round(rate / (20.0 * min(n, opts.slots)),
                                     2),
                "final_p50_ms": round(
                    1000 * finals[len(finals) // 2], 1),
                "final_p99_ms": round(
                    1000 * finals[int(len(finals) * 0.99)
                                  if len(finals) > 1 else -1], 1)}))
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
