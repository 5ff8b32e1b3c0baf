"""Streaming ASR server CLI.

Serves a trained (causal, static-chunk) model over the framed TCP
protocol in openeat_tpu/runtime/server.py with continuous batching over
`--slots` concurrent sessions. The production-serving counterpart of
bin/stream_recognize's simulated streaming; no reference equivalent
exists (the reference's only "serving" is offline shell fan-out,
reference examples/aishell/run.sh:186-219).

    python -m openeat_tpu.bin.serve \
        --config exp/train.yaml --checkpoint exp/avg_best3 \
        --dict data/dict.txt --port 8990 --slots 16
"""

from __future__ import annotations

import argparse

from openeat_tpu.bin.recognize import load_model
from openeat_tpu.dataset.text import load_dict
from openeat_tpu.runtime.server import AsrServer
from openeat_tpu.utils.common import init_logger


def get_parser():
    p = argparse.ArgumentParser(description="streaming ASR server (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8990)
    p.add_argument("--slots", type=int, default=8,
                   help="concurrent sessions per chunk step; further "
                        "connections queue for admission")
    p.add_argument("--chunk_size", type=int, default=16)
    p.add_argument("--num_left_chunks", type=int, default=4)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--final_mode", default="attention_rescoring",
                   choices=["ctc_greedy_search", "attention_rescoring"])
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.5)
    p.add_argument("--reverse_weight", type=float, default=0.0)
    p.add_argument("--max_hyp_len", type=int, default=64)
    p.add_argument("--enc_capacity", type=int, default=512)
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8: per-channel weight-only quantization of "
                        "the matmul weights (utils/quantize.py) — halves "
                        "weight HBM traffic on the bandwidth-bound "
                        "decode path")
    p.add_argument("--endpoint", action="store_true",
                   help="finalize a stream server-side when the greedy "
                        "CTC path hits the trailing-silence rules "
                        "(decode/endpoint.py); the final event carries "
                        "endpoint: true")
    p.add_argument("--endpoint_rule1_ms", type=float, default=5000.0,
                   help="trailing silence (ms) ending a stream that "
                        "never produced a token")
    p.add_argument("--endpoint_rule2_ms", type=float, default=1000.0,
                   help="trailing silence (ms) ending a stream after "
                        "speech")
    p.add_argument("--endpoint_rule3_ms", type=float, default=20000.0,
                   help="maximum utterance length (ms) before a forced "
                        "endpoint")
    return p


def build_server(args) -> AsrServer:
    char_dict = load_dict(args.dict_path)
    model, params, cfg = load_model(args.config, args.checkpoint,
                                    fallback_vocab=len(char_dict))
    if args.quantize == "int8":
        from openeat_tpu.utils.quantize import quantize_params
        params = quantize_params(params)
    # normalization parity with the training frontend — same rule as
    # bin/stream_recognize.
    per_utt = cfg.get("collate_conf", {}).get("normalization", True)
    norm = "running" if per_utt else "none"
    ep_conf = None
    if args.endpoint:
        from openeat_tpu.decode.endpoint import EndpointConfig
        ep_conf = EndpointConfig(
            rule1_min_trailing_silence=args.endpoint_rule1_ms,
            rule2_min_trailing_silence=args.endpoint_rule2_ms,
            rule3_min_utterance_length=args.endpoint_rule3_ms)
    return AsrServer(
        model, params, char_dict, host=args.host, port=args.port,
        slots=args.slots, chunk_size=args.chunk_size,
        num_left_chunks=args.num_left_chunks,
        sample_rate=args.sample_rate, normalization=norm,
        beam_size=args.beam_size, max_hyp_len=args.max_hyp_len,
        enc_capacity=args.enc_capacity, ctc_weight=args.ctc_weight,
        reverse_weight=args.reverse_weight, final_mode=args.final_mode,
        endpoint=args.endpoint, endpoint_config=ep_conf)


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = init_logger()
    server = build_server(args)
    logger.info("serving on %s:%d (%d slots, final=%s)",
                server.addr[0], server.addr[1], args.slots,
                args.final_mode)
    server.serve_forever()


if __name__ == "__main__":
    main()
