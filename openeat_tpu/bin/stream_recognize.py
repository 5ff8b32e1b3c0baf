"""Simulated-streaming decode CLI.

Feeds each test utterance to the online recognizer
(openeat_tpu.decode.streaming) in real-time-sized audio pieces and
writes `<utt> <text>` results plus per-utterance latency stats — the
online counterpart of bin/recognize for models trained with
`static_chunk_size`/`causal` (no offline reference equivalent exists;
the reference only ships streaming hooks).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from openeat_tpu.bin.recognize import load_model
from openeat_tpu.dataset.audio import read_audio, resample
from openeat_tpu.dataset.manifest import parse_manifest, parse_wav_entry
from openeat_tpu.dataset.text import load_dict, token_ids_to_text
from openeat_tpu.decode.streaming import StreamingRecognizer
from openeat_tpu.utils.common import init_logger


def get_parser():
    p = argparse.ArgumentParser(description="streaming decode (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--test_data", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--result_file", required=True)
    p.add_argument("--chunk_size", type=int, default=16,
                   help="encoder chunk in subsampled frames (16 = 640 ms)")
    p.add_argument("--num_left_chunks", type=int, default=4)
    p.add_argument("--piece_ms", type=int, default=200,
                   help="audio arrives in pieces of this duration")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--slots", type=int, default=1,
                   help=">1: decode the manifest as this many CONCURRENT "
                        "streams advanced in lockstep by the batched "
                        "runtime (decode/streaming_batch.py)")
    p.add_argument("--final_mode", default="attention_rescoring",
                   choices=["ctc_greedy_search", "attention_rescoring"],
                   help="end-of-stream finalization — live partials are "
                        "always CTC greedy; rescoring runs prefix-beam + "
                        "forward/reverse decoder over the accumulated "
                        "encoder output (any slot count; greedy at "
                        "slots=1 additionally reports per-piece latency)")
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.5)
    p.add_argument("--reverse_weight", type=float, default=0.0)
    p.add_argument("--max_hyp_len", type=int, default=64)
    p.add_argument("--enc_capacity", type=int, default=512,
                   help="slots>1: encoder-output rows kept per stream "
                        "for final rescoring (subsampled frames)")
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8 weight-only quantization (utils/quantize.py)")
    p.add_argument("--timestamp_file", default=None,
                   help="also write per-token CTC emission timestamps "
                        "as JSONL ({key, tokens, times_ms}; onset "
                        "convention, 40 ms granularity; rescoring "
                        "finals carry the winning prefix-beam "
                        "hypothesis' times)")
    return p


def _write_times(ts_out, key, tok_ids, times_ms, id2tok):
    ts_out.write(json.dumps(
        {"key": key,
         "tokens": [id2tok.get(int(t), "<unk>") for t in tok_ids],
         "times_ms": [float(t) for t in times_ms]},
        ensure_ascii=False) + "\n")


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = init_logger()
    char_dict = load_dict(args.dict_path)
    model, params, cfg = load_model(args.config, args.checkpoint,
                                    fallback_vocab=len(char_dict))
    if args.quantize == "int8":
        from openeat_tpu.utils.quantize import quantize_params
        params = quantize_params(params)
    id2tok = {v: k for k, v in char_dict.items()}
    utts = parse_manifest(args.test_data, char_dict,
                          max_length=10 ** 9, sort=False)
    piece = int(args.sample_rate * args.piece_ms / 1000)
    # feature-normalization mode must match the training frontend:
    # per-utt-normalized models get the causal running approximation
    # (exact per-utt stats need the whole utterance — not streamable);
    # global-CMVN models feed raw frames (the CMVN layer is inside the
    # encoder). See StreamingRecognizer.__init__.
    per_utt = cfg.get("collate_conf", {}).get("normalization", True)
    norm = "running" if per_utt else "none"
    if per_utt:
        logger.warning(
            "model was trained with per-utterance feature "
            "normalization; streaming uses causal running "
            "normalization (approximate). For production streaming "
            "train with --cmvn_file (global CMVN) instead.")
    # rescoring finalization lives in the batched runtime; honor it at
    # any slot count (S=1 is one lockstep stream) rather than silently
    # downgrading a slots=1 run to greedy output
    if args.slots > 1 or args.final_mode == "attention_rescoring":
        return _run_batched(args, logger, model, params, utts, id2tok,
                            norm)
    lat = []
    ts_out = (open(args.timestamp_file, "w", encoding="utf-8")
              if args.timestamp_file else None)
    with open(args.result_file, "w", encoding="utf-8") as fout:
        for u in utts:
            path, start, end = parse_wav_entry(u.path)
            wav, rate = read_audio(path, start, end)
            if rate != args.sample_rate:
                wav = resample(wav, rate, args.sample_rate)
            wav = wav * 32768.0
            sr = StreamingRecognizer(
                model, params, chunk_size=args.chunk_size,
                num_left_chunks=args.num_left_chunks,
                sample_rate=args.sample_rate, normalization=norm)
            t_max = 0.0
            for i in range(0, len(wav), piece):
                t0 = time.perf_counter()
                sr.accept_waveform(wav[i: i + piece])
                t_max = max(t_max, time.perf_counter() - t0)
            sr.finish()  # flush the final partial group + chunk
            text = token_ids_to_text(sr.result(), id2tok)
            fout.write(f"{u.key} {text}\n")
            if ts_out is not None:
                _write_times(ts_out, u.key, sr.result(),
                             sr.result_times_ms(), id2tok)
            lat.append(t_max)
            logger.info("%s: '%s' (max piece latency %.1f ms)", u.key,
                        text, t_max * 1000)
    if ts_out is not None:
        ts_out.close()
    logger.info("done: %d utts, p50 piece latency %.1f ms, p99 %.1f ms",
                len(lat), np.percentile(lat, 50) * 1000,
                np.percentile(lat, 99) * 1000)


def _run_batched(args, logger, model, params, utts, id2tok, norm):
    """S concurrent lockstep streams over the manifest: utterances are
    assigned to free slots as they open up, audio arrives round-robin in
    `piece_ms` pieces (interleaved, like independent live sessions), and
    each stream is finalized the moment its audio is exhausted while the
    others ride along."""
    from openeat_tpu.decode.streaming_batch import StreamingBatch

    batch = StreamingBatch(
        model, params, slots=args.slots, chunk_size=args.chunk_size,
        num_left_chunks=args.num_left_chunks,
        sample_rate=args.sample_rate, normalization=norm,
        beam_size=args.beam_size, max_hyp_len=args.max_hyp_len,
        enc_capacity=args.enc_capacity)
    piece = int(args.sample_rate * args.piece_ms / 1000)
    rescore = args.final_mode == "attention_rescoring"
    pending = list(utts)
    live = []  # (handle, utt, wav, sample_pos)
    t0 = time.time()
    total_audio = 0.0
    results = {}
    times = {}  # key -> (tokens, times_ms)
    while pending or live:
        while pending and len(live) < args.slots:
            u = pending.pop(0)
            path, start, end = parse_wav_entry(u.path)
            wav, rate = read_audio(path, start, end)
            if rate != args.sample_rate:
                wav = resample(wav, rate, args.sample_rate)
            wav = wav * 32768.0
            total_audio += len(wav) / args.sample_rate
            live.append([batch.open(), u, wav, 0])
        for ent in live:
            h, _, wav, pos = ent
            batch.accept(h, wav[pos: pos + piece])
            ent[3] = pos + piece
        batch.run_ready()
        still = []
        for ent in live:
            h, u, wav, pos = ent
            if pos < len(wav):
                still.append(ent)
                continue
            toks = batch.finish(h, rescore=rescore,
                                ctc_weight=args.ctc_weight,
                                reverse_weight=args.reverse_weight)
            times[u.key] = (list(toks), h.result_times_ms())
            batch.close(h)
            results[u.key] = token_ids_to_text(toks, id2tok)
            logger.info("%s: '%s'", u.key, results[u.key])
        live = still
    dt = time.time() - t0
    with open(args.result_file, "w", encoding="utf-8") as fout:
        for u in utts:
            fout.write(f"{u.key} {results[u.key]}\n")
    if args.timestamp_file:
        with open(args.timestamp_file, "w", encoding="utf-8") as ts_out:
            for u in utts:
                toks, tms = times[u.key]
                _write_times(ts_out, u.key, toks, tms, id2tok)
    logger.info("done: %d utts over %d slots, %.1f audio-sec in %.1fs "
                "wall (%.1fx realtime aggregate)", len(utts), args.slots,
                total_audio, dt, total_audio / max(dt, 1e-9))


if __name__ == "__main__":
    main()
