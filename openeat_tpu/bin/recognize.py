"""Decoding entry point.

Parity: reference openeat/bin/recognize.py:42-231 — modes ctc_greedy_search
/ ctc_prefix_beam_search / attention / attention_rescoring, optional
Transformer-LM or n-gram shallow fusion, writes `<utt> <text>` results.

Unlike the reference (rescoring/prefix-beam forced to batch=1 on CPU +
shell-level process spraying, examples/aishell/run.sh:186-219), every
mode here decodes WHOLE BATCHES on device in one jitted program, so a
single process saturates the chip.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from openeat_tpu.config import load_config
from openeat_tpu.dataset.bpe import load_bpe
from openeat_tpu.dataset.dataset import AudioCollate, AudioDataset, \
    PrefetchLoader
from openeat_tpu.dataset.text import load_dict, token_ids_to_text
from openeat_tpu.decode.attention_beam import recognize as attention_decode
from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
from openeat_tpu.decode.rescoring import (attention_rescoring,
                                          rescoring_scores)
from openeat_tpu.models.asr_model import ASRModel, build_asr_model
from openeat_tpu.models.language_model import (LanguageModel,
                                               build_language_model)
from openeat_tpu.ops.frontend import FrontendConfig
from openeat_tpu.pipeline import DeviceFeeder
from openeat_tpu.utils import checkpoint as ckpt_lib
from openeat_tpu.utils.common import init_logger

MODES = ["ctc_greedy_search", "ctc_prefix_beam_search", "attention",
         "attention_rescoring"]


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="decode with an ASR model (TPU)")
    p.add_argument("--config", required=True, help="exp_dir/train.yaml")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--test_data", required=True)
    p.add_argument("--result_file", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--bpe_model", default=None)
    p.add_argument("--mode", default="attention_rescoring", choices=MODES)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.5)
    p.add_argument("--reverse_weight", type=float, default=0.0)
    p.add_argument("--max_hyp_len", type=int, default=64)
    p.add_argument("--adaptive_steps", type=int, default=0,
                   help="attention mode: bound the beam's step count by "
                        "CTC-greedy hypothesis lengths (bucketed) "
                        "instead of max_hyp_len — a large RTF win when "
                        "the CTC head is trustworthy, but it TRUNCATES "
                        "hypotheses if greedy badly underestimates "
                        "length (weak/low-weight CTC heads), so it is "
                        "opt-in; the reference always runs the full "
                        "encoder length (asr_model.py:246)")
    p.add_argument("--length_penalty", type=float, default=0.0,
                   help="additive per-token bonus at beam selection "
                        "(attention mode); counters early-eos bias")
    p.add_argument("--lm_config", default=None)
    p.add_argument("--lm_checkpoint", default=None)
    p.add_argument("--lm_weight", type=float, default=0.0)
    p.add_argument("--ngram_lm", default=None, help="ARPA n-gram file")
    p.add_argument("--data_type", default="wav", choices=["wav", "feat",
                                                          "kaldi"])
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8: per-channel weight-only quantization of "
                        "the matmul weights (utils/quantize.py); halves "
                        "weight HBM traffic on the bandwidth-bound "
                        "decode path")
    p.add_argument("--timestamp_file", default=None,
                   help="also write per-token CTC emission timestamps "
                        "as JSONL ({key, tokens, times_ms}; onset "
                        "convention, one encoder position = "
                        "subsampling_rate x 10 ms). Supported for the "
                        "CTC-alignment modes: ctc_greedy_search, "
                        "ctc_prefix_beam_search, attention_rescoring "
                        "(the winning prefix-beam hypothesis' times)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard decode batches over this many devices "
                        "(-1: all). The mesh analog of the reference's "
                        "N-GPU manifest-split decode fan-out "
                        "(examples/aishell/run.sh:186-219): one process, "
                        "batches sharded over the 'data' axis, GSPMD "
                        "runs encoder+search on every chip")
    return p


def load_model(config_path: str, checkpoint: str,
               fallback_vocab: int | None = None):
    cfg = load_config(config_path)
    from openeat_tpu.utils.wenet_convert import (convert_wenet_config,
                                                 is_wenet_config)
    if is_wenet_config(cfg):
        # a raw WeNet release train.yaml (encoder_conf/decoder_conf
        # layout) — adapt it so the released architecture is actually
        # built instead of silently falling back to defaults
        cfg = convert_wenet_config(cfg)
    input_size = cfg.get("input_size", 80)
    # raw WeNet release yamls carry no vocab_size; fall back to the dict
    # (reference recognize.py derives it from the dict file too)
    vocab_size = cfg.get("vocab_size", fallback_vocab)
    if vocab_size is None:
        raise ValueError(f"{config_path} has no vocab_size and no dict "
                         "fallback was provided")
    params, _ = ckpt_lib.load_checkpoint(checkpoint)
    # infer use_global_cmvn from the checkpoint itself: flax `apply`
    # would silently IGNORE the checkpoint's global_cmvn stats if the
    # model were built without the submodule (ADVICE r1, severe silent
    # accuracy loss), so the presence of the params is authoritative;
    # an explicit conflicting config flag is an error, not a fallback.
    has_cmvn_params = "global_cmvn" in (
        params.get("params", {}).get("encoder", {}) or {})
    use_global_cmvn = cfg.get("use_global_cmvn", has_cmvn_params)
    if use_global_cmvn != has_cmvn_params:
        raise ValueError(
            f"{config_path} sets use_global_cmvn={use_global_cmvn} but the "
            f"checkpoint {checkpoint} "
            f"{'has' if has_cmvn_params else 'is missing'} "
            "encoder/global_cmvn params — config/checkpoint mismatch")
    model = build_asr_model(dict(cfg.get("model_conf", {}) or {}),
                            input_size, vocab_size,
                            use_global_cmvn=use_global_cmvn)
    return model, params, cfg


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = init_logger()
    char_dict = load_dict(args.dict_path)
    model, params, cfg = load_model(args.config, args.checkpoint,
                                    fallback_vocab=len(char_dict))
    if getattr(args, "quantize", "none") == "int8":
        from openeat_tpu.utils.quantize import quantize_params, quantized_bytes
        params = quantize_params(params)
        now, fp32 = quantized_bytes(params)
        logger.info("int8 weight quantization: %.1f MB (%.2fx vs fp32)",
                    now / 1e6, fp32 / max(now, 1))
    # commit weights to the device once (after quantization, so int8 is
    # what crosses the wire): orbax restores host numpy leaves, and jit
    # re-uploads numpy args on EVERY dispatch — wasted h2d per batch,
    # and the axon client retains each transfer (docs/AXON_NOTES.md)
    params = jax.device_put(params)
    id2tok = {v: k for k, v in char_dict.items()}
    bpe = load_bpe(args.bpe_model)
    collate_conf = dict(cfg.get("collate_conf", {}) or {})
    fe_conf = collate_conf.get("feature_extraction_conf", {}) or {}
    dataset_conf = dict(cfg.get("dataset_conf", {}) or {})
    data_type = "wav" if args.data_type == "wav" else "feat"

    test_ds = AudioDataset(
        args.test_data, char_dict, bpe,
        max_length=dataset_conf.get("max_length", 10240),
        min_length=dataset_conf.get("min_length", 0),
        token_max_length=dataset_conf.get("token_max_length", 200),
        batch_type="static", batch_size=args.batch_size, sort=True,
        data_type=data_type)
    collate = AudioCollate(resample_rate=fe_conf.get("resample_rate", 16000))
    frontend = FrontendConfig.from_collate_conf(
        collate_conf).without_augmentation()
    loader = PrefetchLoader(test_ds, collate, num_workers=4)
    # decode fan-out over the mesh: batches are sharded on the 'data'
    # axis and params replicated, so every decode program (encoder, CTC
    # DP, beam search, rescoring — all batch-parallel) runs on all dp
    # devices with zero cross-device traffic
    mesh = None
    if args.dp == -1 or args.dp > 1:
        from openeat_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(
            args.dp if args.dp != -1 else len(jax.devices()), 1,
            devices=jax.devices()[: args.dp] if args.dp > 1 else None)
        if args.batch_size % mesh.shape["data"] != 0:
            raise ValueError(f"--batch_size {args.batch_size} must be a "
                             f"multiple of --dp {mesh.shape['data']}")
        params = jax.device_put(params, mesh_lib.replicated(mesh))
        logger.info("decoding over %d devices", mesh.shape["data"])
    # pad the ragged last batch up to batch_size (repeated utterances;
    # keys are not padded so extra rows are never written) — keeps the
    # decode-program shape count bounded instead of recompiling for the
    # remainder batch
    feeder = DeviceFeeder(loader, frontend, mesh=mesh, train=False,
                          pad_batch_multiple=args.batch_size)

    # optional LM
    lm_logp_fn = None
    lm_style = "ar"
    ngram = None
    if args.lm_weight > 0 and args.lm_config and args.lm_checkpoint:
        lm_cfg = load_config(args.lm_config)
        lm = build_language_model(dict(lm_cfg.get("model_conf", {}) or {}),
                                  len(char_dict))
        lm_params, _ = ckpt_lib.load_checkpoint(args.lm_checkpoint)
        lm_style = "ar" if lm.autoregressive else "mlm"
        lm_method = (LanguageModel.log_probs if lm.autoregressive
                     else LanguageModel.mlm_log_probs)

        def lm_logp_fn(tokens, lens):
            return lm.apply(lm_params, tokens, lens, method=lm_method)
    elif args.lm_weight > 0 and args.ngram_lm:
        from openeat_tpu.lm.ngram import load_lm
        ngram = load_lm(args.ngram_lm)

    encode = jax.jit(lambda f, l: model.apply(params, f, l,
                                              method=ASRModel.encode))
    ctc_logp = jax.jit(lambda e: model.apply(params, e,
                                             method=ASRModel.ctc_log_probs))
    rescore = jax.jit(lambda enc, lens, nb, nl, ns: attention_rescoring(
        model, params, enc, lens, nb, nl, ns,
        ctc_weight=args.ctc_weight, reverse_weight=args.reverse_weight,
        lm_logp_fn=lm_logp_fn,
        lm_weight=args.lm_weight if lm_logp_fn else 0.0,
        lm_style=lm_style, return_index=True))
    rescore_scores = jax.jit(
        lambda enc, lens, nb, nl, ns: rescoring_scores(
            model, params, enc, lens, nb, nl, ns,
            ctc_weight=args.ctc_weight,
            reverse_weight=args.reverse_weight))

    want_times = args.timestamp_file is not None
    if want_times and args.mode == "attention":
        raise SystemExit("--timestamp_file needs a CTC frame alignment; "
                         "the attention mode has none (use "
                         "ctc_greedy_search / ctc_prefix_beam_search / "
                         "attention_rescoring)")
    # ms of audio per encoder position (frame shift 10 ms x subsampling)
    pos_ms = {"linear": 1, "conv2d": 4, "conv2d6": 6,
              "conv2d8": 8}[model.input_layer] * 10.0
    ts_out = (open(args.timestamp_file, "w", encoding="utf-8")
              if want_times else None)

    n_done = 0
    os.makedirs(os.path.dirname(os.path.abspath(args.result_file)),
                exist_ok=True)
    with open(args.result_file, "w", encoding="utf-8") as fout:
        for keys, batch in iter(feeder):
            enc, enc_lens = encode(batch["features"],
                                   batch["features_length"])
            times = None
            if args.mode == "ctc_greedy_search":
                if want_times:
                    hyps, hyp_lens, times = ctc_greedy_search(
                        ctc_logp(enc), enc_lens, return_times=True)
                else:
                    hyps, hyp_lens = ctc_greedy_search(ctc_logp(enc),
                                                       enc_lens)
            elif args.mode == "ctc_prefix_beam_search":
                out = ctc_prefix_beam_search(
                    ctc_logp(enc), enc_lens, beam_size=args.beam_size,
                    max_hyp_len=args.max_hyp_len, return_times=want_times)
                nbest, nbest_lens = out[0], out[1]
                hyps, hyp_lens = nbest[:, 0], nbest_lens[:, 0]
                if want_times:
                    times = out[3][:, 0]
            elif args.mode == "attention":
                max_steps = min(int(enc.shape[1]), args.max_hyp_len)
                if args.adaptive_steps:
                    from openeat_tpu.decode.attention_beam import \
                        adaptive_max_steps
                    _, glens = ctc_greedy_search(ctc_logp(enc), enc_lens)
                    max_steps = adaptive_max_steps(glens, cap=max_steps)
                hyps, hyp_lens, _ = attention_decode(
                    model, params, enc, enc_lens, beam_size=args.beam_size,
                    max_steps=max_steps,
                    length_penalty=args.length_penalty)
            else:  # attention_rescoring
                out = ctc_prefix_beam_search(
                    ctc_logp(enc), enc_lens, beam_size=args.beam_size,
                    max_hyp_len=args.max_hyp_len, return_times=want_times)
                nbest, nbest_lens, nbest_scores = out[0], out[1], out[2]
                if ngram is not None and args.lm_weight > 0:
                    # host n-gram rescoring over the nbest (kenlm path,
                    # reference asr_model.py:514-516)
                    hyps, hyp_lens, win = _ngram_rescore(
                        rescore_scores, enc, enc_lens, nbest, nbest_lens,
                        nbest_scores, ngram, id2tok, args)
                else:
                    hyps, hyp_lens, _, win = rescore(enc, enc_lens, nbest,
                                                     nbest_lens,
                                                     nbest_scores)
                if want_times:
                    b = nbest.shape[0]
                    times = np.asarray(out[3])[np.arange(b),
                                               np.asarray(win)]
            hyps = np.asarray(hyps)
            hyp_lens = np.asarray(hyp_lens)
            if times is not None:
                times = np.asarray(times)
            for i, key in enumerate(keys):
                text = token_ids_to_text(
                    hyps[i][: hyp_lens[i]], id2tok, eos_id=model.eos)
                fout.write(f"{key} {text}\n")
                if ts_out is not None:
                    n = int(hyp_lens[i])
                    toks = [id2tok.get(int(t), "<unk>")
                            for t in hyps[i][:n]]
                    ts_out.write(json.dumps(
                        {"key": key, "tokens": toks,
                         "times_ms": [float(t * pos_ms)
                                      for t in times[i][:n]]},
                        ensure_ascii=False) + "\n")
            n_done += len(keys)
            logger.info("decoded %d utts", n_done)
    if ts_out is not None:
        ts_out.close()
        logger.info("wrote %s", args.timestamp_file)
    logger.info("wrote %s", args.result_file)


def _ngram_rescore(rescore_scores, enc, enc_lens, nbest, nbest_lens,
                   nbest_scores, ngram, id2tok, args):
    """attention + ctc + host n-gram combined rescoring.

    The neural part (attention + reverse + ctc_weight*ctc, with dead
    beams pinned to -1e30) is ONE jitted call returning the full [B, K]
    score matrix — scoring it op-by-op here used to dominate LM-fusion
    decodes over the remote-dispatch tunnel (~2.3 s/utt); only the
    n-gram lookups stay on the host (kenlm-path parity,
    reference asr_model.py:514-516)."""
    b, k, _ = nbest.shape
    # np.asarray of a jax array is a READ-ONLY view; copy before the
    # in-place host-side accumulation below
    score = np.array(rescore_scores(enc, enc_lens, nbest, nbest_lens,
                                    nbest_scores))
    # materialize ONCE: per-candidate indexing of device-resident
    # arrays is a device->host round-trip each (640/batch over the
    # remote tunnel dominated the whole fusion decode)
    nbest_np = np.asarray(nbest)
    lens_np = np.asarray(nbest_lens)
    for bi in range(b):
        for ki in range(k):
            toks = [id2tok.get(int(t), "<unk>")
                    for t in nbest_np[bi, ki][: int(lens_np[bi, ki])]]
            score[bi, ki] += args.lm_weight * ngram.score(
                " ".join(toks), bos=True, eos=True)
    best = score.argmax(axis=1)
    return (nbest_np[np.arange(b), best], lens_np[np.arange(b), best],
            best)


if __name__ == "__main__":
    main()
