"""Difficulty calibration probe for the hard/lmhard structured corpora
(real TPU, ~10 min): trains a corpus-sized Conformer for a few hundred
steps on in-memory utterances, then reports 4-mode CER on a held-out
set — a fast proxy for where the flagship recipe drive will land, used
to tune the difficulty knobs (SNR band, pair_df, scale_jitter, quiet
channel) before the full drive. Profiles with an lm_text split also
get an n-gram LM-fusion leg with a free fusion-weight sweep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hard_probe.py \
          [--steps 800] [--snr_lo 3 --snr_hi 13 --pair_df 14]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from dataclasses import replace

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.make_structured_corpus import (HARD, PROFILES, _grammar,
                                               sample_sentence, synth_utt)
from openeat_tpu.decode.attention_beam import recognize as attention_decode
from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
from openeat_tpu.decode.rescoring import (attention_rescoring,
                                          rescoring_scores)
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.ops.frontend import FrontendConfig, compute_features
from openeat_tpu.parallel.train_step import build_train_step, init_state
from openeat_tpu.utils.common import IGNORE_ID
from openeat_tpu.utils.optim import build_optimizer
from openeat_tpu.utils.wer import corpus_wer

RATE = 16000


def make_set(rng, diff, grammar, n_utts, max_samples):
    seqs, wavs = [], []
    for _ in range(n_utts):
        sent = sample_sentence(rng, grammar, diff)
        x = synth_utt(rng, sent, diff) * 32768.0
        seqs.append([diff.chars.index(c) + 2 for c in sent])  # dict-style
        wavs.append(x[:max_samples])
    wav_pad = np.zeros((n_utts, max_samples), np.float32)
    lens = np.zeros(n_utts, np.int32)
    for i, w in enumerate(wavs):
        wav_pad[i, : len(w)] = w
        lens[i] = len(w)
    maxl = max(len(s) for s in seqs)
    tgt = np.full((n_utts, maxl), IGNORE_ID, np.int32)
    for i, s in enumerate(seqs):
        tgt[i, : len(s)] = s
    tlen = np.asarray([len(s) for s in seqs], np.int32)
    return (jnp.asarray(wav_pad), jnp.asarray(lens), jnp.asarray(tgt),
            jnp.asarray(tlen), seqs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--n_test", type=int, default=256)
    p.add_argument("--profile", choices=sorted(PROFILES), default="hard")
    p.add_argument("--lm_sents", type=int, default=60000,
                   help="text-only sentences for the fusion leg "
                        "(profiles with lm_text_n only)")
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--snr_lo", type=float, default=None)
    p.add_argument("--snr_hi", type=float, default=None)
    p.add_argument("--pair_df", type=float, default=None)
    p.add_argument("--scale_jitter", type=float, default=None)
    p.add_argument("--pair_prior", type=float, default=None)
    p.add_argument("--amp_jitter", type=float, default=None)
    args = p.parse_args()
    diff = PROFILES[args.profile]
    if args.snr_lo is not None or args.snr_hi is not None:
        diff = replace(diff, snr_db=(
            diff.snr_db[0] if args.snr_lo is None else args.snr_lo,
            diff.snr_db[1] if args.snr_hi is None else args.snr_hi))
    if args.pair_df is not None:
        diff = replace(diff, pair_df=args.pair_df)
    if args.scale_jitter is not None:
        diff = replace(diff, scale_jitter=args.scale_jitter)
    if args.pair_prior is not None:
        diff = replace(diff, pair_prior=args.pair_prior)
    if args.amp_jitter is not None:
        diff = replace(diff, amp_jitter=args.amp_jitter)
    print(f"profile: snr={diff.snr_db} pair_df={diff.pair_df} "
          f"scale_jitter={diff.scale_jitter} "
          f"pair_prior={diff.pair_prior} amp_jitter={diff.amp_jitter}",
          file=sys.stderr)
    grammar = _grammar(diff)
    vocab = len(diff.chars) + 3  # blank, unk, chars..., sos/eos

    model = ASRModel(
        input_size=80, vocab_size=vocab, encoder_num_blocks=6,
        decoder_num_blocks=2, r_decoder_num_blocks=2, reverse_weight=0.3,
        d_model=128, attention_heads=4, linear_units=512,
        input_layer="conv2d", cnn_module_kernel=7, ctc_weight=0.3,
        dropout_rate=0.1, ctc_impl="optax", compute_dtype=jnp.bfloat16)
    fcfg = FrontendConfig(num_mel_bins=80, spec_aug=True,
                          spec_aug_num_t=2, spec_aug_max_t=15)

    max_samples = int((diff.max_len * (diff.tok_dur + diff.dur_jitter)
                       + 0.05) * RATE)
    max_samples = (max_samples + RATE - 1) // RATE * RATE
    rng = np.random.default_rng(0)
    wav, wlens, tgt, tlens, _ = make_set(rng, diff, grammar,
                                         args.n_train, max_samples)
    tx, _ = build_optimizer(1.5e-3, args.steps // 8)
    bsz = 64
    key = jax.random.PRNGKey(0)
    k_feat, key = jax.random.split(key)
    feats, flens = compute_features(wav, wlens, k_feat, fcfg, False)
    batch = {"features": feats, "features_length": flens,
             "targets": tgt, "targets_length": tlens}
    state = init_state(model, tx, {k: v[:bsz] for k, v in batch.items()})
    step = jax.jit(build_train_step(model, tx), donate_argnums=(0,))
    t0 = time.time()
    for i in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.permutation(k1, args.n_train)[:bsz]
        mb = {k: v[idx] for k, v in batch.items()}
        state, m = step(state, mb, k2)
        if (i + 1) % 100 == 0:
            print(f"step {i+1} loss {float(m['loss']):.3f} "
                  f"acc {float(m['acc']):.3f}", file=sys.stderr)
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s",
          file=sys.stderr)

    wav_t, wlens_t, tgt_t, tlens_t, seqs_t = make_set(
        np.random.default_rng(1), diff, grammar, args.n_test, max_samples)
    feats_t, flens_t = compute_features(
        wav_t, wlens_t, jax.random.PRNGKey(2),
        fcfg.without_augmentation(), False)
    params = state.params
    enc, enc_lens = model.apply(params, feats_t, flens_t,
                                method=ASRModel.encode)
    ctc_lp = model.apply(params, enc, method=ASRModel.ctc_log_probs)
    refs = {f"u{i}": " ".join(map(str, s)) for i, s in enumerate(seqs_t)}

    def cer(hyps_arr, lens_arr):
        hyps = {}
        for i in range(args.n_test):
            toks = [int(x) for x in np.asarray(hyps_arr[i])[
                : int(lens_arr[i])] if x != IGNORE_ID]
            hyps[f"u{i}"] = " ".join(map(str, toks))
        return corpus_wer(refs, hyps, char_mode=False).wer

    results = {}
    h, l = ctc_greedy_search(ctc_lp, enc_lens)
    results["ctc_greedy_search"] = cer(h, l)
    nb, nl, ns = ctc_prefix_beam_search(ctc_lp, enc_lens, beam_size=10,
                                        max_hyp_len=24)
    results["ctc_prefix_beam_search"] = cer(nb[:, 0], nl[:, 0])
    h, l, _ = attention_decode(model, params, enc, enc_lens, beam_size=10,
                               max_steps=24)
    results["attention"] = cer(h, l)
    h, l, _ = attention_rescoring(model, params, enc, enc_lens, nb, nl,
                                  ns, ctc_weight=0.5, reverse_weight=0.3)
    results["attention_rescoring"] = cer(h, l)
    # flush the 4 base modes before the fusion leg so a fusion failure
    # can't discard a 5-minute training run's results
    print("base: " + json.dumps({k: round(v, 2)
                                 for k, v in results.items()}),
          file=sys.stderr, flush=True)

    if diff.lm_text_n:
        # n-gram fusion leg: order-(prior_context+1) KN ARPA estimated on
        # a big text-only sample, added to the rescoring score matrix the
        # same way bin/recognize.py's _ngram_rescore does (log10, kenlm
        # convention)
        from openeat_tpu.lm.ngram import ArpaLM
        from tools.train_ngram import estimate
        lm_rng = np.random.default_rng(9)
        t0 = time.time()
        lm_sents = [sample_sentence(lm_rng, grammar, diff)
                    for _ in range(args.lm_sents)]
        order = diff.prior_context + 1 if diff.prior_context else 3
        lm = ArpaLM(estimate(lm_sents, order), order)
        print(f"ngram: order-{order} on {args.lm_sents} sents "
              f"in {time.time()-t0:.1f}s", file=sys.stderr)
        score = np.array(rescoring_scores(
            model, params, enc, enc_lens, nb, nl, ns,
            ctc_weight=0.5, reverse_weight=0.3))
        nb_np, nl_np = np.asarray(nb), np.asarray(nl)
        lm_scores = np.zeros_like(score)
        for bi in range(nb_np.shape[0]):
            for ki in range(nb_np.shape[1]):
                ln = int(nl_np[bi, ki])
                if ln <= 0 or score[bi, ki] < -1e29:
                    continue
                # CTC can emit any vocab id (incl. blank/unk/eos ids);
                # map out-of-range ids to <unk> like recognize.py's
                # id2tok.get(..., "<unk>")
                toks = [diff.chars[int(t) - 2]
                        if 0 <= int(t) - 2 < len(diff.chars) else "<unk>"
                        for t in nb_np[bi, ki, :ln]]
                lm_scores[bi, ki] = lm.score(" ".join(toks))
        rows = np.arange(score.shape[0])
        # LM scores computed once -> the fusion weight sweeps for free
        for w in dict.fromkeys((args.lm_weight, 0.2, 0.5, 0.8, 1.2)):
            best = (score + w * lm_scores).argmax(axis=1)
            key = ("rescoring_ngram" if w == args.lm_weight
                   else f"rescoring_ngram_w{w}")
            results[key] = cer(nb_np[rows, best], nl_np[rows, best])
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
