"""Hermetic recognition-quality benchmark on a synthetic tone corpus.

Since the real corpora can't be fetched in this environment, this builds
a synthetic "language" where each token is a distinct spectral pattern
(tone chord + noise), trains the small Conformer end-to-end through the
actual framework path (frontend -> model -> sharded train step), then
decodes a held-out test set with ALL FOUR modes and reports CER — the
hermetic stand-in for the AIShell recipe's WER gates.

Prints one JSON line per decode mode.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.decode.attention_beam import recognize as attention_decode
from openeat_tpu.decode.ctc_greedy import ctc_greedy_search
from openeat_tpu.decode.ctc_prefix_beam import ctc_prefix_beam_search
from openeat_tpu.decode.rescoring import attention_rescoring
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.ops.frontend import FrontendConfig, compute_features
from openeat_tpu.parallel.train_step import build_train_step, init_state
from openeat_tpu.utils.common import IGNORE_ID
from openeat_tpu.utils.optim import build_optimizer
from openeat_tpu.utils.wer import corpus_wer

VOCAB = 34  # blank, unk, 30 "phonemes", sos/eos
RATE = 16000
TOK_DUR = 0.12  # seconds per token


def synth_utt(rng, tokens):
    """Each token = 2-tone chord unique to the token id."""
    n = int(TOK_DUR * RATE)
    t = np.arange(n) / RATE
    wav = []
    for tok in tokens:
        f1 = 200 + 137.0 * tok
        f2 = 450 + 211.0 * tok
        seg = 0.4 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(
            2 * np.pi * f2 * t)
        env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n))
                         / (0.01 * RATE))
        wav.append(seg * env)
    x = np.concatenate(wav) + 0.02 * rng.standard_normal(
        n * len(tokens))
    return (x * 32768).astype(np.float32)


def make_set(rng, n_utts, min_len=3, max_len=10):
    seqs, wavs = [], []
    for _ in range(n_utts):
        l = int(rng.integers(min_len, max_len + 1))
        toks = rng.integers(2, VOCAB - 2, l).tolist()
        seqs.append(toks)
        wavs.append(synth_utt(rng, toks))
    maxn = max(len(w) for w in wavs)
    maxn = (maxn + RATE - 1) // RATE * RATE
    wav_pad = np.zeros((n_utts, maxn), np.float32)
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


def main(steps=400, n_train=256, n_test=64):
    rng = np.random.default_rng(0)
    model = ASRModel(
        input_size=40, vocab_size=VOCAB, encoder_num_blocks=4,
        decoder_num_blocks=2, r_decoder_num_blocks=2, reverse_weight=0.3,
        d_model=128, attention_heads=4, linear_units=256,
        input_layer="conv2d", cnn_module_kernel=7, ctc_weight=0.3,
        dropout_rate=0.1, ctc_impl="optax",
        compute_dtype=jnp.bfloat16)
    fcfg = FrontendConfig(num_mel_bins=40, spec_aug=True,
                          spec_aug_max_t=20, spec_aug_max_f=5)

    wav, wlens, tgt, tlens, _ = make_set(rng, n_train)
    feats, flens = compute_features(wav, wlens, jax.random.PRNGKey(1),
                                    fcfg, False)
    batch = {"features": feats, "features_length": flens,
             "targets": tgt, "targets_length": tlens}
    tx, _ = build_optimizer(2e-3, steps // 8)
    # init on a micro-batch-shaped slice (init only needs shapes; the
    # full-set forward would compile a needlessly huge program)
    state = init_state(model, tx, {k: v[:64] for k, v in batch.items()})
    step = jax.jit(build_train_step(model, tx), donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    bsz = 64
    t0 = time.time()
    for i in range(steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.permutation(k1, n_train)[:bsz]
        mb = {k: v[idx] for k, v in batch.items()}
        state, m = step(state, mb, k2)
        if (i + 1) % 100 == 0:
            print(f"step {i+1} loss {float(m['loss']):.3f} "
                  f"acc {float(m['acc']):.3f}", file=sys.stderr)
    print(f"trained {steps} steps in {time.time()-t0:.1f}s",
          file=sys.stderr)

    # held-out test
    wav_t, wlens_t, tgt_t, tlens_t, seqs_t = make_set(
        np.random.default_rng(1), n_test)
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
        for i in range(n_test):
            toks = [int(x) for x in np.asarray(hyps_arr[i])[
                : int(lens_arr[i])] if x != IGNORE_ID]
            hyps[f"u{i}"] = " ".join(map(str, toks))
        return corpus_wer(refs, hyps, char_mode=False).wer

    results = {}
    h, l = ctc_greedy_search(ctc_lp, enc_lens)
    results["ctc_greedy_search"] = cer(h, l)
    nb, nl, ns = ctc_prefix_beam_search(ctc_lp, enc_lens, beam_size=10,
                                        max_hyp_len=16)
    results["ctc_prefix_beam_search"] = cer(nb[:, 0], nl[:, 0])
    h, l, _ = attention_decode(model, params, enc, enc_lens, beam_size=10,
                               max_steps=16)
    results["attention"] = cer(h, l)
    h, l, _ = attention_rescoring(model, params, enc, enc_lens, nb, nl,
                                  ns, ctc_weight=0.5, reverse_weight=0.3)
    results["attention_rescoring"] = cer(h, l)
    for mode, v in results.items():
        print(json.dumps({"metric": f"synthetic_cer_{mode}",
                          "value": round(v, 2), "unit": "%CER"}))


if __name__ == "__main__":
    main()
