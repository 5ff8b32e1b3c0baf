"""LM shallow-fusion scoring in attention rescoring (AR + MLM styles)."""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.decode.rescoring import attention_rescoring
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.utils.common import IGNORE_ID

VOCAB, F = 16, 12


def _setup(rng):
    model = ASRModel(input_size=F, vocab_size=VOCAB, encoder_num_blocks=1,
                     decoder_num_blocks=1, r_decoder_num_blocks=0,
                     reverse_weight=0.0, d_model=16, attention_heads=2,
                     linear_units=32, input_layer="linear",
                     dropout_rate=0.0, compute_dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((1, 24, F)), jnp.float32)
    lens = jnp.array([24])
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (1, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, tgt,
                        jnp.array([4]))
    enc, enc_lens = model.apply(params, feats, lens,
                                method=ASRModel.encode)
    hyps = jnp.asarray(rng.integers(1, VOCAB - 1, (1, 3, 5)), jnp.int32)
    hyp_lens = jnp.array([[5, 4, 3]], jnp.int32)
    pos = jnp.arange(5)[None, None, :]
    hyps = jnp.where(pos < hyp_lens[..., None], hyps, IGNORE_ID)
    ctc_scores = jnp.asarray(rng.standard_normal((1, 3)), jnp.float32)
    return model, params, enc, enc_lens, hyps, hyp_lens, ctc_scores


def _fake_lm(rng, seed=5):
    """Deterministic random 'LM': fixed per-token table, position-free."""
    table = jax.nn.log_softmax(
        jnp.asarray(np.random.default_rng(seed).standard_normal(
            (VOCAB, VOCAB)), jnp.float32), axis=-1)

    def fn(tokens, lens):
        # logp at position j = row of token at position j (AR: predicts
        # next from current; MLM: scores current position)
        return table[jnp.where(tokens < 0, 0, tokens)]
    return fn, table


def test_ar_lm_fusion_changes_scores(rng):
    model, params, enc, enc_lens, hyps, hyp_lens, ctc = _setup(rng)
    lm_fn, table = _fake_lm(rng)
    h0, l0, s0 = attention_rescoring(model, params, enc, enc_lens, hyps,
                                     hyp_lens, ctc, ctc_weight=0.5)
    h1, l1, s1 = attention_rescoring(model, params, enc, enc_lens, hyps,
                                     hyp_lens, ctc, ctc_weight=0.5,
                                     lm_logp_fn=lm_fn, lm_weight=0.7,
                                     lm_style="ar")
    # manual AR lm score of the winning hyp: sum_j table[prev_j, w_j]
    # with prev_0 = sos
    def ar_score(toks):
        prev = model.sos
        s = 0.0
        for w in toks:
            s += float(table[prev, w])
            prev = w
        return s
    # verify the delta for the same hypothesis index equals lm_weight*lm
    for k in range(3):
        one = hyps[:, k: k + 1, :]
        one_l = hyp_lens[:, k: k + 1]
        one_c = ctc[:, k: k + 1]
        _, _, sa = attention_rescoring(model, params, enc, enc_lens, one,
                                       one_l, one_c, ctc_weight=0.5)
        _, _, sb = attention_rescoring(model, params, enc, enc_lens, one,
                                       one_l, one_c, ctc_weight=0.5,
                                       lm_logp_fn=lm_fn, lm_weight=0.7,
                                       lm_style="ar")
        toks = [int(x) for x in hyps[0, k, : int(hyp_lens[0, k])]]
        np.testing.assert_allclose(float(sb[0] - sa[0]),
                                   0.7 * ar_score(toks), rtol=1e-4)


def test_mlm_lm_fusion_changes_scores(rng):
    model, params, enc, enc_lens, hyps, hyp_lens, ctc = _setup(rng)
    lm_fn, table = _fake_lm(rng)
    for k in range(3):
        one = hyps[:, k: k + 1, :]
        one_l = hyp_lens[:, k: k + 1]
        one_c = ctc[:, k: k + 1]
        _, _, sa = attention_rescoring(model, params, enc, enc_lens, one,
                                       one_l, one_c, ctc_weight=0.5)
        _, _, sb = attention_rescoring(model, params, enc, enc_lens, one,
                                       one_l, one_c, ctc_weight=0.5,
                                       lm_logp_fn=lm_fn, lm_weight=0.4,
                                       lm_style="mlm")
        toks = [int(x) for x in hyps[0, k, : int(hyp_lens[0, k])]]
        # mlm pseudo-likelihood: position j scores token at position j;
        # our fake LM's row at position j is table[w_j] -> table[w_j, w_j]
        want = sum(float(table[w, w]) for w in toks)
        np.testing.assert_allclose(float(sb[0] - sa[0]), 0.4 * want,
                                   rtol=1e-4)
