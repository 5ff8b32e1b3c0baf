"""Attention beam search + rescoring equivalence tests vs python oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.decode.attention_beam import recognize
from openeat_tpu.decode.numpy_ref import attention_beam_ref
from openeat_tpu.decode.rescoring import attention_rescoring
from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.utils.common import IGNORE_ID

VOCAB, F = 20, 16


def _setup(rng, b=2, t=32):
    model = ASRModel(input_size=F, vocab_size=VOCAB, encoder_num_blocks=1,
                     decoder_num_blocks=1, r_decoder_num_blocks=1,
                     reverse_weight=0.3, d_model=16, attention_heads=2,
                     linear_units=32, input_layer="linear",
                     dropout_rate=0.0, compute_dtype=jnp.float32)
    feats = jnp.asarray(rng.standard_normal((b, t, F)), jnp.float32)
    feat_lens = jnp.array([t] * b)
    tgt = jnp.asarray(rng.integers(1, VOCAB - 1, (b, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, tgt,
                        jnp.array([5] * b))
    enc, enc_lens = model.apply(params, feats, feat_lens,
                                method=ASRModel.encode)
    return model, params, enc, enc_lens


def test_attention_beam_matches_oracle(rng):
    model, params, enc, enc_lens = _setup(rng)
    beam, max_steps = 4, 8
    hyps, lens, scores = recognize(model, params, enc, enc_lens,
                                   beam_size=beam, max_steps=max_steps)

    def step_scores(prefixes):
        ln = max(len(p) for p in prefixes)
        arr = np.full((len(prefixes), ln), model.eos, np.int32)
        for i, p in enumerate(prefixes):
            arr[i, : len(p)] = p
        mem = jnp.repeat(enc, len(prefixes) // enc.shape[0], axis=0)
        mem_l = jnp.repeat(enc_lens, len(prefixes) // enc.shape[0], axis=0)
        lp = model.apply(params, mem, mem_l, jnp.asarray(arr),
                         jnp.full((len(prefixes),), ln, jnp.int32),
                         method=ASRModel.decoder_logits)
        out = np.zeros((len(prefixes), VOCAB), np.float32)
        for i, p in enumerate(prefixes):
            out[i] = np.asarray(lp[i, len(p) - 1])
        return out

    want = attention_beam_ref(step_scores, enc.shape[0], beam, model.sos,
                              model.eos, max_steps)
    for i in range(enc.shape[0]):
        got = [int(x) for x in hyps[i] if x != IGNORE_ID]
        assert got == want[i], (got, want[i])
        assert int(lens[i]) == len(want[i])


def test_cached_beam_matches_uncached(rng):
    """The KV-cached search must produce identical hypotheses and scores
    to the full-prefix recompute search."""
    model, params, enc, enc_lens = _setup(rng)
    h1, l1, s1 = recognize(model, params, enc, enc_lens, beam_size=4,
                           max_steps=8, use_cache=False)
    h2, l2, s2 = recognize(model, params, enc, enc_lens, beam_size=4,
                           max_steps=8, use_cache=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4)


def test_attention_beam_finished_scores_frozen(rng):
    model, params, enc, enc_lens = _setup(rng, b=1, t=16)
    h1, l1, s1 = recognize(model, params, enc, enc_lens, beam_size=3,
                           max_steps=6)
    h2, l2, s2 = recognize(model, params, enc, enc_lens, beam_size=3,
                           max_steps=12)
    # a hypothesis finished before step 6 must be stable as steps grow
    if int(l1[0]) < 6:
        np.testing.assert_array_equal(
            np.asarray(h1[0][: int(l1[0])]), np.asarray(h2[0][: int(l2[0])]))
        np.testing.assert_allclose(float(s1[0]), float(s2[0]), rtol=1e-5)


def test_rescoring_matches_manual(rng):
    model, params, enc, enc_lens = _setup(rng)
    b, k, l = enc.shape[0], 3, 6
    hyps = jnp.asarray(rng.integers(1, VOCAB - 1, (b, k, l)), jnp.int32)
    hyp_lens = jnp.asarray(rng.integers(2, l + 1, (b, k)), jnp.int32)
    pos = jnp.arange(l)[None, None, :]
    hyps = jnp.where(pos < hyp_lens[..., None], hyps, IGNORE_ID)
    ctc_scores = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)

    best_hyps, best_lens, best_scores = attention_rescoring(
        model, params, enc, enc_lens, hyps, hyp_lens, ctc_scores,
        ctc_weight=0.5, reverse_weight=0.3)

    # manual scoring per hypothesis (python loops, reference style)
    from openeat_tpu.utils.common import add_sos_eos, reverse_pad_list
    flat = hyps.reshape(b * k, l)
    flens = hyp_lens.reshape(b * k)
    ys_in, _ = add_sos_eos(flat, flens, model.sos, model.eos)
    mem = jnp.repeat(enc, k, axis=0)
    mem_l = jnp.repeat(enc_lens, k, axis=0)
    lp = np.asarray(model.apply(params, mem, mem_l, ys_in, flens + 1,
                                method=ASRModel.decoder_logits))
    r_flat = reverse_pad_list(flat, flens, IGNORE_ID)
    r_ys_in, _ = add_sos_eos(r_flat, flens, model.sos, model.eos)
    r_lp = np.asarray(model.apply(params, mem, mem_l, r_ys_in, flens + 1,
                                  True, method=ASRModel.decoder_logits))
    want_scores = np.zeros((b, k))
    for bi in range(b):
        for ki in range(k):
            m = bi * k + ki
            n = int(flens[m])
            toks = [int(x) for x in flat[m, :n]]
            s = sum(lp[m, j, w] for j, w in enumerate(toks))
            s += lp[m, n, model.eos]
            rs = sum(r_lp[m, n - 1 - j, w] for j, w in enumerate(toks))
            rs += r_lp[m, n, model.eos]
            s = 0.7 * s + 0.3 * rs
            s += 0.5 * float(ctc_scores[bi, ki])
            want_scores[bi, ki] = s
    for bi in range(b):
        bk = int(np.argmax(want_scores[bi]))
        np.testing.assert_allclose(float(best_scores[bi]),
                                   want_scores[bi, bk], rtol=1e-4)
        got = [int(x) for x in best_hyps[bi] if x != IGNORE_ID]
        want = [int(x) for x in hyps[bi, bk] if x != IGNORE_ID]
        assert got == want


def test_adaptive_max_steps():
    from openeat_tpu.decode.attention_beam import adaptive_max_steps
    # bucketed: 1.25*20+4 = 29 -> rounds up to 32
    assert adaptive_max_steps(np.array([5, 20, 12])) == 32
    # cap wins when the bound exceeds it
    assert adaptive_max_steps(np.array([100]), cap=64) == 64
    # floor: at least one bucket even for empty/zero-length hyps
    assert adaptive_max_steps(np.array([0, 0])) == 8
    assert adaptive_max_steps(np.array([], dtype=np.int32)) == 8
    # same bucket for nearby lengths -> same compiled program
    assert (adaptive_max_steps(np.array([21]))
            == adaptive_max_steps(np.array([22])))
