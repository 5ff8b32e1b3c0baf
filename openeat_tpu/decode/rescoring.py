"""Attention rescoring — batched, fully on-device.

Parity: reference openeat/models/asr_model.py:418-534 — CTC prefix beam
nbest -> sos/eos-padded -> one batched decoder pass (forward + reverse)
-> per-hypothesis score:

    (1-rw) * att + rw * r_att  +  ctc_weight * ctc  +  lm_weight * lm

where att sums token log-probs plus the eos log-prob, the reverse score
reads the right-to-left decoder on the reversed hypothesis, ctc is the
prefix-beam score, and lm is a Transformer-LM (on-device) or n-gram
(host, openeat_tpu.lm.ngram) score.

Unlike the reference (batch=1, python scoring loops, CPU round-trips)
the whole rescoring pass here vmaps over the batch: [B, K, L] hypothesis
tensors flow through the decoders as one [B*K, L] batch and the scoring
reductions are gathers + masked sums in the same XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from openeat_tpu.utils.common import IGNORE_ID, add_sos_eos, reverse_pad_list


def _gather_token_scores(logp: jax.Array, tokens: jax.Array,
                         lens: jax.Array, eos: int) -> jax.Array:
    """Sum log p(token_j | prefix) over j < len, plus eos at position len.

    logp: [M, L+1, V] (decoder scores for sos-prefixed input);
    tokens: [M, L] hypothesis tokens (IGNORE_ID padded); lens: [M].
    """
    m, l = tokens.shape
    pos = jnp.arange(l)[None, :]
    valid = pos < lens[:, None]
    tok = jnp.where(valid, tokens, 0)
    tok_scores = jnp.take_along_axis(
        logp[:, :l, :], tok[..., None], axis=-1)[..., 0]
    score = jnp.sum(jnp.where(valid, tok_scores, 0.0), axis=1)
    eos_logp = logp[jnp.arange(m), lens, eos]
    return score + eos_logp


@functools.partial(jax.jit,
                   static_argnames=("model", "ctc_weight", "reverse_weight",
                                    "lm_logp_fn", "lm_weight", "lm_style",
                                    "return_index"))
def attention_rescoring(model, params, encoder_out: jax.Array,
                        encoder_lens: jax.Array, hyps: jax.Array,
                        hyp_lens: jax.Array, ctc_scores: jax.Array, *,
                        ctc_weight: float = 0.5, reverse_weight: float = 0.0,
                        lm_logp_fn=None, lm_weight: float = 0.0,
                        lm_style: str = "ar", return_index: bool = False):
    """Rescore prefix-beam nbest.

    Jitted as a whole (model/weights/lm_logp_fn static — pass a STABLE
    lm_logp_fn, not a fresh lambda per call, or every call recompiles):
    un-jitted, the decoder applies execute eagerly op-by-op, which on a
    remote-dispatch chip costs seconds per batch (same failure the r4
    attention_beam_probe quantified at ~65x).

    encoder_out: [B, T, D]; hyps: [B, K, L] (IGNORE_ID padded);
    hyp_lens: [B, K]; ctc_scores: [B, K].

    LM fusion (optional): lm_style='ar' passes sos-prefixed hypotheses to
    `lm_logp_fn(tokens [M, L+1], lens)` and sums next-token scores
    (reference asr_model.py:490-500 autoregressive branch); 'mlm' passes
    the bare eos-padded hypotheses and sums same-position scores — the
    reference's masked-LM pseudo-likelihood branch (asr_model.py:494-499).

    Returns (best hyps [B, L], best lens [B], best scores [B]);
    return_index appends the winning nbest index [B] (e.g. to look up
    the winner's prefix-beam emission times for timestamps).
    """
    score = rescoring_scores(
        model, params, encoder_out, encoder_lens, hyps, hyp_lens,
        ctc_scores, ctc_weight=ctc_weight, reverse_weight=reverse_weight,
        lm_logp_fn=lm_logp_fn, lm_weight=lm_weight, lm_style=lm_style)
    b = hyps.shape[0]
    best = jnp.argmax(score, axis=1)
    best_hyps = hyps[jnp.arange(b), best]
    best_lens = hyp_lens[jnp.arange(b), best]
    best_scores = score[jnp.arange(b), best]
    if return_index:
        return best_hyps, best_lens, best_scores, best
    return best_hyps, best_lens, best_scores


def rescoring_scores(model, params, encoder_out: jax.Array,
                     encoder_lens: jax.Array, hyps: jax.Array,
                     hyp_lens: jax.Array, ctc_scores: jax.Array, *,
                     ctc_weight: float = 0.5, reverse_weight: float = 0.0,
                     lm_logp_fn=None, lm_weight: float = 0.0,
                     lm_style: str = "ar") -> jax.Array:
    """Combined rescoring score for EVERY nbest candidate, [B, K]
    (attention + reverse + ctc_weight*ctc [+ neural-LM fusion]; dead
    beams pinned to -1e30). attention_rescoring() is the argmax over
    this; host-side n-gram fusion (bin/recognize._ngram_rescore) adds
    its term to this matrix in one jitted call per batch."""
    b, k, l = hyps.shape
    m = b * k
    flat_hyps = hyps.reshape(m, l)
    flat_lens = hyp_lens.reshape(m).astype(jnp.int32)
    ys_in, _ = add_sos_eos(flat_hyps, flat_lens, model.sos, model.eos)
    ys_in_lens = flat_lens + 1

    memory = jnp.repeat(encoder_out, k, axis=0)
    memory_lens = jnp.repeat(encoder_lens, k, axis=0)

    logp = model.apply(params, memory, memory_lens, ys_in, ys_in_lens,
                       method=type(model).decoder_logits)
    score = _gather_token_scores(logp, flat_hyps, flat_lens, model.eos)

    if reverse_weight > 0:
        r_hyps = reverse_pad_list(flat_hyps, flat_lens, IGNORE_ID)
        r_ys_in, _ = add_sos_eos(r_hyps, flat_lens, model.sos, model.eos)
        r_logp = model.apply(params, memory, memory_lens, r_ys_in,
                             ys_in_lens, True,
                             method=type(model).decoder_logits)
        r_score = _gather_token_scores(r_logp, r_hyps, flat_lens, model.eos)
        score = (1.0 - reverse_weight) * score + reverse_weight * r_score

    score = score + ctc_weight * ctc_scores.reshape(m)

    if lm_weight > 0 and lm_logp_fn is not None:
        if lm_style == "mlm":
            # masked-LM pseudo-likelihood: inputs are the bare hypotheses
            # (pads -> eos), score token j at position j
            mlm_in = jnp.where(flat_hyps == IGNORE_ID, model.eos, flat_hyps)
            lm_logp = lm_logp_fn(mlm_in, flat_lens)
            pos = jnp.arange(l)[None, :]
            valid = pos < flat_lens[:, None]
            tok = jnp.where(valid, flat_hyps, 0)
            tok_lp = jnp.take_along_axis(lm_logp[:, :l, :],
                                         tok[..., None], axis=-1)[..., 0]
            lm_score = jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)
        else:
            lm_logp = lm_logp_fn(ys_in, ys_in_lens)
            lm_score = _gather_token_scores(lm_logp, flat_hyps, flat_lens,
                                            model.eos)
            # reference sums only token scores for the LM (no eos term,
            # asr_model.py:508-512); subtract the eos contribution out
            lm_score = lm_score - lm_logp[jnp.arange(m), flat_lens,
                                          model.eos]
        score = score + lm_weight * lm_score

    score = score.reshape(b, k)
    # dead beams (score -inf from the prefix search) can never win
    return jnp.where(jnp.isfinite(ctc_scores), score, -1.0e30)
