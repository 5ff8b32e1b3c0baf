"""Batched on-device attention beam search.

Parity: reference openeat/models/asr_model.py:205-295 — encoder once,
beams flattened to (B*N), per-step decoder scoring + two-stage topk
(N per beam, then N over N*N), finished-beam freezing via the
mask_finished_* helpers, final best-of-beam by raw score.

TPU design: the whole search is one jitted lax.while_loop with a static
token buffer [B*N, Lmax+1]; each step runs the full-prefix decoder under
a causal mask (positions beyond the current step cannot influence the
scored position, so no dynamic shapes exist anywhere) and stops early
once every beam has emitted eos. The python per-step loop, per-step
host sync, and the growing KV cache of the reference are all gone.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from openeat_tpu.utils.common import IGNORE_ID
from openeat_tpu.utils.mask import mask_finished_preds, \
    mask_finished_scores

NEG_INF = -1.0e9


class BeamState(NamedTuple):
    tokens: jax.Array    # [B*N, L+1] with sos at column 0
    scores: jax.Array    # [B*N]
    finished: jax.Array  # [B*N] bool
    step: jax.Array      # scalar int32


def _select_best(final_tokens, final_scores, b, n, eos,
                 length_penalty: float):
    """Best-of-beam with optional additive length bonus.

    length_penalty > 0 counters the early-eos bias of unnormalized
    scores (score + penalty * hyp_len at selection only); 0.0 matches
    the reference's raw-score argmax (asr_model.py:288-295).
    """
    tokens = final_tokens.reshape(b, n, -1)[:, :, 1:]
    is_eos = tokens == eos
    lens = jnp.where(jnp.any(is_eos, axis=2), jnp.argmax(is_eos, axis=2),
                     tokens.shape[2])                      # [B, N]
    scores = final_scores.reshape(b, n)
    sel = scores + length_penalty * lens.astype(scores.dtype)
    best = jnp.argmax(sel, axis=1)
    bi = jnp.arange(b)
    best_tokens = tokens[bi, best]
    best_lens = lens[bi, best].astype(jnp.int32)
    pos = jnp.arange(tokens.shape[2])[None, :]
    hyps = jnp.where(pos < best_lens[:, None], best_tokens, IGNORE_ID)
    return hyps, best_lens, scores[bi, best]


def attention_beam_search(decoder_step_fn, encoder_out: jax.Array,
                          encoder_lens: jax.Array, *, beam_size: int,
                          sos: int, eos: int, max_steps: int,
                          length_penalty: float = 0.0
                          ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Search over `decoder_step_fn(tokens [M, L+1], memory, memory_lens)
    -> log-probs [M, L+1, V]` (full-prefix causal decoder scores).

    Returns (best tokens [B, max_steps] IGNORE_ID-padded, lens [B],
    best scores [B]).
    """
    b, t, d = encoder_out.shape
    n = beam_size
    m = b * n
    memory = jnp.repeat(encoder_out, n, axis=0)        # [M, T, D]
    memory_lens = jnp.repeat(encoder_lens, n, axis=0)  # [M]

    init = BeamState(
        tokens=jnp.full((m, max_steps + 1), eos, jnp.int32).at[:, 0].set(sos),
        scores=jnp.tile(
            jnp.full((n,), NEG_INF).at[0].set(0.0), (b,)),
        finished=jnp.zeros((m,), bool),
        step=jnp.zeros((), jnp.int32),
    )

    def cond(state: BeamState):
        return (state.step < max_steps) & ~jnp.all(state.finished)

    def body(state: BeamState):
        i = state.step  # scoring position i (predict token i+1 at col i+1)
        logp_all = decoder_step_fn(state.tokens, memory, memory_lens)
        logp = jax.lax.dynamic_slice_in_dim(logp_all, i, 1, axis=1)[:, 0]
        top_lp, top_tok = jax.lax.top_k(logp, n)       # [M, N]
        top_lp = mask_finished_scores(top_lp, state.finished, eos_index=0)
        top_tok = mask_finished_preds(top_tok, state.finished, eos)
        cand = state.scores[:, None] + top_lp          # [M, N]
        cand = cand.reshape(b, n * n)
        best_sc, best_idx = jax.lax.top_k(cand, n)     # [B, N]
        beam_idx = best_idx // n                        # which source beam
        tok_idx = best_idx % n
        src = (jnp.arange(b)[:, None] * n + beam_idx).reshape(-1)   # [M]
        new_tokens = state.tokens[src]
        new_tok = top_tok.reshape(b, n, n)[
            jnp.arange(b)[:, None], beam_idx, tok_idx].reshape(-1)
        new_tokens = new_tokens.at[:, i + 1].set(new_tok)
        new_finished = state.finished[src] | (new_tok == eos)
        return BeamState(new_tokens, best_sc.reshape(-1), new_finished,
                         i + 1)

    final = jax.lax.while_loop(cond, body, init)
    return _select_best(final.tokens, final.scores, b, n, eos,
                        length_penalty)


@functools.partial(jax.jit,
                   static_argnames=("model", "beam_size", "max_steps",
                                    "length_penalty"))
def attention_beam_search_cached(model, params, encoder_out: jax.Array,
                                 encoder_lens: jax.Array, *, beam_size: int,
                                 max_steps: int, length_penalty: float = 0.0
                                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """KV-cached beam search: per-step cost is one single-position
    decoder evaluation (self-attn over cached keys, cross-attn over
    K/V projected once), instead of the full-prefix recompute of
    :func:`attention_beam_search`. Produces identical hypotheses
    (tested); use this for serving.

    Jitted AS A WHOLE (model/beam/steps static): run un-jitted, the
    setup (flax applies, repeat, select) executes eagerly op-by-op —
    the r4 probe measured the same search at 63.5 ms jitted vs ~4.1 s
    through the eager path on the remote-dispatch chip
    (benchmarks/results/r4_decode_rtf/attention_beam_probe.log).
    """
    b, t, d = encoder_out.shape
    n = beam_size
    m = b * n
    sos, eos = model.sos, model.eos
    memory = jnp.repeat(encoder_out, n, axis=0)
    memory_lens = jnp.repeat(encoder_lens, n, axis=0)
    cache0 = model.apply(params, memory, m, max_steps + 1,
                         method=type(model).decoder_init_cache)

    init = (BeamState(
        tokens=jnp.full((m, max_steps + 1), eos, jnp.int32).at[:, 0].set(sos),
        scores=jnp.tile(jnp.full((n,), NEG_INF).at[0].set(0.0), (b,)),
        finished=jnp.zeros((m,), bool),
        step=jnp.zeros((), jnp.int32)), cache0)

    def cond(carry):
        state, _ = carry
        return (state.step < max_steps) & ~jnp.all(state.finished)

    def body(carry):
        state, cache = carry
        i = state.step
        cur_tok = jax.lax.dynamic_slice_in_dim(state.tokens, i, 1,
                                               axis=1)[:, 0]
        logp, cache = model.apply(params, cur_tok, i, cache, memory_lens,
                                  t, method=type(model).decoder_step)
        top_lp, top_tok = jax.lax.top_k(logp, n)
        top_lp = mask_finished_scores(top_lp, state.finished, eos_index=0)
        top_tok = mask_finished_preds(top_tok, state.finished, eos)
        cand = (state.scores[:, None] + top_lp).reshape(b, n * n)
        best_sc, best_idx = jax.lax.top_k(cand, n)
        beam_idx = best_idx // n
        tok_idx = best_idx % n
        src = (jnp.arange(b)[:, None] * n + beam_idx).reshape(-1)
        new_tokens = state.tokens[src]
        new_tok = top_tok.reshape(b, n, n)[
            jnp.arange(b)[:, None], beam_idx, tok_idx].reshape(-1)
        new_tokens = new_tokens.at[:, i + 1].set(new_tok)
        new_finished = state.finished[src] | (new_tok == eos)
        # reorder self-attention caches to follow their beams (cross K/V
        # rows are identical within a batch, no gather needed)
        cache = {"cross": cache["cross"],
                 "self_k": tuple(c[src] for c in cache["self_k"]),
                 "self_v": tuple(c[src] for c in cache["self_v"])}
        return (BeamState(new_tokens, best_sc.reshape(-1), new_finished,
                          i + 1), cache)

    (final, _) = jax.lax.while_loop(cond, body, init)
    return _select_best(final.tokens, final.scores, b, n, eos,
                        length_penalty)


def make_decoder_step_fn(model, params):
    """Full-prefix causal decoder scorer for ASRModel."""
    def fn(tokens, memory, memory_lens):
        l = tokens.shape[1]
        lens = jnp.full((tokens.shape[0],), l, jnp.int32)
        return model.apply(params, memory, memory_lens, tokens, lens,
                           method=type(model).decoder_logits)
    return fn


def adaptive_max_steps(greedy_lens, *, factor: float = 1.25,
                       margin: int = 4, bucket: int = 8,
                       cap: int | None = None) -> int:
    """Step bound from CTC-greedy hypothesis lengths.

    The reference runs its beam for the full encoder length
    (asr_model.py:246: maxlen = encoder_out.size(1)) — hundreds of
    decoder steps for ~20-token hypotheses. A CTC greedy pass costs
    ~1e-3 of the attention search (benchmarks/decode_rtf.py), and its
    lengths bound the attention hypothesis tightly in practice; decode
    with bucketed `factor*max(greedy_len)+margin` steps instead.
    Bucketing (round up to a multiple of `bucket`) keeps the number of
    distinct compiled programs small."""
    import numpy as np
    m = int(np.max(np.asarray(greedy_lens))) if np.size(greedy_lens) else 0
    s = int(m * factor) + margin
    s = max(bucket, ((s + bucket - 1) // bucket) * bucket)
    return min(s, cap) if cap is not None else s


def recognize(model, params, encoder_out, encoder_lens, *, beam_size=10,
              max_steps: int | None = None, use_cache: bool = True,
              length_penalty: float = 0.0):
    """Reference `ASRModel.recognize` equivalent (asr_model.py:205-295)."""
    if max_steps is None:
        max_steps = int(encoder_out.shape[1])
    if use_cache:
        return attention_beam_search_cached(
            model, params, encoder_out, encoder_lens, beam_size=beam_size,
            max_steps=max_steps, length_penalty=length_penalty)
    return attention_beam_search(
        make_decoder_step_fn(model, params), encoder_out, encoder_lens,
        beam_size=beam_size, sos=model.sos, eos=model.eos,
        max_steps=max_steps, length_penalty=length_penalty)
