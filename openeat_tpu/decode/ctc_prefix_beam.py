"""Batched on-device CTC prefix beam search.

Replaces the reference's per-utterance python dict DP
(reference openeat/models/asr_model.py:328-396: frame loop over
topk x prefixes with (pb, pnb) log-prob pairs merged via log_add,
batch=1 only, on CPU) with a fixed-beam tensorized DP that runs as ONE
jitted program for a whole batch:

- beam state: [K] prefixes as (token matrix, rolling hashes, last token,
  pb, pnb);
- each frame expands K prefixes x (stay + C token extensions) where
  "stay" absorbs both the blank case and the repeated-last-token case
  (identical prefix identity), and extensions split the v==last case
  (pb-only mass) from v!=last (pb+pnb mass), exactly the classic DP;
- equal prefixes are merged by lexsorting two independent 32-bit rolling
  hashes and log-add-reducing runs (the tensor analog of the dict merge);
- frames past each utterance's length are identity steps (blank lp 0).

The per-step work is topk/sort/segment ops over K*(C+1) ~ 100 lanes —
tiny next to the encoder — and the whole search vmaps over the batch,
eliminating the reference's decode-time shell-level parallelism.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from openeat_tpu.utils.common import IGNORE_ID

NEG_INF = -1.0e30
_H1_MUL = jnp.uint32(1000003)
_H2_MUL = jnp.uint32(2654435761)


class BeamState(NamedTuple):
    prefixes: jax.Array   # [K, L] int32, IGNORE_ID padded
    lens: jax.Array       # [K]
    last: jax.Array       # [K] last token, -1 if empty
    h1: jax.Array         # [K] uint32 rolling hash
    h2: jax.Array         # [K] uint32 rolling hash (independent)
    pb: jax.Array         # [K] log prob of prefix ending in blank
    pnb: jax.Array        # [K] log prob ending in non-blank
    times: jax.Array      # [K, L] int32 emission frame per token (onset
    #                       of the highest-mass path: each equal-prefix
    #                       merge keeps the best-scoring candidate's
    #                       times — Viterbi-flavored, WeNet-style)


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx_safe = jnp.where(mx <= NEG_INF, 0.0, mx)
    out = mx_safe + jnp.log(jnp.exp(a - mx_safe) + jnp.exp(b - mx_safe))
    return jnp.where(mx <= NEG_INF, NEG_INF, out)


def _segment_logsumexp(vals: jax.Array, seg_ids: jax.Array,
                       num_segments: int) -> jax.Array:
    mx = jax.ops.segment_max(vals, seg_ids, num_segments=num_segments)
    mx = jnp.where(mx <= NEG_INF, 0.0, mx)
    s = jax.ops.segment_sum(jnp.exp(vals - mx[seg_ids]), seg_ids,
                            num_segments=num_segments)
    out = mx + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(s <= 0.0, NEG_INF, out)


def prefix_beam_init(beam_size: int, max_hyp_len: int) -> BeamState:
    """Empty-prefix beam state (streaming entry point: carry this
    across chunks and advance it with `prefix_beam_step`)."""
    k = beam_size
    return BeamState(
        prefixes=jnp.full((k, max_hyp_len), IGNORE_ID, jnp.int32),
        lens=jnp.zeros((k,), jnp.int32),
        last=jnp.full((k,), -1, jnp.int32),
        h1=jnp.zeros((k,), jnp.uint32),
        h2=jnp.zeros((k,), jnp.uint32),
        pb=jnp.full((k,), NEG_INF).at[0].set(0.0),
        pnb=jnp.full((k,), NEG_INF),
        times=jnp.zeros((k, max_hyp_len), jnp.int32),
    )


def prefix_beam_finalize(state: BeamState, *, with_times: bool = False):
    """(prefixes [K, L], lens [K], scores [K]) sorted best-first;
    with_times appends the emission-frame matrix [K, L]."""
    scores = _logaddexp(state.pb, state.pnb)
    order = jnp.argsort(-scores)
    out = (state.prefixes[order], state.lens[order], scores[order])
    if with_times:
        out = out + (state.times[order],)
    return out


def prefix_beam_step(state: BeamState, lp: jax.Array, active: jax.Array,
                     frame_idx: jax.Array | int = 0, *,
                     blank_id: int = 0) -> BeamState:
    """One frame of the prefix-beam DP. lp: [V] log-probs; active:
    scalar bool — an inactive frame is an exact identity step (the
    same mechanism that pads ragged batches pads ragged streams).
    frame_idx: absolute frame index recorded as the emission time of
    tokens first appended at this step (callers that don't care about
    timestamps can leave the default)."""
    k, max_hyp_len = state.prefixes.shape
    c = k  # first-stage topk prune width (reference :363)
    n_cand = k * (c + 1)
    # padded frames: blank lp 0, everything else -inf -> identity step
    lp = jnp.where(active, lp,
                   jnp.full_like(lp, NEG_INF).at[blank_id].set(0.0))
    top_lp, top_v = jax.lax.top_k(lp, c)          # [C]

    # ---- stay candidates (one per prefix) ----
    lp_blank = lp[blank_id]
    # the repeated-last-token mass only flows when `last` survives the
    # frame's topk prune (reference asr_model.py:363-377 iterates only
    # over the pruned candidate set)
    last_in_top = jnp.any(top_v[None, :] == state.last[:, None], axis=1)
    lp_last = jnp.where((state.last >= 0) & last_in_top,
                        lp[jnp.maximum(state.last, 0)], NEG_INF)
    blank_in_top = jnp.any(top_v == blank_id)
    lp_blank = jnp.where(blank_in_top, lp_blank, NEG_INF)
    stay_pb = _logaddexp(state.pb, state.pnb) + lp_blank       # [K]
    stay_pnb = state.pnb + lp_last                              # [K]

    # ---- extension candidates [K, C] ----
    is_blank = top_v[None, :] == blank_id                       # [1,C]
    same_as_last = top_v[None, :] == state.last[:, None]        # [K,C]
    base = jnp.where(same_as_last, state.pb[:, None],
                     _logaddexp(state.pb, state.pnb)[:, None])
    ext_pnb = base + top_lp[None, :]
    room = state.lens < max_hyp_len
    ext_pnb = jnp.where(is_blank | ~room[:, None], NEG_INF, ext_pnb)
    vv = top_v[None, :].astype(jnp.uint32) + 1
    ext_h1 = state.h1[:, None] * _H1_MUL + vv
    ext_h2 = state.h2[:, None] * _H2_MUL + vv * jnp.uint32(97)
    # blank "extensions" are dead; give them unique junk hashes so
    # they can never merge with a live prefix
    junk = (jnp.arange(k * c, dtype=jnp.uint32).reshape(k, c)
            + jnp.uint32(0x9e3779b9))
    ext_h1 = jnp.where(is_blank | ~room[:, None], junk, ext_h1)
    ext_h2 = jnp.where(is_blank | ~room[:, None], junk, ext_h2)

    # ---- flatten: [K] stay then [K*C] ext ----
    cand_pb = jnp.concatenate([stay_pb, jnp.full((k * c,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    cand_h1 = jnp.concatenate([state.h1, ext_h1.reshape(-1)])
    cand_h2 = jnp.concatenate([state.h2, ext_h2.reshape(-1)])
    cand_parent = jnp.concatenate(
        [jnp.arange(k, dtype=jnp.int32),
         jnp.repeat(jnp.arange(k, dtype=jnp.int32), c)])
    cand_tok = jnp.concatenate(
        [jnp.full((k,), -1, jnp.int32),
         jnp.tile(top_v.astype(jnp.int32), (k,))])

    # ---- merge equal prefixes: lexsort by (h1, h2) ----
    # score is the most-minor key so each segment's FIRST candidate is
    # its highest-mass path: the representative names the emission
    # times, so a token created long ago on a weak tail path does not
    # pin an early timestamp once the dominant path emits it later
    # (Viterbi-flavored time selection; prefix identity is unaffected —
    # merged candidates reconstruct identical token sequences)
    cand_score = _logaddexp(cand_pb, cand_pnb)
    order = jnp.lexsort((-cand_score, cand_h2, cand_h1))
    s_pb, s_pnb = cand_pb[order], cand_pnb[order]
    s_h1, s_h2 = cand_h1[order], cand_h2[order]
    s_parent, s_tok = cand_parent[order], cand_tok[order]
    new_seg = jnp.concatenate(
        [jnp.array([True]),
         (s_h1[1:] != s_h1[:-1]) | (s_h2[1:] != s_h2[:-1])])
    seg_ids = jnp.cumsum(new_seg) - 1                          # [N]
    m_pb = _segment_logsumexp(s_pb, seg_ids, n_cand)
    m_pnb = _segment_logsumexp(s_pnb, seg_ids, n_cand)
    # representative (first) candidate of each segment
    first_idx = jnp.where(new_seg, jnp.arange(n_cand), n_cand)
    rep = jax.ops.segment_min(first_idx, seg_ids, num_segments=n_cand)
    rep = jnp.minimum(rep, n_cand - 1)
    n_segs = seg_ids[-1] + 1
    seg_alive = jnp.arange(n_cand) < n_segs
    score = jnp.where(seg_alive, _logaddexp(m_pb, m_pnb), NEG_INF)

    # ---- keep top K ----
    top_score, top_seg = jax.lax.top_k(score, k)
    sel = rep[top_seg]
    parent = s_parent[sel]
    tok = s_tok[sel]
    new_prefixes = state.prefixes[parent]
    new_lens = state.lens[parent]
    new_last = state.last[parent]
    nh1, nh2 = state.h1[parent], state.h2[parent]
    extend = tok >= 0
    pos = jnp.minimum(new_lens, max_hyp_len - 1)
    upd = new_prefixes.at[jnp.arange(k), pos].set(
        jnp.where(extend, tok, new_prefixes[jnp.arange(k), pos]))
    new_prefixes = jnp.where(extend[:, None], upd, new_prefixes)
    new_times = state.times[parent]
    fi = jnp.asarray(frame_idx, jnp.int32)
    upd_t = new_times.at[jnp.arange(k), pos].set(
        jnp.where(extend, fi, new_times[jnp.arange(k), pos]))
    new_times = jnp.where(extend[:, None], upd_t, new_times)
    new_lens = jnp.where(extend, new_lens + 1, new_lens)
    new_last = jnp.where(extend, tok, new_last)
    tu = tok.astype(jnp.uint32) + 1
    nh1 = jnp.where(extend, nh1 * _H1_MUL + tu, nh1)
    nh2 = jnp.where(extend, nh2 * _H2_MUL + tu * jnp.uint32(97), nh2)
    new_state = BeamState(new_prefixes, new_lens, new_last, nh1, nh2,
                          m_pb[top_seg], m_pnb[top_seg], new_times)
    return new_state


def _search_single(log_probs: jax.Array, length: jax.Array,
                   beam_size: int, max_hyp_len: int, blank_id: int,
                   with_times: bool):
    """log_probs: [T, V]; length: scalar. Returns (prefixes [K, L],
    lens [K], scores [K] = log(pb+pnb), sorted best-first)."""
    t_max = log_probs.shape[0]
    init = prefix_beam_init(beam_size, max_hyp_len)

    def step(state, inputs):
        lp, t_idx = inputs
        return prefix_beam_step(state, lp, t_idx < length, t_idx,
                                blank_id=blank_id), None

    final, _ = jax.lax.scan(step, init, (log_probs, jnp.arange(t_max)))
    return prefix_beam_finalize(final, with_times=with_times)


@functools.partial(jax.jit,
                   static_argnames=("beam_size", "max_hyp_len", "blank_id",
                                    "return_times"))
def ctc_prefix_beam_search(ctc_log_probs: jax.Array, lens: jax.Array,
                           beam_size: int = 10, max_hyp_len: int = 64,
                           blank_id: int = 0, return_times: bool = False):
    """Batched search. ctc_log_probs: [B, T, V]; lens: [B].

    Returns (prefixes [B, K, max_hyp_len] IGNORE_ID-padded,
             prefix_lens [B, K], scores [B, K]) best-first;
    return_times appends per-token emission frames [B, K, max_hyp_len]
    (the frame a token first entered its prefix — onset convention,
    one encoder position = subsampling_rate x 10 ms of audio).
    """
    fn = functools.partial(_search_single, beam_size=beam_size,
                           max_hyp_len=max_hyp_len, blank_id=blank_id,
                           with_times=return_times)
    return jax.vmap(fn)(ctc_log_probs, lens)
