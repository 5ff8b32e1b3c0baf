"""Mask utilities (JAX, static-shape, XLA-friendly).

Behavioral parity with the reference's mask helpers
(reference: openeat/utils/mask.py:9-146) — causal masks, padding masks,
and the beam-search finished-hypothesis maskers — expressed as pure
functions over static shapes so they trace cleanly under jit.

Convention: boolean masks are True where a position is VALID (may attend /
is real data), matching the reference's non-pad convention. Padding masks
produced by :func:`make_pad_mask` are True at PAD positions, like the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def subsequent_mask(size: int, dtype=jnp.bool_) -> jax.Array:
    """Lower-triangular causal mask; [size, size], True = may attend.

    Parity: reference openeat/utils/mask.py:9-39.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return (col <= row).astype(dtype)


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at padded positions; [B, max_len].

    Parity: reference openeat/utils/mask.py:43-70.
    """
    pos = jax.lax.broadcasted_iota(jnp.int32, (lengths.shape[0], max_len), 1)
    return pos >= lengths[:, None].astype(jnp.int32)


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at valid (non-pad) positions; [B, max_len].

    Parity: reference openeat/utils/mask.py:73-97.
    """
    return ~make_pad_mask(lengths, max_len)


def chunk_mask(size: int, chunk_size: int,
               num_left_chunks: int = -1) -> jax.Array:
    """Chunked-attention mask [size, size]: queries attend within their
    chunk plus `num_left_chunks` previous chunks (-1 = all history).

    Streaming-style training mask (the reference exposes only causal
    convs + decode caches, SURVEY.md §5 long-context: this is the
    chunked-training extension, WeNet-style static chunks).
    """
    q = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0) // chunk_size
    k = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1) // chunk_size
    m = k <= q
    if num_left_chunks >= 0:
        m = m & (k >= q - num_left_chunks)
    return m


def dynamic_chunk_mask(size: int, chunk_size: jax.Array,
                       num_left_chunks: jax.Array | int = -1) -> jax.Array:
    """chunk_mask with a TRACED chunk size (dynamic-chunk training:
    a random chunk width per batch trains one model that decodes well
    at any streaming chunk size)."""
    cs = jnp.maximum(jnp.asarray(chunk_size, jnp.int32), 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0) // cs
    k = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1) // cs
    m = k <= q
    left = jnp.asarray(num_left_chunks, jnp.int32)
    return jnp.where(left >= 0, m & (k >= q - left), m)


def make_attn_mask(lengths: jax.Array, max_len: int, causal: bool = False) -> jax.Array:
    """Combined padding(+causal) attention mask; [B, T, T] bool, True = attend.

    Equivalent to the reference's `make_non_pad_mask(...).unsqueeze(1) &
    subsequent_mask(...)` composition (openeat/models/asr_model.py:168-171).
    """
    valid = make_non_pad_mask(lengths, max_len)  # [B, T]
    mask = valid[:, None, :]  # [B, 1, T] keys
    if causal:
        mask = mask & subsequent_mask(max_len)[None, :, :]
    else:
        mask = mask & jnp.ones((1, max_len, max_len), dtype=jnp.bool_)
    return mask


def mask_finished_scores(scores: jax.Array, end_flag: jax.Array,
                         eos_index: int = 0) -> jax.Array:
    """For finished beams force continuation prob mass onto one slot.

    `scores`: [B*N, V_beam] per-step candidate scores; `end_flag`: [B*N] bool.
    On a finished beam every candidate except slot `eos_index` gets -inf and
    slot `eos_index` gets 0 so the hypothesis score is frozen.

    Parity: reference openeat/utils/mask.py:100-127 (there the first beam
    column is zeroed; here the column index is explicit).
    """
    v = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    finished = end_flag.reshape(end_flag.shape + (1,) * (scores.ndim - 1))
    frozen = jnp.where(col == eos_index, 0.0, NEG_INF).astype(scores.dtype)
    return jnp.where(finished, frozen, scores)


def mask_finished_preds(preds: jax.Array, end_flag: jax.Array, eos: int) -> jax.Array:
    """Force predictions of finished beams to eos.

    Parity: reference openeat/utils/mask.py:130-146.
    """
    finished = end_flag.reshape(end_flag.shape + (1,) * (preds.ndim - end_flag.ndim))
    return jnp.where(finished, eos, preds)
