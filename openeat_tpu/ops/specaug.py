"""On-device feature augmentation: SpecAugment, spec-substitute,
feature dither, per-utterance normalization.

Behavioral parity with the reference's host-side numpy processors
(reference openeat/dataset/feature_processor.py:5-64 and the collate
hooks in dataset.py:195-209), re-designed as batched, jittable masking
with explicit PRNG keys: everything is `where`/gather over static
shapes, so XLA fuses augmentation into the frontend pipeline and the
per-utterance python loops disappear.

All ops respect per-utterance valid lengths (the reference operates on
unpadded per-utterance arrays; here batches are padded so the random
spans are drawn against each utterance's own length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SPEC_MASK_VALUE = 0.0


def per_utt_normalize(feats: jax.Array, feat_lens: jax.Array,
                      eps: float = 1e-8) -> jax.Array:
    """Per-utterance mean/variance normalization over valid frames.

    Parity: reference feature_processor.py:5-8 (`_normalization`),
    extended to padded batches by masking the statistics.
    feats: [B, T, F]; feat_lens: [B].
    """
    b, t, f = feats.shape
    valid = (jnp.arange(t)[None, :] < feat_lens[:, None])[..., None]  # [B,T,1]
    n = jnp.maximum(feat_lens.astype(feats.dtype), 1.0)[:, None, None]
    mean = jnp.sum(jnp.where(valid, feats, 0.0), axis=1, keepdims=True) / n
    var = jnp.sum(jnp.where(valid, (feats - mean) ** 2, 0.0),
                  axis=1, keepdims=True) / n
    return jnp.where(valid, (feats - mean) / jnp.sqrt(var + eps), feats)


def feature_dither(feats: jax.Array, rng: jax.Array,
                   max_dither: float) -> jax.Array:
    """Uniform dither: one amplitude a~U(0,max) per batch, noise U(-a/2,a/2).

    Parity: reference dataset.py:199-201.
    """
    k1, k2 = jax.random.split(rng)
    a = jax.random.uniform(k1, (), feats.dtype, 0.0, max_dither)
    noise = (jax.random.uniform(k2, feats.shape, feats.dtype) - 0.5) * a
    return feats + noise


def _rand_span(rng: jax.Array, upper: jax.Array, max_len: int,
               shape: tuple) -> tuple[jax.Array, jax.Array]:
    """start ~ U[0, upper-1], length ~ U[1, max_len]; vectorized."""
    k1, k2 = jax.random.split(rng)
    u = jax.random.uniform(k1, shape)
    start = (u * jnp.maximum(upper, 1).astype(u.dtype)).astype(jnp.int32)
    length = jax.random.randint(k2, shape, 1, max_len + 1)
    return start, length


def spec_augment(feats: jax.Array, feat_lens: jax.Array, rng: jax.Array,
                 num_t_mask: int = 2, num_f_mask: int = 2,
                 max_t: int = 50, max_f: int = 10) -> jax.Array:
    """SpecAugment time/freq zero-masks, batched.

    Parity: reference feature_processor.py:10-42 — `num_t_mask` random
    [start, start+len) time spans and `num_f_mask` frequency spans set
    to 0, with start drawn over the utterance's frames and len over
    [1, max]. Vectorized: all masks are built as iota comparisons and
    combined with a single `where`.
    """
    b, t, f = feats.shape
    kt, kf = jax.random.split(rng)
    # time masks: [B, num_t_mask] starts/lengths
    ts, tl = _rand_span(kt, feat_lens[:, None], max_t, (b, num_t_mask))
    pos_t = jnp.arange(t)[None, None, :]  # [1,1,T]
    t_masked = jnp.any((pos_t >= ts[..., None]) &
                       (pos_t < (ts + tl)[..., None]), axis=1)  # [B,T]
    # freq masks: [B, num_f_mask]
    fs, fl = _rand_span(kf, jnp.full((b, 1), f), max_f, (b, num_f_mask))
    pos_f = jnp.arange(f)[None, None, :]
    f_masked = jnp.any((pos_f >= fs[..., None]) &
                       (pos_f < (fs + fl)[..., None]), axis=1)  # [B,F]
    masked = t_masked[:, :, None] | f_masked[:, None, :]
    return jnp.where(masked, SPEC_MASK_VALUE, feats)


def spec_substitute(feats: jax.Array, feat_lens: jax.Array, rng: jax.Array,
                    max_t: int = 20, num_t_sub: int = 3) -> jax.Array:
    """Copy an earlier time span over a later one, `num_t_sub` times.

    Parity: reference feature_processor.py:44-64 — for each substitute,
    start ~ U[0, T-1], len ~ U[1, max_t], pos ~ U[0, start], and
    y[start:end] = y[start-pos:end-pos]. Implemented as a gather with a
    per-frame source-index map (sequential over num_t_sub via scan to
    preserve the reference's compounding semantics).
    """
    b, t, f = feats.shape

    def one_sub(carry, key):
        y = carry
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (b,))
        start = (u * jnp.maximum(feat_lens, 1).astype(u.dtype)).astype(jnp.int32)
        length = jax.random.randint(k2, (b,), 1, max_t + 1)
        pos = (jax.random.uniform(k3, (b,)) *
               (start + 1).astype(jnp.float32)).astype(jnp.int32)
        idx = jnp.arange(t)[None, :]
        in_span = (idx >= start[:, None]) & (idx < (start + length)[:, None])
        src = jnp.where(in_span, idx - pos[:, None], idx)
        src = jnp.clip(src, 0, t - 1)
        return jnp.take_along_axis(y, src[..., None], axis=1), None

    keys = jax.random.split(rng, num_t_sub)
    out, _ = jax.lax.scan(one_sub, feats, keys)
    return out
