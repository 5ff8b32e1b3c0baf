"""Label-smoothing KL loss (pure function).

Parity: reference openeat/modules/label_smoothing_loss.py:12-91 —
KLDiv(log_softmax(x) || smoothed one-hot) with the off-target mass
`smoothing/(size-1)`, padding positions dropped, normalized by batch
size (default) or by valid token count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openeat_tpu.utils.common import IGNORE_ID


def label_smoothing_loss(logits: jax.Array, target: jax.Array,
                         smoothing: float = 0.1,
                         padding_idx: int = IGNORE_ID,
                         normalize_length: bool = False) -> jax.Array:
    """logits: [B, L, V] (f32); target: [B, L] int with padding_idx pads."""
    b, l, v = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    confidence = 1.0 - smoothing
    off = smoothing / (v - 1)
    valid = target != padding_idx
    tgt = jnp.where(valid, target, 0)
    onehot_logp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    # KL(p||q) = sum_i p_i (log p_i - log q_i); the entropy term is constant
    # but kept for exact parity with torch KLDivLoss values.
    p_ent = (confidence * jnp.log(confidence + 1e-38)
             + (v - 1) * off * jnp.log(off + 1e-38))
    cross = confidence * onehot_logp + off * (
        jnp.sum(logp, axis=-1) - onehot_logp)
    kl = p_ent - cross  # [B, L]
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length else b
    return jnp.sum(kl) / denom
