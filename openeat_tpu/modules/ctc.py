"""CTC head: projection + loss + frame posteriors.

Parity: reference openeat/modules/ctc.py:6-74 — linear projection of
encoder states to vocab, CTC loss (blank=0, zero_infinity semantics,
sum-over-batch / batch or length-normalized), log_softmax / argmax
helpers for decoding.

The loss is optax.ctc_loss (XLA log-space forward-backward, fully
on-device, differentiable); openeat_tpu.ops.ctc provides a Pallas
forward-backward kernel used for long-sequence perf. The reference's
`reduction='mean'` double-division by batch (ctc.py:23,44) is a scale
bug we do not replicate: length-normalized means per-token, else
per-batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class CTCHead(nn.Module):
    vocab_size: int
    length_normalized_loss: bool = False
    blank_id: int = 0
    # 'optax' (sequential lax.scan) | 'native' (Pallas fwd/bwd kernel) |
    # 'parallel' (log-semiring associative scan, ops/ctc_parallel.py)
    impl: str = "optax"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ctc_lo = nn.Dense(self.vocab_size, dtype=self.dtype,
                               name="ctc_lo")

    def project(self, hs: jax.Array) -> jax.Array:
        """Encoder states [B,T,D] -> logits [B,T,V] (f32)."""
        return self.ctc_lo(hs).astype(jnp.float32)

    def loss(self, hs: jax.Array, hlens: jax.Array, ys: jax.Array,
             ys_lens: jax.Array) -> jax.Array:
        """CTC loss. hs: [B,T,D]; hlens: [B]; ys: [B,L] (pad=anything);
        ys_lens: [B]. Returns scalar."""
        logits = self.project(hs)
        b, t, _ = logits.shape
        l = ys.shape[1]
        logit_pad = (jnp.arange(t)[None, :] >= hlens[:, None]).astype(
            jnp.float32)
        label_pad = (jnp.arange(l)[None, :] >= ys_lens[:, None]).astype(
            jnp.float32)
        labels = jnp.where(label_pad > 0, 0, ys).astype(jnp.int32)
        if self.impl == "native":
            from openeat_tpu.ops.ctc_loss import ctc_loss as native_ctc
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            per_seq = native_ctc(log_probs, hlens.astype(jnp.int32),
                                 labels, ys_lens.astype(jnp.int32),
                                 self.blank_id, True)
        elif self.impl == "parallel":
            from openeat_tpu.ops.ctc_parallel import ctc_loss_parallel
            per_seq = ctc_loss_parallel(logits, logit_pad, labels,
                                        label_pad, blank_id=self.blank_id)
        else:
            per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                     blank_id=self.blank_id)
        # zero_infinity semantics (torch CTCLoss zero_infinity=True): an
        # infeasible alignment (frames < labels + required blanks between
        # repeats) must contribute 0, not optax's log_epsilon penalty
        repeats = jnp.sum(
            (labels[:, 1:] == labels[:, :-1])
            & (jnp.arange(1, l)[None, :] < ys_lens[:, None]), axis=1)
        feasible = hlens >= ys_lens + repeats
        per_seq = jnp.where(feasible & jnp.isfinite(per_seq), per_seq, 0.0)
        if self.length_normalized_loss:
            return jnp.mean(per_seq / jnp.maximum(ys_lens, 1))
        return jnp.sum(per_seq) / b

    def log_softmax(self, hs: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(self.project(hs), axis=-1)

    def softmax(self, hs: jax.Array) -> jax.Array:
        return jax.nn.softmax(self.project(hs), axis=-1)

    def argmax(self, hs: jax.Array) -> jax.Array:
        return jnp.argmax(self.project(hs), axis=-1)

    def __call__(self, hs, hlens, ys, ys_lens):
        return self.loss(hs, hlens, ys, ys_lens)
