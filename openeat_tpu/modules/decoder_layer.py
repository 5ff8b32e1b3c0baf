"""Transformer decoder block (flax.linen).

Parity: reference openeat/modules/decoder_layer.py:13-111 — pre-norm
self-attention -> cross-attention -> (parallel adapter) -> FFN; LayerNorm
eps 1e-12. The reference's incremental cache (query trimmed to the last
frame, outputs concatenated) is replaced by the TPU-native static-shape
KV-cache stepping implemented in openeat_tpu.decode; this module is the
pure full-sequence function.

As in the encoder (see encoder_layer.py), the parallel adapter
contributes only its bottleneck update, fixing the reference's
double-residual (decoder_layer.py:98-110).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.attention import MultiHeadedAttention
from openeat_tpu.modules.feed_forward import Adapter, PositionwiseFeedForward


class DecoderLayer(nn.Module):
    d_model: int
    attention_heads: int = 4
    linear_units: int = 2048
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    activation: Callable = jax.nn.relu
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jax.Array, tgt_mask: jax.Array,
                 memory: jax.Array, memory_mask: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        """tgt: [B,L,D]; tgt_mask: bool [B,L,L] (causal & pad, True=attend);
        memory: [B,T,D]; memory_mask: bool [B,1,T]."""
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name=name)
        drop = nn.Dropout(self.dropout_rate)

        h = ln("norm1")(tgt)
        h = MultiHeadedAttention(
            self.attention_heads, self.d_model, self.attention_dropout_rate,
            dtype=self.dtype, name="self_attn")(
                h, h, h, tgt_mask, deterministic=deterministic)
        x = tgt + drop(h, deterministic=deterministic)

        h = ln("norm2")(x)
        h = MultiHeadedAttention(
            self.attention_heads, self.d_model, self.attention_dropout_rate,
            dtype=self.dtype, name="src_attn")(
                h, memory, memory, memory_mask, deterministic=deterministic)
        x = x + drop(h, deterministic=deterministic)

        adapter_update = 0.0
        if self.use_adapter:
            adapter_update = Adapter(
                self.d_model, self.dropout_rate, self.down_size, self.scalar,
                residual=False, dtype=self.dtype, name="adapter")(
                    x, deterministic=deterministic)

        h = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            self.activation, dtype=self.dtype, name="feed_forward")(
                ln("norm3")(x), deterministic=deterministic)
        x = x + drop(h, deterministic=deterministic) + adapter_update
        return x
