"""Transformer decoder block (flax.linen).

Parity: reference openeat/modules/decoder_layer.py:13-111 — pre-norm
self-attention -> cross-attention -> (parallel adapter) -> FFN; LayerNorm
eps 1e-12.

As in the encoder (see encoder_layer.py), the parallel adapter
contributes only its bottleneck update, fixing the reference's
double-residual (decoder_layer.py:98-110).

Incremental decoding: instead of the reference's growing output-concat
cache (decoder_layer.py:76-110), `step` consumes static-shape KV caches
— self-attention K/V written at the current position via
dynamic_update_slice, cross-attention K/V projected once per utterance
— so the whole beam-search loop is allocation-free under XLA.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.attention import MultiHeadedAttention
from openeat_tpu.modules.feed_forward import Adapter, PositionwiseFeedForward

from openeat_tpu.modules.dropout import Dropout


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

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name=name)
        self.norm1 = ln("norm1")
        self.norm2 = ln("norm2")
        self.norm3 = ln("norm3")
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.d_model, self.attention_dropout_rate,
            dtype=self.dtype, name="self_attn")
        self.src_attn = MultiHeadedAttention(
            self.attention_heads, self.d_model, self.attention_dropout_rate,
            dtype=self.dtype, name="src_attn")
        self.feed_forward = PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            self.activation, dtype=self.dtype, name="feed_forward")
        if self.use_adapter:
            self.adapter = Adapter(
                self.d_model, self.dropout_rate, self.down_size, self.scalar,
                residual=False, dtype=self.dtype, name="adapter")
        self.drop = Dropout(self.dropout_rate)

    def __call__(self, tgt: jax.Array, tgt_mask: jax.Array,
                 memory: jax.Array, memory_mask: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        """tgt: [B,L,D]; tgt_mask: bool [B,L,L] (causal & pad, True=attend);
        memory: [B,T,D]; memory_mask: bool [B,1,T]."""
        h = self.norm1(tgt)
        h = self.self_attn(h, h, h, tgt_mask, deterministic=deterministic)
        x = tgt + self.drop(h, deterministic=deterministic)

        h = self.norm2(x)
        h = self.src_attn(h, memory, memory, memory_mask,
                          deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic)

        adapter_update = 0.0
        if self.use_adapter:
            adapter_update = self.adapter(x, deterministic=deterministic)

        h = self.feed_forward(self.norm3(x), deterministic=deterministic)
        x = x + self.drop(h, deterministic=deterministic) + adapter_update
        return x

    # ---- incremental decode ----

    def init_cross_cache(self, memory: jax.Array):
        """Precompute cross-attention K/V: (k, v) [B, T, H, Dk]."""
        return self.src_attn.project_kv(memory)

    def step(self, x: jax.Array, pos: jax.Array, self_k: jax.Array,
             self_v: jax.Array, cross_kv, memory_mask: jax.Array):
        """One position. x: [B, 1, D] embedded token at `pos`;
        self_k/v: [B, Lmax, H, Dk] caches; cross_kv: from
        init_cross_cache. Returns (y [B,1,D], new self_k, new self_v)."""
        b, lmax = self_k.shape[0], self_k.shape[1]
        h = self.norm1(x)
        q = self.self_attn.project_q(h)              # [B,1,H,Dk]
        k_new, v_new = self.self_attn.project_kv(h)  # [B,1,H,Dk]
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_new, pos, 1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_new, pos, 1)
        hist = (jnp.arange(lmax)[None, None, :] <= pos)  # [1,1,Lmax]
        hist = jnp.broadcast_to(hist, (b, 1, lmax))
        h = self.self_attn.attend_cached(q, self_k, self_v, hist)
        x = x + h

        h = self.norm2(x)
        q = self.src_attn.project_q(h)
        ck, cv = cross_kv
        h = self.src_attn.attend_cached(q, ck, cv, memory_mask)
        x = x + h

        adapter_update = 0.0
        if self.use_adapter:
            adapter_update = self.adapter(x, deterministic=True)
        h = self.feed_forward(self.norm3(x), deterministic=True)
        x = x + h + adapter_update
        return x, self_k, self_v
