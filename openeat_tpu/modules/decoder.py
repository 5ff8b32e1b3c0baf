"""Transformer decoder stacks (flax.linen).

Parity: reference openeat/modules/decoder.py — `Decoder` (:16-108, bare
stack for composition), `TransformerDecoder` (:110-232: token embed +
abs-pos-enc -> N DecoderLayers -> LayerNorm(eps 1e-12) -> output linear,
optional tied embedding, returns (logits, pre_softmax_hidden)), and
`BiTransformerDecoder` (:234-309: left-to-right + optional right-to-left
decoder over reversed targets).

Incremental decoding does not use a growing concat cache (reference
decoder.py:196-232); the decode package re-runs the static-shape
full-prefix forward or KV-cache stepping instead, which XLA compiles to
one program.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.decoder_layer import DecoderLayer
from openeat_tpu.modules.embedding import PositionalEncoding


class Decoder(nn.Module):
    """Bare decoder-layer stack (decoder.py:16-108)."""

    d_model: int
    dropout_rate: float = 0.1
    attention_heads: int = 4
    linear_units: int = 2048
    activation: Callable = jax.nn.relu
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    num_blocks: int = 6
    num_blocks_share: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask, *,
                 deterministic: bool = True):
        layers = [
            DecoderLayer(
                d_model=self.d_model,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                use_adapter=self.use_adapter,
                down_size=self.down_size,
                scalar=self.scalar,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_blocks // self.num_blocks_share)
        ]
        x = tgt
        for layer in layers:
            for _ in range(self.num_blocks_share):
                x = layer(x, tgt_mask, memory, memory_mask,
                          deterministic=deterministic)
        return x


class TransformerDecoder(nn.Module):
    """Embedded decoder with output head (decoder.py:110-232)."""

    vocab_size: int
    d_model: int
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_heads: int = 4
    linear_units: int = 2048
    activation: Callable = jax.nn.relu
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    num_blocks: int = 6
    num_blocks_share: int = 1
    share_embedding: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask, *,
                 deterministic: bool = True):
        """tgt: [B,L] int tokens. Returns (logits [B,L,V], hidden [B,L,D])."""
        embed = nn.Embed(self.vocab_size, self.d_model,
                         dtype=self.dtype, name="embed")
        x = embed(tgt)
        x, _ = PositionalEncoding(self.d_model, self.positional_dropout_rate,
                                  name="pos_enc")(
                                      x, deterministic=deterministic)
        x = Decoder(
            d_model=self.d_model,
            dropout_rate=self.dropout_rate,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            activation=self.activation,
            use_adapter=self.use_adapter,
            down_size=self.down_size,
            scalar=self.scalar,
            num_blocks=self.num_blocks,
            num_blocks_share=self.num_blocks_share,
            dtype=self.dtype,
            name="decoders",
        )(x, tgt_mask, memory, memory_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="after_norm")(x)
        hidden = x
        if self.share_embedding:
            logits = embed.attend(x.astype(embed.embedding.dtype))
        else:
            logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                              name="output_layer")(x)
        return logits.astype(jnp.float32), hidden


class BiTransformerDecoder(nn.Module):
    """Left + optional right (reverse) decoder (decoder.py:234-309)."""

    vocab_size: int
    d_model: int
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_heads: int = 4
    linear_units: int = 2048
    activation: Callable = jax.nn.relu
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    num_blocks: int = 6
    r_num_blocks: int = 0
    num_blocks_share: int = 1
    share_embedding: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        def make(num_blocks: int, name: str) -> TransformerDecoder:
            return TransformerDecoder(
                vocab_size=self.vocab_size, d_model=self.d_model,
                dropout_rate=self.dropout_rate,
                positional_dropout_rate=self.positional_dropout_rate,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units, activation=self.activation,
                use_adapter=self.use_adapter, down_size=self.down_size,
                scalar=self.scalar, num_blocks=num_blocks,
                num_blocks_share=self.num_blocks_share,
                share_embedding=self.share_embedding, dtype=self.dtype,
                name=name)

        self.left_decoder = make(self.num_blocks, "left_decoder")
        if self.r_num_blocks > 0:
            self.right_decoder = make(self.r_num_blocks, "right_decoder")

    def __call__(self, memory, memory_mask, ys_in_pad, r_ys_in_pad, tgt_mask,
                 *, deterministic: bool = True):
        """Returns (l_logits, r_logits, l_hidden); r_logits is zeros when
        r_num_blocks == 0 (reference decoder.py:289)."""
        l_x, pre_l_x = self.left_decoder(
            ys_in_pad, tgt_mask, memory, memory_mask,
            deterministic=deterministic)
        if self.r_num_blocks > 0:
            r_x, _ = self.right_decoder(
                r_ys_in_pad, tgt_mask, memory, memory_mask,
                deterministic=deterministic)
        else:
            r_x = jnp.zeros_like(l_x)
        return l_x, r_x, pre_l_x

    def forward_left(self, ys_in, tgt_mask, memory, memory_mask):
        return self.left_decoder(ys_in, tgt_mask, memory, memory_mask,
                                 deterministic=True)

    def forward_right(self, ys_in, tgt_mask, memory, memory_mask):
        return self.right_decoder(ys_in, tgt_mask, memory, memory_mask,
                                  deterministic=True)
