"""Transformer decoder stacks (flax.linen).

Parity: reference openeat/modules/decoder.py — `Decoder` (:16-108, bare
stack for composition), `TransformerDecoder` (:110-232: token embed +
abs-pos-enc -> N DecoderLayers -> LayerNorm(eps 1e-12) -> output linear,
optional tied embedding, returns (logits, pre_softmax_hidden)), and
`BiTransformerDecoder` (:234-309: left-to-right + optional right-to-left
decoder over reversed targets).

Incremental decoding (reference forward_one_step, decoder.py:196-232)
is TPU-native: `init_cache` precomputes cross-attention K/V and
allocates static self-attention caches; `forward_step` scores ONE
position with dynamic_update_slice cache writes — all static shapes, so
the surrounding beam-search while_loop compiles to one program.
"""

from __future__ import annotations

from typing import Callable

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

    def setup(self):
        self.layers = [
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

    def _applications(self):
        """Layer objects in application order (weight sharing repeats)."""
        return [layer for layer in self.layers
                for _ in range(self.num_blocks_share)]

    def __call__(self, tgt, tgt_mask, memory, memory_mask, *,
                 deterministic: bool = True):
        x = tgt
        for layer in self._applications():
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

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model,
                              dtype=self.dtype, name="embed")
        self.pos_enc = PositionalEncoding(
            self.d_model, self.positional_dropout_rate, name="pos_enc")
        self.decoders = Decoder(
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
            name="decoders")
        self.after_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name="after_norm")
        if not self.share_embedding:
            self.output_layer = nn.Dense(self.vocab_size, dtype=self.dtype,
                                         name="output_layer")

    def _head(self, x):
        if self.share_embedding:
            return self.embed.attend(x.astype(self.embed.embedding.dtype))
        return self.output_layer(x)

    def __call__(self, tgt, tgt_mask, memory, memory_mask, *,
                 deterministic: bool = True):
        """tgt: [B,L] int tokens. Returns (logits [B,L,V], hidden [B,L,D])."""
        x = self.embed(tgt)
        x, _ = self.pos_enc(x, deterministic=deterministic)
        x = self.decoders(x, tgt_mask, memory, memory_mask,
                          deterministic=deterministic)
        x = self.after_norm(x)
        return self._head(x).astype(jnp.float32), x

    # ---- incremental decode ----

    def init_cache(self, memory: jax.Array, batch: int, max_len: int
                   ) -> dict:
        """Static-shape decode cache for `batch` rows x `max_len` steps."""
        apps = self.decoders._applications()
        h, dk = self.attention_heads, self.d_model // self.attention_heads
        cache = {
            "cross": tuple(layer.init_cross_cache(memory)
                           for layer in apps),
            "self_k": tuple(
                jnp.zeros((batch, max_len, h, dk), self.dtype)
                for _ in apps),
            "self_v": tuple(
                jnp.zeros((batch, max_len, h, dk), self.dtype)
                for _ in apps),
        }
        return cache

    def forward_step(self, tokens: jax.Array, pos: jax.Array, cache: dict,
                     memory_mask: jax.Array) -> tuple[jax.Array, dict]:
        """Score one position. tokens: [B] token ids at `pos` (scalar);
        returns (log-probs [B, V] f32, updated cache)."""
        b = tokens.shape[0]
        x = self.embed(tokens[:, None])  # [B,1,D]
        # absolute PE at dynamic offset: compute row `pos` directly
        d = self.d_model
        i = jnp.arange(d // 2, dtype=jnp.float32)
        div = jnp.exp(-i * (2.0 / d) * jnp.log(10000.0))
        ang = pos.astype(jnp.float32) * div
        pe_row = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(d)
        x = x * jnp.asarray(d ** 0.5, x.dtype) + pe_row.astype(x.dtype)
        apps = self.decoders._applications()
        new_k, new_v = [], []
        for idx, layer in enumerate(apps):
            x, sk, sv = layer.step(x, pos, cache["self_k"][idx],
                                   cache["self_v"][idx],
                                   cache["cross"][idx], memory_mask)
            new_k.append(sk)
            new_v.append(sv)
        x = self.after_norm(x)
        logits = self._head(x)[:, 0].astype(jnp.float32)
        new_cache = {"cross": cache["cross"], "self_k": tuple(new_k),
                     "self_v": tuple(new_v)}
        return jax.nn.log_softmax(logits, axis=-1), new_cache


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

    def init_cache(self, memory, batch, max_len):
        return self.left_decoder.init_cache(memory, batch, max_len)

    def forward_step(self, tokens, pos, cache, memory_mask):
        return self.left_decoder.forward_step(tokens, pos, cache,
                                              memory_mask)
