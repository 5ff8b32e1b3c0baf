"""Conformer/Transformer encoder block (flax.linen).

Parity: reference openeat/modules/encoder_layer.py:15-112 — pre-norm
ordering: ½-scaled macaron FFN (ff_scale=0.5 iff macaron) -> MHA ->
convolution module -> FFN (+ parallel adapter) -> final LayerNorm iff a
conv module is present. LayerNorm eps 1e-12 to match.

The reference's parallel adapter internally re-adds its own input and the
layer adds that whole sum again (encoder_layer.py:97-108), double-counting
the residual stream; per SURVEY.md §7 we build the intended behavior:
the adapter contributes only its scaled bottleneck update.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.attention import (MultiHeadedAttention,
                                           RelPositionMultiHeadedAttention)
from openeat_tpu.modules.convolution import ConvolutionModule
from openeat_tpu.modules.feed_forward import Adapter, PositionwiseFeedForward


class EncoderLayer(nn.Module):
    d_model: int
    attention_heads: int = 4
    linear_units: int = 2048
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    activation: Callable = jax.nn.silu
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    use_adapter: bool = False
    down_size: int = 64
    scalar: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, pos_emb: jax.Array,
                 mask_pad: jax.Array | None = None, *,
                 deterministic: bool = True) -> jax.Array:
        """x: [B,T,D]; mask: bool [B,1,T] or [B,T,T] attention mask
        (True=attend); mask_pad: bool [B,1,T] padding mask for the conv
        module (defaults to `mask` when it is [B,1,T]); pos_emb: [1,T,D].
        """
        if mask_pad is None and self.use_cnn_module:
            assert mask.shape[1] == 1, \
                "a [B,T,T] attention mask needs an explicit [B,1,T] " \
                "mask_pad for the convolution module"
            mask_pad = mask
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name=name)
        drop = nn.Dropout(self.dropout_rate)
        ffn = lambda name: PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            self.activation, dtype=self.dtype, name=name)

        ff_scale = 0.5 if self.macaron_style else 1.0
        if self.macaron_style:
            h = ffn("feed_forward_macaron")(
                ln("norm_ff_macaron")(x), deterministic=deterministic)
            x = x + ff_scale * drop(h, deterministic=deterministic)

        attn_cls = (RelPositionMultiHeadedAttention if self.use_cnn_module
                    else MultiHeadedAttention)
        attn = attn_cls(self.attention_heads, self.d_model,
                        self.attention_dropout_rate, dtype=self.dtype,
                        name="self_attn")
        h = ln("norm_mha")(x)
        h = attn(h, h, h, mask, pos_emb, deterministic=deterministic)
        x = x + drop(h, deterministic=deterministic)

        if self.use_cnn_module:
            h = ConvolutionModule(
                self.d_model, self.cnn_module_kernel, self.activation,
                self.causal, dtype=self.dtype, name="conv_module")(
                    ln("norm_conv")(x), mask_pad,
                    deterministic=deterministic)
            x = x + drop(h, deterministic=deterministic)

        adapter_update = 0.0
        if self.use_adapter:
            adapter_update = Adapter(
                self.d_model, self.dropout_rate, self.down_size,
                self.scalar, residual=False, dtype=self.dtype,
                name="adapter")(x, deterministic=deterministic)

        h = ffn("feed_forward")(ln("norm_ff")(x), deterministic=deterministic)
        x = x + ff_scale * drop(h, deterministic=deterministic) + adapter_update

        if self.use_cnn_module:
            x = ln("norm_final")(x)
        return x
