"""Conformer/Transformer encoder block (flax.linen).

Parity: reference openeat/modules/encoder_layer.py:15-112 — pre-norm
ordering: ½-scaled macaron FFN (ff_scale=0.5 iff macaron) -> MHA ->
convolution module -> FFN (+ parallel adapter) -> final LayerNorm iff a
conv module is present. LayerNorm eps 1e-12 to match.

The reference's parallel adapter internally re-adds its own input and the
layer adds that whole sum again (encoder_layer.py:97-108), double-counting
the residual stream; per SURVEY.md §7 we build the intended behavior:
the adapter contributes only its scaled bottleneck update.

`forward_chunk` is the streaming step (attention over K/V history +
conv cache — the reference's decode caches, convolution.py:92-104),
numerically identical to the full forward under a chunked mask.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.attention import (MultiHeadedAttention,
                                           RelPositionMultiHeadedAttention)
from openeat_tpu.modules.convolution import ConvolutionModule
from openeat_tpu.modules.dropout import Dropout
from openeat_tpu.modules.feed_forward import (Adapter,
                                              MoEPositionwiseFeedForward,
                                              PositionwiseFeedForward)


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
    # mixture-of-experts main FFN (beyond-reference; macaron half-FFN
    # stays dense). 0 = dense. See feed_forward.MoEPositionwiseFeedForward.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name=name)
        ffn = lambda name: PositionwiseFeedForward(
            self.d_model, self.linear_units, self.dropout_rate,
            self.activation, dtype=self.dtype, name=name)
        self.ff_scale = 0.5 if self.macaron_style else 1.0
        if self.macaron_style:
            self.norm_ff_macaron = ln("norm_ff_macaron")
            self.feed_forward_macaron = ffn("feed_forward_macaron")
        self.norm_mha = ln("norm_mha")
        attn_cls = (RelPositionMultiHeadedAttention if self.use_cnn_module
                    else MultiHeadedAttention)
        self.self_attn = attn_cls(
            self.attention_heads, self.d_model,
            self.attention_dropout_rate, dtype=self.dtype,
            name="self_attn")
        if self.use_cnn_module:
            self.norm_conv = ln("norm_conv")
            self.conv_module = ConvolutionModule(
                self.d_model, self.cnn_module_kernel, self.activation,
                self.causal, dtype=self.dtype, name="conv_module")
            self.norm_final = ln("norm_final")
        if self.use_adapter:
            self.adapter = Adapter(
                self.d_model, self.dropout_rate, self.down_size,
                self.scalar, residual=False, dtype=self.dtype,
                name="adapter")
        self.norm_ff = ln("norm_ff")
        if self.moe_experts:
            self.feed_forward = MoEPositionwiseFeedForward(
                self.d_model, self.linear_units, self.moe_experts,
                self.moe_top_k, self.moe_capacity_factor,
                self.dropout_rate, self.activation, dtype=self.dtype,
                name="feed_forward")
        else:
            self.feed_forward = ffn("feed_forward")
        self.drop = Dropout(self.dropout_rate)

    def __call__(self, x: jax.Array, mask: jax.Array, pos_emb: jax.Array,
                 mask_pad: jax.Array | None = None, *,
                 deterministic: bool = True) -> jax.Array:
        """x: [B,T,D]; mask: bool [B,1,T] or [B,T,T] attention mask
        (True=attend); mask_pad: bool [B,1,T] padding mask for the conv
        module (defaults to `mask` when it is [B,1,T]); pos_emb: [1,T,D].
        """
        if mask_pad is None and (self.use_cnn_module or self.moe_experts):
            assert mask.shape[1] == 1, \
                "a [B,T,T] attention mask needs an explicit [B,1,T] " \
                "mask_pad for the convolution/MoE modules"
            mask_pad = mask
        drop = lambda h: self.drop(h, deterministic=deterministic)

        if self.macaron_style:
            h = self.feed_forward_macaron(self.norm_ff_macaron(x),
                                          deterministic=deterministic)
            x = x + self.ff_scale * drop(h)

        h = self.norm_mha(x)
        h = self.self_attn(h, h, h, mask, pos_emb,
                           deterministic=deterministic)
        x = x + drop(h)

        if self.use_cnn_module:
            h = self.conv_module(self.norm_conv(x), mask_pad,
                                 deterministic=deterministic)
            x = x + drop(h)

        adapter_update = 0.0
        if self.use_adapter:
            adapter_update = self.adapter(x, deterministic=deterministic)

        if self.moe_experts:
            # router must not see pad positions (capacity + aux loss)
            h = self.feed_forward(self.norm_ff(x), pad_mask=mask_pad,
                                  deterministic=deterministic)
        else:
            h = self.feed_forward(self.norm_ff(x),
                                  deterministic=deterministic)
        x = x + self.ff_scale * drop(h) + adapter_update

        if self.use_cnn_module:
            x = self.norm_final(x)
        return x

    def forward_chunk(self, x: jax.Array, k_cache: jax.Array,
                      v_cache: jax.Array, kv_mask: jax.Array,
                      cnn_cache: jax.Array, pos_emb: jax.Array):
        """Streaming step. x: [B, Tc, D]; k/v_cache: [B, Lc, H, Dk]
        right-aligned attention history; kv_mask: [B, 1, Lc+Tc];
        cnn_cache: [B, kernel-1, D]; pos_emb: [1, Lc+Tc, D].
        Returns (y, k_new, v_new, new_cnn_cache)."""
        assert self.use_cnn_module, "streaming targets conformer blocks"
        if self.macaron_style:
            h = self.feed_forward_macaron(self.norm_ff_macaron(x),
                                          deterministic=True)
            x = x + self.ff_scale * h

        h, k_new, v_new = self.self_attn.forward_chunk(
            self.norm_mha(x), k_cache, v_cache, kv_mask, pos_emb)
        x = x + h

        h, new_cnn = self.conv_module(self.norm_conv(x), None, cnn_cache,
                                      deterministic=True)
        x = x + h

        adapter_update = 0.0
        if self.use_adapter:
            adapter_update = self.adapter(x, deterministic=True)
        # streamed chunks are fully valid except the final flush (whose
        # tail is discarded via enc length), so the MoE router sees no
        # pad_mask here — see feed_forward.MoEPositionwiseFeedForward's
        # streaming note
        h = self.feed_forward(self.norm_ff(x), deterministic=True)
        x = x + self.ff_scale * h + adapter_update
        return self.norm_final(x), k_new, v_new, new_cnn
