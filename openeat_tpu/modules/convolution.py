"""Conformer convolution module (flax.linen, NWC layout).

Parity: reference openeat/modules/convolution.py:15-120 — pointwise
conv to 2xC -> GLU -> depthwise conv (causal left-pad `k-1` or symmetric
pad) -> LayerNorm -> activation -> pointwise; padding positions are
zero-filled before and after so pad frames never leak through the
receptive field (convolution.py:88-89,117-118).

TPU design: stays feature-minor (NWC) throughout — no transposes; the
pointwise convs are Dense matmuls on the MXU and the depthwise conv maps
to an XLA depthwise convolution on the VPU.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    activation: Callable = jax.nn.silu
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask_pad: jax.Array | None = None,
                 cache: jax.Array | None = None, *,
                 deterministic: bool = True):
        """x: [B, T, C]; mask_pad: bool [B, 1, T] or [B, T], True = valid.

        Streaming: pass `cache` [B, kernel-1, C] (the previous chunk's
        tail, reference convolution.py:92-104) with causal=True; the
        cache is prepended instead of zero left-padding and the call
        returns (y, new_cache).
        """
        if mask_pad is not None:
            valid = mask_pad.reshape(x.shape[0], -1)[..., None]  # [B,T,1]
            x = jnp.where(valid, x, 0.0)
        x = nn.Dense(2 * self.channels, dtype=self.dtype,
                     name="pointwise_conv1")(x)
        x = nn.glu(x, axis=-1)
        new_cache = None
        if cache is not None:
            assert self.causal, "streaming conv cache requires causal=True"
            lorder = self.kernel_size - 1
            x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            new_cache = x[:, -lorder:, :]
            pad = (0, 0)
        elif self.causal:
            pad = (self.kernel_size - 1, 0)
        else:
            assert (self.kernel_size - 1) % 2 == 0, \
                "non-causal conv needs odd kernel"
            half = (self.kernel_size - 1) // 2
            pad = (half, half)
        x = nn.Conv(self.channels, (self.kernel_size,), padding=(pad,),
                    feature_group_count=self.channels, dtype=self.dtype,
                    name="depthwise_conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = self.activation(x)
        x = nn.Dense(self.channels, dtype=self.dtype,
                     name="pointwise_conv2")(x)
        if mask_pad is not None:
            x = jnp.where(valid, x, 0.0)
        if new_cache is not None:
            return x, new_cache
        return x
