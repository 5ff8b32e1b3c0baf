"""Input subsampling stacks (flax.linen).

Parity: reference openeat/modules/subsampling.py — LinearNoSubsampling
(:23-62), Conv2dSubsampling4 (:65-116), Conv2dSubsampling6 (:119-165),
Conv2dSubsampling8 (:168-218). Each returns (x, pos_emb, new_lengths) and
reports `subsampling_rate` / `right_context`.

TPU notes: convs run in NHWC (feature-minor) layout, which XLA maps onto
the MXU without transposes; the length arithmetic mirrors the reference's
mask slicing `[:, :-2:2]` exactly so post-subsampling lengths agree with
the torch implementation frame-for-frame.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from openeat_tpu.modules.dropout import Dropout


def conv_out_len(lengths: jax.Array, kernel: int, stride: int) -> jax.Array:
    """Valid-conv output length: floor((L - kernel) / stride) + 1."""
    return (lengths - kernel) // stride + 1


class LinearNoSubsampling(nn.Module):
    """Linear projection + LayerNorm + PE; rate 1 (subsampling.py:23-62)."""

    d_model: int
    pos_enc: Any  # a positional-encoding module instance factory
    dropout_rate: float = 0.1
    subsampling_rate: int = 1
    right_context: int = 0

    @nn.compact
    def __call__(self, x, lengths, *, offset: int = 0, deterministic=True):
        x = nn.Dense(self.d_model, dtype=x.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype)(x)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x, pos_emb = self.pos_enc(x, offset=offset, deterministic=deterministic)
        return x, pos_emb, lengths


class Conv2dSubsampling4(nn.Module):
    """Two 3x3 stride-2 convs + linear; rate 4 (subsampling.py:65-116)."""

    d_model: int
    pos_enc: Any
    subsampling_rate: int = 4
    right_context: int = 6

    @nn.compact
    def __call__(self, x, lengths, *, offset: int = 0, deterministic=True):
        # x: [B, T, F] -> NHWC [B, T, F, 1]
        h = x[..., None]
        h = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=x.dtype)(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=x.dtype)(h)
        h = jax.nn.relu(h)
        b, t, f, c = h.shape
        h = h.reshape(b, t, f * c)
        h = nn.Dense(self.d_model, dtype=x.dtype)(h)
        h, pos_emb = self.pos_enc(h, offset=offset, deterministic=deterministic)
        new_len = conv_out_len(conv_out_len(lengths, 3, 2), 3, 2)
        return h, pos_emb, new_len


class Conv2dSubsampling6(nn.Module):
    """3x3 s2 then 5x5 s3 convs; rate 6 (subsampling.py:119-165)."""

    d_model: int
    pos_enc: Any
    subsampling_rate: int = 6
    right_context: int = 10

    @nn.compact
    def __call__(self, x, lengths, *, offset: int = 0, deterministic=True):
        h = x[..., None]
        h = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=x.dtype)(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.d_model, (5, 5), strides=(3, 3), padding="VALID",
                    dtype=x.dtype)(h)
        h = jax.nn.relu(h)
        b, t, f, c = h.shape
        h = h.reshape(b, t, f * c)
        h = nn.Dense(self.d_model, dtype=x.dtype)(h)
        h, pos_emb = self.pos_enc(h, offset=offset, deterministic=deterministic)
        new_len = conv_out_len(conv_out_len(lengths, 3, 2), 5, 3)
        return h, pos_emb, new_len


class Conv2dSubsampling8(nn.Module):
    """Three 3x3 stride-2 convs; rate 8 (subsampling.py:168-218)."""

    d_model: int
    pos_enc: Any
    subsampling_rate: int = 8
    right_context: int = 14

    @nn.compact
    def __call__(self, x, lengths, *, offset: int = 0, deterministic=True):
        h = x[..., None]
        for _ in range(3):
            h = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=x.dtype)(h)
            h = jax.nn.relu(h)
        b, t, f, c = h.shape
        h = h.reshape(b, t, f * c)
        h = nn.Dense(self.d_model, dtype=x.dtype)(h)
        h, pos_emb = self.pos_enc(h, offset=offset, deterministic=deterministic)
        new_len = lengths
        for _ in range(3):
            new_len = conv_out_len(new_len, 3, 2)
        return h, pos_emb, new_len


SUBSAMPLE_CLASSES = {
    "linear": LinearNoSubsampling,
    "conv2d": Conv2dSubsampling4,
    "conv2d6": Conv2dSubsampling6,
    "conv2d8": Conv2dSubsampling8,
}
