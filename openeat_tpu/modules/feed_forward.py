"""Position-wise feed-forward and adapter blocks (flax.linen).

Parity: reference openeat/modules/positionwise_feed_forward.py:11-43
(linear -> act -> dropout -> linear) and openeat/modules/adapter.py:12-35
(LN -> down(64) -> ReLU -> dropout -> up, residual scaled by a fixed or
learnable scalar; learnable iff configured scalar == -1).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class PositionwiseFeedForward(nn.Module):
    d_model: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = jax.nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        h = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="w_2")(h)


class Adapter(nn.Module):
    """Parameter-efficient fine-tuning bottleneck (adapter.py:12-35).

    Returns x + scale * up(drop(relu(down(LN(x))))); the dropout is
    applied both inside the bottleneck and on its output, matching the
    reference's double-dropout.
    """

    d_model: int
    dropout_rate: float = 0.1
    down_size: int = 64
    scalar: float = 0.1
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        residual = x
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(self.down_size, dtype=self.dtype, name="down_proj")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="up_proj")(h)
        if self.scalar == -1:
            scale = self.param("scale", nn.initializers.ones, (1,),
                               jnp.float32).astype(h.dtype)
        else:
            scale = jnp.asarray(self.scalar, h.dtype)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        update = scale * h
        return residual + update if self.residual else update
