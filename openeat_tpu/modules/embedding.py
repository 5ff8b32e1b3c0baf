"""Positional encodings (flax.linen).

Parity: reference openeat/modules/embedding.py:14-88 — sinusoidal absolute
encoding (`x*sqrt(d) + pe`, returning `(x, pos_emb)`) and the relative
variant that scales x and returns the pe table separately, plus a no-op
variant. The table is computed on the fly inside jit (cheap, fused by XLA)
instead of stored as a 5000-long buffer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.dropout import Dropout


def sinusoid_table(length: int, d_model: int, dtype=jnp.float32,
                   offset=0) -> jax.Array:
    """[length, d_model] sinusoidal table; position k row = pe(offset+k).
    `offset` may be a traced scalar (streaming chunks)."""
    pos = (jax.lax.broadcasted_iota(jnp.float32, (length, 1), 0)
           + jnp.asarray(offset, jnp.float32))
    i = jax.lax.broadcasted_iota(jnp.float32, (1, d_model // 2), 1)
    div = jnp.exp(-i * (2.0 / d_model) * jnp.log(10000.0))
    ang = pos * div  # [length, d/2]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # interleave
    return pe.reshape(length, d_model).astype(dtype)


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal PE: returns (x*sqrt(d)+pe, pos_emb).

    Parity: reference embedding.py:44-60.
    """

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, offset: int = 0,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        t = x.shape[1]
        pe = sinusoid_table(t, self.d_model, x.dtype, offset)[None]
        x = x * jnp.asarray(self.d_model ** 0.5, x.dtype) + pe
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, pe


class RelPositionalEncoding(nn.Module):
    """Relative PE: scales x, returns pe separately (embedding.py:75-88)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, offset: int = 0,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        t = x.shape[1]
        pe = sinusoid_table(t, self.d_model, x.dtype, offset)[None]
        x = x * jnp.asarray(self.d_model ** 0.5, x.dtype)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, pe


class NoPositionalEncoding(nn.Module):
    """Identity PE (zero pos_emb); fills the reference's missing
    NoPositionalEncoding import (encoder.py:166 bug — intended behavior)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, offset: int = 0,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        pe = jnp.zeros((1, x.shape[1], self.d_model), x.dtype)
        x = Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, pe
