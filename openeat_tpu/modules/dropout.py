"""Dropout with integer-bit masks (TPU bandwidth optimization).

Drop-in for `flax.linen.Dropout` at this repo's call sites (rate at
construction, `deterministic` at call). `nn.Dropout` draws a float32
uniform per element (4 bytes of RNG traffic + an f32 compare); across
the flagship Conformer's ~60 dropout applications that mask generation
measured 9.6 ms/step — 12% of the whole train step (grad vs grad_nodrop,
benchmarks/results/r4_step_diag/step_ablation2.log). Here the mask is a
single random BYTE per element (`jax.random.bits`, 4x less RNG traffic,
integer compare), with the keep probability quantized to q/256.

Deviation from exact parity (reference uses torch.nn.Dropout, e.g.
openeat/modules/encoder_layer.py): the realized keep probability is
round((1-rate)*256)/256 — e.g. rate 0.1 keeps 230/256 = 0.8984 instead
of 0.9. The inverse-scale uses the SAME quantized probability, so
activations stay exactly unbiased; the regularization strength shifts
by <0.2% absolute, far below seed-to-seed variance.
"""

from __future__ import annotations

import logging

import flax.linen as nn
import jax
import jax.numpy as jnp

_warned_rates: set[float] = set()


def _warn_quantization(rate: float, q: int) -> None:
    """Log once per process when q/256 deviates visibly from 1-rate.

    Unusual rates (e.g. a 0.001 sweep point) round to an exact no-op
    (q=256) or shift by >1% — surface that instead of silently
    changing the effective regularization (ADVICE r4).
    """
    realized = min(q, 256) / 256.0
    if abs(realized - (1.0 - rate)) > 0.004 and rate not in _warned_rates:
        _warned_rates.add(rate)
        logging.getLogger("openeat").warning(
            "byte-mask dropout quantizes rate %.4g to keep %d/256=%.4f "
            "(requested keep %.4f)%s", rate, q, realized, 1.0 - rate,
            " — an exact no-op" if q >= 256 else "")


class Dropout(nn.Module):
    """Byte-mask dropout; `rngs={'dropout': key}` like nn.Dropout."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        q = int(round((1.0 - float(self.rate)) * 256.0))
        _warn_quantization(float(self.rate), q)
        if q >= 256:
            return x
        if q <= 0:
            return jnp.zeros_like(x)
        key = self.make_rng("dropout")
        keep = jax.random.bits(key, x.shape, jnp.uint8) < jnp.uint8(q)
        scale = jnp.asarray(256.0 / q, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
