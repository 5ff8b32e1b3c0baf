"""Global CMVN layer: (x - mean) * istd with fixed statistics.

Parity: reference openeat/modules/cmvn.py:18-46 (mean/istd registered as
buffers). Here they are parameters in the regular param tree initialized
from loaded statistics and excluded from optimization by the trainer's
frozen-parameter mask (openeat_tpu.train.optim), which is the functional
JAX analog of a non-trainable buffer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GlobalCMVN(nn.Module):
    dim: int
    norm_var: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = self.param("mean", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        istd = self.param("istd", nn.initializers.ones, (self.dim,),
                          jnp.float32)
        out = x - mean.astype(x.dtype)
        if self.norm_var:
            out = out * istd.astype(x.dtype)
        return out


def cmvn_params(mean: np.ndarray, istd: np.ndarray) -> dict:
    """Param subtree for GlobalCMVN from loaded stats (utils.cmvn)."""
    return {"mean": jnp.asarray(mean, jnp.float32),
            "istd": jnp.asarray(istd, jnp.float32)}
