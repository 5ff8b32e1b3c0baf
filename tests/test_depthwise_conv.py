"""ops/depthwise_conv: fwd vs numpy oracle; custom VJP vs XLA autodiff.

On the CPU test mesh the op takes its XLA fallback, so these tests pin
the fallback numerics and the hand-written backward; the Pallas path is
checked against the same oracle on the real chip by
benchmarks/dwconv_probe.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openeat_tpu.ops.depthwise_conv import (_xla_dwconv, depthwise_conv1d,
                                            depthwise_conv1d_ref)


@pytest.mark.parametrize("b,t,c,k", [(2, 19, 8, 15), (3, 40, 16, 7),
                                     (1, 15, 4, 15)])
def test_forward_matches_oracle(b, t, c, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, t + k - 1, c)).astype(np.float32)
    w = rng.standard_normal((k, c)).astype(np.float32) * 0.3
    out = np.asarray(depthwise_conv1d(jnp.asarray(x), jnp.asarray(w)))
    ref = depthwise_conv1d_ref(x, w)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    b, t, c, k = 2, 21, 8, 15
    x = jnp.asarray(rng.standard_normal((b, t + k - 1, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c)) * 0.3, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)

    def loss_custom(x, w):
        return jnp.sum(depthwise_conv1d(x, w) * cot)

    def loss_ref(x, w):
        return jnp.sum(_xla_dwconv(x, w) * cot)

    gx, gw = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)
