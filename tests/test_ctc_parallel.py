"""Parallel-in-time CTC (ops/ctc_parallel.py) vs the optax oracle.

The associative-scan formulation must agree with optax.ctc_loss (the
repo's default CTC, itself validated against torch.nn.CTCLoss values
and grads in test_ctc_loss.py) on values AND gradients, including
ragged label/logit lengths and repeated labels (the skip-transition
rule), and must slot into CTCHead via impl='parallel'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openeat_tpu.ops.ctc_parallel import ctc_loss_parallel


def _case(rng, b, t, v, l, repeats=False):
    logits = jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32) * 2
    lab = rng.integers(1, v, (b, l))
    if repeats:
        lab[:, 1::2] = lab[:, 0::2][:, : lab[:, 1::2].shape[1]]
    lab_lens = rng.integers(1, l + 1, (b,))
    lab_lens[0] = l
    log_lens = rng.integers(min(2 * l + 2, t), t + 1, (b,))
    lpad = (np.arange(l)[None] >= lab_lens[:, None]).astype(np.float32)
    tpad = (np.arange(t)[None] >= log_lens[:, None]).astype(np.float32)
    labels = jnp.asarray(np.where(lpad > 0, 0, lab), jnp.int32)
    return logits, jnp.asarray(tpad), labels, jnp.asarray(lpad)


@pytest.mark.parametrize("shape,repeats", [
    ((4, 20, 10, 5), False),
    ((3, 18, 8, 7), False),
    ((5, 40, 30, 9), False),
    ((4, 24, 12, 6), True),   # repeated labels: skip rule must disable
])
def test_matches_optax_values_and_grads(rng, shape, repeats):
    logits, tpad, labels, lpad = _case(rng, *shape, repeats=repeats)
    ref = optax.ctc_loss(logits, tpad, labels, lpad, blank_id=0)
    got = ctc_loss_parallel(logits, tpad, labels, lpad, blank_id=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    g_ref = jax.grad(lambda z: jnp.sum(
        optax.ctc_loss(z, tpad, labels, lpad)))(logits)
    g_got = jax.grad(lambda z: jnp.sum(
        ctc_loss_parallel(z, tpad, labels, lpad)))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_ctc_head_parallel_impl_matches_optax(rng):
    from openeat_tpu.modules.ctc import CTCHead

    b, t, d, v, l = 3, 26, 8, 12, 5
    hs = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    hlens = jnp.asarray([26, 20, 15], jnp.int32)
    ys = jnp.asarray(rng.integers(1, v, (b, l)), jnp.int32)
    ys_lens = jnp.asarray([5, 3, 2], jnp.int32)

    head_o = CTCHead(vocab_size=v, impl="optax")
    head_p = CTCHead(vocab_size=v, impl="parallel")
    variables = head_o.init(jax.random.PRNGKey(0), hs, hlens, ys, ys_lens)
    lo = head_o.apply(variables, hs, hlens, ys, ys_lens)
    lp = head_p.apply(variables, hs, hlens, ys, ys_lens)
    np.testing.assert_allclose(float(lp), float(lo), rtol=1e-5, atol=1e-5)
