"""CTC loss kernel tests: scan path vs torch.nn.CTCLoss (values and
gradients), pallas kernel vs scan path in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from openeat_tpu.ops import ctc_loss as mod


def _data(rng, b=3, t=20, v=7, l=5):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.integers(1, v, (b, l)).astype(np.int32)
    input_lens = np.array([t, t - 4, t // 2], np.int32)[:b]
    label_lens = np.array([l, l - 2, l - 1], np.int32)[:b]
    return log_probs, labels, input_lens, label_lens


def _torch_ctc(log_probs, labels, input_lens, label_lens):
    lp = torch.tensor(np.asarray(log_probs)).transpose(0, 1)  # [T,B,V]
    loss = torch.nn.CTCLoss(blank=0, reduction="none",
                            zero_infinity=False)(
        lp.log_softmax(-1) if False else lp,
        torch.tensor(labels.astype(np.int64)),
        torch.tensor(input_lens.astype(np.int64)),
        torch.tensor(label_lens.astype(np.int64)))
    return loss.numpy()


def test_scan_matches_torch_values(rng):
    log_probs, labels, il, ll = _data(rng)
    loss = mod.ctc_loss(log_probs, jnp.asarray(il), jnp.asarray(labels),
                        jnp.asarray(ll), 0, False)
    want = _torch_ctc(log_probs, labels, il, ll)
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-4)


def test_scan_matches_torch_grads(rng):
    """torch's native CTC reports the gradient w.r.t. pre-softmax logits
    (fused softmax backward), so compare d loss / d logits on both
    sides: ours = grad of ctc_loss(log_softmax(logits))."""
    log_probs, labels, il, ll = _data(rng)
    logits = np.asarray(log_probs)  # treat as raw logits

    def f(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return jnp.sum(mod.ctc_loss(lp, jnp.asarray(il),
                                    jnp.asarray(labels), jnp.asarray(ll),
                                    0, False))

    got = np.asarray(jax.grad(f)(jnp.asarray(logits)))

    x_t = torch.tensor(logits, requires_grad=True)
    lp_t = torch.log_softmax(x_t, dim=-1)
    loss = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=False)(
        lp_t.transpose(0, 1),
        torch.tensor(labels.astype(np.int64)),
        torch.tensor(il.astype(np.int64)),
        torch.tensor(ll.astype(np.int64)))
    loss.backward()
    want = x_t.grad.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pallas_interpret_matches_scan(rng):
    log_probs, labels, il, ll = _data(rng, b=2, t=12, v=5, l=3)
    z, s_lens = mod.extended_labels(jnp.asarray(labels), jnp.asarray(ll))
    allow2 = mod._transition_masks(z)
    label_logp = jnp.take_along_axis(
        log_probs, z[:, None, :].repeat(log_probs.shape[1], axis=1),
        axis=2)
    loss_scan, alphas = mod.ctc_forward_scan(
        label_logp, jnp.asarray(il), s_lens, allow2)
    betas = mod.ctc_backward_scan(label_logp, jnp.asarray(il), s_lens,
                                  allow2)
    gamma_scan = np.asarray(alphas + betas + loss_scan[:, None, None])
    loss_pl, gamma_pl = mod._ctc_pallas(
        label_logp, jnp.asarray(il), s_lens, allow2, interpret=True)
    np.testing.assert_allclose(np.asarray(loss_pl), np.asarray(loss_scan),
                               rtol=1e-5)
    # compare only valid (t < len, finite) region
    for b in range(2):
        g_s = gamma_scan[b, : il[b]]
        g_p = np.asarray(gamma_pl)[b, : il[b]]
        m = g_s > -1e29
        np.testing.assert_allclose(g_p[m], g_s[m], rtol=1e-4, atol=1e-4)


def test_grad_is_valid_probability_flow(rng):
    """Column sums of -grad (posterior mass) must be 1 per valid frame."""
    log_probs, labels, il, ll = _data(rng)

    def f(lp):
        return jnp.sum(mod.ctc_loss(lp, jnp.asarray(il),
                                    jnp.asarray(labels),
                                    jnp.asarray(ll), 0, False))

    g = np.asarray(jax.grad(f)(log_probs))
    for b in range(g.shape[0]):
        sums = -g[b, : il[b]].sum(axis=-1)
        np.testing.assert_allclose(sums, 1.0, rtol=1e-4)
        assert np.all(g[b, il[b]:] == 0)


def test_pallas_dispatch_selection():
    """Shape-based kernel selection: B-tiled batched kernel whenever an
    8-row tile's DP buffers fit VMEM (any batch size — the grid tiles
    over B), per-utterance grid kernel for very long T, scan fallback
    (None) only for long-T AND giant-batch problems."""
    # tiny -> batched, with the largest tile that fits
    assert mod.dispatch_variant(8, 20, 9) == "batched"
    assert mod._select_tile_b(20, 128) == mod._BATCHED_MAX_TILE
    # big-batch training shape (B=256 x T'=78 x S=49) -> batched too
    # (the r2 rule sent this to the slow grid variant; measured 21.9 ms
    # vs 6.0 ms optax forward)
    assert mod.dispatch_variant(256, 78, 49) == "batched"
    assert mod._select_tile_b(78, 128) == 64
    # T too long for even an 8-row tile -> grid for moderate batches
    big_t = mod._BATCHED_VMEM_BUDGET // (4 * 8 * 128 * 4) + 8
    assert mod._select_tile_b(big_t, 128) is None
    assert mod.dispatch_variant(64, big_t, 128) == "grid"
    # ... and scan fallback for giant batches at that length
    assert mod.dispatch_variant(mod._GRID_KERNEL_MAX_BATCH + 8, big_t,
                                128) is None


def test_pallas_batched_tiled_matches_scan(rng, monkeypatch):
    """The B-tiled batched kernel (several grid cells, padded final
    tile) must match the scan oracle. A shrunken VMEM budget forces
    tile_b=8 so b=20 spans 3 cells with 4 padded rows."""
    monkeypatch.setattr(mod, "_BATCHED_VMEM_BUDGET", 4 * 12 * 8 * 128 * 4)
    b, t, v, l = 20, 12, 5, 3
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.integers(1, v, (b, l)).astype(np.int32)
    il = rng.integers(t // 2, t + 1, (b,)).astype(np.int32)
    ll = rng.integers(1, l + 1, (b,)).astype(np.int32)
    z, s_lens = mod.extended_labels(jnp.asarray(labels), jnp.asarray(ll))
    allow2 = mod._transition_masks(z)
    label_logp = jnp.take_along_axis(
        log_probs, z[:, None, :].repeat(log_probs.shape[1], axis=1),
        axis=2)
    assert mod._select_tile_b(12, 128) == 8
    loss_scan, alphas = mod.ctc_forward_scan(
        label_logp, jnp.asarray(il), s_lens, allow2)
    betas = mod.ctc_backward_scan(label_logp, jnp.asarray(il), s_lens,
                                  allow2)
    gamma_scan = np.asarray(alphas + betas + loss_scan[:, None, None])
    loss_pl, gamma_pl = mod._ctc_pallas_batched(
        label_logp, jnp.asarray(il), s_lens, allow2, interpret=True)
    np.testing.assert_allclose(np.asarray(loss_pl), np.asarray(loss_scan),
                               rtol=1e-5)
    for b in range(20):
        g_s = gamma_scan[b, : il[b]]
        g_p = np.asarray(gamma_pl)[b, : il[b]]
        m = g_s > -1e29
        np.testing.assert_allclose(g_p[m], g_s[m], rtol=1e-4, atol=1e-4)
