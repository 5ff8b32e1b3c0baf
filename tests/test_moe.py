"""Mixture-of-experts FFN + expert parallelism (beyond-reference;
SURVEY.md §2.7 lists EP as absent upstream).

Pins: (1) routing/dispatch math against an independent numpy oracle,
(2) capacity-drop semantics (dropped tokens contribute exactly zero, so
the encoder residual passes them through), (3) the Switch aux loss is
sown and collected into the training loss, (4) the sharded (dp x tp)
train step with expert-parallel params matches the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.modules.feed_forward import MoEPositionwiseFeedForward
from openeat_tpu.parallel import mesh as mesh_lib
from openeat_tpu.parallel.train_step import (TrainState, build_train_step,
                                             init_state, shard_and_jit)
from openeat_tpu.utils.optim import build_optimizer

VOCAB, F = 30, 20


def _rng():
    return np.random.default_rng(0)


def _moe(e=4, k=2, cap=4.0, d=8, h=16):
    return MoEPositionwiseFeedForward(
        d_model=d, hidden_units=h, num_experts=e, top_k=k,
        capacity_factor=cap, dropout_rate=0.0, activation=jax.nn.relu)


def _oracle(params, x, e, k, cap_factor):
    """Independent numpy re-implementation of the routed FFN."""
    p = params["params"]
    s, d = x.shape[0] * x.shape[1], x.shape[2]
    xf = np.asarray(x, np.float64).reshape(s, d)
    logits = xf @ np.asarray(p["router"]["kernel"], np.float64) \
        + np.asarray(p["router"]["bias"], np.float64)
    z = np.exp(logits - logits.max(-1, keepdims=True))
    probs = z / z.sum(-1, keepdims=True)
    sel = np.zeros((s, e))
    masked = probs.copy()
    for _ in range(min(k, e)):
        idx = masked.argmax(-1)
        sel[np.arange(s), idx] = 1.0
        masked[np.arange(s), idx] = 0.0
    gates = probs * sel
    gates = gates / np.maximum(gates.sum(-1, keepdims=True), 1e-9)
    cap = max(int(np.ceil(min(k, e) * s / e * cap_factor)), min(k, e))
    pos = np.cumsum(sel, axis=0) - 1.0
    keep = sel * (pos < cap)
    w_in, b_in = np.asarray(p["w_in"]), np.asarray(p["b_in"])
    w_out, b_out = np.asarray(p["w_out"]), np.asarray(p["b_out"])
    y = np.zeros((s, d))
    for ei in range(e):
        h = np.maximum(xf @ w_in[ei] + b_in[ei], 0.0)
        out = h @ w_out[ei] + b_out[ei]
        y += (gates[:, ei] * keep[:, ei])[:, None] * out
    aux = e * float(((sel / min(k, e)).mean(0) * probs.mean(0)).sum())
    return y.reshape(x.shape), aux, keep


def test_moe_matches_oracle_no_drops():
    e, k = 4, 2
    moe = _moe(e=e, k=k, cap=8.0)  # capacity ample: nothing dropped
    x = jnp.asarray(_rng().standard_normal((2, 6, 8)), jnp.float32)
    params = moe.init(jax.random.PRNGKey(3), x)
    y, var = moe.apply(params, x, mutable=["intermediates"])
    y_ref, aux_ref, keep = _oracle(params, x, e, k, 8.0)
    assert keep.sum() == 2 * 6 * k, "test premise: no capacity drops"
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4)
    aux = jax.tree.leaves(var["intermediates"])[0]
    np.testing.assert_allclose(float(np.asarray(aux)), aux_ref, rtol=1e-5)


def test_moe_top1_matches_oracle():
    e, k = 3, 1
    moe = _moe(e=e, k=k, cap=8.0)
    x = jnp.asarray(_rng().standard_normal((1, 9, 8)), jnp.float32)
    params = moe.init(jax.random.PRNGKey(5), x)
    y = moe.apply(params, x)
    y_ref, _, _ = _oracle(params, x, e, k, 8.0)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4)


def test_moe_capacity_drops_are_zero():
    """With a tiny capacity, over-capacity tokens must output exactly 0
    (the encoder residual then passes them through unchanged)."""
    e, k = 2, 1
    moe = _moe(e=e, k=k, cap=0.25)
    x = jnp.asarray(_rng().standard_normal((1, 16, 8)), jnp.float32)
    params = moe.init(jax.random.PRNGKey(1), x)
    y = np.asarray(moe.apply(params, x))
    y_ref, _, keep = _oracle(params, x, e, k, 0.25)
    np.testing.assert_allclose(y, y_ref, atol=1e-4)
    dropped = keep.sum(-1).reshape(-1) == 0
    assert dropped.any(), "test premise: some tokens over capacity"
    np.testing.assert_allclose(y.reshape(-1, 8)[dropped], 0.0, atol=1e-6)


def test_moe_padding_invariance():
    """With pad_mask, valid tokens' outputs and the aux loss are
    invariant to how much padding the batch carries (pads route
    nowhere, hold no capacity, and are excluded from the balance
    statistics); pad outputs are exactly 0."""
    e, k = 4, 2
    moe = _moe(e=e, k=k, cap=8.0)  # ample capacity: no drops either way
    rng = _rng()
    x = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
    params = moe.init(jax.random.PRNGKey(7), x)
    y_ref, var_ref = moe.apply(params, x, mutable=["intermediates"])
    junk = jnp.asarray(10.0 * rng.standard_normal((2, 4, 8)), jnp.float32)
    x_pad = jnp.concatenate([x, junk], axis=1)  # [2, 10, 8]
    pad_mask = (jnp.arange(10) < 6)[None, :].repeat(2, 0)  # [B, T]
    y_pad, var_pad = moe.apply(params, x_pad, pad_mask=pad_mask,
                               mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(y_pad[:, :6]),
                               np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_pad[:, 6:]), 0.0, atol=1e-6)
    aux_ref = float(jax.tree.leaves(var_ref["intermediates"])[0])
    aux_pad = float(jax.tree.leaves(var_pad["intermediates"])[0])
    np.testing.assert_allclose(aux_pad, aux_ref, rtol=1e-5)
    # the [B, 1, T] conv-style mask layout must work too
    y_pad2 = moe.apply(params, x_pad, pad_mask=pad_mask[:, None, :])
    np.testing.assert_allclose(np.asarray(y_pad2), np.asarray(y_pad),
                               atol=1e-6)


def _model(**kw):
    d = dict(input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
             decoder_num_blocks=1, r_decoder_num_blocks=0,
             reverse_weight=0.0, d_model=32, attention_heads=2,
             linear_units=64, input_layer="linear",
             compute_dtype=jnp.float32, moe_experts=4, moe_top_k=2)
    d.update(kw)
    return ASRModel(**d)


def _batch(b=8, t=32, l=6):
    rng = _rng()
    return {
        "features": jnp.asarray(rng.standard_normal((b, t, F)),
                                jnp.float32),
        "features_length": jnp.full((b,), t, jnp.int32),
        "targets": jnp.asarray(rng.integers(1, VOCAB - 1, (b, l)),
                               jnp.int32),
        "targets_length": jnp.full((b,), l, jnp.int32),
    }


def test_moe_train_step_collects_aux_and_learns():
    model = _model()
    batch = _batch()
    tx, _ = build_optimizer(1e-3, 10)
    state = init_state(model, tx, batch)
    step = jax.jit(build_train_step(model, tx))
    rngk = jax.random.PRNGKey(0)
    losses, auxes = [], []
    for _ in range(20):
        rngk, k = jax.random.split(rngk)
        state, m = step(state, batch, k)
        losses.append(float(m["loss"]))
        auxes.append(float(m["moe_aux"]))
    assert losses[-1] < losses[0] * 0.9, losses[::5]
    # Switch aux is >= 1 by Cauchy-Schwarz, ~1 when balanced
    assert all(a >= 0.99 for a in auxes), auxes[:3]
    # expert weights actually received gradient
    p0 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    w_in_leaves = [np.asarray(v) for path, v in p0
                   if "w_in" in "/".join(str(getattr(x, "key", x))
                                         for x in path)]
    assert w_in_leaves and all(np.isfinite(w).all() for w in w_in_leaves)


def test_moe_sharded_ep_matches_unsharded():
    """dp=4 x tp=2: expert banks shard over 'model' (EP); loss and
    updated params match the single-device step."""
    model = _model(dropout_rate=0.0)
    batch = _batch()
    tx, _ = build_optimizer(1e-3, 10)
    state = init_state(model, tx, batch)
    plain = jax.jit(build_train_step(model, tx))
    s1, m1 = plain(state, batch, jax.random.PRNGKey(1))

    mesh = mesh_lib.make_mesh(data=4, model=2)
    pshard = mesh_lib.param_shardings(state.params, mesh)
    # the expert axis (size 4) must actually be sharded, not replicated
    flat = jax.tree_util.tree_flatten_with_path(pshard)[0]
    ep = [s for path, s in flat
          if "w_in" in "/".join(str(getattr(k, "key", k)) for k in path)]
    assert ep and all(s.spec == jax.sharding.PartitionSpec(
        "model", None, None) for s in ep), ep
    state_shardings = TrainState(
        pshard, jax.tree.map(lambda _: mesh_lib.replicated(mesh),
                             state.opt_state), mesh_lib.replicated(mesh))
    bshard = mesh_lib.batch_shardings(batch, mesh)
    step = shard_and_jit(build_train_step(model, tx), mesh,
                         state_shardings, bshard, donate_state=False)
    s2, m2 = step(jax.device_put(state, state_shardings),
                  jax.device_put(batch, bshard), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m1["moe_aux"]), float(m2["moe_aux"]),
                               rtol=2e-4)
    l1, l2 = jax.tree.leaves(s1.params)[0], jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-4)
