"""Pipeline-parallelism equivalence tests (parallel/pipeline.py).

The reference has no PP (SURVEY.md §2.7); these tests pin the GPipe
schedule against the plain sequential encoder on an 8-virtual-CPU-device
('data', 'pipe') mesh: identical loss, identical gradients, and a full
train step through build_train_step(loss_fn=make_pp_loss_fn(...)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.parallel import mesh as mesh_lib
from openeat_tpu.parallel.pipeline import make_pp_loss_fn
from openeat_tpu.parallel.train_step import (TrainState, build_train_step,
                                             init_state, make_loss_fn)
from openeat_tpu.utils.optim import build_optimizer

VOCAB = 64


def _model(**over):
    kw = dict(vocab_size=VOCAB, input_size=16, compute_dtype=jnp.float32,
              encoder_num_blocks=4, decoder_num_blocks=1,
              r_decoder_num_blocks=1, reverse_weight=0.3, d_model=16,
              attention_heads=2, linear_units=32, cnn_module_kernel=7,
              dropout_rate=0.0, ctc_weight=0.3)
    kw.update(over)
    return ASRModel(**kw)


def _batch(b=8, t=64, l=6, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "features": jnp.asarray(rng.standard_normal((b, t, 16)),
                                jnp.float32),
        "features_length": jnp.asarray(
            np.linspace(t // 2, t, b).astype(np.int32)),
        "targets": jnp.asarray(rng.integers(1, VOCAB - 1, (b, l)),
                               jnp.int32),
        "targets_length": jnp.full((b,), l, jnp.int32),
    }


def _pipe_mesh(data=2, pipe=4):
    devs = np.array(jax.devices()[:data * pipe]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def _init(model, batch):
    return jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["features"], batch["features_length"],
        batch["targets"], batch["targets_length"])


def test_pp_loss_and_grads_match_sequential():
    """GPipe over 4 stages x 2-way dp == sequential, loss AND grads.

    dropout_rate=0 makes deterministic=False a no-op so the pipelined
    and sequential paths are numerically comparable.
    """
    mesh = _pipe_mesh()
    model = _model()
    batch = _batch()
    params = _init(model, batch)
    key = jax.random.PRNGKey(1)
    seq_loss = make_loss_fn(model)
    pp_loss = make_pp_loss_fn(model, mesh, num_micro=4)

    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: seq_loss(p, batch, key)[0]))(params)
    with jax.sharding.set_mesh(mesh):
        l2, g2 = jax.jit(jax.value_and_grad(
            lambda p: pp_loss(p, batch, key)[0]))(params)

    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    def check(path, a, b):
        # mixed tolerance: softmax-invariant leaves (linear_k bias) have
        # true grads at fp32 noise level (~1e-9)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=str(path))
    jax.tree_util.tree_map_with_path(check, g1, g2)


def test_pp_weight_shared_stack():
    """num_blocks_share=2: 2 physical layers applied 2x each, pipelined
    as 4 stage applications — autodiff must sum duplicate grads."""
    mesh = _pipe_mesh()
    model = _model(encoder_num_blocks=4, encoder_num_blocks_share=2)
    batch = _batch(seed=3)
    params = _init(model, batch)
    key = jax.random.PRNGKey(2)
    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: make_loss_fn(model)(p, batch, key)[0]))(params)
    with jax.sharding.set_mesh(mesh):
        l2, g2 = jax.jit(jax.value_and_grad(
            lambda p: make_pp_loss_fn(model, mesh, num_micro=2)(
                p, batch, key)[0]))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    shared = g1["params"]["encoder"]["encoders"]["layer_1"]["norm_mha"][
        "scale"]
    shared_pp = g2["params"]["encoder"]["encoders"]["layer_1"]["norm_mha"][
        "scale"]
    np.testing.assert_allclose(np.asarray(shared), np.asarray(shared_pp),
                               rtol=1e-4, atol=1e-6)


def test_pp_train_step_runs_and_matches():
    """One optimizer step with the pipelined loss == one sequential step."""
    mesh = _pipe_mesh()
    model = _model()
    batch = _batch(seed=5)
    tx, _ = build_optimizer(1e-3, 100)
    state = init_state(model, tx, batch)
    key = jax.random.PRNGKey(7)

    seq_step = jax.jit(build_train_step(model, tx))
    s1, m1 = seq_step(state, batch, key)

    state2 = init_state(model, tx, batch)
    pp_step = build_train_step(
        model, tx, loss_fn=make_pp_loss_fn(model, mesh, num_micro=4))
    bshard = mesh_lib.batch_shardings(batch, mesh)
    pshard = jax.tree.map(lambda _: mesh_lib.replicated(mesh),
                          state2.params)
    shardings = TrainState(
        pshard,
        jax.tree.map(lambda _: mesh_lib.replicated(mesh), state2.opt_state),
        mesh_lib.replicated(mesh))
    state2 = jax.device_put(state2, shardings)
    sharded_batch = jax.device_put(batch, bshard)
    with jax.sharding.set_mesh(mesh):
        s2, m2 = jax.jit(pp_step)(state2, sharded_batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    assert int(s2.step) == 1
    # per-leaf grad equivalence is pinned by the tests above; post-Adam
    # params CAN'T be compared leaf-wise (softmax-invariant leaves have
    # true grads at fp32 noise, which Adam normalizes into arbitrary
    # lr-scale updates). The global grad norm is dominated by the real
    # gradients and is insensitive to those noise leaves.
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(s2.params))


def test_pp_tail_on_last_stage_matches_sequential():
    """tail_on_last_stage=True (loss head computed inside the shard_map
    on the last 'pipe' rank, only a metrics vector crossing the mesh)
    must reproduce the sequential loss AND grads exactly like the
    broadcast path does (dropout_rate=0)."""
    mesh = _pipe_mesh()
    model = _model()
    batch = _batch(seed=9)
    params = _init(model, batch)
    key = jax.random.PRNGKey(3)
    seq_loss = make_loss_fn(model)
    pp_loss = make_pp_loss_fn(model, mesh, num_micro=4,
                              tail_on_last_stage=True)

    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: seq_loss(p, batch, key)[0]))(params)
    with jax.sharding.set_mesh(mesh):
        (l2, metrics), g2 = jax.jit(jax.value_and_grad(
            lambda p: pp_loss(p, batch, key), has_aux=True))(params)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # the loss decomposition must survive the vector round trip
    _, m1 = seq_loss(params, batch, key)
    np.testing.assert_allclose(float(m1["loss_ctc"]),
                               float(metrics["loss_ctc"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["loss_att"]),
                               float(metrics["loss_att"]), rtol=1e-4)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=str(path))
    jax.tree_util.tree_map_with_path(check, g1, g2)
