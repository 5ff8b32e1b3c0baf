"""Training runtime tests: scheduler, optimizer freezing, sharded train
step over an 8-device mesh (dp x tp), grad accumulation, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openeat_tpu.models.asr_model import ASRModel
from openeat_tpu.parallel import mesh as mesh_lib
from openeat_tpu.parallel.train_step import (TrainState, build_eval_step,
                                             build_train_step, init_state,
                                             shard_and_jit)
from openeat_tpu.utils import checkpoint as ckpt_lib
from openeat_tpu.utils.optim import build_optimizer, freeze_mask
from openeat_tpu.utils.scheduler import warmup_lr

VOCAB, F = 30, 20


def _model(**kw):
    d = dict(input_size=F, vocab_size=VOCAB, encoder_num_blocks=2,
             decoder_num_blocks=1, r_decoder_num_blocks=0, reverse_weight=0.0,
             d_model=32, attention_heads=2, linear_units=64,
             input_layer="linear", compute_dtype=jnp.float32)
    d.update(kw)
    return ASRModel(**d)


def _batch(rng, b=8, t=32, l=6):
    return {
        "features": jnp.asarray(rng.standard_normal((b, t, F)), jnp.float32),
        "features_length": jnp.full((b,), t, jnp.int32),
        "targets": jnp.asarray(rng.integers(1, VOCAB - 1, (b, l)), jnp.int32),
        "targets_length": jnp.full((b,), l, jnp.int32),
    }


def test_warmup_lr_schedule():
    sched = warmup_lr(0.001, 1000)
    # peak at warmup boundary, linear ramp before, decay after
    np.testing.assert_allclose(float(sched(1000)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 0.0005, rtol=1e-6)
    assert float(sched(4000)) == pytest.approx(0.0005, rel=1e-6)
    assert float(sched(1)) < 1e-4


def test_freeze_mask_adapter_only(rng):
    model = _model(encoder_use_adapter=True)
    batch = _batch(rng, b=2)
    params = model.init(jax.random.PRNGKey(0), batch["features"],
                        batch["features_length"], batch["targets"],
                        batch["targets_length"])
    mask = freeze_mask(params, only_adapter=True)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, trainable in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        assert trainable == ("adapter" in p), p


def test_train_loss_decreases(rng):
    model = _model()
    batch = _batch(rng)
    tx, sched = build_optimizer(1e-3, 10)
    state = init_state(model, tx, batch)
    step = jax.jit(build_train_step(model, tx))
    rngk = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        rngk, k = jax.random.split(rngk)
        state, m = step(state, batch, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[::10]
    assert int(state.step) == 30


def test_sharded_train_step_dp_tp(rng):
    """dp=4 x tp=2 mesh on 8 CPU devices; one step runs and matches the
    unsharded step numerically."""
    model = _model()
    batch = _batch(rng)
    tx, _ = build_optimizer(1e-3, 10)
    state = init_state(model, tx, batch)
    plain_step = jax.jit(build_train_step(model, tx))
    s1, m1 = plain_step(state, batch, jax.random.PRNGKey(1))

    mesh = mesh_lib.make_mesh(data=4, model=2)
    pshard = mesh_lib.param_shardings(state.params, mesh)
    oshard = jax.tree.map(
        lambda x: mesh_lib.replicated(mesh), state.opt_state,
        is_leaf=lambda x: hasattr(x, "shape"))
    # opt_state mirrors params for adam moments: shard like params where
    # shapes match; simplest robust choice here: replicate opt state
    state_shardings = TrainState(
        pshard, jax.tree.map(lambda _: mesh_lib.replicated(mesh),
                             state.opt_state), mesh_lib.replicated(mesh))
    bshard = mesh_lib.batch_shardings(batch, mesh)
    sharded_state = jax.device_put(state, state_shardings)
    sharded_batch = jax.device_put(batch, bshard)
    step = shard_and_jit(build_train_step(model, tx), mesh, state_shardings,
                         bshard, donate_state=False)
    s2, m2 = step(sharded_state, sharded_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    # params updated identically (spot-check a leaf)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-4)


def test_grad_accumulation_matches_big_batch(rng):
    model = _model()
    big = _batch(rng, b=8)
    micro = jax.tree.map(lambda x: x.reshape((4, 2) + x.shape[1:]), big)
    tx = optax.sgd(0.1)
    state = init_state(model, tx, big)
    step1 = jax.jit(build_train_step(model, tx, accum_grad=1))
    step4 = jax.jit(build_train_step(model, tx, accum_grad=4))
    # deterministic: dropout off in this model (rate>0 but we pass same rng;
    # to compare exactly, use dropout_rate=0 model)
    model0 = _model(dropout_rate=0.0)
    state = init_state(model0, tx, big)
    step1 = jax.jit(build_train_step(model0, tx, accum_grad=1))
    step4 = jax.jit(build_train_step(model0, tx, accum_grad=4))
    s1, m1 = step1(state, big, jax.random.PRNGKey(0))
    s4, m4 = step4(state, micro, jax.random.PRNGKey(0))
    # identical math up to f32 reassociation noise (verified exactly in
    # f64 offline); losses agree tightly, params to f32 noise
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l4 = jax.tree.leaves(s4.params)
    for a, b in zip(l1, l4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_nonfinite_grad_skipped(rng):
    model = _model(dropout_rate=0.0)
    batch = _batch(rng, b=2)
    tx = optax.sgd(0.1)
    state = init_state(model, tx, batch)
    bad = dict(batch)
    bad["features"] = batch["features"].at[0, 0, 0].set(jnp.nan)
    step = jax.jit(build_train_step(model, tx))
    s2, m = step(state, bad, jax.random.PRNGKey(0))
    assert float(m["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_and_average(tmp_path, rng):
    model = _model()
    batch = _batch(rng, b=2)
    params = model.init(jax.random.PRNGKey(0), batch["features"],
                        batch["features_length"], batch["targets"],
                        batch["targets_length"])
    p2 = jax.tree.map(lambda x: x + 1.0 if jnp.issubdtype(
        x.dtype, jnp.floating) else x, params)
    ckpt_lib.save_checkpoint(str(tmp_path), "epoch_1", params,
                             {"cv_loss": 2.0, "epoch": 1})
    ckpt_lib.save_checkpoint(str(tmp_path), "epoch_2", p2,
                             {"cv_loss": 1.0, "epoch": 2})
    loaded, info = ckpt_lib.load_checkpoint(str(tmp_path / "epoch_2"))
    assert info["cv_loss"] == 1.0
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(loaded)[0]),
                               np.asarray(jax.tree.leaves(p2)[0]))
    avg = ckpt_lib.average_checkpoints(str(tmp_path), num=2, val_best=True)
    a = np.asarray(jax.tree.leaves(avg)[0])
    want = (np.asarray(jax.tree.leaves(params)[0])
            + np.asarray(jax.tree.leaves(p2)[0])) / 2
    np.testing.assert_allclose(a, want, rtol=1e-6)
    # val_best num=1 picks epoch_2 (lower cv_loss)
    best = ckpt_lib.average_checkpoints(str(tmp_path), num=1, val_best=True)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(best)[0]),
                               np.asarray(jax.tree.leaves(p2)[0]), rtol=1e-6)


def test_partial_init(rng):
    model = _model()
    batch = _batch(rng, b=2)
    params = model.init(jax.random.PRNGKey(0), batch["features"],
                        batch["features_length"], batch["targets"],
                        batch["targets_length"])
    src = jax.tree.map(lambda x: x * 0 + 7.0 if jnp.issubdtype(
        x.dtype, jnp.floating) else x, params)
    # reference-style dotted prefixes (train.py default init_mods)
    new, copied = ckpt_lib.load_trained_modules(
        params, src, ["encoder.", "ctc.", "decoder."])
    assert copied and any("encoder" in c for c in copied)
    assert any("ctc" in c for c in copied)
    assert any("decoder" in c for c in copied)
    flat = jax.tree_util.tree_flatten_with_path(new)[0]
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "encoder" in p and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert float(jnp.asarray(leaf).ravel()[0]) == 7.0
