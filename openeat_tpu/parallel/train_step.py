"""Sharded training/eval step factory.

Replaces the reference's Executor inner loop mechanics
(reference openeat/utils/executor.py:11-113: grad accumulation with
DDP no_sync, clip_grad_norm_, non-finite-grad step skipping, per-step
scheduler) with ONE jitted SPMD program over the mesh:

- grad accumulation = lax.scan over micro-batches inside the jit (no
  no_sync analog needed — the psum happens once per optimizer step);
- non-finite guard = optax.apply_if_finite-style masking (the update is
  skipped and the step not counted when any grad is non-finite,
  mirroring executor.py:58-60);
- grad clipping by global norm (executor.py:58);
- the LR schedule is a pure function of the optimizer step.

GSPMD inserts the gradient reductions over ICI from the in/out sharding
annotations; no explicit collectives appear here.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from openeat_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # counted optimizer steps (successful or skipped)


def make_loss_fn(model) -> Callable:
    # MoE layers sow a Switch load-balance loss into 'intermediates'
    # (modules/feed_forward.MoEPositionwiseFeedForward); collecting it
    # requires the collection to be mutable during apply. Dense models
    # skip the extra plumbing entirely.
    has_moe = getattr(model, "moe_experts", 0) > 0

    def loss_fn(params, batch, dropout_rng):
        kw = dict(deterministic=False, rngs={"dropout": dropout_rng})
        if has_moe:
            metrics, var = model.apply(
                params,
                batch["features"], batch["features_length"],
                batch["targets"], batch["targets_length"],
                mutable=["intermediates"], **kw)
            # the only 'intermediates' producer in the model tree is
            # the MoE aux loss (one scalar per MoE layer application)
            aux = [jnp.asarray(v) for v in
                   jax.tree.leaves(var.get("intermediates", {}))]
            metrics = dict(metrics)
            moe_aux = (sum(aux) / max(len(aux), 1)) if aux else 0.0
            metrics["moe_aux"] = jnp.asarray(moe_aux, jnp.float32)
            metrics["loss"] = (metrics["loss"]
                               + model.moe_aux_weight * moe_aux)
        else:
            metrics = model.apply(
                params,
                batch["features"], batch["features_length"],
                batch["targets"], batch["targets_length"],
                **kw)
        return metrics["loss"], metrics
    return loss_fn


def build_train_step(model, tx: optax.GradientTransformation,
                     accum_grad: int = 1, grad_clip: float = 5.0,
                     donate: bool = True,
                     loss_fn: Callable | None = None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    With accum_grad > 1, every batch array must have a leading
    [accum_grad, micro_batch, ...] layout; gradients are averaged over
    micro-batches inside the jit.

    loss_fn overrides the default make_loss_fn(model) — e.g. the
    pipeline-parallel loss from parallel.pipeline.make_pp_loss_fn.
    """
    loss_fn = loss_fn if loss_fn is not None else make_loss_fn(model)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def compute_grads(params, batch, rng):
        if accum_grad == 1:
            (loss, metrics), grads = grad_fn(params, batch, rng)
            return grads, metrics

        def micro(carry, xs):
            acc = carry
            mb, r = xs
            (_, m), g = grad_fn(params, mb, r)
            acc = jax.tree.map(jnp.add, acc, g)
            return acc, m

        zeros = jax.tree.map(jnp.zeros_like, params)
        rngs = jax.random.split(rng, accum_grad)
        grads, ms = jax.lax.scan(micro, zeros, (batch, rngs))
        grads = jax.tree.map(lambda g: g / accum_grad, grads)
        metrics = jax.tree.map(lambda m: jnp.mean(m), ms)
        return grads, metrics

    def train_step(state: TrainState, batch, rng):
        grads, metrics = compute_grads(state.params, batch, rng)
        # FLAT clip: one concatenate + one reduction instead of
        # optax.global_norm's per-tensor reduce swarm (~115 leaves). The
        # per-leaf update path measured 18 ms/step of pure kernel-launch
        # overhead on the v5e flagship (r4_step_diag/opt_probe.log);
        # together with the optax.flatten-ed optimizer the whole
        # clip+Adam+guard tail runs on a handful of vector-wide kernels.
        from jax.flatten_util import ravel_pytree
        flat_g, unravel = ravel_pytree(grads)
        gnorm = jnp.sqrt(jnp.sum(
            jnp.square(flat_g.astype(jnp.float32))))
        finite = jnp.isfinite(gnorm)
        # clip by global norm (reference executor.py:58)
        scale = jnp.where(
            finite, jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12)),
            0.0)
        grads = unravel(flat_g * scale.astype(flat_g.dtype))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # skip the whole update on non-finite grad norm (executor.py:59-60)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "shape") else n,
            new_opt, state.opt_state)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = (~finite).astype(jnp.float32)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return train_step


def build_eval_step(model) -> Callable:
    def eval_step(params, batch):
        return model.apply(
            params,
            batch["features"], batch["features_length"],
            batch["targets"], batch["targets_length"],
            deterministic=True)
    return eval_step


def shard_and_jit(fn, mesh, state_shardings, batch_shardings,
                  donate_state: bool = True):
    """jit `fn(state, batch, rng)` with explicit in/out shardings."""
    rep = mesh_lib.replicated(mesh)
    return jax.jit(
        fn,
        in_shardings=(state_shardings, batch_shardings, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def init_params(model, example_batch, seed: int = 777):
    """Jitted model.init — ONE compiled program instead of thousands of
    eager per-op dispatches (a 10x+ startup win on remote-compile
    backends like the tunneled TPU)."""
    return jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        example_batch["features"], example_batch["features_length"],
        example_batch["targets"], example_batch["targets_length"])


def init_state(model, tx, example_batch, seed: int = 777,
               frozen_mask=None) -> TrainState:
    params = init_params(model, example_batch, seed)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))
