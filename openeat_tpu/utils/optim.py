"""Optimizer construction with parameter freezing.

Parity targets:
- Adam + WarmupLR (reference openeat/bin/train.py:195-197,
  openeat/utils/scheduler.py:42-49);
- adapter-only fine-tuning: freeze every parameter whose path does not
  contain 'adapter' (reference train.py:180-185 sets requires_grad=False
  on non-adapter params) — here an optax.multi_transform mask;
- GlobalCMVN statistics are always frozen (they are buffers in the
  reference, openeat/modules/cmvn.py:35-46).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from openeat_tpu.utils.scheduler import warmup_lr


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def freeze_mask(params: Any, only_adapter: bool = False) -> Any:
    """True = trainable. CMVN stats always frozen; optionally only
    adapter params trainable."""
    def one(path, _):
        p = _path_str(path)
        if "global_cmvn" in p:
            return False
        if only_adapter:
            return "adapter" in p
        return True
    return jax.tree_util.tree_map_with_path(one, params)


def _flat_freeze(params: Any, mask_tree: Any) -> optax.GradientTransformation:
    """Zero updates for frozen params, in the FLAT domain.

    Meant to sit inside optax.flatten's chain, where updates are one
    raveled vector: the 0/1 mask is raveled with the same ravel_pytree
    ordering optax.flatten uses, so one elementwise multiply freezes
    exactly the masked parameters (the multi_transform/set_to_zero
    equivalent without per-leaf label dispatch)."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    mask_vec, _ = ravel_pytree(jax.tree.map(
        lambda p, m: jnp.full(p.shape, 1.0 if m else 0.0, p.dtype),
        params, mask_tree))

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        masked = jax.tree.map(lambda u: u * mask_vec.astype(u.dtype),
                              updates)
        return masked, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(lr: float, warmup_steps: int, optim: str = "adam",
                    params: Any = None, only_adapter: bool = False,
                    weight_decay: float = 0.0
                    ) -> tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, schedule). Grad clipping / finite-guard live in the
    train step (parallel.train_step), not here, to match the reference's
    clip-then-step ordering.

    The transformation is wrapped in optax.flatten: Adam's moment math
    runs on ONE raveled vector instead of ~115 per-tensor kernels. The
    per-leaf update path measured 18 ms/step on the v5e flagship — pure
    kernel-launch overhead on ~1 ms of real HBM traffic
    (benchmarks/results/r4_step_diag/opt_probe.log, update_only)."""
    schedule = warmup_lr(lr, warmup_steps)
    if optim == "adam":
        base = optax.adam(schedule)
    elif optim == "adamw":
        base = optax.adamw(schedule, weight_decay=weight_decay)
    elif optim == "sgd":
        base = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer {optim!r}")
    if params is not None:
        mask = freeze_mask(params, only_adapter)
        if not all(jax.tree.leaves(mask)):
            base = optax.chain(base, _flat_freeze(params, mask))
    return optax.flatten(base), schedule
