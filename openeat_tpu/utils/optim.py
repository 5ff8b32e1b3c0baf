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


def build_optimizer(lr: float, warmup_steps: int, optim: str = "adam",
                    params: Any = None, only_adapter: bool = False,
                    weight_decay: float = 0.0
                    ) -> tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, schedule). Grad clipping / finite-guard live in the
    train step (parallel.train_step), not here, to match the reference's
    clip-then-step ordering."""
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
        tx = optax.multi_transform(
            {"train": base, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", mask))
    else:
        tx = base
    return tx, schedule
