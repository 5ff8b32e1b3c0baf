"""Learning-rate schedules.

Parity: reference openeat/utils/scheduler.py:9-52 (`WarmupLR`):
lr * warmup_steps^0.5 * min(step^-0.5, step * warmup_steps^-1.5),
i.e. Noam warmup that plateaus at the configured lr at `warmup_steps`
and decays ~ step^-0.5 afterwards. Exposed as an optax-style schedule
(a pure function of the step), which is the JAX analog of the torch
LRScheduler; `set_step`-style resume falls out of the functional form.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_lr(lr: float, warmup_steps: int):
    """Returns schedule(step) -> learning rate."""
    warmup_steps = max(int(warmup_steps), 1)

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return lr * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)

    return schedule
