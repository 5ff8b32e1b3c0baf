"""Shared numeric helpers (JAX, static-shape).

Parity targets: reference openeat/utils/common.py:9-206 — IGNORE_ID
conventions, sos/eos padding, sequence reversal, accuracy, activations,
log-add, CTC blank/dup removal — re-expressed as pure static-shape JAX.
"""

from __future__ import annotations

import logging
import math
import os
import sys
from typing import Callable

import jax
import jax.numpy as jnp

IGNORE_ID = -1


def init_logger(name: str = "openeat_tpu", log_file: str | None = None,
                level: int = logging.INFO) -> logging.Logger:
    """Console + optional file logger (reference common.py:9-23)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if not logger.handlers:
        fmt = logging.Formatter(
            "%(asctime)s %(levelname)s [%(filename)s:%(lineno)d] %(message)s")
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def train_prng(seed: int, impl: str = "rbg") -> jax.Array:
    """Root PRNG key for training loops.

    impl='rbg' derives random bits with the hardware-friendly XLA
    RngBitGenerator instead of counter-based threefry. On the flagship
    v5e train step the difference is 50 ms/step — threefry mask
    generation for ~60 dropout sites plus SpecAugment was 40% of the
    whole step (121.2 -> 71.2 ms, benchmarks/results/r4_step_diag/
    opt_probe.log). Falls back to threefry PRNGKey if the impl is
    unavailable. Decode paths keep plain PRNGKey (negligible RNG use).
    """
    try:
        return jax.random.key(seed, impl=impl)
    except Exception:
        return jax.random.PRNGKey(seed)


def pad_list(xs: list, pad_value: float, max_len: int | None = None):
    """Pad a python list of 1-D arrays to [B, max_len] (reference common.py:32-60).

    Host-side helper (used by the data pipeline, not inside jit).
    """
    import numpy as np
    n = max_len if max_len is not None else max(len(x) for x in xs)
    out = np.full((len(xs), n), pad_value, dtype=np.asarray(xs[0]).dtype)
    for i, x in enumerate(xs):
        out[i, : len(x)] = x
    return out


def add_sos_eos(ys_pad: jax.Array, ys_lens: jax.Array, sos: int, eos: int,
                ignore_id: int = IGNORE_ID) -> tuple[jax.Array, jax.Array]:
    """Build decoder input/target with sos/eos, static shapes.

    ys_pad: [B, L] int32 padded with `ignore_id`; ys_lens: [B].
    Returns (ys_in [B, L+1], ys_out [B, L+1]):
      ys_in  = [sos, y1..yL, eos-fill...]   (pad positions filled with eos)
      ys_out = [y1..yL, eos, ignore-fill...]

    Parity: reference openeat/utils/common.py:89-132 (there done with
    per-sample python lists; here vectorized with iota/where).
    """
    b, l = ys_pad.shape
    lens = ys_lens.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, l + 1), 1)
    ys_ext = jnp.concatenate(
        [ys_pad, jnp.full((b, 1), ignore_id, ys_pad.dtype)], axis=1)
    valid = pos < lens[:, None]
    # ys_in: shift right by one, prepend sos; pads -> eos
    shifted = jnp.concatenate(
        [jnp.full((b, 1), sos, ys_pad.dtype), ys_ext[:, :-1]], axis=1)
    in_valid = pos <= lens[:, None]  # sos + L tokens are "real"
    ys_in = jnp.where(pos == 0, sos, jnp.where(in_valid, shifted, eos))
    ys_in = jnp.where(in_valid, ys_in, eos)
    # ys_out: tokens then eos at index len, ignore elsewhere
    ys_out = jnp.where(valid, ys_ext,
                       jnp.where(pos == lens[:, None], eos, ignore_id))
    return ys_in.astype(jnp.int32), ys_out.astype(jnp.int32)


def reverse_pad_list(ys_pad: jax.Array, ys_lens: jax.Array,
                     pad_value: int = IGNORE_ID) -> jax.Array:
    """Per-sequence reversal keeping padding at the tail.

    [y1..yL, pad...] -> [yL..y1, pad...]. Parity: reference common.py:63-86.
    """
    b, l = ys_pad.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    lens = ys_lens.astype(jnp.int32)[:, None]
    src = lens - 1 - pos  # index of reversed element
    src_clamped = jnp.clip(src, 0, l - 1)
    gathered = jnp.take_along_axis(ys_pad, src_clamped, axis=1)
    return jnp.where(pos < lens, gathered, pad_value)


def th_accuracy(logits: jax.Array, target: jax.Array,
                ignore_label: int = IGNORE_ID) -> jax.Array:
    """Padding-masked token accuracy (reference common.py:135-157).

    logits: [B, L, V] (or [B*L, V]); target: [B, L].
    """
    if logits.ndim == 3:
        logits = logits.reshape(-1, logits.shape[-1])
    target = target.reshape(-1)
    pred = jnp.argmax(logits, axis=-1)
    mask = target != ignore_label
    correct = jnp.sum(jnp.where(mask, pred == target, False))
    total = jnp.maximum(jnp.sum(mask), 1)
    return correct.astype(jnp.float32) / total.astype(jnp.float32)


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    """Activation registry (reference common.py:160-173)."""
    acts = {
        "hardtanh": jax.nn.hard_tanh,
        "tanh": jnp.tanh,
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "swish": jax.nn.silu,
        "gelu": jax.nn.gelu,
    }
    if name not in acts:
        raise ValueError(f"unknown activation {name!r}; have {sorted(acts)}")
    return acts[name]


def log_add(args) -> float:
    """Stable log-sum-exp over a python iterable (reference common.py:198-206).

    Host-side helper for the numpy reference decoders used in tests.
    """
    xs = list(args)
    if all(a == -float("inf") for a in xs):
        return -float("inf")
    a_max = max(xs)
    return a_max + math.log(sum(math.exp(a - a_max) for a in xs))


def remove_duplicates_and_blank(hyp, blank_id: int = 0) -> list:
    """CTC collapse: dedupe consecutive then drop blanks (common.py:187-196)."""
    out = []
    prev = None
    for t in hyp:
        t = int(t)
        if t != prev and t != blank_id:
            out.append(t)
        prev = t
    return out


def ctc_collapse_device(tokens: jax.Array, blank_id: int = 0,
                        pad_value: int = IGNORE_ID,
                        return_positions: bool = False):
    """Vectorized on-device CTC collapse. tokens: [B, T] -> [B, T].

    Keeps positions where token != previous token and token != blank,
    compacts survivors to the front, pads the rest with `pad_value`.
    Device analog of `remove_duplicates_and_blank`. With
    `return_positions`, also returns each kept token's original frame
    index [B, T] int32 (0 on pad lanes) — the CTC emission onsets that
    back greedy-path timestamps.
    """
    b, t = tokens.shape
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, tokens.dtype), tokens[:, :-1]], axis=1)
    keep = (tokens != prev) & (tokens != blank_id) & (tokens != pad_value)
    # stable compaction: sort by (!keep, position)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    key = jnp.where(keep, pos, t + pos)  # kept items first, order preserved
    order = jnp.argsort(key, axis=1)
    gathered = jnp.take_along_axis(tokens, order, axis=1)
    kept_sorted = jnp.take_along_axis(keep, order, axis=1)
    out = jnp.where(kept_sorted, gathered, pad_value)
    if not return_positions:
        return out
    pos_sorted = jnp.take_along_axis(pos, order, axis=1)
    return out, jnp.where(kept_sorted, pos_sorted, 0)


def map_structure_to_bf16(tree):
    """Cast all float arrays in a pytree to bfloat16 (MXU-friendly)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree.map(_cast, tree)
