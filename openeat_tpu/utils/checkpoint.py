"""Checkpointing: orbax save/load with epoch metadata, checkpoint
averaging, and partial/foreign init.

Parity: reference openeat/utils/checkpoint.py —
- save_checkpoint: state_dict + sibling `.yaml` info file (:30-48) ->
  orbax directory `epoch_N/` + `epoch_N.yaml`;
- load_checkpoint: non-strict load + info yaml (:12-27);
- load_trained_modules: module-prefix-filtered partial init from foreign
  checkpoints (:71-96) -> path-prefix filtering over the param pytree;
- average_model.py:38-112: running-sum average of the best-N/last-N
  checkpoints (val-best selection via the cv_loss in each info yaml).

Multi-host note: orbax handles sharded arrays natively; rank-0-only
gating (reference train_ddp.py:268-280) is unnecessary — saving a
replicated pytree from the single JAX controller is already one write.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml

_CKPT = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPT
    if _CKPT is None:
        _CKPT = ocp.StandardCheckpointer()
    return _CKPT


def save_checkpoint(exp_dir: str, tag: str, params: Any,
                    info: dict | None = None) -> str:
    """Save `params` to <exp_dir>/<tag>/ plus <exp_dir>/<tag>.yaml."""
    exp_dir = os.path.abspath(exp_dir)
    os.makedirs(exp_dir, exist_ok=True)
    path = os.path.join(exp_dir, tag)
    c = _checkpointer()
    # orbax refuses to overwrite; mirror torch.save overwrite semantics
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    c.save(path, jax.tree.map(np.asarray, params))
    c.wait_until_finished()
    if info is not None:
        with open(path + ".yaml", "w") as f:
            yaml.safe_dump(info, f)
    return path


def load_checkpoint(path: str, target: Any | None = None
                    ) -> tuple[Any, dict]:
    """Load params (+ info yaml if present). `target` gives the tree
    structure/shardings for a safe restore."""
    path = os.path.abspath(path)
    c = _checkpointer()
    params = c.restore(path, target) if target is not None else c.restore(path)
    info = {}
    if os.path.exists(path + ".yaml"):
        with open(path + ".yaml") as f:
            info = yaml.safe_load(f) or {}
    return params, info


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def load_trained_modules(target_params: Any, source_params: Any,
                         init_mods: list[str]) -> tuple[Any, list[str]]:
    """Partial init: copy leaves whose path starts with any prefix in
    `init_mods` (after 'params/') and whose shape matches.

    Parity: reference checkpoint.py:71-96 (prefix filter over a foreign
    state_dict). Returns (new_params, list of copied paths).
    """
    src = _flatten(source_params)
    copied = []
    # accept reference-style dotted prefixes ('encoder.', train.py:77-81)
    # against our slash-separated tree paths
    mods = [m.replace(".", "/").rstrip("/") for m in init_mods if m]

    def one(path, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        rel = key[len("params/"):] if key.startswith("params/") else key
        if key in src and src[key].shape == leaf.shape and any(
                rel == m or rel.startswith(m + "/") or key.startswith(m)
                for m in mods):
            copied.append(key)
            return jax.numpy.asarray(src[key], leaf.dtype)
        return leaf

    new = jax.tree_util.tree_map_with_path(one, target_params)
    return new, copied


def find_epoch_checkpoints(exp_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(exp_dir):
        m = re.fullmatch(r"epoch_(\d+)", name)
        p = os.path.join(exp_dir, name)
        if m and os.path.isdir(p):
            out.append((int(m.group(1)), p))
    return sorted(out)


def average_checkpoints(exp_dir: str, num: int = 5, val_best: bool = True,
                        min_epoch: int = 0, max_epoch: int = 10 ** 9,
                        target: Any | None = None) -> Any:
    """Average N checkpoints (reference average_model.py:38-112).

    val_best: pick the N with lowest `cv_loss` in their info yamls;
    otherwise the last N epochs in [min_epoch, max_epoch].
    """
    cands = [(e, p) for e, p in find_epoch_checkpoints(exp_dir)
             if min_epoch <= e <= max_epoch]
    if not cands:
        raise FileNotFoundError(f"no epoch_N checkpoints in {exp_dir}")
    if val_best:
        scored = []
        for e, p in cands:
            info_path = p + ".yaml"
            cv = float("inf")
            if os.path.exists(info_path):
                with open(info_path) as f:
                    cv = float((yaml.safe_load(f) or {}).get("cv_loss",
                                                             float("inf")))
            scored.append((cv, e, p))
        scored.sort()
        chosen = [p for _, _, p in scored[:num]]
    else:
        chosen = [p for _, p in cands[-num:]]
    acc = None
    for p in chosen:
        params, _ = load_checkpoint(p, target)
        flat, treedef = jax.tree_util.tree_flatten(params)
        flat = [np.asarray(x, np.float64) if np.issubdtype(
            np.asarray(x).dtype, np.floating) else np.asarray(x)
            for x in flat]
        if acc is None:
            acc, acc_def = flat, treedef
        else:
            acc = [a + b if np.issubdtype(a.dtype, np.floating) else b
                   for a, b in zip(acc, flat)]
    n = len(chosen)
    acc = [np.asarray(a / n, np.float32)
           if np.issubdtype(a.dtype, np.floating) else a for a in acc]
    return jax.tree_util.tree_unflatten(acc_def, acc)
