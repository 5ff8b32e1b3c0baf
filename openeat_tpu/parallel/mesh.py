"""Device mesh + sharding rules.

TPU-native replacement for the reference's distribution story
(reference openeat/bin/train_ddp.py:127-134,212-219: NCCL process group +
DistributedSampler + DDP gradient all-reduce; SURVEY.md §2.7): a single
logical `Mesh(('data','model'))` over all chips. Data parallelism shards
the batch on `data` (gradient reduction becomes an XLA psum over ICI
inserted by GSPMD — no DDP/no_sync machinery needed); tensor parallelism
shards the wide matmuls on `model` via parameter-path rules. Sequence
parallelism is available by sharding the time axis of activations on
`model` between blocks (the `seq_sharded` helper) for long-utterance
scale-up, per SURVEY.md §5.

The rules map parameter path regexes -> PartitionSpec:
  - FFN / macaron w_1 kernels: shard hidden dim (column parallel)
  - FFN w_2 kernels: shard input dim (row parallel)
  - attention q/k/v/pos kernels: column parallel (heads split)
  - attention out kernels: row parallel
  - embeddings / output heads: vocab dim sharded
Everything else (norms, biases, convs) is replicated. GSPMD propagates
these through the graph and inserts the collectives.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'a/b/c' param path, PartitionSpec) — first match wins.
TP_RULES: list[tuple[str, P]] = [
    (r".*(feed_forward|feed_forward_macaron)/w_1/kernel$", P(None, "model")),
    (r".*(feed_forward|feed_forward_macaron)/w_2/kernel$", P("model", None)),
    (r".*(linear_q|linear_k|linear_v|linear_pos)/kernel$", P(None, "model")),
    (r".*linear_out/kernel$", P("model", None)),
    (r".*embed/embedding$", P("model", None)),           # vocab sharded
    (r".*output_layer/kernel$", P(None, "model")),
    (r".*ctc_lo/kernel$", P(None, "model")),
    (r".*(down_proj)/kernel$", P(None, "model")),
    (r".*(up_proj)/kernel$", P("model", None)),
    # MoE expert banks [E, ...]: expert axis sharded over 'model'
    # (expert parallelism; the router stays replicated). GSPMD turns the
    # dispatch einsums into an all-to-all-shaped exchange over ICI.
    (r".*feed_forward/w_in$", P("model", None, None)),
    (r".*feed_forward/w_out$", P("model", None, None)),
    (r".*feed_forward/b_in$", P("model", None)),
    (r".*feed_forward/b_out$", P("model", None)),
]


def make_mesh(data: int = -1, model: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a 2-D ('data','model') mesh. data=-1 takes the remainder.

    An explicit data*model smaller than the host's device count uses
    the first data*model devices (the CUDA_VISIBLE_DEVICES-subset
    analog of the reference's single-GPU runs, e.g. `--dp 1` on a
    multi-chip host)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model < 1:
        model = 1
    if data == -1:
        data = n // model
    assert data * model <= n, f"{data}x{model} > {n} devices"
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_pspec(path_str: str) -> P:
    for pattern, spec in TP_RULES:
        if re.match(pattern, path_str):
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching `params` (TP over 'model')."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        # pure data parallel: replicate everything
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def one(path, x):
        spec = param_pspec(_path_str(path))
        # drop specs that don't divide the dim evenly -> replicate
        for axis, name in enumerate(spec):
            if name is not None and x.shape[axis] % mesh.shape["model"] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_shardings(batch: Any, mesh: Mesh, batch_axis: int = 0) -> Any:
    """Shard the batch axis of every array on 'data'.

    batch_axis=1 serves grad-accumulation batches laid out as
    [accum, micro_batch, ...]: the accum axis is scanned inside the jit
    (one slice per micro-step), so only the micro-batch axis is sharded.
    """
    def one(x):
        if hasattr(x, "ndim") and x.ndim > batch_axis:
            spec = [None] * x.ndim
            spec[batch_axis] = "data"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())
    return jax.tree.map(one, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
