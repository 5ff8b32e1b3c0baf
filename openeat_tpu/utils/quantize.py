"""Weight-only int8 quantization for the inference path.

No reference equivalent (the reference serves fp32 torch checkpoints);
this is a TPU-serving feature: decode/streaming traffic is dominated by
streaming model weights from HBM at small batch (CLAUDE.md perf anchors
— the train step itself is dispatch-latency-bound, and decode batches
are tiny), so storing matmul weights as int8 + a per-output-channel
f32 scale halves weight HBM bytes. Dequantization happens inside the
jitted program right before each matmul (`int8 -> bf16 * scale`), which
XLA fuses into the dot's operand pipeline: weights live in HBM as int8
and are widened in VMEM on the fly.

Mechanics: `quantize_params` rewrites a flax variables pytree, replacing
every 2-D `kernel` leaf (all nn.Dense matmuls — attention q/k/v/out,
FFN w_1/w_2, CTC head, decoder output) of at least `min_size` elements
with a `QTensor(q=int8[in,out], scale=f32[out])`. `ASRModel.apply` (and
`LanguageModel.apply`) transparently call `maybe_dequantize` on their
variables, so every decode entry point — offline recognize, the
streaming runtimes, the server — accepts quantized params unchanged.

Symmetric per-output-channel scheme: scale_o = max_i |w[i,o]| / 127,
q = round(w / scale_o). Embeddings, biases, layernorms, conv kernels
and the rel-pos biases stay in their original dtype (they are a small
fraction of the bytes; the decoder embedding may be tied to the output
projection, so quantizing it would also perturb logits twice).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QTensor(NamedTuple):
    """int8 weight + per-output-channel scale; a jax pytree node."""
    q: jax.Array      # int8 [in, out]
    scale: jax.Array  # float32 [out]


def _quantize_leaf(w: jax.Array) -> QTensor:
    w = np.asarray(w, dtype=np.float32)
    scale = np.max(np.abs(w), axis=0) / 127.0
    scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return QTensor(q=jnp.asarray(q), scale=jnp.asarray(scale))


def quantize_params(variables, *, min_size: int = 4096):
    """Replace eligible Dense kernels with QTensor leaves (host-side,
    done once at load). Works on the full variables dict or the
    `params` sub-tree."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    out = {}
    for path, leaf in flat.items():
        if (path[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2
                and leaf.size >= min_size):
            out[path] = _quantize_leaf(leaf)
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)


def maybe_dequantize(variables, dtype=jnp.bfloat16):
    """Widen QTensor leaves back to `dtype` inside the current trace.

    Identity (and zero-cost) when no QTensor is present. Call at jit
    boundaries; the produced full-width weights are fused by XLA into
    their consuming matmuls rather than materialized in HBM.
    """
    has_q = False

    def widen(leaf):
        nonlocal has_q
        if isinstance(leaf, QTensor):
            has_q = True
            # widen in f32 so the scale multiply keeps full precision,
            # then cast once; XLA fuses the whole chain into the
            # consuming dot's operand pipeline
            return (leaf.q.astype(jnp.float32)
                    * leaf.scale[None, :]).astype(dtype)
        return leaf

    out = jax.tree_util.tree_map(
        widen, variables, is_leaf=lambda x: isinstance(x, QTensor))
    return out if has_q else variables


def quantized_bytes(variables) -> tuple[int, int]:
    """(bytes_now, bytes_fp32_equivalent) across all leaves — for
    reporting the compression ratio."""
    now = 0
    fp32 = 0
    for leaf in jax.tree_util.tree_leaves(
            variables, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            now += leaf.q.size + leaf.scale.size * 4
            fp32 += leaf.q.size * 4
        else:
            now += leaf.size * np.dtype(leaf.dtype).itemsize
            fp32 += leaf.size * 4
    return now, fp32
