"""Depthwise 1-D convolution as a Pallas TPU kernel.

The Conformer conv module's depthwise conv (modules/convolution.py,
reference openeat/modules/convolution.py:60-77) is tiny in FLOPs
(K*T*C MACs) but XLA's grouped-conv lowering measured ~167 us per
[256, 78, 256] k=15 call — 7x its HBM traffic bound — and it runs
2x12 times per flagship train step (fwd + transposed-kernel dgrad)
(benchmarks/results/r4_step_diag/micro_probe_r4b.log: dw_conv 4.02 ms
/ 24 calls; the shift-and-add XLA form is 3x worse).

Here the padded input tile sits in VMEM once and the K taps are a
static unrolled multiply-add on the VPU — one HBM read + one write per
element. The backward pass reuses the same kernel: dgrad is a depthwise
conv of dy with the tap-reversed kernel; wgrad (sum over B,T of
x_shifted * dy, a [K, C]-shaped reduction) is left to XLA.

Non-TPU backends (the CPU test mesh) fall back to
`lax.conv_general_dilated`, which this kernel matches exactly in f32
(tests/test_depthwise_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _xla_dwconv(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID depthwise conv. x: [B, Tp, C]; w: [K, C] -> [B, Tp-K+1, C]."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], (1,), "VALID", feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))


def _kernel(x_ref, w_ref, out_ref, *, k: int, t_out: int):
    x = x_ref[...]
    w = w_ref[...]
    acc = x[:, 0:t_out, :].astype(jnp.float32) * w[0][None, None, :]
    for j in range(1, k):
        acc += x[:, j:j + t_out, :].astype(jnp.float32) * w[j][None, None, :]
    out_ref[...] = acc.astype(out_ref.dtype)


def _pallas_dwconv(x: jax.Array, w: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, c = x.shape
    k = w.shape[0]
    t_out = tp - k + 1
    # B-tile sized to keep in+out blocks well under VMEM (~16 MB)
    tb = None
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if b % cand == 0 and cand * (tp + t_out) * c * x.dtype.itemsize \
                < 4 * 1024 * 1024:
            tb = cand
            break
    if tb is None:
        # even a single example exceeds the VMEM tile budget — fail
        # loudly instead of handing Mosaic an oversized full-batch
        # block (ADVICE r4); callers can use the XLA path instead
        raise ValueError(
            f"dwconv tile for one example ({(tp + t_out) * c * x.dtype.itemsize}"
            f" bytes, T={tp}, C={c}) exceeds the 4MB VMEM budget; "
            "use the XLA depthwise conv for this shape")
    kern = functools.partial(_kernel, k=k, t_out=t_out)
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, tp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, t_out, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_out, c), x.dtype),
    )(x, w.astype(x.dtype))


def _use_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@jax.custom_vjp
def depthwise_conv1d(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID depthwise conv. x: [B, T + K - 1, C] (pre-padded by the
    caller for causal/symmetric semantics); w: [K, C]. Returns
    [B, T, C] in x.dtype."""
    if _use_pallas():
        return _pallas_dwconv(x, w)
    return _xla_dwconv(x, w)


def _fwd(x, w):
    return depthwise_conv1d(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    k = w.shape[0]
    # dgrad: full-pad dy, tap-reversed kernel -> [B, Tp, C]
    dy_pad = jnp.pad(dy, ((0, 0), (k - 1, k - 1), (0, 0)))
    w_rev = w[::-1]
    if _use_pallas():
        dx = _pallas_dwconv(dy_pad, w_rev)
    else:
        dx = _xla_dwconv(dy_pad, w_rev)
    dx = dx.astype(x.dtype)
    # wgrad: dw[j, c] = sum_{b,t} x[b, t+j, c] dy[b, t, c]
    t_out = dy.shape[1]
    dw = jnp.stack([
        jnp.einsum("btc,btc->c", x[:, j:j + t_out, :].astype(jnp.float32),
                   dy.astype(jnp.float32))
        for j in range(k)], axis=0).astype(w.dtype)
    return dx, dw


depthwise_conv1d.defvjp(_fwd, _bwd)


def depthwise_conv1d_ref(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Numpy oracle (float64)."""
    b, tp, c = x.shape
    k = w.shape[0]
    t = tp - k + 1
    out = np.zeros((b, t, c), np.float64)
    for j in range(k):
        out += x[:, j:j + t, :].astype(np.float64) * w[j][None, None, :]
    return out
