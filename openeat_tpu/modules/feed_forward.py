"""Position-wise feed-forward and adapter blocks (flax.linen).

Parity: reference openeat/modules/positionwise_feed_forward.py:11-43
(linear -> act -> dropout -> linear) and openeat/modules/adapter.py:12-35
(LN -> down(64) -> ReLU -> dropout -> up, residual scaled by a fixed or
learnable scalar; learnable iff configured scalar == -1).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.modules.dropout import Dropout


class PositionwiseFeedForward(nn.Module):
    d_model: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = jax.nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        h = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        h = self.activation(h)
        h = Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="w_2")(h)


class MoEPositionwiseFeedForward(nn.Module):
    """Mixture-of-experts position-wise FFN (beyond-reference; the
    reference has no MoE — SURVEY.md §2.7 lists EP as absent there).

    TPU-native GShard/Switch design: top-k routing with a STATIC
    per-expert capacity, dispatch/combine as one-hot einsums so the
    expert matmuls stay batched on the MXU ([E, C, D] x [E, D, F]) and
    the expert axis shards over the mesh 'model' axis (expert
    parallelism — see parallel/mesh.py EP rules). Tokens beyond an
    expert's capacity are dropped (their combine weight is 0); callers
    keep a residual connection, so dropped tokens pass through
    unchanged, as in Switch Transformers.

    The Switch load-balance auxiliary loss (num_experts * sum_e
    dispatch_fraction_e * mean_router_prob_e) is sown into the
    'intermediates' collection as 'moe_aux_loss'; the training loss
    collects it via apply(..., mutable=['intermediates']) — decode
    paths apply without mutable collections, where sow() is a no-op.

    Routing is computed in float32 regardless of compute dtype
    (router logits are small but decide argmaxes; bf16 ties flap).

    Padding: pass `pad_mask` (bool, True=valid, [B, T] or [B, 1, T]) so
    pad positions route nowhere — they would otherwise consume expert
    capacity (dropping real tokens near saturation) and bias the
    load-balance loss toward whatever experts the pad embedding prefers.
    With the mask, valid-token routing is invariant to how much padding
    the batch carries (capacity permitting). Pad outputs are 0; the
    caller's residual passes them through, same as a dropped token.

    Streaming note: capacity is computed from the tokens the call sees,
    so a streamed chunk uses a per-chunk capacity while the offline
    forward uses a per-utterance one — routing (top-k) is identical,
    but capacity DROPS can differ near saturation; streamed MoE decode
    is therefore equivalent-in-distribution, not bit-exact (dense
    models remain bit-exact).
    """

    d_model: int
    hidden_units: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout_rate: float = 0.1
    activation: Callable = jax.nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, pad_mask: jax.Array | None = None,
                 deterministic: bool = True):
        b, t, d = x.shape
        s = b * t
        e = self.num_experts
        k = min(self.top_k, e)
        cap = int(np.ceil(k * s / e * self.capacity_factor))
        cap = max(cap, k)

        xf = x.reshape(s, d)
        if pad_mask is not None:
            valid = pad_mask.reshape(b, -1, t)[:, 0, :].reshape(s)
            valid = valid.astype(jnp.float32)  # [S] 1=real token, 0=pad
        else:
            valid = jnp.ones((s,), jnp.float32)
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            xf.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [S, E] f32

        # top-k selection: iterative argmax (k is 1 or 2 in practice)
        sel = jnp.zeros((s, e), jnp.float32)
        masked = probs
        for _ in range(k):
            idx = jnp.argmax(masked, axis=-1)
            one = jax.nn.one_hot(idx, e, dtype=jnp.float32)
            sel = sel + one
            masked = masked * (1.0 - one)
        sel = sel * valid[:, None]  # pads route nowhere, hold no capacity
        gates = probs * sel
        # renormalize over the selected k (GShard convention)
        gates = gates / jnp.maximum(
            gates.sum(-1, keepdims=True), 1e-9)

        # position of each token in its expert's buffer (token order);
        # tokens past the capacity are dropped
        pos = jnp.cumsum(sel, axis=0) - 1.0  # [S, E]
        keep = sel * (pos < cap)
        dispatch = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                  dtype=self.dtype) * keep[..., None]
        combine = dispatch * gates[..., None].astype(self.dtype)

        # Switch aux loss: num_experts * sum_e f_e * P_e, where f_e is
        # the routed-token fraction and P_e the mean router probability —
        # both over VALID tokens only, so the balance target isn't
        # polluted by pad positions
        n_valid = jnp.maximum(valid.sum(), 1.0)
        frac = sel.sum(0) / (k * n_valid)  # [E]
        p_mean = (probs * valid[:, None]).sum(0) / n_valid
        aux = e * jnp.sum(frac * p_mean)
        self.sow("intermediates", "moe_aux_loss", aux)

        w_in = self.param(
            "w_in", nn.initializers.lecun_normal(batch_axis=(0,)),
            (e, d, self.hidden_units), jnp.float32).astype(self.dtype)
        b_in = self.param("b_in", nn.initializers.zeros,
                          (e, self.hidden_units),
                          jnp.float32).astype(self.dtype)
        w_out = self.param(
            "w_out", nn.initializers.lecun_normal(batch_axis=(0,)),
            (e, self.hidden_units, d), jnp.float32).astype(self.dtype)
        b_out = self.param("b_out", nn.initializers.zeros, (e, d),
                           jnp.float32).astype(self.dtype)

        xc = xf.astype(self.dtype)
        expert_in = jnp.einsum("sec,sd->ecd", dispatch, xc)
        h = self.activation(
            jnp.einsum("ecd,edf->ecf", expert_in, w_in)
            + b_in[:, None, :])
        h = Dropout(self.dropout_rate)(h, deterministic=deterministic)
        expert_out = (jnp.einsum("ecf,efd->ecd", h, w_out)
                      + b_out[:, None, :])
        y = jnp.einsum("sec,ecd->sd", combine, expert_out)
        return y.reshape(b, t, d)


class Adapter(nn.Module):
    """Parameter-efficient fine-tuning bottleneck (adapter.py:12-35).

    Returns x + scale * up(drop(relu(down(LN(x))))); the dropout is
    applied both inside the bottleneck and on its output, matching the
    reference's double-dropout.
    """

    d_model: int
    dropout_rate: float = 0.1
    down_size: int = 64
    scalar: float = 0.1
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        residual = x
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(self.down_size, dtype=self.dtype, name="down_proj")(h)
        h = jax.nn.relu(h)
        h = Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="up_proj")(h)
        if self.scalar == -1:
            scale = self.param("scale", nn.initializers.ones, (1,),
                               jnp.float32).astype(h.dtype)
        else:
            scale = jnp.asarray(self.scalar, h.dtype)
        h = Dropout(self.dropout_rate)(h, deterministic=deterministic)
        update = scale * h
        return residual + update if self.residual else update
