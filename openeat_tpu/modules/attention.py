"""Multi-head attention: vanilla and Transformer-XL relative-position.

Behavior parity: reference openeat/modules/attention.py:14-209 —
separate q/k/v/out projections, mask as -inf fill before softmax,
rel-pos variant with learnable pos_bias_u/v, `matrix_ac + matrix_bd`
scores and the WeNet convention of NOT applying rel_shift
(reference attention.py:202-204).

TPU design: everything is einsum so XLA maps the contractions onto the
MXU and fuses bias/mask/softmax into the surrounding kernels; bf16
compute with f32 softmax accumulation. A masked position contributes
exactly 0 (the reference post-softmax zero-fill is reproduced by
re-masking after softmax so fully-masked query rows produce 0, not NaN).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from openeat_tpu.modules.dropout import Dropout

NEG_INF = -1.0e9

# Fused rel-pos scores: compute (q+u)k^T + (q+v)p^T as ONE einsum over a
# concatenated 2*d_k contraction ([q+u ; q+v] . [k ; p]), filling the
# 128-wide MXU contraction instead of two d_k=64 halves. The honest r4
# back-to-back A/B measures PARITY with the two-einsum form (0.994x,
# benchmarks/results/r4_step_diag/attn_fusion_honest.log — the r2
# "1.41x" figure was a pre-fix timing artifact); the fused form is kept
# as default for the halved HBM score-traffic, with exact equivalence
# tested in tests/test_model.py::test_relpos_fused_scores_match.
FUSED_RELPOS_SCORES = True


def _relpos_scores(q_u, q_v, k, p):
    """[B,Tq,H,D]x2, k [B,Tk,H,D], p [1|B,Tk,H,D] -> [B,H,Tq,Tk] f32."""
    if FUSED_RELPOS_SCORES:
        q2 = jnp.concatenate([q_u, q_v], axis=-1)
        p_b = jnp.broadcast_to(p, k.shape) if p.shape[0] != k.shape[0] else p
        k2 = jnp.concatenate([k, p_b.astype(k.dtype)], axis=-1)
        return jnp.einsum("bqhd,bkhd->bhqk", q2, k2,
                          preferred_element_type=jnp.float32)
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bqhd,pkhd->bhqk", q_v, p,
                    preferred_element_type=jnp.float32)
    return ac + bd


def _attend(q: jax.Array, k: jax.Array, v: jax.Array,
            scores_extra: Optional[jax.Array],
            mask: Optional[jax.Array], scale: float,
            dropout: nn.Module, deterministic: bool,
            out_proj: nn.Module) -> jax.Array:
    """Shared score->softmax->context path.

    q,k,v: [B, T, H, D]; scores_extra: [B, H, Tq, Tk] or None;
    mask: bool [B, 1, Tk] or [B, Tq, Tk], True = attend.
    """
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if scores_extra is not None:
        scores = scores + scores_extra
    scores = scores * scale
    if mask is not None:
        m = mask[:, None, :, :] if mask.ndim == 3 else mask
        scores = jnp.where(m, scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        attn = jnp.where(m, attn, 0.0)  # zero fully-masked rows
    attn = dropout(attn.astype(v.dtype), deterministic=deterministic)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    b, t, h, d = ctx.shape
    return out_proj(ctx.reshape(b, t, h * d))


class MultiHeadedAttention(nn.Module):
    """Scaled-dot MHA (reference attention.py:14-117)."""

    num_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.d_k = self.d_model // self.num_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        self.linear_q = dense("linear_q")
        self.linear_k = dense("linear_k")
        self.linear_v = dense("linear_v")
        self.linear_out = dense("linear_out")
        self.attn_dropout = Dropout(self.dropout_rate)

    def _qkv(self, query, key, value):
        b = query.shape[0]
        split = lambda x: x.reshape(b, -1, self.num_heads, self.d_k)
        return (split(self.linear_q(query)), split(self.linear_k(key)),
                split(self.linear_v(value)))

    def __call__(self, query, key, value, mask=None, pos_emb=None, *,
                 deterministic: bool = True):
        q, k, v = self._qkv(query, key, value)
        return _attend(q, k, v, None, mask, self.d_k ** -0.5,
                       self.attn_dropout, deterministic, self.linear_out)

    # ---- incremental-decode helpers (KV caching) ----

    def project_q(self, query):
        """[B, L, D] -> [B, L, H, Dk]."""
        b = query.shape[0]
        return self.linear_q(query).reshape(b, -1, self.num_heads, self.d_k)

    def project_kv(self, x):
        """[B, L, D] -> (k, v) each [B, L, H, Dk]."""
        b = x.shape[0]
        split = lambda y: y.reshape(b, -1, self.num_heads, self.d_k)
        return split(self.linear_k(x)), split(self.linear_v(x))

    def attend_cached(self, q, k, v, mask=None):
        """Attention over precomputed k/v (no dropout — decode only)."""
        return _attend(q, k, v, None, mask, self.d_k ** -0.5,
                       self.attn_dropout, True, self.linear_out)


class RelPositionMultiHeadedAttention(nn.Module):
    """Transformer-XL rel-pos MHA, WeNet no-shift convention.

    Parity: reference attention.py:120-209 — scores =
    ((q+u)k^T + (q+v)p^T) / sqrt(d_k) with p = linear_pos(pos_emb),
    rel_shift intentionally omitted (attention.py:202-204).
    """

    num_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.d_k = self.d_model // self.num_heads
        dense = lambda name, bias=True: nn.Dense(
            self.d_model, use_bias=bias, dtype=self.dtype, name=name)
        self.linear_q = dense("linear_q")
        self.linear_k = dense("linear_k")
        self.linear_v = dense("linear_v")
        self.linear_out = dense("linear_out")
        self.linear_pos = dense("linear_pos", bias=False)
        init = nn.initializers.xavier_uniform()
        self.pos_bias_u = self.param(
            "pos_bias_u", init, (self.num_heads, self.d_k), jnp.float32)
        self.pos_bias_v = self.param(
            "pos_bias_v", init, (self.num_heads, self.d_k), jnp.float32)
        self.attn_dropout = Dropout(self.dropout_rate)

    def __call__(self, query, key, value, mask=None, pos_emb=None, *,
                 deterministic: bool = True):
        assert pos_emb is not None, "rel-pos attention needs pos_emb"
        b = query.shape[0]
        split = lambda x: x.reshape(x.shape[0], -1, self.num_heads, self.d_k)
        q = split(self.linear_q(query))
        k = split(self.linear_k(key))
        v = split(self.linear_v(value))
        p = split(self.linear_pos(pos_emb.astype(query.dtype)))  # [1|B,T2,H,D]
        u = self.pos_bias_u.astype(q.dtype)
        vb = self.pos_bias_v.astype(q.dtype)
        # scores = (q+u)k^T + (q+v)p^T (matrix_ac + matrix_bd), computed
        # fused or as two einsums per FUSED_RELPOS_SCORES
        scores = _relpos_scores(q + u[None, None], q + vb[None, None], k, p)
        scale = self.d_k ** -0.5
        scores = scores * scale
        if mask is not None:
            m = mask[:, None, :, :] if mask.ndim == 3 else mask
            scores = jnp.where(m, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(m, attn, 0.0)
        attn = self.attn_dropout(attn.astype(v.dtype),
                                 deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return self.linear_out(ctx.reshape(b, -1, self.d_model))

    def forward_chunk(self, x, k_cache, v_cache, kv_mask, pos_emb):
        """Streaming chunk attention with K/V history.

        x: [B, Tc, D] current chunk; k_cache/v_cache: [B, Lc, H, Dk]
        (right-aligned history, invalid slots masked by kv_mask);
        kv_mask: bool [B, 1, Lc+Tc]; pos_emb: [1, Lc+Tc, D] absolute-
        position table slice for the kv window (masked slots arbitrary).
        Returns (out [B, Tc, D], k_new, v_new) — caller rolls the caches.
        """
        b = x.shape[0]
        split = lambda y: y.reshape(b, -1, self.num_heads, self.d_k)
        q = split(self.linear_q(x))
        k_new = split(self.linear_k(x))
        v_new = split(self.linear_v(x))
        k = jnp.concatenate([k_cache.astype(k_new.dtype), k_new], axis=1)
        v = jnp.concatenate([v_cache.astype(v_new.dtype), v_new], axis=1)
        p = split(self.linear_pos(pos_emb.astype(x.dtype)))
        u = self.pos_bias_u.astype(q.dtype)
        vb = self.pos_bias_v.astype(q.dtype)
        scores = _relpos_scores(q + u[None, None], q + vb[None, None],
                                k, p) * (self.d_k ** -0.5)
        m = kv_mask[:, None, :, :]
        scores = jnp.where(m, scores, NEG_INF)
        attn = jnp.where(m, jax.nn.softmax(scores, axis=-1), 0.0)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return (self.linear_out(ctx.reshape(b, -1, self.d_model)),
                k_new, v_new)
