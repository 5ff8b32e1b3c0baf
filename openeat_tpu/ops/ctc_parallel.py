"""Parallel-in-time CTC loss: log-semiring associative scan.

The reference computes CTC with torch.nn.CTCLoss's sequential
forward-backward (reference openeat/modules/ctc.py:25,42); optax's
XLA implementation is likewise a `lax.scan` over T frames — 78
sequential [B, S] updates on the flagship shapes, latency- not
flop-bound (benchmarks/results/r4_step_diag/ROOFLINE.md bucket 3).

This is the TPU-native alternative the roofline names: the CTC alpha
recursion is a linear recurrence in the (log, +) semiring,

    alpha_t = M_t (x) alpha_{t-1},   (M (x) v)[i] = LSE_j(M[ij] + v[j])

so the whole T-step chain folds with `jax.lax.associative_scan` over
banded [S, S] transition matrices in ceil(log2 T) rounds of batched
log-matmuls instead of T dependent steps. Each combine uses the
max-shift factorization

    LSE_k(A[ik] + B[kj]) = a_i + log( exp(A - a)_ik @ exp(B - b)_kj ) + b_j

whose inner product is a REAL f32 matmul (every operand <= 1, so no
overflow; terms below exp(-88) of the row/col max underflow harmlessly)
— the MXU does the heavy lifting, the VPU pays one exp and one log per
combine element. More total FLOPs (T*S^3 vs T*3S), fewer dependent
steps: the classic parallel-scan trade.

Numerics: validated against optax.ctc_loss (values and grads) in
tests/test_ctc_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# -1e9 (not -1e30): semiring "zeros" accumulate additively through
# log2(T) combine levels; 1e30-scale magnitudes push f32 toward inf in
# the backward pass (observed nan grads), while -1e9 stays orders of
# magnitude below any real path score and orders above f32 limits.
NEG = -1e9


def _log_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """LSE_k(a[..., i, k] + b[..., k, j]) via the max-shift matmul."""
    am = jnp.max(a, axis=-1, keepdims=True)            # [..., S, 1]
    bm = jnp.max(b, axis=-2, keepdims=True)            # [..., 1, S]
    ea = jnp.exp(a - am)
    eb = jnp.exp(b - bm)
    prod = jnp.einsum("...ik,...kj->...ij", ea, eb,
                      preferred_element_type=jnp.float32)
    return am + jnp.log(jnp.maximum(prod, 1e-30)) + bm


def ctc_loss_parallel(logits: jax.Array, logit_paddings: jax.Array,
                      labels: jax.Array, label_paddings: jax.Array,
                      blank_id: int = 0) -> jax.Array:
    """Per-sequence CTC negative log-likelihood, optax.ctc_loss API.

    logits: [B, T, V] (unnormalized); logit_paddings: [B, T] 1.0=pad;
    labels: [B, L] int; label_paddings: [B, L] 1.0=pad. Returns [B].
    """
    b, t, _ = logits.shape
    l = labels.shape[1]
    s = 2 * l + 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    lab_lens = jnp.sum(1.0 - label_paddings, axis=-1).astype(jnp.int32)

    # state s: even -> blank, odd -> labels[(s-1)//2]
    states = jnp.arange(s)
    sym = jnp.where(states % 2 == 1,
                    labels[:, jnp.minimum(states // 2, l - 1)],
                    blank_id)                                    # [B, S]
    # skip transition (s-2 -> s) allowed iff s odd, s >= 2, and the two
    # surrounding labels differ (standard CTC repeated-label rule)
    sym_m2 = jnp.concatenate(
        [jnp.full((b, 2), -1, sym.dtype), sym[:, :-2]], axis=1)
    skip_ok = (states[None, :] % 2 == 1) & (states[None, :] >= 2) & (
        sym != sym_m2)                                           # [B, S]
    # states beyond the true 2*lab_len+1 are unreachable
    valid = states[None, :] < (2 * lab_lens + 1)[:, None]        # [B, S]

    # emission log-probs per (t, state): [B, T, S]
    emit = jnp.take_along_axis(
        logp, jnp.broadcast_to(sym[:, None, :], (b, t, s)), axis=-1)

    # transition structure A[i, j] = 0 where j -> i is allowed else NEG
    stay = states[:, None] == states[None, :]
    step1 = states[:, None] == states[None, :] + 1
    step2 = states[:, None] == states[None, :] + 2
    allowed = jnp.where(stay | step1, 0.0, NEG)[None]            # [1, S, S]
    allowed = jnp.maximum(
        allowed, jnp.where(skip_ok[:, :, None] & step2[None], 0.0, NEG))
    allowed = jnp.where(valid[:, :, None] & valid[:, None, :],
                        allowed, NEG)                            # [B, S, S]

    # per-frame matrices M_t[i, j] = emit[t, i] + allowed[i, j];
    # padded frames are the semiring identity (diag 0, else -inf)
    m = emit[:, :, :, None] + allowed[:, None, :, :]             # [B,T,S,S]
    ident = jnp.where(stay, 0.0, NEG)
    m = jnp.where(logit_paddings[:, :, None, None] > 0.0,
                  ident[None, None], m)

    # alpha_0 carries frame 0's emission directly (start states 0 / 1),
    # so the scan folds only M_1 .. M_{T-1}
    alpha0 = jnp.full((b, s), NEG)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if l > 0:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(lab_lens > 0, emit[:, 0, 1], NEG))

    m = jnp.swapaxes(m, 0, 1)                                    # [T,B,S,S]
    if t > 1:
        # alpha_T = M_{T-1} (x) ... (x) M_1 (x) alpha_0: the LATER
        # matrix multiplies on the LEFT, so the combine is fn(a, b) =
        # b (x) a (associative_scan folds left-to-right in scan order)
        prefix = jax.lax.associative_scan(
            lambda a, b: _log_matmul(b, a), m[1:], axis=0)
        total = prefix[-1]                                       # [B, S, S]
        alpha_t = _log_matmul(total, alpha0[:, :, None])[:, :, 0]
    else:
        alpha_t = alpha0

    # accept states: 2*lab_len (final blank), 2*lab_len - 1 (final label)
    end_blank = jnp.take_along_axis(alpha_t, (2 * lab_lens)[:, None],
                                    axis=1)[:, 0]
    end_label = jnp.take_along_axis(
        alpha_t, jnp.maximum(2 * lab_lens - 1, 0)[:, None], axis=1)[:, 0]
    end_label = jnp.where(lab_lens > 0, end_label, NEG)
    return -jnp.logaddexp(end_blank, end_label)
