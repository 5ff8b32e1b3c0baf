"""Scripted REAL-TPU check of the compiled Pallas kernels (VERDICT r2
weak #7): CI runs the kernels in interpret mode on CPU
(tests/test_ctc_loss.py), so compiled-kernel correctness on hardware
needs its own repeatable gate. This script runs, on the real chip:

  1. both CTC kernel variants (per-utt grid + batch-vectorized,
     ops/ctc_loss.py) — loss AND input-grad vs the pure-JAX scan oracle;
  2. the fused rel-pos attention score path vs the two-einsum reference
     (modules/attention._relpos_scores, FUSED_RELPOS_SCORES toggle).

Prints one JSON line per check and PALLAS_CHECK PASS/FAIL; exit code
reflects overall status. Run alone (single TPU client rule,
docs/AXON_NOTES.md):

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pallas_check.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.ops import ctc_loss as cl

RESULTS = []


def record(name: str, ok: bool, detail: dict):
    RESULTS.append(ok)
    print(json.dumps({"check": name, "ok": bool(ok), **detail}))


def make_ctc_case(rng, b, t, v, l_max):
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2.0
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lens = jnp.asarray(
        rng.integers(max(2 * l_max + 1, t // 2), t + 1, b), jnp.int32)
    labels = jnp.asarray(rng.integers(1, v, (b, l_max)), jnp.int32)
    label_lens = jnp.asarray(rng.integers(1, l_max + 1, b), jnp.int32)
    return logp, input_lens, labels, label_lens


def loss_and_grad(logp, input_lens, labels, label_lens, use_pallas):
    def f(lp):
        loss = cl.ctc_loss(lp, input_lens, labels, label_lens,
                           use_pallas=use_pallas)
        return jnp.sum(loss), loss

    (tot, loss), grad = jax.jit(
        jax.value_and_grad(f, has_aux=True))(logp)
    return np.asarray(loss), np.asarray(grad)


def check_ctc_variant(name, b, t, v, l_max, want_kernel):
    rng = np.random.default_rng(0)
    logp, il, lab, ll = make_ctc_case(rng, b, t, v, l_max)
    # confirm the shape actually dispatches to the intended variant
    # (via the library's own dispatch rule — single source of truth)
    z, s_lens = cl.extended_labels(lab, ll, 0)
    got_kernel = cl.dispatch_variant(b, t, int(z.shape[1]))
    loss_p, grad_p = loss_and_grad(logp, il, lab, ll, True)
    loss_s, grad_s = loss_and_grad(logp, il, lab, ll, False)
    dl = float(np.max(np.abs(loss_p - loss_s)))
    dg = float(np.max(np.abs(grad_p - grad_s)))
    ok = (got_kernel == want_kernel and dl < 1e-3 and dg < 1e-3
          and np.all(np.isfinite(loss_p)))
    record(f"ctc_{want_kernel}", ok,
           {"dispatched": got_kernel, "max_dloss": round(dl, 6),
            "max_dgrad": round(dg, 6), "shape": [b, t, v, l_max]})


def check_fused_attention():
    from openeat_tpu.modules import attention as att
    rng = np.random.default_rng(1)
    b, tq, tk, h, d = 4, 96, 96, 4, 64
    q_u = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.bfloat16)
    q_v = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.bfloat16)
    p = jnp.asarray(rng.standard_normal((1, tk, h, d)), jnp.bfloat16)

    saved = att.FUSED_RELPOS_SCORES
    try:
        att.FUSED_RELPOS_SCORES = True
        fused = np.asarray(jax.jit(att._relpos_scores)(q_u, q_v, k, p))
        att.FUSED_RELPOS_SCORES = False
        plain = np.asarray(jax.jit(att._relpos_scores)(q_u, q_v, k, p))
    finally:
        att.FUSED_RELPOS_SCORES = saved
    # bf16 inputs, f32 accumulation: identical contractions re-ordered —
    # tolerance covers MXU accumulation-order differences only
    dmax = float(np.max(np.abs(fused - plain)))
    rel = dmax / max(float(np.max(np.abs(plain))), 1e-6)
    ok = rel < 2e-2 and np.isfinite(dmax)
    record("fused_relpos_scores", ok,
           {"max_abs_diff": round(dmax, 5), "rel": round(rel, 5)})


def main():
    backend = jax.default_backend()
    print(json.dumps({"backend": backend,
                      "device": str(jax.devices()[0])}))
    if backend != "tpu" and not os.environ.get("PALLAS_CHECK_FORCE"):
        # PALLAS_CHECK_FORCE=1 exercises the script plumbing on CPU
        # (the pallas dispatch falls back to the scan path there, so
        # only the harness itself is being checked, not the kernels)
        print("PALLAS_CHECK SKIP (no TPU backend)")
        return 0
    # batched variant, single tile: small B*T*S fits the VMEM budget
    check_ctc_variant("small", b=8, t=128, v=64, l_max=20,
                      want_kernel="batched")
    # batched variant, MULTI-tile: flagship training shape (B=256 spans
    # 8 grid cells of tile_b=32 at t=100) — the shape class the r2 rule
    # sent to the slow grid kernel
    check_ctc_variant("train", b=256, t=100, v=64, l_max=24,
                      want_kernel="batched")
    # per-utt grid variant: long T + long labels overflow even an
    # 8-row tile
    check_ctc_variant("large", b=8, t=1024, v=128, l_max=120,
                      want_kernel="grid")
    check_fused_attention()
    ok = all(RESULTS) and len(RESULTS) == 4
    print(f"PALLAS_CHECK {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
