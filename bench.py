"""Training-throughput benchmark on the flagship AIShell-1 Conformer.

Metric: audio-seconds of speech processed per wall-clock second per chip
during training (forward + backward + Adam update, bf16 compute).

Batch sizing: the reference recipe's max_frames_in_batch=10000 is a GPU
memory limit; v5e HBM fits 80000 frames/step
(examples/aishell/conf/train_conformer_tpu.yaml).
Small batches are dispatch-latency-bound on the remote-tunnel chip;
80k frames/step keeps the MXU fed. (Pre-r3 scaling figures measured
with block_until_ready-only timing were ~6x inflated and are void.)

The output line also carries `mfu`: model FLOPs utilization computed
from the COMPILED program's own cost analysis (XLA flop count per step
x steps/sec / chip peak), so the throughput band (tunnel interference,
VERDICT r2 weak #2) can be decomposed into constant-MFU compute vs
variable host/tunnel overhead. If the remote (axon) executable exposes
no cost analysis, the SAME program is lowered+compiled on the CPU
backend in a subprocess (`--flops_only`) — XLA's dot/conv flop count
is backend-independent — and that figure is used. `flops_per_step` and
its source are reported alongside.

Baseline: BASELINE.json target of 5000 audio-sec/sec/chip
(vs_baseline = value / 5000). Prints ONE JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

import jax

# persistent compile cache shaves repeated-run startup
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

# ~80000 frames per step: 256 utts x ~3.1 s each. Env overrides let
# batch-scaling experiments reuse this file without editing the default.
B = int(os.environ.get("OPENEAT_BENCH_B", "256"))
T = int(os.environ.get("OPENEAT_BENCH_T", "312"))


def build_step(abstract: bool = False):
    """The benched computation: END-TO-END jitted train step on device —
    raw waveform -> fbank+SpecAugment frontend -> forward/backward ->
    Adam update (frontend measured at ~2% of step). abstract=True
    returns ShapeDtypeStructs instead of real arrays (nothing executes —
    for flop counting via lowering on any backend)."""
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_model
    from openeat_tpu.ops.frontend import FrontendConfig, compute_features
    from openeat_tpu.parallel.train_step import build_train_step, init_state
    from openeat_tpu.utils.optim import build_optimizer

    n_samples = T * 160 + 240  # samples yielding exactly T fbank frames
    model = _flagship_model()
    fcfg = FrontendConfig(num_mel_bins=80, spec_aug=True,
                          spec_aug_num_t=3, spec_aug_max_t=50,
                          spec_aug_num_f=2, spec_aug_max_f=10)
    proto = _example_batch(b=B, t=T, f=80, l=24)
    proto["features_length"] = jnp.full((B,), T, jnp.int32)

    tx, _ = build_optimizer(1e-3, 25000)
    if abstract:
        state = jax.eval_shape(lambda: init_state(model, tx, proto))
        wav = jax.ShapeDtypeStruct((B, n_samples), jnp.float32)
        wav_lens = jax.ShapeDtypeStruct((B,), jnp.int32)
    else:
        rng_np = np.random.default_rng(0)
        wav = jnp.asarray((rng_np.standard_normal((B, n_samples)) * 3000
                           ).astype(np.float32))
        wav_lens = jnp.full((B,), n_samples, jnp.int32)
        state = init_state(model, tx, proto)
    train_step = build_train_step(model, tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def e2e_step(state, wav, wav_lens, targets, target_lens, rng):
        k1, k2 = jax.random.split(rng)
        feats, flens = compute_features(wav, wav_lens, k1, fcfg, True)
        batch = {"features": feats, "features_length": flens,
                 "targets": targets, "targets_length": target_lens}
        return train_step(state, batch, k2)

    targets = (jax.eval_shape(lambda: proto["targets"]) if abstract
               else proto["targets"])
    target_lens = (jax.eval_shape(lambda: proto["targets_length"])
                   if abstract else proto["targets_length"])
    args = (wav, wav_lens, targets, target_lens)
    return e2e_step, state, args


def compiled_flops(e2e_step, state, args, rng,
                   compiled: bool = True) -> float | None:
    """XLA flop count of the step. compiled=True asks the compiled
    executable (optimized HLO); False runs HloCostAnalysis on the
    lowered module — no compile, works with abstract args."""
    try:
        low = e2e_step.lower(state, *args, rng)
        ca = (low.compile() if compiled else low).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = (ca or {}).get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def main():
    e2e_step, state, args = build_step()
    from openeat_tpu.utils.common import train_prng
    rng = train_prng(0)

    # warmup / compile
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, metrics = e2e_step(state, *args, k)
    # VALUE fetch: block_until_ready acks before remote execution on
    # the axon proxy, so warmup could bleed into the first window
    float(np.asarray(metrics["loss"]))

    # K-differenced honest windows. Each window chains K donated steps
    # (step i+1 consumes step i's state, so nothing can be elided) and
    # ends with ONE real device->host scalar VALUE fetch — a transfer
    # cannot complete before every chained step has executed, so the
    # window is honest even though the axon IFRT proxy acks readiness
    # before remote execution finishes (block_until_ready-only timing
    # over-reported ~6x, see benchmarks/step_time_diag.py). The fetch
    # itself costs ~1 tunnel RTT; differencing two window sizes cancels
    # that fixed overhead: per_step = (t(K2)-t(K1))/(K2-K1). Best-of-3
    # per window size rides out tunnel interference (±10%).
    def window(k):
        nonlocal state, rng
        t0 = time.perf_counter()
        for _ in range(k):
            rng, kk = jax.random.split(rng)
            state, metrics = e2e_step(state, *args, kk)
        float(np.asarray(metrics["loss"]))
        return time.perf_counter() - t0

    # PAIRED windows: each rep times k1 then k2 back-to-back and the
    # slope is the min over reps of the paired difference, so tunnel
    # interference hits both windows of a pair alike (ADVICE r3 med #1)
    k1, k2 = 5, 25
    pairs = [(window(k1), window(k2)) for _ in range(3)]
    t1 = min(a for a, _ in pairs)
    t2 = min(b for _, b in pairs)
    diffs = [(b - a) / (k2 - k1) for a, b in pairs if b > a]
    # pathological interference draw: fall back to the conservative
    # undifferenced figure
    per_step = min(diffs) if diffs else t2 / k2
    steps_per_sec = 1.0 / per_step
    n_samples = T * 160 + 240
    value = steps_per_sec * (B * n_samples / 16000.0)

    rng, k = jax.random.split(rng)
    flops_per_step = compiled_flops(e2e_step, state, args, k)
    flops_src = "device"
    if flops_per_step is None:
        # same program, CPU backend, fresh subprocess (the axon plugin
        # owns this process's backend registry)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PALLAS_AXON_POOL_IPS="")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--flops_only"], env=env, capture_output=True,
                text=True, timeout=1800, check=True)
            flops_per_step = json.loads(out.stdout.strip().splitlines()[-1]
                                        )["flops_per_step"]
            flops_src = ("cpu_lowering" if flops_per_step
                         else "unavailable")
        except Exception:
            flops_src = "unavailable"
    # bf16 dense peak per chip; device_kind strings as the axon/libtpu
    # runtimes report them
    peaks = {"TPU v5 lite": 197e12, "TPU v5e": 197e12,
             "TPU v5p": 459e12, "TPU v5": 459e12, "TPU v4": 275e12,
             "TPU v6 lite": 918e12, "TPU v6e": 918e12,
             "TPU v7": 2307e12}
    kind = jax.devices()[0].device_kind
    peak = next((v for pat, v in peaks.items() if pat in kind), None)
    mfu = (round(flops_per_step * steps_per_sec / peak, 4)
           if flops_per_step and peak else None)
    print(json.dumps({
        "metric": "train_throughput_audio_sec_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / 5000.0, 3),
        "mfu": mfu,
        "flops_per_step": flops_per_step,
        "flops_source": flops_src,
        "per_step_ms": round(per_step * 1e3, 2),
        "fetch_overhead_ms": round(max(t1 - k1 * per_step, 0.0) * 1e3, 1),
        "device_kind": kind,
    }))


def flops_only():
    e2e_step, state, args = build_step(abstract=True)
    rng_s = jax.ShapeDtypeStruct((2,), np.uint32)
    f = compiled_flops(e2e_step, state, args, rng_s, compiled=False)
    print(json.dumps({"flops_per_step": f,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    if "--flops_only" in sys.argv:
        flops_only()
    else:
        main()
