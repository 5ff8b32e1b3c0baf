"""Epoch-level training/eval executor.

Parity: reference openeat/utils/executor.py:11-113 — one `train()` epoch
with running loss/acc/lr logging every `log_interval` batches, non-finite
loss excluded from the running stats, and a no-grad `cv()` loop.

The mechanics that lived in the reference's python loop (grad
accumulation, clipping, non-finite step skip, scheduler stepping) are
compiled into the jitted train step (parallel.train_step); this class is
the thin host loop that feeds sharded device batches and aggregates
logs. Host->device transfer overlaps compute via jax's async dispatch;
the feeder prefetches the next batch while the step runs.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Iterable

import jax
import numpy as np


class Executor:
    def __init__(self, train_step: Callable, eval_step: Callable,
                 schedule: Callable | None = None, log_interval: int = 100,
                 logger: logging.Logger | None = None,
                 metrics_file: str | None = None):
        self.train_step = train_step
        self.eval_step = eval_step
        self.schedule = schedule
        self.log_interval = log_interval
        self.logger = logger or logging.getLogger("openeat_tpu")
        self.metrics_file = metrics_file

    def _emit(self, record: dict) -> None:
        """Append a metrics record to the JSONL stream (tensorboard-free
        observability; the reference has none, SURVEY.md §5)."""
        if self.metrics_file:
            import json
            with open(self.metrics_file, "a") as f:
                f.write(json.dumps(record) + "\n")

    def train(self, state, batches: Iterable[dict], rng,
              epoch: int = 0) -> tuple[Any, dict]:
        """One epoch. `batches` yields device-ready dict batches."""
        n_batches = 0
        # device-side running sums over EVERY batch (reference
        # executor.py:65-75 accumulates per-batch; doing it with lazy
        # device adds avoids a host sync per step — log_interval only
        # gates log emission)
        run_loss, run_acc, run_ok = 0.0, 0.0, 0.0
        t0 = time.time()
        frames = 0
        jnp = jax.numpy
        for i, batch in enumerate(batches):
            rng, step_rng = jax.random.split(rng)
            state, metrics = self.train_step(state, batch, step_rng)
            loss_dev = metrics["loss"]
            ok = jnp.isfinite(loss_dev)
            run_loss = run_loss + jnp.where(ok, loss_dev, 0.0)
            run_acc = run_acc + jnp.where(ok, metrics.get("acc", 0.0), 0.0)
            run_ok = run_ok + ok
            if (i + 1) % self.log_interval == 0:
                metrics = jax.device_get(metrics)
                loss = float(metrics["loss"])
                lr = (float(self.schedule(int(state.step)))
                      if self.schedule else float("nan"))
                self.logger.info(
                    "epoch %d batch %d loss %.4f acc %.4f lr %.6g "
                    "gnorm %.2f", epoch, i + 1, loss,
                    float(metrics.get("acc", 0.0)), lr,
                    float(metrics.get("grad_norm", 0.0)))
                rec = {"kind": "train", "epoch": epoch,
                       "batch": i + 1, "step": int(state.step),
                       "loss": loss,
                       "acc": float(metrics.get("acc", 0.0)),
                       "lr": lr,
                       "grad_norm": float(metrics.get("grad_norm", 0.0)),
                       "time": time.time()}
                if "moe_aux" in metrics:
                    # router health: ~1.0 = balanced load (Switch aux is
                    # E * sum_e f_e * P_e, minimized at uniform routing)
                    rec["moe_aux"] = float(metrics["moe_aux"])
                self._emit(rec)
            n_batches += 1
            fl = batch.get("features_length")
            if fl is not None:
                # async device-side accumulation — no host sync per step
                frames = frames + jax.numpy.sum(fl)
        frames = int(jax.device_get(frames)) if n_batches else 0  # drains
        n_seen = float(jax.device_get(run_ok)) if n_batches else 0.0
        tot_loss = float(jax.device_get(run_loss)) if n_batches else 0.0
        tot_acc = float(jax.device_get(run_acc)) if n_batches else 0.0
        dt = time.time() - t0
        summary = {
            "train_loss": tot_loss / max(n_seen, 1),
            "train_acc": tot_acc / max(n_seen, 1),
            "batches": n_batches,
            "epoch_time_s": dt,
            "frames_per_s": frames / max(dt, 1e-9),
            "audio_sec_per_s": frames * 0.01 / max(dt, 1e-9),
        }
        self._emit({"kind": "epoch", "epoch": epoch, **summary,
                    "time": time.time()})
        return state, summary

    def cv(self, params, batches: Iterable[dict], epoch: int = 0) -> dict:
        """No-grad eval loop (reference executor.py:79-113), weighted by
        batch size like the reference's num_seen_utts accumulation.
        Sums run device-side (one host sync at the end, not per batch)."""
        jnp = jax.numpy
        run_loss, run_acc, n_utts, n_batches = 0.0, 0.0, 0.0, 0
        for i, batch in enumerate(batches):
            metrics = self.eval_step(params, batch)
            bsz = int(np.prod(np.asarray(
                batch["features_length"].shape)))  # [B] or [accum, B]
            loss = metrics["loss"]
            ok = jnp.isfinite(loss)
            run_loss = run_loss + jnp.where(ok, loss, 0.0) * bsz
            run_acc = run_acc + jnp.where(ok, metrics.get("acc", 0.0),
                                          0.0) * bsz
            n_utts = n_utts + ok * bsz
            n_batches += 1
            if (i + 1) % self.log_interval == 0:
                self.logger.info("cv epoch %d batch %d loss %.4f", epoch,
                                 i + 1, float(loss))
        if n_batches:
            run_loss, run_acc, n_utts = map(
                float, jax.device_get((run_loss, run_acc, n_utts)))
        return {"cv_loss": run_loss / max(n_utts, 1),
                "cv_acc": run_acc / max(n_utts, 1)}
