"""Host->device feeding: collated batches -> sharded device batches with
on-device feature extraction.

This is the seam between the host data pipeline (openeat_tpu.dataset)
and the jitted train/decode programs: waveform batches are device_put
with the mesh's data-parallel sharding and pushed through the jitted
frontend (openeat_tpu.ops.frontend.compute_features); precomputed
feature batches pass straight through. jax's async dispatch overlaps the
next batch's transfer+frontend with the current train step, replacing
the reference's DataLoader worker processes + pinned-memory prefetch
(reference openeat/bin/train.py:41-44,110-116).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import numpy as np

from openeat_tpu.ops.frontend import FrontendConfig, compute_features
from openeat_tpu.parallel import mesh as mesh_lib


class DeviceFeeder:
    """Wraps a loader yielding (keys, host_batch) into device batches."""

    def __init__(self, loader: Iterable, frontend: FrontendConfig,
                 mesh=None, train: bool = True, seed: int = 0,
                 pad_batch_multiple: int = 1, accum_grad: int = 1,
                 device_prefetch: int = 1):
        self.loader = loader
        self.frontend = frontend
        self.mesh = mesh
        self.train = train
        self.seed = seed
        self.pad_batch_multiple = max(1, pad_batch_multiple)
        # accum_grad > 1 splits every host batch into [accum, micro, ...]
        # for the lax.scan micro-batching inside the jitted train step
        # (parallel.train_step.build_train_step contract). The effective
        # batch per optimizer step is unchanged; accumulation trades peak
        # activation memory for scan steps (reference executor.py:42-63
        # instead groups loader batches — equivalent up to batch_size).
        self.accum_grad = max(1, accum_grad)
        # device_prefetch > 0 stages that many batches ahead on a
        # feeder thread: the next batch's host->device copy (the only
        # part of device_put that blocks the caller — ~5-20 ms/batch on
        # the remote tunnel, docs/AXON_NOTES.md) overlaps the current
        # train step instead of serializing with it. jax dispatch is
        # thread-safe and data dependencies flow through the arrays, so
        # consumer-side ordering is unchanged. 0 disables the thread.
        self.device_prefetch = max(0, device_prefetch)
        self.epoch = 0

    def __len__(self):
        return len(self.loader)

    def _pad_batch_dim(self, batch: dict) -> dict:
        """Round the batch dim up by repeating utterances — keeps the
        number of compiled program shapes bounded (XLA static shapes)."""
        m = self.pad_batch_multiple * self.accum_grad
        b = next(iter(batch.values())).shape[0]
        if m <= 1 or b % m == 0:
            return batch
        pad = m - b % m
        idx = np.concatenate([np.arange(b), np.arange(pad) % b])
        return {k: v[idx] for k, v in batch.items()}

    def _split_accum(self, batch: dict) -> dict:
        """Host-side [accum*micro, ...] -> [accum, micro, ...] reshape.

        Done on the host so the micro-batch axis keeps the 'data'
        sharding with no device-side all-to-all (a device reshape of a
        batch-sharded axis would re-shuffle rows across chips)."""
        a = self.accum_grad
        return {k: v.reshape((a, v.shape[0] // a) + v.shape[1:])
                for k, v in batch.items()}

    def __iter__(self) -> Iterator[tuple[list, dict]]:
        if self.device_prefetch <= 0:
            yield from self._device_batches()
            return
        # Bounded handoff queue: the producer thread runs the host
        # collate drain + device_put + frontend dispatch for batch i+1
        # while the consumer's train step for batch i executes.
        import queue as queue_mod
        import threading

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.device_prefetch)
        _END = object()
        # Consumer-abandonment signal: if the consumer stops iterating
        # early (exception, break, GC of the generator), the bounded
        # q.put would otherwise block the producer thread forever and
        # pin device_prefetch+1 staged device batches for the process
        # lifetime. The producer polls this event between put attempts.
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def _produce():
            try:
                for item in self._device_batches():
                    if not _put(item):
                        return
                _put(_END)
            except BaseException as e:  # surface in the consumer
                _put(e)

        t = threading.Thread(target=_produce, daemon=True,
                             name="device-feeder")
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so a producer blocked mid-put exits promptly and the
            # staged device batches it holds are released.
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass
            t.join(timeout=5.0)

    def _device_batches(self) -> Iterator[tuple[list, dict]]:
        from openeat_tpu.utils.common import train_prng
        rng = train_prng(self.seed + self.epoch)
        self.epoch += 1
        multihost = jax.process_count() > 1
        accum = self.accum_grad
        for keys, batch in self.loader:
            batch = self._pad_batch_dim(batch)
            if accum > 1:
                batch = self._split_accum(batch)
            baxis = 1 if accum > 1 else 0
            if self.mesh is not None and multihost:
                # multi-controller: this process holds its local shard of
                # the global batch; assemble the global jax.Array from
                # per-process data (reference DistributedSampler + DDP
                # analog). Global batch dim = local * process_count.
                shardings = mesh_lib.batch_shardings(batch, self.mesh,
                                                     batch_axis=baxis)
                batch = jax.tree.map(
                    lambda x, s: jax.make_array_from_process_local_data(
                        s, np.asarray(x)), batch, shardings)
            elif self.mesh is not None:
                shardings = mesh_lib.batch_shardings(batch, self.mesh,
                                                     batch_axis=baxis)
                batch = jax.device_put(batch, shardings)
            else:
                batch = jax.device_put(batch)
            if "wav" in batch:
                rng, k = jax.random.split(rng)
                if accum > 1:
                    feats, flens = jax.vmap(
                        lambda w, l, kk: compute_features(
                            w, l, kk, self.frontend, self.train))(
                        batch["wav"], batch["wav_lens"],
                        jax.random.split(k, accum))
                else:
                    feats, flens = compute_features(
                        batch["wav"], batch["wav_lens"], k, self.frontend,
                        self.train)
                out = {"features": feats, "features_length": flens}
                if "targets" in batch:
                    out["targets"] = batch["targets"]
                    out["targets_length"] = batch["targets_length"]
            else:
                from openeat_tpu.ops.frontend import augment_features
                out = {k: v for k, v in batch.items()
                       if k in ("features", "features_length", "targets",
                                "targets_length")}
                rng, k = jax.random.split(rng)
                if accum > 1:
                    out["features"] = jax.vmap(
                        lambda f, l, kk: augment_features(
                            f, l, kk, self.frontend, self.train))(
                        out["features"], out["features_length"],
                        jax.random.split(k, accum))
                else:
                    out["features"] = augment_features(
                        out["features"], out["features_length"], k,
                        self.frontend, self.train)
            yield keys, out
