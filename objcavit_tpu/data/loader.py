"""Host batching + async device prefetch.

Replaces the reference's torch DataLoader worker pools (GraphBinsLM.py:489-549)
with a single background thread that assembles numpy batches and device_puts
them with the batch dim sharded over the mesh's data axis, keeping at most
``prefetch`` batches in flight so host IO overlaps device compute.

Batch contract (all fixed-shape, NHWC): {'image', 'depth'} float32; eval
batches keep per-sample path/focal metadata on host.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np

from objcavit_tpu.parallel.distributed import (
    process_local_indices,
    shard_host_local_batch,
)
from objcavit_tpu.parallel.mesh import shard_batch


class DeviceLoader:
    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        mesh: Any,
        shuffle: bool = False,
        seed: int = 42,
        drop_last: bool = False,
        prefetch: int = 2,
        pad_final: bool = True,
        host_hook=None,
        synchronous: bool = False,
    ):
        """host_hook(batch_np) -> dict of extra arrays, computed in the
        prefetch thread on the *host* batch before upload (e.g. the object
        provider) — never a device->host round trip on the training path.

        synchronous=True disables the prefetch thread (reference --debug /
        num_workers=0 semantics). Also required on 1-core hosts running many
        virtual CPU devices: a competing loader thread can starve XLA's
        collective rendezvous past its 40s termination timeout."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.pad_final = pad_final
        self.host_hook = host_hook
        self.synchronous = synchronous
        self.epoch = 0
        self._rng = np.random.default_rng(seed)
        # multi-process (multi-host) run: every process sees the SAME global
        # batch schedule (same seed -> same shuffle) but loads only its
        # [process_id::process_count] rows of each batch, then assembles the
        # global device batch from the local shards
        # (parallel/distributed.shard_host_local_batch). torch
        # DistributedSampler semantics, what Lightning DDP gave the
        # reference's loaders (main.py:129-131). The assembled global batch
        # holds each process's rows as a contiguous block, i.e. a PERMUTED
        # sample order vs single-process — losses, gradients, and metrics
        # are permutation-invariant across the batch dim, so the training
        # semantics are unchanged.
        import jax

        self._pid = jax.process_index()
        self._pc = jax.process_count()
        if self._pc > 1 and batch_size % self._pc != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide the "
                f"{self._pc}-process run (each process loads "
                f"batch_size/process_count samples)"
            )

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _host_batches(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size]
            if len(idxs) < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_final:
                    # pad with wrapped samples; 'valid' marks the real ones
                    pad = order[: self.batch_size - len(idxs)]
                    valid = np.concatenate(
                        [np.ones(len(idxs), bool), np.zeros(len(pad), bool)]
                    )
                    idxs = np.concatenate([idxs, pad])
                else:
                    valid = np.ones(len(idxs), bool)
            else:
                valid = np.ones(len(idxs), bool)
            if self._pc > 1:  # this process's interleave of the global batch
                idxs = process_local_indices(idxs, self._pid, self._pc)
                valid = process_local_indices(valid, self._pid, self._pc)
            fast = None
            if hasattr(self.dataset, "get_batch"):
                # native threaded batch assembly (csrc assemble_batch_f32);
                # bit-identical to the per-sample path, same RNG stream
                fast = self.dataset.get_batch(idxs, self._rng)
            if fast is not None:
                batch, meta = fast
                batch["sample_valid"] = valid
                yield batch, meta
                continue
            samples = [self.dataset.get(int(i), self._rng) for i in idxs]
            batch = {
                "image": np.stack([s["image"] for s in samples]),
                "depth": np.stack([s["depth"] for s in samples]),
                "sample_valid": valid,
            }
            meta = {
                "focal": [s["focal"] for s in samples],
                "image_path": [s["image_path"] for s in samples],
                "depth_path": [s["depth_path"] for s in samples],
            }
            yield batch, meta

    def _apply_hook(self, batch: dict, meta: dict) -> None:
        """Merge host_hook output; '_'-prefixed keys are host-only metadata
        (e.g. detection annotations) and go to meta, not the device."""
        if self.host_hook is None:
            return
        extra = self.host_hook(batch)
        for k in [k for k in extra if k.startswith("_")]:
            meta[k] = extra.pop(k)
        batch.update(extra)

    def _put(self, batch):
        if self._pc > 1:
            return shard_host_local_batch(self.mesh, batch)
        return shard_batch(self.mesh, batch)

    def __iter__(self):
        if self.synchronous:
            for batch, meta in self._host_batches():
                self._apply_hook(batch, meta)
                yield self._put(batch), meta
            self.epoch += 1
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for batch, meta in self._host_batches():
                    self._apply_hook(batch, meta)
                    q.put((self._put(batch), meta))
                q.put(stop)
            except BaseException as e:  # surface errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        self.epoch += 1
