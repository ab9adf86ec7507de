"""Host input pipeline: threaded batch assembly + device prefetch.

Replaces the reference's torch DataLoader workers (reference
`train_t2i_discrete.py:266-270`) with a TPU-appropriate pipeline:

  * a thread pool assembles numpy batches (per-sample `.npy` reads release the
    GIL inside numpy/PIL),
  * finished batches are `jax.device_put` with the mesh batch sharding one step
    ahead of consumption (double buffering), so the TPU never waits on host IO.
"""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import jax
import numpy as np


def _collate(samples):
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(np.stack([s[i] for s in samples]) for i in range(len(first)))
    return np.stack(samples)


class Loader:
    """Infinite shuffled batch iterator over a map-style dataset.

    Multi-process (multi-host) contract: `batch_size` is always the GLOBAL
    batch.  Every process computes the SAME shuffle (so `seed` must be
    process-consistent) but loads and yields only the rows its addressable
    devices own — by default the contiguous process-major
    `batch_size / process_count` slice; pass `local_rows` (computed from the
    actual batch sharding via `parallel.mesh.process_batch_slice`) when the
    layout replicates batch rows across processes (e.g. a pp axis spanning
    hosts needs the FULL batch on every host).  `prefetch_to_device` then
    assembles the global array with `jax.make_array_from_process_local_data`.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        local_rows: slice = None,
    ):
        assert len(dataset) >= batch_size, "dataset smaller than one batch"
        assert batch_size % process_count == 0, (
            f"global batch {batch_size} not divisible by {process_count} processes"
        )
        if process_count > 1 and not drop_last:
            # A partial final batch would slice UNEQUAL (possibly empty) row
            # counts per process with the fixed local_slice, and the processes
            # would then disagree on the global shape inside
            # jax.make_array_from_process_local_data — refuse up front.
            raise ValueError(
                "drop_last=False is not supported with process_count>1: the "
                "final partial batch cannot be split evenly across processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pool = ThreadPoolExecutor(max_workers=num_workers) if num_workers > 0 else None
        self.rng = random.Random(seed)
        if local_rows is not None:
            self.local_slice = local_rows
        else:
            per = batch_size // process_count
            self.local_slice = slice(process_index * per, (process_index + 1) * per)
        self._pending: tuple = ()  # (epoch indices, start batch) set by skip()

    def _epoch_indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _n_batches(self, idx) -> int:
        nb = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            nb += 1
        return nb

    def skip(self, n_batches: int):
        """Fast-forward the stream by `n_batches` WITHOUT loading any sample —
        index-only, O(n/dataset_epoch) shuffles.  After `skip(k)`, iteration
        yields exactly the batches a fresh loader would have yielded from
        position k: deterministic data resume (the shuffle seed is the
        checkpointed quantity; the reference's torch loader replays from
        scratch after a restart)."""
        assert not self._pending, "skip() must precede iteration"
        while n_batches > 0:
            idx = self._epoch_indices()
            nb = self._n_batches(idx)
            if nb == 0:
                # drop_last with dataset < batch_size: every epoch is empty, so
                # any skip target is unreachable — fail loudly, don't spin.
                raise ValueError(
                    f"cannot skip {n_batches} batches: an epoch yields 0 "
                    f"batches (dataset {len(self.dataset)} < global batch "
                    f"{self.batch_size} with drop_last)"
                )
            if n_batches >= nb:
                n_batches -= nb
            else:
                self._pending = (idx, n_batches)
                return

    def epoch(self) -> Iterator[Any]:
        """One pass over the data (this process's slice of each global batch)."""
        if self._pending:
            idx, start = self._pending
            self._pending = ()
        else:
            idx, start = self._epoch_indices(), 0
        for b in range(start, self._n_batches(idx)):
            batch_idx = idx[b * self.batch_size : (b + 1) * self.batch_size]
            batch_idx = batch_idx[self.local_slice]
            if self.pool is not None:
                samples = list(self.pool.map(self.dataset.__getitem__, batch_idx))
            else:
                samples = [self.dataset[i] for i in batch_idx]
            yield _collate(samples)

    def __iter__(self) -> Iterator[Any]:
        """Infinite stream (the reference wraps its loader in a while-True
        generator, `train_t2i_discrete.py:368-373`)."""
        while True:
            yield from self.epoch()


def prefetch_to_device(iterator, sharding, size: int = 2,
                       cast_f32=None, cast_int=None,
                       global_batch: int = None) -> Iterator[Any]:
    """Move batches onto the mesh `size` steps ahead of consumption.

    Uses a background thread so host collation overlaps device compute; each
    yielded batch is already a sharded global jax.Array.

    `cast_f32`: optional dtype (e.g. ml_dtypes.bfloat16) to cast float32
    fields to ON HOST before the transfer — halves host->device bytes.
    Fields the bf16-compute model consumes directly (e.g. CLIP context) are
    bit-identical to casting on device; fields that feed f32 math first
    (e.g. VAE moments before the reparameterized sample) are rounded to bf16
    precision, comparable to the reference's fp16-autocast feed.

    `cast_int`: optional narrow integer dtype (e.g. np.uint8) for int32/int64
    fields.  LOSSLESS by contract: the caller asserts the field's value range
    fits (the 8-bit analog-bits codec already requires panoptic ids < 256 —
    `diffusion/analog_bits.py`), and this function verifies each batch and
    raises on overflow rather than silently wrapping.  Shipping 32-bit ids
    with 8 bits of entropy wastes 4x the link bytes on any transport.

    Multi-process: each process's iterator yields its LOCAL row slice of the
    global batch (see `Loader`); the global sharded array is assembled with
    `jax.make_array_from_process_local_data`, which places each addressable
    shard from the local rows — `device_put` alone cannot build an array
    spanning non-addressable devices.
    """
    import numpy as np

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()
    n_proc = jax.process_count()

    def put(batch):
        def one(x):
            if cast_f32 is not None and getattr(x, "dtype", None) == np.float32:
                x = np.asarray(x).astype(cast_f32)
            if cast_int is not None and getattr(x, "dtype", None) in (
                np.dtype(np.int32), np.dtype(np.int64)
            ):
                x = np.asarray(x)
                info = np.iinfo(cast_int)
                lo, hi = int(x.min()), int(x.max())
                if lo < info.min or hi > info.max:
                    raise ValueError(
                        f"cast_int={np.dtype(cast_int).name}: batch int field "
                        f"range [{lo}, {hi}] exceeds [{info.min}, {info.max}]"
                    )
                x = x.astype(cast_int)
            if n_proc == 1:
                return jax.device_put(x, sharding)
            x = np.asarray(x)
            # `global_batch` must come from the caller when the local rows are
            # not a disjoint 1/n_proc slice (batch replicated across hosts,
            # e.g. a pp axis spanning processes — the local rows ARE the full
            # batch there and multiplying by n_proc would be wrong).
            rows = global_batch if global_batch is not None else x.shape[0] * n_proc
            global_shape = (rows, *x.shape[1:])
            return jax.make_array_from_process_local_data(sharding, x, global_shape)

        return jax.tree.map(one, batch)

    def worker():
        # Data-pipeline errors must surface in the consumer, not silently
        # truncate the stream: a corrupt .npy would otherwise look like a
        # clean end-of-data and abort training as a bare StopIteration.
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                q.put(put(batch))
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
