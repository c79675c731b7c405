"""Host-side batch loader with threaded prefetch and device double-buffering.

Replaces the reference's torch DataLoader worker processes
(``data_simbev.py:339-352``) with a thread pool: PIL decode and numpy work
release the GIL, and thread workers avoid fork/IPC overhead while the TPU
step runs asynchronously. ``prefetch_to_device`` keeps ``size`` batches in
flight on-device so the host pipeline overlaps the XLA step (double
buffering).
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def _collate(items):
    """Stack a list of tuples-of-arrays into a tuple of batched arrays."""
    return tuple(np.stack([it[i] for it in items]) for i in range(len(items[0])))


class DataLoader:
    """Minimal map-style loader: shuffle, batch, drop_last, prefetch.

    Iterating yields tuples of numpy arrays with a leading batch dim.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4,
                 seed: int = 13, prefetch_batches: int = 2,
                 shard_index: int = 0, num_shards: int = 1,
                 pad_last: bool = False):
        """``shard_index``/``num_shards``: multi-host input sharding — each
        host iterates the same global shuffle but loads only its slice of
        every batch (pass ``jax.process_index()``/``jax.process_count()``).
        ``batch_size`` is the PER-HOST batch size.

        ``drop_last`` truncates the GLOBAL order to a multiple of
        ``num_shards * batch_size`` before sharding, so every host yields
        exactly the same batch count per epoch (hosts disagreeing on batch
        count deadlocks the first collective of the surplus step).

        ``pad_last`` (mutually exclusive with ``drop_last``) instead pads
        the global order to that multiple with wrap-around duplicate indices
        and appends an (B,) float32 validity mask as an 8th batch element —
        every batch has a static shape (one XLA compile) and masked eval
        counts each real sample exactly once.
        """
        if drop_last and pad_last:
            raise ValueError("drop_last and pad_last are mutually exclusive")
        if (num_shards > 1 and not (drop_last or pad_last)
                and len(dataset) % (batch_size * num_shards) != 0):
            # without equalization, per-host batch counts differ — the
            # surplus step deadlocks the first cross-host collective
            raise ValueError(
                f"len(dataset)={len(dataset)} is not a multiple of "
                f"batch_size*num_shards={batch_size * num_shards}; pass "
                "drop_last or pad_last so every host yields the same batch "
                "count per epoch")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = max(0, num_workers)
        self.prefetch_batches = max(1, prefetch_batches)
        self.shard_index = shard_index
        self.num_shards = max(1, num_shards)
        self._epoch = 0
        self._seed = seed

    def set_epoch(self, epoch: int):
        """Pin the shuffle epoch (resume support): without this a resumed
        run's loader restarts at epoch 0 and replays the exact shuffle
        orders already consumed before preemption."""
        self._epoch = int(epoch)

    def __len__(self):
        """Per-host batch count (identical on every host)."""
        n = len(self.dataset)
        chunk = self.batch_size * self.num_shards
        if self.drop_last:
            return n // chunk
        return (n + chunk - 1) // chunk

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # same seed on every host -> identical global order; each host
            # takes its interleaved slice
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        valid = np.ones(n, bool)
        chunk = self.batch_size * self.num_shards
        if self.drop_last:
            keep = (n // chunk) * chunk
            order, valid = order[:keep], valid[:keep]
        elif self.pad_last and n % chunk != 0:
            # pad to the chunk multiple so every host sees equal, full
            # batches; wrap-around duplicates are marked invalid and excluded
            # from scoring via the emitted mask
            padded = ((n + chunk - 1) // chunk) * chunk
            order = np.resize(order, padded)
            valid = np.concatenate([valid, np.zeros(padded - n, bool)])
        if self.num_shards > 1:
            order = order[self.shard_index::self.num_shards]
            valid = valid[self.shard_index::self.num_shards]
        return [(order[s:s + self.batch_size], valid[s:s + self.batch_size])
                for s in range(0, len(order), self.batch_size)]

    def _assemble(self, samples, valid):
        batch = _collate(samples)
        if self.pad_last:
            return batch + (valid.astype(np.float32),)
        return batch

    def __iter__(self) -> Iterator:
        batches = self._batch_indices()
        self._epoch += 1
        if self.num_workers == 0:
            for idx, valid in batches:
                yield self._assemble([self.dataset[int(i)] for i in idx],
                                     valid)
            return

        # one executor; a sliding window of per-sample futures keeps
        # prefetch_batches batches in flight. The finally (triggered by
        # normal exhaustion OR generator close) cancels cleanly.
        executor = ThreadPoolExecutor(self.num_workers)
        try:
            window = collections.deque()
            it = iter(batches)

            def submit(batch):
                idx, valid = batch
                return [executor.submit(self.dataset.__getitem__, int(i))
                        for i in idx], valid

            for _ in range(self.prefetch_batches):
                b = next(it, None)
                if b is not None:
                    window.append(submit(b))
            while window:
                futs, valid = window.popleft()
                b = next(it, None)
                if b is not None:
                    window.append(submit(b))
                yield self._assemble([f.result() for f in futs], valid)
        finally:
            executor.shutdown(wait=False, cancel_futures=True)


def stack_microbatches(iterator, accum_steps: int):
    """Group ``accum_steps`` consecutive host batches and stack each tuple
    element along a new leading axis: (B, ...) -> (accum_steps, B, ...).

    Feeds the gradient-accumulation train step (``make_train_step(...,
    accum_steps=A)``): one device transfer and one jitted step per A
    microbatches. A ragged tail (fewer than ``accum_steps`` batches left in
    the epoch) is DROPPED — the step's scan length is static, and the
    reference's train loader drops ragged tails the same way
    (``drop_last=True``, reference ``data_simbev.py:341``).
    """
    if accum_steps <= 1:
        yield from iterator
        return
    import itertools
    it = iter(iterator)
    while True:
        group = list(itertools.islice(it, accum_steps))
        if len(group) < accum_steps:
            return
        yield tuple(np.stack([g[j] for g in group])
                    for j in range(len(group[0])))


def prefetch_to_device(iterator, size: int = 2, device_put=None):
    """Wrap a host batch iterator with an N-deep prefetch queue; device
    placement happens on the CONSUMER thread.

    The producer thread does host work only (loader iteration). All jax
    calls (device_put and, upstream, the step itself) stay on one thread —
    some transports deadlock when jax is entered from multiple threads
    concurrently (observed with the remote TPU tunnel: a device_put in a
    producer racing a compile/transfer on the main thread hangs both).
    Compute/transfer overlap is preserved by the runtime's async dispatch:
    device_put returns immediately while the previous step executes.

    device_put: callable batch -> device batch (e.g. sharded placement);
    defaults to jax.device_put.
    """
    import jax
    if device_put is None:
        device_put = jax.device_put

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()
    err = []

    def producer():
        try:
            for batch in iterator:
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            # the sentinel MUST reach the consumer (a dropped sentinel
            # deadlocks it at epoch end); block with the stop-flag loop
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield device_put(item)
    finally:
        # consumer abandoned the iterator: unblock and join the producer so
        # interpreter teardown never kills a live thread mid-operation
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)


def compile_data(version, dataroot, data_aug_conf, grid_conf, bsz: int,
                 nworkers: int, parser_name: str = "segmentationdata",
                 drop_to_multiple_of: Optional[int] = None,
                 dataset_kwargs: Optional[dict] = None,
                 shard_index: int = 0, num_shards: int = 1):
    """Reference-parity loader factory (``data_simbev.py:315-354``).

    Returns (trainloader, valloader). ``version`` is unused (API compat).
    The val loader always pads its final batch to a static full shape with a
    validity mask (``pad_last``) — every batch is shardable over a device
    mesh, there is exactly one eval-compile shape, and the whole val set is
    scored exactly once (the reference's ``get_val_info`` evaluates the
    entire set, ``src/tools.py:243-270``).
    ``drop_to_multiple_of`` is kept for API compatibility but no longer
    drops anything (pad-and-mask supersedes it).
    ``dataset_kwargs``: extra SimBEVDataset options (orientation,
    extrinsic_noise, label_mode, label_classes).
    ``shard_index``/``num_shards``: multi-host input sharding — ``bsz`` is
    the PER-HOST batch size; each host loads its slice of every global
    batch of ``bsz * num_shards`` samples (equal batch counts guaranteed).
    """
    from lss_carla_tpu.data.simbev import SegmentationData, VizData
    parser = {"vizdata": VizData, "segmentationdata": SegmentationData}[parser_name]
    dataset_kwargs = dataset_kwargs or {}

    traindata = parser(dataroot, is_train=True, data_aug_conf=data_aug_conf,
                       grid_conf=grid_conf, **dataset_kwargs)
    valdata = parser(dataroot, is_train=False, data_aug_conf=data_aug_conf,
                     grid_conf=grid_conf, **dataset_kwargs)

    trainloader = DataLoader(traindata, batch_size=bsz, shuffle=True,
                             drop_last=True, num_workers=nworkers,
                             shard_index=shard_index, num_shards=num_shards)
    valloader = DataLoader(valdata, batch_size=bsz, shuffle=False,
                           pad_last=True, num_workers=nworkers,
                           shard_index=shard_index, num_shards=num_shards)
    return trainloader, valloader
