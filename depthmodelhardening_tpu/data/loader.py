"""Threaded prefetch pipeline: host decode -> device batches.

TPU-native replacement for PyTorch DataLoader worker processes
(trainer.py:181-191, num_workers=12): a thread pool decodes/stacks numpy
items while the accelerator trains, and finished batches are moved to
device (optionally pre-sharded over a mesh) one step ahead so the jitted
step never waits on the host. Threads (not processes) suffice because
PIL decode and numpy stacking release the GIL.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np

from ..parallel.mesh import batch_sharding


class PrefetchLoader:
    """Batched, shuffled, prefetched iterator over an indexable dataset.

    dataset: object with __len__ and a get(index, rng) -> item callable
      (defaults to __getitem__ / get_item).
    collate: items -> batch pytree of numpy arrays.
    """

    def __init__(self, dataset, batch_size: int, collate: Callable,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, num_threads: int = 8,
                 prefetch: int = 2, mesh=None,
                 item_fn: Optional[Callable] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.mesh = mesh
        self.item_fn = item_fn or (
            lambda ds, i, rng: ds.get_item(i, rng)
            if hasattr(ds, "get_item") else ds[i])
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _device_put(self, batch):
        if self.mesh is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        sh = batch_sharding(self.mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), sh), batch)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.dataset))
        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        if self.shuffle:
            rng.shuffle(order)

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            """put that re-checks stop so an abandoned iterator (early
            break) can't leave the producer blocked on a full queue."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    seeds = rng.randint(0, 2 ** 31, size=len(idxs))
                    items = list(pool.map(
                        lambda a: self.item_fn(
                            self.dataset, int(a[0]),
                            np.random.RandomState(int(a[1]))),
                        zip(idxs, seeds)))
                    if not _put(self.collate(items)):
                        return
            _put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield self._device_put(batch)
        finally:
            stop.set()
