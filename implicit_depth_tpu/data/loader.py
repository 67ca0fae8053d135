"""Threaded prefetching batch loader.

Replaces torch DataLoader worker processes (train_bd.py:84-114): a thread
pool maps dataset.__getitem__, a bounded queue keeps `prefetch` collated
batches ready, and (optionally) batches are placed on device/sharded
while the TPU is busy with the previous step. Python threads suffice
because the heavy lifting (PIL decode, numpy) releases the GIL.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

from implicit_depth_tpu.data.mvs_dataset import collate


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
        device_put_fn: Optional[Callable] = None,
        epochs: Optional[int] = None,  # None = loop forever
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.device_put_fn = device_put_fn
        self.epochs = epochs
        self.rng = np.random.RandomState(seed)
        self._stop = threading.Event()

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_stream(self):
        epoch = 0
        n = len(self.dataset)
        while self.epochs is None or epoch < self.epochs:
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
            stop = n - (n % self.batch_size) if self.drop_last else n
            for s in range(0, stop, self.batch_size):
                yield order[s : s + self.batch_size]
            epoch += 1

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        SENTINEL = object()

        def produce():
            try:
                for idxs in self._index_stream():
                    if self._stop.is_set():
                        break
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    batch = collate(samples)
                    if self.device_put_fn is not None:
                        batch = self.device_put_fn(batch)
                    q.put(batch)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                yield item
        finally:
            self._stop.set()
            pool.shutdown(wait=False)

    def stop(self):
        self._stop.set()
