"""Host input pipeline: shuffled, dropped-last, prefetching batch loader.

Replaces the reference's torch DataLoader (reference
train_multi_stylegan.py:60-63: shuffle, drop_last, workers, pin_memory) with
a numpy batcher + background thread prefetch + async device_put (sharded over
the mesh's data axis when given).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class BatchLoader:
    """Iterates epochs of shuffled [B, ...] batches from an indexable
    dataset, dropping the last partial batch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        self._rng = np.random.default_rng(seed)
        if len(dataset) < batch_size and drop_last:
            raise ValueError(
                f"dataset of {len(dataset)} samples cannot fill a batch of {batch_size}"
            )

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _load_batch(self, indices: np.ndarray) -> np.ndarray:
        if self.num_workers > 1 and len(indices) > 1:
            from concurrent.futures import ThreadPoolExecutor

            if not hasattr(self, "_pool"):
                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            items = list(self._pool.map(self.dataset.__getitem__, indices))
        else:
            items = [self.dataset[i] for i in indices]
        return np.stack(items)

    def __iter__(self) -> Iterator:
        idx = self._epoch_indices()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def producer():
            for b in range(n_batches):
                lo = b * self.batch_size
                batch = self._load_batch(idx[lo : lo + self.batch_size])
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                q.put(batch)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
