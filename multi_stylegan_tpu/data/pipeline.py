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
        # Multi-host input pipeline (SURVEY.md §2.5): every process draws the
        # SAME epoch permutation (same seed), loads only its process-major
        # slice of each global batch, and assembles the global array from
        # process-local data.  Requires the dataset (or an identical copy)
        # to be visible on every host.  Exercised for real at
        # process_count=2 by tests/test_multihost.py.
        self._n_proc = jax.process_count() if sharding is not None else 1
        self._pid = jax.process_index() if sharding is not None else 0
        if self._n_proc > 1 and batch_size % self._n_proc:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{self._n_proc} processes"
            )
        if self._n_proc > 1 and not drop_last:
            raise ValueError(
                "multi-process loading requires drop_last=True (a partial "
                "final batch cannot be assembled across processes)"
            )
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
                sel = idx[lo : lo + self.batch_size]
                if self._n_proc > 1:
                    per = self.batch_size // self._n_proc
                    sel = sel[self._pid * per : (self._pid + 1) * per]
                batch = self._load_batch(sel)
                if self._n_proc > 1:
                    batch = jax.make_array_from_process_local_data(
                        self.sharding, batch)
                elif self.sharding is not None:
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
