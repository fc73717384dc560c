"""Threaded host input pipeline with device prefetch.

Replaces the reference's 12-process torch DataLoader (trainer.py:69-71,
options.py:175-178): decode/resize threads release the GIL inside PIL/cv2, a
bounded queue keeps batches ready, and the consumer overlaps host→device
transfer with TPU compute by prefetching one batch ahead.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


class Subset:
    """Index-selected view of a map-style dataset (host sharding of datasets
    that are not manifest-backed, e.g. SyntheticDataset in multi-host runs)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]


class HostLoader:
    """Shuffling, batching, prefetching loader over a map-style dataset.

    Iterating yields ``(arrays, indices)``: the stacked item arrays and the
    dataset indices of the batch (for keyed side inputs like precomputed
    instance masks).

    Args:
        dataset: object with __len__ and __getitem__ → tuple of np arrays.
        batch_size: global host batch size.
        shuffle: reshuffle indices each epoch with a per-epoch seed.
        seed: base RNG seed (the reference's --seed is dead; here it is real).
        num_workers: decode threads.
        drop_last: drop the trailing partial batch (reference does,
            trainer.py:69-71).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator:
        return self.iter_batches(0)

    def iter_batches(self, skip: int = 0) -> Iterator:
        """Iterate the epoch, dropping the first ``skip`` batches WITHOUT
        decoding them — exact mid-epoch resume (`--resume auto`) re-enters
        the epoch at the interrupted batch. The shuffle order depends only on
        (seed, epoch), so a resumed process that sets ``loader.epoch`` to the
        interrupted epoch sees the identical sequence."""
        indices = self._epoch_indices()
        self.epoch += 1
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(skip, nb)
        ]
        nb = len(batches)

        import time

        job_q: "queue.Queue" = queue.Queue()
        results: dict[int, object] = {}
        lock = threading.Lock()
        stop = threading.Event()
        consumed = [0]  # consumer position, guarded by lock

        for bi, b in enumerate(batches):
            job_q.put((bi, b))

        window = self.prefetch + self.num_workers

        def worker():
            while not stop.is_set():
                try:
                    bi, idxs = job_q.get_nowait()
                except queue.Empty:
                    return
                # bound the prefetch window (relative to the consumer
                # position) so early consumer exits don't leave workers
                # decoding the whole epoch
                while not stop.is_set():
                    with lock:
                        if bi - consumed[0] < window:
                            break
                    time.sleep(0.002)
                if stop.is_set():
                    return
                items = [self.dataset[int(i)] for i in idxs]
                cols = tuple(np.stack([it[k] for it in items]) for k in range(len(items[0])))
                with lock:
                    results[bi] = (cols, idxs)

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            # Emit batches in order as they complete.
            for bi in range(nb):
                while True:
                    with lock:
                        if bi in results:
                            out = results.pop(bi)
                            consumed[0] = bi + 1
                            break
                    time.sleep(0.001)
                yield out
        finally:
            stop.set()  # generator closed early → stop the decode threads
