"""Batching + device-feed pipeline.

The reference relies on ``torch.utils.data.DataLoader`` with the default 0
workers — all cv2/numpy IO on the training thread (SURVEY.md §3.1). Here:
a thread-pool loader (image decode releases the GIL in PIL/numpy) with
deterministic shuffling, plus a device prefetcher that keeps N batches in
flight so host->HBM copies overlap TPU compute (the streaming north star's
double-buffering, applied to training)."""
from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Any, Callable, Iterable, Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack sample dicts into batched arrays (keys present in all)."""
    keys = set(samples[0])
    for s in samples[1:]:
        keys &= set(s)
    return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in sorted(keys)}


class Loader:
    """Indexable-dataset batch loader.

    ``for batch in Loader(ds, 4, shuffle=True, seed=epoch): ...``
    Re-iterating reshuffles (seed advances per pass). ``num_workers`` > 0
    decodes samples through a thread pool with readahead.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        readahead: int = 4,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.readahead = readahead
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> list[list[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = [
            idx[i : i + self.batch_size].tolist()
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers <= 0:
            for b in batches:
                yield collate([self.dataset[i] for i in b])
            return

        with ThreadPoolExecutor(self.num_workers) as pool:
            futures = []
            ahead = max(1, self.readahead)

            def submit(b):
                return [pool.submit(self.dataset.__getitem__, i) for i in b]

            for b in batches[:ahead]:
                futures.append(submit(b))
            for j, b in enumerate(batches):
                if j + ahead < len(batches):
                    futures.append(submit(batches[j + ahead]))
                yield collate([f.result() for f in futures[j]])


def prefetch_to_device(
    iterable: Iterable[dict],
    put_fn: Callable[[dict], Any],
    depth: int = 2,
) -> Iterator[Any]:
    """Stage batches onto the device ``depth`` ahead of consumption.

    ``put_fn`` is typically ``lambda b: shard_batch(b, mesh)``; JAX transfers
    are async, so staging ahead overlaps H2D DMA with the current step's
    compute (the double-buffering pattern from the streaming runtime).
    """
    q: Queue = Queue(maxsize=depth)
    END = object()
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterable:
                q.put(put_fn(item))
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            if err:
                raise err[0]
            return
        yield item
