"""Threaded prefetching batch loader.

Replaces the reference's 12-worker ``torch.utils.data.DataLoader``
(``train.py:174-177``).  Feature extraction is numpy/np.fft heavy (releases
the GIL), so a thread pool + bounded prefetch queue keeps the TPU fed without
process-fork overhead.  Batches are dicts of stacked numpy arrays ready for
``parallel.mesh.shard_batch``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = True,
                 prefetch_batches: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch_batches
        self.epoch = 0
        # one-shot batch offset for mid-epoch resume (preemption-safe
        # checkpoints): the next __iter__ starts at this batch index of the
        # deterministic (seed + epoch) order, then the offset resets.
        self.start_batch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        self.epoch += 1
        # per-epoch augmentation seeding (see AudioDataset.loader_epoch)
        if hasattr(self.dataset, "loader_epoch"):
            self.dataset.loader_epoch = self.epoch
        n_batches = len(self)
        first_batch = min(self.start_batch, n_batches)
        self.start_batch = 0
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()   # consumer abandoned the iterator
        error: list = []

        def put(item) -> bool:
            """Bounded put that gives up when the consumer is gone (an
            abandoned iterator must not leave the producer blocked on a
            full queue holding its worker pool forever)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(first_batch, n_batches):
                        if stop.is_set():
                            return
                        ids = order[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                        items = list(pool.map(self.dataset.__getitem__, ids))
                        feats = np.stack([it[0] for it in items])
                        t_len = np.stack([it[1] for it in items])
                        tgts = np.stack([it[2] for it in items])
                        u_len = np.stack([it[3] for it in items])
                        if not put({"inputs": feats, "inputs_length": t_len,
                                    "targets": tgts, "targets_length": u_len}):
                            return
            except BaseException as e:   # surface worker errors, never hang
                error.append(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                yield item
            thread.join()
        finally:
            # break early (consumer break/exception): release the producer
            stop.set()
            while True:   # drain so a blocked put() can finish
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=5.0)
        if error:
            raise RuntimeError(
                f"DataLoader worker failed: {error[0]!r}") from error[0]
