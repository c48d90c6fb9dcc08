"""Prefetching batch loader feeding the device.

Replaces torch DataLoader workers + pinned-memory H2D copies
(``data/__init__.py:10-23``): a thread pool assembles numpy batches ahead
of time; the training loop overlaps ``jax.device_put`` (async on TPU) with
the current step.  Threads suffice because the packed backend is
zero-decode memcpy; the cv2/lmdb backends release the GIL during I/O.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np


class PrefetchLoader:
    def __init__(self, dataset, sampler, batch_size: int, num_workers: int = 4,
                 prefetch: int = 4, drop_last: bool = True):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = list(iter(self.sampler))
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        job_q: "queue.Queue" = queue.Queue()
        results: Dict[int, Dict] = {}
        lock = threading.Lock()
        stop = threading.Event()

        for bi, b in enumerate(batches):
            job_q.put((bi, b))

        get_batch = getattr(self.dataset, "get_batch", None)

        def worker():
            while not stop.is_set():
                try:
                    bi, idxs = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    # batched native path: one fused C++ call per shard
                    # (OpenMP over clips), bit-identical per-clip stacking
                    batch = get_batch(idxs) if get_batch is not None else None
                    if batch is None:
                        samples = [self.dataset[i] for i in idxs]
                        batch = {
                            "LRs": np.stack([s["LRs"] for s in samples], 0),
                            "HRs": np.stack([s["HRs"] for s in samples], 0),
                            "keys": [s["key"] for s in samples],
                        }
                except BaseException as e:  # propagate to the consumer --
                    # a swallowed worker error would hang the training loop
                    batch = e
                with lock:
                    results[bi] = batch

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            next_bi = 0
            import time

            while next_bi < len(batches):
                with lock:
                    ready = next_bi in results
                if ready:
                    with lock:
                        item = results.pop(next_bi)
                    if isinstance(item, BaseException):
                        raise item
                    yield item
                    next_bi += 1
                else:
                    time.sleep(0.002)
        finally:
            stop.set()


def accumulate_batches(loader_iter, grad_acc: int):
    """Group ``grad_acc`` consecutive loader batches into one update batch.

    Reference grad-accumulation semantics (``tools/train.py:155-162``): one
    optimizer update consumes ``grad_acc`` loader draws of ``batch_size``
    samples, so the effective update batch is ``total_batch``.  The jitted
    train step then scans microbatches of ``batch_size`` (peak device
    memory stays at the microbatch level).  Trailing partial groups are
    dropped, matching the reference's drop_last loader.
    """
    buf = []
    for b in loader_iter:
        buf.append(b)
        if len(buf) == grad_acc:
            if grad_acc == 1:
                yield buf[0]
            else:
                yield {
                    k: np.concatenate([x[k] for x in buf], axis=0)
                    for k in ("LRs", "HRs")
                }
            buf = []


def create_dataloader(dataset, dataset_cfg, sampler=None,
                      num_replicas: int = 1, rank: int = 0):
    """Factory mirroring the reference loader split: the global batch is
    divided across processes (``data/__init__.py:14-16``)."""
    from vmg_tpu.data.sampler import IterSampler

    assert dataset_cfg.batch_size % num_replicas == 0
    local_bs = dataset_cfg.batch_size // num_replicas
    if sampler is None:
        sampler = IterSampler(
            len(dataset), num_replicas, rank,
            ratio=dataset_cfg.dataset_expand_ratio,
            seed=dataset_cfg.pre_seed or 0,
        )
    return PrefetchLoader(dataset, sampler, local_bs,
                          num_workers=dataset_cfg.n_workers)
