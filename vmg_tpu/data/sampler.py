"""Iteration-oriented sampler (reference ``data/data_sampler.py:11-106``).

Enlarges the epoch by ``ratio`` (dataset_expand_ratio), draws an
epoch-seeded permutation with modulo indexing, and hands each process its
strided shard -- process_index/process_count replace torch.distributed
rank/world_size.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np


class IterSampler:
    def __init__(self, dataset_size: int, num_replicas: int = 1, rank: int = 0,
                 ratio: int = 1, seed: int = 0):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.seed = seed
        self.num_samples = int(
            math.ceil(dataset_size * ratio / num_replicas)
        )
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed + self.epoch)
        indices = rng.permutation(self.total_size) % self.dataset_size
        indices = indices[self.rank : self.total_size : self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices.tolist())

    def __len__(self) -> int:
        return self.num_samples
