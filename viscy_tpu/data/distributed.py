"""Sharded sampler for multi-host input pipelines
(reference ``viscy_data/distributed.py:16``).

Each host (JAX process) draws a *shard-local* permutation — an interleaved
reshape of the global index space — so every rank reads a contiguous,
cache-local slice of FOV windows instead of a global permutation.
"""

from __future__ import annotations

import numpy as np


class ShardedDistributedSampler:
    """Per-rank shard-local permutation sampler."""

    def __init__(
        self,
        dataset_len_or_dataset,
        num_replicas: int | None = None,
        rank: int | None = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ) -> None:
        import jax

        if hasattr(dataset_len_or_dataset, "__len__"):
            self.dataset_len = len(dataset_len_or_dataset)
        else:
            self.dataset_len = int(dataset_len_or_dataset)
        self.num_replicas = num_replicas if num_replicas is not None else jax.process_count()
        self.rank = rank if rank is not None else jax.process_index()
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        if self.drop_last:
            self.num_samples = self.dataset_len // self.num_replicas
        else:
            self.num_samples = -(-self.dataset_len // self.num_replicas)
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _sharded_randperm(self, rng: np.random.Generator) -> np.ndarray:
        """Interleaved reshape: global indices -> (num_samples, num_replicas);
        permute within each shard column (reference ``distributed.py:19``)."""
        indices = np.arange(self.total_size) % self.dataset_len
        mesh = indices.reshape(self.num_samples, self.num_replicas)
        # permute rows per shard column independently
        for c in range(self.num_replicas):
            rng.shuffle(mesh[:, c])
        return mesh[:, self.rank]

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.shuffle:
            shard = self._sharded_randperm(rng)
        else:
            shard = np.arange(self.total_size)[self.rank :: self.num_replicas] % self.dataset_len
        return iter(shard.tolist())

    def __len__(self) -> int:
        return self.num_samples
