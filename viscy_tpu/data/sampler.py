"""FlexibleBatchSampler (reference ``viscy_data/sampler.py:24``).

Composable batch construction over a metadata DataFrame: group-per-batch,
leaky cross-group mixing, stratification, temporal enrichment around a
focal HPI; shard-aware (``num_replicas``/``rank``) for multi-host input
pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class FlexibleBatchSampler:
    """Composable batch sampler with grouping and stratification."""

    def __init__(
        self,
        valid_anchors: pd.DataFrame,
        batch_size: int = 128,
        batch_group_by: str | list[str] | None = None,
        leaky: float = 0.0,
        group_weights: dict[str, float] | None = None,
        stratify_by: str | list[str] | None = None,
        temporal_enrichment: bool = False,
        temporal_window_hours: float = 2.0,
        temporal_global_fraction: float = 0.3,
        num_replicas: int = 1,
        rank: int = 0,
        seed: int = 0,
        drop_last: bool = True,
    ) -> None:
        if isinstance(batch_group_by, str):
            batch_group_by = [batch_group_by]
        if isinstance(stratify_by, str):
            stratify_by = [stratify_by]
        for cols, name in ((batch_group_by, "batch_group_by"), (stratify_by, "stratify_by")):
            if cols is not None:
                missing = [c for c in cols if c not in valid_anchors.columns]
                if missing:
                    raise ValueError(
                        f"{name}={cols} requires columns {missing}; "
                        f"available: {list(valid_anchors.columns)}"
                    )
        if temporal_enrichment and "hours_post_perturbation" not in valid_anchors.columns:
            raise ValueError("temporal_enrichment requires 'hours_post_perturbation' column")
        if not 0.0 <= leaky < 1.0:
            raise ValueError(f"leaky must be in [0, 1), got {leaky}")

        self.anchors = valid_anchors.reset_index(drop=True)
        self.batch_size = batch_size
        self.batch_group_by = batch_group_by
        self.leaky = leaky
        self.stratify_by = stratify_by
        self.temporal_enrichment = temporal_enrichment
        self.temporal_window_hours = temporal_window_hours
        self.temporal_global_fraction = temporal_global_fraction
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

        if batch_group_by is not None:
            key = self.anchors[batch_group_by].astype(str).agg("_".join, axis=1)
            self._group_key = key
            self._groups = {g: np.asarray(idx) for g, idx in key.groupby(key).groups.items()}
            sizes = {g: len(v) for g, v in self._groups.items()}
            total = sum(sizes.values())
            if group_weights:
                self._group_probs = {
                    g: group_weights.get(g, sizes[g] / total) for g in self._groups
                }
            else:
                self._group_probs = {g: sizes[g] / total for g in self._groups}
            norm = sum(self._group_probs.values())
            self._group_probs = {g: p / norm for g, p in self._group_probs.items()}
        else:
            self._groups = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n_batches = len(self.anchors) // self.batch_size
        if not self.drop_last and len(self.anchors) % self.batch_size:
            n_batches += 1
        return max(1, n_batches // self.num_replicas)

    def _sample_stratified(
        self, rng: np.random.Generator, pool: pd.DataFrame, n: int
    ) -> np.ndarray:
        """Balance representation across stratification groups."""
        key = pool[self.stratify_by].astype(str).agg("_".join, axis=1)
        groups = [np.asarray(idx) for _, idx in key.groupby(key).groups.items()]
        per = max(1, n // len(groups))
        chosen: list[int] = []
        for g in groups:
            take = min(per, n - len(chosen))
            if take <= 0:
                break
            chosen.extend(rng.choice(g, size=take, replace=len(g) < take))
        while len(chosen) < n:
            g = groups[int(rng.integers(0, len(groups)))]
            chosen.append(int(rng.choice(g)))
        return np.asarray(chosen[:n])

    def _sample_temporal(
        self, rng: np.random.Generator, pool: pd.DataFrame, n: int
    ) -> np.ndarray:
        hpi = pool["hours_post_perturbation"].to_numpy()
        focal = float(rng.choice(hpi))
        local_mask = np.abs(hpi - focal) <= self.temporal_window_hours
        local_idx = pool.index.to_numpy()[local_mask]
        n_global = int(round(n * self.temporal_global_fraction))
        n_local = n - n_global
        out = []
        if len(local_idx) and n_local:
            out.append(rng.choice(local_idx, size=n_local, replace=len(local_idx) < n_local))
        n_rest = n - sum(len(o) for o in out)
        if n_rest:
            out.append(rng.choice(pool.index.to_numpy(), size=n_rest, replace=True))
        return np.concatenate(out)

    def _build_one_batch(self, rng: np.random.Generator) -> list[int]:
        if self._groups is not None:
            names = list(self._groups)
            probs = np.asarray([self._group_probs[g] for g in names])
            g = names[int(rng.choice(len(names), p=probs))]
            n_leak = int(round(self.batch_size * self.leaky))
            n_main = self.batch_size - n_leak
            pool = self.anchors.loc[self._groups[g]]
            extra_pool = self.anchors.loc[~self.anchors.index.isin(self._groups[g])]
        else:
            n_leak, n_main = 0, self.batch_size
            pool = self.anchors
            extra_pool = self.anchors.iloc[:0]

        if self.temporal_enrichment:
            main = self._sample_temporal(rng, pool, n_main)
        elif self.stratify_by is not None:
            main = self._sample_stratified(rng, pool, n_main)
        else:
            idx = pool.index.to_numpy()
            main = rng.choice(idx, size=n_main, replace=len(idx) < n_main)
        parts = [main]
        if n_leak and len(extra_pool):
            parts.append(rng.choice(extra_pool.index.to_numpy(), size=n_leak, replace=True))
        batch = np.concatenate(parts)
        rng.shuffle(batch)
        return [int(i) for i in batch]

    def __iter__(self):
        rng = np.random.default_rng((self.seed, self.epoch, self.rank))
        for _ in range(len(self)):
            yield self._build_one_batch(rng)
