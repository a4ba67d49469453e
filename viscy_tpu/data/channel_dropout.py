"""Whole-channel dropout for bag-of-channels training
(reference ``viscy_data/channel_dropout.py:7``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viscy_tpu.transforms.base import RandTransform

Array = jax.Array


class ChannelDropout(RandTransform):
    """Randomly zero whole channels per sample, keeping at least one."""

    is_spatial = False

    def __init__(
        self,
        keys: str | list[str] = "anchor",
        dropout_prob: float = 0.2,
        allow_missing_keys: bool = True,
    ) -> None:
        super().__init__(keys, 1.0, allow_missing_keys)
        self.dropout_prob = dropout_prob

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        for i, k in enumerate(self.key_iterator(data)):
            x = data[k]
            b, c = x.shape[:2]
            kk = jax.random.fold_in(key, i)
            drop = jax.random.uniform(kk, (b, c)) < self.dropout_prob
            # never drop every channel of a sample: keep a random one
            keep_idx = jax.random.randint(jax.random.fold_in(kk, 1), (b,), 0, c)
            keep = jax.nn.one_hot(keep_idx, c, dtype=bool)
            drop = drop & ~keep
            mask = (~drop).astype(x.dtype).reshape(b, c, *([1] * (x.ndim - 2)))
            data[k] = x * mask
        return data
