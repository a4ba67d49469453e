"""PatchGAN 3D discriminators (reference ``gan/patchgan3d.py:22,132``).

Conv3D stack with (1, 2, 2) strides (Z preserved), instance norm, leaky
ReLU; multiscale variant runs the same discriminator on YX-downsampled
inputs. Returns per-layer features for feature-matching losses.
Spectral normalization (reference default) uses flax's power-iteration
``nn.SpectralNorm``; its u/v vectors live in the ``batch_stats``
collection and advance only when ``update_stats=True`` (once per
discriminator step in the GAN engine).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class PatchGAN3D(nn.Module):
    """3D PatchGAN discriminator. Input (B, C, D, H, W) -> patch logits."""

    in_channels: int = 2
    base_channels: int = 64
    n_layers: int = 3
    kernel_size: tuple[int, int, int] = (3, 4, 4)
    use_spectral_norm: bool = True

    def _conv(self, ch: int, strides, name: str):
        conv = nn.Conv(ch, self.kernel_size, strides=strides, padding="SAME", name=name)
        if self.use_spectral_norm:
            return nn.SpectralNorm(conv)
        return conv

    def _apply_conv(self, conv, h: Array, update_stats: bool) -> Array:
        if self.use_spectral_norm:
            return conv(h, update_stats=update_stats)
        return conv(h)

    @nn.compact
    def __call__(self, x: Array, return_features: bool = False, update_stats: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        features = []
        ch = self.base_channels
        h = self._apply_conv(self._conv(ch, (1, 2, 2), "conv0"), h, update_stats)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)
        for i in range(1, self.n_layers):
            ch = min(ch * 2, 512)
            h = self._apply_conv(self._conv(ch, (1, 2, 2), f"conv{i}"), h, update_stats)
            h = nn.GroupNorm(num_groups=None, group_size=1, name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            features.append(h)
        ch = min(ch * 2, 512)
        h = self._apply_conv(self._conv(ch, (1, 1, 1), "conv_pre"), h, update_stats)
        h = nn.GroupNorm(num_groups=None, group_size=1, name="norm_pre")(h)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)
        logits = self._apply_conv(self._conv(1, (1, 1, 1), "conv_out"), h, update_stats)
        logits = jnp.transpose(logits, (0, 4, 1, 2, 3))
        if return_features:
            return logits, features
        return logits


class MultiScalePatchGAN3D(nn.Module):
    """Run PatchGAN3D at multiple YX scales (avg-pooled inputs)."""

    in_channels: int = 2
    base_channels: int = 64
    n_layers: int = 3
    num_scales: int = 2
    use_spectral_norm: bool = True

    @nn.compact
    def __call__(self, x: Array, return_features: bool = False, update_stats: bool = False):
        outputs = []
        all_features = []
        current = x
        for s in range(self.num_scales):
            d = PatchGAN3D(
                in_channels=self.in_channels,
                base_channels=self.base_channels,
                n_layers=self.n_layers,
                use_spectral_norm=self.use_spectral_norm,
                name=f"scale{s}",
            )
            if return_features:
                logits, feats = d(current, return_features=True, update_stats=update_stats)
                all_features.append(feats)
            else:
                logits = d(current, update_stats=update_stats)
            outputs.append(logits)
            if s < self.num_scales - 1:
                current = jax.lax.reduce_window(
                    current, 0.0, jax.lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "SAME"
                ) / 4.0
        if return_features:
            return outputs, all_features
        return outputs
