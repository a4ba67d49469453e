"""PatchGAN 3D discriminators (reference ``gan/patchgan3d.py:22,132``).

Single-scale ``PatchGAN3D`` mirrors the reference exactly: ``n_layers``
(default 4) strided ``k=4`` convs with anisotropic strides
``(1,2,2) -> (1,2,2) -> (2,2,2) -> (2,2,2)`` and torch ``padding=1``
(explicit ``(1,1)`` here — XLA "SAME" places strided pads differently),
InstanceNorm3d(affine) + LeakyReLU(0.2) on layers 2+, a first layer with
no norm, and a final ``(1,4,4)`` logit conv that stays valid at Z=1.
``MultiScalePatchGAN3D`` stacks independent instances on YX avg-pooled
inputs (pix2pixHD-style).

Spectral normalization (reference default) uses flax's power-iteration
``nn.SpectralNorm``; its u/v vectors live in the ``batch_stats``
collection and advance only when ``update_stats=True`` (once per
discriminator step in the GAN engine). ``return_features`` exposes
per-layer activations for feature-matching losses (a TPU-side extension;
the reference returns logits only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

_PAD4 = ((1, 1), (1, 1), (1, 1))  # torch Conv3d(k=4, p=1), any stride


class PatchGAN3D(nn.Module):
    """Single-scale 3D PatchGAN. Input (B, C, D, H, W) -> patch logits."""

    in_channels: int = 2
    base_channels: int = 64
    n_layers: int = 4  # strided convs before the logit conv (reference: 4)
    use_spectral_norm: bool = True

    def _conv(self, ch: int, kernel, strides, padding, name: str):
        conv = nn.Conv(ch, kernel, strides=strides, padding=padding, name=name)
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
        for i in range(1, self.n_layers + 1):
            ch = self.base_channels * min(2 ** (i - 1), 8)
            stride = (1, 2, 2) if i <= 2 else (2, 2, 2)
            h = self._apply_conv(
                self._conv(ch, (4, 4, 4), stride, _PAD4, f"conv{i}"), h, update_stats
            )
            if i > 1:
                # torch InstanceNorm3d(affine=True), eps 1e-5
                h = nn.GroupNorm(
                    num_groups=None, group_size=1, epsilon=1e-5, name=f"norm{i}"
                )(h)
            h = nn.leaky_relu(h, 0.2)
            features.append(h)
        logits = self._apply_conv(
            self._conv(1, (1, 4, 4), (1, 1, 1), ((0, 0), (1, 1), (1, 1)), "conv_out"),
            h,
            update_stats,
        )
        logits = jnp.transpose(logits, (0, 4, 1, 2, 3))
        if return_features:
            return logits, features
        return logits


class MultiScalePatchGAN3D(nn.Module):
    """Run PatchGAN3D at multiple YX scales (avg-pooled inputs,
    reference ``gan/patchgan3d.py:132``: ``F.avg_pool3d(k=(1,2,2))``,
    no padding)."""

    in_channels: int = 2
    base_channels: int = 64
    n_layers: int = 4
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
                    current, 0.0, jax.lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
                ) / 4.0
        if return_features:
            return outputs, all_features
        return outputs
