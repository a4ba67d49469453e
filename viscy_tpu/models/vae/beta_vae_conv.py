"""Generic strided-conv beta-VAE (reference ``vae/beta_vae_monai.py:12``,
which wraps MONAI's ``VarAutoEncoder``).

TPU-native rebuild: plain flax conv ladder (channels-last internally so XLA
tiles convs onto the MXU), dense latent bottleneck with reparameterization
driven by an explicit ``latent`` rng stream, and a transposed-conv decoder.
Returns the same :class:`VaeOutput` namespace as :class:`BetaVae25D`, so it
drops into :class:`~viscy_tpu.apps.dynaclr.vae_engine.BetaVaeModule`.

Behavioral notes vs the reference:
- norm="instance" (the reference default) is GroupNorm(group_size=1);
  norm="batch" is also mapped to instance norm so the module stays
  stateless under jit (documented deviation — MONAI's BatchNorm here only
  differs materially at small batch sizes).
- activation is PReLU, matching MONAI's ``VarAutoEncoder`` default ADN.
"""

from __future__ import annotations

import math
from typing import Literal, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.vae.beta_vae_25d import VaeOutput

Array = jax.Array


def _tuple(v, n: int) -> tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(int(x) for x in v)


class _NormAct(nn.Module):
    """InstanceNorm + PReLU (MONAI Convolution default ADN ordering)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.GroupNorm(
            num_groups=None, group_size=1, use_bias=False, use_scale=False, name="norm"
        )(x)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class _ResidualUnit(nn.Module):
    """Residual conv unit (MONAI ``ResidualUnit`` shape semantics): the
    first conv carries the stride; the skip is a strided 1x1 conv when
    shape/width changes."""

    channels: int
    kernel: tuple[int, ...]
    stride: tuple[int, ...]
    subunits: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        y = x
        for i in range(max(self.subunits, 1)):
            stride = self.stride if i == 0 else (1,) * len(self.stride)
            y = nn.Conv(self.channels, self.kernel, strides=stride, name=f"conv{i}")(y)
            y = _NormAct(name=f"adn{i}")(y)
        if res.shape != y.shape:
            res = nn.Conv(
                self.channels, (1,) * len(self.kernel), strides=self.stride, name="skip"
            )(res)
        return y + res


class BetaVaeConv(nn.Module):
    """Strided-conv VAE over 2D or 3D inputs (``BetaVaeMonai`` analog).

    Input/output are channels-first ``(B, C, *spatial)`` to match the
    public API; compute is channels-last.
    """

    spatial_dims: int
    in_shape: Sequence[int]  # (C, *spatial)
    out_channels: int
    latent_size: int
    channels: Sequence[int]
    strides: Sequence[int] | Sequence[Sequence[int]]
    kernel_size: Sequence[int] | int = 3
    up_kernel_size: Sequence[int] | int = 3
    num_res_units: int = 0
    use_sigmoid: bool = False
    norm: Literal["batch", "instance"] = "instance"

    def _strides(self) -> list[tuple[int, ...]]:
        out = []
        for s in self.strides:
            out.append(_tuple(s, self.spatial_dims))
        return out

    def _final_spatial(self) -> tuple[int, ...]:
        spatial = list(self.in_shape[1:])
        for s in self._strides():
            spatial = [math.ceil(d / st) for d, st in zip(spatial, s)]
        return tuple(spatial)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> VaeOutput:
        nd = self.spatial_dims
        kernel = _tuple(self.kernel_size, nd)
        up_kernel = _tuple(self.up_kernel_size, nd)
        strides = self._strides()
        # (B, C, *spatial) -> channels-last
        x = jnp.moveaxis(x, 1, -1)

        h = x
        for i, (ch, st) in enumerate(zip(self.channels, strides)):
            if self.num_res_units > 0:
                h = _ResidualUnit(
                    ch, kernel, st, subunits=self.num_res_units, name=f"down{i}"
                )(h)
            else:
                h = nn.Conv(ch, kernel, strides=st, name=f"down{i}")(h)
                h = _NormAct(name=f"down_adn{i}")(h)

        feat_shape = h.shape[1:]
        flat = h.reshape(h.shape[0], -1)
        mean = nn.Dense(self.latent_size, name="mu")(flat)
        logvar = nn.Dense(self.latent_size, name="logvar")(flat)
        if deterministic:
            z = mean
        else:
            eps = jax.random.normal(self.make_rng("latent"), mean.shape, mean.dtype)
            z = mean + eps * jnp.exp(0.5 * logvar)

        h = nn.Dense(math.prod(feat_shape), name="decode_fc")(z)
        h = h.reshape((h.shape[0], *feat_shape))
        dec_channels = list(self.channels[-2::-1]) + [self.out_channels]
        for i, (ch, st) in enumerate(zip(dec_channels, strides[::-1])):
            h = nn.ConvTranspose(ch, up_kernel, strides=st, name=f"up{i}")(h)
            if i < len(dec_channels) - 1:
                h = _NormAct(name=f"up_adn{i}")(h)
        # crop any transposed-conv overshoot back to the input spatial size
        target = self.in_shape[1:]
        slices = (slice(None),) + tuple(slice(0, t) for t in target) + (slice(None),)
        h = h[slices]
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        recon = jnp.moveaxis(h, -1, 1)
        return VaeOutput(recon_x=recon, mean=mean, logvar=logvar, z=z)


# Reference-compatible name (the MONAI backend is replaced by flax convs).
BetaVaeMonai = BetaVaeConv
