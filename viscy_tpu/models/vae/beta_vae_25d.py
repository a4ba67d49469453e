"""2.5D beta-VAE (reference ``vae/beta_vae_25d.py:270``).

ConvNeXt encoder (3D stem folding Z into channels) -> global pooled
latent (mean, logvar, reparameterized z) -> pixel-shuffle decoder without
skips -> ``PixelToVoxelHead`` voxel reconstruction.
"""

from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.blocks import (
    CONVNEXT_ARCHS,
    ConvNeXtStage,
    MultiscaleEncoder,
    pixel_shuffle_2d,
)
from viscy_tpu.models.components.heads import PixelToVoxelHead
from viscy_tpu.models.components.stems import StemDepthtoChannels

Array = jax.Array


class VaeOutput(NamedTuple):
    recon_x: Array
    mean: Array
    logvar: Array
    z: Array


class VaeUpStage(nn.Module):
    """Decoder up stage without skip connections (pixel-shuffle + refine)."""

    out_channels: int
    scale_factor: int = 2
    conv_blocks: int = 2

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.scale_factor > 1:
            x = pixel_shuffle_2d(x, self.scale_factor)
        x = ConvNeXtStage(
            in_chs=x.shape[-1],
            out_chs=self.out_channels,
            depth=self.conv_blocks,
            stride=1,
            name="conv",
        )(x, deterministic)
        return x


class BetaVae25D(nn.Module):
    """2.5D beta-VAE."""

    backbone: Literal["convnext_tiny", "convnextv2_tiny", "convnextv2_test"] = "convnext_tiny"
    in_channels: int = 2
    in_stack_depth: int = 16
    out_stack_depth: int = 16
    latent_dim: int = 1024
    input_spatial_size: tuple[int, int] = (256, 256)
    stem_kernel_size: tuple[int, int, int] = (2, 4, 4)
    stem_stride: tuple[int, int, int] = (2, 4, 4)
    drop_path_rate: float = 0.0
    decoder_stages: int = 4
    head_expansion_ratio: int = 2
    head_pool: bool = False
    conv_blocks: int = 2

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> VaeOutput:
        depths, dims = CONVNEXT_ARCHS[self.backbone]
        use_grn = "v2" in self.backbone

        # encoder
        h = StemDepthtoChannels(
            in_channels=self.in_channels,
            in_stack_depth=self.in_stack_depth,
            in_channels_encoder=dims[0],
            stem_kernel_size=self.stem_kernel_size,
            stem_stride=self.stem_stride,
            name="stem",
        )(x)
        feats = MultiscaleEncoder(
            depths=depths,
            dims=dims,
            use_grn=use_grn,
            ls_init_value=None if use_grn else 1e-6,
            drop_path_rate=self.drop_path_rate,
            name="encoder",
        )(h, deterministic)
        bottom = feats[-1]  # (B, h, w, C)
        enc_h, enc_w = bottom.shape[1:3]
        pooled = bottom.mean(axis=(1, 2))
        mean = nn.Dense(self.latent_dim, name="fc_mean")(pooled)
        logvar = nn.Dense(self.latent_dim, name="fc_logvar")(pooled)
        if deterministic:
            z = mean
        else:
            eps = jax.random.normal(self.make_rng("latent"), mean.shape, mean.dtype)
            z = mean + jnp.exp(0.5 * logvar) * eps

        # decoder: project latent back to the bottleneck grid
        base = dims[-1]
        y = nn.Dense(base * enc_h * enc_w, name="fc_decode")(z)
        y = y.reshape(-1, enc_h, enc_w, base)
        channels = [base]
        for i in range(self.decoder_stages - 1):
            channels.append(base // (2 ** (i + 1)))
        head_in = (self.out_stack_depth + 2) * self.in_channels * 2**2 * self.head_expansion_ratio
        channels.append(head_in)
        for i in range(1, len(channels)):
            y = VaeUpStage(
                out_channels=channels[i],
                scale_factor=2 if i < len(channels) else 1,
                conv_blocks=self.conv_blocks,
                name=f"up{i - 1}",
            )(y, deterministic)
        recon = PixelToVoxelHead(
            in_channels=head_in,
            out_channels=self.in_channels,
            out_stack_depth=self.out_stack_depth,
            expansion_ratio=self.head_expansion_ratio,
            pool=self.head_pool,
            name="head",
        )(y)
        return VaeOutput(recon_x=recon, mean=mean, logvar=logvar, z=z)


def vae_loss(
    output: VaeOutput, target: Array, beta: float = 1.0
) -> tuple[Array, dict]:
    """ELBO: reconstruction MSE + beta * KL."""
    recon = jnp.mean(jnp.square(output.recon_x.astype(jnp.float32) - target.astype(jnp.float32)))
    kl = -0.5 * jnp.mean(
        1 + output.logvar - jnp.square(output.mean) - jnp.exp(output.logvar)
    )
    return recon + beta * kl, {"loss/recon": recon, "loss/kl": kl}
