"""Task heads (reference ``components/heads.py``).

Spatial heads re-inflate 2D decoder features to 3D voxel outputs via
sub-pixel shuffles; embedding heads are projection MLPs / cosine
classifiers. Spatial heads consume channels-last (B, H, W, C) and emit
(B, C, D, H, W) to match the public API.
"""

from __future__ import annotations

import math
from typing import Literal, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from viscy_tpu.models.components.blocks import (
    icnr_init,
    pad_pool_blur_2d,
    pad_pool_blur_packed,
    pixel_shuffle_2d,
)
from viscy_tpu.models.schedule import cosine_anneal

Array = jax.Array


class PixelToVoxelHead(nn.Module):
    """Pixel-shuffle head: 2D features -> 3D voxels (reference ``heads.py:594``).

    Pipeline: pixel-shuffle x2 (pure reshape) -> fold channels into a
    (D+2)-deep volume -> 3x3x3 conv valid in Z (D+2 -> D) -> 1x1x1 conv ->
    per-slice pixel-shuffle x2.
    """

    in_channels: int
    out_channels: int
    out_stack_depth: int
    expansion_ratio: int = 4
    pool: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        first_scale = 2
        x = pixel_shuffle_2d(x, first_scale)
        if self.pool:
            x = pad_pool_blur_2d(x, first_scale)
        d = self.out_stack_depth + 2
        # torch reshape (b, c//d, d, h, w) from channels k = c_new*d + d_idx
        x = rearrange(x, "b h w (c d) -> b d h w c", d=d)
        mid_channels = self.out_channels * self.expansion_ratio * 2**2
        x = nn.Conv(
            mid_channels,
            (3, 3, 3),
            padding=((0, 0), (1, 1), (1, 1)),
            dtype=self.dtype,
            # reference heads.py:627 normal_init (monai: N(0, 0.02))
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="conv0",
        )(x)
        # MONAI Convolution defaults: InstanceNorm + PReLU after the conv
        # (reference heads.py:617 uses monai Convolution with default ADN)
        x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False, use_scale=False, name="conv0_norm")(x)
        alpha = self.param("conv0_prelu", nn.initializers.constant(0.25), (1,))
        x = jnp.where(x >= 0, x, alpha * x)
        x = nn.Conv(
            self.out_channels * 2**2,
            (1, 1, 1),
            dtype=self.dtype,
            # checkerboard-free sub-pixel init (reference heads.py:628)
            kernel_init=icnr_init(2, 2),
            name="conv1",
        )(x)
        x = x.astype(jnp.float32)
        # per-slice pixel shuffle x2: (b, d, h, w, c*4) -> (b, d, 2h, 2w, c)
        x = rearrange(x, "b d h w (c i j) -> b d (h i) (w j) c", i=2, j=2)
        return jnp.transpose(x, (0, 4, 1, 2, 3))


class PixelToVoxelShuffleHead(nn.Module):
    """Pure pixel-shuffle head (reference ``heads.py:656``): one sub-pixel
    upsample by ``xy_scaling`` then reshape channels into (C_out, D)."""

    in_channels: int
    out_channels: int
    out_stack_depth: int = 5
    xy_scaling: int = 4
    pool: bool = False

    @nn.compact
    def __call__(self, x: Array, out_layout: str = "ncdhw") -> Array:
        if out_layout == "phase":
            # keep the head's packed pre-shuffle layout (B, h, w, C*D*r*r)
            # for a phase-space loss (see ops/ssim.py): the pad-pool blur
            # becomes exact phase matmuls and the differentiated
            # full-depth volume never transposes
            if self.pool:
                x = pad_pool_blur_packed(
                    x, self.out_channels * self.out_stack_depth, self.xy_scaling
                )
            return x
        x = pixel_shuffle_2d(x, self.xy_scaling)
        if self.pool:
            x = pad_pool_blur_2d(x, self.xy_scaling)
        # channels = out_channels * out_stack_depth, torch ordering c*D + d
        x = rearrange(
            x, "b h w (c d) -> b c d h w", c=self.out_channels, d=self.out_stack_depth
        )
        return x


class UnsqueezeHead(nn.Module):
    """(B, C, H, W) -> (B, C, 1, H, W) (reference ``heads.py:644``)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x[:, :, None]


class CosineClassifier(nn.Module):
    """L2-normalized linear head with learnable log-temperature
    (reference ``heads.py:430``)."""

    in_dim: int
    num_classes: int
    init_scale: float = 20.0
    learn_scale: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=0.01),
            (self.num_classes, self.in_dim),
        )
        if self.learn_scale:
            log_scale = self.param(
                "log_scale",
                nn.initializers.constant(math.log(self.init_scale)),
                (),
            )
        else:
            log_scale = jnp.asarray(math.log(self.init_scale))
        xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        wn = w / (jnp.linalg.norm(w, axis=1, keepdims=True) + 1e-12)
        return jnp.exp(log_scale) * (xn @ wn.T)


class MLP(nn.Module):
    """Configurable MLP (reference ``heads.py:470``): projection mode
    (hidden layers + final linear+norm) or classification mode (backbone +
    linear/cosine head, with ``encode`` for normalized penultimate reps).

    BatchNorm-under-DP semantics (SURVEY §7 hard-parts): the reference's
    torch BN is per-replica (per-GPU stats under DDP). Here the train step
    is a single jit over the sharded global batch, so ``nn.BatchNorm``
    reduces over the *global* batch axis — GSPMD inserts the cross-chip
    collectives. This is deliberate: stats are batch-size-consistent at
    any device count (our 1-vs-8-device DP exactness test depends on it),
    and converted checkpoints are unaffected (running stats transfer
    verbatim; only training dynamics at large replica counts differ from
    per-replica torch BN).
    """

    in_dims: int
    hidden_dims: int | Sequence[int]
    out_dims: int | None = None
    norm: Literal["bn", "ln"] = "bn"
    activation: Literal["relu", "gelu", "silu"] = "relu"
    dropout: float = 0.0
    num_classes: int | None = None
    cosine_classifier: bool = True

    def _norm(self, name: str):
        if self.norm == "bn":
            return nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5, name=name)
        return nn.LayerNorm(name=name)

    def _act(self, x):
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "gelu":
            return nn.gelu(x, approximate=False)
        return nn.silu(x)

    @nn.compact
    def __call__(self, x: Array, train: bool = False, encode: bool = False) -> Array:
        if self.num_classes is None and self.out_dims is None:
            raise ValueError("out_dims is required in projection mode")
        hidden = (
            [self.hidden_dims] if isinstance(self.hidden_dims, int) else list(self.hidden_dims)
        )
        for i, h in enumerate(hidden):
            x = nn.Dense(h, name=f"fc{i}")(x)
            if self.norm == "bn":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, name=f"norm{i}"
                )(x)
            else:
                x = nn.LayerNorm(name=f"norm{i}")(x)
            x = self._act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.num_classes is None:
            x = nn.Dense(self.out_dims, name="fc_out")(x)
            if self.norm == "bn":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, name="norm_out"
                )(x)
            else:
                x = nn.LayerNorm(name="norm_out")(x)
            return x
        if encode:
            return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        if self.cosine_classifier:
            return CosineClassifier(x.shape[-1], self.num_classes, name="head")(x)
        return nn.Dense(self.num_classes, name="head")(x)


class BaseHead(nn.Module):
    """Pluggable auxiliary task head (reference ``heads.py:34``).

    Self-contained: knows its batch key, computes its own loss+metrics in
    one traced call ``(features, targets) -> (loss, metrics)``. The
    epoch-dependent loss weight is **not** baked into the trace — the
    engine computes ``weight_at(epoch)`` host-side each epoch and feeds it
    through the batch's ``_schedule`` scalars so jit never retraces.
    """

    head_name: str = "aux"
    batch_key: str = "label"
    loss_weight: float = 1.0
    weight_schedule: Literal["cosine", "constant"] = "constant"
    weight_start: float = 0.0
    weight_warmup_epochs: int = 50

    def weight_at(self, epoch: int) -> float:
        if self.weight_schedule == "cosine":
            return cosine_anneal(
                self.weight_start, self.loss_weight, epoch, self.weight_warmup_epochs
            )
        return self.loss_weight


class ClassificationHead(BaseHead):
    """MLP classifier head with top-k accuracy metrics (reference
    ``heads.py:159``). Default norm is LayerNorm (stateless under jit) —
    set ``norm="bn"`` for the reference's BatchNorm behavior."""

    in_dims: int = 768
    hidden_dims: int | Sequence[int] = 256
    num_classes: int = 2
    cosine_classifier: bool = True
    top_k: int = 5
    norm: Literal["bn", "ln"] = "ln"

    @nn.compact
    def __call__(self, x: Array, y: Array, train: bool = False):
        """(B, in_dims) features + (B,) int labels -> (loss, metrics)."""
        logits = MLP(
            in_dims=self.in_dims,
            hidden_dims=self.hidden_dims,
            num_classes=self.num_classes,
            cosine_classifier=self.cosine_classifier,
            norm=self.norm,
            name="mlp",
        )(x, train=train)
        y = y.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()
        top1 = (jnp.argmax(logits, axis=-1) == y).mean()
        k = min(self.top_k, self.num_classes)
        topk_idx = jax.lax.top_k(logits, k)[1]
        topk = (topk_idx == y[:, None]).any(axis=-1).mean()
        metrics = {
            f"metrics/acc_top1/{self.head_name}": top1,
            f"metrics/acc_top{self.top_k}/{self.head_name}": topk,
        }
        return loss, metrics


class CrossModalContrastiveHead(BaseHead):
    """Cross-modal InfoNCE head (reference ``heads.py:274``): projects image
    features and a paired per-cell vector (e.g. transcriptomic embedding)
    into a shared space; symmetric InfoNCE across the batch. NaN targets
    (unpaired cells) are masked with static shapes: invalid rows get zero
    loss weight and invalid columns are excluded from every softmax."""

    in_dims: int = 768
    target_dims: int = 50
    proj_dims: int = 128
    image_hidden: int | Sequence[int] = 256
    target_hidden: int | Sequence[int] = 128
    temperature: float = 0.1

    @nn.compact
    def __call__(self, x: Array, y: Array, train: bool = False):
        """(B, in_dims) features + (B, target_dims) targets -> (loss, metrics)."""
        z_img = MLP(
            in_dims=self.in_dims,
            hidden_dims=self.image_hidden,
            out_dims=self.proj_dims,
            norm="ln",
            name="image_proj",
        )(x, train=train)
        z_img = z_img / (jnp.linalg.norm(z_img, axis=-1, keepdims=True) + 1e-12)
        valid = ~jnp.isnan(y).any(axis=-1)
        y_safe = jnp.nan_to_num(y, nan=0.0)
        z_tgt = MLP(
            in_dims=self.target_dims,
            hidden_dims=self.target_hidden,
            out_dims=self.proj_dims,
            norm="ln",
            name="target_proj",
        )(y_safe, train=train)
        z_tgt = z_tgt / (jnp.linalg.norm(z_tgt, axis=-1, keepdims=True) + 1e-12)
        logits = (z_img @ z_tgt.T) / self.temperature
        neg_inf = jnp.finfo(logits.dtype).min
        # mask invalid columns (img->tgt) and invalid rows (tgt->img)
        l_i2t = jnp.where(valid[None, :], logits, neg_inf)
        l_t2i = jnp.where(valid[None, :], logits.T, neg_inf)
        diag = jnp.arange(logits.shape[0])
        ce_i2t = -(jax.nn.log_softmax(l_i2t, axis=-1)[diag, diag])
        ce_t2i = -(jax.nn.log_softmax(l_t2i, axis=-1)[diag, diag])
        w = valid.astype(logits.dtype)
        n_valid = w.sum()
        # invalid rows have -inf on their own diagonal -> inf CE; select, don't multiply
        per_row = jnp.where(valid, 0.5 * (ce_i2t + ce_t2i), 0.0)
        loss = jnp.where(n_valid >= 2, per_row.sum() / jnp.maximum(n_valid, 1.0), 0.0)
        cos_diag = jnp.where(
            n_valid >= 1,
            ((z_img * z_tgt).sum(-1) * w).sum() / jnp.maximum(n_valid, 1.0),
            0.0,
        )
        hit = (jnp.argmax(l_i2t, axis=-1) == diag).astype(logits.dtype)
        retrieval = jnp.where(n_valid >= 1, (hit * w).sum() / jnp.maximum(n_valid, 1.0), 0.0)
        metrics = {
            f"metrics/paired_frac/{self.head_name}": w.mean(),
            f"metrics/cos/{self.head_name}": cos_diag,
            f"metrics/r@1/{self.head_name}": retrieval,
        }
        return loss, metrics


class ProjectionMLP(nn.Module):
    """Two-layer BN projection head used by ``ContrastiveEncoder``
    (reference ``contrastive/encoder.py:118``):
    Linear -> BN -> ReLU -> Linear -> BN."""

    in_dims: int
    hidden_dims: int
    out_dims: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Dense(self.hidden_dims, name="fc0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dims, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        return x
