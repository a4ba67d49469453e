"""ConvNeXt(-v2) building blocks and the UNeXt2 decoder (flax.linen).

Native rebuild of the timm internals the reference composes
(``packages/viscy-models/src/viscy_models/components/blocks.py``,
``unet/unext2.py``): ConvNeXt-v2 blocks with Global Response Norm,
multiscale encoder stages, pixel-shuffle upsampling stages, and the
UNeXt2 decoder. Everything is channels-last (B, H, W, C) so depthwise and
1x1 convolutions map directly onto TPU MXU/VPU tiles.
"""

from __future__ import annotations

from typing import Callable, Literal, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

Array = jax.Array

# ConvNeXt(-v2) model registry: backbone name -> (depths, dims)
CONVNEXT_ARCHS: dict[str, tuple[tuple[int, ...], tuple[int, ...]]] = {
    "convnextv2_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnextv2_femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "convnextv2_pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "convnextv2_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnextv2_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnextv2_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnextv2_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    # tiny configs for fast CPU tests
    "convnextv2_test": ((1, 1, 2, 1), (16, 32, 64, 128)),
    "convnext_test": ((1, 1, 2, 1), (16, 32, 64, 128)),
}


def pixel_shuffle_2d(x: Array, r: int) -> Array:
    """Sub-pixel upsample, torch ``nn.PixelShuffle`` channel ordering.

    x: (B, H, W, C*r*r) -> (B, H*r, W*r, C); channel k = c*r^2 + i*r + j.
    NOT free: interleaving phases into the spatial axes is a real
    transpose (~one HBM pass each way, and twice under autodiff) — which
    is why the training loss can consume the packed pre-shuffle layout
    instead (``pad_pool_blur_packed`` + ``ops/ssim._ms_ssim_phase``).
    """
    return rearrange(x, "b h w (c i j) -> b (h i) (w j) c", i=r, j=r)


def pad_pool_blur_2d(x: Array, r: int) -> Array:
    """MONAI SubpixelUpsample ``apply_pad_pool`` blur: constant-zero pad of
    ``r - 1`` on the LEADING (top/left) edges, then average-pool (kernel r,
    stride 1) — torch ``ConstantPad2d((r-1, 0, r-1, 0), 0)`` + ``AvgPool``
    (monai ``networks/blocks/upsample.py`` SubpixelUpsample; golden-pinned
    by ``tests/test_torch_parity.py``)."""
    if r == 1:
        return x
    x = jnp.pad(x, ((0, 0), (r - 1, 0), (r - 1, 0), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, r, r, 1), (1, 1, 1, 1), "VALID"
    ) / float(r * r)


def _phase_pad_pool_1d(f: Array, spatial_axis: int, phase_axis: int) -> Array:
    """One axis of the phase-domain pad-pool (see ``pad_pool_blur_2d_phase``).

    For output position ``y = r*i + di`` the stride-1 r-tap mean over the
    shuffled-and-leading-zero-padded signal touches each phase exactly
    once: phases ``d' <= di`` from block ``i`` and phases ``d' > di`` from
    block ``i - 1`` (zero before the left edge — MONAI pads with constant
    0). All terms are prefix sums over the tiny phase axis, so the whole
    blur runs at pre-shuffle resolution.
    """
    r = f.shape[phase_axis]
    s_le = jnp.cumsum(f, axis=phase_axis)  # sum_{d' <= di} f[i, d']
    total = jax.lax.slice_in_dim(s_le, r - 1, r, axis=phase_axis)

    def shift_prev(a):
        body = jax.lax.slice_in_dim(a, 0, a.shape[spatial_axis] - 1, axis=spatial_axis)
        zero = jnp.zeros_like(
            jax.lax.slice_in_dim(a, 0, 1, axis=spatial_axis)
        )
        return jnp.concatenate([zero, body], axis=spatial_axis)

    p_gt = shift_prev(total - s_le)  # sum_{d' > di} f[i-1, d'], 0 at i=0
    return (s_le + p_gt) / r


def _pad_pool_phase_matrices(c_total: int, r: int) -> tuple:
    """(K, K) phase-mixing matrices for the pad-pool blur in packed space,
    K = c_total * r * r with channel k = c * r^2 + i * r + j (torch
    PixelShuffle ordering). The 1-D pass over true rows is, per output
    phase di, a sum over input phases d' >= di from the same block and
    d' < di from the next block (see ``_phase_pad_pool_1d``) — i.e. plain
    matmuls on the packed channel axis, which keep the big activation in
    its native layout (logical 6-D phase views make XLA materialize
    relayout copies)."""
    import numpy as np

    k = np.arange(c_total * r * r)
    c = k // (r * r)
    di = (k // r) % r
    dj = k % r
    same_cj = (c[:, None] == c[None, :]) & (dj[:, None] == dj[None, :])
    same_ci = (c[:, None] == c[None, :]) & (di[:, None] == di[None, :])
    # out = x @ M convention: M[k_in, k_out]; leading zero pad (MONAI):
    # out block i mixes phases d' <= di of block i (A) and d' > di of
    # block i-1 (B); block -1 is zero, so row 0 uses A alone
    a1 = (same_cj & (di[:, None] <= di[None, :])) / r
    b1 = (same_cj & (di[:, None] > di[None, :])) / r
    a2 = (same_ci & (dj[:, None] <= dj[None, :])) / r
    b2 = (same_ci & (dj[:, None] > dj[None, :])) / r
    f32 = lambda m: jnp.asarray(m, jnp.float32)
    return (f32(a1), f32(b1)), (f32(a2), f32(b2))


def _packed_dot(x: Array, m: Array) -> Array:
    return jax.lax.dot_general(
        x, m, (((3,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )


def pad_pool_blur_packed(x: Array, c_total: int, r: int) -> Array:
    """Pad-pool blur on the packed pre-shuffle tensor (B, h, w, c*r*r):
    ``pixel_shuffle_2d(pad_pool_blur_packed(x, c, r), r)`` equals
    ``pad_pool_blur_2d(pixel_shuffle_2d(x, r), r)`` exactly, with all data
    movement expressed as phase matmuls + one-row shifts (MXU-friendly,
    layout-preserving)."""
    if r == 1:
        return x
    (a1, b1), (a2, b2) = _pad_pool_phase_matrices(c_total, r)
    # y pass: rows 1..N-1 mix block i and i-1; row 0's out-of-range taps
    # read the constant-zero pad, so it uses the same-block matrix alone
    main = _packed_dot(x[:, 1:], a1) + _packed_dot(x[:, :-1], b1)
    first = _packed_dot(x[:, :1], a1)
    x = jnp.concatenate([first, main], axis=1)
    main = _packed_dot(x[:, :, 1:], a2) + _packed_dot(x[:, :, :-1], b2)
    first = _packed_dot(x[:, :, :1], a2)
    return jnp.concatenate([first, main], axis=2)


def pad_pool_blur_2d_phase(x: Array, r: int) -> Array:
    """Pad-pool blur computed in the **phase domain**, before the pixel
    shuffle: ``pixel_shuffle_2d(pad_pool_blur_2d_phase(x, r), r)`` equals
    ``pad_pool_blur_2d(pixel_shuffle_2d(x, r), r)`` exactly.

    The post-shuffle formulation costs a stride-1 r x r ``reduce_window``
    plus layout copies at full resolution (7+ ms/step at production shapes,
    the largest single window op in the round-3 trace); here the blur is a
    suffix-sum over the r-length phase axes plus one shifted add, all at
    pre-shuffle resolution, and fuses into neighboring elementwise work.
    """
    if r == 1:
        return x
    b, h, w, k = x.shape
    c = k // (r * r)
    f = x.reshape(b, h, w, c, r, r)  # channel k = c*r^2 + i*r + j
    f = _phase_pad_pool_1d(f, spatial_axis=1, phase_axis=4)
    f = _phase_pad_pool_1d(f, spatial_axis=2, phase_axis=5)
    return f.reshape(b, h, w, k)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


# when True, an optimization barrier separates the producing matmul (fc1)
# from the GRN's global reduction: XLA otherwise fuses the dot with the
# spatial L2 statistics into one loop fusion that runs far below MXU speed
# (measured; see docs/STATUS.md round-3 notes)
GRN_SPLIT_STATS = False


def _grn_stats_input(x: Array) -> Array:
    if GRN_SPLIT_STATS:
        return jax.lax.optimization_barrier(x)
    return x


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXt-v2).

    Channels-last: gx = ||x||_2 over spatial dims per (sample, channel);
    nx = gx / mean_c(gx); y = gamma * x * nx + beta + x.
    """

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        x = _grn_stats_input(x)
        spatial_axes = tuple(range(1, x.ndim - 1))
        gx = jnp.sqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial_axes, keepdims=True)
        )
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.eps)
        nx = nx.astype(x.dtype)
        return gamma * (x * nx) + beta + x


class _LNParams(nn.Module):
    """Parameter-tree stand-in for ``nn.LayerNorm`` (scale/bias) used by the
    fused-MLP path; identical names, shapes, and initializers keep the
    variable tree (and converted checkpoints) byte-compatible."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


def trunc_normal_init(std: float = 0.02):
    """timm ``_init_weights`` weight init (trunc normal, std 0.02): the
    reference applies it to every ConvNeXt stage's convs and linears
    (reference blocks.py:72 ``stage.apply(timm.models.convnext._init_weights)``)."""
    return nn.initializers.truncated_normal(stddev=std)


def icnr_init(
    upsample_factor: int,
    upsample_dims: int,
    init=nn.initializers.he_normal(),
):
    """ICNR initialization for sub-pixel (pixel-shuffle) convolutions
    (reference ``components/blocks.py:14``, Aitken et al. 2017): the
    ``upsample_factor**upsample_dims`` output channels feeding each
    shuffled spatial phase start EQUAL, so the upsample is checkerboard-
    free at init. Our shuffle layout puts a channel's phases consecutively
    (``pixel_shuffle_2d``: k = c*r^2 + phase), so the sub-kernel repeats
    blockwise along the output-channel axis. Falls back to ``init`` when
    the channel count does not divide."""
    scale = upsample_factor**upsample_dims

    def initializer(key, shape, dtype=jnp.float32):
        out = shape[-1]
        if scale <= 1 or out % scale:
            return init(key, shape, dtype)
        sub = init(key, (*shape[:-1], out // scale), dtype)
        return jnp.repeat(sub, scale, axis=-1)

    return initializer


class _DenseParams(nn.Module):
    """Parameter-tree stand-in for ``nn.Dense`` (kernel/bias)."""

    in_dim: int
    out_dim: int
    kernel_init: object = None

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel",
                self.kernel_init or trunc_normal_init(),
                (self.in_dim, self.out_dim),
            ),
            self.param("bias", nn.initializers.zeros, (self.out_dim,)),
        )


class _GRNParams(nn.Module):
    """Parameter-tree stand-in for :class:`GRN` (gamma/beta)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("gamma", nn.initializers.zeros, (self.dim,)),
            self.param("beta", nn.initializers.zeros, (self.dim,)),
        )


def _try_fused_mlp(
    parent,
    x: Array,
    shortcut: Array,
    dim: int,
    hidden: int,
    mask2d: Array | None = None,
) -> Array | None:
    """Run LN->fc1->gelu->GRN->fc2->(+shortcut) through the two-pass Pallas
    kernel (ops/pallas/fused_block.py) when shapes/dtypes allow; returns
    None when the caller should fall back to the unfused modules. Declares
    parameters under the same names (norm/fc1/grn/fc2) as the unfused path
    so both variants share one variable tree."""
    from viscy_tpu.ops.pallas import fused_block as _fb
    from viscy_tpu.ops.pallas.fused_block import fits_vmem, fused_mlp_grn, pick_s_tile

    interpret = _fb.FORCE_INTERPRET
    b, h, w, c = x.shape
    if (
        (not interpret and jax.devices()[0].platform != "tpu")
        or x.dtype != shortcut.dtype
        or pick_s_tile(h * w, 512) is None
        or not fits_vmem(h * w, dim, hidden)
    ):
        return None
    # under a multi-device mesh the kernel runs via shard_map over the
    # data axis (data_parallel_call); when the batch cannot shard (e.g.
    # a spatially sharded fov_shard predict with b=1), the direct-call
    # fallback would make GSPMD all-gather the operands and run the
    # kernel fully replicated — defeating sharding entirely. Fall back
    # to the unfused modules, which GSPMD partitions normally. Must be
    # decided BEFORE parameter declaration (shared variable tree).
    from viscy_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is not None and mesh.shape.get("data", 1) > 1 and b % mesh.shape["data"]:
        return None
    ln_s, ln_b = _LNParams(dim, name="norm", parent=parent)()
    w1, b1 = _DenseParams(dim, hidden, name="fc1", parent=parent)()
    gg, gb = _GRNParams(hidden, name="grn", parent=parent)()
    w2, b2 = _DenseParams(
        hidden,
        dim,
        kernel_init=getattr(parent, "fc2_kernel_init", None),
        name="fc2",
        parent=parent,
    )()
    params = (ln_s, ln_b, w1, b1, gg, gb, w2, b2)
    # shard_map over the data axis: the GSPMD partitioner has no rule for
    # the Mosaic custom call and would otherwise all-gather the batch
    from viscy_tpu.parallel.mesh import data_parallel_call

    if mask2d is None:
        out = data_parallel_call(
            lambda xb, sb, *p: fused_mlp_grn(xb, sb, *p, interpret=interpret),
            (x.reshape(b, h * w, c), shortcut.reshape(b, h * w, c)),
            params,
        )
    else:
        mask = mask2d.astype(x.dtype).reshape(b, h * w)
        out = data_parallel_call(
            lambda xb, sb, mb, *p: fused_mlp_grn(xb, sb, *p, mask=mb, interpret=interpret),
            (x.reshape(b, h * w, c), shortcut.reshape(b, h * w, c), mask),
            params,
        )
    return out.reshape(b, h, w, c)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block: 7x7 depthwise conv -> LN -> MLP (fc1/act/[GRN]/fc2).

    ``use_grn=True`` gives the v2 block (no layer scale); ``ls_init_value``
    enables the v1 layer-scale path. ``dtype`` sets the activation compute
    dtype (bf16 on TPU halves HBM traffic; params stay f32; norms/GRN
    statistics accumulate in f32).

    ``fused_mlp=True`` routes the LN->fc1->gelu->GRN->fc2->residual segment
    through the two-pass Pallas kernel (ops/pallas/fused_block.py), which
    recomputes fc1 in VMEM instead of materializing the ``mlp_ratio``-wide
    tensors in HBM — the dominant activation traffic of the HBM-bound
    production step. Value semantics and the parameter tree are identical
    (pinned in tests/test_fused_block.py); falls back to the unfused path
    for v1 blocks, active stochastic depth, or shapes with no tile divisor.
    """

    dim: int
    kernel_size: int = 7
    mlp_ratio: int = 4
    use_grn: bool = True
    ls_init_value: float | None = None
    drop_path: float = 0.0
    dtype: object = None
    fused_mlp: bool = False
    # override for fc2's kernel init (ICNR on blocks whose output feeds a
    # pixel shuffle, reference blocks.py:73); default timm trunc normal
    fc2_kernel_init: object = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        shortcut = x
        x = nn.Conv(
            self.dim,
            (self.kernel_size, self.kernel_size),
            feature_group_count=self.dim,
            padding=self.kernel_size // 2,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(),
            name="dwconv",
        )(x)
        hidden = self.mlp_ratio * self.dim
        if (
            self.fused_mlp
            and self.use_grn
            and self.ls_init_value is None
            and (self.drop_path == 0.0 or deterministic)
        ):
            out = _try_fused_mlp(self, x, shortcut, self.dim, hidden)
            if out is not None:
                return out
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            hidden, dtype=self.dtype, kernel_init=trunc_normal_init(), name="fc1"
        )(x)
        x = nn.gelu(x, approximate=False)
        if self.use_grn:
            x = GRN(hidden, name="grn")(x)
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=self.fc2_kernel_init or trunc_normal_init(),
            name="fc2",
        )(x)
        if self.ls_init_value is not None:
            gamma = self.param(
                "ls_gamma",
                nn.initializers.constant(self.ls_init_value),
                (self.dim,),
            )
            x = x * gamma
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic)
        return shortcut + x


class ConvNeXtStage(nn.Module):
    """Downsample (LN + strided conv) followed by ConvNeXt blocks.

    Matches timm ``ConvNeXtStage`` semantics: when ``in_chs != out_chs`` or
    ``stride > 1`` the downsample is LayerNorm + conv(kernel=max(stride, 1));
    otherwise identity.
    """

    in_chs: int
    out_chs: int
    depth: int = 2
    stride: int = 2
    kernel_size: int = 7
    mlp_ratio: int = 4
    use_grn: bool = True
    ls_init_value: float | None = None
    drop_path_rates: Sequence[float] | None = None
    dtype: object = None
    fused_mlp: bool = False
    # ICNR init for the LAST block's fc2 when this stage's output feeds a
    # pixel shuffle (reference blocks.py:73)
    last_fc2_init: object = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.in_chs != self.out_chs or self.stride > 1:
            k = self.stride if self.stride > 1 else 1
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="downsample_norm")(x)
            x = nn.Conv(
                self.out_chs,
                (k, k),
                strides=(self.stride, self.stride),
                padding="VALID",
                dtype=self.dtype,
                kernel_init=trunc_normal_init(),
                name="downsample_conv",
            )(x)
        rates = self.drop_path_rates or [0.0] * self.depth
        for i in range(self.depth):
            x = ConvNeXtBlock(
                self.out_chs,
                kernel_size=self.kernel_size,
                mlp_ratio=self.mlp_ratio,
                use_grn=self.use_grn,
                ls_init_value=self.ls_init_value,
                drop_path=rates[i],
                dtype=self.dtype,
                fused_mlp=self.fused_mlp,
                fc2_kernel_init=self.last_fc2_init if i == self.depth - 1 else None,
                name=f"block{i}",
            )(x, deterministic)
        return x


class MultiscaleEncoder(nn.Module):
    """ConvNeXt multiscale encoder with external stem.

    The reference replaces timm's stem conv with ``nn.Identity`` and feeds
    the output of its own 3D stem (``unext2.py:47``); timm's stem LayerNorm
    is retained — reproduced here as ``stem_norm``.
    """

    depths: Sequence[int]
    dims: Sequence[int]
    use_grn: bool = True
    ls_init_value: float | None = None
    drop_path_rate: float = 0.0
    stem_norm: bool = True
    dtype: object = None
    fused_mlp: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> list[Array]:
        if self.stem_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        total = sum(self.depths)
        dp_rates = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        features = []
        start = 0
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            x = ConvNeXtStage(
                in_chs=self.dims[max(i - 1, 0)] if i > 0 else self.dims[0],
                out_chs=dim,
                depth=depth,
                stride=1 if i == 0 else 2,
                use_grn=self.use_grn,
                ls_init_value=self.ls_init_value,
                drop_path_rates=dp_rates[start : start + depth],
                dtype=self.dtype,
                fused_mlp=self.fused_mlp,
                name=f"stage{i}",
            )(x, deterministic)
            features.append(x)
            start += depth
        return features


class UNeXt2UpStage(nn.Module):
    """Decoder stage: pixel-shuffle upsample, concat skip, ConvNeXt refine.

    Reference ``components/blocks.py:77`` (pixelshuffle mode): the upsample
    is a pure sub-pixel reshape (pre_conv=None), so ``in_channels`` must be
    divisible by ``scale_factor**2``; refinement is a stride-1 ConvNeXt
    stage whose channel change happens in its LN+1x1 downsample conv.
    """

    in_channels: int
    out_channels: int
    scale_factor: int
    conv_blocks: int = 2
    use_grn: bool = True
    dtype: object = None
    fused_mlp: bool = False

    @nn.compact
    def __call__(self, x: Array, skip: Array | None, deterministic: bool = True) -> Array:
        x = pixel_shuffle_2d(x, self.scale_factor)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvNeXtStage(
            in_chs=x.shape[-1],
            out_chs=self.out_channels,
            depth=self.conv_blocks,
            stride=1,
            use_grn=self.use_grn,
            dtype=self.dtype,
            fused_mlp=self.fused_mlp,
            # checkerboard-free init: this stage's output feeds the next
            # pixel shuffle (reference blocks.py:103 conv_weight_init_factor
            # = scale_factor when the upsample has no pre-conv, as here)
            last_fc2_init=icnr_init(self.scale_factor, 2),
            name="conv",
        )(x, deterministic)
        return x


class UNeXt2Decoder(nn.Module):
    """Multi-stage decoder (reference ``components/blocks.py:175``).

    ``num_channels`` is ordered bottleneck -> output. Each stage upsamples
    by ``strides[i]`` and fuses the next-higher-resolution skip.
    """

    num_channels: Sequence[int]
    strides: Sequence[int]
    conv_blocks: int = 2
    use_grn: bool = True
    dtype: object = None
    remat: bool = False
    fused_mlp: bool = False

    @nn.compact
    def __call__(self, features: Sequence[Array], deterministic: bool = True) -> Array:
        feat = features[0]
        skips = list(features[1:]) + [None]
        stage_cls = (
            nn.remat(UNeXt2UpStage, static_argnums=(3,)) if self.remat else UNeXt2UpStage
        )
        for i in range(len(self.num_channels) - 1):
            feat = stage_cls(
                in_channels=self.num_channels[i],
                out_channels=self.num_channels[i + 1],
                scale_factor=self.strides[i],
                conv_blocks=self.conv_blocks,
                use_grn=self.use_grn,
                dtype=self.dtype,
                fused_mlp=self.fused_mlp,
                name=f"stage{i}",
            )(feat, skips[i], deterministic)
        return feat
