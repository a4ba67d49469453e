"""Minimal torch-side reimplementation of the MONAI surface the reference uses.

The reference models import from ``monai`` (not installed in this image):

- ``monai.networks.blocks``: ``Convolution``, ``ResidualUnit``, ``UpSample``
  (blocks.py:7, heads.py:15, vae/beta_vae_25d.py:9)
- ``monai.networks.blocks.dynunet_block.get_conv_layer`` (blocks.py:8)
- ``monai.networks.utils.normal_init`` (heads.py:16)
- ``monai.networks.layers.factories.Norm`` / ``monai.networks.nets``
  (vae/beta_vae_monai.py:7-8 — stubbed; not exercised by the golden tests)

Reimplemented with MONAI's semantics (module tree / state-dict key names and
forward math) so the reference model code runs unmodified as a golden torch
implementation.  Test fixture only — written to MONAI's documented behavior
(Project MONAI, Apache-2.0), not copied.
"""

from __future__ import annotations

import math

import torch
from torch import nn

_CONV = {1: nn.Conv1d, 2: nn.Conv2d, 3: nn.Conv3d}
_CONVTRANS = {1: nn.ConvTranspose1d, 2: nn.ConvTranspose2d, 3: nn.ConvTranspose3d}
_INSTANCENORM = {1: nn.InstanceNorm1d, 2: nn.InstanceNorm2d, 3: nn.InstanceNorm3d}
_BATCHNORM = {1: nn.BatchNorm1d, 2: nn.BatchNorm2d, 3: nn.BatchNorm3d}
_AVGPOOL = {1: nn.AvgPool1d, 2: nn.AvgPool2d, 3: nn.AvgPool3d}


def _same_padding(kernel_size, dilation=1):
    """monai.networks.layers.convutils.same_padding."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,)
    if isinstance(dilation, int):
        dilation = (dilation,) * len(kernel_size)
    padding = tuple((k - 1) // 2 * d for k, d in zip(kernel_size, dilation))
    return padding if len(padding) > 1 else padding[0]


def _norm_layer(norm, spatial_dims: int, channels: int) -> nn.Module:
    """monai.networks.layers.utils.get_norm_layer for the names used here."""
    kwargs = {}
    if isinstance(norm, tuple):
        norm, kwargs = norm
    norm = str(norm).lower()
    if norm == "instance":
        return _INSTANCENORM[spatial_dims](channels, **kwargs)
    if norm == "batch":
        return _BATCHNORM[spatial_dims](channels, **kwargs)
    raise NotImplementedError(f"monai shim: norm {norm!r}")


def _act_layer(act) -> nn.Module:
    kwargs = {}
    if isinstance(act, tuple):
        act, kwargs = act
    act = str(act).lower()
    if act == "prelu":
        return nn.PReLU(**kwargs)
    if act == "relu":
        return nn.ReLU(**kwargs)
    if act == "leakyrelu":
        return nn.LeakyReLU(**kwargs)
    raise NotImplementedError(f"monai shim: act {act!r}")


class ADN(nn.Sequential):
    """monai.networks.blocks.ADN — norm/dropout/act in configurable order.

    Submodule names are the ordering letters ("N", "D", "A"), matching
    MONAI state-dict keys like ``...adn.N.bias`` / ``...adn.A.weight``.
    """

    def __init__(
        self,
        ordering: str = "NDA",
        in_channels: int | None = None,
        act="PRELU",
        norm="INSTANCE",
        norm_dim: int | None = None,
        dropout=None,
        dropout_dim: int = 1,
    ):
        super().__init__()
        op_dict = {"A": None, "D": None, "N": None}
        if norm is not None:
            op_dict["N"] = _norm_layer(norm, norm_dim, in_channels)
        if act is not None:
            op_dict["A"] = _act_layer(act)
        if dropout is not None:
            op_dict["D"] = nn.Dropout(dropout)
        for item in ordering.upper():
            if item not in op_dict:
                raise ValueError(f"ordering must be a subset of NDA, got {item}")
            if op_dict[item] is not None:
                self.add_module(item, op_dict[item])


class Convolution(nn.Sequential):
    """monai.networks.blocks.Convolution — conv (+ optional ADN)."""

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        out_channels: int,
        strides=1,
        kernel_size=3,
        adn_ordering: str = "NDA",
        act="PRELU",
        norm="INSTANCE",
        dropout=None,
        dropout_dim: int = 1,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
        conv_only: bool = False,
        is_transposed: bool = False,
        padding=None,
        output_padding=None,
    ):
        super().__init__()
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.is_transposed = is_transposed
        if padding is None:
            padding = _same_padding(kernel_size, dilation)
        if is_transposed:
            if output_padding is None:
                output_padding = _same_padding(strides if isinstance(strides, (tuple, list)) else (strides,), 1)
                output_padding = strides - 1 if isinstance(strides, int) else tuple(s - 1 for s in strides)
            conv = _CONVTRANS[spatial_dims](
                in_channels,
                out_channels,
                kernel_size=kernel_size,
                stride=strides,
                padding=padding,
                output_padding=output_padding,
                groups=groups,
                bias=bias,
                dilation=dilation,
            )
        else:
            conv = _CONV[spatial_dims](
                in_channels,
                out_channels,
                kernel_size=kernel_size,
                stride=strides,
                padding=padding,
                dilation=dilation,
                groups=groups,
                bias=bias,
            )
        self.add_module("conv", conv)
        if conv_only:
            return
        if act is None and norm is None and dropout is None:
            return
        self.add_module(
            "adn",
            ADN(
                ordering=adn_ordering,
                in_channels=out_channels,
                act=act,
                norm=norm,
                norm_dim=spatial_dims,
                dropout=dropout,
                dropout_dim=dropout_dim,
            ),
        )


class ResidualUnit(nn.Module):
    """monai.networks.blocks.ResidualUnit."""

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        out_channels: int,
        strides=1,
        kernel_size=3,
        subunits: int = 2,
        adn_ordering: str = "NDA",
        act="PRELU",
        norm="INSTANCE",
        dropout=None,
        dropout_dim: int = 1,
        dilation=1,
        bias: bool = True,
        last_conv_only: bool = False,
        padding=None,
    ):
        super().__init__()
        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.conv = nn.Sequential()
        self.residual = nn.Identity()
        if padding is None:
            padding = _same_padding(kernel_size, dilation)
        schannels = in_channels
        sstrides = strides
        subunits = max(1, subunits)
        for su in range(subunits):
            conv_only = last_conv_only and su == (subunits - 1)
            unit = Convolution(
                spatial_dims,
                schannels,
                out_channels,
                strides=sstrides,
                kernel_size=kernel_size,
                adn_ordering=adn_ordering,
                act=act,
                norm=norm,
                dropout=dropout,
                dropout_dim=dropout_dim,
                dilation=dilation,
                bias=bias,
                conv_only=conv_only,
                padding=padding,
            )
            self.conv.add_module(f"unit{su:d}", unit)
            schannels = out_channels
            sstrides = 1
        strides_prod = strides if isinstance(strides, int) else math.prod(strides)
        if strides_prod != 1 or in_channels != out_channels:
            rkernel_size = kernel_size
            rpadding = padding
            if strides_prod == 1:
                rkernel_size = 1
                rpadding = 0
            self.residual = _CONV[spatial_dims](in_channels, out_channels, rkernel_size, strides, rpadding, bias=bias)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        res = self.residual(x)
        cx = self.conv(x)
        return cx + res


class SubpixelUpsample(nn.Module):
    """monai.networks.blocks.SubpixelUpsample (2D/3D pixel shuffle upsample)."""

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int | None,
        out_channels: int | None = None,
        scale_factor: int = 2,
        conv_block="default",
        apply_pad_pool: bool = True,
        bias: bool = True,
    ):
        super().__init__()
        self.dimensions = spatial_dims
        self.scale_factor = scale_factor
        if conv_block == "default":
            out_channels = out_channels or in_channels
            conv_out_channels = out_channels * (scale_factor**spatial_dims)
            self.conv_block = _CONV[spatial_dims](in_channels, conv_out_channels, kernel_size=3, stride=1, padding=1, bias=bias)
            _icnr_init(self.conv_block, self.scale_factor)
        elif conv_block is None:
            self.conv_block = nn.Identity()
        else:
            self.conv_block = conv_block
        if apply_pad_pool:
            pad = {1: nn.ConstantPad1d, 2: nn.ConstantPad2d, 3: nn.ConstantPad3d}[spatial_dims]
            self.pad_pool = nn.Sequential(
                pad(padding=(self.scale_factor - 1, 0) * self.dimensions, value=0.0),
                _AVGPOOL[spatial_dims](kernel_size=self.scale_factor, stride=1),
            )
        else:
            self.pad_pool = nn.Identity()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv_block(x)
        if x.shape[1] % (self.scale_factor**self.dimensions) != 0:
            raise ValueError(
                f"channels {x.shape[1]} not divisible by scale_factor**dims {self.scale_factor**self.dimensions}"
            )
        if self.dimensions == 2:
            x = nn.functional.pixel_shuffle(x, self.scale_factor)
        else:
            x = _pixelshuffle_nd(x, self.dimensions, self.scale_factor)
        return self.pad_pool(x)


def _pixelshuffle_nd(x: torch.Tensor, spatial_dims: int, scale_factor: int) -> torch.Tensor:
    """monai.networks.utils.pixelshuffle generalized to nD."""
    dim, factor = spatial_dims, scale_factor
    input_size = list(x.size())
    batch_size, channels = input_size[:2]
    scale_divisor = factor**dim
    org_channels = channels // scale_divisor
    output_size = [batch_size, org_channels] + [d * factor for d in input_size[2:]]
    x = x.reshape(batch_size, org_channels, *([factor] * dim + input_size[2:]))
    indices = list(range(2, 2 + 2 * dim))
    indices = indices[dim:] + indices[:dim]
    permute_indices = [0, 1]
    for idx in range(dim):
        permute_indices.extend(indices[idx::dim])
    return x.permute(permute_indices).reshape(output_size)


def _icnr_init(conv: nn.Module, upsample_factor: int, init=nn.init.kaiming_normal_):
    """monai.networks.utils.icnr_init."""
    out_channels, in_channels, *dims = conv.weight.shape
    scale_factor = upsample_factor ** len(dims)
    oc2 = int(out_channels / scale_factor)
    kernel = torch.zeros([oc2, in_channels] + dims)
    kernel = init(kernel)
    kernel = kernel.transpose(0, 1)
    kernel = kernel.reshape(oc2, in_channels, -1)
    kernel = kernel.repeat(1, 1, scale_factor)
    kernel = kernel.reshape([in_channels, out_channels] + dims)
    kernel = kernel.transpose(0, 1)
    conv.weight.data.copy_(kernel)


class UpSample(nn.Sequential):
    """monai.networks.blocks.UpSample — pixelshuffle and deconv modes."""

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int | None = None,
        out_channels: int | None = None,
        scale_factor: int = 2,
        mode: str = "deconv",
        pre_conv="default",
        apply_pad_pool: bool = True,
        bias: bool = True,
        **kwargs,
    ):
        super().__init__()
        if mode == "pixelshuffle":
            self.add_module(
                "pixelshuffle",
                SubpixelUpsample(
                    spatial_dims=spatial_dims,
                    in_channels=in_channels,
                    out_channels=out_channels,
                    scale_factor=scale_factor,
                    conv_block=pre_conv,
                    apply_pad_pool=apply_pad_pool,
                    bias=bias,
                ),
            )
        elif mode == "deconv":
            self.add_module(
                "deconv",
                _CONVTRANS[spatial_dims](
                    in_channels, out_channels or in_channels, kernel_size=scale_factor, stride=scale_factor, bias=bias
                ),
            )
        else:
            raise NotImplementedError(f"monai shim: UpSample mode {mode!r}")


def _dyn_get_padding(kernel_size: int, stride: int) -> int:
    return max((kernel_size - stride + 1) // 2, 0)


def get_conv_layer(
    spatial_dims: int,
    in_channels: int,
    out_channels: int,
    kernel_size=3,
    stride=1,
    act="PRELU",
    norm="INSTANCE",
    dropout=None,
    bias: bool = False,
    conv_only: bool = True,
    is_transposed: bool = False,
):
    """monai.networks.blocks.dynunet_block.get_conv_layer."""
    padding = _dyn_get_padding(kernel_size, stride)
    output_padding = None
    if is_transposed:
        output_padding = 2 * padding + stride - kernel_size
    return Convolution(
        spatial_dims,
        in_channels,
        out_channels,
        strides=stride,
        kernel_size=kernel_size,
        act=act,
        norm=norm,
        dropout=dropout,
        bias=bias,
        conv_only=conv_only,
        is_transposed=is_transposed,
        padding=padding,
        output_padding=output_padding,
    )


def normal_init(m: nn.Module, std: float = 0.02, normal_func=nn.init.normal_) -> None:
    """monai.networks.utils.normal_init."""
    cname = m.__class__.__name__
    if getattr(m, "weight", None) is not None and (cname.find("Conv") != -1 or cname.find("Linear") != -1):
        normal_func(m.weight.data, 0.0, std)
        if getattr(m, "bias", None) is not None:
            nn.init.constant_(m.bias.data, 0)
    elif cname.find("BatchNorm") != -1:
        normal_func(m.weight.data, 1.0, std)
        nn.init.constant_(m.bias.data, 0)


class _NormFactory:
    """Stub of monai.networks.layers.factories.Norm (names only)."""

    BATCH = "batch"
    INSTANCE = "instance"

    def __getitem__(self, item):
        raise NotImplementedError("monai shim: Norm factory lookup not supported")


Norm = _NormFactory()


class VarAutoEncoder(nn.Module):  # pragma: no cover - import-time stub
    def __init__(self, *a, **k):
        raise NotImplementedError("monai shim: VarAutoEncoder not implemented")


class ResNetFeatures(nn.Module):  # pragma: no cover - import-time stub
    def __init__(self, *a, **k):
        raise NotImplementedError("monai shim: ResNetFeatures not implemented")


def _build_namespace():
    """Assemble module objects mimicking the monai package layout."""
    import types

    monai_mod = types.ModuleType("monai")
    networks_mod = types.ModuleType("monai.networks")
    blocks_mod = types.ModuleType("monai.networks.blocks")
    dynunet_mod = types.ModuleType("monai.networks.blocks.dynunet_block")
    utils_mod = types.ModuleType("monai.networks.utils")
    layers_mod = types.ModuleType("monai.networks.layers")
    factories_mod = types.ModuleType("monai.networks.layers.factories")
    nets_mod = types.ModuleType("monai.networks.nets")
    resnet_mod = types.ModuleType("monai.networks.nets.resnet")

    blocks_mod.ADN = ADN
    blocks_mod.Convolution = Convolution
    blocks_mod.ResidualUnit = ResidualUnit
    blocks_mod.SubpixelUpsample = SubpixelUpsample
    blocks_mod.UpSample = UpSample
    blocks_mod.dynunet_block = dynunet_mod
    dynunet_mod.get_conv_layer = get_conv_layer
    utils_mod.normal_init = normal_init
    utils_mod.icnr_init = _icnr_init
    utils_mod.pixelshuffle = _pixelshuffle_nd
    factories_mod.Norm = Norm
    layers_mod.factories = factories_mod
    nets_mod.VarAutoEncoder = VarAutoEncoder
    nets_mod.resnet = resnet_mod
    resnet_mod.ResNetFeatures = ResNetFeatures

    networks_mod.blocks = blocks_mod
    networks_mod.utils = utils_mod
    networks_mod.layers = layers_mod
    networks_mod.nets = nets_mod
    monai_mod.networks = networks_mod
    monai_mod.__version__ = "1.4.0+viscy-golden-shim"
    return {
        "monai": monai_mod,
        "monai.networks": networks_mod,
        "monai.networks.blocks": blocks_mod,
        "monai.networks.blocks.dynunet_block": dynunet_mod,
        "monai.networks.utils": utils_mod,
        "monai.networks.layers": layers_mod,
        "monai.networks.layers.factories": factories_mod,
        "monai.networks.nets": nets_mod,
        "monai.networks.nets.resnet": resnet_mod,
    }
