"""Minimal torch-side reimplementation of the timm surface the reference uses.

The reference models (``/root/reference/packages/viscy-models``) import from
``timm`` (not installed in this image):

- ``timm.models.convnext``: ``ConvNeXtStage``, ``Downsample``, ``DropPath``,
  ``GlobalResponseNormMlp``, ``LayerNorm2d``, ``create_conv2d``,
  ``trunc_normal_``, ``_init_weights`` (fcmae.py:12-19, blocks.py:60-71)
- ``timm.create_model(backbone, features_only=..., num_classes=...)``
  (unext2.py:40, contrastive/encoder.py:93, vae/beta_vae_25d.py:117)
- ``timm.layers.LayerNorm2d`` / ``timm.layers.LayerNorm`` (blocks.py:68-69)

This shim reimplements exactly that surface with timm's semantics (module
tree / state-dict key names and forward math), so the reference model code
can run unmodified as a *golden* torch implementation for numeric parity
tests against the JAX port.  It is a test fixture only — written from timm's
documented behavior (pytorch-image-models, Apache-2.0), not copied.

Structural validation: the reference's own state-dict pins
(``test_state_dict_compat.py``: UNeXt2 atto=213 keys, FCMAE=222,
ContrastiveEncoder convnext_tiny=194) pass against this shim — see
``tests/test_torch_parity.py``.
"""

from __future__ import annotations

import math
from functools import partial

import torch
from torch import nn

__all__ = [
    "ConvNeXt",
    "ConvNeXtStage",
    "Downsample",
    "DropPath",
    "GlobalResponseNorm",
    "GlobalResponseNormMlp",
    "LayerNorm",
    "LayerNorm2d",
    "Mlp",
    "create_conv2d",
    "create_model",
    "trunc_normal_",
]


def trunc_normal_(tensor: torch.Tensor, mean: float = 0.0, std: float = 1.0, a: float = -2.0, b: float = 2.0):
    """timm.layers.trunc_normal_ (same contract as torch.nn.init.trunc_normal_)."""
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class DropPath(nn.Module):
    """Stochastic depth (timm.layers.DropPath). Identity at eval / p=0."""

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep_prob = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        random_tensor = x.new_empty(shape).bernoulli_(keep_prob)
        if keep_prob > 0.0 and self.scale_by_keep:
            random_tensor.div_(keep_prob)
        return x * random_tensor


class LayerNorm(nn.LayerNorm):
    """timm.layers.LayerNorm — channels-last LayerNorm with eps=1e-6 default."""

    def __init__(self, num_channels: int, eps: float = 1e-6, affine: bool = True):
        super().__init__(num_channels, eps=eps, elementwise_affine=affine)


class LayerNorm2d(nn.LayerNorm):
    """timm.layers.LayerNorm2d — LayerNorm over C of NCHW tensors, eps=1e-6."""

    def __init__(self, num_channels: int, eps: float = 1e-6, affine: bool = True):
        super().__init__(num_channels, eps=eps, elementwise_affine=affine)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x.permute(0, 2, 3, 1)
        x = nn.functional.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


def _get_padding(kernel_size: int, stride: int = 1, dilation: int = 1) -> int:
    """timm.layers.get_padding — symmetric 'same-ish' padding."""
    return ((stride - 1) + dilation * (kernel_size - 1)) // 2


def create_conv2d(
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    stride: int = 1,
    dilation: int = 1,
    padding: str | int = "",
    bias: bool = False,
    depthwise: bool = False,
    groups: int | None = None,
) -> nn.Conv2d:
    """timm.layers.create_conv2d for the static (non-'same') padding path.

    bias defaults to False: timm's ``create_conv2d_pad`` does
    ``kwargs.setdefault('bias', False)`` — call sites that want a bias
    (e.g. ConvNeXt blocks via ``conv_bias=True``) pass it explicitly.
    The reference FCMAE masked block omits it, so its dwconv is bias-free.
    """
    if depthwise:
        groups = in_channels
    else:
        groups = groups or 1
    if padding == "" or padding is None:
        padding = _get_padding(kernel_size, stride, dilation)
    return nn.Conv2d(
        in_channels,
        out_channels,
        kernel_size,
        stride=stride,
        padding=padding,
        dilation=dilation,
        groups=groups,
        bias=bias,
    )


class GlobalResponseNorm(nn.Module):
    """timm.layers.GlobalResponseNorm (ConvNeXt-V2 GRN)."""

    def __init__(self, dim: int, eps: float = 1e-6, channels_last: bool = True):
        super().__init__()
        self.eps = eps
        if channels_last:
            self.spatial_dim = (1, 2)
            self.channel_dim = -1
            self.wb_shape = (1, 1, 1, -1)
        else:
            self.spatial_dim = (2, 3)
            self.channel_dim = 1
            self.wb_shape = (1, -1, 1, 1)
        self.weight = nn.Parameter(torch.zeros(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x_g = x.norm(p=2, dim=self.spatial_dim, keepdim=True)
        x_n = x_g / (x_g.mean(dim=self.channel_dim, keepdim=True) + self.eps)
        return x + torch.addcmul(self.bias.view(self.wb_shape), self.weight.view(self.wb_shape), x * x_n)


class Mlp(nn.Module):
    """timm.layers.Mlp (no norm, used by ConvNeXt v1 blocks)."""

    def __init__(
        self,
        in_features: int,
        hidden_features: int | None = None,
        out_features: int | None = None,
        act_layer=nn.GELU,
        bias: bool = True,
        drop: float = 0.0,
        use_conv: bool = False,
    ):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        linear_layer = partial(nn.Conv2d, kernel_size=1) if use_conv else nn.Linear
        self.fc1 = linear_layer(in_features, hidden_features, bias=bias)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.norm = nn.Identity()
        self.fc2 = linear_layer(hidden_features, out_features, bias=bias)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        x = self.fc1(x)
        x = self.act(x)
        x = self.drop1(x)
        x = self.norm(x)
        x = self.fc2(x)
        x = self.drop2(x)
        return x


class GlobalResponseNormMlp(nn.Module):
    """timm.layers.GlobalResponseNormMlp — Mlp with GRN between act and fc2."""

    def __init__(
        self,
        in_features: int,
        hidden_features: int | None = None,
        out_features: int | None = None,
        act_layer=nn.GELU,
        bias: bool = True,
        drop: float = 0.0,
        use_conv: bool = False,
    ):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        linear_layer = partial(nn.Conv2d, kernel_size=1) if use_conv else nn.Linear
        self.fc1 = linear_layer(in_features, hidden_features, bias=bias)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.grn = GlobalResponseNorm(hidden_features, channels_last=not use_conv)
        self.fc2 = linear_layer(hidden_features, out_features, bias=bias)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        x = self.fc1(x)
        x = self.act(x)
        x = self.drop1(x)
        x = self.grn(x)
        x = self.fc2(x)
        x = self.drop2(x)
        return x


class Downsample(nn.Module):
    """timm.models.convnext.Downsample — shortcut pool+1x1 projection."""

    def __init__(self, in_chs: int, out_chs: int, stride: int = 1, dilation: int = 1):
        super().__init__()
        avg_stride = stride if dilation == 1 else 1
        if stride > 1 or dilation > 1:
            self.pool = nn.AvgPool2d(2, avg_stride, ceil_mode=True, count_include_pad=False)
        else:
            self.pool = nn.Identity()
        if in_chs != out_chs:
            self.conv = nn.Conv2d(in_chs, out_chs, 1, stride=1, bias=False)
        else:
            self.conv = nn.Identity()

    def forward(self, x):
        return self.conv(self.pool(x))


class ConvNeXtBlock(nn.Module):
    """timm.models.convnext.ConvNeXtBlock."""

    def __init__(
        self,
        in_chs: int,
        out_chs: int | None = None,
        kernel_size: int = 7,
        stride: int = 1,
        dilation: tuple[int, int] = (1, 1),
        mlp_ratio: float = 4,
        conv_mlp: bool = False,
        conv_bias: bool = True,
        use_grn: bool = False,
        ls_init_value: float | None = 1e-6,
        act_layer=nn.GELU,
        norm_layer=None,
        drop_path: float = 0.0,
    ):
        super().__init__()
        out_chs = out_chs or in_chs
        if isinstance(dilation, int):
            dilation = (dilation, dilation)
        if not norm_layer:
            norm_layer = LayerNorm2d if conv_mlp else LayerNorm
        mlp_layer = partial(GlobalResponseNormMlp if use_grn else Mlp, use_conv=conv_mlp)
        self.use_conv_mlp = conv_mlp
        self.conv_dw = create_conv2d(
            in_chs,
            out_chs,
            kernel_size=kernel_size,
            stride=stride,
            dilation=dilation[0],
            depthwise=True,
            bias=conv_bias,
        )
        self.norm = norm_layer(out_chs)
        self.mlp = mlp_layer(out_chs, int(mlp_ratio * out_chs), act_layer=act_layer)
        self.gamma = nn.Parameter(ls_init_value * torch.ones(out_chs)) if ls_init_value is not None else None
        if in_chs != out_chs or stride != 1 or dilation[0] != dilation[1]:
            self.shortcut = Downsample(in_chs, out_chs, stride=stride, dilation=dilation[0])
        else:
            self.shortcut = nn.Identity()
        self.drop_path = DropPath(drop_path) if drop_path > 0.0 else nn.Identity()

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x)
        if self.use_conv_mlp:
            x = self.norm(x)
            x = self.mlp(x)
        else:
            x = x.permute(0, 2, 3, 1)
            x = self.norm(x)
            x = self.mlp(x)
            x = x.permute(0, 3, 1, 2)
        if self.gamma is not None:
            x = x.mul(self.gamma.reshape(1, -1, 1, 1))
        x = self.drop_path(x) + self.shortcut(shortcut)
        return x


class ConvNeXtStage(nn.Module):
    """timm.models.convnext.ConvNeXtStage."""

    def __init__(
        self,
        in_chs: int,
        out_chs: int,
        kernel_size: int = 7,
        stride: int = 2,
        depth: int = 2,
        dilation: tuple[int, int] = (1, 1),
        drop_path_rates=None,
        ls_init_value: float | None = 1.0,
        conv_mlp: bool = False,
        conv_bias: bool = True,
        use_grn: bool = False,
        act_layer=nn.GELU,
        norm_layer=None,
        norm_layer_cl=None,
    ):
        super().__init__()
        if in_chs != out_chs or stride > 1 or dilation[0] != dilation[1]:
            ds_ks = 2 if stride > 1 or dilation[0] != dilation[1] else 1
            pad = "same" if dilation[1] > 1 else 0
            self.downsample = nn.Sequential(
                norm_layer(in_chs),
                create_conv2d(
                    in_chs,
                    out_chs,
                    kernel_size=ds_ks,
                    stride=stride,
                    dilation=dilation[0],
                    padding=pad,
                    bias=conv_bias,
                ),
            )
            in_chs = out_chs
        else:
            self.downsample = nn.Identity()
        drop_path_rates = drop_path_rates or [0.0] * depth
        stage_blocks = []
        for i in range(depth):
            stage_blocks.append(
                ConvNeXtBlock(
                    in_chs=in_chs,
                    out_chs=out_chs,
                    kernel_size=kernel_size,
                    dilation=dilation[1],
                    drop_path=drop_path_rates[i],
                    ls_init_value=ls_init_value,
                    conv_mlp=conv_mlp,
                    conv_bias=conv_bias,
                    use_grn=use_grn,
                    act_layer=act_layer,
                    norm_layer=norm_layer if conv_mlp else norm_layer_cl,
                )
            )
            in_chs = out_chs
        self.blocks = nn.Sequential(*stage_blocks)

    def forward(self, x):
        x = self.downsample(x)
        return self.blocks(x)


def _init_weights(module: nn.Module, name: str | None = None, head_init_scale: float = 1.0):
    """timm.models.convnext._init_weights."""
    if isinstance(module, nn.Conv2d):
        trunc_normal_(module.weight, std=0.02)
        if module.bias is not None:
            nn.init.zeros_(module.bias)
    elif isinstance(module, nn.Linear):
        trunc_normal_(module.weight, std=0.02)
        nn.init.zeros_(module.bias)


class SelectAdaptivePool2d(nn.Module):
    """timm.layers.SelectAdaptivePool2d, 'avg' pool type, flatten=False."""

    def __init__(self, pool_type: str = "avg", flatten: bool = False):
        super().__init__()
        assert pool_type == "avg"
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten(1) if flatten else nn.Identity()

    def forward(self, x):
        return self.flatten(self.pool(x))


class NormMlpClassifierHead(nn.Module):
    """timm.layers.NormMlpClassifierHead (no hidden layer)."""

    def __init__(self, in_features: int, num_classes: int, pool_type: str = "avg", drop_rate: float = 0.0, norm_layer=LayerNorm2d):
        super().__init__()
        self.num_features = in_features
        self.global_pool = SelectAdaptivePool2d(pool_type=pool_type)
        self.norm = norm_layer(in_features)
        self.flatten = nn.Flatten(1) if pool_type else nn.Identity()
        self.pre_logits = nn.Identity()
        self.drop = nn.Dropout(drop_rate)
        self.fc = nn.Linear(in_features, num_classes) if num_classes > 0 else nn.Identity()

    def forward(self, x):
        x = self.global_pool(x)
        x = self.norm(x)
        x = self.flatten(x)
        x = self.pre_logits(x)
        x = self.drop(x)
        return self.fc(x)


class _FeatureInfo:
    def __init__(self, channels: list[int], reductions: list[int]):
        self._channels = list(channels)
        self._reductions = list(reductions)

    def channels(self) -> list[int]:
        return list(self._channels)

    def reduction(self) -> list[int]:
        return list(self._reductions)


class ConvNeXt(nn.Module):
    """timm.models.convnext.ConvNeXt — classification variant (features_only=False).

    Matches timm's module tree: ``stem`` (Sequential: patchify conv + norm),
    ``stages`` (Sequential of ConvNeXtStage), ``norm_pre`` (Identity for the
    default head_norm_first=False), ``head`` (NormMlpClassifierHead).
    """

    def __init__(
        self,
        in_chans: int = 3,
        num_classes: int = 1000,
        depths=(3, 3, 9, 3),
        dims=(96, 192, 384, 768),
        ls_init_value: float | None = 1e-6,
        conv_mlp: bool = False,
        conv_bias: bool = True,
        use_grn: bool = False,
        patch_size: int = 4,
        drop_path_rate: float = 0.0,
        drop_rate: float = 0.0,
    ):
        super().__init__()
        norm_layer = LayerNorm2d
        norm_layer_cl = norm_layer if conv_mlp else LayerNorm
        self.num_classes = num_classes
        self.num_features = dims[-1]
        self.feature_info = []

        self.stem = nn.Sequential(
            nn.Conv2d(in_chans, dims[0], kernel_size=patch_size, stride=patch_size, bias=conv_bias),
            norm_layer(dims[0]),
        )
        stem_stride = patch_size

        dp_rates = [x.tolist() for x in torch.linspace(0, drop_path_rate, sum(depths)).split(list(depths))]
        stages = []
        prev_chs = dims[0]
        curr_stride = stem_stride
        for i in range(len(depths)):
            stride = 2 if i > 0 else 1
            curr_stride *= stride
            out_chs = dims[i]
            stages.append(
                ConvNeXtStage(
                    prev_chs,
                    out_chs,
                    kernel_size=7,
                    stride=stride,
                    dilation=(1, 1),
                    depth=depths[i],
                    drop_path_rates=dp_rates[i],
                    ls_init_value=ls_init_value,
                    conv_mlp=conv_mlp,
                    conv_bias=conv_bias,
                    use_grn=use_grn,
                    norm_layer=norm_layer,
                    norm_layer_cl=norm_layer_cl,
                )
            )
            prev_chs = out_chs
            self.feature_info += [dict(num_chs=prev_chs, reduction=curr_stride, module=f"stages.{i}")]
        self.stages = nn.Sequential(*stages)
        self.norm_pre = nn.Identity()
        self.head = NormMlpClassifierHead(
            self.num_features, num_classes, pool_type="avg", drop_rate=drop_rate, norm_layer=norm_layer
        )
        self.apply(_init_weights)

    def forward_features(self, x):
        x = self.stem(x)
        x = self.stages(x)
        return self.norm_pre(x)

    def forward(self, x):
        x = self.forward_features(x)
        return self.head(x)


class FeatureListNet(nn.Module):
    """timm's features_only wrapper for ConvNeXt, flattened module names.

    timm flattens the wrapped model's Sequential children one level:
    ``stem`` becomes ``stem_0`` / ``stem_1``, ``stages`` becomes
    ``stages_0`` .. ``stages_N``.  Forward returns the feature maps at each
    stage output.  The reference mutates ``.stem_0`` directly
    (unext2.py:48), which this layout supports.
    """

    def __init__(self, model: ConvNeXt, out_indices=(0, 1, 2, 3)):
        super().__init__()
        self.feature_info = _FeatureInfo(
            [model.feature_info[i]["num_chs"] for i in out_indices],
            [model.feature_info[i]["reduction"] for i in out_indices],
        )
        self._out_modules = [f"stages_{i}" for i in out_indices]
        self.stem_0 = model.stem[0]
        self.stem_1 = model.stem[1]
        for i, stage in enumerate(model.stages):
            setattr(self, f"stages_{i}", stage)
        self._num_stages = len(model.stages)

    def forward(self, x) -> list[torch.Tensor]:
        features = []
        x = self.stem_0(x)
        x = self.stem_1(x)
        for i in range(self._num_stages):
            x = getattr(self, f"stages_{i}")(x)
            if f"stages_{i}" in self._out_modules:
                features.append(x)
        return features


_MODEL_CFGS = {
    # name: depths, dims, ls_init_value, use_grn
    "convnext_atto": dict(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), ls_init_value=1e-6, use_grn=False),
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), ls_init_value=1e-6, use_grn=False),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), ls_init_value=1e-6, use_grn=False),
    "convnextv2_atto": dict(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), ls_init_value=None, use_grn=True),
    "convnextv2_femto": dict(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384), ls_init_value=None, use_grn=True),
    "convnextv2_pico": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512), ls_init_value=None, use_grn=True),
    "convnextv2_nano": dict(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640), ls_init_value=None, use_grn=True),
    "convnextv2_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), ls_init_value=None, use_grn=True),
    "convnextv2_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), ls_init_value=None, use_grn=True),
    "convnextv2_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), ls_init_value=None, use_grn=True),
}


def create_model(
    model_name: str,
    pretrained: bool = False,
    features_only: bool = False,
    drop_path_rate: float = 0.0,
    num_classes: int = 1000,
    in_chans: int = 3,
    **kwargs,
):
    """timm.create_model for the convnext/convnextv2 families used by the reference."""
    if pretrained:
        raise NotImplementedError("torch_golden shim: no pretrained weights in this environment")
    if model_name not in _MODEL_CFGS:
        raise NotImplementedError(f"torch_golden shim: unknown backbone {model_name!r}")
    cfg = _MODEL_CFGS[model_name]
    model = ConvNeXt(
        in_chans=in_chans,
        num_classes=num_classes,
        depths=cfg["depths"],
        dims=cfg["dims"],
        ls_init_value=cfg["ls_init_value"],
        use_grn=cfg["use_grn"],
        conv_mlp=False,
        drop_path_rate=drop_path_rate,
    )
    if features_only:
        return FeatureListNet(model)
    return model


def _build_namespace():
    """Assemble module objects mimicking the timm package layout."""
    import types

    timm_mod = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    convnext_mod = types.ModuleType("timm.models.convnext")
    layers_mod = types.ModuleType("timm.layers")

    for name in (
        "ConvNeXt",
        "ConvNeXtBlock",
        "ConvNeXtStage",
        "Downsample",
        "DropPath",
        "GlobalResponseNorm",
        "GlobalResponseNormMlp",
        "LayerNorm",
        "LayerNorm2d",
        "Mlp",
        "create_conv2d",
        "trunc_normal_",
        "_init_weights",
    ):
        setattr(convnext_mod, name, globals()[name])
    for name in (
        "DropPath",
        "GlobalResponseNorm",
        "GlobalResponseNormMlp",
        "LayerNorm",
        "LayerNorm2d",
        "Mlp",
        "NormMlpClassifierHead",
        "SelectAdaptivePool2d",
        "create_conv2d",
        "trunc_normal_",
    ):
        setattr(layers_mod, name, globals()[name])

    models_mod.convnext = convnext_mod
    timm_mod.models = models_mod
    timm_mod.layers = layers_mod
    timm_mod.create_model = create_model
    timm_mod.__version__ = "1.0.0+viscy-golden-shim"
    return {
        "timm": timm_mod,
        "timm.models": models_mod,
        "timm.models.convnext": convnext_mod,
        "timm.layers": layers_mod,
    }
