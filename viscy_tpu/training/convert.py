"""Torch-checkpoint to flax-parameter conversion.

The reference releases torch Lightning checkpoints (VSCyto3D/2D, DynaCLR);
this module maps their state-dict naming (timm ConvNeXt internals, the
FCMAE modules of ``unet/fcmae.py``, MONAI heads) onto the flax parameter
trees of :mod:`viscy_tpu.models`, with the layout transposes TPU needs:

- Conv2d ``(O, I, kh, kw)``        -> ``(kh, kw, I, O)``
- Conv3d ``(O, I, kd, kh, kw)``    -> ``(kd, kh, kw, I, O)``
- depthwise Conv2d ``(C, 1, k, k)``-> ``(k, k, 1, C)``
- Linear ``(O, I)``                -> ``(I, O)``
- LayerNorm weight/bias            -> scale/bias
- GRN gamma/beta (any shape)       -> flattened ``(C,)``

Checkpoint-parity testing strategy follows the reference
(``viscy-models/tests/test_state_dict_compat.py``): conversion is validated
by rule-table round trips; released-checkpoint numeric parity (atol 0.02,
Pearson r > 0.999) runs where the artifacts are available.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable

import numpy as np

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "convert_fcmae_state_dict",
    "convert_unext2_state_dict",
    "convert_contrastive_state_dict",
    "convert_unet2d_state_dict",
    "convert_unet25d_state_dict",
    "convert_unet3d_state_dict",
    "convert_patchgan3d_state_dict",
    "convert_celldiff_state_dict",
    "convert_multiscale_patchgan3d_state_dict",
    "convert_state_dict",
    "convert_state_dict_full",
    "load_torch_checkpoint",
]


def _t_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t_linear(w):
    return np.transpose(w, (1, 0))


def _t_conv1x1_to_dense(w):
    # (O, I, 1, 1) conv-mlp kernels -> dense (I, O)
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def _flat(w):
    return np.asarray(w).reshape(-1)


# rules: (torch-key regex) -> (flax path template, transform for ".weight")
# ``{i}``/``{j}`` capture stage/block indices. Bias maps 1:1 (flattened).
_FCMAE_RULES: list[tuple[str, str, Callable]] = [
    # stem
    (r"encoder\.stem\.conv3d", "encoder/stem/conv3d", _t_conv3d),
    (r"encoder\.stem\.conv2d", "encoder/stem/conv2d", _t_conv2d),
    (r"encoder\.stem\.norm", "encoder/stem/norm", None),
    # encoder stages
    (
        r"encoder\.stages\.(\d+)\.downsample\.0",
        "encoder/stage{0}/downsample_norm",
        None,
    ),
    (
        r"encoder\.stages\.(\d+)\.downsample\.1",
        "encoder/stage{0}/downsample_conv",
        _t_conv2d,
    ),
    (
        r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.dwconv",
        "encoder/stage{0}/block{1}/dwconv",
        _t_conv2d,
    ),
    (
        r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.layernorm",
        "encoder/stage{0}/block{1}/norm",
        None,
    ),
    (
        r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.mlp\.fc1",
        "encoder/stage{0}/block{1}/fc1",
        _t_linear,
    ),
    (
        r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.mlp\.grn",
        "encoder/stage{0}/block{1}/grn",
        _flat,
    ),
    (
        r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.mlp\.fc2",
        "encoder/stage{0}/block{1}/fc2",
        _t_linear,
    ),
    # decoder stages (timm ConvNeXtStage, conv_mlp=True -> 1x1 convs)
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.downsample\.0",
        "decoder/stage{0}/conv/downsample_norm",
        None,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.downsample\.1",
        "decoder/stage{0}/conv/downsample_conv",
        _t_conv2d,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.conv_dw",
        "decoder/stage{0}/conv/block{1}/dwconv",
        _t_conv2d,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.norm",
        "decoder/stage{0}/conv/block{1}/norm",
        None,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.mlp\.fc1",
        "decoder/stage{0}/conv/block{1}/fc1",
        _t_conv1x1_to_dense,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.mlp\.grn",
        "decoder/stage{0}/conv/block{1}/grn",
        _flat,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.mlp\.fc2",
        "decoder/stage{0}/conv/block{1}/fc2",
        _t_conv1x1_to_dense,
    ),
    # PixelToVoxelHead (monai Convolution: .conv + .adn.A PReLU)
    (r"head\.conv\.0\.conv", "head/conv0", _t_conv3d),
    (r"head\.conv\.0\.adn\.A", "head/conv0_prelu", _flat),
    (r"head\.conv\.1", "head/conv1", _t_conv3d),
]

_PARAM_NAME = {"weight": None, "bias": "bias", "gamma": "gamma", "beta": "beta"}


def _flax_leaf_name(flax_path: str, torch_param: str, transform) -> tuple[str, Callable | None]:
    """Resolve the flax leaf name and value transform for a torch param."""
    last = flax_path.split("/")[-1]
    is_norm = transform is None and last.endswith(("norm",)) or last == "norm"
    if torch_param == "weight":
        if transform is _flat and "grn" in last:
            return "gamma", _flat
        if transform is _flat and last.endswith("prelu"):
            # PReLU alpha is a bare param leaf on the parent module
            return "", _flat
        if transform is None:
            return "scale", _flat  # layer norms
        return "kernel", transform
    if torch_param == "bias":
        if "grn" in last:
            return "beta", _flat
        return "bias", _flat
    if torch_param == "gamma" and "grn" not in last:
        # ConvNeXt-v1 layer scale lives directly on the block
        return "ls_gamma", _flat
    return torch_param, _flat


def convert_state_dict(
    state_dict: dict[str, Any],
    rules: list[tuple[str, str, Callable]],
    strip_prefix: str = "model.",
) -> tuple[dict, list[str]]:
    """Convert a torch state dict into a nested flax params dict.

    Returns (params, unmatched_keys).
    """
    params, _, unmatched = convert_state_dict_full(state_dict, rules, strip_prefix)
    return params, unmatched


def convert_state_dict_full(
    state_dict: dict[str, Any],
    rules: list[tuple[str, str, Callable]],
    strip_prefix: str = "model.",
) -> tuple[dict, dict, list[str]]:
    """Convert a torch state dict into nested flax trees.

    Returns ``(params, batch_stats, unmatched_keys)``. BatchNorm running
    stats (``running_mean``/``running_var``) are routed into the
    ``batch_stats`` tree as ``mean``/``var`` at the rule's flax path;
    ``num_batches_tracked`` counters (no flax analog) are dropped silently.
    """
    params: dict = {}
    stats: dict = {}
    unmatched: list[str] = []
    for key, value in state_dict.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        if key.endswith(".num_batches_tracked"):
            continue
        arr = np.asarray(value)
        m = None
        for pattern, template, transform in rules:
            m = re.match(rf"^{pattern}\.(\w+)$", key)
            if m:
                groups = m.groups()
                torch_param = groups[-1]
                flax_path = template.format(*groups[:-1])
                if torch_param in ("running_mean", "running_var"):
                    tree = stats
                    parts = flax_path.split("/")
                    leaf = "mean" if torch_param == "running_mean" else "var"
                    val = _flat(arr)
                else:
                    tree = params
                    leaf, tf = _flax_leaf_name(flax_path, torch_param, transform)
                    parts = flax_path.split("/")
                    if leaf == "":
                        # bare param leaf: the path's last segment IS the leaf
                        parts, leaf = parts[:-1], parts[-1]
                    val = tf(arr) if tf else arr
                node = tree
                for part in parts:
                    node = node.setdefault(part, {})
                node[leaf] = val
                break
        else:
            unmatched.append(key)
    return params, stats, unmatched


# UNeXt2: timm features_only ConvNeXt encoder ("encoder_stages.*"),
# UNeXt2Stem ("stem.conv"), UNeXt2Decoder, PixelToVoxelHead (monai).
_UNEXT2_RULES: list[tuple[str, str, Callable]] = [
    (r"stem\.conv", "stem/conv", _t_conv3d),
    (r"encoder_stages\.stem_1", "encoder/stem_norm", None),
    (
        r"encoder_stages\.stages_(\d+)\.downsample\.0",
        "encoder/stage{0}/downsample_norm",
        None,
    ),
    (
        r"encoder_stages\.stages_(\d+)\.downsample\.1",
        "encoder/stage{0}/downsample_conv",
        _t_conv2d,
    ),
    (
        r"encoder_stages\.stages_(\d+)\.blocks\.(\d+)\.conv_dw",
        "encoder/stage{0}/block{1}/dwconv",
        _t_conv2d,
    ),
    (
        r"encoder_stages\.stages_(\d+)\.blocks\.(\d+)\.norm",
        "encoder/stage{0}/block{1}/norm",
        None,
    ),
    (
        r"encoder_stages\.stages_(\d+)\.blocks\.(\d+)\.mlp\.fc1",
        "encoder/stage{0}/block{1}/fc1",
        _t_linear,
    ),
    (
        r"encoder_stages\.stages_(\d+)\.blocks\.(\d+)\.mlp\.grn",
        "encoder/stage{0}/block{1}/grn",
        _flat,
    ),
    (
        r"encoder_stages\.stages_(\d+)\.blocks\.(\d+)\.mlp\.fc2",
        "encoder/stage{0}/block{1}/fc2",
        _t_linear,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.downsample\.0",
        "decoder/stage{0}/conv/downsample_norm",
        None,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.downsample\.1",
        "decoder/stage{0}/conv/downsample_conv",
        _t_conv2d,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.conv_dw",
        "decoder/stage{0}/conv/block{1}/dwconv",
        _t_conv2d,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.norm",
        "decoder/stage{0}/conv/block{1}/norm",
        None,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.mlp\.fc1",
        "decoder/stage{0}/conv/block{1}/fc1",
        _t_conv1x1_to_dense,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.mlp\.grn",
        "decoder/stage{0}/conv/block{1}/grn",
        _flat,
    ),
    (
        r"decoder\.decoder_stages\.(\d+)\.conv\.blocks\.(\d+)\.mlp\.fc2",
        "decoder/stage{0}/conv/block{1}/fc2",
        _t_conv1x1_to_dense,
    ),
    (r"head\.conv\.0\.conv", "head/conv0", _t_conv3d),
    (r"head\.conv\.0\.adn\.A", "head/conv0_prelu", _flat),
    (r"head\.conv\.1", "head/conv1", _t_conv3d),
]

# ContrastiveEncoder: StemDepthtoChannels + timm classification ConvNeXt
# ("encoder.stages.*", head.norm/head.fc) + BN projection MLP.
_CONTRASTIVE_RULES: list[tuple[str, str, Callable]] = [
    (r"stem\.conv", "stem/conv", _t_conv3d),
    (r"encoder\.stem\.1", "encoder/stem_norm", None),
    (r"encoder\.stages\.(\d+)\.downsample\.0", "encoder/stage{0}/downsample_norm", None),
    (r"encoder\.stages\.(\d+)\.downsample\.1", "encoder/stage{0}/downsample_conv", _t_conv2d),
    (r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.conv_dw", "encoder/stage{0}/block{1}/dwconv", _t_conv2d),
    (r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.norm", "encoder/stage{0}/block{1}/norm", None),
    (r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.mlp\.fc1", "encoder/stage{0}/block{1}/fc1", _t_linear),
    (r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.mlp\.grn", "encoder/stage{0}/block{1}/grn", _flat),
    (r"encoder\.stages\.(\d+)\.blocks\.(\d+)\.mlp\.fc2", "encoder/stage{0}/block{1}/fc2", _t_linear),
    (r"encoder\.stages\.(\d+)\.blocks\.(\d+)", "encoder/stage{0}/block{1}", _flat),
    # encoder.head.fc is erased to Identity by the reference (encoder.py:122)
    (r"encoder\.head\.norm", "head_norm", None),
    (r"projection\.0", "projection/fc0", _t_linear),
    (r"projection\.1", "projection/bn0", None),
    (r"projection\.3", "projection/fc1", _t_linear),
    (r"projection\.4", "projection/bn1", None),
]


# Legacy U-Nets (unet2d.py / unet25d.py): ConvBlock2D/3D register their
# layers as Conv{2,3}d_{i} / batch_norm_{i} / resid_conv; the model
# registers block lists as {down,up}_conv_block_{i}. The flax side is
# ConvBlock (conv{i} / norm{i}/BatchNorm_0 / res_proj).
_UNET2D_RULES: list[tuple[str, str, Callable]] = [
    (r"(down|up)_conv_block_(\d+)\.Conv2d_(\d+)", "{0}_conv_block{1}/conv{2}", _t_conv2d),
    (r"(down|up)_conv_block_(\d+)\.batch_norm_(\d+)", "{0}_conv_block{1}/norm{2}/BatchNorm_0", None),
    (r"(down|up)_conv_block_(\d+)\.resid_conv", "{0}_conv_block{1}/res_proj", _t_conv2d),
    (r"bottom_transition_block\.Conv2d_(\d+)", "bottom_conv_block/conv{0}", _t_conv2d),
    (r"bottom_transition_block\.batch_norm_(\d+)", "bottom_conv_block/norm{0}/BatchNorm_0", None),
    (r"bottom_transition_block\.resid_conv", "bottom_conv_block/res_proj", _t_conv2d),
    (r"terminal_block\.Conv2d_(\d+)", "terminal_block/conv{0}", _t_conv2d),
    (r"terminal_block\.resid_conv", "terminal_block/res_proj", _t_conv2d),
]

_UNET25D_RULES: list[tuple[str, str, Callable]] = [
    (r"(down|up)_conv_block_(\d+)\.Conv3d_(\d+)", "{0}_conv_block{1}/conv{2}", _t_conv3d),
    (r"(down|up)_conv_block_(\d+)\.batch_norm_(\d+)", "{0}_conv_block{1}/norm{2}/BatchNorm_0", None),
    (r"(down|up)_conv_block_(\d+)\.resid_conv", "{0}_conv_block{1}/res_proj", _t_conv3d),
    (r"bottom_transition_block", "bottom_transition_block", _t_conv3d),
    (r"skip_conv_layer_(\d+)", "skip_conv_layer{0}", _t_conv3d),
    (r"terminal_block\.Conv3d_(\d+)", "terminal_block/conv{0}", _t_conv3d),
    (r"terminal_block\.batch_norm_(\d+)", "terminal_block/norm{0}/BatchNorm_0", None),
    (r"terminal_block\.resid_conv", "terminal_block/res_proj", _t_conv3d),
]


def convert_unet2d_state_dict(
    state_dict: dict[str, Any], strip_prefix: str = "model."
) -> tuple[dict, dict]:
    """Convert a Unet2d torch checkpoint (reference ``unet/unet2d.py:11``).

    Returns ``(params, batch_stats)``. Unused ``resid_conv`` leaves (torch
    creates one per block even when the forward never routes it) convert to
    ``res_proj`` entries that callers drop when the flax tree has no analog.
    """
    params, stats, unmatched = convert_state_dict_full(state_dict, _UNET2D_RULES, strip_prefix)
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params, stats


def convert_unet25d_state_dict(
    state_dict: dict[str, Any], strip_prefix: str = "model."
) -> tuple[dict, dict]:
    """Convert a Unet25d torch checkpoint (reference ``unet/unet25d.py:11``)."""
    params, stats, unmatched = convert_state_dict_full(state_dict, _UNET25D_RULES, strip_prefix)
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params, stats


def convert_unext2_state_dict(state_dict: dict[str, Any], strip_prefix: str = "model.") -> dict:
    """Convert a UNeXt2 torch checkpoint state dict to flax params."""
    params, unmatched = convert_state_dict(state_dict, _UNEXT2_RULES, strip_prefix)
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params


def convert_contrastive_state_dict(
    state_dict: dict[str, Any], strip_prefix: str = "model."
) -> dict:
    """Convert a ContrastiveEncoder torch checkpoint to flax params.

    BatchNorm running stats map to the ``batch_stats`` collection; this
    returns only ``params`` (weight/bias); callers merge running stats
    separately when training resumes are needed.
    """
    params, unmatched = convert_state_dict(state_dict, _CONTRASTIVE_RULES, strip_prefix)
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params


def convert_fcmae_state_dict(state_dict: dict[str, Any], strip_prefix: str = "model.") -> dict:
    """Convert an FCMAE/UNeXt2_2D torch checkpoint state dict to flax params."""
    params, unmatched = convert_state_dict(state_dict, _FCMAE_RULES, strip_prefix)
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params


def _unet3d_base_rules(norm_child: str) -> list[tuple[str, str, Callable]]:
    """Rules for the torch ``UNet3DBase`` naming (reference
    ``unet/unet3d_base.py:58-138`` + ``unet/blocks.py`` ResnetBlock/Block):
    ``block1.proj``/``block2.proj`` -> ``conv0``/``conv1``, norms to the
    flax :class:`Norm` wrapper's child (``BatchNorm_0`` / ``GroupNorm_0``),
    the ``mlp.1`` time projection -> ``time_proj``, ``res_conv`` ->
    ``res_proj``, ``ConvTranspose3d`` upsamples -> ``up{i}`` (the same
    ``(2,3,4,1,0)`` transpose maps torch's ``(I, O, k...)`` onto flax
    ``transpose_kernel=True``'s ``(k..., O, I)``).
    """

    def block(src: str, dst: str) -> list[tuple[str, str, Callable]]:
        return [
            (rf"{src}\.block1\.proj", f"{dst}/conv0", _t_conv3d),
            (rf"{src}\.block1\.norm", f"{dst}/norm0/{norm_child}", None),
            (rf"{src}\.block2\.proj", f"{dst}/conv1", _t_conv3d),
            (rf"{src}\.block2\.norm", f"{dst}/norm1/{norm_child}", None),
            (rf"{src}\.mlp\.1", f"{dst}/time_proj", _t_linear),
            (rf"{src}\.res_conv", f"{dst}/res_proj", _t_conv3d),
        ]

    return [
        (r"inconv", "unet/inconv", _t_conv3d),
        (r"_cond_inconv", "unet/cond_inconv", _t_conv3d),
        (r"_time_embedder\.mlp\.0", "unet/time_embedder/fc0", _t_linear),
        (r"_time_embedder\.mlp\.2", "unet/time_embedder/fc1", _t_linear),
        *block(r"_encoder_blocks\.(\d+)\.(\d+)", "unet/enc{0}_{1}"),
        (r"_downsamples\.(\d+)", "unet/down{0}", _t_conv3d),
        *block(r"_decoder_blocks\.(\d+)\.(\d+)", "unet/dec{0}_{1}"),
        (r"_upsamples\.(\d+)", "unet/up{0}", _t_conv3d),
        *block(r"bottleneck\.block", "unet/bottleneck/block"),
        (r"outconv", "unet/outconv", _t_conv3d),
    ]


def _t_patch3d_to_dense(w):
    # PatchEmbed3D conv (E, C, p, p, p) -> Dense kernel (p^3*C, E) with
    # token-vector layout (pz, py, px, c) (vit_bottleneck.py patchify)
    return np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, w.shape[0])


def _vit_bottleneck_rules() -> list[tuple[str, str, Callable]]:
    """Rules for the torch ``ViTBottleneck3D`` naming (reference
    ``celldiff/vit_bottleneck.py:26`` + ``modules/transformer.py``)."""
    return [
        (r"bottleneck\.img_embedding\.proj", "unet/bottleneck/patch_embed", _t_patch3d_to_dense),
        (r"bottleneck\.blocks\.(\d+)\.attn\.to_q", "unet/bottleneck/block{0}/attn/attn_q", _t_linear),
        (r"bottleneck\.blocks\.(\d+)\.attn\.to_k", "unet/bottleneck/block{0}/attn/attn_k", _t_linear),
        (r"bottleneck\.blocks\.(\d+)\.attn\.to_v", "unet/bottleneck/block{0}/attn/attn_v", _t_linear),
        (r"bottleneck\.blocks\.(\d+)\.attn\.to_out\.0", "unet/bottleneck/block{0}/attn/attn_out", _t_linear),
        (r"bottleneck\.blocks\.(\d+)\.ff\.net\.0\.proj", "unet/bottleneck/block{0}/ff/ff_proj", _t_linear),
        (r"bottleneck\.blocks\.(\d+)\.ff\.net\.2", "unet/bottleneck/block{0}/ff/ff_out", _t_linear),
        (r"bottleneck\.blocks\.(\d+)\.adaLN\.1", "unet/bottleneck/block{0}/adaLN", _t_linear),
        (r"bottleneck\.proj_out\.linear", "unet/bottleneck/final_proj", _t_linear),
        (r"bottleneck\.proj_out\.adaLN\.1", "unet/bottleneck/final_adaLN", _t_linear),
    ]


def convert_celldiff_state_dict(
    state_dict: dict[str, Any],
    strip_prefix: str = "model.",
) -> tuple[dict, dict]:
    """Convert a CELLDiffNet / UNetViT3D torch checkpoint (reference
    ``celldiff/celldiff_net.py:21``, ``unet_vit_3d.py:17``): the shared
    U-Net base (group norm) plus the ViT bottleneck. The fixed
    ``img_pos_embed`` buffer and ``_time_embedder.freqs`` are recomputed
    by the flax modules and dropped here.
    """
    state = {
        k: v
        for k, v in state_dict.items()
        if not k.endswith(("_time_embedder.freqs", "img_pos_embed"))
    }
    rules = _vit_bottleneck_rules() + _unet3d_base_rules("GroupNorm_0")
    params, stats, unmatched = convert_state_dict_full(state, rules, strip_prefix)
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params, stats


def convert_unet3d_state_dict(
    state_dict: dict[str, Any],
    strip_prefix: str = "model.",
    norm: str = "batch",
) -> tuple[dict, dict]:
    """Convert a Unet3d / UNet3DBase torch checkpoint (reference
    ``unet/unet3d.py:37``, ``unet3d_base.py:19``).

    Returns ``(params, batch_stats)`` (``batch_stats`` empty for group
    norm). The ``_time_embedder.freqs`` sinusoidal buffer is recomputed
    by the flax module and dropped here.
    """
    norm_child = "BatchNorm_0" if norm == "batch" else "GroupNorm_0"
    state = {
        k: v
        for k, v in state_dict.items()
        if not k.endswith("_time_embedder.freqs")
    }
    params, stats, unmatched = convert_state_dict_full(
        state, _unet3d_base_rules(norm_child), strip_prefix
    )
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params, stats


def _materialize_spectral_norm(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Collapse torch ``parametrizations.weight`` spectral-norm entries into
    plain ``.weight`` keys: ``W_eff = original / sigma`` with
    ``sigma = u . (W_mat v)`` from the stored power-iteration vectors —
    exactly the weight torch uses at eval time."""
    out: dict[str, Any] = {}
    for key, value in state_dict.items():
        if ".parametrizations.weight." in key:
            if key.endswith(".original"):
                base = key[: -len(".parametrizations.weight.original")]
                w = np.asarray(value)
                u = np.asarray(state_dict[f"{base}.parametrizations.weight.0._u"])
                v = np.asarray(state_dict[f"{base}.parametrizations.weight.0._v"])
                sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
                out[f"{base}.weight"] = w / sigma
            continue  # _u/_v consumed above
        out[key] = value
    return out


# PatchGAN3D (reference gan/patchgan3d.py:22): layer{1..4}.0 strided convs,
# layer{2..4}.1 InstanceNorm3d(affine), layer5 logit conv.
_PATCHGAN3D_RULES: list[tuple[str, str, Callable]] = [
    (r"layer(\d)\.0", "conv{0}", _t_conv3d),
    (r"layer(\d)\.1", "norm{0}", None),
    (r"layer5", "conv_out", _t_conv3d),
]


def convert_patchgan3d_state_dict(
    state_dict: dict[str, Any], strip_prefix: str = "discriminator."
) -> dict:
    """Convert a PatchGAN3D torch state dict (reference
    ``gan/patchgan3d.py:22``) to flax params.

    Spectral-norm parametrizations are materialized (``W/sigma``); apply the
    result with ``use_spectral_norm=False`` for inference, or let training
    re-estimate u/v via power iteration.
    """
    if strip_prefix:
        state_dict = {
            k[len(strip_prefix):]: v
            for k, v in state_dict.items()
            if k.startswith(strip_prefix)
        }
    state = _materialize_spectral_norm(state_dict)
    params, unmatched = convert_state_dict(state, _PATCHGAN3D_RULES, strip_prefix="")
    if unmatched:
        _logger.warning(f"{len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params


def convert_multiscale_patchgan3d_state_dict(
    state_dict: dict[str, Any], strip_prefix: str = "discriminator."
) -> dict:
    """Convert a MultiScalePatchGAN3D torch state dict (reference
    ``gan/patchgan3d.py:132``: ``discriminators.{s}.*``) to flax params
    (``scale{s}/*``)."""
    if strip_prefix:
        state_dict = {
            k[len(strip_prefix):]: v
            for k, v in state_dict.items()
            if k.startswith(strip_prefix)
        }
    scales: dict[int, dict[str, Any]] = {}
    for key, value in state_dict.items():
        m = re.match(r"^discriminators\.(\d+)\.(.+)$", key)
        if m:
            scales.setdefault(int(m.group(1)), {})[m.group(2)] = value
    return {
        f"scale{s}": convert_patchgan3d_state_dict(sub, strip_prefix="")
        for s, sub in sorted(scales.items())
    }


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a Lightning .ckpt / torch .pt state dict into numpy arrays."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    state = payload.get("state_dict", payload)
    return {k: v.numpy() for k, v in state.items()}
