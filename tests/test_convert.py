"""Torch->flax conversion: build a synthetic torch-style FCMAE state dict
matching the reference naming, convert, and verify it loads into the flax
model and drives a forward pass (shape-exact tree match)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
from viscy_tpu.training.convert import convert_fcmae_state_dict


def _flax_to_torch_names(params, dims=(8, 16, 32, 64)):
    """Inverse of the converter's rules: emit torch-style keys from flax
    params to simulate a reference checkpoint."""
    out = {}

    def inv_conv2d(k):
        return np.transpose(k, (3, 2, 0, 1))

    def inv_conv3d(k):
        return np.transpose(k, (4, 3, 0, 1, 2))

    def walk(node, path):
        for name, child in node.items():
            p = path + [name]
            if isinstance(child, dict):
                walk(child, p)
                continue
            arr = np.asarray(child)
            joined = "/".join(p)
            key, val = _translate(joined, arr, inv_conv2d, inv_conv3d)
            if key:
                out[key] = val

    def _translate(joined, arr, inv2d, inv3d):
        m = re.match(r"encoder/stem/(conv3d|conv2d|norm)/(\w+)", joined)
        if m:
            mod, leaf = m.groups()
            name = f"model.encoder.stem.{mod}"
            if leaf == "kernel":
                return f"{name}.weight", inv3d(arr) if mod == "conv3d" else inv2d(arr)
            if leaf == "scale":
                return f"{name}.weight", arr
            return f"{name}.bias", arr
        m = re.match(r"encoder/stage(\d+)/downsample_(norm|conv)/(\w+)", joined)
        if m:
            i, kind, leaf = m.groups()
            idx = 0 if kind == "norm" else 1
            name = f"model.encoder.stages.{i}.downsample.{idx}"
            if leaf == "kernel":
                return f"{name}.weight", inv2d(arr)
            if leaf == "scale":
                return f"{name}.weight", arr
            return f"{name}.bias", arr
        m = re.match(r"encoder/stage(\d+)/block(\d+)/(dwconv|norm|fc1|fc2|grn)/(\w+)", joined)
        if m:
            i, j, mod, leaf = m.groups()
            tname = {"dwconv": "dwconv", "norm": "layernorm", "fc1": "mlp.fc1", "fc2": "mlp.fc2", "grn": "mlp.grn"}[mod]
            name = f"model.encoder.stages.{i}.blocks.{j}.{tname}"
            if leaf == "kernel":
                if mod == "dwconv":
                    return f"{name}.weight", inv2d(arr)
                return f"{name}.weight", np.transpose(arr, (1, 0))
            if leaf in ("scale", "gamma"):
                return f"{name}.weight", arr
            if leaf == "beta":
                return f"{name}.bias", arr
            return f"{name}.bias", arr
        m = re.match(r"decoder/stage(\d+)/conv/(downsample_(?:norm|conv))/(\w+)", joined)
        if m:
            i, kind, leaf = m.groups()
            idx = 0 if kind.endswith("norm") else 1
            name = f"model.decoder.decoder_stages.{i}.conv.downsample.{idx}"
            if leaf == "kernel":
                return f"{name}.weight", inv2d(arr)
            if leaf == "scale":
                return f"{name}.weight", arr
            return f"{name}.bias", arr
        m = re.match(r"decoder/stage(\d+)/conv/block(\d+)/(dwconv|norm|fc1|fc2|grn)/(\w+)", joined)
        if m:
            i, j, mod, leaf = m.groups()
            tname = {"dwconv": "conv_dw", "norm": "norm", "fc1": "mlp.fc1", "fc2": "mlp.fc2", "grn": "mlp.grn"}[mod]
            name = f"model.decoder.decoder_stages.{i}.conv.blocks.{j}.{tname}"
            if leaf == "kernel":
                if mod == "dwconv":
                    return f"{name}.weight", inv2d(arr)
                # conv-mlp 1x1: dense (I, O) -> (O, I, 1, 1)
                return f"{name}.weight", np.transpose(arr, (1, 0))[..., None, None]
            if leaf in ("scale", "gamma"):
                return f"{name}.weight", arr
            if leaf == "beta":
                return f"{name}.bias", arr
            return f"{name}.bias", arr
        return None, None

    walk(params, [])
    return out


@pytest.fixture(scope="module")
def fcmae_and_params():
    model = FullyConvolutionalMAE(
        in_channels=1,
        out_channels=1,
        encoder_blocks=(1, 1, 1, 1),
        dims=(8, 16, 32, 64),
        in_stack_depth=5,
        pretraining=False,
    )
    x = jnp.zeros((1, 1, 5, 32, 32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model, variables


def test_fcmae_conversion_roundtrip(fcmae_and_params):
    model, variables = fcmae_and_params
    params = jax.device_get(variables["params"])
    torch_sd = _flax_to_torch_names(params)
    assert len(torch_sd) > 40  # substantial coverage
    converted = convert_fcmae_state_dict(torch_sd)

    # every converted leaf matches the original flax tree exactly
    def check(ref, conv, path=""):
        for k, v in conv.items():
            assert k in ref, f"extra key {path}/{k}"
            if isinstance(v, dict):
                check(ref[k], v, f"{path}/{k}")
            else:
                np.testing.assert_allclose(
                    np.asarray(ref[k]), np.asarray(v), err_msg=f"{path}/{k}"
                )
                assert np.asarray(ref[k]).shape == np.asarray(v).shape

    check(params, converted)

    # merge converted params and verify a forward pass runs
    merged = jax.tree_util.tree_map(lambda a: a, params)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                dst[k] = jnp.asarray(v)

    merge(merged, converted)
    x = jnp.zeros((1, 1, 5, 32, 32))
    out = model.apply({"params": merged}, x)
    assert out.shape == (1, 1, 5, 32, 32)
