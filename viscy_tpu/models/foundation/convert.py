"""HF DINOv2-family checkpoint conversion to :class:`DinoViT` flax params
(reference loads these via ``transformers.AutoModel``; here the weights are
converted once into the flax backbone so inference runs on TPU through XLA).

Numeric parity is tested against a randomly-initialized
``transformers.Dinov2Model`` (zero-egress image: released weights convert
with the same rules when a local checkpoint directory is supplied).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = ["convert_dinov2_state_dict", "load_dinov2_checkpoint"]


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def convert_dinov2_state_dict(
    sd: Mapping[str, "np.ndarray"],
    depth: int,
    num_heads: int,
) -> dict:
    """Map an HF ``Dinov2Model`` state dict onto ``DinoViT`` params.

    Rules (torch ``(out, in)`` dense layout -> flax ``(in, out)``):
    - ``embeddings.patch_embeddings.projection``: conv ``(E,3,p,p)`` ->
      ``(p,p,3,E)``
    - attention q/k/v: ``(E,E)`` -> ``(E, heads, head_dim)``;
      output dense -> ``(heads, head_dim, E)``
    - ``layer_scale{1,2}.lambda1`` -> ``ls{1,2}``
    """
    sd = {k: _t(v) for k, v in sd.items()}
    embed_dim = sd["embeddings.cls_token"].shape[-1]
    head_dim = embed_dim // num_heads

    def dense(prefix: str) -> dict:
        return {
            "kernel": sd[f"{prefix}.weight"].T,
            "bias": sd[f"{prefix}.bias"],
        }

    def qkv(prefix: str) -> dict:
        return {
            "kernel": sd[f"{prefix}.weight"].T.reshape(embed_dim, num_heads, head_dim),
            "bias": sd[f"{prefix}.bias"].reshape(num_heads, head_dim),
        }

    def norm(prefix: str) -> dict:
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params: dict = {
        "patch_embed": {
            "kernel": sd["embeddings.patch_embeddings.projection.weight"].transpose(
                2, 3, 1, 0
            ),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "norm": norm("layernorm"),
    }
    for i in range(depth):
        p = f"encoder.layer.{i}"
        params[f"block{i}"] = {
            "norm1": norm(f"{p}.norm1"),
            "attn": {
                "query": qkv(f"{p}.attention.attention.query"),
                "key": qkv(f"{p}.attention.attention.key"),
                "value": qkv(f"{p}.attention.attention.value"),
                "out": {
                    "kernel": sd[f"{p}.attention.output.dense.weight"].T.reshape(
                        num_heads, head_dim, embed_dim
                    ),
                    "bias": sd[f"{p}.attention.output.dense.bias"],
                },
            },
            "ls1": sd[f"{p}.layer_scale1.lambda1"],
            "norm2": norm(f"{p}.norm2"),
            "fc1": dense(f"{p}.mlp.fc1"),
            "fc2": dense(f"{p}.mlp.fc2"),
            "ls2": sd[f"{p}.layer_scale2.lambda1"],
        }
    return params


def load_dinov2_checkpoint(path: str, depth: int, num_heads: int) -> dict:
    """Convert a local HF checkpoint directory or ``.bin``/``.safetensors``
    file (no network access is attempted)."""
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        from transformers import Dinov2Model

        if os.path.isdir(path):
            model = Dinov2Model.from_pretrained(path, local_files_only=True)
            sd = model.state_dict()
        else:
            sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_dinov2_state_dict(sd, depth=depth, num_heads=num_heads)
