"""Registry-free ``class_path``/``init_args`` instantiation.

Replaces jsonargparse/LightningCLI object construction (reference
``cli.py:220-229``): any dict of the form
``{"class_path": "pkg.mod.Cls", "init_args": {...}}`` is imported and
constructed recursively, so the entire YAML config surface is
object-addressable. Reference class paths (``viscy_*``, ``cytoland``,
``dynaclr``) are transparently remapped to their viscy_tpu equivalents so
application configs run unchanged.
"""

from __future__ import annotations

import importlib
from typing import Any

# reference-package -> viscy_tpu remapping (module prefix level)
_MODULE_ALIASES: dict[str, str] = {
    "viscy_transforms": "viscy_tpu.transforms",
    "viscy_data": "viscy_tpu.data",
    "viscy_models": "viscy_tpu.models",
    "viscy_utils.losses": "viscy_tpu.training.losses",
    "viscy_utils.callbacks": "viscy_tpu.training.callbacks",
    "viscy_utils.trainer": "viscy_tpu.training.trainer",
    "viscy_utils": "viscy_tpu.training",
    "cytoland.engine": "viscy_tpu.apps.cytoland.engine",
    "cytoland": "viscy_tpu.apps.cytoland",
    "dynaclr.engine": "viscy_tpu.apps.dynaclr.engine",
    "dynaclr.data.datamodule": "viscy_tpu.apps.dynaclr.data",
    "dynaclr.data.dataset": "viscy_tpu.apps.dynaclr.data",
    "dynaclr.data.index": "viscy_tpu.apps.dynaclr.data",
    "dynaclr.data.tau_sampling": "viscy_tpu.apps.dynaclr.data",
    "dynaclr.data": "viscy_tpu.apps.dynaclr.data",
    "dynaclr": "viscy_tpu.apps.dynaclr",
    "dynacell.engine": "viscy_tpu.apps.dynacell.engine",
    "dynacell": "viscy_tpu.apps.dynacell",
    "lightning.pytorch.callbacks": "viscy_tpu.training.callbacks",
    "viscy.transforms": "viscy_tpu.transforms",
    "viscy.data": "viscy_tpu.data",
    "viscy.unet.networks": "viscy_tpu.models.unet",
}

# class-name level fallbacks for renamed/merged classes
_CLASS_FALLBACKS: dict[str, str] = {
    "ModelCheckpoint": "viscy_tpu.training.callbacks.checkpoint.ModelCheckpoint",
    "LearningRateMonitor": "viscy_tpu.training.callbacks.checkpoint.LearningRateMonitor",
    "HCSPredictionWriter": "viscy_tpu.training.callbacks.prediction_writer.HCSPredictionWriter",
    "EmbeddingWriter": "viscy_tpu.training.callbacks.embedding_writer.EmbeddingWriter",
}


def _remap_class_path(class_path: str) -> str:
    for prefix, target in sorted(_MODULE_ALIASES.items(), key=lambda kv: -len(kv[0])):
        if class_path == prefix or class_path.startswith(prefix + "."):
            return target + class_path[len(prefix):]
    return class_path


def resolve_class(class_path: str) -> type:
    class_path = _remap_class_path(class_path)
    module_name, _, cls_name = class_path.rpartition(".")
    try:
        module = importlib.import_module(module_name)
        return getattr(module, cls_name)
    except (ImportError, AttributeError):
        if cls_name in _CLASS_FALLBACKS:
            fb = _CLASS_FALLBACKS[cls_name]
            module_name, _, cls_name = fb.rpartition(".")
            module = importlib.import_module(module_name)
            return getattr(module, cls_name)
        raise


def instantiate(node: Any) -> Any:
    """Recursively instantiate class_path/init_args nodes in a config tree."""
    if isinstance(node, dict):
        if "class_path" in node:
            cls = resolve_class(node["class_path"])
            init_args = instantiate(node.get("init_args", {}) or {})
            if not isinstance(init_args, dict):
                raise TypeError(f"init_args must be a dict for {node['class_path']}")
            return cls(**init_args)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node
