"""Golden-torch loader: run the REFERENCE model code against local shims.

``load_reference("unet.unext2")`` imports the reference's own torch module
source (``/root/reference/packages/viscy-models/src/viscy_models/...``)
with shimmed ``timm`` / ``monai`` / ``pytorch_metric_learning`` namespaces
(none of which are installed in this image), and returns the module object.

Two conflicts are handled:

1. The repo exposes a ``viscy_models`` alias package routing to the JAX
   implementation (``viscy_tpu/compat.py``).  Reference modules do absolute
   imports (``from viscy_models.components.blocks import ...``), so during a
   reference import we temporarily shadow ``sys.modules['viscy_models*']``
   with the reference tree and restore the alias afterwards.  Loaded
   reference modules are cached so repeated calls share module objects.
2. The reference package ``__init__`` calls
   ``importlib.metadata.version("viscy-models")`` which would raise; we seed
   a synthetic package module with ``__path__`` pointing at the reference
   source instead of executing that ``__init__``.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
from pathlib import Path

REF_MODELS_SRC = Path("/root/reference/packages/viscy-models/src")

_loaded: dict[str, object] = {}


def _install_shims() -> None:
    def _with_specs(ns: dict) -> dict:
        # third parties probe installed packages via importlib.util.find_spec,
        # which raises ValueError on a sys.modules entry whose __spec__ is
        # None (e.g. transformers' _is_package_available("timm"))
        for name, mod in ns.items():
            if getattr(mod, "__spec__", None) is None:
                mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return ns

    if "timm" not in sys.modules:
        from . import _timm_shim

        sys.modules.update(_with_specs(_timm_shim._build_namespace()))
    if "monai" not in sys.modules:
        from . import _monai_shim

        sys.modules.update(_with_specs(_monai_shim._build_namespace()))
    if "pytorch_metric_learning" not in sys.modules:
        from . import _pml_shim

        sys.modules.update(_with_specs(_pml_shim._build_namespace()))
    if "diffusers" not in sys.modules:
        from . import _diffusers_shim

        sys.modules.update(_with_specs(_diffusers_shim._build_namespace()))


def load_reference(modname: str):
    """Import ``viscy_models.<modname>`` from the reference source tree."""
    full = f"viscy_models.{modname}" if modname else "viscy_models"
    if full in _loaded:
        return _loaded[full]
    _install_shims()
    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "viscy_models" or k.startswith("viscy_models.")
    }
    # the repo's compat layer aliases 'viscy_models*' to viscy_tpu via a
    # META-PATH finder (viscy_tpu/compat.py _AliasFinder), which outranks
    # the synthetic reference package's __path__ — detach it for the
    # duration of the reference import
    saved_finders = [
        f for f in sys.meta_path if type(f).__name__ == "_AliasFinder"
    ]
    for f in saved_finders:
        sys.meta_path.remove(f)
    try:
        if "viscy_models" in _loaded:
            sys.modules.update({k: v for k, v in _loaded.items() if isinstance(v, type(sys))})
        else:
            spec = importlib.machinery.ModuleSpec("viscy_models", None, is_package=True)
            pkg = importlib.util.module_from_spec(spec)
            pkg.__path__ = [str(REF_MODELS_SRC / "viscy_models")]
            pkg.__version__ = "0.0.0+reference-golden"
            sys.modules["viscy_models"] = pkg
        mod = importlib.import_module(full)
        for k, v in list(sys.modules.items()):
            if k == "viscy_models" or k.startswith("viscy_models."):
                _loaded[k] = v
        return mod
    finally:
        for k in [k for k in sys.modules if k == "viscy_models" or k.startswith("viscy_models.")]:
            del sys.modules[k]
        sys.modules.update(saved)
        for f in saved_finders:
            if f not in sys.meta_path:
                sys.meta_path.insert(0, f)
