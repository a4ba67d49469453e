"""Import-level compatibility with the reference packages.

The config layer already remaps ``class_path`` strings
(``training.instantiate._MODULE_ALIASES``); this module gives reference
*Python code* the same treatment, so scripts and notebooks written
against the reference packages run unchanged:

    from viscy_data.hcs import HCSDataModule
    from viscy_transforms import NormalizeSampled
    from cytoland.engine import FcmaeUNet

Top-level stub packages (``viscy_data/``, ``cytoland/``, ...) each call
:func:`alias_self` on import, which installs one shared meta-path finder
and replaces the stub in ``sys.modules`` with the real viscy_tpu module.
The finder resolves every aliased dotted path to the EXISTING viscy_tpu
module object (meta-path finders run before path-based import, so
submodules like ``viscy_data.hcs`` can never be double-imported from the
target package's ``__path__``).
"""

from __future__ import annotations

import importlib
import sys
from importlib.abc import Loader, MetaPathFinder
from importlib.machinery import ModuleSpec

from viscy_tpu.training.instantiate import _MODULE_ALIASES

# import-only additions: reference modules whose viscy_tpu home does not
# follow the prefix rewrite (longest prefix wins, same as the config remap).
# 'lightning.*' stays config-remap-only: hijacking the real lightning
# package at import time would shadow it for the whole process when it IS
# installed, and reference code importing it directly fails on the bare
# 'lightning' parent anyway.
IMPORT_ALIASES: dict[str, str] = {
    **{k: v for k, v in _MODULE_ALIASES.items() if not k.startswith("lightning")},
    "viscy": "viscy_tpu",
    "viscy.unet": "viscy_tpu.models.unet",
    "viscy_utils.evaluation": "viscy_tpu.evaluation",
    "viscy_utils.meta_utils": "viscy_tpu.preprocess.stats",
    "viscy_utils.mp_utils": "viscy_tpu.preprocess.stats",
    "viscy_utils.tensor_utils": "viscy_tpu.training.cli_utils",
    "viscy_utils.log_embeddings": "viscy_tpu.training.log_images",
    "viscy_utils.preprocess": "viscy_tpu.preprocess",
    "viscy_data._typing": "viscy_tpu.data.typing",
    "viscy_data._utils": "viscy_tpu.data.utils",
    "viscy_data.foreground_masks": "viscy_tpu.data.sliding_window",
    "dynaclr.data.experiment": "viscy_tpu.apps.dynaclr.experiment",
    "viscy_models.celldiff.modules": "viscy_tpu.models.celldiff",
    "dynacell.data": "viscy_tpu.apps.dynacell.manifests",
    "dynacell.data.manifests": "viscy_tpu.apps.dynacell.manifests",
    "dynacell.data.collections": "viscy_tpu.apps.dynacell.manifests",
    "dynacell.data.specs": "viscy_tpu.apps.dynacell.manifests",
    "dynacell.data.resolver": "viscy_tpu.apps.dynacell.manifests",
    "dynacell.preprocess": "viscy_tpu.apps.dynacell.preprocess",
    "dynacell.evaluation": "viscy_tpu.apps.dynacell.eval",
    "dynacell.reporting": "viscy_tpu.apps.dynacell.reporting",
    "dynacell.reporting.figures": "viscy_tpu.apps.dynacell.eval.tables",
    "dynacell.reporting.tables": "viscy_tpu.apps.dynacell.eval.tables",
    "qc": "viscy_tpu.apps.qc",
    "airtable_utils": "viscy_tpu.apps.airtable_utils",
}


# longest-prefix order, computed once: the finder sits at the head of
# sys.meta_path and runs for EVERY import in the process
_SORTED_PREFIXES = sorted(IMPORT_ALIASES, key=len, reverse=True)
_TOP_LEVEL = {p.split(".", 1)[0] for p in IMPORT_ALIASES}


def _resolve(fullname: str) -> str | None:
    if fullname.split(".", 1)[0] not in _TOP_LEVEL:
        return None  # cheap reject for the ~all imports that are not aliases
    for prefix in _SORTED_PREFIXES:
        if fullname == prefix or fullname.startswith(prefix + "."):
            return IMPORT_ALIASES[prefix] + fullname[len(prefix):]
    return None


class _AliasFinder(MetaPathFinder, Loader):
    """Resolves aliased names to existing viscy_tpu modules (no re-exec)."""

    def find_spec(self, fullname, path=None, target=None):
        real = _resolve(fullname)
        if real is None:
            return None
        try:
            importlib.import_module(real)
        except ModuleNotFoundError as e:
            raise ModuleNotFoundError(
                f"{fullname!r} is a reference-compat alias for {real!r}, "
                f"which does not exist in viscy_tpu ({e}). See "
                "docs/MIGRATION.md for the import mapping."
            ) from e
        return ModuleSpec(fullname, self, origin=f"alias:{real}")

    def create_module(self, spec):
        return sys.modules[_resolve(spec.name)]

    def exec_module(self, module):  # module already initialized
        pass


_FINDER = _AliasFinder()


def install_import_aliases() -> None:
    """Idempotently install the alias finder at the head of sys.meta_path."""
    if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _FINDER)


def alias_self(stub_name: str) -> None:
    """Called from a top-level stub package's ``__init__``: install the
    finder and make the stub name resolve to its viscy_tpu target."""
    install_import_aliases()
    sys.modules[stub_name] = importlib.import_module(_resolve(stub_name))
