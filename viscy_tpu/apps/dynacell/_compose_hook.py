"""Composition-time resolver for DynaCell benchmark leaves
(reference ``applications/dynacell/src/dynacell/_compose_hook.py``).

Thread :func:`dynacell_ref_resolver` into
:func:`viscy_tpu.training.compose.load_composed_config` via ``resolver=``;
it runs once after the final deep-merge. ``benchmark.dataset_ref:
{dataset, target}`` is resolved against the manifest registry and the
concrete ``data_path`` / ``source_channel`` / ``target_channel`` are
spliced into ``data.init_args``. Partial refs are a strict no-op.
"""

from __future__ import annotations

import copy
import sys

from viscy_tpu.apps.dynacell.manifests import (
    DatasetRef,
    ResolvedDataset,
    dataset_ref_from_dict,
    resolve_dataset_ref,
)

__all__ = ["dynacell_ref_resolver"]


def _infer_mode(composed: dict) -> str:
    """Subcommand ("fit", "predict", "validate") from the leaf config or argv."""
    launcher_mode = composed.get("launcher", {}).get("mode")
    if launcher_mode in {"fit", "predict", "validate"}:
        return launcher_mode
    for arg in sys.argv[1:]:
        if arg in {"fit", "predict", "validate"}:
            return arg
    raise ValueError(
        "Cannot infer mode for dataset_ref resolution; set launcher.mode in the leaf config."
    )


def _splice_resolved(
    composed: dict, resolved: ResolvedDataset, mode: str, ref: DatasetRef
) -> dict:
    """Splice resolved fields into ``data.init_args``; a full dataset_ref is
    the single source of truth, so co-declared fields are an error."""
    out = copy.deepcopy(composed)
    init_args = out.setdefault("data", {}).setdefault("init_args", {})
    resolved_values = {
        "data_path": str(
            resolved.data_path_test if mode == "predict" else resolved.data_path_train
        ),
        "source_channel": resolved.source_channel,
        "target_channel": resolved.target_channel,
    }
    conflicts = {f: (init_args[f], v) for f, v in resolved_values.items() if f in init_args}
    if conflicts:
        details = "; ".join(
            f"{k}: composed={c!r} vs manifest={m!r}" for k, (c, m) in conflicts.items()
        )
        raise ValueError(
            f"benchmark.dataset_ref={{dataset: {ref.dataset}, target: {ref.target}}} "
            f"conflicts with explicit data.init_args fields: {details}."
        )
    init_args.update(resolved_values)
    out.setdefault("benchmark", {})["spacing"] = resolved.spacing.as_list()
    return out


def dynacell_ref_resolver(composed: dict) -> dict:
    """Resolve ``benchmark.dataset_ref``; no-op unless both keys present."""
    ref = dataset_ref_from_dict(composed.get("benchmark", {}).get("dataset_ref"))
    if ref is None:
        return composed
    resolved = resolve_dataset_ref(ref)
    return _splice_resolved(composed, resolved, _infer_mode(composed), ref)
