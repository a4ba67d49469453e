"""Released-checkpoint numeric parity harness.

Implements the acceptance contract of the reference reproducibility test
(``/root/reference/applications/cytoland/tests/test_inference_reproducibility.py:50-73``):
a converted released checkpoint, run through the production prediction
pipeline, must match the released reference predictions with atol 0.02,
rtol 1e-2, and per-channel Pearson r > 0.999.

Released torch checkpoints and fixture zarrs are HPC/network artifacts not
present in every environment, so the harness is artifact-gated (like the
reference's ``requires_hpc_and_gpu``): point it at local copies via CLI
flags or the ``VISCY_PARITY_CHECKPOINT`` / ``VISCY_PARITY_DATA`` /
``VISCY_PARITY_REFERENCE`` env vars. Without artifacts it still runs the
offline tiers — layerwise weight audit and activation capture — and
records their results in the report.

Tiers
-----
1. **Weight audit** (:func:`layerwise_weight_audit`): every torch key
   consumed, every flax leaf filled, shapes + norms preserved.
2. **Activation capture** (:func:`capture_activations` /
   :func:`compare_activations`): per-layer statistics of the flax forward
   pass; comparable against a torch-side export (``.npz`` of layer-name ->
   activation array) produced on a machine with the reference installed.
3. **Prediction parity** (:func:`run_checkpoint_parity`): the full
   contract against a released reference-prediction zarr.

Usage
-----
``python -m viscy_tpu.training.parity --output PARITY.json [--checkpoint
ckpt.ckpt --data fixture.zarr --reference reference.zarr]``
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import asdict, dataclass, field
from pathlib import Path

import numpy as np

_logger = logging.getLogger("viscy_tpu")

ATOL = 0.02
RTOL = 1e-2
MIN_PEARSON_R = 0.999

# Matches the fine-tuned vscyto3d released checkpoint
# (reference test_inference_reproducibility.py:55-67).
VSCYTO3D_MODEL_CONFIG = {
    "in_channels": 1,
    "out_channels": 2,
    "encoder_blocks": [3, 3, 9, 3],
    "dims": [96, 192, 384, 768],
    "decoder_conv_blocks": 2,
    "stem_kernel_size": (5, 4, 4),
    "in_stack_depth": 15,
    "pretraining": False,
}
SOURCE_CHANNEL = "Phase3D"
TARGET_CHANNELS = ["Membrane", "Nuclei"]

__all__ = [
    "layerwise_weight_audit",
    "capture_activations",
    "compare_activations",
    "compare_predictions",
    "run_checkpoint_parity",
    "write_parity_report",
]


# ---------------------------------------------------------------------------
# Tier 1: weight audit
# ---------------------------------------------------------------------------


@dataclass
class WeightAudit:
    """Result of auditing a torch->flax conversion against a live model."""

    n_torch_keys: int = 0
    n_converted_leaves: int = 0
    n_model_leaves: int = 0
    unmatched_torch_keys: list[str] = field(default_factory=list)
    missing_model_leaves: list[str] = field(default_factory=list)
    extra_converted_leaves: list[str] = field(default_factory=list)
    shape_mismatches: list[str] = field(default_factory=list)
    norm_mismatches: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not (
            self.unmatched_torch_keys
            or self.missing_model_leaves
            or self.extra_converted_leaves
            or self.shape_mismatches
            or self.norm_mismatches
        )


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def layerwise_weight_audit(
    torch_state: dict[str, np.ndarray],
    converted_params: dict,
    model_params: dict | None = None,
    norm_rtol: float = 1e-5,
) -> WeightAudit:
    """Audit a conversion: coverage both ways + shape/Frobenius-norm checks.

    Norms are transform-invariant for the transpositions/reshapes our
    conversion rules apply, so a norm mismatch means a wrong mapping (e.g.
    two layers swapped), which structural round-trips cannot catch.
    """
    audit = WeightAudit()
    flat_conv = _flatten(converted_params)
    audit.n_torch_keys = len(torch_state)
    audit.n_converted_leaves = len(flat_conv)

    # norm audit: multiset of tensor norms must survive conversion
    torch_norms = sorted(
        float(np.linalg.norm(np.asarray(v).ravel())) for v in torch_state.values()
    )
    conv_norms = sorted(float(np.linalg.norm(v.ravel())) for v in flat_conv.values())
    if len(torch_norms) == len(conv_norms):
        bad = [
            f"norm[{i}]: torch {a:.6g} vs flax {b:.6g}"
            for i, (a, b) in enumerate(zip(torch_norms, conv_norms))
            if not np.isclose(a, b, rtol=norm_rtol, atol=1e-7)
        ]
        audit.norm_mismatches = bad[:20]
    else:
        audit.unmatched_torch_keys = [
            f"count mismatch: {len(torch_norms)} torch vs {len(conv_norms)} converted"
        ]

    if model_params is not None:
        flat_model = _flatten(model_params)
        audit.n_model_leaves = len(flat_model)
        audit.missing_model_leaves = sorted(set(flat_model) - set(flat_conv))[:50]
        audit.extra_converted_leaves = sorted(set(flat_conv) - set(flat_model))[:50]
        audit.shape_mismatches = [
            f"{k}: model {flat_model[k].shape} vs converted {flat_conv[k].shape}"
            for k in set(flat_model) & set(flat_conv)
            if flat_model[k].shape != flat_conv[k].shape
        ][:50]
    return audit


# ---------------------------------------------------------------------------
# Tier 2: activation capture
# ---------------------------------------------------------------------------


def capture_activations(model, variables: dict, x, with_arrays: bool = False) -> dict:
    """Run a flax forward pass capturing every intermediate.

    Returns layer path -> stats dict (``shape/mean/std/min/max``), plus the
    raw array under ``"array"`` when ``with_arrays`` (for export to the
    torch-side comparison).
    """
    import jax.numpy as jnp

    _, state = model.apply(
        variables, jnp.asarray(x), deterministic=True, capture_intermediates=True
    )
    out: dict[str, dict] = {}
    for path, arrs in _flatten_intermediates(state.get("intermediates", {})).items():
        if arrs is None:  # optional outputs (e.g. masks in non-pretraining mode)
            continue
        a = np.asarray(arrs)
        stats = {
            "shape": list(a.shape),
            "mean": float(a.mean()),
            "std": float(a.std()),
            "min": float(a.min()),
            "max": float(a.max()),
        }
        if with_arrays:
            stats["array"] = a
        out[path] = stats
    return out


def _flatten_intermediates(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(
                _flatten_intermediates(v, f"{prefix}/{k}" if prefix else str(k))
            )
    elif isinstance(tree, (tuple, list)):
        if len(tree) == 1:
            out.update(_flatten_intermediates(tree[0], prefix))
        else:
            for i, v in enumerate(tree):
                out.update(_flatten_intermediates(v, f"{prefix}[{i}]"))
    else:
        out[prefix] = tree
    return out


def compare_activations(
    flax_acts: dict,
    torch_npz: str | Path,
    name_map=None,
    atol: float = 1e-3,
    rtol: float = 1e-3,
) -> dict:
    """Compare captured flax activations against a torch-side ``.npz``.

    The npz contract: keys are torch module names, values are activation
    arrays in torch layout (NC[D]HW); arrays are transposed to NHWC/NDHWC
    automatically when that makes shapes line up. ``name_map`` maps torch
    names to flax intermediate paths (default: identity).
    """
    theirs = np.load(torch_npz)
    results = {}
    for tname in theirs.files:
        fname = name_map(tname) if name_map else tname
        if fname not in flax_acts or "array" not in flax_acts[fname]:
            results[tname] = {"status": "missing"}
            continue
        ours = flax_acts[fname]["array"]
        ref = theirs[tname]
        if ref.shape != ours.shape and ref.ndim in (4, 5):
            # NCHW->NHWC / NCDHW->NDHWC
            perm = (0, 2, 3, 1) if ref.ndim == 4 else (0, 2, 3, 4, 1)
            ref_t = np.transpose(ref, perm)
            if ref_t.shape == ours.shape:
                ref = ref_t
        if ref.shape != ours.shape:
            results[tname] = {
                "status": "shape_mismatch",
                "torch": list(ref.shape),
                "flax": list(ours.shape),
            }
            continue
        diff = np.abs(ours - ref)
        results[tname] = {
            "status": "ok"
            if np.allclose(ours, ref, atol=atol, rtol=rtol)
            else "diverged",
            "max_abs_diff": float(diff.max()),
            "mean_abs_diff": float(diff.mean()),
        }
    return results


# ---------------------------------------------------------------------------
# Tier 3: prediction parity
# ---------------------------------------------------------------------------


def compare_predictions(
    pred: np.ndarray,
    reference: np.ndarray,
    channel_names: list[str],
    atol: float = ATOL,
    rtol: float = RTOL,
    min_pearson: float = MIN_PEARSON_R,
) -> dict:
    """Per-channel atol/rtol closeness + Pearson r (the reference contract).

    ``pred`` / ``reference``: (C, Z, Y, X) or (T, C, Z, Y, X) float arrays.
    """
    pred = np.asarray(pred, np.float64)
    reference = np.asarray(reference, np.float64)
    if pred.shape != reference.shape:
        raise ValueError(f"shape mismatch: {pred.shape} vs {reference.shape}")
    c_axis = 0 if pred.ndim == 4 else 1
    out: dict = {"channels": {}, "pass": True}
    for i, name in enumerate(channel_names):
        p = np.take(pred, i, axis=c_axis).ravel()
        r = np.take(reference, i, axis=c_axis).ravel()
        close = np.isclose(p, r, atol=atol, rtol=rtol)
        denom = p.std() * r.std()
        pearson = float(np.corrcoef(p, r)[0, 1]) if denom > 0 else float("nan")
        ch = {
            "pearson_r": pearson,
            "frac_within_tol": float(close.mean()),
            "max_abs_diff": float(np.abs(p - r).max()),
            "pass": bool(pearson > min_pearson and close.all()),
        }
        out["channels"][name] = ch
        out["pass"] = out["pass"] and ch["pass"]
    return out


def run_checkpoint_parity(
    checkpoint_path: str | Path,
    data_zarr: str | Path,
    reference_zarr: str | Path,
    model_config: dict | None = None,
    source_channel: str = SOURCE_CHANNEL,
    target_channels: list[str] | None = None,
    fov: str | None = None,
    time_index: int = 0,
) -> dict:
    """Run the full released-checkpoint parity contract.

    Converts the torch checkpoint, runs the production sliding-window
    prediction on the fixture FOV (normalized with its stored fov
    statistics), and compares against the released reference predictions.
    """
    from viscy_tpu.apps.cytoland.engine import FcmaeUNet
    from viscy_tpu.apps.cytoland.prediction import AugmentedPredictionVSUNet
    from viscy_tpu.data.utils import read_norm_meta
    from viscy_tpu.training.convert import (
        convert_fcmae_state_dict,
        load_torch_checkpoint,
    )
    from viscy_tpu.zarr_io.store import open_ome_zarr

    model_config = dict(model_config or VSCYTO3D_MODEL_CONFIG)
    target_channels = target_channels or TARGET_CHANNELS

    torch_state = load_torch_checkpoint(str(checkpoint_path))
    params = convert_fcmae_state_dict(torch_state)
    module = FcmaeUNet(model_config=model_config)
    variables = {"params": params}

    store = open_ome_zarr(str(data_zarr), mode="r")
    pos = store if not hasattr(store, "positions") else None
    if pos is None:
        if fov is not None:
            pos = store[fov]
        else:
            _, pos = next(store.positions())
    norm = read_norm_meta(pos)
    source_idx = pos.channel_names.index(source_channel)
    source = np.asarray(pos.data[time_index, source_idx], np.float32)
    if norm and source_channel in norm:
        stats = norm[source_channel].get("fov_statistics", {})
        mean = stats.get("mean", 0.0)
        std = stats.get("std", 1.0) or 1.0
        source = (source - mean) / std
    x = source[None, None]  # (1, 1, Z, Y, X)

    predictor = AugmentedPredictionVSUNet(model=module.model)
    pred = predictor.predict_sliding_windows(
        variables, x, out_channel=len(target_channels)
    )[0]

    ref_store = open_ome_zarr(str(reference_zarr), mode="r")
    ref_pos = ref_store if not hasattr(ref_store, "positions") else None
    if ref_pos is None:
        if fov is not None and fov in ref_store:
            ref_pos = ref_store[fov]
        else:
            _, ref_pos = next(ref_store.positions())
    ref_idx = [ref_pos.channel_names.index(c) for c in target_channels]
    reference = np.asarray(ref_pos.data[time_index])[ref_idx]

    result = compare_predictions(pred, reference, target_channels)
    audit = layerwise_weight_audit(torch_state, params)
    result["weight_audit"] = asdict(audit) | {"ok": audit.ok}
    result["checkpoint"] = str(checkpoint_path)
    return result


# ---------------------------------------------------------------------------
# Report / entry point
# ---------------------------------------------------------------------------


def converter_dryruns() -> dict:
    """Per-released-architecture converter dry-runs on shape-faithful dummies.

    For each entry in ``RELEASED_ARCHITECTURES`` (the 4 released checkpoint
    families), synthesize the exact torch state dict a released checkpoint
    will contain (key names + shapes from the source-derived inventory),
    run the converter rules over it, and report coverage — the strongest
    parity evidence available without the artifacts themselves.
    """
    import numpy as np

    from viscy_tpu.training.convert import (
        _CONTRASTIVE_RULES,
        _FCMAE_RULES,
        _UNEXT2_RULES,
        convert_state_dict,
    )
    from viscy_tpu.training.state_dict_inventory import (
        RELEASED_ARCHITECTURES,
        released_inventory,
    )

    rules_by_name = {
        "vscyto3d": _UNEXT2_RULES,
        "vscyto2d": _FCMAE_RULES,
        "fcmae_3d": _FCMAE_RULES,
        "dynaclr_contrastive": _CONTRASTIVE_RULES,
    }
    out: dict = {}
    for name in RELEASED_ARCHITECTURES:
        try:
            inventory = released_inventory(name)
            sd = {k: np.zeros(shape, np.float32) for k, shape in inventory.items()}
            params, unmatched = convert_state_dict(
                sd, rules_by_name[name], strip_prefix=""
            )
            uncovered = [k for k in unmatched if not k.endswith("num_batches_tracked")]

            def _count(tree) -> int:
                return sum(
                    _count(v) if isinstance(v, dict) else 1 for v in tree.values()
                )

            out[name] = {
                "status": "ok" if not uncovered else "uncovered_keys",
                "torch_keys": len(inventory),
                "converted_leaves": _count(params),
                "uncovered": uncovered[:8],
            }
        except Exception as e:  # pragma: no cover - report, don't crash
            out[name] = {"status": "error", "detail": f"{type(e).__name__}: {e}"}
    return out


def write_parity_report(output: str | Path, **overrides) -> dict:
    """Run whatever parity tiers the available artifacts allow; write JSON.

    Artifact paths come from ``overrides`` or env vars
    (``VISCY_PARITY_CHECKPOINT`` / ``VISCY_PARITY_DATA`` /
    ``VISCY_PARITY_REFERENCE``).
    """
    ckpt = overrides.get("checkpoint") or os.environ.get("VISCY_PARITY_CHECKPOINT")
    data = overrides.get("data") or os.environ.get("VISCY_PARITY_DATA")
    ref = overrides.get("reference") or os.environ.get("VISCY_PARITY_REFERENCE")

    report: dict = {
        "contract": {
            "atol": ATOL,
            "rtol": RTOL,
            "min_pearson_r": MIN_PEARSON_R,
            "source": "reference test_inference_reproducibility.py:50-73",
        },
        "converter_dryruns": converter_dryruns(),
        "run_when_artifacts_appear": [
            "python -m viscy_tpu.training.parity --output PARITY.json "
            "--checkpoint /path/to/released.ckpt "
            "--data /path/to/fixture_plate.zarr "
            "--reference /path/to/reference_predictions.zarr",
            "# or set VISCY_PARITY_CHECKPOINT / VISCY_PARITY_DATA / "
            "VISCY_PARITY_REFERENCE and rerun bench/tests; the contract "
            "executes automatically once all three paths exist",
        ],
    }
    if ckpt and data and ref and all(Path(p).exists() for p in (ckpt, data, ref)):
        report["status"] = "executed"
        report["result"] = run_checkpoint_parity(ckpt, data, ref)
    else:
        report["status"] = "artifacts_unavailable"
        report["detail"] = (
            "released torch checkpoint / fixture zarr / reference predictions "
            "not present in this environment (no egress); offline tiers "
            "(weight audit, activation capture, harness self-test) run in "
            "tests/test_parity.py"
        )
        missing = [
            name
            for name, p in (("checkpoint", ckpt), ("data", data), ("reference", ref))
            if not p or not Path(p).exists()
        ]
        report["missing_artifacts"] = missing
    Path(output).write_text(json.dumps(report, indent=2))
    return report


def main() -> None:  # pragma: no cover - thin CLI
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--data", default=None)
    parser.add_argument("--reference", default=None)
    args = parser.parse_args()
    report = write_parity_report(
        args.output,
        checkpoint=args.checkpoint,
        data=args.data,
        reference=args.reference,
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()
