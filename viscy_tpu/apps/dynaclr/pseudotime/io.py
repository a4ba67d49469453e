"""Template persistence for the pseudotime pipeline.

Rebuild of reference ``dynaclr/pseudotime/io.py``: save/load infection-
response templates as zarr groups (one "flavor" subgroup per template
variant, carrying the embedding rows, z-score params, label-propagation
fractions, real-time calibration and the tau event band), using the
pure-python zarr primitives from :mod:`viscy_tpu.evaluation.anndata_lite`.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path

import numpy as np

from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import TemplateResult
from viscy_tpu.evaluation.anndata_lite import _init_group, _read_array, _write_array

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "save_template_zarr",
    "load_template_flavor",
    "read_template_attrs",
    "read_time_calibration",
    "read_tau_event_band",
    "compute_tau_event_band",
    "date_prefix_from_dataset_id",
]


def date_prefix_from_dataset_id(dataset_id: str) -> str:
    """Leading date token of a dataset id (``2024_07_24_A549`` -> ``07_24``)."""
    m = re.search(r"(\d{2})_(\d{2})", dataset_id)
    return f"{m.group(1)}_{m.group(2)}" if m else dataset_id


def compute_tau_event_band(
    time_calibration: np.ndarray, band_minutes: tuple[float, float] = (-60.0, 60.0)
) -> tuple[float, float]:
    """Normalized pseudotime band [0, 1] covering ``band_minutes`` of real
    time around the anchored event (calibration minute 0)."""
    tc = np.asarray(time_calibration, float)
    T = len(tc)
    if T < 2:
        return 0.0, 1.0
    pos = np.arange(T) / (T - 1)
    lo = float(np.interp(band_minutes[0], tc, pos))
    hi = float(np.interp(band_minutes[1], tc, pos))
    return lo, hi


def save_template_zarr(
    template_path: str | Path,
    result: TemplateResult,
    flavor: str = "default",
    attrs: dict | None = None,
    tau_band_minutes: tuple[float, float] = (-60.0, 60.0),
) -> Path:
    """Persist one template flavor into a zarr group store."""
    template_path = Path(template_path)
    _init_group(template_path, {"store": "dynaclr-pseudotime-template", **(attrs or {})})
    grp = template_path / flavor
    flavor_attrs = {
        "template_id": result.template_id,
        "n_input_tracks": result.n_input_tracks,
        "explained_variance": result.explained_variance,
        "template_cell_ids": [list(c) for c in result.template_cell_ids],
    }
    if result.time_calibration is not None:
        lo, hi = compute_tau_event_band(result.time_calibration, tau_band_minutes)
        flavor_attrs["tau_event_band"] = [lo, hi]
    _init_group(grp, flavor_attrs)
    _write_array(grp / "template", np.asarray(result.template, np.float32))
    if result.time_calibration is not None:
        _write_array(grp / "time_calibration", np.asarray(result.time_calibration, np.float32))
    zs = grp / "zscore_params"
    _init_group(zs, {"datasets": sorted(result.zscore_params)})
    for dataset_id, (mean, std) in result.zscore_params.items():
        _write_array(zs / f"{dataset_id}__mean", np.asarray(mean, np.float32))
        _write_array(zs / f"{dataset_id}__std", np.asarray(std, np.float32))
    if result.pca is not None:
        pca_grp = grp / "pca"
        _init_group(pca_grp, {"n_components": int(result.pca.n_components_)})
        _write_array(pca_grp / "components", np.asarray(result.pca.components_, np.float32))
        _write_array(pca_grp / "mean", np.asarray(result.pca.mean_, np.float32))
        _write_array(
            pca_grp / "explained_variance", np.asarray(result.pca.explained_variance_, np.float32)
        )
    if result.template_labels:
        lab = grp / "labels"
        _init_group(lab, {"columns": sorted(result.template_labels)})
        for col, classes in result.template_labels.items():
            col_grp = lab / col
            _init_group(col_grp, {"classes": sorted(classes)})
            for cls, arr in classes.items():
                _write_array(col_grp / str(cls), np.asarray(arr, np.float32))
    _logger.info("saved template flavor %r to %s", flavor, template_path)
    return template_path


def _read_attrs(path: Path) -> dict:
    f = path / ".zattrs"
    return json.loads(f.read_text()) if f.exists() else {}


def load_template_flavor(template_path: str | Path, flavor: str = "default") -> tuple[TemplateResult, dict]:
    """Load one template flavor; returns (TemplateResult, flavor attrs).
    PCA round-trips through a reconstructed sklearn PCA carrying
    components_ + mean_ (enough for ``transform``)."""
    template_path = Path(template_path)
    grp = template_path / flavor
    if not grp.exists():
        available = [p.name for p in template_path.iterdir() if p.is_dir()]
        raise FileNotFoundError(f"flavor {flavor!r} not in {template_path} (available: {available})")
    attrs = _read_attrs(grp)
    template = _read_array(grp / "template")
    tc = _read_array(grp / "time_calibration") if (grp / "time_calibration").exists() else None

    zparams = {}
    zs = grp / "zscore_params"
    if zs.exists():
        for mean_path in zs.glob("*__mean"):
            dataset_id = mean_path.name[: -len("__mean")]
            zparams[dataset_id] = (
                _read_array(mean_path),
                _read_array(zs / f"{dataset_id}__std"),
            )
    pca = None
    if (grp / "pca").exists():
        from sklearn.decomposition import PCA

        components = _read_array(grp / "pca" / "components")
        mean = _read_array(grp / "pca" / "mean")
        pca = PCA(n_components=components.shape[0])
        pca.components_ = components.astype(np.float64)
        pca.mean_ = mean.astype(np.float64)
        pca.n_components_ = components.shape[0]
        ev_path = grp / "pca" / "explained_variance"
        pca.explained_variance_ = (
            _read_array(ev_path).astype(np.float64)
            if ev_path.exists()
            else np.ones(components.shape[0])
        )
        pca.whiten = False
    labels = None
    if (grp / "labels").exists():
        labels = {}
        for col_grp in (grp / "labels").iterdir():
            if not col_grp.is_dir():
                continue
            labels[col_grp.name] = {
                cls.name: _read_array(cls) for cls in col_grp.iterdir() if cls.is_dir()
            }
    result = TemplateResult(
        template=template,
        template_id=attrs.get("template_id", flavor),
        pca=pca,
        zscore_params=zparams,
        template_cell_ids=[tuple(c) for c in attrs.get("template_cell_ids", [])],
        n_input_tracks=int(attrs.get("n_input_tracks", 0)),
        explained_variance=attrs.get("explained_variance"),
        template_labels=labels,
        time_calibration=tc,
    )
    return result, attrs


def read_template_attrs(template_path: str | Path) -> dict:
    return _read_attrs(Path(template_path))


def read_time_calibration(template_path: str | Path, flavor: str = "default") -> np.ndarray:
    return _read_array(Path(template_path) / flavor / "time_calibration")


def read_tau_event_band(template_path: str | Path, flavor: str = "default") -> tuple[float, float]:
    attrs = _read_attrs(Path(template_path) / flavor)
    band = attrs.get("tau_event_band")
    if band is None:
        raise KeyError(f"flavor {flavor!r} has no tau_event_band (no time calibration at save time)")
    return float(band[0]), float(band[1])


def find_embedding_zarr(pred_dir: str | Path, pattern: str) -> str:
    """Find the single embedding zarr matching ``pattern`` in ``pred_dir``
    (reference ``pseudotime/io.py:58``). A pattern ending in ``"_*.zarr"``
    is retried with the trailing underscore dropped, covering dataset_ids
    that exactly equal the zarr basename; zero or multiple matches raise
    ``FileNotFoundError``."""
    import glob

    matches = glob.glob(str(Path(pred_dir) / pattern))
    if len(matches) == 0 and pattern.endswith("_*.zarr"):
        relaxed = pattern[: -len("_*.zarr")] + "*.zarr"
        matches = glob.glob(str(Path(pred_dir) / relaxed))
    if len(matches) == 0:
        raise FileNotFoundError(f"No zarr matching {pattern} in {pred_dir}")
    if len(matches) > 1:
        names = sorted(Path(m).name for m in matches)
        raise FileNotFoundError(f"Multiple zarrs match {pattern}: {names}")
    return matches[0]


def get_dynaclr_versions() -> dict[str, str]:
    """Code/library versions stamped into template zarrs for provenance
    (reference ``pseudotime/io.py:102``; stack-appropriate fields: the DTW
    kernel here is the in-repo native C++ DP + jax/numpy, not
    dtaidistance/sklearn)."""
    import subprocess

    sha = "unknown"
    try:
        result = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=Path(__file__).parent,
            timeout=10,
        )
        if result.returncode == 0:
            sha = result.stdout.strip()
    except Exception:
        pass
    import jax

    from viscy_tpu.native import native_available

    return {
        "viscy_tpu_git_sha": sha,
        "jax_version": jax.__version__,
        "numpy_version": np.__version__,
        "native_dtw_kernel": str(bool(native_available())),
    }
