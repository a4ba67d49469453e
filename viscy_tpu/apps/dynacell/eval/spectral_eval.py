"""Per-position time-series evaluation of virtual-staining predictions.

Native rebuild of the reference spectral-PCC evaluation driver
(``applications/dynacell/src/dynacell/evaluation/spectral_pcc/evaluate.py``):
computes pixel metrics (PCC, PSNR, SSIM), resolution metrics (FSC, DCR),
the full spectral-PCC variant family (raw / OTF / frozen-noise / Wiener /
SNR-squared / log-SNR / FRCW / frozen-FRCW), band-limited PCC/SSIM at
DCR-, FSC- and OTF-derived cutoffs, multiband explainable variance, and
the DCR-A0 reliability weighting — at every timepoint of every position
of an OME-Zarr pair, writing per-position CSVs, mid-Z slice snapshots,
and metric-vs-time plots.

Config is a plain dict (YAML via the ``dynacell spectral-eval`` CLI; no
hydra dependency) with the reference's key layout::

    input_zarr: gt.zarr          # ground truth HCS plate
    pred_zarr: pred.zarr         # predictions (null -> same store)
    channel: Nuclei              # or gt_channel / pred_channel
    positions: [A/1/0]           # null -> all
    spacing: [2.0, 0.5, 0.5]     # fallback when zarr scale is 1.0
    output_dir: eval_out/
    fsc: {threshold: 0.143}
    dcr: {num_radii: 100, num_highpass: 10}
    spectral_pcc: {bin_delta: 1.0, nbins_low: 3, tail_fraction: 0.2}
    bandlimited: {order: 2, win_size: 7}
    optics: {numerical_aperture: 1.35, wavelength_emission: 0.698}
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

from viscy_tpu.apps.dynacell.eval.decorr import (
    band_limited_pcc,
    band_limited_ssim,
    calculate_frc,
    dcr_curve,
    dcr_resolution,
    frc_weights,
    otf_cutoff,
    psnr,
    ssim,
)
from viscy_tpu.apps.dynacell.eval.spectral import (
    estimate_gt_noise_floor,
    fsc_resolution,
    multiband_ev_score,
    radial_power_spectrum,
    spectral_pcc,
)
from viscy_tpu.apps.dynacell.eval.decorr import spectral_pcc_frcw

log = logging.getLogger(__name__)

_SPCC_SHARED_KEYS = ("bin_delta", "cutoff", "apodization", "nbins_low")


def corr_coef(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None = None) -> float:
    """Pearson correlation with optional foreground mask
    (reference ``evaluate.py:69-80``)."""
    if a.shape != b.shape:
        raise ValueError(f"Inputs must be same shape, got {a.shape} and {b.shape}")
    if mask is not None:
        a = a[mask]
        b = b[mask]
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    num = float(np.mean((a - a.mean()) * (b - b.mean())))
    denom = float(a.std() * b.std())
    return num / denom if denom > 0 else float("nan")


def _prepare_masked_inputs(gt_f: np.ndarray, pred_f: np.ndarray):
    """Foreground mask + mean-filled copies for FFT metrics.

    GT zeros (registration corrections) are excluded from pixel metrics
    via a boolean mask; for FFT metrics they are replaced with the
    foreground mean so they become spectrally invisible
    (reference ``evaluate.py:212-234``).
    """
    mask_bool = gt_f > 0
    if not bool(mask_bool.all()) and bool(mask_bool.any()):
        gt_filled = gt_f.copy()
        pred_filled = pred_f.copy()
        gt_filled[~mask_bool] = float(gt_f[mask_bool].mean())
        pred_filled[~mask_bool] = float(pred_f[mask_bool].mean())
        data_range = float(gt_f[mask_bool].max() - gt_f[mask_bool].min())
        zero_frac = 1.0 - float(mask_bool.sum()) / float(mask_bool.size)
        return gt_filled, pred_filled, mask_bool, data_range, zero_frac
    data_range = float(gt_f.max() - gt_f.min())
    return gt_f, pred_f, None, data_range, 0.0


def compute_gt_reliability(gt_2d: np.ndarray, spacing_2d, dcr_kwargs: dict) -> tuple[float, float]:
    """DCR A0 / r0 from a GT slice: peak amplitude of the unfiltered
    decorrelation curve tracks image SNR (reference ``evaluate.py:259-305``).
    Returns (0, 0) when no peak is found or the image is empty."""
    gt_f = gt_2d.astype(np.float32)
    mask = np.isfinite(gt_f) & (gt_f != 0)
    if mask.sum() == 0:
        return 0.0, 0.0
    if not bool(mask.all()):
        gt_f = gt_f.copy()
        gt_f[~mask] = float(gt_f[mask].mean())
    kw = {
        k: v
        for k, v in (dcr_kwargs or {}).items()
        if k in ("num_radii", "num_highpass", "windowing", "refine", "min_amplitude")
    }
    _res, _radii, _curves, all_peaks = dcr_curve(gt_f, spacing_2d, **kw)
    valid = all_peaks[:, 1] > 0
    if valid.any():
        idx = int(np.argmax(valid))  # first valid (unfiltered curve first)
        return float(all_peaks[idx, 1]), float(all_peaks[idx, 0])
    return 0.0, 0.0


def compute_frozen_frcw_weights(
    frames_2d: list[np.ndarray],
    spectral_pcc_kwargs: dict,
) -> np.ndarray:
    """Frozen FRCW weights: per-frame one-image FRC over an early window,
    median across frames, median-smoothed, made monotone non-increasing,
    low-k excluded (reference ``evaluate.py:1107-1133``)."""
    from scipy.ndimage import median_filter

    bin_delta = spectral_pcc_kwargs.get("bin_delta", 1.0)
    nbins_low = spectral_pcc_kwargs.get("frcw_nbins_low", 3)
    smooth_window = spectral_pcc_kwargs.get("frcw_smooth_window", 5)
    per_frame = [frc_weights(f.astype(np.float32), bin_delta=bin_delta) for f in frames_2d]
    frozen = np.median(np.stack(per_frame), axis=0)
    sw = int(smooth_window) | 1
    sw = max(3, min(sw, len(frozen) | 1))
    frozen = median_filter(frozen, size=sw)
    frozen = np.maximum.accumulate(frozen[::-1])[::-1]
    frozen[: min(int(nbins_low), len(frozen))] = 0
    return frozen


def _k90_diagnostic(gt_filled: np.ndarray, spacing, shared_kw: dict, tail_fraction: float) -> float:
    """Frequency (as a fraction of Nyquist) below which 90% of the
    spectral weight mass lives (reference ``evaluate.py:630-649``)."""
    from viscy_tpu.apps.dynacell.eval.spectral import (
        _radial_bins,
        estimate_noise_floor,
        spectral_weights,
    )

    bin_delta = shared_kw.get("bin_delta", 1.0)
    radii, power = radial_power_spectrum(gt_filled, spacing=spacing, bin_delta=bin_delta)
    nf = estimate_noise_floor(radii, power, tail_fraction)
    w_bins = spectral_weights(radii, power, nf, cutoff=shared_kw.get("cutoff"))
    nbl = min(int(shared_kw.get("nbins_low", 0)), len(w_bins))
    if nbl > 0:
        w_bins = w_bins.copy()
        w_bins[:nbl] = 0.0
    _, bid = _radial_bins(gt_filled.shape, spacing, bin_delta)
    counts = np.bincount(bid[bid >= 0].ravel(), minlength=len(w_bins))
    mass = w_bins * counts[: len(w_bins)]
    total = mass.sum()
    if total <= 0:
        return 0.0
    cum = np.cumsum(mass) / total
    k_nyq = min(1.0 / (2.0 * s) for s in spacing)
    idx = min(int(np.searchsorted(cum, 0.9)), len(radii) - 1)
    return float(radii[idx]) / k_nyq


def _spectral_pcc_variants(
    pred_filled: np.ndarray,
    gt_filled: np.ndarray,
    spacing,
    spectral_pcc_kwargs: dict,
    otf_cut: float | None,
    ref_noise_floor: float | None,
    suffix: str = "",
) -> dict[str, float]:
    """The shared spectral-PCC variant battery (3D and 2D paths both run
    this; reference ``evaluate.py:593-697`` / ``:878-993``)."""
    from viscy_tpu.apps.dynacell.eval.spectral import estimate_noise_floor

    m: dict[str, float] = {}
    spcc_kw = {k: v for k, v in spectral_pcc_kwargs.items() if not k.startswith("frcw_") and k != "tail_fraction"}
    m[f"Spectral_PCC{suffix}"] = spectral_pcc(pred_filled, gt_filled, spacing=spacing, **spcc_kw)
    if otf_cut is not None:
        kw = dict(spcc_kw)
        kw["cutoff"] = otf_cut
        m[f"Spectral_PCC_OTF{suffix}"] = spectral_pcc(pred_filled, gt_filled, spacing=spacing, **kw)
    shared_kw = {k: v for k, v in spectral_pcc_kwargs.items() if k in _SPCC_SHARED_KEYS}
    if ref_noise_floor is not None:
        m[f"Spectral_PCC_Fixed{suffix}"] = spectral_pcc(
            pred_filled, gt_filled, spacing=spacing, noise_floor=ref_noise_floor, **shared_kw
        )
    # Per-timepoint noise floor shared by Wiener / SNR-squared / log-SNR.
    tail = spectral_pcc_kwargs.get("tail_fraction", 0.2)
    bin_delta = shared_kw.get("bin_delta", 1.0)
    radii, power = radial_power_spectrum(gt_filled, spacing=spacing, bin_delta=bin_delta)
    nf_tp = estimate_noise_floor(radii, power, tail)
    m[f"k90{suffix}"] = _k90_diagnostic(gt_filled, spacing, shared_kw, tail)
    for name, weighting in (("Wiener", "wiener"), ("SNR2", "snr_squared"), ("LogSNR", "log_snr")):
        m[f"Spectral_PCC_{name}{suffix}"] = spectral_pcc(
            pred_filled, gt_filled, spacing=spacing, noise_floor=nf_tp, weighting=weighting, **shared_kw
        )
    ev_nc, _ = multiband_ev_score(pred_filled, gt_filled, spacing=spacing, noise_corrected=True)
    m[f"Multiband_EV_NC{suffix}"] = ev_nc
    ev_pcc, _ = multiband_ev_score(pred_filled, gt_filled, spacing=spacing, noise_corrected=False)
    m[f"Multiband_EV_PCC{suffix}"] = ev_pcc
    return m


def _bandlimited_battery(
    pred_filled: np.ndarray,
    gt_filled: np.ndarray,
    spacing,
    bandlimited_kwargs: dict,
    cutoffs: dict[str, float | None],
) -> dict[str, float]:
    """Band-limited PCC/SSIM at every available cutoff source
    (reference ``evaluate.py:698-821``)."""
    bl_kw = {k: v for k, v in bandlimited_kwargs.items() if k != "method"}
    ssim_extra = {k: bl_kw.pop(k) for k in ("win_size", "data_range") if k in bl_kw}
    m: dict[str, float] = {}
    for label, cut in cutoffs.items():
        if cut is None or not np.isfinite(cut) or cut <= 0:
            continue
        m[f"BL_PCC_{label}"] = band_limited_pcc(pred_filled, gt_filled, spacing=spacing, cutoff=cut, **bl_kw)
        m[f"BL_SSIM_{label}"] = band_limited_ssim(
            pred_filled, gt_filled, spacing=spacing, cutoff=cut, **bl_kw, **ssim_extra
        )
    return m


def compute_timepoint_metrics(
    gt: np.ndarray,
    pred: np.ndarray,
    spacing,
    fsc_kwargs: dict,
    dcr_kwargs: dict,
    spectral_pcc_kwargs: dict | None = None,
    bandlimited_kwargs: dict | None = None,
    optics: dict | None = None,
    ref_noise_floor: float | None = None,
) -> dict[str, float]:
    """Pixel + resolution + spectral metrics for one 3D timepoint
    (reference ``evaluate.py:515-822``)."""
    gt_f = gt.astype(np.float32)
    pred_f = pred.astype(np.float32)
    gt_filled, pred_filled, mask, data_range, zero_frac = _prepare_masked_inputs(gt_f, pred_f)

    metrics: dict[str, float] = {
        "PCC": corr_coef(gt_f, pred_f, mask=mask),
        "PSNR": psnr(gt_f, pred_f, data_range=data_range, mask=mask),
        "SSIM": ssim(gt_f, pred_f, data_range=data_range),
        "zero_frac": zero_frac,
    }

    fsc = fsc_resolution(gt_filled, pred_filled, spacing=spacing, **(fsc_kwargs or {}))
    metrics["FSC_XY"] = fsc["xy"]
    metrics["FSC_Z"] = fsc["z"]
    fsc_gt = fsc_resolution(gt_filled, spacing=spacing, **(fsc_kwargs or {}))
    metrics["FSC_GT_XY"] = fsc_gt["xy"]
    metrics["FSC_GT_Z"] = fsc_gt["z"]

    dcr = dcr_resolution(pred_filled, spacing, **(dcr_kwargs or {}))
    metrics["DCR_XY"] = dcr["xy"]
    metrics["DCR_Z"] = dcr["z"]

    otf_cut = None
    if optics is not None:
        otf_cut = otf_cutoff(
            optics["numerical_aperture"],
            optics["wavelength_emission"],
            modality=optics.get("modality", "widefield"),
        )

    if spectral_pcc_kwargs is not None:
        metrics.update(
            _spectral_pcc_variants(pred_filled, gt_filled, spacing, spectral_pcc_kwargs, otf_cut, ref_noise_floor)
        )
    if bandlimited_kwargs is not None:
        cutoffs = {
            "DCR_XY": 1.0 / dcr["xy"] if np.isfinite(dcr["xy"]) and dcr["xy"] > 0 else None,
            "DCR_Z": 1.0 / dcr["z"] if np.isfinite(dcr["z"]) and dcr["z"] > 0 else None,
            "FSC_XY": 1.0 / fsc["xy"] if np.isfinite(fsc["xy"]) and fsc["xy"] > 0 else None,
            "FSC_Z": 1.0 / fsc["z"] if np.isfinite(fsc["z"]) and fsc["z"] > 0 else None,
            "OTF": otf_cut,
        }
        metrics.update(_bandlimited_battery(pred_filled, gt_filled, spacing, bandlimited_kwargs, cutoffs))
    return metrics


def compute_timepoint_metrics_2d(
    gt: np.ndarray,
    pred: np.ndarray,
    spacing,
    dcr_kwargs: dict,
    spectral_pcc_kwargs: dict | None = None,
    bandlimited_kwargs: dict | None = None,
    optics: dict | None = None,
    ref_noise_floor: float | None = None,
    frozen_frcw_weights: np.ndarray | None = None,
) -> dict[str, float]:
    """2D (mid-Z slice) metric battery with ``_2D``-suffixed keys
    (reference ``evaluate.py:825-1054``), including the smooth and
    FRCW / frozen-FRCW spectral variants that only exist in 2D."""
    gt_f = gt.astype(np.float32)
    pred_f = pred.astype(np.float32)
    gt_filled, pred_filled, mask, data_range, _ = _prepare_masked_inputs(gt_f, pred_f)

    metrics: dict[str, float] = {
        "PCC_2D": corr_coef(gt_f, pred_f, mask=mask),
        "PSNR_2D": psnr(gt_f, pred_f, data_range=data_range, mask=mask),
        "SSIM_2D": ssim(gt_f, pred_f, data_range=data_range),
    }

    dcr_val = dcr_resolution(pred_filled, spacing, **(dcr_kwargs or {}))
    metrics["DCR_2D"] = float(dcr_val)

    otf_cut = None
    if optics is not None:
        otf_cut = otf_cutoff(
            optics["numerical_aperture"],
            optics["wavelength_emission"],
            modality=optics.get("modality", "widefield"),
        )

    if spectral_pcc_kwargs is not None:
        metrics.update(
            _spectral_pcc_variants(
                pred_filled, gt_filled, spacing, spectral_pcc_kwargs, otf_cut, ref_noise_floor, suffix="_2D"
            )
        )
        spcc_kw = {
            k: v for k, v in spectral_pcc_kwargs.items() if not k.startswith("frcw_") and k != "tail_fraction"
        }
        metrics["Spectral_PCC_Smooth_2D"] = spectral_pcc(
            pred_filled, gt_filled, spacing=spacing, smooth=True, **spcc_kw
        )
        frcw_kw = {k: v for k, v in spectral_pcc_kwargs.items() if k in ("bin_delta", "apodization")}
        metrics["Spectral_PCC_FRCW_2D"] = spectral_pcc_frcw(pred_filled, gt_filled, spacing=spacing, **frcw_kw)
        if frozen_frcw_weights is not None:
            metrics["Spectral_PCC_FRCW_Frozen_2D"] = spectral_pcc_frcw(
                pred_filled, gt_filled, spacing=spacing, frozen_weights=frozen_frcw_weights, **frcw_kw
            )
    if bandlimited_kwargs is not None:
        cutoffs = {
            "DCR_2D": 1.0 / dcr_val if np.isfinite(dcr_val) and dcr_val > 0 else None,
            "OTF_2D": otf_cut,
        }
        metrics.update(_bandlimited_battery(pred_filled, gt_filled, spacing, bandlimited_kwargs, cutoffs))
    return metrics


def dcr_reliability_weights(a0_vals: np.ndarray, k_ref: int = 5) -> np.ndarray:
    """Per-timepoint reliability weights from the DCR-A0 trajectory:
    1 near the early (high-SNR) level, 0 at the late (bleached) level
    (reference ``evaluate.py:1179-1192``)."""
    a_good = float(np.median(a0_vals[:k_ref]))
    a_bad = float(np.median(a0_vals[-k_ref:]))
    eps = 1e-6
    if a_good <= 0:
        return np.zeros_like(a0_vals)
    if (a_good - a_bad) < eps:
        return np.ones_like(a0_vals)
    w = np.clip((a0_vals - a_bad) / (a_good - a_bad), 0.0, 1.0)
    return np.where(np.isfinite(a0_vals), w, 0.0)


def evaluate_position(
    pos_name: str,
    pos_gt,
    pos_pred,
    gt_ch_idx: int,
    pred_ch_idx: int,
    spacing,
    cfg: dict,
) -> pd.DataFrame:
    """Evaluate every timepoint of one position; one row per timepoint
    (reference ``evaluate.py:1057-1195``)."""
    fsc_kwargs = dict(cfg.get("fsc") or {})
    dcr_kwargs = dict(cfg.get("dcr") or {})
    spectral_pcc_kwargs = dict(cfg["spectral_pcc"]) if cfg.get("spectral_pcc") is not None else None
    bandlimited_kwargs = dict(cfg["bandlimited"]) if cfg.get("bandlimited") is not None else None
    optics_kwargs = dict(cfg["optics"]) if cfg.get("optics") is not None else None

    gt_data = pos_gt.data
    pred_data = pos_pred.data
    n_timepoints = gt_data.shape[0]

    ref_noise_floor = None
    frozen_frcw = None
    if spectral_pcc_kwargs is not None:
        gt_t0 = np.asarray(gt_data[0, gt_ch_idx])
        ref_noise_floor = estimate_gt_noise_floor(
            gt_t0,
            spacing,
            bin_delta=spectral_pcc_kwargs.get("bin_delta", 1.0),
            tail_fraction=spectral_pcc_kwargs.get("tail_fraction", 0.2),
        )
        log.info("  Reference noise floor (t=0): %.4f", ref_noise_floor)
        k = min(5, n_timepoints)
        mid_z_ref = gt_data.shape[2] // 2
        frames = [np.asarray(gt_data[t, gt_ch_idx, mid_z_ref]) for t in range(k)]
        frozen_frcw = compute_frozen_frcw_weights(frames, spectral_pcc_kwargs)
        log.info(
            "Frozen FRCW: %d/%d nonzero, total mass=%.3f",
            int((frozen_frcw > 0).sum()),
            len(frozen_frcw),
            float(frozen_frcw.sum()),
        )

    rows = []
    for t in range(n_timepoints):
        log.info("  timepoint %d / %d", t + 1, n_timepoints)
        gt_vol = np.asarray(gt_data[t, gt_ch_idx])
        pred_vol = np.asarray(pred_data[t, pred_ch_idx])

        m = compute_timepoint_metrics(
            gt_vol,
            pred_vol,
            spacing,
            fsc_kwargs,
            dcr_kwargs,
            spectral_pcc_kwargs,
            bandlimited_kwargs,
            optics_kwargs,
            ref_noise_floor,
        )
        mid_z = gt_vol.shape[0] // 2
        spacing_2d = list(spacing)[1:]
        m.update(
            compute_timepoint_metrics_2d(
                gt_vol[mid_z],
                pred_vol[mid_z],
                spacing_2d,
                dcr_kwargs,
                spectral_pcc_kwargs,
                bandlimited_kwargs,
                optics_kwargs,
                ref_noise_floor,
                frozen_frcw_weights=frozen_frcw,
            )
        )
        a0, r0 = compute_gt_reliability(gt_vol[mid_z], spacing_2d, dcr_kwargs)
        m["DCR_A0"] = a0
        m["DCR_r0"] = r0
        m["timepoint"] = t
        rows.append(m)

    df = pd.DataFrame(rows)
    if "DCR_A0" in df.columns:
        df["DCR_w"] = dcr_reliability_weights(df["DCR_A0"].values)
    cols = ["timepoint"] + [c for c in df.columns if c != "timepoint"]
    return df[cols]


def plot_metrics(df: pd.DataFrame, pos_name: str, output_dir: Path, slices=None) -> None:
    """Metric-vs-timepoint grid with linear-fit drop/CV annotations and
    optional GT/pred image panels (reference ``evaluate.py:1198-1335``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.gridspec import GridSpec

    metrics = [c for c in df.columns if c != "timepoint"]
    n = len(metrics)
    ncols = 3
    metric_rows = (n + ncols - 1) // ncols
    img_rows = 2 if slices else 0
    total_rows = img_rows + metric_rows

    fig = plt.figure(figsize=(4 * ncols, 3 * total_rows))
    gs = GridSpec(total_rows, ncols, figure=fig)

    if slices:
        for col, (label, gt_xy, pred_xy) in enumerate(slices[:ncols]):
            for row, (img, tag) in enumerate(((gt_xy, "GT"), (pred_xy, "Pred"))):
                ax = fig.add_subplot(gs[row, col])
                ax.imshow(img, cmap="gray")
                ax.set_title(f"{tag} {label}", fontsize=9)
                ax.set_xticks([])
                ax.set_yticks([])

    t_vals = df["timepoint"].values
    for i, name in enumerate(metrics):
        ax = fig.add_subplot(gs[img_rows + i // ncols, i % ncols])
        vals = df[name].values.astype(float)
        ax.plot(t_vals, vals, marker="o", markersize=2, linewidth=1)
        mask = np.isfinite(vals)
        if mask.sum() > 1:
            slope, intercept = np.polyfit(t_vals[mask], vals[mask], 1)
            ax.plot(t_vals, slope * t_vals + intercept, color="red", linewidth=1, linestyle="--")
            y0 = intercept
            y_t = slope * t_vals[-1] + intercept
            drop = (y0 - y_t) / y0 * 100 if y0 > 0 else 0
            mean = np.mean(vals[mask])
            cv = np.std(vals[mask]) / mean * 100 if mean != 0 else 0
            ax.set_title(f"{name}\ndrop={drop:.1f}%  CV={cv:.1f}%", fontsize=9)
        else:
            ax.set_title(name, fontsize=9)
        ax.set_xlabel("Timepoint")
        ax.grid(True, alpha=0.3)

    fig.suptitle(pos_name, fontsize=12)
    fig.tight_layout()
    fig.savefig(output_dir / "metrics.png", dpi=150)
    plt.close(fig)


def resolve_spacing(pos, cfg: dict) -> list[float]:
    """Voxel spacing from zarr scale metadata, config fallback when the
    scale is all-ones (reference ``evaluate.py:1338-1366``)."""
    try:
        scale = pos.scale
        spacing = [
            scale[pos.get_axis_index("z")],
            scale[pos.get_axis_index("y")],
            scale[pos.get_axis_index("x")],
        ]
        if all(s == 1.0 for s in spacing):
            log.warning("Zarr scale is all 1.0, using config spacing: %s", cfg.get("spacing"))
            return list(cfg["spacing"])
        return spacing
    except Exception:
        log.warning("Could not read spacing from zarr, using config: %s", cfg.get("spacing"))
        return list(cfg["spacing"])


def compute(cfg: dict) -> None:
    """Stage 1: metrics CSVs + mid-Z slice snapshots per position
    (reference ``evaluate.py:1396-1450``)."""
    from viscy_tpu.zarr_io import open_ome_zarr

    output_dir = Path(cfg["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)
    allowed = set(cfg["positions"]) if cfg.get("positions") else None
    two_zarr = cfg.get("pred_zarr") is not None

    input_store = open_ome_zarr(cfg["input_zarr"], mode="r")
    pred_store = open_ome_zarr(cfg["pred_zarr"], mode="r") if two_zarr else input_store

    for pos_name, pos_gt in input_store.positions():
        if allowed is not None and pos_name not in allowed:
            continue
        log.info("Processing position: %s", pos_name)
        pos_pred = pred_store[pos_name] if two_zarr else pos_gt
        gt_channel = cfg.get("gt_channel") or cfg["channel"]
        pred_channel = cfg.get("pred_channel") or cfg["channel"]
        gt_ch_idx = pos_gt.get_channel_index(gt_channel)
        pred_ch_idx = pos_pred.get_channel_index(pred_channel)
        spacing = resolve_spacing(pos_gt, cfg)

        df = evaluate_position(pos_name, pos_gt, pos_pred, gt_ch_idx, pred_ch_idx, spacing, cfg)

        pos_dir = output_dir / pos_name
        pos_dir.mkdir(parents=True, exist_ok=True)
        df.to_csv(pos_dir / "metrics.csv", index=False)

        gt_data = pos_gt.data
        n_t, n_z = gt_data.shape[0], gt_data.shape[2]
        mid_z = n_z // 2
        labels, gt_slices, pred_slices = [], [], []
        for t_idx in (0, n_t // 2, n_t - 1):
            labels.append(f"t={t_idx}")
            gt_slices.append(np.asarray(gt_data[t_idx, gt_ch_idx, mid_z]))
            pred_slices.append(np.asarray(pos_pred.data[t_idx, pred_ch_idx, mid_z]))
        np.savez(pos_dir / "slices.npz", labels=labels, gt=gt_slices, pred=pred_slices)
        log.info("  Saved %s", pos_dir)


def plot(cfg: dict) -> None:
    """Stage 2: regenerate metric plots from saved CSVs/slices
    (reference ``evaluate.py:1453-1476``)."""
    output_dir = Path(cfg["output_dir"])
    allowed = set(cfg["positions"]) if cfg.get("positions") else None
    for csv_path in sorted(output_dir.rglob("metrics.csv")):
        pos_dir = csv_path.parent
        pos_name = str(pos_dir.relative_to(output_dir))
        if allowed is not None and pos_name not in allowed:
            continue
        df = pd.read_csv(csv_path)
        slices = None
        slices_path = pos_dir / "slices.npz"
        if slices_path.exists():
            data = np.load(slices_path, allow_pickle=True)
            slices = list(zip(data["labels"], data["gt"], data["pred"]))
        plot_metrics(df, pos_name, pos_dir, slices=slices)


def main(cfg: dict) -> None:
    """Run ``compute`` and/or ``plot`` per ``cfg["mode"]``
    (``compute`` | ``plot`` | ``all``; reference ``evaluate.py:1479-1490``)."""
    mode = cfg.get("mode", "all")
    if mode in ("compute", "all"):
        compute(cfg)
    if mode in ("plot", "all"):
        plot(cfg)
