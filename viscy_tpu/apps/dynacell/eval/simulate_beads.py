"""Simulated fluorescent beads with controlled bleaching for metric validation.

Native rebuild of the reference bead-phantom diagnostic
(``applications/dynacell/src/dynacell/evaluation/spectral_pcc/simulate_beads.py``):
generates a multi-bead phantom, convolves it with a physically accurate
widefield OTF (analytic pupil model instead of the reference's waveorder
dependency), adds Poisson noise under exponential photobleaching and an
optional smooth shading field, then evaluates every spectral-PCC variant
per timepoint to validate metric behavior against the *known* SNR decay.

Stages (``cfg["stage"]``: ``simulate`` | ``evaluate`` | ``plot`` | ``all``)
cache intermediates as ``simulation.npz`` / ``simulation_metrics.csv`` so
plots can be regenerated without recomputing.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from viscy_tpu.apps.dynacell.eval.decorr import (
    calculate_frc,
    estimate_cutoff,
    apply_lowpass,
    frc_weights,
    otf_cutoff,
    psnr,
)
from viscy_tpu.apps.dynacell.eval.spectral import (
    estimate_noise_floor,
    radial_power_spectrum,
    snr_adaptive_weights,
    spectral_pcc,
    spectral_weights,
)
from viscy_tpu.apps.dynacell.eval.spectral_eval import (
    compute_frozen_frcw_weights,
    compute_gt_reliability,
    compute_timepoint_metrics,
    compute_timepoint_metrics_2d,
    corr_coef,
    dcr_reliability_weights,
)

log = logging.getLogger(__name__)

DEFAULT_CONFIG: dict = {
    "output_dir": "output_simulation",
    "stage": "all",
    "phantom": {
        "ndim": 2,
        "shape_2d": [256, 256],
        "shape_3d": [32, 128, 128],
        "spacing_2d": [0.103, 0.103],
        "spacing_3d": [0.25, 0.103, 0.103],
        "n_beads": 30,
        "sphere_radius": 0.01,
        "seed": 42,
    },
    "optics": {
        "numerical_aperture": 1.35,
        "wavelength_emission": 0.698,
        "index_of_refraction": 1.3,
        "modality": "widefield",
    },
    "bleaching": {"n_timepoints": 125, "initial_counts": 10000.0, "bleach_tau": 12.0, "seed": 42},
    "shading": {"alpha": 0.0, "beta": 0.0, "sigma_um": 5.0, "seed": 123},
    "metrics": {
        "spectral_pcc": {"bin_delta": 1.0, "tail_fraction": 0.2, "nbins_low": 0},
        "dcr": {"num_radii": 100, "num_highpass": 10},
        "bandlimited": {"order": 2, "win_size": 7},
        "fsc": {},
    },
    "plot": {"dpi": 150, "n_snapshots": 6},
}


def _merged_config(cfg: dict | None) -> dict:
    """Deep-merge a user config over :data:`DEFAULT_CONFIG`."""

    def merge(base, over):
        out = dict(base)
        for k, v in (over or {}).items():
            out[k] = merge(base[k], v) if isinstance(v, dict) and isinstance(base.get(k), dict) else v
        return out

    return merge(DEFAULT_CONFIG, cfg or {})


@dataclasses.dataclass
class SimulationData:
    """Intermediate simulation outputs, cached as .npz between stages."""

    clean: np.ndarray  # (Y,X) or (Z,Y,X), float32, normalized [0,1]
    series: np.ndarray  # (T,...), float32, Poisson-noisy bleached images
    prediction: np.ndarray  # same shape as clean, float32
    true_snr: np.ndarray  # (T,), float64


def save_simulation(sim: SimulationData, output_dir: Path) -> None:
    np.savez_compressed(
        Path(output_dir) / "simulation.npz",
        clean=sim.clean,
        series=sim.series,
        prediction=sim.prediction,
        true_snr=sim.true_snr,
    )


def load_simulation(output_dir: Path) -> SimulationData:
    path = Path(output_dir) / "simulation.npz"
    if not path.exists():
        raise FileNotFoundError(f"No cached simulation at {path}. Run stage=all or stage=simulate first.")
    data = np.load(path)
    return SimulationData(
        clean=data["clean"], series=data["series"], prediction=data["prediction"], true_snr=data["true_snr"]
    )


# ---------------------------------------------------------------------------
# Simulation
# ---------------------------------------------------------------------------
def _single_bead(shape: tuple[int, ...], spacing: list[float], radius: float) -> np.ndarray:
    """One centered bead: an (anti-aliased) solid sphere of ``radius``
    physical units. Sub-resolution radii degrade to a single-voxel point
    source — the regime the reference uses (radius 0.01 um) to probe the
    OTF directly."""
    grids = [(np.arange(n) - n // 2) * d for n, d in zip(shape, spacing)]
    mesh = np.meshgrid(*grids, indexing="ij")
    r = np.sqrt(sum(g**2 for g in mesh))
    # Smooth half-voxel edge so the sphere boundary is not aliased.
    edge = 0.5 * min(spacing)
    bead = np.clip((radius + edge - r) / (2 * edge), 0.0, 1.0).astype(np.float32)
    if bead.max() == 0:  # sub-resolution: point source at the center voxel
        bead[tuple(n // 2 for n in shape)] = 1.0
    return bead


def generate_multi_bead_phantom(
    shape: tuple[int, ...],
    spacing: list[float],
    n_beads: int = 30,
    sphere_radius: float = 0.01,
    seed: int = 42,
) -> np.ndarray:
    """Beads at random positions via circular shifts of one centered bead,
    normalized to [0, 1] (reference ``simulate_beads.py:94-148``)."""
    rng = np.random.default_rng(seed)
    ndim = len(shape)
    single = _single_bead(tuple(shape), list(spacing), sphere_radius)
    phantom = np.zeros(shape, dtype=np.float32)
    center = np.array(shape) // 2
    for _ in range(n_beads):
        shift = rng.integers(-center, center, size=ndim)
        phantom += np.roll(single, shift, axis=tuple(range(ndim)))
    pmax = phantom.max()
    if pmax > 0:
        phantom /= pmax
    return phantom


def widefield_otf_2d(
    shape: tuple[int, int],
    spacing: list[float],
    wavelength_emission: float,
    numerical_aperture: float,
) -> np.ndarray:
    """Analytic in-focus incoherent 2D OTF (pupil autocorrelation):
    ``OTF(k) = (2/pi)(arccos(rho) - rho sqrt(1 - rho^2))`` for
    ``rho = k / k_c``, ``k_c = 2 NA / lambda`` — the exact widefield
    transfer function the reference obtains numerically from waveorder
    (``simulate_beads.py:151-216``)."""
    k_c = otf_cutoff(numerical_aperture, wavelength_emission)
    fy = np.fft.fftfreq(shape[0], d=spacing[0])
    fx = np.fft.fftfreq(shape[1], d=spacing[1])
    kr = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    rho = np.clip(kr / k_c, 0.0, 1.0)
    otf = (2.0 / np.pi) * (np.arccos(rho) - rho * np.sqrt(1.0 - rho**2))
    otf[kr >= k_c] = 0.0
    return otf.astype(np.float32)


def widefield_psf_3d(
    shape: tuple[int, int, int],
    spacing: list[float],
    wavelength_emission: float,
    numerical_aperture: float,
    index_of_refraction: float,
) -> np.ndarray:
    """Widefield fluorescence 3D PSF from angular-spectrum pupil
    propagation: a circular pupil of radius ``NA / lambda`` defocused by
    ``exp(2 pi i z k_z)`` with ``k_z = sqrt((n / lambda)^2 - k_r^2)``;
    ``PSF(z) = |IFFT2(pupil)|^2``. Matches the physics of waveorder's
    ``isotropic_fluorescent_thick_3d`` model used by the reference."""
    nz, ny, nx = shape
    fy = np.fft.fftfreq(ny, d=spacing[1])
    fx = np.fft.fftfreq(nx, d=spacing[2])
    k2 = fy[:, None] ** 2 + fx[None, :] ** 2
    k_pupil = numerical_aperture / wavelength_emission
    pupil = (k2 <= k_pupil**2).astype(np.complex64)
    kz = np.sqrt(np.maximum((index_of_refraction / wavelength_emission) ** 2 - k2, 0.0))
    z_planes = (np.arange(nz) - nz // 2) * spacing[0]
    psf = np.empty(shape, np.float32)
    for i, z in enumerate(z_planes):
        field = np.fft.ifft2(pupil * np.exp(2j * np.pi * z * kz))
        psf[i] = np.abs(field) ** 2
    total = psf.sum()
    if total > 0:
        psf /= total
    return psf


def apply_otf(
    phantom: np.ndarray,
    spacing: list[float],
    wavelength_emission: float = 0.698,
    numerical_aperture: float = 1.35,
    index_of_refraction: float = 1.3,
) -> np.ndarray:
    """Convolve phantom with the widefield OTF/PSF, normalized to [0, 1]
    (reference ``simulate_beads.py:151-216``)."""
    if phantom.ndim == 2:
        otf = widefield_otf_2d(phantom.shape, spacing, wavelength_emission, numerical_aperture)
        blurred = np.real(np.fft.ifft2(np.fft.fft2(phantom) * otf))
    else:
        psf = widefield_psf_3d(phantom.shape, spacing, wavelength_emission, numerical_aperture, index_of_refraction)
        blurred = np.real(np.fft.ifftn(np.fft.fftn(phantom) * np.fft.fftn(np.fft.ifftshift(psf))))
    result = np.maximum(blurred, 0).astype(np.float32)
    rmax = result.max()
    if rmax > 0:
        result /= rmax
    return result


def simulate_bleaching_series(
    clean_norm: np.ndarray,
    n_timepoints: int = 125,
    initial_counts: float = 10000.0,
    bleach_tau: float = 12.0,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Poisson-noise bleaching series: signal decays as
    ``exp(-t / tau)``, true peak SNR = sqrt(signal)
    (reference ``simulate_beads.py:219-257``)."""
    rng = np.random.default_rng(seed)
    t_vals = np.arange(n_timepoints, dtype=np.float64)
    signal_levels = initial_counts * np.exp(-t_vals / bleach_tau)
    true_snr = np.sqrt(signal_levels)
    series = np.zeros((n_timepoints, *clean_norm.shape), dtype=np.float32)
    for t in range(n_timepoints):
        lam = np.maximum(signal_levels[t] * clean_norm, 0).astype(np.float64)
        series[t] = rng.poisson(lam).astype(np.float32)
    return series, true_snr


def generate_shading_field(shape, sigma_px=50.0, seed: int = 123) -> np.ndarray:
    """Smooth non-negative shading field in [0, 1] (illumination
    non-uniformity / autofluorescence; reference ``simulate_beads.py:260-291``)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    s = gaussian_filter(rng.standard_normal(shape).astype(np.float32), sigma=sigma_px)
    return (s - s.min()) / (s.max() - s.min() + 1e-10)


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------
def run_simulate(cfg: dict) -> SimulationData:
    """Stage 1: phantom -> OTF -> (shading) -> bleaching series
    (reference ``simulate_beads.py:1158-1240``)."""
    ph = cfg["phantom"]
    optics = cfg["optics"]
    ndim = ph["ndim"]
    shape = tuple(ph["shape_2d"] if ndim == 2 else ph["shape_3d"])
    spacing = list(ph["spacing_2d"] if ndim == 2 else ph["spacing_3d"])

    log.info("Generating %dD multi-bead phantom (%d beads)...", ndim, ph["n_beads"])
    phantom = generate_multi_bead_phantom(
        shape, spacing, n_beads=ph["n_beads"], sphere_radius=ph["sphere_radius"], seed=ph["seed"]
    )
    clean = apply_otf(
        phantom,
        spacing,
        wavelength_emission=optics["wavelength_emission"],
        numerical_aperture=optics["numerical_aperture"],
        index_of_refraction=optics["index_of_refraction"],
    )

    alpha = float(cfg["shading"]["alpha"])
    beta = float(cfg["shading"]["beta"])
    initial_counts = float(cfg["bleaching"]["initial_counts"])
    clean_for_sim = clean
    shading = None
    if alpha > 0 or beta > 0:
        sigma_px = tuple(cfg["shading"]["sigma_um"] / sp for sp in spacing)
        shading = generate_shading_field(shape, sigma_px=sigma_px, seed=cfg["shading"]["seed"])
        if alpha > 0:  # multiplicative illumination gain
            clean_for_sim = clean * np.clip(1 + alpha * shading, 0.1, None).astype(np.float32)

    prediction = (clean_for_sim * initial_counts).astype(np.float32)
    series, true_snr = simulate_bleaching_series(
        clean_for_sim,
        n_timepoints=cfg["bleaching"]["n_timepoints"],
        initial_counts=initial_counts,
        bleach_tau=cfg["bleaching"]["bleach_tau"],
        seed=cfg["bleaching"]["seed"],
    )
    if beta > 0 and shading is not None:  # additive background, constant in time
        bg = (beta * initial_counts * shading).astype(np.float32)
        series += bg
        prediction = prediction + bg
    return SimulationData(clean=clean, series=series, prediction=prediction, true_snr=true_snr)


def run_evaluate(cfg: dict, sim: SimulationData, output_dir: Path) -> pd.DataFrame:
    """Stage 2: per-timepoint metric battery against the noise-free
    prediction; CSV with the known true SNR per row
    (reference ``simulate_beads.py:1243-1396``)."""
    ph = cfg["phantom"]
    ndim = ph["ndim"]
    spacing = list(ph["spacing_2d"] if ndim == 2 else ph["spacing_3d"])
    initial_counts = cfg["bleaching"]["initial_counts"]
    bleach_tau = cfg["bleaching"]["bleach_tau"]
    spcc_kwargs = dict(cfg["metrics"]["spectral_pcc"])
    dcr_kwargs = dict(cfg["metrics"]["dcr"])
    bl_kwargs = dict(cfg["metrics"]["bandlimited"])
    optics = dict(cfg["optics"])

    n_timepoints = len(sim.series)
    frames = [
        (f[f.shape[0] // 2] if ndim == 3 else f).astype(np.float32)
        for f in sim.series[: min(5, n_timepoints)]
    ]
    frozen_frcw = compute_frozen_frcw_weights(frames, spcc_kwargs)

    rows = []
    for t in range(n_timepoints):
        if (t + 1) % 25 == 0 or t == 0:
            log.info("  timepoint %d / %d (true SNR=%.1f)", t + 1, n_timepoints, sim.true_snr[t])
        gt = sim.series[t]
        pred = sim.prediction
        if ndim == 2:
            gt_f = gt.astype(np.float32)
            pred_f = pred.astype(np.float32)
            data_range = float(gt_f.max() - gt_f.min()) or 1.0
            m = {
                "PCC_2D": corr_coef(gt_f, pred_f),
                "PSNR_2D": psnr(gt_f, pred_f, data_range=data_range),
            }
            for k, v in compute_timepoint_metrics_2d(
                gt,
                pred,
                spacing,
                dcr_kwargs,
                spectral_pcc_kwargs=spcc_kwargs,
                bandlimited_kwargs=bl_kwargs,
                optics=optics,
                frozen_frcw_weights=frozen_frcw,
            ).items():
                m.setdefault(k, v)
            a0, r0 = compute_gt_reliability(gt, spacing, dcr_kwargs)
        else:
            m = compute_timepoint_metrics(
                gt,
                pred,
                spacing,
                dict(cfg["metrics"].get("fsc") or {}),
                dcr_kwargs,
                spectral_pcc_kwargs=spcc_kwargs,
            )
            mid_z = gt.shape[0] // 2
            a0, r0 = compute_gt_reliability(gt[mid_z], spacing[1:], dcr_kwargs)
        m["DCR_A0"] = a0
        m["DCR_r0"] = r0
        m["timepoint"] = t
        m["true_SNR"] = sim.true_snr[t]
        m["signal_level"] = initial_counts * np.exp(-t / bleach_tau)
        rows.append(m)

    df = pd.DataFrame(rows)
    if "DCR_A0" in df.columns:
        df["DCR_w"] = dcr_reliability_weights(df["DCR_A0"].values)
    cols = ["timepoint", "true_SNR", "signal_level"]
    df = df[cols + [c for c in df.columns if c not in cols]]
    df.to_csv(Path(output_dir) / "simulation_metrics.csv", index=False)
    return df


# ---------------------------------------------------------------------------
# Diagnostic plots
# ---------------------------------------------------------------------------
def plot_simulation_metrics(df: pd.DataFrame, output_path: Path, ndim=2, n_beads=30, bleach_tau=12.0, dpi=150):
    """Metric trends vs timepoint with drop/CV annotations
    (reference ``simulate_beads.py:966-1027``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    skip = ("timepoint", "true_SNR", "signal_level", "zero_frac", "DCR_r0")
    plot_cols = [c for c in df.columns if c not in skip and not c.startswith("EV_")]
    ncols = 3
    nrows = (len(plot_cols) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    axes = axes.flatten()
    t_vals = df["timepoint"].values
    for i, col in enumerate(plot_cols):
        ax = axes[i]
        vals = df[col].values.astype(float)
        ax.plot(t_vals, vals, marker="o", markersize=1.5, linewidth=1)
        mask = np.isfinite(vals)
        if mask.sum() > 1:
            slope, intercept = np.polyfit(t_vals[mask], vals[mask], 1)
            ax.plot(t_vals, slope * t_vals + intercept, "r--", linewidth=1)
            y0 = intercept + slope * t_vals[0]
            y_t = intercept + slope * t_vals[-1]
            drop = (y0 - y_t) / y0 * 100 if y0 > 0 else 0
            mean = np.mean(vals[mask])
            cv = np.std(vals[mask]) / mean * 100 if mean != 0 else 0
            ax.set_title(f"{col}\ndrop={drop:.1f}% CV={cv:.1f}%", fontsize=8)
        else:
            ax.set_title(col, fontsize=8)
        ax.set_xlabel("Timepoint")
        ax.grid(True, alpha=0.3)
    for ax in axes[len(plot_cols) :]:
        ax.set_visible(False)
    fig.suptitle(f"Simulated beads ({ndim}D, {n_beads} beads, tau={bleach_tau})", fontsize=12)
    fig.tight_layout(rect=[0, 0, 1, 0.96])
    fig.savefig(output_path, dpi=dpi)
    plt.close(fig)


def plot_raw_power_and_otf(clean: np.ndarray, spacing, output_path: Path, optics: dict) -> None:
    """Raw power spectrum + analytic OTF profile side by side
    (reference ``simulate_beads.py:913-963``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    clean_2d = (clean[clean.shape[0] // 2] if clean.ndim == 3 else clean).astype(np.float32)
    sp_2d = list(spacing)[-2:]
    radii, power = radial_power_spectrum(clean_2d, spacing=sp_2d)
    otf = widefield_otf_2d(clean_2d.shape, sp_2d, optics["wavelength_emission"], optics["numerical_aperture"])
    k = np.sqrt(
        np.add.outer(
            np.fft.fftfreq(clean_2d.shape[0], sp_2d[0]) ** 2, np.fft.fftfreq(clean_2d.shape[1], sp_2d[1]) ** 2
        )
    )
    order = np.argsort(k.ravel())
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5), sharex=True)
    ax1.semilogy(radii, np.maximum(power, 1e-30), "k-", linewidth=1.5)
    ax1.set_xlabel("Spatial frequency (cy/um)")
    ax1.set_ylabel("Power (a.u.)")
    ax1.set_title("Clean power spectrum (raw)")
    ax1.grid(True, alpha=0.3)
    ax2.plot(k.ravel()[order][:: max(1, k.size // 2000)], otf.ravel()[order][:: max(1, k.size // 2000)], "r.", ms=1)
    ax2.set_xlabel("Spatial frequency (cy/um)")
    ax2.set_ylabel("|OTF|")
    ax2.set_title(f"OTF (NA={optics['numerical_aperture']}, lambda={optics['wavelength_emission']} um)")
    ax2.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(output_path, dpi=150)
    plt.close(fig)


def plot_diagnostic_spectra(
    clean: np.ndarray,
    series: np.ndarray,
    spacing,
    true_snr: np.ndarray,
    output_path: Path,
    spectral_pcc_kwargs: dict | None = None,
    n_snapshots: int = 6,
    optics: dict | None = None,
) -> None:
    """Power spectra, filtered spectra, weighted spectra, weight curves,
    FRC curves and cumulative weight mass across the bleaching series —
    the metric-behavior diagnostic (reference ``simulate_beads.py:343-911``,
    row structure preserved, table-driven instead of hand-unrolled)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spcc = spectral_pcc_kwargs or {}
    bd = spcc.get("bin_delta", 1.0)
    tf = spcc.get("tail_fraction", 0.2)
    optics = optics or {"numerical_aperture": 1.35, "wavelength_emission": 0.698}
    sp_2d = list(spacing)[-2:]
    nyquist = 0.5 / sp_2d[0]

    def to_2d(img):
        return (img[img.shape[0] // 2] if img.ndim == 3 else img).astype(np.float32)

    t_indices = np.linspace(0, len(series) - 1, n_snapshots, dtype=int)
    panels = [("clean", to_2d(clean), None)] + [
        (f"t={t} SNR={true_snr[t]:.1f}", to_2d(series[t]), t) for t in t_indices
    ]

    clean_2d = panels[0][1]
    radii_c, power_c = radial_power_spectrum(clean_2d, spacing=sp_2d, bin_delta=bd)
    power_c_max = float(power_c.max()) or 1.0
    nf_c = estimate_noise_floor(radii_c, power_c, tf)

    weight_fns = {
        "Spectral_PCC": lambda r, p, nf: spectral_weights(r, p, nf),
        "SNR2_PCC": lambda r, p, nf: snr_adaptive_weights(r, p, nf, None, "snr_squared"),
        "LogSNR_PCC": lambda r, p, nf: snr_adaptive_weights(r, p, nf, None, "log_snr"),
    }
    rows = (
        ["image", "power", "DCR-filtered", "FRC-filtered"]
        + list(weight_fns)
        + ["weights", "FRC curve", "cumulative mass"]
    )
    n_rows, n_cols = len(rows), len(panels)
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(3 * n_cols, 3 * n_rows), squeeze=False)

    # Bin pixel counts for the shell-volume-corrected cumulative mass.
    from viscy_tpu.apps.dynacell.eval.spectral import _radial_bins

    _, bid = _radial_bins(clean_2d.shape, sp_2d, bd)
    n_pix = np.bincount(bid[bid >= 0].ravel(), minlength=len(radii_c))[: len(radii_c)]

    for col, (label, img, _t) in enumerate(panels):
        radii, power = radial_power_spectrum(img, spacing=sp_2d, bin_delta=bd)
        r_norm = radii / nyquist
        p_norm = np.maximum(power / power_c_max, 1e-30)
        nf = estimate_noise_floor(radii, power, tf)
        clean_norm = np.maximum(power_c / power_c_max, 1e-30)

        ax = axes[0, col]
        ax.imshow(img, cmap="gray")
        ax.set_title(label, fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])

        ax = axes[1, col]
        ax.semilogy(r_norm, p_norm, "C0-", lw=1, label="Power")
        if col > 0:
            ax.semilogy(radii_c / nyquist, clean_norm, "k--", lw=1, alpha=0.4, label="Clean")
        ax.set_ylim(1e-18, 2.0)

        for row, method in ((2, "dcr"), (3, "frc")):
            ax = axes[row, col]
            try:
                cut = estimate_cutoff(img, sp_2d, method=method)
                filt = apply_lowpass(img, cut, sp_2d)
                rf, pf = radial_power_spectrum(filt, spacing=sp_2d, bin_delta=bd)
                ax.semilogy(rf / nyquist, np.maximum(pf / power_c_max, 1e-30), "C2-", lw=1, label="Filtered")
                ax.semilogy(r_norm, p_norm, "C0--", lw=1, alpha=0.3)
                ax.axvline(cut / nyquist, color="k", ls=":", lw=1, alpha=0.6)
                ax.set_title(f"fc={cut / nyquist:.2f}", fontsize=8)
            except ValueError:
                ax.text(0.5, 0.5, "cutoff failed", transform=ax.transAxes, ha="center", color="red", fontsize=9)
            ax.set_ylim(1e-18, 2.0)

        for i, (wname, wfn) in enumerate(weight_fns.items()):
            ax = axes[4 + i, col]
            w = wfn(radii, power, nf)
            s = float(np.sum(w))
            w_sn = w / s if s > 0 else w
            ax.semilogy(r_norm, np.maximum(w_sn * p_norm, 1e-30), "C1-", lw=1, label="w*P")
            ax.semilogy(r_norm, p_norm, "C0--", lw=1, alpha=0.3)
            ax.set_ylim(1e-18, 2.0)
            if col == 0:
                ax.set_ylabel(wname)

        ax = axes[4 + len(weight_fns), col]
        for wname, wfn in weight_fns.items():
            w = wfn(radii, power, nf)
            ax.plot(r_norm, w / (w.max() + 1e-30), lw=1, label=wname)
        ax.set_ylim(-0.05, 1.05)
        if col == 0:
            ax.legend(fontsize=6)

        ax = axes[5 + len(weight_fns), col]
        frc = calculate_frc(img, bin_delta=bd)["correlation"]
        ax.plot(frc["frequency"], frc["correlation"], "C5-", lw=1)
        ax.axhline(1.0 / 7.0, color="r", ls="--", lw=0.8)
        ax.set_ylim(-0.1, 1.05)

        ax = axes[6 + len(weight_fns), col]
        for wname, wfn in weight_fns.items():
            w = wfn(radii, power, nf)
            mass = w * n_pix[: len(w)]
            s = mass.sum()
            ax.plot(r_norm[: len(mass)], np.cumsum(mass) / s if s > 0 else mass, lw=1, label=wname)
        w_frcw = frc_weights(img, bin_delta=bd)
        mass = w_frcw * n_pix[: len(w_frcw)]
        s = mass.sum()
        ax.plot(r_norm[: len(mass)], np.cumsum(mass) / s if s > 0 else mass, "C5-", lw=1, label="FRCW")
        ax.axhline(0.9, color="gray", ls=":", lw=0.8, alpha=0.5)
        ax.set_ylim(-0.05, 1.05)
        if col == 0:
            ax.legend(fontsize=6, loc="lower right")

    for row, name in enumerate(rows):
        axes[row, 0].set_ylabel(name, fontsize=9)
    fig.suptitle("Diagnostic: power spectra & metric weights vs bleaching", fontsize=12)
    fig.tight_layout(rect=[0, 0, 1, 0.97])
    fig.savefig(output_path, dpi=150)
    plt.close(fig)


def plot_pcc_comparison(
    df: pd.DataFrame,
    output_path: Path,
    dpi: int = 150,
    df_noshade: pd.DataFrame | None = None,
    series: np.ndarray | None = None,
    prediction: np.ndarray | None = None,
    spacing=None,
    nbins_low_sweep: list[int] | None = None,
    title: str | None = None,
    pcc_label: str | None = None,
    sweep_values: dict[int, np.ndarray] | None = None,
    figsize: tuple[float, float] | None = None,
) -> None:
    """PCC variants + nbins_low sweep: shows how low-k exclusion removes
    the shading plateau (reference ``simulate_beads.py:1030-1152``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = df["timepoint"].values
    fig, ax = plt.subplots(figsize=figsize or (6, 3.5))
    if df_noshade is not None:
        ax.plot(df_noshade["timepoint"], df_noshade["PCC_2D"], color="0.55", lw=1.5, label="PCC (no shading)")
        ax.plot(
            df_noshade["timepoint"],
            df_noshade["Spectral_PCC_2D"],
            color="0.35",
            lw=1.5,
            label="Spectral_PCC (no shading)",
        )
    ax.plot(t, df["PCC_2D"], color="0.55", lw=2.0, label=pcc_label or "PCC (shading)")

    if sweep_values is None and series is not None and prediction is not None and spacing is not None:
        if nbins_low_sweep is None:
            nbins_low_sweep = list(range(11))
        sweep_values = {
            nbl: np.array([spectral_pcc(prediction, series[ti], spacing=spacing, nbins_low=nbl) for ti in range(len(t))])
            for nbl in nbins_low_sweep
        }
    if sweep_values is not None:
        sweep_keys = sorted(sweep_values.keys()) if nbins_low_sweep is None else nbins_low_sweep
        cmap = plt.cm.plasma_r
        for i, nbl in enumerate(sweep_keys):
            color = cmap(0.15 + 0.75 * i / max(len(sweep_keys) - 1, 1))
            ax.plot(
                t,
                sweep_values[nbl],
                color=color,
                ls="-" if nbl == 0 else "--",
                lw=2.0 if nbl == 0 else 0.9,
                label="Spectral_PCC" if nbl == 0 else f"Spectral_PCC (nbins_low={nbl})",
            )
    elif "Spectral_PCC_2D" in df.columns:
        ax.plot(t, df["Spectral_PCC_2D"], color="0.25", lw=2.0, label="Spectral_PCC")

    ax.set_xlabel("Timepoint", fontsize=8)
    ax.set_ylabel("PCC", fontsize=8)
    ax.set_title(title or "Simulated beads — PCC variants", fontsize=9)
    ax.set_ylim(-0.05, 1.05)
    ax.legend(fontsize=6, loc="lower left", ncol=2)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(output_path, dpi=dpi)
    plt.close(fig)


def run_plots(cfg: dict, sim: SimulationData, df: pd.DataFrame, output_dir: Path) -> None:
    """Stage 3 (reference ``simulate_beads.py:1399-1445``)."""
    ph = cfg["phantom"]
    spacing = list(ph["spacing_2d"] if ph["ndim"] == 2 else ph["spacing_3d"])
    initial_counts = cfg["bleaching"]["initial_counts"]
    plot_simulation_metrics(
        df,
        output_dir / "simulation_metrics.png",
        ndim=ph["ndim"],
        n_beads=ph["n_beads"],
        bleach_tau=cfg["bleaching"]["bleach_tau"],
        dpi=cfg["plot"]["dpi"],
    )
    plot_raw_power_and_otf(sim.clean * initial_counts, spacing, output_dir / "raw_power_and_otf.png", cfg["optics"])
    plot_diagnostic_spectra(
        sim.clean * initial_counts,
        sim.series,
        spacing,
        sim.true_snr,
        output_dir / "diagnostic_spectra.png",
        spectral_pcc_kwargs=dict(cfg["metrics"]["spectral_pcc"]),
        n_snapshots=cfg["plot"]["n_snapshots"],
        optics=cfg["optics"],
    )
    noshade_path = Path(output_dir).parent / "output_simulation" / "simulation_metrics.csv"
    df_noshade = pd.read_csv(noshade_path) if noshade_path.exists() else None
    plot_pcc_comparison(
        df,
        output_dir / "pcc_comparison.png",
        dpi=cfg["plot"]["dpi"],
        df_noshade=df_noshade,
        series=sim.series,
        prediction=sim.prediction,
        spacing=spacing,
        nbins_low_sweep=list(range(6)),
    )


def main(cfg: dict | None = None) -> None:
    """Staged entry point (reference ``simulate_beads.py:1448-1489``)."""
    cfg = _merged_config(cfg)
    output_dir = Path(cfg["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)
    stage = cfg.get("stage", "all")

    sim = None
    if stage in ("all", "simulate"):
        sim = run_simulate(cfg)
        save_simulation(sim, output_dir)
        if stage == "simulate":
            return
    if sim is None:
        sim = load_simulation(output_dir)

    df = None
    if stage in ("all", "evaluate"):
        df = run_evaluate(cfg, sim, output_dir)
    if df is None:
        csv_path = output_dir / "simulation_metrics.csv"
        if not csv_path.exists():
            raise FileNotFoundError(f"No metrics CSV at {csv_path}. Run stage=all or stage=evaluate first.")
        df = pd.read_csv(csv_path)

    run_plots(cfg, sim, df, output_dir)
