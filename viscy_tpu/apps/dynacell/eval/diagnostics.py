"""Cross-position / cross-condition diagnostic figures for the spectral
metric suite.

Native rebuild of the reference's three diagnostic drivers
(``applications/dynacell/src/dynacell/evaluation/spectral_pcc/``):

- ``plot_combined.py`` — median +/- MAD metric trends across positions,
  3D/2D PCC-variant comparison, DCR-w weighted summary table;
- ``diagnostic_real.py`` — per-position PCC variants with DCR-A0 on a
  twin axis, DCR-A0/resolution trend, nbins_low / taper sweeps on real
  timelapse data;
- ``plot_shading_analysis.py`` — 2x2 figure showing how low-k exclusion
  (nbins_low) removes the illumination-shading plateau.

All functions consume the per-position ``metrics.csv`` files written by
:mod:`viscy_tpu.apps.dynacell.eval.spectral_eval` (or the bead-sim CSVs).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)

# Column order for combined plots (reference ``plot_combined.py:16-63``).
ALL_METRICS = [
    "PCC", "PSNR", "SSIM",
    "Spectral_PCC", "Spectral_PCC_OTF", "Spectral_PCC_Fixed",
    "Spectral_PCC_Wiener", "Spectral_PCC_SNR2", "Spectral_PCC_LogSNR",
    "Multiband_EV_NC", "Multiband_EV_PCC",
    "BL_PCC_DCR_XY", "BL_SSIM_DCR_XY", "BL_PCC_DCR_Z", "BL_SSIM_DCR_Z",
    "BL_PCC_FSC_XY", "BL_SSIM_FSC_XY", "BL_PCC_FSC_Z", "BL_SSIM_FSC_Z",
    "BL_PCC_OTF", "BL_SSIM_OTF",
    "FSC_XY", "FSC_Z", "FSC_GT_XY", "FSC_GT_Z",
    "DCR_XY", "DCR_Z", "DCR_A0", "DCR_r0",
    "PCC_2D", "PSNR_2D", "SSIM_2D",
    "Spectral_PCC_2D", "Spectral_PCC_Smooth_2D",
    "Spectral_PCC_FRCW_2D", "Spectral_PCC_FRCW_Frozen_2D",
    "Spectral_PCC_Fixed_2D", "Spectral_PCC_Wiener_2D",
    "Spectral_PCC_SNR2_2D", "Spectral_PCC_LogSNR_2D",
    "Multiband_EV_NC_2D", "Multiband_EV_PCC_2D",
    "DCR_2D", "BL_PCC_DCR_2D", "BL_SSIM_DCR_2D",
    "BL_PCC_OTF_2D", "BL_SSIM_OTF_2D", "zero_frac",
]  # fmt: skip


def load_positions(output_dir: Path) -> list[tuple[str, pd.DataFrame]]:
    """All per-position metric CSVs under ``output_dir`` (recursive)."""
    output_dir = Path(output_dir)
    positions = []
    for csv_path in sorted(output_dir.rglob("metrics.csv")):
        pos_name = str(csv_path.parent.relative_to(output_dir))
        positions.append((pos_name, pd.read_csv(csv_path)))
    return positions


def _median_mad(positions: list[tuple[str, pd.DataFrame]], col: str):
    """(timepoints, median, MAD) of one metric across positions."""
    series = [df.set_index("timepoint")[col] for _, df in positions if col in df.columns]
    if not series:
        return None
    combined = pd.concat(series, axis=1)
    t = combined.index.values
    med = combined.median(axis=1).values
    mad = combined.apply(lambda row: float(np.median(np.abs(row.dropna() - row.dropna().median()))), axis=1).values
    return t, med, mad


def plot_combined_metrics(output_dir: Path, title: str | None = None) -> Path:
    """Median +/- MAD trend of every available metric across positions
    (reference ``plot_combined.py:65-170``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_dir = Path(output_dir)
    positions = load_positions(output_dir)
    if not positions:
        raise FileNotFoundError(f"No metrics.csv files under {output_dir}")

    all_cols = set().union(*(df.columns for _, df in positions))
    metrics = [m for m in ALL_METRICS if m in all_cols]
    ncols = 3
    nrows = (len(metrics) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3.5 * nrows), squeeze=False)
    axes = axes.flatten()

    for i, name in enumerate(metrics):
        ax = axes[i]
        stats = _median_mad(positions, name)
        if stats is None:
            ax.set_title(name, fontsize=10, fontweight="bold")
            continue
        t, med, mad = stats
        ax.plot(t, med, color="C0", linewidth=1.5, label="median")
        ax.fill_between(t, med - mad, med + mad, alpha=0.25, color="C0", label="MAD")
        finite = np.isfinite(med)
        if finite.sum() > 1:
            slope, intercept = np.polyfit(t[finite], med[finite], 1)
            ax.plot(t, slope * t + intercept, color="red", linewidth=1, linestyle="--")
            y0, y_t = intercept, slope * t[-1] + intercept
            drop = (y0 - y_t) / y0 * 100 if y0 > 0 else 0
            cv = np.std(med[finite]) / np.mean(med[finite]) * 100 if np.mean(med[finite]) != 0 else 0
            ax.set_title(f"{name}\ndrop={drop:.1f}%  CV={cv:.1f}%", fontsize=10, fontweight="bold")
        else:
            ax.set_title(name, fontsize=10, fontweight="bold")
        ax.set_xlabel("Timepoint")
        ax.grid(True, alpha=0.3)
    for ax in axes[len(metrics) :]:
        ax.set_visible(False)
    fig.suptitle(title or f"median +/- MAD across {len(positions)} positions", fontsize=13, fontweight="bold")
    fig.tight_layout(rect=[0, 0, 1, 0.97])
    out_path = output_dir / "combined_metrics.png"
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


# Matched colors across the 3D/2D panels (same variant = same color;
# reference ``plot_combined.py:180-205``).
_COMPARE_3D = [
    ("PCC", "C3", "PCC"), ("BL_PCC_DCR_XY", "C0", "BL_PCC_DCR"),
    ("BL_PCC_FSC_XY", "C2", "BL_PCC_FSC"), ("BL_PCC_OTF", "C4", "BL_PCC_OTF"),
    ("Spectral_PCC", "C1", "Spectral_PCC"), ("Spectral_PCC_Fixed", "C5", "Spectral_PCC_Fixed"),
    ("Spectral_PCC_Wiener", "C6", "Spectral_PCC_Wiener"), ("Spectral_PCC_SNR2", "C7", "SNR^2"),
    ("Spectral_PCC_LogSNR", "C8", "LogSNR"), ("Multiband_EV_PCC", "tab:olive", "EV_PCC"),
]  # fmt: skip
_COMPARE_2D = [
    ("PCC_2D", "C3", "PCC"), ("BL_PCC_DCR_2D", "C0", "BL_PCC_DCR"),
    ("BL_PCC_OTF_2D", "C4", "BL_PCC_OTF"), ("Spectral_PCC_2D", "C1", "Spectral_PCC"),
    ("Spectral_PCC_Fixed_2D", "C5", "Spectral_PCC_Fixed"),
    ("Spectral_PCC_Wiener_2D", "C6", "Spectral_PCC_Wiener"),
    ("Spectral_PCC_SNR2_2D", "C7", "SNR^2"), ("Spectral_PCC_LogSNR_2D", "C8", "LogSNR"),
    ("Multiband_EV_PCC_2D", "tab:olive", "EV_PCC"),
]  # fmt: skip


def plot_pcc_variant_comparison(output_dir: Path, title: str | None = None) -> Path:
    """Median PCC variants, 3D vs 2D side by side
    (reference ``plot_combined.py:172-245``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_dir = Path(output_dir)
    positions = load_positions(output_dir)
    if not positions:
        raise FileNotFoundError(f"No metrics.csv files under {output_dir}")

    fig, (ax3d, ax2d) = plt.subplots(1, 2, figsize=(14, 5), sharey=True)
    for ax, variants, panel in ((ax3d, _COMPARE_3D, "3D (full volume)"), (ax2d, _COMPARE_2D, "2D (mid-Z slice)")):
        for col_name, color, label in variants:
            stats = _median_mad(positions, col_name)
            if stats is None:
                continue
            t, med, _ = stats
            ax.plot(t, med, color=color, linewidth=2, label=label)
        ax.set_xlabel("Timepoint", fontsize=12)
        ax.set_title(panel, fontsize=12, fontweight="bold")
        ax.legend(fontsize=10)
        ax.grid(True, alpha=0.3)
    ax3d.set_ylabel("PCC", fontsize=12)
    fig.suptitle(title or f"median across {len(positions)} positions", fontsize=13, fontweight="bold")
    fig.tight_layout(rect=[0, 0, 1, 0.95])
    out_path = output_dir / "pcc_comparison.png"
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def weighted_summary(
    output_dir: Path,
    summary_metrics: list[str] | None = None,
) -> pd.DataFrame:
    """DCR-w reliability-weighted stability summary: per-position drop%
    and CV% with and without reliability weights, median across positions
    (reference ``plot_combined.py:247-350``)."""
    positions = load_positions(Path(output_dir))
    if summary_metrics is None:
        summary_metrics = [
            "PCC", "Spectral_PCC", "Spectral_PCC_SNR2",
            "Spectral_PCC_LogSNR", "Multiband_EV_PCC", "BL_PCC_DCR_XY",
        ]  # fmt: skip
    rows = []
    for col in summary_metrics:
        drops_uw, drops_w, cvs_uw, cvs_w, scorables = [], [], [], [], []
        for _, df in positions:
            if col not in df.columns or "DCR_w" not in df.columns:
                continue
            t = df["timepoint"].values
            vals = df[col].values.astype(float)
            w = df["DCR_w"].values.astype(float)
            finite = np.isfinite(vals) & np.isfinite(w)
            if finite.sum() < 2:
                continue
            v, ww, tt = vals[finite], w[finite], t[finite]
            slope, intercept = np.polyfit(tt, v, 1)
            y0, y_t = intercept + slope * tt[0], intercept + slope * tt[-1]
            drops_uw.append((y0 - y_t) / y0 * 100 if y0 > 0 else 0)
            cvs_uw.append(np.std(v) / np.mean(v) * 100 if np.mean(v) != 0 else 0)
            if ww.sum() > 0:
                slope_w, intercept_w = np.polyfit(tt, v, 1, w=ww)
                y0w, y_tw = intercept_w + slope_w * tt[0], intercept_w + slope_w * tt[-1]
                drops_w.append((y0w - y_tw) / y0w * 100 if y0w > 0 else 0)
                mu_w = np.average(v, weights=ww)
                var_w = np.average((v - mu_w) ** 2, weights=ww)
                cvs_w.append(np.sqrt(var_w) / mu_w * 100 if mu_w != 0 else 0)
                scorables.append(float(np.mean(ww)))
            else:
                drops_w.append(np.nan)
                cvs_w.append(np.nan)
                scorables.append(0.0)
        if not drops_uw:
            continue
        rows.append(
            {
                "metric": col,
                "CV_pct": float(np.nanmedian(cvs_uw)),
                "drop_pct": float(np.nanmedian(drops_uw)),
                "CV_w_pct": float(np.nanmedian(cvs_w)),
                "drop_w_pct": float(np.nanmedian(drops_w)),
                "scorable_pct": float(np.nanmedian(scorables)) * 100,
            }
        )
    return pd.DataFrame(rows)


# -- real-data diagnostic (reference diagnostic_real.py) --------------------------
def plot_pcc_comparison_real(df: pd.DataFrame, output_path: Path, dpi: int = 150) -> None:
    """PCC variants + DCR A0 on a twin axis for one real position
    (reference ``diagnostic_real.py:28-72``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = df["timepoint"].values
    fig, ax = plt.subplots(figsize=(8, 5))
    for col, label, color in (
        ("PCC_2D", "PCC", "C3"),
        ("BL_PCC_DCR_2D", "BL_PCC_DCR", "C0"),
        ("Spectral_PCC_2D", "Spectral_PCC", "C1"),
        ("Spectral_PCC_FRCW_2D", "FRCW", "C5"),
        ("Spectral_PCC_FRCW_Frozen_2D", "FRCW_Frozen", "C2"),
    ):
        if col in df.columns:
            ax.plot(t, df[col], color=color, linewidth=1.5, label=label)
    ax.set_xlabel("Timepoint")
    ax.set_ylabel("PCC")
    ax.grid(True, alpha=0.3)
    lines1, labels1 = ax.get_legend_handles_labels()
    if "DCR_A0" in df.columns:
        ax2 = ax.twinx()
        ax2.plot(t, df["DCR_A0"], color="C7", linewidth=1.5, linestyle="--", label="DCR A0")
        ax2.set_ylabel("DCR A0", color="C7")
        ax2.tick_params(axis="y", labelcolor="C7")
        lines2, labels2 = ax2.get_legend_handles_labels()
        ax.legend(lines1 + lines2, labels1 + labels2, loc="upper right")
    else:
        ax.legend(loc="upper right")
    pos_name = df.attrs.get("position", "")
    ax.set_title(pos_name or "PCC variants vs DCR A0")
    fig.tight_layout()
    fig.savefig(output_path, dpi=dpi)
    plt.close(fig)


def plot_dcr_a0(df: pd.DataFrame, output_path: Path, dpi: int = 150) -> None:
    """DCR A0 + DCR resolution trend with drop/CV annotation
    (reference ``diagnostic_real.py:74-117``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = df["timepoint"].values
    fig, ax = plt.subplots(figsize=(8, 4))
    if "DCR_A0" in df.columns:
        ax.plot(t, df["DCR_A0"], "C0-", linewidth=1.5, label="DCR A0")
        vals = df["DCR_A0"].values.astype(float)
        mask = np.isfinite(vals)
        if mask.sum() > 1:
            slope, intercept = np.polyfit(t[mask], vals[mask], 1)
            y0, y_t = intercept + slope * t[0], intercept + slope * t[-1]
            drop = (y0 - y_t) / y0 * 100 if y0 > 0 else 0
            cv = np.std(vals[mask]) / np.mean(vals[mask]) * 100
            ax.set_title(f"DCR A0: drop={drop:.1f}% CV={cv:.1f}%")
    ax.set_xlabel("Timepoint")
    ax.set_ylabel("DCR A0")
    ax.grid(True, alpha=0.3)
    lines1, labels1 = ax.get_legend_handles_labels()
    if "DCR_2D" in df.columns:
        ax2 = ax.twinx()
        ax2.plot(t, df["DCR_2D"], "C3--", linewidth=1, alpha=0.7, label="DCR_2D")
        ax2.set_ylabel("DCR resolution", color="C3")
        ax2.tick_params(axis="y", labelcolor="C3")
        lines2, labels2 = ax2.get_legend_handles_labels()
        ax.legend(lines1 + lines2, labels1 + labels2, loc="upper right")
    else:
        ax.legend(loc="upper right")
    fig.tight_layout()
    fig.savefig(output_path, dpi=dpi)
    plt.close(fig)


def nbins_low_sweep(
    series: np.ndarray,
    prediction: np.ndarray,
    spacing,
    nbins_values: list[int],
    **spcc_kw,
) -> dict[int, np.ndarray]:
    """Spectral_PCC(t) per nbins_low value (low-k exclusion sweep;
    reference ``diagnostic_real.py`` sweep plumbing)."""
    from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc

    return {
        nbl: np.array([spectral_pcc(prediction, frame, spacing=spacing, nbins_low=nbl, **spcc_kw) for frame in series])
        for nbl in nbins_values
    }


def plot_taper_comparison(
    df: pd.DataFrame,
    nbins_sweep: dict[int, np.ndarray],
    taper_sweep: dict[int, np.ndarray],
    output_path: Path,
    dpi: int = 150,
    title: str | None = None,
) -> None:
    """Taper_low sweep with hard-cutoff baselines
    (reference ``diagnostic_real.py:119-181``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = df["timepoint"].values
    fig, ax = plt.subplots(figsize=(9, 5.5))
    ax.plot(t, df["PCC_2D"], color="0.55", ls="-", lw=2.0, label="PCC")
    for nbl, color, lw in ((0, "0.25", 2.0), (1, "C7", 1.5), (2, "C0", 2.0)):
        if nbl in nbins_sweep:
            ax.plot(t, nbins_sweep[nbl], color=color, ls="-", lw=lw, label=f"Spectral_PCC (nbins_low={nbl})")
    cmap = plt.cm.plasma_r
    taper_vals = sorted(taper_sweep.keys())
    for i, tl in enumerate(taper_vals):
        color = cmap(0.15 + 0.75 * i / max(len(taper_vals) - 1, 1))
        ax.plot(t, taper_sweep[tl], color=color, ls="--", lw=0.9, label=f"taper_low={tl}")
    ax.set_xlabel("Timepoint")
    ax.set_ylabel("PCC")
    ax.set_title(title or "Spectral PCC — taper_low sweep")
    ax.set_ylim(-0.05, 1.05)
    ax.legend(fontsize=7.5, loc="lower left", ncol=2)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(output_path, dpi=dpi)
    plt.close(fig)


def diagnostic_real(cfg: dict) -> pd.DataFrame:
    """Real-timelapse diagnostic: evaluate one position's 2D metric
    battery + DCR A0 per timepoint, then the PCC-variant and A0 figures
    (reference ``diagnostic_real.py:183-380``).

    Config keys: ``input_zarr``, ``pred_zarr`` (optional), ``channel`` /
    ``gt_channel`` / ``pred_channel``, ``position``, ``spacing``,
    ``output_dir``, plus the metric kwargs blocks (``dcr``,
    ``spectral_pcc``, ``bandlimited``, ``optics``).
    """
    from viscy_tpu.apps.dynacell.eval.spectral_eval import evaluate_position, resolve_spacing
    from viscy_tpu.zarr_io import open_ome_zarr

    output_dir = Path(cfg["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)
    input_store = open_ome_zarr(cfg["input_zarr"], mode="r")
    two_zarr = cfg.get("pred_zarr") is not None
    pred_store = open_ome_zarr(cfg["pred_zarr"], mode="r") if two_zarr else input_store

    pos_name = cfg["position"]
    pos_gt = input_store[pos_name]
    pos_pred = pred_store[pos_name] if two_zarr else pos_gt
    gt_channel = cfg.get("gt_channel") or cfg["channel"]
    pred_channel = cfg.get("pred_channel") or cfg["channel"]
    spacing = resolve_spacing(pos_gt, cfg)

    df = evaluate_position(
        pos_name,
        pos_gt,
        pos_pred,
        pos_gt.get_channel_index(gt_channel),
        pos_pred.get_channel_index(pred_channel),
        spacing,
        cfg,
    )
    df.attrs["position"] = pos_name
    safe = pos_name.replace("/", "_")
    df.to_csv(output_dir / f"diagnostic_{safe}.csv", index=False)
    plot_pcc_comparison_real(df, output_dir / f"pcc_comparison_{safe}.png")
    plot_dcr_a0(df, output_dir / f"dcr_a0_{safe}.png")
    return df


# -- shading analysis (reference plot_shading_analysis.py) -------------------------
def plot_shading_analysis(
    csvs: dict[str, Path | str],
    output_path: Path,
    title: str | None = None,
) -> Path:
    """2x2 shading-artifact figure from four simulation conditions
    (keys: ``noshade_nofix``, ``shade_nofix``, ``noshade_fix``,
    ``shade_fix``; reference ``plot_shading_analysis.py:42-161``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dfs = {}
    for name, path in csvs.items():
        path = Path(path)
        if not path.exists():
            raise FileNotFoundError(f"Missing {path}. Re-run simulations first.")
        dfs[name] = pd.read_csv(path)
    t = dfs["noshade_nofix"]["timepoint"].values

    c_noshade, c_nofix, c_fix = "#2176AE", "#D7263D", "#1B998B"
    lw = 1.8
    three_cond = [
        ("noshade_nofix", "No shading", c_noshade, "-"),
        ("shade_nofix", "Shading, nbins_low=0", c_nofix, "--"),
        ("shade_fix", "Shading, nbins_low=3", c_fix, "-"),
    ]

    fig, axes = plt.subplots(2, 2, figsize=(11, 8), constrained_layout=True)
    fig.suptitle(title or "Effect of illumination shading on metrics", fontsize=14, fontweight="bold")

    ax = axes[0, 0]
    ax.plot(t, dfs["noshade_nofix"]["PCC_2D"], color=c_noshade, ls="-", lw=lw, label="No shading")
    ax.plot(t, dfs["shade_fix"]["PCC_2D"], color=c_nofix, ls="--", lw=lw, label="With shading")
    ax.set_title("PCC (no frequency filtering)", fontsize=12)
    ax.set_ylim(-0.05, 1.05)

    ax = axes[0, 1]
    for dfkey, label, color, ls in three_cond:
        ax.plot(t, dfs[dfkey]["Spectral_PCC_2D"], color=color, ls=ls, lw=lw, label=label)
    ax.set_title("Spectral_PCC", fontsize=12)
    ax.set_ylim(-0.05, 1.05)

    ax = axes[1, 0]
    ax.plot(t, dfs["noshade_nofix"]["DCR_2D"], color=c_noshade, ls="-", lw=lw, label="No shading")
    ax.plot(t, dfs["shade_fix"]["DCR_2D"], color=c_nofix, ls="--", lw=lw, label="With shading")
    ax.set_title("DCR resolution", fontsize=12)
    ax.set_ylabel("Resolution (um)")

    ax = axes[1, 1]
    if "BL_PCC_DCR_2D" in dfs["noshade_nofix"].columns:
        for dfkey, label, color, ls in three_cond:
            ax.plot(t, dfs[dfkey]["BL_PCC_DCR_2D"], color=color, ls=ls, lw=lw, label=label)
        ax.set_title("BL_PCC (DCR cutoff)", fontsize=12)
        ax.set_ylim(-0.05, 1.05)
    else:
        ax.set_visible(False)

    for ax in axes.flatten():
        if ax.get_visible():
            ax.set_xlabel("Timepoint")
            ax.legend(fontsize=8, loc="lower left")
            ax.grid(True, alpha=0.3)

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return output_path
