"""Spectral-PCC diagnostic suite: DCR, FRC, band-limited metrics, the
per-position evaluation driver, the bead-phantom validation and the
cross-position diagnostics (reference
``applications/dynacell/src/dynacell/evaluation/spectral_pcc/``)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from scipy import ndimage


def _structured(shape, sigma, seed=0):
    rng = np.random.default_rng(seed)
    img = ndimage.gaussian_filter(rng.random(shape), sigma).astype(np.float32)
    return (img - img.min()) / (img.max() - img.min() + 1e-9)


# -- DCR ------------------------------------------------------------------------
class TestDCR:
    def test_resolution_ordering(self):
        """Sharper image -> finer (smaller) DCR resolution."""
        from viscy_tpu.apps.dynacell.eval.decorr import dcr_resolution

        rng = np.random.default_rng(1)
        sp = [0.25, 0.25]
        blur = rng.poisson(_structured((128, 128), 3.0, 1) * 1000).astype(np.float32)
        sharp = rng.poisson(_structured((128, 128), 0.8, 2) * 1000).astype(np.float32)
        r_blur = dcr_resolution(blur, sp, num_radii=60, num_highpass=6)
        r_sharp = dcr_resolution(sharp, sp, num_radii=60, num_highpass=6)
        assert r_sharp < r_blur

    def test_a0_tracks_snr(self):
        """Peak amplitude A0 of the unfiltered curve drops as SNR drops."""
        from viscy_tpu.apps.dynacell.eval.decorr import dcr_curve

        rng = np.random.default_rng(2)
        clean = _structured((96, 96), 2.0, 3)
        a0s = []
        for counts in (10000.0, 10.0):
            noisy = rng.poisson(clean * counts).astype(np.float32)
            _, _, _, peaks = dcr_curve(noisy, [0.25, 0.25], num_radii=50, num_highpass=4)
            a0s.append(peaks[0, 1])
        assert a0s[0] > a0s[1]

    def test_3d_returns_xy_z(self):
        from viscy_tpu.apps.dynacell.eval.decorr import dcr_resolution

        vol = _structured((8, 48, 48), (0.5, 1.5, 1.5), 4)
        res = dcr_resolution(vol, [2.0, 0.5, 0.5], num_radii=40, num_highpass=3)
        assert set(res) == {"xy", "z"}

    def test_pure_noise_no_peak(self):
        """White noise has a flat decorrelation curve: inf resolution or
        a near-Nyquist peak — never a confident low-frequency A0."""
        from viscy_tpu.apps.dynacell.eval.decorr import dcr_curve

        rng = np.random.default_rng(5)
        noise = rng.standard_normal((96, 96)).astype(np.float32)
        _, _, _, peaks = dcr_curve(noise, [0.25, 0.25], num_radii=50, num_highpass=4)
        # unfiltered white-noise curve: amplitude stays small
        assert peaks[0, 1] < 0.5


# -- FRC ------------------------------------------------------------------------
class TestFRC:
    def test_one_image_frc_shape_and_range(self):
        from viscy_tpu.apps.dynacell.eval.decorr import calculate_frc

        rng = np.random.default_rng(6)
        img = rng.poisson(_structured((128, 128), 2.0, 6) * 2000).astype(np.float32)
        result = calculate_frc(img)["correlation"]
        freq, corr = result["frequency"], result["correlation"]
        assert len(freq) == len(corr)
        # low-frequency bins correlate strongly, tail decorrelates
        assert corr[1] > 0.8
        assert abs(corr[-1]) < 0.5

    def test_frc_weights_clip(self):
        from viscy_tpu.apps.dynacell.eval.decorr import frc_weights

        rng = np.random.default_rng(7)
        img = rng.poisson(_structured((96, 96), 2.0, 7) * 500).astype(np.float32)
        w = frc_weights(img)
        assert (w >= 0).all() and (w <= 1).all()

    def test_frcw_self_is_one(self):
        from viscy_tpu.apps.dynacell.eval.decorr import spectral_pcc_frcw

        img = _structured((64, 64), 1.5, 8) * 100
        assert spectral_pcc_frcw(img, img, [0.5, 0.5]) == pytest.approx(1.0, abs=1e-5)

    def test_frozen_weights_protocol(self):
        from viscy_tpu.apps.dynacell.eval.decorr import spectral_pcc_frcw
        from viscy_tpu.apps.dynacell.eval.spectral_eval import compute_frozen_frcw_weights

        rng = np.random.default_rng(9)
        clean = _structured((64, 64), 1.5, 9)
        frames = [rng.poisson(clean * 2000).astype(np.float32) for _ in range(5)]
        frozen = compute_frozen_frcw_weights(frames, {"bin_delta": 1.0, "frcw_nbins_low": 2})
        assert frozen[:2].sum() == 0  # low-k excluded
        # monotone non-increasing from the excluded bins onward (the
        # reference zeroes AFTER enforcing monotonicity, so the global
        # curve jumps back up right at nbins_low)
        assert np.all(np.diff(frozen[2:]) <= 1e-6)
        v = spectral_pcc_frcw(frames[0], frames[1], [0.5, 0.5], frozen_weights=frozen)
        assert -1.0 <= v <= 1.0


# -- band-limited + cutoffs --------------------------------------------------------
class TestBandLimited:
    def test_otf_cutoff(self):
        from viscy_tpu.apps.dynacell.eval.decorr import otf_cutoff

        wf = otf_cutoff(1.35, 0.698)
        assert wf == pytest.approx(2 * 1.35 / 0.698)
        assert otf_cutoff(1.35, 0.698, modality="confocal") == pytest.approx(2 * wf)
        with pytest.raises(ValueError):
            otf_cutoff(1.0, 0.5, modality="bogus")

    def test_lowpass_removes_noise_sensitivity(self):
        """BL_PCC at a structure-scale cutoff rates a noisy-but-faithful
        prediction higher than raw PCC does."""
        from viscy_tpu.apps.dynacell.eval.decorr import band_limited_pcc
        from viscy_tpu.apps.dynacell.eval.spectral_eval import corr_coef

        rng = np.random.default_rng(10)
        gt = _structured((96, 96), 3.0, 10)
        pred = gt + 0.3 * rng.standard_normal(gt.shape).astype(np.float32)
        raw = corr_coef(gt, pred)
        bl = band_limited_pcc(pred, gt, [0.25, 0.25], cutoff=0.3)
        assert bl > raw

    def test_band_limited_ssim_self(self):
        from viscy_tpu.apps.dynacell.eval.decorr import band_limited_ssim

        img = _structured((64, 64), 2.0, 11)
        assert band_limited_ssim(img, img, [0.5, 0.5], cutoff=0.5) == pytest.approx(1.0, abs=1e-5)

    def test_estimate_cutoff_methods(self):
        from viscy_tpu.apps.dynacell.eval.decorr import estimate_cutoff

        rng = np.random.default_rng(12)
        img = rng.poisson(_structured((96, 96), 2.0, 12) * 2000).astype(np.float32)
        for method in ("dcr", "frc"):
            cut = estimate_cutoff(img, [0.25, 0.25], method=method)
            assert 0 < cut <= 2.0  # below Nyquist
        cut = estimate_cutoff(img, [0.25, 0.25], method="otf", numerical_aperture=1.35, wavelength_emission=0.698)
        assert cut == pytest.approx(2 * 1.35 / 0.698)

    def test_masked_psnr_and_ssim(self):
        from viscy_tpu.apps.dynacell.eval.decorr import psnr, ssim

        gt = _structured((64, 64), 2.0, 13)
        pred = gt.copy()
        pred[:8] = 9.0  # corrupt a stripe
        mask = np.ones_like(gt, bool)
        mask[:8] = False
        assert psnr(gt, pred, data_range=1.0, mask=mask) > psnr(gt, pred, data_range=1.0)
        assert ssim(gt, gt) == pytest.approx(1.0)


# -- sectioned / single-image FSC ---------------------------------------------------
class TestFSC:
    def test_3d_sectioned_keys(self):
        from viscy_tpu.apps.dynacell.eval.spectral import fsc_resolution

        rng = np.random.default_rng(14)
        vol = _structured((12, 48, 48), (0.5, 1.5, 1.5), 14)
        pred = vol + 0.2 * rng.standard_normal(vol.shape).astype(np.float32)
        f = fsc_resolution(vol, pred, [2.0, 0.5, 0.5])
        assert set(f) >= {"fsc", "xy", "z"}
        assert all(v > 0 for v in f.values())

    def test_single_image_mode(self):
        from viscy_tpu.apps.dynacell.eval.spectral import fsc_resolution

        rng = np.random.default_rng(15)
        clean = _structured((96, 96), 2.0, 15)
        high = rng.poisson(clean * 5000).astype(np.float32)
        low = rng.poisson(clean * 20).astype(np.float32)
        r_high = fsc_resolution(high, spacing=[0.25, 0.25])["fsc"]
        r_low = fsc_resolution(low, spacing=[0.25, 0.25])["fsc"]
        # more photons -> finer self-consistent resolution
        assert r_high <= r_low

    def test_taper_low_between_hard_cuts(self):
        from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc

        rng = np.random.default_rng(16)
        gt = _structured((64, 64), 2.0, 16)
        pred = gt + 0.1 * rng.standard_normal(gt.shape).astype(np.float32)
        v0 = spectral_pcc(pred, gt, [0.5, 0.5])
        v_taper = spectral_pcc(pred, gt, [0.5, 0.5], taper_low=4)
        v_hard = spectral_pcc(pred, gt, [0.5, 0.5], nbins_low=4)
        assert -1 <= v_taper <= 1
        assert v_taper != v0 or v_taper != v_hard  # the taper does something


# -- evaluation driver ---------------------------------------------------------------
@pytest.mark.slow
class TestSpectralEvalDriver:
    def test_compute_and_plot(self, tmp_path):
        from viscy_tpu.apps.dynacell.eval.spectral_eval import main as spectral_main
        from viscy_tpu.zarr_io.synthetic import build_hcs_plate

        plate = build_hcs_plate(
            tmp_path / "plate.zarr",
            ["Nuclei", "Phase"],
            zyx_shape=(6, 48, 48),
            num_timepoints=3,
            rows=("A",),
            cols=("1",),
            fovs=("0",),
        )
        cfg = {
            "input_zarr": str(plate),
            "pred_zarr": None,
            "channel": "Nuclei",
            "pred_channel": "Phase",
            "positions": None,
            "spacing": [2.0, 0.5, 0.5],
            "output_dir": str(tmp_path / "out"),
            "fsc": {},
            "dcr": {"num_radii": 40, "num_highpass": 3},
            "spectral_pcc": {"bin_delta": 1.0, "nbins_low": 1},
            "bandlimited": {"order": 2},
            "optics": {"numerical_aperture": 1.35, "wavelength_emission": 0.698},
            "mode": "all",
        }
        spectral_main(cfg)
        pos_dir = tmp_path / "out" / "A/1/0"
        df = pd.read_csv(pos_dir / "metrics.csv")
        assert len(df) == 3
        for col in (
            "PCC", "PSNR", "SSIM", "FSC_XY", "FSC_Z", "FSC_GT_XY", "DCR_XY", "DCR_Z",
            "Spectral_PCC", "Spectral_PCC_Fixed", "Spectral_PCC_Wiener", "Spectral_PCC_SNR2",
            "Spectral_PCC_LogSNR", "Multiband_EV_NC", "k90",
            "PCC_2D", "DCR_2D", "Spectral_PCC_FRCW_2D", "Spectral_PCC_Smooth_2D",
            "DCR_A0", "DCR_r0", "DCR_w", "zero_frac",
        ):  # fmt: skip
            assert col in df.columns, col
        assert (pos_dir / "slices.npz").exists()
        assert (pos_dir / "metrics.png").exists()

        # combined diagnostics over the driver output
        from viscy_tpu.apps.dynacell.eval.diagnostics import (
            plot_combined_metrics,
            plot_pcc_variant_comparison,
            weighted_summary,
        )

        assert plot_combined_metrics(tmp_path / "out").exists()
        assert plot_pcc_variant_comparison(tmp_path / "out").exists()
        summary = weighted_summary(tmp_path / "out")
        assert "drop_w_pct" in summary.columns


# -- bead simulation ------------------------------------------------------------------
@pytest.mark.slow
class TestBeadSimulation:
    def test_metric_validation_2d(self, tmp_path):
        """The point of the phantom: plain PCC degrades with bleaching while
        noise-aware spectral variants stay near 1."""
        from viscy_tpu.apps.dynacell.eval.simulate_beads import main as sim_main

        out = tmp_path / "sim"
        cfg = {
            "output_dir": str(out),
            "phantom": {"ndim": 2, "shape_2d": [96, 96], "n_beads": 12, "seed": 1},
            "bleaching": {"n_timepoints": 10, "bleach_tau": 1.0, "initial_counts": 10000.0},
            "metrics": {"dcr": {"num_radii": 40, "num_highpass": 3}},
            "plot": {"n_snapshots": 3},
        }
        sim_main(cfg)
        df = pd.read_csv(out / "simulation_metrics.csv")
        assert len(df) == 10
        # Validate in the moderate-SNR bleaching regime (true SNR >= 3):
        # plain PCC visibly decays while spectral weighting holds. (Below
        # SNR ~ 2 the weights correctly collapse with the noise floor and
        # the spectral metric drops *faster* — also the designed behavior.)
        mid = df[df["true_SNR"] >= 3.0]
        pcc_drop = mid["PCC_2D"].iloc[0] - mid["PCC_2D"].iloc[-1]
        spcc_drop = mid["Spectral_PCC_2D"].iloc[0] - mid["Spectral_PCC_2D"].iloc[-1]
        assert pcc_drop > 0.03  # plain PCC visibly decays with SNR
        assert spcc_drop < pcc_drop  # spectral weighting is more stable
        for f in ("simulation.npz", "simulation_metrics.png", "raw_power_and_otf.png",
                  "diagnostic_spectra.png", "pcc_comparison.png"):  # fmt: skip
            assert (out / f).exists(), f

    def test_otf_is_band_limited(self):
        """The analytic OTF kills everything beyond 2NA/lambda."""
        from viscy_tpu.apps.dynacell.eval.decorr import otf_cutoff
        from viscy_tpu.apps.dynacell.eval.simulate_beads import (
            apply_otf,
            generate_multi_bead_phantom,
        )
        from viscy_tpu.apps.dynacell.eval.spectral import radial_power_spectrum

        sp = [0.103, 0.103]
        phantom = generate_multi_bead_phantom((128, 128), sp, n_beads=10, seed=2)
        clean = apply_otf(phantom, sp, wavelength_emission=0.698, numerical_aperture=1.35)
        radii, power = radial_power_spectrum(clean, spacing=sp)
        cut = otf_cutoff(1.35, 0.698)
        in_band = power[radii < 0.8 * cut].mean()
        out_band = power[radii > 1.1 * cut]
        if out_band.size:
            assert out_band.max() < 1e-6 * in_band

    def test_3d_psf_normalized(self):
        from viscy_tpu.apps.dynacell.eval.simulate_beads import widefield_psf_3d

        psf = widefield_psf_3d((8, 32, 32), [0.25, 0.103, 0.103], 0.698, 1.35, 1.3)
        assert psf.shape == (8, 32, 32)
        assert psf.sum() == pytest.approx(1.0, rel=1e-5)
        # energy concentrates at focus (central z plane)
        assert psf[4].max() == psf.max()

    def test_shading_plateau_and_fix(self, tmp_path):
        """Additive shading floors plain PCC; nbins_low exclusion restores
        the spectral metric (the artifact the shading analysis documents)."""
        from viscy_tpu.apps.dynacell.eval.simulate_beads import run_simulate
        from viscy_tpu.apps.dynacell.eval.simulate_beads import _merged_config
        from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc
        from viscy_tpu.apps.dynacell.eval.spectral_eval import corr_coef

        cfg = _merged_config(
            {
                "phantom": {"ndim": 2, "shape_2d": [96, 96], "n_beads": 12, "seed": 3},
                "bleaching": {"n_timepoints": 6, "bleach_tau": 1.0},
                "shading": {"alpha": 0.0, "beta": 0.05, "sigma_um": 3.0},
            }
        )
        sim = run_simulate(cfg)
        # late frame: signal bleached away, background remains
        late = sim.series[-1]
        pcc_late = corr_coef(late, sim.prediction)
        spcc_late_fixed = spectral_pcc(sim.prediction, late, [0.103, 0.103], nbins_low=3)
        # shading keeps plain PCC artificially high (smooth background
        # correlates); low-k exclusion removes that plateau
        assert spcc_late_fixed < pcc_late

    def test_shading_analysis_figure(self, tmp_path):
        from viscy_tpu.apps.dynacell.eval.diagnostics import plot_shading_analysis

        rng = np.random.default_rng(17)
        t = np.arange(6)
        csvs = {}
        for name in ("noshade_nofix", "shade_nofix", "noshade_fix", "shade_fix"):
            df = pd.DataFrame(
                {
                    "timepoint": t,
                    "PCC_2D": rng.random(6),
                    "Spectral_PCC_2D": rng.random(6),
                    "DCR_2D": rng.random(6) + 0.5,
                    "BL_PCC_DCR_2D": rng.random(6),
                }
            )
            p = tmp_path / f"{name}.csv"
            df.to_csv(p, index=False)
            csvs[name] = p
        out = plot_shading_analysis(csvs, tmp_path / "shading.png")
        assert out.exists()


# -- CLI ------------------------------------------------------------------------------
class TestSpectralCLI:
    def test_subcommands_registered(self):
        from click.testing import CliRunner

        from viscy_tpu.apps.dynacell.__main__ import main

        result = CliRunner().invoke(main, ["--help"])
        assert result.exit_code == 0
        for cmd in ("spectral-eval", "simulate-beads", "spectral-diagnostic",
                    "spectral-plot-combined", "shading-analysis", "report"):  # fmt: skip
            assert cmd in result.output, cmd
