"""Tests for the dynacell evaluation framework rebuild
(viscy_tpu/apps/dynacell/eval/) — spectral, instance, feature, probe,
segmentation tiers on synthetic data."""

import numpy as np
import pytest


# -- spectral ------------------------------------------------------------------
class TestSpectral:
    def test_spectral_pcc_identical_images(self):
        from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc

        rng = np.random.default_rng(0)
        # structured image: smooth blobs (so low-freq power >> noise floor)
        from scipy import ndimage

        img = ndimage.gaussian_filter(rng.random((8, 48, 48)), 3.0)
        assert spectral_pcc(img, img, spacing=[2.0, 0.5, 0.5]) == pytest.approx(1.0, abs=1e-4)

    def test_spectral_pcc_discriminates_noise(self):
        from scipy import ndimage

        from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc

        rng = np.random.default_rng(1)
        gt = ndimage.gaussian_filter(rng.random((48, 48)), 3.0)
        good = gt + 0.01 * rng.standard_normal(gt.shape)
        bad = rng.random((48, 48))
        s_good = spectral_pcc(good, gt)
        s_bad = spectral_pcc(bad, gt)
        assert s_good > 0.9 > s_bad

    @pytest.mark.parametrize("weighting", ["subtract", "wiener", "snr_squared", "log_snr"])
    def test_weighting_modes(self, weighting):
        from scipy import ndimage

        from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc

        rng = np.random.default_rng(2)
        gt = ndimage.gaussian_filter(rng.random((32, 32)), 2.0)
        val = spectral_pcc(gt + 0.01 * rng.standard_normal(gt.shape), gt, weighting=weighting)
        assert 0.5 < val <= 1.0

    def test_noise_floor_frozen(self):
        from scipy import ndimage

        from viscy_tpu.apps.dynacell.eval.spectral import (
            estimate_gt_noise_floor,
            spectral_pcc,
        )

        rng = np.random.default_rng(3)
        gt = ndimage.gaussian_filter(rng.random((32, 32)), 2.0) + 0.05 * rng.standard_normal((32, 32))
        nf = estimate_gt_noise_floor(gt)
        assert nf > 0
        v = spectral_pcc(gt, gt, noise_floor=nf)
        assert 0.9 < v <= 1.0

    def test_multiband_ev_perfect_vs_noise(self):
        from scipy import ndimage

        from viscy_tpu.apps.dynacell.eval.spectral import multiband_ev_score

        rng = np.random.default_rng(4)
        gt = ndimage.gaussian_filter(rng.random((64, 64)), 2.0)
        s_perfect, details = multiband_ev_score(gt, gt, spacing=[0.5, 0.5])
        s_noise, _ = multiband_ev_score(rng.random((64, 64)), gt, spacing=[0.5, 0.5])
        assert s_perfect > 0.95
        assert s_noise < s_perfect
        assert "EV_total" in details and details["EV_total"] > 0

    def test_fsc_resolution_degrades_with_blur(self):
        from scipy import ndimage

        from viscy_tpu.apps.dynacell.eval.spectral import fsc_resolution

        rng = np.random.default_rng(5)
        gt = rng.random((64, 64))
        sharp = gt + 0.05 * rng.standard_normal(gt.shape)
        blurred = ndimage.gaussian_filter(gt, 3.0) + 0.05 * rng.standard_normal(gt.shape)
        r_sharp = fsc_resolution(gt, sharp, spacing=[0.5, 0.5])["fsc"]
        r_blur = fsc_resolution(gt, blurred, spacing=[0.5, 0.5])["fsc"]
        # blurred prediction loses high-frequency agreement -> coarser resolution
        assert r_blur > r_sharp

    def test_radial_power_spectrum_parseval_ish(self):
        from viscy_tpu.apps.dynacell.eval.spectral import radial_power_spectrum

        rng = np.random.default_rng(6)
        img = rng.random((32, 32))
        radii, power = radial_power_spectrum(img)
        assert len(radii) == len(power)
        assert (power >= 0).all()


# -- pixel/mask metrics --------------------------------------------------------
class TestPixelMask:
    def test_compute_pixel_metrics_schema(self):
        from viscy_tpu.apps.dynacell.eval.metrics import compute_pixel_metrics

        rng = np.random.default_rng(0)
        t = rng.random((6, 32, 32)).astype(np.float32)
        p = t + 0.01 * rng.standard_normal(t.shape).astype(np.float32)
        m = compute_pixel_metrics(p, t, spacing=[2.0, 0.5, 0.5], spectral_pcc_kwargs={}, fsc_kwargs={})
        for k in ("PCC", "SSIM", "NRMSE", "PSNR", "Spectral_PCC", "FSC_FSC_Resolution"):
            assert k in m, k
        assert m["PCC"] > 0.99
        assert m["SSIM"] > 0.9

    def test_evaluate_segmentations_exact(self):
        from viscy_tpu.apps.dynacell.eval.metrics import evaluate_segmentations

        gt = np.zeros((4, 4), bool)
        gt[:2] = True
        m = evaluate_segmentations(gt, gt)
        assert m["Dice"] == 1.0 and m["IoU"] == 1.0
        m2 = evaluate_segmentations(~gt, gt)
        assert m2["Dice"] == 0.0 and m2["TP"] == 0.0

    def test_cp_regionprops_shapes_and_glcm(self):
        from viscy_tpu.apps.dynacell.eval.metrics import active_cp_feature_names, cp_regionprops

        rng = np.random.default_rng(1)
        img = rng.random((1, 40, 40))
        labels = np.zeros((1, 40, 40), np.int32)
        labels[0, 2:18, 2:18] = 1
        labels[0, 22:38, 22:38] = 2
        feats = cp_regionprops(img, labels)
        assert feats.shape == (2, len(active_cp_feature_names(False)))
        assert np.isfinite(feats).all()
        feats_g = cp_regionprops(img, labels, glcm_cfg={"enabled": True, "levels": 16})
        assert feats_g.shape == (2, len(active_cp_feature_names(True)))

    def test_cp_regionprops_empty(self):
        from viscy_tpu.apps.dynacell.eval.metrics import cp_regionprops

        out = cp_regionprops(np.zeros((1, 8, 8)), np.zeros((1, 8, 8), np.int32))
        assert out.shape[0] == 0

    def test_per_cell_similarity(self):
        from viscy_tpu.apps.dynacell.eval.metrics import per_cell_similarity

        rng = np.random.default_rng(2)
        t = rng.random((4, 24, 24))
        labels = np.zeros((4, 24, 24), np.int32)
        labels[:, 2:12, 2:12] = 1
        labels[:, 14:22, 14:22] = 2
        out = per_cell_similarity(t, t, labels, metrics=("pcc", "ssim"))
        assert out["PerCell_PCC_mean"] == pytest.approx(1.0, abs=1e-6)
        assert out["PerCell_SSIM_mean"] == pytest.approx(1.0, abs=1e-3)
        with pytest.raises(ValueError):
            per_cell_similarity(t, t, labels, metrics=("bogus",))

    def test_build_crops_and_features(self):
        from viscy_tpu.apps.dynacell.eval.metrics import build_crops, features_from_crops

        rng = np.random.default_rng(3)
        img = rng.random((4, 32, 32))
        labels = np.zeros((4, 32, 32), np.int32)
        labels[:, 1:10, 1:10] = 1
        labels[:, 20:30, 20:30] = 2
        crops = build_crops(img, labels, patch_size=16)
        assert len(crops) == 2 and all(c.shape == (16, 16) for c in crops)

        class RandomProjExtractor:
            def extract_features_batch(self, crops):
                x = np.stack([c.ravel() for c in crops])
                rngp = np.random.default_rng(0)
                w = rngp.standard_normal((x.shape[1], 8))
                return x @ w

        feats = features_from_crops(crops, RandomProjExtractor())
        assert feats.shape == (2, 8)


# -- instance metrics ----------------------------------------------------------
class TestInstance:
    def test_perfect_match(self):
        from viscy_tpu.apps.dynacell.eval.instance_metrics import instance_average_precision

        labels = np.zeros((32, 32), np.int32)
        labels[2:10, 2:10] = 1
        labels[20:30, 20:30] = 2
        out = instance_average_precision(labels, labels)
        assert out["mAP"] == 1.0
        assert out["instance_dice"] == pytest.approx(1.0)
        assert out["n_gt"] == out["n_pred"] == 2
        assert out["instance_TP@0.50"] == 2.0

    def test_half_match(self):
        from viscy_tpu.apps.dynacell.eval.instance_metrics import instance_average_precision

        gt = np.zeros((32, 32), np.int32)
        gt[2:10, 2:10] = 1
        gt[20:30, 20:30] = 2
        pred = np.zeros_like(gt)
        pred[2:10, 2:10] = 7  # arbitrary id, same footprint
        out = instance_average_precision(pred, gt)
        assert out["AP_0.50"] == pytest.approx(1 / 2)  # TP=1 / (2 + 1 - 1)
        assert out["instance_FN@0.50"] == 1.0

    def test_empty_cases(self):
        from viscy_tpu.apps.dynacell.eval.instance_metrics import instance_average_precision

        z = np.zeros((8, 8), np.int32)
        both = instance_average_precision(z, z)
        assert np.isnan(both["mAP"])
        one = np.zeros((8, 8), np.int32)
        one[2:6, 2:6] = 1
        half = instance_average_precision(one, z)
        assert half["mAP"] == 0.0


# -- feature metrics -----------------------------------------------------------
class TestFeatureMetrics:
    def test_fid_zero_for_identical(self):
        from viscy_tpu.apps.dynacell.eval.feature_metrics import frechet_distance

        rng = np.random.default_rng(0)
        x = rng.standard_normal((200, 8))
        assert frechet_distance(x, x) == pytest.approx(0.0, abs=1e-6)
        y = x + 5.0
        assert frechet_distance(x, y) == pytest.approx(8 * 25.0, rel=0.01)

    def test_kid_orders_shifted_cohorts(self):
        from viscy_tpu.apps.dynacell.eval.feature_metrics import kid_metric

        rng = np.random.default_rng(1)
        x = rng.standard_normal((100, 4))
        same, _ = kid_metric(x, rng.standard_normal((100, 4)), kid_subsets=10, kid_subset_size=50)
        far, _ = kid_metric(x, rng.standard_normal((100, 4)) + 3.0, kid_subsets=10, kid_subset_size=50)
        assert far > same

    def test_prc_perfect_overlap(self):
        from viscy_tpu.apps.dynacell.eval.feature_metrics import precision_recall_f1

        rng = np.random.default_rng(2)
        x = rng.standard_normal((100, 4))
        p, r, f1 = precision_recall_f1(x, x.copy())
        assert p == 1.0 and r == 1.0 and f1 == 1.0
        p2, r2, _ = precision_recall_f1(x + 100.0, x)
        assert p2 == 0.0 and r2 == 0.0

    def test_full_similarity_schema(self):
        from viscy_tpu.apps.dynacell.eval.feature_metrics import compute_feature_similarity

        rng = np.random.default_rng(3)
        pred = rng.standard_normal((60, 6))
        target = rng.standard_normal((60, 6))
        out = compute_feature_similarity(
            pred, target, "CP", kid_subsets=5, kid_subset_size=30, prc_bootstrap_subsets=5
        )
        for key in ("CP_FID", "CP_KID", "CP_Precision", "CP_Recall", "CP_F1", "CP_MIND", "CP_Median_Cosine_Similarity"):
            assert key in out
        empty = compute_feature_similarity(np.empty((0, 6)), target, "CP")
        assert np.isnan(empty["CP_FID"])

    def test_mind_monotone(self):
        from viscy_tpu.apps.dynacell.eval.feature_metrics import mind_metric

        rng = np.random.default_rng(4)
        x = rng.standard_normal((100, 4))
        near = mind_metric(x, x + 0.01, num_projections=64)
        far = mind_metric(x, x + 2.0, num_projections=64)
        assert far > near


# -- feature select + probe ----------------------------------------------------
class TestSelectProbe:
    def test_select_features_drops_constant_and_correlated(self):
        from viscy_tpu.apps.dynacell.eval.feature_select import select_features

        rng = np.random.default_rng(0)
        base = rng.standard_normal(200)
        gt = np.stack([base[:100], base[:100] * 2 + 1e-9 * rng.standard_normal(100), np.ones(100), rng.standard_normal(100)], axis=1)
        pred = np.stack([base[100:], base[100:] * 2, np.ones(100), rng.standard_normal(100)], axis=1)
        g2, p2, keep = select_features(gt, pred)
        assert not keep[2]  # constant dropped
        assert keep.sum() <= 3  # one of the correlated pair dropped
        assert g2.shape[1] == keep.sum()

    def test_fov_stratified_auroc_separable(self):
        from viscy_tpu.apps.dynacell.eval.linear_probe import fov_stratified_auroc, indistinguishability

        rng = np.random.default_rng(1)
        x0 = rng.standard_normal((100, 4))
        x1 = rng.standard_normal((100, 4)) + 4.0
        X = np.vstack([x0, x1])
        y = np.r_[np.zeros(100), np.ones(100)]
        fov = np.tile(np.arange(10), 20)
        out = fov_stratified_auroc(X, y, fov)
        assert out["auroc_mean"] > 0.95
        assert indistinguishability(out["auroc_mean"]) < 0.1
        assert indistinguishability(0.5) == 1.0

    def test_paired_auroc_indistinguishable(self):
        from viscy_tpu.apps.dynacell.eval.linear_probe import paired_auroc

        rng = np.random.default_rng(2)
        x = rng.standard_normal((120, 4))
        fov = np.repeat(np.arange(6), 20)
        out = paired_auroc(x, rng.standard_normal((120, 4)), fov, fov)
        assert 0.3 < out["auroc_mean"] < 0.7
        empty = paired_auroc(np.empty((0, 4)), x, fov[:0], fov)
        assert empty["n_folds"] == 0


# -- segmentation --------------------------------------------------------------
def _blob_image(shape=(40, 40), centers=((10, 10), (28, 28)), radius=6, rng=None):
    rng = rng or np.random.default_rng(0)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    img = np.zeros(shape, np.float32)
    for cy, cx in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * (radius / 2) ** 2))
    return img + 0.02 * rng.standard_normal(shape).astype(np.float32)


class TestSegmentation:
    def test_native_nucleus_semantic(self):
        from viscy_tpu.apps.dynacell.eval.segmentation import segment

        img = _blob_image()[None]  # (1, H, W)
        mask = segment(img, "nucleus")
        assert mask.dtype == bool and mask.any()
        assert mask[0, 10, 10] and mask[0, 28, 28]
        assert not mask[0, 0, 0]

    def test_nucleus_instances_split_blobs(self):
        from viscy_tpu.apps.dynacell.eval.segmentation import segment_nucleus_instances

        img = _blob_image()[None]
        labels = segment_nucleus_instances(img, min_distance=4)
        ids = np.unique(labels)
        assert len(ids[ids > 0]) == 2
        assert labels[0, 10, 10] != labels[0, 28, 28]

    def test_unknown_target_raises(self):
        from viscy_tpu.apps.dynacell.eval.segmentation import segment

        with pytest.raises(ValueError):
            segment(np.zeros((1, 8, 8)), "golgi")

    def test_cellpose_gated(self):
        from viscy_tpu.apps.dynacell.eval.segmentation import load_cellpose_model

        with pytest.raises(ImportError, match="cellpose"):
            load_cellpose_model()

    def test_whole_cell_carves_nucleus(self):
        from viscy_tpu.apps.dynacell.eval.segmentation_whole_cell import segment_whole_cell

        rng = np.random.default_rng(0)
        h = w = 48
        nuc = _blob_image((h, w), centers=((14, 14), (34, 34)), radius=5, rng=rng)
        yy, xx = np.mgrid[:h, :w]
        # membrane: bright rings around each nucleus
        memb = np.zeros((h, w), np.float32)
        for cy, cx in ((14, 14), (34, 34)):
            r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            memb += np.exp(-((r - 10) ** 2) / 4.0)
        seeds = np.zeros((h, w), np.int32)
        seeds[12:17, 12:17] = 1
        seeds[32:37, 32:37] = 2
        cells = segment_whole_cell(memb, nuc, seeds, spacing_zyx=(1.0, 0.5, 0.5), min_cell_um=2.0)
        ids = np.unique(cells)
        assert len(ids[ids > 0]) >= 1
        # nucleus footprint carved out
        assert (cells[seeds > 0] == 0).all()

    def test_multi_otsu_orders(self):
        from viscy_tpu.apps.dynacell.eval.segmentation import multi_otsu_thresholds

        rng = np.random.default_rng(1)
        vals = np.concatenate([rng.normal(0, 0.1, 500), rng.normal(1, 0.1, 500), rng.normal(2, 0.1, 500)])
        lo, hi = multi_otsu_thresholds(vals)
        assert 0.2 < lo < 0.8 < 1.2 < hi < 1.8


# -- pipeline integration ------------------------------------------------------
class TestPipeline:
    @pytest.fixture()
    def plates(self, tmp_path):
        """Pred + GT plates with blob-like 'nuclei' (pred = noisy GT)."""
        from viscy_tpu.zarr_io.store import open_ome_zarr

        rng = np.random.default_rng(0)
        shape = (2, 1, 2, 48, 48)  # (T, C, Z, Y, X)
        paths = {}
        blobs = np.zeros((48, 48), np.float32)
        yy, xx = np.mgrid[:48, :48]
        for cy, cx in ((12, 12), (34, 34), (12, 36)):
            blobs += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
        for side in ("gt", "pred"):
            path = tmp_path / f"{side}.zarr"
            plate = open_ome_zarr(path, layout="hcs", mode="w-", channel_names=["Nuclei"])
            for fov in ("0", "1"):
                pos = plate.create_position("A", "1", fov)
                data = np.broadcast_to(blobs, shape).astype(np.float32).copy()
                noise = 0.02 if side == "gt" else 0.08
                data += noise * rng.standard_normal(shape).astype(np.float32)
                pos.create_image("0", data)
            paths[side] = path
        return paths

    def _config(self, plates, tmp_path, **overrides):
        cfg = {
            "io": {
                "pred_path": str(plates["pred"]),
                "gt_path": str(plates["gt"]),
                "pred_channel_name": "Nuclei",
                "gt_channel_name": "Nuclei",
                "gt_cache_dir": str(tmp_path / "cache_gt"),
                "pred_cache_dir": str(tmp_path / "cache_pred"),
            },
            "target_name": "nucleus",
            "spacing": [2.0, 0.5, 0.5],
            "compute_feature_metrics": True,
            "compute_instance_ap": True,
            "cell_similarity": {"metrics": ["pcc"], "reduce": ["mean", "median"]},
            "pixel_metrics": {"spectral_pcc": {}, "fsc": {}, "multiband_ev": True},
            "feature_metrics": {
                "patch_size": 16,
                "cp": {"glcm": {"enabled": False}},
                "dinov3": {"type": "random_projection", "dim": 8},
                "dynaclr": {"type": "random_projection", "dim": 8, "seed": 7},
            },
            "save": {"save_dir": str(tmp_path / "eval_out")},
            "runtime": {"executor": "serial"},
        }
        cfg.update(overrides)
        return cfg

    def test_three_tiers_end_to_end(self, plates, tmp_path):
        from viscy_tpu.apps.dynacell.eval.pipeline import evaluate_model

        cfg = self._config(plates, tmp_path)
        pixel, mask, feature = evaluate_model(cfg)
        assert len(pixel) == 4  # 2 FOVs x 2 t
        assert len(mask) == 4
        assert len(feature) == 4
        row = pixel[0]
        for k in ("PCC", "SSIM", "Spectral_PCC", "Multiband_EV_NC", "PerCell_PCC_mean"):
            assert k in row, k
        assert row["PCC"] > 0.8
        mrow = mask[0]
        assert mrow["Dice"] > 0.5
        assert "mAP" in mrow and "instance_dice" in mrow
        frow = feature[0]
        assert "CP_FID" in frow
        assert "Dataset_CP_FID" in frow
        assert "Dataset_DINOv3_Indistinguishability" in frow
        # artifacts on disk
        out = tmp_path / "eval_out"
        assert (out / "pixel_metrics.csv").exists()
        assert (out / "cp_selected_feature_mask.json").exists()
        assert (out / "embeddings" / "gt_cp_single_cell_embeddings.npz").exists()
        assert (out / "timings.csv").exists()

    def test_cache_hit_and_invalidation(self, plates, tmp_path):
        from viscy_tpu.apps.dynacell.eval.cache import StaleCacheError, cache_paths, load_manifest
        from viscy_tpu.apps.dynacell.eval.pipeline import evaluate_predictions

        cfg = self._config(plates, tmp_path)
        evaluate_predictions(cfg)
        paths = cache_paths(tmp_path / "cache_gt")
        manifest = load_manifest(paths)
        assert manifest["gt"]["plate_path"] == str(plates["gt"])
        assert "masks_gt" in manifest["artifacts"]
        n_mask_files = len(list((paths.masks_dir).rglob("*.npy")))
        assert n_mask_files == 2  # one per FOV
        # second run: cached masks are reused (mtimes unchanged)
        mtimes = {p: p.stat().st_mtime_ns for p in paths.masks_dir.rglob("*.npy")}
        evaluate_predictions(cfg)
        for p, m in mtimes.items():
            assert p.stat().st_mtime_ns == m
        # identity mismatch raises StaleCacheError
        bad = self._config(plates, tmp_path)
        bad["io"]["gt_channel_name"] = "Nuclei"
        bad["io"]["gt_path"] = str(plates["pred"])
        with pytest.raises(StaleCacheError):
            evaluate_predictions(bad)

    def test_final_metrics_cache(self, plates, tmp_path):
        from viscy_tpu.apps.dynacell.eval.pipeline import (
            _final_metrics_cache_valid,
            evaluate_model,
        )

        cfg = self._config(plates, tmp_path)
        assert not _final_metrics_cache_valid(cfg)
        evaluate_model(cfg)
        assert _final_metrics_cache_valid(cfg)
        cfg["force_recompute"] = {"final_metrics": True}
        assert not _final_metrics_cache_valid(cfg)

    def test_grouped_with_cross_condition_probe(self, plates, tmp_path):
        from viscy_tpu.apps.dynacell.eval.cross_condition import GROUP_PROBE_FILENAME
        from viscy_tpu.apps.dynacell.eval.pipeline import evaluate_predictions_grouped

        cfg = self._config(plates, tmp_path)
        cfg["conditions"] = {"mock": {}, "denv": {}}
        results = evaluate_predictions_grouped(cfg)
        assert {name for name, _ in results} == {"mock", "denv"}
        probe_csv = tmp_path / "eval_out" / "eval_denv" / GROUP_PROBE_FILENAME
        assert probe_csv.exists()
        import pandas as pd

        df = pd.read_csv(probe_csv)
        assert set(df["source"]) == {"pred", "gt"}
        cp_rows = df[(df.feature_type == "cp") & (df.source == "gt")]
        assert len(cp_rows) == 1


class TestTablesAndCLI:
    def test_comparison_table_and_renderers(self, tmp_path):
        import pandas as pd

        from viscy_tpu.apps.dynacell.eval.tables import comparison_table, to_latex, to_markdown

        for model, pcc in (("A", 0.9), ("B", 0.7)):
            d = tmp_path / model
            d.mkdir()
            pd.DataFrame(
                [{"FOV": "A/1/0", "Timepoint": 0, "PCC": pcc, "SSIM": pcc - 0.1},
                 {"FOV": "A/1/0", "Timepoint": 1, "PCC": pcc + 0.02, "SSIM": pcc - 0.08}]
            ).to_csv(d / "pixel_metrics.csv", index=False)
            pd.DataFrame(
                [{"FOV": "A/1/0", "Timepoint": 0, "Dice": pcc},
                 {"FOV": "A/1/0", "Timepoint": 1, "Dice": pcc}]
            ).to_csv(d / "mask_metrics.csv", index=False)
        table = comparison_table({"A": tmp_path / "A", "B": tmp_path / "B"})
        assert "PCC" in table.columns and "Dice" in table.columns
        md = to_markdown(table)
        assert "**" in md  # best bolded
        tex = to_latex(table, caption="cap", label="tab:x")
        assert "\\textbf" in tex and "\\caption{cap}" in tex

    def test_cli_help_lists_eval_subcommands(self):
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, "-m", "viscy_tpu.apps.dynacell", "--help"],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert out.returncode == 0
        for sub in ("evaluate", "evaluate-grouped", "cross-condition-probe", "report", "fit"):
            assert sub in out.stdout


class TestPrecomputeGT:
    plates = TestPipeline.plates  # reuse the fixture, not the tests
    _config = TestPipeline._config

    def test_precompute_fills_cache_then_evaluate_hits_it(self, plates, tmp_path):
        from viscy_tpu.apps.dynacell.eval.pipeline import (
            evaluate_model,
            precompute_gt_artifacts,
        )

        cfg = self._config(plates, tmp_path)
        cfg["build"] = {
            "masks": True,
            "instances": True,
            "cp_features": True,
            "deep_features": True,
        }
        counts = precompute_gt_artifacts(cfg)
        assert counts["masks"] == 2  # two FOVs
        assert counts["instances"] == 2
        assert counts["cp_features"] == 4  # 2 FOVs x 2 t
        assert counts["deep_features"] == 8  # x 2 extractors
        cache_dir = tmp_path / "cache_gt"
        gt_artifacts = list(cache_dir.rglob("*.np*"))
        assert gt_artifacts, "cache should hold GT artifacts"
        mtimes = {p: p.stat().st_mtime_ns for p in gt_artifacts}

        # evaluation reuses every precomputed GT artifact (no rewrites)
        pixel, mask, feature = evaluate_model(cfg)
        assert len(pixel) == 4
        for p, old in mtimes.items():
            assert p.stat().st_mtime_ns == old, f"{p} was recomputed"

    def test_precompute_requires_cache_dir(self, plates, tmp_path):
        from viscy_tpu.apps.dynacell.eval.pipeline import precompute_gt_artifacts

        cfg = self._config(plates, tmp_path)
        cfg["io"].pop("gt_cache_dir")
        with pytest.raises(ValueError, match="gt_cache_dir"):
            precompute_gt_artifacts(cfg)

    def test_precompute_cli(self, plates, tmp_path):
        import yaml
        from click.testing import CliRunner

        from viscy_tpu.apps.dynacell.__main__ import main

        cfg = self._config(plates, tmp_path)
        cfg["build"] = {"masks": True, "instances": False}
        cfg_path = tmp_path / "pre.yml"
        cfg_path.write_text(yaml.dump(cfg))
        r = CliRunner().invoke(main, ["precompute-gt", "-c", str(cfg_path)])
        assert r.exit_code == 0, r.output
        assert '"masks": 2' in r.output
