"""End-to-end integration: fast-dev-run fits and predict->zarr round trips
(mirrors reference ``applications/cytoland/tests/test_training_integration.py``)."""

from pathlib import Path

import numpy as np
import pytest

from viscy_tpu.apps.cytoland.engine import FcmaeUNet, MaskedMSELoss, VSUNet
from viscy_tpu.data.hcs import HCSDataModule
from viscy_tpu.data.host_transforms import HostRandWeightedCropd
from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter, blend_in
from viscy_tpu.training.losses.mixed_loss import MixedLoss
from viscy_tpu.training.trainer import Trainer
from viscy_tpu.transforms import BatchedRandFlipd, NormalizeSampled
from viscy_tpu.zarr_io import open_ome_zarr

TINY_FCMAE = dict(
    in_channels=1,
    out_channels=1,
    encoder_blocks=(1, 1, 1, 1),
    dims=(8, 16, 32, 64),
    stem_kernel_size=(5, 4, 4),
    in_stack_depth=5,
)


def _datamodule(plate_path, **kwargs):
    defaults = dict(
        data_path=plate_path,
        source_channel="Phase",
        target_channel=["GFP"],
        z_window_size=5,
        batch_size=4,
        num_workers=2,
        yx_patch_size=(32, 32),
        normalizations=[
            NormalizeSampled(
                keys=["Phase", "GFP"], level="dataset_statistics"
            )
        ],
        augmentations=[
            HostRandWeightedCropd(
                keys=["Phase", "GFP", "weight"],
                w_key="weight",
                spatial_size=(5, 32, 32),
                num_samples=2,
            ),
            BatchedRandFlipd(keys=["source", "target"], prob=0.5),
        ],
        split_ratio=0.5,
        include_fov_names=["A/1/0", "A/1/1"],
    )
    defaults.update(kwargs)
    return HCSDataModule(**defaults)


def test_fit_fcmae_supervised(preprocessed_hcs_dataset, tmp_path):
    dm = _datamodule(preprocessed_hcs_dataset)
    module = VSUNet(
        architecture="fcmae",
        model_config=dict(TINY_FCMAE, pretraining=False),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
        lr=1e-4,
    )
    trainer = Trainer(fast_dev_run=True, default_root_dir=tmp_path / "logs")
    trainer.fit(module, dm)
    assert trainer.global_step == 1
    assert np.isfinite(trainer.logged_metrics["loss/train"])


def test_fit_fcmae_pretraining(preprocessed_hcs_dataset, tmp_path):
    dm = _datamodule(preprocessed_hcs_dataset)
    module = FcmaeUNet(
        fit_mask_ratio=0.5,
        model_config=dict(TINY_FCMAE, pretraining=True),
        loss_function=MaskedMSELoss(),
        lr=1e-4,
    )
    trainer = Trainer(fast_dev_run=True, default_root_dir=tmp_path / "logs")
    trainer.fit(module, dm)
    assert np.isfinite(trainer.logged_metrics["loss/train"])


def test_predict_writes_hcs_zarr(preprocessed_hcs_dataset, tmp_path):
    dm = _datamodule(
        preprocessed_hcs_dataset,
        include_fov_names=["A/1/0"],
        z_window_size=12,
        augmentations=[],
        batch_size=2,
    )
    module = VSUNet(
        architecture="2.5D",
        model_config=dict(
            in_channels=1,
            out_channels=1,
            in_stack_depth=12,
            out_stack_depth=1,
            num_blocks=2,
            num_filters=(4, 8, 16),
        ),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    out_store = tmp_path / "pred.zarr"
    writer = HCSPredictionWriter(str(out_store))
    trainer = Trainer(default_root_dir=tmp_path / "logs", callbacks=[writer])
    trainer.predict(module, dm)
    plate = open_ome_zarr(out_store)
    pos = plate["A/1/0"]
    assert pos.channel_names == ["GFP"]
    img = pos["0"]
    # z_window 12 of a 12-slice stack -> one window per t, out depth 1 at
    # the dataset's center-slice key z + z_window_size // 2 = 6 (matches the
    # reference's even-window convention, prediction_writer.py:305)
    assert img.shape[0] == 2
    written = img[:, 0, 6]
    assert np.abs(written).sum() > 0


def test_blend_in_feathering():
    old = np.ones((1, 4, 2, 2), np.float32)
    new = np.zeros((1, 4, 2, 2), np.float32)
    # overlap region starts at z=2 with depth 4
    out = blend_in(old, new, slice(2, 6))
    # factors (reversed i+1 clamped at 3): [3, 3, 2, 1]
    np.testing.assert_allclose(out[0, :, 0, 0], [2 / 3, 2 / 3, 1 / 2, 0.0], rtol=1e-6)
    # no blending at z=0
    out0 = blend_in(old, new, slice(0, 4))
    np.testing.assert_array_equal(out0, new)


def test_fit_with_fg_mask_spotlight(tmp_path):
    """Preprocess with Otsu -> fg masks -> SpotlightLoss training E2E."""
    from viscy_tpu.preprocess.stats import (
        generate_fg_masks,
        generate_normalization_metadata,
    )
    from viscy_tpu.training.losses.spotlight import SpotlightLoss
    from viscy_tpu.zarr_io import build_hcs_plate

    plate = build_hcs_plate(
        tmp_path / "fg.zarr",
        ["Phase", "GFP"],
        zyx_shape=(5, 32, 32),
        rows=("A",),
        cols=("1",),
        fovs=("0", "1"),
        seed=0,
    )
    generate_normalization_metadata(plate, grid_spacing=2, compute_otsu=True)
    generate_fg_masks(plate, ["GFP"])
    dm = HCSDataModule(
        data_path=plate,
        source_channel="Phase",
        target_channel=["GFP"],
        z_window_size=5,
        batch_size=2,
        num_workers=0,
        # must match the host crop below: with no shape-changing device
        # augmentation the trainer validates source == (z, *yx_patch_size)
        yx_patch_size=(24, 24),
        split_ratio=0.5,
        fg_mask_key="fg_mask",
        normalizations=[
            NormalizeSampled(keys=["Phase", "GFP"], level="fov_statistics")
        ],
        augmentations=[
            HostRandWeightedCropd(
                keys=["Phase", "GFP", "weight", "fg_mask_GFP"],
                w_key="weight",
                spatial_size=(5, 24, 24),
                num_samples=1,
            )
        ],
    )
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert "fg_mask" in batch
    assert batch["fg_mask"].shape == batch["target"].shape
    module = VSUNet(
        architecture="2.5D",
        model_config=dict(
            in_channels=1, out_channels=1, in_stack_depth=5, out_stack_depth=5,
            num_blocks=2, num_filters=(4, 8, 16),
        ),
        loss_function=SpotlightLoss(lambda_mse=0.5, fg_threshold=None),
    )
    trainer = Trainer(fast_dev_run=True, default_root_dir=tmp_path / "logs")
    trainer.fit(module, dm)
    assert np.isfinite(trainer.logged_metrics["loss/train"])


def test_predict_write_input_channels(preprocessed_hcs_dataset, tmp_path):
    """write_input=True stores source center-slices next to predictions."""
    dm = _datamodule(
        preprocessed_hcs_dataset,
        include_fov_names=["A/1/0"],
        z_window_size=12,
        augmentations=[],
        batch_size=2,
    )
    module = VSUNet(
        architecture="2.5D",
        model_config=dict(
            in_channels=1, out_channels=1, in_stack_depth=12, out_stack_depth=1,
            num_blocks=2, num_filters=(4, 8, 16),
        ),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    out_store = tmp_path / "pred_wi.zarr"
    writer = HCSPredictionWriter(str(out_store), write_input=True)
    trainer = Trainer(default_root_dir=tmp_path / "logs", callbacks=[writer])
    trainer.predict(module, dm)
    plate = open_ome_zarr(out_store)
    pos = plate["A/1/0"]
    assert pos.channel_names == ["Phase", "GFP"]
    img = pos["0"]
    assert img.shape[1] == 2
    # source center slice written in channel 0
    assert np.abs(img[0, 0, 6]).sum() > 0


def test_trainer_test_stage_metrics(preprocessed_hcs_dataset, tmp_path):
    """viscy test: full-FOV windows through test_step produce the reference
    metric suite (MAE/MSE/pearson/cosine/SSIM-21, engine.py:373-389) in
    logged_metrics and metrics.csv."""
    import json

    dm = _datamodule(
        preprocessed_hcs_dataset,
        include_fov_names=["A/1/0"],
        augmentations=[],
        batch_size=2,
    )
    module = VSUNet(
        architecture="fcmae",
        model_config=dict(TINY_FCMAE, pretraining=False),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
        lr=1e-4,
    )
    trainer = Trainer(default_root_dir=tmp_path / "logs")
    metrics = trainer.test(module, dm)
    for key in ("loss", "metrics/mae", "metrics/mse", "metrics/pearson", "metrics/cosine", "metrics/ssim"):
        assert key in metrics and np.isfinite(metrics[key]), key
    rows = [
        json.loads(line)
        for line in (trainer.logger.log_dir / "metrics.csv").read_text().splitlines()
    ]
    assert any("test/metrics/ssim" in r for r in rows)


def test_trainer_test_stage_segmentation_leg(preprocessed_hcs_dataset, tmp_path):
    """With ground_truth_masks configured (MaskTestDataset finds a
    *_p###_z#_cp_masks.png for the window's center slice), the test stage
    adds the reference segmentation suite (engine.py:400-424) computed on
    natively segmented instances."""
    from PIL import Image

    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    rng = np.random.default_rng(0)
    # blobs at the window-center z for every z window of FOVs in column 1
    labels = np.zeros((64, 64), np.int16)
    labels[8:20, 8:20] = 1
    labels[30:50, 30:50] = 2
    for z in range(2, 10):
        Image.fromarray(labels).save(mask_dir / f"img_p001_z{z}_cp_masks.png")

    dm = _datamodule(
        preprocessed_hcs_dataset,
        include_fov_names=["A/1/0"],
        augmentations=[],
        batch_size=1,
        ground_truth_masks=str(mask_dir),
    )
    module = VSUNet(
        architecture="fcmae",
        model_config=dict(TINY_FCMAE, pretraining=False),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
        lr=1e-4,
    )
    trainer = Trainer(default_root_dir=tmp_path / "logs")
    metrics = trainer.test(module, dm)
    for key in (
        "metrics/accuracy",
        "metrics/dice_score",
        "metrics/jaccard",
        "metrics/mAP",
        "metrics/mAP_50",
        "metrics/mAP_75",
        "metrics/mAR_100",
    ):
        assert key in metrics and np.isfinite(metrics[key]), key
    # the GT masks themselves must score perfectly through the same path
    host = module.test_step_host(
        trainer.state.variables,
        {
            "source": np.zeros((1, 1, 5, 64, 64), np.float32),
            "target": np.zeros((1, 1, 5, 64, 64), np.float32),
            "labels": labels,
        },
    )
    assert host  # computed
    module2 = VSUNet(
        architecture="fcmae",
        model_config=dict(TINY_FCMAE, pretraining=False),
        test_evaluate_cellpose=True,
    )
    module2._instance_segment = lambda pred2d: labels.astype(np.int32)
    perfect = module2.test_step_host(
        None,
        {
            "source": np.zeros((1, 1, 5, 64, 64), np.float32),
            "target": np.zeros((1, 1, 5, 64, 64), np.float32),
            "labels": labels,
        },
    )
    assert perfect["metrics/mAP"] == 1.0
    assert perfect["metrics/dice_score"] == 1.0
