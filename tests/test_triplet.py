"""Triplet dataset/datamodule + DynaCLR contrastive fit/predict E2E."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.apps.dynaclr.engine import ContrastiveModule, TripletMarginLoss
from viscy_tpu.data.triplet import TripletDataModule, TripletDataset
from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder
from viscy_tpu.models.contrastive.loss import NTXentLoss
from viscy_tpu.training.callbacks.embedding_writer import (
    EmbeddingWriter,
    read_embedding_dataset,
)
from viscy_tpu.training.trainer import Trainer
from viscy_tpu.transforms import BatchedRandFlipd, NormalizeSampled
from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr
from viscy_tpu.zarr_io.synthetic import inject_uniform_norm_meta


@pytest.fixture(scope="module")
def tracks_dataset(tmp_path_factory) -> Path:
    """HCS plate + per-FOV tracks CSVs (reference tracks_hcs_dataset)."""
    root = tmp_path_factory.mktemp("tracks")
    plate_path = build_hcs_plate(
        root / "plate.zarr",
        ["Phase", "GFP"],
        zyx_shape=(5, 128, 128),
        rows=("A",),
        cols=("1", "2"),
        fovs=("0", "1"),
        num_timepoints=3,
        seed=0,
    )
    inject_uniform_norm_meta(plate_path, ["Phase", "GFP"])
    rng = np.random.default_rng(0)
    plate = open_ome_zarr(plate_path)
    for name, _ in plate.positions():
        rows = []
        for track_id in range(3):
            y, x = rng.integers(40, 88, 2)
            for t in range(3):
                rows.append(
                    {
                        "track_id": track_id,
                        "t": t,
                        "y": int(y + rng.integers(-2, 3)),
                        "x": int(x + rng.integers(-2, 3)),
                        "id": track_id * 10 + t,
                        "parent_track_id": -1,
                        "parent_id": -1,
                    }
                )
        fov_dir = plate_path / name
        pd.DataFrame(rows).to_csv(fov_dir / "tracks.csv", index=False)
    return plate_path


def _dm(plate_path, **kwargs):
    defaults = dict(
        data_path=str(plate_path),
        tracks_path=str(plate_path),
        source_channel=["Phase", "GFP"],
        z_range=(0, 5),
        initial_yx_patch_size=(64, 64),
        final_yx_patch_size=(32, 32),
        batch_size=4,
        split_ratio=0.5,
        normalizations=[
            NormalizeSampled(keys=["Phase", "GFP"], level="fov_statistics")
        ],
        augmentations=[BatchedRandFlipd(keys=["Phase", "GFP"], prob=0.5)],
    )
    defaults.update(kwargs)
    return TripletDataModule(**defaults)


def test_triplet_dataset_batched_read(tracks_dataset):
    dm = _dm(tracks_dataset)
    dm.setup("fit")
    ds = dm.train_dataset
    assert len(ds) > 0
    batch = ds.__getitems__([0, 1])
    assert batch["anchor"].shape == (2, 2, 5, 64, 64)
    assert batch["positive"].shape == (2, 2, 5, 64, 64)
    assert batch["negative"].shape == (2, 2, 5, 64, 64)
    # time_interval="any": positive is the anchor clone pre-augmentation
    np.testing.assert_array_equal(batch["anchor"], batch["positive"])
    # negatives come from other tracks
    assert not np.array_equal(batch["anchor"][0], batch["negative"][0])
    # collated norm meta has per-sample stat vectors
    assert batch["anchor_norm_meta"]["Phase"]["fov_statistics"]["mean"].shape == (2,)


def test_triplet_time_interval(tracks_dataset):
    dm = _dm(tracks_dataset, time_interval=1)
    dm.setup("fit")
    ds = dm.train_dataset
    # anchors are only rows with a t+1 partner
    assert (ds.valid_anchors.groupby("global_track_id")["t"].max() <= 2).all()
    batch = ds.__getitems__([0])
    assert not np.array_equal(batch["anchor"], batch["positive"])


def test_triplet_predict_index(tracks_dataset):
    dm = _dm(tracks_dataset)
    dm.setup("predict")
    batch = dm.predict_dataset.__getitems__([0, 1])
    assert "index" in batch
    assert batch["index"][0]["track_id"] is not None
    assert "positive" not in batch


def _tiny_module(loss):
    return ContrastiveModule(
        encoder=ContrastiveEncoder(
            backbone="convnextv2_test",
            in_channels=2,
            in_stack_depth=5,
            stem_kernel_size=(5, 4, 4),
            stem_stride=(5, 4, 4),
            embedding_dim=32,
            projection_dim=8,
        ),
        loss_function=loss,
        example_input_array_shape=(2, 2, 5, 32, 32),
    )


@pytest.mark.parametrize(
    "loss", [TripletMarginLoss(0.5), NTXentLoss(temperature=0.07)], ids=["triplet", "ntxent"]
)
def test_contrastive_fit(tracks_dataset, tmp_path, loss):
    dm = _dm(tracks_dataset, return_negative=not isinstance(loss, NTXentLoss))
    module = _tiny_module(loss)
    trainer = Trainer(fast_dev_run=True, default_root_dir=tmp_path / "logs")
    trainer.fit(module, dm)
    assert np.isfinite(trainer.logged_metrics["loss/train"])


def test_contrastive_predict_embeddings(tracks_dataset, tmp_path):
    dm = _dm(tracks_dataset)
    module = _tiny_module(TripletMarginLoss(0.5))
    out = tmp_path / "emb"
    writer = EmbeddingWriter(str(out), compute_pca=False)
    trainer = Trainer(default_root_dir=tmp_path / "logs", callbacks=[writer])
    trainer.predict(module, dm)
    ds = read_embedding_dataset(out)
    # features are the pooled+LN backbone output (the reference erases the
    # timm classifier fc, encoder.py:122): dim = backbone dims[-1], not
    # embedding_dim (convnextv2_test: 128)
    assert ds["features"].shape[1] == 128
    assert ds["projections"].shape[1] == 8
    assert len(ds["index"]) == ds["features"].shape[0]
    assert "track_id" in ds["index"].columns


def test_convert_to_anndata_spec_store(tracks_dataset, tmp_path):
    """convert_to_anndata writes a real spec-compliant AnnData zarr (via
    anndata_lite when the anndata package is absent), not a bespoke
    bundle (reference trainer.py:187)."""
    from viscy_tpu.evaluation.anndata_lite import read_anndata_zarr
    from viscy_tpu.preprocess.precompute import convert_to_anndata

    dm = _dm(tracks_dataset)
    module = _tiny_module(TripletMarginLoss(0.5))
    out = tmp_path / "emb"
    writer = EmbeddingWriter(str(out), compute_pca=False)
    trainer = Trainer(default_root_dir=tmp_path / "logs", callbacks=[writer])
    trainer.predict(module, dm)

    converted = convert_to_anndata(out, tmp_path / "emb_ad.zarr")
    ad = read_anndata_zarr(converted)
    src = read_embedding_dataset(out)
    np.testing.assert_allclose(ad.X, np.asarray(src["features"]), rtol=1e-6)
    # X_projections matches EmbeddingWriter's obsm key, so converted
    # stores round-trip through the same readers
    assert "X_projections" in ad.obsm
    assert list(ad.obs["track_id"]) == list(src["index"]["track_id"])


def test_device_aug_chunk_matches_unchunked_norm(tracks_dataset):
    """device_aug_chunk runs the device normalize+aug pipeline in lax.map
    chunks (HBM bound for the DynaCLR batch-256 recipe). The
    normalization-only path is deterministic, so chunked == unchunked
    exactly; the augmented path is checked for shape and key-splitting."""
    import jax
    import jax.numpy as jnp

    dm = _dm(tracks_dataset)
    dm_chunked = _dm(tracks_dataset, device_aug_chunk=2)
    dm.setup("fit")
    dm_chunked.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    key = jax.random.PRNGKey(0)
    # val stage without augment_validation applies normalizations only
    dm.augment_validation = False
    dm_chunked.augment_validation = False
    out = dm.device_transform({k: jnp.asarray(v) if k == "anchor" else v for k, v in batch.items() if k.startswith("anchor")}, key, stage="val")
    out_c = dm_chunked.device_transform({k: jnp.asarray(v) if k == "anchor" else v for k, v in batch.items() if k.startswith("anchor")}, key, stage="val")
    np.testing.assert_allclose(
        np.asarray(out["anchor"]), np.asarray(out_c["anchor"]), atol=1e-6, rtol=0
    )
    # augmented path: chunked randomness differs by design; shape + finite
    full = {k: (jnp.asarray(v) if not k.endswith("_norm_meta") else v) for k, v in batch.items()}
    aug_c = dm_chunked.device_transform(full, key, stage="train")
    assert aug_c["anchor"].shape == out["anchor"].shape
    assert bool(jnp.isfinite(aug_c["anchor"]).all())
