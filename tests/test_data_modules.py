"""Tests: cached/mmap datamodules, samplers, channel dropout, loaders."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from viscy_tpu.data import (
    CachedOmeZarrDataModule,
    ChannelDropout,
    FlexibleBatchSampler,
    MmappedDataModule,
    ShardedDistributedSampler,
)
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.transforms import NormalizeSampled


def test_sharded_distributed_sampler_disjoint():
    s0 = ShardedDistributedSampler(100, num_replicas=4, rank=0, seed=1)
    s1 = ShardedDistributedSampler(100, num_replicas=4, rank=1, seed=1)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 25
    assert set(i0).isdisjoint(set(i1))
    # epoch changes the permutation
    s0.set_epoch(1)
    assert list(s0) != i0


def test_flexible_batch_sampler_grouping():
    df = pd.DataFrame(
        {
            "experiment": ["a"] * 60 + ["b"] * 40,
            "perturbation": (["x", "y"] * 50),
        }
    )
    sampler = FlexibleBatchSampler(
        df, batch_size=8, batch_group_by="experiment", stratify_by="perturbation", seed=0
    )
    batches = list(sampler)
    assert all(len(b) == 8 for b in batches)
    for b in batches:
        exps = df.loc[b, "experiment"].unique()
        assert len(exps) == 1  # one group per batch
        perts = df.loc[b, "perturbation"].value_counts()
        assert perts.min() >= 3  # roughly balanced


def test_flexible_batch_sampler_leaky():
    df = pd.DataFrame({"experiment": ["a"] * 50 + ["b"] * 50})
    sampler = FlexibleBatchSampler(
        df, batch_size=10, batch_group_by="experiment", leaky=0.2, stratify_by=None, seed=0
    )
    mixed = 0
    for b in sampler:
        if df.loc[b, "experiment"].nunique() > 1:
            mixed += 1
    assert mixed > 0


def test_channel_dropout():
    x = jax.numpy.ones((4, 3, 2, 8, 8))
    cd = ChannelDropout(keys="anchor", dropout_prob=0.9)
    out = cd({"anchor": x}, jax.random.PRNGKey(0))
    per_channel = np.asarray(out["anchor"]).reshape(4, 3, -1).sum(axis=2)
    # at least one channel survives per sample
    assert (per_channel.sum(axis=1) > 0).all()
    # with prob 0.9, some channels dropped
    assert (per_channel == 0).any()


def test_cached_ome_zarr_datamodule(preprocessed_hcs_dataset):
    dm = CachedOmeZarrDataModule(
        data_path=preprocessed_hcs_dataset,
        channels=["Phase"],
        batch_size=2,
        num_workers=0,
        train_cpu_transforms=[NormalizeSampled(keys=["Phase"], level="dataset_statistics")],
        include_fov_names=["A/1/0", "A/1/1"],
    )
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert batch["source"].shape == (2, 1, 12, 64, 64)
    # second epoch hits the cache
    batch2 = next(iter(dm.train_dataloader()))
    assert batch2["source"].shape == (2, 1, 12, 64, 64)


def test_mmap_datamodule(preprocessed_hcs_dataset, tmp_path):
    dm = MmappedDataModule(
        data_path=preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel=["GFP"],
        z_window_size=5,
        batch_size=2,
        num_workers=0,
        split_ratio=0.5,
        include_fov_names=["A/1/0", "A/1/1"],
        scratch_dir=tmp_path,
        normalizations=[
            NormalizeSampled(keys=["Phase", "GFP"], level="dataset_statistics")
        ],
    )
    dm.prepare_data()
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert batch["source"].shape[1:] == (1, 5, 64, 64)
    # cache marker exists and second staging reuses it
    assert (dm._cache_dir / ".done").exists()
    dm2 = MmappedDataModule(
        data_path=preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel=["GFP"],
        z_window_size=5,
        batch_size=2,
        num_workers=0,
        include_fov_names=["A/1/0", "A/1/1"],
        scratch_dir=tmp_path,
    )
    dm2.prepare_data()
    assert dm2._cache_dir == dm._cache_dir


def test_loader_multithread_order_and_exceptions():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32)}

    loader = DataLoader(DS(), batch_size=2, num_workers=3, shuffle=False)
    batches = list(loader)
    assert len(batches) == 5
    np.testing.assert_array_equal(batches[0]["x"][:, 0, 0], [0, 1])

    class BadDS(DS):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(BadDS(), batch_size=2, num_workers=3))


def test_hcs_caching_pushdown_native(preprocessed_hcs_dataset):
    """Caching + weighted-crop pushdown drives the native crop kernel."""
    from viscy_tpu.data import HCSDataModule
    from viscy_tpu.transforms import RandWeightedCropd

    dm = HCSDataModule(
        preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel="GFP",
        z_window_size=8,
        batch_size=4,
        num_workers=0,
        yx_patch_size=(24, 24),
        caching=True,
        normalize_on_device=True,
        augmentations=[
            RandWeightedCropd(
                keys=["source", "target"],
                w_key="target",
                spatial_size=(8, 24, 24),
                num_samples=2,
            )
        ],
    )
    dm.prepare_data()
    dm.setup("fit")
    assert dm.train_dataset.pushdown_crop is not None
    batch = next(iter(dm.train_dataloader()))
    assert batch["source"].shape[-2:] == (24, 24)
    assert batch["source"].shape[1:3] == (1, 8)
    assert batch["target"].shape[1:3] == (1, 8)
    assert np.isfinite(batch["source"]).all()
    # reproducibility: same epoch -> same batch
    dm.set_epoch(0)
    b1 = next(iter(dm.train_dataloader()))
    dm.set_epoch(0)
    b2 = next(iter(dm.train_dataloader()))
    np.testing.assert_allclose(b1["source"], b2["source"])


def test_fg_mask_device_spatial_cotransform(preprocessed_hcs_dataset):
    """Spatial device transforms must move fg_mask identically to target
    (reference foreground_masks.py is_spatial patching protocol)."""
    import jax

    from viscy_tpu.data import HCSDataModule
    from viscy_tpu.transforms import BatchedRandFlipd, BatchedRandGaussianNoised

    flip = BatchedRandFlipd(keys=["source", "target"], prob=1.0)
    noise = BatchedRandGaussianNoised(keys=["source"], prob=1.0, std=0.1)
    dm = HCSDataModule(
        preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel="GFP",
        z_window_size=4,
        batch_size=2,
        num_workers=0,
        yx_patch_size=(16, 16),
        fg_mask_key="fg",
        augmentations=[flip, noise],
    )
    # spatial transform patched, intensity transform untouched
    assert flip.keys == ("source", "target", "fg_mask")
    assert flip.allow_missing_keys
    assert noise.keys == ("source",)

    rng = np.random.default_rng(0)
    target = rng.random((2, 1, 4, 16, 16)).astype(np.float32)
    batch = {
        "source": rng.random((2, 1, 4, 16, 16)).astype(np.float32),
        "target": target,
        "fg_mask": target.copy(),  # identical content -> must stay identical
    }
    out = dm.device_transform(
        {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.asarray(out["fg_mask"]), np.asarray(out["target"]), rtol=1e-6
    )
    # the flip actually happened
    assert not np.allclose(np.asarray(out["target"]), target)

    # batches without a mask still pass (allow_missing_keys)
    out2 = dm.device_transform(
        {
            "source": jnp.asarray(batch["source"]),
            "target": jnp.asarray(batch["target"]),
        },
        jax.random.PRNGKey(0),
    )
    assert "fg_mask" not in out2


def test_native_uint16_transfer(tmp_path):
    """native_transfer ships uint16 batches (half the H2D bytes) and the
    device transform casts + normalizes to the same values as the f32 path
    (VERDICT r2 item 2)."""
    import jax

    from viscy_tpu.data import HCSDataModule
    from viscy_tpu.transforms.normalize import NormalizeSampled
    from viscy_tpu.zarr_io.synthetic import build_hcs_plate

    plate = build_hcs_plate(
        tmp_path / "u16.zarr",
        ["Phase", "GFP"],
        zyx_shape=(8, 32, 32),
        dtype=np.uint16,
        max_value=4096,
        rows=("A",),
        cols=("1",),
        fovs=("0", "1", "2"),
        num_timepoints=2,
        norm_meta=True,
    )

    def make_dm(native: bool) -> "HCSDataModule":
        return HCSDataModule(
            str(plate),
            source_channel="Phase",
            target_channel="GFP",
            z_window_size=8,
            batch_size=1,
            num_workers=0,
            yx_patch_size=(32, 32),
            normalize_on_device=True,
            native_transfer=native,
            normalizations=[
                NormalizeSampled(
                    keys=["Phase"],
                    level="fov_statistics",
                    subtrahend="mean",
                    divisor="std",
                )
            ],
        )

    dm16 = make_dm(True)
    dm16.prepare_data()
    dm16.setup("fit")
    b16 = next(iter(dm16.train_dataloader()))
    assert b16["source"].dtype == np.uint16, "host batch should stay uint16"
    assert b16["target"].dtype == np.uint16

    dm32 = make_dm(False)
    dm32.setup("fit")
    b32 = next(iter(dm32.train_dataloader()))
    assert b32["source"].dtype == np.float32

    key = jax.random.PRNGKey(0)
    out16 = dm16.device_transform(
        {k: jax.numpy.asarray(v) for k, v in b16.items() if k in ("source", "target")},
        key,
        stage="val",
    )
    out32 = dm32.device_transform(
        {k: jax.numpy.asarray(v) for k, v in b32.items() if k in ("source", "target")},
        key,
        stage="val",
    )
    for k in ("source", "target"):
        assert out16[k].dtype == jax.numpy.float32
        np.testing.assert_allclose(
            np.asarray(out16[k]), np.asarray(out32[k]), atol=1e-5
        )


def test_train_patch_shape_validation(preprocessed_hcs_dataset):
    """With no device augmentations to do the cropping, a train source
    window that does not match (z_window_size, *yx_patch_size) must raise
    an actionable error at trace time (reference hcs.py:710-719), not
    crash deep inside XLA shape rules; a configured spatial crop lifts
    the check."""
    import re

    import jax
    import pytest

    from viscy_tpu.data import HCSDataModule
    from viscy_tpu.transforms import BatchedRandSpatialCropd

    dm = HCSDataModule(
        preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel="GFP",
        z_window_size=4,
        batch_size=2,
        num_workers=0,
        yx_patch_size=(16, 16),
        augmentations=[],
    )
    rng = np.random.default_rng(0)
    bad = {
        "source": jnp.asarray(rng.random((2, 1, 4, 20, 24), np.float32)),
        "target": jnp.asarray(rng.random((2, 1, 4, 20, 24), np.float32)),
    }
    with pytest.raises(ValueError, match=re.escape("yx_patch_size=[16, 16]")):
        dm.device_transform(bad, jax.random.PRNGKey(0), stage="train")
    good = {"source": jnp.asarray(rng.random((2, 1, 4, 16, 16), np.float32))}
    out = dm.device_transform(good, jax.random.PRNGKey(0), stage="train")
    assert out["source"].shape == (2, 1, 4, 16, 16)
    # val/predict pass through uncropped (reference: only training checks)
    out = dm.device_transform(bad, jax.random.PRNGKey(0), stage="val")
    assert out["source"].shape == (2, 1, 4, 20, 24)

    dm_crop = HCSDataModule(
        preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel="GFP",
        z_window_size=4,
        batch_size=2,
        num_workers=0,
        yx_patch_size=(16, 16),
        augmentations=[
            BatchedRandSpatialCropd(keys=["source", "target"], roi_size=(-1, 16, 16))
        ],
    )
    out = dm_crop.device_transform(dict(bad), jax.random.PRNGKey(0), stage="train")
    assert out["source"].shape == (2, 1, 4, 16, 16)


def test_train_patch_shape_validation_intensity_only(preprocessed_hcs_dataset):
    """Intensity-only device augmentations cannot change the shape, so the
    actionable patch-shape error must still fire (code-review finding)."""
    import re

    import jax
    import pytest

    from viscy_tpu.data import HCSDataModule
    from viscy_tpu.transforms import BatchedRandGaussianNoised

    dm = HCSDataModule(
        preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel="GFP",
        z_window_size=4,
        batch_size=2,
        num_workers=0,
        yx_patch_size=(16, 16),
        augmentations=[BatchedRandGaussianNoised(keys=["source"], prob=1.0, std=0.1)],
    )
    rng = np.random.default_rng(0)
    bad = {"source": jnp.asarray(rng.random((2, 1, 4, 20, 24), np.float32))}
    with pytest.raises(ValueError, match=re.escape("yx_patch_size=[16, 16]")):
        dm.device_transform(bad, jax.random.PRNGKey(0), stage="train")


def test_train_patch_shape_validation_shape_preserving_spatial(preprocessed_hcs_dataset):
    """Shape-preserving spatial augs (flip) cannot crop either — the
    actionable error must still fire (guard keys on changes_shape, not
    is_spatial)."""
    import re

    import jax
    import pytest

    from viscy_tpu.data import HCSDataModule
    from viscy_tpu.transforms import BatchedRandFlipd

    dm = HCSDataModule(
        preprocessed_hcs_dataset,
        source_channel="Phase",
        target_channel="GFP",
        z_window_size=4,
        batch_size=2,
        num_workers=0,
        yx_patch_size=(16, 16),
        augmentations=[BatchedRandFlipd(keys=["source", "target"], prob=0.5)],
    )
    rng = np.random.default_rng(0)
    bad = {
        "source": jnp.asarray(rng.random((2, 1, 4, 20, 24), np.float32)),
        "target": jnp.asarray(rng.random((2, 1, 4, 20, 24), np.float32)),
    }
    with pytest.raises(ValueError, match=re.escape("yx_patch_size=[16, 16]")):
        dm.device_transform(bad, jax.random.PRNGKey(0), stage="train")
