"""TTA, sliding-window prediction, combined loaders, online eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.apps.cytoland.engine import VSUNet
from viscy_tpu.apps.cytoland.prediction import (
    AugmentedPredictionVSUNet,
    rotation_tta_transforms,
)
from viscy_tpu.training.losses.mixed_loss import MixedLoss

TINY = dict(
    in_channels=1,
    out_channels=2,
    encoder_blocks=(1, 1, 1, 1),
    dims=(8, 16, 32, 64),
    stem_kernel_size=(5, 4, 4),
    in_stack_depth=5,
    pretraining=False,
)


@pytest.fixture(scope="module")
def tiny_vsunet():
    module = VSUNet(
        architecture="fcmae",
        model_config=TINY,
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    x = np.zeros((1, 1, 5, 32, 32), np.float32)
    variables = module.init_variables(jax.random.PRNGKey(0), {"source": x})
    return module, variables


def test_rotation_tta_invariance_shapes(tiny_vsunet):
    module, variables = tiny_vsunet
    predictor = AugmentedPredictionVSUNet.with_rotation_tta(
        module.model, n_rotations=4, reduction="mean"
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 1, 5, 32, 48), np.float32))  # non-square
    out = predictor.predict_step(variables, {"source": x})
    assert out.shape == (1, 2, 5, 32, 48)


def test_tta_mean_equals_single_for_identity(tiny_vsunet):
    module, variables = tiny_vsunet
    fwd, inv = rotation_tta_transforms(1)
    predictor = AugmentedPredictionVSUNet(module.model, fwd, inv)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 1, 5, 32, 32), np.float32))
    single = predictor.predict_step(variables, {"source": x})
    direct = module.predict_step(variables, {"source": x})
    np.testing.assert_allclose(np.asarray(single), np.asarray(direct), atol=1e-5)


def test_sliding_window_prediction_covers_depth(tiny_vsunet):
    module, variables = tiny_vsunet
    predictor = AugmentedPredictionVSUNet(module.model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 1, 9, 32, 32), np.float32))
    out = predictor.predict_sliding_windows(variables, x, out_channel=2, step=2)
    assert out.shape == (1, 2, 9, 32, 32)
    # all covered z positions written
    assert np.abs(out[:, :, :9]).sum() > 0


def test_combined_loader_modes():
    from viscy_tpu.data.combined import _CombinedLoader

    class FakeLoader:
        def __init__(self, n, tag):
            self.n = n
            self.tag = tag

        def __len__(self):
            return self.n

        def __iter__(self):
            return iter([{"tag": self.tag, "i": i} for i in range(self.n)])

    a, b = FakeLoader(2, "a"), FakeLoader(3, "b")
    seq = list(_CombinedLoader([a, b], "sequential"))
    assert len(seq) == 5
    min_size = list(_CombinedLoader([a, b], "min_size"))
    assert len(min_size) == 4  # 2 rounds x 2 loaders
    cycle = list(_CombinedLoader([a, b], "max_size_cycle"))
    assert len(cycle) == 6  # 3 rounds x 2 loaders, shorter one recycled
    assert sum(1 for x in cycle if x["tag"] == "a") == 3


def test_online_eval_effective_rank_logging(tmp_path):
    from viscy_tpu.training.callbacks.online_eval import OnlineEvalCallback
    from viscy_tpu.training.trainer import CSVLogger

    class FakeTrainer:
        current_epoch = 0
        global_step = 5

        def __init__(self):
            self.logger = CSVLogger(tmp_path, use_tensorboard=False)

    cb = OnlineEvalCallback(every_n_epochs=1)
    trainer = FakeTrainer()
    cb.on_validation_epoch_start(trainer, None)
    rng = np.random.default_rng(0)
    for _ in range(3):
        cb.on_validation_batch_end(
            trainer, None, {"features": rng.normal(0, 1, (16, 32))}, {}, 0
        )
    cb.on_validation_epoch_end(trainer, None, {})
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.csv")]
    assert any("online_eval/effective_rank" in l for l in lines)


class TestTiledForwardYX:
    """Batched overlapping-tile YX inference with feathered blending
    (TPU-native upgrade of the reference full-frame predict path)."""

    def test_linear_fn_exact(self):
        """For a spatially-local linear fn (identity/scale), tiled blending
        must reproduce the direct forward exactly."""
        from viscy_tpu.apps.cytoland.prediction import tiled_forward_yx

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 1, 3, 70, 90)).astype(np.float32))
        out = tiled_forward_yx(lambda t: 2.0 * t, x, tile=(32, 32), tile_batch=4)
        np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(x), atol=1e-5)

    def test_positions_cover_with_overlap(self):
        from viscy_tpu.apps.cytoland.prediction import tile_positions

        pos = tile_positions(2048, 384, min_overlap=32)
        assert pos[0] == 0 and pos[-1] == 2048 - 384
        diffs = np.diff(pos)
        assert (384 - diffs >= 32).all(), "adjacent tiles must overlap"
        # full coverage
        covered = np.zeros(2048, bool)
        for p in pos:
            covered[p : p + 384] = True
        assert covered.all()

    def test_channel_depth_change(self):
        """fwd may change C and D (2.5D models); blending happens in the
        output geometry."""
        from viscy_tpu.apps.cytoland.prediction import tiled_forward_yx

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 1, 5, 48, 64)).astype(np.float32))

        def fwd(t):
            mid = t[:, :, 2:3]  # D 5 -> 1
            return jnp.concatenate([mid, -mid], axis=1)  # C 1 -> 2

        out = tiled_forward_yx(fwd, x, tile=(32, 32), tile_batch=3)
        assert out.shape == (1, 2, 1, 48, 64)
        np.testing.assert_allclose(
            np.asarray(out[:, 0]), np.asarray(x[:, 0, 2:3]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 1]), -np.asarray(x[:, 0, 2:3]), atol=1e-5
        )

    def test_vsunet_tiled_predict_matches_untiled(self):
        """VSUNet(tile_yx=...) predict_step ~= untiled predict on a small
        input (same model, conv halo differences only at tile borders are
        feather-blended; tolerance accounts for them)."""
        import jax

        from viscy_tpu.apps.cytoland.engine import VSUNet

        module = VSUNet(
            architecture="2D",
            model_config={"in_channels": 1, "out_channels": 1},
            tile_yx=(32, 32),
            tile_batch=4,
        )
        rng = np.random.default_rng(2)
        batch = {"source": jnp.asarray(rng.normal(size=(1, 1, 1, 64, 64)).astype(np.float32))}
        variables = module.init_variables(jax.random.PRNGKey(0), batch)
        tiled = module.predict_step(variables, batch)
        module.tile_yx = None
        direct = module.predict_step(variables, batch)
        assert tiled.shape == direct.shape
        # interior agreement (borders differ by conv halo, blended smoothly)
        t = np.asarray(tiled)[..., 8:-8, 8:-8]
        d = np.asarray(direct)[..., 8:-8, 8:-8]
        corr = np.corrcoef(t.ravel(), d.ravel())[0, 1]
        assert corr > 0.95, corr


def test_writer_fov_assembly_equivalence(tmp_path):
    """assemble_fovs=True (single write per FOV) must produce a byte-identical
    store to the per-window feathered read-modify-write path."""
    from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter
    from viscy_tpu.zarr_io import open_ome_zarr

    class _DM:
        source_channel = ["Phase"]
        target_channel = ["A", "B"]
        z_window_size = 5

    class _Trainer:
        _active_datamodule = _DM()

    rng = np.random.default_rng(0)
    depth, cz = 9, 5
    preds = [rng.random((1, 2, cz, 16, 16)).astype(np.float32) for _ in range(depth - cz + 1)]

    def run(assemble: bool) -> np.ndarray:
        out = tmp_path / f"pred_{assemble}.zarr"
        w = HCSPredictionWriter(str(out), overwrite=True, assemble_fovs=assemble)
        w.on_predict_start(_Trainer(), None)
        for z, p in enumerate(preds):
            w.write_on_batch_end(_Trainer(), None, p, {"index": [("A/1/0", 0, z)]}, z)
        w.on_predict_end(_Trainer(), None)
        plate = open_ome_zarr(out)
        _, pos = next(iter(plate.positions()))
        return np.asarray(pos["0"])

    a = run(True)
    b = run(False)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a[0, :, :depth].std() > 0  # real data landed


def test_writer_concurrent_flush_equivalence(tmp_path):
    """Completed-FOV flushes run on a concurrent pool (overlapping the next
    FOV's window blending); the store must be identical to the fully serial
    per-window RMW path across many (fov, t) keys."""
    from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter
    from viscy_tpu.zarr_io import open_ome_zarr

    class _DM:
        source_channel = ["Phase"]
        target_channel = ["A", "B"]
        z_window_size = 5

    class _Trainer:
        _active_datamodule = _DM()

    rng = np.random.default_rng(1)
    depth, cz = 9, 5
    fovs = ["A/1/0", "A/1/1", "B/2/0"]
    times = [0, 1]
    # windows arrive grouped per (fov, t) like the sliding-window loader
    stream = [
        (fov, t, z, rng.random((1, 2, cz, 16, 16)).astype(np.float32))
        for fov in fovs
        for t in times
        for z in range(depth - cz + 1)
    ]

    def run(assemble: bool, flush_workers: int):
        out = tmp_path / f"pred_{assemble}_{flush_workers}.zarr"
        w = HCSPredictionWriter(
            str(out),
            overwrite=True,
            assemble_fovs=assemble,
            flush_workers=flush_workers,
        )
        w.on_predict_start(_Trainer(), None)
        for i, (fov, t, z, p) in enumerate(stream):
            w.write_on_batch_end(_Trainer(), None, p, {"index": [(fov, t, z)]}, i)
        w.on_predict_end(_Trainer(), None)
        plate = open_ome_zarr(out)
        return {name: np.asarray(pos["0"]) for name, pos in plate.positions()}

    serial = run(False, 1)
    concurrent = run(True, 3)
    assert set(serial) == set(concurrent) == set(fovs)
    for name in fovs:
        assert serial[name].shape == concurrent[name].shape
        np.testing.assert_allclose(serial[name], concurrent[name], atol=1e-6)
        assert serial[name][1, :, :depth].std() > 0  # t=1 landed too


def test_pad_forward_crop_alignment_identity():
    """_pad_forward_crop must be spatially aligned for non-divisible
    inputs: with an identity forward, the output IS the input. The
    reference pads symmetrically (MONAI DivisiblePad method=symmetric,
    cytoland engine.py:48-53) and inverts exactly; an end-only pad with
    a center crop returns content shifted by pad/2 (regression)."""
    import jax.numpy as jnp

    from viscy_tpu.apps.cytoland.engine import (
        VSUNet,
        _center_crop_to_shape,
        _divisible_pad,
    )

    module = VSUNet(architecture="2D", model_config={"in_channels": 1, "out_channels": 1})
    module.forward = lambda variables, x, **kw: x  # identity net
    src = jnp.asarray(
        np.random.default_rng(0).random((1, 1, 1, 40, 52), np.float32)
    )
    out = module._pad_forward_crop({}, src)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src))
    # the pad/crop pair is an exact inverse on its own
    padded = _divisible_pad(src, 16)
    assert padded.shape[-2:] == (48, 64)
    roundtrip = _center_crop_to_shape(padded, src.shape[2:])
    np.testing.assert_array_equal(np.asarray(roundtrip), np.asarray(src))


class TestDeviceBlend:
    """On-device feathered blending (DeviceFovAssembler): the TPU-first
    redesign of the reference's host blend (prediction_writer.py:74-111) —
    identical math on device, one D2H fetch per (fov, t)."""

    class _DM:
        source_channel = ["Phase"]
        target_channel = ["A", "B"]
        z_window_size = 5

    class _Trainer:
        pass

    def _run(self, tmp_path, tag, *, device_blend, output_dtype="float32", preds=None):
        from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter
        from viscy_tpu.zarr_io import open_ome_zarr

        trainer = self._Trainer()
        trainer._active_datamodule = self._DM()
        out = tmp_path / f"pred_{tag}.zarr"
        w = HCSPredictionWriter(
            str(out),
            overwrite=True,
            device_blend=device_blend,
            output_dtype=output_dtype,
        )
        w.on_predict_start(trainer, None)
        for i, (fov, t, z, p) in enumerate(preds):
            arr = jnp.asarray(p) if device_blend else p
            w.write_on_batch_end(trainer, None, arr[None], {"index": [(fov, t, z)]}, i)
        w.on_predict_end(trainer, None)
        plate = open_ome_zarr(out)
        return {name: pos for name, pos in plate.positions()}

    def _stream(self, seed=0, fovs=("A/1/0", "B/2/0"), times=(0, 1), depth=9, cz=5):
        rng = np.random.default_rng(seed)
        return [
            (fov, t, z, rng.random((2, cz, 16, 16)).astype(np.float32))
            for fov in fovs
            for t in times
            for z in range(depth - cz + 1)
        ]

    def test_device_blend_matches_host_path(self, tmp_path):
        """device_blend=True (jax arrays in, on-device blend, per-FOV fetch)
        must write the same store as the host assemble path — including the
        FINAL fov, which only flushes at on_predict_end."""
        preds = self._stream()
        host = self._run(tmp_path, "host", device_blend=False, preds=preds)
        dev = self._run(tmp_path, "dev", device_blend=True, preds=preds)
        assert set(host) == set(dev)
        for name in host:
            a, b = np.asarray(host[name]["0"]), np.asarray(dev[name]["0"])
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
            assert a[1, :, :9].std() > 0  # t=1 landed

    def test_uint16_scaling_roundtrip(self, tmp_path):
        """output_dtype='uint16' writes quantized slabs + per-(channel, t)
        (lo, hi) ranges in .zattrs['prediction_scaling']; reconstruction is
        within one quantization step of the float32 store."""
        preds = self._stream(seed=3, fovs=("A/1/0",), times=(0,))
        f32 = self._run(tmp_path, "f32", device_blend=True, preds=preds)
        u16 = self._run(
            tmp_path, "u16", device_blend=True, output_dtype="uint16", preds=preds
        )
        pos = u16["A/1/0"]
        q = np.asarray(pos["0"])
        assert q.dtype == np.uint16
        scaling = pos.zattrs["prediction_scaling"]
        ref = np.asarray(f32["A/1/0"]["0"])
        for ci, label in enumerate(["A", "B"]):
            lo = scaling[label]["0"]["lo"]
            hi = scaling[label]["0"]["hi"]
            rec = lo + q[0, ci].astype(np.float64) / 65535 * (hi - lo)
            step = (hi - lo) / 65535
            np.testing.assert_allclose(rec, ref[0, ci], atol=step + 1e-7)

    def test_float16_dtype(self, tmp_path):
        preds = self._stream(seed=4, fovs=("A/1/0",), times=(0,))
        f16 = self._run(
            tmp_path, "f16", device_blend=True, output_dtype="float16", preds=preds
        )
        f32 = self._run(tmp_path, "f32b", device_blend=True, preds=preds)
        a = np.asarray(f16["A/1/0"]["0"])
        assert a.dtype == np.float16
        np.testing.assert_allclose(
            a.astype(np.float32), np.asarray(f32["A/1/0"]["0"]), atol=1e-3
        )

    def test_trainer_keeps_predictions_on_device(self):
        """The trainer must skip device_get when a callback sets
        wants_device_predictions (and not when return_predictions=True)."""
        from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter

        w = HCSPredictionWriter("/tmp/unused.zarr", device_blend=True)
        assert w.wants_device_predictions
        w2 = HCSPredictionWriter("/tmp/unused.zarr", device_blend=False)
        assert not w2.wants_device_predictions
