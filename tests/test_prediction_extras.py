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
