"""Checkpoint save / resume / encoder-transfer round trips."""

import numpy as np
import pytest

from viscy_tpu.apps.cytoland.engine import FcmaeUNet, MaskedMSELoss, VSUNet
from viscy_tpu.data.hcs import HCSDataModule
from viscy_tpu.data.host_transforms import HostRandWeightedCropd
from viscy_tpu.training.losses.mixed_loss import MixedLoss
from viscy_tpu.training.trainer import Trainer
from viscy_tpu.transforms import NormalizeSampled

TINY = dict(
    in_channels=1,
    out_channels=1,
    encoder_blocks=(1, 1, 1, 1),
    dims=(8, 16, 32, 64),
    stem_kernel_size=(5, 4, 4),
    in_stack_depth=5,
)


def _dm(plate):
    return HCSDataModule(
        data_path=plate,
        source_channel="Phase",
        target_channel=["GFP"],
        z_window_size=5,
        batch_size=2,
        num_workers=2,
        yx_patch_size=(32, 32),
        split_ratio=0.5,
        include_fov_names=["A/1/0", "A/1/1"],
        normalizations=[NormalizeSampled(keys=["Phase", "GFP"], level="dataset_statistics")],
        augmentations=[
            HostRandWeightedCropd(
                keys=["Phase", "GFP", "weight"], w_key="weight",
                spatial_size=(5, 32, 32), num_samples=1,
            )
        ],
    )


def _module():
    return VSUNet(
        architecture="fcmae",
        model_config=dict(TINY, pretraining=False),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
        lr=1e-4,
    )


def test_checkpoint_save_and_resume(preprocessed_hcs_dataset, tmp_path):
    import jax

    dm = _dm(preprocessed_hcs_dataset)
    trainer = Trainer(
        max_epochs=1,
        limit_train_batches=2,
        limit_val_batches=1,
        default_root_dir=tmp_path / "run1",
        checkpoint_every_n_epochs=1,
    )
    module = _module()
    trainer.fit(module, dm)
    ckpts = list((tmp_path / "run1" / "checkpoints").glob("epoch=*"))
    assert ckpts, "no checkpoint written"
    assert (tmp_path / "run1" / "checkpoints" / "last").exists()

    params_before = jax.device_get(trainer.state.params)

    # resume into a fresh trainer
    trainer2 = Trainer(
        max_epochs=2,
        limit_train_batches=2,
        limit_val_batches=1,
        default_root_dir=tmp_path / "run2",
    )
    module2 = _module()
    trainer2.fit(module2, dm, ckpt_path=str(ckpts[0]))
    assert trainer2.global_step > 0
    # training continued (params moved on from the restored values)
    params_after = jax.device_get(trainer2.state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_before,
        params_after,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_encoder_only_transfer(preprocessed_hcs_dataset, tmp_path):
    """FCMAE pretrain -> encoder-only load into a fine-tune module
    (reference engine.py:855)."""
    import jax
    import orbax.checkpoint as ocp

    # pretrain one step and save
    dm = _dm(preprocessed_hcs_dataset)
    pre = FcmaeUNet(
        fit_mask_ratio=0.5,
        model_config=dict(TINY, pretraining=True),
        loss_function=MaskedMSELoss(),
    )
    trainer = Trainer(
        max_epochs=1,
        limit_train_batches=1,
        limit_val_batches=1,
        default_root_dir=tmp_path / "pre",
    )
    trainer.fit(pre, dm)
    ckpt = tmp_path / "pre" / "checkpoints" / "manual"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt.absolute(), {"params": jax.device_get(trainer.state.params)})
    ckptr.wait_until_finished()

    # fine-tune module with different out_channels loads encoder only
    ft = FcmaeUNet(
        encoder_only=True,
        ckpt_path=str(ckpt),
        model_config=dict(TINY, out_channels=2, pretraining=False),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    batch = ft.example_input()
    variables = ft.init_variables(jax.random.PRNGKey(0), batch)
    loaded = ft.load_pretrained(variables)
    pre_params = jax.device_get(trainer.state.params)
    got = jax.device_get(loaded["params"]["encoder"])
    flat_a = jax.tree_util.tree_leaves(pre_params["encoder"])
    flat_b = jax.tree_util.tree_leaves(got)
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))
    # decoder stays freshly initialized (the shuffle head is param-free)
    assert loaded["params"]["decoder"] is variables["params"]["decoder"]


def test_weights_only_checkpoint_restore(tmp_path):
    """A {'params': ...} orbax payload (converted released checkpoints,
    quick-start example) restores through load_checkpoint: weights land,
    extra_vars/opt_state/step stay fresh."""
    import jax
    import orbax.checkpoint as ocp

    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.training.trainer import Trainer

    module = VSUNet(
        architecture="2D",
        model_config={"in_channels": 1, "out_channels": 1},
        example_input_yx_shape=(16, 16),
    )
    variables = module.init_variables(jax.random.PRNGKey(7), module.example_input())
    ckpt_dir = (tmp_path / "weights_only").absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, {"params": jax.device_get(variables["params"])}, force=True)
    ckptr.wait_until_finished()

    trainer = Trainer(default_root_dir=tmp_path / "logs")
    trainer.state = trainer._init_state(module, None, 1)
    trainer.load_checkpoint(ckpt_dir, module)
    restored_leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    want_leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    np.testing.assert_allclose(np.asarray(restored_leaf), np.asarray(want_leaf))
    assert trainer.global_step == 0 and trainer.current_epoch == 0
