"""Worker for the 2-process ``Trainer.fit`` e2e test (run via subprocess).

Unlike ``_multihost_worker.py`` (hand-rolled jitted step), this drives the
REAL production entry points end to end, the way a pod job would:

- ``maybe_initialize`` bootstraps ``jax.distributed`` from the
  ``VISCY_COORDINATOR``/``VISCY_NUM_PROCESSES``/``VISCY_PROCESS_ID`` env
  contract (the path ``viscy_tpu.training.cli.main`` runs on startup);
- ``HCSDataModule`` loaders auto-attach ``ShardedDistributedSampler`` at
  the ``DataLoader`` choke point (reference attach-under-DDP,
  ``viscy_data/gpu_aug.py:44-46``);
- ``Trainer.fit`` assembles global device batches from per-host shards
  (``shard_batch`` -> ``jax.make_array_from_process_local_data``) and
  rank-gates checkpoint/CSV writes.

The parent test compares rank 0's logged loss curve against a
single-process (num_procs=1) run of this same script on the same global
batch, and asserts disjoint per-host reads + a single checkpoint tree.
"""

import json
import os
import sys
from pathlib import Path

# run as a bare script: make the repo root importable regardless of the
# parent process's PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TOTAL_DEVICES = 4  # global mesh size, split evenly across the processes


def main() -> None:
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]
    plate = sys.argv[4]
    out_dir = Path(sys.argv[5])
    global_batch = int(sys.argv[6])

    ndev_local = TOTAL_DEVICES // num_procs
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev_local}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ["VISCY_COORDINATOR"] = f"localhost:{port}"
    os.environ["VISCY_NUM_PROCESSES"] = str(num_procs)
    os.environ["VISCY_PROCESS_ID"] = str(proc_id)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from viscy_tpu.parallel.distributed import is_rank_zero, maybe_initialize

    maybe_initialize()
    assert jax.process_count() == num_procs, (jax.process_count(), num_procs)
    assert jax.device_count() == TOTAL_DEVICES
    assert is_rank_zero() == (proc_id == 0)

    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.data import loader as loader_mod
    from viscy_tpu.data.hcs import HCSDataModule
    from viscy_tpu.training.losses.mixed_loss import MixedLoss
    from viscy_tpu.training.trainer import Trainer
    from viscy_tpu.transforms import BatchedCenterSpatialCropd, NormalizeSampled

    # spy on per-item reads to prove the hosts touch disjoint index sets
    reads: list[int] = []
    orig_item = loader_mod.DataLoader._load_item

    def spy(self, idx):
        reads.append(int(idx))
        return orig_item(self, idx)

    loader_mod.DataLoader._load_item = spy

    class _NoShuffleHCS(HCSDataModule):
        # shuffle=False keeps the multi-process global batch the same index
        # SET as the single-process batch (strided interleave vs contiguous
        # order); the sharded sampler still auto-attaches in DataLoader.
        def train_dataloader(self):
            dl = loader_mod.DataLoader(
                self.train_dataset,
                batch_size=max(1, self.batch_size // self.train_patches_per_stack),
                shuffle=False,
                num_workers=self.num_workers,
                drop_last=True,
                seed=self.seed,
            )
            dl.set_epoch(self._epoch)
            return dl

    dm = _NoShuffleHCS(
        data_path=plate,
        source_channel="Phase",
        target_channel=["GFP"],
        z_window_size=5,
        batch_size=global_batch // num_procs,  # reference: batch_size is per-process
        num_workers=2,
        yx_patch_size=(32, 32),
        split_ratio=0.5,
        include_fov_names=["A/1/0", "A/1/1"],
        normalizations=[
            NormalizeSampled(keys=["Phase", "GFP"], level="dataset_statistics")
        ],
        # deterministic, per-row independent (permutation-safe): the
        # multi-process global batch interleaves rows vs single-process
        augmentations=[
            BatchedCenterSpatialCropd(keys=["source", "target"], roi_size=(5, 32, 32))
        ],
    )
    module = VSUNet(
        architecture="fcmae",
        model_config=dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=(1, 1, 1, 1),
            dims=(8, 16, 32, 64),
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
            pretraining=False,
        ),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
        lr=1e-3,
    )
    trainer = Trainer(
        max_epochs=1,
        limit_train_batches=2,
        limit_val_batches=1,
        log_every_n_steps=1,
        default_root_dir=out_dir,
        checkpoint_every_n_epochs=1,
        use_tensorboard=False,
    )
    trainer.fit(module, dm)

    with open(out_dir / f"reads_rank{proc_id}.json", "w") as f:
        json.dump(sorted(set(reads)), f)
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
