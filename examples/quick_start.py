# %% [markdown]
"""
# Quick Start: Cytoland virtual staining (TPU-native)

Joint virtual staining of nuclei and plasma membrane from label-free
images with the VSCyto2D-style model, mirroring the reference walkthrough
(``applications/cytoland/examples/vcp_tutorials/quick_start.py``) on the
JAX/TPU stack.

* With no arguments this script builds a SYNTHETIC OME-Zarr plate and a
  randomly initialized tiny model, so the full pipeline runs offline.
* To reproduce the released VSCyto2D results, download the checkpoint and
  test dataset named in the reference guide and set:

      VISCY_DATA=/path/to/a549_hoechst_cellmask_test.zarr
      VISCY_CKPT=/path/to/epoch=399-step=23200.ckpt   # torch ckpt, converted below

Run: ``python examples/quick_start.py`` (CPU works; TPU via your JAX install).
"""

# %%
import os
from pathlib import Path

import numpy as np

from viscy_tpu.apps.cytoland.engine import VSUNet
from viscy_tpu.data.hcs import HCSDataModule
from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter
from viscy_tpu.training.trainer import Trainer
from viscy_tpu.transforms import NormalizeSampled
from viscy_tpu.zarr_io.store import open_ome_zarr

root = Path(os.environ.get("VISCY_OUT", "quick_start_out"))
root.mkdir(exist_ok=True)

# %% Input data: user zarr or synthetic fallback
data_path = os.environ.get("VISCY_DATA")
if data_path is None:
    from viscy_tpu.zarr_io.synthetic import build_hcs_plate

    data_path = root / "synthetic_plate.zarr"
    if not Path(data_path).exists():
        build_hcs_plate(
            data_path,
            ["Phase3D", "Nuclei", "Membrane"],
            zyx_shape=(1, 256, 256),
            dtype=np.float32,
            max_value=1.0,
            norm_meta=True,  # pre-computed stats; real data: `viscy preprocess`
        )
    source_channel, target_channels = ["Phase3D"], ["Nuclei", "Membrane"]
else:
    source_channel, target_channels = ["Phase3D"], ["Nuclei", "Membrane"]

# %% Model: released architecture (VSCyto2D = 2D FCMAE-UNeXt2)
released_cfg = dict(
    in_channels=1,
    out_channels=2,
    encoder_blocks=(3, 3, 9, 3),
    dims=(96, 192, 384, 768),
    decoder_conv_blocks=2,
    stem_kernel_size=(1, 2, 2),
    in_stack_depth=1,
    pretraining=False,
)
tiny_cfg = dict(
    in_channels=1,
    out_channels=2,
    encoder_blocks=(1, 1),
    dims=(16, 32),
    decoder_conv_blocks=1,
    stem_kernel_size=(1, 2, 2),
    in_stack_depth=1,
    pretraining=False,
)
ckpt = os.environ.get("VISCY_CKPT")
module = VSUNet(
    architecture="fcmae", model_config=released_cfg if ckpt else tiny_cfg
)

if ckpt:
    # torch checkpoint -> flax params (state-dict rule tables audited
    # key-for-key against the reference source in tests/test_parity.py),
    # saved as a weights-only orbax checkpoint the trainer can restore
    import orbax.checkpoint as ocp

    from viscy_tpu.training.convert import (
        convert_fcmae_state_dict,
        load_torch_checkpoint,
    )

    params = convert_fcmae_state_dict(load_torch_checkpoint(ckpt))
    orbax_dir = (root / "converted_ckpt").absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(orbax_dir, {"params": params}, force=True)
    ckptr.wait_until_finished()
    module.ckpt_path = str(orbax_dir)

# %% Predict one plate -> OME-Zarr, through the real CLI plumbing
dm = HCSDataModule(
    data_path=str(data_path),
    source_channel=source_channel,
    target_channel=target_channels,
    z_window_size=1,
    batch_size=1,
    num_workers=0,
    normalizations=[
        NormalizeSampled(
            keys=source_channel, level="fov_statistics", subtrahend="median", divisor="iqr"
        )
    ],
)
output_path = root / "prediction.zarr"
writer = HCSPredictionWriter(str(output_path), overwrite=True)
trainer = Trainer(default_root_dir=str(root / "logs"), callbacks=[writer])
trainer.predict(module, dm, ckpt_path=module.ckpt_path)
print(f"predictions written to {output_path}")

# %% Visualize: source / virtual nuclei / virtual membrane
plate_in = open_ome_zarr(data_path, mode="r")
plate_out = open_ome_zarr(output_path, mode="r")
fov_name, pos_out = next(iter(plate_out.positions()))
pos_in = plate_in[fov_name]
phase = np.asarray(pos_in["0"][0, 0, 0])
vs = np.asarray(pos_out["0"][0, :, 0])

try:
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, img, title in zip(
        axes, [phase, vs[0], vs[1]], ["label-free input", "virtual nuclei", "virtual membrane"]
    ):
        ax.imshow(img, cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(root / "quick_start.png", dpi=120, bbox_inches="tight")
    print(f"figure saved to {root / 'quick_start.png'}")
except ImportError:
    print("matplotlib not installed; skipping the figure")
