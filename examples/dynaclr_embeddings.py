# %% [markdown]
"""
# DynaCLR: contrastive cell embeddings end-to-end (TPU-native)

Train a contrastive encoder on tracked single cells, extract embeddings
to an AnnData zarr store, and export the self-contained interactive HTML
viewer — the reference DynaCLR workflow
(``applications/dynaclr/examples``) on the JAX/TPU stack.

* With no arguments everything runs offline on a synthetic plate with
  synthetic tracks.
* For real data, point ``VISCY_DATA``/``VISCY_TRACKS`` at an HCS OME-Zarr
  plate and its tracking CSVs (``<fov>/tracks.csv``, ULTRACK columns) and
  raise the model/patch sizes to the production config
  (``configs/dynaclr_fit.yml``).

Run: ``python examples/dynaclr_embeddings.py``
"""

# %%
import os
from pathlib import Path

import numpy as np

from viscy_tpu.apps.dynaclr.engine import ContrastiveModule
from viscy_tpu.data.triplet import TripletDataModule
from viscy_tpu.models.contrastive.loss import NTXentLoss
from viscy_tpu.training.callbacks.embedding_writer import (
    EmbeddingWriter,
    read_embedding_dataset,
)
from viscy_tpu.training.trainer import Trainer
from viscy_tpu.transforms import BatchedRandFlipd, NormalizeSampled

root = Path(os.environ.get("VISCY_OUT", "dynaclr_out"))
root.mkdir(exist_ok=True)

# %% Data: user plate+tracks or a synthetic fixture
data_path = os.environ.get("VISCY_DATA")
tracks_path = os.environ.get("VISCY_TRACKS", data_path)
channels = os.environ.get("VISCY_CHANNELS", "Phase,GFP").split(",")
if data_path is None:
    import pandas as pd

    from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr
    from viscy_tpu.zarr_io.synthetic import inject_uniform_norm_meta

    data_path = tracks_path = root / "plate.zarr"
    if not Path(data_path).exists():
        build_hcs_plate(
            data_path,
            channels,
            zyx_shape=(5, 128, 128),
            rows=("A",),
            cols=("1", "2"),
            fovs=("0", "1"),
            num_timepoints=3,
            seed=0,
        )
        inject_uniform_norm_meta(data_path, channels)
        rng = np.random.default_rng(0)
        plate = open_ome_zarr(data_path)
        for name, _ in plate.positions():
            rows = []
            for track_id in range(3):
                y, x = rng.integers(40, 88, 2)
                for t in range(3):
                    rows.append(
                        dict(
                            track_id=track_id,
                            t=t,
                            y=int(y + rng.integers(-2, 3)),
                            x=int(x + rng.integers(-2, 3)),
                            id=track_id * 10 + t,
                            parent_track_id=-1,
                            parent_id=-1,
                        )
                    )
            pd.DataFrame(rows).to_csv(Path(data_path) / name / "tracks.csv", index=False)

# %% Contrastive training (NT-Xent over triplet batches)
dm = TripletDataModule(
    data_path=str(data_path),
    tracks_path=str(tracks_path),
    source_channel=channels,
    z_range=(0, 5),
    initial_yx_patch_size=(64, 64),
    final_yx_patch_size=(32, 32),
    batch_size=4,
    split_ratio=0.5,
    normalizations=[NormalizeSampled(keys=channels, level="fov_statistics")],
    augmentations=[BatchedRandFlipd(keys=channels, prob=0.5)],
)
module = ContrastiveModule(
    encoder=dict(
        backbone="convnext_tiny",
        in_channels=len(channels),
        in_stack_depth=5,
        stem_kernel_size=(5, 4, 4),
        stem_stride=(5, 4, 4),
        embedding_dim=768,
        projection_dim=32,
    ),
    loss_function=NTXentLoss(temperature=0.07),
    lr=1e-3,
)
trainer = Trainer(
    max_epochs=int(os.environ.get("VISCY_EPOCHS", "1")),
    default_root_dir=str(root / "logs"),
)
trainer.fit(module, dm)

# %% Embedding extraction -> AnnData zarr
emb_path = root / "embeddings.zarr"
writer = EmbeddingWriter(str(emb_path))
pred_trainer = Trainer(default_root_dir=str(root / "logs"), callbacks=[writer])
pred_trainer.predict(module, dm, ckpt_path=str(root / "logs" / "checkpoints" / "last"))
ds = read_embedding_dataset(emb_path)
print(f"{ds['features'].shape[0]} embeddings x {ds['features'].shape[1]} dims -> {emb_path}")

# %% Interactive HTML viewer (no dash/plotly needed — single offline file)
from viscy_tpu.evaluation.visualization import EmbeddingVisualizationApp  # noqa: E402

fovs = ds["index"]["fov_name"].unique().tolist()
app = EmbeddingVisualizationApp(
    features_path=str(emb_path),
    data_path=str(data_path),
    tracks_path=str(tracks_path),
    channels_to_display=channels,
    fov_tracks={f: "all" for f in fovs},
    z_range=(0, 5),
    yx_patch_size=(32, 32),
    output_dir=str(root / "viewer"),
)
app.preload_images()
html = app.run()
print(f"open {html} in a browser")
