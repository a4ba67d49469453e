"""Embedding writer (reference ``callbacks/embedding_writer.py:219``).

Collects ``{features, projections, index}`` predictions and writes an
embedding dataset: zarr arrays for features/projections (tensorstore) and
a parquet table for the ultrack index columns, plus optional PCA. The
reference writes an AnnData/xarray zarr; this environment has neither
installed, so the layout is a plain zarr group + ``index.parquet`` with
the same semantic content (``read_embedding_dataset`` returns the arrays
and the index DataFrame).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd

from viscy_tpu.data.typing import ULTRACK_INDEX_COLUMNS
from viscy_tpu.training.callbacks.base import Callback

_logger = logging.getLogger("viscy_tpu")

__all__ = ["EmbeddingWriter", "write_embedding_dataset", "read_embedding_dataset"]


def _write_array(path: Path, name: str, data: np.ndarray) -> None:
    import tensorstore as ts

    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(path / name)},
        "metadata": {
            "shape": list(data.shape),
            "dtype": np.dtype(data.dtype).str,
            "chunks": [min(4096, data.shape[0])] + list(data.shape[1:]),
            "compressor": {"id": "blosc", "cname": "zstd", "clevel": 1, "shuffle": 1},
        },
    }
    arr = ts.open(spec, create=True, delete_existing=True, write=True).result()
    arr[:].write(data).result()


def _read_array(path: Path, name: str) -> np.ndarray:
    import tensorstore as ts

    spec = {"driver": "zarr", "kvstore": {"driver": "file", "path": str(path / name)}}
    return np.asarray(ts.open(spec, open=True).result().read().result())


def write_embedding_dataset(
    output_path: Path | str,
    features: np.ndarray,
    index: pd.DataFrame,
    projections: np.ndarray | None = None,
    provenance: dict | None = None,
    compute_pca: bool = False,
    pca_components: int = 8,
) -> None:
    """Write features/projections + index to an embedding store."""
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)
    _write_array(output_path, "features", np.asarray(features, np.float32))
    if projections is not None:
        _write_array(output_path, "projections", np.asarray(projections, np.float32))
    if compute_pca and features.shape[0] > pca_components:
        from sklearn.decomposition import PCA

        n = min(pca_components, min(features.shape) - 1)
        pca = PCA(n_components=n)
        _write_array(output_path, "PCA", pca.fit_transform(features).astype(np.float32))
    index.to_parquet(output_path / "index.parquet")
    meta = {"n_samples": int(features.shape[0]), "provenance": provenance or {}}
    with open(output_path / "metadata.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def read_embedding_dataset(path: Path | str) -> dict:
    """Read an embedding dataset; returns dict with arrays and the index."""
    path = Path(path)
    out = {"features": _read_array(path, "features")}
    for name in ("projections", "PCA"):
        if (path / name).exists():
            out[name] = _read_array(path, name)
    out["index"] = pd.read_parquet(path / "index.parquet")
    return out


class EmbeddingWriter(Callback):
    """Collects predictions and writes the embedding dataset at predict end."""

    def __init__(
        self,
        output_path: str,
        write_projections: bool = True,
        compute_pca: bool = False,
        pca_components: int = 8,
        overwrite: bool = False,
    ) -> None:
        self.output_path = Path(output_path)
        self.write_projections = write_projections
        self.compute_pca = compute_pca
        self.pca_components = pca_components
        self.overwrite = overwrite
        self._features: list[np.ndarray] = []
        self._projections: list[np.ndarray] = []
        self._indices: list[dict] = []

    def on_predict_start(self, trainer, module) -> None:
        if self.output_path.exists() and not self.overwrite:
            raise FileExistsError(f"{self.output_path} exists; pass overwrite=True")
        self._features.clear()
        self._projections.clear()
        self._indices.clear()

    def write_on_batch_end(self, trainer, module, prediction, batch, batch_idx) -> None:
        self._features.append(np.asarray(prediction["features"], np.float32))
        if self.write_projections and "projections" in prediction:
            self._projections.append(np.asarray(prediction["projections"], np.float32))
        idx = batch.get("index", [])
        if isinstance(idx, dict):
            # collated dict of lists -> list of dicts
            keys = list(idx)
            n = len(idx[keys[0]])
            idx = [{k: idx[k][i] for k in keys} for i in range(n)]
        self._indices.extend(idx)

    def on_predict_end(self, trainer, module) -> None:
        features = np.concatenate(self._features) if self._features else np.zeros((0, 0))
        projections = (
            np.concatenate(self._projections) if self._projections else None
        )
        if self._indices:
            index = pd.DataFrame(self._indices)
        else:
            index = pd.DataFrame({"sample": np.arange(len(features))})
        dm = getattr(trainer, "_active_datamodule", None)
        provenance = {
            "data_path": str(getattr(dm, "data_path", "")),
            "tracks_path": str(getattr(dm, "tracks_path", "")),
        }
        write_embedding_dataset(
            self.output_path,
            features,
            index,
            projections=projections,
            provenance=provenance,
            compute_pca=self.compute_pca,
            pca_components=self.pca_components,
        )
        _logger.info(f"Wrote {len(features)} embeddings to {self.output_path}")
