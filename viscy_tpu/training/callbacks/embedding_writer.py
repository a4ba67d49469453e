"""Embedding writer (reference ``callbacks/embedding_writer.py:219``).

Collects ``{features, projections, index}`` predictions and writes an
**AnnData zarr** store (:mod:`viscy_tpu.evaluation.anndata_lite` — the
on-disk spec the real ``anndata`` package reads/writes): ultrack index
columns as ``obs``, the primary embedding as ``X`` (``embedding_key``
selects features vs projections, reference ``:125``), the other array in
``obsm``, optional PCA / UMAP / PHATE reductions in
``obsm["X_{pca,umap,phate}"]`` (UMAP/PHATE via the upstream libraries
when installed, else the in-repo native implementations), and data
provenance in ``uns``.

``read_embedding_dataset`` reads both this AnnData layout and the
round-1 legacy layout (zarr arrays + ``index.parquet``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Literal

import numpy as np
import pandas as pd

from viscy_tpu.evaluation.anndata_lite import AnnDataLite, read_anndata_zarr
from viscy_tpu.training.callbacks.base import Callback

_logger = logging.getLogger("viscy_tpu")

__all__ = ["EmbeddingWriter", "write_embedding_dataset", "read_embedding_dataset"]


def write_embedding_dataset(
    output_path: Path | str,
    features: np.ndarray,
    index: pd.DataFrame,
    projections: np.ndarray | None = None,
    embedding_key: Literal["features", "projections"] = "features",
    umap_kwargs: dict | None = None,
    phate_kwargs: dict | None = None,
    pca_kwargs: dict | None = None,
    overwrite: bool = False,
    uns_metadata: dict | None = None,
    # legacy round-1 kwargs (still honored)
    provenance: dict | None = None,
    compute_pca: bool = False,
    pca_components: int = 8,
) -> AnnDataLite:
    """Write embeddings to an AnnData zarr store (reference
    ``write_embedding_dataset``, embedding_writer.py:105-215)."""
    output_path = Path(output_path)
    if output_path.exists() and not overwrite:
        raise FileExistsError(f"Output path {output_path} already exists.")

    obs = index.copy().reset_index(drop=True)
    if "fov_name" in obs.columns:
        obs["fov_name"] = obs["fov_name"].astype(str).str.strip("/")
    obs.index = obs.index.astype(str)

    features = np.asarray(features, np.float32)
    obsm: dict[str, np.ndarray] = {}
    if embedding_key == "projections":
        if projections is None:
            raise ValueError("embedding_key='projections' requires projections.")
        X = np.asarray(projections, np.float32)
        obsm["X_backbone"] = features
    else:
        X = features
        if projections is not None:
            obsm["X_projections"] = np.asarray(projections, np.float32)

    if compute_pca and pca_kwargs is None:
        pca_kwargs = {"n_components": pca_components}
    if pca_kwargs and X.shape[0] > 2:
        from sklearn.decomposition import PCA

        n = min(int(pca_kwargs.get("n_components", 8)), min(X.shape) - 1)
        try:
            obsm["X_pca"] = PCA(n_components=n).fit_transform(X).astype(np.float32)
        except Exception:
            _logger.warning("PCA computation failed", exc_info=True)
    if umap_kwargs is not None:
        try:
            from viscy_tpu.evaluation.dimensionality_reduction import compute_umap

            kw = dict(umap_kwargs)
            n_comp = kw.pop("n_components", 2)
            obsm["X_umap"] = compute_umap(X, n_components=n_comp, **kw).astype(
                np.float32
            )
        except Exception:
            _logger.warning("UMAP computation failed", exc_info=True)
    if phate_kwargs is not None:
        try:
            from viscy_tpu.evaluation.dimensionality_reduction import compute_phate

            kw = dict(phate_kwargs)
            n_comp = kw.pop("n_components", 2)
            obsm["X_phate"] = compute_phate(X, n_components=n_comp, **kw).astype(
                np.float32
            )
        except Exception:
            _logger.warning("PHATE computation failed", exc_info=True)

    uns = {str(k): v for k, v in {**(provenance or {}), **(uns_metadata or {})}.items()}
    adata = AnnDataLite(X=X, obs=obs, obsm=obsm, uns=uns)
    adata.write_zarr(output_path, overwrite=True)
    return adata


def read_embedding_dataset(path: Path | str):
    """Read an embedding store.

    AnnData zarr stores (this writer or the real ``anndata``) return an
    :class:`AnnDataLite`; the round-1 legacy layout (``features`` array +
    ``index.parquet``) is converted into the same container so downstream
    tools see one API.
    """
    path = Path(path)
    if (path / "index.parquet").exists():  # legacy round-1 layout
        import tensorstore as ts

        def _read(name):
            spec = {"driver": "zarr", "kvstore": {"driver": "file", "path": str(path / name)}}
            return np.asarray(ts.open(spec, open=True).result().read().result())

        features = _read("features")
        obsm = {}
        if (path / "projections").exists():
            obsm["X_projections"] = _read("projections")
        if (path / "PCA").exists():
            obsm["X_pca"] = _read("PCA")
        index = pd.read_parquet(path / "index.parquet")
        index.index = index.index.astype(str)
        return AnnDataLite(X=features, obs=index, obsm=obsm)
    return read_anndata_zarr(path)


class EmbeddingWriter(Callback):
    """Collects predictions and writes the AnnData store at predict end."""

    def __init__(
        self,
        output_path: str,
        write_projections: bool = True,
        embedding_key: Literal["features", "projections"] = "features",
        umap_kwargs: dict | None = None,
        phate_kwargs: dict | None = None,
        pca_kwargs: dict | None = None,
        compute_pca: bool = False,
        pca_components: int = 8,
        overwrite: bool = False,
    ) -> None:
        self.output_path = Path(output_path)
        self.write_projections = write_projections
        self.embedding_key = embedding_key
        self.umap_kwargs = umap_kwargs
        self.phate_kwargs = phate_kwargs
        self.pca_kwargs = pca_kwargs
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
        features = np.concatenate(self._features) if self._features else np.zeros((0, 0), np.float32)
        projections = np.concatenate(self._projections) if self._projections else None
        if self._indices:
            index = pd.DataFrame(self._indices)
        else:
            index = pd.DataFrame({"sample": np.arange(len(features))})
        dm = getattr(trainer, "_active_datamodule", None)
        uns = {
            "data_path": str(getattr(dm, "data_path", "")),
            "tracks_path": str(getattr(dm, "tracks_path", "")),
        }
        write_embedding_dataset(
            self.output_path,
            features,
            index,
            projections=projections,
            embedding_key=self.embedding_key,
            umap_kwargs=self.umap_kwargs,
            phate_kwargs=self.phate_kwargs,
            pca_kwargs=self.pca_kwargs,
            compute_pca=self.compute_pca,
            pca_components=self.pca_components,
            overwrite=True,
            uns_metadata=uns,
        )
        _logger.info(f"Wrote {len(features)} embeddings to {self.output_path}")
