"""Precompute normalized arrays (reference ``viscy_utils/trainer.py:141``
``precompute`` subcommand and ``precompute.py``): write a derived OME-Zarr
store with normalization applied, so training skips per-sample
normalization entirely."""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from viscy_tpu.zarr_io.store import open_ome_zarr

_logger = logging.getLogger("viscy_tpu")


def precompute_normalized(
    data_path: str | Path,
    output_path: str | Path,
    channel_names: list[str],
    level: str = "fov_statistics",
    subtrahend: str = "mean",
    divisor: str = "std",
) -> Path:
    """Write (x - sub) / div per channel into a new HCS store."""
    src = open_ome_zarr(data_path, mode="r")
    dst = open_ome_zarr(
        output_path, layout="hcs", mode="w-", channel_names=channel_names
    )
    ch_idx = [src.channel_names.index(c) for c in channel_names]
    for name, pos in src.positions():
        row, col, fov = name.split("/")
        out_pos = dst.create_position(row, col, fov)
        norm = pos.zattrs.get("normalization", {})
        img = pos["0"]
        t, _, z, y, x = img.shape
        out = out_pos.create_zeros("0", (t, len(ch_idx), z, y, x), np.float32)
        for ci, (ch, idx) in enumerate(zip(channel_names, ch_idx)):
            stats = norm.get(ch, {}).get(level, {})
            sub = float(stats.get(subtrahend, 0.0))
            div = float(stats.get(divisor, 1.0)) + 1e-8
            for ti in range(t):
                data = img[ti, idx].astype(np.float32)
                out[ti, ci] = (data - sub) / div
        # carry normalization metadata forward (identity after precompute)
        out_pos.zattrs["normalization"] = {
            ch: {level: {subtrahend: 0.0, divisor: 1.0}} for ch in channel_names
        }
        _logger.info(f"Precomputed {name}")
    return Path(output_path)


def convert_to_anndata(
    embeddings_path: str | Path, output_path: str | Path
) -> Path:
    """Convert an embedding dataset to an AnnData zarr store (reference
    ``trainer.py:187``): via the installed anndata package when present,
    otherwise through the in-repo spec-compliant writer
    (``evaluation.anndata_lite``) — either way downstream AnnData readers
    get a real store, not a bespoke bundle."""
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    ds = read_embedding_dataset(embeddings_path)
    output_path = Path(output_path)
    obs = ds["index"] if "index" in ds else ds.obs
    # obsm key X_projections matches EmbeddingWriter's stores, so a
    # converted store round-trips through the same readers
    try:
        import anndata as ad

        adata = ad.AnnData(X=np.asarray(ds["features"]), obs=obs)
        if "projections" in ds:
            adata.obsm["X_projections"] = np.asarray(ds["projections"])
        adata.write_zarr(output_path)
    except ImportError:
        from viscy_tpu.evaluation.anndata_lite import AnnDataLite, write_anndata_zarr

        obsm = (
            {"X_projections": np.asarray(ds["projections"])}
            if "projections" in ds
            else None
        )
        write_anndata_zarr(
            output_path,
            AnnDataLite(np.asarray(ds["features"]), obs=obs.reset_index(drop=True), obsm=obsm),
        )
    return output_path
