"""Human-annotation joining for embedding datasets
(reference ``evaluation/annotation.py``).

Operates on the ``{features, index}`` embedding-dataset dicts produced by
:func:`~viscy_tpu.training.callbacks.embedding_writer.read_embedding_dataset`
(anndata/xarray are optional in this image). ``load_annotation`` joins an
annotation CSV onto the index by ``(fov_name, id)`` or
``(fov_name, t, track_id)``, resolving mitosis-frame duplicates by spatial
nearest-neighbor within a Chebyshev tolerance (reference
``annotation.py:204``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

__all__ = ["convert", "load_annotation", "load_annotation_anndata"]


def convert(
    embeddings: dict | str | Path,
    output_path: str | Path,
    overwrite: bool = False,
    return_anndata: bool = False,
):
    """Convert an embedding dataset to an AnnData zarr store (reference
    ``annotation.py:16``) — via the anndata package when installed,
    otherwise through the in-repo spec-compliant writer
    (``evaluation.anndata_lite``)."""
    from viscy_tpu.preprocess.precompute import convert_to_anndata
    from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset

    output_path = Path(output_path)
    if output_path.exists() and not overwrite:
        raise FileExistsError(f"Output path {output_path} already exists.")
    if isinstance(embeddings, dict):
        # materialize an on-disk dataset first so one converter handles both
        tmp = output_path.with_suffix(".tmp_embeddings")
        write_embedding_dataset(
            tmp,
            embeddings["features"],
            embeddings["index"],
            projections=embeddings.get("projections"),
        )
        embeddings = tmp
    result = convert_to_anndata(embeddings, output_path)
    if return_anndata:
        try:
            import anndata as ad

            return ad.read_zarr(result)
        except ImportError:
            # same X/obs/var/obsm surface, readable without the package
            from viscy_tpu.evaluation.anndata_lite import read_anndata_zarr

            return read_anndata_zarr(result)
    return None


def load_annotation(
    dataset: dict | pd.DataFrame,
    path: str | Path,
    name: str,
    categories: dict | None = None,
    spatial_tolerance: float = 4.0,
) -> pd.Series:
    """Join an annotation CSV column onto the embedding index
    (reference ``annotation.py:109`` ``load_annotation_anndata``).

    Returns the annotation series aligned to the index rows; when
    ``dataset`` is an embedding dict, the column is also added to
    ``dataset["index"]`` in place.
    """
    index = dataset if isinstance(dataset, pd.DataFrame) else dataset["index"]
    annotation = pd.read_csv(path)
    annotation["fov_name"] = annotation["fov_name"].astype(str).str.strip("/")
    obs_fov = index["fov_name"].astype(str).str.strip("/")

    if "id" in index.columns and "id" in annotation.columns:
        key_cols = ["fov_name", "id"]
        mi = pd.MultiIndex.from_arrays([obs_fov, index["id"]], names=key_cols)
    elif all(c in index.columns for c in ("fov_name", "t", "track_id")) and all(
        c in annotation.columns for c in ("fov_name", "t", "track_id")
    ):
        key_cols = ["fov_name", "t", "track_id"]
        mi = pd.MultiIndex.from_arrays(
            [obs_fov, index["t"], index["track_id"]], names=key_cols
        )
    else:
        raise KeyError(
            "Cannot join annotations: embeddings have neither (fov_name, id) "
            "nor (fov_name, t, track_id) columns."
        )

    annotation_indexed = annotation.set_index(key_cols)
    if annotation_indexed.index.is_unique:
        selected = annotation_indexed.reindex(mi)[name]
    else:
        spatial_cols = ("y", "x")
        if not all(c in annotation.columns for c in spatial_cols) or not all(
            c in index.columns for c in spatial_cols
        ):
            raise ValueError(
                f"Annotation index {key_cols} has duplicate keys (typical of "
                "mitosis split frames) but cannot disambiguate: both sides "
                "must carry (y, x) columns for spatial matching."
            )
        selected = _spatial_nearest_select(
            annotation_indexed,
            mi=mi,
            embedding_y=np.asarray(index["y"], float),
            embedding_x=np.asarray(index["x"], float),
            value_col=name,
            tolerance=spatial_tolerance,
        )

    if categories:
        selected = selected.astype("category").cat.rename_categories(categories)
    selected.index = index.index
    index[name] = selected
    return selected


def _spatial_nearest_select(
    annotation_indexed: pd.DataFrame,
    *,
    mi: pd.MultiIndex,
    embedding_y: np.ndarray,
    embedding_x: np.ndarray,
    value_col: str,
    tolerance: float,
) -> pd.Series:
    """Resolve duplicate annotation keys by the closest ``(y, x)`` within a
    Chebyshev ``tolerance`` (square kernel); unmatched rows stay NaN."""
    n = len(mi)
    emb_df = pd.DataFrame(
        {"_emb_idx": np.arange(n), "_emb_y": embedding_y, "_emb_x": embedding_x},
        index=mi,
    ).reset_index()
    ann_df = annotation_indexed[["y", "x", value_col]].reset_index()
    ann_df = ann_df.rename(columns={"y": "_ann_y", "x": "_ann_x"})
    key_cols = list(mi.names)
    paired = emb_df.merge(ann_df, on=key_cols, how="left")
    dist = np.maximum(
        (paired["_ann_y"] - paired["_emb_y"]).abs(),
        (paired["_ann_x"] - paired["_emb_x"]).abs(),
    )
    paired["_dist"] = dist.where(dist <= tolerance)
    best = paired.dropna(subset=["_dist"])
    best = best.loc[best.groupby("_emb_idx")["_dist"].idxmin()]
    out = pd.Series(pd.NA, index=np.arange(n), name=value_col, dtype="object")
    out.loc[best["_emb_idx"].to_numpy()] = best[value_col].to_numpy()
    return out


def load_annotation_anndata(adata, path: str | Path, name: str, **kwargs):
    """Join an annotation CSV column onto an AnnData(-Lite) object's obs and
    return the object (reference ``annotation.py`` ``load_annotation_anndata``).
    Raises KeyError when the task column is absent from the CSV."""
    cols = pd.read_csv(path, nrows=1).columns
    if name not in cols:
        raise KeyError(f"task {name!r} not in annotation CSV columns {list(cols)}")
    load_annotation(adata, path, name, **kwargs)
    return adata
