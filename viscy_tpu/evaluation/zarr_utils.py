"""Selective updates to embedding datasets
(reference ``evaluation/zarr_utils.py``).

The reference edits AnnData zarr stores in place (``append_to_anndata_zarr``,
``merge_csv_into_obs``). Here the same operations target the tensorstore
zarr + ``index.parquet`` embedding layout; when anndata is installed the
AnnData path also works.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

__all__ = ["append_to_embedding_dataset", "append_to_anndata_zarr", "merge_csv_into_obs"]


def append_to_embedding_dataset(
    path: str | Path,
    *,
    obsm: dict[str, Any] | None = None,
    obs: pd.DataFrame | None = None,
    uns: dict | None = None,
) -> None:
    """Selectively update arrays (obsm), the index table (obs), or metadata
    (uns) of an existing embedding dataset without rewriting X
    (reference ``zarr_utils.py:13``). Handles both the AnnData zarr layout
    and the legacy round-1 layout (``index.parquet``)."""
    path = Path(path)
    if (path / "index.parquet").exists():  # legacy layout
        import tensorstore as ts

        if obsm:
            for key, value in obsm.items():
                value = np.ascontiguousarray(value)
                spec = {
                    "driver": "zarr",
                    "kvstore": {"driver": "file", "path": str(path / key)},
                    "metadata": {"shape": list(value.shape), "dtype": value.dtype.str,
                                 "chunks": list(value.shape)},
                    "create": True,
                    "delete_existing": True,
                }
                ts.open(spec).result().write(value).result()
        if obs is not None:
            obs.to_parquet(path / "index.parquet")
        if uns:
            meta_path = path / "metadata.json"
            meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
            meta.setdefault("uns", {}).update(
                {k: v.tolist() if isinstance(v, np.ndarray) else v for k, v in uns.items()}
            )
            meta_path.write_text(json.dumps(meta, indent=2, default=str))
        return
    if not (path / ".zattrs").exists():
        raise FileNotFoundError(f"{path} is not an embedding dataset")
    from viscy_tpu.evaluation.anndata_lite import (
        _ARRAY_ATTRS,
        _init_group,
        _write_array,
        _write_dataframe,
        _write_numeric_ts,
    )

    if obsm:
        _init_group(path / "obsm", {"encoding-type": "dict", "encoding-version": "0.1.0"})
        for key, value in obsm.items():
            _write_numeric_ts(path / "obsm" / key, np.asarray(value, np.float32), attrs=_ARRAY_ATTRS)
    if obs is not None:
        _write_dataframe(path / "obs", obs)
    if uns:
        _init_group(path / "uns", {"encoding-type": "dict", "encoding-version": "0.1.0"})
        for key, value in uns.items():
            if isinstance(value, str):
                _write_array(
                    path / "uns" / key,
                    np.asarray(value, dtype=object).reshape(()),
                    attrs={"encoding-type": "string", "encoding-version": "0.2.0"},
                )
            else:
                _write_array(path / "uns" / key, np.asarray(value), attrs=_ARRAY_ATTRS)


# reference-compatible name
append_to_anndata_zarr = append_to_embedding_dataset


def merge_csv_into_obs(
    dataset: dict | pd.DataFrame,
    csv_path: str | Path,
    merge_key: str | list[str] = "id",
    columns: list[str] | None = None,
    prefix: str = "",
) -> tuple[dict | pd.DataFrame, dict[str, int]]:
    """Merge CSV columns into the embedding index by key
    (reference ``zarr_utils.py:77``). Only requested columns are read and
    rows are pre-filtered to keys present in the index. Returns the dataset
    and ``{column: non-null merged count}`` stats."""
    # dict, AnnDataLite (both index with "index"), or a bare DataFrame
    index = dataset if isinstance(dataset, pd.DataFrame) else dataset["index"]
    keys = [merge_key] if isinstance(merge_key, str) else list(merge_key)
    usecols = None if columns is None else list(dict.fromkeys(keys + columns))
    csv = pd.read_csv(csv_path, usecols=usecols)
    if columns is None:
        columns = [c for c in csv.columns if c not in keys]
    # pre-filter to keys present in obs
    mask = np.ones(len(csv), bool)
    for k in keys:
        mask &= csv[k].isin(index[k]).to_numpy()
    csv = csv.loc[mask, keys + columns].drop_duplicates(subset=keys)
    renamed = {c: f"{prefix}{c}" for c in columns}
    merged = index.merge(csv.rename(columns=renamed), on=keys, how="left")
    merged.index = index.index
    stats = {renamed[c]: int(merged[renamed[c]].notna().sum()) for c in columns}
    if isinstance(dataset, pd.DataFrame):
        return merged, stats
    if isinstance(dataset, dict):
        dataset["index"] = merged
    else:  # AnnDataLite / AnnData
        dataset.obs = merged
    return dataset, stats
