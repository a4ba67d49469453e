"""Canonical cell-index parquet schema and builders
(reference ``viscy_data/cell_index.py:53,237,361,528``).

One row per (cell observation, channel): tracking results joined with
experiment metadata, normalization statistics, and focus slices — the
substrate for the DynaCLR multi-experiment datamodules and
``FlexibleBatchSampler``.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from viscy_tpu.zarr_io.store import open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "CELL_INDEX_SCHEMA",
    "validate_cell_index",
    "write_cell_index",
    "read_cell_index",
    "build_timelapse_cell_index",
    "preprocess_cell_index",
]

CELL_INDEX_CORE_COLUMNS = ["cell_id", "experiment", "store_path", "fov", "y", "x", "t"]
CELL_INDEX_GROUPING_COLUMNS = ["well", "channel_name"]

CELL_INDEX_SCHEMA = pa.schema(
    [
        ("cell_id", pa.string()),
        ("experiment", pa.string()),
        ("store_path", pa.string()),
        ("tracks_path", pa.string()),
        ("fov", pa.string()),
        ("well", pa.string()),
        ("y", pa.float32()),
        ("x", pa.float32()),
        ("z", pa.int16()),
        ("perturbation", pa.string()),
        ("channel_name", pa.string()),
        ("t", pa.int32()),
        ("track_id", pa.int32()),
        ("global_track_id", pa.string()),
        ("lineage_id", pa.string()),
        ("parent_track_id", pa.int32()),
        ("hours_post_perturbation", pa.float32()),
        ("interval_minutes", pa.float32()),
        ("gene_name", pa.string()),
        ("reporter", pa.string()),
        ("sgRNA", pa.string()),
        ("microscope", pa.string()),
        ("marker", pa.string()),
        ("organelle", pa.string()),
        ("pixel_size_xy_um", pa.float32()),
        ("pixel_size_z_um", pa.float32()),
        ("T_shape", pa.int32()),
        ("C_shape", pa.int32()),
        ("Z_shape", pa.int32()),
        ("Y_shape", pa.int32()),
        ("X_shape", pa.int32()),
        ("z_focus_mean", pa.float32()),
        ("norm_mean", pa.float32()),
        ("norm_std", pa.float32()),
        ("norm_median", pa.float32()),
        ("norm_iqr", pa.float32()),
        ("norm_max", pa.float32()),
        ("norm_min", pa.float32()),
    ]
)

_REQUIRED = set(CELL_INDEX_CORE_COLUMNS + CELL_INDEX_GROUPING_COLUMNS)


def validate_cell_index(df: pd.DataFrame, *, strict: bool = False) -> list[str]:
    """Return a list of problems; raise when ``strict`` and problems exist."""
    problems = []
    missing = _REQUIRED - set(df.columns)
    if missing:
        problems.append(f"missing required columns: {sorted(missing)}")
    unknown = set(df.columns) - set(CELL_INDEX_SCHEMA.names)
    if unknown:
        problems.append(f"unknown columns: {sorted(unknown)}")
    if "cell_id" in df.columns and df["cell_id"].duplicated().any():
        problems.append("duplicate cell_id values")
    if strict and problems:
        raise ValueError("; ".join(problems))
    return problems


def write_cell_index(df: pd.DataFrame, path: str | Path) -> None:
    """Write the cell index with the canonical arrow schema (known columns
    cast; extra columns preserved as-is)."""
    fields = []
    for name in df.columns:
        idx = CELL_INDEX_SCHEMA.get_field_index(name)
        if idx >= 0:
            fields.append(CELL_INDEX_SCHEMA.field(idx))
        else:
            fields.append(pa.field(name, pa.from_numpy_dtype(df[name].to_numpy().dtype)))
    table = pa.Table.from_pandas(df, schema=pa.schema(fields), preserve_index=False)
    import pyarrow.parquet as pq

    pq.write_table(table, path)


def read_cell_index(path: str | Path) -> pd.DataFrame:
    df = pd.read_parquet(path)
    validate_cell_index(df)
    return df


def _reconstruct_lineage(tracks: pd.DataFrame) -> pd.DataFrame:
    """Assign each track its lineage root via parent_track_id chains."""
    tracks = tracks.copy()
    parent = {}
    for gtid, grp in tracks.groupby("global_track_id"):
        ptid = grp["parent_track_id"].iloc[0]
        fov = grp["fov"].iloc[0] if "fov" in grp else ""
        exp = grp["experiment"].iloc[0] if "experiment" in grp else ""
        if ptid is not None and ptid >= 0:
            parent[gtid] = f"{exp}_{fov}_{int(ptid)}"
        else:
            parent[gtid] = None

    def find_root(gtid: str, _seen=None) -> str:
        _seen = _seen or set()
        while parent.get(gtid) is not None and parent[gtid] in parent and gtid not in _seen:
            _seen.add(gtid)
            gtid = parent[gtid]
        return gtid

    tracks["lineage_id"] = tracks["global_track_id"].map(find_root)
    return tracks


def build_timelapse_cell_index(
    experiment: str,
    store_path: str | Path,
    tracks_path: str | Path,
    channel_names: list[str] | None = None,
    perturbation: str = "",
    hours_post_perturbation_start: float = 0.0,
    interval_minutes: float = 30.0,
    metadata: dict | None = None,
) -> pd.DataFrame:
    """Build a cell index from an HCS plate and per-FOV tracking CSVs
    (reference ``cell_index.py:528``)."""
    store_path = Path(store_path)
    tracks_path = Path(tracks_path)
    plate = open_ome_zarr(store_path, mode="r")
    channel_names = channel_names or plate.channel_names
    metadata = metadata or {}
    rows = []
    for name, pos in plate.positions():
        csvs = sorted((tracks_path / name).glob("*.csv"))
        if not csvs:
            continue
        tracks = pd.read_csv(csvs[0])
        img = pos["0"]
        t_shape, c_shape, z_shape, y_shape, x_shape = img.shape
        well = "/".join(name.split("/")[:2])
        for _, r in tracks.iterrows():
            t = int(r["t"])
            tid = int(r["track_id"])
            rows.append(
                {
                    "cell_id": f"{experiment}_{name}_{tid}_{t}",
                    "experiment": experiment,
                    "store_path": str(store_path),
                    "tracks_path": str(tracks_path),
                    "fov": name,
                    "well": well,
                    "y": float(r["y"]),
                    "x": float(r["x"]),
                    "z": int(r.get("z", -1)),
                    "perturbation": perturbation,
                    "t": t,
                    "track_id": tid,
                    "global_track_id": f"{experiment}_{name}_{tid}",
                    "parent_track_id": int(r.get("parent_track_id", -1)),
                    "hours_post_perturbation": float(
                        hours_post_perturbation_start + t * interval_minutes / 60.0
                    ),
                    "interval_minutes": float(interval_minutes),
                    "T_shape": t_shape,
                    "C_shape": c_shape,
                    "Z_shape": z_shape,
                    "Y_shape": y_shape,
                    "X_shape": x_shape,
                    **metadata,
                }
            )
    df = pd.DataFrame(rows)
    if df.empty:
        raise ValueError(f"No tracks found under {tracks_path}")
    # one row per (cell, channel)
    df = (
        df.loc[df.index.repeat(len(channel_names))]
        .assign(channel_name=np.tile(channel_names, len(df)))
        .reset_index(drop=True)
    )
    df["cell_id"] = df["cell_id"] + "_" + df["channel_name"]
    df = _reconstruct_lineage(df)
    return df


def preprocess_cell_index(
    df: pd.DataFrame,
    level: str = "fov_statistics",
    focus_metadata_key: str = "focus",
) -> pd.DataFrame:
    """Join per-(fov, channel) normalization stats (and focus slice when
    present) onto the index (reference ``cell_index.py:237``)."""
    df = df.copy()
    stats_cols = ["norm_mean", "norm_std", "norm_median", "norm_iqr", "norm_max", "norm_min"]
    for c in stats_cols + ["z_focus_mean"]:
        if c not in df.columns:
            df[c] = np.nan
    cache: dict[tuple[str, str, str], dict] = {}
    for (store, fov, ch), group in df.groupby(["store_path", "fov", "channel_name"]):
        key = (store, fov, ch)
        if key not in cache:
            pos = open_ome_zarr(store, mode="r")[fov]
            norm = pos.zattrs.get("normalization", {}).get(ch, {}).get(level, {})
            focus = pos.zattrs.get(focus_metadata_key, {}).get(ch, {})
            cache[key] = {
                "norm_mean": norm.get("mean", np.nan),
                "norm_std": norm.get("std", np.nan),
                "norm_median": norm.get("median", np.nan),
                "norm_iqr": norm.get("iqr", np.nan),
                "norm_max": norm.get("max", np.nan),
                "norm_min": norm.get("min", np.nan),
                "z_focus_mean": focus.get("mean_focus_slice", np.nan),
            }
        for col, val in cache[key].items():
            df.loc[group.index, col] = val
    return df
