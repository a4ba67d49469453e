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
    "build_ops_cell_index",
    "convert_ops_parquet",
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


# -- OPS (optical pooled screen) builders -------------------------------------


def _resolve_perturbation(perturbation_wells: dict[str, list[str]], well_name: str) -> str:
    """Map a well to its perturbation label (reference ``cell_index.py:873``)."""
    for label, wells_list in perturbation_wells.items():
        if well_name in wells_list:
            return label
    return "unknown"


def _parse_bbox_to_centroid(bbox_str: str) -> tuple[float, float]:
    """``"(ymin, xmin, ymax, xmax)"`` -> centroid ``(y, x)``."""
    ymin, xmin, ymax, xmax = (float(s.strip()) for s in str(bbox_str).strip("()").split(",")[:4])
    return ((ymin + ymax) / 2.0, (xmin + xmax) / 2.0)


def _parse_bbox_min_size(bbox_str: str) -> float:
    ymin, xmin, ymax, xmax = (float(s.strip()) for s in str(bbox_str).strip("()").split(",")[:4])
    return min(ymax - ymin, xmax - xmin)


def build_ops_cell_index(
    store_path: str | Path,
    labels_path: str | Path,
    experiment_name: str,
    output_path: str | Path,
    wells: list[str] | None = None,
    channel_column: str = "channel",
    gene_column: str = "gene_name",
    reporter_column: str | None = "reporter",
    sgRNA_column: str | None = "sgRNA",
    bbox_column: str = "bbox",
    segmentation_id_column: str = "segmentation_id",
    min_bbox_size: int = 5,
    perturbation_map: dict[str, list[str]] | None = None,
) -> pd.DataFrame:
    """Build a cell index parquet from OPS screen data
    (reference ``cell_index.py:612``): per-well label tables
    (``{well_flat}_linked_pheno_iss.{parquet,csv}``) joined with the plate's
    FOV layout and pixel sizes; bbox strings become centroids, cells with a
    bbox side below ``min_bbox_size`` are dropped."""
    store_path = Path(store_path)
    labels_path = Path(labels_path)
    plate = open_ome_zarr(store_path, mode="r")

    positions = [(name, pos) for name, pos in plate.positions()]
    discovered_wells = sorted({"/".join(name.split("/")[:2]) for name, _ in positions})
    target_wells = wells if wells is not None else discovered_wells
    scale = positions[0][1].scale if positions else [1.0] * 5
    pixel_size_z_um = scale[2] if len(scale) > 2 else None
    pixel_size_xy_um = scale[3] if len(scale) > 3 else None

    all_rows: list[pd.DataFrame] = []
    for well in target_wells:
        well_flat = well.replace("/", "")
        label_file = next(
            (
                labels_path / f"{well_flat}_linked_pheno_iss.{ext}"
                for ext in ("parquet", "csv")
                if (labels_path / f"{well_flat}_linked_pheno_iss.{ext}").exists()
            ),
            None,
        )
        if label_file is None:
            _logger.warning("No label file for well %s, skipping", well)
            continue
        labels_df = (
            pd.read_parquet(label_file)
            if label_file.suffix == ".parquet"
            else pd.read_csv(label_file)
        )
        labels_df = labels_df.dropna(subset=[segmentation_id_column])
        if bbox_column in labels_df.columns:
            centroids = labels_df[bbox_column].apply(_parse_bbox_to_centroid)
            labels_df["y"] = centroids.apply(lambda c: c[0])
            labels_df["x"] = centroids.apply(lambda c: c[1])
            sizes = labels_df[bbox_column].apply(_parse_bbox_min_size)
            labels_df = labels_df[sizes >= min_bbox_size].copy()
        if gene_column in labels_df.columns:
            labels_df[gene_column] = labels_df[gene_column].fillna("NTC")

        well_fovs = [name for name, _ in positions if name.startswith(well + "/")]
        fov_path = well_fovs[0] if well_fovs else well + "/0"
        seg_id = labels_df[segmentation_id_column].astype(int)
        out = pd.DataFrame(index=labels_df.index)
        out["cell_id"] = experiment_name + "_" + fov_path + "_" + seg_id.astype(str)
        out["experiment"] = experiment_name
        out["store_path"] = str(store_path)
        out["tracks_path"] = ""
        out["fov"] = fov_path
        out["well"] = well
        out["y"] = labels_df.get("y", np.nan)
        out["x"] = labels_df.get("x", np.nan)
        out["z"] = 0
        channel = labels_df.get(channel_column, "")
        out["channel_name"] = channel
        out["marker"] = channel
        out["pixel_size_xy_um"] = pixel_size_xy_um
        out["pixel_size_z_um"] = pixel_size_z_um
        out["perturbation"] = (
            _resolve_perturbation(perturbation_map, well) if perturbation_map else "unknown"
        )
        out["gene_name"] = labels_df.get(gene_column)
        out["reporter"] = labels_df.get(reporter_column) if reporter_column else None
        out["sgRNA"] = labels_df.get(sgRNA_column) if sgRNA_column else None
        # OPS is single-timepoint: each cell is its own track/lineage
        out["t"] = 0
        out["track_id"] = seg_id
        out["global_track_id"] = out["cell_id"]
        out["lineage_id"] = out["cell_id"]
        out["parent_track_id"] = -1
        out["hours_post_perturbation"] = 0.0
        out["interval_minutes"] = 0.0
        all_rows.append(out)

    df = pd.concat(all_rows, ignore_index=True) if all_rows else pd.DataFrame()
    write_cell_index(df, output_path)
    return df


def convert_ops_parquet(
    ops_parquet_path: str | Path,
    output_path: str | Path,
    store_root: str = "",
    store_suffix: str = "phenotyping.zarr",
) -> pd.DataFrame:
    """Convert a merged OPS parquet (one row per cell observation, possibly
    spanning experiments via ``store_key``) to the canonical flat cell-index
    schema (reference ``cell_index.py:790``)."""
    df = pd.read_parquet(Path(ops_parquet_path))
    out = pd.DataFrame()
    out["experiment"] = df["store_key"]
    out["store_path"] = df["store_key"].map(lambda k: f"{store_root}/{k}/{store_suffix}")
    out["fov"] = df["well"].map(lambda w: w.rsplit("/", 1)[1] if "/" in w else w)
    out["well"] = df["well"].map(lambda w: w.rsplit("/", 1)[0])
    centroids = df["bbox"].apply(_parse_bbox_to_centroid)
    out["y"] = centroids.map(lambda c: c[0]).astype("float32")
    out["x"] = centroids.map(lambda c: c[1]).astype("float32")
    out["z"] = 0
    out["channel_name"] = df.get("channel", "")
    out["marker"] = df.get("reporter", out["channel_name"])
    out["organelle"] = None
    out["gene_name"] = df["gene_name"].fillna("NTC") if "gene_name" in df.columns else None
    out["reporter"] = df.get("reporter")
    out["sgRNA"] = df.get("sgRNA")
    out["perturbation"] = out["gene_name"] if "gene_name" in df.columns else "unknown"
    out["t"] = 0
    id_series = (
        df["total_index"].astype(str)
        if "total_index" in df.columns
        else pd.Series(range(len(df))).astype(str)
    )
    out["track_id"] = (
        df["total_index"].astype("Int32")
        if "total_index" in df.columns
        else pd.array(range(len(df)), dtype="Int32")
    )
    out["cell_id"] = df["store_key"].astype(str) + "_" + id_series
    out["global_track_id"] = out["cell_id"]
    out["lineage_id"] = out["cell_id"]
    out["parent_track_id"] = -1
    out["hours_post_perturbation"] = 0.0
    out["tracks_path"] = ""
    out["interval_minutes"] = 0.0
    out["microscope"] = ""
    out["pixel_size_xy_um"] = None
    out["pixel_size_z_um"] = None
    write_cell_index(out, output_path)
    return out
