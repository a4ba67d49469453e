"""Normalization statistics / Otsu / foreground masks
(reference ``viscy_utils/meta_utils.py:61``, ``mp_utils.py:81``).

Grid-subsampled per-FOV and dataset statistics written to
``.zattrs["normalization"]``; optional median-filtered Otsu thresholds and
boolean foreground mask arrays. IO is tensorstore (threaded C++ decode) —
worker *threads* replace the reference's ProcessPoolExecutor.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
from scipy.ndimage import median_filter

from viscy_tpu.zarr_io.store import open_ome_zarr

_logger = logging.getLogger("viscy_tpu")


def get_val_stats(sample_values) -> dict:
    """Intensity statistics (reference ``mp_utils.py:81``): 13 stats."""
    percentiles = [1, 5, 25, 50, 75, 95, 99]
    pv = {
        k: float(v)
        for k, v in zip(percentiles, np.nanpercentile(sample_values, percentiles))
    }
    return {
        "min": float(np.nanmin(sample_values)),
        "max": float(np.nanmax(sample_values)),
        "mean": float(np.nanmean(sample_values)),
        "std": float(np.nanstd(sample_values)),
        "median": pv[50],
        "iqr": pv[75] - pv[25],
        "p5": pv[5],
        "p95": pv[95],
        "p95_p5": pv[95] - pv[5],
        "p1": pv[1],
        "p99": pv[99],
        "p99_p1": pv[99] - pv[1],
    }


def otsu_threshold(values: np.ndarray, n_bins: int = 256) -> float:
    """Otsu's threshold of a flat array (numpy; skimage-compatible)."""
    values = np.asarray(values).ravel()
    lo, hi = float(values.min()), float(values.max())
    if lo == hi:
        return lo
    hist, edges = np.histogram(values, bins=n_bins, range=(lo, hi))
    hist = hist.astype(np.float64)
    centers = (edges[:-1] + edges[1:]) / 2
    w0 = np.cumsum(hist)
    total = w0[-1]
    w1 = total - w0
    mu0 = np.cumsum(hist * centers)
    mu_total = mu0[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        # between-class variance (scaled by total^2; argmax-invariant)
        var_between = (mu_total * w0 - mu0 * total) ** 2 / (w0 * w1)
    var_between[~np.isfinite(var_between)] = -1
    return float(centers[np.argmax(var_between)])


def write_meta_field(node, metadata: dict, field_name: str, subfield_name: str) -> None:
    """Merge metadata into ``zattrs[field_name][subfield_name]``."""
    attrs = node.zattrs
    d = attrs.asdict()
    field = d.setdefault(field_name, {})
    sub = field.setdefault(subfield_name, {})
    sub.update(metadata)
    attrs._replace(d)


def _grid_sample(position, grid_spacing: int, channel_index: int) -> np.ndarray:
    return position["0"].oindex[
        slice(None), [channel_index], slice(None),
    ][:, 0, :, ::grid_spacing, ::grid_spacing]


def generate_normalization_metadata(
    zarr_dir: str | Path,
    num_workers: int = 4,
    channel_ids=-1,
    grid_spacing: int = 32,
    compute_otsu: bool = False,
    otsu_grid_spacing: int = 8,
) -> None:
    """Compute and write FOV/dataset/timepoint statistics to zattrs."""
    plate = open_ome_zarr(zarr_dir, mode="r+")
    position_map = list(plate.positions())
    if channel_ids == -1:
        channel_ids = range(len(plate.channel_names))
    elif isinstance(channel_ids, int):
        channel_ids = [channel_ids]

    _, first = position_map[0]
    num_timepoints = first["0"].shape[0]

    for channel_index in channel_ids:
        channel_name = plate.channel_names[channel_index]
        _logger.info(f"Sampling channel {channel_name}")

        def _fov_stats(item):
            _, pos = item
            samples = _grid_sample(pos, grid_spacing, channel_index)
            fov_stats = get_val_stats(samples)
            if compute_otsu:
                otsu_samples = _grid_sample(pos, otsu_grid_spacing, channel_index)
                smoothed = median_filter(otsu_samples, size=(1, 1, 3, 3))
                fov_stats["otsu_threshold"] = otsu_threshold(smoothed)
            stats = {"fov_statistics": fov_stats}
            stats["timepoint_statistics"] = {
                str(t): get_val_stats(samples[t]) for t in range(num_timepoints)
            }
            return pos, samples, stats

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            results = list(pool.map(_fov_stats, position_map))

        dataset_samples = [s for _, s, _ in results]
        dataset_statistics = {
            "dataset_statistics": get_val_stats(np.stack(dataset_samples))
        }
        dataset_timepoint = {
            str(t): get_val_stats(np.stack([s[t] for s in dataset_samples]))
            for t in range(num_timepoints)
        }
        write_meta_field(
            plate,
            dataset_statistics | {"timepoint_statistics": dataset_timepoint},
            "normalization",
            channel_name,
        )
        for pos, _, stats in results:
            write_meta_field(
                pos, dataset_statistics | stats, "normalization", channel_name
            )


def generate_fg_masks(
    zarr_dir: str | Path,
    channel_names: list[str],
    fg_mask_key: str = "fg_mask",
) -> None:
    """Precompute binary foreground masks from stored Otsu thresholds."""
    plate = open_ome_zarr(zarr_dir, mode="r+")
    all_names = plate.channel_names
    channel_indices = [all_names.index(n) for n in channel_names]

    for pos_name, pos in plate.positions():
        if fg_mask_key in pos:
            raise FileExistsError(
                f"Mask array {fg_mask_key!r} already exists at {pos_name}."
            )
        img = pos["0"]
        t_total, c_total = img.shape[:2]
        zyx = img.shape[2:]
        mask = pos.create_zeros(
            fg_mask_key,
            shape=(t_total, c_total, *zyx),
            dtype=np.uint8,
            chunks=(1, 1, zyx[0], min(zyx[1], 512), min(zyx[2], 512)),
        )
        for c in sorted(set(range(c_total)) - set(channel_indices)):
            mask[:, c] = np.ones((t_total, *zyx), np.uint8)
        for ch_name, ch_idx in zip(channel_names, channel_indices):
            thr = pos.zattrs["normalization"][ch_name]["fov_statistics"]["otsu_threshold"]
            for t in range(t_total):
                data = img[t, ch_idx].astype(np.float32)
                smoothed = median_filter(data, size=(1, 3, 3))
                mask[t, ch_idx] = (smoothed >= thr).astype(np.uint8)


def mp_wrapper(fn, fn_args, workers: int):
    """Map ``fn`` over argument tuples with a process pool
    (reference ``mp_utils.py:39``)."""
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(workers) as ex:
        res = ex.map(fn, *zip(*fn_args))
    return list(res)
