"""Cell Tracking Challenge (CTC) ground-truth IO.

Native replacement for ``tracksdata``'s ``InMemoryGraph.from_ctc``
(reference ``evaluate_tracking.py:366``) and the dask/tiff image loading
(``:363-364``). TIFF sequences are read through imageio/PIL (both baked
in); raw numpy label stacks are accepted directly so synthetic tests and
zarr-backed pipelines need no TIFF at all.

CTC layout (celltrackingchallenge.net):

- ``{seq}_GT/TRA/man_track.txt`` — lines ``track_id t_start t_end parent``
- ``{seq}_GT/TRA/man_trackNNN.tif`` — 16-bit label masks, label == track_id
- results mirror this as ``res_track.txt`` + ``maskNNN.tif``
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

__all__ = [
    "CTCGroundTruth",
    "load_ctc_ground_truth",
    "load_tiff_stack",
    "write_ctc_result",
    "seg_dir",
]


def seg_dir(dataset_dir: Path, sequence: str) -> Path:
    """Error-segmentation directory for a CTC sequence (``{seq}_ERR_SEG``).

    Matches reference ``tracking_accuracy/utils.py:11-21``.
    """
    return Path(dataset_dir) / f"{sequence}_ERR_SEG"


def _read_tiff(path: Path) -> np.ndarray:
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path))
    except ImportError:  # pragma: no cover - imageio is baked in
        from PIL import Image

        return np.asarray(Image.open(path))


def load_tiff_stack(directory: Path, pattern: str = "*.tif") -> np.ndarray:
    """Load a sorted TIFF sequence as a (T, ...) stack."""
    files = sorted(Path(directory).glob(pattern))
    if not files:
        raise FileNotFoundError(f"no {pattern} files in {directory}")
    return np.stack([_read_tiff(f) for f in files], axis=0)


@dataclass
class CTCGroundTruth:
    """Ground-truth tracking: label masks + track table.

    ``tracks`` columns: ``track_id, t_start, t_end, parent_track``
    (parent 0 = none). ``masks[t]`` labels pixels with the track id.
    """

    masks: np.ndarray
    tracks: pd.DataFrame

    def edges(self) -> pd.DataFrame:
        """All GT (track_id, t) -> (track_id', t') temporal edges.

        Within-track consecutive-frame links plus parent->child links at
        division. Columns: ``track_a, t_a, track_b, t_b, is_parent_link``.
        """
        rows = []
        present: dict[int, np.ndarray] = {}
        for _, tr in self.tracks.iterrows():
            tid = int(tr["track_id"])
            ts = np.array(
                [
                    t
                    for t in range(int(tr["t_start"]), int(tr["t_end"]) + 1)
                    if t < len(self.masks) and (self.masks[t] == tid).any()
                ]
            )
            present[tid] = ts
            for a, b in zip(ts[:-1], ts[1:]):
                rows.append((tid, int(a), tid, int(b), False))
        for _, tr in self.tracks.iterrows():
            parent = int(tr["parent_track"])
            tid = int(tr["track_id"])
            if parent > 0 and len(present.get(parent, ())) and len(present[tid]):
                rows.append(
                    (parent, int(present[parent][-1]), tid, int(present[tid][0]), True)
                )
        return pd.DataFrame(
            rows, columns=["track_a", "t_a", "track_b", "t_b", "is_parent_link"]
        )


def load_ctc_ground_truth(tra_dir: Path) -> CTCGroundTruth:
    """Load a CTC ``TRA`` (or ``RES``) directory."""
    tra_dir = Path(tra_dir)
    track_file = None
    for name in ("man_track.txt", "res_track.txt"):
        if (tra_dir / name).exists():
            track_file = tra_dir / name
            break
    if track_file is None:
        raise FileNotFoundError(f"no man_track.txt/res_track.txt in {tra_dir}")
    table = np.atleast_2d(np.loadtxt(track_file, dtype=int))
    tracks = pd.DataFrame(
        table, columns=["track_id", "t_start", "t_end", "parent_track"]
    )
    masks = load_tiff_stack(tra_dir, "*.tif")
    return CTCGroundTruth(masks=masks, tracks=tracks)


def write_ctc_result(
    out_dir: Path, masks: np.ndarray, tracks: pd.DataFrame
) -> None:
    """Write a tracking result in CTC ``RES`` layout.

    ``masks[t]`` must label pixels by track id; ``tracks`` must have
    columns ``track_id, t_start, t_end, parent_track``.
    """
    import imageio.v3 as iio

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savetxt(
        out_dir / "res_track.txt",
        tracks[["track_id", "t_start", "t_end", "parent_track"]].to_numpy(int),
        fmt="%d",
    )
    width = max(3, len(str(len(masks) - 1)))
    for t in range(len(masks)):
        iio.imwrite(
            out_dir / f"mask{t:0{width}d}.tif", masks[t].astype(np.uint16)
        )


def tracking_to_ctc(
    solution,  # TrackingGraph
    node_pixels: dict[int, np.ndarray],
    frame_shape: tuple[int, ...],
    n_frames: int,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Render a solved :class:`TrackingGraph` as CTC masks + track table."""
    masks = np.zeros((n_frames, *frame_shape), dtype=np.uint16)
    for _, row in solution.nodes.iterrows():
        tid = int(row["track_id"])
        if tid <= 0:
            continue
        frame = masks[int(row["t"])].ravel()
        frame[node_pixels[int(row["node_id"])]] = tid
    return masks, solution.tracks
