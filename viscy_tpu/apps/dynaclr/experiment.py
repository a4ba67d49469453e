"""Experiment registry for multi-experiment DynaCLR training
(reference ``dynaclr/data/experiment.py:26``).

A validated collection of experiments with channel resolution, focus-
guided Z-range auto-resolution, physical-pixel scale factors, and
tau-range hour→frame conversion — the structured front-end the
reference exports; :class:`~viscy_tpu.apps.dynaclr.data.
MultiExperimentDataModule` performs the same resolution internally.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd

from viscy_tpu.data.collection import Collection, ExperimentEntry

_logger = logging.getLogger("viscy_tpu")

__all__ = ["ExperimentRegistry"]


@dataclass
class ExperimentRegistry:
    """Validated experiment collection (reference ``experiment.py:26``).

    ``__post_init__`` fail-fast validation: non-empty experiment list,
    unique names, non-negative ``interval_minutes``, non-empty
    ``perturbation_wells`` (in entry metadata), existing ``store_path``,
    and channel names present in the store. Then resolves per-experiment
    ``z_ranges`` (focus-slice-centered extraction windows) and
    ``scale_factors`` (reference_um / experiment_um, 1.0 when unset).
    """

    collection: Collection
    z_window: int | None = None
    z_extraction_window: int | None = None
    z_focus_offset: float = 0.5
    focus_channel: str | None = None
    reference_pixel_size_xy_um: float | None = None
    reference_pixel_size_z_um: float | None = None
    z_ranges: dict = field(init=False)
    scale_factors: dict = field(init=False)
    _name_map: dict = field(init=False, repr=False, compare=False)

    def __post_init__(self) -> None:
        from viscy_tpu.zarr_io.store import open_ome_zarr

        experiments = self.collection.experiments
        if not experiments:
            raise ValueError("Empty experiments list: at least one experiment is required.")
        seen: set[str] = set()
        for e in experiments:
            if e.name in seen:
                raise ValueError(
                    f"Duplicate experiment name {e.name!r}. Each experiment must have a unique name."
                )
            seen.add(e.name)
        self._name_map = {e.name: e for e in experiments}

        z_extract = self.z_extraction_window or self.z_window
        z_ranges: dict[str, tuple[int, int]] = {}
        for exp in experiments:
            if exp.interval_minutes is not None and exp.interval_minutes < 0:
                raise ValueError(
                    f"Experiment {exp.name!r}: interval_minutes must be "
                    f"non-negative, got {exp.interval_minutes}."
                )
            wells = exp.metadata.get("perturbation_wells")
            if wells is not None and not wells:
                raise ValueError(
                    f"Experiment {exp.name!r}: perturbation_wells must not be empty."
                )
            if not Path(exp.store_path).exists():
                raise ValueError(
                    f"Experiment {exp.name!r}: store_path does not exist: {exp.store_path}"
                )
            plate = open_ome_zarr(exp.store_path, mode="r")
            _, first_position = next(plate.positions())
            zarr_channels = list(first_position.channel_names)
            z_total = first_position["0"].shape[2]
            focus_data = plate.zattrs.get("focus_slice", {}) or first_position.zattrs.get(
                "focus_slice", {}
            )
            missing = [c for c in exp.channels if c not in zarr_channels]
            if missing:
                raise ValueError(
                    f"Experiment {exp.name!r}: channels {missing} not found "
                    f"in zarr. Available: {zarr_channels}."
                )
            if not exp.channels:
                exp.channels = zarr_channels

            if z_extract is None:
                z_ranges[exp.name] = (0, z_total)
            else:
                focus_ch = self.focus_channel or (exp.channels[0] if exp.channels else None)
                ch_focus = focus_data.get(focus_ch, {}) if focus_ch else {}
                stats = ch_focus.get("dataset_statistics") or ch_focus.get(
                    "fov_statistics", {}
                )
                z_focus_mean = stats.get("z_focus_mean")
                z_center = (
                    int(round(z_focus_mean)) if z_focus_mean is not None else z_total // 2
                )
                effective = min(z_extract, z_total)
                z_start = max(0, z_center - int(effective * self.z_focus_offset))
                z_end = min(z_total, z_start + effective)
                z_start = max(0, z_end - effective)
                z_ranges[exp.name] = (z_start, z_end)
                _logger.info(
                    "Experiment %r: z_range=(%d, %d), z_total=%d, extraction=%d",
                    exp.name, z_start, z_end, z_total, effective,
                )
        if self.z_window is not None:
            for name, (z_s, z_e) in z_ranges.items():
                if z_e - z_s < self.z_window:
                    raise ValueError(
                        f"Experiment {name!r}: extraction range ({z_e - z_s}) < "
                        f"z_window ({self.z_window}). Increase z_extraction_window "
                        "or reduce z_window."
                    )
        self.z_ranges = z_ranges
        # fail fast like the reference (experiment.py:166-173): a silent
        # 1.0 fallback would mix patches at the wrong physical scale
        if self.reference_pixel_size_xy_um is not None:
            missing = [
                e.name for e in experiments if not self._pixel_sizes(e)[0]
            ]
            if missing:
                raise ValueError(
                    "reference_pixel_size_xy_um set but experiments missing "
                    f"pixel_size_xy_um: {missing}"
                )
        if self.reference_pixel_size_z_um is not None:
            missing = [
                e.name for e in experiments if not self._pixel_sizes(e)[1]
            ]
            if missing:
                raise ValueError(
                    "reference_pixel_size_z_um set but experiments missing "
                    f"pixel_size_z_um: {missing}"
                )
        self.scale_factors = self._compute_scale_factors()

    # -- derived ----------------------------------------------------------------
    @property
    def experiments(self) -> list[ExperimentEntry]:
        return self.collection.experiments

    @property
    def source_channel_labels(self) -> list[str]:
        """Unique marker labels across experiments (marker from metadata's
        channel->marker map when present, else the channel name)."""
        seen: set[str] = set()
        labels: list[str] = []
        for exp in self.collection.experiments:
            markers = exp.metadata.get("markers", {})
            for ch in exp.channels:
                label = markers.get(ch, ch)
                if label not in seen:
                    labels.append(label)
                    seen.add(label)
        return labels

    def _pixel_sizes(self, exp: ExperimentEntry) -> tuple[float | None, float | None]:
        return (
            exp.metadata.get("pixel_size_xy_um"),
            exp.metadata.get("pixel_size_z_um"),
        )

    def _compute_scale_factors(self) -> dict:
        out: dict[str, tuple[float, float, float]] = {}
        for exp in self.collection.experiments:
            xy_um, z_um = self._pixel_sizes(exp)
            sy = sx = (
                self.reference_pixel_size_xy_um / xy_um
                if self.reference_pixel_size_xy_um is not None and xy_um
                else 1.0
            )
            sz = (
                self.reference_pixel_size_z_um / z_um
                if self.reference_pixel_size_z_um is not None and z_um
                else 1.0
            )
            out[exp.name] = (sz, sy, sx)
        return out

    # -- constructors ------------------------------------------------------------
    @classmethod
    def from_collection(cls, path: str | Path, **kwargs) -> "ExperimentRegistry":
        """Load experiments from a collection YAML (reference ``:228``)."""
        return cls(collection=Collection.from_yaml(path), **kwargs)

    @classmethod
    def from_cell_index(
        cls, cell_index_path: str | Path, **kwargs
    ) -> tuple["ExperimentRegistry", pd.DataFrame]:
        """Build a registry straight from a cell-index parquet (reference
        ``:274``): channels, perturbation wells, interval and pixel sizes
        all derive from the parquet's columns — no collection YAML needed."""
        from viscy_tpu.data.cell_index import read_cell_index

        df = read_cell_index(cell_index_path)
        if df.empty:
            raise ValueError(f"Cell index is empty: {cell_index_path}")

        experiments: list[ExperimentEntry] = []
        for exp_name, g in df.groupby("experiment"):
            exp_name = str(exp_name)
            store_path = str(g["store_path"].iloc[0])
            wells: dict[str, list[str]] = defaultdict(list)
            for _, row in g[["perturbation", "well"]].drop_duplicates().iterrows():
                if str(row["well"]) not in wells[str(row["perturbation"])]:
                    wells[str(row["perturbation"])].append(str(row["well"]))
            if "interval_minutes" not in g.columns or g["interval_minutes"].dropna().empty:
                raise ValueError(
                    f"Experiment {exp_name!r}: cell index parquet missing "
                    "'interval_minutes'. Rebuild the parquet with build-cell-index."
                )
            meta: dict = {"perturbation_wells": dict(wells)}
            for col in ("pixel_size_xy_um", "pixel_size_z_um"):
                if col in g.columns and not g[col].dropna().empty:
                    meta[col] = float(g[col].dropna().iloc[0])
            if "marker" in g.columns and "channel_name" in g.columns:
                meta["markers"] = {
                    str(ch): str(mk)
                    for (ch, mk), _ in g.groupby(["channel_name", "marker"])
                }
            channels = (
                sorted({str(c) for c in g["channel_name"].dropna()})
                if "channel_name" in g.columns
                else []
            )
            experiments.append(
                ExperimentEntry(
                    name=exp_name,
                    store_path=store_path,
                    channels=channels,
                    interval_minutes=float(g["interval_minutes"].dropna().iloc[0]),
                    metadata=meta,
                )
            )
        collection = Collection(
            name=Path(cell_index_path).stem, experiments=experiments
        )
        return cls(collection=collection, **kwargs), df

    # -- public API ----------------------------------------------------------------
    def subset(self, experiment_names: list[str]) -> "ExperimentRegistry":
        """New registry restricted to ``experiment_names`` (reference ``:419``)."""
        sub = Collection(
            name=self.collection.name,
            provenance=self.collection.provenance,
            experiments=[
                e for e in self.collection.experiments if e.name in experiment_names
            ],
        )
        return ExperimentRegistry(
            collection=sub,
            z_window=self.z_window,
            z_extraction_window=self.z_extraction_window,
            z_focus_offset=self.z_focus_offset,
            focus_channel=self.focus_channel,
            reference_pixel_size_xy_um=self.reference_pixel_size_xy_um,
            reference_pixel_size_z_um=self.reference_pixel_size_z_um,
        )

    def tau_range_frames(
        self, experiment_name: str, tau_range_hours: tuple[float, float]
    ) -> tuple[int, int]:
        """Convert an hour range to frames via the experiment's sampling
        interval (reference ``:450``)."""
        exp = self.get_experiment(experiment_name)
        if not exp.interval_minutes:
            raise ValueError(f"Experiment {experiment_name!r} has no interval_minutes")
        return (
            round(tau_range_hours[0] * 60 / exp.interval_minutes),
            round(tau_range_hours[1] * 60 / exp.interval_minutes),
        )

    def get_experiment(self, name: str) -> ExperimentEntry:
        """Look up one experiment by name (reference ``:484``)."""
        if name not in self._name_map:
            raise KeyError(
                f"Unknown experiment {name!r}; have {sorted(self._name_map)}"
            )
        return self._name_map[name]
