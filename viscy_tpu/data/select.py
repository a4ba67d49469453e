"""Well/FOV selection helpers (reference ``viscy_data/select.py``)."""

from __future__ import annotations

from typing import Iterable

from viscy_tpu.zarr_io.store import Plate, Position


def filter_fovs(
    plate: Plate,
    include_fov_names: Iterable[str] | None = None,
    exclude_fov_names: Iterable[str] | None = None,
) -> list[Position]:
    include = set(include_fov_names) if include_fov_names else None
    exclude = set(exclude_fov_names) if exclude_fov_names else set()
    out = []
    for name, pos in plate.positions():
        if include is not None and name not in include:
            continue
        if name in exclude:
            continue
        out.append(pos)
    return out


class SelectWell:
    """Mixin storing include/exclude FOV filters."""

    _include_wells: list[str] | None = None
    _exclude_fovs: list[str] | None = None

    def _filter_fit_fovs(self, plate: Plate) -> list[Position]:
        positions = []
        for name, pos in plate.positions():
            well = "/".join(name.split("/")[:2])
            if self._include_wells is not None and well not in self._include_wells:
                continue
            if self._exclude_fovs is not None and name in self._exclude_fovs:
                continue
            positions.append(pos)
        if not positions:
            raise ValueError("No FOVs left after filtering.")
        return positions
