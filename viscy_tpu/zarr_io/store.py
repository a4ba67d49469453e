"""OME-Zarr (NGFF v0.4) HCS plate IO on tensorstore.

Implements the subset of the iohub.ngff API surface that the reference
framework consumes (`Position`, `Plate`, ``open_ome_zarr``, ``ImageArray``
with ``oindex`` reads and ``resize``; see reference
``packages/viscy-data/src/viscy_data/sliding_window.py:166`` and
``packages/viscy-utils/src/viscy_utils/callbacks/prediction_writer.py``),
re-designed for a TPU host feed:

- All array IO is tensorstore (C++, multithreaded decode) — both zarr v2
  and zarr v3 (sharded) stores are supported.
- Metadata (.zgroup/.zattrs, zarr.json) is plain JSON handled here.
- Reads return numpy arrays ready for ``jax.device_put``.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, Literal, Sequence

import numpy as np
import tensorstore as ts

__all__ = [
    "ImageArray",
    "Position",
    "Plate",
    "TransformationMeta",
    "open_ome_zarr",
]

_AXES_5D = [
    {"name": "T", "type": "time"},
    {"name": "C", "type": "channel"},
    {"name": "Z", "type": "space", "unit": "micrometer"},
    {"name": "Y", "type": "space", "unit": "micrometer"},
    {"name": "X", "type": "space", "unit": "micrometer"},
]


@dataclass
class TransformationMeta:
    """Coordinate transformation metadata (OME-NGFF ``coordinateTransformations``)."""

    type: str = "scale"
    scale: Sequence[float] = field(default_factory=lambda: [1.0] * 5)

    def to_dict(self) -> dict:
        if self.type == "identity":
            return {"type": "identity"}
        return {"type": self.type, self.type: list(self.scale)}


def _read_json(path: Path) -> dict:
    if not path.exists():
        return {}
    with open(path) as f:
        return json.load(f)


def _write_json(path: Path, data: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=2, default=_json_default)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"Cannot serialize {type(o)}")


def _detect_version(group_path: Path) -> Literal["0.4", "0.5"]:
    """Detect zarr format: v2 (.zgroup) -> NGFF 0.4, v3 (zarr.json) -> NGFF 0.5."""
    if (group_path / "zarr.json").exists():
        return "0.5"
    return "0.4"


class _Attrs:
    """Mutable dict-like view of a group's user attributes, persisted on write."""

    def __init__(self, group_path: Path, version: str) -> None:
        self._path = group_path
        self._version = version

    def _file(self) -> Path:
        if self._version == "0.5":
            return self._path / "zarr.json"
        return self._path / ".zattrs"

    def asdict(self) -> dict:
        raw = _read_json(self._file())
        if self._version == "0.5":
            return raw.get("attributes", {})
        return raw

    def __getitem__(self, key: str):
        return self.asdict()[key]

    def get(self, key: str, default=None):
        return self.asdict().get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self.asdict()

    def __iter__(self):
        # dict-like protocol: without this, ``for k in zattrs`` falls back
        # to __getitem__(0) and raises a confusing KeyError
        return iter(self.asdict())

    def keys(self):
        return self.asdict().keys()

    def items(self):
        return self.asdict().items()

    def __setitem__(self, key: str, value) -> None:
        d = self.asdict()
        d[key] = value
        self._replace(d)

    def update(self, other: dict) -> None:
        d = self.asdict()
        d.update(other)
        self._replace(d)

    def _replace(self, d: dict) -> None:
        if self._version == "0.5":
            raw = _read_json(self._file())
            raw.setdefault("zarr_format", 3)
            raw.setdefault("node_type", "group")
            raw["attributes"] = d
            _write_json(self._file(), raw)
        else:
            _write_json(self._file(), d)


def _make_group(path: Path, version: str) -> None:
    path.mkdir(parents=True, exist_ok=True)
    if version == "0.5":
        f = path / "zarr.json"
        if not f.exists():
            _write_json(f, {"zarr_format": 3, "node_type": "group", "attributes": {}})
    else:
        f = path / ".zgroup"
        if not f.exists():
            _write_json(f, {"zarr_format": 2})


def _default_chunks(shape: Sequence[int]) -> list[int]:
    """One ZYX slab per (t, c): chunk = (1, 1, Z, Y, X) capped near 32 MiB."""
    shape = list(shape)
    chunks = [1] * (len(shape) - 3) + list(shape[-3:])
    # cap chunk byte size (assume <=4 bytes/elem) by splitting Z
    while np.prod(chunks[-3:]) * 4 > 64 * 2**20 and chunks[-3] > 1:
        chunks[-3] = max(1, chunks[-3] // 2)
    return chunks


class ImageArray:
    """A (T, C, Z, Y, X) image array backed by tensorstore.

    Mirrors the read surface used by the reference's hot IO loop
    (``sliding_window.py:166``: ``img.oindex[t, channels, z_slice]``)
    plus the write/resize surface of the prediction writer.
    """

    def __init__(self, store: ts.TensorStore, path: str, array_dir: Path) -> None:
        self._ts = store
        self.path = path
        self._dir = array_dir

    # -- shape/meta ------------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self._ts.shape)

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(self._ts.dtype.numpy_dtype)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def frames(self) -> int:
        return self.shape[0]

    @property
    def channels(self) -> int:
        return self.shape[1]

    @property
    def slices(self) -> int:
        return self.shape[2]

    @property
    def height(self) -> int:
        return self.shape[3]

    @property
    def width(self) -> int:
        return self.shape[4]

    def __array__(self, dtype=None) -> np.ndarray:
        out = self[:]
        return out.astype(dtype) if dtype is not None else out

    # -- IO ---------------------------------------------------------------
    def __getitem__(self, key) -> np.ndarray:
        return np.asarray(self._ts[key].read().result())

    def __setitem__(self, key, value) -> None:
        self._ts[key].write(np.asarray(value)).result()

    @property
    def oindex(self) -> "_OIndex":
        return _OIndex(self._ts)

    def read_async(self, key):
        """Start a non-blocking read; returns a tensorstore future."""
        return self._ts[key].read()

    @property
    def tstore(self) -> ts.TensorStore:
        """Raw tensorstore handle (for batched native reads)."""
        return self._ts

    def resize(self, shape: Sequence[int]) -> None:
        """Grow/shrink the array (metadata-only for growth)."""
        self._ts = self._ts.resize(
            exclusive_max=list(shape), expand_only=False, shrink_only=False
        ).result()

    def numpy(self) -> np.ndarray:
        return self[:]


class _OIndex:
    """Orthogonal (outer) indexing adapter: ``arr.oindex[t_slice, [c0, c2], z_slice]``."""

    def __init__(self, store: ts.TensorStore) -> None:
        self._ts = store

    def __getitem__(self, key) -> np.ndarray:
        return np.asarray(self._ts.oindex[key].read().result())

    def __setitem__(self, key, value) -> None:
        self._ts.oindex[key].write(np.asarray(value)).result()


def _ts_spec(array_dir: Path, version: str) -> dict:
    driver = "zarr3" if version == "0.5" else "zarr"
    return {
        "driver": driver,
        "kvstore": {"driver": "file", "path": str(array_dir)},
        "recheck_cached_data": "open",
        "recheck_cached_metadata": "open",
    }


_TS_CONTEXT = ts.Context(
    {
        "cache_pool": {"total_bytes_limit": 256 * 2**20},
        "data_copy_concurrency": {"limit": max(4, (os.cpu_count() or 8) // 2)},
        "file_io_concurrency": {"limit": max(8, os.cpu_count() or 8)},
    }
)


def _open_array(array_dir: Path, version: str, write: bool = False) -> ts.TensorStore:
    spec = _ts_spec(array_dir, version)
    return ts.open(
        spec, open=True, write=write, read=True, context=_TS_CONTEXT
    ).result()


# named compressor presets for array creation: "zstd" (default; best ratio),
# "lz4" (~3x faster compression at slightly worse ratio — the prediction
# writer's default, where write throughput is the product), "none"
_COMPRESSORS_V2 = {
    "zstd": {"id": "blosc", "cname": "zstd", "clevel": 1, "shuffle": 1},
    # bitshuffle: measured both faster AND better ratio than byte-shuffle
    # for f32 image data with lz4 (tools: 639 MB/s vs 199 MB/s zstd1)
    "lz4": {"id": "blosc", "cname": "lz4", "clevel": 1, "shuffle": 2},
    "none": None,
}
_COMPRESSORS_V3 = {
    "zstd": {"name": "blosc", "configuration": {"cname": "zstd", "clevel": 1, "shuffle": "shuffle"}},
    "lz4": {"name": "blosc", "configuration": {"cname": "lz4", "clevel": 1, "shuffle": "bitshuffle"}},
    "none": None,
}


def _create_array(
    array_dir: Path,
    shape: Sequence[int],
    dtype: np.dtype,
    chunks: Sequence[int] | None,
    version: str,
    shard: bool = False,
    compressor: str = "zstd",
) -> ts.TensorStore:
    dtype = np.dtype(dtype)
    chunks = list(chunks) if chunks is not None else _default_chunks(shape)
    spec = _ts_spec(array_dir, version)
    if compressor not in _COMPRESSORS_V2:
        raise ValueError(f"Unknown compressor {compressor!r}; options: {sorted(_COMPRESSORS_V2)}")
    if version == "0.5":
        comp_v3 = _COMPRESSORS_V3[compressor]
        codecs: list = [{"name": "bytes", "configuration": {"endian": "little"}}]
        if comp_v3 is not None:
            codecs.append(comp_v3)
        if shard:
            # sharded: outer chunk is the shard, inner codec chain handles sub-chunks
            inner = [
                {"name": "bytes", "configuration": {"endian": "little"}},
            ]
            if comp_v3 is not None:
                inner.append(comp_v3)
            shard_shape = [c * 2 if c < s else s for c, s in zip(chunks, shape)]
            codecs = [
                {
                    "name": "sharding_indexed",
                    "configuration": {
                        "chunk_shape": chunks,
                        "codecs": inner,
                        "index_codecs": [
                            {"name": "bytes", "configuration": {"endian": "little"}},
                            {"name": "crc32c"},
                        ],
                    },
                }
            ]
            chunks = shard_shape
        spec["metadata"] = {
            "shape": list(shape),
            "data_type": dtype.name,
            "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": chunks}},
            "codecs": codecs,
            "fill_value": 0,
        }
    else:
        spec["metadata"] = {
            "shape": list(shape),
            "dtype": dtype.str,
            "chunks": chunks,
            "compressor": _COMPRESSORS_V2[compressor],
            "fill_value": 0,
            "order": "C",
        }
    return ts.open(spec, create=True, write=True, read=True, context=_TS_CONTEXT).result()


class Position:
    """One field of view (NGFF image group) holding multiscale image arrays."""

    def __init__(self, path: Path, version: str, mode: str = "r") -> None:
        self._path = Path(path)
        self._version = version
        self._mode = mode
        self._arrays: dict[str, ImageArray] = {}

    # -- metadata ----------------------------------------------------------
    @property
    def zattrs(self) -> _Attrs:
        return _Attrs(self._path, self._version)

    @property
    def metadata(self) -> dict:
        return self.zattrs.asdict()

    @property
    def zgroup(self) -> dict:
        return self.metadata

    @property
    def name(self) -> str:
        return self._path.name

    @property
    def path(self) -> Path:
        return self._path

    @property
    def channel_names(self) -> list[str]:
        omero = self.zattrs.get("omero", {})
        return [c["label"] for c in omero.get("channels", [])]

    def get_channel_index(self, name: str) -> int:
        names = self.channel_names
        try:
            return names.index(name)
        except ValueError:
            raise ValueError(f"Channel {name!r} not found in {names}") from None

    def get_axis_index(self, name: str) -> int:
        ms = self.zattrs.get("multiscales", [{}])[0]
        for i, ax in enumerate(ms.get("axes", _AXES_5D)):
            if ax["name"].lower() == name.lower():
                return i
        raise ValueError(f"Axis {name!r} not found")

    @property
    def scale(self) -> list[float]:
        """Scale of the first (full-res) dataset."""
        ms = self.zattrs.get("multiscales", [{}])[0]
        datasets = ms.get("datasets", [])
        if datasets:
            for tf in datasets[0].get("coordinateTransformations", []):
                if tf.get("type") == "scale":
                    return tf["scale"]
        return [1.0] * 5

    # -- arrays -------------------------------------------------------------
    def array_keys(self) -> list[str]:
        ms = self.zattrs.get("multiscales", [{}])[0]
        keys = [d["path"] for d in ms.get("datasets", [])]
        if keys:
            return keys
        # fall back to scanning directories with array metadata
        meta = "zarr.json" if self._version == "0.5" else ".zarray"
        return sorted(p.name for p in self._path.iterdir() if (p / meta).exists())

    def __contains__(self, key: str) -> bool:
        meta = "zarr.json" if self._version == "0.5" else ".zarray"
        return (self._path / str(key) / meta).exists()

    def __getitem__(self, key: str) -> ImageArray:
        key = str(key)
        if key not in self._arrays:
            arr_dir = self._path / key
            store = _open_array(arr_dir, self._version, write=self._mode != "r")
            # plate-relative path "row/col/fov/key" (iohub convention)
            rel = "/".join(self._path.parts[-3:])
            self._arrays[key] = ImageArray(store, f"{rel}/{key}", arr_dir)
        return self._arrays[key]

    @property
    def data(self) -> ImageArray:
        return self["0"]

    def create_image(
        self,
        key: str,
        data: np.ndarray,
        chunks: Sequence[int] | None = None,
        transform: list[TransformationMeta] | None = None,
        shard: bool = False,
    ) -> ImageArray:
        arr = self.create_zeros(
            key, data.shape, data.dtype, chunks=chunks, transform=transform, shard=shard
        )
        arr[:] = data
        return arr

    def create_zeros(
        self,
        key: str,
        shape: Sequence[int],
        dtype: np.dtype,
        chunks: Sequence[int] | None = None,
        transform: list[TransformationMeta] | None = None,
        shard: bool = False,
        compressor: str = "zstd",
    ) -> ImageArray:
        key = str(key)
        arr_dir = self._path / key
        store = _create_array(
            arr_dir, shape, dtype, chunks, self._version, shard=shard, compressor=compressor
        )
        self._register_dataset(key, transform)
        rel = "/".join(self._path.parts[-3:])
        img = ImageArray(store, f"{rel}/{key}", arr_dir)
        self._arrays[key] = img
        return img

    def _register_dataset(self, key: str, transform: list[TransformationMeta] | None) -> None:
        attrs = self.zattrs
        d = attrs.asdict()
        ms = d.setdefault(
            "multiscales",
            [{"version": "0.4", "axes": _AXES_5D, "datasets": [], "name": ""}],
        )
        datasets = ms[0].setdefault("datasets", [])
        if not any(ds["path"] == key for ds in datasets):
            tforms = [t.to_dict() for t in transform] if transform else [
                {"type": "scale", "scale": [1.0] * 5}
            ]
            datasets.append({"path": key, "coordinateTransformations": tforms})
        attrs._replace(d)

    def append_channel(self, name: str, resize_arrays: bool = True) -> None:
        """Add a channel label (and grow all arrays along C by one)."""
        attrs = self.zattrs
        d = attrs.asdict()
        omero = d.setdefault("omero", {"channels": []})
        omero["channels"].append({"label": name})
        attrs._replace(d)
        if resize_arrays:
            for key in self.array_keys():
                arr = self[key]
                shape = list(arr.shape)
                shape[1] += 1
                arr.resize(shape)

    def rename_channel(self, old: str, new: str) -> None:
        attrs = self.zattrs
        d = attrs.asdict()
        for c in d.get("omero", {}).get("channels", []):
            if c["label"] == old:
                c["label"] = new
        attrs._replace(d)

    def set_channel_names(self, names: Sequence[str]) -> None:
        attrs = self.zattrs
        d = attrs.asdict()
        d["omero"] = {"channels": [{"label": n} for n in names]}
        attrs._replace(d)

    def close(self) -> None:
        self._arrays.clear()


class Plate:
    """HCS plate (NGFF v0.4 `plate` layout): rows/columns/FOVs of Positions."""

    def __init__(self, path: Path, version: str, mode: str = "r") -> None:
        self._path = Path(path)
        self._version = version
        self._mode = mode
        self._channel_names: list[str] | None = None

    @property
    def zattrs(self) -> _Attrs:
        return _Attrs(self._path, self._version)

    @property
    def path(self) -> Path:
        return self._path

    @property
    def metadata(self) -> dict:
        return self.zattrs.asdict()

    @property
    def channel_names(self) -> list[str]:
        if self._channel_names is None:
            for _, pos in self.positions():
                self._channel_names = pos.channel_names
                break
            else:
                self._channel_names = []
        return self._channel_names

    def get_channel_index(self, name: str) -> int:
        return self.channel_names.index(name)

    def wells(self) -> Iterator[tuple[str, Path]]:
        plate_meta = self.zattrs.get("plate", {})
        for well in plate_meta.get("wells", []):
            yield well["path"], self._path / well["path"]

    def positions(self) -> Iterator[tuple[str, Position]]:
        """Yield ``(well/fov, Position)`` for every FOV in the plate."""
        for well_name, well_path in self.wells():
            well_attrs = _Attrs(well_path, self._version)
            images = well_attrs.get("well", {}).get("images", [])
            for img in images:
                fov = img["path"]
                yield f"{well_name}/{fov}", Position(
                    well_path / fov, self._version, self._mode
                )

    def __getitem__(self, key: str) -> Position:
        pos_path = self._path / key
        if not pos_path.exists():
            raise KeyError(key)
        return Position(pos_path, self._version, self._mode)

    def __contains__(self, key: str) -> bool:
        return (self._path / key).exists()

    def create_position(self, row: str, col: str, fov: str) -> Position:
        if self._mode == "r":
            raise PermissionError("Plate opened read-only")
        row, col, fov = str(row), str(col), str(fov)
        _make_group(self._path / row, self._version)
        well_path = self._path / row / col
        _make_group(well_path, self._version)
        pos_path = well_path / fov
        _make_group(pos_path, self._version)

        # register well in plate metadata
        attrs = self.zattrs
        d = attrs.asdict()
        plate = d.setdefault(
            "plate",
            {"version": "0.4", "wells": [], "rows": [], "columns": [], "acquisitions": [{"id": 0}]},
        )
        wp = f"{row}/{col}"
        if not any(w["path"] == wp for w in plate["wells"]):
            plate["wells"].append(
                {"path": wp, "rowIndex": _index_of(plate, "rows", row), "columnIndex": _index_of(plate, "columns", col)}
            )
        attrs._replace(d)

        # register image in well metadata
        well_attrs = _Attrs(well_path, self._version)
        wd = well_attrs.asdict()
        well = wd.setdefault("well", {"images": [], "version": "0.4"})
        if not any(i["path"] == fov for i in well["images"]):
            well["images"].append({"path": fov, "acquisition": 0})
        well_attrs._replace(wd)

        pos = Position(pos_path, self._version, self._mode)
        if self._channel_names:
            pos.set_channel_names(self._channel_names)
        return pos

    def set_channel_names(self, names: Sequence[str]) -> None:
        self._channel_names = list(names)

    def rename_channel(self, old: str, new: str) -> None:
        for _, pos in self.positions():
            pos.rename_channel(old, new)
        self._channel_names = None

    def close(self) -> None:
        pass

    def __enter__(self) -> "Plate":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _index_of(plate: dict, key: str, name: str) -> int:
    entries = plate.setdefault(key, [])
    for i, e in enumerate(entries):
        if e["name"] == name:
            return i
    entries.append({"name": name})
    return len(entries) - 1


def open_ome_zarr(
    store_path: str | Path,
    layout: Literal["hcs", "fov", "auto"] = "auto",
    mode: Literal["r", "r+", "a", "w", "w-"] = "r",
    channel_names: Sequence[str] | None = None,
    version: Literal["0.4", "0.5"] = "0.4",
) -> Plate | Position:
    """Open or create an OME-Zarr store.

    Parameters
    ----------
    store_path : path to the zarr store root.
    layout : "hcs" for a plate, "fov" for a single image group,
        "auto" to detect from metadata when reading.
    mode : "r" read-only, "r+"/"a" read-write (create if "a" and missing),
        "w" overwrite, "w-" create new (error if exists).
    channel_names : channel labels, required when creating.
    version : NGFF version for new stores — "0.4" (zarr v2) or "0.5" (zarr v3).
    """
    store_path = Path(store_path)
    exists = store_path.exists() and (
        (store_path / ".zgroup").exists()
        or (store_path / ".zattrs").exists()
        or (store_path / "zarr.json").exists()
    )
    if mode == "w" and store_path.exists():
        shutil.rmtree(store_path)
        exists = False
    if mode == "w-" and exists:
        raise FileExistsError(store_path)
    creating = mode in ("w", "w-") or (mode == "a" and not exists)
    if creating:
        if channel_names is None:
            raise ValueError("channel_names required when creating a store")
        _make_group(store_path, version)
        if layout in ("hcs", "auto"):
            attrs = _Attrs(store_path, version)
            d = attrs.asdict()
            d["plate"] = {
                "version": "0.4",
                "wells": [],
                "rows": [],
                "columns": [],
                "acquisitions": [{"id": 0}],
            }
            attrs._replace(d)
            plate = Plate(store_path, version, mode="a")
            plate.set_channel_names(channel_names)
            return plate
        pos = Position(store_path, version, mode="a")
        pos.set_channel_names(channel_names)
        return pos

    if not exists:
        raise FileNotFoundError(store_path)
    ver = _detect_version(store_path)
    attrs = _Attrs(store_path, ver)
    is_plate = "plate" in attrs
    if layout == "hcs" and not is_plate:
        raise ValueError(f"{store_path} is not an HCS plate")
    eff_mode = "r" if mode == "r" else "a"
    if is_plate and layout in ("hcs", "auto"):
        plate = Plate(store_path, ver, mode=eff_mode)
        if channel_names:
            plate.set_channel_names(channel_names)
        return plate
    return Position(store_path, ver, mode=eff_mode)
