"""Minimal AnnData container + spec-compliant AnnData-zarr IO.

The reference stores embeddings as AnnData zarr
(``viscy_utils/callbacks/embedding_writer.py:219``) and every downstream
DynaCLR tool reads that store. Neither ``anndata`` nor ``zarr-python``
ships on TPU hosts, so this module implements the **on-disk AnnData zarr
v2 spec directly**:

- group/attr layout per the anndata element specification
  (``encoding-type``/``encoding-version`` attrs on every element);
- dataframes as column groups with ``_index`` + ``column-order``;
- string columns as categoricals (``codes`` + ``categories``);
- string arrays with the numcodecs ``vlen-utf8`` object codec
  (implemented here — uint32 count header + per-element uint32 length
  prefix), exactly what ``zarr-python`` + ``anndata`` read and write;
- numeric arrays raw (compressor ``null``) through a small pure-Python
  chunk writer, so any zarr v2 reader consumes the store.

``AnnDataLite`` mirrors the slice of the ``anndata.AnnData`` API the
evaluation stack uses: ``X``, ``obs``, ``var``, ``obsm``, ``uns``,
``n_obs``, boolean-mask row slicing. When the real ``anndata`` package
is importable, :func:`read_anndata_zarr` can hand back a true AnnData
via ``to_anndata()``.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

__all__ = ["AnnDataLite", "write_anndata_zarr", "read_anndata_zarr"]


# -- zarr v2 primitives (pure python, compressor null) ------------------------
def _write_json(path: Path, obj: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(obj, indent=1, sort_keys=True))


def _init_group(path: Path, attrs: dict | None = None) -> None:
    _write_json(path / ".zgroup", {"zarr_format": 2})
    if attrs:
        _write_json(path / ".zattrs", attrs)


def _vlen_utf8_encode(strings: np.ndarray) -> bytes:
    """numcodecs VLenUTF8 encoding: uint32 count, then per element a
    uint32 byte length + utf8 payload (little-endian)."""
    items = [str(s).encode("utf-8") for s in strings.ravel()]
    out = [struct.pack("<I", len(items))]
    for b in items:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def _vlen_utf8_decode(buf: bytes) -> np.ndarray:
    (count,) = struct.unpack_from("<I", buf, 0)
    off = 4
    items = []
    for _ in range(count):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        items.append(buf[off : off + n].decode("utf-8"))
        off += n
    return np.asarray(items, dtype=object)


def _write_array(path: Path, arr: np.ndarray, attrs: dict | None = None) -> None:
    """Write one zarr v2 array: single chunk, compressor null.

    Strings (object/str dtype) use the ``vlen-utf8`` object codec;
    everything else is raw little-endian bytes.
    """
    path.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(arr)
    is_str = arr.dtype == object or arr.dtype.kind in ("U", "S")
    shape = list(arr.shape)
    chunks = [max(1, s) for s in shape] or [1]
    if is_str:
        meta = {
            "zarr_format": 2,
            "shape": shape,
            "chunks": chunks,
            "dtype": "|O",
            "compressor": None,
            "filters": [{"id": "vlen-utf8"}],
            "fill_value": 0,
            "order": "C",
            "dimension_separator": ".",
        }
        payload = _vlen_utf8_encode(arr)
    else:
        a = np.ascontiguousarray(arr)
        if a.dtype.byteorder == ">":
            a = a.astype(a.dtype.newbyteorder("<"))
        dt = a.dtype.str if a.dtype.kind != "b" else "|b1"
        meta = {
            "zarr_format": 2,
            "shape": shape,
            "chunks": chunks,
            "dtype": dt,
            "compressor": None,
            "filters": None,
            "fill_value": None,
            "order": "C",
            "dimension_separator": ".",
        }
        payload = a.tobytes()
    _write_json(path / ".zarray", meta)
    if attrs:
        _write_json(path / ".zattrs", attrs)
    chunk_key = ".".join(["0"] * max(1, len(shape)))
    (path / chunk_key).write_bytes(payload)


def _read_array(path: Path) -> np.ndarray:
    """Read one zarr v2 array (raw/vlen-utf8 via pure python; anything
    else — e.g. blosc-compressed — through tensorstore)."""
    meta = json.loads((path / ".zarray").read_text())
    shape = tuple(meta["shape"])
    filters = meta.get("filters") or []
    if any(f.get("id") == "vlen-utf8" for f in filters):
        key = ".".join(["0"] * max(1, len(shape)))
        return _vlen_utf8_decode((path / key).read_bytes()).reshape(shape)
    if meta.get("compressor") is None and not filters:
        key = ".".join(["0"] * max(1, len(shape)))
        buf = (path / key).read_bytes()
        arr = np.frombuffer(buf, dtype=np.dtype(meta["dtype"]))
        # the single chunk may be padded to the chunk shape
        n = int(np.prod(shape)) if shape else 1
        return arr[:n].reshape(shape).copy()
    import tensorstore as ts

    spec = {"driver": "zarr", "kvstore": {"driver": "file", "path": str(path)}}
    return np.asarray(ts.open(spec).result().read().result())


def _write_numeric_ts(path: Path, arr: np.ndarray, attrs: dict | None = None) -> None:
    """Large numeric arrays via tensorstore (blosc-compressed zarr v2)."""
    import tensorstore as ts

    arr = np.ascontiguousarray(arr)
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(path)},
        "metadata": {
            "dtype": arr.dtype.str,
            "shape": list(arr.shape),
            "chunks": [min(65536, s) if i == 0 else s for i, s in enumerate(arr.shape)],
        },
        "create": True,
        "delete_existing": True,
    }
    ts.open(spec).result().write(arr).result()
    if attrs:
        _write_json(Path(path) / ".zattrs", attrs)


_ARRAY_ATTRS = {"encoding-type": "array", "encoding-version": "0.2.0"}


# -- container -----------------------------------------------------------------
class AnnDataLite:
    """Minimal AnnData look-alike: X / obs / var / obsm / uns + row slicing."""

    def __init__(
        self,
        X: np.ndarray,
        obs: pd.DataFrame | None = None,
        var: pd.DataFrame | None = None,
        obsm: dict[str, np.ndarray] | None = None,
        uns: dict[str, Any] | None = None,
    ) -> None:
        self.X = np.asarray(X)
        n = self.X.shape[0]
        self.obs = obs if obs is not None else pd.DataFrame(index=pd.RangeIndex(n).astype(str))
        if len(self.obs) != n:
            raise ValueError(f"obs has {len(self.obs)} rows for X with {n}")
        self.var = (
            var
            if var is not None
            else pd.DataFrame(index=pd.Index([str(i) for i in range(self.X.shape[1])]))
        )
        self.obsm = dict(obsm or {})
        self.uns = dict(uns or {})

    @property
    def n_obs(self) -> int:
        return self.X.shape[0]

    @property
    def n_vars(self) -> int:
        return self.X.shape[1]

    @property
    def obs_names(self):
        return self.obs.index

    def __len__(self) -> int:
        return self.n_obs

    #: legacy round-1 dict keys -> AnnData members (keeps the dynaclr CLI's
    #: ``ds["features"]`` / ``ds["index"]`` call sites working unchanged)
    _LEGACY_KEYS = {
        "features": lambda a: a.X,
        "index": lambda a: a.obs,
        "projections": lambda a: a.obsm.get("X_projections"),
        "PCA": lambda a: a.obsm.get("X_pca"),
    }

    def __getitem__(self, key):
        if isinstance(key, str):
            if key in self._LEGACY_KEYS:
                value = self._LEGACY_KEYS[key](self)
                if value is not None:
                    return value
            if key in self.obsm:
                return self.obsm[key]
            raise KeyError(key)
        if isinstance(key, tuple):
            key = key[0]
        if isinstance(key, (pd.Series,)):
            key = key.to_numpy()
        idx = np.asarray(key)
        if idx.dtype == bool:
            idx = np.flatnonzero(idx)
        return AnnDataLite(
            X=self.X[idx],
            obs=self.obs.iloc[idx].copy(),
            var=self.var,
            obsm={k: np.asarray(v)[idx] for k, v in self.obsm.items()},
            uns=dict(self.uns),
        )

    def __contains__(self, key) -> bool:
        if not isinstance(key, str):
            return False
        if key in ("features", "index"):
            return True
        if key == "projections":
            return "X_projections" in self.obsm
        if key == "PCA":
            return "X_pca" in self.obsm
        return key in self.obsm

    def __iter__(self):
        yield "features"
        yield "index"
        if "X_projections" in self.obsm:
            yield "projections"
        if "X_pca" in self.obsm:
            yield "PCA"
        for k in self.obsm:
            if k not in ("X_projections", "X_pca"):
                yield k

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def copy(self) -> "AnnDataLite":
        return AnnDataLite(
            self.X.copy(), self.obs.copy(), self.var.copy(),
            {k: np.asarray(v).copy() for k, v in self.obsm.items()}, dict(self.uns),
        )

    def to_anndata(self):
        """Convert to a real ``anndata.AnnData`` when the package exists."""
        import anndata as ad

        a = ad.AnnData(X=self.X, obs=self.obs.copy(), var=self.var.copy())
        for k, v in self.obsm.items():
            a.obsm[k] = np.asarray(v)
        a.uns.update(self.uns)
        return a

    def write_zarr(self, path: str | Path, overwrite: bool = True) -> Path:
        return write_anndata_zarr(path, self, overwrite=overwrite)


# -- write ---------------------------------------------------------------------
def _write_dataframe(path: Path, df: pd.DataFrame) -> None:
    cols = [str(c) for c in df.columns]
    _init_group(
        path,
        {
            "encoding-type": "dataframe",
            "encoding-version": "0.2.0",
            "column-order": cols,
            "_index": "_index",
        },
    )
    _write_array(path / "_index", df.index.to_numpy().astype(str), attrs=_ARRAY_ATTRS)
    for col in df.columns:
        s = df[col]
        values = s.to_numpy()
        if pd.api.types.is_numeric_dtype(s) or values.dtype.kind in "ifub":
            _write_array(path / str(col), values, attrs=_ARRAY_ATTRS)
        else:
            # strings -> categorical (codes + categories), the anndata way
            cat = pd.Categorical(values.astype(str))
            grp = path / str(col)
            _init_group(
                grp,
                {"encoding-type": "categorical", "encoding-version": "0.2.0", "ordered": False},
            )
            _write_array(grp / "codes", cat.codes.astype(np.int32), attrs=_ARRAY_ATTRS)
            _write_array(grp / "categories", np.asarray(cat.categories, dtype=object), attrs=_ARRAY_ATTRS)


def write_anndata_zarr(path: str | Path, adata: AnnDataLite, overwrite: bool = True) -> Path:
    path = Path(path)
    if path.exists():
        if not overwrite:
            raise FileExistsError(f"{path} already exists")
        import shutil

        shutil.rmtree(path)
    _init_group(path, {"encoding-type": "anndata", "encoding-version": "0.1.0"})
    _write_numeric_ts(path / "X", np.asarray(adata.X, np.float32), attrs=_ARRAY_ATTRS)
    _write_dataframe(path / "obs", adata.obs)
    _write_dataframe(path / "var", adata.var)
    _init_group(path / "obsm", {"encoding-type": "dict", "encoding-version": "0.1.0"})
    for key, arr in adata.obsm.items():
        _write_numeric_ts(path / "obsm" / key, np.asarray(arr, np.float32), attrs=_ARRAY_ATTRS)
    _init_group(path / "uns", {"encoding-type": "dict", "encoding-version": "0.1.0"})
    for key, value in adata.uns.items():
        if isinstance(value, str):
            _write_array(
                path / "uns" / key,
                np.asarray(value, dtype=object).reshape(()),
                attrs={"encoding-type": "string", "encoding-version": "0.2.0"},
            )
        else:
            _write_array(path / "uns" / key, np.asarray(value), attrs=_ARRAY_ATTRS)
    return path


# -- read ----------------------------------------------------------------------
def _read_dataframe(path: Path) -> pd.DataFrame:
    attrs = json.loads((path / ".zattrs").read_text()) if (path / ".zattrs").exists() else {}
    index_key = attrs.get("_index", "_index")
    cols = attrs.get("column-order")
    if cols is None:
        cols = [p.name for p in path.iterdir() if p.is_dir() and p.name != index_key]
    index = _read_array(path / index_key) if (path / index_key).exists() else None
    data = {}
    for col in cols:
        sub = path / col
        if (sub / ".zarray").exists():
            data[col] = _read_array(sub)
        elif (sub / ".zgroup").exists():
            codes = _read_array(sub / "codes").astype(np.int64)
            categories = _read_array(sub / "categories")
            data[col] = pd.Categorical.from_codes(codes, categories.astype(str)).astype(str)
    df = pd.DataFrame(data)
    if index is not None:
        df.index = pd.Index(np.asarray(index).astype(str))
    return df


def read_anndata_zarr(path: str | Path) -> AnnDataLite:
    """Read an AnnData zarr store (written by this module OR by the real
    ``anndata`` package — both follow the same element spec)."""
    path = Path(path)
    X = _read_array(path / "X")
    obs = _read_dataframe(path / "obs") if (path / "obs").exists() else None
    var = _read_dataframe(path / "var") if (path / "var").exists() else None
    obsm = {}
    if (path / "obsm").exists():
        for sub in (path / "obsm").iterdir():
            if sub.is_dir() and ((sub / ".zarray").exists()):
                obsm[sub.name] = _read_array(sub)
    uns = {}
    if (path / "uns").exists():
        for sub in (path / "uns").iterdir():
            if sub.is_dir() and (sub / ".zarray").exists():
                val = _read_array(sub)
                uns[sub.name] = val.item() if val.shape == () else val
    return AnnDataLite(X=X, obs=obs, var=var, obsm=obsm, uns=uns)
