"""HCS prediction writer (reference ``callbacks/prediction_writer.py:114``).

Streams sliding-window predictions into an output HCS OME-Zarr store:
creates/validates the plate, appends prediction channels, resizes arrays
on demand, and blends overlapping Z-slabs with linear feathering
(``_blend_in``, reference ``:74``). Writes are host-side and queued off
the device critical path.
"""

from __future__ import annotations

import functools
import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viscy_tpu.training.callbacks.base import Callback
from viscy_tpu.zarr_io.store import Position, open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = ["HCSPredictionWriter", "blend_in", "DeviceFovAssembler"]


def blend_in(old_stack: np.ndarray, new_stack: np.ndarray, z_slice: slice) -> np.ndarray:
    """Blend a new Z-slab into the existing stack with linear feathering.

    Matches reference ``_blend_in`` (prediction_writer.py:74): the first
    ``z_slice.start`` overlapping slices ramp linearly between old and new.
    Accepts (C, Z, Y, X) numpy arrays. Returns ``new_stack`` when
    ``z_slice.start == 0``.
    """
    if z_slice.start == 0:
        return new_stack
    depth = z_slice.stop - z_slice.start
    samples = min(z_slice.start + 1, depth)
    factors = np.array(
        [min(i + 1, samples) for i in reversed(range(depth))], dtype=np.float32
    )
    factors = factors[np.newaxis, :, np.newaxis, np.newaxis]
    return old_stack * (factors - 1) / factors + new_stack / factors


class DeviceFovAssembler:
    """Blend overlapping z-window predictions into a device-resident slab.

    The reference blends on host (``prediction_writer.py:74-111``) because
    its forward pass lives there; the blend itself is elementwise, so on
    TPU it belongs next to the forward — the host then fetches ONE final
    (C, Z, Y, X) slab per (fov, t) instead of every overlapping window
    (6x the bytes at production z overlap), and the numpy blend math
    (measured ~35 s/FOV single-core at (2, 20, 2048, 2048)) disappears
    entirely from the host path.

    The accumulator is allocated once per FOV with z-capacity headroom and
    updated IN PLACE: ``z_start`` is a traced argument and the buffer is
    donated, so every window of every FOV runs ONE compiled elementwise
    program with no reallocation (growing the buffer per window would copy
    the full slab each time — 671 MB at production shape). Identical math
    to :func:`blend_in` (same factors, same order), in f32 on device.

    ``fetch_dtype``:

    - ``"float32"`` (default): parity path, byte-identical semantics.
    - ``"float16"``: half the D2H + write bytes; values cast at fetch.
    - ``"uint16"``: half the bytes, integer codec path; the slab is
      affinely scaled to [0, 65535] per (fov, t, channel) at fetch and
      the (lo, hi) ranges are returned so the writer can record them.
    """

    GROW = 8  # z-capacity headroom beyond the first window's depth

    def __init__(self, fetch_dtype: str = "float32") -> None:
        if fetch_dtype not in ("float32", "float16", "uint16"):
            raise ValueError(f"Unsupported fetch_dtype {fetch_dtype!r}")
        self.fetch_dtype = fetch_dtype
        # key -> (device buffer (C, cap, Y, X), used z depth)
        self._acc: dict[tuple, tuple[object, int]] = {}

    # module-lifetime jit (NOT a per-call closure: jax.jit caches by
    # function identity, so a fresh closure per window would recompile
    # every update). z_start is TRACED and the accumulator donated: one
    # compiled program per window geometry, updating in place.
    @staticmethod
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _blend_update(acc, pred, z_start):
        cz = pred.shape[1]
        old = jax.lax.dynamic_slice_in_dim(acc, z_start, cz, axis=1)
        # reference blend_in factors: position j in the window has weight
        # 1/min(cz - j, z_start + 1); at z_start == 0 every factor is 1,
        # so the first window is written through unblended
        samples = jnp.minimum(z_start + 1, cz).astype(jnp.float32)
        factors = jnp.minimum(
            jnp.arange(cz, 0, -1, dtype=jnp.float32), samples
        ).reshape(1, cz, 1, 1)
        blended = old * (factors - 1) / factors + pred / factors
        return jax.lax.dynamic_update_slice_in_dim(acc, blended, z_start, axis=1)

    def add(self, key: tuple, pred, z_start: int) -> None:
        """Blend one (C, cz, Y, X) device window into the slab for ``key``."""
        cz = int(pred.shape[1])
        need = int(z_start) + cz
        entry = self._acc.get(key)
        if entry is None:
            cap = need + self.GROW
            acc, used = (
                jnp.zeros((pred.shape[0], cap, *pred.shape[-2:]), jnp.float32),
                0,
            )
        else:
            acc, used = entry
            if need > acc.shape[1]:  # rare: pad capacity geometrically
                cap = max(need + self.GROW, 2 * acc.shape[1])
                acc = jnp.pad(
                    acc, ((0, 0), (0, cap - acc.shape[1]), (0, 0), (0, 0))
                )
        self._acc[key] = (
            self._blend_update(acc, pred.astype(jnp.float32), z_start),
            max(need, used),
        )

    def keys(self) -> list[tuple]:
        return list(self._acc)

    def pop(self, key: tuple):
        """Remove and return ``(buffer, used_depth)`` for ``key`` (no
        fetch); pair with :meth:`convert` on a worker thread so the D2H
        transfer and dtype conversion overlap the next FOV's blending."""
        return self._acc.pop(key)

    @staticmethod
    @jax.jit
    def _to_u16(acc):
        lo = acc.min(axis=(1, 2, 3), keepdims=True)
        hi = acc.max(axis=(1, 2, 3), keepdims=True)
        scale = 65535.0 / jnp.maximum(hi - lo, 1e-12)
        q = jnp.round((acc - lo) * scale)
        return q.astype(jnp.uint16), lo[:, 0, 0, 0], hi[:, 0, 0, 0]

    def convert(self, entry):
        """Fetch a ``(buffer, used_depth)`` device slab to host in
        ``fetch_dtype`` (capacity headroom sliced off on device).

        Returns ``(slab, ranges)``: slab is numpy; ranges is a per-channel
        (lo, hi) float array for ``"uint16"`` (None otherwise).
        """
        acc, used = entry
        acc = jax.lax.slice_in_dim(acc, 0, used, axis=1)
        if self.fetch_dtype == "float32":
            return np.asarray(jax.device_get(acc)), None
        if self.fetch_dtype == "float16":
            return np.asarray(jax.device_get(acc.astype(jnp.float16))), None
        q, lo, hi = jax.device_get(self._to_u16(acc))
        return np.asarray(q), np.stack([np.asarray(lo), np.asarray(hi)], axis=1)

    def fetch(self, key: tuple):
        """Pop + convert in one call (synchronous convenience)."""
        return self.convert(self.pop(key))


class HCSPredictionWriter(Callback):
    """Write per-window predictions into an HCS OME-Zarr store."""

    def __init__(
        self,
        output_store: str,
        overwrite: bool = False,
        write_input: bool = False,
        write_interval: Literal["batch"] = "batch",
        assemble_fovs: bool = True,
        flush_workers: int = 2,
        device_blend: bool = True,
        output_dtype: Literal["float32", "float16", "uint16"] = "float32",
        compressor: str = "lz4",
    ) -> None:
        self.output_store = Path(output_store)
        self.overwrite = overwrite
        self.write_input = write_input
        # device_blend: when predictions arrive as device (jax) arrays and
        # the geometry is 3D sliding-window, blend overlapping z-slabs ON
        # DEVICE (DeviceFovAssembler) and fetch one final slab per (fov, t).
        # The trainer keeps predictions on device for callbacks that set
        # wants_device_predictions. Numpy predictions fall back to the host
        # blend path below (identical math).
        self.device_blend = device_blend
        # output_dtype: dtype of the created prediction arrays. float32 is
        # the reference-parity default; float16 halves write bytes (cast);
        # uint16 halves bytes on an integer codec path — slabs are affinely
        # scaled per (fov, t, channel) and the (lo, hi) ranges recorded in
        # .zattrs["prediction_scaling"] (documented deviation: the reference
        # always writes float32, prediction_writer.py:239-321).
        if output_dtype not in ("float32", "float16", "uint16"):
            raise ValueError(f"Unsupported output_dtype {output_dtype!r}")
        if output_dtype != "float32" and write_input:
            raise ValueError("write_input requires output_dtype='float32'")
        self.output_dtype = output_dtype
        # compressor preset for created arrays ("lz4" bitshuffle default:
        # ~3x the write throughput of zstd-1 at comparable ratio; "zstd"
        # for maximum ratio, "none" to skip compression)
        self.compressor = compressor
        # assemble_fovs: blend overlapping z-windows into a per-(fov, t)
        # RAM buffer and write the zarr ONCE when the fov completes — the
        # per-window read-modify-write path re-reads and re-writes each
        # overlapping slab (~6x the IO at production z overlap; measured
        # the dominant cost of the predict host path). Identical output
        # (same blend math, buffers start from the created-zeros state).
        self.assemble_fovs = assemble_fovs
        # flush_workers: assembled-FOV flushes (whole-slab blosc compression
        # + zarr write, the long pole of the predict host path) run on their
        # own pool so they overlap the NEXT fov's window blending instead of
        # blocking the writer thread. Blend order within a (fov, t) is
        # unaffected (a key is flushed only after its windows complete);
        # concurrent flushes touch disjoint zarr regions, with array
        # create/resize serialized by a lock.
        self.flush_workers = max(1, int(flush_workers))
        self._plate = None
        self._positions: dict[str, Position] = {}
        self._pool: ThreadPoolExecutor | None = None
        self._flush_pool: ThreadPoolExecutor | None = None
        self._pending = []
        self._flush_pending = []
        self._assembly: dict[tuple, np.ndarray] = {}
        self._device_assembler: DeviceFovAssembler | None = None

    @property
    def wants_device_predictions(self) -> bool:
        """Ask the trainer to pass predictions as device arrays (no
        device_get): the writer blends on device and fetches per-FOV."""
        return self.device_blend

    # -- lifecycle --------------------------------------------------------------
    def on_predict_start(self, trainer, module) -> None:
        dm = self._datamodule = getattr(trainer, "_active_datamodule", None) or getattr(
            module, "datamodule", None
        )
        self._source_channels: list[str] = []
        self._target_channels: list[str] = []
        self._z_window_size = 1
        # One background writer thread: keeps host zarr writes off the device
        # critical path while serializing the read-modify-write feathered
        # blends (overlapping Z-slabs of one FOV must apply in order).
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._flush_pool = ThreadPoolExecutor(max_workers=self.flush_workers)
        self._pending = []
        self._flush_pending = []
        import threading

        self._resize_lock = threading.Lock()

    def setup_from_datamodule(self, datamodule) -> None:
        self._datamodule = datamodule

    def _ensure_store(self, dm) -> None:
        if self._plate is not None:
            return
        self._source_channels = list(getattr(dm, "source_channel", []))
        self._target_channels = list(getattr(dm, "target_channel", []))
        self._z_window_size = getattr(dm, "z_window_size", 1)
        channels = list(self._target_channels)
        if self.write_input:
            channels = self._source_channels + channels
        if self.output_store.exists() and not self.overwrite:
            # existing store: error on channel collision, append missing
            # channels (reference prediction_writer.py:200 needs_append)
            self._plate = open_ome_zarr(self.output_store, mode="r+")
            existing = self._plate.channel_names
            for ch in channels:
                if ch in existing:
                    raise FileExistsError(
                        f"Channel {ch} already exists in {self.output_store}; "
                        "pass overwrite=True to replace."
                    )
            for _, pos in self._plate.positions():
                for ch in channels:
                    if ch not in pos.channel_names:
                        pos.append_channel(ch, resize_arrays=True)
            self._plate.set_channel_names(existing + [c for c in channels if c not in existing])
            self._channel_offset = len(existing)
            self._channels = channels
            return
        else:
            self._plate = open_ome_zarr(
                self.output_store,
                layout="hcs",
                mode="w" if self.overwrite else "w-",
                channel_names=channels,
            )
        self._channel_offset = 0
        self._channels = channels

    @property
    def _np_dtype(self):
        return {"float32": np.float32, "float16": np.float16, "uint16": np.uint16}[
            self.output_dtype
        ]

    # -- writing ------------------------------------------------------------------
    def write_on_batch_end(self, trainer, module, prediction, batch, batch_idx) -> None:
        dm = getattr(trainer, "_active_datamodule", None)
        self._ensure_store(dm or self._datamodule)
        indices = batch["index"]
        if not isinstance(indices, list):
            indices = [indices]
        if self._try_device_blend(prediction, indices):
            return
        preds = np.asarray(prediction, np.float32)
        sources = batch.get("source") if self.write_input else None
        for i, idx in enumerate(indices):
            img_name, t, z = str(idx[0]), int(idx[1]), int(idx[2])
            src = None if sources is None else np.asarray(sources[i], np.float32)
            self._pending.append(
                self._pool.submit(self._write_sample, preds[i], img_name, t, z, src)
            )
        self._drain(max_pending=64)

    def _try_device_blend(self, prediction, indices) -> bool:
        """Route a device-array prediction through the on-device blender.

        Engages only for the 3D sliding-window geometry (z_padding == 0,
        window depth > 1 — the case where host blending dominates); other
        geometries and numpy predictions take the host path below.
        """
        if not self.device_blend or self.write_input:
            return False
        try:
            import jax
        except Exception:  # pragma: no cover - jax is a hard dep elsewhere
            return False
        if not isinstance(prediction, jax.Array):
            return False
        cz = int(prediction.shape[-3])
        z_padding = (
            self._z_window_size // 2 if cz == 1 else max(0, (self._z_window_size - cz) // 2)
        )
        if z_padding != 0 or cz <= 1:
            return False
        if self._device_assembler is None:
            self._device_assembler = DeviceFovAssembler(self.output_dtype)
        asm = self._device_assembler
        offset = getattr(self, "_channel_offset", 0)
        pred_idx = tuple(range(offset, offset + int(prediction.shape[1])))
        for i, idx in enumerate(indices):
            img_name, t, z = str(idx[0]), int(idx[1]), int(idx[2])
            key = (img_name, t, pred_idx)
            for other in [k for k in asm.keys() if k != key]:
                self._submit_device_flush(other)
            asm.add(key, prediction[i], z)
        # bound in-flight flushes: each pending job pins a full device slab
        # in HBM (671 MB/FOV at production shape) until its D2H completes
        while len(self._flush_pending) > 2 * self.flush_workers:
            self._flush_pending.pop(0).result()
        self._drain(max_pending=2)
        return True

    def _submit_device_flush(self, key: tuple) -> None:
        acc = self._device_assembler.pop(key)
        asm = self._device_assembler

        def job() -> None:
            slab, ranges = asm.convert(acc)
            self._write_device_slab(key, slab, ranges)

        self._flush_pending.append(self._flush_pool.submit(job))

    def _write_device_slab(self, key: tuple, slab: np.ndarray, ranges) -> None:
        img_name, t, pred_idx = key
        pos = self._get_position(img_name)
        total_ch = getattr(self, "_channel_offset", 0) + len(self._channels)
        img = self._ensure_image(pos, t, slab.shape[1], slab.shape[-2:], total_ch)
        img.oindex[t, list(pred_idx), slice(0, slab.shape[1])] = slab
        if ranges is not None:
            offset = getattr(self, "_channel_offset", 0)
            with self._resize_lock:
                attrs = pos.zattrs
                d = attrs.asdict()
                scaling = d.setdefault("prediction_scaling", {})
                for ci, (lo, hi) in zip(pred_idx, ranges):
                    label = self._channels[ci - offset]
                    scaling.setdefault(label, {})[str(t)] = {
                        "lo": float(lo),
                        "hi": float(hi),
                        "formula": "value = lo + uint16 / 65535 * (hi - lo)",
                    }
                attrs._replace(d)

    def _drain(self, max_pending: int = 0) -> None:
        """Bound the write queue; surface background write errors promptly."""
        while len(self._pending) > max_pending:
            self._pending.pop(0).result()
        for queue in (self._pending, self._flush_pending):
            done = [f for f in queue if f.done()]
            for f in done:
                queue.remove(f)
                f.result()  # re-raise any background exception

    def _get_position(self, img_name: str) -> Position:
        # img_name like "/A/1/0/0" or "A/1/0/0" (fov path + array key)
        parts = [p for p in img_name.split("/") if p]
        fov = "/".join(parts[:3]) if len(parts) >= 3 else "/".join(parts)
        with self._resize_lock:
            if fov not in self._positions:
                if fov in self._plate:
                    pos = self._plate[fov]
                else:
                    row, col, f = fov.split("/")
                    pos = self._plate.create_position(row, col, f)
                self._positions[fov] = pos
            return self._positions[fov]

    def _ensure_image(self, pos: Position, t: int, z_stop: int, shape_yx, n_total_ch: int):
        """Create/resize a position's image under the resize lock (the window
        thread and concurrent flush threads may grow the same array)."""
        with self._resize_lock:
            if "0" not in pos:
                pos.create_zeros(
                    "0",
                    (t + 1, n_total_ch, z_stop, *shape_yx),
                    self._np_dtype,
                    compressor=self.compressor,
                )
            img = pos["0"]
            if img.shape[0] <= t or img.shape[2] < z_stop:
                img.resize(
                    (
                        max(t + 1, img.shape[0]),
                        img.shape[1],
                        max(z_stop, img.shape[2]),
                        *img.shape[-2:],
                    )
                )
            return img

    def _write_sample(
        self, pred: np.ndarray, img_name: str, t: int, z_start: int, source: np.ndarray | None
    ) -> None:
        pos = self._get_position(img_name)
        n_ch = len(self._channels)
        cz = pred.shape[-3]
        # 2.5D: output depth < input window — place at the window center.
        # For single-slice outputs use z_window_size // 2 to match the
        # reference (prediction_writer.py:305) and SlidingWindowDataset's
        # center-slice key (z + z_window_size // 2), which differ from
        # (z_window_size - 1) // 2 when the window is even.
        z_padding = self._z_window_size // 2 if cz == 1 else max(0, (self._z_window_size - cz) // 2)
        z_index = z_start + z_padding
        z_slice = slice(z_index, z_index + cz)
        total_ch = getattr(self, "_channel_offset", 0) + n_ch
        # create/grow T/Z on demand (reference ``_resize_image``)
        img = self._ensure_image(pos, t, z_slice.stop, pred.shape[-2:], total_ch)
        offset = getattr(self, "_channel_offset", 0) + (
            len(self._source_channels) if self.write_input else 0
        )
        if source is not None:
            center = source.shape[-3] // 2
            src0 = getattr(self, "_channel_offset", 0)
            for c in range(source.shape[0]):
                img[t, src0 + c, z_index] = source[c, center]
        pred_idx = list(range(offset, offset + pred.shape[0]))
        if z_padding == 0 and cz > 1:
            if self.assemble_fovs:
                # blend into the RAM buffer; one zarr write per (fov, t)
                key = (img_name, t, tuple(pred_idx))
                for other in [k for k in self._assembly if k != key]:
                    # completed fov: hand its buffer to the flush pool so the
                    # whole-slab compress+write overlaps THIS fov's blending
                    buf_done = self._assembly.pop(other)
                    self._flush_pending.append(
                        self._flush_pool.submit(self._flush_assembly, other, buf_done)
                    )
                buf = self._assembly.get(key)
                if buf is None or buf.shape[1] < z_slice.stop:
                    grown = np.zeros(
                        (pred.shape[0], z_slice.stop, *pred.shape[-2:]), np.float32
                    )
                    if buf is not None:
                        grown[:, : buf.shape[1]] = buf
                    self._assembly[key] = buf = grown
                buf[:, z_slice] = blend_in(buf[:, z_slice], pred, z_slice)
                return
            old = img.oindex[t, pred_idx, z_slice]
            pred = blend_in(old, pred, z_slice)
        img.oindex[t, pred_idx, z_slice] = pred

    def _flush_assembly(self, key: tuple, buf: np.ndarray | None = None) -> None:
        """Write one assembled (fov, t) buffer to the store. Runs on the
        flush pool; concurrent flushes touch disjoint (t, channel, fov)
        regions, with create/resize serialized by ``_ensure_image``."""
        if buf is None:
            buf = self._assembly.pop(key, None)
        if buf is None:
            return
        img_name, t, pred_idx = key
        pos = self._get_position(img_name)
        total_ch = getattr(self, "_channel_offset", 0) + len(self._channels)
        img = self._ensure_image(pos, t, buf.shape[1], buf.shape[-2:], total_ch)
        img.oindex[t, list(pred_idx), slice(0, buf.shape[1])] = buf

    def on_predict_end(self, trainer, module) -> None:
        if self._pool is not None:
            # complete all queued window writes FIRST (they populate the
            # assembly buffers), then flush the remaining assembled FOVs
            self._drain(max_pending=0)
            for key in list(self._assembly):
                self._flush_pending.append(
                    self._flush_pool.submit(
                        self._flush_assembly, key, self._assembly.pop(key)
                    )
                )
            if self._device_assembler is not None:
                # flush the final (still-accumulating) device FOVs
                for key in self._device_assembler.keys():
                    self._submit_device_flush(key)
                self._device_assembler = None
            while self._flush_pending:
                self._flush_pending.pop(0).result()
            self._pool.shutdown(wait=True)
            self._flush_pool.shutdown(wait=True)
            self._pool = None
            self._flush_pool = None
        self._plate = None
        self._positions.clear()
