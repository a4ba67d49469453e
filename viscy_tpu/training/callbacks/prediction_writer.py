"""HCS prediction writer (reference ``callbacks/prediction_writer.py:114``).

Streams sliding-window predictions into an output HCS OME-Zarr store:
creates/validates the plate, appends prediction channels, resizes arrays
on demand, and blends overlapping Z-slabs with linear feathering
(``_blend_in``, reference ``:74``). Writes are host-side and queued off
the device critical path.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Literal, Sequence

import numpy as np

from viscy_tpu.training.callbacks.base import Callback
from viscy_tpu.zarr_io.store import Position, open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = ["HCSPredictionWriter", "blend_in"]


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
    ) -> None:
        self.output_store = Path(output_store)
        self.overwrite = overwrite
        self.write_input = write_input
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

    # -- writing ------------------------------------------------------------------
    def write_on_batch_end(self, trainer, module, prediction, batch, batch_idx) -> None:
        dm = getattr(trainer, "_active_datamodule", None)
        self._ensure_store(dm or self._datamodule)
        preds = np.asarray(prediction, np.float32)
        indices = batch["index"]
        if not isinstance(indices, list):
            indices = [indices]
        sources = batch.get("source") if self.write_input else None
        for i, idx in enumerate(indices):
            img_name, t, z = str(idx[0]), int(idx[1]), int(idx[2])
            src = None if sources is None else np.asarray(sources[i], np.float32)
            self._pending.append(
                self._pool.submit(self._write_sample, preds[i], img_name, t, z, src)
            )
        self._drain(max_pending=64)

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
                pos.create_zeros("0", (t + 1, n_total_ch, z_stop, *shape_yx), np.float32)
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
            while self._flush_pending:
                self._flush_pending.pop(0).result()
            self._pool.shutdown(wait=True)
            self._flush_pool.shutdown(wait=True)
            self._pool = None
            self._flush_pool = None
        self._plate = None
        self._positions.clear()
