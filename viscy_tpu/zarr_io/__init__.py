"""OME-Zarr HCS storage layer built on tensorstore.

TPU-native replacement for the reference's iohub/zarr-python stack
(`/root/reference` uses iohub.ngff over zarr-python; see
``packages/viscy-data/src/viscy_data/_zarr_codec.py:1``). All chunked
array IO goes through tensorstore's C++ engine; OME-NGFF metadata
(.zattrs/.zgroup JSON) is managed directly by this module.
"""

from viscy_tpu.zarr_io.store import (
    ImageArray,
    Plate,
    Position,
    TransformationMeta,
    open_ome_zarr,
)
from viscy_tpu.zarr_io.synthetic import build_hcs_plate

__all__ = [
    "ImageArray",
    "Plate",
    "Position",
    "TransformationMeta",
    "open_ome_zarr",
    "build_hcs_plate",
]
