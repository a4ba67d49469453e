"""Data layer: datasets, datamodules, samplers (reference ``viscy-data``).

The top-level export surface mirrors the reference package's
``viscy_data/__init__.py`` so imports port one-for-one (see
docs/MIGRATION.md).
"""

from viscy_tpu.data.typing import (
    AnnotationColumns,
    CELL_INDEX_BIOLOGY_COLUMNS,
    CELL_INDEX_CORE_COLUMNS,
    CELL_INDEX_GROUPING_COLUMNS,
    CELL_INDEX_IMAGING_COLUMNS,
    CELL_INDEX_NORMALIZATION_COLUMNS,
    CELL_INDEX_OPS_COLUMNS,
    CELL_INDEX_TIMELAPSE_COLUMNS,
    CellIndex,
    ChannelMap,
    ChannelNormStats,
    DictTransform,
    HCSStackIndex,
    LABEL_CELL_CYCLE_STATE,
    LABEL_CELL_DIVISION_STATE,
    LABEL_CELL_REMODELING_STATE,
    LABEL_INFECTION_STATE,
    LevelNormStats,
    NormMeta,
    OneOrSeq,
    Sample,
    SampleMeta,
    SegmentationSample,
    TripletSample,
    ULTRACK_INDEX_COLUMNS,
)
from viscy_tpu.data.cell_classification import (
    ClassificationDataModule,
    ClassificationDataset,
)
from viscy_tpu.data.cell_division_triplet import (
    CellDivisionTripletDataModule,
    CellDivisionTripletDataset,
)
from viscy_tpu.data.cell_index import (
    read_cell_index,
    validate_cell_index,
    write_cell_index,
)
from viscy_tpu.data.channel_dropout import ChannelDropout
from viscy_tpu.data.combined import (
    BatchedConcatDataModule,
    BatchedConcatDataset,
    CachedConcatDataModule,
    CombineMode,
    CombinedDataModule,
    ConcatDataModule,
)
from viscy_tpu.data.ctmc_v1 import CTMCv1DataModule
from viscy_tpu.data.distributed import ShardedDistributedSampler
from viscy_tpu.data.gpu_aug import (
    CachedOmeZarrDataModule,
    CachedOmeZarrDataset,
    DeviceTransformDataModule,
    GPUTransformDataModule,
)
from viscy_tpu.data.hcs import HCSDataModule, MaskTestDataset
from viscy_tpu.data.livecell import (
    LiveCellDataModule,
    LiveCellDataset,
    LiveCellTestDataset,
)
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.mmap_cache import MmappedDataModule, MmappedDataset
from viscy_tpu.data.sampler import FlexibleBatchSampler
from viscy_tpu.data.segmentation import SegmentationDataModule, SegmentationDataset
from viscy_tpu.data.select import SelectWell
from viscy_tpu.data.sliding_window import SlidingWindowDataset
from viscy_tpu.data.triplet import TripletDataModule, TripletDataset
from viscy_tpu.data.utils import read_norm_meta

__all__ = [
    "AnnotationColumns",
    "CELL_INDEX_BIOLOGY_COLUMNS",
    "CELL_INDEX_CORE_COLUMNS",
    "CELL_INDEX_GROUPING_COLUMNS",
    "CELL_INDEX_IMAGING_COLUMNS",
    "CELL_INDEX_NORMALIZATION_COLUMNS",
    "CELL_INDEX_OPS_COLUMNS",
    "CELL_INDEX_TIMELAPSE_COLUMNS",
    "BatchedConcatDataModule",
    "BatchedConcatDataset",
    "CTMCv1DataModule",
    "CachedConcatDataModule",
    "CachedOmeZarrDataModule",
    "CachedOmeZarrDataset",
    "CellDivisionTripletDataModule",
    "CellDivisionTripletDataset",
    "CellIndex",
    "ChannelDropout",
    "ChannelMap",
    "ChannelNormStats",
    "ClassificationDataModule",
    "ClassificationDataset",
    "CombineMode",
    "CombinedDataModule",
    "ConcatDataModule",
    "DataLoader",
    "DeviceTransformDataModule",
    "DictTransform",
    "FlexibleBatchSampler",
    "GPUTransformDataModule",
    "HCSDataModule",
    "HCSStackIndex",
    "LABEL_CELL_CYCLE_STATE",
    "LABEL_CELL_DIVISION_STATE",
    "LABEL_CELL_REMODELING_STATE",
    "LABEL_INFECTION_STATE",
    "LevelNormStats",
    "LiveCellDataModule",
    "LiveCellDataset",
    "LiveCellTestDataset",
    "MaskTestDataset",
    "MmappedDataModule",
    "MmappedDataset",
    "NormMeta",
    "OneOrSeq",
    "Sample",
    "SampleMeta",
    "SegmentationDataModule",
    "SegmentationDataset",
    "SegmentationSample",
    "SelectWell",
    "ShardedDistributedSampler",
    "SlidingWindowDataset",
    "TripletDataModule",
    "TripletDataset",
    "ULTRACK_INDEX_COLUMNS",
    "read_cell_index",
    "read_norm_meta",
    "validate_cell_index",
    "write_cell_index",
]
