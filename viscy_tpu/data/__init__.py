"""Data layer: datasets, datamodules, samplers (reference ``viscy-data``)."""

from viscy_tpu.data.typing import ChannelMap, NormMeta, Sample, TripletSample
from viscy_tpu.data.hcs import HCSDataModule
from viscy_tpu.data.sliding_window import SlidingWindowDataset
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.triplet import TripletDataModule, TripletDataset
from viscy_tpu.data.combined import (
    BatchedConcatDataModule,
    CombinedDataModule,
    ConcatDataModule,
)
from viscy_tpu.data.distributed import ShardedDistributedSampler
from viscy_tpu.data.sampler import FlexibleBatchSampler
from viscy_tpu.data.gpu_aug import CachedOmeZarrDataModule, DeviceTransformDataModule
from viscy_tpu.data.channel_dropout import ChannelDropout
from viscy_tpu.data.cell_classification import ClassificationDataModule, ClassificationDataset
from viscy_tpu.data.segmentation import SegmentationDataModule, SegmentationDataset
from viscy_tpu.data.mmap_cache import MmappedDataModule

__all__ = [
    "ChannelMap",
    "NormMeta",
    "Sample",
    "TripletSample",
    "HCSDataModule",
    "SlidingWindowDataset",
    "DataLoader",
    "TripletDataModule",
    "TripletDataset",
    "CombinedDataModule",
    "ConcatDataModule",
    "BatchedConcatDataModule",
    "ShardedDistributedSampler",
    "FlexibleBatchSampler",
    "CachedOmeZarrDataModule",
    "DeviceTransformDataModule",
    "ChannelDropout",
    "ClassificationDataModule",
    "ClassificationDataset",
    "SegmentationDataModule",
    "SegmentationDataset",
    "MmappedDataModule",
]
