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
]
