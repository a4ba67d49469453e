"""Experiment-metadata curation (reference ``applications/airtable``).

A local, file-backed experiment registry with the same query surface as
the reference's Airtable client, an optional REST client for actual
Airtable bases (gated — this build environment has no egress), and the
``prepare`` pipeline that drives concatenate -> QC -> preprocess stages
into a training ``collection.yml``.
"""

from viscy_tpu.data.channel_utils import parse_channel_name
from viscy_tpu.apps.airtable_utils.database import (
    AirtableClient,
    AirtableDatasets,
    ExperimentRegistry,
    MarkerRegistryEntry,
)
from viscy_tpu.apps.airtable_utils.prepare import PrepareConfig, run_prepare
from viscy_tpu.apps.airtable_utils.schemas import (
    BiologicalAnnotation,
    ChannelAnnotationEntry,
    DatasetRecord,
    Perturbation,
    WellExperimentMetadata,
    parse_channel_fields,
    parse_position_name,
)

__all__ = [
    "parse_channel_name",
    "ExperimentRegistry",
    "AirtableClient",
    "AirtableDatasets",
    "MarkerRegistryEntry",
    "PrepareConfig",
    "run_prepare",
    "BiologicalAnnotation",
    "ChannelAnnotationEntry",
    "DatasetRecord",
    "Perturbation",
    "WellExperimentMetadata",
    "parse_channel_fields",
    "parse_position_name",
]
