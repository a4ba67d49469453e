"""DynaCLR: contrastive learning of cell dynamics
(reference ``applications/dynaclr/__init__.py`` exports)."""

from viscy_tpu.apps.dynaclr.data import (
    MultiExperimentDataModule,
    MultiExperimentIndex,
    MultiExperimentTripletDataset,
    sample_tau,
)
from viscy_tpu.apps.dynaclr.engine import ContrastiveModule, ContrastivePrediction
from viscy_tpu.apps.dynaclr.experiment import ExperimentRegistry
from viscy_tpu.apps.dynaclr.foundation_engine import FoundationModule
from viscy_tpu.apps.dynaclr.vae_engine import BetaVaeModule
from viscy_tpu.models.contrastive.loss import NTXentHCL

__all__ = [
    "BetaVaeModule",
    "ContrastiveModule",
    "ContrastivePrediction",
    "ExperimentRegistry",
    "FoundationModule",
    "MultiExperimentDataModule",
    "MultiExperimentIndex",
    "MultiExperimentTripletDataset",
    "NTXentHCL",
    "sample_tau",
]
