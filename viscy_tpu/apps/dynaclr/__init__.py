"""DynaCLR: contrastive learning of cell dynamics
(reference ``applications/dynaclr``)."""

from viscy_tpu.apps.dynaclr.engine import ContrastiveModule

__all__ = ["ContrastiveModule"]
