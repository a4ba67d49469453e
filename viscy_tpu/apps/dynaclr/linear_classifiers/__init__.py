"""Orchestrated linear-classifier evaluation for DynaCLR embeddings.

Rebuild of reference
``applications/dynaclr/src/dynaclr/evaluation/linear_classifiers/``:
rotating leave-one-dataset-out cross-validation with dataset-impact
analysis (:mod:`.cross_validation`), the multi-model orchestrated
pipeline with atomic publication (:mod:`.orchestrated`), discovery
utilities (:mod:`.utils`), and the multi-page PDF report
(:mod:`.report`).
"""

from viscy_tpu.apps.dynaclr.linear_classifiers.cross_validation import (  # noqa: F401
    cross_validate,
)
from viscy_tpu.apps.dynaclr.linear_classifiers.orchestrated import (  # noqa: F401
    run_linear_classifiers,
)
