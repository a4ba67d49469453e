"""Reference-style imports resolve to viscy_tpu modules (viscy_tpu/compat.py).

Pins the exact import blocks of the reference's shipped examples
(e.g. vcp_tutorials/quick_start.py:122-130) so scripts and notebooks
written against the reference packages run unchanged.
"""

import subprocess
import sys


def test_alias_modules_are_identical():
    import viscy_data.hcs
    import viscy_tpu.data.hcs

    assert viscy_data.hcs is viscy_tpu.data.hcs

    import viscy_transforms
    import viscy_tpu.transforms

    assert viscy_transforms is viscy_tpu.transforms


def test_reference_quick_start_import_block():
    # the verbatim imports from the reference quick start (minus torch-only
    # helpers), in a fresh interpreter so stub bootstrapping is exercised
    code = "\n".join(
        [
            "from cytoland.engine import FcmaeUNet",
            "from viscy_data.hcs import HCSDataModule",
            "from viscy_transforms import NormalizeSampled",
            "from viscy_utils.callbacks import HCSPredictionWriter",
            "from viscy_utils.callbacks import EmbeddingWriter",
            "from dynaclr.engine import ContrastiveModule",
            "from viscy_models.unet.fcmae import FullyConvolutionalMAE",
            "from viscy.unet.networks import unet2d",
            "from qc.config import QCConfig",
            "from airtable_utils.schemas import DatasetRecord",
            "print('ok')",
        ]
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout


def test_alias_error_names_the_mapping():
    import pytest

    with pytest.raises(ModuleNotFoundError, match="reference-compat alias"):
        import viscy_data.no_such_module  # noqa: F401
