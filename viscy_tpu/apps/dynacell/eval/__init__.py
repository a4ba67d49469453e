"""Dynacell evaluation framework (TPU-native rebuild).

Rebuilds the reference's three-tier virtual-staining benchmark
(``/root/reference/applications/dynacell/src/dynacell/evaluation/``):

- **pixel tier** (:mod:`.metrics`): PCC / SSIM / NRMSE / PSNR plus the
  spectral suite (:mod:`.spectral` — spectral-PCC, multiband EV, FSC).
- **mask tier** (:mod:`.metrics`, :mod:`.instance_metrics`,
  :mod:`.segmentation`): binary Dice/IoU family + Cellpose-style
  instance AP over native watershed (or gated Cellpose) segmentations.
- **feature tier** (:mod:`.feature_metrics`, :mod:`.features`): per-cell
  CP regionprops + deep embeddings scored with FID / KID / precision-
  recall / MIND / cosine, feature pruning (:mod:`.feature_select`), and
  FOV-stratified linear probes (:mod:`.linear_probe`).

Orchestration lives in :mod:`.pipeline` with artifact caching in
:mod:`.cache` (identity manifest + per-artifact param invalidation,
mirroring reference ``cache.py``/``pipeline_cache.py``) and local
thread-pool batching in :mod:`.runtime` (replacing SLURM submission).

The spectral-PCC diagnostic suite (reference
``evaluation/spectral_pcc/``) adds :mod:`.decorr` (DCR decorrelation
resolution, one-image FRC, OTF cutoff, band-limited PCC/SSIM),
:mod:`.spectral_eval` (per-position time-series evaluation driver),
:mod:`.simulate_beads` (bead-phantom metric validation under known
bleaching) and :mod:`.diagnostics` (cross-position / shading figures).

All numerics are numpy/scipy/JAX — no cubic/cupy/torch-fidelity
dependencies; GPU-only reference paths run on the TPU host CPU or via
jitted JAX where batched (SSIM, deep features).
"""

from viscy_tpu.apps.dynacell.eval.spectral import (  # noqa: F401
    estimate_noise_floor,
    fsc_resolution,
    multiband_ev_score,
    radial_power_spectrum,
    spectral_pcc,
)
from viscy_tpu.apps.dynacell.eval.decorr import (  # noqa: F401
    band_limited_pcc as band_limited_pcc_cutoff,
    band_limited_ssim,
    calculate_frc,
    dcr_curve,
    dcr_resolution,
    frc_weights,
    otf_cutoff,
    spectral_pcc_frcw,
)
from viscy_tpu.apps.dynacell.eval.cache import (  # noqa: F401
    CACHE_SCHEMA_VERSION,
    CachePaths,
    StaleCacheError,
    cache_paths,
    load_manifest,
    save_manifest,
)
