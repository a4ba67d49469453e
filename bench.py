"""Benchmark: VSCyto3D training throughput (patches/sec/chip).

Measures the **production** train step of the flagship VSCyto3D recipe
(reference ``finetune_a549_infected_4gpu_batched.yml:131-165``): the full
device-side augmentation pipeline —

    BatchedRandAffined(prob=0.8, rot [pi,0,0], shear [0,.05,.05],
                       scale [[.7,1.3],[.5,1.5],[.5,1.5]])
    BatchedCenterSpatialCropd((15,384,384))          # fused into the warp
    BatchedRandAdjustContrastd + BatchedRandScaleIntensityd
    + BatchedRandGaussianNoised + BatchedRandGaussianSmoothd

— on (20,600,600) input stacks, fused with forward + backward + AdamW of
the FCMAE-based UNeXt2 (1->2ch). The affine warp and the downstream center
crop compile into a single output-space gather (Compose peephole,
``viscy_tpu/transforms/base.py``).

Also measures an **end-to-end** variant fed by the real HCSDataModule
loader on a synthetic OME-Zarr plate (host read -> crop/normalize ->
double-buffered async device_put -> device step), reported as extra keys.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}``.

Baseline: the reference publishes no throughput numbers (BASELINE.md).
``vs_baseline`` divides by an estimated H100 per-chip rate of 64
patches/s — derivation and roofline cross-check in BASELINE.md
("H100 anchor"). The JSON also carries ``mfu`` and ``flops_per_patch``
(XLA cost analysis of the compiled step vs the chip's peak bf16
FLOP/s) so the anchor-dependent ratio can be audited against the
hardware-grounded MFU number.

Env knobs: BENCH_BATCH (default 16), BENCH_STEPS (default 10),
BENCH_SKIP_E2E=1 to skip the loader-fed variant.
"""

from __future__ import annotations

import json
import os
import time

H100_EST_PATCHES_PER_SEC = 64.0  # derivation: BASELINE.md "H100 anchor"

# peak dense bf16 TFLOP/s per chip, for MFU accounting
_PEAK_BF16_TFLOPS = {
    "v5e": 197.0,  # TPU v5e / "v5 lite"
    "v5 lite": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,  # Trillium
    "h100": 990.0,  # dense (no 2:4 sparsity), for the roofline cross-check
}

# peak HBM GB/s per chip, for the memory-roofline accounting that gives the
# MFU number its context (tools/roofline.py: the production step's arithmetic
# intensity is ~39 FLOP/byte, well under the v5e's ~240 FLOP/byte ridge, so
# the step is memory-bound and HBM utilization is the honest efficiency axis)
_PEAK_HBM_GBPS = {
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
    "h100": 3350.0,  # SXM HBM3
}


def _chip_peak(table) -> float | None:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in table.items():
        if key in kind:
            return val
    return None


def _peak_tflops() -> float | None:
    return _chip_peak(_PEAK_BF16_TFLOPS)


def _peak_hbm_gbps() -> float | None:
    return _chip_peak(_PEAK_HBM_GBPS)

if os.environ.get("BENCH_TINY") == "1":
    # smoke-test mode for CPU CI: tiny shapes + tiny model, same code path
    STACK = (8, 48, 48)
    PATCH = (5, 32, 32)  # tiny flagship stem needs depth >= 5
else:
    STACK = (20, 600, 600)  # host RandWeightedCropd output (config :128)
    PATCH = (15, 384, 384)  # device center-crop (config :140)

_TINY = os.environ.get("BENCH_TINY") == "1"


def _production_aug():
    from viscy_tpu.transforms import (
        BatchedCenterSpatialCropd,
        BatchedRandAdjustContrastd,
        BatchedRandAffined,
        BatchedRandGaussianNoised,
        BatchedRandGaussianSmoothd,
        BatchedRandScaleIntensityd,
        Compose,
    )

    return Compose(
        [
            BatchedRandAffined(
                keys=["source", "target"],
                prob=0.8,
                rotate_range=[3.14, 0, 0],
                shear_range=[0.0, 0.05, 0.05],
                scale_range=[[0.7, 1.3], [0.5, 1.5], [0.5, 1.5]],
            ),
            BatchedCenterSpatialCropd(keys=["source", "target"], roi_size=list(PATCH)),
            BatchedRandAdjustContrastd(keys=["source"], prob=0.5, gamma=(0.8, 1.2)),
            BatchedRandScaleIntensityd(keys=["source"], prob=0.5, factors=0.5),
            BatchedRandGaussianNoised(keys=["source"], prob=0.5, mean=0.0, std=0.3),
            BatchedRandGaussianSmoothd(
                keys=["source"],
                prob=0.5,
                sigma_x=(0.25, 0.75),
                sigma_y=(0.25, 0.75),
                sigma_z=(0.25, 0.75),
            ),
        ]
    )


def _build_step(module, aug, mesh):
    import jax

    def train_step(state, batch, rng):
        rng, aug_rng = jax.random.split(rng)
        batch = aug(batch, aug_rng)

        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            loss, (metrics, updates) = module.training_loss(variables, batch, rng)
            return loss, (metrics, updates)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    return jax.jit(train_step, donate_argnums=(0,))


def bench_production_step(graft, mesh, n_dev: int, batch_per_chip: int, n_steps: int):
    """Device-only production step at full stack shape (augs included)."""
    import jax
    import numpy as np

    from viscy_tpu.parallel.mesh import replicate, shard_batch
    from viscy_tpu.training.state import TrainState

    module = graft._flagship(tiny=_TINY)
    b = batch_per_chip * n_dev
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((b, 1, *STACK), np.float32),
        "target": rng.random((b, 2, *STACK), np.float32),
    }
    # init at the post-augmentation shape the model actually sees
    init_batch = {
        "source": batch["source"][:, :, : PATCH[0], : PATCH[1], : PATCH[2]],
        "target": batch["target"][:, :, : PATCH[0], : PATCH[1], : PATCH[2]],
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)

    step = _build_step(module, _production_aug(), mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    # XLA cost analysis of the compiled step for MFU accounting (the
    # persistent compile cache dedupes this against the warmup compile)
    flops_per_step = None
    bytes_per_step = None
    try:
        ca = step.lower(state, device_batch, jax.random.fold_in(key, 0)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        if ca and "flops" in ca:
            flops_per_step = float(ca["flops"])
        if ca and "bytes accessed" in ca:
            bytes_per_step = float(ca["bytes accessed"])
    except Exception:
        pass

    # warmup + compile; fetching the loss VALUE is the only reliable fence on
    # remote-execution backends. Two warmups: the second compiles the
    # steady-state executable with donated-output layouts.
    for w in range(2):
        state, loss = step(state, device_batch, jax.random.fold_in(key, 1000 + w))
    float(jax.device_get(loss))

    # N timed repeats -> median/min/spread: single-shot measurements on this
    # step have shown a ±8% run-to-run band across rounds (VERDICT r3 weak #4),
    # larger than several effects the ablation tables decide on.
    n_repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    rates = []
    for r in range(n_repeats):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, loss = step(state, device_batch, jax.random.fold_in(key, r * n_steps + i))
        final_loss = float(jax.device_get(loss))
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss), f"non-finite loss {final_loss}"
        rates.append(b * n_steps / dt / n_dev)
    rates.sort()
    stats = {
        "value_median": round(rates[len(rates) // 2], 3),
        "value_min": round(rates[0], 3),
        "value_max": round(rates[-1], 3),
        "value_spread_pct": round(100.0 * (rates[-1] - rates[0]) / rates[-1], 2),
        "value_repeats": n_repeats,
    }
    return rates[len(rates) // 2], flops_per_step, bytes_per_step, stats


def bench_e2e(graft, mesh, n_dev: int, batch_per_chip: int, n_steps: int):
    """End-to-end: real HCSDataModule loader on a synthetic plate feeding the
    production step through the trainer's double-buffered device prefetch."""
    import tempfile

    import jax
    import numpy as np

    from viscy_tpu.data.hcs import HCSDataModule
    from viscy_tpu.data.host_transforms import HostRandWeightedCropd
    from viscy_tpu.parallel.mesh import replicate
    from viscy_tpu.training.state import TrainState
    from viscy_tpu.transforms.normalize import NormalizeSampled
    from viscy_tpu.zarr_io.synthetic import build_hcs_plate

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    plate = build_hcs_plate(
        f"{tmp}/plate.zarr",
        ["Phase3D", "DAPI_Density3D", "TXR_Density3D"],
        zyx_shape=(STACK[0], STACK[1] + 40, STACK[2] + 40),
        rows=("A",),
        cols=("1",),
        fovs=("0", "1"),
        num_timepoints=1,
        dtype=np.float32,
        max_value=1.0,
        norm_meta=True,
    )
    num_samples = 4  # patches per stack index (config :128)
    dm = HCSDataModule(
        data_path=str(plate),
        source_channel=["Phase3D"],
        target_channel=["DAPI_Density3D", "TXR_Density3D"],
        z_window_size=STACK[0],
        split_ratio=0.99,
        batch_size=max(1, batch_per_chip * n_dev // num_samples),
        num_workers=int(os.environ.get("BENCH_WORKERS", "0")),
        yx_patch_size=list(STACK[1:]),
        normalizations=[
            NormalizeSampled(
                keys=["Phase3D"], level="fov_statistics", subtrahend="mean", divisor="std"
            )
        ],
        augmentations=[
            HostRandWeightedCropd(
                keys=["Phase3D", "DAPI_Density3D", "TXR_Density3D"],
                w_key="DAPI_Density3D",
                spatial_size=[STACK[0], *STACK[1:]],
                num_samples=num_samples,
            )
        ],
    )
    dm.prepare_data()
    dm.setup("fit")

    module = graft._flagship(tiny=_TINY)
    loader = dm.train_dataloader()
    first = next(iter(loader))
    b = first["source"].shape[0]
    init_batch = {
        "source": np.asarray(first["source"][:, :, : PATCH[0], : PATCH[1], : PATCH[2]]),
        "target": np.asarray(first["target"][:, :, : PATCH[0], : PATCH[1], : PATCH[2]]),
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)
    step = _build_step(module, _production_aug(), mesh)
    key = jax.random.PRNGKey(1)

    from viscy_tpu.training.trainer import Trainer

    trainer = Trainer(mesh=mesh, use_tensorboard=False, default_root_dir=f"{tmp}/logs")

    state_box = [state]

    def run(n: int) -> tuple[int, float]:
        seen = 0
        it = 0
        loss = None
        t0 = time.perf_counter()
        while seen < n:
            for _, batch in trainer._iter_loader(dm.train_dataloader(), None):
                device_batch = {k: batch[k] for k in ("source", "target")}
                state_box[0], loss = step(
                    state_box[0], device_batch, jax.random.fold_in(key, it)
                )
                it += 1
                seen += device_batch["source"].shape[0]
                if seen >= n:
                    break
        float(jax.device_get(loss))
        return seen, time.perf_counter() - t0
    # warmup/compile
    for i, batch in trainer._iter_loader(dm.train_dataloader(), 2):
        yb = {k: batch[k] for k in ("source", "target")}
        state_box[0], loss = step(state_box[0], yb, jax.random.fold_in(key, 900 + i))
    float(jax.device_get(loss))

    target_patches = b * n_steps
    if jax.default_backend() == "axon":
        # each step ships the full host batch through the remote tunnel
        # (~1.4 GB); two batches suffice to report the (annotated,
        # non-representative) number without stalling the driver
        target_patches = min(target_patches, 2 * b)
    seen, dt = run(target_patches)
    return seen / dt / n_dev


def bench_dynaclr(mesh, n_dev: int, n_steps: int):
    """DynaCLR-3D contrastive training throughput — the second production
    workload (reference ``dynaclr/engine.py:262-287``).

    Recipe: the flagship 3D config
    (``applications/dynaclr/configs/training/DynaCLR-3D/DynaCLR-3D-BagOfChannels-v2.yml``):
    ContrastiveEncoder convnext_tiny (in_stack_depth 32, stem 4^3,
    projection_dim 32, drop_path 0.1), NT-Xent temperature 0.2, bf16
    activations (trainer ``precision: bf16-mixed``), AdamW lr 2e-5.
    Device-side augmentation of anchor AND positive independently from
    (45, 256, 256) host extraction windows (``z_extraction_window: 45``,
    ``yx_patch_size: [256, 256]``): normalize (timepoint stats) ->
    BatchedRandAffined(prob .8, rot [pi,0,0], scale 0.9-1.1^3,
    shear .05) -> BatchedRandSpatialCropd (40, 228, 228) ->
    BatchedRandFlipd -> contrast/scale-intensity/smooth -> auto
    CenterCrop (32, 160, 160) (the datamodule appends it,
    ``data/triplet.py _transform_one``).

    Metric: cells (anchor+positive pairs) per second per chip; each step
    augments and forwards both views and runs NT-Xent + AdamW.
    Returns (median rate, stats keys dict).
    """
    step, state, device_batch, key, b = _dynaclr_setup(mesh, n_dev)
    return _dynaclr_rates(step, state, device_batch, key, b, n_dev, n_steps)


def _dynaclr_setup(mesh, n_dev: int):
    """Build the DynaCLR contrastive train step of :func:`bench_dynaclr`;
    returns ``(step, state, device_batch, key, b)``. Shared with
    ``tools/trace_dynaclr.py``."""
    import jax
    import numpy as np

    from viscy_tpu.apps.dynaclr.engine import ContrastiveModule
    from viscy_tpu.models.contrastive.loss import NTXentLoss
    from viscy_tpu.parallel.mesh import replicate, shard_batch
    from viscy_tpu.training.state import TrainState
    from viscy_tpu.transforms import (
        BatchedCenterSpatialCropd,
        BatchedRandAdjustContrastd,
        BatchedRandAffined,
        BatchedRandFlipd,
        BatchedRandGaussianSmoothd,
        BatchedRandScaleIntensityd,
        BatchedRandSpatialCropd,
        Compose,
    )

    if _TINY:
        stack, crop_roi, final = (8, 48, 48), (6, 40, 40), (4, 32, 32)
        depth, b = 4, 4 * n_dev
    else:
        stack, crop_roi, final = (45, 256, 256), (40, 228, 228), (32, 160, 160)
        depth = 32
        b = int(os.environ.get("BENCH_DYNACLR_BATCH", "256")) * n_dev

    # BENCH_DYNACLR_NOAUG=1 measures the no-aug ceiling (normalize +
    # center-crop only): the step rate with the aug pipeline's cost
    # removed, bounding what aug optimization can still buy
    members = [] if os.environ.get("BENCH_DYNACLR_NOAUG") else [
            BatchedRandAffined(
                keys=["x"],
                prob=0.8,
                rotate_range=[3.14, 0.0, 0.0],
                scale_range=[[0.9, 1.1], [0.9, 1.1], [0.9, 1.1]],
                shear_range=[0.05, 0.05, 0.0, 0.05, 0.0, 0.05],
            ),
            BatchedRandSpatialCropd(keys=["x"], roi_size=list(crop_roi)),
            BatchedRandFlipd(keys=["x"], spatial_axes=[1, 2], prob=0.5),
            BatchedRandAdjustContrastd(keys=["x"], prob=0.5, gamma=(0.6, 1.6)),
            BatchedRandScaleIntensityd(keys=["x"], prob=0.5, factors=0.5),
            BatchedRandGaussianSmoothd(
                keys=["x"],
                prob=0.5,
                sigma_x=(0.25, 0.5),
                sigma_y=(0.25, 0.5),
                sigma_z=(0.0, 0.2),
            ),
    ]
    aug = Compose(
        [
            *members,
            # final crop as a Compose member -> the [smooth, center-crop]
            # peephole blurs only the kept region + halo (bit-identical)
            BatchedCenterSpatialCropd(keys=["x"], roi_size=list(final)),
        ]
    )

    module = ContrastiveModule(
        encoder=dict(
            backbone="convnext_tiny",
            in_channels=1,
            in_stack_depth=depth,
            stem_kernel_size=(4, 4, 4),
            stem_stride=(4, 4, 4),
            projection_dim=32,
            drop_path_rate=0.1,
            dtype="bfloat16",
        ),
        loss_function=NTXentLoss(temperature=0.2),
        lr=2e-5,
    )

    mean, std = 0.5, 0.29  # timepoint-stats normalization as traced scalars

    # the view pipeline's intermediates (normalize temp + warp gathers) are
    # ~175 MB/sample f32 at the (45, 256, 256) extraction window; at the
    # recipe's batch 256 that exceeds a 16 GB v5e, so the whole view runs
    # in lax.map chunks — per-chunk randomness via split keys
    aug_chunk = int(os.environ.get("BENCH_DYNACLR_AUG_CHUNK", "32"))

    def view_one(x, key):
        x = (x - mean) / std
        return aug({"x": x}, key)["x"]

    def view(x, key):
        bb = x.shape[0]
        chunk = aug_chunk
        while bb % chunk:  # largest divisor of the batch <= aug_chunk
            chunk -= 1
        if chunk >= bb:
            return view_one(x, key)
        nb = bb // chunk
        xr = x.reshape(nb, chunk, *x.shape[1:])
        keys = jax.random.split(key, nb)
        out = jax.lax.map(lambda args: view_one(*args), (xr, keys))
        return out.reshape(bb, *out.shape[2:])

    def train_step(state, batch, rng):
        rng, ka, kp = jax.random.split(rng, 3)
        device_batch = {
            "anchor": view(batch["anchor"], ka),
            "positive": view(batch["positive"], kp),
        }

        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            loss, (metrics, updates) = module.training_loss(variables, device_batch, rng)
            return loss, (metrics, updates)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(train_step, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "anchor": rng.random((b, 1, *stack), np.float32),
        "positive": rng.random((b, 1, *stack), np.float32),
    }
    init_batch = {
        k: np.zeros((2, 1, *final), np.float32) for k in ("anchor", "positive", "negative")
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)
    return step, state, device_batch, key, b


def _dynaclr_rates(step, state, device_batch, key, b, n_dev: int, n_steps: int):
    """Timed repeats + roofline context for :func:`bench_dynaclr`."""
    import jax
    import numpy as np

    # XLA cost analysis for the roofline context (cache-deduped vs warmup)
    flops_per_step = bytes_per_step = None
    try:
        ca = step.lower(state, device_batch, jax.random.fold_in(key, 0)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        if ca and "flops" in ca:
            flops_per_step = float(ca["flops"])
        if ca and "bytes accessed" in ca:
            bytes_per_step = float(ca["bytes accessed"])
    except Exception:
        pass

    for w in range(2):
        state, loss = step(state, device_batch, jax.random.fold_in(key, 1000 + w))
    float(jax.device_get(loss))

    n_repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    rates = []
    for r in range(n_repeats):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, loss = step(state, device_batch, jax.random.fold_in(key, r * n_steps + i))
        final_loss = float(jax.device_get(loss))
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss), f"non-finite dynaclr loss {final_loss}"
        rates.append(b * n_steps / dt / n_dev)
    rates.sort()
    med = rates[len(rates) // 2]
    keys = {
        "dynaclr_cells_per_sec_chip": round(med, 2),
        "dynaclr_cells_per_sec_min": round(rates[0], 2),
        "dynaclr_cells_per_sec_max": round(rates[-1], 2),
        "dynaclr_batch_per_chip": b // n_dev,
    }
    if flops_per_step and bytes_per_step:
        # roofline context: is the contrastive step compute- or HBM-bound
        # on this chip, and how close does it run to that bound
        step_s = (b / n_dev) / med
        keys["dynaclr_flops_per_step"] = flops_per_step
        keys["dynaclr_hbm_bytes_per_step_gb"] = round(bytes_per_step / n_dev / 1e9, 2)
        keys["dynaclr_mfu"] = round(flops_per_step / n_dev / step_s / 197e12, 4)
        keys["dynaclr_hbm_util"] = round(
            bytes_per_step / n_dev / step_s / 819e9, 4
        )
    return med, {
        **keys,
        "dynaclr_note": (
            "DynaCLR-3D-BagOfChannels-v2 recipe: convnext_tiny stack-32 "
            "stem-4^3 bf16, NT-Xent t=0.2, device aug of both views from "
            "(45,256,256) incl. Pallas affine warp; cells/s = anchor-positive "
            "pairs through aug+2 forwards+NT-Xent+AdamW"
        ),
    }


def bench_host_pipeline(n_items: int = 8):
    """Standalone host-feed benchmark (VERDICT r2 item 2): the steady-state
    production hot loop — RAM-preloaded FOV -> weighted-crop origin sampling
    -> native crop/collate -> (20,600,600)x3ch patches — measured at 1 and
    all threads, with bytes/patch and the core count needed to sustain the
    device rate extrapolated from the measured per-core rate.

    Returns a dict of host_* keys merged into the bench JSON.
    """
    import numpy as np

    from viscy_tpu.native import batched_crop_normalize, native_available

    n_ch = 3  # 1 source + 2 target channels (production recipe)
    fov_hw = STACK[1] + 40
    depth = STACK[0]
    rng = np.random.default_rng(0)
    full = rng.random((n_ch, depth, fov_hw, fov_hw), np.float32)
    num_samples = 4
    origins = np.stack(
        [
            np.zeros(num_samples, np.int64),
            rng.integers(0, fov_hw - STACK[1], num_samples),
            rng.integers(0, fov_hw - STACK[2], num_samples),
        ],
        axis=1,
    )

    full_u16 = (full * 65535).astype(np.uint16)

    def rate(n_threads: int, vol=full) -> float:
        t0 = time.perf_counter()
        for _ in range(n_items):
            batched_crop_normalize(vol, origins, (depth, *STACK[1:]), n_threads=n_threads)
        dt = time.perf_counter() - t0
        return n_items * num_samples / dt

    out: dict = {}
    bytes_per_patch = n_ch * depth * STACK[1] * STACK[2] * 4
    out["host_bytes_per_patch_f32"] = bytes_per_patch
    out["host_bytes_per_patch_uint16"] = bytes_per_patch // 2
    if not native_available():
        out["host_note"] = "native crop kernel unavailable; numpy fallback"
    r1 = rate(1)
    r1_u16 = rate(1, full_u16)
    import os as _os

    ncores = _os.cpu_count() or 1
    out["host_patches_per_sec_1thread"] = round(r1, 2)
    out["host_patches_per_sec_uint16_1thread"] = round(r1_u16, 2)
    out["host_cores_available"] = ncores
    if ncores > 1:
        rn = rate(0)
        out["host_patches_per_sec_all_threads"] = round(rn, 2)
        out["host_thread_scaling"] = round(rn / r1 / ncores, 3)
        per_core = rn / ncores
    else:
        per_core = r1
        out["host_thread_scaling"] = None
    # native_transfer ships uint16: the per-core requirement scales with
    # the measured uint16 rate
    out["host_u16_speedup"] = round(r1_u16 / max(r1, 1e-9), 2)
    return out, per_core


def bench_inference(graft, n_steps: int = 8):
    """3D inference throughput (BASELINE north star: FOVs/sec).

    Sliding-window inference batches windows for MXU utilization (batch-1
    full-FOV forwards measure ~5x worse per pixel on v5e): a bf16 forward
    over a batch of ``BENCH_INFER_BATCH`` (default 64) (15, 384, 384)
    windows on a device-resident input. FOV accounting for the production
    (20, 2048, 2048) stack: 6 z-window positions (window 15, step 1) x
    36 overlapping 384^2 YX tiles = 216 windows.

    Timing: N async per-call dispatches fenced by fetching one element of
    the LAST output — device execution is ordered, so that bounds the
    whole sequence. The round-2 on-device ``fori_loop`` chain inflated
    the forward-only number ~70% (the loop-carried accumulator and input
    perturbation constrain layout/scheduling); the batch sweep and both
    timing methods are recorded in docs/STATUS.md round 3. Default batch
    72 = 2 z-windows x 36 YX tiles — exactly what the shipped predict
    path runs with ``tile_batch=72`` and a 2-sample predict batch, and
    within 2.5% of the unconstrained optimum (sweep on v5e, ms/window:
    b16 4.03, b36 3.58, b48 3.30, b64 3.06, b72 3.14, b96 OOM; b64 needs
    cross-z-stream batching with ragged tails). Numerics across batch
    sizes agree to ~9e-3 relative (bf16 reduction-order noise, within
    the parity tolerance).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gc

    import jax.errors

    module = graft._flagship(tiny=_TINY)
    # shipped predict defaults (round-4 tile sweep): 320^2 tiles, batch 104
    infer_batch = int(os.environ.get("BENCH_INFER_BATCH", "104"))
    infer_tile = int(os.environ.get("BENCH_INFER_TILE", "320"))

    def run(batch: int) -> float:
        shape = (2, 1, 5, 64, 64) if _TINY else (batch, 1, 15, infer_tile, infer_tile)
        x_host = np.random.default_rng(0).random(shape, np.float32)
        variables = module.init_variables(
            jax.random.PRNGKey(0), {"source": x_host[:2]}
        )
        x = jnp.asarray(x_host)

        fwd = jax.jit(lambda v, x: module.forward(v, x))
        out = None
        for _ in range(2):
            out = fwd(variables, x)
        float(jax.device_get(out[0, 0, 0, 0, 0]))
        t0 = time.perf_counter()
        # keep only the newest output ref: dispatch stays async (fenced by
        # one element of the LAST output; device execution is ordered) and
        # peak HBM stays ~2 in-flight outputs instead of n_steps
        for _ in range(n_steps):
            out = fwd(variables, x)
        float(jax.device_get(out[0, 0, 0, 0, 0]))
        return (time.perf_counter() - t0) / n_steps  # per window-batch call

    # the full batch fits standalone but not always after the train
    # bench's donated state churn; fall back rather than report nothing
    last_err: Exception | None = None
    for batch in dict.fromkeys([infer_batch, 36, 16]):
        try:
            dt = run(batch)
            break
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            last_err = e
            gc.collect()
    else:
        raise last_err
    if _TINY:
        batch = 2
    # z positions x overlapping YX tiles of a 2048^2 FOV (32-px overlap)
    from viscy_tpu.apps.cytoland.prediction import tile_positions

    n_yx = len(tile_positions(2048, infer_tile, 32)) ** 2
    windows_per_fov = 6 * n_yx
    calls_per_fov = windows_per_fov / batch
    return 1.0 / (dt * calls_per_fov), dt, batch


def bench_predict_e2e(device_ms_per_window: float | None, tmp: str | None = None):
    """End-to-end ``viscy predict`` host path (VERDICT r2 item 3): the real
    HCSPredictionWriter — store creation, async queue, feathered Z-blend
    read-modify-write, zarr chunk writes — driven at the measured device
    cadence on a production-size FOV ((20, 2048, 2048), 2 output channels,
    6 overlapping z-windows).

    Two passes: (a) writes-only (producer never sleeps) -> the host write
    ceiling; (b) producer sleeps the measured per-window device time before
    each submit, emulating the forward (its rate is measured separately
    on-chip by ``bench_inference``; under the axon tunnel a live-fed loop
    measures the HTTP tunnel, not a TPU host) -> ``e2e`` FOVs/s with real
    write overlap.
    """
    import shutil
    import tempfile

    import numpy as np

    from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter

    if _TINY:
        depth, cz, hw, n_ch = 8, 5, 64, 2
    else:
        depth, cz, hw, n_ch = 20, 15, 2048, 2
    n_z = depth - cz + 1

    class _DM:
        source_channel = ["Phase3D"]
        target_channel = ["DAPI_Density3D", "TXR_Density3D"]
        z_window_size = cz

    class _Trainer:
        _active_datamodule = _DM()

    own_tmp = tmp is None
    tmp = tmp or tempfile.mkdtemp(prefix="bench_pred_")
    pred = np.random.default_rng(0).random((1, n_ch, cz, hw, hw), np.float32)

    # device-blend legs feed jax arrays committed to the CPU backend: the
    # REAL writer code path (DeviceFovAssembler blend -> convert -> one
    # write per FOV) with the blend executed by XLA:CPU. On a real TPU
    # host the blend runs on-chip next to the forward (elementwise,
    # sub-ms/window) and the per-FOV fetch rides PCIe; the axon tunnel in
    # this environment cannot carry multi-100MB fetches, so committing to
    # the host CPU device keeps the measurement about the host write path
    # it is meant to isolate.
    import jax
    import jax.numpy as jnp

    try:
        _cpu = jax.local_devices(backend="cpu")[0]
        pred_dev = jax.device_put(jnp.asarray(pred), _cpu)
    except Exception:
        pred_dev = jnp.asarray(pred)

    def run(sleep_s: float, *, device_blend: bool = False, output_dtype: str = "float32") -> float:
        out = f"{tmp}/pred_{int(device_blend)}_{output_dtype}_{sleep_s:.3f}.zarr"
        writer = HCSPredictionWriter(
            out, overwrite=True, device_blend=device_blend, output_dtype=output_dtype
        )
        writer.on_predict_start(_Trainer(), None)
        payload = pred_dev if device_blend else pred
        t0 = time.perf_counter()
        for z in range(n_z):
            if sleep_s:
                time.sleep(sleep_s)
            batch = {"index": [("A/1/0", 0, z)]}
            writer.write_on_batch_end(_Trainer(), None, payload, batch, z)
        writer.on_predict_end(_Trainer(), None)
        return time.perf_counter() - t0

    out: dict = {}
    run(0.0)  # warmup: store-creation + allocator effects
    write_time = run(0.0)
    out["inference_host_write_fovs_per_sec"] = round(1.0 / write_time, 4)
    out["inference_host_write_bytes_per_fov"] = int(n_ch * depth * hw * hw * 4)
    out["inference_host_write_note"] = (
        "legacy host-blend path (device_blend=False): whole-slab feathered "
        "blend math per reference semantics + blosc compression via "
        "tensorstore, single-thread"
    )
    run(0.0, device_blend=True)  # warmup: blend-program compiles
    dev_write_time = run(0.0, device_blend=True)
    out["inference_write_fovs_per_sec_device_blend"] = round(1.0 / dev_write_time, 4)
    run(0.0, device_blend=True, output_dtype="uint16")
    u16_write_time = run(0.0, device_blend=True, output_dtype="uint16")
    out["inference_write_fovs_per_sec_device_blend_u16"] = round(1.0 / u16_write_time, 4)
    out["inference_device_blend_note"] = (
        "default writer path: feathered blend on device (XLA:CPU in this "
        "environment — on a TPU host it runs on-chip next to the forward), "
        "host does codec+IO of ONE slab per FOV (lz4-bitshuffle; u16 halves "
        "the bytes, scaling recorded in .zattrs)"
    )
    if device_ms_per_window is not None:
        # device work per z-window: yx_tiles batched tile forwards at the
        # separately measured per-window rate (``bench_inference``)
        from viscy_tpu.apps.cytoland.prediction import tile_positions

        infer_tile = int(os.environ.get("BENCH_INFER_TILE", "320"))
        tiles = len(tile_positions(hw, infer_tile, 32)) ** 2 if hw > infer_tile else 1
        sleep_s = device_ms_per_window / 1e3 * tiles
        e2e_time = run(sleep_s, device_blend=True)
        compute_time = sleep_s * n_z
        out["inference_e2e_fovs_per_sec"] = round(1.0 / e2e_time, 4)
        out["inference_e2e_overlap_efficiency"] = round(
            min(1.0, max(compute_time, dev_write_time) / e2e_time), 3
        )
        e2e_u16 = run(sleep_s, device_blend=True, output_dtype="uint16")
        out["inference_e2e_fovs_per_sec_u16"] = round(1.0 / e2e_u16, 4)
        e2e_host = run(sleep_s)
        out["inference_e2e_fovs_per_sec_host_blend"] = round(1.0 / e2e_host, 4)
        out["inference_e2e_note"] = (
            "real writer (default device-blend path) + zarr IO; forward "
            "emulated at the separately measured on-chip rate (tunnel-fed "
            "loops measure the axon HTTP tunnel, not a TPU host); "
            "_host_blend key = the legacy reference-style host path"
        )

    # -- codec+IO-only leg: the host cost a REAL TPU host pays per FOV.
    # On TPU the blend rides the chip next to the forward, so the host's
    # steady-state work is exactly `_write_device_slab` (blosc encode +
    # store IO) of one final slab. The device-blend keys above conflate
    # that with this environment's XLA:CPU blend (tens of seconds/FOV of
    # compute that does not exist on a TPU host) and with this VM's
    # throttled shared disk (measured 17-130 MB/s, 5x run-to-run spread).
    # Blend ONCE outside the timer via the production assembler, then time
    # the write alone against tmpfs (isolates codec CPU), median of 3.
    from pathlib import Path as _Path

    from viscy_tpu.training.callbacks.prediction_writer import DeviceFovAssembler

    asm = DeviceFovAssembler("float32")
    blend_key = ("A/1/0", 0, tuple(range(n_ch)))
    for z in range(n_z):
        asm.add(blend_key, pred_dev[0], z)
    entry = asm.pop(blend_key)
    slab_f32, _ = asm.convert(entry)
    slab_u16, ranges_u16 = DeviceFovAssembler("uint16").convert(entry)

    shm = _Path("/dev/shm")
    codec_root = shm if shm.is_dir() and os.access(shm, os.W_OK) else _Path(tmp)

    def time_codec(slab: np.ndarray, ranges, dtype: str) -> float:
        times = []
        for rep in range(3):
            store = codec_root / f"bench_codec_{dtype}_{rep}.zarr"
            writer = HCSPredictionWriter(
                str(store), overwrite=True, output_dtype=dtype
            )
            writer.on_predict_start(_Trainer(), None)
            writer._ensure_store(_DM())
            t0 = time.perf_counter()
            writer._write_device_slab(blend_key, slab, ranges)
            times.append(time.perf_counter() - t0)
            writer.on_predict_end(_Trainer(), None)
            shutil.rmtree(store, ignore_errors=True)
        times.sort()
        return times[len(times) // 2]

    out["inference_codec_io_s_per_fov"] = round(time_codec(slab_f32, None, "float32"), 3)
    out["inference_codec_io_s_per_fov_u16"] = round(
        time_codec(slab_u16, ranges_u16, "uint16"), 3
    )
    out["inference_codec_io_note"] = (
        "single-core blosc-lz4 encode + store IO of ONE pre-blended slab "
        "per FOV against tmpfs — the steady-state host cost on a real TPU "
        "host (blend is on-chip; tensorstore parallelizes chunk encode "
        "across the host pool)"
    )

    # -- pipelined e2e demo (VERDICT r4 item 4): N FOVs stream through the
    # REAL writer flush pool while a producer emulates the device at the
    # separately measured forward rate. Slabs are pre-blended (on a TPU
    # host the blend rides the chip), so the host work in the loop is
    # exactly the steady-state codec+IO, overlapped with the "forward".
    # Target: measured e2e >= ~0.8 x min(device rate, cores x codec rate).
    if device_ms_per_window is not None:
        from viscy_tpu.apps.cytoland.prediction import tile_positions

        infer_tile = int(os.environ.get("BENCH_INFER_TILE", "320"))
        tiles = len(tile_positions(hw, infer_tile, 32)) ** 2 if hw > infer_tile else 1
        device_s_per_fov = device_ms_per_window / 1e3 * tiles * n_z
        n_fovs = int(os.environ.get("BENCH_E2E_FOVS", "6"))
        cores = os.cpu_count() or 1

        def run_pipelined(slab: np.ndarray, ranges, dtype: str) -> float:
            store = codec_root / f"bench_pipe_{dtype}.zarr"
            writer = HCSPredictionWriter(
                str(store), overwrite=True, output_dtype=dtype, flush_workers=max(2, cores)
            )
            writer.on_predict_start(_Trainer(), None)
            writer._ensure_store(_DM())
            t0 = time.perf_counter()
            for i in range(n_fovs):
                time.sleep(device_s_per_fov)  # the FOV's forwards (on-chip)
                key = (f"A/{i}/0", 0, tuple(range(n_ch)))
                writer._flush_pending.append(
                    writer._flush_pool.submit(writer._write_device_slab, key, slab, ranges)
                )
                while len(writer._flush_pending) > 2 * writer.flush_workers:
                    writer._flush_pending.pop(0).result()
            writer.on_predict_end(_Trainer(), None)
            elapsed = time.perf_counter() - t0
            shutil.rmtree(store, ignore_errors=True)
            return elapsed

        for slab, ranges, dtype, suffix in (
            (slab_u16, ranges_u16, "uint16", "_u16"),
            (slab_f32, None, "float32", ""),
        ):
            codec_s = out[f"inference_codec_io_s_per_fov{suffix}"]
            elapsed = run_pipelined(slab, ranges, dtype)
            rate = n_fovs / elapsed
            model_rate = min(
                1e3 / (device_ms_per_window * tiles * n_z), cores / codec_s
            )
            out[f"inference_e2e_pipelined_fovs_per_sec{suffix}"] = round(rate, 4)
            out[f"inference_e2e_pipelined_model_fovs_per_sec{suffix}"] = round(model_rate, 4)
            out[f"inference_e2e_pipelined_attainment{suffix}"] = round(rate / model_rate, 3)
        out["inference_e2e_pipelined_note"] = (
            f"{n_fovs} FOVs through the real writer flush pool on tmpfs, "
            "producer sleeping the measured device time per FOV; model = "
            "min(device rate, cores x codec rate) on this host "
            f"({cores} core)"
        )

    if own_tmp:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    import importlib.util

    import jax

    from viscy_tpu.parallel.mesh import make_mesh

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    n_dev = jax.device_count()
    mesh = make_mesh()
    batch_per_chip = int(os.environ.get("BENCH_BATCH", "16"))
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))

    prod, flops_per_step, bytes_per_step, prod_stats = bench_production_step(
        graft, mesh, n_dev, batch_per_chip, n_steps
    )

    out = {
        "metric": (
            "VSCyto3D production train patches/sec/chip "
            f"(aug: affine+crop {'x'.join(map(str, STACK))}->{'x'.join(map(str, PATCH))}"
            " + intensity, fcmae-unext2 fwd+bwd)"
        ),
        "value": round(prod, 3),  # median of value_repeats timed repeats
        "unit": "patches/s/chip",
        "vs_baseline": round(prod / H100_EST_PATCHES_PER_SEC, 4),
        **prod_stats,
    }
    # hardware-grounded MFU next to the anchor-dependent vs_baseline ratio
    # (BASELINE.md "H100 anchor"): flops from XLA cost analysis of the
    # compiled step; peak = dense bf16 for the detected chip
    if flops_per_step:
        batch_total = batch_per_chip * n_dev
        out["flops_per_patch"] = round(flops_per_step / batch_total, 0)
        peak = _peak_tflops()
        if peak:
            steps_per_sec = prod * n_dev / batch_total
            out["mfu"] = round(flops_per_step * steps_per_sec / (n_dev * peak * 1e12), 4)
            out["mfu_peak_tflops_bf16"] = peak
            # at equal MFU, an H100 (990 dense bf16 TFLOP/s) would run
            # peak_h100/peak_chip x our patches/s — the roofline context for
            # the vs_baseline anchor
            out["h100_equal_mfu_patches_per_sec"] = round(prod * 990.0 / peak, 1)
        # memory roofline (tools/roofline.py): this step is HBM-bound — its
        # arithmetic intensity sits far below the chip's compute/bandwidth
        # ridge — so roofline attainment, not MFU, is the efficiency measure
        hbm = _peak_hbm_gbps()
        if bytes_per_step and peak and hbm:
            step_dt = 1.0 / steps_per_sec
            t_flops = flops_per_step / (n_dev * peak * 1e12)
            t_bytes = bytes_per_step / (n_dev * hbm * 1e9)
            out["hbm_bytes_per_step_gb"] = round(bytes_per_step / 1e9, 2)
            out["hbm_util"] = round(t_bytes / step_dt, 4)
            out["roofline_bound_ms"] = round(max(t_flops, t_bytes) * 1e3, 1)
            out["roofline_attainment"] = round(max(t_flops, t_bytes) / step_dt, 4)
    if os.environ.get("BENCH_SKIP_HOST") != "1":
        try:
            host_keys, per_core = bench_host_pipeline()
            out.update(host_keys)
            # cores a real TPU host needs to feed one chip at the measured
            # device rate (steady-state crop/collate; zarr decode is a
            # one-time preload in the caching path)
            out["host_cores_for_device_rate"] = round(prod / max(per_core, 1e-9), 1)
            if out.get("host_thread_scaling") is None:
                out["host_cores_for_device_rate_note"] = (
                    "extrapolated linearly from a single-thread measurement "
                    "on a 1-core VM; the native thread pool's scaling slope "
                    "is unmeasured in this environment"
                )
        except Exception as e:
            out["host_error"] = f"{type(e).__name__}: {e}"

    if os.environ.get("BENCH_SKIP_DYNACLR") != "1":
        try:
            import gc

            gc.collect()
            _, dynaclr_keys = bench_dynaclr(mesh, n_dev, n_steps)
            out.update(dynaclr_keys)
        except Exception as e:
            out["dynaclr_error"] = f"{type(e).__name__}: {e}"

    if os.environ.get("BENCH_SKIP_INFER") != "1":
        try:
            import gc

            gc.collect()  # release the train bench's HBM before the b72 forward
            fovs_per_sec, win_dt, infer_batch = bench_inference(graft)
            out["inference_fovs_per_sec"] = round(fovs_per_sec, 4)
            out["inference_window_batch"] = infer_batch
            out["inference_window_batch_ms"] = round(win_dt * 1e3, 2)
            out["inference_ms_per_window"] = round(win_dt * 1e3 / infer_batch, 3)
        except Exception as e:
            out["inference_error"] = f"{type(e).__name__}: {e}"
        try:
            import gc

            gc.collect()  # free the big train/infer batches before timing host IO
            out.update(
                bench_predict_e2e(out.get("inference_ms_per_window"))
            )
            dev_rate = out.get("inference_fovs_per_sec")
            codec_s = out.get("inference_codec_io_s_per_fov")
            codec_s_u16 = out.get("inference_codec_io_s_per_fov_u16")
            if dev_rate and codec_s:
                # host cores needed to keep up with the measured device
                # forward rate (VERDICT r3 missing #2): codec CPU-seconds
                # per FOV x device FOVs/s. Based on the codec+IO-only leg —
                # the blend rides the chip on a TPU host, and tensorstore
                # spreads the per-chunk encodes across the host pool.
                out["inference_host_write_cores_for_device_rate"] = round(
                    dev_rate * codec_s, 2
                )
                if codec_s_u16:
                    out["inference_host_write_cores_for_device_rate_u16"] = round(
                        dev_rate * codec_s_u16, 2
                    )
        except Exception as e:
            out["inference_e2e_error"] = f"{type(e).__name__}: {e}"

    if os.environ.get("BENCH_SKIP_E2E") != "1":
        try:
            e2e = bench_e2e(graft, mesh, n_dev, batch_per_chip, n_steps)
            out["e2e_patches_per_sec_per_chip"] = round(e2e, 3)
            out["e2e_fraction_of_device_rate"] = round(e2e / prod, 3)
            if jax.default_backend() == "axon":
                # each step ships ~1.4 GB of host batches through the remote
                # axon HTTP tunnel; on a real TPU host this is local PCIe/DMA
                out["e2e_note"] = (
                    "remote-tunnel H2D dominates under axon; "
                    "not representative of a local TPU host"
                )
        except Exception as e:  # report but never fail the primary metric
            out["e2e_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
