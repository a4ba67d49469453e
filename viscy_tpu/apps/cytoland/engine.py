"""Cytoland virtual-staining engines
(reference ``applications/cytoland/src/cytoland/engine.py:129,808``).

``VSUNet`` wraps any registered U-Net architecture with the supervised
train/val/test/predict steps (MixedLoss, divisible-pad forward, rotation
TTA); ``FcmaeUNet`` adds masked pretraining (``fit_mask_ratio``) and
encoder-only checkpoint transfer for fine-tuning. All steps are pure
functions jit-compiled by the Trainer.
"""

from __future__ import annotations

import logging
from typing import Literal, Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
from viscy_tpu.models.unet.unet2d import Unet2d
from viscy_tpu.models.unet.unet25d import Unet25d
from viscy_tpu.models.unet.unet3d import Unet3d
from viscy_tpu.models.unet.unext2 import UNeXt2
from viscy_tpu.ops.ssim import ssim_25d
from viscy_tpu.training.losses.mixed_loss import MixedLoss
from viscy_tpu.training.module import TrainModule

Array = jax.Array
_logger = logging.getLogger("viscy_tpu")

_UNET_ARCHITECTURE = {
    "2D": Unet2d,
    "UNeXt2": UNeXt2,
    "2.5D": Unet25d,
    "FNet3D": Unet3d,
    "fcmae": FullyConvolutionalMAE,
    "UNeXt2_2D": FullyConvolutionalMAE,
}


class MaskedMSELoss:
    """Masked MSE for FCMAE pretraining (reference ``engine.py:106``):
    per-pixel MSE averaged over Z, masked at masked patches, normalized by
    mask sum."""

    def __call__(self, preds: Array, original: Array, mask: Array) -> Array:
        loss = jnp.square(preds.astype(jnp.float32) - original.astype(jnp.float32))
        # mean over Z -> (B, C, H, W); mask (B, 1, H, W)
        loss = (loss.mean(axis=2) * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return loss


def _divisible_pad(x: Array, factor: int, pad_z: bool = False) -> Array:
    """Pad YX (and optionally Z) up to multiples of ``factor``.

    Pads SYMMETRICALLY (floor before, ceil after) like the reference's
    MONAI ``DivisiblePad(method="symmetric")`` (cytoland engine.py:48-53),
    so ``_center_crop_to_shape`` is its exact inverse — an end-only pad
    with a center crop would return predictions shifted by pad/2 for
    non-divisible inputs."""
    z, y, xx = x.shape[-3:]
    pz = (-z) % factor if pad_z else 0
    py = (-y) % factor
    px = (-xx) % factor
    if not (pz or py or px):
        return x
    pad = [(0, 0)] * (x.ndim - 3) + [
        (p // 2, p - p // 2) for p in (pz, py, px)
    ]
    return jnp.pad(x, pad)


def _center_crop_to_shape(x: Array, spatial: tuple[int, ...]) -> Array:
    slices = [slice(None)] * (x.ndim - len(spatial))
    for dim, size in zip(range(x.ndim - len(spatial), x.ndim), spatial):
        start = (x.shape[dim] - size) // 2
        slices.append(slice(start, start + size))
    return x[tuple(slices)]


class VSUNet(TrainModule):
    """Virtual-staining U-Net engine."""

    def __init__(
        self,
        architecture: Literal["2D", "UNeXt2", "2.5D", "FNet3D", "fcmae", "UNeXt2_2D"],
        model_config: dict | None = None,
        loss_function=None,
        lr: float = 1e-3,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        freeze_encoder: bool = False,
        ckpt_path: str | None = None,
        log_batches_per_epoch: int = 8,
        log_samples_per_batch: int = 1,
        example_input_yx_shape: Sequence[int] = (256, 256),
        test_cellpose_model_path: str | None = None,
        test_cellpose_diameter: float | None = None,
        test_evaluate_cellpose: bool = False,
        test_time_augmentations: bool = False,
        tta_type: Literal["mean", "median", "product"] = "mean",
        warmup_steps: int = 0,
        warmup_multiplier: float = 1e-3,
        predict_method: Literal["full_image", "sliding_window"] = "full_image",
        predict_overlap: tuple[int, int, int] = (4, 256, 256),
        tile_yx: Sequence[int] | None = None,
        tile_batch: int = 104,
        fov_shard: bool = False,
        channels_last_loss: bool = False,
        bf16_loss: bool = False,
        encoder_only: bool = False,
    ) -> None:
        net_class = _UNET_ARCHITECTURE.get(architecture)
        if not net_class:
            raise ValueError(
                f"Architecture {architecture} not in {list(_UNET_ARCHITECTURE)}"
            )
        model_config = dict(model_config or {})
        self.architecture = architecture
        if architecture in ("fcmae", "UNeXt2_2D"):
            model_config.setdefault("pretraining", architecture == "fcmae")
            if architecture == "UNeXt2_2D":
                model_config["pretraining"] = False
        # normalize config lists to tuples for linen hashability
        for k, v in model_config.items():
            if isinstance(v, list):
                model_config[k] = tuple(v)
        if isinstance(model_config.get("dtype"), str):
            model_config["dtype"] = jnp.dtype(model_config["dtype"])
        self.model_config = model_config
        self.model = net_class(**model_config)
        self.loss_function = loss_function if loss_function is not None else MixedLoss()
        self.lr = lr
        self.schedule = schedule
        self.freeze_encoder = freeze_encoder
        self.ckpt_path = ckpt_path
        self.log_batches_per_epoch = log_batches_per_epoch
        self.log_samples_per_batch = log_samples_per_batch
        self.example_input_yx_shape = tuple(example_input_yx_shape)
        self.test_time_augmentations = test_time_augmentations
        self.tta_type = tta_type
        self.warmup_steps = warmup_steps
        self.warmup_multiplier = warmup_multiplier
        # prediction tiling (reference dynacell engine.py:170): tiled
        # Z-blended inference is in prediction.predict_sliding_windows
        self.predict_method = predict_method
        self.predict_overlap = tuple(predict_overlap)
        # MXU-efficient tiled YX inference: split large FOVs into batched
        # overlapping tiles with feathered blending (prediction.py
        # tiled_forward_yx); batch-1 full-frame forwards measure ~5x worse
        # per pixel on TPU. Tile 320 / batch 104 is the round-4 v5e sweep
        # optimum with overlap waste accounted: 2.01 ms/window x 294
        # windows/FOV = 1.695 FOVs/s vs 1.54-1.57 at the round-3 384/72
        # (docs/STATUS.md round-4 tile sweep, measured twice)
        self.tile_yx = tuple(tile_yx) if tile_yx else None
        self.tile_batch = tile_batch
        # latency-oriented multi-chip serving: shard ONE full FOV along Y
        # over the active mesh's data axis (GSPMD conv halo exchanges)
        # instead of tiling — exact full-frame output, 1/n per-chip
        # activation memory (prediction.sharded_fov_forward). Takes
        # precedence over tile_yx when a multi-device mesh is active.
        self.fov_shard = fov_shard
        # experimental: compute the training loss in the head's packed
        # pre-shuffle phase layout so the differentiated prediction never
        # transposes (ops/ssim._ms_ssim_phase). Default OFF: on v5e the
        # phase matmuls + target pack measured net-slower than the NCDHW
        # baseline (226 vs 196 ms/step; docs/STATUS.md round-3 notes)
        self.channels_last_loss = channels_last_loss
        # byte-cutting opt-in for HBM-bound training (docs/STATUS.md
        # roofline): feed the loss bf16 inputs so its full-voxel reads —
        # the largest tensors in the step — ship half the bytes. All loss
        # math still runs in f32 (casts fuse into the stat reductions);
        # the only value change is the target's one-time bf16 rounding.
        # A bf16-dtype model's prediction is bit-exactly representable in
        # bf16, so its cast is a no-op numerically.
        self.bf16_loss = bf16_loss
        if encoder_only and ckpt_path is None:
            _logger.warning("encoder_only=True has no effect without ckpt_path")
        self.encoder_only = encoder_only
        # segmentation leg of the test stage (reference engine.py:344-370)
        self.test_cellpose_model_path = test_cellpose_model_path
        self.test_cellpose_diameter = test_cellpose_diameter
        self.test_evaluate_cellpose = test_evaluate_cellpose
        self._cellpose_model = None

    # -- init ----------------------------------------------------------------
    def example_input(self) -> dict:
        import numpy as np

        depth = (
            1
            if self.architecture == "2D"
            else self.model_config.get(
                "in_stack_depth", getattr(self, "_in_stack_depth", None) or 5
            )
        )
        in_ch = self.model_config.get("in_channels", 1)
        out_ch = self.model_config.get("out_channels", 1)
        x = np.zeros((1, in_ch, depth, *self.example_input_yx_shape), np.float32)
        out_depth = getattr(self.model, "out_stack_depth", None) or depth
        y = np.zeros((1, out_ch, out_depth, *self.example_input_yx_shape), np.float32)
        return {"source": x, "target": y}

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        # jit the init: a single compiled program instead of per-op dispatch
        return jax.jit(self.model.init)(rngs, jnp.asarray(batch["source"]))

    # -- forward --------------------------------------------------------------
    def forward(self, variables: dict, x: Array, deterministic: bool = True, rngs=None) -> Array:
        return self.model.apply(variables, x, deterministic=deterministic, rngs=rngs)

    def _compute_loss(self, pred: Array, target: Array, batch: dict) -> Array:
        if "fg_mask" in batch:
            return self.loss_function(pred, target, fg_mask=batch["fg_mask"])
        if self.bf16_loss and isinstance(self.loss_function, MixedLoss):
            pred = pred.astype(jnp.bfloat16)
            target = target.astype(jnp.bfloat16)
        return self.loss_function(pred, target)

    def _use_channels_last_loss(self, batch: dict) -> bool:
        return (
            self.channels_last_loss
            and isinstance(self.model, FullyConvolutionalMAE)
            and not self.model.pretraining
            and not self.model.head_conv
            and isinstance(self.loss_function, MixedLoss)
            and "fg_mask" not in batch
        )

    def _phase_format(self) -> tuple:
        cfg = self.model
        return ("phase", cfg.out_channels, cfg.in_stack_depth, cfg.stem_kernel_size[-1])

    def _pack_target_phase(self, target: Array) -> Array:
        """NCDHW target -> the head's packed pre-shuffle phase layout
        (B, h, w, C*D*r*r); a single no-grad transpose replacing the
        differentiated prediction's shuffle + NCDHW rearrange."""
        from einops import rearrange

        r = self.model.stem_kernel_size[-1]
        return rearrange(
            target, "b c d (h i) (w j) -> b h w (c d i j)", i=r, j=r
        )

    # -- steps ------------------------------------------------------------------
    def training_loss(self, variables, batch, rng):
        cl = self._use_channels_last_loss(batch)
        apply_kwargs = {"out_layout": "phase"} if cl else {}
        if "batch_stats" in variables:
            pred, updates = self.model.apply(
                variables,
                batch["source"],
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
                **apply_kwargs,
            )
            updates = dict(updates)
        else:
            pred = self.model.apply(
                variables,
                batch["source"],
                deterministic=False,
                rngs={"dropout": rng},
                **apply_kwargs,
            )
            updates = {}
        if cl:
            target = self._pack_target_phase(batch["target"])
            loss = self.loss_function(pred, target, data_format=self._phase_format())
        else:
            loss = self._compute_loss(pred, batch["target"], batch)
        return loss, ({}, updates)

    def validation_loss(self, variables, batch, rng):
        if self._use_channels_last_loss(batch):
            pred = self.model.apply(variables, batch["source"], out_layout="phase")
            target = self._pack_target_phase(batch["target"])
            return self.loss_function(pred, target, data_format=self._phase_format()), {}
        pred = self.forward(variables, batch["source"])
        loss = self._compute_loss(pred, batch["target"], batch)
        return loss, {}

    def test_step(self, variables, batch):
        pred = self.forward(variables, batch["source"])
        target = batch["target"]
        loss = self._compute_loss(pred, target, batch)
        p = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        mae = jnp.abs(p - t).mean()
        mse = jnp.square(p - t).mean()
        pf = p.reshape(p.shape[0], -1)
        tf = t.reshape(t.shape[0], -1)
        pc = pf - pf.mean(axis=1, keepdims=True)
        tc = tf - tf.mean(axis=1, keepdims=True)
        pearson = (
            (pc * tc).sum(axis=1)
            / jnp.maximum(
                jnp.linalg.norm(pc, axis=1) * jnp.linalg.norm(tc, axis=1), 1e-8
            )
        ).mean()
        cosine = (
            (pf * tf).sum(axis=1)
            / jnp.maximum(
                jnp.linalg.norm(pf, axis=1) * jnp.linalg.norm(tf, axis=1), 1e-8
            )
        ).mean()
        ssim = ssim_25d(p, t, in_plane_window_size=(21, 21)).mean()
        return {
            "loss": loss,
            "metrics/mae": mae,
            "metrics/mse": mse,
            "metrics/pearson": pearson,
            "metrics/cosine": cosine,
            "metrics/ssim": ssim,
        }

    # -- test stage, segmentation leg (host-side) -----------------------------------
    def _instance_segment(self, pred2d):
        """Instance labels from a predicted nuclei image: CellPose when a
        model is configured AND installed (reference engine.py:392-398),
        otherwise the native EDT-watershed pipeline (documented deviation:
        cellpose is an optional extra in both stacks)."""
        import numpy as np

        if self.test_cellpose_model_path is not None and self._cellpose_model is None:
            try:
                from cellpose.models import CellposeModel

                self._cellpose_model = CellposeModel(
                    model_type=self.test_cellpose_model_path
                )
            except ImportError as e:
                raise ImportError(
                    "CellPose not installed; omit test_cellpose_model_path to "
                    "use the native watershed instance segmentation"
                ) from e
        if self._cellpose_model is not None:
            masks = self._cellpose_model.eval(
                np.asarray(pred2d), channels=[0, 0], diameter=self.test_cellpose_diameter
            )[0]
            return np.asarray(masks).astype(np.int32)
        from viscy_tpu.apps.dynacell.eval.segmentation import segment_nucleus_instances

        return segment_nucleus_instances(np.asarray(pred2d))

    def test_step_host(self, variables, batch) -> dict:
        """Host-side extension of ``test_step``: when the MaskTestDataset
        found a ground-truth mask (``labels`` in the batch), segment the
        prediction into instances and log the reference's segmentation
        suite (engine.py:400-424: binary accuracy/dice/jaccard + COCO
        mAP/mAP_50/mAP_75/mAR_100). Instance matching is not jittable, so
        this runs outside the compiled step; like the reference it scores
        the first sample of the batch."""
        if "labels" not in batch:
            return {}
        import numpy as np

        from viscy_tpu.evaluation.metrics import mean_average_precision

        if self.test_evaluate_cellpose:
            target = np.asarray(batch["target"])[:1]
            pred2d = target[0, 0, target.shape[-3] // 2]
        else:
            source = jnp.asarray(np.asarray(batch["source"])[:1])
            if not hasattr(self, "_test_host_fwd"):
                # second forward per labeled batch (the jitted test_step's
                # prediction stays inside its compiled program); jit it so
                # the cost is one compiled call, not eager op dispatch
                self._test_host_fwd = jax.jit(self.forward)
            pred = np.asarray(self._test_host_fwd(variables, source))
            # slice the PREDICTION's own center: out_stack_depth can differ
            # from the target window depth (e.g. 2.5D out_stack_depth=1)
            pred2d = pred[0, 0, pred.shape[-3] // 2]
        labels = np.asarray(batch["labels"])
        if labels.ndim == 3:
            labels = labels[0]
        pred_labels = self._instance_segment(pred2d)
        pb, tb = pred_labels > 0, labels > 0
        tp = float(np.logical_and(pb, tb).sum())
        coco = mean_average_precision(pred_labels, labels.astype(np.int32))
        out = {
            "metrics/accuracy": float((pb == tb).mean()),
            "metrics/dice_score": float(2 * tp / max(pb.sum() + tb.sum(), 1)),
            "metrics/jaccard": float(tp / max(np.logical_or(pb, tb).sum(), 1)),
            "metrics/mAP": float(coco["map"]),
            "metrics/mAP_50": float(coco["map_50"]),
            "metrics/mAP_75": float(coco["map_75"]),
            "metrics/mAR_100": float(coco["mar_100"]),
        }
        # empty-vs-empty label pairs yield NaN AP (no GT instances to
        # rank against); drop them so the trainer's mean over batches is
        # not poisoned for the whole run
        return {k: v for k, v in out.items() if np.isfinite(v)}

    # -- prediction -----------------------------------------------------------------
    def _pad_forward_crop(self, variables, source: Array, factor: int | None = None) -> Array:
        """Divisible-pad, forward, center-crop.

        ``factor`` defaults to the reference-compatible ``2**num_blocks``
        (the padded extent feeds GRN global statistics, so full-image
        predictions only match the reference when padded identically);
        the tiled path — which has no reference analog — passes the
        model's true ``total_stride`` instead so 384^2 tiles run
        unpadded."""
        original = source.shape[2:]
        factor = factor or 2 ** self.model.num_blocks
        padded = _divisible_pad(
            source, factor, pad_z=getattr(self.model, "downsamples_z", False)
        )
        pred = self.forward(variables, padded)
        return _center_crop_to_shape(pred, original)

    def predict_step(self, variables, batch):
        source = batch["source"]
        if self.fov_shard:
            from viscy_tpu.parallel.mesh import active_mesh

            mesh = active_mesh()
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                from viscy_tpu.apps.cytoland.prediction import sharded_fov_forward

                return sharded_fov_forward(
                    lambda s: self._full_frame_predict(variables, {**batch, "source": s}),
                    source,
                    mesh=mesh,
                    # every device must keep >=1 row of the deepest
                    # feature map (GSPMD near-empty-shard guard)
                    min_height=mesh.shape["data"] * self._total_stride(),
                )
        if self.tile_yx is not None and (
            source.shape[-2] > self.tile_yx[0] or source.shape[-1] > self.tile_yx[1]
        ):
            from viscy_tpu.apps.cytoland.prediction import tiled_forward_yx

            def tile_fwd(tiles):
                # tiles match tile_yx, so the re-entry takes the plain
                # path; pad to the TRUE stride (not the reference-compat
                # factor) so 384^2 tiles run unpadded
                return self._full_frame_predict(
                    variables, {**batch, "source": tiles}, factor=self._total_stride()
                )

            return tiled_forward_yx(
                tile_fwd, source, tile=self.tile_yx, tile_batch=self.tile_batch
            )
        return self._full_frame_predict(variables, batch)

    def _total_stride(self) -> int:
        """The model's true YX downsampling factor (minimal divisibility)."""
        return getattr(self.model, "total_stride", None) or 2 ** self.model.num_blocks

    def _full_frame_predict(self, variables, batch, factor: int | None = None):
        source = batch["source"]
        if self.test_time_augmentations:
            preds = []
            orig_yx = source.shape[-2:]
            for k in range(4):
                aug = jnp.rot90(source, k=k, axes=(-2, -1))
                p = self._pad_forward_crop(variables, aug, factor=factor)
                p = jnp.rot90(p, k=4 - k, axes=(-2, -1))
                preds.append(_center_crop_to_shape(p, (p.shape[-3], *orig_yx)))
            stacked = jnp.stack(preds)
            if self.tta_type == "mean":
                return stacked.mean(axis=0)
            if self.tta_type == "median":
                return jnp.median(stacked, axis=0)
            log_preds = jnp.log(stacked + 1e-9)
            return jnp.exp(log_preds.sum(axis=0))
        return self._pad_forward_crop(variables, source, factor=factor)

    # -- optimizer ----------------------------------------------------------------------
    def configure_optimizers(self, total_steps: int):
        import optax

        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        tx, sched = configure_adamw_scheduler(
            lr=self.lr,
            schedule=self.schedule,
            total_steps=total_steps,
            warmup_steps=self.warmup_steps or None,
            warmup_multiplier=self.warmup_multiplier,
        )
        if self.freeze_encoder:
            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen"
                    if any(getattr(p, "key", "") == "encoder" for p in path)
                    else "trainable",
                    params,
                )

            tx = optax.multi_transform(
                {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
            )
        return tx, sched


class FcmaeUNet(VSUNet):
    """FCMAE engine: masked pretraining and fine-tuning
    (reference ``engine.py:808``)."""

    rng_keys = ("dropout", "mask")

    def __init__(
        self,
        fit_mask_ratio: float = 0.0,
        encoder_only: bool = False,
        **kwargs,
    ) -> None:
        ckpt_path = None
        if encoder_only:
            if kwargs.get("ckpt_path") is None:
                raise ValueError("encoder_only=True requires ckpt_path")
            ckpt_path = kwargs.pop("ckpt_path")
        kwargs.setdefault("architecture", "fcmae")
        super().__init__(**kwargs)
        self.fit_mask_ratio = fit_mask_ratio
        self.encoder_only = encoder_only
        self._encoder_ckpt = ckpt_path
        if self.model.pretraining and self.fit_mask_ratio <= 0.0:
            _logger.warning("FCMAE pretraining with fit_mask_ratio=0 — no masking applied")

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        return jax.jit(self.model.init, static_argnames=("mask_ratio",))(
            rngs, jnp.asarray(batch["source"]), mask_ratio=self.fit_mask_ratio
        )

    def load_pretrained(self, variables: dict) -> dict:
        """Encoder-only transfer from a pretrained checkpoint
        (reference ``engine.py:855-867``)."""
        if self._encoder_ckpt is None:
            return variables
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        from pathlib import Path

        restored = ckptr.restore(Path(self._encoder_ckpt).absolute())
        src_params = restored["params"] if "params" in restored else restored
        params = dict(variables["params"])
        if "encoder" not in src_params:
            raise KeyError("checkpoint has no encoder parameters")
        params["encoder"] = src_params["encoder"]
        _logger.info(f"Loaded encoder parameters from {self._encoder_ckpt}")
        out = dict(variables)
        out["params"] = params
        return out

    def forward_fit_fcmae(self, variables, batch, rng, return_target: bool = False):
        source = batch["source"]
        pred, mask = self.model.apply(
            variables,
            source,
            mask_ratio=self.fit_mask_ratio,
            deterministic=False,
            rngs={"mask": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        target = source if return_target else None
        return pred, target, mask

    def training_loss(self, variables, batch, rng):
        if self.model.pretraining:
            pred, target, mask = self.forward_fit_fcmae(variables, batch, rng, return_target=True)
            loss_fn = (
                self.loss_function
                if isinstance(self.loss_function, MaskedMSELoss)
                else MaskedMSELoss()
            )
            loss = loss_fn(pred, target, mask.astype(jnp.float32))
            return loss, ({}, {})
        return super().training_loss(variables, batch, rng)

    def validation_loss(self, variables, batch, rng):
        if self.model.pretraining:
            pred, target, mask = self.forward_fit_fcmae(variables, batch, rng, return_target=True)
            loss_fn = (
                self.loss_function
                if isinstance(self.loss_function, MaskedMSELoss)
                else MaskedMSELoss()
            )
            loss = loss_fn(pred, target, mask.astype(jnp.float32))
            return loss, {}
        return super().validation_loss(variables, batch, rng)
