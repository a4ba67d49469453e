"""Segmentation test-stage module (reference ``cytoland/evaluation.py:15``).

Compares predicted vs. target instance segmentations slice-by-slice:
binary accuracy / dice / jaccard plus instance-level POD (the COCO-mAP
dependency of the reference is replaced by the IoU-matching
``pod_metric``).
"""

from __future__ import annotations

import logging

import numpy as np

from viscy_tpu.evaluation.metrics import pod_metric, voi_score
from viscy_tpu.training.module import TrainModule

_logger = logging.getLogger("viscy_tpu")


class SegmentationMetrics2D(TrainModule):
    """Test runner over SegmentationDataModule batches (batch_size=1)."""

    # instance matching (POD/VOI) is host math — the trainer must not jit it
    jit_test_step = False

    def __init__(self, aggregate_epoch: bool = False) -> None:
        self.aggregate_epoch = aggregate_epoch
        self.model = None

    def init_variables(self, rng, batch):
        return {"params": {}}

    def example_input(self) -> dict:
        return {"pred": np.zeros((1, 8, 8), np.int16), "target": np.zeros((1, 8, 8), np.int16)}

    def configure_optimizers(self, total_steps: int):
        import optax

        return optax.identity(), (lambda step: 0.0)

    def test_step(self, variables, batch) -> dict:
        # host-side metrics — instance matching is not jittable
        pred = np.asarray(batch["pred"])[0]
        target = np.asarray(batch["target"])[0]
        pred_binary = pred > 0
        target_binary = target > 0
        tp = np.logical_and(pred_binary, target_binary).sum()
        union = np.logical_or(pred_binary, target_binary).sum()
        acc = (pred_binary == target_binary).mean()
        dice = 2 * tp / max(pred_binary.sum() + target_binary.sum(), 1)
        jaccard = tp / max(union, 1)
        pod = pod_metric(pred, target)
        voi_pt, voi_tp = voi_score(pred, target)
        return {
            "test_metrics/accuracy": float(acc),
            "test_metrics/dice": float(dice),
            "test_metrics/jaccard": float(jaccard),
            "test_metrics/pod_f1": pod["f1"],
            "test_metrics/pod_precision": pod["precision"],
            "test_metrics/pod_recall": pod["recall"],
            "test_metrics/voi": float(voi_pt + voi_tp),
        }
