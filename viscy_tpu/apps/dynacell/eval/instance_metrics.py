"""Instance-segmentation average-precision metrics (Cellpose-style).

Native numpy rebuild of reference
``applications/dynacell/src/dynacell/evaluation/instance_metrics.py`` and
the ``cubic.metrics.average_precision`` it wraps: per-threshold AP =
TP / (TP + FP + FN) with one-to-one IoU matching (Hungarian assignment,
the Cellpose definition), symmetric best Dice, and the standard
0.50..0.95 threshold sweep.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "DEFAULT_IOU_THRESHOLDS",
    "instance_average_precision",
    "mean_instance_dice",
]

DEFAULT_IOU_THRESHOLDS = (0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95)
"""IoU thresholds for the AP sweep (Cellpose / StarDist standard)."""

_PRIMARY_THRESHOLD = 0.50


def _relabel_sequential(labels: np.ndarray) -> np.ndarray:
    """Dense relabel to ``0, 1..K`` (background stays 0; disjoint pieces that
    share an id stay one object — value-based, not connected-component)."""
    labels = np.asarray(labels)
    uniq, inv = np.unique(labels, return_inverse=True)
    inv = inv.reshape(labels.shape)
    return inv if uniq[0] == 0 else inv + 1


def _iou_matrix(gt: np.ndarray, pred: np.ndarray, n_gt: int, n_pred: int) -> np.ndarray:
    """Object-wise IoU matrix ``(n_gt, n_pred)`` from sequential label images."""
    overlap = np.zeros((n_gt + 1, n_pred + 1), np.int64)
    np.add.at(overlap, (gt.ravel(), pred.ravel()), 1)
    gt_area = overlap.sum(axis=1)
    pred_area = overlap.sum(axis=0)
    inter = overlap[1:, 1:].astype(np.float64)
    union = gt_area[1:, None] + pred_area[None, 1:] - inter
    return np.divide(inter, union, out=np.zeros_like(inter), where=union > 0)


def _true_positives(iou: np.ndarray, threshold: float) -> int:
    """One-to-one matching count at an IoU threshold (Hungarian on -IoU,
    matches counted only above threshold — the Cellpose matching rule)."""
    from scipy.optimize import linear_sum_assignment

    if iou.size == 0:
        return 0
    # pad to square so assignment is total; padded entries have IoU 0
    n = max(iou.shape)
    cost = np.zeros((n, n))
    cost[: iou.shape[0], : iou.shape[1]] = iou
    rows, cols = linear_sum_assignment(-cost)
    return int((cost[rows, cols] >= threshold).sum())


def mean_instance_dice(gt: np.ndarray, pred: np.ndarray, n_gt: int, n_pred: int) -> float:
    """Symmetric best Dice: best-overlap IoU per object in both directions,
    converted to Dice ``2u / (1 + u)`` and averaged. Penalizes both under-
    and over-segmentation; NaN when both sides empty, 0 when one side is."""
    if n_gt == 0 and n_pred == 0:
        return float("nan")
    if n_gt == 0 or n_pred == 0:
        return 0.0
    iou = _iou_matrix(gt, pred, n_gt, n_pred)
    best = np.concatenate([iou.max(axis=1), iou.max(axis=0)])
    return float(np.mean(2.0 * best / (1.0 + best)))


def instance_average_precision(
    labels_pred: np.ndarray,
    labels_gt: np.ndarray,
    iou_thresholds=DEFAULT_IOU_THRESHOLDS,
) -> dict:
    """AP sweep of predicted vs ground-truth instance labels.

    Returns ``AP_<th>`` per threshold, ``mAP``, ``instance_dice``,
    ``n_gt``/``n_pred``, and ``instance_{TP,FP,FN}@0.50``. Both sides
    empty -> NaN AP/mAP/Dice; exactly one empty -> zeros.
    """
    thresholds = [float(t) for t in iou_thresholds]
    pred = _relabel_sequential(labels_pred)
    gt = _relabel_sequential(labels_gt)
    n_pred = int(pred.max())
    n_gt = int(gt.max())

    if n_gt == 0 and n_pred == 0:
        ap_vals = [float("nan")] * len(thresholds)
        tp = fp = fn = float("nan")
    elif n_gt == 0 or n_pred == 0:
        ap_vals = [0.0] * len(thresholds)
        tp, fp, fn = 0.0, float(n_pred), float(n_gt)
    else:
        iou = _iou_matrix(gt, pred, n_gt, n_pred)
        ap_vals = []
        tps = []
        for th in thresholds:
            tp_i = _true_positives(iou, th)
            tps.append(tp_i)
            ap_vals.append(tp_i / (n_gt + n_pred - tp_i))
        idx = thresholds.index(_PRIMARY_THRESHOLD) if _PRIMARY_THRESHOLD in thresholds else 0
        tp = float(tps[idx])
        fp = float(n_pred - tps[idx])
        fn = float(n_gt - tps[idx])

    result: dict = {"n_gt": n_gt, "n_pred": n_pred}
    for th, a in zip(thresholds, ap_vals):
        result[f"AP_{th:.2f}"] = float(a)
    result["mAP"] = float(np.mean(ap_vals))
    result["instance_dice"] = mean_instance_dice(gt, pred, n_gt, n_pred)
    result[f"instance_TP@{_PRIMARY_THRESHOLD:.2f}"] = tp
    result[f"instance_FP@{_PRIMARY_THRESHOLD:.2f}"] = fp
    result[f"instance_FN@{_PRIMARY_THRESHOLD:.2f}"] = fn
    return result
