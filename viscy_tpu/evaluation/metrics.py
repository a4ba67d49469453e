"""Image and segmentation metrics (reference ``evaluation/metrics.py``).

The SSIM family lives in :mod:`viscy_tpu.ops.ssim` (device-side,
bf16-safe); this module holds the host-side metrics: VOI, POD, Pearson,
and segmentation utilities.
"""

from __future__ import annotations

import numpy as np

from viscy_tpu.ops.ssim import ms_ssim_25d, ssim_25d  # re-export  # noqa: F401

__all__ = [
    "ssim_25d",
    "ms_ssim_25d",
    "pearson_correlation",
    "voi_score",
    "pod_metric",
    "mean_average_precision_stub",
]


def pearson_correlation(pred: np.ndarray, target: np.ndarray) -> float:
    """Global Pearson correlation between two arrays."""
    p = np.asarray(pred, np.float64).ravel()
    t = np.asarray(target, np.float64).ravel()
    p -= p.mean()
    t -= t.mean()
    denom = np.linalg.norm(p) * np.linalg.norm(t)
    return float(p @ t / denom) if denom > 0 else 0.0


def voi_score(pred_labels: np.ndarray, target_labels: np.ndarray) -> tuple[float, float]:
    """Variation of information between two label images
    (reference ``metrics.py`` VOI): returns (H(pred|target), H(target|pred))."""
    p = np.asarray(pred_labels).ravel().astype(np.int64)
    t = np.asarray(target_labels).ravel().astype(np.int64)
    n = p.size
    # joint histogram via contingency
    pu, pi = np.unique(p, return_inverse=True)
    tu, ti = np.unique(t, return_inverse=True)
    joint = np.zeros((len(pu), len(tu)), np.float64)
    np.add.at(joint, (pi, ti), 1.0)
    joint /= n
    pm = joint.sum(axis=1, keepdims=True)
    tm = joint.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        h_p_given_t = -np.nansum(joint * np.log(joint / tm, where=joint > 0))
        h_t_given_p = -np.nansum(joint * np.log(joint / pm, where=joint > 0))
    return float(h_p_given_t), float(h_t_given_p)


def pod_metric(
    pred_labels: np.ndarray, target_labels: np.ndarray, iou_threshold: float = 0.5
) -> dict:
    """Probability of detection over instance labels: matches instances by
    IoU and reports detection rate / precision / recall."""
    pred_ids = [i for i in np.unique(pred_labels) if i != 0]
    target_ids = [i for i in np.unique(target_labels) if i != 0]
    matched_t = set()
    tp = 0
    for pid in pred_ids:
        pm = pred_labels == pid
        overlap_ids = np.unique(target_labels[pm])
        best_iou, best_t = 0.0, None
        for tid in overlap_ids:
            if tid == 0 or tid in matched_t:
                continue
            tm = target_labels == tid
            inter = np.logical_and(pm, tm).sum()
            union = np.logical_or(pm, tm).sum()
            iou = inter / union if union else 0.0
            if iou > best_iou:
                best_iou, best_t = iou, tid
        if best_t is not None and best_iou >= iou_threshold:
            matched_t.add(best_t)
            tp += 1
    fp = len(pred_ids) - tp
    fn = len(target_ids) - tp
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        "true_positives": tp,
        "false_positives": fp,
        "false_negatives": fn,
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / max(precision + recall, 1e-8),
    }


def mean_average_precision_stub(*args, **kwargs):
    """COCO mAP requires torchmetrics+pycocotools (not in this image)."""
    raise NotImplementedError(
        "COCO-style mAP is not available in this environment; use pod_metric."
    )
